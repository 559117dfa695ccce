"""Pure range (interval) join — both sides large, NO equi key.

``joins.py:join_range`` rides an equi key (partkey) and evaluates the
range as a join-condition filter; the hard case at scale is a join whose
ONLY predicate is a range: Spark's planner can't hash-partition it and
falls back to BroadcastNestedLoopJoin — O(N·M) and a broadcast of a big
side. The classic fix (Flink/Databricks "range join optimization") is
BANDING: quantize the range dimension into buckets of the band width,
join on the bucket id (a plain equi shuffle), probe adjacent buckets, and
refine with the exact predicate. This module implements that as a
composition of DataFrame ops (SURVEY.md §2.F custom-operator rule (a)).

Cost: each probe row explodes into 3 bucket keys (band ±1) — a 3× fanout
buys an equi-join; at 100 TB that's the difference between a shuffle and
a nested-loop cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gluettalax_spark.registry import register
from gluettalax_spark.tables import load

BAND_SECONDS = 600  # ±10 minutes


def banded_interval_join(
    probe: DataFrame,
    build: DataFrame,
    probe_ts: str,
    build_ts: str,
    band_seconds: int,
) -> DataFrame:
    """All (probe, build) pairs with |probe_ts − build_ts| ≤ band_seconds,
    as an equi-join on quantized time buckets.

    A build row lands in exactly ONE bucket; a probe row checks its own
    bucket ±1 — every in-band pair shares one of those three buckets, and
    no pair can match twice (the build bucket is unique), so no distinct
    step is needed after refinement.
    """
    b = F.floor(F.col(build_ts).cast("double") / band_seconds)
    build_b = build.withColumn("__bucket", b.cast("long"))
    p = F.floor(F.col(probe_ts).cast("double") / band_seconds).cast("long")
    probe_b = probe.withColumn(
        "__bucket", F.explode(F.array(p - 1, p, p + 1))
    )
    return probe_b.join(build_b, "__bucket").filter(
        F.abs(F.col(probe_ts).cast("double") - F.col(build_ts).cast("double")) <= band_seconds
    ).drop("__bucket")


_INTERVAL_ORACLE = f"""
WITH purchases AS (
  SELECT event_id, ts FROM events WHERE event_type = 'purchase'
),
errors AS (
  SELECT event_id AS err_id, ts AS err_ts FROM events WHERE event_type = 'error'
)
SELECT
  p.event_id,
  count(e.err_id) AS n_nearby_errors
FROM purchases p
LEFT JOIN errors e
  ON abs(epoch(p.ts) - epoch(e.err_ts)) <= {BAND_SECONDS}
GROUP BY p.event_id
ORDER BY p.event_id
"""


@register(
    "join_interval_banded",
    _INTERVAL_ORACLE,
    doc=f"pure range join (±{BAND_SECONDS}s) via band-bucket equi-join",
)
def join_interval_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Errors within ±10 min of each purchase, across ALL users — no equi
    key exists, so the oracle's plan is a nested-loop O(N·M); ours is a
    banded equi-join. Purchases with zero nearby errors survive via a
    left join back onto the full purchase set."""
    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select("event_id", "ts")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    pairs = banded_interval_join(purchases, errors, "ts", "err_ts", BAND_SECONDS)
    counts = pairs.groupBy("event_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        purchases.join(counts, "event_id", "left")
        .select("event_id", F.coalesce("n", F.lit(0)).alias("n_nearby_errors"))
        .orderBy("event_id")
    )
