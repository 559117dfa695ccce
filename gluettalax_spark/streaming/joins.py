"""Stream-static join and streaming dedup over ``events``.

Two Structured Streaming shapes every production pipeline needs beyond
windowed aggregates:

* **stream-static enrichment** — each micro-batch joins against a static
  dimension; Spark re-plans the join per batch, so a broadcastable dim
  never shuffles the stream side (at 100 TB/day of events that is the
  only viable plan);
* **streaming dedup** — ``dropDuplicates`` on the event key with a
  watermark bounding the dedup state: ids older than the horizon are
  evicted, which is what keeps state finite on an infinite stream.

No SQL oracle is possible for a streaming query; tests drive these to
completion on the finite fixture and compare against the batch truth
(the pattern of ``streaming/windows.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gluettalax_spark.streaming.windows import read_events_stream
from gluettalax_spark.tables import load


def user_tier_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static per-user dimension derived from historical events: lifetime
    event count and a spend tier. Stand-in for the user-profile table an
    enrichment join would hit."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("lifetime_events"), F.sum("value").alias("lifetime_value"))
        .withColumn(
            "tier",
            F.when(F.col("lifetime_value") >= 1000, "gold")
            .when(F.col("lifetime_value") >= 100, "silver")
            .otherwise("bronze"),
        )
    )


def streaming_enriched_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the static dim is broadcast into every
    micro-batch; the stream side never shuffles."""
    stream = read_events_stream(spark, sf_dir)
    dim = user_tier_dim(spark, sf_dir).select("user_id", "tier")
    return stream.join(F.broadcast(dim), "user_id", "left").select(
        "event_id", "user_id", "event_type", "value", F.coalesce("tier", F.lit("bronze")).alias("tier")
    )


def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup on event_id: state holds only ids within
    the 1-hour horizon of max event time; older state evicts."""
    stream = read_events_stream(spark, sf_dir)
    return stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"]).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
