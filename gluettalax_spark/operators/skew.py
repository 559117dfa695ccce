"""Skew-handling join patterns — the explicit versions of what AQE does
adaptively, for when the skew is known ahead of time (hot keys in a
100 TB fact table) or AQE is unavailable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gluettalax_spark.registry import register
from gluettalax_spark.tables import load

N_SALTS = 8

_SALTED_ORACLE = """
SELECT
  o_orderpriority,
  count(*)                                          AS n_items,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("join_salted", _SALTED_ORACLE, doc=f"salted ({N_SALTS}x) equi-join vs skewed keys")
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salting: the probe side gets a random-ish salt in [0, N); the build
    side is replicated N times with every salt value; the join key becomes
    (key, salt), splitting each hot key across N reducers.

    Salt derives from a hash of other columns (not rand()) so the result
    is deterministic and oracle-checkable — the oracle runs the plain
    join, proving salting changes the partitioning, never the answer.

    At 100 TB: use this when ONE key holds >~1 GB; otherwise let AQE's
    skewJoin splitting (enabled in our session) handle it.
    """
    li = load(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.xxhash64("l_partkey", "l_linenumber"), F.lit(N_SALTS))
    )
    salts = spark.range(N_SALTS).select(F.col("id").cast("int").alias("salt"))
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    orders_replicated = orders.crossJoin(F.broadcast(salts))
    return (
        li.join(
            orders_replicated,
            (li.l_orderkey == orders_replicated.o_orderkey)
            & (li.salt == orders_replicated.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Generic deterministic salted equi-join (the pattern of
    ``join_salted``, reusable): probe rows get salt = xxhash64(all
    columns) % n, the build side replicates n× — each hot key spreads
    over n reducers. Result is identical to ``probe.join(build, key)``
    (asserted in tests/test_skew.py); only the shuffle distribution
    changes."""
    salted_probe = probe.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salts))
    )
    salts = probe.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
    replicated = build.withColumnRenamed(key, "__bkey").crossJoin(F.broadcast(salts))
    return (
        salted_probe.join(
            replicated,
            (salted_probe[key] == replicated["__bkey"]) & (salted_probe["__salt"] == replicated["__salt"]),
        )
        .drop("__salt")
        .drop("__bkey")
    )
