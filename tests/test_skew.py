"""Skew handling: AQE splits a pathologically hot join key at runtime,
and the deterministic salted join produces identical results to the
unsalted plan. These pin the two mechanisms SCALING.md claims for skewed
keys at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skewed_frames(spark):
    """200k-row fact where 50% of rows share ONE key, joined to a 10k dim."""
    fact = spark.range(0, 200_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id") % 10_000).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.range(0, 10_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    return fact, dim


def test_aqe_skew_join_splits_hot_partition(spark, skewed_frames):
    fact, dim = skewed_frames
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = fact.join(dim, "k")
        # collect() executes THIS DataFrame's QueryExecution (count() would
        # clone it into a separate execution and leave this plan unfinalized).
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # AQE marks the rewritten join and the split shuffle read.
        assert "skew=true" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_matches_unsalted(spark, skewed_frames):
    """Salting changes the shuffle distribution, never the result."""
    from gluettalax_spark.operators.skew import salted_join

    fact, dim = skewed_frames
    salted = salted_join(fact, dim, "k", n_salts=8)
    plain = fact.join(dim, "k")
    assert salted.count() == plain.count()
    a = salted.groupBy("k").agg(F.sum("v").alias("sv"), F.sum("w").alias("sw"))
    b = plain.groupBy("k").agg(F.sum("v").alias("sv"), F.sum("w").alias("sw"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
