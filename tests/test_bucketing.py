"""Bucketing: pre-shuffled tables make key-joins exchange-free — the
co-located-join strategy for repeated 100 TB joins (SURVEY.md §2.F /
pyspark guide partitioning notes).
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from gluettalax_spark.tables import load


@pytest.fixture()
def bucket_db(spark, tmp_path):
    name = f"bdb_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE `{name}` LOCATION '{tmp_path / name}'")
    prev = spark.catalog.currentDatabase()
    spark.catalog.setCurrentDatabase(name)
    yield name
    spark.catalog.setCurrentDatabase(prev)
    spark.sql(f"DROP DATABASE `{name}` CASCADE")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucket_db):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")

    a = spark.table("li_b")
    b = spark.table("orders_b")
    # Disable broadcast so the join strategy decision is about bucketing.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Co-located buckets: SMJ with ZERO shuffle exchanges.
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == load(spark, sf_dir, "lineitem").join(
            load(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
