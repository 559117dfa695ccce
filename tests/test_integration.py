"""Capstone integration: the full GLUEttalax workflow on one engine —
a registered job runs a data-plane query, lands partitioned parquet, the
catalog registers + discovers the partitions (crawler-style), and the
result is queryable through SQL with partition pruning. Control plane,
orchestration, and data plane in one pass."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from gluettalax_spark.tables import load


@pytest.fixture()
def db(spark, tmp_path):
    name = f"etl_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE `{name}` LOCATION '{tmp_path / name}'")
    yield name
    spark.sql(f"DROP DATABASE `{name}` CASCADE")


def test_full_etl_roundtrip(spark, sf_dir, db, tmp_path):
    from gluettalax_spark.jobs import JobRegistry
    from gluettalax_spark.plans.catalog import (
        add_partitions_by_location,
        create_external_table,
        list_partitions,
    )

    out = str(tmp_path / "daily_revenue")

    # 1. Orchestration: a registered job computes daily revenue per
    #    priority and writes Hive-partitioned parquet (the Glue-job role).
    def daily_revenue_etl(spark, **args):
        li = load(spark, args["SF_DIR"], "lineitem")
        orders = load(spark, args["SF_DIR"], "orders")
        df = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .withColumn("year", F.year("o_orderdate").cast("string"))
            .groupBy("year", "o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        )
        df.write.mode("overwrite").partitionBy("year").parquet(args["OUT"])
        return df

    registry = JobRegistry()
    registry.register("daily_revenue_etl", daily_revenue_etl, timeout=600.0)
    assert registry.run(spark, "daily_revenue_etl", SF_DIR=sf_dir, OUT=out) is True

    # 2. Control plane: register the external table, then bulk-discover
    #    its partitions from the filesystem (crawler/B3 semantics).
    create_external_table(
        spark, db, "daily_revenue", out,
        schema="o_orderpriority STRING, revenue DOUBLE",
        partition_keys=["year"],
    )
    result = add_partitions_by_location(spark, db, "daily_revenue", out)
    assert result["added"], result
    parts = list_partitions(spark, db, "daily_revenue")
    years = sorted(v[0] for v in parts.data)
    assert len(years) >= 3  # orderdates span 1995..2001

    # 3. Data plane: query back through SQL; the partition filter prunes.
    one_year = years[1]
    df = spark.sql(
        f"SELECT o_orderpriority, revenue FROM `{db}`.daily_revenue "
        f"WHERE year = '{one_year}' ORDER BY o_orderpriority"
    )
    rows = df.collect()
    assert len(rows) == 5  # five priorities
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "year" in plan
    # Values agree with recomputing directly from the fixtures.
    li, orders = load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders")
    truth = {
        r.o_orderpriority: r.revenue
        for r in (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .filter(F.year("o_orderdate") == int(one_year))
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
            .collect()
        )
    }
    assert {r.o_orderpriority: r.revenue for r in rows} == truth
    # 4. History: the run is visible through the runs DataFrame (A3/C5).
    hist = registry.runs_df(spark).filter(F.col("job_name") == "daily_revenue_etl").collect()
    assert len(hist) == 1 and hist[0].state == "SUCCEEDED"
