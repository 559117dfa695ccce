"""Additional TPC-H-shaped benchmark queries over the fixture star schema
(beyond the flagship Q1 in relational.py) — the canonical join/agg plans
a Glue-job author would run, made first-class (SURVEY.md §2.F).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gluettalax_spark.registry import register
from gluettalax_spark.tables import load

# --------------------------------------------------------------------------
# Q6-shape: forecast revenue change (pure filter + aggregate)
# --------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT
  round(sum(l_extendedprice * l_discount), 2) AS revenue,
  count(*)                                    AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", _Q6_ORACLE, doc="TPC-H Q6: filter-heavy single-pass aggregate")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every predicate pushes to the parquet scan; the aggregate is a
    single map-side-combined global sum — the cheapest possible plan
    shape, and the one to sanity-check scan throughput with."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# Q3-shape: shipping-priority top orders
# --------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT
  l_orderkey,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", _Q3_ORACLE, doc="TPC-H Q3: selective star join + top-10")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer (filtered, broadcast) prunes orders early; the final
    top-10 is TakeOrderedAndProject — no global sort."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q18-shape: large-volume customers (agg → semi-filter → join)
# --------------------------------------------------------------------------

_Q18_ORACLE = """
WITH big_orders AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(l_quantity) > 300
)
SELECT
  c_name,
  o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  round(o_totalprice, 2)            AS totalprice,
  round(total_qty, 2)               AS total_qty
FROM big_orders
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
"""


@register("q18_large_orders", _Q18_ORACLE, doc="TPC-H Q18: HAVING-filtered agg feeding a join")
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The aggregate runs FIRST and its output (few rows after HAVING)
    drives the joins — at 100 TB the big_orders side shrinks by orders of
    magnitude before anything joins, and broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty_raw"))
        .filter(F.col("total_qty_raw") > 300)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty_raw", 2).alias("total_qty"),
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Top-customer revenue ranking (dense join + window over aggregate)
# --------------------------------------------------------------------------

_TOP_CUSTOMERS_ORACLE = """
WITH spend AS (
  SELECT
    c_custkey, c_name, n_name,
    round(sum(o_totalprice), 2) AS total_spend
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey, c_name, n_name
)
SELECT c_custkey, c_name, n_name, total_spend, rnk
FROM (
  SELECT *, CAST(rank() OVER (PARTITION BY n_name ORDER BY total_spend DESC, c_custkey) AS BIGINT) AS rnk
  FROM spend
)
WHERE rnk <= 3
ORDER BY n_name, rnk
"""


@register("top_customers_per_nation", _TOP_CUSTOMERS_ORACLE, doc="top-3 spenders per nation (agg → window)")
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    spend = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
    )
    w = Window.partitionBy("n_name").orderBy(F.col("total_spend").desc(), F.col("c_custkey"))
    return (
        spend.withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .orderBy("n_name", "rnk")
    )
