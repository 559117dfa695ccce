"""Second batch of adapted TPC-H plan shapes: Q21 (double-correlated
existential) and Q9 (multi-dim profit rollup).

Same adaptation rules as ``tpch_ext.py``: canonical plan shape, fixture
columns (no partsupp / commit-receipt dates — lateness is defined against
``o_orderdate + 60 days``, supply cost as a retail-price fraction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gluettalax_spark.registry import register
from gluettalax_spark.tables import load

# --------------------------------------------------------------------------
# Q21-shape: suppliers who were the sole late shipper of a multi-supplier
# order (EXISTS + NOT EXISTS, both correlated)
# --------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders    ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@register("q21_sole_late_shipper", _Q21_ORACLE, doc="TPC-H Q21: EXISTS + NOT EXISTS via per-order stats join")
def q21_sole_late_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two correlated subqueries decorrelate into ONE per-order
    aggregate — (#distinct suppliers, #distinct late suppliers) — joined
    back to the late rows: EXISTS ⇔ n_supp ≥ 2, NOT EXISTS ⇔ n_late = 1
    (l1 itself is late, so 'no OTHER late supplier' means exactly one).
    Two scans of lineitem⋈orders, each one shuffle — versus the naive
    re-probe of lineitem per outer row.

    (Adapted: shipped >60 days after order date stands in for
    receipt-after-commit lateness.)
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")

    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "is_late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    order_stats = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late"),
    )
    late_rows = lo.filter(F.col("is_late")).select("l_orderkey", "l_suppkey")
    return (
        late_rows.join(order_stats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
    )


# --------------------------------------------------------------------------
# Q9-shape: profit by supplier nation and year
# --------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT nation, o_year,
       CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT
    n_name AS nation,
    CAST(year(o_orderdate) AS BIGINT) AS o_year,
    CAST(l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity
         AS DECIMAL(18,4)) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%ring%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register("q9_profit_by_nation", _Q9_ORACLE, doc="TPC-H Q9: profit rollup, LIKE-filtered part broadcast")
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The substring filter on part prunes lineitem via a broadcast join
    BEFORE the orders shuffle — the classic Q9 plan. (Adapted: supply
    cost ≈ 0.6 × retail price, since partsupp doesn't exist in the
    fixtures.)"""
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%ring%"))
        .select("p_partkey", "p_retailprice")
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            # Summands mix signs at ~1e4 magnitude, so a double sum loses
            # ~3 decimal digits to cancellation AND is order-dependent.
            # Casting each term to decimal(18,4) makes the sum exact and
            # order-independent on both engines — cross-engine stable.
            amount.cast("decimal(18,4)").alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )
