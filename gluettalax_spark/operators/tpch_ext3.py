"""Final batch of adapted TPC-H plan shapes: Q2, Q11, Q16, Q20 — the four
that reference the ``partsupp`` table, absent from the fixtures. A
part-supplier relation is DERIVED from lineitem (who actually supplied
which part, at what realized unit price), which preserves every plan
shape: correlated-min subquery (Q2), global-fraction HAVING (Q11),
anti-joined distinct count (Q16), grouped-HAVING semi-join (Q20).

With tpch.py/tpch_ext.py/tpch_ext2.py this completes all 22 TPC-H plan
shapes on the fixture schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gluettalax_spark.registry import register
from gluettalax_spark.tables import load

# Derived part-supplier offers: realized average unit price per
# (part, supplier), rounded to 4 decimals so the min-equality in Q2 is
# cross-engine stable (raw double averages differ in the last ulp).
_PS_CTE = """
partsupp AS (
  SELECT
    l_partkey  AS ps_partkey,
    l_suppkey  AS ps_suppkey,
    round(avg(l_extendedprice / l_quantity), 4) AS ps_supplycost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
)
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
        ).agg(F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias("ps_supplycost"))
    )


# --------------------------------------------------------------------------
# Q2-shape: minimum-cost supplier (correlated min subquery)
# --------------------------------------------------------------------------

_Q2_ORACLE = f"""
WITH {_PS_CTE}
SELECT
  round(s_acctbal, 2) AS acctbal,
  s_name, n_name, p_partkey, p_name,
  ps_supplycost AS supplycost
FROM part
JOIN partsupp ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size = 10 AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT min(ps2.ps_supplycost)
    FROM partsupp ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@register("q2_min_cost_supplier", _Q2_ORACLE, doc="TPC-H Q2: correlated min via per-part window")
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated `= (SELECT min ...)` decorrelates into a window min
    over the SAME region-filtered join — one pass, no re-probe per outer
    row. Dimension chain (supplier→nation→region) broadcasts."""
    ps = _partsupp(spark, sf_dir)
    part = load(spark, sf_dir, "part").filter(F.col("p_size") == 10).select("p_partkey", "p_name")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_ps = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("ps_partkey")
    return (
        euro_ps.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            F.round("s_acctbal", 2).alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(F.col("acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q11-shape: important part values (HAVING against a global-fraction scalar)
# --------------------------------------------------------------------------

_Q11_ORACLE = """
WITH filtered AS (
  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,4)) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
)
SELECT
  l_partkey AS partkey,
  CAST(round(sum(value), 2) AS DOUBLE) AS part_value
FROM filtered
GROUP BY l_partkey
HAVING CAST(sum(value) AS DOUBLE) > (SELECT CAST(sum(value) AS DOUBLE) * 0.001 FROM filtered)
ORDER BY part_value DESC, partkey
"""


@register("q11_important_parts", _Q11_ORACLE, doc="TPC-H Q11: HAVING vs global-fraction scalar subquery")
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar threshold is a 1-row aggregate cross-broadcast into the
    HAVING filter; both aggregates reuse one shuffled base. Summands cast
    to decimal so the sum is exact and order-independent cross-engine."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    filtered = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey", F.col("l_extendedprice").cast("decimal(18,4)").alias("value"))
    )
    per_part = filtered.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum("value").alias("sum_value")
    )
    threshold = filtered.agg((F.sum("value").cast("double") * 0.001).alias("threshold"))
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("sum_value").cast("double") > F.col("threshold"))
        .select("partkey", F.round("sum_value", 2).cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), F.col("partkey"))
    )


# --------------------------------------------------------------------------
# Q16-shape: supplier diversity per part group (anti-join + distinct count)
# --------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT IN ('PROMO', 'ECONOMY')
  AND p_size IN (1, 5, 10, 15, 20, 25)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("q16_supplier_diversity", _Q16_ORACLE, doc="TPC-H Q16: NOT IN anti-join + COUNT DISTINCT")
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (non-null key) = left-anti join against the excluded
    supplier set; the distinct count shuffles (group, suppkey) pairs once
    (Catalyst's two-phase distinct aggregate)."""
    part = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (~F.col("p_type").isin("PROMO", "ECONOMY"))
            & (F.col("p_size").isin(1, 5, 10, 15, 20, 25))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad_supp = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q20-shape: high-volume suppliers of a part family (IN → semi-join chain)
# --------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT s_name, round(s_acctbal, 2) AS acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > 100
)
ORDER BY s_name
"""


@register("q20_volume_suppliers", _Q20_ORACLE, doc="TPC-H Q20: IN over grouped-HAVING subquery → semi join")
def q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IN-subquery becomes a left-semi join against the post-HAVING
    key set (small after filtering — broadcastable). Quantities are
    integral doubles, so the HAVING sum is exact on both engines."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    keys = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    supp = load(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(keys), supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_name")
    )
