"""Reshaping operators: pivot/unpivot, GROUPING SETS, bag-semantics set
ops, and the Pandas UDF/UDAF surface (SURVEY.md §2.F UDF row).
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf resolves
# the type hints at decoration time, and postponed annotations would leave
# them as unresolvable strings unless pandas is importable in this module's
# globals at resolution time.
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gluettalax_spark.registry import register
from gluettalax_spark.tables import load

# --------------------------------------------------------------------------
# Pivot (long → wide)
# --------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT
  l_returnflag,
  round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0.0), 2) AS qty_O,
  round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0.0), 2) AS qty_F
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("pivot_status", _PIVOT_ORACLE, doc="pivot linestatus → columns")
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`.pivot` with EXPLICIT values — omitting them adds a full extra
    pass just to discover the pivot columns (never do that at 100 TB)."""
    li = load(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
    )
    return wide.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_O"),
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_F"),
    ).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# Unpivot (wide → long)
# --------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT p_partkey, metric, value
FROM (
  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
  UNION ALL
  SELECT p_partkey, 'retailprice' AS metric, round(p_retailprice, 2) AS value FROM part
)
WHERE p_partkey <= 100
ORDER BY p_partkey, metric
"""


@register("unpivot_part_metrics", _UNPIVOT_ORACLE, doc="unpivot via stack()")
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stack() expands in-place during the scan projection — no shuffle,
    no union of N scans (the oracle's UNION ALL reads the table twice;
    stack reads once)."""
    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return (
        part.selectExpr(
            "p_partkey",
            "stack(2, 'size', CAST(p_size AS DOUBLE), 'retailprice', round(p_retailprice, 2)) AS (metric, value)",
        )
        .orderBy("p_partkey", "metric")
    )


# --------------------------------------------------------------------------
# GROUPING SETS (beyond rollup/cube)
# --------------------------------------------------------------------------

_GROUPING_SETS_ORACLE = """
SELECT
  o_orderstatus,
  o_orderpriority,
  count(*) AS n_orders,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@register("agg_grouping_sets", _GROUPING_SETS_ORACLE, doc="explicit GROUPING SETS")
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactness: the grand-total grouping set sums millions of doubles at
    scale, where float accumulation order crosses the 2-decimal rounding
    boundary (diverged at sf1.0). Summing integer cents keeps the fold
    exact in both engines; the /100 is one deterministic IEEE division."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT
          o_orderstatus,
          o_orderpriority,
          count(*) AS n_orders,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


# --------------------------------------------------------------------------
# Bag-semantics set operations
# --------------------------------------------------------------------------

_BAG_SETOPS_ORACLE = """
WITH a AS (SELECT l_returnflag AS flag FROM lineitem WHERE l_suppkey <= 5),
     b AS (SELECT l_returnflag AS flag FROM lineitem WHERE l_suppkey BETWEEN 3 AND 8)
SELECT 'intersect_all' AS op, flag, count(*) AS n FROM (SELECT flag FROM a INTERSECT ALL SELECT flag FROM b) GROUP BY flag
UNION ALL
SELECT 'except_all' AS op, flag, count(*) AS n FROM (SELECT flag FROM a EXCEPT ALL SELECT flag FROM b) GROUP BY flag
ORDER BY op, flag
"""


@register("set_operations_bag", _BAG_SETOPS_ORACLE, doc="INTERSECT ALL / EXCEPT ALL (bag semantics)")
def set_operations_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_suppkey") <= 5).select(F.col("l_returnflag").alias("flag"))
    b = li.filter((F.col("l_suppkey") >= 3) & (F.col("l_suppkey") <= 8)).select(
        F.col("l_returnflag").alias("flag")
    )

    def counted(df: DataFrame, label: str) -> DataFrame:
        return df.groupBy("flag").agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(label).alias("op"), "flag", "n"
        )

    return (
        counted(a.intersectAll(b), "intersect_all")
        .unionByName(counted(a.exceptAll(b), "except_all"))
        .orderBy("op", "flag")
    )


# --------------------------------------------------------------------------
# Pandas UDF (vectorized scalar) + Pandas UDAF (grouped agg)
# --------------------------------------------------------------------------

_PANDAS_UDF_ORACLE = """
SELECT
  o_orderkey,
  floor(o_totalprice * CASE WHEN o_orderpriority = '1-URGENT' THEN 1.10 ELSE 1.05 END * 100 + 0.5) / 100
    AS adjusted_price
FROM orders
WHERE o_orderkey <= 200
ORDER BY o_orderkey
"""


@register("pandas_udf_scalar", _PANDAS_UDF_ORACLE, doc="vectorized scalar Pandas UDF (Arrow batches)")
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sanctioned Python path: Arrow-vectorized, ~10-100× faster than
    row-at-a-time UDFs. Logic deliberately SQL-expressible so the oracle
    validates the Arrow round-trip itself. Closure-defined (workers in
    the driver's harness can't import this package)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def adjust(price: pd.Series, priority: pd.Series) -> pd.Series:
        # No rounding here: pandas .round is banker's (half-even) while
        # SQL round is half-up — rounding happens Spark-side below.
        return price * priority.map(lambda p: 1.10 if p == "1-URGENT" else 1.05)

    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    # Explicit floor-based half-up round: engines' built-in round() take
    # different views of a double sitting at the .xx5 representation
    # boundary (Spark decimalizes the double's exact value; DuckDB scales
    # in float — observed flipping 114387.945 at sf0.1). floor(x·100+0.5)
    # is the same IEEE op sequence on both engines → bit-identical.
    adjusted = adjust("o_totalprice", "o_orderpriority")
    return orders.select(
        "o_orderkey",
        (F.floor(adjusted * 100 + 0.5) / 100).alias("adjusted_price"),
    ).orderBy("o_orderkey")


_PANDAS_UDAF_ORACLE = """
SELECT
  o_orderpriority,
  round(sum(o_totalprice * o_totalprice) / sum(o_totalprice), 2) AS self_weighted_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("pandas_udaf_grouped", _PANDAS_UDAF_ORACLE, doc="grouped-agg Pandas UDAF")
def pandas_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF: whole group's column arrives as one
    pd.Series per group. Scale note: group contents must fit an executor —
    for unbounded groups prefer two-pass built-in aggs (as the oracle
    shows this one could be)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def self_weighted_mean(v: pd.Series) -> float:
        return float((v * v).sum() / v.sum())  # rounding Spark-side (half-up)

    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.round(self_weighted_mean("o_totalprice"), 2).alias("self_weighted_price"))
        .orderBy("o_orderpriority")
    )


_APPLY_IN_PANDAS_ORACLE = """
WITH ranked AS (
  SELECT
    o_custkey, o_orderkey, o_totalprice,
    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
    max(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_max
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice, rn, cust_max
FROM ranked
WHERE rn <= 2
ORDER BY o_custkey, rn
"""


@register("apply_in_pandas_grouped", _APPLY_IN_PANDAS_ORACLE, doc="grouped-map applyInPandas")
def apply_in_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map: each customer's orders arrive as one pandas frame;
    emits that customer's top-2 with the group max attached (max, not
    mean: pandas pairwise summation and SQL sequential summation disagree
    in the last ulp, which flips rounding at scale — max is exact). The
    oracle proves the equivalent window plan — applyInPandas is for when
    the per-group logic ISN'T window-expressible; here it validates the
    group-batch plumbing."""

    def top2_with_max(pdf):
        import pandas as _pd  # noqa: F401 - self-contained for pickling

        pdf = pdf.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        out = pdf.head(2).copy()
        out["rn"] = range(1, len(out) + 1)
        out["cust_max"] = pdf["o_totalprice"].max()
        return out[["o_custkey", "o_orderkey", "o_totalprice", "rn", "cust_max"]]

    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return (
        orders.groupBy("o_custkey")
        .applyInPandas(
            top2_with_max,
            "o_custkey long, o_orderkey long, o_totalprice double, rn long, cust_max double",
        )
        .orderBy("o_custkey", "rn")
    )


# --------------------------------------------------------------------------
# Grouped applyInArrow (RecordBatch-streaming group kernel)
# --------------------------------------------------------------------------

_APPLY_IN_ARROW_ORACLE = """
SELECT lang,
       CAST(count(*) AS BIGINT)    AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


@register(
    "apply_in_arrow_grouped",
    _APPLY_IN_ARROW_ORACLE,
    doc="grouped applyInArrow — RecordBatch-iterator kernel, no pandas materialization",
)
def apply_in_arrow_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 grouped-map ``applyInArrow`` in its RecordBatch-ITERATOR
    form (4.1+): the group's rows stream through the kernel batch by
    batch — the group is NEVER materialized whole, so a skewed group
    cannot blow worker memory the way the table-at-once form (or
    applyInPandas) can. Aggregates fold incrementally with
    ``pyarrow.compute`` C++ kernels; no pandas object ever exists.

    This closes the Arrow surface alongside `embedding_norms_arrow`
    (ungrouped mapInArrow) and `apply_in_pandas_grouped` (pandas
    grouped-map). Would-be 100 TB shape: one shuffle on the group key,
    constant state per group in the kernel. The simple sums here exist
    to pin the API against a DuckDB oracle — real use is any per-group
    logic built-ins can't express."""
    from typing import Iterator, Tuple

    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load(spark, sf_dir, "documents").select("lang", "n_chars")

    # The RecordBatch-iterator form is selected by these type hints
    # (pyspark inspects them; an unhinted generator is rejected).
    def stats(
        keys: Tuple[pa.Scalar, ...], batches: Iterator[pa.RecordBatch]
    ) -> Iterator[pa.RecordBatch]:
        n = 0
        total = 0
        mx = None
        for batch in batches:
            col = batch.column("n_chars")
            n += len(batch)
            total += pc.sum(col).as_py() or 0
            bmax = pc.max(col).as_py()
            if bmax is not None and (mx is None or bmax > mx):
                mx = bmax
        yield pa.RecordBatch.from_pydict(
            {
                "lang": [keys[0].as_py()],
                "n_docs": [n],
                "total_chars": [total],
                "max_chars": [mx],
            }
        )

    return (
        docs.groupBy("lang")
        .applyInArrow(
            stats,
            "lang string, n_docs bigint, total_chars bigint, max_chars bigint",
        )
        .orderBy("lang")
    )
