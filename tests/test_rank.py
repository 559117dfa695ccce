"""Unit tests for operators/rank.py — the distributed exact-global-rank
that replaces unpartitioned windows in ntile/RFM/pareto.

The closed-form ntile/percent_rank/cume_dist are checked against Spark's
own window functions (the semantics authority) over many (n, k) shapes,
including n < k, and the rank itself against row_number() over a global
window. Determinism is pinned by running the distributed form twice.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gluettalax_spark.operators.rank import (
    cume_dist_from_rank,
    exact_global_rank,
    ntile_from_rank,
    percent_rank_from_rank,
)


def _sample(spark, n, seed=7):
    # Non-unique sort values (collisions on v) + unique id tiebreak: the
    # exact shape the production orderings have.
    return spark.range(n).select(
        F.col("id"),
        (F.hash(F.col("id") + seed) % 97).alias("v"),
    )


@pytest.mark.parametrize("n", [1, 3, 250, 1000])
def test_exact_rank_matches_global_window(spark, n):
    df = _sample(spark, n)
    order = [F.col("v").desc(), F.col("id")]
    got = exact_global_rank(df, order, "rn", num_partitions=7)
    exp = df.select("id", F.row_number().over(Window.orderBy(*order)).cast("long").alias("rn"))
    assert (
        got.select("id", "rn").exceptAll(exp).count() == 0
        and exp.exceptAll(got.select("id", "rn")).count() == 0
    )
    # _n is the constant total row count.
    assert got.select("_n").distinct().collect()[0][0] == n


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (5, 4), (250, 7), (1000, 3)])
def test_closed_forms_match_spark_window_functions(spark, n, k):
    df = _sample(spark, n, seed=k)
    order = [F.col("v").asc(), F.col("id")]
    w = Window.orderBy(*order)
    exp = df.select(
        "id",
        F.ntile(k).over(w).cast("long").alias("nt"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    ranked = exact_global_rank(df, order, "rn", num_partitions=5)
    got = ranked.select(
        "id",
        ntile_from_rank(F.col("rn"), F.col("_n"), k).alias("nt"),
        percent_rank_from_rank(F.col("rn"), F.col("_n")).alias("pr"),
        cume_dist_from_rank(F.col("rn"), F.col("_n")).alias("cd"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_exact_rank_deterministic_across_runs(spark):
    df = _sample(spark, 500, seed=11)
    order = [F.col("v").desc(), F.col("id")]
    a = sorted(map(tuple, exact_global_rank(df, order, "rn", num_partitions=6).collect()))
    b = sorted(map(tuple, exact_global_rank(df, order, "rn", num_partitions=6).collect()))
    assert a == b


def test_exact_rank_is_a_permutation(spark):
    """Ranks are exactly 1..n — no gap or duplicate even when range
    partition boundaries split ties of the non-unique leading sort key."""
    df = _sample(spark, 777, seed=3)
    got = exact_global_rank(df, [F.col("v").asc(), F.col("id")], "rn", num_partitions=9)
    ranks = sorted(r[0] for r in got.select("rn").collect())
    assert ranks == list(range(1, 778))


def test_exact_rank_all_ties_on_leading_key(spark):
    """Worst tie case: EVERY row shares the leading sort value, so range
    partition boundaries fall entirely inside one tie group and only the
    id tiebreak orders rows — ranks must still be the exact permutation."""
    df = spark.range(1000).select(F.lit(42).alias("v"), F.col("id"))
    got = exact_global_rank(df, [F.col("v").asc(), F.col("id")], "rn", num_partitions=8)
    rows = {r.id: r.rn for r in got.collect()}
    assert rows == {i: i + 1 for i in range(1000)}


def test_exact_rank_empty_and_single_partition(spark):
    empty = spark.range(0).select(F.col("id"), (F.col("id") % 3).alias("v"))
    assert exact_global_rank(empty, [F.col("v"), F.col("id")], "rn").count() == 0
    one = _sample(spark, 50)
    got = exact_global_rank(one, [F.col("v"), F.col("id")], "rn", num_partitions=1)
    assert sorted(r.rn for r in got.collect()) == list(range(1, 51))


# --------------------------------------------------------------------------
# grouped_running_sum
# --------------------------------------------------------------------------

@pytest.mark.parametrize("n,groups,npart", [(1, 1, 4), (50, 3, 4), (1000, 7, 5), (1000, 7, 1)])
def test_grouped_running_sum_matches_naive_window(spark, n, groups, npart):
    """The distributed grouped running sum must equal the single-task
    Window.partitionBy(group) form it replaces, for degenerate and
    multi-partition shapes (including groups that span partitions)."""
    from gluettalax_spark.operators.rank import grouped_running_sum

    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % groups).cast("string").alias("g"),
        (F.hash("id") % 50 + 50).alias("val"),
    )
    got = grouped_running_sum(df, ["g"], ["id"], "val", "run", num_partitions=npart)
    w = Window.partitionBy("g").orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    exp = df.withColumn("run", F.sum("val").over(w))
    assert got.select("id", "g", "run").exceptAll(exp.select("id", "g", "run")).count() == 0
    assert exp.select("id", "g", "run").exceptAll(got.select("id", "g", "run")).count() == 0


def test_grouped_running_sum_deterministic(spark):
    from gluettalax_spark.operators.rank import grouped_running_sum

    df = spark.range(500).select(
        F.col("id"), (F.col("id") % 5).cast("string").alias("g"), F.lit(3).alias("val")
    )
    a = grouped_running_sum(df, ["g"], ["id"], "val", "run", num_partitions=6).collect()
    b = grouped_running_sum(df, ["g"], ["id"], "val", "run", num_partitions=6).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_grouped_running_sum_no_group_partitioned_data_window(spark):
    """The plan must not contain a WindowExec partitioned ONLY by the
    group column over the raw data — every data-path window is keyed by
    (_pid, group); the group-only window may appear solely over the
    metadata-scale offsets aggregate."""
    from gluettalax_spark.operators.rank import grouped_running_sum

    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("g"), F.lit(1).alias("val")
    )
    out = grouped_running_sum(df, ["g"], ["id"], "val", "run", num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for ln in plan.splitlines():
        if "windowspecdefinition(" in ln and "_pid" not in ln:
            # the offsets prefix window orders by _pid — anything else
            # would be the single-task-per-group shape we banned
            raise AssertionError(f"group-only data window in plan: {ln.strip()[:160]}")
