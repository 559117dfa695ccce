"""Third-engine recomputes + plan pins for the round-8 additions.

The DuckDB oracle compare is the driver's job; these tests re-derive the
same answers in plain Python and pin the plan shapes that keep each
operator on its scale path."""

from __future__ import annotations

import pandas as pd

from gluettalax_spark.registry import queries
from tests.test_plans import physical_plan


# --------------------------------------------------------------------------
# jobs_run_history_stats — control-plane dogfood
# --------------------------------------------------------------------------


def _run_history_brute(sf_dir: str):
    """Plain-pandas re-derivation of the deterministic replay + stats."""
    orders = (
        pd.read_parquet(f"{sf_dir}/orders.parquet")
        .sort_values("o_orderkey")
        .head(500)
    )
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")[["n_nationkey", "n_name"]]
    h = orders.merge(nation, left_on=orders["o_custkey"] % 25, right_on="n_nationkey")
    h["state"] = h["o_orderstatus"].map(
        {"F": "SUCCEEDED", "O": "RUNNING", "P": "FAILED"}
    )
    # Python round() is half-even; cents values never land on exact .5
    # (the fractional part is double representation error), so it agrees
    # with Spark/DuckDB round here.
    h["exec"] = (h["o_totalprice"] * 100).round().astype("int64") % 86400 / 100.0
    h["run_id"] = h["o_orderkey"].astype(str)

    out = []
    for job, g in h.groupby("n_name"):
        n = len(g)
        n_ok = int((g["state"] == "SUCCEEDED").sum())
        p50 = g["exec"].quantile(0.5, interpolation="linear")
        last = g.sort_values(["o_orderdate", "run_id"], ascending=[False, False]).iloc[0]
        out.append((job, n, n_ok, n_ok / n, p50, last["state"]))
    return sorted(out)


def test_run_history_matches_python_recompute(spark, sf_dir):
    rows = queries()["jobs_run_history_stats"](spark, sf_dir).collect()
    got = [
        (r["job_name"], r["n_runs"], r["n_succeeded"], r["success_rate"],
         r["p50_exec_sec"], r["last_run_state"])
        for r in rows
    ]
    assert got == _run_history_brute(sf_dir)


def test_run_history_replay_is_bounded(spark, sf_dir):
    """The replay collect must stay control-plane sized: the orders LIMIT
    compiles to TakeOrderedAndProject (no global sort), and the analytics
    window is partitioned by job_name (no single-task funnel)."""
    from gluettalax_spark.operators.runhistory import _N_RUNS, _replayed_registry

    reg = _replayed_registry(spark, sf_dir)
    assert 0 < len(reg._runs) <= _N_RUNS

    plan = physical_plan(queries()["jobs_run_history_stats"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# Rows-only witness manifest (VERDICT r7 task 4)
# --------------------------------------------------------------------------


def test_every_rows_only_key_declares_and_emits_its_witness(spark, sf_dir):
    """Registration already refuses an oracle-less key without witness
    columns; this pins the other half — every declared witness column is
    actually present in the builder's output schema, so renaming a column
    can't silently orphan the certificate the tests assert elsewhere."""
    from gluettalax_spark import registry

    for name, spec in registry.all_queries().items():
        if spec.oracle is not None:
            continue
        assert spec.witness, f"{name}: rows-only without witness columns"
        cols = set(spec.builder(spark, sf_dir).columns)
        missing = [w for w in spec.witness if w not in cols]
        assert not missing, f"{name}: witness columns missing from output: {missing}"


def test_run_history_roundtrips_through_list_runs(spark, sf_dir):
    """The replayed history serves the reference's A3/C5 surfaces too —
    same records, same plans as live runs."""
    from gluettalax_spark.operators.runhistory import _replayed_registry

    reg = _replayed_registry(spark, sf_dir)
    some_job = next(iter(reg._runs.values())).job_name
    reg.register(some_job, lambda spark: None)  # list_runs validates the name
    rows = reg.list_runs(spark, name=some_job, lines=3)
    assert 0 < len(rows) <= 3
    assert all(r["job_name"] == some_job for r in rows)
    # newest-first (D6 ordering)
    starts = [r["started_on"] for r in rows]
    assert starts == sorted(starts, reverse=True)
