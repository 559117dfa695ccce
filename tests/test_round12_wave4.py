"""Round 12, wave 4: radius-2 harmonic centrality and the
time-to-convert histogram."""

from __future__ import annotations

import pytest

import pandas as pd

from gluettalax_spark.registry import all_queries
from tests.harness import compare, exact_hash_compare


def _cross_check(spark, sf_dir, oracle_con, name):
    spec = all_queries()[name]
    got = spec.builder(spark, sf_dir)
    want = oracle_con.execute(spec.resolve_oracle(sf_dir)).df()
    compare(got, want)
    assert exact_hash_compare(got, want)
    return got.toPandas()


class TestHarmonic2Hop:
    @pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
    def test_matches_oracle(self, spark, sf_dir, oracle_con):
        pdf = _cross_check(spark, sf_dir, oracle_con, "graph_harmonic_2hop")
        assert len(pdf) == 20
        assert (
            pdf["harmonic_milli"] == pdf["n_1hop"] * 1000 + pdf["n_2hop"] * 500
        ).all()
        # top-20 ordering is (score desc, node) — a total order
        assert list(pdf["harmonic_milli"]) == sorted(pdf["harmonic_milli"], reverse=True)

    @pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
    def test_two_hop_sets_replay_in_python(self, spark, sf_dir):
        """Independent replay: rebuild N1/N2 from the operator's own edge
        list with plain Python sets (cap replayed) and compare scores."""
        from gluettalax_spark.operators.graph import (
            _HARMONIC_MAX_DEG,
            cooccurrence_edges,
        )

        edges = [(r["pa"], r["pb"]) for r in cooccurrence_edges(spark, sf_dir).collect()]
        nbr: dict[int, set[int]] = {}
        for a, b in edges:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
        eset = set(edges)
        two: dict[int, set[int]] = {n: set() for n in nbr}
        for c, ns in nbr.items():
            if len(ns) > _HARMONIC_MAX_DEG:
                continue
            ns_sorted = sorted(ns)
            for i, x in enumerate(ns_sorted):
                for y in ns_sorted[i + 1 :]:
                    if (x, y) not in eset:
                        two[x].add(y)
                        two[y].add(x)
        want = {n: len(nbr[n]) * 1000 + len(two[n]) * 500 for n in nbr}
        top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        pdf = all_queries()["graph_harmonic_2hop"].builder(spark, sf_dir).toPandas()
        got = list(zip(pdf["node"], pdf["harmonic_milli"]))
        assert got == top


class TestFunnelLatency:
    def test_matches_oracle(self, spark, sf_dir, oracle_con):
        pdf = _cross_check(spark, sf_dir, oracle_con, "events_funnel_latency")
        assert len(pdf) > 0
        assert (pdf["bucket_start_min"] == pdf["bucket"] * 30).all()
        assert pdf["cum_ppm"].iloc[-1] == 1_000_000
        assert pdf["cum_views"].is_monotonic_increasing

    @pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
    def test_total_matches_first_conversions(self, spark, sf_dir):
        """Σ n_views == #views with ≥1 purchase in the horizon, replayed
        from the already-oracle-checked conversion pairs."""
        pdf = all_queries()["events_funnel_latency"].builder(spark, sf_dir).toPandas()
        pairs = (
            all_queries()["events_conversion_pairs"].builder(spark, sf_dir).toPandas()
        )
        assert pdf["n_views"].sum() == pairs["view_id"].nunique()
