"""Round 11, wave 3: Adamic-Adar link prediction, inter-purchase gaps,
and the Grubbs outlier test — oracle cross-checks plus independent
recomputations."""

from __future__ import annotations

import math

import pandas as pd

from gluettalax_spark.registry import all_queries


def _cross_check(spark, sf_dir, oracle_con, name):
    spec = all_queries()[name]
    assert spec.oracle is not None
    got = spec.builder(spark, sf_dir).toPandas()
    want = oracle_con.execute(spec.oracle).df()
    assert sorted(got.columns) == sorted(want.columns)
    cols = sorted(got.columns)
    a = sorted(map(repr, got[cols].values.tolist()))
    b = sorted(map(repr, want[cols].values.tolist()))
    assert a == b, f"{name}: spark/oracle mismatch\nspark={a[:3]}\noracle={b[:3]}"
    return got


class TestAdamicAdar:
    def test_matches_oracle(self, spark, sf_dir, oracle_con):
        got = _cross_check(spark, sf_dir, oracle_con, "graph_adamic_adar")
        assert len(got) <= 20

    def test_scores_match_brute_python(self, spark, sf_dir):
        """Independent pure-Python recompute over the same co-occurrence
        graph: AA(a,b) = sum over common neighbors z of floor(1e8/ln d_z),
        non-edges only, hub centers excluded."""
        from collections import defaultdict

        from gluettalax_spark.operators.graph import (
            MAX_BASKET,
            _LINKPRED_MAX_DEG,
            _TRI_MIN_SUPPORT,
        )

        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        ).drop_duplicates()
        pair_count: dict[tuple[int, int], int] = defaultdict(int)
        for _, grp in li.groupby("l_orderkey"):
            ps = sorted(grp["l_partkey"].tolist())
            if len(ps) > MAX_BASKET:
                continue
            for i in range(len(ps)):
                for j in range(i + 1, len(ps)):
                    pair_count[(ps[i], ps[j])] += 1
        edges = {e for e, c in pair_count.items() if c >= _TRI_MIN_SUPPORT}
        nbrs: dict[int, set] = defaultdict(set)
        for a, b in edges:
            nbrs[a].add(b)
            nbrs[b].add(a)
        aa: dict[tuple[int, int], int] = defaultdict(int)
        cn: dict[tuple[int, int], int] = defaultdict(int)
        for z, ns in nbrs.items():
            if len(ns) > _LINKPRED_MAX_DEG:
                continue
            w = math.floor(1e8 / math.log(len(ns)))
            sn = sorted(ns)
            for i in range(len(sn)):
                for j in range(i + 1, len(sn)):
                    aa[(sn[i], sn[j])] += w
                    cn[(sn[i], sn[j])] += 1
        cands = {k: v for k, v in aa.items() if k not in edges}
        top = sorted(cands.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        got = all_queries()["graph_adamic_adar"].builder(spark, sf_dir).toPandas()
        assert [
            (int(r["node_a"]), int(r["node_b"]), int(r["aa_e8"]), int(r["common_neighbors"]))
            for _, r in got.iterrows()
        ] == [(a, b, s, cn[(a, b)]) for (a, b), s in top]

    def test_rare_neighbor_outranks_hub(self, spark, tmp_path):
        """The whole point of AA over Jaccard: a pair sharing one RARE
        neighbor (degree 2) must outscore a pair sharing one HUB neighbor
        (high degree), because floor(1e8/ln 2) > floor(1e8/ln d_hub)."""
        rows = []
        oid = 0
        # Rare center z=1 connects parts 10,11 (and nothing else).
        # Build each co-occurrence edge twice (support >= 2).
        for _ in range(2):
            for basket in ([1, 10], [1, 11]):
                for p in basket:
                    rows.append((oid, p))
                oid += 1
        # Hub center z=2 connects parts 20,21 plus 6 other parts.
        hub_parts = [20, 21, 30, 31, 32, 33, 34, 35]
        for _ in range(2):
            for p2 in hub_parts:
                rows.append((oid, 2))
                rows.append((oid, p2))
                oid += 1
        li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
        li["l_suppkey"] = 1
        li["l_quantity"] = 1.0
        d = str(tmp_path)
        li.to_parquet(f"{d}/lineitem.parquet")
        got = all_queries()["graph_adamic_adar"].builder(spark, d).toPandas()
        scores = {
            (int(r["node_a"]), int(r["node_b"])): int(r["aa_e8"])
            for _, r in got.iterrows()
        }
        assert (10, 11) in scores and (20, 21) in scores
        assert scores[(10, 11)] > scores[(20, 21)]
        assert scores[(10, 11)] == math.floor(1e8 / math.log(2))


class TestInterpurchaseGaps:
    def test_matches_oracle(self, spark, sf_dir, oracle_con):
        got = _cross_check(spark, sf_dir, oracle_con, "orders_interpurchase_gaps")
        assert len(got) == 1

    def test_percentiles_ordered_and_exact(self, spark, sf_dir, oracle_con):
        row = (
            all_queries()["orders_interpurchase_gaps"].builder(spark, sf_dir)
            .toPandas()
            .iloc[0]
        )
        assert row["p25_days"] <= row["p50_days"] <= row["p75_days"] <= row["p90_days"]
        # Independent recompute via pandas: same lag construction.
        orders = oracle_con.execute(
            "SELECT o_custkey, o_orderdate, o_orderkey FROM orders"
        ).df()
        orders = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        gaps = []
        for _, g in orders.groupby("o_custkey"):
            ds = pd.to_datetime(g["o_orderdate"]).tolist()
            gaps += [(ds[i] - ds[i - 1]).days for i in range(1, len(ds))]
        gaps.sort()
        n = len(gaps)
        assert row["n_gaps"] == n
        for p, col in ((25, "p25_days"), (50, "p50_days"), (75, "p75_days"), (90, "p90_days")):
            rank = (n * p + 99) // 100
            assert row[col] == gaps[rank - 1], (p, row[col], gaps[rank - 1])
        assert row["mean_gap_milli"] == sum(gaps) * 1000 // n


class TestGrubbs:
    def test_matches_oracle(self, spark, sf_dir, oracle_con):
        got = _cross_check(spark, sf_dir, oracle_con, "stats_grubbs_test")
        assert len(got) == 1

    def test_matches_numpy(self, spark, sf_dir):
        """Independent float recompute: the integer argmax must select
        numpy's argmax of |x - mean|, and G must match to 6 dp."""
        import numpy as np

        row = all_queries()["stats_grubbs_test"].builder(spark, sf_dir).toPandas().iloc[0]
        orders = pd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
        )
        orders["cents"] = (orders["o_totalprice"] * 100).round().astype("int64")
        daily = orders.groupby("o_orderdate")["cents"].sum()
        days = pd.date_range(daily.index.min(), daily.index.max(), freq="D")
        x = daily.reindex(days.date, fill_value=0).to_numpy(dtype=np.float64)
        dev = np.abs(x - x.mean())
        t_star = int(dev.argmax())
        g = dev.max() / x.std(ddof=1)
        assert int(row["outlier_t"]) == t_star
        assert abs(row["g_stat"] - round(g, 6)) <= 1e-6
        assert int(row["x_outlier"]) == int(x[t_star])
