"""Round 11, wave 2: the five new operators (hazard, ACF, Lorenz,
Brown-Forsythe, ARI) — each cross-checked against its registered DuckDB
oracle at the test SF plus property pins the driver's hash can't
express."""

from __future__ import annotations

import pandas as pd
import pytest

from gluettalax_spark.registry import all_queries


def _cross_check(spark, sf_dir, oracle_con, name):
    spec = all_queries()[name]
    assert spec.oracle is not None, f"{name} must be oracle-checked"
    got = spec.builder(spark, sf_dir).toPandas()
    want = oracle_con.execute(spec.oracle).df()
    assert sorted(got.columns) == sorted(want.columns), (got.columns, want.columns)
    cols = sorted(got.columns)
    a = sorted(map(repr, got[cols].values.tolist()))
    b = sorted(map(repr, want[cols].values.tolist()))
    assert a == b, f"{name}: spark/oracle mismatch\nspark={a[:3]}\noracle={b[:3]}"
    return got


class TestHazardRate:
    def test_matches_oracle(self, spark, sf_dir, oracle_con):
        got = _cross_check(spark, sf_dir, oracle_con, "events_hazard_rate")
        assert len(got) > 0

    def test_hazard_properties(self, spark, sf_dir):
        got = all_queries()["events_hazard_rate"].builder(spark, sf_dir).toPandas()
        # h(k) = d/n_risk in ppm: bounded by 1e6, d <= n_risk always.
        assert (got["hazard_ppm"] <= 1_000_000).all()
        assert (got["d"] <= got["n_risk"]).all()
        # Nelson-Aalen cumulative hazard is nondecreasing in day order.
        g = got.sort_values("day")
        assert g["cum_hazard_ppm"].is_monotonic_increasing
        # Exact integer identity: cum is the running sum of the ppms.
        assert (g["hazard_ppm"].cumsum() == g["cum_hazard_ppm"]).all()


class TestAutocorrelation:
    def test_matches_oracle(self, spark, sf_dir, oracle_con):
        got = _cross_check(spark, sf_dir, oracle_con, "stats_autocorrelation")
        assert len(got) == 7

    def test_acf_bounds_and_pairs(self, spark, sf_dir):
        got = (
            all_queries()["stats_autocorrelation"].builder(spark, sf_dir)
            .toPandas()
            .sort_values("lag")
        )
        assert list(got["lag"]) == [1, 2, 3, 4, 5, 6, 7]
        # |r_k| <= 1 by Cauchy-Schwarz (the truncated-sum estimator can
        # exceed it only on degenerate two-point series; the dense grid
        # isn't one).
        assert (got["acf"].abs() <= 1.0).all()
        # n_pairs = n - k exactly (dense grid, no gaps).
        assert ((got["n"] - got["lag"]) == got["n_pairs"]).all()

    def test_acf_matches_numpy_on_synthetic(self, spark, tmp_path):
        """Deterministic sawtooth orders fixture: ACF computed by the
        operator == numpy's mean-centered estimator to 6 dp."""
        import numpy as np

        days = pd.date_range("2024-01-01", periods=60, freq="D")
        cents = [(i % 7) * 1000 + 5000 for i in range(60)]  # weekly sawtooth
        orders = pd.DataFrame(
            {
                "o_orderkey": range(60),
                "o_custkey": [1] * 60,
                "o_orderdate": days.date,
                "o_totalprice": [c / 100.0 for c in cents],
            }
        )
        d = str(tmp_path)
        orders.to_parquet(f"{d}/orders.parquet")
        got = (
            all_queries()["stats_autocorrelation"].builder(spark, d)
            .toPandas()
            .sort_values("lag")
        )
        x = np.array(cents, dtype=np.float64)
        mu = x.mean()
        den = ((x - mu) ** 2).sum()
        for _, row in got.iterrows():
            k = int(row["lag"])
            want = (((x[:-k] - mu) * (x[k:] - mu)).sum()) / den
            assert abs(row["acf"] - round(want, 6)) <= 1e-6, (k, row["acf"], want)
        # Weekly sawtooth: lag-7 autocorrelation is the maximum and ~1.
        acf = dict(zip(got["lag"], got["acf"]))
        assert acf[7] == max(acf.values())
        # Truncated-sum estimator on 60 points: (n-7)/n ≈ 0.88 of the
        # infinite-series value 1.0.
        assert acf[7] > 0.85


class TestLorenzCurve:
    def test_matches_oracle(self, spark, sf_dir, oracle_con):
        got = _cross_check(spark, sf_dir, oracle_con, "orders_lorenz_curve")
        assert len(got) == 10

    def test_lorenz_shape(self, spark, sf_dir):
        got = (
            all_queries()["orders_lorenz_curve"].builder(spark, sf_dir)
            .toPandas()
            .sort_values("decile")
        )
        # Deciles ascend by construction (sorted poorest -> richest), so
        # per-decile revenue is nondecreasing and the curve is convex.
        assert got["decile_cents"].is_monotonic_increasing
        assert got["cum_share_ppm"].is_monotonic_increasing
        # Cumulative cents telescope exactly; the last ppm is exactly 1e6
        # (total // total — no floor loss on the final point).
        assert (got["decile_cents"].cumsum() == got["cum_cents"]).all()
        assert got["cum_share_ppm"].iloc[-1] == 1_000_000
        # ntile balance: bucket sizes differ by at most one.
        sizes = got["n_customers"]
        assert sizes.max() - sizes.min() <= 1


class TestLeveneBF:
    def test_matches_oracle(self, spark, sf_dir, oracle_con):
        got = _cross_check(spark, sf_dir, oracle_con, "stats_levene_bf")
        assert len(got) == 1

    def test_f_nonnegative_and_counts(self, spark, sf_dir, oracle_con):
        got = all_queries()["stats_levene_bf"].builder(spark, sf_dir).toPandas()
        row = got.iloc[0]
        assert row["f_stat"] >= 0
        (n_events,) = oracle_con.execute("SELECT count(*) FROM events").fetchone()
        assert row["n"] == n_events
        (k_types,) = oracle_con.execute(
            "SELECT count(DISTINCT event_type) FROM events"
        ).fetchone()
        assert row["k"] == k_types

    def test_equal_spread_groups_give_zero_f(self, spark, tmp_path):
        """Two types with IDENTICAL deviation multisets around their own
        medians -> ss_between of |x-med| is 0, so F is 0 up to the
        documented ssbq floor-quantization (< 1 cent² per group, the
        stats_anova_oneway discipline — F can read epsilon-negative)."""
        ts = pd.Timestamp("2024-01-01")
        rows = []
        for i, (t, base) in enumerate([("a", 10.0), ("b", 50.0)]):
            for off in (-1.0, 0.0, 1.0):
                rows.append((i * 10 + int(off), ts, 1, t, base + off, "{}"))
        df = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        d = str(tmp_path)
        df.to_parquet(f"{d}/events.parquet")
        got = all_queries()["stats_levene_bf"].builder(spark, d).toPandas()
        assert abs(got.iloc[0]["f_stat"]) < 1e-3


class TestReadabilityARI:
    def test_matches_oracle(self, spark, sf_dir, oracle_con):
        got = _cross_check(spark, sf_dir, oracle_con, "text_readability_ari")
        assert len(got) > 0

    def test_hand_computed_fixture(self, spark, tmp_path):
        docs = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "source": ["s1", "s1"],
                "lang": ["en", "en"],
                "text": ["The cat sat. It slept!", "No punctuation here"],
                "n_chars": [22, 19],
            }
        )
        d = str(tmp_path)
        docs.to_parquet(f"{d}/documents.parquet")
        got = all_queries()["text_readability_ari"].builder(spark, d).toPandas()
        row = got.iloc[0]
        # doc1: alnum "ThecatsatItslept" = 16 chars, 5 words, 2 sentences
        # doc2: alnum 17 chars, 3 words, 0 runs -> clamped to 1 sentence
        assert row["n_alnum"] == 16 + 17
        assert row["n_words"] == 8
        assert row["n_sentences"] == 3
        want = (471000 * 33) // 8 + (50000 * 8) // 3 - 2143000
        assert row["ari_milli"] == want
