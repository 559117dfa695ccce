"""Round 12, wave 3: the new analytics/curation operators — two-sample
KS, 1-D Wasserstein, Flesch readability, Levenshtein rescoring, and the
cross-source shared-substring matrix."""

from __future__ import annotations

import numpy as np
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


class TestKsTest:
    def test_matches_oracle(self, spark, sf_dir, oracle_con):
        pdf = _cross_check(spark, sf_dir, oracle_con, "stats_ks_test")
        assert len(pdf) == 1
        row = pdf.iloc[0]
        assert 0 <= row["d_ppm"] <= 1_000_000
        assert row["d_num"] <= row["n1"] * row["n2"]

    def test_against_scipy_free_replay(self, spark, sf_dir):
        """Pure-Python replay of D on the raw parquet — no Spark, no SQL."""
        row = all_queries()["stats_ks_test"].builder(spark, sf_dir).toPandas().iloc[0]
        orders = pd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_totalprice", "o_orderpriority"]
        )
        cents = (orders["o_totalprice"] * 100).round().astype("int64")
        g1 = orders["o_orderpriority"] < "3"
        x1 = np.sort(cents[g1].to_numpy())
        x2 = np.sort(cents[~g1].to_numpy())
        n1, n2 = len(x1), len(x2)
        grid = np.unique(cents.to_numpy())
        c1 = np.searchsorted(x1, grid, side="right")
        c2 = np.searchsorted(x2, grid, side="right")
        d_num = int(np.max(np.abs(c1.astype(object) * n2 - c2.astype(object) * n1)))
        assert (row["n1"], row["n2"], row["d_num"]) == (n1, n2, d_num)


class TestWasserstein:
    def test_matches_oracle(self, spark, sf_dir, oracle_con):
        pdf = _cross_check(spark, sf_dir, oracle_con, "stats_wasserstein_1d")
        row = pdf.iloc[0]
        # W1 dominates the mean gap (triangle inequality, floor-monotone).
        assert row["w1_cents"] >= row["mean_gap_cents"] >= 0

    def test_against_python_replay(self, spark, sf_dir):
        row = all_queries()["stats_wasserstein_1d"].builder(spark, sf_dir).toPandas().iloc[0]
        orders = pd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_totalprice", "o_orderpriority"]
        )
        cents = (orders["o_totalprice"] * 100).round().astype("int64")
        g1 = (orders["o_orderpriority"] < "3").to_numpy()
        grid = np.unique(cents.to_numpy())
        x1 = np.sort(cents.to_numpy()[g1])
        x2 = np.sort(cents.to_numpy()[~g1])
        n1, n2 = len(x1), len(x2)
        c1 = np.searchsorted(x1, grid, side="right").astype(object)
        c2 = np.searchsorted(x2, grid, side="right").astype(object)
        num = sum(
            abs(a * n2 - b * n1) * int(dv)
            for a, b, dv in zip(c1[:-1], c2[:-1], np.diff(grid))
        )
        assert row["w1_cents"] == num // (n1 * n2)


class TestFlesch:
    def test_matches_oracle(self, spark, sf_dir, oracle_con):
        pdf = _cross_check(spark, sf_dir, oracle_con, "text_readability_flesch")
        assert (pdf["n_syllables"] > 0).all()

    def test_formula_is_integer_exact(self, spark, sf_dir):
        pdf = all_queries()["text_readability_flesch"].builder(spark, sf_dir).toPandas()
        for _, r in pdf.iterrows():
            want = (
                206835
                - (1015 * r["n_words"]) // r["n_sentences"]
                - (84600 * r["n_syllables"]) // r["n_words"]
            )
            assert r["flesch_milli"] == want


class TestLevenshteinRescore:
    def test_matches_oracle(self, spark, sf_dir, oracle_con):
        pdf = _cross_check(spark, sf_dir, oracle_con, "dedup_levenshtein_rescore")
        assert len(pdf) > 0, "fixture has near-dup candidates"
        assert (pdf["lev"] <= pdf[["len_a", "len_b"]].max(axis=1)).all()
        assert (pdf["lev_sim_ppm"] <= 1_000_000).all()

    def test_engines_agree_on_levenshtein_semantics(self, spark, oracle_con):
        """Spark vs DuckDB levenshtein on adversarial strings under the
        op's ASCII projection — raw engines DISAGREE on unicode (DuckDB
        counts byte edits: 'café'→'cafe' is 2 there, 1 in Spark), which
        is exactly why the operator projects non-ASCII to '?' first."""
        proj = lambda s: "".join(c if ord(c) < 128 else "?" for c in s)
        cases = [
            ("kitten", "sitting"),
            ("", "abc"),
            ("flaw", "lawn"),
            ("café", "cafe"),
            ("ab", "ba"),
            ("naïve", "naive"),
        ]
        # Pin the raw divergence so the projection stays load-bearing.
        raw_duck = oracle_con.execute("SELECT levenshtein('café', 'cafe')").fetchone()[0]
        assert raw_duck == 2, "DuckDB byte-oriented levenshtein changed; revisit projection"
        for a, b in cases:
            got = spark.sql(
                "SELECT levenshtein(:a, :b) AS d", args={"a": proj(a), "b": proj(b)}
            ).collect()[0]["d"]
            want = oracle_con.execute(
                "SELECT levenshtein(?, ?)", [proj(a), proj(b)]
            ).fetchone()[0]
            assert got == want, (a, b, got, want)


class TestSubstringSourceMatrix:
    def test_matches_oracle(self, spark, sf_dir, oracle_con):
        pdf = _cross_check(spark, sf_dir, oracle_con, "dedup_substring_source_matrix")
        assert (pdf["source_a"] < pdf["source_b"]).all()
        assert (pdf["n_shared_grams"] > 0).all()

    def test_symmetric_free_no_self_pairs(self, spark, sf_dir):
        pdf = (
            all_queries()["dedup_substring_source_matrix"].builder(spark, sf_dir).toPandas()
        )
        seen = set(map(tuple, pdf[["source_a", "source_b"]].values))
        assert all((b, a) not in seen for a, b in seen)
