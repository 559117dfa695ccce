"""Round 12, wave 2: rows-only shrink (VERDICT r11 task #3) — the IVF
quantizer recontract (numpy Lloyd's + rounded argmin, centroid literals
in the oracle) that upgrades `similarity_cluster_purity`,
`similarity_ann_recall_curve`, and `embedding_pq_distortion` to fully
oracle-checked, plus the data-dependent oracle-template plumbing."""

from __future__ import annotations

import pytest

import numpy as np

from gluettalax_spark.registry import all_queries
from tests.harness import compare, exact_hash_compare


def _cross_check(spark, sf_dir, oracle_con, name):
    spec = all_queries()[name]
    got = spec.builder(spark, sf_dir)
    want = oracle_con.execute(spec.resolve_oracle(sf_dir)).df()
    compare(got, want)
    assert exact_hash_compare(got, want)
    return got.toPandas()


class TestOracleTemplates:
    def test_recontracted_keys_have_templates_not_witnesses(self):
        specs = all_queries()
        for name in (
            "similarity_cluster_purity",
            "similarity_ann_recall_curve",
            "embedding_pq_distortion",
            "similarity_topk_ivf",
            "similarity_knn_label_accuracy_ivf",
        ):
            spec = specs[name]
            assert spec.oracle_template is not None, name
            assert spec.oracle is None, name

    def test_oracle_sql_resolves_templates(self):
        """The driver surface must return plain SQL strings for the
        templated keys (resolved at the driver's sf0.01)."""
        from gluettalax_spark.registry import oracle_sql

        sqls = oracle_sql()
        for name in (
            "similarity_cluster_purity",
            "similarity_ann_recall_curve",
            "embedding_pq_distortion",
        ):
            assert isinstance(sqls[name], str) and "SELECT" in sqls[name], name

    def test_template_varies_with_fixture(self):
        """Centroid literals are data-dependent: different corpus dirs
        give different oracle text (same dir → identical text)."""
        spec = all_queries()["similarity_cluster_purity"]
        a = spec.resolve_oracle("/root/testdata/sf0.01")
        b = spec.resolve_oracle("/root/testdata/sf0.1")
        assert a == spec.resolve_oracle("/root/testdata/sf0.01")
        assert a != b


class TestQuantizerDeterminism:
    @pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
    def test_pq_codebooks_spark_vs_numpy(self, spark, sf_dir):
        """The Spark TakeOrdered sample and the pandas vec_id-sorted read
        must train bit-identical codebooks — the premise of embedding the
        numpy twin's literals in the oracle."""
        from gluettalax_spark.operators.ann import _pq_model, _pq_model_np

        b1, d1 = _pq_model(spark, sf_dir)
        b2, d2 = _pq_model_np(sf_dir)
        assert d1 == d2
        assert all(np.array_equal(a, b) for a, b in zip(b1, b2))

    def test_centroid_literals_roundtrip(self, sf_dir):
        """The SQL literal form of every centroid component must parse
        back to the identical float64 (in Python AND in DuckDB)."""
        import duckdb

        from gluettalax_spark.operators.ann import _f64_lit, _ivf_centers_np

        centers = np.asarray(_ivf_centers_np(sf_dir))
        for c in centers:
            for x in c:
                assert float(_f64_lit(x)) == float(x)
        # DuckDB must parse the exponent form as DOUBLE, bit-exact.
        sample = [float(x) for x in centers.ravel()[:32]]
        lits = ", ".join(f"({_f64_lit(x)})" for x in sample)
        got = duckdb.sql(f"SELECT typeof(v), v FROM (VALUES {lits}) t(v)").fetchall()
        assert all(t == "DOUBLE" for t, _ in got)
        assert [v for _, v in got] == sample

    def test_assignment_matches_oracle_rule(self, spark, sf_dir):
        """Spark's min(struct(round(dist,4), cell)) argmin replayed in
        pure numpy with the same rounding + tiebreak."""
        import pandas as pd

        from gluettalax_spark.operators.ann import _assignments, _ivf_centers_np

        assigned, _ = _assignments(spark, sf_dir)
        got = {r["vec_id"]: r["cell"] for r in assigned.select("vec_id", "cell").collect()}
        pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        centers = np.asarray(_ivf_centers_np(sf_dir))
        for r in pdf.itertuples():
            v = np.asarray(r.embedding, dtype=np.float64)
            # sequential fold, then round — the shared cross-engine rule
            dists = [round(float(sum((v - c) ** 2)), 4) for c in centers]
            want = min(range(len(centers)), key=lambda i: (dists[i], i))
            assert got[int(r.vec_id)] == want, f"vec {r.vec_id}"


class TestRecontractedResults:
    def test_purity_matches_oracle(self, spark, sf_dir, oracle_con):
        pdf = _cross_check(spark, sf_dir, oracle_con, "similarity_cluster_purity")
        assert (pdf["n_majority"] <= pdf["n_vecs"]).all()
        assert pdf["n_vecs"].sum() == len(
            __import__("pandas").read_parquet(f"{sf_dir}/embeddings.parquet")
        )

    @pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
    def test_recall_curve_matches_oracle_and_monotone(self, spark, sf_dir, oracle_con):
        pdf = _cross_check(spark, sf_dir, oracle_con, "similarity_ann_recall_curve")
        pdf = pdf.sort_values("nprobe")
        assert (pdf["recall_ppm"].diff().dropna() >= 0).all(), "recall must not decrease"
        assert (pdf["n_candidates"].diff().dropna() > 0).all(), "candidates grow with nprobe"

    @pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
    def test_pq_distortion_matches_oracle(self, spark, sf_dir, oracle_con):
        pdf = _cross_check(spark, sf_dir, oracle_con, "embedding_pq_distortion")
        assert len(pdf) == 32
        assert (pdf["sse_e9"] >= 0).all()
        assert (pdf["mse_e9"] == pdf["sse_e9"] // pdf["n_vecs"]).all()
