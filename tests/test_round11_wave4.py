"""Round 11, wave 4: PII pattern scan and HTML residue — the fixture
corpus contains neither, so these tests build synthetic documents WITH
hits and compare the Spark builder against the registered DuckDB oracle
on the same parquet (the non-zero path the sf0.01 driver check can't
exercise)."""

from __future__ import annotations

import duckdb
import pandas as pd

from gluettalax_spark.registry import all_queries


def _run_both(spark, tmp_path, name, docs: pd.DataFrame):
    d = str(tmp_path)
    docs.to_parquet(f"{d}/documents.parquet")
    spec = all_queries()[name]
    got = spec.builder(spark, d).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = con.execute(spec.oracle).df()
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )
    return got


class TestPIIScan:
    def test_synthetic_hits_match_oracle_and_hand_count(self, spark, tmp_path):
        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "source": ["s1", "s1", "s1", "s2"],
                "lang": ["en"] * 4,
                "text": [
                    "mail me at jo.doe+x@example.co.uk or admin@test.io thanks",
                    "server at 10.0.0.1 and 192.168.10.254; ssn 123-45-6789",
                    "call 555-867-5309 or 555.867.5309 today",
                    "clean document, nothing sensitive here",
                ],
            }
        )
        got = _run_both(spark, tmp_path, "text_pii_pattern_scan", docs)
        s1 = got[got["source"] == "s1"].iloc[0]
        assert s1["n_email"] == 2
        assert s1["n_ipv4"] == 2
        assert s1["n_ssn"] == 1
        assert s1["n_phone"] == 2
        assert s1["n_docs_with_pii"] == 3
        assert s1["pii_docs_ppm"] == 1_000_000
        s2 = got[got["source"] == "s2"].iloc[0]
        assert s2["n_docs_with_pii"] == 0 and s2["pii_docs_ppm"] == 0

    def test_fixture_corpus_is_clean(self, spark, sf_dir):
        got = all_queries()["text_pii_pattern_scan"].builder(spark, sf_dir).toPandas()
        assert (got["n_docs_with_pii"] == 0).all()


class TestHTMLResidue:
    def test_synthetic_markup_matches_oracle_and_hand_count(self, spark, tmp_path):
        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "source": ["s1", "s1", "s2"],
                "lang": ["en"] * 3,
                "text": [
                    '<div class="x">hello</div> &amp; <a href="u">l</a>',
                    "plain text no markup",
                    "entities &lt;tag&gt; and &amp;doubled&amp; here",
                ],
            }
        )
        got = _run_both(spark, tmp_path, "text_html_tag_residue", docs)
        s1 = got[got["source"] == "s1"].iloc[0]
        # doc1: '</' x2 ("</div>", "</a>"), '&amp;' x1, '<div' x1, 'href=' x1
        assert s1["docs_m0"] == 1  # </
        assert s1["docs_m1"] == 1  # &amp;
        assert s1["docs_m2"] == 0  # &lt;
        assert s1["docs_m3"] == 1  # <div
        assert s1["docs_m4"] == 1  # href=
        assert s1["n_marker_hits"] == 2 + 1 + 1 + 1
        assert s1["residue_docs_ppm"] == 500_000  # 1 of 2 docs
        s2 = got[got["source"] == "s2"].iloc[0]
        assert s2["n_marker_hits"] == 1 + 2  # &lt; x1, &amp; x2
        assert s2["residue_docs_ppm"] == 1_000_000

    def test_fixture_corpus_is_clean(self, spark, sf_dir):
        got = all_queries()["text_html_tag_residue"].builder(spark, sf_dir).toPandas()
        assert (got["n_marker_hits"] == 0).all()
