"""Round 11, wave 1: fixture-fingerprint cache invalidation (VERDICT r10
task #6) and the `(?s).` character-source contract (ADVICE r10)."""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F


class TestFixtureFingerprintCaches:
    """The per-sf_dir caches (events schema, PCA covariance, ANN models)
    were keyed on the dir alone — correct only while fixture dirs are
    immutable. They now key on (dir, table, size, mtime_ns); a rewritten
    fixture file must invalidate in-process."""

    def test_fingerprint_changes_on_rewrite(self, sf_dir, tmp_path):
        from gluettalax_spark.tables import fixture_fingerprint

        d = str(tmp_path)
        shutil.copy(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
        fp1 = fixture_fingerprint(d, "events")
        # Same bytes, later mtime — still a "rewrite" from the cache's
        # point of view (regeneration tools rewrite in place).
        time.sleep(0.01)
        os.utime(f"{d}/events.parquet")
        fp2 = fixture_fingerprint(d, "events")
        assert fp1 != fp2
        assert fp1[:3] == fp2[:3]  # (dir, name, size) unchanged; mtime moved

    def test_fingerprint_missing_file_is_total(self, tmp_path):
        from gluettalax_spark.tables import fixture_fingerprint

        fp = fixture_fingerprint(str(tmp_path), "events")
        assert fp == (str(tmp_path), "events", None, None)

    def test_events_schema_cache_invalidates_on_rewrite(self, spark, sf_dir, tmp_path):
        from gluettalax_spark.tables import events_raw_schema

        d = str(tmp_path)
        shutil.copy(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
        s1 = events_raw_schema(spark, d)
        assert "ts" in s1.fieldNames()
        # Regenerate the fixture with a DIFFERENT schema in the same dir.
        time.sleep(0.01)
        spark.range(3).select(
            F.col("id").alias("only_col")
        ).toPandas().to_parquet(f"{d}/events.parquet")
        s2 = events_raw_schema(spark, d)
        assert s2.fieldNames() == ["only_col"], (
            "stale schema served after in-process fixture rewrite"
        )

    def test_ann_model_cache_keys_on_fingerprint(self, spark, sf_dir, tmp_path):
        from gluettalax_spark.operators import ann

        d = str(tmp_path)
        shutil.copy(f"{sf_dir}/embeddings.parquet", f"{d}/embeddings.parquet")
        ann._pq_model(spark, d)
        keys1 = {k for k in ann._MODEL_CACHE if k[0] == "pq" and k[1][0] == d}
        assert len(keys1) == 1
        time.sleep(0.01)
        os.utime(f"{d}/embeddings.parquet")
        ann._pq_model(spark, d)
        keys2 = {k for k in ann._MODEL_CACHE if k[0] == "pq" and k[1][0] == d}
        assert len(keys2) == 2, "rewritten embeddings served from stale PQ model"


class TestCharSourceContract:
    """`(?s).` must make the char/trigram walks terminator-inclusive and
    IDENTICAL cross-engine; bare `.` differs (Java drops \\n \\r \\u0085
    \\u2028 \\u2029, RE2 only \\n)."""

    MULTILINE = "ab\ncd\ref gh"

    def test_spark_dotall_extracts_every_char(self, spark):
        row = (
            spark.createDataFrame([(self.MULTILINE,)], "text string")
            .select(F.expr("regexp_extract_all(text, '(?s).', 0)").alias("cs"))
            .first()
        )
        assert row["cs"] == list(self.MULTILINE)

    def test_duckdb_dotall_matches_spark(self, oracle_con):
        (cs,) = oracle_con.execute(
            "SELECT regexp_extract_all(?, '(?s).')", [self.MULTILINE]
        ).fetchone()
        assert cs == list(self.MULTILINE)

    def test_trigram_similarity_exact_on_multiline_corpus(self, spark, tmp_path):
        """The ADVICE r10 failure case: a corpus WITH newlines. Spark op
        vs the registered DuckDB oracle on the same multi-line docs."""
        import duckdb
        import pandas as pd

        from gluettalax_spark.registry import all_queries

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "lang": ["aa", "aa", "bb", "bb"],
                "text": [
                    "the cat\nsat on\nthe mat",
                    "a dog\r\nbarked\nat night",
                    "le chat\ndort\rbien",
                    "un chien\n\naboie fort",
                ],
                "source": ["s1"] * 4,
            }
        )
        d = str(tmp_path)
        docs.to_parquet(f"{d}/documents.parquet")
        spec = all_queries()["text_lang_trigram_similarity"]
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

    def test_char_entropy_exact_on_multiline_corpus(self, spark, tmp_path):
        import duckdb
        import pandas as pd

        from gluettalax_spark.registry import all_queries

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "source": ["s1", "s2"],
                "text": ["aa\nbb\rcc dd", "x\n\n\nyz"],
            }
        )
        d = str(tmp_path)
        docs.to_parquet(f"{d}/documents.parquet")
        spec = all_queries()["text_char_entropy"]
        got = spec.builder(spark, d).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
        )
        want = con.execute(spec.oracle).df()
        con.close()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
        )
