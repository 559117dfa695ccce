"""Witness pins + recomputes for the round-9 wave-5 additions
(zlib compression-ratio filter, Unicode script profile)."""

from __future__ import annotations

import re
import zlib
from collections import defaultdict

import pandas as pd

from gluettalax_spark.registry import queries


# --------------------------------------------------------------------------
# text_compression_ratio (rows-only — witness re-derived with zlib here)
# --------------------------------------------------------------------------


def test_compression_ratio_witness_matches_independent_zlib(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, bytes, zbytes, lo, hi
    for _, r in docs.iterrows():
        b = r["text"].encode("utf-8")
        z = len(zlib.compress(b, 6))
        a = agg[r["source"]]
        a[0] += 1
        a[1] += len(b)
        a[2] += z
        a[3] += 1 if z * 1000000 < 300000 * len(b) else 0
        a[4] += 1 if z * 1000000 > 900000 * len(b) else 0
    rows = {r["source"]: r for r in queries()["text_compression_ratio"](spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for src, (n, nb, nz, lo, hi) in agg.items():
        r = rows[src]
        assert (r["n_docs"], r["sum_bytes"], r["sum_z_bytes"]) == (n, nb, nz)
        assert r["ratio_ppm"] == nz * 1000000 // nb
        assert (r["n_too_repetitive"], r["n_incompressible"]) == (lo, hi)
        # deflate sanity: natural-language text compresses, but not to nothing
        assert 0 < r["sum_z_bytes"] < r["sum_bytes"] * 2


# --------------------------------------------------------------------------
# text_unicode_script_profile
# --------------------------------------------------------------------------

_CLASSES = {
    "n_latin": re.compile("[A-Za-zÀ-ɏ]"),
    "n_digit": re.compile("[0-9]"),
    "n_cjk": re.compile("[一-鿿぀-ヿ]"),
    "n_space": re.compile("[ \t\n\r]"),
    "n_punct": re.compile("[.,!?;:()-]"),
}


def test_script_profile_matches_python_regex(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = {r["lang"]: r for r in queries()["text_unicode_script_profile"](spark, sf_dir).collect()}
    for lang, grp in docs.groupby("lang"):
        r = rows[lang]
        assert r["n_docs"] == len(grp)
        assert r["n_chars"] == int(grp["text"].str.len().sum())
        for col, rx in _CLASSES.items():
            assert r[col] == int(sum(len(rx.findall(t)) for t in grp["text"])), (lang, col)
    # QA sanity: this is exactly the audit the op exists for — the
    # fixture's "zh" docs are synthetic LATIN text, and the profile
    # exposes that (0 CJK chars), unlike the lang label
    for lang, r in rows.items():
        assert r["n_latin"] > 0
    if "zh" in rows:
        assert rows["zh"]["n_cjk"] == 0
