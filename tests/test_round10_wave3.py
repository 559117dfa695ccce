"""Third-engine recomputes for the round-10 text/corpus wave: token
coverage curve, token-length entropy, cross-language trigram
similarity, and the epoch schedule. The DuckDB oracle compare is the
driver's job; these re-derive the answers in plain Python/pandas."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd

from gluettalax_spark.registry import queries


def _tokens(docs):
    for t in docs["text"]:
        yield from re.findall(r"[a-z]+", t.lower())


def test_coverage_curve_matches_python(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    counts = Counter(_tokens(docs))
    total = sum(counts.values())
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    rows = {r.top_n: r for r in queries()["text_token_coverage_curve"](spark, sf_dir).collect()}
    assert set(rows) == {10, 100, 1000}
    for top_n, r in rows.items():
        head = ordered[:top_n]
        covered = sum(c for _, c in head)
        assert r.n_types == len(head)
        assert r.covered_tokens == covered
        assert r.total_tokens == total
        assert r.coverage_ppm == covered * 1_000_000 // total
    # curve must be non-decreasing in top_n
    assert rows[10].coverage_ppm <= rows[100].coverage_ppm <= rows[1000].coverage_ppm


def test_token_length_entropy_matches_python(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = {r.lang: r for r in queries()["text_token_length_entropy"](spark, sf_dir).collect()}
    for lang, grp in docs.groupby("lang"):
        lens = Counter(len(w) for w in _tokens(grp))
        n = sum(lens.values())
        ent = sum(
            math.floor((c / n) * math.log(n / c) * 1e8) for c in lens.values()
        )
        r = rows[lang]
        assert r.n_tokens == n
        assert r.n_lengths == len(lens)
        assert r.avg_len_milli == sum(k * c for k, c in lens.items()) * 1000 // n
        assert r.entropy_e8 == ent


def test_trigram_similarity_matches_python(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    profs = {}
    for lang, grp in docs.groupby("lang"):
        c = Counter()
        for t in grp["text"]:
            s = t.lower()
            c.update(s[i : i + 3] for i in range(len(s) - 2))
        profs[lang] = c
    rows = queries()["text_lang_trigram_similarity"](spark, sf_dir).collect()
    langs = sorted(profs)
    assert len(rows) == len(langs) * (len(langs) - 1) // 2
    for r in rows:
        a, b = profs[r.lang_a], profs[r.lang_b]
        shared = set(a) & set(b)
        dot = sum(a[t] * b[t] for t in shared)
        assert r.dot == dot
        assert r.n_shared == len(shared)
        cos = dot / math.sqrt(
            sum(v * v for v in a.values()) * sum(v * v for v in b.values())
        )
        assert abs(r.cosine - round(cos, 6)) <= 2e-6
        assert r.n_tri_a == sum(a.values()) and r.n_tri_b == sum(b.values())


def test_epoch_schedule_matches_python(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n_tok = (
        docs.assign(t=docs["text"].str.split().str.len())
        .groupby("source")["t"]
        .sum()
        .astype(np.int64)
    )
    q = {s: math.floor(math.sqrt(n) * 1048576) for s, n in n_tok.items()}
    q_total, n_total = sum(q.values()), int(n_tok.sum())
    rows = {r.source: r for r in queries()["corpus_epoch_schedule"](spark, sf_dir).collect()}
    assert set(rows) == set(n_tok.index)
    for s, r in rows.items():
        target = 2 * n_total * q[s] // q_total
        assert r.n_tokens == n_tok[s]
        assert r.w_temp_ppm == q[s] * 1_000_000 // q_total
        assert r.target_tokens == target
        assert r.n_full_epochs == target // n_tok[s]
        assert r.last_epoch_frac_ppm == (target % n_tok[s]) * 1_000_000 // n_tok[s]
        assert r.epochs_milli == target * 1000 // n_tok[s]
    # budget conservation: per-source targets sum to ~2x the corpus
    # (within one integer-floor per source)
    total_target = sum(r.target_tokens for r in rows.values())
    assert 0 <= 2 * n_total - total_target < len(rows)
    # sqrt-temperature upweights smaller sources: epochs_milli ordering
    # is opposite to token-count ordering
    by_small = sorted(rows.values(), key=lambda r: r.n_tokens)
    assert by_small[0].epochs_milli >= by_small[-1].epochs_milli
