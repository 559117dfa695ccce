"""Third-engine recomputes + plan pins for the round-7 additions.

The DuckDB oracle compare is the driver's job; these tests re-derive the
same answers in plain Python and pin the plan shapes that make each
operator scale."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

from gluettalax_spark.operators.text import BPE_TOPK
from gluettalax_spark.registry import queries
from tests.test_plans import physical_plan


# --------------------------------------------------------------------------
# text_bpe_merge_candidates
# --------------------------------------------------------------------------


def _bpe_brute(sf_dir: str):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    freq: Counter = Counter()
    for text in docs["text"]:
        for w in re.findall(r"[a-z]+", text.lower()):
            freq[w + ">"] += 1
    score: Counter = Counter()
    n_words: Counter = Counter()
    for w, c in freq.items():
        pairs = [w[i : i + 2] for i in range(len(w) - 1)]
        for p in pairs:
            score[p] += c
        for p in set(pairs):
            n_words[p] += 1
    ranked = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOPK]
    return [
        (pair, sc, n_words[pair], rank)
        for rank, (pair, sc) in enumerate(ranked, start=1)
    ]


def test_bpe_matches_python_recompute(spark, sf_dir):
    rows = queries()["text_bpe_merge_candidates"](spark, sf_dir).collect()
    got = [(r["pair"], r["score"], r["n_words"], r["rank"]) for r in rows]
    assert got == _bpe_brute(sf_dir)


def test_bpe_plan_shape(spark, sf_dir):
    plan = physical_plan(queries()["text_bpe_merge_candidates"](spark, sf_dir))
    # top-k must not globally sort the pair table...
    assert "TakeOrderedAndProject" in plan
    # ...the whole job is JVM-side (no Python eval of any kind)...
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # ...and the pair fan-out never self-joins.
    assert "CartesianProduct" not in plan
