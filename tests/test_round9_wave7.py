"""Third-engine recomputes for the round-9 wave-7 additions
(item-item CF, Markov prediction accuracy, dedup threshold curve)."""

from __future__ import annotations

import pytest

import math
from collections import Counter, defaultdict

import pandas as pd

from gluettalax_spark.registry import queries


# --------------------------------------------------------------------------
# similarity_item_cf
# --------------------------------------------------------------------------


def test_item_cf_matches_python(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    sizes = op.groupby("l_orderkey").size()
    op = op[op["l_orderkey"].isin(sizes[sizes <= 256].index)]
    supp = op.groupby("l_partkey").size().to_dict()
    co = Counter()
    for _, grp in op.groupby("l_orderkey"):
        ps = sorted(grp["l_partkey"])
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                co[(a, b)] += 1
    co = {k: v for k, v in co.items() if v >= 2}
    focal = sorted(supp, key=lambda p: (-supp[p], p))[:20]
    expect = []
    for item in sorted(focal):
        nbrs = []
        for (a, b), c in co.items():
            other = b if a == item else (a if b == item else None)
            if other is not None:
                cos = round(c / math.sqrt(supp[item] * supp[other]), 6)
                nbrs.append((-cos, other, c))
        for rank, (negcos, nbr, c) in enumerate(sorted(nbrs)[:5], 1):
            expect.append((item, nbr, c, -negcos, rank))
    got = [
        (r["item"], r["neighbor"], r["co_orders"], r["cosine"], r["rank"])
        for r in queries()["similarity_item_cf"](spark, sf_dir).collect()
    ]
    assert got == expect


# --------------------------------------------------------------------------
# events_markov_accuracy
# --------------------------------------------------------------------------


def test_markov_accuracy_matches_python(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(["ts", "event_id"])
    pairs = Counter()
    for _, grp in ev.groupby("user_id"):
        types = list(grp["event_type"])
        for a, b in zip(types, types[1:]):
            pairs[(a, b)] += 1
    by_prev = defaultdict(dict)
    for (a, b), n in pairs.items():
        by_prev[a][b] = n
    rows = {r["prev_type"]: r for r in queries()["events_markov_accuracy"](spark, sf_dir).collect()}
    assert set(rows) == set(by_prev)
    for prev, nxt in by_prev.items():
        pred = min(nxt, key=lambda t: (-nxt[t], t))
        total = sum(nxt.values())
        correct = nxt[pred]
        r = rows[prev]
        assert r["pred_type"] == pred
        assert (r["n_transitions"], r["n_correct"]) == (total, correct)
        assert r["acc_ppm"] == correct * 1000000 // total
        # the modal predictor can never score below uniform chance
        assert r["acc_ppm"] * len(nxt) >= 1000000 - len(nxt)


# --------------------------------------------------------------------------
# dedup_threshold_sensitivity
# --------------------------------------------------------------------------


def test_threshold_curve_consistent_with_pair_op(spark, sf_dir):
    """The curve must be exactly the cumulative read of the SAME scored
    pairs the pair op emits — and monotone non-increasing in t."""
    scored = queries()["dedup_ngram_jaccard"](spark, sf_dir).collect()
    rows = {
        r["threshold_pct"]: r
        for r in queries()["dedup_threshold_sensitivity"](spark, sf_dir).collect()
    }
    assert sorted(rows) == [30, 40, 50, 60, 70, 80, 90]
    for t, r in rows.items():
        keep = [s for s in scored if s["jaccard"] * 100 >= t]
        assert r["n_pairs"] == len(keep)
        assert r["n_losers"] == len({s["doc_b"] for s in keep})
    counts = [rows[t]["n_pairs"] for t in sorted(rows)]
    assert counts == sorted(counts, reverse=True)


# --------------------------------------------------------------------------
# corpus_dedup_quality_audit (wave 8)
# --------------------------------------------------------------------------


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_dedup_quality_audit_consistent_with_components(spark, sf_dir):
    """Re-derive the audit from the registry's own cluster table (an
    independently recomputed fixpoint) plus a pandas quality pass."""
    import math as _math
    import re as _re

    comp = queries()["dedup_clusters"](spark, sf_dir).collect()
    losers = {r["doc_id"] for r in comp if not r["is_keeper"]}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sums = {0: [0, 0, 0], 1: [0, 0, 0]}  # n, q_sum, q_sq
    for _, r in docs.iterrows():
        text = r["text"]
        n_chars = len(text)
        n_tok = max(len(_re.findall(r"\S+", text)), 1)
        n_stop = len(_re.findall(r"\b(the|and|of|to|is|a|in)\b", text.lower()))
        n_punct = len(_re.findall(r"[.,!?;:]", text))
        q = _math.floor(
            (0.5 * min(n_chars / 500.0, 1.0)
             + 0.4 * (n_stop / n_tok)
             + 0.1 * (1.0 - n_punct / max(n_chars, 1))) * 10000 + 0.5
        )
        g = 1 if int(r["doc_id"]) in losers else 0
        sums[g][0] += 1
        sums[g][1] += q
        sums[g][2] += q * q
    row = queries()["corpus_dedup_quality_audit"](spark, sf_dir).collect()[0]
    assert (row["n_dup"], row["q_sum_dup"], row["q_sq_dup"]) == tuple(sums[1])
    assert (row["n_uniq"], row["q_sum_uniq"], row["q_sq_uniq"]) == tuple(sums[0])
    gap = (sums[1][1] / sums[1][0] - sums[0][1] / sums[0][0]) / 10000.0
    assert row["mean_quality_gap"] == gap
