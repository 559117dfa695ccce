"""Third-engine recomputes for the round-9 wave-7 additions
(item-item CF, Markov prediction accuracy, dedup threshold curve)."""

from __future__ import annotations

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
