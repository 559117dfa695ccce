"""Third-engine recomputes for the round-10 wave 5: IDF-weighted
Jaccard rescoring and backlog aging."""

from __future__ import annotations

import pytest

import math
import re
from collections import Counter

import pandas as pd

from gluettalax_spark.registry import queries


def _shingle_sets(docs):
    out = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        if len(toks) >= 3:
            out[doc_id] = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
    return out


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_weighted_jaccard_matches_python(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sets = _shingle_sets(docs)
    n_docs = len(sets)
    df = Counter()
    for s in sets.values():
        df.update(s)
    w = {t: round(1e6 * math.log(n_docs / c)) for t, c in df.items()}
    rows = queries()["dedup_weighted_jaccard"](spark, sf_dir).collect()
    assert rows, "no near-dup pairs rescored"
    # the rescored pair list is exactly the ngram op's pair list
    ngram = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in queries()["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    assert {(r.doc_a, r.doc_b) for r in rows} == set(ngram)
    for r in rows:
        a, b = sets[r.doc_a], sets[r.doc_b]
        inter = sum(w[t] for t in a & b)
        union = sum(w[t] for t in a) + sum(w[t] for t in b) - inter
        assert r.w_inter_micro == inter, (r.doc_a, r.doc_b)
        assert r.w_union_micro == union
        assert abs(r.w_jaccard - round(inter / union, 4)) <= 1e-9
        assert r.jaccard == ngram[(r.doc_a, r.doc_b)]
        assert 0.0 < r.w_jaccard <= 1.0


def test_backlog_aging_matches_pandas(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    asof = orders["o_orderdate"].max()
    open_o = orders[orders["o_orderstatus"] != "F"].copy()
    age = (pd.to_datetime(asof) - pd.to_datetime(open_o["o_orderdate"])).dt.days
    bucket = pd.cut(
        age,
        bins=[-1, 30, 90, 365, 10**9],
        labels=["000-030", "031-090", "091-365", "365+"],
    )
    cents = (open_o["o_totalprice"] * 100).round().astype("int64")
    expect = (
        pd.DataFrame(
            {"priority": open_o["o_orderpriority"], "age_bucket": bucket,
             "cents": cents, "age": age}
        )
        .groupby(["priority", "age_bucket"], observed=True)
        .agg(n_orders=("cents", "size"), total_cents=("cents", "sum"),
             max_age_days=("age", "max"))
        .reset_index()
    )
    got = {
        (r.priority, r.age_bucket): (r.n_orders, r.total_cents, r.max_age_days)
        for r in queries()["orders_backlog_aging"](spark, sf_dir).collect()
    }
    assert len(got) == len(expect)
    for _, e in expect.iterrows():
        assert got[(e["priority"], str(e["age_bucket"]))] == (
            e["n_orders"],
            e["total_cents"],
            e["max_age_days"],
        )


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_band_sweep_s_curve_invariants(spark, sf_dir):
    """Narrower bands can only ADD candidates and catches (monotone in
    the band count); every config's verified pairs are a subset of the
    union; the 4x4 config's verified pairs equal dedup_minhash_lsh's
    output pair count."""
    from gluettalax_spark.registry import queries as _q

    rows = {r.cfg: r for r in _q()["dedup_band_sweep"](spark, sf_dir).collect()}
    assert set(rows) == {"b2r8", "b4r4", "b8r2"}
    # more, narrower bands -> more candidates and at least as many catches
    assert rows["b2r8"].n_candidates <= rows["b4r4"].n_candidates <= rows["b8r2"].n_candidates
    assert rows["b2r8"].n_verified <= rows["b4r4"].n_verified <= rows["b8r2"].n_verified
    n_union = {r.n_union for r in rows.values()}
    assert len(n_union) == 1
    n_union = n_union.pop()
    for r in rows.values():
        assert 0 <= r.n_verified <= n_union
        assert r.n_verified <= r.n_candidates
        assert r.precision_ppm == r.n_verified * 1_000_000 // max(r.n_candidates, 1)
        assert r.recall_ppm == r.n_verified * 1_000_000 // max(n_union, 1)
    lsh = _q()["dedup_minhash_lsh"](spark, sf_dir).count()
    assert rows["b4r4"].n_verified == lsh
