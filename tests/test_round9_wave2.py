"""Third-engine recomputes + plan pins for the round-9 wave-2 additions
(ECE calibration, k-NN label accuracy, bounded-round SSSP, newsvendor
quantile, Qini uplift)."""

from __future__ import annotations

import pytest

import hashlib
import math
import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from gluettalax_spark.registry import queries


def _python_doc_logits(docs: pd.DataFrame) -> tuple[dict, dict]:
    """Per-doc hashed-feature logits + quality ints, recomputed in pure
    Python (the test_round8_wave4 recompute, shared by ECE)."""
    logits, quals = {}, {}
    for _, r in docs.iterrows():
        text = r["text"]
        w = [t for t in re.split(r"\s+", text.lower()) if t]
        feats = list(w) + [f"{w[i]}_{w[i+1]}" for i in range(len(w) - 1)]
        if not feats:
            continue
        tot = 0
        for f in feats:
            b = int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % (1 << 16)
            tot += (b * 2654435761) % (1 << 20) - (1 << 19)
        logits[int(r["doc_id"])] = tot * 1000 // len(feats)
        n_chars = len(text)
        n_tok = max(len(re.findall(r"\S+", text)), 1)
        n_stop = len(re.findall(r"\b(the|and|of|to|is|a|in)\b", text.lower()))
        n_punct = len(re.findall(r"[.,!?;:]", text))
        q = (
            0.5 * min(n_chars / 500.0, 1.0)
            + 0.4 * (n_stop / n_tok)
            + 0.1 * (1.0 - n_punct / max(n_chars, 1))
        )
        quals[int(r["doc_id"])] = math.floor(q * 10000 + 0.5)
    return logits, quals


# --------------------------------------------------------------------------
# quality_ece_calibration
# --------------------------------------------------------------------------


def test_ece_matches_python_recompute(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    logits, quals = _python_doc_logits(docs)
    ids = sorted(logits)
    qv = sorted(quals[i] for i in ids)
    med = qv[(len(qv) + 1) // 2 - 1]
    bins = defaultdict(lambda: [0, 0, 0])  # n, pos, conf_sum_e6
    for i in ids:
        # SQL round = half away from zero (p is positive → floor(x+0.5));
        # Python round is banker's, off by one on exact .5 boundaries
        p_e6 = math.floor(1e6 / (1.0 + math.exp(-logits[i] / 30000000.0)) + 0.5)
        b = min(p_e6 * 10 // 1000000, 9)
        bins[b][0] += 1
        bins[b][1] += 1 if quals[i] > med else 0
        bins[b][2] += p_e6
    rows = {r["bin"]: r for r in queries()["quality_ece_calibration"](spark, sf_dir).collect()}
    assert set(rows) == set(bins)
    for b, (n, pos, conf) in bins.items():
        r = rows[b]
        assert (r["n_docs"], r["n_pos"]) == (n, pos)
        # libm exp differs from the JVM's by ≤1 ulp on rare logits, so the
        # Python conf sum may drift ±1 per doc; the bit-exact conf check is
        # the DuckDB oracle's job — here pin the tolerance AND the exact
        # internal consistency of the emitted integers.
        assert abs(r["conf_sum_e6"] - conf) <= n
        assert r["acc_ppm"] == pos * 1000000 // n
        assert r["conf_ppm"] == r["conf_sum_e6"] // n
        assert r["gap_num"] == abs(pos * 1000000 - r["conf_sum_e6"])
    # ECE is exactly recoverable from the integer columns
    n_total = sum(v[0] for v in bins.values())
    ece = sum(r["gap_num"] for r in rows.values()) / (n_total * 1e6)
    assert 0.0 <= ece <= 1.0


# --------------------------------------------------------------------------
# similarity_knn_label_accuracy
# --------------------------------------------------------------------------


def test_knn_label_accuracy_matches_python(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        int(r["vec_id"]): (int(r["label"]), np.asarray(list(r["embedding"]), dtype=np.float64))
    for _, r in emb.iterrows()}
    norms = {i: np.linalg.norm(v) for i, (_, v) in vecs.items()}
    per_label = defaultdict(lambda: [0, 0])  # n_queries, n_correct
    for qid in [i for i in vecs if i < 50]:
        qlab, qv = vecs[qid]
        scored = sorted(
            (
                (-round(float(np.dot(qv, v) / (norms[qid] * norms[i])), 4), i, lab)
                for i, (lab, v) in vecs.items()
                if i != qid
            ),
        )[:5]
        votes = Counter(lab for _, _, lab in scored)
        pred = min(votes, key=lambda l: (-votes[l], l))
        per_label[qlab][0] += 1
        per_label[qlab][1] += 1 if pred == qlab else 0
    rows = {r["label"]: r for r in queries()["similarity_knn_label_accuracy"](spark, sf_dir).collect()}
    assert set(rows) == set(per_label)
    for lab, (n, c) in per_label.items():
        assert (rows[lab]["n_queries"], rows[lab]["n_correct"]) == (n, c)
        assert rows[lab]["acc_ppm"] == c * 1000000 // n


# --------------------------------------------------------------------------
# graph_bounded_sssp
# --------------------------------------------------------------------------


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_bounded_sssp_matches_python_bellman_ford(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    sizes = op.groupby("l_orderkey").size()
    op = op[op["l_orderkey"].isin(sizes[sizes <= 256].index)]
    support = Counter()
    for _, grp in op.groupby("l_orderkey"):
        ps = sorted(grp["l_partkey"])
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                support[(ps[i], ps[j])] += 1
    edges = {pair: c for pair, c in support.items() if c >= 2}
    adj = defaultdict(list)
    for (a, b), c in edges.items():
        w = 1000000 // c
        adj[a].append((b, w))
        adj[b].append((a, w))
    src = min(a for a, _ in edges)
    dist = {src: 0}
    for _ in range(4):
        nxt = dict(dist)
        for u, d in dist.items():
            for v, w in adj[u]:
                if d + w < nxt.get(v, float("inf")):
                    nxt[v] = d + w
        dist = nxt
    expect = sorted(dist.items(), key=lambda kv: (kv[1], kv[0]))[:20]
    got = [(r["node"], r["dist"]) for r in queries()["graph_bounded_sssp"](spark, sf_dir).collect()]
    assert got == expect


# --------------------------------------------------------------------------
# orders_newsvendor_quantile
# --------------------------------------------------------------------------


def test_newsvendor_matches_numpy_quantile(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    daily = orders.groupby(orders["o_orderdate"].dt.date).size().values
    n = len(daily)
    k = (9 * n + 9) // 10
    q_star = int(np.sort(daily)[k - 1])
    over = int(np.maximum(0, q_star - daily).sum())
    under = int(np.maximum(0, daily - q_star).sum())
    row = queries()["orders_newsvendor_quantile"](spark, sf_dir).collect()[0]
    assert (row["n_days"], row["k"], row["q_star"]) == (n, k, q_star)
    assert (row["over_units"], row["under_units"]) == (over, under)
    assert row["total_cost"] == 1 * over + 9 * under
    # critical-fractile optimality: q* at the 90th percentile means at
    # most 10% of days exceed it
    assert (daily > q_star).sum() <= n - k


# --------------------------------------------------------------------------
# events_qini_uplift
# --------------------------------------------------------------------------


def test_qini_matches_python_recompute(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    users = {}
    for uid, grp in ev.groupby("user_id"):
        treated = (int(hashlib.md5(str(uid).encode()).hexdigest()[0], 16)) % 2 == 0
        score = int((grp["event_type"] != "purchase").sum())
        conv = int((grp["event_type"] == "purchase").any())
        users[int(uid)] = (1 if treated else 0, score, conv)
    ranked = sorted(users.items(), key=lambda kv: (-kv[1][1], kv[0]))
    n = len(ranked)
    dec = defaultdict(lambda: [0, 0, 0, 0])  # n_t n_c conv_t conv_c
    for r, (uid, (t, s, c)) in enumerate(ranked, 1):
        d = (r - 1) * 10 // n
        dec[d][0] += t
        dec[d][1] += 1 - t
        dec[d][2] += c if t else 0
        dec[d][3] += c if not t else 0
    rows = {r["decile"]: r for r in queries()["events_qini_uplift"](spark, sf_dir).collect()}
    assert set(rows) == set(dec)
    cn_t = cn_c = cc_t = cc_c = 0
    for d in sorted(dec):
        n_t, n_c, c_t, c_c = dec[d]
        r = rows[d]
        assert (r["n_t"], r["n_c"], r["conv_t"], r["conv_c"]) == (n_t, n_c, c_t, c_c)
        cn_t += n_t
        cn_c += n_c
        cc_t += c_t
        cc_c += c_c
        if cn_c == 0:
            assert r["qini"] is None
        else:
            assert r["qini"] == cc_t - cc_c * cn_t / cn_c
