"""Witness pins for the round-10 ANN wave: the IVF recall-vs-nprobe
tuning curve and the PQ per-subspace distortion audit (both rows-only —
KMeans/PQ training is not SQL-expressible, so these tests ARE the
correctness gate)."""

from __future__ import annotations

import pytest

import numpy as np
import pandas as pd

from gluettalax_spark.registry import queries


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_ann_recall_curve_monotone_and_consistent(spark, sf_dir):
    rows = sorted(
        queries()["similarity_ann_recall_curve"](spark, sf_dir).collect(),
        key=lambda r: r.nprobe,
    )
    assert [r.nprobe for r in rows] == [1, 2, 4, 8]
    # recall and candidate volume must be non-decreasing in nprobe
    recalls = [r.recall_ppm for r in rows]
    assert recalls == sorted(recalls)
    cands = [r.n_candidates for r in rows]
    assert cands == sorted(cands)
    for r in rows:
        assert 0 <= r.n_hits <= r.n_exact
        assert r.recall_ppm == r.n_hits * 1_000_000 // r.n_exact
    # candidate volume scales ~linearly with nprobe (equi-join on cells)
    assert cands[-1] >= 4 * cands[0]
    # the nprobe=4 rung must agree with similarity_topk_ivf's in-plan
    # recall_at_k (same seed -> same quantizer, same query set)
    from gluettalax_spark.operators.ann import similarity_topk_ivf

    ivf = similarity_topk_ivf(spark, sf_dir).limit(1).collect()[0]
    by_np = {r.nprobe: r for r in rows}
    assert abs(by_np[4].recall_ppm / 1e6 - ivf.recall_at_k) <= 1e-4 + 1e-9


def test_pq_distortion_matches_numpy_recompute(spark, sf_dir):
    from gluettalax_spark.operators.ann import PQ_M, _pq_model

    rows = sorted(
        queries()["embedding_pq_distortion"](spark, sf_dir).collect(),
        key=lambda r: r.subspace,
    )
    assert [r.subspace for r in rows] == list(range(PQ_M))
    books, dim = _pq_model(spark, sf_dir)
    books_arr = np.stack(books)
    d_sub = dim // PQ_M
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    n = X.shape[0]
    Xs = X.reshape(n, PQ_M, d_sub).transpose(1, 0, 2)
    d2 = (books_arr**2).sum(axis=2)[:, None, :] - 2.0 * np.einsum(
        "mnd,mkd->mnk", Xs, books_arr
    )
    err = (Xs**2).sum(axis=2) + d2.min(axis=2)
    sse = np.floor(np.maximum(err, 0.0) * 1e9).astype(np.int64).sum(axis=1)
    for r in rows:
        assert r.n_vecs == n
        assert r.sse_e9 == sse[r.subspace], r.subspace
        assert r.mse_e9 == r.sse_e9 // n
