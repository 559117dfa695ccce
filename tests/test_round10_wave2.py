"""Third-engine recomputes for the round-10 stats wave: Dunn's
post-hoc, the Friedman test, and partial correlation. The DuckDB oracle
compare is the driver's job; these re-derive the same answers in plain
numpy/pandas (average ranks, direct formulas) and pin the statistical
identities the integer machinery must satisfy."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from gluettalax_spark.registry import queries


def _avg_ranks(v: np.ndarray) -> np.ndarray:
    """Average (midrank) ranks, 1-based — the tie convention both ops use."""
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v), dtype=float)
    sv = v[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return ranks


def test_dunn_matches_numpy_recompute(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    v = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    g = ev["event_type"].to_numpy()
    ranks = _avg_ranks(v)
    n = len(v)
    _, counts = np.unique(v, return_counts=True)
    tie_t = int((counts.astype(object) ** 3 - counts).sum())
    sigma2 = n * (n + 1) / 12.0 - tie_t / (12.0 * (n - 1))
    rows = queries()["stats_dunn_posthoc"](spark, sf_dir).collect()
    assert len(rows) == 10  # 5 types -> 10 pairs
    by_pair = {(r.g_a, r.g_b): r for r in rows}
    mean_rank = {t: ranks[g == t].mean() for t in np.unique(g)}
    n_g = {t: int((g == t).sum()) for t in np.unique(g)}
    for (a, b), r in by_pair.items():
        z = (mean_rank[a] - mean_rank[b]) / math.sqrt(
            sigma2 * (1.0 / n_g[a] + 1.0 / n_g[b])
        )
        assert abs(r.z - round(z, 6)) <= 2e-6, (a, b, r.z, z)
        assert r.n_a == n_g[a] and r.n_b == n_g[b]
    # BH step-up coherence: rejected iff rank <= max accepted rank, and
    # the rejected set is a prefix of the p-value ranking.
    ranks_sorted = sorted(rows, key=lambda r: r.p_rank)
    rejected = [r.rejected for r in ranks_sorted]
    assert rejected == sorted(rejected, reverse=True)
    m = len(rows)
    for r in rows:
        if r.rejected:
            assert any(
                s.p_value * m <= s.p_rank * 0.05 and s.p_rank >= r.p_rank
                for s in rows
            )


def test_friedman_matches_numpy_recompute(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    daily = (
        ev.assign(day=ev["ts"].dt.date)
        .groupby(["day", "event_type"])
        .size()
        .unstack(fill_value=0)
    )
    b, k = daily.shape
    rank_rows = np.vstack([_avg_ranks(daily.iloc[i].to_numpy()) for i in range(b)])
    r_j = rank_rows.sum(axis=0)
    s2 = ((r_j - b * (k + 1) / 2) ** 2).sum()
    a_c = (rank_rows**2).sum() - b * k * (k + 1) ** 2 / 4.0
    chi2 = (k - 1) * s2 / a_c
    row = queries()["stats_friedman_test"](spark, sf_dir).collect()[0]
    assert (row.k, row.b) == (k, b)
    assert abs(row.chi2_f - chi2) <= 1e-9 * max(1.0, abs(chi2))
    assert abs(row.kendall_w - chi2 / (b * (k - 1))) <= 1e-12
    # the integer witnesses are the 2x-rank forms (quarters cancel)
    assert row.s2 == int(round(4 * s2))
    assert row.d2 == int(round(4 * a_c))


def test_partial_correlation_matches_numpy(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    row = queries()["stats_partial_correlation"](spark, sf_dir).collect()[0]
    x = docs["text"].str.split().str.len().to_numpy(dtype=float)
    z = docs["n_chars"].to_numpy(dtype=float)
    # The marginal involving only x and z is recomputable exactly here;
    # the quality-dependent marginals are pinned by the identity instead.
    r_xz = np.corrcoef(x, z)[0, 1]
    assert abs(row.r_xz - round(r_xz, 6)) <= 2e-6
    # identity: the partial is composed from the three shipped marginals
    expect = (row.r_xy - row.r_xz * row.r_yz) / math.sqrt(
        (1 - row.r_xz**2) * (1 - row.r_yz**2)
    )
    assert abs(row.r_xy_given_z - round(expect, 6)) <= 2e-6
    assert row.n == len(docs)
    # sanity: all correlations are in [-1, 1]
    for c in ("r_xy", "r_xz", "r_yz", "r_xy_given_z"):
        assert -1.0 <= getattr(row, c) <= 1.0
