"""Property tests for the round-10 invariants that the fixture only
samples: the length-band losslessness lemma behind the fuzzy-linkage
second block, and the Friedman 2x-rank integer identity. Pure Python —
no Spark session needed."""

from __future__ import annotations

import pytest

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(
    a=st.text(alphabet="abcde ", min_size=0, max_size=24),
    b=st.text(alphabet="abcde ", min_size=0, max_size=24),
)
def test_length_band_lemma_never_separates_close_pairs(a, b):
    """The lemma the banded fuzzy join rests on: if levenshtein(a,b) <= 2
    then the width-4 length bands of a and b differ by at most 1, so the
    {band-1, band, band+1} replication finds every qualifying pair."""
    from gluettalax_spark.operators.curation import _FUZZY_BAND_W, _FUZZY_MAX_DIST

    if _levenshtein(a, b) <= _FUZZY_MAX_DIST:
        band_a, band_b = len(a) // _FUZZY_BAND_W, len(b) // _FUZZY_BAND_W
        assert abs(band_a - band_b) <= 1


def _avg_ranks(v):
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v), dtype=float)
    sv = np.asarray(v)[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return ranks


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=5), min_size=3, max_size=6),
        min_size=2,
        max_size=8,
    ).filter(lambda rows: len({len(r) for r in rows}) == 1)
)
@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_friedman_integer_identity(rows):
    """With 2x average ranks, the operator's integer numerator
    sum((R2_j - b(k+1))^2) and denominator sum(r2^2) - b*k*(k+1)^2 are
    EXACT integers equal to 4x the float formula's pieces, so
    chi2 = (k-1)*s2/d2 matches the textbook tie-corrected statistic."""
    mat = np.asarray(rows, dtype=np.int64)
    b, k = mat.shape
    ranks = np.vstack([_avg_ranks(mat[i]) for i in range(b)])
    r2 = np.round(ranks * 2).astype(np.int64)  # 2x ranks are integral
    assert np.allclose(r2 / 2.0, ranks)
    # per-block 2x ranks sum to k(k+1)
    assert (r2.sum(axis=1) == k * (k + 1)).all()
    r2_j = r2.sum(axis=0)
    s2 = int(((r2_j - b * (k + 1)) ** 2).sum())
    d2 = int((r2.astype(object) ** 2).sum()) - b * k * (k + 1) ** 2
    # float formula
    r_j = ranks.sum(axis=0)
    s2f = ((r_j - b * (k + 1) / 2) ** 2).sum()
    d2f = (ranks**2).sum() - b * k * (k + 1) ** 2 / 4.0
    assert s2 == round(4 * s2f, 6)
    assert d2 == round(4 * d2f, 6)
    if d2 > 0:
        chi2_int = (k - 1) * s2 / d2
        chi2_float = (k - 1) * s2f / d2f
        assert math.isclose(chi2_int, chi2_float, rel_tol=1e-12)
