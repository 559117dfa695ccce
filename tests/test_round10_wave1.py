"""Round-10 wave 1: the IVF candidate-generation rung for the kNN
label-accuracy eval (`similarity_knn_label_accuracy_ivf`) — witness
pins against the brute-force rung plus structural invariants.

The DuckDB oracle compare is the driver's job for the exact rung; the
IVF rung is rows-only (KMeans is not SQL-expressible), so these tests
are its correctness gate.
"""

from __future__ import annotations

import pytest

from gluettalax_spark.registry import queries


def test_fuzzy_length_band_is_lossless(oracle_con):
    """The second blocking key (length band, width 4, neighbor-band
    replication) must not change the linkage output: edit distance ≤ 2
    bounds |Δlen| ≤ 2 < 4, so every qualifying pair lands in adjacent
    bands. Witness the proof by running the UNBANDED join and comparing
    row-for-row with the shipped banded oracle."""
    from gluettalax_spark.operators.curation import _FUZZY_MAX_DIST, _FUZZY_NAME_ORACLE

    unbanded = f"""
    WITH names AS (
      SELECT p_brand, p_name, CAST(count(*) AS BIGINT) AS n_parts
      FROM part GROUP BY 1, 2
    )
    SELECT a.p_brand AS brand, a.p_name AS a_name, b.p_name AS b_name,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
           a.n_parts AS a_parts, b.n_parts AS b_parts,
           CAST(a.n_parts * b.n_parts AS BIGINT) AS pair_count
    FROM names a JOIN names b ON a.p_brand = b.p_brand AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND {_FUZZY_MAX_DIST}
    ORDER BY brand, a_name, b_name
    """
    assert oracle_con.execute(unbanded).fetchall() == oracle_con.execute(
        _FUZZY_NAME_ORACLE
    ).fetchall()


class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def test_markov_twin_counts_late_arrivals():
    """An event arriving in a LATER micro-batch that sorts before the
    already-consumed chain head increments the cumulative n_late
    witness; an in-order drive keeps it 0."""
    import pandas as pd

    from gluettalax_spark.streaming.stateful import _make_markov_fn

    def batch(ts_list, ids, types):
        return pd.DataFrame(
            {"ts": pd.to_datetime(ts_list), "event_id": ids, "event_type": types}
        )

    fn, state = _make_markov_fn(), _FakeState()
    out1 = list(
        fn((1,), [batch(["2024-01-01 00:00:03", "2024-01-01 00:00:04"], [3, 4], ["a", "b"])], state)
    )[0]
    assert set(out1["n_late"]) == {0}
    # Second micro-batch: one late event (00:00:01 < consumed head
    # 00:00:04) and one in-order event.
    out2 = list(
        fn((1,), [batch(["2024-01-01 00:00:01", "2024-01-01 00:00:05"], [1, 5], ["c", "d"])], state)
    )[0]
    assert set(out2["n_late"]) == {1}
    assert state.get[4] == 1  # cumulative counter persisted in state
    # Third, in-order batch: counter unchanged.
    out3 = list(fn((1,), [batch(["2024-01-01 00:00:06"], [6], ["a"])], state))[0]
    assert set(out3["n_late"]) == {1}


def test_path_twin_counts_displacing_late_arrivals():
    """Once the 3-event prefix is full, a later-arriving event that
    sorts before the prefix tail both displaces it (mergeable bottom-k,
    unchanged) AND increments n_late; before the prefix fills, arrival
    order is immaterial and the counter stays 0."""
    import pandas as pd

    from gluettalax_spark.streaming.stateful import _make_path_fn

    def batch(ts_list, ids, types):
        return pd.DataFrame(
            {"ts": pd.to_datetime(ts_list), "event_id": ids, "event_type": types}
        )

    fn, state = _make_path_fn(), _FakeState()
    # Out-of-order WITHIN the fill phase: not late (prefix not full yet).
    out1 = list(fn((7,), [batch(["2024-01-01 00:00:05"], [5], ["e"])], state))[0]
    out2 = list(
        fn(
            (7,),
            [batch(["2024-01-01 00:00:02", "2024-01-01 00:00:03"], [2, 3], ["b", "c"])],
            state,
        )
    )[0]
    assert out2["n_late"].iloc[0] == 0 and out2["path"].iloc[0] == "b>c>e"
    # Prefix now full; an earlier event displaces AND counts.
    out3 = list(fn((7,), [batch(["2024-01-01 00:00:01"], [1], ["a"])], state))[0]
    assert out3["n_late"].iloc[0] == 1
    assert out3["path"].iloc[0] == "a>b>c"
    # A later event after the full prefix neither displaces nor counts.
    out4 = list(fn((7,), [batch(["2024-01-01 00:00:09"], [9], ["z"])], state))[0]
    assert out4["n_late"].iloc[0] == 1 and out4["path"].iloc[0] == "a>b>c"


def _ivf_rows(spark, sf_dir):
    return queries()["similarity_knn_label_accuracy_ivf"](spark, sf_dir).collect()


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_knn_ivf_schema_and_invariants(spark, sf_dir):
    rows = _ivf_rows(spark, sf_dir)
    assert rows, "IVF kNN rung returned nothing"
    cols = set(rows[0].asDict())
    assert cols == {
        "label",
        "n_queries",
        "n_correct",
        "acc_ppm",
        "acc_ppm_exact",
        "pred_agree_ppm",
        "nbr_recall_ppm",
    }
    # Every probe gets a prediction: IVF cells always contain candidates
    # beyond the probe itself, so no probe drops out of the vote.
    assert sum(r.n_queries for r in rows) == 50
    for r in rows:
        assert 0 <= r.n_correct <= r.n_queries
        assert r.acc_ppm == r.n_correct * 1_000_000 // r.n_queries


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_knn_ivf_witnesses_match_exact_rung(spark, sf_dir):
    rows = _ivf_rows(spark, sf_dir)
    # acc_ppm_exact must BE the brute-force rung's per-class accuracy.
    exact = {
        r.label: r.acc_ppm
        for r in queries()["similarity_knn_label_accuracy"](spark, sf_dir).collect()
    }
    for r in rows:
        assert r.acc_ppm_exact == exact[r.label], (
            f"label {r.label}: embedded exact accuracy {r.acc_ppm_exact} "
            f"!= brute-force rung {exact[r.label]}"
        )
    # The witness columns are plan-global constants.
    assert len({r.pred_agree_ppm for r in rows}) == 1
    assert len({r.nbr_recall_ppm for r in rows}) == 1
    # Candidate quality: probing NPROBE/NLIST = 25% of the corpus must
    # recover well over chance (~k/N) of the exact top-k neighbor pairs.
    # Measured 0.596 (sf0.001) / 0.728 (sf0.01) on the near-orthogonal
    # fixture vectors — IVF's worst case; 0.45 leaves KMeans-seed
    # headroom while failing on any real candidate-generation regression.
    recall = rows[0].nbr_recall_ppm / 1e6
    assert 0.45 <= recall <= 1.0, f"nbr_recall={recall:.3f}"
    # Prediction agreement is noisier (near-tied neighbor sets flip the
    # 5-vote majority), but must stay far above the ~10% chance rate of
    # 10 independent labels. Measured 0.50 / 0.48.
    agree = rows[0].pred_agree_ppm / 1e6
    assert 0.25 <= agree <= 1.0, f"pred_agree={agree:.3f}"
