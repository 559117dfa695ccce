"""Edge-case totality: reusable operators must handle empty and
degenerate inputs without crashing — the states a 100 TB pipeline WILL
hit (empty partitions after a filter, blank documents, single-node
graphs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.mark.slow  # iterative CC stress (25-90 s each): gate tier (make gate)
def test_connected_components_empty_and_singleton(spark):
    from gluettalax_spark.operators.graph import connected_components

    empty = spark.createDataFrame([], "u long, v long")
    assert connected_components(empty).count() == 0

    one_edge = spark.createDataFrame([(7, 3)], "u long, v long")
    got = {(r.node, r.component) for r in connected_components(one_edge).collect()}
    assert got == {(3, 3), (7, 3)}

    self_loop = spark.createDataFrame([(5, 5)], "u long, v long")
    got = {(r.node, r.component) for r in connected_components(self_loop).collect()}
    assert got == {(5, 5)}


@pytest.mark.slow  # iterative CC stress (25-90 s each): gate tier (make gate)
def test_connected_components_chain_beyond_one_round(spark):
    """A path graph 0-1-2-...-9 needs multiple propagation rounds — the
    loop must actually iterate to the fixpoint, not stop after one."""
    from gluettalax_spark.operators.graph import connected_components

    edges = spark.createDataFrame([(i, i + 1) for i in range(9)], "u long, v long")
    labels = connected_components(edges).collect()
    assert len(labels) == 10
    assert all(r.component == 0 for r in labels)


def test_banded_interval_join_empty_sides(spark):
    from gluettalax_spark.operators.interval import banded_interval_join

    probe = spark.createDataFrame([], "event_id long, ts timestamp")
    build = spark.createDataFrame([], "err_id long, err_ts timestamp")
    assert banded_interval_join(probe, build, "ts", "err_ts", 600).count() == 0

    import datetime as dt

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    probe2 = spark.createDataFrame([(1, t)], "event_id long, ts timestamp")
    # Build row exactly AT the band edge (600s away) must match (<=).
    build2 = spark.createDataFrame(
        [(10, t + dt.timedelta(seconds=600)), (11, t + dt.timedelta(seconds=601))],
        "err_id long, err_ts timestamp",
    )
    got = {r.err_id for r in banded_interval_join(probe2, build2, "ts", "err_ts", 600).collect()}
    assert got == {10}


def test_shingles_skip_short_and_blank_docs(spark, tmp_path):
    """Documents with <3 tokens (including blank/whitespace-only) are
    dropped by shingling, not crashed on."""
    from gluettalax_spark.operators.dedup import shingles_df

    df = spark.createDataFrame(
        [
            (1, "", "en", "s", 0),
            (2, "   ", "en", "s", 3),
            (3, "two tokens", "en", "s", 10),
            (4, "three token doc", "en", "s", 15),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "docs")
    df.write.parquet(f"{out}/documents.parquet")
    sh = {r.doc_id: r.shingles for r in shingles_df(spark, out).collect()}
    assert set(sh) == {4}
    assert sh[4] == ["three token doc"]


def test_format_time_extremes():
    from gluettalax_spark.functions.scalars import format_time

    assert format_time(0) == "0s"
    assert format_time(0.9) == "0s"  # truncates like the reference
    assert format_time(86400 + 2 * 3600 + 3 * 60 + 4) == "1d 2h 3m 4s"
    assert format_time(-61) == "-1m -1s"
    assert format_time(59.99) == "59s"


def test_glob_to_rlike_special_chars(spark):
    """Glob translation survives regex metacharacters in table names."""
    from gluettalax_spark.functions.scalars import glob_to_rlike

    df = spark.createDataFrame(
        [("a.b-c",), ("axb-c",), ("usage_2020",), ("usage",)], "name string"
    )
    # '.' in the glob is literal, not regex-any.
    got = {r.name for r in df.filter(F.col("name").rlike(glob_to_rlike("a.b*"))).collect()}
    assert got == {"a.b-c"}
    got = {r.name for r in df.filter(F.col("name").rlike(glob_to_rlike("usage*"))).collect()}
    assert got == {"usage", "usage_2020"}


@pytest.mark.slow  # iterative CC stress (25-90 s each): gate tier (make gate)
def test_star_cc_matches_min_label(spark):
    """Large-star/small-star and min-label propagation reach the same
    fixpoint on chains (worst case for min-label), forests, and cliques."""
    from gluettalax_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    cases = [
        [(i, i + 1) for i in range(12)],                      # one long chain
        [(0, 1), (2, 3), (3, 4), (10, 11), (11, 10)],         # forest + dup edge
        [(a, b) for a in range(5) for b in range(a + 1, 5)]   # clique
        + [(20, 21)],
        [(7, 7), (1, 2)],                                     # self-loop
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, "u long, v long")
        a = {(r.node, r.component) for r in connected_components(df).collect()}
        b = {(r.node, r.component) for r in connected_components_star(df).collect()}
        assert a == b, (edges, a ^ b)


@pytest.mark.slow  # iterative CC stress (25-90 s each): gate tier (make gate)
def test_cc_deep_chain_converges_in_bounded_rounds(spark):
    """Adversarial chained graph (a 200-doc path, the shape a
    templated-spam corpus produces): diameter 199 would need 199 min-label
    rounds — and the old 25-round cap silently returned WRONG labels.
    The round-count fallover must contract to the star variant and still
    produce the exact fixpoint (everything labelled 0), within the
    bounded round budget (5 min-label + O(log² n) star)."""
    from gluettalax_spark.operators import graph
    from gluettalax_spark.operators.graph import connected_components

    path = spark.createDataFrame([(i, i + 1) for i in range(199)], "u long, v long")
    got = {(r.node, r.component) for r in connected_components(path).collect()}
    assert got == {(i, 0) for i in range(200)}

    # Two chains + an isolated pair: fallover must keep components apart.
    edges = (
        [(i, i + 1) for i in range(50)]
        + [(1000 + i, 1001 + i) for i in range(50)]
        + [(5000, 5001)]
    )
    df = spark.createDataFrame(edges, "u long, v long")
    got = {(r.node, r.component) for r in connected_components(df).collect()}
    want = (
        {(i, 0) for i in range(51)}
        | {(1000 + i, 1000) for i in range(51)}
        | {(5000, 5000), (5001, 5000)}
    )
    assert got == want
    # Guard documents the budget the fallover relies on.
    assert graph._FALLOVER_ROUNDS < 25


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "docs")
    df.write.parquet(f"{out}/documents.parquet")
    return out


def test_decontaminate_bloom_empty_eval_set(spark, tmp_path):
    """No src0 (eval) docs → empty bloom that rejects everything; the
    query returns zero rows instead of crashing on the empty collect or
    the empty verify build side."""
    from gluettalax_spark.registry import queries

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "alpha beta gamma delta", "en", "src5", 22),
            (2, "alpha beta gamma delta", "en", "src6", 22),
        ],
    )
    assert queries()["decontaminate_bloom"](spark, sf).count() == 0


def test_decontaminate_bloom_exact_hit(spark, tmp_path):
    """One shared shingle between eval (src0) and train must survive the
    bloom prefilter AND the exact verify."""
    from gluettalax_spark.registry import queries

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "alpha beta gamma", "en", "src0", 16),
            (2, "alpha beta gamma tail", "en", "src5", 21),
            (3, "totally different words here", "en", "src5", 28),
        ],
    )
    rows = queries()["decontaminate_bloom"](spark, sf).collect()
    assert [(r.source, r.n_docs_flagged, r.n_hit_shingles) for r in rows] == [("src5", 1, 1)]


def test_decontaminate_bloom_oversized_eval_refused(spark, tmp_path, monkeypatch):
    """A misconfigured eval split (more distinct shingles than the
    documented cap) must fail LOUDLY before anything is collected to the
    driver — the LIMIT cap+1 tripwire — not OOM it (VERDICT r8 finding
    #3). The cap is monkeypatched down so the fixture trips it."""
    import pytest

    from gluettalax_spark.operators import text as text_mod
    from gluettalax_spark.registry import queries

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "src0", 40),
            (2, "alpha beta gamma tail", "en", "src5", 21),
        ],
    )
    monkeypatch.setattr(text_mod, "_BLOOM_EVAL_SHINGLE_CAP", 2)
    with pytest.raises(ValueError, match="contractually small"):
        queries()["decontaminate_bloom"](spark, sf)


def _write_lineitem(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long, l_linenumber long, l_extendedprice double")
    out = str(tmp_path / "li")
    df.write.parquet(f"{out}/lineitem.parquet")
    return out


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_graph_ops_no_qualifying_edges(spark, tmp_path):
    """Every basket pair occurs once (support < 2) → the pruned edge set
    is empty; pagerank / LPA / recursive reach / basket rules must all
    return empty, not crash on empty checkpoints or empty recursion."""
    from gluettalax_spark.registry import queries

    sf = _write_lineitem(
        spark,
        tmp_path,
        [(1, 10, 1, 5.0), (1, 11, 2, 5.0), (2, 10, 1, 5.0), (2, 12, 2, 5.0)],
    )
    for name in ("graph_pagerank", "graph_communities_lpa", "sql_recursive_reach", "basket_rules"):
        assert queries()[name](spark, sf).count() == 0, name


def test_cms_single_user_is_exact(spark, tmp_path):
    """One distinct user: the sketch can't collide with anyone, so the
    estimate must be exactly the true count (overcount 0)."""
    import datetime as dt

    from gluettalax_spark.registry import queries

    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, 0, 0, i), 42, "view", 1.0, "{}") for i in range(7)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = str(tmp_path / "ev")
    df.write.parquet(f"{out}/events.parquet")
    rows = queries()["events_freq_cms"](spark, out).collect()
    assert [(r.user_id, r.n_exact, r.n_est, r.overcount) for r in rows] == [(42, 7, 7, 0)]


def test_scd2_as_of_before_any_event(spark, tmp_path):
    """Every event is after the AS-OF point → no user existed yet; the
    reconstruction is empty, not an error."""
    import datetime as dt

    from gluettalax_spark.registry import queries

    df = spark.createDataFrame(
        [(1, dt.datetime(2025, 6, 1), 1, "view", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = str(tmp_path / "ev2")
    df.write.parquet(f"{out}/events.parquet")
    assert queries()["scd2_as_of"](spark, out).count() == 0


def test_kcore_no_qualifying_edges(spark, tmp_path):
    """Support-pruned edge set empty → empty core, converged, no crash
    on the empty degree aggregate or the early-exit probe."""
    from gluettalax_spark.registry import queries

    sf = _write_lineitem(
        spark,
        tmp_path,
        [(1, 10, 1, 5.0), (1, 11, 2, 5.0), (2, 10, 1, 5.0), (2, 12, 2, 5.0)],
    )
    assert queries()["graph_kcore"](spark, sf).count() == 0


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = str(tmp_path / "ev")
    df.write.parquet(f"{out}/events.parquet")
    return out


def test_ewma_single_event_user(spark, tmp_path):
    """n = 1 hits the degenerate fold (no shifted terms, denom 2^0): the
    EWMA must equal the value itself, exactly quantized."""
    import datetime as dt

    from gluettalax_spark.registry import queries

    sf = _write_events(spark, tmp_path, [(1, dt.datetime(2024, 1, 1), 42, "view", 3.5, "{}")])
    rows = queries()["events_user_ewma"](spark, sf).collect()
    assert [(r.user_id, r.n_used, r.ewma_micro, r.ewma) for r in rows] == [(42, 1, 3_500_000, 3.5)]


def test_drift_psi_category_in_one_half_only(spark, tmp_path):
    """A type absent from one half must yield a FINITE smoothed term —
    the Laplace +1 path, which the organic fixture never exercises."""
    import datetime as dt

    from gluettalax_spark.registry import queries

    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "alpha", 1.0, "{}"),
            (2, dt.datetime(2024, 1, 1, 10, 0, 0), 1, "beta", 1.0, "{}"),
        ],
    )
    rows = {r.event_type: r for r in queries()["events_drift_psi"](spark, sf).collect()}
    assert (rows["alpha"].c_ref, rows["alpha"].c_cur) == (1, 0)
    assert (rows["beta"].c_ref, rows["beta"].c_cur) == (0, 1)
    # Symmetric split → equal-magnitude opposite drift terms, all finite.
    assert rows["alpha"].term_e8 == rows["beta"].term_e8
    assert all(r.psi_e8_total == rows["alpha"].term_e8 * 2 for r in rows.values())


def test_cumulative_distinct_single_day(spark, tmp_path):
    import datetime as dt

    from gluettalax_spark.registry import queries

    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, dt.datetime(2024, 3, 1, 5), 7, "view", 1.0, "{}"),
            (2, dt.datetime(2024, 3, 1, 9), 8, "view", 1.0, "{}"),
            (3, dt.datetime(2024, 3, 1, 9), 7, "view", 1.0, "{}"),
        ],
    )
    rows = queries()["events_cumulative_distinct_users"](spark, sf).collect()
    assert [(r.day, r.dau, r.users_to_date) for r in rows] == [("2024-03-01", 2, 2)]


def test_vocab_coverage_tiny_corpus_saturates(spark, tmp_path):
    """Vocabulary smaller than every checkpoint: all rows cover the whole
    corpus (ppm exactly 1e6) and blank docs are tolerated."""
    from gluettalax_spark.registry import queries

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "alpha beta beta", "en", "src1", 15),
            (2, "   ", "en", "src1", 3),
        ],
    )
    rows = queries()["text_vocab_coverage"](spark, sf).collect()
    assert len(rows) == 5
    assert all((r.n_terms, r.covered_tokens, r.total_tokens, r.coverage_ppm) == (2, 3, 3, 1_000_000) for r in rows)


def test_bigram_logppl_all_docs_too_short(spark, tmp_path):
    """Every doc under 2 tokens → no bigrams anywhere; empty result, not
    a crash on the empty count tables."""
    from gluettalax_spark.registry import queries

    sf = _write_docs(spark, tmp_path, [(1, "alpha", "en", "src1", 5), (2, "x y", "en", "src1", 3)])
    assert queries()["text_bigram_logppl"](spark, sf).count() == 0


def test_covariance_and_pca_tiny_corpus(spark, tmp_path):
    """Five vectors: covariance still emits the full upper triangle and
    PCA's identity witness holds (loose bound — tiny n, quantized cov)."""
    import numpy as np

    from gluettalax_spark.registry import queries

    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.uniform(-0.4, 0.4, 64)], 0) for i in range(5)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>, label int")
    out = str(tmp_path / "emb")
    df.write.parquet(f"{out}/embeddings.parquet")
    cov = queries()["embedding_covariance"](spark, out).collect()
    assert len(cov) == 64 * 65 // 2
    rows = queries()["embedding_pca_project"](spark, out).collect()
    assert len(rows) == 5
    assert abs(rows[0]["var_pc1"] / rows[0]["eig1"] - 1.0) < 0.05
