"""Third-engine recomputes + plan pins for the round-8 wave-3 additions
(ANOVA, Kruskal-Wallis, power-law MLE, duplicate n-gram fraction, the
hashed linear quality classifier, and exact ε-ball range search).

The DuckDB oracle compare is the driver's job; these tests re-derive the
same answers in plain Python/pandas/numpy and pin the plan shapes that
keep each operator on its scale path."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from gluettalax_spark.registry import queries
from tests.test_plans import physical_plan


# --------------------------------------------------------------------------
# stats_anova_oneway
# --------------------------------------------------------------------------


def test_anova_matches_python_recompute(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    v = (ev["value"] * 100).round().astype("int64")
    g = ev["event_type"]
    groups = pd.DataFrame({"g": g, "v": v}).groupby("g")["v"]
    n_g = groups.count()
    s_g = groups.sum()
    ssbq = sum(int(s) * int(s) // int(n) for s, n in zip(s_g, n_g))
    k, n = len(n_g), int(n_g.sum())
    s = int(s_g.sum())
    q = int((v.astype(object) ** 2).sum())
    row = queries()["stats_anova_oneway"](spark, sf_dir).collect()[0]
    assert (row["k"], row["n"], row["s"], row["q"], row["ssbq"]) == (k, n, s, q, ssbq)
    ssb = float(ssbq) - float(s) * s / n
    ssw = float(q) - ssbq
    assert row["f_stat"] == (ssb / (k - 1)) / (ssw / (n - k))
    # the integer moments also pin the classic sanity: 0 < eta² < 1
    assert 0.0 < row["eta_sq"] < 1.0


# --------------------------------------------------------------------------
# stats_kruskal_wallis
# --------------------------------------------------------------------------


def test_kruskal_matches_scipy_free_recompute(spark, sf_dir):
    """Re-derive H from average ranks computed the pedestrian way
    (pandas rank), independently of the 2×rank dictionary identity."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    df = pd.DataFrame(
        {"g": ev["event_type"], "v": (ev["value"] * 100).round().astype("int64")}
    )
    df["r"] = df["v"].rank(method="average")
    n = len(df)
    h_raw = 0.0
    for _, grp in df.groupby("g"):
        h_raw += grp["r"].sum() ** 2 / len(grp)
    h = 12.0 * h_raw / (n * (n + 1)) - 3 * (n + 1)
    t = df["v"].value_counts()
    c = 1.0 - float((t**3 - t).sum()) / (n**3 - n)
    row = queries()["stats_kruskal_wallis"](spark, sf_dir).collect()[0]
    # h_milli floor-quantizes Σ R_g²/(n_g·N) to 1e-3 ⇒ |ΔH| ≤ 12·k/(1000(N+1))
    assert abs(row["h"] - h) < 1e-4
    assert abs(row["h_corrected"] - h / c) < 1e-4
    assert row["n"] == n
    assert row["tie_t"] == int((t**3 - t).sum())


# --------------------------------------------------------------------------
# events_powerlaw_mle
# --------------------------------------------------------------------------


def test_powerlaw_matches_python_recompute(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    c = ev.groupby("user_id").size()
    tail = c[c >= 5]
    s_micro = sum(
        int(m) * math.floor(math.log(cv / 5.0) * 1_000_000)
        for cv, m in Counter(tail).items()
    )
    n_tail = len(tail)
    row = queries()["events_powerlaw_mle"](spark, sf_dir).collect()[0]
    assert row["n_tail"] == n_tail
    assert row["s_micro"] == s_micro
    assert row["alpha"] == 1.0 + n_tail * 1_000_000 / s_micro
    # a genuine heavy-ish tail: alpha in a sane band
    assert 1.0 < row["alpha"] < 10.0


# --------------------------------------------------------------------------
# text_dup_ngram_fraction
# --------------------------------------------------------------------------


def _py_shingles(text: str) -> list[str]:
    w = [t for t in text.lower().split() if t]
    return [" ".join(w[i : i + 3]) for i in range(len(w) - 2)]


def test_dup_ngram_matches_python_recompute(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    occ: dict[int, Counter] = {}
    meta = {}
    for r in docs.itertuples():
        sh = _py_shingles(r.text)
        if not sh:
            continue
        occ[r.doc_id] = Counter(
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in sh
        )
        meta[r.doc_id] = r.source
    doc_count = Counter(h for c in occ.values() for h in c)
    per_source = defaultdict(lambda: [0, 0, 0, 0, 0])  # docs, ppm_sum, templ, dup, tot
    for doc_id, c in occ.items():
        tot = sum(c.values())
        dup = sum(cnt for h, cnt in c.items() if doc_count[h] >= 2)
        ppm = dup * 1_000_000 // tot
        agg = per_source[meta[doc_id]]
        agg[0] += 1
        agg[1] += ppm
        agg[2] += ppm >= 200_000
        agg[3] += dup
        agg[4] += tot
    expect = sorted(
        (src, a[0], a[1] // a[0], a[2], a[3], a[4]) for src, a in per_source.items()
    )
    rows = queries()["text_dup_ngram_fraction"](spark, sf_dir).collect()
    got = [
        (r["source"], r["n_docs"], r["mean_dup_ppm"], r["n_templated"],
         r["dup_positions"], r["total_positions"])
        for r in rows
    ]
    assert got == expect
    # the signal discriminates: somewhere in the corpus there ARE cross-doc dups
    assert sum(r["dup_positions"] for r in rows) > 0


# --------------------------------------------------------------------------
# quality_classifier_linear
# --------------------------------------------------------------------------


def _py_qc_weight(feat: str) -> int:
    b = int(hashlib.md5(feat.encode()).hexdigest()[:15], 16) % 65536
    return (b * 2654435761) % (1 << 20) - (1 << 19)


def test_quality_classifier_matches_python_recompute(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per_source = defaultdict(lambda: [0, 0, 0, 0])  # docs, pos, logit_sum, feats
    for r in docs.itertuples():
        w = [t for t in r.text.lower().split() if t]
        feats = w + [f"{a}_{b}" for a, b in zip(w, w[1:])]
        if not feats:
            continue
        sw = sum(_py_qc_weight(f) for f in feats)
        # both engines truncate toward zero:
        q = abs(1000 * sw) // len(feats)
        logit_milli = q if sw >= 0 else -q
        agg = per_source[r.source]
        agg[0] += 1
        agg[1] += logit_milli > 0
        agg[2] += logit_milli
        agg[3] += len(feats)
    def trunc_div(a: int, b: int) -> int:
        q, _ = divmod(abs(a), b)
        return q if a >= 0 else -q
    expect = sorted(
        (src, a[0], a[1], a[1] * 1_000_000 // a[0], trunc_div(a[2], a[0]), a[3])
        for src, a in per_source.items()
    )
    rows = queries()["quality_classifier_linear"](spark, sf_dir).collect()
    got = [
        (r["source"], r["n_docs"], r["n_positive"], r["pos_share_ppm"],
         r["mean_logit_milli"], r["total_features"])
        for r in rows
    ]
    assert got == expect
    # the surrogate classifier is non-degenerate: both classes appear
    n_pos = sum(r["n_positive"] for r in rows)
    n_docs = sum(r["n_docs"] for r in rows)
    assert 0 < n_pos < n_docs


# --------------------------------------------------------------------------
# similarity_range_radius
# --------------------------------------------------------------------------


def test_range_radius_matches_numpy_recompute(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    q = np.floor(np.stack(emb["embedding"].to_numpy()).astype("float64") * (1 << 20)).astype(
        "int64"
    )
    ids = emb["vec_id"].to_numpy()
    probe_mask = ids < 20
    expect = []
    for pid, pv in zip(ids[probe_mask], q[probe_mask]):
        diff = q - pv
        d2 = (diff * diff).sum(axis=1)
        sel = (d2 <= 1_600_000_000_000) & (ids != pid)
        expect.append(
            (
                int(pid),
                int(sel.sum()),
                int(d2[sel].min()) if sel.any() else -1,
                int(ids[sel].sum()),
            )
        )
    expect.sort()
    rows = queries()["similarity_range_radius"](spark, sf_dir).collect()
    got = [(r["vec_id"], r["n_neighbors"], r["min_d2"], r["sum_nbr_ids"]) for r in rows]
    assert got == expect
    assert any(r["n_neighbors"] > 0 for r in rows)


# --------------------------------------------------------------------------
# Plan pins: everything stays JVM-side and on its scale shape
# --------------------------------------------------------------------------


def test_wave3_plans_stay_jvm_side(spark, sf_dir):
    qs = queries()
    for name in (
        "stats_anova_oneway",
        "stats_kruskal_wallis",
        "events_powerlaw_mle",
        "text_dup_ngram_fraction",
        "quality_classifier_linear",
        "similarity_range_radius",
    ):
        plan = physical_plan(qs[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_range_radius_probe_side_is_broadcast(spark, sf_dir):
    plan = physical_plan(queries()["similarity_range_radius"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_kruskal_rank_runs_on_dictionary_not_rows(spark, sf_dir):
    """The running rank must consume the cents dictionary, not data rows:
    no unpartitioned Window over the raw events scan."""
    plan = physical_plan(queries()["stats_kruskal_wallis"](spark, sf_dir))
    # the rank machinery is range-partitioned: a bare single-partition
    # window over the events scan would show as 'Window' directly over
    # a FileScan subtree with no preceding HashAggregate
    assert "HashAggregate" in plan
