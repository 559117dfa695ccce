"""Third-engine recomputes + plan pins for the round-8 wave-3 additions
(ANOVA, Kruskal-Wallis, power-law MLE, duplicate n-gram fraction, the
hashed linear quality classifier, and exact ε-ball range search).

The DuckDB oracle compare is the driver's job; these tests re-derive the
same answers in plain Python/pandas/numpy and pin the plan shapes that
keep each operator on its scale path."""

from __future__ import annotations

import pytest

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


# --------------------------------------------------------------------------
# events_did_uplift
# --------------------------------------------------------------------------


def test_did_matches_python_recompute_and_aa_calibrates(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    mid = (int(us.min()) + int(us.max())) // 2
    grp = ev["user_id"].astype(str).map(
        lambda u: int(hashlib.md5(u.encode()).hexdigest()[0], 16) % 2
    )
    period = (us >= mid).astype(int)
    v = (ev["value"] * 100).round().astype("int64")
    cells = {}
    for g in (0, 1):
        for p in (0, 1):
            sel = (grp == g) & (period == p)
            cells[(g, p)] = (int(sel.sum()), int(v[sel].sum()))
    row = queries()["events_did_uplift"](spark, sf_dir).collect()[0]
    assert (row["n_a_pre"], row["s_a_pre"]) == cells[(0, 0)]
    assert (row["n_b_post"], row["s_b_post"]) == cells[(1, 1)]
    did = (cells[(1, 1)][1] / cells[(1, 1)][0] - cells[(1, 0)][1] / cells[(1, 0)][0]) - (
        cells[(0, 1)][1] / cells[(0, 1)][0] - cells[(0, 0)][1] / cells[(0, 0)][0]
    )
    assert row["did_cents"] == did
    # A/A calibration: hash split is independent of time, so |DiD| is small
    # relative to the mean value (~50000 cents)
    assert abs(row["did_cents"]) < 5000


# --------------------------------------------------------------------------
# events_attribution_position
# --------------------------------------------------------------------------


def test_position_attribution_credit_conserved(spark, sf_dir):
    """Every purchase distributes exactly 1,000,000 ppm across its path
    (the floor remainder goes to the first touch) — total credit must be
    10⁶ × purchases, integer-exact."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    n_purchases = int((ev["event_type"] == "purchase").sum())
    rows = queries()["events_attribution_position"](spark, sf_dir).collect()
    assert sum(r["credit_ppm"] for r in rows) == 1_000_000 * n_purchases
    channels = {r["channel"] for r in rows}
    assert channels <= {"click", "view", "organic"}


def test_position_attribution_matches_python_recompute(spark, sf_dir):
    ev = (
        pd.read_parquet(f"{sf_dir}/events.parquet")
        .query("event_type in ('click', 'view', 'purchase')")
        .assign(us=lambda d: d["ts"].astype("datetime64[us]").astype("int64"))
        .sort_values(["user_id", "us", "event_type", "event_id"])
    )
    # order within a user must match (ts, is_purchase, event_id)
    credit = Counter()
    ncred = Counter()
    for _, g in ev.groupby("user_id"):
        recs = sorted(
            g.itertuples(),
            key=lambda r: (r.us, 1 if r.event_type == "purchase" else 0, r.event_id),
        )
        path = []
        for r in recs:
            if r.event_type == "purchase":
                n = len(path)
                if n == 0:
                    credit["organic"] += 1_000_000
                    ncred["organic"] += 1
                elif n == 1:
                    credit[path[0]] += 1_000_000
                    ncred[path[0]] += 1
                elif n == 2:
                    for c in path:
                        credit[c] += 500_000
                        ncred[c] += 1
                else:
                    mid_w = 200_000 // (n - 2)
                    rem = 200_000 - mid_w * (n - 2)
                    for i, c in enumerate(path):
                        w = (
                            400_000 + rem
                            if i == 0
                            else 400_000
                            if i == n - 1
                            else mid_w
                        )
                        credit[c] += w
                        ncred[c] += 1
                path = []
            else:
                path.append(r.event_type)
    rows = queries()["events_attribution_position"](spark, sf_dir).collect()
    got = {r["channel"]: (r["n_credited"], r["credit_ppm"]) for r in rows}
    assert got == {c: (ncred[c], credit[c]) for c in credit}


# --------------------------------------------------------------------------
# text_ppl_buckets
# --------------------------------------------------------------------------


def test_ppl_buckets_partition_docs_evenly_per_lang(spark, sf_dir):
    rows = queries()["text_ppl_buckets"](spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per_lang = defaultdict(dict)
    for r in rows:
        per_lang[r["lang"]][r["bucket"]] = r["n_docs"]
    for lang, buckets in per_lang.items():
        n = sum(buckets.values())
        # ntile(3): bucket sizes differ by at most 1
        assert max(buckets.values()) - min(buckets.values()) <= 1, (lang, buckets)
        # scored docs = docs of that lang with ≥1 length-3 alnum token
        assert n <= int((docs["lang"] == lang).sum())
    # head has HIGHER key (closer to zero ⇒ lower perplexity) than tail
    for r_head in rows:
        if r_head["bucket"] != "head":
            continue
        for r_tail in rows:
            if r_tail["lang"] == r_head["lang"] and r_tail["bucket"] == "tail":
                assert r_head["min_key_nano"] >= r_tail["max_key_nano"]


# --------------------------------------------------------------------------
# stats_kendall_tau_binned
# --------------------------------------------------------------------------


def test_kendall_matches_python_recompute(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    import re as _re

    stop = _re.compile(r"\b(the|and|of|to|is|a|in)\b")
    x = docs["n_chars"].to_numpy()
    y = np.array(
        [
            len(stop.findall(t.lower())) * 1_000_000 // max(len([w for w in t.lower().split() if w]), 1)
            for t in docs["text"]
        ]
    )
    ids = docs["doc_id"].to_numpy()

    def ntile(vals, k):
        order = np.lexsort((ids, vals))
        n = len(vals)
        base, rem = divmod(n, k)
        out = np.empty(n, dtype=int)
        start = 0
        for tile in range(1, k + 1):
            size = base + (1 if tile <= rem else 0)
            out[order[start : start + size]] = tile
            start += size
        return out

    bx, by = ntile(x, 10), ntile(y, 10)
    grid = Counter(zip(bx, by))
    c = d = 0
    for (i, j), f in grid.items():
        for (i2, j2), f2 in grid.items():
            if i < i2 and j < j2:
                c += f * f2
            elif i < i2 and j > j2:
                d += f * f2
    n = len(x)
    tie_x = sum(f * (f - 1) // 2 for f in Counter(bx).values())
    tie_y = sum(f * (f - 1) // 2 for f in Counter(by).values())
    row = queries()["stats_kendall_tau_binned"](spark, sf_dir).collect()[0]
    assert (row["n"], row["c_pairs"], row["d_pairs"], row["tie_x"], row["tie_y"]) == (
        n, c, d, tie_x, tie_y,
    )
    assert row["tau_b"] == (c - d) / math.sqrt(
        (n * (n - 1) / 2 - tie_x) * (n * (n - 1) / 2 - tie_y)
    )


# --------------------------------------------------------------------------
# events_survival_km
# --------------------------------------------------------------------------


def test_km_matches_python_recompute(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.assign(us=us)
    horizon = int(us.max())
    entry = ev[ev["event_type"] == "signup"].groupby("user_id")["us"].min()
    durs = []
    for uid, t0 in entry.items():
        p = ev[(ev["event_type"] == "purchase") & (ev["user_id"] == uid) & (ev["us"] >= t0)]
        if len(p):
            durs.append(((int(p["us"].min()) - int(t0)) // 86_400_000_000, 1))
        else:
            durs.append(((horizon - int(t0)) // 86_400_000_000, 0))
    days = sorted({d for d, o in durs if o == 1})
    rows = queries()["events_survival_km"](spark, sf_dir).collect()
    assert [r["day"] for r in rows] == days
    surv = 1.0
    ln_micro = 0
    for r in rows:
        at_risk = sum(1 for d, _ in durs if d >= r["day"])
        d_t = sum(1 for d, o in durs if d == r["day"] and o == 1)
        assert (r["n_risk"], r["d"]) == (at_risk, d_t)
        if d_t < at_risk:
            ln_micro += math.floor(math.log((at_risk - d_t) / at_risk) * 1_000_000)
            assert r["ln_s_micro"] == ln_micro
            assert r["survival"] == round(math.exp(ln_micro / 1_000_000), 6)
        else:
            assert r["survival"] == 0.0
    # survival is monotone non-increasing
    s = [r["survival"] for r in rows]
    assert all(a >= b for a, b in zip(s, s[1:]))


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_wave3b_plans_stay_jvm_side(spark, sf_dir):
    qs = queries()
    for name in (
        "events_did_uplift",
        "events_attribution_position",
        "text_ppl_buckets",
        "stats_kendall_tau_binned",
        "events_survival_km",
    ):
        plan = physical_plan(qs[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


# --------------------------------------------------------------------------
# stats_cohens_kappa
# --------------------------------------------------------------------------


def test_kappa_matches_confusion_recompute(spark, sf_dir):
    """Kappa must recombine exactly from the already-verified confusion
    matrix (text_langid_confusion is oracle-checked)."""
    cells = queries()["text_langid_confusion"](spark, sf_dir).collect()
    n = sum(r["n"] for r in cells)
    agree = sum(r["n"] for r in cells if r["lang_true"] == r["lang_pred"])
    row_m = Counter()
    col_m = Counter()
    for r in cells:
        row_m[r["lang_true"]] += r["n"]
        col_m[r["lang_pred"]] += r["n"]
    pe_num = sum(row_m[c] * col_m[c] for c in set(row_m) | set(col_m))
    row = queries()["stats_cohens_kappa"](spark, sf_dir).collect()[0]
    assert (row["n"], row["agree"], row["pe_num"]) == (n, agree, pe_num)
    assert row["kappa"] == (n * agree - pe_num) / (n * n - pe_num)
    # kappa is a proper chance-corrected score: bounded, and at the tiny
    # fixture SF the marker heuristic sits NEAR chance (|kappa| small) —
    # the informative pin is the exact integer recombination above.
    assert -1.0 <= row["kappa"] <= 1.0


# --------------------------------------------------------------------------
# multimodal_phash_neardup — full Python re-derivation (rows-only witness)
# --------------------------------------------------------------------------


def _py_phash(payload: bytes) -> int:
    tot = sum(payload)
    h = 0
    for i in range(64):
        if 64 * sum(payload[i::64]) > tot:
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h


def test_phash_neardup_matches_python_rederivation(spark, sf_dir):
    """Re-derive kernel + banding + Hamming verify end-to-end from the
    raw bytes: the rows-only output's witness columns (phash_a, phash_b,
    hamming) must match exactly."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    ph = {int(r.doc_id): _py_phash(r.text.encode()) for r in docs.itertuples()}
    buckets = defaultdict(list)
    for d, h in ph.items():
        uh = h & ((1 << 64) - 1)
        for band in range(4):
            buckets[(band, (uh >> (band * 16)) & 0xFFFF)].append(d)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    expect = sorted(
        (a, b, bin((ph[a] ^ ph[b]) & ((1 << 64) - 1)).count("1"), ph[a], ph[b])
        for a, b in pairs
        if bin((ph[a] ^ ph[b]) & ((1 << 64) - 1)).count("1") <= 3
    )
    rows = queries()["multimodal_phash_neardup"](spark, sf_dir).collect()
    got = [
        (r["doc_a"], r["doc_b"], r["hamming"], r["phash_a"], r["phash_b"]) for r in rows
    ]
    assert got == expect
    assert len(got) > 0  # the fixture does contain near-dup payloads


def test_phash_banding_is_complete_for_hamming_3(spark, sf_dir):
    """Pigeonhole: every pair with Hamming ≤ 3 must share at least one
    16-bit band, so banding loses nothing at the emitted radius."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    ph = {int(r.doc_id): _py_phash(r.text.encode()) for r in docs.itertuples()}
    ids = sorted(ph)
    rows = queries()["multimodal_phash_neardup"](spark, sf_dir).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in rows}
    # brute-force ALL pairs at fixture scale
    brute = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if bin((ph[a] ^ ph[b]) & ((1 << 64) - 1)).count("1") <= 3:
                brute.add((a, b))
    assert got == brute


def test_phash_plan_payload_bytes_never_shuffle(spark, sf_dir):
    plan = physical_plan(queries()["multimodal_phash_neardup"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the fingerprint table is checkpointed (Scan ExistingRDD): the band
    # self-join reuses one materialization instead of re-running the
    # Python kernel per side — and nothing downstream re-enters Python.
    assert "ExistingRDD" in plan
    assert "BatchEvalPython" not in plan


# --------------------------------------------------------------------------
# join_asof_nearest
# --------------------------------------------------------------------------


def test_asof_nearest_matches_python_recompute(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.assign(us=us)
    errs = defaultdict(list)
    for r in ev[ev["event_type"] == "error"].itertuples():
        errs[r.user_id].append(r.us)
    expect = []
    for r in ev[ev["event_type"] == "purchase"].itertuples():
        ts = r.us
        back = [ts - e for e in errs.get(r.user_id, []) if e <= ts]
        fwd = [e - ts for e in errs.get(r.user_id, []) if e >= ts]
        d_back = min(back) if back else None
        d_fwd = min(fwd) if fwd else None
        if d_back is None and d_fwd is None:
            expect.append((r.event_id, r.user_id, "none", None))
        elif d_fwd is None or (d_back is not None and d_back <= d_fwd):
            expect.append((r.event_id, r.user_id, "backward", d_back))
        else:
            expect.append((r.event_id, r.user_id, "forward", d_fwd))
    expect.sort()
    rows = queries()["join_asof_nearest"](spark, sf_dir).collect()
    got = [(r["event_id"], r["user_id"], r["direction"], r["delta_us"]) for r in rows]
    assert got == expect
    # the nearest direction genuinely uses both sides on this fixture
    dirs = {d for _, _, d, _ in got}
    assert "backward" in dirs and "forward" in dirs


def test_asof_nearest_plan_has_no_range_join(spark, sf_dir):
    plan = physical_plan(queries()["join_asof_nearest"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # no O(n·m) fallback
    assert "Window" in plan  # the two mirrored fill windows


# --------------------------------------------------------------------------
# orders_bootstrap_ci_poisson
# --------------------------------------------------------------------------


def test_bootstrap_matches_python_recompute(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    keys = orders["o_orderkey"].astype(str)
    cuts = (385749, 771499, 964373, 1028665, 1044738)

    def w(key: str, b: int) -> int:
        u = int(hashlib.md5(f"{key}_{b}".encode()).hexdigest()[:5], 16)
        for k, c in enumerate(cuts):
            if u < c:
                return k
        return 5

    means = []
    for b in range(32):
        ws = np.array([w(k, b) for k in keys], dtype="int64")
        means.append(float((ws * cents.to_numpy()).sum()) / int(ws.sum()))
    means.sort()
    row = queries()["orders_bootstrap_ci_poisson"](spark, sf_dir).collect()[0]
    assert row["n_orders"] == len(orders)
    assert row["mean_price"] == int(cents.sum()) / len(orders) / 100
    assert row["ci_lo"] == means[1] / 100
    assert row["ci_hi"] == means[30] / 100
    # the interval brackets the point estimate
    assert row["ci_lo"] <= row["mean_price"] <= row["ci_hi"]


def test_bootstrap_plan_is_one_shuffle_of_replicate_keys(spark, sf_dir):
    plan = physical_plan(queries()["orders_bootstrap_ci_poisson"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the explode is map-side: Generate under the scan, no join before the agg
    assert "Generate explode" in plan


# --------------------------------------------------------------------------
# graph_hits_bipartite
# --------------------------------------------------------------------------


def test_hits_matches_python_recompute(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    od = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    e = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")[
        ["o_custkey", "l_partkey"]
    ].drop_duplicates()
    h1 = Counter(e["o_custkey"])
    a1 = Counter()
    for c, p in e.itertuples(index=False):
        a1[p] += h1[c]
    h2 = Counter()
    for c, p in e.itertuples(index=False):
        h2[c] += a1[p]
    a2 = Counter()
    for c, p in e.itertuples(index=False):
        a2[p] += h2[c]
    top = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = queries()["graph_hits_bipartite"](spark, sf_dir).collect()
    got = [(r["part_key"], r["a2"]) for r in rows]
    assert got == [(p, s) for p, s in top]
    assert all(r["n_parts_total"] == len(a2) for r in rows)
    assert all(r["a1"] == a1[r["part_key"]] for r in rows)


def test_hits_plan_is_topk_not_global_sort(spark, sf_dir):
    plan = physical_plan(queries()["graph_hits_bipartite"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# quality_signal_agreement
# --------------------------------------------------------------------------


def test_signal_agreement_consistency(spark, sf_dir):
    """The grid must be internally consistent and consistent with the
    two (already-verified) constituent signals: cell counts sum to n,
    the diagonal sums to agree, per-axis marginals are near-equal
    (ntile(3) property), and kappa recombines exactly."""
    row = queries()["quality_signal_agreement"](spark, sf_dir).collect()[0]
    cells = {(i, j): row[f"c_{i}{j}"] for i in (1, 2, 3) for j in (1, 2, 3)}
    assert sum(cells.values()) == row["n"]
    assert sum(cells[(i, i)] for i in (1, 2, 3)) == row["agree"]
    rowm = {i: sum(cells[(i, j)] for j in (1, 2, 3)) for i in (1, 2, 3)}
    colm = {j: sum(cells[(i, j)] for i in (1, 2, 3)) for j in (1, 2, 3)}
    assert max(rowm.values()) - min(rowm.values()) <= 1
    assert max(colm.values()) - min(colm.values()) <= 1
    assert row["pe_num"] == sum(rowm[t] * colm[t] for t in (1, 2, 3))
    n = row["n"]
    assert row["kappa"] == (n * row["agree"] - row["pe_num"]) / (n * n - row["pe_num"])
    # joined docs = docs scored by BOTH signals
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert 0 < n <= len(docs)


# --------------------------------------------------------------------------
# events_sequence_match
# --------------------------------------------------------------------------


def test_sequence_match_matches_python_recompute(spark, sf_dir):
    import re as _re

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.assign(us=ev["ts"].astype("datetime64[us]").astype("int64"))
    char = {"view": "V", "click": "C", "purchase": "P", "error": "E", "signup": "S"}
    seqs = {}
    for uid, g in ev.groupby("user_id"):
        recs = sorted(g.itertuples(), key=lambda r: (r.us, r.event_id))
        seqs[uid] = "".join(char[r.event_type] for r in recs)
    pats = {
        "view_click_buy": "VC*P",
        "strict_funnel": "VCP",
        "buy_then_error": "P[^P]*E",
        "double_purchase": "P[VCES]*P",
    }
    rows = queries()["events_sequence_match"](spark, sf_dir).collect()
    got = {r["pattern"]: (r["n_matched"], r["n_users"], r["share_ppm"]) for r in rows}
    n_users = len(seqs)
    for name, rx in pats.items():
        n = sum(1 for s in seqs.values() if _re.search(rx, s))
        assert got[name] == (n, n_users, n * 1_000_000 // n_users), name
    # the patterns discriminate: strict funnel ⊆ relaxed funnel
    assert got["strict_funnel"][0] <= got["view_click_buy"][0]
    assert any(v[0] > 0 for v in got.values())


# --------------------------------------------------------------------------
# text_rake_keyphrases
# --------------------------------------------------------------------------


def test_rake_matches_python_recompute(spark, sf_dir):
    import re as _re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    split = _re.compile(r"(\b(the|and|of|to|is|a|in)\b|[^a-z0-9 ]+)")
    phrases = []
    for t in docs["text"]:
        for frag in split.split(t.lower()):
            if frag is None or split.fullmatch(frag or ""):
                continue
            p = _re.sub(" +", " ", frag).strip()
            if p:
                phrases.append(p)
    freq = Counter()
    deg = Counter()
    for p in phrases:
        ws = p.split(" ")
        for w in ws:
            freq[w] += 1
            deg[w] += len(ws)
    s_micro = {w: deg[w] * 1_000_000 // freq[w] for w in freq}
    occ = Counter(phrases)
    scored = [
        (sum(s_micro[w] for w in p.split(" ")), p, n) for p, n in occ.items()
    ]
    top = sorted(scored, key=lambda x: (-x[0], x[1]))[:20]
    rows = queries()["text_rake_keyphrases"](spark, sf_dir).collect()
    got = [(r["score_micro"], r["phrase"], r["n_occurrences"]) for r in rows]
    assert got == top
    # multiword phrases exist (the point of RAKE over word TF-IDF)
    assert any(" " in p for _, p, _ in got)


# --------------------------------------------------------------------------
# stats_brown_forsythe
# --------------------------------------------------------------------------


def test_brown_forsythe_matches_python_recompute(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    df = pd.DataFrame(
        {"g": ev["event_type"], "v": (ev["value"] * 100).round().astype("int64")}
    )
    zs = {}
    for g, grp in df.groupby("g"):
        vs = sorted(grp["v"])
        # lower median: smallest v with 2*cum >= n
        n = len(vs)
        cum = 0
        med = None
        for v, c in sorted(Counter(vs).items()):
            cum += c
            if 2 * cum >= n:
                med = v
                break
        zs[g] = [abs(v - med) for v in vs]
    k = len(zs)
    n = sum(len(z) for z in zs.values())
    s = sum(sum(z) for z in zs.values())
    q = sum(sum(x * x for x in z) for z in zs.values())
    ssbq = sum(sum(z) ** 2 // len(z) for z in zs.values())
    row = queries()["stats_brown_forsythe"](spark, sf_dir).collect()[0]
    assert (row["k"], row["n"], row["s"], row["q"], row["ssbq"]) == (k, n, s, q, ssbq)
    ssb = float(ssbq) - float(s) * s / n
    ssw = float(q) - ssbq
    assert row["f_stat"] == (ssb / (k - 1)) / (ssw / (n - k))


# --------------------------------------------------------------------------
# text_heaps_law_fit
# --------------------------------------------------------------------------


def test_heaps_matches_python_recompute_and_beta_sane(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").sort_values("doc_id")
    seen = set()
    t_cum = v_cum = 0
    pts = []
    for text in docs["text"]:
        ws = [w for w in text.lower().split() if w]
        t_cum += len(ws)
        for w in ws:
            if w not in seen:
                seen.add(w)
                v_cum += 1
        if t_cum > 0 and v_cum > 0:
            pts.append(
                (
                    math.floor(math.log(t_cum) * 1_000_000),
                    math.floor(math.log(v_cum) * 1_000_000),
                )
            )
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    row = queries()["text_heaps_law_fit"](spark, sf_dir).collect()[0]
    assert (row["n"], row["sx"], row["sy"]) == (n, sx, sy)
    assert row["beta"] == (n * float(sxy) - float(sx) * sy) / (
        n * float(sxx) - float(sx) * sx
    )
    # sublinear vocabulary growth — the Heaps regime
    assert 0.0 < row["beta"] < 1.0


# --------------------------------------------------------------------------
# events_periodogram_dft
# --------------------------------------------------------------------------


def test_periodogram_matches_python_recompute(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev["ts"].astype("datetime64[us]").dt.normalize()
    d0 = days.min()
    t_idx = ((days - d0).dt.days).to_numpy()
    n_days = int(t_idx.max()) + 1
    x = np.zeros(n_days, dtype="int64")
    for t in t_idx:
        x[t] += 1
    rows = queries()["events_periodogram_dft"](spark, sf_dir).collect()
    got = {r["period_days"]: r for r in rows}
    for p in (5, 7, 14, 30):
        a = sum(
            int(x[t]) * math.floor(math.cos(2 * math.pi * t / p) * 1_000_000)
            for t in range(n_days)
        )
        b = sum(
            int(x[t]) * math.floor(math.sin(2 * math.pi * t / p) * 1_000_000)
            for t in range(n_days)
        )
        r = got[p]
        assert (r["n_days"], r["a_micro"], r["b_micro"]) == (n_days, a, b), p
        assert r["power"] == round(
            ((a / 1e6) ** 2 + (b / 1e6) ** 2) / n_days, 4
        )


def test_wave7_plans_stay_jvm_side(spark, sf_dir):
    qs = queries()
    for name in ("stats_brown_forsythe", "text_heaps_law_fit", "events_periodogram_dft"):
        plan = physical_plan(qs[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
