"""Third-engine recomputes + plan pins for the round-8 wave-4 additions
(Welch's t, Jarque-Bera, Cramér's V, Ljung-Box, Theil-Sen).

The DuckDB oracle compare is the driver's job; these tests re-derive the
same answers in plain Python/pandas/numpy and pin the plan shapes that
keep each operator on its scale path."""

from __future__ import annotations

import pytest

import math

import numpy as np
import pandas as pd

from gluettalax_spark.registry import queries
from tests.test_plans import physical_plan


# --------------------------------------------------------------------------
# stats_welch_ttest
# --------------------------------------------------------------------------


def test_welch_matches_python_recompute(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    v = (ev["value"] * 100).round().astype("int64")
    a = v[ev["event_type"] == "click"]
    b = v[ev["event_type"] == "purchase"]
    row = queries()["stats_welch_ttest"](spark, sf_dir).collect()[0]
    assert (row["n1"], row["n2"]) == (len(a), len(b))
    assert (row["s1"], row["s2"]) == (int(a.sum()), int(b.sum()))
    assert (row["q1"], row["q2"]) == (
        int((a.astype(object) ** 2).sum()),
        int((b.astype(object) ** 2).sum()),
    )
    va = a.var(ddof=1)
    vb = b.var(ddof=1)
    t = (a.mean() - b.mean()) / math.sqrt(va / len(a) + vb / len(b))
    assert abs(row["t_stat"] - t) < 1e-4
    se = va / len(a) + vb / len(b)
    df = se * se / ((va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1))
    assert abs(row["df_welch"] - df) < 1e-2
    # A near-symmetric synthetic fixture: |t| should be modest but df huge
    assert row["df_welch"] > 50


def test_welch_single_aggregate_plan(spark, sf_dir):
    plan = physical_plan(queries()["stats_welch_ttest"](spark, sf_dir))
    assert "Join" not in plan  # one conditional aggregate, no reshuffle joins
    assert plan.count("Exchange") <= 1


# --------------------------------------------------------------------------
# stats_jarque_bera
# --------------------------------------------------------------------------


def test_jarque_bera_matches_python_recompute(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    # SQL round() is HALF_UP; numpy/pandas round is banker's — match SQL
    v = np.floor(orders["o_totalprice"].to_numpy() + 0.5).astype("int64")
    n = len(v)
    m = v.mean()
    m2 = ((v - m) ** 2).mean()
    m3 = ((v - m) ** 3).mean()
    m4 = ((v - m) ** 4).mean()
    skew = m3 / m2**1.5
    kurt = m4 / m2**2 - 3.0
    jb = n / 6.0 * (skew**2 + kurt**2 / 4.0)
    row = queries()["stats_jarque_bera"](spark, sf_dir).collect()[0]
    assert row["n"] == n and row["s1"] == int(v.sum())
    assert abs(row["skewness"] - skew) < 1e-4
    assert abs(row["kurtosis_excess"] - kurt) < 1e-4
    assert abs(row["jb_stat"] - jb) / max(jb, 1.0) < 1e-3
    # calibration: fixture totals are near-uniform — symmetric (small
    # skew) but flat-topped (negative excess kurtosis ≈ -1.2), so JB
    # still rejects normality, driven by the kurtosis term
    assert abs(row["skewness"]) < 0.5
    assert row["kurtosis_excess"] < -0.5
    assert row["jb_stat"] > 10


def test_jarque_bera_plan_is_one_aggregate(spark, sf_dir):
    plan = physical_plan(queries()["stats_jarque_bera"](spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1


# --------------------------------------------------------------------------
# stats_cramers_v
# --------------------------------------------------------------------------


def test_cramers_v_matches_python_recompute(spark, sf_dir):
    import hashlib

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    grp = ev["user_id"].map(
        lambda u: int(hashlib.md5(str(u).encode()).hexdigest()[0], 16) % 4
    )
    tab = pd.crosstab(ev["event_type"], grp)
    o = tab.to_numpy().astype(object)
    n = int(o.sum())
    rt = o.sum(axis=1)
    ct = o.sum(axis=0)
    chi2_e9 = 0
    S = 1_000_000_000
    for i in range(o.shape[0]):
        for j in range(o.shape[1]):
            e_e9 = max((rt[i] * ct[j] * S) // n, 1)
            chi2_e9 += (o[i][j] * S - e_e9) ** 2 // e_e9
    row = queries()["stats_cramers_v"](spark, sf_dir).collect()[0]
    assert row["chi2_e9"] == chi2_e9
    assert row["n"] == n
    assert (row["n_types"], row["n_splits"]) == (o.shape[0], o.shape[1])
    v = math.sqrt((chi2_e9 / 1e9) / (n * (min(o.shape) - 1)))
    assert abs(row["cramers_v"] - v) < 1e-5
    # A/A calibration: the md5 split is independent of type, so V ≈ 0
    assert row["cramers_v"] < 0.1


# --------------------------------------------------------------------------
# stats_ljung_box
# --------------------------------------------------------------------------


def _daily_counts(sf_dir: str) -> np.ndarray:
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    day = orders["o_orderdate"].dt.normalize()
    counts = day.value_counts().sort_index()
    full = pd.date_range(counts.index.min(), counts.index.max(), freq="D")
    return counts.reindex(full, fill_value=0).to_numpy().astype("int64")


def test_ljung_box_matches_python_recompute(spark, sf_dir):
    x = _daily_counts(sf_dir)
    n = len(x)
    s = int(x.sum())
    d = (n * x.astype(object) - s).astype(object)
    den = int(sum(int(v) * int(v) for v in d))
    row = queries()["stats_ljung_box"](spark, sf_dir).collect()[0]
    assert row["n_days"] == n and row["total_orders"] == s
    q = 0.0
    for k in range(1, 8):
        num = int(sum(int(d[t]) * int(d[t + k]) for t in range(n - k)))
        acf = num / den
        assert abs(row[f"acf_{k}"] - acf) < 1e-5
        q += acf * acf / (n - k)
    q *= n * (n + 2)
    assert abs(row["q_stat"] - q) / max(abs(q), 1.0) < 1e-3


def test_ljung_box_grid_is_dense(spark, sf_dir):
    """Idle days must enter the series as zeros — the sparse form biases
    every lag product (same trap class as events_changepoint_cusum)."""
    x = _daily_counts(sf_dir)
    row = queries()["stats_ljung_box"](spark, sf_dir).collect()[0]
    # n_days is the CALENDAR span, not the distinct-active-day count
    assert row["n_days"] == len(x)
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    active = orders["o_orderdate"].dt.normalize().nunique()
    if active < len(x):  # fixture has idle days at small SFs
        assert row["n_days"] > active


# --------------------------------------------------------------------------
# stats_theil_sen
# --------------------------------------------------------------------------


def test_theil_sen_matches_python_recompute(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    m = (orders["o_orderdate"].dt.year - 1992) * 12 + (orders["o_orderdate"].dt.month - 1)
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    monthly = pd.DataFrame({"m": m, "r": cents}).groupby("m")["r"].sum().sort_index()
    ms = monthly.index.to_numpy()
    rs = monthly.to_numpy()
    slopes = []
    for i in range(len(ms)):
        for j in range(i + 1, len(ms)):
            slopes.append(math.floor(1e6 * ((rs[j] - rs[i]) / (ms[j] - ms[i]))))
    slopes.sort()
    n_pairs = len(slopes)
    med = slopes[(n_pairs + 1) // 2 - 1]
    row = queries()["stats_theil_sen"](spark, sf_dir).collect()[0]
    assert row["n_months"] == len(ms)
    assert row["n_pairs"] == n_pairs
    assert row["sen_slope_micro"] == med
    assert abs(row["sen_slope_dollars"] - med / 1e6 / 100.0) < 1e-3


def test_theil_sen_robust_to_outlier_month(spark, sf_dir):
    """The estimator's whole point: a single corrupted month must not
    move the slope the way it moves OLS. Verified on the recomputed
    series (pure Python) — corrupt one month's revenue 100× and check
    the Theil-Sen slope moves by far less than the OLS slope does."""
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    m = (orders["o_orderdate"].dt.year - 1992) * 12 + (orders["o_orderdate"].dt.month - 1)
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    monthly = pd.DataFrame({"m": m, "r": cents}).groupby("m")["r"].sum().sort_index()
    ms = monthly.index.to_numpy().astype(float)
    rs = monthly.to_numpy().astype(float)

    def sen(ms, rs):
        sl = [
            (rs[j] - rs[i]) / (ms[j] - ms[i])
            for i in range(len(ms))
            for j in range(i + 1, len(ms))
        ]
        sl.sort()
        return sl[(len(sl) + 1) // 2 - 1]

    def ols(ms, rs):
        return np.polyfit(ms, rs, 1)[0]

    base_sen, base_ols = sen(ms, rs), ols(ms, rs)
    rs2 = rs.copy()
    rs2[len(rs2) // 2] *= 100.0
    scale = float(np.mean(np.abs(rs)))
    d_sen = abs(sen(ms, rs2) - base_sen) / scale
    d_ols = abs(ols(ms, rs2) - base_ols) / scale
    assert d_sen < d_ols / 5


def test_tseries_plans_stay_bounded(spark, sf_dir):
    """Both tseries ops collapse to the calendar grid in their FIRST
    aggregate; no data-scale join, window, or cartesian survives."""
    for name in ("stats_ljung_box", "stats_theil_sen"):
        plan = physical_plan(queries()[name](spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "Window" not in plan


# --------------------------------------------------------------------------
# orders_herfindahl
# --------------------------------------------------------------------------


def test_herfindahl_matches_python_recompute(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.floor(j["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
    rows = {
        r["segment"]: r
        for r in queries()["orders_herfindahl"](spark, sf_dir).collect()
    }
    for seg, g in j.groupby("c_mktsegment"):
        rev = g.groupby("o_custkey")["cents"].sum()
        tot = int(rev.sum())
        sq = int(sum(int(v) * int(v) for v in rev))
        hhi = sq * 1_000_000 // (tot * tot)
        r = rows[seg]
        assert r["n_customers"] == len(rev)
        assert r["total_cents"] == tot
        assert r["hhi_ppm"] == hhi
        assert r["top1_share_ppm"] == int(rev.max()) * 1_000_000 // tot
        # near-uniform fixture: HHI ≈ 1e6/n (within 3x)
        assert hhi < 3 * (1_000_000 // len(rev) + 1)


# --------------------------------------------------------------------------
# graph_clustering_coefficient
# --------------------------------------------------------------------------


def test_clustering_coefficient_matches_brute(spark, sf_dir):
    """Brute-force per-node triangle/wedge recompute from the capped,
    support-pruned edge set (replayed exactly as the builder defines it)."""
    from collections import defaultdict

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    sizes = op.groupby("l_orderkey")["l_partkey"].nunique()
    keep = set(sizes[sizes <= 256].index)
    op = op[op["l_orderkey"].isin(keep)]
    from itertools import combinations

    pair_count = defaultdict(int)
    for _, g in op.groupby("l_orderkey"):
        for a, b in combinations(sorted(g["l_partkey"]), 2):
            pair_count[(a, b)] += 1
    edges = {e for e, c in pair_count.items() if c >= 2}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri_per_node = defaultdict(int)
    n_tri = 0
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c counts each triangle once
                n_tri += 1
                tri_per_node[a] += 1
                tri_per_node[b] += 1
                tri_per_node[c] += 1
    n_wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    elig = [n for n in adj if len(adj[n]) >= 2]
    sum_cc = sum(
        2 * tri_per_node[n] * 1_000_000_000 // (len(adj[n]) * (len(adj[n]) - 1))
        for n in elig
    )
    row = queries()["graph_clustering_coefficient"](spark, sf_dir).collect()[0]
    assert row["n_nodes"] == len(adj)
    assert row["n_triangles"] == n_tri
    assert row["n_wedges"] == n_wedges
    assert row["n_eligible"] == len(elig)
    assert row["sum_local_cc_e9"] == sum_cc
    assert 0.0 <= row["global_cc"] <= 1.0
    assert 0.0 <= row["avg_local_cc"] <= 1.0


def test_clustering_coefficient_plan_no_cartesian(spark, sf_dir):
    plan = physical_plan(queries()["graph_clustering_coefficient"](spark, sf_dir))
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# text_ngram_novelty_decay
# --------------------------------------------------------------------------


def test_novelty_decay_matches_python_recompute(spark, sf_dir):
    import hashlib
    import re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    lo = int(docs["doc_id"].min())
    span = int(docs["doc_id"].max()) - lo + 1
    doc_sh = {}
    for _, r in docs.iterrows():
        toks = [t for t in re.split(r"\s+", r["text"].lower()) if t]
        if len(toks) < 3:
            continue
        hs = {
            int(hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()[:15], 16)
            for i in range(len(toks) - 2)
        }
        doc_sh[int(r["doc_id"])] = hs
    first = {}
    for d in sorted(doc_sh):
        for h in doc_sh[d]:
            first.setdefault(h, d)
    buckets = {}
    for d, hs in doc_sh.items():
        b = 10 * (d - lo) // span
        nb = buckets.setdefault(b, [0, 0, 0])
        nb[0] += 1
        nb[1] += len(hs)
        nb[2] += sum(1 for h in hs if first[h] == d)
    rows = {r["bucket"]: r for r in queries()["text_ngram_novelty_decay"](spark, sf_dir).collect()}
    assert set(rows) == set(buckets)
    for b, (nd, nsh, nnov) in buckets.items():
        r = rows[b]
        assert (r["n_docs"], r["n_shingles"], r["n_novel"]) == (nd, nsh, nnov)
        assert r["novelty_ppm"] == nnov * 1_000_000 // nsh
    # decay calibration: the first bucket is the most novel
    assert rows[0]["novelty_ppm"] == max(r["novelty_ppm"] for r in rows.values())


# --------------------------------------------------------------------------
# events_bounce_rate_sessions
# --------------------------------------------------------------------------


def test_bounce_rate_matches_python_recompute(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=30)
    stats = {}
    for _, g in ev.groupby("user_id"):
        cur_landing, cur_n, prev_ts = None, 0, None
        sessions = []
        for _, r in g.iterrows():
            if prev_ts is None or (r["ts"] - prev_ts) > gap:
                if cur_landing is not None:
                    sessions.append((cur_landing, cur_n))
                cur_landing, cur_n = r["event_type"], 0
            cur_n += 1
            prev_ts = r["ts"]
        sessions.append((cur_landing, cur_n))
        for landing, n in sessions:
            s = stats.setdefault(landing, [0, 0, 0])
            s[0] += 1
            s[1] += 1 if n == 1 else 0
            s[2] += n
    rows = {
        r["landing_type"]: r
        for r in queries()["events_bounce_rate_sessions"](spark, sf_dir).collect()
    }
    assert set(rows) == set(stats)
    for t, (ns, nb, ne) in stats.items():
        r = rows[t]
        assert (r["n_sessions"], r["n_bounces"]) == (ns, nb)
        assert r["bounce_ppm"] == nb * 1_000_000 // ns
        assert abs(r["avg_session_events"] - ne / ns) < 1e-3


def test_bounce_rate_windows_are_user_partitioned(spark, sf_dir):
    plan = physical_plan(queries()["events_bounce_rate_sessions"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    # one exchange feeds both windows + the session aggregate
    assert plan.count("hashpartitioning(user_id") >= 1


# --------------------------------------------------------------------------
# text_bpe_apply
# --------------------------------------------------------------------------


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_bpe_apply_totals_equal_train_final(spark, sf_dir):
    """Apply and train must agree: the corpus-wide post-merge token count
    from apply's per-source budgets equals the train op's final
    tokens_after — the two operators share one merge table by spec."""
    rows = queries()["text_bpe_apply"](spark, sf_dir).collect()
    total_tokens = sum(r["n_tokens"] for r in rows)
    train = queries()["text_bpe_train"](spark, sf_dir).collect()
    assert total_tokens == train[-1]["tokens_after"]
    for r in rows:
        assert r["n_tokens"] <= r["n_chars"]  # merges only shrink
        assert r["tokens_per_char_ppm"] == r["n_tokens"] * 1_000_000 // r["n_chars"]


def test_bpe_apply_matches_python_bpe(spark, sf_dir):
    """Greedy list-based BPE recompute (train on word dict, apply to
    per-source words) — independent of the separator-encoding trick."""
    import re
    from collections import Counter

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    words = Counter()
    src_words = Counter()
    for _, r in docs.iterrows():
        for w in re.findall(r"[a-z]+", r["text"].lower()):
            words[w + ">"] += 1
            src_words[(r["source"], w + ">")] += 1
    syms = {w: list(w) for w in words}
    for _ in range(6):
        pc = Counter()
        for w, s in syms.items():
            c = words[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        (l, r), _sc = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        for w, s in syms.items():
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    expected = {}
    for (src, w), c in src_words.items():
        e = expected.setdefault(src, [0, 0, 0])
        e[0] += c
        e[1] += c * len(w)
        e[2] += c * len(syms[w])
    rows = {r["source"]: r for r in queries()["text_bpe_apply"](spark, sf_dir).collect()}
    assert set(rows) == set(expected)
    for src, (nw, nc, nt) in expected.items():
        r = rows[src]
        assert (r["n_words"], r["n_chars"], r["n_tokens"]) == (nw, nc, nt)


# --------------------------------------------------------------------------
# similarity_silhouette
# --------------------------------------------------------------------------


def test_silhouette_matches_python_recompute(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64) for _, r in emb.iterrows()}
    seeds = {k: vecs[k] for k in sorted(vecs) if k < 8}
    agg = {}
    for vid, v in vecs.items():
        cands = sorted(
            (round(float(((v - c) ** 2).sum()), 4), cid) for cid, c in seeds.items()
        )
        (a, cid), (b, _) = cands[0], cands[1]
        s_e6 = 0 if max(a, b) == 0 else math.floor(1e6 * ((b - a) / max(a, b)))
        e = agg.setdefault(cid, [0, 0, 0])
        e[0] += 1
        e[1] += s_e6
        e[2] += round(a * 10000.0)
    rows = {r["cluster_id"]: r for r in queries()["similarity_silhouette"](spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for cid, (n, ss, sa) in agg.items():
        r = rows[cid]
        assert (r["n_members"], r["sum_s_e6"]) == (n, ss)
        assert abs(r["silhouette"] - ss / n / 1e6) < 1e-5
        assert abs(r["avg_intra_dist"] - sa / n / 1e4) < 1e-3
    # seed points sit AT their centroid (a=0 -> s=1); near-orthogonal
    # fixture keeps everything else near 0, so means stay within (0, 1]
    assert all(0.0 <= r["silhouette"] <= 1.0 for r in rows.values())


# --------------------------------------------------------------------------
# stats_multiple_testing_bh
# --------------------------------------------------------------------------


def test_bh_pvalues_and_stepup_match_recompute(spark, sf_dir):
    import hashlib

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    grp = ev["user_id"].map(lambda u: int(hashlib.md5(str(u).encode()).hexdigest()[0], 16) % 2)
    v = (ev["value"] * 100).round().astype("int64")
    stats = {}
    for t, g in pd.DataFrame({"t": ev["event_type"], "g": grp, "v": v}).groupby("t"):
        a, b = g[g["g"] == 0]["v"], g[g["g"] == 1]["v"]
        va, vb = a.var(ddof=1), b.var(ddof=1)
        z = (a.mean() - b.mean()) / math.sqrt(va / len(a) + vb / len(b))
        p = math.erfc(abs(z) / math.sqrt(2))
        stats[t] = (len(a), len(b), z, p)
    rows = queries()["stats_multiple_testing_bh"](spark, sf_dir).collect()
    assert len(rows) == len(stats)
    m = len(stats)
    for r in rows:
        n1, n2, z, p = stats[r["event_type"]]
        assert (r["n1"], r["n2"]) == (n1, n2)
        assert abs(r["z"] - z) < 1e-4
        # A&S 7.1.26 has max abs error 1.5e-7; both sides rounded to 6
        assert abs(r["p_value"] - p) < 5e-6
        assert abs(r["bh_threshold"] - r["p_rank"] * 0.05 / m) < 1e-6
    # re-derive the step-up decisions from the reported (rank, p) pairs
    ranked = sorted(rows, key=lambda r: r["p_rank"])
    max_rank = max(
        (r["p_rank"] for r in ranked if r["p_value"] * m <= r["p_rank"] * 0.05), default=0
    )
    for r in ranked:
        assert r["rejected"] == (r["p_rank"] <= max_rank)


def test_bh_stepup_rejects_monotone_prefix(spark, sf_dir):
    """BH rejections are always a prefix of the p-ranked list."""
    rows = sorted(
        queries()["stats_multiple_testing_bh"](spark, sf_dir).collect(),
        key=lambda r: r["p_rank"],
    )
    seen_accept = False
    for r in rows:
        if not r["rejected"]:
            seen_accept = True
        else:
            assert not seen_accept


# --------------------------------------------------------------------------
# stats_hurst_exponent
# --------------------------------------------------------------------------


def _daily_revenue(sf_dir: str) -> np.ndarray:
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
    df = pd.DataFrame({"day": orders["o_orderdate"].dt.normalize(), "c": cents})
    daily = df.groupby("day")["c"].sum().sort_index()
    full = pd.date_range(daily.index.min(), daily.index.max(), freq="D")
    return daily.reindex(full, fill_value=0).to_numpy().astype("int64")


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_hurst_matches_python_recompute(spark, sf_dir):
    x = _daily_revenue(sf_dir)
    row = queries()["stats_hurst_exponent"](spark, sf_dir).collect()[0]
    lys = {}
    for w in (8, 16, 32, 64):
        rs_sum, cnt = 0, 0
        for i in range(0, len(x) - w + 1, w):
            win = x[i : i + w].astype(object)
            s, q = int(win.sum()), int(sum(int(v) * int(v) for v in win))
            varterm = w * q - s * s
            if varterm <= 0:
                continue
            z, zmin, zmax = 0, 0, 0
            for v in win:
                z += w * int(v) - s
                zmin, zmax = min(zmin, z), max(zmax, z)
            rs_sum += math.floor(1e6 * ((zmax - zmin) / math.sqrt(varterm)))
            cnt += 1
        assert row[f"cnt_{w}"] == cnt
        assert row[f"rs_{w}"] == rs_sum
        ly = math.log(rs_sum / cnt / 1e6) / math.log(2)
        lys[w] = ly
        assert abs(row[f"log2_rs_{w}"] - ly) < 1e-5
    h = (-1.5 * lys[8] - 0.5 * lys[16] + 0.5 * lys[32] + 1.5 * lys[64]) / 5.0
    assert abs(row["hurst_h"] - h) < 1e-5
    # near-uniform daily revenue is memoryless: H in a loose (0, 1) band
    # centered near 0.5
    assert 0.2 < row["hurst_h"] < 0.9


def test_hurst_rs_grows_with_window(spark, sf_dir):
    """R/S must grow with window size (H > 0) — the monotone sanity."""
    row = queries()["stats_hurst_exponent"](spark, sf_dir).collect()[0]
    means = [row[f"rs_{w}"] / row[f"cnt_{w}"] for w in (8, 16, 32, 64)]
    assert means == sorted(means)


# --------------------------------------------------------------------------
# stats_runs_test
# --------------------------------------------------------------------------


def test_runs_test_matches_python_recompute(spark, sf_dir):
    x = _daily_revenue(sf_dir)
    n = len(x)
    med = sorted(x)[(n + 1) // 2 - 1]
    s = (x > med).astype(int)
    n1 = int(s.sum())
    n2 = n - n1
    runs = 1 + int((s[1:] != s[:-1]).sum())
    row = queries()["stats_runs_test"](spark, sf_dir).collect()[0]
    assert (row["n"], row["n1"], row["n2"], row["n_runs"]) == (n, n1, n2, runs)
    mu = 2.0 * n1 * n2 / n + 1.0
    sig = math.sqrt((2.0 * n1 * n2) * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0)))
    assert abs(row["mu_runs"] - mu) < 1e-3
    assert abs(row["z"] - (runs - mu) / sig) < 1e-4
    # randomness calibration on the synthetic series
    assert abs(row["z"]) < 4


# --------------------------------------------------------------------------
# events_time_to_convert
# --------------------------------------------------------------------------


def test_time_to_convert_matches_python_recompute(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(["user_id", "ts", "event_id"])
    delays = []
    n_purch = 0
    for _, g in ev.groupby("user_id"):
        last_view = None
        for _, r in g.iterrows():
            if r["event_type"] == "view":
                last_view = r["ts"].value // 1000  # ns -> us
            elif r["event_type"] == "purchase":
                n_purch += 1
                if last_view is not None:
                    delays.append(r["ts"].value // 1000 - last_view)
    row = queries()["events_time_to_convert"](spark, sf_dir).collect()[0]
    assert row["n_purchases"] == n_purch
    assert row["n_converted"] == len(delays)
    assert row["matched_ppm"] == len(delays) * 1_000_000 // n_purch
    assert row["mean_delay_us"] == sum(delays) // len(delays)
    assert row["max_delay_us"] == max(delays)
    assert abs(row["p50_delay_us"] - np.percentile(delays, 50, method="linear")) < 1
    assert abs(row["p90_delay_us"] - np.percentile(delays, 90, method="linear")) < 1


def test_time_to_convert_no_range_join(spark, sf_dir):
    plan = physical_plan(queries()["events_time_to_convert"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the match is one fill-forward window, not a per-purchase range join
    assert plan.count("hashpartitioning(user_id") >= 1


# --------------------------------------------------------------------------
# quality_classifier_auc
# --------------------------------------------------------------------------


def test_classifier_auc_matches_sklearn_free_recompute(spark, sf_dir):
    """Re-derive AUC the pedestrian way (pairwise comparisons with 0.5
    tie credit) from per-doc logits and quality labels recomputed in
    pure Python — independent of the rank-sum identity."""
    import hashlib
    import re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
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
    ids = sorted(logits)
    qv = sorted(quals[i] for i in ids)
    med = qv[(len(qv) + 1) // 2 - 1]
    pos = [logits[i] for i in ids if quals[i] > med]
    neg = [logits[i] for i in ids if quals[i] <= med]
    u = 0.0
    for p in pos:
        for n in neg:
            u += 1.0 if p > n else (0.5 if p == n else 0.0)
    auc = u / (len(pos) * len(neg))
    row = queries()["quality_classifier_auc"](spark, sf_dir).collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (len(pos), len(neg))
    assert row["u_x2"] == int(round(2 * u))
    assert abs(row["auc"] - auc) < 1e-5
    assert abs(row["gini"] - (2 * auc - 1)) < 1e-5
    assert 0.0 <= row["auc"] <= 1.0


# --------------------------------------------------------------------------
# text_burstiness
# --------------------------------------------------------------------------


def test_burstiness_matches_python_recompute(spark, sf_dir):
    import re
    from collections import Counter, defaultdict

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n_docs = len(docs)
    per_term_doc = defaultdict(Counter)
    totals = Counter()
    for _, r in docs.iterrows():
        for w in re.findall(r"[a-z]+", r["text"].lower()):
            per_term_doc[w][int(r["doc_id"])] += 1
            totals[w] += 1
    top = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    rows_exp = []
    for w, tot in top:
        s2 = sum(c * c for c in per_term_doc[w].values())
        vmr_e6 = (n_docs * s2 - tot * tot) * 1_000_000 // (n_docs * tot)
        rows_exp.append((w, tot, len(per_term_doc[w]), vmr_e6))
    rows_exp.sort(key=lambda t: (-t[3], t[0]))
    got = queries()["text_burstiness"](spark, sf_dir).collect()
    assert len(got) == 20
    for r, (w, tot, ndw, vmr) in zip(got, rows_exp[:20]):
        assert (r["term"], r["total"], r["n_docs_with"], r["vmr_e6"]) == (w, tot, ndw, vmr)
    # function words are near-Poisson; bursty terms exceed them — the
    # top-ranked VMR must be at least the median VMR of the top-50 pool
    vmrs = sorted(t[3] for t in rows_exp)
    assert got[0]["vmr_e6"] >= vmrs[len(vmrs) // 2]


def test_burstiness_plan_single_corpus_scan(spark, sf_dir):
    plan = physical_plan(queries()["text_burstiness"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


# --------------------------------------------------------------------------
# similarity_topk_filtered
# --------------------------------------------------------------------------


def test_filtered_knn_matches_python_brute(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs, labels = {}, {}
    for _, r in emb.iterrows():
        vid = int(r["vec_id"])
        vecs[vid] = np.floor(np.asarray(r["embedding"], dtype=np.float64) * (1 << 20)).astype(
            "int64"
        )
        labels[vid] = int(r["label"])
    expected = []
    for p in sorted(v for v in vecs if v < 20):
        cands = []
        for e in vecs:
            if e == p or labels[e] != labels[p]:
                continue
            d = vecs[p] - vecs[e]
            cands.append((int((d * d).sum()), e))
        cands.sort()
        for rk, (d2, nbr) in enumerate(cands[:5], start=1):
            expected.append((p, rk, nbr, d2))
    got = [
        (r["vec_id"], r["rk"], r["nbr"], r["d2"])
        for r in queries()["similarity_topk_filtered"](spark, sf_dir).collect()
    ]
    assert got == expected


def test_filtered_knn_returns_only_matching_labels(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    labels = dict(zip(emb["vec_id"].astype(int), emb["label"].astype(int)))
    for r in queries()["similarity_topk_filtered"](spark, sf_dir).collect():
        assert labels[r["vec_id"]] == labels[r["nbr"]]
        assert r["nbr"] != r["vec_id"]


# --------------------------------------------------------------------------
# events_peak_concurrency
# --------------------------------------------------------------------------


def test_peak_concurrency_matches_python_recompute(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=30)
    spans = []
    for _, g in ev.groupby("user_id"):
        start = prev = None
        for _, r in g.iterrows():
            if prev is None or (r["ts"] - prev) > gap:
                if start is not None:
                    spans.append((start.value // 1000, prev.value // 1000))
                start = r["ts"]
            prev = r["ts"]
        spans.append((start.value // 1000, prev.value // 1000))
    deltas = [(t0, -1, 1) for t0, _ in spans] + [(t1, 1, -1) for _, t1 in spans]
    deltas.sort()  # (t, neg, delta): starts (neg=-1) before ends at same t
    cur = peak = 0
    peak_t = None
    for t, _, d in deltas:
        cur += d
        if cur > peak:
            peak, peak_t = cur, t
    row = queries()["events_peak_concurrency"](spark, sf_dir).collect()[0]
    assert row["n_sessions"] == len(spans)
    assert row["peak_concurrency"] == peak
    expected_at = pd.Timestamp(peak_t, unit="us").strftime("%Y-%m-%d %H:%M:%S")
    assert row["peak_at"] == expected_at


# --------------------------------------------------------------------------
# part_skyline_pareto
# --------------------------------------------------------------------------


def test_skyline_matches_brute_force_dominance(spark, sf_dir):
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    pts = [
        (int(r["p_partkey"]), int(r["p_size"]), int(math.floor(r["p_retailprice"] * 100 + 0.5)))
        for _, r in part.iterrows()
    ]
    frontier = []
    for k, s, p in pts:
        dominated = any(
            qs >= s and qp <= p and (qs > s or qp < p) for _, qs, qp in pts
        )
        if not dominated:
            frontier.append((k, s, p))
    frontier.sort(key=lambda t: (-t[1], t[2], t[0]))
    got = [
        (r["p_partkey"], r["p_size"], r["price_cents"])
        for r in queries()["part_skyline_pareto"](spark, sf_dir).collect()
    ]
    assert got == frontier
    # frontier invariant: strictly decreasing price as size decreases
    # (among distinct sizes)
    by_size = {}
    for _, s, p in frontier:
        by_size.setdefault(s, p)
    sizes = sorted(by_size, reverse=True)
    prices = [by_size[s] for s in sizes]
    assert prices == sorted(prices, reverse=True)


# --------------------------------------------------------------------------
# corpus_mix_budget
# --------------------------------------------------------------------------


def test_mix_budget_greedy_fill_invariants(spark, sf_dir):
    rows = queries()["corpus_mix_budget"](spark, sf_dir).collect()
    total = sum(r["n_tokens"] for r in rows)
    budget = total // 2
    # output is quality-ranked; cum_before is the running sum in that order
    cum = 0
    for r in rows:
        assert r["cum_before"] == cum
        cum += r["n_tokens"]
        expected_take = min(r["n_tokens"], max(0, budget - r["cum_before"]))
        assert r["taken_tokens"] == expected_take
        assert r["take_frac_ppm"] == expected_take * 1_000_000 // r["n_tokens"]
    qs = [r["qmean_e6"] for r in rows]
    assert qs == sorted(qs, reverse=True)
    # the greedy fill exhausts the budget exactly
    assert sum(r["taken_tokens"] for r in rows) == budget
    # exactly one boundary source is partially taken
    partial = [r for r in rows if 0 < r["taken_tokens"] < r["n_tokens"]]
    assert len(partial) <= 1


def test_mix_budget_matches_python_recompute(spark, sf_dir):
    import re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    agg = {}
    for _, r in docs.iterrows():
        text = r["text"]
        n_tok = len(re.findall(r"\S+", text))
        n_chars = len(text)
        n_stop = len(re.findall(r"\b(the|and|of|to|is|a|in)\b", text.lower()))
        n_punct = len(re.findall(r"[.,!?;:]", text))
        q = (
            0.5 * min(n_chars / 500.0, 1.0)
            + 0.4 * (n_stop / max(n_tok, 1))
            + 0.1 * (1.0 - n_punct / max(n_chars, 1))
        )
        e = agg.setdefault(r["source"], [0, 0, 0])
        e[0] += 1
        e[1] += n_tok
        e[2] += math.floor(q * 10000 + 0.5)
    rows = {r["source"]: r for r in queries()["corpus_mix_budget"](spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for src, (nd, nt, sq) in agg.items():
        r = rows[src]
        assert (r["n_docs"], r["n_tokens"]) == (nd, nt)
        assert r["qmean_e6"] == sq * 100 // nd


# --------------------------------------------------------------------------
# orders_croston_intermittent
# --------------------------------------------------------------------------


def test_croston_matches_python_recompute(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li["d"] = (li["l_shipdate"].dt.normalize() - pd.Timestamp("1992-01-01")).dt.days
    li["q"] = np.floor(li["l_quantity"].to_numpy() + 0.5).astype("int64")
    demand = li.groupby(["l_partkey", "d"])["q"].sum().reset_index()

    def ewma_num(seq):
        # s*2^(k-1) = u1 + sum_{i>=2} u_i * 2^(i-2)
        return sum(v * (1 if i == 0 else 1 << (i - 1)) for i, v in enumerate(seq))

    rows_exp = []
    for p, g in demand.groupby("l_partkey"):
        g = g.sort_values("d")
        if len(g) < 2:
            continue
        qs = g["q"].tolist()[-16:]
        ds = g["d"].tolist()
        ivs = [ds[i] - ds[i - 1] for i in range(1, len(ds))][-16:]
        zn, kz = ewma_num(qs), len(qs)
        pn, kp = ewma_num(ivs), len(ivs)
        rows_exp.append(
            (
                int(p),
                len(g),
                zn * 1_000_000 // (1 << (kz - 1)),
                pn * 1_000_000 // (1 << (kp - 1)),
                zn * (1 << (kp - 1)) * 1_000_000 // (pn * (1 << (kz - 1))),
            )
        )
    rows_exp.sort(key=lambda t: (-t[4], t[0]))
    got = [
        (r["p_partkey"], r["n_demand_days"], r["z_hat_ppm"], r["p_hat_ppm"], r["forecast_ppm"])
        for r in queries()["orders_croston_intermittent"](spark, sf_dir).collect()
    ]
    assert got == rows_exp[:20]
    # Croston identity: forecast ~ size/interval (check within quantization)
    for _, _, z, p_, f in got:
        assert abs(f - z * 1_000_000 / p_) <= max(2, f * 1e-5)


# --------------------------------------------------------------------------
# text_simhash_bit_balance
# --------------------------------------------------------------------------


def test_bit_balance_matches_fingerprints(spark, sf_dir):
    """Re-derive the per-bit set counts directly from the dedup_simhash
    output — the audit must agree with the fingerprints it audits."""
    fps = [r["simhash"] for r in queries()["dedup_simhash"](spark, sf_dir).collect()]
    n = len(fps)
    rows = queries()["text_simhash_bit_balance"](spark, sf_dir).collect()
    assert len(rows) == 64
    for r in rows:
        b = r["bit"]
        n_set = sum(1 for f in fps if (f >> b) & 1)
        assert r["n_set"] == n_set
        assert r["set_ppm"] == n_set * 1_000_000 // n
        assert r["dev_ppm"] == abs(n_set * 1_000_000 // n - 500_000)
    # the synthetic fixture draws docs from one shared vocabulary, so
    # votes correlate across docs and the audit MUST flag skewed bits
    assert max(r["dev_ppm"] for r in rows) > 100_000


# --------------------------------------------------------------------------
# json_schema_drift
# --------------------------------------------------------------------------


def test_schema_drift_matches_python_recompute(spark, sf_dir):
    import json

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev["ts"].astype("int64") // 1000
    mid = (int(us.min()) + int(us.max())) // 2
    halves = (us >= mid).astype(int)
    n_early = int((halves == 0).sum())
    n_late = int((halves == 1).sum())
    counts = {}
    for props, h in zip(ev["props"], halves):
        for k in json.loads(props):
            e = counts.setdefault(k, [0, 0])
            e[h] += 1
    rows = {r["prop_key"]: r for r in queries()["json_schema_drift"](spark, sf_dir).collect()}
    assert set(rows) == set(counts)
    for k, (en, ln_) in counts.items():
        r = rows[k]
        assert (r["early_n"], r["late_n"]) == (en, ln_)
        assert r["early_ppm"] == en * 1_000_000 // n_early
        assert r["late_ppm"] == ln_ * 1_000_000 // n_late
        assert r["drift_ppm"] == r["late_ppm"] - r["early_ppm"]


# --------------------------------------------------------------------------
# events_session_type_pmi
# --------------------------------------------------------------------------


def test_session_pmi_matches_python_recompute(spark, sf_dir):
    from collections import Counter
    from itertools import combinations

    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=30)
    session_types = []
    for _, g in ev.groupby("user_id"):
        cur, prev = set(), None
        for _, r in g.iterrows():
            if prev is not None and (r["ts"] - prev) > gap:
                session_types.append(frozenset(cur))
                cur = set()
            cur.add(r["event_type"])
            prev = r["ts"]
        session_types.append(frozenset(cur))
    n = len(session_types)
    singles, pairs = Counter(), Counter()
    for st in session_types:
        for t in st:
            singles[t] += 1
        for a, b in combinations(sorted(st), 2):
            pairs[(a, b)] += 1
    rows = {
        (r["type_a"], r["type_b"]): r
        for r in queries()["events_session_type_pmi"](spark, sf_dir).collect()
    }
    assert set(rows) == set(pairs)
    for (a, b), n_ab in pairs.items():
        r = rows[(a, b)]
        assert (r["n_ab"], r["n_a"], r["n_b"]) == (n_ab, singles[a], singles[b])
        assert abs(r["pmi"] - math.log(n_ab * n / (singles[a] * singles[b]))) < 1e-3


# --------------------------------------------------------------------------
# orders_seasonality_anova
# --------------------------------------------------------------------------


def test_seasonality_anova_matches_python_recompute(spark, sf_dir):
    x = _daily_revenue(sf_dir)
    n = len(x)
    wd = np.arange(n) % 7
    s_tot = int(x.sum())
    q_tot = int(sum(int(v) * int(v) for v in x.astype(object)))
    ssb = 0.0
    for w in range(7):
        grp = x[wd == w]
        ssb += float(int(grp.sum())) * int(grp.sum()) / len(grp)
    cm = float(s_tot) * s_tot / n
    eta = (ssb - cm) / (q_tot - cm)
    f = ((ssb - cm) / 6.0) / ((q_tot - ssb) / (n - 7))
    row = queries()["orders_seasonality_anova"](spark, sf_dir).collect()[0]
    assert (row["n"], row["k"]) == (n, 7)
    assert abs(row["eta_sq"] - eta) < 1e-5
    assert abs(row["f_stat"] - f) / max(abs(f), 1.0) < 1e-3
    # TPC-H order dates carry no weekday pattern: eta^2 ~ 0
    assert row["eta_sq"] < 0.05


# --------------------------------------------------------------------------
# dedup_cluster_histogram
# --------------------------------------------------------------------------


def test_cluster_histogram_matches_exact_dedup(spark, sf_dir):
    """The histogram and dedup_exact are two views of one fingerprint
    spec: sizes must re-aggregate dedup_exact's n_copies exactly, and
    total removable docs must equal what dedup_filter_corpus drops."""
    from collections import Counter

    exact = queries()["dedup_exact"](spark, sf_dir).collect()
    sizes = Counter(r["n_copies"] for r in exact)
    rows = {r["cluster_size"]: r for r in queries()["dedup_cluster_histogram"](spark, sf_dir).collect()}
    assert set(rows) == set(sizes)
    n_docs_tot = sum(r["n_copies"] for r in exact)
    for sz, n_cl in sizes.items():
        r = rows[sz]
        assert r["n_clusters"] == n_cl
        assert r["n_docs"] == sz * n_cl
        assert r["n_removable"] == (sz - 1) * n_cl
        assert r["docs_share_ppm"] == sz * n_cl * 1_000_000 // n_docs_tot
    total_removable = sum(r["n_removable"] for r in rows.values())
    # removable == docs minus distinct fingerprints (what EXACT dedup drops)
    assert total_removable == n_docs_tot - len(exact)
    assert sum(r["n_docs"] for r in rows.values()) == n_docs_tot


# --------------------------------------------------------------------------
# events_ab_test_cuped
# --------------------------------------------------------------------------


def test_cuped_matches_python_recompute(spark, sf_dir):
    import hashlib

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev["ts"].astype("int64") // 1000
    mid = (int(us.min()) + int(us.max())) // 2
    cents = (ev["value"] * 100).round().astype("int64")
    df = pd.DataFrame({"u": ev["user_id"], "pre": us < mid, "c": cents})
    per_user = df.groupby("u").apply(
        lambda g: pd.Series(
            {"x": int(g.loc[g["pre"], "c"].sum()), "y": int(g.loc[~g["pre"], "c"].sum())}
        ),
        include_groups=False,
    )
    per_user["arm"] = [
        int(hashlib.md5(str(u).encode()).hexdigest()[0], 16) % 2 for u in per_user.index
    ]
    n = len(per_user)
    x = per_user["x"].astype(float)
    y = per_user["y"].astype(float)
    varx = (x * x).sum() - x.sum() ** 2 / n
    cov = (x * y).sum() - x.sum() * y.sum() / n
    vary = (y * y).sum() - y.sum() ** 2 / n
    theta = cov / varx
    a0, a1 = per_user[per_user["arm"] == 0], per_user[per_user["arm"] == 1]
    diff_raw = (a1["y"].mean() - a0["y"].mean()) / 100.0
    diff_cuped = (
        (a1["y"].mean() - theta * a1["x"].mean()) - (a0["y"].mean() - theta * a0["x"].mean())
    ) / 100.0
    row = queries()["events_ab_test_cuped"](spark, sf_dir).collect()[0]
    assert (row["n"], row["n0"], row["n1"]) == (n, len(a0), len(a1))
    assert abs(row["theta"] - theta) < 1e-4
    assert abs(row["rho_sq"] - cov * cov / (varx * vary)) < 1e-4
    assert abs(row["diff_raw"] - diff_raw) < 1e-2
    assert abs(row["diff_cuped"] - diff_cuped) < 1e-2
    # variance reduction factor is a squared correlation
    assert 0.0 <= row["rho_sq"] <= 1.0


# --------------------------------------------------------------------------
# text_mattr_diversity
# --------------------------------------------------------------------------


def test_mattr_matches_python_recompute(spark, sf_dir):
    import re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    agg = {}
    for _, r in docs.iterrows():
        tk = re.findall(r"[a-z]+", r["text"].lower())
        e = agg.setdefault(r["source"], [0, 0, 0, 0])  # docs, short, types, windows
        if len(tk) < 50:
            e[1] += 1
            continue
        e[0] += 1
        for i in range(len(tk) - 50 + 1):
            e[2] += len(set(tk[i : i + 50]))
        e[3] += len(tk) - 50 + 1
    rows = {r["source"]: r for r in queries()["text_mattr_diversity"](spark, sf_dir).collect()}
    expected_sources = {s for s, e in agg.items() if e[0] > 0}
    assert set(rows) == expected_sources
    for s in expected_sources:
        nd, ns, st, nw = agg[s]
        r = rows[s]
        assert (r["n_docs"], r["n_short_docs"], r["sum_types"], r["n_windows"]) == (nd, ns, st, nw)
        assert r["mattr_ppm"] == st * 1_000_000 // (nw * 50)
        # MATTR is a ratio of types to window size
        assert 0 < r["mattr_ppm"] <= 1_000_000


# --------------------------------------------------------------------------
# multimodal_payload_dedup
# --------------------------------------------------------------------------


def test_payload_dedup_matches_python_recompute(spark, sf_dir):
    import hashlib

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    agg = {}
    seen = {}
    for t in docs["text"]:
        h = hashlib.sha256(t.encode()).hexdigest()
        b = len(t.encode())
        shard = h[0]
        e = agg.setdefault(shard, [0, 0])
        e[0] += 1
        e[1] += b
        seen.setdefault(h, b)
    uniq = {}
    for h, b in seen.items():
        e = uniq.setdefault(h[0], [0, 0])
        e[0] += 1
        e[1] += b
    rows = {r["shard"]: r for r in queries()["multimodal_payload_dedup"](spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for shard, (np_, bt) in agg.items():
        r = rows[shard]
        nd, bd = uniq[shard]
        assert (r["n_payloads"], r["n_distinct"]) == (np_, nd)
        assert (r["bytes_total"], r["bytes_distinct"]) == (bt, bd)
        assert r["saved_ppm"] == (bt - bd) * 1_000_000 // bt
    # accounting identity: distinct never exceeds arrivals
    assert all(r["n_distinct"] <= r["n_payloads"] for r in rows.values())


# --------------------------------------------------------------------------
# orders_round_number_bias
# --------------------------------------------------------------------------


def test_round_number_bias_matches_python_recompute(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
    df = pd.DataFrame({"p": orders["o_orderpriority"], "c": cents})
    rows = {r["priority"]: r for r in queries()["orders_round_number_bias"](spark, sf_dir).collect()}
    for p, g in df.groupby("p"):
        r = rows[p]
        n = len(g)
        wd = int((g["c"] % 100 == 0).sum())
        wh = int((g["c"] % 10000 == 0).sum())
        assert (r["n_orders"], r["n_whole_dollar"], r["n_whole_hundred"]) == (n, wd, wh)
        assert r["whole_dollar_ppm"] == wd * 1_000_000 // n
        assert r["whole_hundred_ppm"] == wh * 1_000_000 // n
        # organic synthetic prices: near the 1% / 0.01% base rates
        assert r["whole_dollar_ppm"] < 100_000


# --------------------------------------------------------------------------
# events_power_analysis
# --------------------------------------------------------------------------


def test_power_analysis_matches_python_recompute(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    counts = ev["event_type"].value_counts()
    n_tot = int(counts.sum())
    za, zb, mde = 1.959964, 0.841621, 0.10
    rows = {r["event_type"]: r for r in queries()["events_power_analysis"](spark, sf_dir).collect()}
    assert set(rows) == set(counts.index)
    for t, c in counts.items():
        p1 = c / n_tot
        p2 = p1 * (1 + mde)
        pbar = p1 * (1 + mde / 2)
        n = (
            za * math.sqrt(2 * pbar * (1 - pbar))
            + zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
        ) ** 2 / (p1 * mde) ** 2
        r = rows[t]
        assert r["n_with"] == int(c)
        assert abs(r["baseline_rate"] - p1) < 1e-5
        assert r["n_per_arm"] == math.ceil(n)
    # smaller baselines need more samples — the monotone sanity
    by_rate = sorted(rows.values(), key=lambda r: r["baseline_rate"])
    arms = [r["n_per_arm"] for r in by_rate]
    assert arms == sorted(arms, reverse=True)


# --------------------------------------------------------------------------
# quality_variance_icc
# --------------------------------------------------------------------------


def test_icc_matches_python_recompute(spark, sf_dir):
    import re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    groups = {}
    for _, r in docs.iterrows():
        text = r["text"]
        n_chars = len(text)
        n_tok = max(len(re.findall(r"\S+", text)), 1)
        n_stop = len(re.findall(r"\b(the|and|of|to|is|a|in)\b", text.lower()))
        n_punct = len(re.findall(r"[.,!?;:]", text))
        q = (
            0.5 * min(n_chars / 500.0, 1.0)
            + 0.4 * (n_stop / n_tok)
            + 0.1 * (1.0 - n_punct / max(n_chars, 1))
        )
        groups.setdefault(r["source"], []).append(math.floor(q * 10000 + 0.5))
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    q_ = sum(x * x for v in groups.values() for x in v)
    ssbq = sum(sum(v) ** 2 // len(v) for v in groups.values())
    sn2 = sum(len(v) ** 2 for v in groups.values())
    row = queries()["quality_variance_icc"](spark, sf_dir).collect()[0]
    assert (row["k"], row["n"], row["s"], row["q"], row["ssbq"]) == (k, n, s, q_, ssbq)
    msb = (ssbq - s * s / n) / (k - 1)
    msw = (q_ - ssbq) / (n - k)
    k0 = (n - sn2 / n) / (k - 1)
    icc = (msb - msw) / (msb + (k0 - 1) * msw)
    assert abs(row["f_stat"] - msb / msw) / max(msb / msw, 1.0) < 1e-3
    assert abs(row["icc1"] - icc) < 1e-4
    # ICC is bounded and sane for a grouped design
    assert -0.5 < row["icc1"] < 1.0
