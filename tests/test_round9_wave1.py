"""Third-engine recomputes + plan pins for the round-9 wave-1 additions
(Good-Turing/Chao1 richness, tokenizer fertility, blocked Levenshtein
linkage, mutual information, Grubbs, Wilcoxon signed-rank, Mann-Kendall,
trimmed/winsorized means, split-conformal calibration, MMR re-ranking).

The DuckDB oracle compare is the driver's job; these tests re-derive the
same answers in plain Python/pandas/numpy and pin the plan shapes that
keep each operator on its scale path."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd

from gluettalax_spark.registry import queries
from tests.test_plans import physical_plan


# --------------------------------------------------------------------------
# text_good_turing_vocab
# --------------------------------------------------------------------------


def test_good_turing_matches_python_recompute(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = {
        r["source"]: r
        for r in queries()["text_good_turing_vocab"](spark, sf_dir).collect()
    }
    for source, grp in docs.groupby("source"):
        counts = Counter()
        for text in grp["text"]:
            counts.update(re.findall(r"[a-z]+", text.lower()))
        n = sum(counts.values())
        v = len(counts)
        f1 = sum(1 for c in counts.values() if c == 1)
        f2 = sum(1 for c in counts.values() if c == 2)
        row = rows[source]
        assert (row["n_tokens"], row["n_types"], row["f1"], row["f2"]) == (n, v, f1, f2)
        assert row["unseen_mass"] == f1 / n
        expect = v + (f1 * f1 / (2.0 * f2) if f2 > 0 else f1 * (f1 - 1.0) / 2.0)
        assert row["chao1_vocab"] == expect
        # estimator sanity: Chao1 never estimates fewer types than observed
        assert row["chao1_vocab"] >= v


# --------------------------------------------------------------------------
# text_token_fertility
# --------------------------------------------------------------------------


def test_fertility_matches_python_recompute(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = {r["lang"]: r for r in queries()["text_token_fertility"](spark, sf_dir).collect()}
    bpe_re = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")
    for lang, grp in docs.groupby("lang"):
        ws = int(sum(len(re.findall(r"\S+", t)) for t in grp["text"]))
        bpe = int(sum(len(bpe_re.findall(t)) for t in grp["text"]))
        nc = int(grp["n_chars"].sum())
        row = rows[lang]
        assert (row["n_docs"], row["ws_tokens"], row["bpe_tokens"], row["n_chars"]) == (
            len(grp), ws, bpe, nc,
        )
        assert row["fertility"] == bpe / ws
        assert row["chars_per_token"] == nc / bpe


# --------------------------------------------------------------------------
# dedup_fuzzy_name_pairs
# --------------------------------------------------------------------------


def _levenshtein(s: str, t: str) -> int:
    prev = list(range(len(t) + 1))
    for i, cs in enumerate(s, 1):
        cur = [i]
        for j, ct in enumerate(t, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct)))
        prev = cur
    return prev[-1]


def test_fuzzy_pairs_match_python_recompute(spark, sf_dir):
    """Full O(dictionary²) Python recompute at fixture scale — every
    distinct-name pair at distance 1..2 within a brand block with exact
    multiplicities, nothing else, no exact dups."""
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    counts = part.groupby(["p_brand", "p_name"]).size()
    expect = {}
    for brand in part["p_brand"].unique():
        block = counts[brand]
        names = sorted(block.index)
        for i, na in enumerate(names):
            for nb in names[i + 1 :]:
                d = _levenshtein(na, nb)
                if 1 <= d <= 2:
                    expect[(brand, na, nb)] = (d, int(block[na]), int(block[nb]))
    got = queries()["dedup_fuzzy_name_pairs"](spark, sf_dir).collect()
    assert {
        (r["brand"], r["a_name"], r["b_name"]): (r["dist"], r["a_parts"], r["b_parts"])
        for r in got
    } == expect
    for r in got:
        assert r["pair_count"] == r["a_parts"] * r["b_parts"]


def test_fuzzy_pairs_plan_is_equi_join_on_block_key(spark, sf_dir):
    """The blocking discipline must survive the optimizer: candidate
    generation is an EQUI-join on p_brand (hash/merge-joinable), never a
    cartesian nested-loop over all part pairs."""
    df = queries()["dedup_fuzzy_name_pairs"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # the brand equality must be a join key, not a post-filter
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------
# stats_mutual_information
# --------------------------------------------------------------------------


def test_mutual_information_matches_python_recompute(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    xy = docs.groupby(["source", "lang"]).size()
    cx = docs.groupby("source").size()
    cy = docs.groupby("lang").size()
    n = len(docs)
    mi = sum(
        int(round(1e9 * (c / n) * math.log(c * n / (cx[x] * cy[y]))))
        for (x, y), c in xy.items()
    )
    hx = sum(int(round(1e9 * (c / n) * math.log(n / c))) for c in cx)
    hy = sum(int(round(1e9 * (c / n) * math.log(n / c))) for c in cy)
    row = queries()["stats_mutual_information"](spark, sf_dir).collect()[0]
    assert (row["n_docs"], row["n_cells"]) == (n, len(xy))
    assert row["mi_nanonats"] == mi
    assert (row["hx_nanonats"], row["hy_nanonats"]) == (hx, hy)
    assert row["nmi"] == mi / math.sqrt(hx * hy)
    # information-theoretic bound: 0 ≤ I ≤ min(H(x), H(y)) (nano-nat slack ±1/cell)
    assert -len(xy) <= row["mi_nanonats"] <= min(hx, hy) + len(xy)


# --------------------------------------------------------------------------
# stats_grubbs_daily
# --------------------------------------------------------------------------


def test_grubbs_matches_python_recompute(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupby(ev["ts"].dt.date).size()
    n = len(daily)
    mean = daily.sum() / n
    sd = math.sqrt((daily.astype(float) - mean).pow(2).sum() / (n - 1))
    # integer argmax key |c·n − Σc|, tie-break latest day
    key = (daily * n - daily.sum()).abs()
    best = max(daily.index, key=lambda d: (key[d], str(d)))
    row = queries()["stats_grubbs_daily"](spark, sf_dir).collect()[0]
    assert row["n_days"] == n
    assert row["flagged_day"] == str(best)
    assert row["flagged_count"] == daily[best]
    assert abs(row["g_stat"] - abs(daily[best] - mean) / sd) < 1e-12


# --------------------------------------------------------------------------
# stats_wilcoxon_signed_rank
# --------------------------------------------------------------------------


def test_wilcoxon_matches_pandas_rank_recompute(spark, sf_dir):
    """Re-derive W+ from average ranks computed the pedestrian way
    (pandas rank), independently of the 2×rank dictionary identity."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    cents = (ev["value"] * 100).round().astype("int64")
    even = ev["event_id"] % 2 == 0
    g = pd.DataFrame({"u": ev["user_id"], "c": cents, "even": even})
    agg = g.groupby(["u", "even"])["c"].agg(["sum", "count"]).unstack("even")
    agg = agg.dropna()
    d = (
        100.0 * (agg[("sum", True)] / agg[("count", True)]
                 - agg[("sum", False)] / agg[("count", False)])
    ).round().astype("int64")
    d = d[d != 0]
    a = d.abs()
    ranks = a.rank(method="average")
    w_plus = float(ranks[d > 0].sum())
    n = len(d)
    tie_t = int(sum(t**3 - t for t in Counter(a).values()))
    row = queries()["stats_wilcoxon_signed_rank"](spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert row["w_plus_x2"] == int(round(2 * w_plus))
    assert row["tie_t"] == tie_t
    expect_z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24.0 - tie_t / 48.0
    )
    assert abs(row["z"] - expect_z) < 1e-9


# --------------------------------------------------------------------------
# stats_mann_kendall
# --------------------------------------------------------------------------


def test_mann_kendall_matches_python_recompute(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    daily = (
        pd.DataFrame({"d": orders["o_orderdate"].dt.date, "c": cents})
        .groupby("d")["c"].sum().sort_index()
    )
    x = daily.values
    n = len(x)
    s = int(sum(np.sign(x[j] - x[i]) for i in range(n) for j in range(i + 1, n)))
    ties = Counter(x)
    tie_sum = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var18 = n * (n - 1) * (2 * n + 5) - tie_sum
    row = queries()["stats_mann_kendall"](spark, sf_dir).collect()[0]
    assert (row["n_days"], row["s_stat"], row["var_x18"]) == (n, s, var18)
    assert row["tau"] == s / (n * (n - 1) / 2.0)
    if s > 0:
        assert row["z"] == (s - 1.0) / math.sqrt(var18 / 18.0)
    elif s < 0:
        assert row["z"] == (s + 1.0) / math.sqrt(var18 / 18.0)
    else:
        assert row["z"] == 0.0


# --------------------------------------------------------------------------
# agg_trimmed_winsorized
# --------------------------------------------------------------------------


def test_trimmed_winsorized_match_numpy_sort(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    v = np.sort((orders["o_totalprice"] * 100).round().astype("int64").values)
    n = len(v)
    k = n // 10
    core = v[k : n - k]
    row = queries()["agg_trimmed_winsorized"](spark, sf_dir).collect()[0]
    assert (row["n"], row["k"]) == (n, k)
    assert row["lo_cut"] == v[k]           # (k+1)-th order statistic
    assert row["hi_cut"] == v[n - k - 1]   # (n−k)-th order statistic
    assert row["trimmed_mean"] == int(core.sum()) / (n - 2 * k) / 100.0
    wins = int(core.sum()) + k * int(v[k]) + k * int(v[n - k - 1])
    assert row["winsorized_mean"] == wins / n / 100.0
    # robustness sanity: both fall between the cut values
    assert v[k] / 100.0 <= row["trimmed_mean"] <= v[n - k - 1] / 100.0


# --------------------------------------------------------------------------
# events_conformal_interval
# --------------------------------------------------------------------------


def test_conformal_matches_python_recompute(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    rows = {
        r["event_type"]: r
        for r in queries()["events_conformal_interval"](spark, sf_dir).collect()
    }
    for etype, grp in ev.groupby("event_type"):
        cal = grp[grp["event_id"] % 2 == 0]
        test = grp[grp["event_id"] % 2 == 1]
        pred = (cal["value"] * 100).round().astype("int64").sum() / len(cal)
        r_cal = np.sort((cal["value"] * 100 - pred).abs().round().astype("int64").values)
        k = min((9 * (len(cal) + 1) + 9) // 10, len(cal))
        q = int(r_cal[k - 1])
        r_test = (test["value"] * 100 - pred).abs().round().astype("int64")
        covered = int((r_test <= q).sum())
        row = rows[etype]
        assert (row["n_cal"], row["n_test"]) == (len(cal), len(test))
        assert row["q_resid_cents"] == q
        assert row["covered"] == covered
        assert row["coverage"] == covered / len(test)
        # split conformal guarantees ≥ 90% coverage in expectation;
        # at fixture scale allow sampling slack but pin the ballpark
        assert row["coverage"] > 0.7


# --------------------------------------------------------------------------
# similarity_mmr_rerank
# --------------------------------------------------------------------------


def test_mmr_matches_python_greedy(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r["vec_id"]): np.asarray(list(r["embedding"]), dtype=np.float64)
            for _, r in emb.iterrows()}
    q = vecs[0]

    def cos(a, b):
        return round(float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 4)

    rel = {i: cos(q, v) for i, v in vecs.items() if i != 0}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:20]
    sims = {(a, b): cos(vecs[a], vecs[b]) for a in cand for b in cand if a != b}
    selected = [max(cand, key=lambda i: (rel[i], -i))]
    scores = {selected[0]: rel[selected[0]]}
    for _ in range(4):
        rest = [c for c in cand if c not in selected]
        mmr = {
            c: 0.7 * rel[c] - 0.3 * max(sims[(c, s)] for s in selected) for c in rest
        }
        pick = max(rest, key=lambda c: (mmr[c], -c))
        selected.append(pick)
        scores[pick] = mmr[pick]
    got = queries()["similarity_mmr_rerank"](spark, sf_dir).collect()
    assert [r["vec_id"] for r in got] == selected
    for r in got:
        assert r["rel"] == rel[r["vec_id"]]
        assert abs(r["mmr_score"] - scores[r["vec_id"]]) < 1e-12
    # diversity sanity: MMR scores are non-increasing in selection order
    assert all(got[i]["mmr_score"] >= got[i + 1]["mmr_score"] for i in range(1, 4))


# --------------------------------------------------------------------------
# Round-9 plan-quality pins (scale-shape regressions fail loudly)
# --------------------------------------------------------------------------


def test_good_turing_single_corpus_scan(spark, sf_dir):
    """The richness pass must read the corpus ONCE: one generate/explode,
    and the count-of-counts must come from the vocabulary table, never a
    second explode.

    Cache cleared first: since the r12 persist() switch, another query's
    persisted token-count fragment can substitute into this plan as an
    InMemoryTableScan whose cached subtree prints inline — the string
    count then reflects the substituting test's session state, not this
    operator's shape."""
    spark.catalog.clearCache()
    plan = physical_plan(queries()["text_good_turing_vocab"](spark, sf_dir))
    assert plan.count("Generate explode") == 1
    assert "CartesianProduct" not in plan


def test_knn_probe_filter_reaches_scan(spark, sf_dir):
    """The bounded probe set must be carved out by a pushed scan filter
    (vec_id < 50), not a post-scan filter of a full materialization."""
    plan = physical_plan(queries()["similarity_knn_label_accuracy"](spark, sf_dir))
    assert "LessThan(vec_id,50)" in plan


def test_trimmed_winsorized_no_single_task_sort(spark, sf_dir):
    """Order statistics must ride the range-partitioned running-count
    machinery — a global Sort of data rows into one partition (the
    naive percentile plan) must not appear before the dictionary."""
    plan = physical_plan(queries()["agg_trimmed_winsorized"](spark, sf_dir))
    # the dictionary running sum range-partitions behind a checkpoint —
    # its _pid label in the plan is the evidence; a naive global-window
    # percentile plan would carry a Window over a single-partition Sort
    assert "_pid" in plan
    assert "Window [row_number()" not in plan


def test_qini_rank_is_range_partitioned(spark, sf_dir):
    """The user decile assignment must use exact_global_rank's range
    exchange, not Window.orderBy over all users in one task. The rank
    machinery's localCheckpoint truncates lineage to an ExistingRDD
    carrying its _pid partition label — that label IS the evidence the
    range-partition path ran; a naive global-window plan has neither."""
    plan = physical_plan(queries()["events_qini_uplift"](spark, sf_dir))
    assert "_pid" in plan
    assert "Window [row_number()" not in plan
