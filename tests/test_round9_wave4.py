"""Third-engine recomputes for the round-9 wave-4 additions
(Brier decomposition, step-indexed top paths, retention decay fit)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from gluettalax_spark.registry import queries
from tests.test_round9_wave2 import _python_doc_logits


# --------------------------------------------------------------------------
# quality_brier_score
# --------------------------------------------------------------------------


def test_brier_matches_python_recompute(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    logits, quals = _python_doc_logits(docs)
    ids = sorted(logits)
    qv = sorted(quals[i] for i in ids)
    med = qv[(len(qv) + 1) // 2 - 1]
    n = len(ids)
    ps, ys = {}, {}
    for i in ids:
        ps[i] = math.floor(1e6 / (1.0 + math.exp(-logits[i] / 30000000.0)) + 0.5)
        ys[i] = 1 if quals[i] > med else 0
    p_tot = sum(ys.values())
    brier = sum((ps[i] / 1e6 - ys[i]) ** 2 for i in ids) / n
    bins = defaultdict(lambda: [0, 0, 0])
    for i in ids:
        b = min(ps[i] * 10 // 1000000, 9)
        bins[b][0] += 1
        bins[b][1] += ys[i]
        bins[b][2] += ps[i]
    ybar = p_tot / n
    rel = sum((psum / nb / 1e6 - pos / nb) ** 2 * nb / n for nb, pos, psum in bins.values())
    res = sum((pos / nb - ybar) ** 2 * nb / n for nb, pos, psum in bins.values())
    row = queries()["quality_brier_score"](spark, sf_dir).collect()[0]
    assert (row["n_docs"], row["n_pos"]) == (n, p_tot)
    # libm-exp ulp drift moves individual p_e6 by ±1 → loose float bars;
    # the bit-exact check is the DuckDB oracle's
    assert abs(row["brier"] - brier) < 1e-5
    assert abs(row["rel_e9"] / 1e9 - rel) < 1e-4
    assert abs(row["res_e9"] / 1e9 - res) < 1e-4
    assert row["uncertainty"] == ybar * (1.0 - ybar)
    # Murphy identity holds for the BINNED forecaster: brier ≈ rel − res + unc
    binned_brier = row["rel_e9"] / 1e9 - row["res_e9"] / 1e9 + row["uncertainty"]
    # within-bin probability variance separates the two — bounded by bin width²
    assert abs(row["brier"] - binned_brier) < 0.01 + 1e-9


# --------------------------------------------------------------------------
# events_path_topk
# --------------------------------------------------------------------------


def test_path_topk_matches_pandas(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(["ts", "event_id"])
    paths = Counter()
    for uid, grp in ev.groupby("user_id"):
        first3 = list(grp["event_type"].iloc[:3])
        if len(first3) == 3:
            paths[">".join(first3)] += 1
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = queries()["events_path_topk"](spark, sf_dir).collect()
    assert [(r["path"], r["n_users"]) for r in got] == expect
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))


# --------------------------------------------------------------------------
# events_retention_decay_fit
# --------------------------------------------------------------------------


def test_retention_decay_matches_python(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev["ts"].dt.date
    base, last = days.min(), days.max()
    uw = set()
    for uid, d in zip(ev["user_id"], days):
        uw.add((int(uid), (d - base).days // 7))
    first = {}
    for uid, wk in uw:
        first[uid] = min(first.get(uid, wk), wk)
    maxw = (last - base).days // 7
    pts = []
    for k in range(1, 4):
        eligible = [u for u, cw in first.items() if cw + k <= maxw]
        if not eligible:
            continue
        retained = sum(1 for u in eligible if (u, first[u] + k) in uw)
        if retained > 0:
            y = math.floor(1e6 * math.log(retained / len(eligible)) + 0.5)
            pts.append((k, y))
    np_, sx = len(pts), sum(k for k, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(k * y for k, y in pts)
    sxx = sum(k * k for k, _ in pts)
    slope = (np_ * sxy - sx * sy) / (np_ * sxx - sx * sx) / 1e6
    row = queries()["events_retention_decay_fit"](spark, sf_dir).collect()[0]
    assert row["n_points"] == np_
    assert abs(row["weekly_decay"] - slope) < 1e-9
    if slope < 0:
        assert abs(row["half_life_weeks"] - math.log(2) / (-slope)) < 1e-6
    else:
        assert row["half_life_weeks"] is None
