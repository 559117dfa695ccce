"""Third-engine recomputes for the round-9 wave-3 additions
(deterministic permutation test, classical weekly decomposition,
log-log price elasticity)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import numpy as np
import pandas as pd

from gluettalax_spark.registry import queries


# --------------------------------------------------------------------------
# stats_permutation_test
# --------------------------------------------------------------------------


def test_permutation_test_matches_python(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    per_user = {}
    for uid, grp in ev.groupby("user_id"):
        per_user[int(uid)] = (
            int((grp["value"] * 100).round().astype("int64").sum()),
            len(grp),
        )

    def diff(b: int) -> float:
        sa = na = sb = nb = 0
        for uid, (t, n) in per_user.items():
            key = str(uid) if b == 0 else f"{uid}_{b}"
            if int(hashlib.md5(key.encode()).hexdigest()[0], 16) % 2 == 0:
                sa += t
                na += n
            else:
                sb += t
                nb += n
        return sa / na - sb / nb

    diffs = [diff(b) for b in range(32)]
    obs = diffs[0]
    n_extreme = sum(1 for d in diffs[1:] if abs(d) >= abs(obs))
    row = queries()["stats_permutation_test"](spark, sf_dir).collect()[0]
    assert row["n_perms"] == 31
    assert row["diff_obs"] == obs
    assert row["n_extreme"] == n_extreme
    assert row["p_value"] == (1.0 + n_extreme) / 32.0
    # add-one estimator bounds
    assert 1 / 32 <= row["p_value"] <= 1.0


# --------------------------------------------------------------------------
# events_weekly_decompose
# --------------------------------------------------------------------------


def test_weekly_decompose_matches_pandas_ma(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupby(ev["ts"].dt.date).size().sort_index()
    c = daily.values.astype("int64")
    days = list(daily.index)
    agg = defaultdict(lambda: [0, 0])  # n_days, sum_det7
    for i in range(3, len(c) - 3):
        det7 = int(7 * c[i] - c[i - 3 : i + 4].sum())
        # Spark dayofweek: Sunday=1 .. Saturday=7
        wd = (days[i].weekday() + 1) % 7 + 1
        agg[wd][0] += 1
        agg[wd][1] += det7
    rows = {r["weekday"]: r for r in queries()["events_weekly_decompose"](spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for wd, (n, s) in agg.items():
        r = rows[wd]
        assert (r["n_days"], r["sum_det7"]) == (n, s)
        # both engines' integer division truncates toward zero; Python //
        # floors, so replicate truncation explicitly for negative sums
        num = s * 1000000
        trunc = abs(num) // (7 * n) * (1 if num >= 0 else -1)
        assert r["seasonal_micro"] == trunc
    # additive seasonality sums to ~0 over a full cycle (exact ×7 ints
    # cancel up to the unequal weekday counts)
    total = sum(s for _, s in agg.values())
    assert abs(total) <= 7 * sum(c)


# --------------------------------------------------------------------------
# orders_price_elasticity
# --------------------------------------------------------------------------


def test_price_elasticity_matches_python_ols(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    demand = li.groupby("l_partkey")["l_quantity"].apply(
        lambda s: int(s.round().astype("int64").sum())
    )
    moments = defaultdict(lambda: [0, 0, 0, 0, 0])  # n sx sy sxy sxx
    for _, p in part.iterrows():
        q = demand.get(p["p_partkey"], 0)
        if q <= 0:
            continue
        x = math.floor(1e6 * math.log(int(round(p["p_retailprice"] * 100))) + 0.5)
        y = math.floor(1e6 * math.log(q) + 0.5)
        m = moments[p["p_type"]]
        m[0] += 1
        m[1] += x
        m[2] += y
        m[3] += x * y
        m[4] += x * x
    rows = {r["p_type"]: r for r in queries()["orders_price_elasticity"](spark, sf_dir).collect()}
    assert set(rows) == set(moments)
    for t, (n, sx, sy, sxy, sxx) in moments.items():
        r = rows[t]
        assert r["n"] == n
        # the engines evaluate n·sxy − sx·sy in IEEE doubles; Python big
        # ints are exact, so allow the double-rounding gap
        expect = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert abs(r["elasticity"] - expect) < 1e-6
