"""Third-engine recomputes for the round-10 wave 8 ops: order-statistic
median CI, quality drift PSI, basket-size histogram, and per-dimension
embedding moments."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from gluettalax_spark.registry import queries


def test_median_ci_brackets_the_sample_median(spark, sf_dir):
    row = queries()["stats_median_ci_order"](spark, sf_dir).collect()[0]
    n = row.n
    # rank sanity: lo <= med <= hi, the normal-approx formulas hold
    z = 1.959964
    assert row.lo_rank == max(1, math.floor((n - z * math.sqrt(n)) / 2))
    assert row.hi_rank == min(n, math.ceil(1 + (n + z * math.sqrt(n)) / 2))
    assert row.med_rank == (n + 1) // 2
    assert row.lo_rank <= row.med_rank <= row.hi_rank
    # the interval contains the median value; endpoints are data values
    assert row.ci_lo <= row.median_q <= row.ci_hi


def test_quality_drift_psi_invariants(spark, sf_dir):
    rows = sorted(queries()["quality_drift_psi"](spark, sf_dir).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(10))
    total = sum(r.term_e8 for r in rows)
    assert {r.psi_e8_total for r in rows} == {total}
    # pooled deciles: each decile holds ~n/10 docs across both halves
    sizes = [r.c_ref + r.c_cur for r in rows]
    n = sum(sizes)
    assert all(abs(s - n / 10) <= n / 10 * 0.2 + 2 for s in sizes)
    # PSI of an id-split of one distribution should read "no drift"
    assert total / 1e8 < 0.1


def test_basket_histogram_matches_pandas(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    sizes = li.groupby("l_orderkey")["l_partkey"].nunique()
    hist = sizes.value_counts().sort_index()
    total = int(hist.sum())
    rows = sorted(
        queries()["orders_basket_size_histogram"](spark, sf_dir).collect(),
        key=lambda r: r.basket_size,
    )
    assert [r.basket_size for r in rows] == list(hist.index)
    cum = 0
    for r in rows:
        assert r.n_orders == hist[r.basket_size]
        cum += r.n_orders
        assert r.cum_orders == cum
        assert r.share_ppm == r.n_orders * 1_000_000 // total
    assert cum == total


def test_dimension_variance_matches_numpy(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    Xq = np.round(X * 1e6).astype(np.int64)
    rows = sorted(
        queries()["embedding_dimension_variance"](spark, sf_dir).collect(),
        key=lambda r: r.dim,
    )
    assert [r.dim for r in rows] == list(range(1, X.shape[1] + 1))
    n = X.shape[0]
    for r in rows:
        col = Xq[:, r.dim - 1].astype(object)
        assert r.n == n
        assert r.s1 == int(col.sum())
        assert r.s2 == int((col * col).sum())
        var = (n * float(r.s2) - float(r.s1) ** 2) / (n * (n - 1)) / 1e12
        assert abs(r.variance - round(var, 9)) <= 1e-12
        # truncation-toward-zero integer division (both engines)
        expect_mean = int(r.s1 / n) if r.s1 >= 0 else -((-r.s1) // n)
        assert r.mean_e6 == expect_mean


def test_storage_savings_matches_pandas(spark, sf_dir):
    import re as _re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    import hashlib

    fp = docs["text"].map(
        lambda t: hashlib.md5(_re.sub(r"\s+", " ", t.lower()).strip().encode()).hexdigest()
    )
    keeper = docs.assign(fp=fp).groupby("fp")["doc_id"].min()
    is_loser = docs["doc_id"].values != keeper[fp].values
    got = {r.source: r for r in queries()["dedup_storage_savings"](spark, sf_dir).collect()}
    for src, grp in docs.assign(loser=is_loser).groupby("source"):
        r = got[src]
        assert r.n_docs == len(grp)
        assert r.n_losers == int(grp["loser"].sum())
        assert r.total_chars == int(grp["n_chars"].sum())
        saved = int(grp.loc[grp["loser"], "n_chars"].sum())
        assert r.chars_saved == saved
        assert r.savings_ppm == saved * 1_000_000 // r.total_chars


def test_doc_length_gini_matches_numpy(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    got = {r.source: r for r in queries()["text_doc_length_gini"](spark, sf_dir).collect()}
    for src, grp in docs.groupby("source"):
        x = np.sort(grp["n_chars"].to_numpy(dtype=np.int64))
        n, s = len(x), int(x.sum())
        a = int((np.arange(1, n + 1, dtype=object) * x.astype(object)).sum())
        gini = 2.0 * a / (n * s) - (n + 1) / n
        r = got[src]
        assert (r.n_docs, r.total_chars) == (n, s)
        assert abs(r.gini - round(gini, 6)) <= 2e-6
        assert 0.0 <= r.gini < 1.0


def test_dow_hour_profile_matches_pandas(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    # unit-safe epoch microseconds (the parquet column is datetime64[us])
    us = pd.Series(ev["ts"].values.astype("datetime64[us]").astype("int64"))
    dow = (us // 86_400_000_000) % 7  # 0 = Thursday (epoch arithmetic)
    hr = ev["ts"].dt.hour
    expect = (
        pd.DataFrame({"d": dow, "h": hr}).groupby(["d", "h"]).size()
    )
    total = int(expect.sum())
    got = {
        (r.dow_thu0, r.hr): r
        for r in queries()["events_dow_hour_profile"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect.index)
    for (d, h), n in expect.items():
        r = got[(d, h)]
        assert r.n_events == n
        assert r.share_ppm == n * 1_000_000 // total
    # 1970-01-01 was a Thursday: cross-check the epoch convention on one cell
    sample = pd.Timestamp(ev["ts"].iloc[0])
    weekday_name = sample.day_name()
    thu0 = {"Thursday": 0, "Friday": 1, "Saturday": 2, "Sunday": 3,
            "Monday": 4, "Tuesday": 5, "Wednesday": 6}[weekday_name]
    assert int(dow.iloc[0]) == thu0


def test_source_lang_coverage_matches_pandas(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    g = docs.groupby(["source", "lang"]).agg(
        n=("doc_id", "size"), chars=("n_chars", "sum")
    )
    src = docs.groupby("source").size()
    lang = docs.groupby("lang").size()
    total = len(docs)
    got = {
        (r.source, r.lang): r
        for r in queries()["text_source_lang_coverage"](spark, sf_dir).collect()
    }
    assert set(got) == set(g.index)
    for (s, l), e in g.iterrows():
        r = got[(s, l)]
        assert (r.n_docs, r.n_chars) == (e["n"], e["chars"])
        assert r.within_source_ppm == e["n"] * 1_000_000 // src[s]
        assert r.within_lang_ppm == e["n"] * 1_000_000 // lang[l]
        assert r.total_ppm == e["n"] * 1_000_000 // total
