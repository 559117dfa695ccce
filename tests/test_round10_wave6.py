"""Round-10 wave 6: IVF cell purity (rows-only witness recompute) and
churn-risk buckets (pandas recompute)."""

from __future__ import annotations

import pandas as pd

from gluettalax_spark.registry import queries


def test_cluster_purity_witnesses(spark, sf_dir):
    rows = sorted(
        queries()["similarity_cluster_purity"](spark, sf_dir).collect(),
        key=lambda r: r.cell,
    )
    from gluettalax_spark.operators.ann import NLIST, _assignments

    assert len(rows) == NLIST
    assigned, _ = _assignments(spark, sf_dir)
    pdf = assigned.select("cell", "label").toPandas()
    total_maj = 0
    for r in rows:
        counts = pdf[pdf["cell"] == r.cell]["label"].value_counts()
        assert r.n_vecs == int(counts.sum())
        # majority with label tie-break: count desc, label asc
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert (r.majority_label, r.n_majority) == (best[0], best[1])
        assert r.purity_ppm == r.n_majority * 1_000_000 // r.n_vecs
        total_maj += r.n_majority
    n_all = len(pdf)
    assert {r.overall_purity_ppm for r in rows} == {total_maj * 1_000_000 // n_all}
    # near-orthogonal fixture vectors: purity should sit near chance
    # (1/10 labels), far from 1.0 — a degenerate all-one-cell fit would
    # push overall purity toward the majority-class share instead
    assert 100_000 <= rows[0].overall_purity_ppm <= 500_000


def test_churn_buckets_match_pandas(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    asof = pd.to_datetime(ev["ts"].max().date())
    per_user = ev.groupby("user_id").agg(
        n=("ts", "size"), last=("ts", "max")
    )
    idle = (asof - pd.to_datetime(per_user["last"].dt.date)).dt.days
    bucket = pd.cut(
        idle,
        bins=[-1, 0, 1, 7, 10**9],
        labels=["0-same-day", "1-yesterday", "2-this-week", "3-stale"],
    )
    expect = (
        pd.DataFrame({"bucket": bucket, "n": per_user["n"], "idle": idle})
        .groupby("bucket", observed=True)
        .agg(n_users=("n", "size"), total_events=("n", "sum"), max_idle=("idle", "max"))
    )
    got = {r.bucket: r for r in queries()["events_churn_risk_buckets"](spark, sf_dir).collect()}
    assert set(got) == set(expect.index.astype(str))
    n_total = len(per_user)
    for bname, e in expect.iterrows():
        r = got[str(bname)]
        assert (r.n_users, r.total_events, r.max_idle_days) == (
            e["n_users"],
            e["total_events"],
            e["max_idle"],
        )
        assert r.share_ppm == e["n_users"] * 1_000_000 // n_total


def test_degree_distribution_matches_python(spark, sf_dir):
    from collections import Counter

    from gluettalax_spark.operators.graph import cooccurrence_edges
    from gluettalax_spark.registry import queries as _q

    edges = cooccurrence_edges(spark, sf_dir).collect()
    deg = Counter()
    for e in edges:
        deg[e.pa] += 1
        deg[e.pb] += 1
    hist = Counter(deg.values())
    total = sum(hist.values())
    rows = sorted(
        _q()["graph_degree_distribution"](spark, sf_dir).collect(),
        key=lambda r: r.degree,
    )
    assert [r.degree for r in rows] == sorted(hist)
    cum = 0
    for r in rows:
        assert r.n_nodes == hist[r.degree]
        cum += r.n_nodes
        assert r.cum_nodes == cum
        assert r.share_ppm == r.n_nodes * 1_000_000 // total
    assert cum == total == len(deg)
