"""Third-engine recomputes + plan pins for the round-8 additions.

The DuckDB oracle compare is the driver's job; these tests re-derive the
same answers in plain Python and pin the plan shapes that keep each
operator on its scale path."""

from __future__ import annotations

import pytest

import math
import re
from collections import defaultdict

import pandas as pd

from gluettalax_spark.registry import queries
from tests.test_plans import physical_plan


# --------------------------------------------------------------------------
# jobs_run_history_stats — control-plane dogfood
# --------------------------------------------------------------------------


def _run_history_brute(sf_dir: str):
    """Plain-pandas re-derivation of the deterministic replay + stats."""
    orders = (
        pd.read_parquet(f"{sf_dir}/orders.parquet")
        .sort_values("o_orderkey")
        .head(500)
    )
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")[["n_nationkey", "n_name"]]
    h = orders.merge(nation, left_on=orders["o_custkey"] % 25, right_on="n_nationkey")
    h["state"] = h["o_orderstatus"].map(
        {"F": "SUCCEEDED", "O": "RUNNING", "P": "FAILED"}
    )
    # Python round() is half-even; cents values never land on exact .5
    # (the fractional part is double representation error), so it agrees
    # with Spark/DuckDB round here.
    h["exec"] = (h["o_totalprice"] * 100).round().astype("int64") % 86400 / 100.0
    h["run_id"] = h["o_orderkey"].astype(str)

    out = []
    for job, g in h.groupby("n_name"):
        n = len(g)
        n_ok = int((g["state"] == "SUCCEEDED").sum())
        p50 = g["exec"].quantile(0.5, interpolation="linear")
        last = g.sort_values(["o_orderdate", "run_id"], ascending=[False, False]).iloc[0]
        out.append((job, n, n_ok, n_ok / n, p50, last["state"]))
    return sorted(out)


def test_run_history_matches_python_recompute(spark, sf_dir):
    rows = queries()["jobs_run_history_stats"](spark, sf_dir).collect()
    got = [
        (r["job_name"], r["n_runs"], r["n_succeeded"], r["success_rate"],
         r["p50_exec_sec"], r["last_run_state"])
        for r in rows
    ]
    assert got == _run_history_brute(sf_dir)


def test_run_history_replay_is_bounded(spark, sf_dir):
    """The replay collect must stay control-plane sized: the orders LIMIT
    compiles to TakeOrderedAndProject (no global sort), and the analytics
    window is partitioned by job_name (no single-task funnel)."""
    from gluettalax_spark.operators.runhistory import _N_RUNS, _replayed_registry

    reg = _replayed_registry(spark, sf_dir)
    assert 0 < len(reg._runs) <= _N_RUNS

    plan = physical_plan(queries()["jobs_run_history_stats"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# Rows-only witness manifest (VERDICT r7 task 4)
# --------------------------------------------------------------------------


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_every_rows_only_key_declares_and_emits_its_witness(spark, sf_dir):
    """Registration already refuses an oracle-less key without witness
    columns; this pins the other half — every declared witness column is
    actually present in the builder's output schema, so renaming a column
    can't silently orphan the certificate the tests assert elsewhere."""
    from gluettalax_spark import registry

    for name, spec in registry.all_queries().items():
        if spec.oracle is not None or spec.oracle_template is not None:
            # Static oracle or data-dependent oracle template (r12): the
            # key is value-checked, not rows-only — no witness required.
            continue
        assert spec.witness, f"{name}: rows-only without witness columns"
        cols = set(spec.builder(spark, sf_dir).columns)
        missing = [w for w in spec.witness if w not in cols]
        assert not missing, f"{name}: witness columns missing from output: {missing}"


def test_run_history_roundtrips_through_list_runs(spark, sf_dir):
    """The replayed history serves the reference's A3/C5 surfaces too —
    same records, same plans as live runs."""
    from gluettalax_spark.operators.runhistory import _replayed_registry

    reg = _replayed_registry(spark, sf_dir)
    some_job = next(iter(reg._runs.values())).job_name
    reg.register(some_job, lambda spark: None)  # list_runs validates the name
    rows = reg.list_runs(spark, name=some_job, lines=3)
    assert 0 < len(rows) <= 3
    assert all(r["job_name"] == some_job for r in rows)
    # newest-first (D6 ordering)
    starts = [r["started_on"] for r in rows]
    assert starts == sorted(starts, reverse=True)


# --------------------------------------------------------------------------
# stats_mannwhitney_events
# --------------------------------------------------------------------------


def test_mannwhitney_matches_python_recompute(spark, sf_dir):
    """Re-derive U, the tie term, and z with pandas average ranks —
    a different rank algorithm than the dictionary construction."""
    row = queries()["stats_mannwhitney_events"](spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    ev = ev[ev["event_type"].isin(["click", "purchase"])].copy()
    ev["v"] = (ev["value"] * 100).round().astype("int64")
    ev["r"] = ev["v"].rank(method="average")
    a = ev[ev["event_type"] == "click"]
    n1, n2 = len(a), len(ev) - len(a)
    r1_x2 = int(round(2 * a["r"].sum()))
    u1_x2 = r1_x2 - n1 * (n1 + 1)
    tie_t = sum(t**3 - t for t in ev["v"].value_counts())
    n = n1 + n2
    z = (u1_x2 - float(n1) * n2) / math.sqrt(
        float(n1) * n2 * ((float(n) + 1) - float(tie_t) / (float(n) * (float(n) - 1))) / 3.0
    )
    assert (row["n1"], row["n2"], row["u1_x2"], row["tie_t"]) == (n1, n2, u1_x2, tie_t)
    assert abs(row["z"] - z) < 1e-9


# --------------------------------------------------------------------------
# stats_spearman_quality_length
# --------------------------------------------------------------------------


def test_spearman_matches_pandas(spark, sf_dir):
    """pandas' spearman (average ranks + Pearson) is an entirely
    independent implementation of the same statistic."""
    rows = queries()["stats_spearman_quality_length"](spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    # the shared composite quality, 4-decimal quantized (text._quality_parts)
    def qual(text: str) -> float:
        n_chars = len(text)
        toks = re.findall(r"\S+", text)
        n_stop = len(re.findall(r"\b(?:the|and|of|to|is|a|in)\b", text.lower()))
        n_punct = len(re.findall(r"[.,!?;:]", text))
        len_score = min(n_chars / 500.0, 1.0)
        stop_ratio = n_stop / max(len(toks), 1)
        punct_ratio = n_punct / max(n_chars, 1)
        return math.floor((0.5 * len_score + 0.4 * stop_ratio + 0.1 * (1.0 - punct_ratio)) * 10000 + 0.5) / 10000

    docs["y"] = [round(qual(t) * 10000) for t in docs["text"]]
    for r in rows:
        g = docs[docs["source"] == r["source"]]
        # average-rank Spearman = Pearson on the tied ranks (scipy-free)
        rx = g["n_chars"].rank(method="average")
        ry = g["y"].rank(method="average")
        rho = rx.corr(ry)  # Pearson
        assert r["n_docs"] == len(g)
        assert abs(r["rho"] - rho) < 1e-9, (r["source"], r["rho"], rho)


# --------------------------------------------------------------------------
# stats_chi2_type_by_split
# --------------------------------------------------------------------------


def test_chi2_matches_exact_integer_recompute(spark, sf_dir):
    import hashlib

    row = queries()["stats_chi2_type_by_split"](spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    grp = [int(hashlib.md5(str(u).encode()).hexdigest()[0], 16) % 2 for u in ev["user_id"]]
    cells: dict[tuple[str, int], int] = defaultdict(int)
    for t, g in zip(ev["event_type"], grp):
        cells[(t, g)] += 1
    nn = sum(cells.values())
    rt: dict[str, int] = defaultdict(int)
    ct: dict[int, int] = defaultdict(int)
    for (t, g), o in cells.items():
        rt[t] += o
        ct[g] += o
    chi2_e9 = sum(
        (o * nn - rt[t] * ct[g]) ** 2 * 1_000_000_000 // (nn * rt[t] * ct[g])
        for (t, g), o in cells.items()
    )  # exact big-int arithmetic — also proves no silent decimal wrap
    assert row["n_types"] == len(rt)
    assert row["dof"] == len(rt) - 1
    assert row["chi2_e9"] == chi2_e9
    # A/A calibration: the md5 split is independent of behavior, so the
    # homogeneity statistic must stay near its dof-scale expectation.
    assert row["chi2"] < 50.0


# --------------------------------------------------------------------------
# graph_modularity
# --------------------------------------------------------------------------


def _lpa_brute(sf_dir: str):
    """Replay the deterministic LPA spec + modularity in plain Python."""
    from gluettalax_spark.operators.graph import _LPA_ITERS, _TRI_MIN_SUPPORT, MAX_BASKET

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    op = li.drop_duplicates()
    pair_count: dict[tuple[int, int], int] = defaultdict(int)
    for _, g in op.groupby("l_orderkey"):
        ps = sorted(g["l_partkey"].tolist())
        if len(ps) > MAX_BASKET:
            continue
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_count[(ps[i], ps[j])] += 1
    edges = {e for e, c in pair_count.items() if c >= _TRI_MIN_SUPPORT}
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    lab = {n: n for n in adj}
    for _ in range(_LPA_ITERS):
        nxt = {}
        for n in adj:
            cnt: dict[int, int] = defaultdict(int)
            for v in adj[n]:
                cnt[lab[v]] += 1
            nxt[n] = min(cnt, key=lambda l: (-cnt[l], l))
        lab = nxt
    m = len(edges)
    intra = sum(1 for a, b in edges if lab[a] == lab[b])
    dsum: dict[int, int] = defaultdict(int)
    for n in adj:
        dsum[lab[n]] += len(adj[n])
    b = sum(v * v for v in dsum.values())
    q = intra / m - b / (4.0 * m * m)
    return len(dsum), m, intra, q


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_modularity_matches_python_lpa_replay(spark, sf_dir):
    row = queries()["graph_modularity"](spark, sf_dir).collect()[0]
    n_comm, m, intra, q = _lpa_brute(sf_dir)
    assert (row["n_communities"], row["m_edges"], row["intra_edges"]) == (n_comm, m, intra)
    assert abs(row["modularity"] - q) < 1e-12
    # sanity: modularity is bounded
    assert -0.5 <= row["modularity"] <= 1.0


# --------------------------------------------------------------------------
# text_gopher_quality
# --------------------------------------------------------------------------


def test_gopher_rules_match_python_recompute(spark, sf_dir):
    rows = {r["source"]: r for r in queries()["text_gopher_quality"](spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    agg: dict[str, list[int]] = defaultdict(lambda: [0] * 8)
    for src, text in zip(docs["source"], docs["text"]):
        ws = re.findall(r"\S+", text)
        nw = len(ws)
        wchars = sum(len(w) for w in ws)
        n_alpha = sum(1 for w in ws if re.search(r"[a-z]", w.lower()))
        n_sym = text.count("#") + text.count("...")
        lines = text.split("\n")
        n_bullet = sum(1 for l in lines if re.match(r"^[-*•]", l.lstrip()))
        n_stop = len(re.findall(r"\b(?:the|and|of|to|is|a|in)\b", text.lower()))
        r = [
            1 if 50 <= nw <= 100000 else 0,
            1 if 3 * nw <= wchars <= 10 * nw else 0,
            1 if 10 * n_sym <= nw else 0,
            1 if 10 * n_bullet <= 9 * len(lines) else 0,
            1 if 10 * n_alpha >= 8 * nw else 0,
            1 if n_stop >= 2 else 0,
        ]
        a = agg[src]
        a[0] += 1
        for i in range(6):
            a[1 + i] += r[i]
        a[7] += int(all(r))
    for src, a in agg.items():
        got = rows[src]
        assert (
            got["n_docs"], got["pass_word_count"], got["pass_mean_word_len"],
            got["pass_symbol_ratio"], got["pass_bullet_lines"], got["pass_alpha_words"],
            got["pass_stopwords"], got["pass_all"],
        ) == tuple(a)
        assert got["pass_all_ppm"] == a[7] * 1_000_000 // a[0]


def test_round8_stats_plans_stay_jvm_side(spark, sf_dir):
    """None of the new statistics ops may fall off the codegen path into
    Python evaluation, and none may plan a cartesian product (their only
    crossJoins broadcast 1-row aggregates)."""
    for name in (
        "stats_mannwhitney_events",
        "stats_spearman_quality_length",
        "stats_chi2_type_by_split",
        "graph_modularity",
        "text_gopher_quality",
    ):
        plan = physical_plan(queries()[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


# --------------------------------------------------------------------------
# embedding_matryoshka_audit
# --------------------------------------------------------------------------


def test_matryoshka_matches_numpy_recompute(spark, sf_dir):
    import numpy as np

    from gluettalax_spark.operators.similarity import COV_Q

    rows = {r["k"]: r for r in queries()["embedding_matryoshka_audit"](spark, sf_dir).collect()}
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    by_id = {int(v): np.floor(np.asarray(e, dtype="float64") * COV_Q).astype("int64")
             for v, e in zip(emb["vec_id"], emb["embedding"])}
    got: dict[int, list[int]] = {k: [0, 0] for k in (8, 16, 32, 64)}
    for vid, qa in by_id.items():
        if vid % 2 or (vid + 1) not in by_id:
            continue
        qb = by_id[vid + 1]
        # exact big-int folds (object dtype) — also proves no decimal wrap
        qa_o, qb_o = qa.astype(object), qb.astype(object)
        dot_f = int((qa_o * qb_o).sum())
        na_f, nb_f = int((qa_o * qa_o).sum()), int((qb_o * qb_o).sum())
        cos_f = dot_f / math.sqrt(float(na_f) * float(nb_f))
        for k in (8, 16, 32, 64):
            na_k = int((qa_o[:k] * qa_o[:k]).sum())
            nb_k = int((qb_o[:k] * qb_o[:k]).sum())
            if na_k == 0 or nb_k == 0:
                continue
            dot_k = int((qa_o[:k] * qb_o[:k]).sum())
            cos_k = dot_k / math.sqrt(float(na_k) * float(nb_k))
            got[k][0] += 1
            got[k][1] += int(math.floor(abs(cos_k - cos_f) * 1_000_000_000))
    for k, (n, s) in got.items():
        assert rows[k]["n_pairs"] == n, k
        assert rows[k]["sum_delta_e9"] == s, k
    # structural: drift shrinks as the prefix grows; full-dim drift is 0
    deltas = [rows[k]["mean_abs_delta"] for k in (8, 16, 32, 64)]
    assert deltas == sorted(deltas, reverse=True)
    assert rows[64]["mean_abs_delta"] == 0.0


# --------------------------------------------------------------------------
# text_dsir_importance
# --------------------------------------------------------------------------


def test_dsir_matches_python_recompute_and_discriminates(spark, sf_dir):
    from collections import Counter

    rows = {r["lang"]: r for r in queries()["text_dsir_importance"](spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    c_src: Counter = Counter()
    c_tgt: Counter = Counter()
    per_doc = []
    for lang, text in zip(docs["lang"], docs["text"]):
        ws = re.findall(r"[a-z]+", text.lower())
        per_doc.append((lang, ws))
        c_src.update(ws)
        if lang == "en":
            c_tgt.update(ws)
    v = len(c_src)
    s_tok, t_tok = sum(c_src.values()), sum(c_tgt.values())
    q = {w: math.floor((math.log(c_tgt.get(w, 0) + 1) - math.log(c + 1)) * 1_000_000)
         for w, c in c_src.items()}
    off = math.floor((math.log(s_tok + v) - math.log(t_tok + v)) * 1_000_000)
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for lang, ws in per_doc:
        w_micro = sum(q[w] for w in ws) + len(ws) * off
        agg[lang][0] += 1
        agg[lang][1] += w_micro
    for lang, (n, s) in agg.items():
        assert rows[lang]["n_docs"] == n, lang
        assert rows[lang]["sum_weight_micro"] == s, lang
    # the audit the operator exists for: target-language docs outscore all
    en = rows["en"]["mean_weight"]
    assert all(en > r["mean_weight"] for lang, r in rows.items() if lang != "en")


def test_round8_embedding_text_plans_stay_jvm_side(spark, sf_dir):
    for name in ("embedding_matryoshka_audit", "text_dsir_importance"):
        plan = physical_plan(queries()[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


# --------------------------------------------------------------------------
# join_duplicate_payments
# --------------------------------------------------------------------------


def test_duplicate_payments_matches_python_recompute(spark, sf_dir):
    rows = queries()["join_duplicate_payments"](spark, sf_dir).collect()
    got = sorted((r["custkey"], r["order_a"], r["order_b"], r["cents_a"], r["cents_b"], r["day_gap"])
                 for r in rows)
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    want = []
    for _, g in o.groupby("o_custkey"):
        recs = g.sort_values("o_orderkey")[["o_orderkey", "cents", "o_orderdate"]].values.tolist()
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                (ka, ca, da), (kb, cb, db) = recs[i], recs[j]
                gap = abs((da - db).days)
                if abs(ca - cb) <= 10_000 and gap <= 90:
                    want.append((int(g["o_custkey"].iloc[0]), int(ka), int(kb), int(ca), int(cb), gap))
    assert got == sorted(want)


def test_duplicate_payments_band_boundary_pair_found_once(spark, tmp_path):
    """A qualifying pair whose amounts land in ADJACENT bands must be
    found, and found exactly once — the fixture may not engage the
    boundary at every SF, so pin it synthetically (round-7 lesson:
    caps/edges that change output need a synthetic replay)."""
    import datetime

    rows = [
        # same band
        (1, 100, 33590_00 / 100.0, datetime.datetime(2024, 1, 1)),
        (1, 101, 33595_00 / 100.0, datetime.datetime(2024, 1, 10)),
        # adjacent bands: 99.99 vs 100.50 -> bands 0 and 1, diff <= $100
        (2, 200, 99.99, datetime.datetime(2024, 2, 1)),
        (2, 201, 100.50, datetime.datetime(2024, 2, 5)),
        # outside tolerance: diff > $100
        (3, 300, 10.00, datetime.datetime(2024, 3, 1)),
        (3, 301, 500.00, datetime.datetime(2024, 3, 2)),
        # outside window: 91+ days apart
        (4, 400, 50.00, datetime.datetime(2024, 1, 1)),
        (4, 401, 50.00, datetime.datetime(2024, 6, 1)),
    ]
    pdf = pd.DataFrame(rows, columns=["o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"])
    # Spark rejects pandas' default nanosecond parquet timestamps
    pdf["o_orderdate"] = pdf["o_orderdate"].astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "orders.parquet")
    got = queries()["join_duplicate_payments"](spark, str(tmp_path)).collect()
    pairs = [(r["custkey"], r["order_a"], r["order_b"]) for r in got]
    assert pairs == [(1, 100, 101), (2, 200, 201)]


def test_duplicate_payments_plan_is_equi_join(spark, sf_dir):
    """The scale story: the band construction must compile to a hash/sort
    equi-join — never the nested-loop the oracle's inequality join
    implies."""
    plan = physical_plan(queries()["join_duplicate_payments"](spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or ("BroadcastHashJoin" in plan)


# --------------------------------------------------------------------------
# text_tfidf_source_keywords
# --------------------------------------------------------------------------


def test_tfidf_source_keywords_match_python_recompute(spark, sf_dir):
    from collections import Counter

    rows = queries()["text_tfidf_source_keywords"](spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    n_docs = len(docs)
    dfreq: Counter = Counter()
    tf: dict[str, Counter] = defaultdict(Counter)
    for src, text in zip(docs["source"], docs["text"]):
        ws = re.findall(r"[a-z]+", text.lower())
        tf[src].update(ws)
        dfreq.update(set(ws))
    idf = {w: math.floor(math.log((n_docs + 1) / (c + 1)) * 1_000_000) for w, c in dfreq.items()}
    want = []
    for src, cnt in tf.items():
        scored = sorted(((-c * idf[w], w, c) for w, c in cnt.items()))[:10]
        for rank, (neg, w, c) in enumerate(scored, start=1):
            want.append((src, rank, w, c, idf[w], -neg))
    got = [(r["source"], r["rank"], r["term"], r["tf"], r["idf_micro"], r["score_micro"])
           for r in rows]
    assert got == sorted(want)


# --------------------------------------------------------------------------
# orders_demand_variability_xyz / events_markov_entropy_rate /
# orders_gini_customers
# --------------------------------------------------------------------------


def test_xyz_matches_python_recompute(spark, sf_dir):
    rows = {r["xyz_class"]: r for r in queries()["orders_demand_variability_xyz"](spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_shipdate", "l_quantity"])
    li["mi"] = li["l_shipdate"].dt.year * 12 + li["l_shipdate"].dt.month
    li["q"] = li["l_quantity"].round().astype("int64")
    lo, hi = int(li["mi"].min()), int(li["mi"].max())
    n = hi - lo + 1
    want: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for p, g in li.groupby("l_partkey"):
        monthly = g.groupby("mi")["q"].sum()
        s = int(monthly.sum())
        qq = int((monthly**2).sum())  # zero months add nothing to either moment
        if s == 0:
            cls = "Z"
        elif 4 * (n * qq - s * s) <= s * s:
            cls = "X"
        elif (n * qq - s * s) <= s * s:
            cls = "Y"
        else:
            cls = "Z"
        want[cls][0] += 1
        want[cls][1] += s
    for cls, (np_, dem) in want.items():
        assert rows[cls]["n_parts"] == np_, cls
        assert rows[cls]["total_demand"] == dem, cls
    assert sum(v[0] for v in want.values()) == sum(r["n_parts"] for r in rows.values())


def test_markov_entropy_matches_python_recompute(spark, sf_dir):
    row = queries()["events_markov_entropy_rate"](spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    nij: dict[tuple[str, str], int] = defaultdict(int)
    for _, g in ev.groupby("user_id"):
        ts = g["event_type"].tolist()
        for a, b in zip(ts, ts[1:]):
            nij[(a, b)] += 1
    nn = sum(nij.values())
    ni: dict[str, int] = defaultdict(int)
    for (a, _), c in nij.items():
        ni[a] += c
    e8 = sum(math.floor(c / nn * math.log(ni[a] / c) * 100_000_000) for (a, _), c in nij.items())
    assert row["n_transitions"] == nn
    assert row["n_states"] == len(ni)
    assert row["entropy_rate_e8"] == e8
    assert 0.0 <= row["normalized_entropy"] <= 1.0 + 1e-12


def test_gini_matches_python_recompute(spark, sf_dir):
    row = queries()["orders_gini_customers"](spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    spend = o.groupby("o_custkey")["cents"].sum().sort_values(kind="stable")
    n = len(spend)
    s = int(spend.sum())
    a = sum(i * int(x) for i, x in enumerate(spend.values, start=1))
    gini = 2.0 * float(a) / (float(n) * float(s)) - (float(n) + 1) / n
    assert row["n_customers"] == n and row["total_cents"] == s
    assert abs(row["gini"] - gini) < 1e-12
    assert 0.0 <= row["gini"] < 1.0


def test_round8_wave2_plans_stay_jvm_side(spark, sf_dir):
    for name in (
        "orders_demand_variability_xyz",
        "events_markov_entropy_rate",
        "orders_gini_customers",
        "join_duplicate_payments",
        "text_tfidf_source_keywords",
    ):
        plan = physical_plan(queries()[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


# --------------------------------------------------------------------------
# text_bigram_kn_logppl
# --------------------------------------------------------------------------


def test_kn_logppl_matches_python_recompute(spark, sf_dir):
    """Full big-int replay of the Kneser-Ney construction — train/test
    split, discounted counts, continuation unigram — in plain Python."""
    from collections import Counter

    row = queries()["text_bigram_kn_logppl"](spark, sf_dir).collect()[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    c_ab: Counter = Counter()
    test: Counter = Counter()
    for did, text in zip(docs["doc_id"], docs["text"]):
        ws = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if len(t) >= 3]
        grams = list(zip(ws, ws[1:]))
        (c_ab if did % 10 < 8 else test).update(grams)
    c_v: Counter = Counter()
    n1v: Counter = Counter()
    n1w: Counter = Counter()
    for (a, b), c in c_ab.items():
        c_v[a] += c
        n1v[a] += 1
        n1w[b] += 1
    tt = len(c_ab)
    n_eval = n_oov = s_micro = 0
    for (a, b), m in test.items():
        if a not in c_v or b not in n1w:
            n_oov += m
            continue
        num = max(4 * c_ab.get((a, b), 0) - 3, 0) * tt + 3 * n1v[a] * n1w[b]
        den = 4 * c_v[a] * tt
        n_eval += m
        s_micro += m * math.floor(math.log(den / num) * 1_000_000)
    assert row["n_eval_bigrams"] == n_eval
    assert row["n_oov_bigrams"] == n_oov
    assert row["sum_micronats"] == s_micro
    assert abs(row["avg_nats"] - s_micro / 1_000_000 / n_eval) < 1e-12
    # KN must beat (or match) the uniform baseline over train bigram types
    assert row["avg_nats"] < math.log(tt)


# --------------------------------------------------------------------------
# semantic_dedup over-cap star degradation (engaged from sf1.0 up)
# --------------------------------------------------------------------------


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_semantic_dedup_overcap_emits_star_pairs_only(spark, sf_dir):
    """Force the band cap (max_bucket=2) so every cluster degrades: each
    over-cap cluster must emit only (rep=min vec_id, member) pairs —
    linear, never the clique — with the same integer-quantized scores.
    The sf1.0 sweep engages this for real (clusters reach ~2900 > 512);
    this pins the semantics at any SF."""
    from pyspark.sql import functions as F

    from gluettalax_spark.operators.semantic import (
        _seed_centroids,
        assign_clusters,
        semantic_dedup,
    )
    from gluettalax_spark.tables import load

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    reps = {
        r.cluster_id: r.rep
        for r in assign_clusters(emb, _seed_centroids(load(spark, sf_dir, "embeddings")))
        .groupBy("cluster_id")
        .agg(F.min("vec_id").alias("rep"))
        .collect()
    }

    capped = {(r.cluster_id, r.vec_a, r.vec_b, r.cosine)
              for r in semantic_dedup(spark, sf_dir, max_bucket=2).collect()}
    full = {(r.cluster_id, r.vec_a, r.vec_b, r.cosine)
            for r in semantic_dedup(spark, sf_dir).collect()}

    # star shape: only (rep, member) pairs survive; and they are exactly
    # the full-clique pairs anchored at the cluster representative
    # (same integer-quantized scores — set equality pins both).
    assert capped == {t for t in full if t[1] == reps[t[0]]}
    for cid, a, b, _ in capped:
        assert a == reps[cid] and a < b


# --------------------------------------------------------------------------
# text_langid_confusion
# --------------------------------------------------------------------------


def test_langid_confusion_matches_recompute_and_diagonal_dominates(spark, sf_dir):
    rows = queries()["text_langid_confusion"](spark, sf_dir).collect()
    pred = queries()["text_lang_id"](spark, sf_dir).collect()
    cells: dict[tuple[str, str], int] = defaultdict(int)
    for p in pred:
        cells[(p.lang_true, p.lang_pred)] += 1
    n_true: dict[str, int] = defaultdict(int)
    n_pred: dict[str, int] = defaultdict(int)
    for (t, p), n in cells.items():
        n_true[t] += n
        n_pred[p] += n
    assert len(rows) == len(cells)
    for r in rows:
        n = cells[(r.lang_true, r.lang_pred)]
        assert r.n == n
        assert r.recall_ppm == n * 1_000_000 // n_true[r.lang_true]
        assert r.precision_ppm == n * 1_000_000 // n_pred[r.lang_pred]
    # marginals are consistent: recall_ppm sums to ~1e6 per true class
    # (integer floor division loses at most (k-1) ppm per class)
    by_true: dict[str, int] = defaultdict(int)
    counts: dict[str, int] = defaultdict(int)
    for r in rows:
        by_true[r.lang_true] += r.recall_ppm
        counts[r.lang_true] += 1
    for t, s in by_true.items():
        assert 1_000_000 - counts[t] < s <= 1_000_000, (t, s)
    # NOTE: the fixture's texts are English-vocabulary word salad for
    # every lang label, so the matrix legitimately shows off-diagonal
    # mass — surfacing that is the operator's purpose, not a bug.


# --------------------------------------------------------------------------
# supplier_lead_time_percentiles / customer_segment_migration
# --------------------------------------------------------------------------


def test_lead_time_matches_python_recompute(spark, sf_dir):
    rows = {r["supplier_nation"]: r
            for r in queries()["supplier_lead_time_percentiles"](spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    n = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    j = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
           .merge(s, left_on="l_suppkey", right_on="s_suppkey")
           .merge(n, left_on="s_nationkey", right_on="n_nationkey"))
    j["lag"] = (j["l_shipdate"].values.astype("datetime64[D]")
                - j["o_orderdate"].values.astype("datetime64[D]")).astype("int64")
    for nat, g in j.groupby("n_name"):
        r = rows[nat]
        assert r["n_lines"] == len(g)
        assert r["mean_lag_days"] == int(g["lag"].sum()) // len(g)
        assert abs(r["p50_lag_days"] - round(g["lag"].quantile(0.5, interpolation="linear"), 2)) < 1e-9
        assert abs(r["p95_lag_days"] - round(g["lag"].quantile(0.95, interpolation="linear"), 2)) < 1e-9
        assert r["max_lag_days"] == int(g["lag"].max())


def test_segment_migration_matrix_is_consistent(spark, sf_dir):
    """Marginals sanity + exact recompute: the quartile assignment uses
    ANSI ntile(4) over (cents, custkey), replayed here in plain Python."""
    rows = queries()["customer_segment_migration"](spark, sf_dir).collect()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_totalprice"])
    day = o["o_orderdate"].astype("datetime64[us]").astype("int64") // (86400 * 10**6)
    mid = (int(day.min()) + int(day.max())) // 2
    o = o.assign(day=day, cents=(o["o_totalprice"] * 100).round().astype("int64"))

    def ntile4(spend: dict[int, int]) -> dict[int, int]:
        order = sorted(spend.items(), key=lambda kv: (kv[1], kv[0]))
        n = len(order)
        base, rem = divmod(n, 4)
        out, i = {}, 0
        for q in range(1, 5):
            size = base + (1 if q <= rem else 0)
            for c, _ in order[i:i + size]:
                out[c] = q
            i += size
        return out

    h1 = o[o["day"] < mid].groupby("o_custkey")["cents"].sum().to_dict()
    h2 = o[o["day"] >= mid].groupby("o_custkey")["cents"].sum().to_dict()
    q1, q2 = ntile4(h1), ntile4(h2)
    want: dict[tuple[int, int], int] = defaultdict(int)
    for c in set(q1) | set(q2):
        want[(q1.get(c, 0), q2.get(c, 0))] += 1
    got = {(r["quartile_h1"], r["quartile_h2"]): r["n_customers"] for r in rows}
    assert got == dict(want)
