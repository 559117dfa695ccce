"""Third-engine recomputes for the round-9 wave-6 additions
(Anderson-Darling, fuzzy-name entity clusters, PR curve, sentence stats)."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import pandas as pd

from gluettalax_spark.registry import queries
from tests.test_round9_wave1 import _levenshtein
from tests.test_round9_wave2 import _python_doc_logits


def _phi_clamped_py(z: float) -> float:
    """The shared Abramowitz-Stegun Φ construction, in Python."""
    y = abs(z) / math.sqrt(2.0)
    t = 1.0 / (1.0 + 0.3275911 * y)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    half_erfc = math.floor(poly * math.exp(-y * y) * 0.5 * 1e6 + 0.5) / 1e6
    u = 1.0 - half_erfc if z >= 0.0 else half_erfc
    return min(max(u, 0.000001), 0.999999)


# --------------------------------------------------------------------------
# stats_anderson_darling
# --------------------------------------------------------------------------


def test_anderson_darling_matches_python(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    daily = (
        pd.DataFrame({"d": orders["o_orderdate"].dt.date, "c": cents})
        .groupby("d")["c"].sum().sort_values().values
    )
    n = len(daily)
    s1, s2 = int(daily.sum()), int((daily.astype(object) ** 2).sum())
    mean = s1 / n
    sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
    s_micro = 0
    for i, v in enumerate(sorted(daily), 1):
        u = _phi_clamped_py((int(v) - mean) / sd)
        term = (2 * i - 1) * math.log(u) + (2 * (n - i) + 1) * math.log(1.0 - u)
        s_micro += math.floor(1e6 * term + 0.5)
    row = queries()["stats_anderson_darling"](spark, sf_dir).collect()[0]
    assert row["n_days"] == n
    # libm exp/log ulp drift can flip the e6 quantization by 1 per value
    assert abs(row["s_micro"] - s_micro) <= n
    assert abs(row["a_squared"] - (-n - row["s_micro"] / (1e6 * n))) < 1e-9
    assert row["a_squared"] > 0.0


# --------------------------------------------------------------------------
# dedup_fuzzy_clusters
# --------------------------------------------------------------------------


def test_fuzzy_clusters_match_union_find(spark, sf_dir):
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    counts = part.groupby(["p_brand", "p_name"]).size()
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for brand in part["p_brand"].unique():
        names = sorted(counts[brand].index)
        for i, na in enumerate(names):
            for nb in names[i + 1 :]:
                if 1 <= _levenshtein(na, nb) <= 2:
                    union(f"{brand}|{na}", f"{brand}|{nb}")
    clusters = defaultdict(lambda: [0, 0, None])
    for node in parent:
        comp = find(node)
        brand, name = node.split("|", 1)
        c = clusters[comp]
        c[0] += 1
        c[1] += int(counts[(brand, name)])
        c[2] = node if c[2] is None else min(c[2], node)
    got = {r["component"]: r for r in queries()["dedup_fuzzy_clusters"](spark, sf_dir).collect()}
    assert set(got) == set(clusters)
    for comp, (n_sp, n_parts, canon) in clusters.items():
        r = got[comp]
        assert (r["n_spellings"], r["n_parts"], r["canonical"]) == (n_sp, n_parts, canon)
        # component label IS the canonical min node
        assert r["canonical"] == comp
        assert r["n_spellings"] >= 2  # singletons never enter the edge set


# --------------------------------------------------------------------------
# quality_pr_curve
# --------------------------------------------------------------------------


def test_pr_curve_matches_python(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    logits, quals = _python_doc_logits(docs)
    ids = sorted(logits)
    qv = sorted(quals[i] for i in ids)
    med = qv[(len(qv) + 1) // 2 - 1]
    ranked = sorted(ids, key=lambda i: (-logits[i], i))
    n = len(ranked)
    total_pos = sum(1 for i in ids if quals[i] > med)
    dec = defaultdict(lambda: [0, 0])
    for r, i in enumerate(ranked, 1):
        d = (r - 1) * 10 // n
        dec[d][0] += 1
        dec[d][1] += 1 if quals[i] > med else 0
    rows = {r["decile"]: r for r in queries()["quality_pr_curve"](spark, sf_dir).collect()}
    cum_n = cum_pos = 0
    for d in sorted(dec):
        cum_n += dec[d][0]
        cum_pos += dec[d][1]
        r = rows[d]
        assert (r["cum_n"], r["cum_pos"]) == (cum_n, cum_pos)
        assert r["precision_ppm"] == cum_pos * 1000000 // cum_n
        assert r["recall_ppm"] == cum_pos * 1000000 // total_pos
    # curve invariants: recall is monotone; the last decile recalls all
    assert rows[9]["recall_ppm"] == 1000000
    assert rows[9]["cum_n"] == n


# --------------------------------------------------------------------------
# text_sentence_stats
# --------------------------------------------------------------------------


def test_sentence_stats_match_python(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = {r["source"]: r for r in queries()["text_sentence_stats"](spark, sf_dir).collect()}
    for source, grp in docs.groupby("source"):
        n_sent = int(sum(len(re.findall(r"[.!?]+", t)) for t in grp["text"]))
        n_tok = int(sum(len(re.findall(r"\S+", t)) for t in grp["text"]))
        n_unterm = int(sum(1 for t in grp["text"] if not re.search(r"[.!?]", t)))
        r = rows[source]
        assert (r["n_docs"], r["n_sentences"], r["n_tokens"]) == (len(grp), n_sent, n_tok)
        assert r["n_unterminated"] == n_unterm
        assert r["tokens_per_sentence"] == n_tok / max(n_sent, 1)
