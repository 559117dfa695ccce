#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Stdout layout (truncation-proof — the driver captures only the LAST
2000 chars of stdout, which ate round 5's single long JSON line):

  line 1: the FULL detail JSON (all per-query best + median timings) —
          also written to BENCH_SELF.json next to this script;
  final line: a COMPACT summary JSON (< ~1 KB) with the totals, the
          fixed round-4 40-query subset totals for round-over-round
          comparison, and only the 10 slowest per-query timings.

A tail-capturing driver always gets the complete final line; a human
running ``python bench.py`` sees the full map on line 1; the committed
``BENCH_SELF.json`` carries everything either way.

Each query is executed after a warm-up action so the JVM/codegen
warm-up isn't billed to the first query. Timing covers plan + execution
to a count/collect action (results are not shipped to the driver except
for small aggregates, mirroring how the driver consumes them).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship + the most scale-relevant operator families.
# Falls back gracefully if a name isn't registered yet.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_profit_by_nation",
    "q18_large_orders",
    "project_filter_glob",
    "sort_limit_topk",
    "distinct_sorted",
    "set_operations",
    "join_revenue_by_region",
    "join_asof",
    "window_topk_per_group",
    "agg_rollup_daily",
    "agg_percentiles",
    "events_tumbling_window",
    "events_session_window",
    "json_extract_props",
    "variant_props_stats",
    "pivot_status",
    "pandas_udf_scalar",
    "embedding_norms_arrow",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "embedding_neardup",
    "similarity_topk",
    "similarity_topk_lsh",
    "similarity_topk_vectorized",
    "text_stats",
    "text_lang_id",
    "text_token_count",
    "events_funnel",
    "events_dau_bitmap",
    "events_wau_exact",
    "corpus_span_overlap",
    "stratified_sample_by_lang",
    "sample_hash_split",
    "latest_snapshot",
    # round-5 rewrites (ex-single-task windows) + the skew spill metric:
    "window_ntile_distribution",
    "customer_rfm_segments",
    "customer_pareto",
    "dedup_band_spill_report",
    # round-5 additions: semantic (k-means / SemDeDup) family + corpus export
    "semantic_cluster_refine",
    "semantic_dedup",
    "token_budget_sample",
    "source_overlap_matrix",
    "export_training_shards",
    "quality_quantile_filter_by_lang",
    "corpus_incremental_dedup",
    # round-5 late additions: span-level dedup, graph analytics, sketches, PQ
    "paragraph_dedup",
    "graph_triangle_count",
    "events_heavy_hitters_sketch",
    "similarity_topk_pq",
    "similarity_topk_ivfpq",
    "decontaminate_bloom",
    "events_freq_cms",
    "basket_rules",
    "sql_udf_text_metrics",
    "scd2_as_of",
    "agg_histogram_equidepth",
    # round-6 additions: retrieval, collocation stats, attribution, LM-proxy
    "text_bm25_search",
    "text_collocations_pmi",
    "events_attribution_last_touch",
    "text_unigram_logppl",
    "events_markov_transitions",
    "orders_price_trend_ols",
    # round-6 continuation: k-core, vocab coverage curve, exact EWMA
    "graph_kcore",
    "text_vocab_coverage",
    "events_user_ewma",
    "text_bigram_logppl",
    "events_cumulative_distinct_users",
    "embedding_covariance",
    "events_drift_psi",
    "embedding_pca_project",
    "table_checksum_audit",
    "orders_forecast_holt",
    "events_ab_test",
]

# The round-4 bench set (BENCH_r04.json's 40 keys == the first 40
# HEADLINE entries, through latest_snapshot). Its subtotal is reported as
# its own field every round so round-over-round comparison is a fixed
# like-for-like subset, independent of how many queries HEADLINE grows.
R4_SUBSET = HEADLINE[:40]
assert R4_SUBSET[-1] == "latest_snapshot"


def main() -> None:
    from gluettalax_spark import registry
    from gluettalax_spark.session import get_spark

    spark = get_spark("gluettalax-bench")
    specs = registry.all_queries()
    names = [n for n in HEADLINE if n in specs] or sorted(specs)

    sf = None
    try:
        base = os.path.basename(SF_DIR.rstrip("/"))
        if base.startswith("sf"):
            sf = float(base[2:])
    except ValueError:
        pass

    # Warm up the session: JVM/JIT, codegen paths, parquet footer reads.
    # One uncounted run of the flagship exercises scan+agg+sort codegen so
    # the first measured query isn't billed for interpreter warm-up.
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    if names:
        specs[names[0]].builder(spark, SF_DIR).count()

    runs_per_query = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in names:
        builder = specs[name].builder
        # This VM's run-to-run noise is ±50% (GC pauses, compile stalls,
        # co-tenant interference). Best-of-N is the steady-state latency;
        # the median is the noise-robust round-over-round comparator —
        # recorded side by side so a "regression" that is just one noisy
        # run is visible as best≈flat / median moved (or vice versa).
        samples: list[float] = []
        for _ in range(runs_per_query):
            t0 = time.perf_counter()
            df = builder(spark, SF_DIR)
            # count() executes the full plan without shipping rows to the driver.
            df.count()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 4)
        medians[name] = round(statistics.median(samples), 4)

    total = round(sum(timings.values()), 4)
    r4_names = [n for n in R4_SUBSET if n in timings]
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "value_median": round(sum(medians.values()), 4),
        "r4_subset_value": round(sum(timings[n] for n in r4_names), 4),
        "r4_subset_value_median": round(sum(medians[n] for n in r4_names), 4),
        "n_queries": len(timings),
        "sf": sf,
        # Methodology, recorded so rounds compare like-for-like:
        # one uncounted warm-up action, then per-query best-of-N
        # on a warm JVM ("warm" = codegen/JIT/footers cached).
        # "queries"/"value" stay best-of-N for continuity with
        # rounds 1-4; the *_median fields are the stable series.
        "timing": "warm",
        "runs_per_query": runs_per_query,
        "report": "best+median",
    }
    print(json.dumps(full), flush=True)
    try:
        self_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SELF.json")
        with open(self_path, "w") as fh:
            json.dump(full, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass  # read-only checkout: stdout line 1 still has everything

    # Compact summary LAST: totals + the 10 slowest queries only, so it
    # fits whole inside a 2000-char stdout tail capture.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "value_median": full["value_median"],
        "r4_subset_value": full["r4_subset_value"],
        "r4_subset_value_median": full["r4_subset_value_median"],
        "n_queries": len(timings),
        "sf": sf,
        "runs_per_query": runs_per_query,
        "queries": slowest,
        "queries_note": "10 slowest of n_queries; full map on stdout line 1 and in BENCH_SELF.json",
    }
    line = json.dumps(compact)
    assert len(line) < 1900, f"compact summary too long for tail capture: {len(line)}"
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
