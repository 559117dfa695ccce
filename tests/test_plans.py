"""Plan-quality regression tests — the 100 TB design assertions.

Correctness says a query returns the right rows; these tests pin the
*physical plan* properties that keep it fast at 1000× the data:

* predicate pushdown reaches the parquet scan (``PushedFilters``);
* column pruning reaches the scan (``ReadSchema`` carries only used cols);
* dimension joins broadcast (no shuffle of the fact side for dims);
* top-k is ``TakeOrderedAndProject`` (no global sort);
* single-aggregation pipelines shuffle exactly once.

If a refactor regresses one of these, correctness tests stay green while
the 100 TB plan silently rots — this file is what catches it.
"""

from __future__ import annotations

import pytest

import re

from gluettalax_spark.registry import queries


def formatted_plan(df) -> str:
    """Full formatted explain (untruncated, unlike executedPlan().toString())."""
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jqe.explainString(mode)


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_pushdown_and_pruning(spark, sf_dir):
    df = queries()["q6_forecast_revenue"](spark, sf_dir)
    plan = formatted_plan(df)
    # Every predicate reaches the parquet reader...
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert "LessThan(l_quantity,24.0)" in plan
    # ...and the scan reads ONLY the four referenced columns.
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}


def test_q5_broadcasts_all_dimensions(spark, sf_dir):
    df = queries()["q5_local_supplier_volume"](spark, sf_dir)
    plan = physical_plan(df)
    # customer, supplier, nation, region (and at this SF orders) broadcast:
    # the lineitem fact side is never hash-repartitioned for a dim join.
    assert plan.count("BroadcastHashJoin") >= 4, plan
    # The only hash exchange allowed is the final groupBy(n_name).
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_q3_no_global_sort_for_topk(spark, sf_dir):
    df = queries()["q3_shipping_priority"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_sort_limit_topk_take_ordered(spark, sf_dir):
    df = queries()["sort_limit_topk"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_dedup_exact_single_shuffle(spark, sf_dir):
    df = queries()["dedup_exact"](spark, sf_dir)
    plan = physical_plan(df)
    # groupBy(fingerprint) = exactly one hash exchange; the orderBy adds a
    # range exchange but no second hash shuffle. Scan reads only doc_id+text.
    assert plan.count("Exchange hashpartitioning") == 1, plan
    m = re.search(r"ReadSchema: struct<([^>]*)", physical_plan(df))
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) <= {"doc_id", "text"}


def test_q18_broadcasts_having_output(spark, sf_dir):
    """Q18: the post-HAVING aggregate (few rows) must be on the BUILD side
    of a broadcast join — orders must not shuffle against it."""
    df = queries()["q18_large_orders"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_q4_semi_join_physical(spark, sf_dir):
    df = queries()["q4_order_priority"](spark, sf_dir)
    plan = physical_plan(df)
    assert "LeftSemi" in plan, plan


def test_q22_anti_join_physical(spark, sf_dir):
    df = queries()["q22_dormant_customers"](spark, sf_dir)
    plan = physical_plan(df)
    assert "LeftAnti" in plan, plan


def test_partition_pruning_on_partitioned_table(spark, sf_dir, tmp_path):
    """A filter on the partition column becomes a PartitionFilter (pruned
    listing), not a post-scan filter."""
    from gluettalax_spark.sources.io import write_partitioned
    from gluettalax_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars", "lang")
    path = str(tmp_path / "docs_p")
    write_partitioned(docs, path, ["lang"])
    df = spark.read.parquet(path).filter("lang = 'en'").select("doc_id")
    plan = formatted_plan(df)
    assert re.search(r"PartitionFilters: \[.*lang.*\]", plan), plan
    # Non-partition predicate must NOT appear as a partition filter;
    # projection prunes to the two physical columns involved.
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and {c.split(":")[0] for c in m.group(1).split(",")} == {"doc_id"}


def test_interval_join_no_nested_loop(spark, sf_dir):
    """The banded pure-range join must plan as an equi join on the bucket
    key — never BroadcastNestedLoopJoin (the O(N·M) fallback Spark picks
    for a bare range predicate)."""
    df = queries()["join_interval_banded"](spark, sf_dir)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan, plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan), plan


def test_corpus_prep_pipeline_plan(spark, sf_dir):
    """Filter before the dedup shuffle; map-side WindowGroupLimit prunes
    to the keeper row pre-exchange; scan reads only (doc_id, text)."""
    df = queries()["corpus_prep_pipeline"](spark, sf_dir)
    plan = formatted_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    assert {c.split(":")[0] for c in m.group(1).split(",")} == {"doc_id", "text"}
    phys = physical_plan(df)
    # Partial (map-side) + Final WindowGroupLimit around the one exchange.
    assert phys.count("WindowGroupLimit") == 2, phys
    # Exactly two exchanges: fingerprint hash + output range sort.
    assert phys.count("Exchange") == 2, phys


def test_decontaminate_broadcasts_eval_set(spark, sf_dir):
    """The eval shingle set must broadcast — the 100 TB corpus side never
    shuffles for the contamination probe."""
    df = queries()["decontaminate_eval_overlap"](spark, sf_dir)
    phys = physical_plan(df)
    assert "BroadcastHashJoin" in phys, phys


def test_doc_token_chunks_zero_shuffle_map(spark, sf_dir):
    """Chunking is a narrow map: the only exchange is the output sort."""
    df = queries()["doc_token_chunks"](spark, sf_dir)
    phys = physical_plan(df)
    assert phys.count("Exchange") == 1, phys


def test_mixture_sample_single_aggregate(spark, sf_dir):
    """Hash-tagged mixing is one map + one aggregate: at most the agg
    exchange plus the output sort, never a shuffle of document text."""
    df = queries()["mixture_weighted_sample"](spark, sf_dir)
    phys = physical_plan(df)
    assert phys.count("Exchange") <= 2, phys
    m = re.search(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))
    assert m and "text" not in m.group(1), "mixing must not read document text"


def test_sequence_pack_no_global_window(spark, sf_dir):
    """Packing's prefix sum is partitioned by source — no single-partition
    global window anywhere in the plan."""
    df = queries()["sequence_pack_budget"](spark, sf_dir)
    phys = physical_plan(df)
    assert "Exchange SinglePartition" not in phys, phys


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """Join-driven partition pruning: a fact table partitioned by lang
    joined to a FILTERED dim on the partition column must plan a
    dynamicpruningexpression — at 100 TB this is what turns 'scan every
    partition then join' into 'scan only the partitions the dim selects'."""
    from gluettalax_spark.sources.io import write_partitioned
    from gluettalax_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars", "lang")
    path = str(tmp_path / "docs_dpp")
    write_partitioned(docs, path, ["lang"])
    fact = spark.read.parquet(path)
    dim = (
        load(spark, sf_dir, "documents")
        .select("lang")
        .distinct()
        .filter("lang IN ('en', 'de')")
    )
    from pyspark.sql import functions as F

    df = fact.join(F.broadcast(dim), "lang").groupBy("lang").count()
    plan = formatted_plan(df)
    assert "dynamicpruning" in plan.lower(), plan


def test_runtime_bloom_filter_join_reduction(spark, sf_dir):
    """With runtime bloom filters on (thresholds floored for the local
    fixture), a selective dim join must inject a bloom probe into the
    fact scan — the row-level companion to partition pruning that cuts
    shuffle volume before the join at 100 TB."""
    from pyspark.sql import functions as F

    from gluettalax_spark.tables import load

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # Force SMJ so the bloom filter (not a broadcast) is the reducer.
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        lineitem = load(spark, sf_dir, "lineitem")
        orders = load(spark, sf_dir, "orders").filter("o_totalprice > 400000").select(
            "o_orderkey"
        )
        df = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = formatted_plan(df)
        assert "bloomfilter" in plan.lower().replace("_", ""), plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_cohort_retention_no_broadcast_of_user_aggregate(spark, sf_dir):
    """The per-user first_seen table grows with the data, so it must never
    be a broadcast build side (round-1 verdict: OOM at 100 TB). The window
    rewrite — min(ts) over (partition by user_id) — needs no join at all."""
    df = queries()["events_cohort_retention"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" not in plan, plan
    assert "Join" not in plan, plan


def test_simhash_pairs_equi_join_on_bands(spark, sf_dir):
    """Candidate generation must be an equi-join on (band_idx, band_val) —
    a 4×2^16 keyspace that widens with the fingerprint — never a nested
    loop or a tiny fixed-bucket join."""
    df = queries()["dedup_simhash_pairs"](spark, sf_dir)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan, plan
    assert (
        "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    ), plan
    assert "band_val" in plan, plan


def test_embedding_neardup_equi_join_on_bucket(spark, sf_dir):
    """Near-dup candidates come from the sign-LSH bucket equi-join — the
    registered query must never plan the triangular all-pairs self-join
    (that form lives in embedding_neardup_exact, fixture-scale only)."""
    df = queries()["embedding_neardup"](spark, sf_dir)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan, plan
    assert "Cartesian" not in plan, plan
    assert "bucket" in plan, plan


def test_dedup_filter_corpus_anti_join(spark, sf_dir):
    """The corpus filter ships only loser doc_ids through a LeftAnti join —
    document text must never appear on the join's build side."""
    df = queries()["dedup_filter_corpus"](spark, sf_dir)
    plan = physical_plan(df)
    assert "LeftAnti" in plan, plan


def test_corpus_dup_report_scan_pruning(spark, sf_dir):
    """The dup-rate report reads only (source, text) — and its one real
    shuffle carries (source, 16-byte hash), never document text."""
    df = queries()["corpus_dup_report"](spark, sf_dir)
    plan = formatted_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and {c.split(":")[0] for c in m.group(1).split(",")} == {"source", "text"}, plan


def test_events_wau_exact_no_range_join(spark, sf_dir):
    """Exact rolling WAU must be the pair-explode plan, not a range join:
    no NestedLoop over raw events, and the only join is the broadcast
    semi against the tiny distinct-day set."""
    df = queries()["events_wau_exact"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Cartesian" not in plan, plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    # exactly one join of any kind — the day semi-join
    assert plan.count("Join") - plan.count("ReusedExchange") <= 2, plan


def test_corpus_span_overlap_window_not_self_join(spark, sf_dir):
    """Docs-per-shingle must come from a window over the shingle key, not
    a groupBy + self-join that recomputes the shingle lineage twice."""
    df = queries()["corpus_span_overlap"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Window" in plan, plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan
    # one doc-table join (per-doc stats → source), nothing joined on the
    # shingle stream itself
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1, plan


def test_stratified_sample_broadcasts_aggregates(spark, sf_dir):
    """Per-language counts and the global cap are aggregate-sized; both
    must broadcast — the corpus side never shuffles for a join."""
    df = queries()["stratified_sample_by_lang"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_lateral_topk_decorrelated(spark, sf_dir):
    """The LATERAL subquery must decorrelate to a hash join + ranking —
    never a nested loop re-running the subquery per outer row."""
    df = queries()["join_lateral_topk"](spark, sf_dir)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan


def test_dau_bitmap_two_shuffles_no_expand(spark, sf_dir):
    """Bitmap exact-distinct must be the two-level aggregate — shuffle on
    (day, bucket) then (day) — with partial map-side bitmap construction
    and no per-id rows in the shuffle."""
    df = queries()["events_dau_bitmap"](spark, sf_dir)
    plan = physical_plan(df)
    assert "bitmap_construct_agg" in plan, plan
    n_shuffles = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n_shuffles <= 3, plan  # 2 agg shuffles + final orderBy range


def _plan_nodes(df):
    """Yield every physical node, descending through AQE wrappers and
    cache boundaries. persist() registers plans in the session-wide
    CacheManager, so in a shared session another query's persisted
    fragment substitutes as InMemoryTableScan — the cached plan still
    executes when materialized, so the sweep must see inside it."""
    root = df._jdf.queryExecution().executedPlan()
    stack = [root]
    while stack:
        node = stack.pop()
        yield node
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            stack.append(node.initialPlan())
            continue
        if name == "InMemoryTableScanExec":
            stack.append(node.relation().cachedPlan())
            continue
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))


_BOUNDED_NODES = {"TakeOrderedAndProjectExec", "GlobalLimitExec", "LocalLimitExec"}

# Aggregate grouping keys whose cardinality does NOT grow with row count:
# _pid (≤ spark.sql.shuffle.partitions, a config constant), calendar
# buckets (bounded by the dataset's time span, not its volume), and the
# 25-row nation dimension. An unpartitioned window over one of these
# aggregates is dashboard-scale; over a per-entity aggregate (custkey,
# user_id, doc_id ...) it is the single-task pattern this file bans.
_BOUNDED_KEY_TOKENS = ("_pid", "day", "month", "week", "year", "hour", "n_name")


def _subtree_is_bounded(window_node) -> bool:
    """True iff the window's input is row-bounded by construction: a limit
    beneath it, or an aggregate grouped only by bounded-domain keys."""
    stack = [window_node]
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        if name in _BOUNDED_NODES:
            return True
        if name == "AdaptiveSparkPlanExec":
            stack.append(node.initialPlan())
            continue
        if name == "InMemoryTableScanExec":
            # Another query's persisted fragment substituted here; the
            # cached plan is what actually bounds (or not) this input.
            stack.append(node.relation().cachedPlan())
            continue
        if "Aggregate" in name:
            line = node.toString().split("\n")[0]
            mk = re.search(r"keys=\[([^\]]*)\]", line)
            mo = re.search(r"output=\[([^\]]*)\]", line)
            if mk:
                keys = [k.strip() for k in mk.group(1).split(",") if k.strip()]
                outs = [o.strip() for o in mo.group(1).split(",")] if mo else []
                # An extracted grouping expression (_groupingexpression#N)
                # surfaces under its real name at the same position of the
                # aggregate's output list — resolve it there.
                resolved = [
                    outs[i] if k.startswith("_groupingexpression") and i < len(outs) else k
                    for i, k in enumerate(keys)
                ]
                if resolved and all(
                    any(k.startswith(tok) for tok in _BOUNDED_KEY_TOKENS) for k in resolved
                ):
                    return True
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return False


def _unbounded_global_windows(df):
    bad = []
    for node in _plan_nodes(df):
        if node.getClass().getSimpleName() != "WindowExec":
            continue
        if node.partitionSpec().isEmpty() and not _subtree_is_bounded(node):
            bad.append(node.toString().split("\n")[0])
    return bad


def _data_path_hash_exchanges(plan: str) -> list[str]:
    """Hash exchanges NOT keyed on _pid — i.e. shuffles of the data
    itself rather than of the ≤shuffle.partitions-row offsets table."""
    return [
        ln.strip()[:120]
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "_pid" not in ln
    ]


def _rank_subtree(spark, sf_dir, order_key):
    """The exact-rank subplan with isolation OFF — rank.py freezes it with
    localCheckpoint in production (pid consistency), which also hides it
    from the caller's physical plan; plan-shape pins inspect the
    un-isolated form."""
    from pyspark.sql import functions as F

    from gluettalax_spark.operators.rank import exact_global_rank
    from gluettalax_spark.tables import load

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    return exact_global_rank(
        cust, [F.col(order_key), F.col("c_custkey")], "_rn", isolate=False
    )


def test_exact_rank_no_single_task_window_and_one_data_shuffle(spark, sf_dir):
    """Round-4 verdict fix, pinned on the rank subtree itself: no
    unpartitioned window over the data (the only global window is the
    pid-counts prefix sum — config-bounded), local position rides
    monotonically_increasing_id after the in-partition sort, and no hash
    exchange ever touches the data — the range exchange is the single
    data shuffle."""
    df = _rank_subtree(spark, sf_dir, "c_acctbal")
    assert _unbounded_global_windows(df) == []
    plan = physical_plan(df)
    assert "monotonically_increasing_id" in plan.lower(), plan
    assert _data_path_hash_exchanges(plan) == []
    assert "Exchange rangepartitioning" in plan, plan


def test_rank_consumers_isolate_the_subplan(spark, sf_dir):
    """Correctness guard for the sf0.1 RFM scramble: every registry query
    built on exact_global_rank must consume the CHECKPOINTED subplan — a
    re-planned second execution of the range exchange (or an optimizer
    dropping the "redundant" local sort under a downstream exchange) would
    silently scramble ranks. The checkpoint shows up as an ExistingRDD
    scan; the rank internals must NOT appear in the caller's plan."""
    for q in ("window_ntile_distribution", "customer_rfm_segments"):
        plan = physical_plan(queries()[q](spark, sf_dir))
        assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, (q, plan)
        assert "monotonically_increasing_id" not in plan.lower(), (q, plan)


def test_rfm_segments_no_single_task_window(spark, sf_dir):
    """All three RFM quartiles derive from the isolated exact ranks; the
    visible plan must contain no unpartitioned data window and no hash
    exchange beyond the base orders aggregate and the pid-offset
    tables."""
    df = queries()["customer_rfm_segments"](spark, sf_dir)
    assert _unbounded_global_windows(df) == []
    plan = physical_plan(df)
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "_pid" in ln or "o_custkey" in ln, ln


def test_pareto_take_ordered_no_full_rank(spark, sf_dir):
    """Top-50 must plan as TakeOrderedAndProject; the only global-order
    window allowed is the one over the 50-row limit output."""
    df = queries()["customer_pareto"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert _unbounded_global_windows(df) == []


@pytest.mark.slow  # whole-registry plan sweep (4+ min): gate tier (make gate)
def test_no_unbounded_global_window_anywhere(spark, sf_dir):
    """Sweep EVERY registered query: an unpartitioned WindowExec whose
    input is not bounded by a limit or a pid-grouped aggregate is the
    single-task pattern the round-4 verdict flagged — keep the registry
    permanently free of it."""
    offenders = {}
    for name, builder in queries().items():
        try:
            df = builder(spark, sf_dir)
        except Exception:  # noqa: BLE001 - plan-only sweep; runtime gates elsewhere
            continue
        bad = _unbounded_global_windows(df)
        if bad:
            offenders[name] = bad
    assert offenders == {}, offenders


def test_outlier_mad_broadcasts_stats(spark, sf_dir):
    """Both MAD re-joins build from group-count-sized aggregates — they
    must broadcast; the event stream never shuffles for a join."""
    df = queries()["events_outlier_mad"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_token_budget_no_source_partitioned_window(spark, sf_dir):
    """Per-source running sums must ride the grouped range-partitioned
    rank path: every data window keys on (_pid, source); a window keyed
    on source alone (single task per source — a source is a crawl at
    100 TB) is banned, except over the metadata-scale offsets aggregate
    (whose window orders by _pid)."""
    df = queries()["token_budget_sample"](spark, sf_dir)
    assert _unbounded_global_windows(df) == []
    plan = physical_plan(df)
    for ln in plan.splitlines():
        if "windowspecdefinition(" in ln and "_pid" not in ln:
            raise AssertionError(f"source-only window: {ln.strip()[:160]}")


def test_source_overlap_no_shingle_self_join(spark, sf_dir):
    """Cross-source overlap must come from ONE groupBy(shingle) with a
    bounded collect_set — never a self-join of the (data-sized) shingle
    table: the only joins allowed are the broadcast per-source counts."""
    df = queries()["source_overlap_matrix"](spark, sf_dir)
    plan = physical_plan(df)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan[:2000]
    assert plan.count("BroadcastHashJoin") == 2, plan[:2000]


def test_export_shards_single_rollup(spark, sf_dir):
    """The shard summary is a projection + one 16-key aggregate — no
    joins, no windows, exactly one data shuffle pair (partial/final
    hash aggregate around one exchange) over the distinct-source rollup."""
    df = queries()["export_training_shards"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "WindowExec" not in plan, plan[:2000]


def test_common_token_ratio_topk_vocab_broadcast(spark, sf_dir):
    """Vocabulary selection must be TakeOrderedAndProject (never a global
    sort of the vocab) and the hit test a broadcast join of the
    constant-size top-K set — the token table itself joins nothing
    bigger."""
    df = queries()["common_token_ratio"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan[:2000]


def test_cms_broadcast_probe_and_take_ordered(spark, sf_dir):
    """The count-min sketch is a constant-size (≤ D×W) table: the probe
    must consume it via BroadcastHashJoin (never a shuffle join), and the
    exact top-10 comparator must be TakeOrderedAndProject, not a global
    sort of the per-user histogram."""
    df = queries()["events_freq_cms"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_decontaminate_bloom_probe_below_verify(spark, sf_dir):
    """The bloom probe must run map-side (ArrowEvalPython below the
    verify join) and the verify join must be a broadcast of the eval
    hashes — the corpus side never shuffles to be joined."""
    df = queries()["decontaminate_bloom"](spark, sf_dir)
    plan = physical_plan(df)
    assert "ArrowEvalPython" in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan[:2000]


def test_basket_rules_take_ordered_no_cartesian(spark, sf_dir):
    """Association rules: pair candidates explode map-side from baskets
    (no all-pairs join over parts), the only nested-loop join is the
    1-row basket-total broadcast, and the top-20 is
    TakeOrderedAndProject — never a global sort of the rule set."""
    df = queries()["basket_rules"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan[:2000]


def test_sql_udf_metrics_stay_in_codegen(spark, sf_dir):
    """SQL UDFs must be INLINED by Catalyst — no Python evaluation node
    of any kind, and the aggregation input stays inside whole-stage
    codegen. (A regression to a Python UDF here silently costs the
    serialization boundary the operator exists to avoid.)"""
    df = queries()["sql_udf_text_metrics"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan[:2000]
    assert "PythonUDF" not in plan, plan[:2000]
    # The function BODY must appear inlined inside the aggregate itself —
    # proof Catalyst substituted the SQL UDF rather than calling anything.
    assert "avg(size(filter(split(lower(" in plan, plan[:2000]


def test_table_profile_single_scan_single_expand(spark, sf_dir):
    """Five-column profile must be ONE scan: the multi-column exact
    distinct plans as a single Expand over one FileScan — not one
    aggregation pass per column."""
    df = queries()["table_profile_orders"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("FileScan parquet") == 1, plan[:2000]
    assert "Expand" in plan, plan[:2000]


def test_sessionize_batch_one_user_exchange_and_take_ordered(spark, sf_dir):
    """The lag window and the running-sum window must share ONE user_id
    hash exchange (same partitioning + ordering), and the top-25 must be
    TakeOrderedAndProject, not a global sort of all sessions."""
    import re

    df = queries()["events_sessionize_batch"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert len(re.findall(r"Exchange hashpartitioning\(user_id", plan)) == 1, plan[:2000]


def test_keep_best_argmax_without_window(spark, sf_dir):
    """The per-cluster keeper is a min(struct) AGGREGATE on the component
    key — a row_number window here would re-sort every cluster's rows;
    the aggregate form partial-aggregates map-side."""
    df = queries()["dedup_keep_best"](spark, sf_dir)
    plan = physical_plan(df)
    # The only windows permitted are those inside the pair-generation
    # lineage (shingle windows partition by doc_id); none on component.
    assert "windowspecdefinition(component" not in plan, plan[:2000]


def test_bm25_plan_prunes_postings_map_side(spark, sf_dir):
    """The query-term filter must sit below the postings aggregation
    (only |Q|-term postings shuffle, never the corpus vocabulary), and
    the top-k must be TakeOrderedAndProject — no global sort."""
    df = queries()["text_bm25_search"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    # The isin() filter on the exploded term appears as a Filter with the
    # four query literals below the postings aggregation — that's the
    # index-lookup pruning (only |Q|-term postings shuffle).
    assert "IN (spark,join,window,fast)" in plan, plan[:2000]


def test_pmi_plan_bounded_output(spark, sf_dir):
    """PMI top-k is TakeOrderedAndProject; bigram generation is a map-side
    explode (no self-join of the token stream)."""
    df = queries()["text_collocations_pmi"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_attribution_single_user_window_no_range_join(spark, sf_dir):
    """Last-touch attribution is ONE user_id window (fill-forward), never
    a per-purchase range join back into raw events."""
    import re

    df = queries()["events_attribution_last_touch"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan[:2000]
    # Exactly one window exchange on user_id feeds both filled columns.
    assert len(re.findall(r"Exchange hashpartitioning\(user_id", plan)) == 1, plan[:2000]


def test_logppl_plan_bounded_and_integer_fold(spark, sf_dir):
    """Worst-k by perplexity is TakeOrderedAndProject; the per-doc fold
    is integer arithmetic over the quantized ln p (no float sum whose
    addend order could diverge across engines)."""
    df = queries()["text_unigram_logppl"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    # The quantized column participates in the document aggregate.
    assert "q_lnp" in plan, plan[:2000]


def test_markov_single_window_single_scan(spark, sf_dir):
    """Transition pairs come from ONE lead window over user_id — never an
    adjacency self-join; totals derive from the k-squared count table so
    the event stream is scanned exactly once."""
    df = queries()["events_markov_transitions"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan[:2000]
    # The totals branch must REUSE the counts aggregation at runtime
    # (ReusedExchange), so the event stream is physically scanned and
    # window-shuffled once even though two consumers read the counts.
    df.collect()
    final = physical_plan(df)
    assert "ReusedExchange" in final, final[:3000]


def test_ols_exact_decimal_moments(spark, sf_dir):
    """OLS moments accumulate as decimal(38,0) (exact, order-free) in one
    partial-aggregated shuffle; one scan of orders."""
    df = queries()["orders_price_trend_ols"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("FileScan parquet") == 1, plan[:2000]
    assert "decimal(38,0)" in plan, plan[:2000]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]


def test_aqe_skew_join_splits_hot_key(spark):
    """100× skew rehearsal (VERDICT r10 task #8): a deliberately skewed
    fact (one hot key holding ~30% of rows, each row carrying a wide
    payload) sort-merge-joined against a second large table must make
    AQE's skew-join splitting FIRE — the executed plan's SortMergeJoin
    carries skew=true — and the skewed join's wall time must stay within
    2× of a same-size UNSKEWED join (the splitting actually levels the
    reducers; without it the hot partition serializes the stage).

    Thresholds are scaled down in-scope (256 KB skew threshold / 64 KB
    advisory target) so the fixture exercises the exact mechanism that
    defaults to 256 MB partitions on a production cluster; broadcast is
    disabled so the join is a real shuffle join on both sides."""
    import time

    from pyspark.sql import functions as F

    n = 300_000
    pad = "x" * 64
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "262144",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)

        def run(skewed: bool) -> tuple[float, str]:
            key = (
                F.when(F.col("id") % 10 < 3, F.lit(0)).otherwise(F.col("id"))
                if skewed
                else F.col("id")
            )
            fact = spark.range(n).select(
                key.alias("k"), F.concat(F.lit(pad), F.col("id")).alias("payload")
            )
            other = spark.range(n).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )
            df = fact.join(other, "k").groupBy((F.col("k") % 16).alias("b")).agg(
                F.count(F.lit(1)).alias("c"),
                F.sum("v").alias("s"),
                # Aggregate the payload so pruning can't drop it before the
                # shuffle — the skew is in BYTES, and the bytes are here.
                F.sum(F.length("payload")).alias("pb"),
            )
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                # collect() executes df's OWN queryExecution (count() would
                # build a separate plan and leave this one unexecuted —
                # executedPlan below must be the final adaptive one).
                df.collect()
                best = min(best, time.perf_counter() - t0)
            # Final ADAPTIVE plan, read after execution — skew=true only
            # appears once AQE has re-planned the materialized stage.
            return best, df._jdf.queryExecution().executedPlan().toString()

        t_skew, plan_skew = run(skewed=True)
        t_flat, _ = run(skewed=False)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    assert "skew=true" in plan_skew, plan_skew[:4000]
    # The leveled skewed join must stay in the same wall-time regime as
    # the unskewed control (best-of-3 each; the bound is 2× per the
    # rehearsal spec, which splitting passes with headroom — without
    # splitting the hot partition carries 30% of all probe rows through
    # one task).
    assert t_skew <= 2.0 * t_flat, (t_skew, t_flat)


R11_NEW_OPS = [
    "events_hazard_rate",
    "stats_autocorrelation",
    "orders_lorenz_curve",
    "stats_levene_bf",
    "text_readability_ari",
    "graph_adamic_adar",
    "orders_interpurchase_gaps",
    "stats_grubbs_test",
    "text_pii_pattern_scan",
    "text_html_tag_residue",
]


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_r11_ops_no_cartesian_or_rowwise_python(spark, sf_dir):
    """Every round-11 operator: no cartesian/nested-loop join anywhere
    except broadcast of a 1-row/constant-size side, and no row-at-a-time
    Python (BatchEvalPython) in the plan — the two instant 100 TB
    disqualifiers."""
    for name in R11_NEW_OPS:
        plan = physical_plan(queries()[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        # BroadcastNestedLoopJoin is legitimate ONLY as a crossJoin of a
        # broadcast scalar/constant-size aggregate (totals, probe sets).
        for frag in plan.split("BroadcastNestedLoopJoin")[1:]:
            assert "BuildRight" in frag[:80] or "BuildLeft" in frag[:80], (name, frag[:200])


def test_pii_scan_prunes_to_source_and_text(spark, sf_dir):
    plan = formatted_plan(queries()["text_pii_pattern_scan"](spark, sf_dir))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"source", "text"}, cols


def test_acf_lag_join_is_broadcast(spark, sf_dir):
    """The 7-lag self-join of the calendar grid must broadcast the lag
    dimension — a shuffled join of a 7-row table would be silly at any
    scale."""
    plan = physical_plan(queries()["stats_autocorrelation"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_adamic_adar_is_wedge_explode_not_self_join(spark, sf_dir):
    """Candidate pairs must come from the per-center array explode
    (Generate in the plan), with the non-edge filter as a left-anti
    join — the same shape the Jaccard rung pins."""
    plan = physical_plan(queries()["graph_adamic_adar"](spark, sf_dir))
    assert "Generate explode" in plan or "Generate" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_lorenz_has_no_data_scale_window(spark, sf_dir):
    """The customer sort rides the range-exchange rank machinery; the
    only window in the plan must sit above a pid-grouped aggregate or
    the 10-row decile table, never over the customer table itself."""
    df = queries()["orders_lorenz_curve"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # The decile table is frozen with localCheckpoint (the plan reads
    # Scan ExistingRDD); the cumulative sum rides grouped_running_sum,
    # so every window is pid-keyed — the repo-wide audit must hold here.
    assert "Scan ExistingRDD" in plan, plan
    assert _unbounded_global_windows(df) == [], plan


def test_no_deserialized_lineage_cuts():
    """Repo-wide source audit: every localCheckpoint must pass
    storageLevel=CKPT_LEVEL (serialized, evictable to disk). PySpark's
    default level stores deserialized row OBJECTS — at the 100x
    rehearsal scale that is what OOM'd the 8 GiB heap twice (HITS edge
    cache in r11, the 27M-pair CC sym table in r12; see
    gluettalax_spark/memory.py). New call sites must opt in to the
    policy explicitly so the footprint stays row-object-free."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "gluettalax_spark"
    offenders = []
    for f in root.rglob("*.py"):
        src = f.read_text()
        for i, line in enumerate(src.splitlines(), 1):
            if ".localCheckpoint(" in line and "CKPT_LEVEL" not in line:
                # multi-line call: the level must appear between the
                # call's open paren and the next closing paren
                tail = "\n".join(src.splitlines()[i - 1 : i + 3])
                args = tail.split(".localCheckpoint(", 1)[1]
                if "CKPT_LEVEL" not in args.split(")")[0]:
                    offenders.append(f"{f.name}:{i}")
    assert offenders == [], offenders
