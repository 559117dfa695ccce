"""Structured Streaming smoke tests: drive the readStream variants to
completion against the static fixture via the memory sink, and check
consistency with the batch equivalents (the oracle-checked truth).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gluettalax_spark.streaming.windows import (
    run_stream_to_memory,
    streaming_session_counts,
    streaming_tumbling_counts,
)


def test_streaming_tumbling_matches_batch_prefix(spark, sf_dir):
    stream_df = streaming_tumbling_counts(spark, sf_dir)
    assert stream_df.isStreaming
    result = run_stream_to_memory(spark, stream_df, "tumbling_smoke")
    # Append mode: only watermark-closed windows emit. Everything emitted
    # must agree with the batch computation.
    from gluettalax_spark.tables import load

    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    emitted = {tuple(r) for r in result.select("window.start", "event_type", "n_events").collect()}
    truth = {tuple(r) for r in batch.select("window.start", "event_type", "n_events").collect()}
    assert emitted, "no windows closed — watermark never advanced"
    assert emitted <= truth, "streaming emitted a window that disagrees with batch"
    # The only windows allowed to be missing are within the watermark
    # horizon (1h) of the max event time.
    max_ts = load(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    missing = truth - emitted
    for (start, _etype, _n) in missing:
        assert (max_ts - start).total_seconds() <= 2 * 3600, (
            f"window {start} should have been closed by the watermark"
        )


def test_streaming_session_counts_runs(spark, sf_dir):
    stream_df = streaming_session_counts(spark, sf_dir)
    assert stream_df.isStreaming
    result = run_stream_to_memory(spark, stream_df, "session_smoke")
    rows = result.collect()
    # Sessions exist and have sane shapes.
    assert all(r["n_events"] >= 1 for r in rows)


def test_stream_static_join_enrichment(spark, sf_dir):
    from gluettalax_spark.streaming.joins import streaming_enriched_events, user_tier_dim

    stream_df = streaming_enriched_events(spark, sf_dir)
    assert stream_df.isStreaming
    result = run_stream_to_memory(spark, stream_df, "enrich_smoke")
    from gluettalax_spark.tables import load

    events = load(spark, sf_dir, "events")
    assert result.count() == events.count(), "enrichment must be 1:1 (left join on unique dim key)"
    # Every emitted tier agrees with the static dim.
    dim = {r.user_id: r.tier for r in user_tier_dim(spark, sf_dir).collect()}
    sample = result.limit(200).collect()
    assert sample and all(r.tier == dim.get(r.user_id, "bronze") for r in sample)


def test_streaming_dedup_events(spark, sf_dir):
    from gluettalax_spark.streaming.joins import streaming_dedup_events

    stream_df = streaming_dedup_events(spark, sf_dir)
    assert stream_df.isStreaming
    result = run_stream_to_memory(spark, stream_df, "dedup_smoke")
    from gluettalax_spark.tables import load

    n_distinct = load(spark, sf_dir, "events").select("event_id").distinct().count()
    assert result.count() == n_distinct
    assert result.select("event_id").distinct().count() == n_distinct
