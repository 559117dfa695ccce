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
