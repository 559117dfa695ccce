"""Structured Streaming smoke tests: drive the readStream variants to
completion against the static fixture via the memory sink, and check
consistency with the batch equivalents (the oracle-checked truth).
"""

from __future__ import annotations

import pytest

# Streaming twins take 5-45 s per query drain: gate tier (make gate).
pytestmark = pytest.mark.slow

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


def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    from gluettalax_spark.streaming.joins import streaming_dedup_within_watermark

    stream_df = streaming_dedup_within_watermark(spark, sf_dir)
    assert stream_df.isStreaming
    result = run_stream_to_memory(spark, stream_df, "dedup_wwm_smoke")
    from gluettalax_spark.tables import load

    n_distinct = load(spark, sf_dir, "events").select("event_id").distinct().count()
    assert result.count() == n_distinct

    # Semantic difference from dropDuplicates: a re-delivery with a
    # DIFFERENT event time (same id, 10 min later — inside the 1 h delay)
    # must still dedupe to one row.
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    src = str(tmp_path / "redeliver_in")
    spark.createDataFrame(
        [(1, base), (1, base + dt.timedelta(minutes=10)), (2, base)],
        "event_id long, ts timestamp",
    ).coalesce(1).write.parquet(src)
    dedup = (
        spark.readStream.schema("event_id long, ts timestamp")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    out = run_stream_to_memory(spark, dedup, "dedup_wwm_redeliver")
    assert out.count() == 2, "re-delivered id with shifted ts must dedupe"


def test_watermark_survives_restart_and_drops_late_rows(spark, tmp_path):
    """Two availableNow runs over one checkpoint: run 1 ingests a batch
    and closes windows; run 2 ingests a file containing one event LATE
    beyond the recovered watermark plus fresh on-time events. The closed
    window's count must not change (late row dropped, no re-emission) —
    i.e. the watermark persisted across the restart via the checkpoint.
    """
    import datetime as dt

    src = str(tmp_path / "stream_in")
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def mk(rows):
        return spark.createDataFrame(rows, "ts timestamp, user_id long")

    # file 1: one event per minute 10:00..12:00 inclusive.
    mk([(base + dt.timedelta(minutes=m), 1) for m in range(121)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema("ts timestamp, user_id long")
            .parquet(src)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("w_start"), "n")
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = {r.w_start: r.n for r in spark.read.parquet(out).collect()}
    w0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    # Watermark after run 1 = 12:00 − 1h = 11:00 ⇒ windows through 10:50 closed.
    assert first.get(w0) == 10, first

    # file 2: ONE late event into the already-closed 10:00 window, plus
    # fresh events 12:01..13:30 that advance the watermark to 12:30.
    mk(
        [(base + dt.timedelta(minutes=5), 99)]
        + [(base + dt.timedelta(minutes=121 + m), 1) for m in range(90)]
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()

    final = {}
    for r in spark.read.parquet(out).collect():
        assert not (r.w_start in final and r.w_start == w0), "closed window re-emitted"
        final.setdefault(r.w_start, 0)
        final[r.w_start] += r.n
    # The late row was dropped: the 10:00 window still counts 10.
    assert final[w0] == 10
    # And run 2 did close new windows (11:00..12:20 starts).
    assert dt.datetime(2024, 1, 1, 11, 30, 0) in final
    assert len(final) > len(first)


def test_stream_stream_conversion_join(spark, sf_dir):
    """The watermarked stream-stream inner join must produce exactly the
    pairs the registered batch twin finds."""
    from gluettalax_spark.registry import queries
    from gluettalax_spark.streaming.joins import streaming_conversion_join
    from gluettalax_spark.streaming.windows import run_stream_to_memory

    df = streaming_conversion_join(spark, sf_dir)
    assert df.isStreaming
    got = run_stream_to_memory(spark, df, "ss_conv", output_mode="append")
    got_pairs = {(r.view_id, r.purchase_id, r.user_id, r.delta_ms) for r in got.collect()}
    truth = {
        (r.view_id, r.purchase_id, r.user_id, r.delta_ms)
        for r in queries()["events_conversion_pairs"](spark, sf_dir).collect()
    }
    assert got_pairs == truth
    assert len(got_pairs) > 0


def test_stream_stream_outer_join_flushes_unmatched(spark, sf_dir, tmp_path):
    """LEFT OUTER stream-stream join: once far-future sentinels push both
    watermarks past every view's horizon, each unconverted view must have
    emitted exactly one NULL-purchase row; matched pairs equal the inner
    truth."""
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from gluettalax_spark.registry import queries
    from gluettalax_spark.streaming.joins import streaming_conversion_join_outer
    from gluettalax_spark.tables import load

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select("event_id", "user_id", "event_type", "ts")
        .orderBy("ts")
        .toPandas()
    )
    ev["ts"] = pd.to_datetime(ev["ts"])
    src = tmp_path / "src"
    src.mkdir()
    n = len(ev)
    paths = []
    for i, (lo, hi) in enumerate([(0, n // 2), (n // 2, n)]):
        p = src / f"part-{i}.parquet"
        pq.write_table(
            pa.Table.from_pandas(ev.iloc[lo:hi], preserve_index=False),
            p, coerce_timestamps="us", allow_truncated_timestamps=True,
        )
        paths.append(p)
    far = ev["ts"].max() + pd.Timedelta(hours=13)
    sentinel = pd.DataFrame(
        {
            "event_id": [-1, -2],
            "user_id": [-1, -1],
            "event_type": ["view", "purchase"],
            "ts": [far, far],
        }
    )
    p = src / "part-9-sentinel.parquet"
    pq.write_table(
        pa.Table.from_pandas(sentinel, preserve_index=False),
        p, coerce_timestamps="us", allow_truncated_timestamps=True,
    )
    paths.append(p)
    for i, path in enumerate(paths):
        os.utime(path, (1_700_000_000 + i * 10,) * 2)

    df = streaming_conversion_join_outer(spark, str(src))
    assert df.isStreaming
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_outer")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    inner_truth = {
        (r.view_id, r.purchase_id)
        for r in queries()["events_conversion_pairs"](spark, sf_dir).collect()
    }
    n_views = int((ev["event_type"] == "view").sum())
    matched_views = len({v for v, _ in inner_truth})
    want_null_rows = n_views - matched_views
    try:
        deadline = time.time() + 90
        nulls = 0
        while time.time() < deadline:
            nulls = (
                spark.sql(
                    "SELECT count(*) AS n FROM ss_outer "
                    "WHERE purchase_id IS NULL AND user_id >= 0"
                ).collect()[0].n
            )
            if nulls >= want_null_rows:
                break
            time.sleep(1)
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM ss_outer WHERE user_id >= 0").collect()
    got_pairs = {(r.view_id, r.purchase_id) for r in rows if r.purchase_id is not None}
    got_null_views = {r.view_id for r in rows if r.purchase_id is None}
    assert got_pairs == inner_truth
    assert len(got_null_views) == want_null_rows, (len(got_null_views), want_null_rows)
    # No view both matched AND null-emitted... except views whose ONLY
    # purchases were outside the horizon: matched and null sets must be
    # disjoint by the join semantics.
    assert not (got_null_views & {v for v, _ in got_pairs})


def test_state_store_inspection_and_reconciliation(spark, sf_dir, tmp_path):
    """Run a keyed streaming aggregation to a checkpoint, then read the
    state back with the Spark 4 statestore source and reconcile it
    against a batch recompute — every key must be 'ok'."""
    from gluettalax_spark.streaming.state_inspect import (
        read_state_metadata,
        read_state_store,
        state_reconciliation_audit,
    )
    import datetime as dt

    ck = str(tmp_path / "ckpt")
    src = str(tmp_path / "in")
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    df = spark.createDataFrame(
        [(i % 7, base + dt.timedelta(minutes=i)) for i in range(100)],
        "user_id long, ts timestamp",
    )
    df.coalesce(1).write.parquet(src)
    q = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("sst_audit")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    meta = read_state_metadata(spark, ck)
    ops = {r.operatorName for r in meta.collect()}
    assert "stateStoreSave" in ops

    state = read_state_store(spark, ck)
    assert state.count() == 7  # one state row per distinct key

    truth = df.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    audit = state_reconciliation_audit(spark, ck, truth, "user_id", "n")
    rows = audit.collect()
    assert len(rows) == 7 and all(r.status == "ok" for r in rows), rows


def test_streaming_reads_nanos_parquet_after_conf_restore(spark, tmp_path):
    """Round-4 advice pin: the batch footer read scopes the legacy
    nanosAsLong conf (restored immediately), and the stream source's
    explicit .schema() must make every MICROBATCH read of a genuine
    TIMESTAMP(NANOS) parquet succeed with the conf off — including
    correct ns → µs truncation in the shared normalizer."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gluettalax_spark.streaming.windows import read_events_stream, run_stream_to_memory

    n = 100
    base_ns = 1_700_000_000_000_000_000
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(np.arange(n) % 7, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(np.linspace(0.0, 9.0, n)),
            # +500 ns offset: sub-µs precision that truncation must drop.
            "ts": pa.array(
                (base_ns + np.arange(n) * 1_000_000_000 + 500).astype("datetime64[ns]")
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    # Physical layout really is ns-as-long under the legacy read.
    assert str(pq.read_schema(str(tmp_path / "events.parquet")).field("ts").type) == "timestamp[ns]"

    stream = read_events_stream(spark, str(tmp_path))
    # The conf must already be restored at stream-construction time...
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("max_ts")
    )
    out = run_stream_to_memory(spark, agg, "nanos_restore_smoke", output_mode="complete")
    rows = {r.user_id: (r.n_events, r.max_ts) for r in out.collect()}
    assert sum(v[0] for v in rows.values()) == n
    import datetime

    # user 6's last event: id 97 → epoch + 97 s, µs-truncated (the 500 ns gone).
    assert rows[6][1] == datetime.datetime.utcfromtimestamp(1_700_000_097)


def test_streaming_incremental_dedup_matches_batch(spark, sf_dir):
    """The stream-static anti-join must emit exactly the batch twin's
    surviving documents (micro-batching cannot change an anti-join
    against a static index)."""
    from gluettalax_spark.registry import queries
    from gluettalax_spark.streaming.joins import streaming_incremental_dedup

    stream_df = streaming_incremental_dedup(spark, sf_dir)
    assert stream_df.isStreaming
    got = run_stream_to_memory(spark, stream_df, "incr_dedup_smoke")
    want = queries()["corpus_incremental_dedup"](spark, sf_dir)
    g = {(r["doc_id"], r["fingerprint"]) for r in got.collect()}
    w = {(r["doc_id"], r["fingerprint"]) for r in want.collect()}
    assert g == w and len(g) > 0
