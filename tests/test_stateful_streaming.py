"""Stateful streaming smoke: applyInPandasWithState running totals match
the batch ground truth; foreachBatch lands parquet per micro-batch."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gluettalax_spark.streaming.stateful import (
    run_foreach_batch_to_parquet,
    streaming_user_running_totals,
)
from gluettalax_spark.streaming.windows import run_stream_to_memory
from gluettalax_spark.tables import load


def test_running_totals_match_batch(spark, sf_dir):
    stream_df = streaming_user_running_totals(spark, sf_dir)
    assert stream_df.isStreaming
    result = run_stream_to_memory(spark, stream_df, "state_smoke", output_mode="update")
    # Update mode: take the LAST emission per user (final state).
    final = {r.user_id: (r.n_events, r.total_value) for r in result.collect()}
    truth = {
        r.user_id: (r.n, r.t)
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("t"))
        .collect()
    }
    assert final == truth


def test_foreach_batch_sink(spark, sf_dir, tmp_path):
    out = str(tmp_path / "fb")
    n_batches = run_foreach_batch_to_parquet(spark, sf_dir, out)
    assert n_batches >= 1
    back = spark.read.parquet(f"{out}/batch={n_batches - 1}")
    truth = load(spark, sf_dir, "events").groupBy("event_type").count()
    assert back.count() == truth.count()


def test_stream_upsert_snapshot(spark, sf_dir, tmp_path):
    """foreachBatch + upsert_partitioned = streaming CDC snapshot: after
    the stream drains, the table holds exactly latest-per-user."""
    import uuid as _uuid

    from gluettalax_spark.streaming.stateful import run_stream_upsert_to_table

    db = f"snap_{_uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE `{db}` LOCATION '{tmp_path / db}'")
    try:
        empty = spark.createDataFrame(
            [], "user_id long, last_event_type string, last_value double, bucket string"
        )
        empty.write.partitionBy("bucket").saveAsTable(f"`{db}`.user_snapshot")
        n = run_stream_upsert_to_table(
            spark, sf_dir, f"`{db}`.user_snapshot", str(tmp_path / "ckpt")
        )
        assert n >= 1
        snap = spark.table(f"`{db}`.user_snapshot")
        events = load(spark, sf_dir, "events")
        assert snap.count() == events.select("user_id").distinct().count()
        # Spot-check: the stored row per user is the event with max ts.
        w_truth = {
            r.user_id: r.last_event_type
            for r in events.withColumn(
                "rn",
                F.row_number().over(
                    Window
                    .partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
                ),
            ).filter("rn = 1").select("user_id", F.col("event_type").alias("last_event_type")).collect()
        }
        got = {r.user_id: r.last_event_type for r in snap.collect()}
        assert got == w_truth
    finally:
        spark.sql(f"DROP DATABASE `{db}` CASCADE")


def test_sessionize_timeout_closes_state(spark, sf_dir, tmp_path):
    """ProcessingTimeTimeout: after the file source drains, an extra empty
    micro-batch fires the per-user timeouts — every open session must be
    closed by eviction, with totals matching the batch truth."""
    import time

    from gluettalax_spark.streaming.stateful import streaming_sessionize_with_timeout

    df = streaming_sessionize_with_timeout(spark, sf_dir)
    assert df.isStreaming
    q = (
        df.writeStream.outputMode("update")
        .format("memory")
        .queryName("sess_timeout")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        closed = 0
        while time.time() < deadline:
            closed = (
                spark.sql("SELECT count(*) AS n FROM sess_timeout WHERE closed_by = 'timeout'")
                .collect()[0]
                .n
            )
            if closed > 0:
                break
            time.sleep(1)
    finally:
        q.stop()
    truth = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert closed == truth, f"expected all {truth} sessions timeout-closed, got {closed}"
    # Totals at close match the batch ground truth.
    final = {
        r.user_id: (r.n_events, r.session_value)
        for r in spark.sql("SELECT * FROM sess_timeout WHERE closed_by = 'timeout'").collect()
    }
    expect = {
        r.user_id: (r.n, r.t)
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("t"))
        .collect()
    }
    assert final == expect
