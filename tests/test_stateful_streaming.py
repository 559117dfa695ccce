"""Stateful streaming smoke: applyInPandasWithState running totals match
the batch ground truth; foreachBatch lands parquet per micro-batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# Stateful streaming drains take 8-47 s each: gate tier (make gate).
pytestmark = pytest.mark.slow
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


def _protobuf_available() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def test_tws_gate_without_protobuf(spark, sf_dir):
    """Without protobuf the v2 builder must fail fast with a clear error,
    not crash the streaming driver worker at query init."""
    import pytest

    from gluettalax_spark.streaming.stateful import streaming_user_profile_tws

    if _protobuf_available():
        pytest.skip("protobuf present - gate not exercised")
    with pytest.raises(NotImplementedError, match="protobuf"):
        streaming_user_profile_tws(spark, sf_dir)


def test_user_profile_matches_batch(spark, sf_dir):
    """User-profile stateful operator (v2 transformWithStateInPandas when
    protobuf is present, the applyInPandasWithState twin otherwise): the
    final per-user emission must equal the batch ground truth for count,
    total, and distinct types — identical output either way, so this
    runs (never skips) in both environments."""
    from gluettalax_spark.streaming.stateful import streaming_user_profile

    stream_df = streaming_user_profile(spark, sf_dir)
    assert stream_df.isStreaming
    result = run_stream_to_memory(spark, stream_df, "tws_smoke", output_mode="update")
    final = {
        r.user_id: (r.n_events, r.total_value, r.n_event_types) for r in result.collect()
    }
    truth = {
        r.user_id: (r.n, r.t, r.k)
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("t"),
            F.countDistinct("event_type").alias("k"),
        )
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


def test_event_time_timeout_sessionize(spark, sf_dir, tmp_path):
    """EventTimeTimeout: sessions close when the WATERMARK passes last
    event + gap. The gap exceeds the fixture's whole time span, so nothing
    closes until a far-future sentinel file advances the watermark — then
    every session must close exactly once, with batch-truth totals."""
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gluettalax_spark.streaming.stateful import streaming_sessionize_event_time

    events = load(spark, sf_dir, "events").select("user_id", "value", "ts")
    pdf = events.orderBy("ts").toPandas()
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    span_ms = int((pdf["ts"].max() - pdf["ts"].min()).total_seconds() * 1000)
    gap_ms = span_ms + 60_000

    src = tmp_path / "src"
    src.mkdir()
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    paths = []
    for i in range(3):
        p = src / f"part-{i}.parquet"
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[cuts[i] : cuts[i + 1]], preserve_index=False),
            p,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        paths.append(p)
    sentinel = pd.DataFrame(
        {
            "user_id": [-1],
            "value": [0.0],
            "ts": [pdf["ts"].max() + pd.Timedelta(milliseconds=gap_ms) + pd.Timedelta(hours=2)],
        }
    )
    p = src / "part-9-sentinel.parquet"
    pq.write_table(
        pa.Table.from_pandas(sentinel, preserve_index=False),
        p,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    paths.append(p)
    # The file source orders by modification time; pin it so the time-split
    # chunks arrive in order and the watermark advances monotonically.
    for i, path in enumerate(paths):
        os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    df = streaming_sessionize_event_time(spark, str(src), gap_ms=gap_ms)
    assert df.isStreaming
    q = (
        df.writeStream.outputMode("update")
        .format("memory")
        .queryName("sess_evt_timeout")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    truth_users = int(pdf["user_id"].nunique())
    try:
        deadline = time.time() + 90
        closed = 0
        while time.time() < deadline:
            closed = (
                spark.sql(
                    "SELECT count(*) AS n FROM sess_evt_timeout WHERE closed_by = 'watermark'"
                )
                .collect()[0]
                .n
            )
            if closed >= truth_users:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert closed == truth_users, f"expected {truth_users} watermark-closed sessions, got {closed}"
    final = {
        (r.user_id): (r.n_events, r.session_value)
        for r in spark.sql(
            "SELECT * FROM sess_evt_timeout WHERE closed_by = 'watermark'"
        ).collect()
    }
    g = pdf.groupby("user_id")["value"]
    expect = {
        int(u): (int(c), round(float(s), 2))
        for u, c, s in zip(g.count().index, g.count().values, g.sum().values)
    }
    assert set(final) == set(expect)
    for u, (n_ev, tot) in expect.items():
        assert final[u][0] == n_ev
        # Per-micro-batch accumulation reassociates the float sum; allow ulp
        # drift across the round(…, 2) boundary.
        assert abs(final[u][1] - tot) < 0.02, (u, final[u], (n_ev, tot))


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


def test_streaming_heavy_hitters_mg_guarantees(spark, sf_dir):
    """Misra-Gries invariants vs the exact batch truth: never overcount,
    undercount bounded by n/(capacity+1), and every user above that bound
    is present in the final summary. Also pins the state really is
    bounded: ≤ capacity rows per event_type in every emission."""
    from collections import defaultdict

    from gluettalax_spark.streaming.stateful import HH_CAPACITY, streaming_heavy_hitters

    stream_df = streaming_heavy_hitters(spark, sf_dir)
    assert stream_df.isStreaming
    rows = run_stream_to_memory(spark, stream_df, "hh_smoke", output_mode="update").collect()
    assert rows

    # Final summary per event_type = the emission with the largest n_seen.
    latest_n = defaultdict(int)
    for r in rows:
        latest_n[r.event_type] = max(latest_n[r.event_type], r.n_seen)
    final = defaultdict(dict)
    for r in rows:
        if r.n_seen == latest_n[r.event_type]:
            final[r.event_type][r.user_id] = r.est

    truth = defaultdict(dict)
    totals = defaultdict(int)
    for r in (
        load(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ):
        truth[r.event_type][r.user_id] = r.n
        totals[r.event_type] += r.n

    assert set(final) == set(truth)
    for et, summ in final.items():
        assert len(summ) <= HH_CAPACITY
        assert latest_n[et] == totals[et]  # every event was counted
        bound = totals[et] / (HH_CAPACITY + 1)
        for uid, est in summ.items():
            true = truth[et][uid]
            assert est <= true, (et, uid, est, true)
            assert true - est <= bound + 1e-9, (et, uid, est, true, bound)
        for uid, true in truth[et].items():
            if true > bound:
                assert uid in summ, (et, uid, true, bound)


def test_streaming_user_ewma_equals_batch_exact(spark, sf_dir):
    """The streaming trailing-N EWMA must land on the batch operator's
    exact integers for EVERY user once the stream drains: the trailing-N
    buffer is a mergeable summary, so micro-batch boundaries cannot
    change the answer. Also pins bounded state (n_used <= N) and that the
    reported double is the exact small-integer division."""
    import math
    from collections import defaultdict

    import pandas as pd

    from gluettalax_spark.operators.windows import EWMA_N, EWMA_Q
    from gluettalax_spark.streaming.stateful import streaming_user_ewma

    stream_df = streaming_user_ewma(spark, sf_dir)
    assert stream_df.isStreaming
    rows = run_stream_to_memory(spark, stream_df, "ewma_smoke", output_mode="update").collect()
    assert rows

    latest = {}
    for r in rows:
        assert r.n_used <= EWMA_N
        assert r.ewma == r.ewma_micro / EWMA_Q
        if r.user_id not in latest or r.n_seen > latest[r.user_id].n_seen:
            latest[r.user_id] = r

    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "value"])
    truth = {}
    counts = defaultdict(int)
    for uid, grp in ev.groupby("user_id"):
        counts[uid] = len(grp)
        g = grp.sort_values(["ts", "event_id"], ascending=[False, False]).head(EWMA_N)
        vals = [math.floor(v * EWMA_Q) for v in g["value"]][::-1]
        num = vals[0] + sum(v << (i - 2) for i, v in enumerate(vals[1:], start=2))
        truth[uid] = (len(vals), num // (1 << (len(vals) - 1)))

    assert set(latest) == set(truth)
    for uid, r in latest.items():
        assert r.n_seen == counts[uid], uid  # every event reached the fold
        assert (r.n_used, r.ewma_micro) == truth[uid], uid


def test_streaming_drift_psi_matches_batch_recompute(spark, sf_dir):
    """Each day's FINAL emission must equal the PSI computed from that
    day's full counts against the frozen first-half reference — same
    smoothing and quantization as the batch events_drift_psi."""
    import math
    from collections import Counter, defaultdict

    import pandas as pd

    from gluettalax_spark.streaming.stateful import streaming_drift_psi

    stream_df = streaming_drift_psi(spark, sf_dir)
    assert stream_df.isStreaming
    rows = run_stream_to_memory(spark, stream_df, "psi_smoke", output_mode="update").collect()
    assert rows
    latest = {}
    for r in rows:
        if r.day not in latest or r.n_events > latest[r.day].n_events:
            latest[r.day] = r

    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    us = ev["ts"].astype("int64") // 1000
    mid = (int(us.min()) + int(us.max())) // 2
    ref = Counter(ev.loc[us <= mid, "event_type"])
    n_ref = sum(ref.values())
    per_day = defaultdict(Counter)
    for day, et in zip(ev["ts"].dt.strftime("%Y-%m-%d"), ev["event_type"]):
        per_day[day][et] += 1

    assert set(latest) == set(per_day)
    for day, cur in per_day.items():
        cats = sorted(set(ref) | set(cur))
        k = len(cats)
        n_cur = sum(cur.values())
        psi = 0
        for et in cats:
            p = (ref.get(et, 0) + 1) / (n_ref + k)
            q = (cur.get(et, 0) + 1) / (n_cur + k)
            psi += math.floor((p - q) * math.log(p / q) * 100_000_000)
        assert (latest[day].n_events, latest[day].psi_e8) == (n_cur, psi), day


def test_streaming_cusum_final_equals_batch(spark, sf_dir):
    """Each type's FINAL emission (the one carrying the full total) must
    equal the batch events_changepoint_cusum row exactly — same frozen
    global day span, same scaled-integer statistic, same tie-break."""
    from gluettalax_spark.registry import queries
    from gluettalax_spark.streaming.stateful import streaming_changepoint_cusum

    stream_df = streaming_changepoint_cusum(spark, sf_dir)
    assert stream_df.isStreaming
    rows = run_stream_to_memory(spark, stream_df, "cusum_smoke", output_mode="update").collect()
    assert rows
    latest = {}
    for r in rows:
        if r.event_type not in latest or r.total > latest[r.event_type].total:
            latest[r.event_type] = r

    batch = {
        r["event_type"]: r
        for r in queries()["events_changepoint_cusum"](spark, sf_dir).collect()
    }
    assert set(latest) == set(batch)
    for et, b in batch.items():
        s = latest[et]
        assert (s.n_days, s.total, s.cp_day, s.s_peak) == (
            b["n_days"], b["total"], b["cp_day"], b["s_peak"]
        ), et


def test_streaming_rolling_zscore_equals_batch_exact(spark, sf_dir):
    """Once the stream drains (event-time-ordered availableNow drive, so
    n_late must be 0), the per-type sums of the final per-key counters
    must equal the batch events_rolling_zscore's n_scored/n_anomalies —
    the same integer cross-multiplied decision, replayed incrementally
    with bounded state."""
    from collections import defaultdict

    from gluettalax_spark.registry import queries
    from gluettalax_spark.streaming.stateful import streaming_rolling_zscore

    stream_df = streaming_rolling_zscore(spark, sf_dir)
    assert stream_df.isStreaming
    rows = run_stream_to_memory(spark, stream_df, "zscore_smoke", output_mode="update").collect()
    assert rows

    latest = {}
    for r in rows:
        key = (r.user_id, r.event_type)
        if key not in latest or r.n_seen > latest[key].n_seen:
            latest[key] = r

    scored = defaultdict(int)
    anomalies = defaultdict(int)
    for r in latest.values():
        assert r.n_late == 0, r  # ordered drive → nothing uncounted
        scored[r.event_type] += r.n_scored
        anomalies[r.event_type] += r.n_anomalies

    batch = {r.event_type: r for r in queries()["events_rolling_zscore"](spark, sf_dir).collect()}
    assert set(scored) <= set(batch)
    for et, b in batch.items():
        assert scored.get(et, 0) == b.n_scored, et
        assert anomalies.get(et, 0) == b.n_anomalies, et


def test_streaming_rolling_zscore_sidelines_late_rows(spark, sf_dir):
    """An arrival older than the buffer's newest point cannot be scored
    against its true trailing window — it must land in n_late, never in
    the scored/anomaly counters (the documented late-data semantics)."""
    import pandas as pd

    from gluettalax_spark.streaming.stateful import _make_rolling_zscore_fn

    class FakeState:
        exists = False

        def update(self, v):
            self.exists, self.get = True, v

    fn = _make_rolling_zscore_fn(16, 3)
    state = FakeState()
    ts = pd.to_datetime(
        ["2024-01-01 00:00:05", "2024-01-01 00:00:06", "2024-01-01 00:00:07",
         "2024-01-01 00:00:08", "2024-01-01 00:00:09"]
    )
    first = pd.DataFrame({"ts": ts, "event_id": [1, 2, 3, 4, 5], "value": [1.0] * 5})
    out1 = list(fn((7, "click"), [first], state))[0]
    assert out1["n_seen"].iloc[0] == 5 and out1["n_late"].iloc[0] == 0

    late = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 00:00:01"]), "event_id": [0], "value": [99.0]}
    )
    out2 = list(fn((7, "click"), [late], state))[0]
    assert out2["n_late"].iloc[0] == 1
    assert out2["n_scored"].iloc[0] == out1["n_scored"].iloc[0]  # not scored


def test_streaming_anova_final_equals_batch(spark, sf_dir):
    """The final per-type emissions must recombine into the batch
    `stats_anova_oneway` row bit-for-bit: same integer moments, same
    floor-quantized between-group sum, same F."""
    from gluettalax_spark.registry import queries
    from gluettalax_spark.streaming.stateful import streaming_anova_moments

    stream_df = streaming_anova_moments(spark, sf_dir)
    assert stream_df.isStreaming
    result = run_stream_to_memory(spark, stream_df, "anova_twin", output_mode="update")
    # update mode re-emits per micro-batch: the LAST emission per type is
    # final state (rows arrive in batch order; collect preserves it).
    final = {}
    for r in result.collect():
        final[r.event_type] = (r.n_g, r.s_g, int(r.q_g), r.ssbq_g)
    batch = queries()["stats_anova_oneway"](spark, sf_dir).collect()[0]
    assert batch["k"] == len(final)
    assert batch["n"] == sum(v[0] for v in final.values())
    assert batch["s"] == sum(v[1] for v in final.values())
    assert batch["q"] == sum(v[2] for v in final.values())
    assert batch["ssbq"] == sum(v[3] for v in final.values())
    k, n = batch["k"], batch["n"]
    ssb = float(batch["ssbq"]) - float(batch["s"]) * batch["s"] / n
    ssw = float(batch["q"]) - batch["ssbq"]
    assert batch["f_stat"] == (ssb / (k - 1)) / (ssw / (n - k))


def test_streaming_markov_final_equals_batch(spark, sf_dir):
    """Summing each user's FINAL transition-count emission over users
    must reproduce the batch `events_markov_transitions` matrix exactly
    (counts and totals; the batch op's p is n/n_from over those)."""
    from gluettalax_spark.registry import queries
    from gluettalax_spark.streaming.stateful import streaming_markov_transitions

    stream_df = streaming_markov_transitions(spark, sf_dir)
    assert stream_df.isStreaming
    result = run_stream_to_memory(spark, stream_df, "markov_twin", output_mode="update")
    # update mode re-emits per micro-batch: the LAST emission per
    # (user, from, to) is the final count for that user.
    final = {}
    for r in result.collect():
        final[(r.user_id, r.from_type, r.to_type)] = r.n
    combined = {}
    for (_, f, t), n in final.items():
        combined[(f, t)] = combined.get((f, t), 0) + n
    batch = queries()["events_markov_transitions"](spark, sf_dir).collect()
    batch_counts = {(r.from_type, r.to_type): r.n for r in batch}
    assert combined == batch_counts
    # per-from totals recombine too
    batch_tot = {r.from_type: r.n_from for r in batch}
    stream_tot = {}
    for (f, _), n in combined.items():
        stream_tot[f] = stream_tot.get(f, 0) + n
    assert stream_tot == batch_tot


def test_streaming_markov_state_is_bounded(spark, sf_dir):
    """The state blob per user is the chain head + at most k^2 counter
    entries — independent of how many events the user has."""
    import json

    import pandas as pd

    from gluettalax_spark.streaming.stateful import _make_markov_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    fn = _make_markov_fn()
    state = FakeState()
    n = 5000
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=n, freq="s"),
            "event_id": range(n),
            "event_type": ["click", "view", "purchase", "error", "signup"] * (n // 5),
        }
    )
    out = list(fn((1,), [pdf], state))[0]
    counts = json.loads(state._v[1])
    assert len(counts) <= 25
    assert out["n"].sum() == n - 1  # every adjacent pair counted once


def test_streaming_markov_chunk_split_recombines(spark, sf_dir):
    """One micro-batch delivered as SEVERAL Arrow chunks with no
    cross-chunk ordering (the engine may split a group's rows anywhere)
    must fold the same transitions as a single ordered chunk — the r8
    advisor's scenario: the chain head must never pair out-of-order
    events across chunk boundaries."""
    import json

    import pandas as pd

    from gluettalax_spark.streaming.stateful import _make_markov_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    types = ["view", "click", "purchase", "error", "view", "click", "signup", "purchase"]
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=len(types), freq="s"),
            "event_id": range(len(types)),
            "event_type": types,
        }
    )
    fn = _make_markov_fn()
    ref_state = FakeState()
    ref = list(fn((1,), [pdf], ref_state))[0]
    # Same micro-batch as two interleaved, internally-unsorted chunks.
    split_state = FakeState()
    chunk_a = pdf.iloc[[5, 1, 7, 3]].reset_index(drop=True)
    chunk_b = pdf.iloc[[6, 0, 4, 2]].reset_index(drop=True)
    got = list(fn((1,), [chunk_a, chunk_b], split_state))[0]
    ref_counts = sorted(map(tuple, ref[["from_type", "to_type", "n"]].to_numpy()))
    got_counts = sorted(map(tuple, got[["from_type", "to_type", "n"]].to_numpy()))
    assert got_counts == ref_counts
    assert split_state._v[0] == ref_state._v[0]  # same chain head
    # state keys survive event types containing the old separator char
    spaced = pd.DataFrame(
        {
            "ts": pd.date_range("2024-02-01", periods=2, freq="s"),
            "event_id": [0, 1],
            "event_type": ["add to cart", "check out"],
        }
    )
    st2 = FakeState()
    list(fn((2,), [spaced], st2))
    counts = {tuple(k): v for k, v in json.loads(st2._v[1])}
    assert counts == {("add to cart", "check out"): 1}


def test_streaming_seqmatch_final_equals_batch(spark, sf_dir):
    """Counting each user's FINAL matched emission per pattern must
    reproduce the batch `events_sequence_match` n_matched / n_users /
    share_ppm exactly."""
    from gluettalax_spark.registry import queries
    from gluettalax_spark.streaming.stateful import streaming_sequence_match

    stream_df = streaming_sequence_match(spark, sf_dir)
    assert stream_df.isStreaming
    result = run_stream_to_memory(spark, stream_df, "seqmatch_twin", output_mode="update")
    final = {}
    for r in result.collect():
        final[(r.user_id, r.pattern)] = r.matched
    users = {u for (u, _) in final}
    n_matched = {}
    for (_, p), m in final.items():
        n_matched[p] = n_matched.get(p, 0) + m
    batch = queries()["events_sequence_match"](spark, sf_dir).collect()
    assert {r.pattern: r.n_matched for r in batch} == n_matched
    for r in batch:
        assert r.n_users == len(users)
        assert r.share_ppm == n_matched[r.pattern] * 1_000_000 // len(users)


def test_streaming_seqmatch_state_bounded_and_chunk_order_free(spark, sf_dir):
    """The NFA state per (user, pattern) is one mask ≤ 2^(len+1) plus a
    flag — independent of history length — and chunk-split micro-batches
    fold identically to a single ordered chunk."""
    import json

    import pandas as pd

    from gluettalax_spark.operators.stats import _SEQ_PATTERNS
    from gluettalax_spark.streaming.stateful import _make_seqmatch_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    fn = _make_seqmatch_fn()
    n = 4000
    # cycle ends ...error, signup, view, click: batch 1 leaves the NFA
    # MID-PATTERN (V seen, C* consuming) with no purchase anywhere
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=n, freq="s"),
            "event_id": range(n),
            "event_type": (["error", "signup", "view", "click"] * n)[:n],
        }
    )
    state = FakeState()
    out = list(fn((1,), [pdf], state))[0]
    st = json.loads(state._v[0])
    assert len(st) == len(_SEQ_PATTERNS)
    for mask, matched in st:
        assert 0 <= mask < (1 << 6)  # longest pattern has 3 tokens + accept bit
        assert matched in (0, 1)
    byp = dict(zip(out["pattern"], out["matched"]))
    assert byp["view_click_buy"] == 0  # no purchase ever
    assert byp["strict_funnel"] == 0
    # the next micro-batch's purchase lands adjacent to the carried
    # ...view,click suffix: VC*P AND VCP complete ACROSS micro-batches
    tail = pd.DataFrame(
        {
            "ts": pd.date_range("2024-02-01", periods=1, freq="s"),
            "event_id": [n],
            "event_type": ["purchase"],
        }
    )
    out2 = list(fn((1,), [tail], state))[0]
    byp2 = dict(zip(out2["pattern"], out2["matched"]))
    assert byp2["view_click_buy"] == 1
    assert byp2["strict_funnel"] == 1
    assert byp2["double_purchase"] == 0  # only one purchase ever
    # chunk-order independence: same events as two unsorted chunks
    seq = ["view", "click", "click", "purchase", "error"]
    ref_pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2024-03-01", periods=len(seq), freq="s"),
            "event_id": range(len(seq)),
            "event_type": seq,
        }
    )
    s_ref, s_split = FakeState(), FakeState()
    ref = list(fn((2,), [ref_pdf], s_ref))[0]
    got = list(
        fn(
            (2,),
            [
                ref_pdf.iloc[[3, 1]].reset_index(drop=True),
                ref_pdf.iloc[[4, 0, 2]].reset_index(drop=True),
            ],
            s_split,
        )
    )[0]
    assert list(ref["matched"]) == list(got["matched"])
    assert json.loads(s_ref._v[0]) == json.loads(s_split._v[0])


# --------------------------------------------------------------------------
# streaming_user_paths (round 9): first-3-event journeys, bounded prefix
# --------------------------------------------------------------------------


def test_streaming_paths_final_equals_batch_topk(spark, sf_dir):
    """Counting the FINAL per-user path emissions (full 3-step prefixes
    only) and ranking by (count desc, path) must reproduce the batch
    `events_path_topk` table exactly."""
    from collections import Counter

    from gluettalax_spark.registry import queries
    from gluettalax_spark.streaming.stateful import streaming_user_paths

    stream_df = streaming_user_paths(spark, sf_dir)
    assert stream_df.isStreaming
    result = run_stream_to_memory(spark, stream_df, "paths_twin", output_mode="update")
    final = {}
    for r in result.collect():  # update mode: last emission per user wins
        final[r.user_id] = (r.n_steps, r.path)
    counts = Counter(path for n, path in final.values() if n == 3)
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    batch = queries()["events_path_topk"](spark, sf_dir).collect()
    assert [(r["path"], r["n_users"]) for r in batch] == expect


def test_streaming_paths_prefix_is_mergeable_bottom_k(spark, sf_dir):
    """A LATE-arriving earlier event must displace a later one from the
    prefix — the bottom-3 summary is order-insensitive across
    micro-batch chunk boundaries."""
    import json

    import pandas as pd

    from gluettalax_spark.streaming.stateful import _make_path_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    fn = _make_path_fn()
    state = FakeState()
    late_first = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01 00:00:05", "2024-01-01 00:00:06"]),
            "event_id": [5, 6],
            "event_type": ["error", "error"],
        }
    )
    list(fn((7,), iter([late_first]), state))
    early = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01 00:00:01", "2024-01-01 00:00:02"]),
            "event_id": [1, 2],
            "event_type": ["view", "click"],
        }
    )
    out = list(fn((7,), iter([early]), state))[-1]
    assert out["path"].iloc[0] == "view>click>error"
    # state holds exactly 3 triples — bounded regardless of history
    assert len(json.loads(state.get[0])) == 3
