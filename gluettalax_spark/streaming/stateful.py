"""Custom stateful streaming: applyInPandasWithState + foreachBatch.

The reference's only "state" is polling loops; this is the engine-native
stateful surface (SURVEY.md §2.F streaming row): arbitrary per-key state
maintained across micro-batches, with timeouts bounding its lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupStateTimeout

from gluettalax_spark.streaming.windows import read_events_stream

RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _make_running_totals_fn():
    """Closure-built state function (workers can't import this package —
    same constraint as the multimodal kernel)."""

    def update(key, pdfs, state):
        import pandas as _pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return update


def streaming_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running (count, sum) via applyInPandasWithState — the
    custom-stateful-operator shape: state is a tuple per user, updated per
    micro-batch, emitted in update mode. At 100 TB the state store is
    RocksDB-backed and the watermark/timeout evicts idle users."""
    stream = read_events_stream(spark, sf_dir).select("user_id", "value")
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_running_totals_fn(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_foreach_batch_to_parquet(spark: SparkSession, sf_dir: str, out_dir: str) -> int:
    """foreachBatch sink: each micro-batch lands as parquet with the batch
    id — the exactly-once-by-idempotent-overwrite pattern. Returns the
    number of batches processed."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    stream = read_events_stream(spark, sf_dir)
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    batches: list[int] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        batches.append(batch_id)

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return len(batches)


def run_stream_upsert_to_table(spark, sf_dir: str, table: str, checkpoint: str) -> int:
    """Streaming MERGE: each micro-batch compacts to latest-per-user and
    upserts into a partitioned snapshot table via foreachBatch +
    ``upsert_partitioned`` — the streaming CDC sink (idempotent per key:
    replaying a batch overwrites the same rows, so foreachBatch's
    at-least-once delivery still yields exactly-once TABLE STATE).

    Returns the number of micro-batches processed.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from gluettalax_spark.sources.io import upsert_partitioned
    from gluettalax_spark.streaming.windows import read_events_stream

    n_batches = {"n": 0}

    def sink(batch_df, batch_id):  # noqa: ARG001
        latest = (
            batch_df.withColumn(
                "rn",
                F.row_number().over(
                    Window
                    .partitionBy("user_id")
                    .orderBy(F.col("ts").desc(), F.col("event_id").desc())
                ),
            )
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                F.col("event_type").alias("last_event_type"),
                F.round("value", 2).alias("last_value"),
                (F.col("user_id") % 8).cast("string").alias("bucket"),
            )
        )
        upsert_partitioned(spark, table, latest, "user_id", "bucket")
        n_batches["n"] += 1

    q = (
        read_events_stream(spark, sf_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


# --------------------------------------------------------------------------
# Timeout-closed sessionization (state TTL — the eviction half of state)
# --------------------------------------------------------------------------

SESSIONS_SCHEMA = "user_id long, n_events long, session_value double, closed_by string"
_SESSION_STATE_SCHEMA = "n long, total double"


def _make_sessionize_fn():
    """Per-user session accumulator with a processing-time timeout: state
    that stops receiving events gets CLOSED BY THE TIMEOUT — the half of
    stateful streaming that prevents unbounded state, demonstrated
    explicitly (running totals above never evict)."""

    def update(key, pdfs, state):
        import pandas as _pd

        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield _pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "session_value": [round(total, 2)],
                    "closed_by": ["timeout"],
                }
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(500)  # ms of processing-time inactivity
        yield _pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "session_value": [round(total, 2)],
                "closed_by": ["open"],
            }
        )

    return update


def streaming_sessionize_with_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState with ProcessingTimeTimeout: sessions close
    (and state evicts) after inactivity — run with multiple triggers so a
    later empty batch fires the timeouts."""
    stream = read_events_stream(spark, sf_dir).select("user_id", "value")
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_sessionize_fn(),
        outputStructType=SESSIONS_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas — the Spark 4 arbitrary-state v2 API
# --------------------------------------------------------------------------

TWS_PROFILE_SCHEMA = "user_id long, n_events long, total_value double, n_event_types long"


def _make_user_profile_processor():
    """StatefulProcessor with TYPED state: a ValueState tuple for running
    totals plus a MapState of per-event-type counts. Unlike the v1
    applyInPandasWithState blob, each state var is a separate RocksDB
    column family — at 100 TB the MapState updates touch only the keys in
    the batch instead of rewriting one serialized state value per user."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class UserProfileProcessor(StatefulProcessor):
        def init(self, handle):
            self.totals = handle.getValueState("totals", "n long, total double")
            self.type_counts = handle.getMapState(
                "type_counts", "event_type string", "c long"
            )

        def handleInputRows(self, key, rows, timerValues):  # noqa: ARG002
            import pandas as _pd

            n, total = self.totals.get() or (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                for t, c in pdf["event_type"].value_counts().items():
                    prev = self.type_counts.getValue((t,))
                    self.type_counts.updateValue((t,), ((prev[0] if prev else 0) + int(c),))
            self.totals.update((n, total))
            n_types = sum(1 for _ in self.type_counts.keys())
            yield _pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "n_event_types": [n_types],
                }
            )

        def close(self):
            pass

    return UserProfileProcessor()


def streaming_user_profile_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user profile via ``transformWithStateInPandas`` (Spark 4 v2
    stateful API): running event count/value total (ValueState) and the
    number of distinct event types seen (MapState). Requires the RocksDB
    state store provider — which is also the 100 TB answer: state lives
    off-heap on local SSD with changelog checkpointing, not in executor
    memory.

    Environment-gated: Spark's transform_with_state driver worker speaks
    protobuf to the JVM; without ``google.protobuf`` the query crashes at
    init, so fail fast with a clear error instead. The v1
    ``applyInPandasWithState`` operators above cover the same semantics
    where protobuf is unavailable."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package "
            "(not installed in this environment); use "
            "streaming_user_running_totals / streaming_sessionize_* instead"
        ) from exc
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = read_events_stream(spark, sf_dir).select("user_id", "event_type", "value")
    return stream.groupBy("user_id").transformWithStateInPandas(
        _make_user_profile_processor(),
        outputStructType=TWS_PROFILE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


_PROFILE_V1_STATE_SCHEMA = "n long, total double, types string"


def _make_user_profile_v1_fn():
    """applyInPandasWithState twin of the v2 UserProfileProcessor: the
    per-type MapState becomes a sorted \\x1f-joined string inside the one
    serialized state blob — the exact trade-off the v2 API removes (every
    batch rewrites the whole blob), kept here as the no-protobuf path."""

    def update(key, pdfs, state):
        import pandas as _pd

        n, total, types_blob = state.get if state.exists else (0, 0.0, "")
        types = set(types_blob.split("\x1f")) - {""} if types_blob else set()
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            types |= set(pdf["event_type"].unique())
        state.update((n, total, "\x1f".join(sorted(types))))
        yield _pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "n_event_types": [len(types)],
            }
        )

    return update


def streaming_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user profile (event count, value total, distinct event types),
    stateful across micro-batches. Dispatches to the best available
    engine surface: ``transformWithStateInPandas`` (typed state vars,
    RocksDB column families) when its protobuf wire dependency is
    present, else the ``applyInPandasWithState`` v1 twin with identical
    output — same schema, same final emissions, so callers and tests are
    environment-independent."""
    try:
        return streaming_user_profile_tws(spark, sf_dir)
    except NotImplementedError:
        pass
    stream = read_events_stream(spark, sf_dir).select("user_id", "event_type", "value")
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_user_profile_v1_fn(),
        outputStructType=TWS_PROFILE_SCHEMA,
        stateStructType=_PROFILE_V1_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Event-time sessionization (watermark-driven eviction, not wall clock)
# --------------------------------------------------------------------------


def _make_event_time_sessionize_fn(gap_ms: int):
    def update(key, pdfs, state):
        import pandas as _pd

        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield _pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "session_value": [round(total, 2)],
                    "closed_by": ["watermark"],
                }
            )
            return
        if key[0] is not None and key[0] < 0:
            # Watermark-advancing sentinel: contributes its ts to the
            # watermark upstream but opens no session. (A pre-groupBy filter
            # would be pushed BELOW the EventTimeWatermark node by Catalyst —
            # the predicate doesn't reference ts — silencing the sentinel.)
            return
        n, total = state.get if state.exists else (0, 0.0)
        last_ms = 0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last_ms = max(last_ms, int(_pd.Timestamp(pdf["ts"].max()).value // 1_000_000))
        state.update((n, total))
        # Fires when the WATERMARK passes last-event + gap. Spark rejects a
        # timestamp at/behind the current watermark, hence the clamp.
        state.setTimeoutTimestamp(max(last_ms + gap_ms, state.getCurrentWatermarkMs() + 1))
        yield _pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "session_value": [round(total, 2)],
                "closed_by": ["open"],
            }
        )

    return update


def streaming_sessionize_event_time(
    spark: SparkSession,
    src_dir: str,
    *,
    delay: str = "10 seconds",
    gap_ms: int = 60_000,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """applyInPandasWithState with EventTimeTimeout: a session closes when
    the watermark passes its last event + ``gap_ms`` — deterministic w.r.t.
    the DATA's timeline, unlike ProcessingTimeTimeout which depends on wall
    clock. This is the replayable flavor: rerunning the same input closes
    the same sessions at the same points, which matters for backfills over
    100 TB of history where "inactivity" must mean event-time gaps.

    ``src_dir`` is either a FIXTURE directory (contains ``events.parquet``
    — streamed through the shared events projection) or a prepared
    directory of parquet files with schema ``user_id long, value double,
    ts timestamp`` (the test harness shape); rows with user_id < 0 are
    watermark-advancing sentinels — they flow through the watermark node
    and are ignored inside the stateful function (no session state).

    The fixture branch matters for the bench/sweep paths: before round
    12 they handed the raw fixture dir to the prepared-dir reader, which
    forced the 3-column schema onto EVERY table in the directory — the
    non-events files surfaced as null-key rows that all hashed to ONE
    group, and at sf10 that single Python worker pegged a core for half
    an hour (the r12 sweep hang).
    """
    import os

    if os.path.exists(os.path.join(src_dir, "events.parquet")):
        from gluettalax_spark.streaming.windows import read_events_stream

        stream = read_events_stream(spark, src_dir).select("user_id", "value", "ts")
    else:
        stream = (
            spark.readStream.schema("user_id long, value double, ts timestamp")
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(src_dir)
        )
    return (
        stream.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_event_time_sessionize_fn(gap_ms),
            outputStructType=SESSIONS_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --------------------------------------------------------------------------
# Bounded-state streaming heavy hitters (mergeable Misra-Gries summary)
# --------------------------------------------------------------------------

HH_CAPACITY = 8  # counters per group — small so the fixture actually compresses
HH_OUTPUT_SCHEMA = "event_type string, user_id long, est long, n_seen long"
_HH_STATE_SCHEMA = "ids array<long>, counts array<long>, n_seen long"


def _make_heavy_hitters_fn(capacity: int = HH_CAPACITY):
    """Closure-built (workers can't import this package). Per event_type,
    maintain a Misra-Gries summary of user_id frequencies in AT MOST
    ``capacity`` counters: merge each micro-batch's exact value_counts
    into the summary, then compress by subtracting the (capacity+1)-th
    largest count (the mergeable-summaries compress of Agarwal et al.,
    PODS'12). Invariants the test pins: est ≤ true (compress only
    subtracts) and true − est ≤ n_seen/(capacity+1); any user with true
    count above that bound is guaranteed present."""

    def update(key, pdfs, state):
        import pandas as _pd

        if state.exists:
            ids, counts, n_seen = state.get
            summ = dict(zip(ids, counts))
        else:
            summ, n_seen = {}, 0
        for pdf in pdfs:
            vc = pdf["user_id"].value_counts()
            n_seen += int(vc.sum())
            for uid, c in vc.items():
                summ[int(uid)] = summ.get(int(uid), 0) + int(c)
        if len(summ) > capacity:
            items = sorted(summ.items(), key=lambda kv: (-kv[1], kv[0]))
            cut = items[capacity][1]
            summ = {k: v - cut for k, v in items[:capacity] if v - cut > 0}
        state.update((list(summ.keys()), list(summ.values()), n_seen))
        out = sorted(summ.items(), key=lambda kv: (-kv[1], kv[0]))
        yield _pd.DataFrame(
            {
                "event_type": [key[0]] * len(out),
                "user_id": [k for k, _ in out],
                "est": [v for _, v in out],
                "n_seen": [n_seen] * len(out),
            }
        )

    return update


def streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy hitters with BOUNDED state: unlike the windowed
    aggregates (state per distinct key — unbounded under adversarial key
    churn), the Misra-Gries summary holds ≤ HH_CAPACITY counters per
    group NO MATTER how many distinct users flow through — the streaming
    twin of the batch sketches (`events_heavy_hitters_sketch`,
    `events_freq_cms`). Emitted in update mode; each emission carries
    n_seen so consumers can apply the ε = 1/(capacity+1) error bound."""
    stream = read_events_stream(spark, sf_dir).select("event_type", "user_id")
    return stream.groupBy("event_type").applyInPandasWithState(
        _make_heavy_hitters_fn(),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming exact EWMA over the trailing-N events per user
# --------------------------------------------------------------------------

EWMA_OUTPUT_SCHEMA = "user_id long, n_used long, ewma_micro long, ewma double, n_seen long"
_EWMA_STATE_SCHEMA = "ts array<long>, ids array<long>, vq array<long>, n_seen long"


def _make_user_ewma_fn(n_keep: int, quantum: int):
    """Closure-built (workers can't import this package). Per user, keep
    the trailing ``n_keep`` events by (ts, event_id) — an order-statistics
    summary that MERGES exactly: top-N-by-key of a union is the top-N of
    the merged tops, so the final state equals the batch answer no matter
    how events are split across (or ordered within) micro-batches. The
    emitted EWMA is the same exact integer fold as the batch operator
    (`operators/windows.py events_user_ewma`): quantized values, powers
    -of-two weights, one integral divide."""

    def update(key, pdfs, state):
        import math as _math

        import pandas as _pd

        if state.exists:
            ts, ids, vq, n_seen = state.get
            buf = list(zip(ts, ids, vq))
        else:
            buf, n_seen = [], 0
        for pdf in pdfs:
            n_seen += len(pdf)
            t_us = (pdf["ts"].astype("int64") // 1000).tolist()
            # floor (not int()'s truncate-toward-zero) to match the batch
            # operator's quantization bit-for-bit.
            v_q = [(_math.floor(v * quantum)) for v in pdf["value"]]
            buf.extend(zip(t_us, pdf["event_id"].tolist(), v_q))
        buf.sort(key=lambda t: (-t[0], -t[1]))
        buf = buf[:n_keep]
        state.update((
            [t for t, _, _ in buf], [i for _, i, _ in buf], [v for _, _, v in buf], n_seen
        ))
        vals = [v for _, _, v in reversed(buf)]  # oldest first
        num = vals[0] + sum(v << (i - 2) for i, v in enumerate(vals[1:], start=2))
        micro = num // (1 << (len(vals) - 1))
        yield _pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_used": [len(vals)],
                "ewma_micro": [micro],
                "ewma": [micro / quantum],
                "n_seen": [n_seen],
            }
        )

    return update


def streaming_user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the batch `events_user_ewma`: per-user exact
    alpha=1/2 EWMA over the trailing-N events, maintained incrementally
    with BOUNDED state (≤ N (ts, id, value) triples per user, regardless
    of history length or arrival order — the trailing-N buffer is a
    mergeable summary). Each emission carries n_seen so consumers can
    identify the final value per key; a test pins that the final
    emissions equal the batch operator's exact integers."""
    from gluettalax_spark.operators.windows import EWMA_N, EWMA_Q

    stream = read_events_stream(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_user_ewma_fn(EWMA_N, EWMA_Q),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming drift monitor: per-day PSI vs a batch reference distribution
# --------------------------------------------------------------------------

DRIFT_OUTPUT_SCHEMA = "day string, n_events long, psi_e8 long"
_DRIFT_STATE_SCHEMA = "types array<string>, counts array<long>"


def _make_drift_psi_fn(ref_counts: dict, psi_q: int):
    """Closure-built (workers can't import this package). Per day,
    accumulate the event-type counts and emit the PSI of the day's mix
    against the broadcast reference distribution after every update —
    the same Laplace smoothing and floor-quantized terms as the batch
    `events_drift_psi`, so a day's final emission is reproducible from
    the day's counts alone."""

    def update(key, pdfs, state):
        import math as _math

        import pandas as _pd

        if state.exists:
            types, counts = state.get
            cur = dict(zip(types, counts))
        else:
            cur = {}
        for pdf in pdfs:
            for et, c in pdf["event_type"].value_counts().items():
                cur[str(et)] = cur.get(str(et), 0) + int(c)
        state.update((list(cur.keys()), [int(v) for v in cur.values()]))
        cats = sorted(set(ref_counts) | set(cur))
        k = len(cats)
        n_ref = sum(ref_counts.values())
        n_cur = sum(cur.values())
        psi = 0
        for et in cats:
            p = (ref_counts.get(et, 0) + 1) / (n_ref + k)
            q = (cur.get(et, 0) + 1) / (n_cur + k)
            psi += _math.floor((p - q) * _math.log(p / q) * psi_q)
        yield _pd.DataFrame({"day": [key[0]], "n_events": [n_cur], "psi_e8": [psi]})

    return update


def streaming_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the batch `events_drift_psi`: the reference
    distribution is frozen batch-side (the stream's own first half —
    one metadata-scale collect), then every micro-batch updates each
    day's running event-type counts (bounded state: one counter per
    type per open day) and re-emits that day's PSI against the
    reference. This is the alert a production ingest pipeline watches:
    'today's traffic mix has drifted from the reference corpus'."""
    from pyspark.sql import functions as F

    from gluettalax_spark.tables import load

    ev = load(spark, sf_dir, "events").select(F.unix_micros("ts").alias("us"), "event_type")
    # Integer div, matching the batch twin (events_drift_psi) exactly —
    # double division + cast is a silent precision cliff past 2^53.
    b = ev.agg(F.expr("(min(us) + max(us)) div 2").alias("mid")).collect()[0]
    ref = {
        r["event_type"]: r["c"]
        for r in ev.filter(F.col("us") <= b["mid"]).groupBy("event_type").agg(F.count(F.lit(1)).alias("c")).collect()
    }

    stream = read_events_stream(spark, sf_dir).select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"), "event_type"
    )
    return stream.groupBy("day").applyInPandasWithState(
        _make_drift_psi_fn(ref, 100_000_000),
        outputStructType=DRIFT_OUTPUT_SCHEMA,
        stateStructType=_DRIFT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_OUTPUT_SCHEMA = (
    "event_type string, n_days long, total long, cp_day string, s_peak long"
)
_CUSUM_STATE_SCHEMA = "days array<string>, counts array<long>"


def _make_cusum_fn(d0: str, d1: str):
    """Closure-built (workers can't import this package). State per
    event type: one counter per active day — calendar-bounded, the same
    bound as the batch op's metadata grid. Every update re-scores the
    CUSUM statistic over the FROZEN global day span [d0, d1] (idle days
    contribute x=0), so a type's final emission is bit-equal to the
    batch `events_changepoint_cusum` row."""

    def update(key, pdfs, state):
        import datetime as _dt

        import pandas as _pd

        if state.exists:
            days, counts = state.get
            cur = dict(zip(days, counts))
        else:
            cur = {}
        for pdf in pdfs:
            for day, c in pdf["day"].value_counts().items():
                cur[str(day)] = cur.get(str(day), 0) + int(c)
        state.update((list(cur.keys()), [int(v) for v in cur.values()]))

        start = _dt.date.fromisoformat(d0)
        end = _dt.date.fromisoformat(d1)
        span = [
            (start + _dt.timedelta(days=i)).isoformat()
            for i in range((end - start).days + 1)
        ]
        n, total = len(span), sum(cur.values())
        prefix, best = 0, None
        for t, day in enumerate(span, start=1):
            prefix += cur.get(day, 0)
            s = n * prefix - t * total
            cand = (-abs(s), day)
            if best is None or cand < best[0]:
                best = (cand, (day, s))
        cp_day, s_peak = best[1]
        yield _pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_days": [n],
                "total": [total],
                "cp_day": [cp_day],
                "s_peak": [s_peak],
            }
        )

    return update


def streaming_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the batch `events_changepoint_cusum`: the day
    span is frozen batch-side (one 1-row metadata collect — same
    discipline as `streaming_drift_psi`'s frozen reference), then every
    micro-batch folds each type's new events into its per-day counters
    (bounded state: one long per calendar day per type) and re-emits the
    current change-point. The live form of the level-shift alert: 'this
    event type's daily volume broke regime at day D'."""
    from pyspark.sql import functions as F

    from gluettalax_spark.tables import load

    ev = load(spark, sf_dir, "events").select(F.date_trunc("day", "ts").alias("day"))
    b = ev.agg(
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("d0"),
        F.date_format(F.max("day"), "yyyy-MM-dd").alias("d1"),
    ).collect()[0]

    stream = read_events_stream(spark, sf_dir).select(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    )
    return stream.groupBy("event_type").applyInPandasWithState(
        _make_cusum_fn(b["d0"], b["d1"]),
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming per-entity rolling z-score anomalies
# --------------------------------------------------------------------------

ZSCORE_OUTPUT_SCHEMA = (
    "user_id long, event_type string, n_seen long, n_scored long, n_anomalies long, n_late long"
)
_ZSCORE_STATE_SCHEMA = (
    "ts array<long>, ids array<long>, cents array<long>, "
    "n_seen long, n_scored long, n_anomalies long, n_late long"
)


def _make_rolling_zscore_fn(zwin: int, zk: int):
    """Closure-built (workers can't import this package). Per
    (user, event_type), keep the trailing ``zwin`` (ts, id, cents)
    triples and score each IN-ORDER arrival against the window preceding
    it with the batch operator's exact integer cross-multiplication —
    ``(n·x − s1)²·n > k²·(n·s2 − s1²)·n`` in Python big ints, so the
    decision is bit-identical to `events_rolling_zscore`.

    Unlike the trailing-EWMA buffer (whose FINAL value is merge-exact
    under any arrival order), running anomaly COUNTERS depend on every
    event's own position-time window: an arrival older than the buffer's
    newest point can no longer be scored against its true history, so it
    is counted in ``n_late`` and excluded — the side-channel semantics a
    production detector applies to late data. Within a micro-batch,
    rows are sorted by (ts, id); with event-time-ordered batches (the
    availableNow fixture drive) ``n_late`` is 0 and the per-type sums
    equal the batch answer exactly (test-pinned)."""

    def update(key, pdfs, state):
        import math as _math

        import pandas as _pd

        if state.exists:
            ts, ids, cents, n_seen, n_scored, n_anom, n_late = state.get
            buf = list(zip(ts, ids, cents))
        else:
            buf, n_seen, n_scored, n_anom, n_late = [], 0, 0, 0, 0
        rows = []
        for pdf in pdfs:
            t_us = (pdf["ts"].astype("int64") // 1000).tolist()
            cs = [int(_math.floor(v * 100 + 0.5)) for v in pdf["value"]]
            rows.extend(zip(t_us, pdf["event_id"].tolist(), cs))
        rows.sort()
        for t, i, c in rows:
            n_seen += 1
            if buf and (t, i) < (buf[-1][0], buf[-1][1]):
                n_late += 1
                continue
            win = buf[-zwin:]
            n = len(win)
            if n >= 4:
                n_scored += 1
                s1 = sum(v for _, _, v in win)
                s2 = sum(v * v for _, _, v in win)
                if (n * c - s1) ** 2 * n > zk * zk * (n * s2 - s1 * s1) * n:
                    n_anom += 1
            buf.append((t, i, c))
            buf = buf[-zwin:]
        state.update((
            [t for t, _, _ in buf], [i for _, i, _ in buf], [c for _, _, c in buf],
            n_seen, n_scored, n_anom, n_late,
        ))
        yield _pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_type": [key[1]],
                "n_seen": [n_seen],
                "n_scored": [n_scored],
                "n_anomalies": [n_anom],
                "n_late": [n_late],
            }
        )

    return update


def streaming_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the batch `events_rolling_zscore` — live
    per-entity anomaly counters with bounded state (≤ window triples +
    four counters per (user, type) key)."""
    from gluettalax_spark.operators.stats import _ZK, _ZWIN

    stream = read_events_stream(spark, sf_dir).filter("value IS NOT NULL").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    return stream.groupBy("user_id", "event_type").applyInPandasWithState(
        _make_rolling_zscore_fn(_ZWIN, _ZK),
        outputStructType=ZSCORE_OUTPUT_SCHEMA,
        stateStructType=_ZSCORE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming ANOVA moments: incremental per-type (n, Σv, Σv²)
# --------------------------------------------------------------------------

ANOVA_OUTPUT_SCHEMA = "event_type string, n_g long, s_g long, q_g decimal(38,0), ssbq_g long"
_ANOVA_STATE_SCHEMA = "n long, s long, q decimal(38,0)"


def _make_anova_moments_fn():
    """State per event type: the three exact moments (count, cents sum,
    cents sum-of-squares). Every update folds the micro-batch's values in
    integer arithmetic and re-emits the type's moments PLUS its
    floor-quantized between-group term s²//n — the same quantity the
    batch `stats_anova_oneway` sums, so the final per-type emissions
    recombine into a bit-equal F statistic."""

    def update(key, pdfs, state):
        import pandas as _pd

        n, s, q = state.get if state.exists else (0, 0, 0)
        n, s, q = int(n), int(s), int(q)
        for pdf in pdfs:
            v = (pdf["value"] * 100).round().astype("int64")
            n += len(v)
            s += int(v.sum())
            q += int((v.astype(object) ** 2).sum())
        from decimal import Decimal as _D

        state.update((n, s, _D(q)))
        yield _pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_g": [n],
                "s_g": [s],
                "q_g": [_D(q)],
                "ssbq_g": [s * s // n],
            }
        )

    return update


def streaming_anova_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `stats_anova_oneway`: per-event-type running
    moments (n, Σ cents, Σ cents²) — 3 numbers of state per type, the
    textbook incrementally-maintainable aggregate — re-emitted every
    micro-batch together with the floor-quantized between-group term.
    The final emission per type recombines (client- or test-side) into
    the identical ANOVA F as the batch pass over the same data: the
    live form of "is a slice's mean drifting away from the others".

    State is strictly bounded: one (long, long, decimal) triple per
    event type."""
    stream = read_events_stream(spark, sf_dir).select("event_type", "value")
    return stream.groupBy("event_type").applyInPandasWithState(
        _make_anova_moments_fn(),
        outputStructType=ANOVA_OUTPUT_SCHEMA,
        stateStructType=_ANOVA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming twin: per-user Markov transition counts
# --------------------------------------------------------------------------

MARKOV_OUTPUT_SCHEMA = "user_id long, from_type string, to_type string, n long, n_late long"
_MARKOV_STATE_SCHEMA = (
    "last_type string, counts_json string, last_ts_us long, last_event_id long, n_late long"
)


def _make_markov_fn():
    """State per user: the LAST event type seen (the chain head carried
    across micro-batches) plus the user's transition-count map as a JSON
    blob — bounded by k² event-type pairs (25 here), never by history
    length. Each update sorts the micro-batch by (ts, event_id) — the
    batch op's window order — folds the new transitions, and re-emits
    the user's full count map; the FINAL emission per user therefore
    recombines (summed over users) into the batch
    `events_markov_transitions` counts exactly."""

    def update(key, pdfs, state):
        import json as _json

        import pandas as _pd

        last_type, counts_json, last_ts_us, last_eid, n_late = (
            state.get if state.exists else (None, "[]", None, None, 0)
        )
        # State keys are JSON arrays ["from","to"] — a bare separator
        # would corrupt the map for event types containing it.
        counts = {tuple(k): v for k, v in _json.loads(counts_json)}
        # One micro-batch per group may arrive as SEVERAL Arrow chunks
        # with no cross-chunk ordering guarantee; concatenate and sort
        # ONCE so the chain head never pairs out-of-order events.
        # (Cross-MICRO-BATCH ordering is still an arrival-order
        # assumption — fold order is arrival order — but it is now
        # OBSERVABLE: any event sorting before the already-consumed
        # head increments the cumulative ``n_late`` witness, so a
        # production monitor sees exactly when per-user counts may
        # diverge from the batch twin. 0 on an in-order drive.)
        pdf = _pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(["ts", "event_id"])
            ts_us = pdf["ts"].astype("int64") // 1000
            eid = pdf["event_id"].astype("int64")
            if last_ts_us is not None:
                n_late += int(
                    ((ts_us < last_ts_us) | ((ts_us == last_ts_us) & (eid < last_eid))).sum()
                )
            tail_ts, tail_eid = int(ts_us.iloc[-1]), int(eid.iloc[-1])
            if last_ts_us is None or (tail_ts, tail_eid) > (last_ts_us, last_eid):
                last_ts_us, last_eid = tail_ts, tail_eid
            for t in pdf["event_type"]:
                if last_type is not None:
                    k2 = (last_type, t)
                    counts[k2] = counts.get(k2, 0) + 1
                last_type = t
        state.update(
            (
                last_type,
                _json.dumps([[list(k), v] for k, v in counts.items()]),
                last_ts_us,
                last_eid,
                n_late,
            )
        )
        if counts:
            items = sorted(counts.items())
            yield _pd.DataFrame(
                {
                    "user_id": [key[0]] * len(items),
                    "from_type": [k[0] for k, _ in items],
                    "to_type": [k[1] for k, _ in items],
                    "n": [v for _, v in items],
                    "n_late": [n_late] * len(items),
                }
            )

    return update


def streaming_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `events_markov_transitions`: per-user transition
    counts maintained live — the next-action-model feature stream. State
    per user is one string (chain head) + one bounded k²-entry count map:
    the mergeable summary that makes per-user sequence statistics
    streamable without keeping history. Summing each user's final
    emission over users reproduces the batch transition matrix exactly
    (pinned in tests)."""
    stream = read_events_stream(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_markov_fn(),
        outputStructType=MARKOV_OUTPUT_SCHEMA,
        stateStructType=_MARKOV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming twin: MATCH_RECOGNIZE sequence patterns (bitmask NFA per user)
# --------------------------------------------------------------------------

SEQMATCH_OUTPUT_SCHEMA = "user_id long, pattern string, matched int"
_SEQMATCH_STATE_SCHEMA = "nfa_json string"


def _compile_seq_pattern(rx: str, alphabet: frozenset) -> tuple:
    """Compile the restricted regex dialect of
    ``operators.stats._SEQ_PATTERNS`` — literal chars, ``[..]`` /
    ``[^..]`` classes, optional postfix ``*`` — into ``(charset, star)``
    tokens for the bitmask NFA in :func:`_make_seqmatch_fn`. Runs on the
    driver; the output is plain picklable data."""
    tokens = []
    i = 0
    while i < len(rx):
        if rx[i] == "[":
            j = rx.index("]", i)
            body = rx[i + 1 : j]
            cls = (alphabet - frozenset(body[1:])) if body.startswith("^") else frozenset(body)
            i = j + 1
        else:
            cls = frozenset(rx[i])
            i += 1
        star = i < len(rx) and rx[i] == "*"
        if star:
            i += 1
        tokens.append((cls, star))
    return tuple(tokens)


def _make_seqmatch_fn():
    """State per (user, pattern): one NFA position BITMASK (≤ 1 bit per
    pattern token — state capped at PATTERN LENGTH, never history
    length) plus a sticky matched flag. This is the streaming form of
    `events_sequence_match`'s regex-containment probe: before each
    character the start position is re-injected (a contiguous match may
    begin anywhere), every active position either consumes the character
    or dies, star tokens self-loop with an ε-edge forward, and reaching
    the accept bit latches ``matched``. Unmapped event types are SKIPPED
    — the batch op's ``concat_ws`` drops NULL chars the same way, so the
    two see identical character sequences.

    Each update concatenates all Arrow chunks of the micro-batch and
    sorts ONCE by (ts, event_id) — one group's micro-batch may arrive as
    several chunks with no cross-chunk ordering (the Markov-twin
    lesson); cross-MICRO-BATCH ordering remains an arrival-order
    assumption, as for any streaming sequence statistic."""
    from gluettalax_spark.operators.stats import _SEQ_CHAR, _SEQ_PATTERNS

    alphabet = frozenset(_SEQ_CHAR.values())
    compiled = [(name, _compile_seq_pattern(rx, alphabet)) for name, rx in _SEQ_PATTERNS]
    char_map = dict(_SEQ_CHAR)

    def update(key, pdfs, state):
        import json as _json

        import pandas as _pd

        st = _json.loads(state.get[0]) if state.exists else [[0, 0] for _ in compiled]

        def closure(mask, tokens):
            for i, (_, star) in enumerate(tokens):
                if star and mask & (1 << i):
                    mask |= 1 << (i + 1)
            return mask

        pdf = _pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(["ts", "event_id"])
            chars = [char_map.get(t) for t in pdf["event_type"]]
            for p, (_, tokens) in enumerate(compiled):
                mask, matched = st[p]
                if matched:
                    continue
                accept = 1 << len(tokens)
                for ch in chars:
                    if ch is None:
                        continue
                    mask = closure(mask | 1, tokens)
                    new = 0
                    for i, (cls, star) in enumerate(tokens):
                        if mask & (1 << i) and ch in cls:
                            new |= 1 << (i if star else i + 1)
                    mask = closure(new, tokens)
                    if mask & accept:
                        matched = 1
                        break
                st[p] = [mask, matched]
        state.update((_json.dumps(st),))
        yield _pd.DataFrame(
            {
                "user_id": [key[0]] * len(compiled),
                "pattern": [name for name, _ in compiled],
                "matched": [int(s[1]) for s in st],
            }
        )

    return update


def streaming_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `events_sequence_match`: live per-user
    MATCH_RECOGNIZE — "has this user completed view→clicks→purchase
    yet?" — maintained as one bitmask NFA per (user, pattern). Counting
    each user's FINAL matched emission per pattern reproduces the batch
    op's n_matched exactly (pinned in tests). State is bounded by
    Σ pattern lengths (≤ 4 bytes of mask + a flag per pattern here),
    independent of history length — the property that makes row-pattern
    matching streamable where the batch op's per-user string is not."""
    stream = read_events_stream(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_seqmatch_fn(),
        outputStructType=SEQMATCH_OUTPUT_SCHEMA,
        stateStructType=_SEQMATCH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming twin: first-3-event user paths (bounded prefix state)
# --------------------------------------------------------------------------

PATH_OUTPUT_SCHEMA = "user_id long, n_steps int, path string, n_late long"
_PATH_STATE_SCHEMA = "prefix_json string, n_late long"
_PATH_STEPS = 3


def _make_path_fn():
    """State per user: the ≤3 earliest events as a JSON list of
    [epoch_us, event_id, type] triples — a MERGEABLE bottom-k summary
    under the batch op's total order (ts, event_id), so late-arriving
    earlier events still displace later ones and the final emission per
    user equals `events_path_topk`'s per-user path exactly (pinned in
    tests). Bounded state: 3 triples regardless of history length.

    ``n_late`` (cumulative) counts events that arrived AFTER the prefix
    was already full yet sort before its last element — each one
    correctly displaced a later event (mergeability means they are NOT
    errors here), but the counter makes out-of-order arrival observable
    in production, symmetric with the Markov/zscore twins. 0 on an
    in-order drive."""

    def update(key, pdfs, state):
        import json as _json

        import pandas as _pd

        prefix_json, n_late = state.get if state.exists else ("[]", 0)
        prefix = [tuple(t) for t in _json.loads(prefix_json)]
        full_tail = prefix[-1] if len(prefix) == _PATH_STEPS else None
        pdf = _pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            ts_us = pdf["ts"].astype("int64") // 1000
            eid = pdf["event_id"].astype("int64")
            if full_tail is not None:
                wt, we = full_tail[0], full_tail[1]
                n_late += int(((ts_us < wt) | ((ts_us == wt) & (eid < we))).sum())
            prefix.extend(
                zip(
                    ts_us.tolist(),
                    eid.tolist(),
                    pdf["event_type"].astype(str).tolist(),
                )
            )
            prefix = sorted(prefix)[:_PATH_STEPS]
        state.update((_json.dumps([list(t) for t in prefix]), n_late))
        yield _pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_steps": [len(prefix)],
                "path": [">".join(t[2] for t in prefix)],
                "n_late": [n_late],
            }
        )

    return update


def streaming_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `events_path_topk`'s per-user stage: maintain
    each user's first-3-event journey live (the onboarding-path feature
    stream). The top-k ranking is a trivial batch aggregate over these
    emissions — counting paths per distinct journey reproduces the
    batch operator's table exactly once every user's prefix is full."""
    stream = read_events_stream(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_path_fn(),
        outputStructType=PATH_OUTPUT_SCHEMA,
        stateStructType=_PATH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
