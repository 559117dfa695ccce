"""Time-window operators over the ``events`` table.

The reference has no data streaming — its only time behavior is polling
loops (gluettalax.py:220-224,266-270). The fixture set adds a
stream-shaped ``events`` table (TESTDATA.md) precisely so the engine can
expose the Structured Streaming surface (SURVEY.md §2.F streaming row).

Each window shape ships twice:

* a **batch** builder registered with a DuckDB oracle — `F.window` /
  `F.session_window` work identically on static DataFrames, which is what
  makes the semantics checkable;
* a **streaming** builder (`readStream` + `withWatermark`) returning the
  streaming DataFrame — exercised via the memory sink in tests. The
  watermark bounds state: at 100 TB/day of events, state eviction is the
  difference between a stable job and OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gluettalax_spark.registry import register
from gluettalax_spark.tables import load

_TS_FMT = "yyyy-MM-dd HH:mm:ss"

# --------------------------------------------------------------------------
# Tumbling window
# --------------------------------------------------------------------------

_TUMBLING_ORACLE = """
SELECT
  strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  count(*)             AS n_events,
  round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("events_tumbling_window", _TUMBLING_ORACLE, doc="10-min tumbling window aggregate")
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling = one window per event; the window struct is just a derived
    grouping key, so this is a plain hash aggregate (one shuffle).
    Spark and DuckDB both align buckets to midnight-UTC-divisible origins,
    so boundaries agree."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# Sliding window
# --------------------------------------------------------------------------

_SLIDING_ORACLE = """
-- Each event belongs to 2 overlapping 10-min windows (slide 5 min):
-- starts time_bucket(5m, ts) and time_bucket(5m, ts) - 5m.
WITH exploded AS (
  SELECT
    time_bucket(INTERVAL '5 minutes', ts) - k * INTERVAL '5 minutes' AS window_start,
    value
  FROM events, (SELECT unnest([0, 1]) AS k)
)
SELECT
  strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
  count(*)             AS n_events,
  round(sum(value), 2) AS sum_value
FROM exploded
GROUP BY 1
ORDER BY 1
"""


@register("events_sliding_window", _SLIDING_ORACLE, doc="10-min window sliding every 5 min")
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows replicate each event width/slide times before the
    aggregate — the fan-out is the scale cost, which is why the slide
    should divide the width and stay coarse at 100 TB."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.date_format("w.start", _TS_FMT).alias("window_start"), "n_events", "sum_value")
        .orderBy("window_start")
    )


# --------------------------------------------------------------------------
# Session window (30-min inactivity gap per user)
# --------------------------------------------------------------------------

_SESSION_ORACLE = """
WITH flagged AS (
  SELECT
    user_id, ts, value,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
              > INTERVAL '30 minutes'
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT
    user_id, ts, value,
    sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_id
  FROM flagged
)
SELECT
  user_id,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  count(*)                               AS n_events,
  round(sum(value), 2)                   AS sum_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


@register("events_session_window", _SESSION_ORACLE, doc="session_window(30 min gap) per user")
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`session_window` merges events closer than the gap. The oracle
    reconstructs the identical sessions with the classic gaps-and-islands
    SQL (lag + cumulative sum) — same semantics, two very different plans.
    """
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT).alias("session_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


# --------------------------------------------------------------------------
# Hourly per-user stats (the rollup a streaming job would maintain)
# --------------------------------------------------------------------------

_HOURLY_ORACLE = """
SELECT
  strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
  user_id,
  count(*)                                              AS n_events,
  count(*) FILTER (WHERE event_type = 'purchase')       AS n_purchases,
  round(sum(value), 2)                                  AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("events_hourly_user_stats", _HOURLY_ORACLE, doc="hourly per-user rollup with conditional counts")
def events_hourly_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", _TS_FMT).alias("hour_start"),
            "user_id",
            "n_events",
            "n_purchases",
            "sum_value",
        )
        .orderBy("hour_start", "user_id")
    )


# --------------------------------------------------------------------------
# True Structured Streaming variants (smoke-tested; no SQL oracle possible)
# --------------------------------------------------------------------------

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet, normalizing ``ts`` to TIMESTAMP
    the same way as the batch loader (handles both the ns-as-long legacy
    layout and the current timestamp[us]/NTZ layout). The file's physical
    schema comes from a footer-only batch read, cached per fixture dir —
    a stream source must declare its schema up front. The legacy nanos
    conf is scoped to that footer read (restored after), and the explicit
    .schema() on the stream source makes the stream itself independent of
    the session conf."""
    from gluettalax_spark.tables import _normalize_events_ts, events_raw_schema

    raw_schema = events_raw_schema(spark, sf_dir)
    # The file stream source requires a directory; pathGlobFilter selects
    # only the events table out of the shared fixture dir.
    raw = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return _normalize_events_ts(raw)


def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling counts: events later than 1 hour past the
    max seen ts are dropped and their windows finalized — bounded state."""
    stream = read_events_stream(spark, sf_dir)
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked session windows — state per open session per user,
    closed (and emitted, in append mode) once the watermark passes."""
    stream = read_events_stream(spark, sf_dir)
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def run_stream_to_memory(
    spark: SparkSession, df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming DataFrame to completion against the static fixture
    (memory sink + processAllAvailable) and return the materialized result.

    Append mode emits only windows the watermark has closed — with a finite
    file source the trailing windows stay open, so callers assert on the
    closed prefix (that IS the late-data semantics under test).
    """
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


# --------------------------------------------------------------------------
# Gap filling: dense time spine × event types, zeros where no data
# --------------------------------------------------------------------------

_GAPFILL_ORACLE = """
WITH bounds AS (
  SELECT time_bucket(INTERVAL '1 hour', min(ts)) AS lo,
         time_bucket(INTERVAL '1 hour', max(ts)) AS hi
  FROM events
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
actual AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT
  strftime(s.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
  t.event_type AS event_type,
  coalesce(a.n, 0) AS n_events
FROM spine s
CROSS JOIN types t
LEFT JOIN actual a ON a.bucket = s.bucket AND a.event_type = t.event_type
ORDER BY bucket, t.event_type
"""


@register("events_gapfill", _GAPFILL_ORACLE, doc="dense hourly spine × event types, zero-filled gaps")
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling = generate the dense bucket spine (sequence + explode
    from a 1-row bounds aggregate — no driver loop), cross the small type
    dimension, left-join the actual counts. The counts table is bounded
    by hours × types (output-sized, not event-count-sized) but still
    grows with the time horizon, so the join is un-hinted — AQE
    broadcasts the post-aggregate side while it fits. This is the
    continuous-aggregate/hypertable-rollup completion step: downstream
    consumers (charts, anomaly detection) need explicit zeros, not
    absent rows."""
    events = load(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("bucket")
    )
    types = events.select("event_type").distinct()
    actual = events.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.crossJoin(F.broadcast(types))
        .join(actual, ["bucket", "event_type"], "left")
        .select(
            F.date_format("bucket", _TS_FMT).alias("bucket"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
        .orderBy("bucket", "event_type")
    )


# --------------------------------------------------------------------------
# Hypertable rollup: hour/day/month continuous aggregates in ONE pass
# --------------------------------------------------------------------------

_HYPERTABLE_ORACLE = """
WITH b AS (
  SELECT event_type, value,
         time_bucket(INTERVAL '1 hour', ts)  AS h,
         time_bucket(INTERVAL '1 day', ts)   AS d,
         time_bucket(INTERVAL '1 month', ts) AS m
  FROM events
)
SELECT
  CASE WHEN GROUPING(h) = 0 THEN 'hour'
       WHEN GROUPING(d) = 0 THEN 'day'
       ELSE 'month' END AS grain,
  strftime(coalesce(h, d, m), '%Y-%m-%d %H:%M:%S') AS bucket,
  event_type,
  count(*)             AS n_events,
  round(sum(value), 2) AS sum_value
FROM b
GROUP BY GROUPING SETS ((h, event_type), (d, event_type), (m, event_type))
ORDER BY grain, bucket, event_type
"""


@register("events_hypertable_rollup", _HYPERTABLE_ORACLE, doc="hour/day/month rollup in one GROUPING SETS pass")
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hypertable/continuous-aggregate pattern: maintain EVERY
    retention grain (hour → day → month) in one scan via GROUPING SETS —
    Spark's Expand emits one row per grain per input row, and the single
    hash aggregate produces all three materializations at once. At
    100 TB this replaces three separate rollup jobs with one, and the
    coarse grains come for the shuffle price of the finest."""
    load(spark, sf_dir, "events").createOrReplaceTempView("_ht_events")
    return spark.sql(
        """
        WITH b AS (
          SELECT event_type, value,
                 date_trunc('hour', ts)  AS h,
                 date_trunc('day', ts)   AS d,
                 date_trunc('month', ts) AS m
          FROM _ht_events
        )
        SELECT
          CASE WHEN grouping(h) = 0 THEN 'hour'
               WHEN grouping(d) = 0 THEN 'day'
               ELSE 'month' END AS grain,
          date_format(coalesce(h, d, m), 'yyyy-MM-dd HH:mm:ss') AS bucket,
          event_type,
          count(*)             AS n_events,
          round(sum(value), 2) AS sum_value
        FROM b
        GROUP BY GROUPING SETS ((h, event_type), (d, event_type), (m, event_type))
        ORDER BY grain, bucket, event_type
        """
    )
