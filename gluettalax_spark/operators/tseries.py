"""Time-series diagnostics over the order-date calendar grid.

Complements the existing forecasting/seasonality family
(`orders_forecast_holt`, `orders_seasonality_weekday`,
`events_periodogram_dft`, `events_changepoint_cusum`) with the two
classical checks a pipeline runs BEFORE trusting any of them:
Ljung-Box (is there autocorrelation at all — if not, forecasting is
noise-fitting) and the Theil-Sen robust trend (the median-of-slopes
estimator that ignores outlier months OLS would chase).

Scale shape shared by both: ONE data-scale groupBy collapses the fact
table onto the calendar grid (days or months between min and max order
date — bounded by the calendar, not the data; ~2,500 days / ~80 months
at every SF), and everything downstream runs on that bounded grid.
Deviations/products accumulate exactly in DECIMAL(38,0) (DuckDB
HUGEINT); every reported statistic is ONE fixed IEEE expression over
exact sums, rounded for display — the repo-wide cross-engine recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gluettalax_spark.registry import register
from gluettalax_spark.tables import load

# --------------------------------------------------------------------------
# Ljung-Box autocorrelation test on daily order counts
# --------------------------------------------------------------------------

_LB_LAGS = 7

# acf_k inlined identically in both engines (one IEEE division each).
_LB_ACF = {k: f"(CAST(num_{k} AS DOUBLE) / CAST(den AS DOUBLE))" for k in range(1, _LB_LAGS + 1)}

_LB_Q = (
    "round(CAST(n_days AS DOUBLE) * (n_days + 2) * ("
    + " + ".join(f"{_LB_ACF[k]} * {_LB_ACF[k]} / (n_days - {k})" for k in range(1, _LB_LAGS + 1))
    + "), 4) AS q_stat"
)

_LB_FINAL_COLS = (
    ["n_days", "total_orders"]
    + [f"round({_LB_ACF[k]}, 6) AS acf_{k}" for k in range(1, _LB_LAGS + 1)]
    + [_LB_Q]
)

_LJUNG_BOX_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
bounds AS (
  SELECT min(day) AS d0, CAST(date_diff('day', min(day), max(day)) AS BIGINT) AS span
  FROM daily
),
grid AS (
  SELECT t, coalesce(daily.x, 0) AS x
  FROM (SELECT unnest(range(0, span + 1)) AS t, d0 FROM bounds) g
  LEFT JOIN daily ON daily.day = g.d0 + g.t * INTERVAL 1 DAY
),
tot AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS s FROM grid
),
dev AS (
  SELECT t, CAST(tot.n * x - tot.s AS HUGEINT) AS d FROM grid, tot
),
den_t AS (
  SELECT CAST(sum(d * d) AS HUGEINT) AS den FROM dev
),
nums AS (
  SELECT k, CAST(sum(a.d * b.d) AS HUGEINT) AS num
  FROM (SELECT unnest(range(1, {_LB_LAGS} + 1)) AS k) lags
  JOIN dev a ON true
  JOIN dev b ON b.t = a.t + k
  GROUP BY k
),
piv AS (
  SELECT
    {", ".join(f"max(CASE WHEN k = {k} THEN num END) AS num_{k}" for k in range(1, _LB_LAGS + 1))}
  FROM nums
),
m AS (
  SELECT CAST(tot.n AS BIGINT) AS n_days, CAST(tot.s AS BIGINT) AS total_orders,
         den_t.den AS den, piv.*
  FROM tot, den_t, piv
)
SELECT {", ".join(_LB_FINAL_COLS)}
FROM m
"""


@register(
    "stats_ljung_box",
    _LJUNG_BOX_ORACLE,
    doc=f"Ljung-Box autocorrelation test (lags 1..{_LB_LAGS}) on daily order counts",
)
def stats_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test: is the daily order-count series
    autocorrelated at lags 1..7? Q = n(n+2)·Σ_k r_k²/(n−k) — the
    standard pre-flight for `orders_forecast_holt` (no autocorrelation ⇒
    nothing to forecast) and the residual-whiteness check after it.
    TPC-H order dates are near-uniform, so the unit test pins the
    weekday-free calibration: |acf_k| small, Q moderate.

    Exactness: the grid is DENSE (idle days count 0 — the sparse form
    biases every lag product); deviations use the n²-scaling trick
    d_t = n·x_t − S so no float mean ever forms, and all lag products
    accumulate in DECIMAL(38,0)/HUGEINT. Each acf_k is one IEEE
    division; Q is one fixed expression with the k-terms in lag order.

    Scale: one data-scale groupBy(day) to the calendar grid (~2,500
    rows at ANY corpus size); the 7 lag joins run grid×7 — bounded,
    broadcast-planned. Magnitude bound documented: |d_t| ≤ n·max_day +
    S ≈ 10⁹ at SF100, d² ≈ 10¹⁸, Σ ≈ 10²¹·lags ≪ 10³⁸."""
    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.select(F.col("o_orderdate").cast("date").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
        .localCheckpoint(eager=False)
    )
    bounds = daily.agg(
        F.min("day").alias("d0"),
        F.datediff(F.max("day"), F.min("day")).cast("long").alias("span"),
    )
    grid = (
        bounds.select("d0", F.explode(F.sequence(F.lit(0).cast("long"), F.col("span"))).alias("t"))
        .join(
            daily.withColumnRenamed("day", "dday"),
            F.expr("dday = date_add(d0, CAST(t AS INT))"),
            "left",
        )
        .select("t", F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("x"))
        .localCheckpoint(eager=False)
    )
    tot = grid.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
    )
    dev = grid.crossJoin(F.broadcast(tot)).select(
        "t", (F.col("n") * F.col("x") - F.col("s")).cast("decimal(38,0)").alias("d")
    ).localCheckpoint(eager=False)
    den_df = dev.agg(F.sum(F.col("d") * F.col("d")).cast("decimal(38,0)").alias("den"))
    lags = spark.range(1, _LB_LAGS + 1).select(F.col("id").alias("k"))
    b = dev.select(F.col("t").alias("bt"), F.col("d").alias("bd"))
    nums = (
        dev.crossJoin(F.broadcast(lags))
        .join(F.broadcast(b), F.expr("bt = t + k"))
        .groupBy("k")
        .agg(F.sum(F.col("d") * F.col("bd")).cast("decimal(38,0)").alias("num"))
    )
    piv = nums.agg(
        *[
            F.max(F.when(F.col("k") == k, F.col("num"))).alias(f"num_{k}")
            for k in range(1, _LB_LAGS + 1)
        ]
    )
    tot_out = grid.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("total_orders"),
    )
    m = tot_out.crossJoin(F.broadcast(den_df)).crossJoin(F.broadcast(piv))
    return m.selectExpr(*_LB_FINAL_COLS)


# --------------------------------------------------------------------------
# Theil-Sen robust trend on monthly revenue
# --------------------------------------------------------------------------

_THEIL_SEN_ORACLE = """
WITH monthly AS (
  SELECT CAST(date_diff('month', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS m,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS r
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT CAST(floor(1000000.0 * (CAST(b.r - a.r AS DOUBLE) / (b.m - a.m))) AS BIGINT)
           AS slope_q
  FROM monthly a JOIN monthly b ON b.m > a.m
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs, list_sort(list(slope_q)) AS ls FROM pairs
),
mm AS (SELECT CAST(count(*) AS BIGINT) AS n_months FROM monthly)
SELECT mm.n_months, s.n_pairs,
       ls[CAST((n_pairs + 1) // 2 AS BIGINT)] AS sen_slope_micro,
       round(CAST(ls[CAST((n_pairs + 1) // 2 AS BIGINT)] AS DOUBLE) / 1000000.0 / 100.0, 4)
         AS sen_slope_dollars
FROM s, mm
"""


@register(
    "stats_theil_sen",
    _THEIL_SEN_ORACLE,
    doc="Theil-Sen robust trend (median pairwise slope) of monthly revenue",
)
def stats_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator: the median of all pairwise slopes of monthly
    revenue — up to 29.3% contamination-proof where `orders_price_trend_ols`
    chases outliers; the robust-trend rung of the forecasting family.

    Exactness: monthly revenue is an exact integer-cents aggregate; each
    pairwise slope is ONE IEEE division floor-quantized to micro-cents
    (floor on a double is deterministic cross-engine — signed integer
    ``div`` is NOT: Spark and DuckDB disagree on negative quotients,
    truncation vs truncation-toward-zero, so the float-floor form is the
    safe one for signed slopes). The median is the LOWER median
    (element ⌈n/2⌉ of the sorted list) — deterministic for even counts.

    Scale: one data-scale groupBy to the month grid (~80 rows at any
    SF); the pair self-join is grid×grid (~3,200 rows — calendar-bounded,
    NOT data-bounded), sorted in one bounded array."""
    orders = load(spark, sf_dir, "orders")
    monthly = (
        orders.select(
            (
                (F.year("o_orderdate") - F.lit(1992)) * 12 + (F.month("o_orderdate") - 1)
            )
            .cast("long")
            .alias("m"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("m")
        .agg(F.sum("cents").cast("long").alias("r"))
        .localCheckpoint(eager=False)
    )
    b = monthly.select(F.col("m").alias("bm"), F.col("r").alias("br"))
    pairs = monthly.join(F.broadcast(b), F.expr("bm > m")).selectExpr(
        "CAST(floor(1000000.0 * (CAST(br - r AS DOUBLE) / (bm - m))) AS BIGINT) AS slope_q"
    )
    s = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sort_array(F.collect_list("slope_q")).alias("ls"),
    )
    mm = monthly.agg(F.count(F.lit(1)).cast("long").alias("n_months"))
    return s.crossJoin(F.broadcast(mm)).selectExpr(
        "n_months",
        "n_pairs",
        "element_at(ls, CAST((n_pairs + 1) div 2 AS INT)) AS sen_slope_micro",
        "round(CAST(element_at(ls, CAST((n_pairs + 1) div 2 AS INT)) AS DOUBLE)"
        " / 1000000.0 / 100.0, 4) AS sen_slope_dollars",
    )
