"""Join operators: equi (inner/left/semi/anti), broadcast star joins,
non-equi range joins, and an as-of join built shuffle-free via a union +
window rather than a cross product.

The reference joins nothing client-side — joins live in users' Glue job
scripts (arbitrary PySpark launched at gluettalax.py:256); this module is
that surface made first-class (SURVEY.md §2.F).

Scale notes baked into each builder:
* dimension tables (region/nation/customer/supplier/part) are broadcast —
  the fact side never shuffles for them;
* fact-to-fact joins (lineitem ⋈ orders) shuffle on the join key once and
  AQE handles skew;
* the as-of join is O(n log n) per key via a window, not O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gluettalax_spark.registry import register
from gluettalax_spark.tables import load

# --------------------------------------------------------------------------
# Star join with broadcast dimensions (TPC-H Q5 shape)
# --------------------------------------------------------------------------

_REVENUE_BY_REGION_ORACLE = """
SELECT
  r_name                                                AS region,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
       AS DOUBLE) / 100.0                                AS revenue,
  count(*)                                              AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY r_name
ORDER BY revenue DESC, region
"""


@register("join_revenue_by_region", _REVENUE_BY_REGION_ORACLE, doc="4-way star join, broadcast dims (Q5 shape)")
def join_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders shuffles once on orderkey; customer/nation/region
    are broadcast so the big side streams through map-side hash joins.
    At 100 TB only the lineitem⋈orders exchange remains, and AQE splits
    any skewed orderkey partitions."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            # integer-cents sum: the float fold crosses the 2-decimal
            # rounding boundary at sf1.0 group sizes
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
                ).cast("double")
                / 100.0
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("region"))
    )


# --------------------------------------------------------------------------
# Left outer join preserving unmatched rows
# --------------------------------------------------------------------------

_LEFT_JOIN_ORACLE = """
SELECT
  c_custkey,
  c_name,
  count(o_orderkey)                           AS n_orders,
  round(coalesce(sum(o_totalprice), 0.0), 2)  AS total_spent
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY c_custkey
"""


@register("join_left_outer", _LEFT_JOIN_ORACLE, doc="left outer join + per-customer aggregate")
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with zero orders survive (count(o_orderkey)=0). The
    aggregate is on the join key, so Catalyst reuses the join's hash
    partitioning — no second shuffle."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS)
# --------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
ORDER BY c_custkey
"""


@register("join_semi", _SEMI_ORACLE, doc="left-semi join (EXISTS)")
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join ships only the distinct key set of the filtered side —
    at scale, far cheaper than join+distinct."""
    customer = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
ORDER BY c_custkey
"""


@register("join_anti", _ANTI_ORACLE, doc="left-anti join (NOT EXISTS)")
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no urgent order (non-empty at every SF — an anti
    join against all orders matches nobody, which tests nothing)."""
    customer = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Non-equi (range) join
# --------------------------------------------------------------------------

_RANGE_JOIN_ORACLE = """
SELECT
  p_brand,
  count(*)                  AS n_matches,
  round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
JOIN part ON l_partkey = p_partkey
         AND l_quantity BETWEEN p_size * 0.5 AND p_size
GROUP BY p_brand
ORDER BY p_brand
"""


@register("join_range", _RANGE_JOIN_ORACLE, doc="mixed equi + range join condition")
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The equi part (partkey) drives the join strategy — the range
    predicate evaluates as a post-join filter inside the hash join, so
    this stays O(n) rather than a banded cross join. part is broadcast."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == part.p_partkey)
        & (li.l_quantity >= part.p_size * 0.5)
        & (li.l_quantity <= part.p_size)
    )
    return (
        li.join(F.broadcast(part), cond)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# As-of join (most recent prior event), shuffle-once via union + window
# --------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH errors AS (
  SELECT user_id, ts FROM events WHERE event_type = 'error'
),
purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT
  p.event_id,
  p.user_id,
  round(p.value, 2) AS value,
  strftime(max(e.ts), '%Y-%m-%d %H:%M:%S') AS last_error_ts
FROM purchases p
LEFT JOIN errors e ON e.user_id = p.user_id AND e.ts <= p.ts
GROUP BY p.event_id, p.user_id, p.value
ORDER BY p.event_id
"""


@register("join_asof", _ASOF_ORACLE, doc="as-of join: latest error before each purchase")
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join without a range cross-join: tag both streams, union,
    sort per user by time, and carry the last-seen error timestamp
    forward with last(ignorenulls) — one shuffle on user_id, O(n log n)
    per key. (The oracle's LEFT JOIN + max() is O(n·m) per key — fine for
    DuckDB at sf0.01, exactly what we avoid at 100 TB.)

    Spark mapping of the reference-world "merge_asof" need (SURVEY.md
    §2.F joins row).
    """
    events = load(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(None).cast("double").alias("value"),
        F.col("ts").alias("error_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lit(None).cast("timestamp").alias("error_ts"),
    )
    # Errors sort before purchases at identical ts so `<=` semantics hold.
    merged = errors.withColumn("is_purchase", F.lit(0)).unionByName(
        purchases.withColumn("is_purchase", F.lit(1))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("last_error", F.last("error_ts", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select(
            "event_id",
            "user_id",
            F.round("value", 2).alias("value"),
            F.date_format("last_error", "yyyy-MM-dd HH:mm:ss").alias("last_error_ts"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# As-of join with tolerance (merge_asof(..., tolerance=1h) semantics)
# --------------------------------------------------------------------------

_ASOF_TOL_ORACLE = """
WITH errors AS (
  SELECT user_id, ts FROM events WHERE event_type = 'error'
),
purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT
  p.event_id,
  p.user_id,
  strftime(max(e.ts), '%Y-%m-%d %H:%M:%S') AS recent_error_ts
FROM purchases p
LEFT JOIN errors e
  ON e.user_id = p.user_id
 AND e.ts <= p.ts
 AND e.ts >= p.ts - INTERVAL 1 HOUR
GROUP BY p.event_id, p.user_id
ORDER BY p.event_id
"""


@register("join_asof_tolerance", _ASOF_TOL_ORACLE, doc="as-of join with 1h tolerance (bounded lookback)")
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of: same union+window carry-forward as
    join_asof, then matches older than the tolerance null out — the
    `merge_asof(tolerance=...)` contract. The tolerance ALSO bounds
    state: in the streaming version it becomes the watermark horizon."""
    events = load(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("error_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(None).cast("timestamp").alias("error_ts")
    )
    merged = errors.withColumn("is_purchase", F.lit(0)).unionByName(
        purchases.withColumn("is_purchase", F.lit(1))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("last_error", F.last("error_ts", ignorenulls=True).over(w))
    in_tolerance = F.col("last_error") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return (
        carried.filter(F.col("is_purchase") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format(
                F.when(in_tolerance, F.col("last_error")), "yyyy-MM-dd HH:mm:ss"
            ).alias("recent_error_ts"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Reconciliation: header totals vs line-level sums (data-quality join)
# --------------------------------------------------------------------------

_RECON_ORACLE = """
WITH line_sums AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS lines_total
  FROM lineitem GROUP BY l_orderkey
)
SELECT
  o_orderstatus,
  count(*) AS n_orders,
  count(CASE WHEN lines_total IS NULL THEN 1 END) AS n_headless,
  count(CASE WHEN lines_total IS NOT NULL
              AND abs(lines_total - o_totalprice) / o_totalprice > 0.5 THEN 1 END)
    AS n_large_discrepancy,
  round(CAST(avg(abs(lines_total - o_totalprice)) AS DOUBLE), 2) AS avg_abs_diff
FROM orders
LEFT JOIN line_sums ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("orders_reconciliation", _RECON_ORACLE, doc="header-vs-lines total reconciliation report")
def orders_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-vs-sink reconciliation — the data-quality join every ETL
    runs after a load: line-level sums (decimal-exact) outer-joined to
    header totals, counting missing and out-of-tolerance rows per status.
    One aggregate + one keyed join; the report is group-count sized."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    line_sums = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("lines_total")
    )
    joined = orders.join(line_sums, orders.o_orderkey == line_sums.l_orderkey, "left")
    rel_diff = F.abs(F.col("lines_total") - F.col("o_totalprice")) / F.col("o_totalprice")
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(F.col("lines_total").isNull(), 1)).alias("n_headless"),
            F.count(F.when(F.col("lines_total").isNotNull() & (rel_diff > 0.5), 1)).alias(
                "n_large_discrepancy"
            ),
            F.round(F.avg(F.abs(F.col("lines_total") - F.col("o_totalprice"))), 2).alias(
                "avg_abs_diff"
            ),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# LATERAL correlated subquery (per-row parameterized top-k)
# --------------------------------------------------------------------------

_LATERAL_ORACLE = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
WHERE c.c_custkey <= 50
ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
"""


@register(
    "join_lateral_topk",
    _LATERAL_ORACLE,
    doc="LATERAL correlated subquery: top-3 orders per customer",
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL LATERAL — the per-row parameterized-subquery shape users write
    when a window feels unnatural (per-entity top-k with entity-specific
    predicates). Catalyst DECORRELATES it: the executed plan is a hash
    join + per-key ranking, not a nested loop re-running the subquery per
    customer row (tests/test_plans.py pins this) — so the SQL-level
    convenience costs nothing at scale. The filtered customer side
    broadcasts; orders never shuffles twice."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
        WHERE c.c_custkey <= 50
        ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
        """
    )


# --------------------------------------------------------------------------
# Structured near-duplicate detection: candidate duplicate payments
# --------------------------------------------------------------------------

DUP_PAY_CENTS = 10_000  # amounts within $100
DUP_PAY_DAYS = 90       # order dates within 90 days
_DUP_PAY_BAND = DUP_PAY_CENTS  # band width == tolerance → ±1 band suffices

_DUP_PAY_ORACLE = f"""
WITH o AS (
  SELECT o_orderkey AS k, o_custkey AS c,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderdate AS d
  FROM orders
)
SELECT a.c AS custkey,
       a.k AS order_a,
       b.k AS order_b,
       a.cents AS cents_a,
       b.cents AS cents_b,
       CAST(abs(date_diff('day', a.d, b.d)) AS BIGINT) AS day_gap
FROM o a JOIN o b
  ON a.c = b.c AND a.k < b.k
 AND abs(a.cents - b.cents) <= {DUP_PAY_CENTS}
 AND abs(date_diff('day', a.d, b.d)) <= {DUP_PAY_DAYS}
ORDER BY custkey, order_a, order_b
"""


@register(
    "join_duplicate_payments",
    _DUP_PAY_ORACLE,
    doc=f"duplicate-payment candidates: same customer, amounts within ${DUP_PAY_CENTS // 100}, {DUP_PAY_DAYS} days",
)
def join_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured near-dup (the invoice-audit counterpart of the text
    dedup family): order pairs from one customer whose amounts agree
    within $100 and dates within 90 days.

    Scale shape: NOT the oracle's inequality self-join — amounts
    band-quantize at the tolerance width, one side explodes its band ±1
    (each qualifying pair meets on exactly ONE band value, so no
    post-join dedup), and the join is an equi-join on (custkey, band).
    A cluster joins this shuffle-hash on a key whose group size is a
    customer's orders inside one $100 band — bounded — where the naive
    per-customer self-join degrades quadratically on bulk payers.
    Exactness: integer cents and whole-day gaps end-to-end."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("c"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderdate").alias("d"),
    )
    left = o.withColumn("band", F.expr(f"cents div {_DUP_PAY_BAND}"))
    right = o.select(
        F.col("k").alias("kb"),
        F.col("c"),
        F.col("cents").alias("cents_b"),
        F.col("d").alias("db"),
        F.explode(
            F.expr(
                f"array(cents div {_DUP_PAY_BAND} - 1, cents div {_DUP_PAY_BAND},"
                f" cents div {_DUP_PAY_BAND} + 1)"
            )
        ).alias("band"),
    )
    return (
        left.join(right, ["c", "band"])
        .filter(
            (F.col("k") < F.col("kb"))
            & (F.abs(F.col("cents") - F.col("cents_b")) <= DUP_PAY_CENTS)
            & (F.abs(F.datediff(F.col("d"), F.col("db"))) <= DUP_PAY_DAYS)
        )
        .select(
            F.col("c").alias("custkey"),
            F.col("k").alias("order_a"),
            F.col("kb").alias("order_b"),
            F.col("cents").alias("cents_a"),
            "cents_b",
            F.abs(F.datediff(F.col("d"), F.col("db"))).cast("long").alias("day_gap"),
        )
        .orderBy("custkey", "order_a", "order_b")
    )


# --------------------------------------------------------------------------
# As-of join, nearest direction (merge_asof(..., direction='nearest'))
# --------------------------------------------------------------------------

_ASOF_NEAREST_ORACLE = """
WITH errors AS (
  SELECT user_id, ts FROM events WHERE event_type = 'error'
),
purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
cand AS (
  SELECT
    p.event_id,
    p.user_id,
    epoch_us(p.ts) - max(CASE WHEN e.ts <= p.ts THEN epoch_us(e.ts) END) AS d_back,
    min(CASE WHEN e.ts >= p.ts THEN epoch_us(e.ts) END) - epoch_us(p.ts) AS d_fwd
  FROM purchases p
  LEFT JOIN errors e ON e.user_id = p.user_id
  GROUP BY p.event_id, p.user_id, p.ts
)
SELECT event_id, user_id,
       CASE
         WHEN d_back IS NULL AND d_fwd IS NULL THEN 'none'
         WHEN d_fwd IS NULL THEN 'backward'
         WHEN d_back IS NULL THEN 'forward'
         WHEN d_back <= d_fwd THEN 'backward'
         ELSE 'forward'
       END AS direction,
       CAST(CASE
         WHEN d_back IS NULL AND d_fwd IS NULL THEN NULL
         WHEN d_fwd IS NULL THEN d_back
         WHEN d_back IS NULL THEN d_fwd
         WHEN d_back <= d_fwd THEN d_back
         ELSE d_fwd
       END AS BIGINT) AS delta_us
FROM cand
ORDER BY event_id
"""


@register(
    "join_asof_nearest",
    _ASOF_NEAREST_ORACLE,
    doc="as-of join, nearest error either side (backward wins ties)",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge_asof(direction='nearest') semantics: each purchase matches
    its temporally closest error in EITHER direction (backward wins
    ties) — completing the asof family next to `join_asof` (backward)
    and `join_asof_tolerance`. Same no-range-join plan: tag, union, one
    per-user sort, then a fill-forward last() AND a fill-backward
    first() over the merged stream — two mirrored windows on one
    shuffle, O(n log n) per key where the oracle's LEFT JOIN + min/max
    is O(n·m) per key.

    Exactness: deltas are exact integer microseconds; the
    direction/tie rule is pure integer comparison."""
    events = load(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.unix_micros("ts").alias("err_us"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("err_us"),
    )
    merged = errors.withColumn("is_purchase", F.lit(0)).unionByName(
        purchases.withColumn("is_purchase", F.lit(1))
    )
    order = [F.col("ts"), F.col("is_purchase"), F.col("event_id")]
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        merged.withColumn("prev_err", F.last("err_us", ignorenulls=True).over(w_back))
        .withColumn("next_err", F.first("err_us", ignorenulls=True).over(w_fwd))
        .filter(F.col("is_purchase") == 1)
        .select(
            "event_id",
            "user_id",
            (F.unix_micros("ts") - F.col("prev_err")).alias("d_back"),
            (F.col("next_err") - F.unix_micros("ts")).alias("d_fwd"),
        )
        .selectExpr(
            "event_id",
            "user_id",
            """CASE
                 WHEN d_back IS NULL AND d_fwd IS NULL THEN 'none'
                 WHEN d_fwd IS NULL THEN 'backward'
                 WHEN d_back IS NULL THEN 'forward'
                 WHEN d_back <= d_fwd THEN 'backward'
                 ELSE 'forward'
               END AS direction""",
            """CAST(CASE
                 WHEN d_back IS NULL AND d_fwd IS NULL THEN NULL
                 WHEN d_fwd IS NULL THEN d_back
                 WHEN d_back IS NULL THEN d_fwd
                 WHEN d_back <= d_fwd THEN d_back
                 ELSE d_fwd
               END AS BIGINT) AS delta_us""",
        )
        .orderBy("event_id")
    )
