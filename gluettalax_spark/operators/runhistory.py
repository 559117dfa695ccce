"""Run-history analytics — dogfooding the control plane's runs table.

The reference's run history (gluettalax.py:305-345: ``list_runs`` /
``print_job_runs``) is a table the engine itself maintains; SURVEY §1.4
calls for querying it with the same data-plane machinery as any fixture
table. This module replays a DETERMINISTIC history (derived from the
``orders`` fixture so a DuckDB oracle can re-derive it bit-for-bit)
through :class:`gluettalax_spark.jobs.JobRegistry` and runs the
operational analytics a scheduler dashboard needs — per-job run counts,
success rate, exact p50 duration, and the D7 latest-run window — all
over ``JobRegistry.runs_df``'s DataFrame plan, not a side channel.

Scale: run history is control-plane cardinality (thousands of rows, not
data-scale) — the 500-run replay is a bounded ``TakeOrderedAndProject``
collect, and the analytics aggregate by job name (≤ number of jobs
groups). At 100 TB the history table is still tiny; the same plan holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gluettalax_spark.jobs import FAILED, RUNNING, SUCCEEDED, JobRegistry, JobRun
from gluettalax_spark.registry import register
from gluettalax_spark.tables import load

# Bounded, deterministic replay size: first N orders by key.
_N_RUNS = 500

_STATE_BY_STATUS = {"F": SUCCEEDED, "O": RUNNING, "P": FAILED}


def _replayed_registry(spark: SparkSession, sf_dir: str) -> JobRegistry:
    """A JobRegistry whose history is a deterministic function of the
    orders fixture: run ``o_orderkey`` of job ``n_name`` (keyed by
    ``o_custkey % 25``), state from ``o_orderstatus``, start time from
    ``o_orderdate``, duration = (price cents mod 86400) / 100 seconds —
    exact-integer derivation so the DuckDB oracle reproduces it."""
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    rows = (
        orders.orderBy("o_orderkey")
        .limit(_N_RUNS)
        .join(F.broadcast(nation), F.col("o_custkey") % 25 == F.col("n_nationkey"))
        .select(
            F.col("o_orderkey").cast("string").alias("run_id"),
            F.col("n_name").alias("job_name"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderdate").alias("started_on"),
            (
                (F.round(F.col("o_totalprice") * 100).cast("long") % 86400).cast("double") / 100.0
            ).alias("execution_time"),
        )
        .collect()  # ≤ _N_RUNS rows: control-plane scale by construction
    )
    reg = JobRegistry()
    reg.load_history(
        JobRun(
            run_id=r.run_id,
            job_name=r.job_name,
            arguments={},
            state=_STATE_BY_STATUS.get(r.status, FAILED),
            started_on=r.started_on,
            execution_time=r.execution_time,
        )
        for r in rows
    )
    return reg


_RUN_HISTORY_ORACLE = f"""
WITH hist AS (
  SELECT CAST(o.o_orderkey AS VARCHAR) AS run_id,
         n.n_name AS job_name,
         CASE o.o_orderstatus WHEN 'F' THEN 'SUCCEEDED'
                              WHEN 'O' THEN 'RUNNING'
                              ELSE 'FAILED' END AS state,
         o.o_orderdate AS started_on,
         CAST(CAST(round(o.o_totalprice * 100) AS BIGINT) % 86400 AS DOUBLE) / 100.0
           AS execution_time
  FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT {_N_RUNS}) o
  JOIN nation n ON n.n_nationkey = o.o_custkey % 25
),
last AS (
  SELECT job_name, state AS last_run_state
  FROM (SELECT job_name, state,
               row_number() OVER (PARTITION BY job_name
                                  ORDER BY started_on DESC, run_id) AS rn
        FROM hist)
  WHERE rn = 1
),
agg AS (
  SELECT job_name,
         CAST(count(*) AS BIGINT) AS n_runs,
         CAST(sum(CASE WHEN state = 'SUCCEEDED' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_succeeded,
         quantile_cont(execution_time, 0.5) AS p50_exec_sec
  FROM hist GROUP BY job_name
)
SELECT a.job_name, a.n_runs, a.n_succeeded,
       CAST(a.n_succeeded AS DOUBLE) / a.n_runs AS success_rate,
       a.p50_exec_sec, l.last_run_state
FROM agg a JOIN last l USING (job_name)
ORDER BY a.job_name
"""


@register("jobs_run_history_stats", _RUN_HISTORY_ORACLE)
def jobs_run_history_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-job operational stats over ``JobRegistry.runs_df`` — run count,
    success rate, exact p50 duration, and the latest run's state via the
    D7 per-group window (reference ``print_job_runs``, gluettalax.py:343).

    Exactness: durations are cents-integer-derived doubles; the only
    float folds are one division and one two-point median interpolation,
    both deterministic IEEE in Spark and DuckDB."""
    runs = _replayed_registry(spark, sf_dir).runs_df(spark)

    w = Window.partitionBy("job_name").orderBy(F.col("started_on").desc(), F.col("run_id"))
    last = (
        runs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("job_name", F.col("state").alias("last_run_state"))
    )
    agg = runs.groupBy("job_name").agg(
        F.count("*").cast("long").alias("n_runs"),
        F.sum(F.when(F.col("state") == SUCCEEDED, 1).otherwise(0)).cast("long").alias("n_succeeded"),
        F.percentile("execution_time", F.lit(0.5)).alias("p50_exec_sec"),
    )
    return (
        agg.join(last, "job_name")
        .select(
            "job_name",
            "n_runs",
            "n_succeeded",
            (F.col("n_succeeded").cast("double") / F.col("n_runs")).alias("success_rate"),
            "p50_exec_sec",
            "last_run_state",
        )
        .orderBy("job_name")
    )
