"""Built-in jobs: the pipelines a GLUEttalax user would define as Glue
job scripts, pre-registered so the CLI works out of the box
(``gluettalax runj nightly_etl --THE_DATE=19961112``, mirroring the
reference README's example invocation).

Each job is ``(spark, **string_args) -> DataFrame`` — string args exactly
as the reference passes them (``--key value`` strings, gluettalax.py:254;
parse inside the job, never in the runner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gluettalax_spark.jobs import default_registry
from gluettalax_spark.tables import load

_DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def nightly_etl(spark: SparkSession, **args: str) -> DataFrame:
    """Pricing summary as of THE_DATE (yyyymmdd string, reference README
    style) — the flagship Q1 parameterized the way a scheduled Glue job
    would be."""
    sf_dir = args.get("SF_DIR", _DEFAULT_SF_DIR)
    the_date = args.get("THE_DATE", "19970101")
    cutoff = f"{the_date[:4]}-{the_date[4:6]}-{the_date[6:8]} 00:00:00"
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def dedup_report(spark: SparkSession, **args: str) -> DataFrame:
    """Daily dedup report: exact-duplicate groups over documents."""
    from gluettalax_spark.operators.dedup import dedup_exact

    sf_dir = args.get("SF_DIR", _DEFAULT_SF_DIR)
    return dedup_exact(spark, sf_dir).filter(F.col("n_copies") > 1)


def corpus_stats(spark: SparkSession, **args: str) -> DataFrame:
    """Per-language corpus rollup (the monitoring job of a text pipeline)."""
    from gluettalax_spark.operators.text import text_corpus_stats

    sf_dir = args.get("SF_DIR", _DEFAULT_SF_DIR)
    return text_corpus_stats(spark, sf_dir)


def register_builtin_jobs() -> None:
    """Idempotent registration into the default registry."""
    existing = set(default_registry.list_jobs())
    if "nightly_etl" not in existing:
        default_registry.register("nightly_etl", nightly_etl, timeout=3600.0, max_concurrent_runs=1)
    if "dedup_report" not in existing:
        default_registry.register("dedup_report", dedup_report, timeout=3600.0, max_concurrent_runs=2)
    if "corpus_stats" not in existing:
        default_registry.register("corpus_stats", corpus_stats, timeout=3600.0, max_concurrent_runs=2)


register_builtin_jobs()
