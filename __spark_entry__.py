"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 pricing summary) at sf0.001.
``queries()``   — every implemented operator from SURVEY.md §2 (+ the
                  LLM-pipeline extensions), ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()``— DuckDB-runnable ANSI SQL equivalents, same column names.

All three delegate to :mod:`gluettalax_spark.registry` so the library,
CLI, and driver share one code path.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gluettalax_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from gluettalax_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
