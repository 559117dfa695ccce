"""Streaming state-store inspection (Spark 4 ``statestore`` /
``state-metadata`` data sources).

Production streaming jobs accumulate opaque RocksDB/HDFS state; when a
job misbehaves (state growth, wrong aggregates after a backfill) the
operator needs to SEE that state without stopping the query. Spark 4
exposes every checkpoint's state as a readable DataFrame — these helpers
wrap it and add the reconciliation audit a pipeline actually runs:
compare the state the stream has accumulated against a batch recompute
of the same aggregation (the state is distributed-scanned like any
source; nothing collects to the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator/state-store inventory of a checkpoint: operator ids and
    names, store names, partition counts, min/max batch ids."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_state_store(
    spark: SparkSession,
    checkpoint: str,
    batch_id: int | None = None,
    operator_id: int = 0,
) -> DataFrame:
    """Keyed state of one operator as (key struct, value struct,
    partition_id) rows — at the latest committed batch by default, or
    time-travel to ``batch_id``."""
    reader = spark.read.format("statestore").option("operatorId", operator_id)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    return reader.load(checkpoint)


def state_reconciliation_audit(
    spark: SparkSession,
    checkpoint: str,
    batch_truth: DataFrame,
    key_col: str,
    count_col: str,
    state_value_field: str = "count",
) -> DataFrame:
    """Join the streaming aggregation's live state against a batch
    recompute of the same aggregate; emit per-key discrepancies (missing
    keys, drifted counts). Full-outer equi-join on the state key — both
    sides are aggregate-sized, shuffles keyed, nothing driver-side.

    ``state_value_field`` names the field inside the state's value struct
    to compare (``count`` for a count(1) aggregate, ``sum`` for a sum
    buffer, ...); inspect ``read_state_store(...).schema`` when unsure —
    Spark names the buffer fields after the aggregate functions."""
    state = read_state_store(spark, checkpoint).select(
        F.col(f"key.{key_col}").alias(key_col),
        F.col(f"value.{state_value_field}").alias("state_count"),
    )
    truth = batch_truth.select(key_col, F.col(count_col).alias("batch_count"))
    return (
        state.join(truth, key_col, "full_outer")
        .withColumn(
            "status",
            F.when(F.col("state_count").isNull(), "missing_in_state")
            .when(F.col("batch_count").isNull(), "missing_in_batch")
            .when(F.col("state_count") != F.col("batch_count"), "count_drift")
            .otherwise("ok"),
        )
        .orderBy(key_col)
    )
