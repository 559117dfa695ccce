"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API).

The reference ingests whatever AWS Glue catalogs point at; a Spark-native
engine additionally needs a clean extension point for sources Spark has
no built-in reader for (internal services, synthetic load, bespoke
formats). Spark 4's Python Data Source API is that extension point: the
source declares a schema and a *partitioning* of the read, and executors
pull partitions in parallel — the source is distributed like any file
scan, never a driver-side collect.

Implemented here:

* ``SyntheticEventsDataSource`` — deterministic event generator (batch
  reader with N input partitions, and a micro-batch stream reader with
  real offset bookkeeping). Deterministic by construction (value = pure
  hash of event_id), so tests can assert exact results and a re-read
  reproduces the same data — the property fixtures need.

Supports predicate pushdown of ``event_id`` range filters into the
generator (``pushFilters``) — demonstrating that even a Python source
participates in Catalyst's filter pushdown, the same contract a parquet
scan honors.

Deployment note: the reader classes are pickled by reference, so this
package must be importable by executor Python workers (the normal
"library installed on the cluster" story; locally, running from the repo
root suffices). Requires ``spark.sql.python.filterPushdown.enabled=true``
(set in session.py) for the pushFilters hook.
"""

from __future__ import annotations

import datetime as dt
import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

_EVENT_TYPES = ("view", "click", "signup", "purchase", "error")
_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

FORMAT_NAME = "synthetic_events"
SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"


def _row(i: int):
    """Pure function of the event id — executors regenerate identical rows
    regardless of partitioning, retries, or speculative re-execution."""
    h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")
    return (
        i,
        _EPOCH + dt.timedelta(seconds=i * 7),
        h % 1000,
        _EVENT_TYPES[h % len(_EVENT_TYPES)],
        round((h % 10_000) / 100.0, 2),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.lo, self.hi = 0, self.n_rows  # [lo, hi) after pushdown

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Fold event_id range predicates into the generation bounds; yield
        back (= decline) everything else so Spark re-applies it."""
        for f in filters:
            accepted = False
            if isinstance(f, (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)):
                if f.attribute == ("event_id",) and isinstance(f.value, int):
                    if isinstance(f, GreaterThan):
                        self.lo = max(self.lo, f.value + 1)
                    elif isinstance(f, GreaterThanOrEqual):
                        self.lo = max(self.lo, f.value)
                    elif isinstance(f, LessThan):
                        self.hi = min(self.hi, f.value)
                    else:
                        self.hi = min(self.hi, f.value + 1)
                    accepted = True
            if not accepted:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        n = max(1, self.n_partitions)
        total = max(0, self.hi - self.lo)
        step = (total + n - 1) // n if total else 1
        return [
            _RangePartition(s, min(s + step, self.hi))
            for s in range(self.lo, self.hi, step)
        ] or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


class _SyntheticEventsStreamReader(DataSourceStreamReader):
    """Micro-batch reader: the offset is the next unread event_id.
    Offsets are plain dicts the engine checkpoints — restart resumes
    exactly where the log says.

    ``latestOffset`` always reports the full backlog (``n_rows``), so the
    first micro-batch under any trigger spans the entire remaining range;
    ``rows_per_partition`` sizes the PARTITIONS within a batch, not the
    batches. This is deliberate: the Python DataSourceStreamReader API
    (Spark 4.x) exposes no admission control (ReadLimit), and advancing
    ``latestOffset`` incrementally instead stalls the query — the engine
    constructs fresh reader instances per poll, so ``commit()``-tracked
    state never reaches the instance answering ``latestOffset`` (verified
    empirically: both availableNow and processingTime triggers wedge at
    one batch). Batch-size admission control belongs to sources whose JVM
    half implements SupportsAdmissionControl; a Python source caps work
    per TASK via partition size instead."""

    def __init__(self, options):
        # rows_per_batch accepted as a legacy alias of rows_per_partition.
        self.rows_per_partition = int(
            options.get("rows_per_partition", options.get("rows_per_batch", 100))
        )
        self.max_rows = int(options.get("n_rows", 1000))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def latestOffset(self) -> dict:
        return {"next": self.max_rows}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # Must cover the FULL [start, end) range the engine asked for —
        # clamping here would silently drop data (offsets already
        # committed past it). rows_per_partition only sizes the chunks.
        lo, hi = start["next"], end["next"]
        return [
            _RangePartition(s, min(s + self.rows_per_partition, hi))
            for s in range(lo, hi, self.rows_per_partition)
        ] or [_RangePartition(lo, hi)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticEventsReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _SyntheticEventsStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration of the custom format with a session."""
    spark.dataSource.register(SyntheticEventsDataSource)
