"""Custom Python Data Source WRITER (Spark 4 ``pyspark.sql.datasource``).

``pydatasource.py`` covers the read half of the Python Data Source API
(batch partitions, filter pushdown, micro-batch offsets); this module
completes the surface with the WRITE half — and uses it to demonstrate
the distributed two-phase commit protocol every exactly-once sink is
built on (the Hadoop/cloud committer pattern in miniature):

1. Each TASK writes its partition to a private ``part-*.jsonl.tmp`` file
   and returns a :class:`WriterCommitMessage` describing it. A failed or
   speculative task leaves only an invisible temp file.
2. The DRIVER's ``commit()`` — called once, only when every task
   succeeded — renames the temp files into place and writes a
   ``_MANIFEST.json`` naming the committed files (plus row counts and
   the schema). ``abort()`` deletes the temp files instead.
3. The paired READER lists the MANIFEST, not the directory: a crashed
   job's leftovers are invisible because visibility is defined by the
   atomically-written manifest, not by file existence.

The streaming writer is the same protocol per micro-batch, keyed by
``batchId``: re-committing a replayed batch OVERWRITES that batch's
manifest entry (idempotent), which is exactly how a foreachBatch-style
sink achieves effective exactly-once on retries.

Cluster note: executors here share the driver's filesystem; on a real
cluster ``path`` would be object storage and the rename becomes a
copy/manifest-flip — the protocol (task temp + driver manifest commit)
is unchanged. JSONL keeps the demo dependency-free; a real format would
write parquet per task with identical commit semantics.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

FORMAT_NAME = "jsonl_manifest"
MANIFEST = "_MANIFEST.json"


class _FileCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path, self.rows = tmp_path, rows


def _write_partition(path: str, schema_names: list[str], iterator, fmt: str, arrow_schema) -> _FileCommit:
    """Task-side half: rows to a private temp file, metadata back.

    ``jsonl`` keeps the demo human-readable (JSON-safe types only);
    ``parquet`` is the production-shaped path — real columnar files per
    task (so binary/timestamp columns round-trip exactly) under the
    SAME commit protocol. The format is per file (dispatch on
    extension), the protocol doesn't care."""
    os.makedirs(path, exist_ok=True)
    n = 0
    if fmt == "parquet":
        import pyarrow as pa
        import pyarrow.parquet as pq

        tmp = os.path.join(path, f"part-{uuid.uuid4().hex}.parquet.tmp")
        rows = [row.asDict() for row in iterator]
        n = len(rows)
        pq.write_table(pa.Table.from_pylist(rows, schema=arrow_schema), tmp)
    else:
        tmp = os.path.join(path, f"part-{uuid.uuid4().hex}.jsonl.tmp")
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps([row[c] for c in schema_names], default=str) + "\n")
                n += 1
    return _FileCommit(tmp, n)


def _task_format(options) -> str:
    fmt = options.get("format", "jsonl")
    if fmt not in ("jsonl", "parquet"):
        raise ValueError(f"jsonl_manifest: unsupported task format {fmt!r}")
    return fmt


def _maybe_arrow_schema(fmt: str, schema):
    if fmt != "parquet":
        return None
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema)


def _load_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as fh:
        return json.load(fh)


def _store_manifest(path: str, manifest: dict) -> None:
    # Atomic flip: visibility changes in one rename.
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(path, MANIFEST))


class _JsonlManifestWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options["path"]
        self.schema_names = list(schema.fieldNames())
        self.schema_json = schema.json()
        self.fmt = _task_format(options)
        self.arrow_schema = _maybe_arrow_schema(self.fmt, schema)
        self.overwrite = overwrite

    def write(self, iterator) -> WriterCommitMessage:
        return _write_partition(
            self.path, self.schema_names, iterator, self.fmt, self.arrow_schema
        )

    def commit(self, messages) -> None:
        files = []
        for m in messages:
            if m is None:
                continue
            final = m.tmp_path[: -len(".tmp")]
            os.replace(m.tmp_path, final)
            files.append({"file": os.path.basename(final), "rows": m.rows})
        prev = []
        if os.path.exists(os.path.join(self.path, MANIFEST)):
            old = _load_manifest(self.path)["files"]
            if self.overwrite:
                for f in old:  # old files lose visibility; reclaim them
                    p = os.path.join(self.path, f["file"])
                    if os.path.exists(p):
                        os.remove(p)
            else:
                prev = old
        _store_manifest(
            self.path, {"schema": self.schema_json, "files": prev + files}
        )

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class _JsonlManifestStreamWriter(DataSourceStreamWriter):
    """Per-micro-batch two-phase commit. The manifest keys files by
    batch id, so a replayed batch replaces (never duplicates) its own
    output — the idempotent-sink contract streaming exactly-once needs."""

    def __init__(self, options, schema):
        self.path = options["path"]
        self.schema_names = list(schema.fieldNames())
        self.schema_json = schema.json()
        self.fmt = _task_format(options)
        self.arrow_schema = _maybe_arrow_schema(self.fmt, schema)

    def write(self, iterator) -> WriterCommitMessage:
        return _write_partition(
            self.path, self.schema_names, iterator, self.fmt, self.arrow_schema
        )

    def commit(self, messages, batchId: int) -> None:
        files = []
        for m in messages:
            if m is None:
                continue
            final = m.tmp_path[: -len(".tmp")]
            os.replace(m.tmp_path, final)
            files.append({"file": os.path.basename(final), "rows": m.rows})
        manifest = {"schema": self.schema_json, "batches": {}}
        if os.path.exists(os.path.join(self.path, MANIFEST)):
            manifest = _load_manifest(self.path)
            manifest.setdefault("batches", {})
        replaced = manifest["batches"].get(str(batchId))
        if replaced:  # replayed batch: its old files lose visibility
            for f in replaced:
                old = os.path.join(self.path, f["file"])
                if os.path.exists(old):
                    os.remove(old)
        manifest["batches"][str(batchId)] = files
        manifest["files"] = [f for fs in manifest["batches"].values() for f in fs]
        _store_manifest(self.path, manifest)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class _ManifestFilePartition(InputPartition):
    def __init__(self, path: str, rows: int):
        self.path, self.rows = path, rows


class _JsonlManifestReader(DataSourceReader):
    """Reads ONLY manifest-listed files — one input partition each, so
    the scan parallelism is the committed file count and uncommitted
    leftovers are invisible by construction."""

    def __init__(self, options):
        self.path = options["path"]
        self.manifest = _load_manifest(self.path)

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _ManifestFilePartition(os.path.join(self.path, f["file"]), f["rows"])
            for f in self.manifest["files"]
        ] or [_ManifestFilePartition("", 0)]

    def read(self, partition: _ManifestFilePartition):
        if not partition.path:
            return
        if partition.path.endswith(".parquet"):
            # Columnar path: yield Arrow batches straight through (the
            # Python Data Source API accepts RecordBatch yields — no
            # per-row Python materialization).
            import pyarrow.parquet as pq

            yield from pq.read_table(partition.path).to_batches()
            return
        with open(partition.path) as fh:
            for line in fh:
                yield tuple(json.loads(line))


class JsonlManifestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        # Read side: the schema travels in the manifest (StructType JSON).
        from pyspark.sql.types import StructType

        return StructType.fromJson(
            json.loads(_load_manifest(self.options["path"])["schema"])
        )

    def reader(self, schema) -> DataSourceReader:
        return _JsonlManifestReader(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _JsonlManifestWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return _JsonlManifestStreamWriter(self.options, schema)


def register_manifest_sink(spark) -> None:
    """Idempotent registration of the custom format with a session."""
    spark.dataSource.register(JsonlManifestDataSource)


def compact_manifest_sink(path: str, target_rows: int = 100_000) -> dict:
    """Small-file compaction for a committed manifest sink — the VACUUM /
    OPTIMIZE half of the sink lifecycle (many micro-batches or tasks →
    many tiny files → listing and open() overheads dominate reads).

    Protocol mirrors the writer's two-phase commit, so compaction is
    crash-safe at every step:

    1. committed files are binned greedily to ~``target_rows`` and each
       bin is rewritten to a private ``compact-*.tmp`` file (invisible:
       visibility is manifest membership, not file existence);
    2. the manifest is flipped ATOMICALLY to the compacted file list
       (one rename — a reader sees the old set or the new set, never a
       mix); for streaming manifests the batch ledger collapses to a
       ``_compacted`` baseline so later batch commits rebuild ``files``
       on top of the compacted base, not the dead entries;
    3. only after the flip are the superseded physical files deleted — a
       crash between 2 and 3 leaves invisible orphans, never data loss.

    Cluster note: on object storage the rewrite is a distributed job and
    the deletes are a retention sweep, but the manifest-flip protocol is
    identical (this is precisely Delta/Iceberg OPTIMIZE + VACUUM).

    Returns the new manifest. Local-filesystem driver-side by design —
    the sink itself is the single-node demo of the cloud committer."""
    man = _load_manifest(path)
    files = man.get("files", [])
    if len(files) <= 1:
        return man

    fmt = "parquet" if files[0]["file"].endswith(".parquet") else "jsonl"

    # Greedy row-count bin packing in manifest order (stable).
    bins: list[list[dict]] = [[]]
    acc = 0
    for f in files:
        if bins[-1] and acc + f["rows"] > target_rows:
            bins.append([])
            acc = 0
        bins[-1].append(f)
        acc += f["rows"]

    new_files: list[dict] = []
    tmp_paths: list[str] = []
    for i, group in enumerate(bins):
        name = f"compact-{uuid.uuid4().hex}-{i}.{ 'parquet' if fmt == 'parquet' else 'jsonl'}"
        tmp = os.path.join(path, name + ".tmp")
        rows = 0
        if fmt == "jsonl":
            with open(tmp, "w") as out:
                for f in group:
                    with open(os.path.join(path, f["file"])) as src:
                        for line in src:
                            out.write(line)
                            rows += 1
        else:
            import pyarrow as pa
            import pyarrow.parquet as pq

            tables = [
                pq.read_table(os.path.join(path, f["file"])) for f in group
            ]
            merged = pa.concat_tables(tables)
            pq.write_table(merged, tmp)
            rows = merged.num_rows
        assert rows == sum(f["rows"] for f in group), "compaction lost rows"
        tmp_paths.append(tmp)
        new_files.append({"file": name, "rows": rows})

    # Make the compacted files real (still invisible — not in manifest).
    for tmp in tmp_paths:
        os.replace(tmp, tmp[: -len(".tmp")])

    new_man = {k: v for k, v in man.items() if k not in ("files", "batches")}
    new_man["files"] = new_files
    if "batches" in man:
        new_man["batches"] = {"_compacted": new_files}
    _store_manifest(path, new_man)  # the atomic visibility flip

    for f in files:  # now-invisible originals: reclaim
        p = os.path.join(path, f["file"])
        if os.path.exists(p):
            os.remove(p)
    return new_man
