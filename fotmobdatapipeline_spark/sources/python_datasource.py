"""Python DataSource API (Spark 4) sources: a JSONL document-corpus
reader and a deterministic streaming feed over the same files.

The reference ingests scraped JSON payloads with driver-side Python
(SURVEY.md §2.1 S2); Spark 4's ``pyspark.sql.datasource`` lets the same
ingestion logic run AS a first-class source — partition-parallel,
schema-checked, usable from ``spark.read.format(...)`` — instead of a
collect-and-parallelize script.

Scale notes:

* ``JsonlDocsDataSource`` plans ONE InputPartition PER FILE, so a
  1000-executor cluster reads 100k shards with full parallelism and no
  driver bottleneck; ``read`` yields Arrow RecordBatches (the
  vectorized path — rows cross the Python→JVM boundary as columnar
  batches, not pickled tuples).
* ``DocsFeedStreamReader`` is a ``SimpleDataSourceStreamReader``:
  offsets are line counts over the sorted shard list, so replay
  (``readBetweenOffsets``) is deterministic.  The *simple* reader reads
  on the driver — right for low-throughput control feeds; a
  partition-parallel ``streamReader`` is the high-volume path.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

DEFAULT_DOCS_SCHEMA = "doc_id bigint, source string, lang string, text string"

_ARROW_TYPES = {
    "long": pa.int64(),
    "integer": pa.int32(),
    "double": pa.float64(),
    "string": pa.string(),
    "boolean": pa.bool_(),
}


def _list_shards(options: dict) -> list[str]:
    path = options.get("path")
    if not path:
        raise ValueError("jsonl_docs: 'path' option (or load(path)) is required")
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.json"))) + sorted(
            glob.glob(os.path.join(path, "*.jsonl"))
        )
    else:
        files = sorted(glob.glob(path))
    # Spark's hidden-file convention: _metadata/_MANIFEST/.crc etc. are
    # never data shards.
    return [
        f
        for f in files
        if os.path.getsize(f) > 0
        and not os.path.basename(f).startswith(("_", "."))
    ]


def _arrow_schema(schema: StructType) -> pa.Schema:
    fields = []
    for f in schema.fields:
        name = f.dataType.typeName()
        if name not in _ARROW_TYPES:
            raise ValueError(f"jsonl_docs: unsupported field type {name!r}")
        fields.append(pa.field(f.name, _ARROW_TYPES[name]))
    return pa.schema(fields)


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlDocsReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._files = _list_shards(options)
        self._batch_rows = int(options.get("batchrows", "4096"))

    def partitions(self) -> list[InputPartition]:
        # One partition per shard file: executor-parallel, no driver I/O.
        return [_ShardPartition(f) for f in self._files]

    def read(self, partition: _ShardPartition) -> Iterator[pa.RecordBatch]:
        arrow = _arrow_schema(self._schema)
        names = arrow.names
        rows: list[dict] = []
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                obj = json.loads(line)
                rows.append({n: obj.get(n) for n in names})
                if len(rows) >= self._batch_rows:
                    yield pa.RecordBatch.from_pylist(rows, schema=arrow)
                    rows = []
        if rows:
            yield pa.RecordBatch.from_pylist(rows, schema=arrow)


class DocsFeedStreamReader(SimpleDataSourceStreamReader):
    """Replayable micro-batch feed: offset = global line index over the
    sorted shard list; every (start, end) range re-reads identically."""

    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._options = options
        self._max_rows = int(options.get("maxrowsperbatch", "500"))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def _read_range(self, start: int, end: int | None) -> tuple[list[tuple], int]:
        names = [f.name for f in self._schema.fields]
        out: list[tuple] = []
        idx = 0
        for path in _list_shards(self._options):
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    if idx >= start:
                        if end is not None and idx >= end:
                            return out, idx
                        obj = json.loads(line)
                        out.append(tuple(obj.get(n) for n in names))
                        if end is None and len(out) >= self._max_rows:
                            return out, idx + 1
                    idx += 1
        return out, idx

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        rows, nxt = self._read_range(start["index"], None)
        return iter(rows), {"index": nxt}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        rows, _ = self._read_range(start["index"], end["index"])
        return iter(rows)


class JsonlDocsDataSource(DataSource):
    """``spark.read.format("jsonl_docs").load(dir)`` — one task per
    shard, Arrow-batched rows; also a streaming feed via ``readStream``.
    """

    @classmethod
    def name(cls) -> str:
        return "jsonl_docs"

    def schema(self) -> str:
        return self.options.get("schema", DEFAULT_DOCS_SCHEMA)

    def reader(self, schema: StructType) -> JsonlDocsReader:
        return JsonlDocsReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> DocsFeedStreamReader:
        return DocsFeedStreamReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "JsonlDocsWriter":
        return JsonlDocsWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> "JsonlDocsStreamWriter":
        return JsonlDocsStreamWriter(self.options, overwrite)


def register_python_sources(spark) -> None:
    """Idempotently register all Python data sources on a session.

    Ships the package zip first: Spark pickles the DataSource class by
    module reference, and the planning/reading Python workers must be
    able to import it even when the driver found us via a bare sys.path
    entry (the external-driver case)."""
    from fotmobdatapipeline_spark.session import ship_package

    ship_package(spark)
    spark.dataSource.register(JsonlDocsDataSource)


# -- writer half: JSONL sink with manifest-committed shards ---------------


class _ShardCommit(WriterCommitMessage):
    def __init__(self, staged: str, rows: int):
        self.staged = staged
        self.rows = rows


def _stage_rows(path: str, iterator) -> _ShardCommit | None:
    """Task-side: stream rows into one staged JSONL shard.  The staged
    name is unique per task attempt, so speculative/retried attempts
    never collide; only the driver's commit makes any shard visible."""
    import uuid

    os.makedirs(os.path.join(path, "_staging"), exist_ok=True)
    staged = os.path.join(path, "_staging", f"{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(staged, "w", encoding="utf-8") as fh:
        for row in iterator:
            fh.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
            n += 1
    if n == 0:
        os.remove(staged)
        return None
    return _ShardCommit(staged, n)


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_MANIFEST.json")


def _read_manifest(path: str) -> dict:
    try:
        with open(_manifest_path(path), encoding="utf-8") as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {"batches": {}, "files": []}


def _write_manifest_atomic(path: str, manifest: dict) -> None:
    tmp = _manifest_path(path) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, sort_keys=True)
    os.replace(tmp, _manifest_path(path))


def _publish_shards(path: str, messages, prefix: str) -> list[str]:
    """Driver-side: rename staged shards to their committed names.
    Renames are same-filesystem (staging lives inside the table dir)."""
    final = []
    for i, m in enumerate(m for m in messages if m is not None):
        name = f"{prefix}part-{i:05d}.jsonl"
        os.replace(m.staged, os.path.join(path, name))
        final.append(name)
    return final


class JsonlDocsWriter(DataSourceWriter):
    """Batch JSONL sink: tasks stage shards, the driver's commit
    publishes them and writes the manifest in one atomic replace —
    readers see all-or-nothing.  Driver/worker-shared filesystem
    assumption, same as the reader half of this surface."""

    def __init__(self, options: dict, overwrite: bool):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("jsonl_docs: 'path' option is required to write")
        self._overwrite = overwrite

    def write(self, iterator):
        return _stage_rows(self._path, iterator)

    def commit(self, messages) -> None:
        if self._overwrite:
            for f in glob.glob(os.path.join(self._path, "*.jsonl")):
                os.remove(f)
        files = _publish_shards(self._path, messages, "")
        _write_manifest_atomic(
            self._path,
            {
                "files": sorted(files),
                "rows": sum(m.rows for m in messages if m is not None),
            },
        )

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


class JsonlDocsStreamWriter(DataSourceStreamWriter):
    """Streaming JSONL sink with EXACTLY-ONCE publication: shards land
    as ``batch-<id>-part-*.jsonl`` only when the driver commits, and
    the manifest records each batch id — a REPLAYED batch (foreachBatch
    restart semantics) is detected there and its staged shards are
    dropped instead of double-publishing.  State lives in the table
    (manifest), not the operator — the maintenance-sink doctrine."""

    def __init__(self, options: dict, overwrite: bool):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("jsonl_docs: 'path' option is required to write")

    def write(self, iterator):
        return _stage_rows(self._path, iterator)

    def commit(self, messages, batchId: int) -> None:
        manifest = _read_manifest(self._path)
        if str(batchId) in manifest["batches"]:
            self.abort(messages, batchId)  # replayed batch: drop shards
            return
        files = _publish_shards(self._path, messages, f"batch-{batchId}-")
        manifest["batches"][str(batchId)] = {
            "files": sorted(files),
            "rows": sum(m.rows for m in messages if m is not None),
        }
        manifest["files"] = sorted(set(manifest["files"]) | set(files))
        _write_manifest_atomic(self._path, manifest)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)
