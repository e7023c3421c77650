"""Streaming (and batch) Python DataSource over snapshot tables — the
consumer half of the lakehouse loop that streaming/ingest.py's
``snapshot_corpus`` mode opened: ingest commits versioned blind appends
into a sources/snapshots.py table; this module lets ANY downstream job
tail that table incrementally with plain Structured Streaming::

    spark.readStream.format("snapshot_table").load(path)

which is the Delta "streaming source" contract (reference analogue: the
chained-job pattern of JobControl, mapreduce/lib/jobcontrol/JobControl
.java:44, where a successor job consumes a predecessor's committed
output — promoted from run-once DAG edges to a continuously replayable
version log).

Design (PySpark 4.x Python DataSource API, pyspark.sql.datasource):

- **Offsets are log versions.** ``{"version": N}`` means "rows of every
  commit ≤ N have been emitted". Exactly-once comes for free: Spark
  checkpoints the offset; replaying a trigger replans the same
  (start, end] version window against the immutable log, and the files
  of a committed version never change (writers only add — snapshots.py's
  commit discipline).
- **Planning is log-only.** ``partitions(start, end)`` walks the
  reconstructed entries of the window and emits ONE partition PER ADDED
  FILE — O(changed slice) driver work, zero data IO, any number of
  appended files scan in parallel across executors.
- **Append-only by default, loud otherwise.** A version that removes or
  rewrites files (merge, CoW/MoR delete, optimize) is not expressible as
  an append stream. Default: raise with the offending version+op.
  ``skipChangeCommits=true`` (the Delta option, same name) skips those
  versions' data and keeps streaming the appends.
- **Schema is pinned at stream start** (the log's schema_json when the
  table has evolved, else the newest file's parquet schema). Later
  appended files are PROJECTED to the pinned schema executor-side
  (missing columns → nulls, new columns dropped) — restart the stream to
  pick up an add_columns widening. The log, not the data, owns the
  schema (the _files_df rule, snapshots.py).
- **Reads are Arrow-native.** ``read(partition)`` yields pyarrow
  RecordBatches straight from the parquet file — no Python row loop; the
  same batch-shaped boundary as every other Python-side operator here.
- **Rate limiting**: ``maxVersionsPerTrigger`` bounds how far
  ``latestOffset`` advances per trigger, so a backlogged consumer
  catches up in bounded micro-batches instead of one giant one.

The batch half (``spark.read.format("snapshot_table")``) serves the
same log through the DataSource surface with full merge-on-read
fidelity: deletion vectors ride in each partition and are anti-joined
against the batch keys with pyarrow executor-side — a
``version``/``timestamp`` option gives SQL-surface time travel.

Scale: at 100 TB the stream's cost per trigger is the appended slice —
planning reads ≤ _CHECKPOINT_EVERY log entries per version (bounded by
the checkpoint cadence), data IO is exactly the new files. Nothing here
is proportional to table size or table age.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from . import snapshots as sn

FORMAT_NAME = "snapshot_table"


class SnapshotFilePartition(InputPartition):
    """One data file of one committed version, self-contained for the
    executor: table path + file name + the stream's pinned schema (JSON)
    + the deletion-vector names to anti-join (batch reads only — a
    streamed append never carries vectors) + the key column the vectors
    suppress on."""

    def __init__(self, table_path: str, file_name: str, schema_json: str,
                 dv_names: tuple = (), key_col: str | None = None):
        self.table_path = table_path
        self.file_name = file_name
        self.schema_json = schema_json
        self.dv_names = tuple(dv_names)
        self.key_col = key_col


def _pinned_entry_schema(spark, entry: dict, table_path: str):
    """The Spark schema a snapshot entry pins: its schema_json when the
    table has evolved, else the parquet schema of its newest file."""
    from pyspark.sql.types import StructType

    if "schema_json" in entry:
        return StructType.fromJson(json.loads(entry["schema_json"]))
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    if not entry["files"]:
        raise ValueError(f"snapshot v{entry['version']} of {table_path} lists no files")
    name = entry["files"][-1]["name"]
    return from_arrow_schema(pq.read_schema(os.path.join(table_path, name)))


def _project_batch(batch, target):
    """Project an arrow RecordBatch onto the pinned arrow schema: pinned
    column order, missing columns become null arrays, extra columns are
    dropped, physical type drift (e.g. int32 file vs long schema) casts."""
    import pyarrow as pa

    cols = []
    have = {n: i for i, n in enumerate(batch.schema.names)}
    for field in target:
        i = have.get(field.name)
        if i is None:
            cols.append(pa.nulls(batch.num_rows, type=field.type))
        else:
            col = batch.column(i)
            cols.append(col if col.type == field.type else col.cast(field.type))
    return pa.RecordBatch.from_arrays(cols, schema=target)


def _read_file_batches(part: SnapshotFilePartition) -> Iterator:
    """Executor-side scan of one snapshot data file → projected arrow
    batches, with the partition's deletion vectors anti-joined out."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    target = to_arrow_schema(StructType.fromJson(json.loads(part.schema_json)))
    suppressed = None
    if part.dv_names:
        dv_dir = os.path.join(part.table_path, "_dvs")
        tabs = [pq.read_table(os.path.join(dv_dir, d)) for d in part.dv_names]
        dv = pa.concat_tables(tabs)
        # vectors are per (file, key): only rows recorded against THIS file
        mask = pc.equal(dv.column("_dv_file"), part.file_name)
        suppressed = dv.filter(mask).column(part.key_col)
    f = pq.ParquetFile(os.path.join(part.table_path, part.file_name))
    for batch in f.iter_batches():
        if suppressed is not None and len(suppressed):
            keep = pc.invert(
                pc.is_in(batch.column(part.key_col), value_set=suppressed)
            )
            batch = batch.filter(keep)
        if batch.num_rows:
            yield _project_batch(batch, target)


class SnapshotStreamReader(DataSourceStreamReader):
    """Version-offset incremental reader over a snapshot table's log."""

    def __init__(self, path: str, schema_json: str, options: dict):
        self._path = path
        self._schema_json = schema_json
        self._skip_change = str(
            options.get("skipchangecommits", "false")
        ).lower() in ("true", "1")
        self._max_versions = int(options.get("maxversionspertrigger", 0)) or None
        start = options.get("startingversion")
        # offset N = "emitted through version N"; startingVersion is the
        # first version whose rows ARE emitted (Delta semantics)
        self._initial = int(start) - 1 if start is not None else 0
        self._last_end: int | None = None

    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        cur = sn.current_version(self._path)
        if self._max_versions is not None:
            # base on the last window we handed out; a restarted reader
            # falls back to the configured start, which can lag the
            # checkpointed offset — Spark then just plans empty triggers
            # until the bound catches up (safe: never loses or repeats)
            base = self._last_end if self._last_end is not None else self._initial
            cur = min(cur, base + self._max_versions)
        self._last_end = max(cur, self._last_end or 0)
        return {"version": cur}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["version"], end["version"]
        parts: list[InputPartition] = []
        if hi <= lo:
            return parts
        def _entry(v: int) -> dict:
            try:
                return sn._read_entry(self._path, v)
            except FileNotFoundError as e:
                raise FileNotFoundError(
                    f"stream needs snapshot v{v} of {self._path} but it was "
                    "vacuumed away — pass startingVersion ≥ the oldest "
                    "retained version (or restart from a fresh checkpoint), "
                    "and keep the vacuum retention longer than the longest "
                    "consumer gap"
                ) from e

        prev = {fe["name"]: fe for fe in _entry(lo)["files"]} if lo > 0 else {}
        for v in range(lo + 1, hi + 1):
            entry = _entry(v)
            cur = {fe["name"]: fe for fe in entry["files"]}
            changed = any(
                name not in cur
                or sn._file_identity(cur[name]) != sn._file_identity(fe)
                for name, fe in prev.items()
            )
            if changed:
                if not self._skip_change:
                    raise ValueError(
                        f"version {v} of {self._path} (op={entry['op']}) "
                        "removes or rewrites files — not an append. Pass "
                        "skipChangeCommits=true to stream past change "
                        "commits, or consume table_changes() for CDC."
                    )
            else:
                for name in cur.keys() - prev.keys():
                    parts.append(
                        SnapshotFilePartition(self._path, name, self._schema_json)
                    )
            prev = cur
        return parts

    def read(self, partition: SnapshotFilePartition) -> Iterator:
        return _read_file_batches(partition)

    def commit(self, end: dict) -> None:
        # log cleanup is vacuum's job (retention-gated), not the consumer's
        pass


class SnapshotBatchReader(DataSourceReader):
    """Batch read of one pinned snapshot version through the DataSource
    surface — file-per-partition, deletion vectors applied per file."""

    def __init__(self, path: str, entry: dict, schema_json: str):
        self._path = path
        self._entry = entry
        self._schema_json = schema_json

    def partitions(self) -> Sequence[InputPartition]:
        key = self._entry["key_col"]
        return [
            SnapshotFilePartition(
                self._path, fe["name"], self._schema_json,
                dv_names=tuple(fe.get("dv", ())), key_col=key,
            )
            for fe in self._entry["files"]
        ]

    def read(self, partition: SnapshotFilePartition) -> Iterator:
        return _read_file_batches(partition)


class SnapshotTableDataSource(DataSource):
    """``spark.read[Stream].format("snapshot_table").load(path)``.

    Options: ``version`` / ``timestamp`` (batch time travel),
    ``startingVersion``, ``skipChangeCommits``, ``maxVersionsPerTrigger``
    (stream). Option keys are matched case-insensitively (Spark
    lower-cases DataSource options)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("snapshot_table needs a path: .load(<table dir>)")
        return p

    def _pinned(self) -> tuple[dict, str]:
        path = self._path()
        version = self.options.get("version")
        ts = self.options.get("timestamp")
        if version is not None and ts is not None:
            raise ValueError("pass version OR timestamp, not both")
        v = (
            int(version)
            if version is not None
            else sn.version_at_timestamp(path, float(ts))
            if ts is not None
            else sn.current_version(path)
        )
        entry = sn._read_entry(path, v)
        schema = _pinned_entry_schema(None, entry, path)
        return entry, json.dumps(schema.jsonValue())

    def schema(self):
        from pyspark.sql.types import StructType

        _, schema_json = self._pinned()
        return StructType.fromJson(json.loads(schema_json))

    def reader(self, schema) -> SnapshotBatchReader:
        # use the schema Spark RESOLVED at load() (the ``schema`` arg),
        # not a re-pin: the reader is instantiated at execution time, and
        # an add_columns landing between load() and execution would
        # otherwise desync the partitions from the plan's column count
        entry, _ = self._pinned()
        return SnapshotBatchReader(
            self._path(), entry, json.dumps(schema.jsonValue())
        )

    def streamReader(self, schema) -> SnapshotStreamReader:
        return SnapshotStreamReader(
            self._path(), json.dumps(schema.jsonValue()), dict(self.options)
        )


def register(spark) -> None:
    """Idempotent format registration for this session."""
    spark.dataSource.register(SnapshotTableDataSource)


def stream_table(spark, path: str, **options):
    """``readStream`` over a snapshot table (registers the format first).
    Keyword options mirror the DataSource options (startingVersion,
    skipChangeCommits, maxVersionsPerTrigger)."""
    register(spark)
    r = spark.readStream.format(FORMAT_NAME)
    for k, v in options.items():
        r = r.option(k, str(v))
    return r.load(path)


def read_table_ds(spark, path: str, version: int | None = None,
                  timestamp: float | None = None):
    """Batch time-travel read through the DataSource surface (same rows
    as snapshots.read_table, with deletion vectors applied)."""
    register(spark)
    r = spark.read.format(FORMAT_NAME)
    if version is not None:
        r = r.option("version", str(version))
    if timestamp is not None:
        r = r.option("timestamp", repr(float(timestamp)))
    return r.load(path)
