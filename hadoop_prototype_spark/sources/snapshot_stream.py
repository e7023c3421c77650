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
- **``readChangeFeed=true`` streams EVERY commit as row-level CDC** (the
  Delta CDF streaming option): rows carry ``_change`` (insert /
  update_preimage / update_postimage / delete — the table_changes
  classification) and ``_commit_version``. Appends stay the one-file
  partitions tagged 'insert'; a change commit becomes ONE partition
  holding the version's changed file sides (diffed on name + DV state,
  the changed_frames rule), and the executor computes the exact multiset
  row diff with DuckDB EXCEPT ALL — cost is the version's changed
  slice, compaction rewrites cancel to zero rows, and the feed is pinned
  version-by-version against batch table_changes in tests.
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
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
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
                 dv_names: tuple = (), key_col: str | None = None,
                 version: int | None = None,
                 mapping: dict | None = None):
        self.table_path = table_path
        self.file_name = file_name
        self.schema_json = schema_json
        self.dv_names = tuple(dv_names)
        self.key_col = key_col
        self.version = version  # the commit this file was appended by (CDC)
        # logical→physical column map of the PINNED entry (renamed/dropped
        # tables): physical names are stable across renames, so the
        # pinned mapping resolves every later file too
        self.mapping = dict(mapping) if mapping else {}


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


def _project_batch(batch, target, name_map: dict | None = None):
    """Project an arrow RecordBatch onto the pinned arrow schema: pinned
    column order, missing columns become null arrays, extra columns are
    dropped, physical type drift (e.g. int32 file vs long schema) casts.
    ``name_map`` (logical→physical, renamed/dropped tables) looks each
    pinned logical field up under its in-file physical name."""
    import pyarrow as pa

    m = name_map or {}
    cols = []
    have = {n: i for i, n in enumerate(batch.schema.names)}
    for field in target:
        i = have.get(m.get(field.name, field.name))
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
    pkey = part.mapping.get(part.key_col, part.key_col) if part.key_col else None
    if part.dv_names:
        dv_dir = os.path.join(part.table_path, "_dvs")
        tabs = [pq.read_table(os.path.join(dv_dir, d)) for d in part.dv_names]
        dv = pa.concat_tables(tabs)
        # vectors are per (file, key), stored under the PHYSICAL key name:
        # only rows recorded against THIS file
        mask = pc.equal(dv.column("_dv_file"), part.file_name)
        suppressed = dv.filter(mask).column(pkey)
    f = pq.ParquetFile(os.path.join(part.table_path, part.file_name))
    for batch in f.iter_batches():
        if suppressed is not None and len(suppressed):
            keep = pc.invert(
                pc.is_in(batch.column(pkey), value_set=suppressed)
            )
            batch = batch.filter(keep)
        if batch.num_rows:
            yield _project_batch(batch, target, part.mapping)


class SnapshotCdcPartition(InputPartition):
    """One VERSION's row-level change feed: the files whose contents
    differ between v-1 and v (by _file_identity — name + deletion-vector
    state), each side with the vector names to apply. The executor diffs
    the two sides with DuckDB EXCEPT ALL (exact multiset semantics, the
    same classification as snapshots.table_changes) — cost is the
    version's CHANGED SLICE, never the table."""

    def __init__(self, table_path: str, version: int, schema_json: str,
                 key_col: str,
                 before: tuple,   # ((file_name, dv_names), ...)
                 after: tuple,
                 mapping: dict | None = None):
        self.table_path = table_path
        self.version = version
        self.schema_json = schema_json
        self.key_col = key_col
        self.before = tuple(before)
        self.after = tuple(after)
        self.mapping = dict(mapping) if mapping else {}


CDC_COLS = ("_change", "_commit_version")


def _cdc_side_sql(table_path: str, files: tuple, key_col: str, cols: list,
                  mapping: dict | None = None) -> str:
    """DuckDB relation for one side of a version diff: the named data
    files with their deletion vectors anti-joined per (file, key).
    ``mapping`` (logical→physical) reads each logical column under its
    in-file physical name and the DV key under the physical key name."""
    m = mapping or {}
    if not files:
        sel = ", ".join(f'NULL AS "{c}"' for c in cols)
        return f"SELECT {sel} WHERE 1 = 0"
    paths = ", ".join(
        "'" + os.path.join(table_path, n).replace("'", "''") + "'"
        for n, _ in files
    )
    collist = ", ".join(f'f."{m.get(c, c)}" AS "{c}"' for c in cols)
    dvs = sorted({d for _, dv in files for d in dv})
    if not dvs:
        return f"SELECT {collist} FROM read_parquet([{paths}], union_by_name=true) f"
    dv_paths = ", ".join(
        "'" + os.path.join(table_path, "_dvs", d).replace("'", "''") + "'"
        for d in dvs
    )
    pkey = m.get(key_col, key_col)
    # the vector masks only the file it was recorded against (the
    # _subset_df rule): match on (basename, physical key)
    return (
        f"SELECT {collist} FROM read_parquet([{paths}], union_by_name=true, "
        f"filename=true) f WHERE NOT EXISTS ("
        f"SELECT 1 FROM read_parquet([{dv_paths}]) d "
        f"WHERE d._dv_file = regexp_extract(f.filename, '[^/]+$', 0) "
        f'AND d."{pkey}" = f."{pkey}")'
    )


def _read_cdc_batches(part: SnapshotCdcPartition) -> Iterator:
    """Executor-side CDC of one version: DuckDB EXCEPT ALL diff of the
    before/after sides + the key-based insert/update/delete
    classification of snapshots.table_changes, streamed out as arrow
    batches under the pinned schema + (_change, _commit_version)."""
    import duckdb
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    pinned = StructType.fromJson(json.loads(part.schema_json))
    cols = [f.name for f in pinned.fields if f.name not in CDC_COLS]
    target = to_arrow_schema(pinned)
    k = f'"{part.key_col}"'
    b = _cdc_side_sql(part.table_path, part.before, part.key_col, cols,
                      part.mapping)
    a = _cdc_side_sql(part.table_path, part.after, part.key_col, cols,
                      part.mapping)
    collist = ", ".join(f'"{c}"' for c in cols)
    sql = f"""
    WITH before_rows AS ({b}), after_rows AS ({a}),
    iou AS (SELECT {collist} FROM after_rows EXCEPT ALL SELECT {collist} FROM before_rows),
    gone AS (SELECT {collist} FROM before_rows EXCEPT ALL SELECT {collist} FROM after_rows),
    old_keys AS (SELECT DISTINCT {k} FROM before_rows),
    new_keys AS (SELECT DISTINCT {k} FROM after_rows)
    SELECT {collist},
           CASE WHEN {k} IN (SELECT {k} FROM old_keys)
                THEN 'update_postimage' ELSE 'insert' END AS _change,
           CAST({part.version} AS BIGINT) AS _commit_version
    FROM iou
    UNION ALL
    SELECT {collist},
           CASE WHEN {k} IN (SELECT {k} FROM new_keys)
                THEN 'update_preimage' ELSE 'delete' END AS _change,
           CAST({part.version} AS BIGINT) AS _commit_version
    FROM gone
    """
    reader = duckdb.connect().execute(sql).fetch_record_batch()
    while True:
        try:
            batch = reader.read_next_batch()
        except StopIteration:
            break
        if batch.num_rows:
            yield _project_batch(batch, target)


def _with_cdc_cols(batches: Iterator, version: int, target) -> Iterator:
    """Fast path for a pure-append version's files: every row is an
    insert — tag constants instead of diffing."""
    import pyarrow as pa

    for batch in batches:
        n = batch.num_rows
        arrays = list(batch.columns) + [
            pa.array(["insert"] * n, type=pa.string()),
            pa.array([version] * n, type=pa.int64()),
        ]
        yield pa.RecordBatch.from_arrays(arrays, schema=target)


class SnapshotStreamReader(DataSourceStreamReader):
    """Version-offset incremental reader over a snapshot table's log."""

    def __init__(self, path: str, schema_json: str, options: dict):
        self._path = path
        self._schema_json = schema_json
        self._skip_change = str(
            options.get("skipchangecommits", "false")
        ).lower() in ("true", "1")
        self._cdc = str(options.get("readchangefeed", "false")).lower() in (
            "true", "1",
        )
        if self._cdc and self._skip_change:
            raise ValueError(
                "readChangeFeed already streams change commits as row-level "
                "diffs; skipChangeCommits contradicts it"
            )
        self._max_versions = int(options.get("maxversionspertrigger", 0)) or None
        start = options.get("startingversion")
        # offset N = "emitted through version N"; startingVersion is the
        # first version whose rows ARE emitted (Delta semantics)
        self._initial = int(start) - 1 if start is not None else 0
        self._last_end: int | None = None
        # pin the column mapping (and the logical key name) alongside the
        # schema: physical names are rename-stable, so the pinned mapping
        # resolves every later version's files under the pinned logical
        # schema even if the table is renamed mid-stream
        cur = sn.current_version(path)
        if cur:
            e = sn._read_entry(path, cur)
            self._mapping = sn._mapping_of(e)
            self._key = e["key_col"]
        else:
            self._mapping, self._key = {}, None

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
        base_schema = self._schema_json
        if self._cdc:
            from pyspark.sql.types import StructType

            full = StructType.fromJson(json.loads(self._schema_json))
            base = StructType([f for f in full.fields if f.name not in CDC_COLS])
            base_schema = json.dumps(base.jsonValue())
        for v in range(lo + 1, hi + 1):
            entry = _entry(v)
            cur = {fe["name"]: fe for fe in entry["files"]}
            prev_ids = {sn._file_identity(fe) for fe in prev.values()}
            cur_ids = {sn._file_identity(fe) for fe in cur.values()}
            changed = any(i not in cur_ids for i in prev_ids)
            if changed and not self._cdc:
                if not self._skip_change:
                    raise ValueError(
                        f"version {v} of {self._path} (op={entry['op']}) "
                        "removes or rewrites files — not an append. Pass "
                        "skipChangeCommits=true to stream past change "
                        "commits, readChangeFeed=true to stream them as "
                        "row-level diffs, or consume table_changes() for "
                        "batch CDC."
                    )
            elif changed:
                # row-level diff of the version's changed slice (the
                # changed_frames rule: files diff on name + DV state)
                before = tuple(
                    (fe["name"], tuple(sorted(fe.get("dv", ()))))
                    for fe in sorted(prev.values(), key=lambda fe: fe["name"])
                    if sn._file_identity(fe) not in cur_ids
                )
                after = tuple(
                    (fe["name"], tuple(sorted(fe.get("dv", ()))))
                    for fe in sorted(cur.values(), key=lambda fe: fe["name"])
                    if sn._file_identity(fe) not in prev_ids
                )
                parts.append(
                    SnapshotCdcPartition(
                        self._path, v, self._schema_json,
                        self._key or entry["key_col"],
                        before, after, mapping=self._mapping,
                    )
                )
            else:
                for name in cur.keys() - prev.keys():
                    parts.append(
                        SnapshotFilePartition(
                            self._path, name, base_schema, version=v,
                            mapping=self._mapping,
                        )
                    )
            prev = cur
        return parts

    def read(self, partition: InputPartition) -> Iterator:
        if isinstance(partition, SnapshotCdcPartition):
            return _read_cdc_batches(partition)
        if self._cdc:
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType

            target = to_arrow_schema(
                StructType.fromJson(json.loads(self._schema_json))
            )
            return _with_cdc_cols(
                _read_file_batches(partition), partition.version, target
            )
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
        mapping = sn._mapping_of(self._entry)
        return [
            SnapshotFilePartition(
                self._path, fe["name"], self._schema_json,
                dv_names=tuple(fe.get("dv", ())), key_col=key,
                mapping=mapping,
            )
            for fe in self._entry["files"]
        ]

    def read(self, partition: SnapshotFilePartition) -> Iterator:
        return _read_file_batches(partition)


class StagedDir(WriterCommitMessage):
    """One write task's staging directory (holds its single parquet
    file), or None when the task saw no rows."""

    def __init__(self, staging: str | None):
        self.staging = staging


class _SnapshotArrowWriteMixin:
    """Shared executor/driver halves of the snapshot-table sink: tasks
    stream their arrow batches into ONE parquet file in a private
    staging dir under the table (same filesystem, so the driver commit
    HARDLINKS them in — a lost optimistic-commit race retries from the
    intact staging, never rewrites data); the driver folds all task
    files into one versioned commit via snapshots.commit_staged."""

    def _write_batches(self, iterator) -> StagedDir:
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        # mapped tables store PHYSICAL names: rename each batch before it
        # hits the file (physical names are rename-stable, so a rename
        # landing between planning and the commit cannot corrupt this)
        m = getattr(self, "_mapping", None) or {}
        writer = None
        staging = None
        for batch in iterator:
            if m:
                batch = pa.RecordBatch.from_arrays(
                    list(batch.columns),
                    names=[m.get(n, n) for n in batch.schema.names],
                )
            if batch.num_rows == 0:
                continue
            if writer is None:
                os.makedirs(self._path, exist_ok=True)
                staging = os.path.join(
                    self._path, f"_snap_staging-{uuid.uuid4().hex}"
                )
                os.makedirs(staging)
                writer = pq.ParquetWriter(
                    os.path.join(staging, f"part-{uuid.uuid4().hex}.parquet"),
                    batch.schema,
                )
            writer.write_batch(batch)
        if writer is not None:
            writer.close()
        return StagedDir(staging)

    def _staged_files(self, messages) -> tuple[list[str], list[str]]:
        import glob as _glob

        dirs = [m.staging for m in messages if m is not None and m.staging]
        files = [
            f
            for d in dirs
            for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))
        ]
        return files, dirs

    @staticmethod
    def _cleanup(dirs: list[str]) -> None:
        import shutil

        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)


class SnapshotStreamWriter(_SnapshotArrowWriteMixin, DataSourceStreamArrowWriter):
    """Exactly-once streaming sink: each micro-batch commits ONE table
    version with the batch id riding as a txn marker atomically inside
    the log entry — a replayed batch finds its marker and skips, so
    at-least-once delivery lands exactly once (the ingest.py discipline,
    now behind plain ``writeStream.format("snapshot_table")``).

    ``txnAppId`` must be UNIQUE PER WRITING QUERY when several streams
    append to one table (the Delta txnAppId contract): batch ids are
    only meaningful within one query's checkpoint, so two queries
    sharing an app id would mask each other's batches."""

    def __init__(self, path: str, key_col: str, app: str,
                 mapping: dict | None = None):
        self._path = path
        self._key = key_col
        self._app = app
        self._mapping = dict(mapping) if mapping else {}

    def write(self, iterator) -> StagedDir:
        return self._write_batches(iterator)

    def commit(self, messages, batchId: int) -> None:
        files, dirs = self._staged_files(messages)
        try:
            if sn.find_txn(self._path, self._app, batchId) is not None:
                return  # replayed batch: already committed, drop the twin
            if not files:
                return  # empty micro-batch: no version, nothing to mark
            sn.commit_staged(
                self._path, files, self._key,
                txn={"app": self._app, "batch": batchId},
            )
        finally:
            self._cleanup(dirs)

    def abort(self, messages, batchId: int) -> None:
        self._cleanup(self._staged_files(messages)[1])


class SnapshotBatchWriter(_SnapshotArrowWriteMixin, DataSourceArrowWriter):
    """Batch sink: ``df.write.format("snapshot_table")`` — mode("append")
    commits one appending version, mode("overwrite") commits a versioned
    INSERT OVERWRITE (old files stay readable via time travel until
    vacuum)."""

    def __init__(self, path: str, key_col: str, overwrite: bool,
                 mapping: dict | None = None):
        self._path = path
        self._key = key_col
        self._overwrite = overwrite
        self._mapping = dict(mapping) if mapping else {}

    def write(self, iterator) -> StagedDir:
        return self._write_batches(iterator)

    def commit(self, messages) -> None:
        files, dirs = self._staged_files(messages)
        try:
            if not files and not self._overwrite:
                return
            sn.commit_staged(
                self._path, files, self._key, overwrite=self._overwrite
            )
        finally:
            self._cleanup(dirs)

    def abort(self, messages) -> None:
        self._cleanup(self._staged_files(messages)[1])


class SnapshotTableDataSource(DataSource):
    """``spark.read[Stream].format("snapshot_table").load(path)``.

    Options: ``version`` / ``timestamp`` / ``tag`` (batch time travel —
    a tag is a named immutable version, sources/refs.py),
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
        tag = self.options.get("tag")
        if sum(o is not None for o in (version, ts, tag)) > 1:
            raise ValueError("pass ONE of version, timestamp, tag")
        if tag is not None:  # named ref (sources/refs.py) → its version
            from . import refs

            version = refs.tag_version(path, tag)
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
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.types import LongType

        _, schema_json = self._pinned()
        schema = StructType.fromJson(json.loads(schema_json))
        if str(self.options.get("readchangefeed", "false")).lower() in (
            "true", "1",
        ):
            schema = schema.add("_change", StringType()).add(
                "_commit_version", LongType()
            )
        return schema

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

    def _write_key(self) -> tuple[str, dict]:
        """(key column, column mapping) a writer commits under: the
        existing table's (authoritative), else the required ``keyCol``
        option for a first write. The mapping lets executors stage files
        under the table's PHYSICAL names on renamed/dropped tables."""
        path = self._path()
        v = sn.current_version(path)
        if v:
            entry = sn._read_entry(path, v)
            return entry["key_col"], sn._mapping_of(entry)
        key = self.options.get("keycol")
        if not key:
            raise ValueError(
                "snapshot_table write to a new table needs .option('keyCol', …)"
            )
        return key, {}

    def writer(self, schema, overwrite: bool) -> SnapshotBatchWriter:
        key, mapping = self._write_key()
        return SnapshotBatchWriter(self._path(), key, overwrite,
                                   mapping=mapping)

    def streamWriter(self, schema, overwrite: bool) -> SnapshotStreamWriter:
        if overwrite:
            raise ValueError(
                "snapshot_table streaming sink supports append output mode only"
            )
        key, mapping = self._write_key()
        return SnapshotStreamWriter(
            self._path(), key,
            app=self.options.get("txnappid", "snapshot_table_sink"),
            mapping=mapping,
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
