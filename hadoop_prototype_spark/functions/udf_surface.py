"""UDF / script surface (SURVEY.md §2.10).

Reference: Hadoop Streaming (hadoop-tools/hadoop-streaming/StreamJob.java:80)
forks any executable as mapper/reducer over a `key\\tvalue` stdin/stdout
line protocol (PipeMapper.java:38, PipeMapRed.java:45); Java Mapper/Reducer
subclassing is the in-process UDF surface (MR core/Mapper.java:101).

Spark-first:
- pipe_lines: true executable compatibility via rdd.pipe — the same line
  protocol, one child process per task (the reference forked one per task
  too). Use only for legacy script reuse.
- map_in_pandas: the preferred path — Arrow-batched Python with no fork;
  PySpark's Arrow channel IS the pipe, ~10-100× less overhead per record.
- grouped_reduce: the Reducer surface — applyInPandas over a group with
  values sorted within each group (the reference's sorted-iterator
  contract, Reducer.java:58-82). Memory-bound per group (SURVEY §7 risk
  #1) — groups must fit in executor memory; prefer Window functions when
  the reduction is expressible declaratively.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pipe_lines(df: DataFrame, command: str, sep: str = "\t") -> DataFrame:
    """Hadoop-Streaming-compatible: rows → `key<TAB>value` lines → command's
    stdin; its stdout lines parsed back to (key, value).

    The input DataFrame must have exactly (key, value)-castable columns.
    """
    from ..operators.partition import fan_out

    cols = df.columns
    lines = df.select(F.concat_ws(sep, *[F.col(c).cast("string") for c in cols]).alias("line"))
    # one child process per partition: widen narrow inputs so the external
    # command runs in parallel, like one streaming mapper per split
    lines = fan_out(lines)
    piped = lines.rdd.map(lambda r: r.line).pipe(command)

    def split_kv(line: str) -> tuple[str, str]:
        i = line.find(sep)
        return (line, "") if i < 0 else (line[:i], line[i + 1 :])

    # explicit schema: toDF(names) would run a sampling job to infer types
    return df.sparkSession.createDataFrame(piped.map(split_kv), "key string, value string")


def _crc32_key(key: str) -> int:
    """Env-independent shuffle partitioner for string keys.

    PySpark's default portable_hash depends on PYTHONHASHSEED being set
    consistently across worker processes; an explicit crc32 keeps every line
    of a key on ONE reducer regardless of interpreter configuration (the
    reducer contract breaks silently if a key splits across partitions).
    """
    import zlib

    return zlib.crc32(str(key).encode("utf-8"))


def pipe_grouped(
    df: DataFrame, command: str, num_partitions: int | None = None, sep: str = "\t"
) -> DataFrame:
    """Hadoop-Streaming REDUCER stage (PipeReducer.java:40; StreamJob.java
    -reducer option, :438-530): key-grouped, key-sorted lines piped to an
    external script.

    The first column is the key; remaining columns join as the value. Rows
    are hash-partitioned on the key (every line of a key reaches exactly ONE
    reducer process) and sorted by key within each partition — the shuffle
    merge-sort contract a streaming reducer script depends on (it detects
    group boundaries by watching the key change between consecutive lines).
    One child process per partition, like one reducer task per partition.

    Scale shape: repartitionAndSortWithinPartitions is the reference's
    shuffle+sort exactly — one hash exchange on the key, external merge sort
    within partitions (spills, never holds a partition in memory).
    """
    from ..operators.partition import fan_out

    cols = df.columns
    key, rest = cols[0], cols[1:]
    kv = df.select(
        F.col(key).cast("string").alias("k"),
        F.concat_ws(sep, *[F.col(c).cast("string") for c in rest]).alias("v"),
    )
    kv = fan_out(kv)  # parallel reducers even for narrow inputs
    rdd = kv.rdd  # one plan→RDD conversion, reused below
    n = num_partitions or rdd.getNumPartitions()
    shuffled = rdd.map(lambda r: (r.k, r.v)).repartitionAndSortWithinPartitions(
        numPartitions=n, partitionFunc=_crc32_key
    )
    piped = shuffled.map(lambda t: t[0] + sep + t[1]).pipe(command)

    def split_kv(line: str) -> tuple[str, str]:
        i = line.find(sep)
        return (line, "") if i < 0 else (line[:i], line[i + 1 :])

    return df.sparkSession.createDataFrame(piped.map(split_kv), "key string, value string")


def pipe_combined(
    df: DataFrame,
    combiner: str,
    reducer: str,
    num_partitions: int | None = None,
    sep: str = "\t",
) -> DataFrame:
    """Hadoop-Streaming ``-combiner`` stage (PipeCombiner.java:26;
    StreamJob.java:438-530 ``-combiner`` option) ahead of the reducer stage.

    The combiner script consumes each map partition's output SORTED BY KEY
    (the map-side sort buffer contract the reference's combiner sees) and
    emits combined (key, value) lines; those then go through the normal
    reducer shuffle+sort+pipe (the ``pipe_grouped`` contract). As in the
    reference, combiner and reducer must compute an associative,
    commutative reduction — the combiner may run on any subset of a key's
    records (here: the subset co-resident in one map partition).

    Scale shape: the combiner cuts shuffle bytes from |map output| to
    |distinct keys per partition| before the exchange — exactly why the
    reference runs one. The per-partition sort is in-memory, like the
    reference's io.sort.mb map-output buffer; partition size is bounded by
    the input split, not the dataset.
    """
    from ..operators.partition import fan_out

    cols = df.columns
    key, rest = cols[0], cols[1:]
    kv = df.select(
        F.col(key).cast("string").alias("k"),
        F.concat_ws(sep, *[F.col(c).cast("string") for c in rest]).alias("v"),
    )
    kv = fan_out(kv)

    def split_kv(line: str) -> tuple[str, str]:
        i = line.find(sep)
        return (line, "") if i < 0 else (line[:i], line[i + 1 :])

    # map-side: sort lines within the partition (lines sort key-first, so
    # each key's records are contiguous), pipe through the combiner script
    rdd = kv.rdd
    lines = rdd.map(lambda r: r.k + sep + r.v)
    combined = lines.mapPartitions(lambda it: iter(sorted(it))).pipe(combiner)

    # reduce-side: the standard reducer contract over the combined records
    pairs = combined.map(split_kv)
    n = num_partitions or pairs.getNumPartitions()
    shuffled = pairs.repartitionAndSortWithinPartitions(
        numPartitions=n, partitionFunc=_crc32_key
    )
    piped = shuffled.map(lambda t: t[0] + sep + t[1]).pipe(reducer)
    return df.sparkSession.createDataFrame(piped.map(split_kv), "key string, value string")


def pipe_lines_keyonly(df: DataFrame, command: str) -> DataFrame:
    """``-io keyonlytext`` MAP stage (KeyOnlyTextInputWriter.java:26-31:
    the key alone + newline, value dropped; KeyOnlyTextOutputReader.java:
    whole output line = key, value = NullWritable). The first column is the
    key; the script sees bare key lines and its stdout lines become the
    single ``key`` output column."""
    from ..operators.partition import fan_out

    lines = df.select(F.col(df.columns[0]).cast("string").alias("line"))
    lines = fan_out(lines)
    piped = lines.rdd.map(lambda r: r.line).pipe(command)
    return df.sparkSession.createDataFrame(piped.map(lambda l: (l,)), "key string")


def pipe_grouped_keyonly(
    df: DataFrame, command: str, num_partitions: int | None = None
) -> DataFrame:
    """``-io keyonlytext`` REDUCE stage: keys hash-partitioned (every
    occurrence of a key on ONE reducer) and sorted within the partition,
    piped as bare key lines — the pipe_grouped contract minus the value."""
    from ..operators.partition import fan_out

    kv = df.select(F.col(df.columns[0]).cast("string").alias("k"))
    kv = fan_out(kv)
    rdd = kv.rdd
    n = num_partitions or rdd.getNumPartitions()
    shuffled = rdd.map(lambda r: (r.k, None)).repartitionAndSortWithinPartitions(
        numPartitions=n, partitionFunc=_crc32_key
    )
    piped = shuffled.map(lambda t: t[0]).pipe(command)
    return df.sparkSession.createDataFrame(piped.map(lambda l: (l,)), "key string")


def pipe_combined_keyonly(
    df: DataFrame,
    combiner: str,
    reducer: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``-io keyonlytext`` with a combiner: each map partition's keys are
    sorted and piped through the combiner script before the reducer
    shuffle — same contract as pipe_combined, bare-key wire format."""
    from ..operators.partition import fan_out

    lines = df.select(F.col(df.columns[0]).cast("string").alias("line"))
    lines = fan_out(lines)
    combined = (
        lines.rdd.map(lambda r: r.line)
        .mapPartitions(lambda it: iter(sorted(it)))
        .pipe(combiner)
    )
    n = num_partitions or combined.getNumPartitions()
    shuffled = combined.map(lambda l: (l, None)).repartitionAndSortWithinPartitions(
        numPartitions=n, partitionFunc=_crc32_key
    )
    piped = shuffled.map(lambda t: t[0]).pipe(reducer)
    return df.sparkSession.createDataFrame(piped.map(lambda l: (l,)), "key string")


def stream_job(
    df: DataFrame,
    mapper: str | None = None,
    combiner: str | None = None,
    reducer: str | None = None,
    io: str = "text",
    num_reduce_tasks: int | None = None,
    sep: str = "\t",
    map_output_schema: str = "key string, value string",
    reduce_output_schema: str = "key string, value string",
) -> DataFrame:
    """The StreamJob CLI surface (StreamJob.java:80; option parsing
    :438-530) as one composition: ``-mapper``/``-combiner``/``-reducer``
    map to the script arguments, ``-io`` selects the wire protocol
    (text / typedbytes / rawbytes / keyonlytext), ``-numReduceTasks`` sets the reducer
    partition count. Like the reference:

    - mapper=None is the identity mapper (the CLI's default when ``-mapper``
      is omitted).
    - reducer=None or num_reduce_tasks=0 is a map-only job — no shuffle, no
      sort, mapper output is job output (setNumReduceTasks(0) semantics).
    - a combiner requires a reducer, runs over each map partition's
      key-sorted output before the shuffle, and must be associative +
      commutative with the reducer (PipeCombiner.java:26 contract).

    Output schemas only matter for typedbytes (values keep native types);
    text is (string, string), rawbytes (binary, binary), and keyonlytext a
    single (string) key column — KeyOnlyTextOutputReader's (Text,
    NullWritable) pair (IdentifierResolver.java:35-38, :61-66).
    """
    if io not in ("text", "typedbytes", "rawbytes", "keyonlytext"):
        raise ValueError(
            f"-io {io!r}: expected text, typedbytes, rawbytes, or keyonlytext"
        )
    if combiner is not None and reducer is None:
        raise ValueError("-combiner requires -reducer (like the reference CLI)")
    map_only = reducer is None or num_reduce_tasks == 0

    if io == "keyonlytext":
        # identity mapper must still apply the wire contract: value dropped,
        # single key column out (KeyOnlyTextInputWriter writes only the key)
        out = (
            pipe_lines_keyonly(df, mapper)
            if mapper
            else df.select(F.col(df.columns[0]).cast("string").alias("key"))
        )
        if map_only:
            return out
        if combiner is not None:
            return pipe_combined_keyonly(out, combiner, reducer, num_reduce_tasks)
        return pipe_grouped_keyonly(out, reducer, num_reduce_tasks)

    if io == "text":
        out = pipe_lines(df, mapper, sep) if mapper else df
        if map_only:
            return out
        if combiner is not None:
            return pipe_combined(out, combiner, reducer, num_reduce_tasks, sep)
        return pipe_grouped(out, reducer, num_reduce_tasks, sep)

    from .typedbytes import (
        pipe_grouped_rawbytes,
        pipe_grouped_typedbytes,
        pipe_rawbytes,
        pipe_typedbytes,
    )

    if io == "typedbytes":
        out = pipe_typedbytes(df, mapper, map_output_schema) if mapper else df
        if map_only:
            return out
        return pipe_grouped_typedbytes(
            out, reducer, reduce_output_schema, num_reduce_tasks, combiner
        )
    out = pipe_rawbytes(df, mapper) if mapper else df
    if map_only:
        return out
    return pipe_grouped_rawbytes(out, reducer, num_reduce_tasks, combiner)


def map_in_pandas(
    df: DataFrame, fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]], schema: str
) -> DataFrame:
    """The modern streaming-UDF surface: Arrow batches in, Arrow batches out."""
    return df.mapInPandas(fn, schema=schema)


def skip_bad_records(
    fn: Callable[[pd.DataFrame], pd.DataFrame],
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Bad-record skipping (SURVEY.md §2.3 last row: SkippingReduceValuesIterator,
    mapred/ReduceTask.java:243): rows that crash user code are dropped
    instead of failing the task.

    Wraps a per-batch pandas function for mapInPandas: a failing batch is
    retried row-by-row and only the crashing rows are skipped (the
    reference's binary-search skip narrowed to single records).
    """

    def wrapped(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            try:
                yield fn(pdf)
            except Exception:
                good = []
                for i in range(len(pdf)):
                    row = pdf.iloc[[i]]
                    try:
                        good.append(fn(row))
                    except Exception:
                        continue
                if good:
                    yield pd.concat(good, ignore_index=True)

    return wrapped


def grouped_reduce(
    df: DataFrame,
    group_cols: list[str],
    sort_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """Reducer with the sorted-values-iterator contract: fn receives each
    group as a pandas DataFrame sorted by sort_cols (the reference's
    sort-comparator order within a grouping-comparator group)."""

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        return fn(pdf.sort_values(sort_cols, kind="mergesort"))

    return df.groupBy(*group_cols).applyInPandas(apply, schema=schema)


def bucketed_grouped_reduce(
    df: DataFrame,
    group_cols: list[str],
    sort_cols: list[str],
    kernel: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    buckets: int = 256,
) -> DataFrame:
    """Sorted-group reduce for MANY TINY groups.

    ``grouped_reduce`` (one applyInPandas call per key) is the faithful
    reducer contract, but per-group pandas overhead (~0.25 ms) makes it
    pathological when groups are small and numerous — 100k single-digit-row
    groups cost ~25 s regardless of data size. The scale pattern: hash
    group keys into ``buckets`` coarse partitions, give the kernel one
    SORTED bucket frame (all rows of a key are contiguous), and let it
    reduce every group in the bucket with vectorized pandas groupby —
    per-bucket overhead instead of per-group.

    The kernel receives the bucket sorted by group_cols + sort_cols and
    must itself aggregate per group (e.g. ``pdf.groupby(...)``).
    """

    bucket = F.pmod(F.hash(*[F.col(c) for c in group_cols]), F.lit(buckets))
    with_bucket = df.withColumn("_bucket", bucket)

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        return kernel(
            pdf.drop(columns=["_bucket"]).sort_values(
                group_cols + sort_cols, kind="mergesort"
            )
        )

    return with_bucket.groupBy("_bucket").applyInPandas(apply, schema=schema)
