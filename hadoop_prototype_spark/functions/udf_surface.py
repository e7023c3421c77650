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
    cols = df.columns
    lines = df.select(F.concat_ws(sep, *[F.col(c).cast("string") for c in cols]).alias("line"))
    piped = lines.rdd.map(lambda r: r.line).pipe(command)

    def split_kv(line: str) -> tuple[str, str]:
        i = line.find(sep)
        return (line, "") if i < 0 else (line[:i], line[i + 1 :])

    return piped.map(split_kv).toDF(["key", "value"])


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
