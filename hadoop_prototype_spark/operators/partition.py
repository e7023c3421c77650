"""Partitioning operators (SURVEY.md §2.8) — physical but user-visible.

Reference → here:
- Partitioner/HashPartitioner (MR core/Partitioner.java:42,
  MR lib/partition/HashPartitioner.java:28): hash_partition → df.repartition
  on key columns (Spark's default shuffle hash).
- BinaryPartitioner (BinaryPartitioner.java:71): hash over a slice of the
  serialized key → binary_partition repartitions on a substring expression.
- KeyFieldBasedPartitioner (KeyFieldBasedPartitioner.java:51): hash on
  selected '-k' fields of a delimited line.
- TotalOrderPartitioner (TotalOrderPartitioner.java:50): range_partition →
  repartitionByRange (sampled split points, like InputSampler).
- RehashPartitioner-style skew mitigation: salt_keys adds a bounded random
  suffix so one hot key spreads over N reducers; aggregate-then-unsalt is
  the standard two-phase pattern (AQE's skew-join handles the join case
  automatically — session.py enables it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sort import keyfield_sort_columns


def hash_partition(df: DataFrame, num_partitions: int, *cols: str) -> DataFrame:
    return df.repartition(num_partitions, *[F.col(c) for c in cols])


def binary_partition(
    df: DataFrame, num_partitions: int, col: str, start: int = 0, length: int | None = None
) -> DataFrame:
    """Partition on a byte-range of the key (BinaryPartitioner LEFT_OFFSET/
    RIGHT_OFFSET semantics, substring of the serialized key)."""
    expr = F.substring(F.col(col).cast("string"), start + 1, length or 2**31 - 1)
    return df.repartition(num_partitions, expr)


def keyfield_partition(
    df: DataFrame, num_partitions: int, spec: str, line_col: str = "line", sep: str = "\t"
) -> DataFrame:
    """Partition on the fields a '-k' sort spec selects."""
    cols: list[Column] = [
        c for c in keyfield_sort_columns(spec, line_col, sep)
    ]
    # strip sort direction — repartition ignores ordering anyway
    return df.repartition(num_partitions, *cols)


def range_partition(df: DataFrame, num_partitions: int, *cols: str) -> DataFrame:
    """TotalOrderPartitioner: range-disjoint partitions from sampled splits."""
    return df.repartitionByRange(num_partitions, *[F.col(c) for c in cols])


def salt_keys(
    df: DataFrame,
    key_col: str,
    buckets: int,
    out: str = "salted_key",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew mitigation: deterministic content-derived salt in [0, buckets)
    appended to the key. Aggregations run per salted key first, then
    re-aggregate per original key (partial results are buckets× smaller).

    The salt hashes the NON-key columns (default: every other column) — a
    salt derived from the key alone would send the whole hot key to one
    bucket and defeat the salting, while a salt derived from partition
    layout (monotonically_increasing_id, spark_partition_id) changes across
    parallelism/recomputation and breaks the determinism contract. Rows
    whose non-key columns are fully identical co-locate; for aggregation
    inputs that is harmless (they combine anyway).
    """
    cols = salt_cols if salt_cols is not None else [c for c in df.columns if c != key_col]
    if not cols:
        cols = [key_col]  # degenerate single-column input: salt is a no-op spread
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))
    return df.withColumn(out, F.concat_ws("#", F.col(key_col).cast("string"), salt.cast("string")))


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Widen a narrow input before a compute-heavy stage.

    AQE sizes partitions by BYTES, which is exactly wrong for stages whose
    cost is per-row compute (cosine pairs, shingle explosion, media decode):
    a 1-row-group parquet file arrives as ONE partition and the whole stage
    runs on one core. An explicit repartition(n) (round-robin) is immune to
    AQE coalescing. No-op when the input is already wide enough — so on a
    real cluster, where scans arrive in hundreds of splits, this never
    inserts the extra (tiny) shuffle.

    The width probe uses Catalyst's optimizer statistics (scan bytes /
    spark.sql.files.maxPartitionBytes) rather than df.rdd.getNumPartitions()
    — the RDD probe forces physical planning + plan→RDD conversion on the
    driver for every query build (a py4j round trip this repo elsewhere
    engineers away); the stats estimate is exactly what FilePartition-ing
    uses to size the scan, so it predicts the same width.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        size_bytes = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes().toString()
        )
        from ..session import parse_size_bytes

        raw = df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        max_part = parse_size_bytes(raw)
        est_partitions = max(1, size_bytes // max_part)
    except Exception:  # stats unavailable (e.g. non-classic backend): assume narrow
        est_partitions = 1
    if est_partitions >= target:
        return df
    return df.repartition(target)
