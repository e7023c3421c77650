"""Synthetic data generators (SURVEY.md §2.1 last row).

Reference: RandomWriter (EX/RandomWriter.java:78), RandomTextWriter
(EX/RandomTextWriter.java:77), TeraGen (EX/terasort/TeraGen.java:68,
SortGenMapper :203 — seeded 100-byte records: 10-byte key + 90-byte value).

Spark-first: `spark.range(n)` + pure column expressions. Each record is a
pure function of its row id (md5-derived), so the data is deterministic at
ANY parallelism — stronger than the reference, whose per-task seeding ties
determinism to the split layout. That property is what lets the terasort
checksum validation work regardless of cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TERA_KEY_LEN = 10
TERA_VALUE_LEN = 90


def teragen(spark: SparkSession, n: int, num_partitions: int | None = None) -> DataFrame:
    """TeraGen-style records: df(id, key: 10-char, value: 90-char).

    key/value derive from md5 of the row id (hex alphabet stands in for the
    Gray-sort random alphabet; distributional shape — near-uniform keys —
    is what the sort benchmark needs).
    """
    rng = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)
    # two projections so each md5 is computed ONCE: inlining the value hash
    # three times into one projection re-evaluated it per copy (codegen does
    # not dedupe it), measured ~20% slower at 2M rows
    base = rng.select(
        "id",
        F.md5(F.col("id").cast("string")).alias("_kh"),
        F.md5(F.concat(F.col("id").cast("string"), F.lit("v"))).alias("_vh"),
    )
    return base.select(
        "id",
        F.substring("_kh", 1, TERA_KEY_LEN).alias("key"),
        F.substring(F.concat("_vh", "_vh", "_vh"), 1, TERA_VALUE_LEN).alias("value"),
    )


def random_text(
    spark: SparkSession,
    rows: int,
    words_per_row: int = 10,
    vocab_size: int = 1000,
    num_partitions: int | None = None,
) -> DataFrame:
    """RandomTextWriter-style lines: df(line) of pseudo-random words.

    Deterministic per row id: word j of row i = 'w' + (md5-int(i,j) % vocab).
    """
    rng = spark.range(0, rows, 1, num_partitions) if num_partitions else spark.range(rows)
    words = [
        F.concat(
            F.lit("w"),
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit(f"_{j}"))), 1, 8),
                    16,
                    10,
                ).cast("long")
                % vocab_size
            ).cast("string"),
        )
        for j in range(words_per_row)
    ]
    return rng.select(F.concat_ws(" ", *words).alias("line"))


def record_checksum(df: DataFrame, *cols: str) -> int:
    """TeraChecksum pattern (EX/terasort/TeraChecksum.java:37): order-independent
    sum of per-record crc32 — equal before and after any order/partition-only
    transformation."""
    row = df.select(F.sum(F.crc32(F.concat_ws("\x01", *cols))).alias("c")).collect()[0]
    return row.c
