"""Parquet table loading for the test-data star schema.

The reference's scan stack (FileInputFormat splits + SequenceFile/MapFile
containers, SURVEY.md §1.3/§2.1) maps to `spark.read.parquet`: splittable
columnar scans with predicate pushdown, column pruning, and small-file
coalescing (CombineFileInputFormat equivalent) built in via
spark.sql.files.maxPartitionBytes / openCostInBytes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor; used by
# query code to hint broadcast joins (DistributedCache map-side hash join,
# MR core/filecache/DistributedCache.java:134 → F.broadcast).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


# (session id, sf_dir, table) -> DataFrame. A parquet read costs ~200ms of
# driver time (file listing + footer schema inference); a 5-table join paid
# ~1s per query BUILD without this. DataFrames are immutable plan objects —
# reuse is safe, and relation reuse also helps Catalyst dedupe scans.
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark._jsparkSession), sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, sf_dir, name)
    _TABLE_CACHE[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the fixture; without this conf ANY session
        # (including externally-created harness sessions that never went
        # through session.get_spark()) dies with PARQUET_TYPE_ILLEGAL at read
        # time. Runtime-settable, so set it here at the loader — the only
        # choke point every events read passes through.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # old fixture: TIMESTAMP(NANOS) read as long via nanosAsLong.
            # integer division — float division loses precision above 2^53 ns
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # current fixture: timestamp[us] without tz → TIMESTAMP_NTZ, which
            # withWatermark / unix_micros reject. Session tz is UTC, so the
            # wall-clock values (and oracle hashes) are unchanged by the cast.
            df = df.withColumn("ts", F.col("ts").cast(TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() can use them."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
