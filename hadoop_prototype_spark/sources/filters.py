"""Scan-time record filters (SequenceFileInputFilter, SURVEY.md §2.1).

Reference: MR lib/input/SequenceFileInputFilter.java —
  RegexFilter (:110)   keep records whose key matches a regex
  PercentFilter (:153) keep every f-th record (positional sampling)
  MD5Filter (:202)     keep records where MD5(key) % f == 0 (hash sampling)

As DataFrame filters these push down to the scan where possible; the hash
filter is content-deterministic (same rows kept at any parallelism), which
is what you want at 100 TB — positional sampling is partitioning-dependent,
so PercentFilter is exposed as Spark's own Bernoulli sample instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def regex_filter(df: DataFrame, col: str, pattern: str) -> DataFrame:
    return df.filter(F.col(col).rlike(pattern))


def percent_filter(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """PercentFilter analogue: positional every-f-th sampling has no stable
    meaning under parallel scans, so this is seeded Bernoulli sampling."""
    return df.sample(fraction=fraction, seed=seed)


def md5_mod(col: Column, modulus: int) -> Column:
    """Integer in [0, modulus) from the first 8 hex chars of md5(col).

    Engine-portable (DuckDB: ('0x' || substr(md5(x),1,8))::BIGINT % m).
    """
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long") % modulus


def md5_filter(df: DataFrame, col: str, frequency: int) -> DataFrame:
    """MD5Filter: keep rows where md5(key) % frequency == 0 — deterministic
    1/frequency hash sample, independent of partitioning."""
    return df.filter(md5_mod(F.col(col), frequency) == 0)
