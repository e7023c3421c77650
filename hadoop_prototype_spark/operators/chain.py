"""ChainMapper/ChainReducer (SURVEY.md §2.3).

Reference: MR lib/chain/{ChainMapper.java:84, ChainReducer.java:88,
Chain.java:50} — compose [MAP+ / REDUCE MAP*] inside one task to avoid
intermediate jobs and disk round-trips.

In Spark this is free: DataFrame transforms compose lazily and Catalyst
collapses adjacent projections/filters into one stage. `chain` exists to
express reference pipelines 1:1 (and reads like Chain.addMapper calls).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

Transform = Callable[[DataFrame], DataFrame]


def chain(df: DataFrame, *stages: Transform) -> DataFrame:
    """chain(df, m1, m2, reduce_fn, m3) — stages fuse into single Spark
    stages wherever no shuffle intervenes (the whole point of ChainMapper)."""
    for stage in stages:
        df = stage(df)
    return df
