"""Incremental aggregate maintenance (materialized-view refresh).

At 100 TB you do not recompute a grouped rollup because a day of data
arrived — you maintain it: keep the aggregate table in MERGEABLE partial
form (sum/count/min/max; avg = sum/count at read time) and fold each
delta batch in with a keyed outer join. Cost is O(|delta| + |touched
groups|), independent of history size. This is the batch sibling of
streaming's stateful aggregation (state store = the materialized table).

Caveat by design: min/max are mergeable under INSERTS only — deletions
need full recompute or auxiliary structures; sums/counts accept
negative-weight deltas (retractions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERGE_FNS = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)),
    "min": F.min,
    "max": F.max,
}

_COMBINE = {
    "sum": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "count": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "min": lambda a, b: F.least(a, b),  # least/greatest skip nulls
    "max": lambda a, b: F.greatest(a, b),
}


def summarize(df: DataFrame, keys: list[str], spec: dict[str, tuple[str, str]]) -> DataFrame:
    """Aggregate ``df`` into partial form: spec maps output column →
    (fn, input column) with fn in sum/count/min/max."""
    aggs = [MERGE_FNS[fn](F.col(col)).alias(out) for out, (fn, col) in spec.items()]
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregates(
    old: DataFrame, delta: DataFrame, keys: list[str], spec: dict[str, tuple[str, str]]
) -> DataFrame:
    """Fold a delta summary into an existing one: full outer join on the
    keys, mergeable combine per column. Groups only in one side pass
    through; groups in both combine."""
    d = delta.select(
        *keys, *[F.col(out).alias(f"_d_{out}") for out in spec]
    )
    joined = old.join(d, keys, "full")
    cols = [
        _COMBINE[fn](F.col(out), F.col(f"_d_{out}")).alias(out)
        for out, (fn, _) in spec.items()
    ]
    return joined.select(*keys, *cols)
