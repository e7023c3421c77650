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


def summarize_changes(
    changes: DataFrame, keys: list[str], spec: dict[str, tuple[str, str]]
) -> DataFrame:
    """Signed delta summary from a CDC feed (sources/snapshots.table_changes
    schema: rows + a ``_change`` column): inserts and update postimages
    count +1, deletes and update preimages count -1, so folding the result
    into a view retracts old values exactly. sum/count only — min/max are
    not retractable (module caveat)."""
    for out, (fn, _) in spec.items():
        if fn not in ("sum", "count"):
            raise ValueError(
                f"{out}: {fn} is not retractable — CDC maintenance supports "
                f"sum/count only (min/max need a full recompute on delete)"
            )
    w = F.when(
        F.col("_change").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    aggs = [
        (
            F.sum(F.col(col) * w) if fn == "sum" else F.sum(w)
        ).alias(out)
        for out, (fn, col) in spec.items()
    ]
    return changes.groupBy(*keys).agg(*aggs)


def summarize_signed(
    before: DataFrame,
    after: DataFrame,
    keys: list[str],
    spec: dict[str, tuple[str, str]],
) -> DataFrame:
    """Signed delta summary straight from the raw BEFORE/AFTER row sets of
    a rewrite (the pre/post contents of the changed files): before rows
    weigh -1, after rows +1, ONE combining aggregate. Rows identical on
    both sides cancel inside the aggregate, so no exceptAll / key-join
    classification ever runs — this is the whole CDC-classification
    pipeline (2 exceptAll + 4 joins ≈ 8 stages) collapsed into a single
    shuffle, for consumers (matview refresh) that need net per-group
    deltas rather than labeled row events. Same retractability caveat as
    summarize_changes."""
    for out, (fn, _) in spec.items():
        if fn not in ("sum", "count"):
            raise ValueError(
                f"{out}: {fn} is not retractable — CDC maintenance supports "
                f"sum/count only (min/max need a full recompute on delete)"
            )
    in_cols = sorted({col for fn, col in spec.values() if fn == "sum"})
    u = (
        before.select(*keys, *in_cols).withColumn("_w", F.lit(-1))
        .unionByName(after.select(*keys, *in_cols).withColumn("_w", F.lit(1)))
    )
    aggs = [
        (
            F.sum(F.col(col) * F.col("_w")) if fn == "sum" else F.sum("_w")
        ).alias(out)
        for out, (fn, col) in spec.items()
    ]
    return u.groupBy(*keys).agg(*aggs)


def refresh_from_changes(
    view: DataFrame,
    changes: DataFrame,
    keys: list[str],
    spec: dict[str, tuple[str, str]],
) -> DataFrame:
    """Maintain a materialized rollup from a snapshot CDC feed: cost is
    O(|changes| + |touched groups|), never a table rescan. Groups whose
    count retracts to 0 remain as zero-count rows (filter at read time)."""
    return merge_aggregates(view, summarize_changes(changes, keys, spec), keys, spec)


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
