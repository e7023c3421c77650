"""ValueAggregator descriptor framework → groupBy().agg() compiler.

Reference: the aggregate framework (MR lib/aggregate/ValueAggregatorJob.java:85,
ValueAggregatorBaseDescriptor.generateEntry :89) — the reference's only
declarative query API. A job is described by descriptor strings
``"<AggType>:<id>"``; mappers emit ``(aggType:id, value)``, a combiner and
reducer finalize each aggregator.

Here the descriptor list compiles straight into Spark aggregate expressions;
Catalyst's partial/final hash aggregation reproduces the combiner/reducer
split automatically.

Supported aggregator types (MR lib/aggregate/*.java):
  LongValueSum    LongValueSum.java:33     sum of longs (exact)
  DoubleValueSum  DoubleValueSum.java:34   sum of doubles — computed as an
                                           exact DECIMAL(28,6) sum so results
                                           are reproducible regardless of
                                           partition order (determinism
                                           contract, plans/registry.py)
  LongValueMax    LongValueMax.java:33     numeric max
  LongValueMin    LongValueMin.java:33     numeric min
  StringValueMax  StringValueMax.java:33   lexicographic max
  StringValueMin  StringValueMin.java:33   lexicographic min
  UniqValueCount  UniqValueCount.java:35   exact distinct count (reference
                                           caps at maxNumItems; pass a cap to
                                           get approx_count_distinct instead)
  ValueCount      (generateEntry COUNT)    count of records
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(28,6)"


def _agg_column(agg_type: str, col: str, cap: int | None) -> Column:
    if agg_type == "LongValueSum":
        return F.sum(F.col(col).cast("long"))
    if agg_type == "DoubleValueSum":
        return F.sum(F.col(col).cast(_DEC)).cast("double")
    if agg_type == "LongValueMax":
        return F.max(F.col(col).cast("long"))
    if agg_type == "LongValueMin":
        return F.min(F.col(col).cast("long"))
    if agg_type == "StringValueMax":
        return F.max(F.col(col).cast("string"))
    if agg_type == "StringValueMin":
        return F.min(F.col(col).cast("string"))
    if agg_type == "UniqValueCount":
        if cap is not None:
            return F.approx_count_distinct(col)
        return F.countDistinct(col)
    if agg_type == "ValueCount":
        return F.count("*")
    raise ValueError(f"unknown aggregator type: {agg_type}")


def parse_descriptor(desc: str) -> tuple[str, str, str]:
    """``"LongValueSum:l_quantity"`` → (type, column, output_name)."""
    parts = desc.split(":")
    if len(parts) == 2:
        agg_type, col = parts
        out = f"{agg_type.lower()}_{col}"
    elif len(parts) == 3:
        agg_type, col, out = parts
    else:
        raise ValueError(f"bad descriptor: {desc}")
    return agg_type, col, out


_STRING_MINMAX = ("StringValueMax", "StringValueMin")


def value_aggregator(
    df: DataFrame,
    group_cols: list[str],
    descriptors: list[str],
    uniq_cap: int | None = None,
) -> DataFrame:
    """Compile descriptor strings into a groupBy().agg() plan.

    String min/max compile through a distinct-pair pre-aggregation instead
    of a direct min(string): Spark's HashAggregate cannot hold string
    buffers, so a plan containing min/max(string) silently degrades the
    WHOLE aggregation to SortAggregate — a full sort of the fact table
    (measured 1.7 s vs 0.9 s at sf0.1; at 100 TB it is the difference
    between a hash aggregate and sorting the corpus). The rewrite keeps
    every row-count-sized operator hash-based: distinct (group, value)
    pairs first (HashAggregate — strings are fine as KEYS), then min/max
    over the tiny distinct set, joined back on the group columns. Results
    are identical (min/max are insensitive to duplicates).
    """
    parsed = [parse_descriptor(d) for d in descriptors]
    if not parsed:
        raise ValueError("no descriptors")
    out_order = [*group_cols, *(out for _, _, out in parsed)]
    hash_aggs: list[Column] = []
    str_cols: dict[str, list[tuple[str, str]]] = {}
    for agg_type, col, out in parsed:
        if agg_type in _STRING_MINMAX:
            str_cols.setdefault(col, []).append((agg_type, out))
        else:
            hash_aggs.append(_agg_column(agg_type, col, uniq_cap).alias(out))
    pieces: list[DataFrame] = []
    if hash_aggs:
        pieces.append(df.groupBy(*group_cols).agg(*hash_aggs))
    for col, specs in str_cols.items():
        pairs = df.select(*group_cols, F.col(col).cast("string").alias(col)).distinct()
        aggs = [
            (F.max if t == "StringValueMax" else F.min)(F.col(col)).alias(out)
            for t, out in specs
        ]
        pieces.append(pairs.groupBy(*group_cols).agg(*aggs))
    result = pieces[0]
    for p in pieces[1:]:
        result = result.join(p, list(group_cols)) if group_cols else result.crossJoin(p)
    return result.select(*out_order)


_ORACLE_FN = {
    # outer CAST: DuckDB's sum(BIGINT) returns HUGEINT, which canonicalizes
    # as a float-like value and hash-mismatches Spark's BIGINT.
    "LongValueSum": "CAST(sum(CAST({c} AS BIGINT)) AS BIGINT)",
    "DoubleValueSum": f"CAST(sum(CAST({{c}} AS DECIMAL(28,6))) AS DOUBLE)",
    "LongValueMax": "max(CAST({c} AS BIGINT))",
    "LongValueMin": "min(CAST({c} AS BIGINT))",
    "StringValueMax": "max(CAST({c} AS VARCHAR))",
    "StringValueMin": "min(CAST({c} AS VARCHAR))",
    "UniqValueCount": "count(DISTINCT {c})",
    "ValueCount": "count(*)",
}


def value_aggregator_oracle_sql(
    table: str, group_cols: list[str], descriptors: list[str]
) -> str:
    """DuckDB SQL equivalent of :func:`value_aggregator` (shared parser)."""
    parts = list(group_cols)
    for desc in descriptors:
        agg_type, col, out = parse_descriptor(desc)
        parts.append(_ORACLE_FN[agg_type].format(c=col) + f" AS {out}")
    group = ", ".join(group_cols)
    return f"SELECT {', '.join(parts)} FROM {table} GROUP BY {group}"
