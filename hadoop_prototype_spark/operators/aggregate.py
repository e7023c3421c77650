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


def value_aggregator(
    df: DataFrame,
    group_cols: list[str],
    descriptors: list[str],
    uniq_cap: int | None = None,
) -> DataFrame:
    """Compile descriptor strings into one groupBy().agg() plan."""
    aggs = []
    for desc in descriptors:
        agg_type, col, out = parse_descriptor(desc)
        aggs.append(_agg_column(agg_type, col, uniq_cap).alias(out))
    if not aggs:
        raise ValueError("no descriptors")
    return df.groupBy(*group_cols).agg(*aggs)


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
