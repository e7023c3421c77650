"""Sort operators: total-order sort, key-field sort-spec compiler, secondary sort.

Reference analogues (SURVEY.md §2.6):
- Sort example + TotalOrderPartitioner + InputSampler
  (EX/Sort.java:57, MR lib/partition/TotalOrderPartitioner.java:50,
  InputSampler.java:57): Spark's ``orderBy`` IS this operator — the
  RangePartitioner samples split points exactly like InputSampler and the
  output contract ("concatenation of part files is sorted") holds because
  partitions are range-disjoint and internally sorted. Validated in tests,
  not assumed (SURVEY §7 risk #4).
- KeyFieldBasedComparator (MR lib/partition/KeyFieldBasedComparator.java:53,
  KeyFieldHelper.java): GNU-sort-style ``-k`` specs compiled to Column sort
  expressions.
- SecondarySort (EX/SecondarySort.java:51): Window.partitionBy().orderBy().
- LongWritable.DecreasingComparator (IO/LongWritable.java:98): ``.desc()``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec

# ---------------------------------------------------------------------------
# total-order sort


def total_order_sort(df: DataFrame, *cols: str | Column, ascending: bool = True) -> DataFrame:
    """Globally ordered output (Sort example / TeraSort semantics).

    Spark range-partitions on sampled split points (TotalOrderPartitioner +
    InputSampler equivalent) and sorts within partitions; concatenating the
    output part files in partition order yields a totally sorted dataset.
    """
    ordered = [c if isinstance(c, Column) else F.col(c) for c in cols]
    if not ascending:
        ordered = [c.desc() for c in ordered]
    return df.orderBy(*ordered)


def total_order_sort_fixed(df: DataFrame, num_partitions: int, *cols: str | Column) -> DataFrame:
    """Total-order sort with an explicit reducer count (the reference's
    numReduceTasks + TotalOrderPartitioner form).

    repartitionByRange samples split keys (InputSampler equivalent) into
    exactly ``num_partitions`` range-disjoint partitions, each sorted —
    concatenating part files in order is globally sorted, and AQE cannot
    coalesce the explicit partitioning away.
    """
    ordered = [c if isinstance(c, Column) else F.col(c) for c in cols]
    return df.repartitionByRange(num_partitions, *ordered).sortWithinPartitions(*ordered)


def global_rank(
    df: DataFrame, *cols: str | Column, num_partitions: int = 32, rank_col: str = "rank"
) -> DataFrame:
    """Total-order sort with a contiguous global rank column (1-based).

    The scalable two-phase form of ``row_number() OVER (ORDER BY ...)``
    (which would force a single partition): range-partition on the sort key,
    rank within each range partition (the window partition = one physical
    partition, no extra shuffle), and add per-partition row-count offsets
    computed from a tiny aggregate that is broadcast back. Range partitions
    are ordered by partition id, so offset(p) = Σ counts of partitions < p.

    Rank values are deterministic iff the sort key is a total order
    (include a unique tie-break column) — sampled range boundaries move
    rows between partitions but never change offset+local rank.
    """
    ordered = [c if isinstance(c, Column) else F.col(c) for c in cols]
    parted = df.repartitionByRange(num_partitions, *ordered).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*ordered)
    local = parted.withColumn("_local_rank", F.row_number().over(w))
    offsets = (
        parted.groupBy("_pid")
        .agg(F.count("*").alias("_n"))
        .select(
            "_pid",
            (F.sum("_n").over(Window.orderBy("_pid")) - F.col("_n")).alias("_offset"),
        )
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_offset") + F.col("_local_rank")).cast("long"))
        .drop("_pid", "_local_rank", "_offset", "_n")
    )


# ---------------------------------------------------------------------------
# KeyFieldBasedComparator: "-k f1[.c1][,f2[.c2]][opts]" spec compiler

_KEY_RE = re.compile(
    r"-k\s*(?P<f1>\d+)(?:\.(?P<c1>\d+))?(?:,(?P<f2>\d+)(?:\.(?P<c2>\d+))?)?(?P<opts>[nr]*)"
)


@dataclass(frozen=True)
class KeySpec:
    start_field: int  # 1-based, like GNU sort
    end_field: int | None
    numeric: bool
    reverse: bool


def parse_keyfield_spec(spec: str) -> list[KeySpec]:
    """Parse ``-k2,2nr -k1`` style specs (subset: field ranges + n/r flags).

    Character offsets (``.c``) within fields are accepted by the grammar but
    not implemented — the reference's tests exercise field-level specs.
    """
    out = []
    for m in _KEY_RE.finditer(spec):
        opts = m.group("opts") or ""
        out.append(
            KeySpec(
                start_field=int(m.group("f1")),
                end_field=int(m.group("f2")) if m.group("f2") else None,
                numeric="n" in opts,
                reverse="r" in opts,
            )
        )
    if not out:
        raise ValueError(f"no -k specs in {spec!r}")
    return out


def keyfield_sort_columns(spec: str, line_col: str = "line", sep: str = "\t") -> list[Column]:
    """Compile a sort spec into Spark sort expressions over split fields."""
    arr = F.split(F.col(line_col), _regex_escape(sep))
    cols: list[Column] = []
    for ks in parse_keyfield_spec(spec):
        end = ks.end_field or ks.start_field
        for fld in range(ks.start_field, end + 1):
            c: Column = F.try_element_at(arr, F.lit(fld))
            if ks.numeric:
                c = c.cast("double")
            cols.append(c.desc() if ks.reverse else c.asc())
    return cols


def keyfield_sort(df: DataFrame, spec: str, line_col: str = "line", sep: str = "\t") -> DataFrame:
    return df.orderBy(*keyfield_sort_columns(spec, line_col, sep))


def keyfield_oracle_order_by(spec: str, line_expr: str, sep: str = "\t") -> str:
    """DuckDB ORDER BY clause equivalent of :func:`keyfield_sort_columns`."""
    from .fieldsel import sql_str

    arr = f"string_split({line_expr}, {sql_str(sep)})"
    parts = []
    for ks in parse_keyfield_spec(spec):
        end = ks.end_field or ks.start_field
        for fld in range(ks.start_field, end + 1):
            expr = f"{arr}[{fld}]"
            if ks.numeric:
                expr = f"CAST({expr} AS DOUBLE)"
            parts.append(expr + (" DESC" if ks.reverse else " ASC"))
    return ", ".join(parts)


# ---------------------------------------------------------------------------
# secondary sort


def secondary_sort_window(partition_cols: list[str], order_cols: list[str | Column]) -> WindowSpec:
    """FirstPartitioner + FirstGroupingComparator + sort comparator →
    Window.partitionBy(group).orderBy(sort)."""
    return Window.partitionBy(*partition_cols).orderBy(*order_cols)


def with_group_rank(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str | Column],
    out: str = "rn",
) -> DataFrame:
    """Materialize per-group value order as a rank column."""
    w = secondary_sort_window(partition_cols, order_cols)
    return df.withColumn(out, F.row_number().over(w))


def _regex_escape(sep: str) -> str:
    return "".join(("\\" + c) if c in r"\.[]{}()*+?^$|" else c for c in sep)
