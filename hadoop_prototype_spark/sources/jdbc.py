"""JDBC source/sink (SURVEY.md §2.1/§2.2 db rows).

Reference: DBInputFormat (MR lib/db/DBInputFormat.java:61, LIMIT/OFFSET
splits over a count query), DataDrivenDBInputFormat (DataDrivenDBInputFormat
.java:61: bounding-value query min/max → typed splitters emit per-split
WHERE clauses), typed splitters (IntegerSplitter.java:37, TextSplitter.java
:42, DateSplitter.java:46, FloatSplitter :40, BooleanSplitter :36,
BigDecimalSplitter :41), DBOutputFormat (DBOutputFormat.java:50).

Spark's `spark.read.jdbc(url, table, column, lowerBound, upperBound,
numPartitions)` IS DataDrivenDBInputFormat for numeric/date columns — same
bounding-values strategy, one connection per partition. What Spark lacks is
the reference's TEXT and BOOLEAN splitters and explicit predicate control;
`data_driven_predicates` reproduces those as predicate lists for
`spark.read.jdbc(url, table, predicates=...)`.

The split computation (the interesting parity surface) is pure Python and
unit-tested; the read/write wrappers delegate to Spark and are e2e-tested
against the embedded Derby driver that ships in pyspark's jars/
(tests/test_jdbc_e2e.py) — a real JDBC round trip, same code path a
Postgres/MySQL jar would take on a cluster.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession


def _interpolate(low, high, n: int) -> list:
    """n+1 boundaries from low..high (numeric), endpoints inclusive."""
    if n <= 1:
        return [low, high]
    step = (high - low) / n
    bounds = [low + step * i for i in range(n)]
    bounds.append(high)
    return bounds


def integer_split_points(low: int, high: int, num_splits: int) -> list[int]:
    """IntegerSplitter (MR lib/db/IntegerSplitter.java:37): even ranges,
    remainder spread over the first splits."""
    if high < low:
        raise ValueError("high < low")
    num_splits = max(1, min(num_splits, high - low + 1))
    width, rem = divmod(high - low + 1, num_splits)
    bounds = [low]
    cur = low
    for i in range(num_splits):
        cur += width + (1 if i < rem else 0)
        bounds.append(cur)
    return bounds


def text_split_points(low: str, high: str, num_splits: int, depth: int = 4) -> list[str]:
    """TextSplitter (MR lib/db/TextSplitter.java:42): map strings to
    fractions in [0,1) over a fixed alphabet, interpolate, map back."""
    alphabet_lo, alphabet_hi = 32, 126  # printable ASCII, like the reference's BigDecimal mapping

    def to_frac(s: str) -> float:
        f, scale = 0.0, 1.0
        for ch in s[:depth]:
            scale /= (alphabet_hi - alphabet_lo + 1)
            f += scale * (min(max(ord(ch), alphabet_lo), alphabet_hi) - alphabet_lo)
        return f

    def from_frac(f: float) -> str:
        out = []
        for _ in range(depth):
            f *= (alphabet_hi - alphabet_lo + 1)
            digit = int(f)
            f -= digit
            out.append(chr(alphabet_lo + min(digit, alphabet_hi - alphabet_lo)))
        return "".join(out).rstrip()

    lo_f, hi_f = to_frac(low), to_frac(high)
    points = [low]
    for b in _interpolate(lo_f, hi_f, num_splits)[1:-1]:
        points.append(from_frac(b))
    points.append(high)
    # dedupe while keeping order (short ranges can collapse)
    seen: list[str] = []
    for p in points:
        if not seen or p != seen[-1]:
            seen.append(p)
    return seen


def date_split_points(low: dt.datetime, high: dt.datetime, num_splits: int) -> list[dt.datetime]:
    """DateSplitter (MR lib/db/DateSplitter.java:46): interpolate on epoch."""
    lo, hi = low.timestamp(), high.timestamp()
    return [dt.datetime.fromtimestamp(t, tz=low.tzinfo) for t in _interpolate(lo, hi, num_splits)]


def decimal_split_points(low: Decimal, high: Decimal, num_splits: int) -> list[Decimal]:
    """BigDecimalSplitter (MR lib/db/BigDecimalSplitter.java:41)."""
    return _interpolate(low, high, num_splits)


def boolean_split_predicates(column: str) -> list[str]:
    """BooleanSplitter (MR lib/db/BooleanSplitter.java:36): three splits."""
    return [f"{column} = TRUE", f"{column} = FALSE", f"{column} IS NULL"]


def data_driven_predicates(column: str, split_points: list) -> list[str]:
    """Per-split WHERE clauses from ordered boundaries — the reference's
    split semantics: [b0,b1), [b1,b2), ... last split inclusive of high."""

    def lit(v) -> str:
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, dt.datetime):
            return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S')}'"
        return str(v)

    preds = []
    for i in range(len(split_points) - 1):
        lo, hi = split_points[i], split_points[i + 1]
        last = i == len(split_points) - 2
        op = "<=" if last else "<"
        preds.append(f"{column} >= {lit(lo)} AND {column} {op} {lit(hi)}")
    return preds


def read_jdbc_data_driven(
    spark: SparkSession,
    url: str,
    table: str,
    column: str,
    lower,
    upper,
    num_partitions: int,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """DataDrivenDBInputFormat scan: numeric/date columns use Spark's
    built-in bounded read; other types go through explicit predicates."""
    if isinstance(lower, (int, float)):
        return spark.read.jdbc(
            url,
            table,
            column=column,
            lowerBound=lower,
            upperBound=upper,
            numPartitions=num_partitions,
            properties=properties or {},
        )
    if isinstance(lower, str):
        points = text_split_points(lower, upper, num_partitions)
    elif isinstance(lower, dt.datetime):
        points = date_split_points(lower, upper, num_partitions)
    elif isinstance(lower, Decimal):
        points = decimal_split_points(lower, upper, num_partitions)
    else:
        raise TypeError(f"unsupported split column type: {type(lower)}")
    return spark.read.jdbc(
        url, table, predicates=data_driven_predicates(column, points), properties=properties or {}
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties=None,
    column_types: str | None = None,
) -> None:
    """DBOutputFormat sink (INSERT per row, batched by Spark).

    column_types: optional ``createTableColumnTypes`` DDL fragment — some
    dialects map StringType to a non-comparable type by default (Derby:
    CLOB), so predicate-partitioned readers need an explicit VARCHAR.
    """
    writer = df.write
    if column_types:
        writer = writer.option("createTableColumnTypes", column_types)
    writer.jdbc(url, table, mode=mode, properties=properties or {})


def db_count_page_view(
    spark: SparkSession,
    url: str,
    src_table: str = "ACCESS",
    dst_table: str = "PAGEVIEW",
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """DBCountPageView (EX/DBCountPageView.java:79): read a pageview access
    log from a database, count views per url, write (url, pageview) back.

    The reference wires DBInputFormat → TokenizeMapper/SumReducer →
    DBOutputFormat; here the whole job is one declarative plan ending in a
    JDBC sink. Its self-check (``verify()``, EX/DBCountPageView.java:340)
    asserts sum(pageview) == total access rows — reproduced in the e2e test.

    Scale shape: the JDBC scan parallelizes via partitioning options on the
    read side (see read_jdbc_data_driven); the aggregation is a standard
    partial+final hash aggregate; only the (small) per-url counts hit the
    write connection.
    """
    from pyspark.sql import functions as F

    props = properties or {}
    access = spark.read.jdbc(url, src_table, properties=props)
    counts = access.groupBy(F.col("URL").alias("URL")).agg(F.count("*").alias("PAGEVIEW"))
    # overwrite, not append: the reference recreates PAGEVIEW each run
    # (EX/DBCountPageView.java:79 initialize() drops/creates), so re-running
    # the job must not double the counts — verify()'s sum(pageview) ==
    # total-access invariant has to hold across consecutive runs.
    counts.write.jdbc(url, dst_table, mode="overwrite", properties=props)
    return counts
