"""Join framework: n-ary inner/outer/override joins + the compose() expression language.

Reference analogues (SURVEY.md §2.4):
- CompositeInputFormat map-side merge join with its join-expression grammar
  ``inner(tbl(...),tbl(...))`` / ``outer(...)`` / ``override(...)``
  (MR lib/join/CompositeInputFormat.java:56,70-75, parsed by Parser.java:75).
  The reference requires all sources identically sorted & partitioned; in
  Spark the same plan is just an equi-join — Catalyst picks sort-merge or
  broadcast, and bucketed tables reproduce the co-partitioned precondition.
- InnerJoinRecordReader (:34): key present in ALL sources → how='inner'.
- OuterJoinRecordReader (:34): key present in ANY source, missing slots
  null → n-ary full outer with key coalescing.
- OverrideRecordReader (:42): per key, the value from the RIGHTMOST source
  that has it — prioritized upsert. Scale design (SURVEY §7 risk #2): NOT a
  chain of full outer joins (width explodes, multiple shuffles); instead
  union-all with a source-priority column + one row_number window — a
  single shuffle on the key, skew-tolerant under AQE.
- datajoin reduce-side join (DataJoinReducerBase.java:47): plain df.join.
- DistributedCache map-side hash join → F.broadcast.

compose() is a tiny recursive-descent parser producing a DataFrame, so a
user of the reference's expression strings can run them unchanged against
named DataFrames.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# n-ary joins over (key, value...) sources


def _tag(df: DataFrame, i: int, key: str) -> DataFrame:
    """Rename non-key columns with a per-source suffix to avoid collisions."""
    cols = [F.col(key)] + [
        F.col(c).alias(f"{c}_{i}") for c in df.columns if c != key
    ]
    return df.select(*cols)


def inner_join(sources: list[DataFrame], key: str) -> DataFrame:
    """Key present in all sources (InnerJoinRecordReader.combine :45-53)."""
    if not sources:
        raise ValueError("no sources")
    acc = _tag(sources[0], 0, key)
    for i, src in enumerate(sources[1:], start=1):
        acc = acc.join(_tag(src, i, key), on=key, how="inner")
    return acc


def outer_join(sources: list[DataFrame], key: str) -> DataFrame:
    """Key present in any source, absent slots null (OuterJoinRecordReader)."""
    if not sources:
        raise ValueError("no sources")
    acc = _tag(sources[0], 0, key)
    for i, src in enumerate(sources[1:], start=1):
        acc = acc.join(_tag(src, i, key), on=key, how="full_outer")
    return acc


def override_join(sources: list[DataFrame], key: str) -> DataFrame:
    """Per key, the row from the rightmost source containing it
    (OverrideRecordReader doc :34-39).

    Implemented as union-all + priority row_number — one shuffle, constant
    row width, no outer-join chain. All sources must share a schema.
    """
    if not sources:
        raise ValueError("no sources")
    cols = sources[0].columns
    tagged = [
        src.select(*cols).withColumn("_priority", F.lit(i))
        for i, src in enumerate(sources)
    ]
    unioned = tagged[0]
    for t in tagged[1:]:
        unioned = unioned.unionByName(t)
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(F.col("_priority").desc())
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_priority")
    )


def broadcast_hash_join(
    big: DataFrame, small: DataFrame, on: str | list[str] | Column, how: str = "inner"
) -> DataFrame:
    """Map-side hash join: replicate the small table to every task
    (DistributedCache pattern, MR core/filecache/DistributedCache.java:134)."""
    return big.join(F.broadcast(small), on=on, how=how)


# ---------------------------------------------------------------------------
# compose(): the CompositeInputFormat join expression language
#
# grammar (CompositeInputFormat.java:70-75):
#   expr   := op '(' arg (',' arg)* ')' | 'tbl(' name ')'
#   op     := 'inner' | 'outer' | 'override'
#   arg    := expr

_TOKEN = re.compile(r"\s*([a-zA-Z_][a-zA-Z_0-9]*|\(|\)|,)\s*")


@dataclass
class _Node:
    op: str  # 'tbl' | 'inner' | 'outer' | 'override'
    name: str | None = None
    children: list["_Node"] | None = None


class JoinExprParser:
    def __init__(self, expr: str):
        self.tokens = _TOKEN.findall(expr)
        self.pos = 0

    def _peek(self) -> str | None:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def _next(self) -> str:
        tok = self._peek()
        if tok is None:
            raise ValueError("unexpected end of join expression")
        self.pos += 1
        return tok

    def _expect(self, tok: str) -> None:
        got = self._next()
        if got != tok:
            raise ValueError(f"expected {tok!r}, got {got!r}")

    def parse(self) -> _Node:
        node = self._expr()
        if self._peek() is not None:
            raise ValueError(f"trailing tokens: {self.tokens[self.pos:]}")
        return node

    def _expr(self) -> _Node:
        op = self._next()
        self._expect("(")
        if op == "tbl":
            name = self._next()
            self._expect(")")
            return _Node("tbl", name=name)
        if op not in ("inner", "outer", "override"):
            raise ValueError(f"unknown join op: {op!r}")
        children = [self._expr()]
        while self._peek() == ",":
            self._next()
            children.append(self._expr())
        self._expect(")")
        return _Node(op, children=children)


def compose(expr: str, tables: dict[str, DataFrame], key: str) -> DataFrame:
    """Evaluate a CompositeInputFormat-style join expression.

    ``compose("inner(tbl(a),outer(tbl(b),tbl(c)))", {...}, key="k")``
    """
    node = JoinExprParser(expr).parse()

    def ev(n: _Node) -> DataFrame:
        if n.op == "tbl":
            if n.name not in tables:
                raise KeyError(f"unknown table {n.name!r} in join expression")
            return tables[n.name]
        sources = [ev(c) for c in (n.children or [])]
        if n.op == "inner":
            return inner_join(sources, key)
        if n.op == "outer":
            return outer_join(sources, key)
        return override_join(sources, key)

    return ev(node)


# ---------------------------------------------------------------------------
# range (interval) join — native extra (SURVEY §2.4 N/A table: the reference
# can only express this as a hand-written reducer; Spark gives the range
# condition for free, and the bucketized rewrite makes it an EQUI-join)


def range_join_bucketed(
    fact: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join fact rows to intervals with lo <= value < hi, as an equi-join.

    Naive range joins compile to BroadcastNestedLoopJoin (every fact row
    probes every interval — quadratic, and a non-broadcastable disaster at
    100 TB). The bucketized rewrite: each interval explodes to the fixed-
    width buckets it covers, each fact row computes its bucket, the join is
    an equi-join on the bucket key with a residual BETWEEN filter. Cost is
    linear in |fact| + Σ interval spans / bucket_width, shuffles hash-
    partition, and AQE skew-splits hot buckets.
    """
    fb = fact.withColumn("_bucket", F.floor(F.col(value_col) / bucket_width).cast("long"))
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                (F.ceil(F.col(hi_col) / bucket_width) - 1).cast("long"),
            )
        ),
    )
    return fb.join(ib, "_bucket").filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    ).drop("_bucket")
