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


# ---------------------------------------------------------------------------
# bloom-filter pre-join pruning — runtime-filter technique for selective joins


BLOOM_M_BITS = 1 << 20  # filter size: 1M bits = 16k longs = 128 KB broadcast
BLOOM_K = 4  # salted xxhash64 probes per key


def _bloom_positions(key: str, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K):
    # k salted 64-bit hashes → k bit positions; pmod keeps them non-negative.
    # The key is canonicalized to STRING before hashing: xxhash64 is
    # type-sensitive, so an INT build side and a BIGINT probe side (which a
    # plain equi-join would happily coerce) would otherwise hash different
    # bytes and produce silent FALSE NEGATIVES — violating the "results are
    # exactly the plain join's" contract.
    return [
        F.expr(f"pmod(xxhash64(CAST({key} AS STRING), {salt}), {m_bits})")
        for salt in range(k)
    ]


def build_bloom(dim: DataFrame, key: str, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> DataFrame:
    """One-row DataFrame (bloom: array<bigint>) — an m_bits bloom filter of
    dim's keys.

    Construction is distributed: each key emits its k bit positions, a
    map-side-combining DISTINCT bounds the aggregate at m_bits rows
    REGARDLESS of dim's size, and the driver packs the (bounded by
    construction) position set into m_bits/64 words. The result broadcasts
    at a fixed 128 KB where dim itself might be GBs wide.
    """
    positions = (
        dim.select(F.explode(F.array(*_bloom_positions(key, m_bits, k))).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in positions:
        p = r.p
        words[p // 64] |= 1 << (p % 64)
    # pack to signed int64 for Spark's BIGINT
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    spark = dim.sparkSession
    return spark.createDataFrame([(words,)], "bloom array<bigint>")


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Join fact to dim after pruning fact rows through a bloom filter of
    dim's keys.

    The scale case: dim is too big to broadcast (the join must shuffle
    BOTH sides) but far smaller than fact, and the join is selective —
    most fact rows match nothing. The bloom filter is 128 KB regardless
    of dim's row count/width, broadcasts where dim cannot, and drops
    non-matching fact rows BEFORE the fact-side shuffle — the dominant
    cost at 100 TB. False positives only (extra rows ride to the join and
    drop there), never false negatives: results are exactly the plain
    join's, pinned by test. This is the manual, any-expression form of
    the runtime row-level filtering Spark's optimizer injects when its
    bloom-filter thresholds apply.

    Reference analogue: none — the datajoin reduce-side join always
    shuffled the full fact table (datajoin/DataJoinReducerBase.java);
    this is the move that avoids exactly that.
    """
    _assert_bloomable_key_types(fact, dim, key)
    bloom = build_bloom(dim, key, m_bits, k)
    return bloom_prune(fact, bloom, key, m_bits, k).join(dim, key, how)


def _assert_bloomable_key_types(fact: DataFrame, dim: DataFrame, key: str) -> None:
    """STRING canonicalization makes every INTEGRAL width mix hash
    identically ('1' == '1'), but a fractional-vs-integral mix does NOT
    ('1.0' != '1') — the plain equi-join would coerce and match, so the
    bloom would produce silent false negatives. Refuse those pairings and
    tell the caller to align the types explicitly."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    integral = (ByteType, ShortType, IntegerType, LongType)
    ft, dt = fact.schema[key].dataType, dim.schema[key].dataType
    if ft == dt:
        return
    if isinstance(ft, integral) and isinstance(dt, integral):
        return
    raise ValueError(
        f"bloom_pruned_join: key {key!r} has incompatible types for hashed "
        f"pruning (fact={ft.simpleString()}, dim={dt.simpleString()}); cast "
        "both sides to one type first — a silent type mix would drop true "
        "matches"
    )


def bloom_prune(
    fact: DataFrame,
    bloom: DataFrame,
    key: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Filter fact rows through a built bloom filter (all k probe bits
    set). Broadcast join of the 1-row word array + pure codegen bit math —
    zero shuffles."""
    # probe with the SAME canonicalized hash family as build_bloom
    # (_bloom_positions): STRING-cast key, salted xxhash64
    checks = [
        (
            F.expr(
                f"element_at(bloom, CAST(pmod(xxhash64(CAST({key} AS STRING), {salt}), {m_bits}) DIV 64 AS INT) + 1)"
            ).bitwiseAND(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64(CAST({key} AS STRING), {salt}), {m_bits}) % 64 AS INT))"
                )
            )
            != 0
        )
        for salt in range(k)
    ]
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    return fact.join(F.broadcast(bloom)).filter(cond).drop("bloom")


# ---------------------------------------------------------------------------
# as-of join — time-series enrichment Spark has no native operator for


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
    right_id_col: str | None = None,
) -> DataFrame:
    """For every left row, attach the LATEST right row with the same key
    and right.ts ≤ left.ts (backward as-of; equal timestamps match).

    Spark has no as-of operator, and the naive formulation — an inequality
    join + per-left-row max — builds |left|×|right| candidate pairs per
    key before pruning. This implementation is the union-and-window form:
    tag both sides, union, ONE hash-partition by key with an in-partition
    sort on (ts, side, tie), and carry right values forward with
    last(ignorenulls). Cost is a single shuffle of left+right — the same
    as any grouped aggregate, at any scale. A pathologically hot key
    serializes within that key (inherent to per-key time ordering — AQE
    cannot split a window partition); the mitigation is time-range
    chunking of the hot key with per-chunk carry-in, the same move a
    secondary-sort reducer needs.

    Determinism: at equal ts the right row sorts BEFORE the left row (so
    it is visible), and ties among right rows break on ``right_id_col``
    (required if right can carry duplicate (key, ts) pairs — the LAST in
    tie order wins, mirrored in the oracle).

    Reference analogue: none. The closest reference idiom is the
    SecondarySort reducer walking a per-key time-ordered stream
    (EX/SecondarySort.java:51) — which is exactly what the window here
    compiles to, minus the hand-written reducer.
    """
    from pyspark.sql.window import Window

    tie = F.col(right_id_col) if right_id_col else F.lit(0)
    lcols = left.columns
    r_tagged = right.select(
        F.col(key),
        F.col(ts).alias("_ats"),
        F.lit(0).alias("_side"),
        tie.alias("_tie"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
    )
    l_tagged = left.select(
        F.col(key),
        F.col(ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(0).alias("_tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_value_cols],
        *[F.col(c) for c in lcols if c != key],
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ats", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r_tagged.unionByName(l_tagged).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        key,
        F.col("_ats").alias(ts),
        *[c for c in lcols if c not in (key, ts)],
        *[F.col(f"asof_{c}") for c in right_value_cols],
    )
