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


SortKey = "str | Column | tuple[str | Column, bool]"  # (expr, reverse)


def _normalize_keys(cols) -> list[tuple[Column, bool]]:
    out: list[tuple[Column, bool]] = []
    for c in cols:
        if isinstance(c, tuple):
            e, rev = c
            out.append((F.col(e) if isinstance(e, str) else e, bool(rev)))
        else:
            out.append((F.col(c) if isinstance(c, str) else c, False))
    return out


def _sample_boundaries(skdf: DataFrame, sk_names: list[str], dirs: list[bool],
                       num_partitions: int, samples_per_partition: int,
                       sampler: str = "split", sample_freq: float = 0.01) -> list[tuple]:
    """InputSampler (MR lib/partition/InputSampler.java): draw a bounded key
    sample, sort it, pick num_partitions-1 evenly spaced split keys.
    Deterministic for a deterministic scan — the boundaries become PLAN
    LITERALS. Three reference sampler variants:

    - 'split' (SplitSampler, InputSampler.java:97): first n records of every
      input split. Cheapest (short-circuits each split) but biased on
      sorted-ish input — the head of each split under-represents the tail,
      exactly the data layout total-order sort is used on.
    - 'interval' (IntervalSampler, InputSampler.java:249): every
      (1/freq)-th record of each split — unbiased on sorted input, scans
      whole splits.
    - 'random' (RandomSampler, InputSampler.java:159): key-content hash
      sample at rate freq, capped at num_partitions*samples_per_partition
      records. Content-derived (md5) instead of a seeded RNG so the sample —
      hence the boundaries — is invariant under input parallelism.
    """
    mid = F.monotonically_increasing_id()  # (partition << 33) + row_index
    row_in_split = mid.bitwiseAND(F.lit((1 << 33) - 1))
    if sampler == "split":
        picked = skdf.filter(row_in_split < samples_per_partition)
    elif sampler == "interval":
        step = max(1, round(1.0 / sample_freq))
        picked = skdf.filter(row_in_split % step == 0)
    elif sampler == "random":
        key_str = F.concat_ws(
            "\x1f", *[F.col(n).cast("string") for n in sk_names]
        )
        bucket32 = F.conv(F.substring(F.md5(key_str), 1, 8), 16, 10).cast("bigint")
        threshold = max(1, int(sample_freq * (1 << 32)))
        cap = num_partitions * samples_per_partition
        # cap by SMALLEST hash, not an arbitrary limit(): a bare limit takes
        # whichever partitions answer first, making boundaries depend on
        # input layout; top-cap-by-hash is a deterministic uniform subsample
        # (TakeOrdered over the already-filtered sample, so it stays tiny)
        picked = (
            skdf.withColumn("_h32", bucket32)
            .filter(F.col("_h32") < threshold)
            .orderBy("_h32")
            .limit(cap)
        )
    else:
        raise ValueError(f"unknown sampler {sampler!r} (split|interval|random)")
    rows = picked.select(*sk_names).collect()
    vals = [tuple(r) for r in rows]
    # stable multi-pass sort, least-significant key first; null placement
    # matches Spark defaults (asc NULLS FIRST / desc NULLS LAST)
    for i in reversed(range(len(dirs))):
        vals.sort(
            key=lambda t: (t[i] is not None, 0 if t[i] is None else t[i]),
            reverse=dirs[i],
        )
    n = len(vals)
    if n == 0:
        return []
    bounds = []
    for j in range(1, num_partitions):
        b = vals[min(n - 1, round(n * j / num_partitions))]
        if not bounds or b != bounds[-1]:
            bounds.append(b)
    return bounds


def _strictly_before(key_cols: list[Column], dirs: list[bool], boundary: tuple,
                     types) -> Column:
    """Expression: boundary sorts strictly before the row's key tuple, under
    per-column direction with Spark null placement."""

    def blit(i):
        v = boundary[i]
        return F.lit(v) if v is not None else F.lit(None).cast(types[i])

    cond = F.lit(False)
    for i in reversed(range(len(key_cols))):
        b, k = blit(i), key_cols[i]
        if boundary[i] is None:
            # null boundary: before any non-null (asc) / before nothing (desc)
            lt = k.isNotNull() if not dirs[i] else F.lit(False)
        elif not dirs[i]:
            lt = (b < k)  # asc: nulls first, so null k is never after b
        else:
            lt = (b > k) | k.isNull()  # desc: nulls last
        cond = lt | (b.eqNullSafe(k) & cond)
    return cond


def global_rank(
    df: DataFrame,
    *cols: str | Column | tuple,
    num_partitions: int = 32,
    rank_col: str = "rank",
    samples_per_partition: int = 20,
    sampler: str = "split",
    sample_freq: float = 0.01,
) -> DataFrame:
    """Total-order sort with a contiguous global rank column (1-based).

    The scalable form of ``row_number() OVER (ORDER BY ...)`` (which forces
    a single partition), built exactly like the reference's total-order
    sort (TotalOrderPartitioner.java:50 + InputSampler.java:57):

    1. sample split keys (sampler='split'|'interval'|'random', the three
       InputSampler variants — see _sample_boundaries; interval/random give
       unbiased boundaries on sorted-ish input where split's first-n
       under-samples split tails), sort, pick boundaries —
       a small driver-side pre-pass, like InputSampler.writePartitionFile;
    2. bucket every row with a PURE expression over boundary literals
       (count of boundaries strictly before the key) — the partitioner;
    3. rank within each bucket (one hash shuffle on the bucket id);
    4. add bucket offsets (tiny count aggregate + cumulative sum,
       broadcast back); rank = offset + local rank.

    Because the bucket is a pure function baked into the plan, every branch
    that recomputes it gets identical assignments — unlike deriving ranks
    and offsets from two executions of a sampled repartitionByRange, whose
    independently re-sampled boundaries produced duplicate/out-of-range
    ranks (caught by the sf0.01 oracle gate).

    Pass ``(col, True)`` tuples for descending keys. Ranks are
    deterministic iff the key tuple is a total order (unique tie-break).
    """
    keys = _normalize_keys(cols)
    dirs = [rev for _, rev in keys]
    sk_names = [f"_sk{i}" for i in range(len(keys))]
    skdf = df.withColumns({n: e for n, (e, _) in zip(sk_names, keys)})
    types = [skdf.schema[n].dataType for n in sk_names]

    bounds = _sample_boundaries(
        skdf, sk_names, dirs, num_partitions, samples_per_partition,
        sampler=sampler, sample_freq=sample_freq,
    )
    key_cols = [F.col(n) for n in sk_names]
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(_strictly_before(key_cols, dirs, b, types), 1).otherwise(0)
    bucketed = skdf.withColumn("_bucket", bucket)

    order = [k.desc() if rev else k.asc() for k, rev in zip(key_cols, dirs)]
    local = bucketed.withColumn(
        "_local_rank", F.row_number().over(Window.partitionBy("_bucket").orderBy(*order))
    )
    offsets = (
        bucketed.groupBy("_bucket")
        .agg(F.count("*").alias("_n"))
        .select(
            "_bucket",
            (F.sum("_n").over(Window.orderBy("_bucket")) - F.col("_n")).alias("_offset"),
        )
    )
    return (
        local.join(F.broadcast(offsets), "_bucket")
        .withColumn(rank_col, (F.col("_offset") + F.col("_local_rank")).cast("long"))
        .drop("_bucket", "_local_rank", "_offset", "_n", *sk_names)
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
    start_char: int = 1  # 1-based char offset within start_field
    end_char: int | None = None  # inclusive char offset within end_field

    @property
    def has_char_offsets(self) -> bool:
        return self.start_char != 1 or self.end_char is not None


def parse_keyfield_spec(spec: str) -> list[KeySpec]:
    """Parse ``-k2,2nr -k1`` style specs: field ranges, n/r flags, and
    GNU-sort char offsets (``-k2.4,3.1``: key runs from char 4 of field 2
    through char 1 of field 3, KeyFieldHelper.java semantics).

    A missing end field (``-k2``) means the key runs through END OF LINE
    (KeyFieldHelper.java:137-141; GNU sort agrees), not just field 2 —
    pinned against the real ``sort`` binary in
    tests/test_property_specs.py::test_keyfield_sort_matches_gnu_sort_binary."""
    out = []
    for m in _KEY_RE.finditer(spec):
        opts = m.group("opts") or ""
        start_char = int(m.group("c1")) if m.group("c1") else 1
        end_char = int(m.group("c2")) if m.group("c2") else None
        if start_char < 1 or (end_char is not None and end_char < 1):
            raise ValueError(f"char offsets are 1-based, got {m.group(0)!r}")
        out.append(
            KeySpec(
                start_field=int(m.group("f1")),
                end_field=int(m.group("f2")) if m.group("f2") else None,
                numeric="n" in opts,
                reverse="r" in opts,
                start_char=start_char,
                end_char=end_char,
            )
        )
    if not out:
        raise ValueError(f"no -k specs in {spec!r}")
    return out


# GNU sort -n / KeyFieldBasedComparator.numericalCompare semantics: the
# numeric value is the LEADING number of the key bytes (optional blanks,
# optional minus, digits, optional decimal); a key with no leading number
# compares as 0. The comparator stops at the first non-numeric byte
# (KeyFieldBasedComparator.java:140-232), so "3x" sorts as 3, not NULL.
_NUMERIC_PREFIX_RE = r"^ *(-?([0-9]+\.?[0-9]*|\.[0-9]+))"


def _numeric_key(c: Column) -> Column:
    return F.coalesce(
        F.regexp_extract(c, _NUMERIC_PREFIX_RE, 1).cast("double"), F.lit(0.0)
    )


def keyfield_sort_keys(
    spec: str, line_col: str = "line", sep: str = "\t"
) -> list[tuple[Column, bool]]:
    """Compile a sort spec into (expression, reverse) pairs — the form
    global_rank and other direction-aware consumers take."""
    arr = F.split(F.col(line_col), _regex_escape(sep))
    keys: list[tuple[Column, bool]] = []
    for ks in parse_keyfield_spec(spec):
        if ks.end_field is None:
            # Open-ended key (-k2, -k2.3): from (start_field, start_char)
            # through END OF LINE, separators included — KeyFieldHelper.java:
            # 137-141 ("no end field ... the remaining part of the key is
            # considered in its entirety"); GNU sort agrees.
            rest = F.array_join(
                F.slice(
                    arr,
                    F.lit(ks.start_field),
                    F.greatest(F.size(arr) - F.lit(ks.start_field - 1), F.lit(0)),
                ),
                sep,
            )
            c = (
                rest
                if ks.start_char == 1
                else F.substring(rest, ks.start_char, 2**31 - 1)
            )
            keys.append((_numeric_key(c) if ks.numeric else c, ks.reverse))
            continue
        end = ks.end_field
        if ks.has_char_offsets:
            # Char-offset keys span fields INCLUDING separators (GNU sort /
            # KeyFieldHelper): join fields start..end with sep, cut from
            # start_char through (end of joined minus the tail of the last
            # field past end_char), compare the substring as ONE key.
            joined = F.concat_ws(
                sep, *[F.try_element_at(arr, F.lit(f)) for f in range(ks.start_field, end + 1)]
            )
            if ks.end_char is None:
                key_end = F.length(joined)
            else:
                last_len = F.coalesce(
                    F.length(F.try_element_at(arr, F.lit(end))), F.lit(0)
                )
                key_end = F.length(joined) - (last_len - F.least(last_len, F.lit(ks.end_char)))
            c = F.substring(
                joined,
                F.lit(ks.start_char),
                F.greatest(key_end - F.lit(ks.start_char) + F.lit(1), F.lit(0)),
            )
            if ks.numeric:
                c = _numeric_key(c)
            keys.append((c, ks.reverse))
            continue
        for fld in range(ks.start_field, end + 1):
            c = F.try_element_at(arr, F.lit(fld))
            if ks.numeric:
                c = _numeric_key(c)
            keys.append((c, ks.reverse))
    return keys


def keyfield_sort_columns(spec: str, line_col: str = "line", sep: str = "\t") -> list[Column]:
    """Compile a sort spec into Spark sort expressions over split fields."""
    return [c.desc() if rev else c.asc() for c, rev in keyfield_sort_keys(spec, line_col, sep)]


def keyfield_sort(df: DataFrame, spec: str, line_col: str = "line", sep: str = "\t") -> DataFrame:
    return df.orderBy(*keyfield_sort_columns(spec, line_col, sep))


def keyfield_oracle_order_by(spec: str, line_expr: str, sep: str = "\t") -> str:
    """DuckDB ORDER BY clause equivalent of :func:`keyfield_sort_columns`."""
    from .fieldsel import sql_str

    arr = f"string_split({line_expr}, {sql_str(sep)})"

    def numeric_sql(expr: str) -> str:
        # twin of _numeric_key: leading-number value, 0 when absent
        return (
            f"coalesce(TRY_CAST(regexp_extract({expr}, "
            f"'{_NUMERIC_PREFIX_RE}', 1) AS DOUBLE), 0.0)"
        )

    parts = []
    for ks in parse_keyfield_spec(spec):
        if ks.end_field is None:
            # open-ended: fields start..end-of-line joined with the separator
            rest = (
                f"array_to_string(list_slice({arr}, {ks.start_field}, "
                f"len({arr})), {sql_str(sep)})"
            )
            expr = rest if ks.start_char == 1 else f"substr({rest}, {ks.start_char})"
            parts.append(
                (numeric_sql(expr) if ks.numeric else expr)
                + (" DESC" if ks.reverse else " ASC")
            )
            continue
        end = ks.end_field
        if ks.has_char_offsets:
            # mirror of keyfield_sort_keys' joined-substring form
            joined = f"array_to_string(list_slice({arr}, {ks.start_field}, {end}), {sql_str(sep)})"
            if ks.end_char is None:
                key_end = f"length({joined})"
            else:
                last_len = f"coalesce(length({arr}[{end}]), 0)"
                key_end = (
                    f"(length({joined}) - ({last_len} - least({last_len}, {ks.end_char})))"
                )
            expr = (
                f"substr({joined}, {ks.start_char}, "
                f"greatest({key_end} - {ks.start_char} + 1, 0))"
            )
            if ks.numeric:
                expr = numeric_sql(expr)
            parts.append(expr + (" DESC" if ks.reverse else " ASC"))
            continue
        for fld in range(ks.start_field, end + 1):
            expr = f"{arr}[{fld}]"
            if ks.numeric:
                expr = numeric_sql(expr)
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
