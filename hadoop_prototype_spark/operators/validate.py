"""Data-quality validation: declarative constraint checks computed in ONE
table scan (engine extension — the Deequ/expectations stage every
production ingest runs before publishing a table; the reference's
closest analogue is bad-record skipping, which drops rows instead of
accounting for them).

Design for 100 TB:
- Every constraint compiles to one aggregate expression (a violation
  COUNT), so N constraints over a table cost ONE scan + one global
  aggregate, map-side combined — not N queries. The wide 1-row result
  unpivots to the tall report with ``stack`` (map-side, no shuffle).
- ``unique`` needs a distinct count; a single count(DISTINCT col) plans
  as a two-phase aggregate with a key-partitioned pre-shuffle of the
  whole column, and MULTIPLE distinct columns add an Expand multiplier.
  Prefer one unique check per validation pass, or the approx variant
  (``approx=True`` swaps in approx_count_distinct: keeps the pure
  scalar-aggregate shape — no column shuffle at all — at ±2%, the right
  trade at 100 TB where "roughly unique" catches the bug).
- Referential integrity is a left-anti count against the parent's
  distinct keys (AQE broadcasts dimension-sized parents; fact-sized
  parents shuffle once on the key).

Violation semantics (pinned by the oracle and tests): NULL fails
``accepted_values`` and ``value_range`` (a constraint on a value a row
does not have is a violation — use ``not_null`` composition to make
that explicit), but does not fail ``non_negative``/``unique`` (SQL
count/distinct ignore NULLs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Check = tuple  # ("not_null", col) | ("unique", col) | ("non_negative", col)
# | ("value_range", col, lo, hi) | ("accepted_values", col, (v1, v2, ...))


def _sql_lit(v) -> str:
    # single quotes double to escape (ANSI) — check values come from user
    # JSON, so "O'Brien" must neither break nor inject into the aggregate
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _require_cols(df: DataFrame, checks: list[Check]) -> None:
    known = set(df.columns)
    for c in checks:
        if c[1] not in known:
            raise ValueError(
                f"check {c[0]!r} references unknown column {c[1]!r};"
                f" table has {sorted(known)}"
            )


def _violation_expr(check: Check) -> str:
    kind, col = check[0], check[1]
    if kind == "not_null":
        return f"sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)"
    if kind == "unique":
        return f"count({col}) - count(DISTINCT {col})"
    if kind == "non_negative":
        return f"sum(CASE WHEN {col} < 0 THEN 1 ELSE 0 END)"
    if kind == "value_range":
        lo, hi = check[2], check[3]
        return (
            f"sum(CASE WHEN {col} IS NULL OR {col} < {_sql_lit(lo)}"
            f" OR {col} > {_sql_lit(hi)} THEN 1 ELSE 0 END)"
        )
    if kind == "accepted_values":
        vals = ", ".join(_sql_lit(v) for v in check[2])
        return (
            f"sum(CASE WHEN {col} IS NULL OR {col} NOT IN ({vals})"
            f" THEN 1 ELSE 0 END)"
        )
    raise ValueError(f"unknown check kind: {kind}")


def check_constraints(
    df: DataFrame, checks: list[Check], approx: bool = False, rsd: float = 0.02
) -> DataFrame:
    """Tall report (check_name, col_name, violations, passed) — one scan,
    one global aggregate, for any number of constraints.

    ``approx=True`` swaps unique's exact distinct for a HyperLogL-based
    estimate WITH a 2·rsd noise margin subtracted: the estimate is only
    accurate to ±rsd, so a sub-margin shortfall on a genuinely-unique
    column must not fail the gate. Approx mode therefore detects GROSS
    uniqueness violations (duplicate fraction > 2·rsd), which is the
    publish-gate question; exact mode certifies."""
    _require_cols(df, checks)
    aggs = []
    for i, c in enumerate(checks):
        e = _violation_expr(c)
        if approx and c[0] == "unique":
            col = c[1]
            e = (
                f"greatest(CAST(0 AS BIGINT), count({col})"
                f" - approx_count_distinct({col}, {rsd})"
                f" - CAST(floor({2 * rsd} * count({col})) AS BIGINT))"
            )
        aggs.append(f"CAST(coalesce({e}, 0) AS BIGINT) AS _v{i}")
    wide = df.agg(*[F.expr(a) for a in aggs])
    stack_args = ", ".join(
        f"'{c[0]}', '{c[1]}', _v{i}" for i, c in enumerate(checks)
    )
    return wide.selectExpr(
        f"stack({len(checks)}, {stack_args}) AS (check_name, col_name, violations)"
    ).selectExpr("check_name", "col_name", "violations", "violations = 0 AS passed")


def referential_orphans(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """One-row report: child rows whose key has no parent (NULL child keys
    are orphans only if non-null — SQL FK semantics: NULL passes)."""
    orphans = child.filter(F.col(child_col).isNotNull()).join(
        parent.select(F.col(parent_col).alias(child_col)).distinct(),
        child_col,
        "left_anti",
    )
    return orphans.agg(
        F.lit("ref_integrity").alias("check_name"),
        F.lit(child_col).alias("col_name"),
        F.count(F.lit(1)).cast("long").alias("violations"),
    ).selectExpr("check_name", "col_name", "violations", "violations = 0 AS passed")


def validation_report(
    df: DataFrame,
    checks: list[Check],
    refs: list[tuple[str, DataFrame, str]] = (),
    approx: bool = False,
) -> DataFrame:
    """Constraint report ∪ referential-integrity rows. ``refs`` entries are
    (child_col, parent_df, parent_col)."""
    report = check_constraints(df, checks, approx=approx)
    for child_col, parent, parent_col in refs:
        report = report.unionByName(
            referential_orphans(df, child_col, parent, parent_col)
        )
    return report


def constraints_oracle_sql(table: str, checks: list[Check]) -> str:
    """DuckDB twin of check_constraints (same expressions, same NULL
    semantics); CAST to BIGINT — DuckDB sums integers to HUGEINT."""
    selects = [
        f"SELECT '{c[0]}' AS check_name, '{c[1]}' AS col_name, "
        f"CAST(coalesce({_violation_expr(c)}, 0) AS BIGINT) AS violations "
        f"FROM {table}"
        for c in checks
    ]
    return (
        "SELECT check_name, col_name, violations, violations = 0 AS passed FROM ("
        + " UNION ALL ".join(selects)
        + ")"
    )


def ref_orphans_oracle_sql(
    child_table: str, child_col: str, parent_table: str, parent_col: str
) -> str:
    return f"""
    SELECT 'ref_integrity' AS check_name, '{child_col}' AS col_name,
           CAST(count(*) AS BIGINT) AS violations,
           count(*) = 0 AS passed
    FROM {child_table} c
    WHERE c.{child_col} IS NOT NULL
      AND c.{child_col} NOT IN (SELECT {parent_col} FROM {parent_table})
    """


# --- column profiling --------------------------------------------------------


def profile_numeric(
    df: DataFrame, cols: list[str], approx: bool = False
) -> DataFrame:
    """One-scan numeric column profiles: (col_name, n_non_null, n_nulls,
    n_distinct, min, max, mean) — the discovery half of the Deequ pairing
    (check_constraints is the gate). All metrics for all columns come from
    ONE global aggregate over one scan.

    Determinism contract: ``mean`` divides an EXACT fixed-point sum
    (floor(x·10⁶ + 0.5) summed as DECIMAL(38,0) — no int64 overflow at any
    row count, no engine-divergent decimal rounding of doubles; the
    prototype_scores idiom) so the value is identical across partition
    orders and engines. The per-VALUE fixed-point cast is exact only for
    |x| ≤ 9.2e12 (2⁶³/10⁶; beyond it Spark's non-ANSI cast saturates while
    DuckDB errors) — values past that bound are excluded from the sum in
    both engines and the column's ``mean`` is reported as NULL ("mean
    unavailable at this magnitude"), never a silently-divergent number.
    Each exact ``n_distinct`` adds an Expand factor to the aggregate;
    ``approx=True`` swaps in HLL estimates (±2%), the right default when
    profiling many columns at 100 TB.
    """
    aggs: list[str] = []
    for i, c in enumerate(cols):
        distinct = (
            f"approx_count_distinct({c})" if approx else f"count(DISTINCT {c})"
        )
        aggs += [
            f"count({c}) AS _n{i}",
            f"CAST(coalesce(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS _nn{i}",
            f"CAST({distinct} AS BIGINT) AS _d{i}",
            f"min(CAST({c} AS DOUBLE)) AS _mn{i}",
            f"max(CAST({c} AS DOUBLE)) AS _mx{i}",
            f"sum(CASE WHEN abs(CAST({c} AS DOUBLE)) <= 9.2e12 THEN "
            f"CAST(CAST(floor(CAST({c} AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS DECIMAL(38,0)) END) AS _s{i}",
            f"max(CASE WHEN abs(CAST({c} AS DOUBLE)) > 9.2e12 THEN 1 ELSE 0 END) AS _ov{i}",
        ]
    wide = df.agg(*[F.expr(a) for a in aggs])
    stack = ", ".join(
        f"'{c}', _n{i}, _nn{i}, _d{i}, _mn{i}, _mx{i}, "
        f"CASE WHEN _n{i} > 0 AND _ov{i} = 0 THEN CAST(_s{i} AS DOUBLE) / 1000000.0 / CAST(_n{i} AS DOUBLE) END"
        for i, c in enumerate(cols)
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(col_name, n_non_null, n_nulls, n_distinct, min, max, mean)"
    )


def profile_numeric_oracle_sql(table: str, cols: list[str]) -> str:
    selects = [
        f"SELECT '{c}' AS col_name, "
        f"CAST(count({c}) AS BIGINT) AS n_non_null, "
        f"CAST(coalesce(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_nulls, "
        f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
        f"min(CAST({c} AS DOUBLE)) AS min, "
        f"max(CAST({c} AS DOUBLE)) AS max, "
        f"CASE WHEN count({c}) > 0 AND coalesce(max(CASE WHEN abs(CAST({c} AS DOUBLE)) > 9.2e12 THEN 1 ELSE 0 END), 0) = 0 THEN "
        f"CAST(sum(CASE WHEN abs(CAST({c} AS DOUBLE)) <= 9.2e12 THEN CAST(CAST(floor(CAST({c} AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS DECIMAL(38,0)) END) AS DOUBLE)"
        f" / 1000000.0 / CAST(count({c}) AS DOUBLE) END AS mean "
        f"FROM {table}"
        for c in cols
    ]
    return " UNION ALL ".join(selects)


def profile_strings(
    df: DataFrame, cols: list[str], approx: bool = False
) -> DataFrame:
    """One-scan string column profiles: (col_name, n_non_null, n_nulls,
    n_empty, n_distinct, min_len, max_len, mean_len, min_value, max_value)
    — profile_numeric's sibling for text/categorical columns; together
    they are the discovery half of the Deequ pairing.

    All metrics for all columns come from ONE global aggregate over one
    scan. mean_len divides an exact BIGINT length sum (lengths are
    integers — no fixed-point machinery needed; a 100 TB corpus sums to
    ~1e14, far inside int64). min/max_value are binary (codepoint) string
    order, identical in both engines. Each exact ``n_distinct`` adds an
    Expand factor; ``approx=True`` swaps in HLL (±2%) — the right default
    for high-cardinality text columns at scale."""
    _require_cols(df, [("profile", c) for c in cols])
    aggs: list[str] = []
    for i, c in enumerate(cols):
        distinct = (
            f"approx_count_distinct({c})" if approx else f"count(DISTINCT {c})"
        )
        aggs += [
            f"count({c}) AS _n{i}",
            f"CAST(coalesce(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS _nn{i}",
            f"CAST(coalesce(sum(CASE WHEN {c} = '' THEN 1 ELSE 0 END), 0) AS BIGINT) AS _ne{i}",
            f"CAST({distinct} AS BIGINT) AS _d{i}",
            f"CAST(min(length({c})) AS BIGINT) AS _ln{i}",
            f"CAST(max(length({c})) AS BIGINT) AS _lx{i}",
            f"CAST(sum(CAST(length({c}) AS BIGINT)) AS BIGINT) AS _ls{i}",
            f"min({c}) AS _vn{i}",
            f"max({c}) AS _vx{i}",
        ]
    wide = df.agg(*[F.expr(a) for a in aggs])
    stack = ", ".join(
        f"'{c}', _n{i}, _nn{i}, _ne{i}, _d{i}, _ln{i}, _lx{i}, "
        f"CASE WHEN _n{i} > 0 THEN CAST(_ls{i} AS DOUBLE) / CAST(_n{i} AS DOUBLE) END, "
        f"_vn{i}, _vx{i}"
        for i, c in enumerate(cols)
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(col_name, n_non_null, n_nulls, n_empty, n_distinct,"
        " min_len, max_len, mean_len, min_value, max_value)"
    )


def profile_strings_oracle_sql(table: str, cols: list[str]) -> str:
    selects = [
        f"SELECT '{c}' AS col_name, "
        f"CAST(count({c}) AS BIGINT) AS n_non_null, "
        f"CAST(coalesce(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_nulls, "
        f"CAST(coalesce(sum(CASE WHEN {c} = '' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_empty, "
        f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
        f"CAST(min(length({c})) AS BIGINT) AS min_len, "
        f"CAST(max(length({c})) AS BIGINT) AS max_len, "
        f"CASE WHEN count({c}) > 0 THEN "
        f"CAST(sum(CAST(length({c}) AS BIGINT)) AS DOUBLE) / CAST(count({c}) AS DOUBLE) END AS mean_len, "
        f"min({c}) AS min_value, "
        f"max({c}) AS max_value "
        f"FROM {table}"
        for c in cols
    ]
    return " UNION ALL ".join(selects)
