"""Count-min sketch frequency estimation (training-data pipeline).

Exact token counts need vocabulary-sized state; a count-min sketch is a
CONSTANT-size (d×w counters) mergeable summary with one-sided error
(estimate ≥ truth, overshoot ≤ εN with prob 1-δ for w=e/ε, d=ln 1/δ) —
the standard way a 100 TB corpus tracks heavy hitters without a
vocabulary-sized shuffle. Everything is groupBy over md5-derived
(row, bucket) keys, so the sketch is: one explode (×d), one map-side
combining aggregate, 1024 output rows regardless of corpus size — and
sketches from different corpus shards merge by cell-wise addition.

Hashes derive from functions/hashing.md5_int with per-row salts, so the
DuckDB oracle builds the IDENTICAL sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CM_DEPTH = 4
CM_WIDTH = 256


def _bucket_spark_sql(token_expr: str, d: int, width: int = CM_WIDTH) -> str:
    return (
        f"CAST(conv(substring(md5(concat('cm{d}_', {token_expr})), 1, 8), 16, 10) AS BIGINT)"
        f" % {width}"
    )


def _bucket_duck_sql(token_expr: str, d_expr: str, width: int = CM_WIDTH) -> str:
    return (
        f"(('0x' || substr(md5(concat('cm', CAST({d_expr} AS VARCHAR), '_', {token_expr})),"
        f" 1, 8))::BIGINT % {width})"
    )


def _tokens(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("token"))


def _cells_expr(depth: int) -> str:
    structs = ", ".join(
        f"named_struct('d', {d}, 'bucket', {_bucket_spark_sql('token', d)})"
        for d in range(depth)
    )
    return f"inline(array({structs}))"


def cm_sketch(df: DataFrame, text_col: str = "text", depth: int = CM_DEPTH) -> DataFrame:
    """Build the sketch: (d, bucket, cnt) — d×w rows total."""
    toks = _tokens(df, text_col)
    rows = toks.selectExpr(_cells_expr(depth))
    return rows.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def heavy_hitter_estimates(
    df: DataFrame, text_col: str = "text", top: int = 20, depth: int = CM_DEPTH
) -> DataFrame:
    """Exact top-``top`` tokens with their count-min estimates:
    (token, true_n, cm_estimate). cm_estimate ≥ true_n always (one-sided);
    equality when no bucket collisions. The probe side is bounded (top
    rows × depth), so the estimate join is a broadcast."""
    sketch = cm_sketch(df, text_col, depth)
    toks = _tokens(df, text_col)
    top_tokens = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_n"))
        .orderBy(F.col("true_n").desc(), "token")
        .limit(top)
    )
    probes = top_tokens.selectExpr("token", "true_n", _cells_expr(depth))
    return (
        sketch.join(F.broadcast(probes), ["d", "bucket"])
        .groupBy("token", "true_n")
        .agg(F.min("cnt").alias("cm_estimate"))
    )


def heavy_hitter_estimates_oracle_sql(
    table: str = "documents", top: int = 20, depth: int = CM_DEPTH
) -> str:
    bucket = _bucket_duck_sql("t.token", "d.d")
    return f"""
    WITH toks AS (
        SELECT unnest(string_split_regex(text, '\\s+')) AS token FROM {table}
    ), ds AS (
        SELECT unnest(range(0, {depth})) AS d
    ), cells AS (
        SELECT d.d AS d, {bucket} AS bucket, count(*) AS cnt
        FROM toks t CROSS JOIN ds d
        GROUP BY 1, 2
    ), top_tokens AS (
        SELECT token, count(*) AS true_n
        FROM toks GROUP BY token
        ORDER BY true_n DESC, token LIMIT {top}
    ), probes AS (
        SELECT t.token, t.true_n, d.d AS d, {bucket} AS bucket
        FROM top_tokens t CROSS JOIN ds d
    )
    SELECT p.token, p.true_n, min(c.cnt) AS cm_estimate
    FROM probes p JOIN cells c ON c.d = p.d AND c.bucket = p.bucket
    GROUP BY p.token, p.true_n
    """
