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


# --- histogram quantile sketch ----------------------------------------------
#
# Exact percentiles need a total sort (or global_rank's sampled range
# machinery); a fixed-range equi-width histogram is the constant-space
# mergeable alternative: one map-side-combined aggregate to ≤ HIST_BINS
# rows, shard histograms merge by cell-wise addition, and any quantile
# reads off the cumulative counts. Estimate error is bounded by the bin
# width over the clamped domain — the monitoring-percentile trade
# (Prometheus-style histograms make exactly this one).
#
# Determinism: bin = clamp(floor(value / width)) is pure IEEE arithmetic;
# the quantile selection ("smallest bin whose cumulative count reaches
# ceil(q·n)") is integer comparison; the reported edge is width·bin — a
# double product of a literal and a small integer. Bit-identical across
# engines; no interpolation (interpolation would divide by in-bin counts,
# still deterministic, but the edge convention keeps the contract obvious).

HIST_BINS = 512
HIST_LO = 0.0
HIST_HI = 1024.0
HIST_WIDTH = (HIST_HI - HIST_LO) / HIST_BINS
QUANTILES = (0.5, 0.9, 0.95, 0.99)


def _hist_bin_spark_sql(
    value_expr: str, lo: float = HIST_LO, hi: float = HIST_HI, bins: int = HIST_BINS
) -> str:
    width = (hi - lo) / bins
    return (
        f"least({bins - 1}, greatest(0, "
        f"CAST(floor(({value_expr} - {lo!r}) / {width!r}) AS BIGINT)))"
    )


def _hist_bin_duck_sql(
    value_expr: str, lo: float = HIST_LO, hi: float = HIST_HI, bins: int = HIST_BINS
) -> str:
    width = (hi - lo) / bins
    return (
        f"least({bins - 1}, greatest(0, "
        f"CAST(floor((CAST({value_expr} AS DOUBLE) - CAST({lo!r} AS DOUBLE))"
        f" / CAST({width!r} AS DOUBLE)) AS BIGINT)))"
    )


def value_histogram_sketch(df: DataFrame, value_col: str = "value") -> DataFrame:
    """(bin, cnt) — ≤ HIST_BINS rows; merges by cell-wise cnt addition."""
    return (
        df.selectExpr(f"{_hist_bin_spark_sql(value_col)} AS bin")
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    df: DataFrame, value_col: str = "value", quantiles: tuple[float, ...] = QUANTILES
) -> DataFrame:
    """(q, est_lower_edge, exact_value) per requested quantile.

    est_lower_edge reads straight off the histogram. exact_value — min v
    with |{x ≤ v}| ≥ ceil(q·n) — is computed by HISTOGRAM PRUNING: the
    collected ≤ HIST_BINS counts (a bounded driver-side collect, same
    budget as global_rank's boundary sample) locate the target bin and the
    in-bin rank k; the exact value is then a TakeOrdered(k) over ONLY that
    bin's rows, with the bin filter pushed into the scan. No global sort,
    no full-data window — the classic two-pass exact-quantile shape. A
    pathologically overloaded bin would make k large; the fix (recurse the
    histogram inside the bin) is noted, not needed on bounded-width bins.
    """
    import math

    hist_rows = sorted(
        (r.bin, r.cnt) for r in value_histogram_sketch(df, value_col).collect()
    )
    if not hist_rows:
        raise ValueError("histogram_quantiles: input has no rows")
    n = sum(c for _, c in hist_rows)
    bin_col = F.expr(_hist_bin_spark_sql(value_col))
    out = None
    for q in quantiles:
        # ceil(q·n): identical IEEE product + ceil in the oracle
        target = math.ceil(q * n)
        cum = 0
        sel_bin, k = hist_rows[-1][0], hist_rows[-1][1]
        for b, c in hist_rows:
            if cum + c >= target:
                sel_bin, k = b, target - cum
                break
            cum += c
        est_edge = sel_bin * HIST_WIDTH + HIST_LO
        exact = (
            df.filter(bin_col == sel_bin)
            .select(F.col(value_col).alias("v"))
            .orderBy("v")
            .limit(int(k))
            .agg(F.max("v").alias("exact_value"))
            .select(
                F.lit(float(q)).alias("q"),
                F.lit(float(est_edge)).alias("est_lower_edge"),
                "exact_value",
            )
        )
        out = exact if out is None else out.unionByName(exact)
    return out


def histogram_quantiles_oracle_sql(
    table: str = "events",
    value_col: str = "value",
    quantiles: tuple[float, ...] = QUANTILES,
) -> str:
    # DuckDB parses decimal-point literals as DECIMAL; cast everything to
    # DOUBLE so the arithmetic (and the returned types) match Spark's
    qs = ", ".join(f"(CAST({q!r} AS DOUBLE))" for q in quantiles)
    bin_expr = _hist_bin_duck_sql(value_col)
    return f"""
    WITH hist AS (
        SELECT {bin_expr} AS bin, count(*) AS cnt FROM {table} GROUP BY 1
    ), cum AS (
        SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM hist
    ), pv AS (
        SELECT {value_col} AS v, count(*) AS c FROM {table} GROUP BY 1
    ), vcum AS (
        SELECT v, sum(c) OVER (ORDER BY v) AS vcum FROM pv
    ), qs(q) AS (VALUES {qs}),
    targets AS (
        SELECT q, CAST(ceil(q * (SELECT count(*) FROM {table})) AS BIGINT) AS target
        FROM qs
    )
    SELECT t.q,
           CAST((SELECT min(bin) FROM cum WHERE cum >= t.target) AS DOUBLE)
               * CAST({HIST_WIDTH!r} AS DOUBLE)
               + CAST({HIST_LO!r} AS DOUBLE) AS est_lower_edge,
           (SELECT min(v) FROM vcum WHERE vcum >= t.target) AS exact_value
    FROM targets t
    """


# --- HyperLogLog ------------------------------------------------------------
#
# Constant-space distinct counting: m=2^p registers, each holding the max
# leading-zero rank of the hashes routed to it. Registers merge by cell-wise
# max, so shard sketches combine without re-scanning — the 100 TB shape for
# "distinct tokens/URLs/users" where exact count(DISTINCT) would shuffle a
# vocabulary-sized key set. Here the whole reduction is ONE map-side-combined
# aggregate producing ≤ m rows.
#
# Determinism contract (registry.py): the harmonic mean is computed as an
# EXACT integer sum of power-of-two terms (2^(53-M) per register, absent
# registers contribute 2^53), then one BIGINT→DOUBLE cast and one IEEE
# division — bit-identical across engines, unlike a float Σ2^-M whose
# addition order differs. The standard small-range (linear-counting)
# correction needs ln(), which is NOT bit-portable across libm builds, so
# the operator returns the raw estimator plus the zero-register count and
# documents the correction as caller-side.

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
HLL_HASH_BITS = 60  # md5_int with 15 hex chars
HLL_W_BITS = HLL_HASH_BITS - HLL_P  # 52 bits feed the rank
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
# alpha * m^2 * 2^53 folded into one literal so both engines divide the
# same constant by the same exact integer sum
_HLL_NUMERATOR = _HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_W_BITS + 1))


def _hll_cell_spark_sql(token_expr: str) -> str:
    h = f"CAST(conv(substring(md5({token_expr}), 1, 15), 16, 10) AS BIGINT)"
    return (
        f"named_struct('bucket', {h} % {HLL_M}, "
        f"'rho', CASE WHEN {h} DIV {HLL_M} = 0 THEN {HLL_W_BITS + 1} "
        f"ELSE {HLL_W_BITS + 1} - length(bin({h} DIV {HLL_M})) END)"
    )


def _hll_cell_duck_sql(token_expr: str) -> str:
    h = f"(('0x' || substr(md5({token_expr}), 1, 15))::BIGINT)"
    return (
        f"{h} % {HLL_M} AS bucket, "
        f"CASE WHEN {h} // {HLL_M} = 0 THEN {HLL_W_BITS + 1} "
        f"ELSE {HLL_W_BITS + 1} - length(bin({h} // {HLL_M})) END AS rho"
    )


def hll_sketch_values(values: DataFrame, value_col: str) -> DataFrame:
    """HLL registers over any string column: (bucket, max_rho), ≤ m rows.

    Duplicate values are free (max is idempotent) — feed the RAW value
    stream, never pay a distinct shuffle first. Sketches from disjoint
    shards merge with ``groupBy(bucket).agg(max(max_rho))`` — pinned by
    the mergeability test.
    """
    cells = values.selectExpr(f"inline(array({_hll_cell_spark_sql(value_col)}))")
    return cells.groupBy("bucket").agg(F.max("rho").alias("max_rho"))


def hll_sketch(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token-distinct HLL registers over a document corpus."""
    return hll_sketch_values(_tokens(df, text_col), "token")


def hll_estimate(sketch: DataFrame) -> DataFrame:
    """One row: (hll_estimate DOUBLE, n_zero_registers BIGINT).

    Raw HLL estimator alpha·m²/Σ2^-M via the exact-integer construction
    above. n_zero_registers > 0 signals the small-range regime where the
    caller should prefer linear counting.
    """
    terms = sketch.selectExpr(
        f"shiftleft(CAST(1 AS BIGINT), {HLL_W_BITS + 1} - max_rho) AS term"
    )
    # coalesce: an EMPTY sketch (no registers) must yield the all-zero-
    # register estimate (alpha·m — the raw estimator at n=0), not NULL
    agg = terms.selectExpr(
        "coalesce(sum(term), CAST(0 AS BIGINT)) AS present_sum",
        "count(*) AS n_present",
    )
    return agg.selectExpr(
        f"{_HLL_NUMERATOR!r} / CAST(present_sum + ({HLL_M} - n_present) * "
        f"shiftleft(CAST(1 AS BIGINT), {HLL_W_BITS + 1}) AS DOUBLE) AS hll_estimate",
        f"{HLL_M} - n_present AS n_zero_registers",
    )


def hll_distinct_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(hll_estimate, n_zero_registers, exact_distinct) over the corpus —
    the estimator next to the ground truth it approximates."""
    est = hll_estimate(hll_sketch(df, text_col))
    exact = _tokens(df, text_col).agg(
        F.countDistinct("token").alias("exact_distinct")
    )
    return est.crossJoin(exact)


def hll_distinct_shingles(df: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """(hll_estimate, n_zero_registers, exact_distinct) over word k-shingles
    — the high-cardinality regime HLL exists for (n ≫ m). The shingle
    stream is UNdistincted (distinct=False): HLL absorbs duplicates, so the
    only shuffle in the sketch path is the ≤ m-row register aggregation."""
    from .dedup import word_shingles

    sh = word_shingles(df, k, text_col=text_col, distinct=False)
    # the query also publishes exact_distinct, which pays the distinct
    # shuffle anyway — so dedup ONCE and feed both aggregates from the
    # materialized distinct set (HLL registers are value-deterministic,
    # duplicates never change them; count over the distinct set IS
    # countDistinct). One corpus scan instead of two (r15 opt).
    d = sh.select("shingle").distinct().localCheckpoint(eager=False)
    est = hll_estimate(hll_sketch_values(d, "shingle"))
    exact = d.agg(F.count(F.lit(1)).alias("exact_distinct"))
    return est.crossJoin(exact)


def hll_distinct_shingles_oracle_sql(table: str = "documents", k: int = 3) -> str:
    from .dedup import word_shingles_oracle_cte

    return f"""
    WITH {word_shingles_oracle_cte(table, k)},
    cells AS (
        SELECT {_hll_cell_duck_sql('shingle')} FROM shingles
    ), regs AS (
        SELECT bucket, max(rho) AS max_rho FROM cells GROUP BY bucket
    ), agg AS (
        SELECT sum((1::BIGINT << ({HLL_W_BITS + 1} - max_rho)))::BIGINT AS present_sum,
               count(*) AS n_present
        FROM regs
    )
    SELECT {_HLL_NUMERATOR!r} / CAST(present_sum + ({HLL_M} - n_present) *
               (1::BIGINT << {HLL_W_BITS + 1}) AS DOUBLE) AS hll_estimate,
           {HLL_M} - n_present AS n_zero_registers,
           (SELECT count(DISTINCT shingle) FROM shingles) AS exact_distinct
    FROM agg
    """


def hll_distinct_tokens_oracle_sql(table: str = "documents") -> str:
    return f"""
    WITH toks AS (
        SELECT unnest(string_split_regex(text, '\\s+')) AS token FROM {table}
    ), cells AS (
        SELECT {_hll_cell_duck_sql('token')} FROM toks
    ), regs AS (
        SELECT bucket, max(rho) AS max_rho FROM cells GROUP BY bucket
    ), agg AS (
        SELECT sum((1::BIGINT << ({HLL_W_BITS + 1} - max_rho)))::BIGINT AS present_sum,
               count(*) AS n_present
        FROM regs
    )
    SELECT {_HLL_NUMERATOR!r} / CAST(present_sum + ({HLL_M} - n_present) *
               (1::BIGINT << {HLL_W_BITS + 1}) AS DOUBLE) AS hll_estimate,
           {HLL_M} - n_present AS n_zero_registers,
           (SELECT count(DISTINCT token) FROM toks) AS exact_distinct
    FROM agg
    """


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


def hll_grouped_estimate(
    df: DataFrame, group_col: str, value_expr: str
) -> DataFrame:
    """Per-group HLL distinct estimate: (group, hll_estimate,
    n_zero_registers, exact_distinct).

    The grouped form is where HLL replaces count(DISTINCT) at scale: an
    exact grouped distinct shuffles every (group, value) pair; the sketch
    shuffles at most groups × m register rows — constant per group. Same
    exact-integer estimator as hll_estimate.
    """
    cells = df.selectExpr(
        group_col, f"inline(array({_hll_cell_spark_sql(value_expr)}))"
    )
    regs = cells.groupBy(group_col, "bucket").agg(F.max("rho").alias("max_rho"))
    agg = regs.groupBy(group_col).agg(
        F.expr(
            f"sum(shiftleft(CAST(1 AS BIGINT), {HLL_W_BITS + 1} - max_rho)) AS present_sum"
        ),
        F.count(F.lit(1)).alias("n_present"),
    )
    est = agg.selectExpr(
        group_col,
        f"{_HLL_NUMERATOR!r} / CAST(present_sum + ({HLL_M} - n_present) * "
        f"shiftleft(CAST(1 AS BIGINT), {HLL_W_BITS + 1}) AS DOUBLE) AS hll_estimate",
        f"{HLL_M} - n_present AS n_zero_registers",
    )
    exact = df.groupBy(group_col).agg(
        F.expr(f"count(DISTINCT {value_expr}) AS exact_distinct")
    )
    return est.join(exact, group_col)


def hll_grouped_oracle_sql(
    table: str = "events",
    group_col: str = "event_type",
    value_expr: str = "CAST(user_id AS VARCHAR)",
) -> str:
    return f"""
    WITH cells AS (
        SELECT {group_col}, {_hll_cell_duck_sql(value_expr)} FROM {table}
    ), regs AS (
        SELECT {group_col}, bucket, max(rho) AS max_rho FROM cells GROUP BY 1, 2
    ), agg AS (
        SELECT {group_col},
               sum((1::BIGINT << ({HLL_W_BITS + 1} - max_rho)))::BIGINT AS present_sum,
               count(*) AS n_present
        FROM regs GROUP BY 1
    ), est AS (
        SELECT {group_col},
               {_HLL_NUMERATOR!r} / CAST(present_sum + ({HLL_M} - n_present) *
                   (1::BIGINT << {HLL_W_BITS + 1}) AS DOUBLE) AS hll_estimate,
               {HLL_M} - n_present AS n_zero_registers
        FROM agg
    ), exact AS (
        SELECT {group_col}, count(DISTINCT {value_expr}) AS exact_distinct
        FROM {table} GROUP BY 1
    )
    SELECT e.{group_col}, e.hll_estimate, e.n_zero_registers, x.exact_distinct
    FROM est e JOIN exact x USING ({group_col})
    """


def grouped_histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str = "value",
    quantiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """(group, q, est_lower_edge): per-group quantile estimates read off
    per-group histograms — the grouped form stays FULLY distributed (no
    driver collect): the cumulative window partitions by group over ≤
    HIST_BINS rows each, and the quantile selection is a min-bin aggregate.
    This is the production shape for 'p95 latency per tenant' over
    billions of groups-worth of rows."""
    qs_arr = ", ".join(f"CAST({q!r} AS DOUBLE)" for q in quantiles)
    hist = (
        df.selectExpr(group_col, f"{_hist_bin_spark_sql(value_col)} AS bin")
        .groupBy(group_col, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy("bin")
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    totals = hist.groupBy(group_col).agg(F.sum("cnt").alias("n"))
    expanded = (
        cum.join(totals, group_col)
        .selectExpr(group_col, "bin", "cum", f"explode(array({qs_arr})) AS q", "n")
        .filter(F.expr("cum >= ceil(q * n)"))
    )
    return expanded.groupBy(group_col, "q").agg(
        F.expr(
            f"CAST(min(bin) AS DOUBLE) * CAST({HIST_WIDTH!r} AS DOUBLE)"
            f" + CAST({HIST_LO!r} AS DOUBLE)"
        ).alias("est_lower_edge")
    )


def grouped_histogram_quantiles_oracle_sql(
    table: str = "events",
    group_col: str = "event_type",
    value_col: str = "value",
    quantiles: tuple[float, ...] = (0.5, 0.95),
) -> str:
    qs = ", ".join(f"(CAST({q!r} AS DOUBLE))" for q in quantiles)
    bin_expr = _hist_bin_duck_sql(value_col)
    return f"""
    WITH hist AS (
        SELECT {group_col}, {bin_expr} AS bin, count(*) AS cnt
        FROM {table} GROUP BY 1, 2
    ), cum AS (
        SELECT {group_col}, bin, cnt,
               sum(cnt) OVER (PARTITION BY {group_col} ORDER BY bin) AS cum
        FROM hist
    ), totals AS (
        SELECT {group_col}, sum(cnt) AS n FROM hist GROUP BY 1
    ), qs(q) AS (VALUES {qs})
    SELECT c.{group_col}, qs.q,
           CAST(min(c.bin) AS DOUBLE) * CAST({HIST_WIDTH!r} AS DOUBLE)
               + CAST({HIST_LO!r} AS DOUBLE) AS est_lower_edge
    FROM cum c JOIN totals t USING ({group_col}) CROSS JOIN qs
    WHERE c.cum >= ceil(qs.q * t.n)
    GROUP BY 1, 2
    """


WINSOR_LO_Q, WINSOR_HI_Q = 0.01, 0.99


def winsorize(
    df: DataFrame,
    value_col: str = "value",
    id_col: str = "event_id",
    lo_q: float = WINSOR_LO_Q,
    hi_q: float = WINSOR_HI_Q,
) -> DataFrame:
    """Outlier clipping at exact corpus quantiles (the data-cleaning
    winsorization stage): values below the p_lo / above the p_hi order
    statistic clamp to it, with per-row clipped flags.

    Shape: the two cutoffs come from histogram_quantiles' histogram-
    pruned exact order statistics (bounded driver collect) and bake into
    the clip projection as literals — the clip pass is pure map-side
    codegen over the corpus. The cutoffs are actual data values, so both
    engines agree bit-for-bit by construction."""
    rows = {
        float(r.q): float(r.exact_value)
        for r in histogram_quantiles(df, value_col, (lo_q, hi_q)).collect()
    }
    lo_v, hi_v = rows[float(lo_q)], rows[float(hi_q)]
    v = F.col(value_col).cast("double")
    return df.select(
        F.col(id_col),
        v.alias("value"),
        F.greatest(F.least(v, F.lit(hi_v)), F.lit(lo_v)).alias("value_winsorized"),
        (v < lo_v).alias("clipped_low"),
        (v > hi_v).alias("clipped_high"),
    )


def winsorize_oracle_sql(
    table: str = "events",
    value_col: str = "value",
    id_col: str = "event_id",
    lo_q: float = WINSOR_LO_Q,
    hi_q: float = WINSOR_HI_Q,
) -> str:
    quant = histogram_quantiles_oracle_sql(table, value_col, (lo_q, hi_q))
    return f"""
    WITH quants AS ({quant}),
    lo AS (SELECT exact_value AS lo_v FROM quants WHERE q = CAST({lo_q!r} AS DOUBLE)),
    hi AS (SELECT exact_value AS hi_v FROM quants WHERE q = CAST({hi_q!r} AS DOUBLE))
    SELECT e.{id_col},
           CAST(e.{value_col} AS DOUBLE) AS value,
           greatest(least(CAST(e.{value_col} AS DOUBLE), hi_v), lo_v) AS value_winsorized,
           CAST(e.{value_col} AS DOUBLE) < lo_v AS clipped_low,
           CAST(e.{value_col} AS DOUBLE) > hi_v AS clipped_high
    FROM {table} e CROSS JOIN lo CROSS JOIN hi
    """
