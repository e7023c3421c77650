"""Deterministic sampling operators for training-data pipelines.

No reference analogue beyond the MD5 percent filter
(MR lib/input/SequenceFileInputFilter.java:200 — MD5Filter keeps records
whose key-digest mod f == 0); these generalize that idea to the three
samplers a corpus pipeline actually needs:

- hash_rate_sample: per-stratum keep-rates (e.g. downsample English, keep
  all low-resource languages). Pure map-side filter — a broadcast join
  against a tiny rates table plus a codegen md5 bucket test. ZERO shuffles
  of the corpus; the 100 TB path is embarrassingly parallel and the filter
  composes with parquet predicate pushdown on the stratum column.
- per_group_fixed_k: exactly k uniform-without-replacement docs per group
  (hash-rank order). Scale shape: a count pre-pass derives a hash cutoff
  that prefilters each group to ~margin*k expected survivors BEFORE the
  rank window, so the per-group sort sees ~margin*k rows instead of the
  full group (a billion-row group would otherwise single-task sort).
- train_eval_split: deterministic train/valid/test assignment by hash
  bucket — stable across reruns and cluster sizes, no RNG state.

Determinism: every keep/assign decision derives from
functions/hashing.md5_int on the row id, so Spark and the DuckDB oracle
agree bit-for-bit and a re-run (or a different partitioning) cannot change
the sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int, md5_int_sql

# Buckets for rate-based decisions. 10_000 gives 0.01% rate resolution.
RATE_BUCKETS = 10_000

# Default per-language keep rates (percent of RATE_BUCKETS/100): downsample
# the over-represented strata, keep the tail whole — the canonical corpus
# balancing move.
DEFAULT_RATES: dict[str, float] = {"en": 35.0, "de": 60.0, "fr": 60.0, "es": 80.0}
DEFAULT_RATE_OTHER = 100.0

SAMPLE_SALT = "strat"


def _bucket(id_col: str) -> F.Column:
    return md5_int(F.col(id_col).cast("string"), 8, salt=SAMPLE_SALT) % RATE_BUCKETS


def _bucket_sql(id_expr: str) -> str:
    return f"({md5_int_sql(f'CAST({id_expr} AS VARCHAR)', 8, salt=SAMPLE_SALT)} % {RATE_BUCKETS})"


def hash_rate_sample(
    df: DataFrame,
    rates: dict[str, float] | None = None,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = DEFAULT_RATE_OTHER,
) -> DataFrame:
    """Keep each row iff md5(id) bucket < its stratum's keep-rate.

    The rates table is a handful of rows → broadcast hash join; the corpus
    side is never shuffled. Rows whose stratum has no configured rate fall
    back to ``default_rate``.
    """
    rates = DEFAULT_RATES if rates is None else rates
    spark = df.sparkSession
    rate_rows = [(k, float(v)) for k, v in sorted(rates.items())]
    rates_df = spark.createDataFrame(rate_rows, f"{stratum_col} string, keep_rate double")
    keep_buckets = F.coalesce(F.col("keep_rate"), F.lit(float(default_rate))) * (
        RATE_BUCKETS / 100.0
    )
    return (
        df.join(F.broadcast(rates_df), stratum_col, "left")
        .filter(_bucket(id_col) < keep_buckets)
        .drop("keep_rate")
    )


def hash_rate_sample_oracle_sql(
    table: str = "documents",
    rates: dict[str, float] | None = None,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = DEFAULT_RATE_OTHER,
) -> str:
    rates = DEFAULT_RATES if rates is None else rates
    values = ", ".join(f"('{k}', {float(v)})" for k, v in sorted(rates.items()))
    return f"""
    SELECT t.*
    FROM {table} t
    LEFT JOIN (VALUES {values}) AS r({stratum_col}, keep_rate)
      ON t.{stratum_col} = r.{stratum_col}
    WHERE {_bucket_sql(f't.{id_col}')}
          < coalesce(r.keep_rate, {float(default_rate)}) * {RATE_BUCKETS / 100.0}
    """


def per_group_fixed_k(
    df: DataFrame,
    k: int = 20,
    group_col: str = "source",
    id_col: str = "doc_id",
    margin: int = 8,
) -> DataFrame:
    """Exactly min(k, |group|) uniformly-sampled rows per group.

    Sample order is the md5-rank of the id (ties impossible: rank breaks on
    the id itself), so the choice is deterministic and independent of
    physical layout.

    Scale shape: per-group counts (one map-side-combined agg over just the
    group column) derive a hash cutoff keeping ~margin*k expected rows per
    group; the cutoff prefilter runs map-side before the rank window, so
    the window sort input is O(margin*k) per group, not O(|group|). With
    margin=8 the probability a group with >k rows retains fewer than k
    survivors is < e^-k (Chernoff) — vanishing for any useful k; groups
    with ≤ k rows are kept whole by the cutoff clamp.
    """
    from pyspark.sql.window import Window

    bucket = _bucket(id_col)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    # cutoff in bucket space: keep ~margin*k of n uniformly-spread buckets,
    # clamped to the full space when the group is small
    cutoff = F.least(
        F.lit(RATE_BUCKETS).cast("double"),
        F.lit(float(margin * k)) * RATE_BUCKETS / F.col("_n").cast("double"),
    )
    survivors = (
        df.join(F.broadcast(counts), group_col)
        .filter(bucket.cast("double") < cutoff)
        .drop("_n")
    )
    w = Window.partitionBy(group_col).orderBy(bucket.asc(), F.col(id_col).asc())
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def per_group_fixed_k_oracle_sql(
    table: str = "documents",
    k: int = 20,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    # the oracle ranks the WHOLE group — the engine's cutoff prefilter must
    # be invisible in the result, which is exactly what the parity test pins
    bucket = _bucket_sql(id_col)
    return f"""
    WITH ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY {group_col} ORDER BY {bucket} ASC, {id_col} ASC
        ) AS sample_rank
        FROM {table}
    )
    SELECT * FROM ranked WHERE sample_rank <= {k}
    """


def weighted_sample(
    df: DataFrame,
    weight: "F.Column",
    id_col: str = "doc_id",
    factor: float = 1.0,
) -> DataFrame:
    """Deterministic weighted Bernoulli sampling: keep a row iff
    md5(id) bucket < clamp(weight·factor, 0, 1)·RATE_BUCKETS.

    ``weight`` is any [0,1]-ish Column (quality score, length prior,
    inverse-cluster-size, ...); rows with weight ≥ 1/factor are always
    kept. Same scale shape as hash_rate_sample: a pure map-side filter,
    zero shuffles, layout- and rerun-invariant, monotone in factor.
    """
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), weight * F.lit(float(factor))))
    return df.filter(_bucket(id_col).cast("double") < p * RATE_BUCKETS)


def weighted_sample_oracle_sql(
    table: str = "documents",
    weight_sql: str = "least(CAST(n_chars AS DOUBLE) / 2000.0, 1.0)",
    id_col: str = "doc_id",
    factor: float = 1.0,
) -> str:
    return f"""
    SELECT *
    FROM {table}
    WHERE {_bucket_sql(id_col)}
          < least(1.0, greatest(0.0, ({weight_sql}) * {float(factor)})) * {RATE_BUCKETS}
    """


# train/valid/test proportions in bucket space (out of RATE_BUCKETS)
SPLIT_EDGES: tuple[tuple[str, int], ...] = (
    ("train", 9000),  # [0, 9000)    → 90%
    ("valid", 9500),  # [9000, 9500) →  5%
    ("test", RATE_BUCKETS),  # [9500, 10000) → 5%
)

SPLIT_SALT = "split"


def train_eval_split(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Assign each row a stable train/valid/test split by md5 bucket.

    Pure map-side projection — the assignment never changes when the data
    is repartitioned, appended to, or re-run, which is the property RNG
    splits lack.
    """
    bucket = md5_int(F.col(id_col).cast("string"), 8, salt=SPLIT_SALT) % RATE_BUCKETS
    expr = F.when(bucket < SPLIT_EDGES[0][1], F.lit(SPLIT_EDGES[0][0]))
    expr = expr.when(bucket < SPLIT_EDGES[1][1], F.lit(SPLIT_EDGES[1][0]))
    expr = expr.otherwise(F.lit(SPLIT_EDGES[2][0]))
    return df.withColumn("split", expr)


def train_eval_split_oracle_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    bucket = f"({md5_int_sql(f'CAST({id_col} AS VARCHAR)', 8, salt=SPLIT_SALT)} % {RATE_BUCKETS})"
    return f"""
    SELECT *, CASE WHEN {bucket} < {SPLIT_EDGES[0][1]} THEN '{SPLIT_EDGES[0][0]}'
                   WHEN {bucket} < {SPLIT_EDGES[1][1]} THEN '{SPLIT_EDGES[1][0]}'
                   ELSE '{SPLIT_EDGES[2][0]}' END AS split
    FROM {table}
    """


def leakage_free_split(
    docs: DataFrame, components: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Train/valid/test split that can never leak near-duplicates across
    the boundary: the split decision hashes the doc's near-dup CLUSTER
    label (its connected component), so every member of a cluster lands
    on the same side. Plain per-doc hashing (train_eval_split) puts two
    near-identical docs on opposite sides ~2·p·(1-p) of the time — the
    exact leakage the decontamination stage exists to catch, prevented
    here at split time instead.

    ``components`` is connected_components() output over any pair graph
    (MinHash-LSH here; SimHash or embedding pairs drop in). Docs absent
    from it are singleton clusters (component = own id), so the result
    extends train_eval_split exactly: identical assignment wherever no
    near-dup exists.

    Scale shape: one equi-join of the corpus against the (clustered docs
    only) component table — broadcast when dup rate is low, shuffle
    otherwise — then the same pure map-side bucket rule as
    train_eval_split; appends and re-runs cannot move a cluster.
    """
    comp = components.select(F.col("node").alias(id_col), "component")
    key = F.coalesce(F.col("component"), F.col(id_col)).cast("string")
    bucket = md5_int(key, 8, salt=SPLIT_SALT) % RATE_BUCKETS
    expr = F.when(bucket < SPLIT_EDGES[0][1], F.lit(SPLIT_EDGES[0][0]))
    expr = expr.when(bucket < SPLIT_EDGES[1][1], F.lit(SPLIT_EDGES[1][0]))
    expr = expr.otherwise(F.lit(SPLIT_EDGES[2][0]))
    return (
        docs.join(comp, id_col, "left")
        .withColumn("split", expr)
        .drop("component")
    )


def leakage_free_split_oracle_sql(table: str = "documents", k: int = 3) -> str:
    from .dedup import minhash_pairs_oracle_ctes

    bucket = (
        f"({md5_int_sql('CAST(coalesce(c.component, d.doc_id) AS VARCHAR)', 8, salt=SPLIT_SALT)}"
        f" % {RATE_BUCKETS})"
    )
    return f"""
    WITH RECURSIVE {minhash_pairs_oracle_ctes(table, k)},
    edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
        SELECT a AS doc_id, least(a, min(b)) AS component
        FROM reach GROUP BY a
    )
    SELECT d.doc_id,
           CASE WHEN {bucket} < {SPLIT_EDGES[0][1]} THEN '{SPLIT_EDGES[0][0]}'
                WHEN {bucket} < {SPLIT_EDGES[1][1]} THEN '{SPLIT_EDGES[1][0]}'
                ELSE '{SPLIT_EDGES[2][0]}' END AS split
    FROM {table} d LEFT JOIN comp c ON d.doc_id = c.doc_id
    """


# --- corpus mixture planning -------------------------------------------------

# Default target mixture over the fixture's 20 sources: proportional to
# (index+1) — deliberately non-uniform so the plan is non-trivial.
DEFAULT_MIXTURE: dict[str, float] = {
    f"src{i}": (i + 1) / 210.0 for i in range(20)
}


def _source_token_counts(
    df: DataFrame,
    source_col: str,
    text_col: str,
    stats: "object | None",
) -> DataFrame:
    """(source, n_tokens) for the mixture planners: a one-scan token-count
    aggregate, or — when a precomputed operators.corpusstats.CorpusStats is
    supplied — a literal |sources|-row table with NO corpus scan at all
    (the stats table is maintained alongside the corpus at ingest; token
    definitions are shared, so the counts are identical)."""
    if stats is not None:
        return df.sparkSession.createDataFrame(
            sorted(stats.source_tokens().items()),
            f"{source_col} string, n_tokens bigint",
        )
    return (
        df.select(source_col, F.split(F.col(text_col), r"\s+").alias("_w"))
        .groupBy(source_col)
        .agg(F.sum(F.size("_w")).alias("n_tokens"))
    )


def mixture_plan(
    df: DataFrame,
    targets: dict[str, float] | None = None,
    source_col: str = "source",
    text_col: str = "text",
    stats: "object | None" = None,
) -> DataFrame:
    """Per-source sampling rates that realize a target token mixture:
    (source, n_tokens, target_share, keep_rate, expected_tokens).

    The pretraining mixture problem: given target proportions p_s and
    available token counts tok_s, the largest feasible downsample-only
    corpus is T = min_s tok_s/p_s tokens; each source keeps
    rate_s = p_s·T/tok_s ≤ 1 of its tokens. The binding source keeps
    everything; over-represented sources downsample. Feed ``keep_rate``
    into hash_rate_sample to execute the plan deterministically.

    Shape: one token-count aggregate (vocabulary-free: counts only),
    broadcast of the literal target table, a 1-row global min — all
    metadata-sized after the single corpus scan. Arithmetic is exact-int
    token counts with literal targets; divisions are IEEE, identical
    expression trees in the oracle.
    """
    targets = DEFAULT_MIXTURE if targets is None else targets
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        sorted(targets.items()), f"{source_col} string, target_share double"
    )
    toks = _source_token_counts(df, source_col, text_col, stats)
    scored = toks.join(F.broadcast(tgt), source_col)
    feasible = scored.agg(
        F.min(F.expr("CAST(n_tokens AS DOUBLE) / target_share")).alias("_T")
    )
    return (
        scored.crossJoin(F.broadcast(feasible))
        .selectExpr(
            source_col,
            "n_tokens",
            "target_share",
            "target_share * _T / CAST(n_tokens AS DOUBLE) AS keep_rate",
            "target_share * _T AS expected_tokens",
        )
    )


def mixture_plan_oracle_sql(
    table: str = "documents",
    targets: dict[str, float] | None = None,
    source_col: str = "source",
) -> str:
    targets = DEFAULT_MIXTURE if targets is None else targets
    # string→DOUBLE parse is correctly rounded (IEEE round-trip of Python's
    # repr); a bare decimal literal would go through DuckDB's DECIMAL type
    # and land 1 ulp off the Python float Spark receives
    values = ", ".join(f"('{k}', '{v!r}'::DOUBLE)" for k, v in sorted(targets.items()))
    return f"""
    WITH toks AS (
        SELECT {source_col},
               CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT) AS n_tokens
        FROM {table} GROUP BY 1
    ), tgt({source_col}, target_share) AS (VALUES {values}),
    scored AS (
        SELECT t.{source_col}, t.n_tokens, g.target_share
        FROM toks t JOIN tgt g USING ({source_col})
    ), feasible AS (
        SELECT min(CAST(n_tokens AS DOUBLE) / target_share) AS _T FROM scored
    )
    SELECT {source_col}, n_tokens, target_share,
           target_share * _T / CAST(n_tokens AS DOUBLE) AS keep_rate,
           target_share * _T AS expected_tokens
    FROM scored CROSS JOIN feasible
    """


def mixture_sample(
    df: DataFrame,
    targets: dict[str, float] | None = None,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    stats: "object | None" = None,
) -> DataFrame:
    """Execute a mixture plan: keep each doc iff md5(id) bucket falls
    under its source's planned keep_rate — planner → deterministic
    hash-sampler wiring in one call.

    The plan is metadata (≤ |sources| rows), collected and re-broadcast
    as literals; the corpus pass is a pure map-side filter (same zero-
    shuffle shape as hash_rate_sample). The bucket comparison is
    ``bucket < keep_rate · RATE_BUCKETS`` with the keep_rate double
    broadcast verbatim, so the oracle — which recomputes the same plan in
    SQL — filters bit-identically.
    """
    plan = mixture_plan(df, targets, source_col, text_col, stats=stats)
    spark = df.sparkSession
    rates = plan.select(source_col, "keep_rate")
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(_bucket(id_col).cast("double") < F.col("keep_rate") * RATE_BUCKETS)
        .drop("keep_rate")
    )


def mixture_sample_oracle_sql(
    table: str = "documents",
    targets: dict[str, float] | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    return f"""
    WITH plan AS ({mixture_plan_oracle_sql(table, targets, source_col)})
    SELECT t.*
    FROM {table} t JOIN plan p USING ({source_col})
    WHERE {_bucket_sql(f't.{id_col}')} < p.keep_rate * {RATE_BUCKETS}
    """


# --- DSIR-style importance weighting ----------------------------------------

DSIR_BUCKETS = 1024
DSIR_SCALE = 1_000_000


def dsir_importance(
    df: DataFrame,
    target_filter: str = "lang = 'en'",
    buckets: int = DSIR_BUCKETS,
    scale: int = DSIR_SCALE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data Selection with Importance Resampling, hashed-feature variant:
    score each document by how much its token distribution resembles a
    TARGET subset of the corpus relative to the raw corpus. The published
    recipe hashes n-gram features into B buckets, estimates smoothed
    target/raw bucket probabilities, and weights each document by its
    features' target-vs-raw ratios; high scorers are the ones importance
    resampling keeps when selecting pretraining data that "looks like" a
    trusted target (here: a SQL predicate, so the oracle composes the same
    subset).

    Determinism: the per-bucket weight is floor(scale * p_target/p_raw) —
    an integer — so the per-doc aggregate is an exact BIGINT sum in any
    partition order. (The paper sums log-ratios; log()'s last bits differ
    between engines, so we use the scaled-ratio surrogate: the RANKING it
    induces is monotone in the mean feature ratio, which is the signal the
    selector thresholds on.) Returns (id, n_tokens, raw_score,
    importance = raw_score/scale/n_tokens).

    Scale shape: both bucket-count aggregates are B-row bounded with
    map-side combining; the weight table (B rows) broadcasts; the corpus
    pass is explode → broadcast-join → one groupBy(id). The +1 smoothing
    means Σ(n+1) over all B buckets = total_tokens + B, so the probability
    normalizers are two scalar counts — no per-bucket total pass.
    """
    from ..functions.hashing import md5_int_spark_sql

    bucket_expr = f"pmod({md5_int_spark_sql('token', 8)}, {buckets})"
    toks = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("token"))
        .selectExpr(id_col, f"{bucket_expr} AS b")
    )
    t_toks = (
        df.filter(target_filter)
        .select(F.explode(F.split(F.col(text_col), r"\s+")).alias("token"))
        .selectExpr(f"{bucket_expr} AS b")
    )
    # The two ≤B-row count tables are MATERIALIZED (lazy localCheckpoint —
    # the IVF index-build idiom; a durable write at cluster scale): they
    # feed both the weight table and the probability normalizers, and
    # without the cut each consumer re-executes the full corpus explode.
    # With it the corpus is scanned once per side + once for the final
    # per-doc pass, and Σnr/Σnt (≡ total raw/target tokens, by the +1
    # smoothing identity) are B-row sums — no extra corpus aggregates.
    raw_counts = (
        toks.groupBy("b").agg(F.count(F.lit(1)).alias("nr")).localCheckpoint(eager=False)
    )
    t_counts = (
        t_toks.groupBy("b").agg(F.count(F.lit(1)).alias("nt")).localCheckpoint(eager=False)
    )
    totals = raw_counts.agg(F.sum("nr").alias("_nraw")).crossJoin(
        t_counts.agg(F.sum("nt").alias("_ntar"))
    )
    weights = (
        raw_counts.join(t_counts, "b", "left")
        .crossJoin(F.broadcast(totals))
        .selectExpr(
            "b",
            # floor(scale * ((nt+1)/T) / ((nr+1)/R)), T = target_tokens + B,
            # R = raw_tokens + B; each step correctly-rounded IEEE → the
            # floored BIGINT is engine-independent
            f"CAST(floor(CAST({scale} AS DOUBLE)"
            f"  * (CAST(coalesce(nt, 0) + 1 AS DOUBLE) / CAST(_ntar + {buckets} AS DOUBLE))"
            f"  / (CAST(nr + 1 AS DOUBLE) / CAST(_nraw + {buckets} AS DOUBLE))) AS BIGINT) AS w",
        )
    )
    return (
        toks.join(F.broadcast(weights), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").alias("raw_score"),
            F.expr(
                f"CAST(sum(w) AS DOUBLE) / {float(scale)!r} / CAST(count(1) AS DOUBLE)"
            ).alias("importance"),
        )
    )


def dsir_importance_oracle_sql(
    table: str = "documents",
    target_filter: str = "lang = 'en'",
    buckets: int = DSIR_BUCKETS,
    scale: int = DSIR_SCALE,
) -> str:
    from ..functions.hashing import md5_int_sql

    bucket_expr = f"(({md5_int_sql('token', 8)}) % {buckets})"
    return f"""
    WITH toks AS (
        SELECT doc_id, {bucket_expr} AS b
        FROM (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token FROM {table})
    ),
    t_toks AS (
        SELECT {bucket_expr} AS b
        FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS token
              FROM {table} WHERE {target_filter})
    ),
    raw_counts AS (SELECT b, count(*) AS nr FROM toks GROUP BY b),
    t_counts AS (SELECT b, count(*) AS nt FROM t_toks GROUP BY b),
    totals AS (
        SELECT (SELECT count(*) FROM toks) AS _nraw, (SELECT count(*) FROM t_toks) AS _ntar
    ),
    weights AS (
        SELECT r.b,
               CAST(floor(CAST({scale} AS DOUBLE)
                 * (CAST(coalesce(t.nt, 0) + 1 AS DOUBLE) / CAST(_ntar + {buckets} AS DOUBLE))
                 / (CAST(r.nr + 1 AS DOUBLE) / CAST(_nraw + {buckets} AS DOUBLE))) AS BIGINT) AS w
        FROM raw_counts r LEFT JOIN t_counts t ON r.b = t.b CROSS JOIN totals
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(w.w) AS BIGINT) AS raw_score,
           CAST(sum(w.w) AS DOUBLE) / {float(scale)!r} / CAST(count(*) AS DOUBLE) AS importance
    FROM toks t JOIN weights w ON t.b = w.b
    GROUP BY t.doc_id
    """


def dsir_select(
    df: DataFrame,
    n: int = 100,
    target_filter: str = "lang = 'en'",
    buckets: int = DSIR_BUCKETS,
    scale: int = DSIR_SCALE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Execute DSIR data selection: the n documents whose hashed-feature
    distribution best matches the target (highest importance), with a
    deterministic doc-id tie-break — the scorer's companion executor, like
    mixture_plan → mixture_sample. Returns (id, importance).

    (The paper resamples with Gumbel noise; a ranked top-n is the
    deterministic variant: same selection pressure, reproducible across
    reruns and cluster layouts.) Scale shape: scoring is the dsir_importance
    plan; selection is TakeOrdered(n) — no global sort.
    """
    scored = dsir_importance(df, target_filter, buckets, scale, text_col, id_col)
    return (
        scored.select(id_col, "importance")
        .orderBy(F.col("importance").desc(), F.col(id_col).asc())
        .limit(n)
    )


def dsir_select_oracle_sql(
    table: str = "documents",
    n: int = 100,
    target_filter: str = "lang = 'en'",
    buckets: int = DSIR_BUCKETS,
    scale: int = DSIR_SCALE,
) -> str:
    return f"""
    WITH scored AS ({dsir_importance_oracle_sql(table, target_filter, buckets, scale)})
    SELECT doc_id, importance FROM scored
    ORDER BY importance DESC, doc_id ASC
    LIMIT {n}
    """


TEMP_MIX_SCALE = 1_000_000


def temperature_mixture_plan(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    stats: "object | None" = None,
) -> DataFrame:
    """Mixture plan with τ=0.5 temperature-derived targets: each source's
    share ∝ √(its token count) — the published temperature-sampling
    recipe that flattens a skewed source distribution without hand-tuned
    targets (τ=0.5 because sqrt is IEEE-correctly-rounded and therefore
    bit-portable; fractional pow() is libm-dependent and banned by the
    determinism contract).

    The share denominator Σ√tok is a FIXED-POINT BIGINT sum
    (floor(√n·10⁶ + 0.5) — a float sum over sources would depend on
    aggregation order; DuckDB's windowed sums use segment trees, so even
    an ordered-window fold is not left-assoc there). Downstream is
    mixture_plan's algebra: T = min_s tok_s/share_s, keep_rate =
    share·T/tok. One corpus scan (zero with precomputed ``stats``),
    everything after is |sources|-row metadata."""
    toks = _source_token_counts(df, source_col, text_col, stats)
    w = toks.selectExpr(
        source_col,
        "n_tokens",
        f"CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * {float(TEMP_MIX_SCALE)!r} + 0.5) AS BIGINT) AS _w",
    )
    tot = w.agg(F.sum("_w").alias("_tot"))
    shared = w.crossJoin(F.broadcast(tot)).selectExpr(
        source_col,
        "n_tokens",
        "CAST(_w AS DOUBLE) / CAST(_tot AS DOUBLE) AS target_share",
    )
    feasible = shared.agg(
        F.min(F.expr("CAST(n_tokens AS DOUBLE) / target_share")).alias("_T")
    )
    return shared.crossJoin(F.broadcast(feasible)).selectExpr(
        source_col,
        "n_tokens",
        "target_share",
        "target_share * _T / CAST(n_tokens AS DOUBLE) AS keep_rate",
        "target_share * _T AS expected_tokens",
    )


def temperature_mixture_plan_oracle_sql(
    table: str = "documents", source_col: str = "source"
) -> str:
    return f"""
    WITH toks AS (
        SELECT {source_col},
               CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT) AS n_tokens
        FROM {table} GROUP BY 1
    ), w AS (
        SELECT {source_col}, n_tokens,
               CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * {float(TEMP_MIX_SCALE)!r} + 0.5) AS BIGINT) AS _w
        FROM toks
    ), tot AS (SELECT CAST(sum(_w) AS BIGINT) AS _tot FROM w),
    shared AS (
        SELECT {source_col}, n_tokens,
               CAST(_w AS DOUBLE) / CAST(_tot AS DOUBLE) AS target_share
        FROM w CROSS JOIN tot
    ), feasible AS (
        SELECT min(CAST(n_tokens AS DOUBLE) / target_share) AS _T FROM shared
    )
    SELECT {source_col}, n_tokens, target_share,
           target_share * _T / CAST(n_tokens AS DOUBLE) AS keep_rate,
           target_share * _T AS expected_tokens
    FROM shared CROSS JOIN feasible
    """


# --- quality-ranked token-budget selection ------------------------------------


def _budget_map(budgets: "dict[str, int] | int", sources: list[str]) -> dict[str, int]:
    out = (
        {s: int(b) for s, b in budgets.items()}
        if isinstance(budgets, dict)
        else {s: int(budgets) for s in sources}
    )
    bad = {s: b for s, b in out.items() if b < 0}
    if bad:
        raise ValueError(f"token budgets must be >= 0, got {bad}")
    return out


def budget_select_exact(
    df: DataFrame,
    budgets: "dict[str, int] | int",
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy quality-ranked selection under a per-source TOKEN budget —
    the "take the best N tokens from each source" corpus-construction step
    (the FineWeb/DCLM-style recipe executor; rate-based mixture_sample
    answers "what fraction", this answers "which documents, best first").

    Semantics (shared bit-for-bit with the oracle and with budget_select's
    scale path): within each source, rank documents by (quality DESC,
    doc_id ASC) and keep a document iff the token sum of all
    HIGHER-RANKED documents is still below the source's budget — the
    greedy fill; the document that crosses the boundary is included, so
    every budget is met when the source has enough tokens. ``budgets`` is
    a per-source dict (sources absent from it are dropped) or one int
    applied to every source.

    This EXACT form shuffles the whole corpus into per-source sort order
    (a Window per source) — correct at any size but the wrong shape at
    100 TB, where one giant source becomes one giant sort partition. It
    exists as the semantics definition and the verification twin;
    ``budget_select`` is the production path.
    """
    from pyspark.sql import Window

    from .textstats import _words, quality_score_column

    per_doc = df.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        F.size(_words(F.col(text_col))).cast("bigint").alias("n_tokens"),
        quality_score_column(text_col).alias("quality"),
    )
    bmap = _budget_map(
        budgets,
        [r.source for r in per_doc.select("source").distinct().collect()]
        if not isinstance(budgets, dict)
        else [],
    )
    spark = df.sparkSession
    btab = spark.createDataFrame(
        sorted(bmap.items()), "source string, _budget bigint"
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("quality"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        per_doc.join(F.broadcast(btab), "source")
        .withColumn("_prior", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .filter(F.col("_prior") < F.col("_budget"))
        .select(id_col, "source", "n_tokens", "quality")
    )


def _budget_boundaries(
    stats, budgets: "dict[str, int] | int"
) -> dict[str, tuple[int, int]]:
    """Per source: (boundary_bin, remainder) from the stats histogram.

    Walking quality bins from high to low, boundary_bin is the first bin
    whose inclusion reaches the budget; every doc in a HIGHER bin is
    selected outright, and ``remainder`` tokens of budget are left for the
    boundary bin's own exact ranking. boundary_bin = -1 means the budget
    exceeds the source's total tokens: the whole source is selected
    (every real bin is > -1). Exact integer arithmetic on the stats
    table's token counts — no estimation anywhere.

    A dict-budgeted source with NO cells in the stats histogram is a
    hard error, not a silent -1: the -1 sentinel means "budget covers
    everything we know about", and for an absent source that would
    select the ENTIRE source regardless of its budget (even 0) — the
    stale/mismatched-stats misuse must fail loudly (round-9 advice)."""
    per_src: dict[str, dict[int, int]] = {}
    for source, qbin, _n_docs, n_tokens in stats.cells:
        cur = per_src.setdefault(source, {})
        cur[int(qbin)] = cur.get(int(qbin), 0) + int(n_tokens)
    bmap = _budget_map(budgets, sorted(per_src))
    missing = sorted(set(bmap) - set(per_src))
    if missing:
        raise ValueError(
            f"budgeted sources {missing} have no cells in the supplied "
            f"corpus stats (stats cover {sorted(per_src)}) — the stats "
            f"are stale or built from a different corpus"
        )
    out: dict[str, tuple[int, int]] = {}
    for source, budget in bmap.items():
        bins_desc = sorted(per_src.get(source, {}), reverse=True)
        acc = 0
        boundary, remainder = -1, 0
        for b in bins_desc:
            tok = per_src[source][b]
            if acc + tok >= budget:
                boundary, remainder = b, budget - acc
                break
            acc += tok
        out[source] = (boundary, remainder)
    return out


def budget_select(
    df: DataFrame,
    budgets: "dict[str, int] | int",
    stats=None,
    bins: "int | None" = None,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """budget_select_exact's result by the 100 TB plan: histogram boundary
    + boundary-bin-only ranking. Bit-identical output (pinned by tests at
    three SFs), entirely different shape:

    1. The per-(source, quality-bin) token histogram comes from the
       corpus-stats table — precomputed at ingest (pass ``stats``,
       operators.corpusstats.CorpusStats: zero corpus scan) or one
       map-side-combined aggregate pass.
    2. Driver-side exact-integer walk finds each source's boundary bin:
       all docs in higher bins are selected OUTRIGHT by a pure map-side
       filter against a broadcast |sources|-row boundary table — the
       corpus is never sorted or shuffled for them.
    3. Only the boundary bin (≤ 1/bins of the corpus per source, one
       quality-histogram cell) flows through the per-source ranking
       Window to spend the remaining budget exactly.

    Equivalence argument: bins are monotone in quality, so every doc in a
    higher bin precedes every boundary-bin doc in (quality DESC, doc_id)
    rank order, and the within-bin order equals the global order
    restricted to the bin; the greedy-fill predicate "prior tokens <
    budget" therefore splits exactly at (boundary_bin, remainder).
    """
    from .textstats import _words, quality_score_column

    per_doc = df.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        F.size(_words(F.col(text_col))).cast("bigint").alias("n_tokens"),
        quality_score_column(text_col).alias("quality"),
    )
    if stats is None:
        # no precomputed stats: the histogram pass AND the two selection
        # legs all need (n_tokens, quality) — materialize the TEXT-FREE
        # per-doc frame once (lazy localCheckpoint) so the split +
        # quality-score expressions run one time, not three (r15 opt;
        # measured 0.73x on the end-to-end corpus recipe at sf0.1). With
        # ``stats`` supplied the extra materialization would be pure
        # overhead for the single pass each leg makes — skip it.
        per_doc = per_doc.localCheckpoint(eager=False)
    return budget_select_scored(
        per_doc, budgets, stats=stats, bins=bins, id_col=id_col
    )


def budget_select_scored(
    per_doc: DataFrame,
    budgets: "dict[str, int] | int",
    stats=None,
    bins: "int | None" = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """budget_select over an already-scored per-doc frame
    (id, source, n_tokens, quality) — the entry point for callers that
    computed (or persisted) the scoring columns themselves. With
    ``stats=None`` the boundary histogram is derived from ``per_doc``
    with the exact binning expressions the text form uses, so results
    are bit-identical to budget_select on the originating corpus."""
    from pyspark.sql import Window

    from .sketch import _hist_bin_spark_sql
    from .textstats import QUALITY_HIST_BINS

    if stats is None:
        from .corpusstats import CorpusStats

        b = QUALITY_HIST_BINS if bins is None else bins
        rows = (
            per_doc.selectExpr(
                "source",
                f"{_hist_bin_spark_sql('quality', 0.0, 1.0, b)} AS qbin",
                "n_tokens",
            )
            .groupBy("source", "qbin")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
            )
            .collect()
        )
        stats = CorpusStats(
            bins=b,
            cells=tuple(
                sorted(
                    (r.source, int(r.qbin), int(r.n_docs), int(r.n_tokens))
                    for r in rows
                )
            ),
        )
    if bins is not None and stats.bins != bins:
        raise ValueError(
            f"corpus stats built with bins={stats.bins}, called with bins={bins}"
        )
    boundaries = _budget_boundaries(stats, budgets)
    spark = per_doc.sparkSession
    btab = spark.createDataFrame(
        sorted((s, b, r) for s, (b, r) in boundaries.items()),
        "source string, _boundary bigint, _remainder bigint",
    )
    per_doc = per_doc.withColumn(
        "_qbin", F.expr(_hist_bin_spark_sql("quality", 0.0, 1.0, stats.bins))
    )
    if isinstance(budgets, dict):
        # sources absent from the dict are dropped BY CONTRACT — the
        # inner join is the semantics (dict sources missing from stats
        # already raised in _budget_boundaries)
        joined = per_doc.join(F.broadcast(btab), "source")
    else:
        # a uniform budget covers EVERY source, but the boundary table
        # only knows the sources the stats histogram saw — a corpus
        # source absent from (stale/mismatched) stats must fail loudly
        # at execution, not be silently dropped by an inner join
        # (round-9 advice). Map-side null check, zero extra shuffle.
        joined = per_doc.join(F.broadcast(btab), "source", "left").withColumn(
            "_boundary",
            F.when(
                F.col("_boundary").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("budget_select: source '"),
                        F.col("source"),
                        F.lit(
                            "' has no cells in the supplied corpus stats"
                            " — stale or mismatched stats"
                        ),
                    )
                ).cast("bigint"),
            ).otherwise(F.col("_boundary")),
        )
    above = joined.filter(F.col("_qbin") > F.col("_boundary")).select(
        id_col, "source", "n_tokens", "quality"
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("quality"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary_rows = (
        joined.filter(F.col("_qbin") == F.col("_boundary"))
        .withColumn("_prior", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .filter(F.col("_prior") < F.col("_remainder"))
        .select(id_col, "source", "n_tokens", "quality")
    )
    return above.unionByName(boundary_rows)


def budget_select_oracle_sql(table: str = "documents", budget: int = 600) -> str:
    """DuckDB twin of budget_select[_exact] with a uniform budget: the
    window-cumsum definition (the oracle states SEMANTICS; the scale plan
    is Spark-side)."""
    from .textstats import quality_score_sql

    return f"""
    WITH w AS (
        SELECT doc_id, source, text,
               string_split_regex(text, '\\s+') AS words
        FROM {table}
    ), s AS (
        SELECT doc_id, source,
               CAST(len(words) AS BIGINT) AS n_tokens,
               {quality_score_sql()} AS quality
        FROM w
    ), c AS (
        SELECT *,
               coalesce(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY quality DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS _prior
        FROM s
    )
    SELECT doc_id, source, n_tokens, quality
    FROM c WHERE _prior < {int(budget)}
    ORDER BY source, doc_id
    """
