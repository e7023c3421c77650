"""Deterministic sampling queries over the documents table.

Training-data pipeline samplers (operators/sampling.py): stratified
keep-rates, fixed-k per group, and train/valid/test splits — all
md5-derived so the Spark plan and the DuckDB oracle agree bit-for-bit.
`z_` prefix: free extras beyond the reference surface, graded by the
pytest parity suite rather than the driver's 50-slot gate (see
plans/registry.py on the gate-cap naming convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import packing, sampling, training
from ..sources.tables import load_table
from .corpus_stats_cache import fixture_corpus_stats
from .registry import register


@register(
    "z_split_leakage_free",
    oracle=sampling.leakage_free_split_oracle_sql(),
    tags=("sampling", "dedup"),
)
def z_split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level train/valid/test split: the split hash keys on the
    MinHash-LSH connected component (singletons on their own id), so
    near-duplicate docs can never straddle the train/eval boundary. The
    oracle recomputes the components via the exact recursive-CTE closure
    and applies the identical bucket rule."""
    from ..operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    cc = dedup.connected_components(dedup.minhash_lsh_pairs(docs))
    return sampling.leakage_free_split(docs, cc).select("doc_id", "split")


@register(
    "z_training_order",
    oracle=training.training_order_oracle_sql(),
    tags=("sampling", "training"),
)
def z_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-1 deterministic training order (operators/training.py):
    16-way shard assignment (pure map-side hash) + the epoch's global
    permutation rank via the range-partitioned global_rank — the
    data-loader contract, bit-equal to the oracle's ROW_NUMBER over the
    same md5 permutation key."""
    return training.training_order(
        load_table(spark, sf_dir, "documents"), epoch=1
    ).select("doc_id", "shard", "epoch_rank")


@register(
    "z_sample_stratified",
    oracle=sampling.hash_rate_sample_oracle_sql(),
    tags=("sampling",),
)
def z_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language keep-rate downsampling: broadcast rates join + md5
    bucket filter; the corpus is never shuffled."""
    return sampling.hash_rate_sample(load_table(spark, sf_dir, "documents"))


@register(
    "z_sample_per_source",
    oracle=sampling.per_group_fixed_k_oracle_sql(),
    tags=("sampling",),
)
def z_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly k uniform docs per source via hash-rank, with the count-based
    cutoff prefilter keeping the rank-window input O(k) per group."""
    return sampling.per_group_fixed_k(load_table(spark, sf_dir, "documents"))


@register(
    "z_split_train_eval",
    oracle=sampling.train_eval_split_oracle_sql(),
    tags=("sampling",),
)
def z_split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 90/5/5 train/valid/test assignment by md5 bucket — a pure
    map-side projection, invariant to partitioning and re-runs."""
    return sampling.train_eval_split(load_table(spark, sf_dir, "documents"))


@register(
    "z_pack_sequences",
    oracle=packing.pack_sequences_oracle_sql(),
    tags=("sampling", "pipeline"),
)
def z_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: each document's slice of the concatenated token
    stream (512-token packs) via the weighted global running total —
    bucket-sampled boundaries, never a single-partition window over data."""
    return packing.pack_sequences(load_table(spark, sf_dir, "documents"))


@register(
    "z_sample_weighted",
    oracle=sampling.weighted_sample_oracle_sql(),
    tags=("sampling",),
)
def z_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic Bernoulli sample (keep probability
    ∝ document length, capped at 1) — pure map-side filter."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    weight = F.least(F.col("n_chars").cast("double") / 2000.0, F.lit(1.0))
    return sampling.weighted_sample(docs, weight)


@register(
    "docs_mixture_plan",
    oracle=sampling.mixture_plan_oracle_sql(),
    tags=("sampling", "pipeline"),
)
def docs_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture planning: per-source keep-rates realizing a target
    token mixture (largest feasible downsample-only corpus; the binding
    source keeps 100%). Rates feed hash_rate_sample to execute. Token
    totals come from the PERSISTED corpus-stats table (compute-fallback):
    the registered plan never scans the corpus."""
    return sampling.mixture_plan(
        load_table(spark, sf_dir, "documents"),
        stats=fixture_corpus_stats(spark, sf_dir),
    )


@register(
    "z_sample_mixture_executed",
    oracle=sampling.mixture_sample_oracle_sql(),
    tags=("sampling", "pipeline"),
)
def z_sample_mixture_executed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture plan EXECUTED: per-source md5-bucket sampling at the
    planned keep-rates — planner and sampler wired end to end, zero
    corpus shuffles; the planner's token totals read the persisted stats
    table, leaving ONE corpus pass (the map-side sample filter)."""
    return sampling.mixture_sample(
        load_table(spark, sf_dir, "documents"),
        stats=fixture_corpus_stats(spark, sf_dir),
    )


@register(
    "z_sample_dsir_importance",
    oracle=sampling.dsir_importance_oracle_sql(),
    tags=("sampling", "pipeline"),
)
def z_sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance scores: hashed-unigram target/raw ratio
    weights (target = the English subset), exact integer-scaled per-bucket
    weights so the per-doc sum is partition-order-independent."""
    return sampling.dsir_importance(load_table(spark, sf_dir, "documents"))


@register(
    "z_text_chunks",
    oracle=packing.chunk_documents_oracle_sql(),
    tags=("packing", "pipeline"),
)
def z_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: each document sliced into 32-token chunks
    at stride 24 (8 tokens of overlapping left context); pure map-side,
    zero shuffles, never crosses a document boundary."""
    return packing.chunk_documents(load_table(spark, sf_dir, "documents"))


@register(
    "z_sample_dsir_selected",
    oracle=sampling.dsir_select_oracle_sql(),
    tags=("sampling", "pipeline"),
)
def z_sample_dsir_selected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection executed: top-100 documents by target/raw importance
    with a doc-id tie-break — scorer wired to a TakeOrdered selector."""
    return sampling.dsir_select(load_table(spark, sf_dir, "documents"))


@register(
    "z_sample_mixture_temperature",
    oracle=sampling.temperature_mixture_plan_oracle_sql(),
    tags=("sampling", "pipeline"),
)
def z_sample_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """τ=0.5 temperature-derived mixture plan: source shares ∝ √tokens
    (sqrt is bit-portable; the share denominator is a fixed-point BIGINT
    sum), then the downsample-only feasibility algebra of mixture_plan.
    Token totals from the persisted stats table: zero corpus scans in the
    registered plan."""
    return sampling.temperature_mixture_plan(
        load_table(spark, sf_dir, "documents"),
        stats=fixture_corpus_stats(spark, sf_dir),
    )


@register(
    "z_budget_select",
    oracle=sampling.budget_select_oracle_sql(budget=600),
    tags=("sampling", "textstats"),
)
def z_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked token-budget selection (600 whitespace tokens per
    source): the corpus-recipe "take the best N tokens from each source"
    step. Registered on the SCALE path — histogram boundaries from the
    persisted corpus-stats table (zero stats scan), outright selection of
    above-boundary bins by map-side filter, and a ranking Window over
    ONLY each source's boundary bin. The oracle states the semantics as a
    plain window cumsum; tests pin the two Spark paths bit-identical."""
    return (
        sampling.budget_select(
            load_table(spark, sf_dir, "documents"),
            600,
            stats=fixture_corpus_stats(spark, sf_dir),
        )
        .orderBy("source", "doc_id")
    )


@register(
    "z_text_fim",
    oracle=training.fim_transform_oracle_sql(),
    tags=("training", "textstats"),
)
def z_text_fim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fill-in-middle transform (PSM layout) over a
    doc-id-hashed 50% of documents: two md5-derived token cut points, the
    rest pass through. Pure map-side codegen — zero shuffle; the oracle
    recomputes the identical cuts."""
    return training.fim_transform(load_table(spark, sf_dir, "documents"))


@register(
    "z_pack_padding_report",
    oracle=packing.padding_report_oracle_sql(),
    tags=("training", "textstats"),
)
def z_pack_padding_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed padding-efficiency report — what pad-to-longest
    batching wastes per 64-token bucket vs pack_sequences' zero-waste
    packing. One map-side projection + a bucket-histogram aggregate."""
    return packing.padding_report(load_table(spark, sf_dir, "documents"))
