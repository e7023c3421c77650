"""Deduplication queries over the documents table (training-data pipeline).

Oracle SQL is generated from the same constants (shingle k, hash counts,
band/chunk layout, salts) as the Spark implementation in operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import decontam, dedup
from ..sources.tables import load_table
from .registry import register


@register("dedup_exact", oracle=dedup.exact_dedup_oracle_sql(), tags=("dedup",))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: (content_hash, keeper_id, n_copies)."""
    return dedup.exact_dedup(load_table(spark, sf_dir, "documents"))


@register("dedup_ngram_jaccard", oracle=dedup.ngram_jaccard_oracle_sql(), tags=("dedup",))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard ≥ 0.5 (inverted-index join)."""
    return dedup.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


@register("dedup_minhash_lsh", oracle=dedup.minhash_lsh_oracle_sql(), tags=("dedup",))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16)+LSH(4 bands) candidate pairs."""
    return dedup.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


@register("dedup_simhash", oracle=dedup.simhash_near_dup_oracle_sql(), tags=("dedup",))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with hamming ≤ 3 via 15-bit chunk LSH."""
    return dedup.simhash_near_dup_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "decontaminate_report",
    oracle=decontam.eval_contamination_oracle_sql(),
    tags=("dedup", "pipeline"),
)
def decontaminate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination report: training-split docs sharing any
    3-gram with the eval split — (doc_id, n_hit_shingles, n_eval_docs).
    Eval shingle hashes broadcast; the corpus side is never shuffled."""
    return decontam.eval_contamination(load_table(spark, sf_dir, "documents"))


@register(
    "z_decontaminate_clean",
    oracle=decontam.decontaminate_oracle_sql(),
    tags=("dedup", "pipeline"),
)
def z_decontaminate_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filtering form: the training split minus every doc with eval
    overlap (broadcast anti-join)."""
    return decontam.decontaminate(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_window_fraction",
    oracle=dedup.duplicated_window_fraction_oracle_sql(),
    tags=("dedup", "pipeline"),
)
def dedup_window_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-window fraction (share of 3-token windows that
    appear in other docs) — the corpus-duplication quality signal; no doc
    pairs ever materialize."""
    return dedup.duplicated_window_fraction(load_table(spark, sf_dir, "documents"))


@register("z_dedup_clusters", oracle=dedup.dedup_clusters_oracle_sql(), tags=("dedup",))
def z_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse MinHash+LSH near-dup PAIRS into clusters: (doc_id, component)
    where component = min doc_id in the connected component — the canonical-
    document election step of a dedup pipeline. Oracle is an exact
    recursive-CTE transitive closure over the same pair graph."""
    from pyspark.sql import functions as F

    pairs = dedup.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))
    cc = dedup.connected_components(pairs)
    return cc.select(F.col("node").alias("doc_id"), "component")


@register("z_dedup_canonical", oracle=dedup.canonical_docs_oracle_sql(), tags=("dedup",))
def z_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup election: MinHash+LSH pairs → connected components
    → keep the longest member per cluster (ties to the lowest id)."""
    docs = load_table(spark, sf_dir, "documents")
    cc = dedup.connected_components(dedup.minhash_lsh_pairs(docs))
    return dedup.canonical_docs(docs, cc)
