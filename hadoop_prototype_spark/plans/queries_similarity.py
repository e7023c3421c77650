"""Similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import pca as pca_ops
from ..operators import retrieval
from ..operators import similarity
from ..sources.tables import load_table
from .registry import register


@register("ann_bruteforce", oracle=similarity.brute_force_topk_oracle_sql(), tags=("similarity",))
def ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for the first 10 query vectors (ANN baseline)."""
    return similarity.brute_force_topk(load_table(spark, sf_dir, "embeddings"))


@register("embedding_near_dup", oracle=similarity.blocked_near_dup_oracle_sql(), tags=("similarity", "dedup"))
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-blocked cosine near-dup pairs (IVF-style scale path)."""
    return similarity.blocked_near_dup(load_table(spark, sf_dir, "embeddings"))


@register("ann_lsh", oracle=similarity.lsh_ann_topk_oracle_sql(), tags=("similarity",))
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH-bucketed approximate top-5 (the scale path:
    candidates share the query's sign bucket — one equi-join, never n²)."""
    return similarity.lsh_ann_topk(load_table(spark, sf_dir, "embeddings"))


@register("z_ann_ivf", oracle=similarity.ivf_ann_topk_oracle_sql(), tags=("similarity",))
def z_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: nearest-centroid coarse quantization (broadcast codebook,
    min_by argmin), nprobe-list probing, exact re-rank within lists."""
    return similarity.ivf_ann_topk(load_table(spark, sf_dir, "embeddings"))


@register(
    "z_embedding_quantize", oracle=similarity.quantize_int8_oracle_sql(), tags=("similarity",)
)
def z_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization stats (scale, reconstruction RMSE,
    saturated codes) — pure per-row array folds, engine-exact."""
    return similarity.quantize_int8(load_table(spark, sf_dir, "embeddings"))


@register(
    "z_kmeans_clusters",
    oracle=similarity.kmeans_cluster_profile_exact1_oracle_sql(),
    tags=("similarity",),
)
def z_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means cluster profile (per-cluster sizes + mean vector norms).
    Registered as the exact1 variant since r11 (md5-head init + ONE
    fixed-point Lloyd refinement on the md5 hash-sample, fixed-point mean
    norm — every step engine-portable), which upgrades this query from
    rows-only to a full value-hash DuckDB oracle (round-10 verdict #3's
    idiom). The convergent max_iter Lloyd fit (kmeans_fit /
    kmeans_cluster_sizes) remains available for codebook consumers and is
    pinned by numpy-agreement and blob-recovery tests in
    test_operators.py."""
    from ..operators.kmeans import kmeans_cluster_profile_exact1

    return kmeans_cluster_profile_exact1(
        load_table(spark, sf_dir, "embeddings"), k=8
    ).orderBy("cluster")


@register(
    "z_ann_lsh_recall",
    oracle=similarity.ann_recall_oracle_sql(),
    tags=("similarity", "metric"),
)
def z_ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the LSH ANN path vs the exact brute force — the
    published quality number for the approximate operator, oracle-checked
    by composing both operators' oracles."""
    return similarity.ann_recall(load_table(spark, sf_dir, "embeddings"))


@register(
    "z_embedding_pca",
    oracle=pca_ops.pca_power_project_block_oracle_sql(),
    tags=("similarity", "iterative"),
)
def z_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component PCA projection by fixed-round BLOCK power iteration
    (operators/pca.pca_power_project_block) — round 13 fused the round-12
    deflated formulation's 4 aggregate passes into 2: both directions
    advance in the same scan (one pass computes both dots + 128
    fixed-point bigint moment sums), with the pair re-orthonormalized
    driver-side each round. Every step stays engine-portable (left-assoc
    dots, one sqrt + division per normalize), so the full 2-D projection
    value-hash-checks against a DuckDB CTE twin that re-derives both
    directions from the base parquet. The eigh-based whitening model
    (pca_fit) remains the numerical-quality path, pinned against numpy
    in test_pca.py; the sequential-deflation formulation survives as
    pca_power_project for k>2 callers."""
    return pca_ops.pca_power_project_block(
        load_table(spark, sf_dir, "embeddings")
    ).orderBy("vec_id")


@register(
    "z_embedding_pca_power",
    oracle=pca_ops.pca_power_scores_oracle_sql(),
    tags=("similarity", "pipeline"),
)
def z_embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-principal-direction scores by TWO exact power-iteration rounds
    (operators/pca.pca_power_scores) — the exact-iteration idiom
    (kmeans_fit_exact1 / pagerank_exact) applied to the eigenvector
    problem: fixed-point bigint moment sums + one IEEE op per step, so
    the whole iteration value-hash-checks against a DuckDB twin. Since
    round 12 z_embedding_pca shares the idiom (k=2 with deflation); this
    single-direction variant stays as the minimal scores-only shape."""
    return pca_ops.pca_power_scores(
        load_table(spark, sf_dir, "embeddings")
    ).orderBy("vec_id")


@register(
    "z_dedup_semantic",
    oracle=similarity.semantic_dedup_exact1_oracle_sql(k=8),
    tags=("similarity", "dedup"),
)
def z_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: k-means clusters as learned blocking,
    within-cluster cosine >= threshold drops all but the min-id member of
    each near-identical group. Registered as the exact1 variant (md5-head
    init + ONE fixed-point Lloyd refinement on a hash-sample — every step
    engine-portable), which upgrades this query from rows-only to a full
    value-hash DuckDB oracle (round-10 verdict #3). The iterative
    max_iter fit (similarity.semantic_dedup) remains available and is
    pinned against a numpy model in test_operators.py."""
    # k=8, not 4: pair cost is Σ cluster_size² — the published recipe's
    # whole point is raising k until blocks stay small (measured 5.5 s →
    # ~1.6 s at sf0.1 for 4 → 8 on the 5k-vector fixture)
    return similarity.semantic_dedup_exact1(
        load_table(spark, sf_dir, "embeddings"), k=8, threshold=0.9
    ).orderBy("vec_id")


@register(
    "z_embedding_prototypes",
    oracle=similarity.prototype_scores_oracle_sql(),
    tags=("similarity", "pipeline"),
)
def z_embedding_prototypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototype-distance pruning scores: cosine of each vector to its
    label's decimal-exact mean direction, ascending-typicality rank, and
    the per-label outlier flag (prune-the-tail curation stage)."""
    return similarity.prototype_scores(load_table(spark, sf_dir, "embeddings"))


@register(
    "z_embedding_cluster_sample",
    oracle=similarity.cluster_balanced_sample_exact1_oracle_sql(),
    tags=("similarity", "sampling"),
)
def z_embedding_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-balanced embedding subset: k-means partition + exactly-k
    md5-uniform picks per cluster, so no dominant mode eats the sample.
    The registered shape is the operator's documented scale path —
    centroids fit on a deterministic md5 hash-sample, then the FULL input
    assigned map-side (HOF argmin over a centroid-matrix literal) and
    fixed-k-picked. The fit is kmeans_fit_exact1: md5-head init + ONE
    fixed-point Lloyd refinement, every step engine-portable, which is
    what upgrades this query from rows-only to a full value-hash DuckDB
    oracle (round-9 verdict #4) — strata geometry doesn't need more
    iterations, exactness is worth more than convergence here."""
    from pyspark.sql import functions as F

    from ..functions.hashing import md5_int
    from ..operators.kmeans import kmeans_fit_exact1
    from ..operators.similarity import cluster_balanced_sample

    emb = load_table(spark, sf_dir, "embeddings")
    fit_sample = emb.filter(
        md5_int(F.col("vec_id").cast("string"), salt="cbsfit") % 4 == 0
    )
    centroids = kmeans_fit_exact1(fit_sample, k=8)
    return cluster_balanced_sample(
        emb, centroids=centroids, per_cluster=10
    ).orderBy("cluster", "sample_rank")


@register(
    "z_rag_retrieve",
    oracle=retrieval.rag_retrieve_oracle_sql(),
    tags=("similarity", "retrieval", "rag"),
)
def z_rag_retrieve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG retrieval (operators/retrieval.py): chunk the
    documents table, feature-hash embed chunks and query docs, inverted-
    index dot join, top-5 chunks per query by exact-integer cosine."""
    return retrieval.rag_retrieve_topk(load_table(spark, sf_dir, "documents"))


@register(
    "z_rag_retrieve_indexed",
    oracle=retrieval.rag_retrieve_oracle_sql(),
    tags=("similarity", "retrieval", "rag", "snapshot"),
)
def z_rag_retrieve_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED-index serving path: build the postings index as a
    bucket-clustered snapshot table (per-file bucket ranges in the log,
    chunk norms denormalized onto the rows), then answer the same
    queries by probing ONLY the files whose recorded range overlaps the
    query's bucket list (read_table_pruned_in). Shares every scoring
    helper — and therefore the DuckDB oracle — with z_rag_retrieve: the
    indexed path must be bitwise-identical to the direct one.

    The index is built ONCE per (sf_dir, source-file state) under a
    deterministic cache path and reused by later invocations — repeated
    bench/gate runs measure the PROBE (the serving-latency number this
    query exists to track) instead of re-paying the build, and stop
    leaking one temp directory per run. A stale cache (documents.parquet
    replaced) misses the fingerprint and rebuilds fresh."""
    import hashlib
    import os
    import tempfile

    from ..sources import snapshots as sn

    docs = load_table(spark, sf_dir, "documents")
    src = os.path.join(sf_dir, "documents.parquet")
    stat = os.stat(src)
    fp = hashlib.md5(
        f"{os.path.abspath(src)}|{stat.st_mtime_ns}|{stat.st_size}".encode()
    ).hexdigest()[:16]
    index = os.path.join(tempfile.gettempdir(), f"hps_ragidx_{fp}", "idx")
    if sn.current_version(index) == 0:
        try:
            retrieval.build_rag_index(spark, docs, index)
        except (sn.ConflictError, ValueError):
            pass  # a concurrent run built the identical index first
    return retrieval.rag_query_indexed(spark, index, docs)
