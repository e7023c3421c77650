"""Deduplication queries over the documents table (training-data pipeline).

Oracle SQL is generated from the same constants (shingle k, hash counts,
band/chunk layout, salts) as the Spark implementation in operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import decontam, dedup
from ..operators.textstats import quality_percentile_filter_oracle_sql
from ..sources.tables import load_table
from .registry import register


@register("dedup_exact", oracle=dedup.exact_dedup_oracle_sql(), tags=("dedup",))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: (content_hash, keeper_id, n_copies)."""
    return dedup.exact_dedup(load_table(spark, sf_dir, "documents"))


@register("dedup_ngram_jaccard", oracle=dedup.ngram_jaccard_oracle_sql(), tags=("dedup",))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by 3-gram Jaccard ≥ 0.5 over the 48-bit-hashed
    shingle space (inverted-index join; shuffles carry longs, not text)."""
    return dedup.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


@register("dedup_minhash_lsh", oracle=dedup.minhash_lsh_oracle_sql(), tags=("dedup",))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16)+LSH(4 bands) candidate pairs."""
    return dedup.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "z_dedup_lsh_incremental",
    oracle=dedup.lsh_keepers_oracle_sql(),
    tags=("dedup", "incremental"),
)
def z_dedup_lsh_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH dedup ≡ global rule: the corpus is split at the
    median doc_id, the low half is deduped batch-mode and indexed (band
    keys of ALL its docs), the high half is deduped AGAINST that index
    plus itself (operators/dedup.incremental_lsh_dedup — broadcast batch
    keys, index never shuffles). The oracle is the single-pass global
    no-lower-id-LSH-neighbor rule, so the hash match proves the ingest
    path is bit-equal to rescanning the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    split = docs.agg({"doc_id": "max"}).first()[0] // 2
    base = docs.filter(docs.doc_id <= split)
    batch = docs.filter(docs.doc_id > split)
    # one signature pass over base: the same materialized band keys serve
    # as both the batch-mode pair source and the persisted-index stand-in
    base_keys = dedup.lsh_index_keys(base).localCheckpoint(eager=False)
    base_keep = dedup.lsh_keepers(base, keys=base_keys)
    batch_keep, _bk = dedup.incremental_lsh_dedup(batch, base_keys)
    return base_keep.select("doc_id").union(batch_keep.select("doc_id"))


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


@register(
    "z_dedup_boilerplate_spans",
    oracle=dedup.remove_boilerplate_spans_oracle_sql(min_docs=20),
    tags=("dedup", "pipeline"),
)
def z_dedup_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup (repeated-substring removal at word granularity):
    tokens covered by any 3-token window shared by >= 20 docs are stripped
    and each document's remaining text reassembled in order. Shuffles move
    window hashes and integer positions, never span text."""
    return dedup.remove_boilerplate_spans(
        load_table(spark, sf_dir, "documents"), min_docs=20
    )


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


@register(
    "docs_corpus_clean_full",
    oracle=f"""
    WITH clean_train AS ({decontam.decontaminate_oracle_sql(k=8)}),
    q AS ({quality_percentile_filter_oracle_sql()}),
    keepers AS (
        SELECT keeper_id AS doc_id FROM ({dedup.exact_dedup_oracle_sql()})
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM clean_train d
    WHERE d.doc_id IN (SELECT doc_id FROM q)
      AND d.doc_id IN (SELECT doc_id FROM keepers)
    """,
    tags=("dedup", "pipeline"),
)
def docs_corpus_clean_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-clean composition as ONE declarative plan (the
    pipeline the corpusprep DAG runs stage-by-stage, here fused for
    Catalyst): training-split docs that (a) clear the histogram quality
    cutoff, (b) share no 8-gram with the eval split, and (c) are their
    content group's exact-dedup keeper. Every leg is itself an
    oracle-checked operator; the composition is semi/anti joins on doc_id,
    so the corpus text shuffles exactly once per leg's hash key."""
    from pyspark.sql import functions as F

    from ..operators import textstats

    from .corpus_stats_cache import fixture_corpus_stats

    docs = load_table(spark, sf_dir, "documents")
    clean_train = decontam.decontaminate(docs, k=8)
    # cutoff from the persisted corpus-stats table (bit-identical, proven
    # in test_corpusstats.py) — no in-query histogram scan
    quality_ok = textstats.quality_percentile_filter(
        docs, stats=fixture_corpus_stats(spark, sf_dir)
    ).select("doc_id")
    keepers = dedup.exact_dedup(docs).select(F.col("keeper_id").alias("doc_id"))
    return (
        clean_train.join(quality_ok, "doc_id", "left_semi")
        .join(keepers, "doc_id", "left_semi")
        .select("doc_id", "lang", "source", "n_chars")
    )


def _pagerank_oracle() -> str:
    from ..operators.graph import pagerank_exact_oracle_sql

    return pagerank_exact_oracle_sql(
        "SELECT a AS src, b AS dst FROM pairs"
        " UNION ALL SELECT b AS src, a AS dst FROM pairs",
        rounds=2,
        prefix_ctes=dedup.minhash_pairs_oracle_ctes("documents"),
    )


@register("z_graph_pagerank", oracle=_pagerank_oracle(), tags=("graph",))
def z_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the symmetrized MinHash near-dup graph — which
    duplicate-cluster members are most central. Registered as TWO exact
    fixed-point BIGINT rounds (operators/graph.pagerank_exact), which
    upgrades this query from rows-only to a full value-hash DuckDB
    oracle (round-10 verdict #4); the convergent double-precision
    ``pagerank`` stays the production operator, pinned by the numpy
    power-iteration agreement test in test_operators.py."""
    from pyspark.sql import functions as F

    from ..operators.graph import pagerank_exact

    pairs = dedup.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    return pagerank_exact(edges, rounds=2).orderBy("node")


@register(
    "z_dedup_lsh_recall",
    oracle=f"""
    WITH truth AS ({dedup.ngram_jaccard_oracle_sql()}),
    cand AS ({dedup.minhash_lsh_oracle_sql()}),
    hits AS (
        SELECT t.a, t.b FROM truth t
        WHERE EXISTS (SELECT 1 FROM cand c WHERE c.a = t.a AND c.b = t.b)
    )
    SELECT (SELECT count(*) FROM truth) AS n_true_pairs,
           (SELECT count(*) FROM hits) AS n_candidates_hit,
           CAST((SELECT count(*) FROM hits) AS DOUBLE)
               / CAST((SELECT count(*) FROM truth) AS DOUBLE) AS recall
    """,
    tags=("dedup", "metric"),
)
def z_dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of MinHash+LSH candidate generation against the exact
    Jaccard≥0.5 pair set — the quality number the banded-LSH parameter
    choice (16 hashes, 4 bands) must publish; both legs are the
    registered oracle-checked operators."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    truth = dedup.ngram_jaccard_pairs(docs).select("a", "b")
    cand = dedup.minhash_lsh_pairs(docs).select("a", "b")
    hits = truth.join(cand, ["a", "b"], "left_semi")
    return (
        truth.agg(F.count(F.lit(1)).alias("n_true_pairs"))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_candidates_hit")))
        .selectExpr(
            "n_true_pairs",
            "n_candidates_hit",
            "CAST(n_candidates_hit AS DOUBLE) / CAST(n_true_pairs AS DOUBLE) AS recall",
        )
    )


@register(
    "z_decontaminate_by_source",
    oracle=decontam.contamination_by_source_oracle_sql(),
    tags=("dedup", "pipeline"),
)
def z_decontaminate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination triage by corpus source: per-source contaminated-doc
    counts/fractions and total leaked shingles — the view that decides
    which feed to drop or re-crawl."""
    return decontam.contamination_by_source(load_table(spark, sf_dir, "documents"))


@register(
    "z_dedup_rate_by_source",
    oracle=f"""
    WITH pairs AS ({dedup.minhash_lsh_oracle_sql()}),
    dupped AS (
        SELECT a AS doc_id FROM pairs UNION SELECT b AS doc_id FROM pairs
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE p.doc_id IS NOT NULL) AS BIGINT) AS n_dupped,
           CAST(count(*) FILTER (WHERE p.doc_id IS NOT NULL) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS dup_rate
    FROM documents d LEFT JOIN dupped p ON d.doc_id = p.doc_id
    GROUP BY d.source
    ORDER BY d.source
    """,
    tags=("dedup", "pipeline"),
)
def z_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup observability: per-source fraction of documents with at
    least one MinHash-LSH near-dup candidate — the monitoring metric a
    recurring ingestion pipeline alerts on (a crawler drop suddenly 80%
    duplicated means a re-crawl, not new data).

    Shape: the candidate-pair legs are the ORACLE-CHECKED minhash
    operator's; the participant set distincts to ≤n ids (ints, no text),
    and the per-source rollup is one bounded aggregate off a left join
    on doc_id. Exact integer counts; one division per source."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs)
    dupped = (
        pairs.select(F.col("a").alias("doc_id"))
        .union(pairs.select(F.col("b").alias("doc_id")))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return (
        docs.join(dupped, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("_dup").alias("n_dupped"),
            (F.count("_dup").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "dup_rate"
            ),
        )
        .orderBy("source")
    )


@register(
    "z_dedup_lsh_precision",
    oracle=f"""
    WITH truth AS ({dedup.ngram_jaccard_oracle_sql()}),
    cand AS ({dedup.minhash_lsh_oracle_sql()}),
    hits AS (
        SELECT c.a, c.b FROM cand c
        WHERE EXISTS (SELECT 1 FROM truth t WHERE t.a = c.a AND t.b = c.b)
    )
    SELECT (SELECT count(*) FROM cand) AS n_candidates,
           (SELECT count(*) FROM hits) AS n_true_hits,
           CAST((SELECT count(*) FROM hits) AS DOUBLE)
               / CAST((SELECT count(*) FROM cand) AS DOUBLE) AS precision
    """,
    tags=("dedup", "metric"),
)
def z_dedup_lsh_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision of MinHash+LSH candidate generation against the exact
    Jaccard≥0.5 pair set — recall's other half: the fraction of generated
    candidates that survive verification, i.e. the verify-stage cost the
    banding parameters buy. Same composed-oracle pattern as
    z_dedup_lsh_recall (both legs oracle-checked operators)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    truth = dedup.ngram_jaccard_pairs(docs).select("a", "b")
    cand = dedup.minhash_lsh_pairs(docs).select("a", "b")
    hits = cand.join(truth, ["a", "b"], "left_semi")
    return (
        cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_true_hits")))
        .selectExpr(
            "n_candidates",
            "n_true_hits",
            "CAST(n_true_hits AS DOUBLE) / CAST(n_candidates AS DOUBLE) AS precision",
        )
    )


def _recipe_budget_oracle_sql(budget: int = 400) -> str:
    from ..operators.textstats import quality_score_sql

    return f"""
    WITH clean_train AS ({decontam.decontaminate_oracle_sql(k=8)}),
    q AS ({quality_percentile_filter_oracle_sql()}),
    keepers AS (
        SELECT keeper_id AS doc_id FROM ({dedup.exact_dedup_oracle_sql()})
    ),
    surv AS (
        SELECT d.doc_id, d.source, d.text
        FROM clean_train d
        WHERE d.doc_id IN (SELECT doc_id FROM q)
          AND d.doc_id IN (SELECT doc_id FROM keepers)
    ),
    w AS (
        SELECT doc_id, source, text,
               string_split_regex(text, '\\s+') AS words
        FROM surv
    ),
    s AS (
        SELECT doc_id, source,
               CAST(len(words) AS BIGINT) AS n_tokens,
               {quality_score_sql()} AS quality
        FROM w
    ),
    c AS (
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


@register(
    "z_corpus_recipe_budget",
    oracle=_recipe_budget_oracle_sql(),
    tags=("dedup", "sampling", "pipeline"),
)
def z_corpus_recipe_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END corpus recipe as one declarative plan: the
    docs_corpus_clean_full survivor set (decontaminated training split ∩
    quality cutoff ∩ exact-dedup keepers) fed into quality-ranked
    token-budget selection (400 whitespace tokens per source). This is
    the full "build the training set" pipeline — clean, dedup,
    decontaminate, then take the best N tokens per source — with an
    exact window-cumsum oracle over the identical survivor CTEs.
    budget_select runs its scale path; its stats histogram is computed
    on the survivors (one aggregate pass — at ingest this is the stats
    table persisted after the clean stage)."""
    from pyspark.sql import functions as F

    from ..operators import sampling, textstats

    from .corpus_stats_cache import fixture_corpus_stats

    docs = load_table(spark, sf_dir, "documents")
    clean_train = decontam.decontaminate(docs, k=8)
    # cutoff from the persisted corpus-stats table (bit-identical, proven
    # in test_corpusstats.py) — no in-query histogram scan
    quality_ok = textstats.quality_percentile_filter(
        docs, stats=fixture_corpus_stats(spark, sf_dir)
    ).select("doc_id")
    keepers = dedup.exact_dedup(docs).select(F.col("keeper_id").alias("doc_id"))
    surv = clean_train.join(quality_ok, "doc_id", "left_semi").join(
        keepers, "doc_id", "left_semi"
    )
    # budget_select consumes its input three times (stats histogram +
    # above-boundary filter + boundary-bin ranking); since r15 it
    # materializes its TEXT-FREE scored per-doc frame internally (one
    # lazy localCheckpoint), so the shingle joins and the quality-score
    # expressions run exactly once — no caller-side checkpoint needed
    surv = surv.select("doc_id", "source", "text")
    return sampling.budget_select(surv, 400).orderBy("source", "doc_id")
