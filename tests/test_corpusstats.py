"""Shared one-scan corpus stats: marginal correctness, consumer equivalence
(BM25 / quality filter / mixture planners give bit-identical results with and
without precomputed stats), scan elimination, and the persist/merge path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_prototype_spark.operators import corpusstats, invindex, sampling, textstats
from hadoop_prototype_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def stats(docs):
    return corpusstats.collect_corpus_stats(docs)


def test_stats_marginals_match_direct_aggregates(docs, stats):
    direct = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split("text", r"\s+"))).alias("t"),
    ).first()
    assert stats.n_docs == direct.n
    assert stats.n_tokens == direct.t

    per_source = {
        r.source: r.t
        for r in docs.groupBy("source")
        .agg(F.sum(F.size(F.split("text", r"\s+"))).alias("t"))
        .collect()
    }
    assert stats.source_tokens() == per_source
    assert sum(stats.source_docs().values()) == direct.n


def test_stats_cells_are_bounded(docs, stats):
    n_sources = docs.select("source").distinct().count()
    assert len(stats.cells) <= n_sources * stats.bins


def test_bm25_same_result_with_precomputed_stats(docs, stats):
    base = sorted(map(tuple, invindex.bm25_topk(docs).collect()))
    with_stats = sorted(map(tuple, invindex.bm25_topk(docs, stats=stats).collect()))
    assert with_stats == base and len(base) > 0


def test_bm25_with_stats_retires_the_scalar_scan_job(spark, docs, stats):
    """With precomputed stats, BM25's plan build launches strictly fewer jobs
    than the legacy path: the whole-corpus .first() scan for n_docs/avgdl is
    gone. (Both paths run the tf checkpoint's upstream stages at build time —
    AQE materializes them even for eager=False — so the corpus-scan count is
    the job delta here plus the post-checkpoint zero-scan pin in
    test_plans.py: exactly one corpus read with stats.)"""
    tracker = spark.sparkContext.statusTracker()

    spark.sparkContext.setJobGroup("bm25_stats_build", "stats provided")
    invindex.bm25_topk(docs, stats=stats)
    spark.sparkContext.setJobGroup("bm25_nostats_build", "legacy scalar scan")
    invindex.bm25_topk(docs)
    spark.sparkContext.setJobGroup("default", "reset")

    n_stats = len(tracker.getJobIdsForGroup("bm25_stats_build"))
    n_legacy = len(tracker.getJobIdsForGroup("bm25_nostats_build"))
    assert n_legacy >= n_stats + 1, (n_legacy, n_stats)


def test_bm25_empty_corpus_returns_empty_frame(spark, docs):
    empty = docs.limit(0)
    out = invindex.bm25_topk(empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["qid", "doc_id", "rank", "bm25"]
    assert out.schema["doc_id"].dataType == docs.schema["doc_id"].dataType


def test_quality_filter_same_result_with_stats(docs, stats):
    base = sorted(map(tuple, textstats.quality_percentile_filter(docs).collect()))
    with_stats = sorted(
        map(tuple, textstats.quality_percentile_filter(docs, stats=stats).collect())
    )
    assert with_stats == base and len(base) > 0


def test_quality_filter_rejects_mismatched_bins(docs, stats):
    with pytest.raises(ValueError, match="bins"):
        textstats.quality_percentile_filter(docs, bins=64, stats=stats)


def test_mixture_planners_same_result_with_stats(docs, stats):
    for fn in (sampling.mixture_plan, sampling.temperature_mixture_plan):
        base = sorted(map(tuple, fn(docs).collect()))
        with_stats = sorted(map(tuple, fn(docs, stats=stats).collect()))
        assert with_stats == base and len(base) > 0, fn.__name__


def test_mixture_plan_with_stats_never_scans_corpus(docs, stats):
    p = sampling.temperature_mixture_plan(docs, stats=stats)._jdf.queryExecution().optimizedPlan().toString()
    assert "Relation" not in p or "parquet" not in p, "stats path must not read the corpus"


def test_registry_bm25_runs_the_one_scan_path(spark, sf_dir, docs):
    """The round-7 'wire it' ask: the REGISTERED z_search_bm25 — the plan
    the driver hashes and the bench times — must use the persisted stats
    (no scalar corpus-scan job at build time), not just the operator's
    optional stats kwarg. Job-count delta vs the legacy path, same
    methodology as test_bm25_with_stats_retires_the_scalar_scan_job."""
    import hadoop_prototype_spark.plans  # noqa: F401 — populate registry
    from hadoop_prototype_spark.plans.corpus_stats_cache import fixture_corpus_stats
    from hadoop_prototype_spark.plans.registry import REGISTRY

    fixture_corpus_stats(spark, sf_dir)  # warm (ingest-time step)
    tracker = spark.sparkContext.statusTracker()

    spark.sparkContext.setJobGroup("reg_bm25", "registered query build")
    REGISTRY["z_search_bm25"].spark_fn(spark, sf_dir)
    spark.sparkContext.setJobGroup("legacy_bm25", "legacy scalar scan build")
    invindex.bm25_topk(docs)
    spark.sparkContext.setJobGroup("default", "reset")

    n_reg = len(tracker.getJobIdsForGroup("reg_bm25"))
    n_legacy = len(tracker.getJobIdsForGroup("legacy_bm25"))
    assert n_legacy >= n_reg + 1, (n_legacy, n_reg)


def test_registry_mixture_plans_never_scan_corpus(spark, sf_dir):
    """Registered mixture/temperature planners must read only the persisted
    stats: their optimized plans contain no parquet relation at all."""
    import hadoop_prototype_spark.plans  # noqa: F401
    from hadoop_prototype_spark.plans.registry import REGISTRY

    for name in ("docs_mixture_plan", "z_sample_mixture_temperature"):
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        p = df._jdf.queryExecution().optimizedPlan().toString()
        assert "parquet" not in p.lower(), f"{name} must not scan the corpus"


def test_stats_cache_recomputes_on_corpus_change(spark, tmp_path):
    """Manifest-style staleness safety: rewriting the corpus (even under
    the same file names) moves the fingerprint, so stale stats are
    unreachable and the provider recomputes."""
    import os
    import time

    from hadoop_prototype_spark.plans import corpus_stats_cache as csc

    sf = str(tmp_path / "sf")
    d = os.path.join(sf, "documents.parquet")
    spark.createDataFrame(
        [(1, "alpha beta", "en", "s1", 10), (2, "gamma", "en", "s2", 5)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).coalesce(1).write.mode("overwrite").parquet(d)

    s1 = csc.fixture_corpus_stats(spark, sf)
    assert s1.n_docs == 2 and s1.n_tokens == 3

    time.sleep(0.05)  # ensure mtime_ns moves even on coarse filesystems
    spark.createDataFrame(
        [(1, "alpha beta gamma delta", "en", "s1", 22)],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).coalesce(1).write.mode("overwrite").parquet(d)
    # NOTE: no cache-clearing here — the provider must bypass load_table's
    # session-level DataFrame cache itself, or a long-lived session would
    # persist stats computed from the PRE-rewrite file listing under the
    # post-rewrite fingerprint (reviewed round 8: cache-poisoning path)
    s2 = csc.fixture_corpus_stats(spark, sf)
    assert s2.n_docs == 1 and s2.n_tokens == 4, "stale stats must be unreachable"


def test_cli_corpus_stats_materializes_table(spark, sf_dir, docs, stats, tmp_path):
    from hadoop_prototype_spark.__main__ import main

    out = str(tmp_path / "stats")
    import os

    rc = main(
        ["corpus-stats", "-input", os.path.join(sf_dir, "documents.parquet"), "-output", out],
        spark=spark,
    )
    assert rc == 0
    assert corpusstats.read_corpus_stats(spark, out) == stats


def test_persist_roundtrip_and_merge(spark, docs, stats, tmp_path):
    path = str(tmp_path / "corpus_stats")
    corpusstats.write_corpus_stats(corpusstats.corpus_stats_table(docs), path)
    loaded = corpusstats.read_corpus_stats(spark, path)
    assert loaded == stats

    # incremental ingest: stats(batch1) ⊕ stats(batch2) == stats(batch1 ∪ batch2)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    merged = corpusstats.merged_corpus_stats(
        corpusstats.corpus_stats_table(b1), corpusstats.corpus_stats_table(b2)
    )
    merged_cells = tuple(
        sorted((r.source, int(r.qbin), int(r.n_docs), int(r.n_tokens)) for r in merged.collect())
    )
    assert merged_cells == stats.cells
