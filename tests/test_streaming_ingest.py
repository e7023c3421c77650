"""End-to-end streaming corpus ingest (streaming/ingest.py): file source →
quality filter → incremental LSH dedup against the persisted index →
partition-overwrite corpus/index/stats writes.

Pins: (a) streamed ingest over id-ordered batches is bit-equal to the
global batch dedup rule; (b) a full replay (fresh checkpoint, same files)
rewrites identical partitions — the no-ledger exactly-once claim; (c) the
stats ledger accounts every row; (d) quality-rejected docs are neither
ingested nor indexed.
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F

from hadoop_prototype_spark.operators import dedup
from hadoop_prototype_spark.operators.textstats import quality_score_column
from hadoop_prototype_spark.sources.tables import load_table
from hadoop_prototype_spark.streaming import ingest


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def _write_batches(spark, docs, src_dir, n_batches=3):
    """One parquet file per batch, ascending doc_id ranges, mtimes forced
    ascending so the file source delivers them in id order."""
    hi = docs.agg(F.max("doc_id")).first()[0]
    paths = []
    for i in range(n_batches):
        lo_cut = hi * i // n_batches
        hi_cut = hi * (i + 1) // n_batches if i < n_batches - 1 else hi
        part = docs.filter(
            (F.col("doc_id") > lo_cut) & (F.col("doc_id") <= hi_cut)
            if i
            else (F.col("doc_id") <= hi_cut)
        )
        p = os.path.join(src_dir, f"batch_{i}.parquet")
        part.toPandas().to_parquet(p, index=False)
        paths.append(p)
    now = time.time()
    for i, p in enumerate(paths):
        os.utime(p, (now + i, now + i))
    return paths


def _run(spark, src_dir, schema, out, threshold=None):
    q = ingest.start_ingest_pipeline(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir),
        corpus_path=os.path.join(out, "corpus"),
        index_path=os.path.join(out, "index"),
        stats_path=os.path.join(out, "stats"),
        checkpoint_dir=os.path.join(out, "ckpt"),
        quality_threshold=threshold,
    )
    q.awaitTermination(300)


def test_streamed_ingest_matches_global_dedup_and_replays_identically(
    spark, sf_dir, tmp_path
):
    docs = load_table(spark, sf_dir, "documents")
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    _write_batches(spark, docs, src_dir)
    out = str(tmp_path / "out")

    _run(spark, src_dir, docs.schema, out)
    corpus = ingest.read_corpus(spark, os.path.join(out, "corpus"))
    kept_ids = _ids(corpus)
    n_kept_total = len(kept_ids)
    assert kept_ids == _ids(dedup.lsh_keepers(docs))

    # stats ledger: one row per batch, rows all accounted, no quality drops
    stats = spark.read.parquet(os.path.join(out, "stats"))
    srows = {r.ingest_batch_id: r for r in stats.collect()}
    assert sorted(srows) == [0, 1, 2]
    assert sum(r.n_in for r in srows.values()) == docs.count()
    assert all(r.n_in == r.n_quality_passed for r in srows.values())
    assert all(r.n_kept + r.n_dup_dropped == r.n_quality_passed for r in srows.values())
    assert sum(r.n_kept for r in srows.values()) == n_kept_total
    # the index holds keys for every quality-passed doc, dropped included
    n_indexed = (
        spark.read.parquet(os.path.join(out, "index"))
        .select("doc_id")
        .distinct()
        .count()
    )
    assert n_indexed == docs.count()
    # and it landed in the PRUNABLE layout: band_bucket partition dirs
    # under each batch (what read_lsh_index_pruned's pruning keys on)
    import glob as _glob

    bucket_dirs = _glob.glob(
        os.path.join(out, "index", "ingest_batch_id=*", "band_bucket=*")
    )
    assert bucket_dirs, "index must be partitioned by (batch, band_bucket)"

    # full replay: wipe the checkpoint, keep corpus/index/stats. The same
    # files re-deliver as batches 0..2 and every partition is overwritten
    # with identical content — the no-ledger exactly-once contract.
    import shutil

    shutil.rmtree(os.path.join(out, "ckpt"))
    _run(spark, src_dir, docs.schema, out)
    corpus2 = ingest.read_corpus(spark, os.path.join(out, "corpus"))
    assert _ids(corpus2) == kept_ids
    assert spark.read.parquet(os.path.join(out, "stats")).count() == 3


def test_quality_rejected_docs_are_neither_ingested_nor_indexed(
    spark, sf_dir, tmp_path
):
    docs = load_table(spark, sf_dir, "documents")
    # a threshold near the median so both sides are non-trivial
    thr = float(
        docs.select(
            F.percentile_approx(quality_score_column("text"), 0.5).alias("m")
        ).first()["m"]
    )
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    _write_batches(spark, docs, src_dir, n_batches=2)
    out = str(tmp_path / "out")
    _run(spark, src_dir, docs.schema, out, threshold=thr)

    passing = docs.filter(quality_score_column("text") >= F.lit(thr))
    assert _ids(ingest.read_corpus(spark, os.path.join(out, "corpus"))) == _ids(
        dedup.lsh_keepers(passing)
    )
    indexed = spark.read.parquet(os.path.join(out, "index")).select("doc_id").distinct()
    assert _ids(indexed) == _ids(passing)


def test_fully_filtered_batch_is_accounted_and_harmless(spark, sf_dir, tmp_path):
    """A quality threshold that rejects an entire micro-batch must not
    crash the query (no corpus partition exists yet to count) and must
    still ledger the batch with n_kept = 0."""
    docs = load_table(spark, sf_dir, "documents")
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    _write_batches(spark, docs, src_dir, n_batches=2)
    out = str(tmp_path / "out")
    _run(spark, src_dir, docs.schema, out, threshold=10.0)  # rejects all

    stats = spark.read.parquet(os.path.join(out, "stats"))
    rows = {r.ingest_batch_id: r for r in stats.collect()}
    assert sorted(rows) == [0, 1]
    assert all(r.n_quality_passed == 0 and r.n_kept == 0 for r in rows.values())
    assert sum(r.n_in for r in rows.values()) == docs.count()
    assert not os.path.exists(os.path.join(out, "corpus"))


def test_ingest_maintains_corpus_stats_exactly(spark, sf_dir, tmp_path):
    """With corpus_stats_path set, the folded per-batch cells equal a
    direct one-scan stats pass over the final ingested corpus (additivity
    — exact, not approximate), and feeding them to budget_select yields
    the bit-identical selection the exact path computes on the corpus.
    The ingest-maintained stats ARE the zero-scan input they claim to be."""
    from hadoop_prototype_spark.operators import sampling
    from hadoop_prototype_spark.operators.corpusstats import collect_corpus_stats

    docs = load_table(spark, sf_dir, "documents")
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    _write_batches(spark, docs, src_dir)
    out = str(tmp_path / "out")
    q = ingest.start_ingest_pipeline(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir),
        corpus_path=os.path.join(out, "corpus"),
        index_path=os.path.join(out, "index"),
        stats_path=os.path.join(out, "stats"),
        checkpoint_dir=os.path.join(out, "ckpt"),
        corpus_stats_path=os.path.join(out, "corpus_stats"),
    )
    q.awaitTermination(300)

    corpus = ingest.read_corpus(spark, os.path.join(out, "corpus"))
    maintained = ingest.ingested_corpus_stats(spark, os.path.join(out, "corpus_stats"))
    direct = collect_corpus_stats(corpus)
    assert maintained.cells == direct.cells
    assert maintained.n_docs == corpus.count()

    sel_stats = sorted(
        map(tuple, sampling.budget_select(corpus, 500, stats=maintained).collect())
    )
    sel_exact = sorted(
        map(tuple, sampling.budget_select_exact(corpus, 500).collect())
    )
    assert sel_stats == sel_exact and len(sel_exact) > 0

    # memoization (round-9 verdict #3): a repeat consumer of the unchanged
    # stats dir folds nothing — zero jobs, same object
    tracker = spark.sparkContext.statusTracker()
    spark.sparkContext.setJobGroup("ingested_stats_repeat", "memoized")
    again = ingest.ingested_corpus_stats(spark, os.path.join(out, "corpus_stats"))
    n_jobs = len(tracker.getJobIdsForGroup("ingested_stats_repeat"))
    spark.sparkContext.setJobGroup("default", "reset")
    assert again is maintained
    assert n_jobs == 0, f"repeat fold must launch no jobs, got {n_jobs}"


def test_resume_over_legacy_index_migrates_and_dedups_correctly(
    spark, sf_dir, tmp_path
):
    """ADVICE r10: a pipeline upgraded mid-stream resumes over an index
    written in the legacy partitionBy(ingest_batch_id)-only layout. Mixed
    directory depths fail Spark partition discovery outright, so startup
    must migrate the legacy partitions into (batch, band_bucket) — after
    which the resumed stream's decisions match the global batch rule."""
    import glob as _glob

    docs = load_table(spark, sf_dir, "documents")
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    paths = _write_batches(spark, docs, src_dir)
    out = str(tmp_path / "out")
    hi = docs.agg(F.max("doc_id")).first()[0]
    first = docs.filter(F.col("doc_id") <= hi // 3)

    # simulate the pre-upgrade world: the first slice already ingested,
    # its index partition written WITHOUT band_bucket (flat under the
    # batch dir). Its batch id (7) is outside the resumed stream's fresh
    # 0-based range — a REAL resume carries the old checkpoint, whose
    # batch counter never reuses ids; a fresh-checkpoint test must fake
    # that non-collision explicitly.
    index_path = os.path.join(out, "index")
    (
        dedup.lsh_index_keys(first)
        .drop("band_bucket")
        .withColumn("ingest_batch_id", F.lit(7))
        .write.partitionBy("ingest_batch_id")
        .parquet(index_path)
    )
    corpus_path = os.path.join(out, "corpus")
    # the pre-upgrade ingest had already in-batch-deduped its slice (the
    # index above still holds EVERY seen doc's keys, dropped included)
    dedup.lsh_keepers(first).withColumn("ingest_batch_id", F.lit(7)).write.partitionBy(
        "ingest_batch_id"
    ).parquet(corpus_path)
    assert _glob.glob(os.path.join(index_path, "ingest_batch_id=7", "*.parquet"))

    # resume: deliver only the remaining two batches (fresh checkpoint that
    # has already "seen" batch 0's file is hard to forge, so drop the file)
    os.remove(paths[0])
    q = ingest.start_ingest_pipeline(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir),
        corpus_path=corpus_path,
        index_path=index_path,
        stats_path=os.path.join(out, "stats"),
        checkpoint_dir=os.path.join(out, "ckpt"),
    )
    q.awaitTermination(300)

    # the legacy partition was rewritten in place into the prunable layout
    assert not _glob.glob(os.path.join(index_path, "ingest_batch_id=7", "*.parquet"))
    assert _glob.glob(
        os.path.join(index_path, "ingest_batch_id=7", "band_bucket=*", "*.parquet")
    )
    assert dedup.read_index_buckets(index_path) == dedup.BAND_BUCKETS
    # decisions across the upgrade boundary match the global batch rule
    corpus = ingest.read_corpus(spark, corpus_path)
    assert _ids(corpus) == _ids(dedup.lsh_keepers(docs))


def test_snapshot_corpus_ingest_versioned_cdc_and_replay(spark, sf_dir, tmp_path):
    """snapshot_corpus=True (round-10 verdict #5): the ingested corpus is a
    first-class snapshot TABLE — one versioned blind append per batch,
    table_changes over an ingest batch returns exactly its appended
    slice, and a checkpoint-wipe replay commits NO new versions (the txn
    marker makes the foreachBatch commit idempotent) while leaving the
    table bit-identical."""
    import shutil

    from hadoop_prototype_spark.sources import snapshots as sn

    docs = load_table(spark, sf_dir, "documents")
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    _write_batches(spark, docs, src_dir)
    out = str(tmp_path / "out")
    corpus_path = os.path.join(out, "corpus")

    def run():
        q = ingest.start_ingest_pipeline(
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir),
            corpus_path=corpus_path,
            index_path=os.path.join(out, "index"),
            stats_path=os.path.join(out, "stats"),
            checkpoint_dir=os.path.join(out, "ckpt"),
            snapshot_corpus=True,
        )
        q.awaitTermination(300)

    run()
    # one version per batch: create + 2 appends, txn markers in the log
    assert sn.current_version(corpus_path) == 3
    assert [h["op"] for h in sn.history(corpus_path)] == ["create", "append", "append"]
    assert [sn.find_txn(corpus_path, ingest.SNAP_APP, b) for b in (0, 1, 2)] == [1, 2, 3]
    # contents match the global batch dedup rule (snapshot-aware reader)
    kept_ids = _ids(ingest.read_corpus(spark, corpus_path))
    assert kept_ids == _ids(dedup.lsh_keepers(docs))

    # CDC: the v1→v2 change feed is exactly batch 1's appended slice
    hi = docs.agg(F.max("doc_id")).first()[0]
    cut0, cut1 = hi // 3, hi * 2 // 3
    expected_b1 = [i for i in kept_ids if cut0 < i <= cut1]
    ch = sn.table_changes(spark, corpus_path, 1, 2)
    assert sorted(r.doc_id for r in ch.collect()) == expected_b1
    assert {r._change for r in ch.collect()} == {"insert"}

    # stats ledger accounts the same kept counts as the snapshot versions
    srows = {r.ingest_batch_id: r for r in
             spark.read.parquet(os.path.join(out, "stats")).collect()}
    assert sum(r.n_kept for r in srows.values()) == len(kept_ids)

    # checkpoint-wipe replay: all three batches re-deliver; every commit
    # is skipped via its txn marker — version count unchanged, table
    # bit-identical (rows AND file list)
    files_before = {e["name"] for e in sn._read_entry(corpus_path, 3)["files"]}
    shutil.rmtree(os.path.join(out, "ckpt"))
    run()
    assert sn.current_version(corpus_path) == 3
    assert {e["name"] for e in sn._read_entry(corpus_path, 3)["files"]} == files_before
    assert _ids(ingest.read_corpus(spark, corpus_path)) == kept_ids


def test_replay_after_optimize_still_skips_via_txn(spark, sf_dir, tmp_path):
    """Interplay pin: OPTIMIZE compacts the ingested snapshot corpus's
    small-append tail (rewriting its data files), then a checkpoint-wipe
    replay re-delivers every batch — the txn markers must still skip all
    commits even though the files the batches wrote no longer exist, and
    the compacted table must stay content-identical."""
    import shutil

    from hadoop_prototype_spark.sources import snapshots as sn

    docs = load_table(spark, sf_dir, "documents")
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    _write_batches(spark, docs, src_dir)
    out = str(tmp_path / "out")
    corpus_path = os.path.join(out, "corpus")

    def run():
        q = ingest.start_ingest_pipeline(
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir),
            corpus_path=corpus_path,
            index_path=os.path.join(out, "index"),
            stats_path=os.path.join(out, "stats"),
            checkpoint_dir=os.path.join(out, "ckpt"),
            snapshot_corpus=True,
        )
        q.awaitTermination(300)

    run()
    kept_ids = _ids(sn.read_table(spark, corpus_path))
    # compact everything (explicit thresholds: every file is a victim)
    # so the replayed batches' original files are all gone
    rep = sn.optimize(
        spark, corpus_path, target_file_rows=10**6, small_file_rows=10**6
    )
    assert rep["version"] == 4 and rep["files_rewritten"] >= 2
    assert _ids(sn.read_table(spark, corpus_path)) == kept_ids

    shutil.rmtree(os.path.join(out, "ckpt"))
    run()
    # zero new versions: every batch found its marker below the optimize
    assert sn.current_version(corpus_path) == 4
    assert _ids(sn.read_table(spark, corpus_path)) == kept_ids


def test_snapshot_corpus_ingest_maintains_views_per_batch(spark, sf_dir, tmp_path):
    """views= on a snapshot-corpus ingest: a per-source rollup is folded
    after every batch's corpus commit (O(batch + touched groups)), equals
    a from-scratch recompute at stream end, and a checkpoint-wipe replay
    leaves both corpus and view untouched (two independent watermark
    layers: corpus txn markers, view refresh watermark)."""
    import shutil

    from pyspark.sql import functions as SF

    from hadoop_prototype_spark.operators import incremental as inc
    from hadoop_prototype_spark.sources import snapshots as sn

    docs = load_table(spark, sf_dir, "documents")
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    _write_batches(spark, docs, src_dir)
    out = str(tmp_path / "out")
    corpus_path = os.path.join(out, "corpus")
    view_path = os.path.join(out, "by_source")
    keys, spec = ["source"], {"n_docs": ("count", "doc_id"), "id_sum": ("sum", "doc_id")}

    def run():
        q = ingest.start_ingest_pipeline(
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir),
            corpus_path=corpus_path,
            index_path=os.path.join(out, "index"),
            stats_path=os.path.join(out, "stats"),
            checkpoint_dir=os.path.join(out, "ckpt"),
            snapshot_corpus=True,
            views=[{"path": view_path, "keys": keys, "spec": spec}],
        )
        q.awaitTermination(300)

    run()

    def recomputed():
        return {
            r.source: (r.n_docs, r.id_sum)
            for r in inc.summarize(sn.read_table(spark, corpus_path), keys, spec).collect()
        }

    def view_rows():
        return {
            r.source: (r.n_docs, r.id_sum)
            for r in sn.read_table(spark, view_path).collect()
            if r.n_docs > 0
        }

    assert view_rows() == recomputed()
    # the view saw one create + one refresh per later batch
    assert sn.current_version(view_path) >= 2
    view_v = sn.current_version(view_path)

    shutil.rmtree(os.path.join(out, "ckpt"))
    run()
    assert sn.current_version(view_path) == view_v  # replay: zero new folds
    assert view_rows() == recomputed()


def test_ingest_auto_compaction_bounds_small_files(spark, sf_dir, tmp_path):
    """optimize_every=2: the ingested snapshot corpus auto-folds its
    small-file tail every second batch as a normal versioned commit —
    contents match the global dedup rule exactly, history shows the
    interleaved optimize commits, and a checkpoint-wipe replay stays
    exactly-once (txn markers skip the appends; the replayed optimize is
    a no-op with nothing left to fold)."""
    import shutil

    from hadoop_prototype_spark.sources import snapshots as sn

    docs = load_table(spark, sf_dir, "documents")
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    _write_batches(spark, docs, src_dir)
    out = str(tmp_path / "out")
    corpus_path = os.path.join(out, "corpus")

    def run():
        q = ingest.start_ingest_pipeline(
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir),
            corpus_path=corpus_path,
            index_path=os.path.join(out, "index"),
            stats_path=os.path.join(out, "stats"),
            checkpoint_dir=os.path.join(out, "ckpt"),
            snapshot_corpus=True,
            optimize_every=2,
        )
        q.awaitTermination(300)

    run()
    ops = [h["op"] for h in sn.history(corpus_path)]
    assert "optimize" in ops and ops[0] == "create"
    # contents: exactly the global batch dedup rule, compaction changed rows not at all
    kept_ids = _ids(ingest.read_corpus(spark, corpus_path))
    assert kept_ids == _ids(dedup.lsh_keepers(docs))
    # the current version's file list is compacted: fewer files than batches
    n_files = len(sn._read_entry(corpus_path, sn.current_version(corpus_path))["files"])
    assert n_files <= 2

    # replay after checkpoint wipe: appends skip via txn, the re-run
    # optimize finds nothing foldable — rows stay bit-identical
    v_before = sn.current_version(corpus_path)
    shutil.rmtree(os.path.join(out, "ckpt"))
    run()
    assert _ids(ingest.read_corpus(spark, corpus_path)) == kept_ids
    # at most one extra no-op-ish optimize version may exist; rows identical
    assert sn.current_version(corpus_path) <= v_before + 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        ingest.start_ingest_pipeline(
            spark.readStream.schema(docs.schema).parquet(src_dir),
            corpus_path=corpus_path,
            index_path=os.path.join(out, "index"),
            stats_path=os.path.join(out, "stats"),
            checkpoint_dir=os.path.join(out, "ckpt2"),
            optimize_every=2,
        )


def test_ingest_maintains_rag_index(spark, sf_dir, tmp_path):
    """rag_index_path: the retrieval postings index advances with the
    corpus every micro-batch — after the stream drains, querying the
    maintained index equals the direct RAG pipeline over the ingested
    corpus exactly (shared scoring, bitwise), and a checkpoint-wipe
    replay leaves the index version count and contents unchanged (its
    own txn markers skip)."""
    import shutil

    from hadoop_prototype_spark.operators import retrieval
    from hadoop_prototype_spark.sources import snapshots as sn

    docs = load_table(spark, sf_dir, "documents")
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    _write_batches(spark, docs, src_dir)
    out = str(tmp_path / "out")
    corpus_path = os.path.join(out, "corpus")
    rag_path = os.path.join(out, "ragidx")

    def run():
        q = ingest.start_ingest_pipeline(
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir),
            corpus_path=corpus_path,
            index_path=os.path.join(out, "index"),
            stats_path=os.path.join(out, "stats"),
            checkpoint_dir=os.path.join(out, "ckpt"),
            snapshot_corpus=True,
            rag_index_path=rag_path,
        )
        q.awaitTermination(300)

    run()
    # one index version per non-empty batch, txn-marked
    v = sn.current_version(rag_path)
    assert v >= 1
    assert sn.find_txn(rag_path, ingest.RAG_APP, 0) == 1

    corpus = ingest.read_corpus(spark, corpus_path)

    def rows(df):
        return sorted(
            (r.qid, r.rank, r.doc_id, r.chunk_id, r.cosine) for r in df.collect()
        )

    got = rows(retrieval.rag_query_indexed(spark, rag_path, corpus, k=4, n_queries=3))
    want = rows(retrieval.rag_retrieve_topk(corpus, k=4, n_queries=3))
    assert got == want and got  # equal AND non-trivial

    # checkpoint-wipe replay: txn markers skip every index commit
    shutil.rmtree(os.path.join(out, "ckpt"))
    run()
    assert sn.current_version(rag_path) == v
    assert rows(
        retrieval.rag_query_indexed(spark, rag_path, corpus, k=4, n_queries=3)
    ) == want

    import pytest as _pytest

    with _pytest.raises(ValueError):
        ingest.start_ingest_pipeline(
            spark.readStream.schema(docs.schema).parquet(src_dir),
            corpus_path=corpus_path,
            index_path=os.path.join(out, "index"),
            stats_path=os.path.join(out, "stats"),
            checkpoint_dir=os.path.join(out, "ckpt2"),
            rag_index_path=rag_path,
        )


def test_snapshot_corpus_with_partition_spec(spark, sf_dir, tmp_path):
    """corpus_partition_by lands the versioned corpus PARTITIONED
    (create_table records the spec; every batch append range-clusters on
    it and records per-file source ranges), so a single-source probe
    file-skips from the manifest — and the partitioned corpus still
    equals the global dedup rule exactly."""
    from hadoop_prototype_spark.sources import snapshots as sn

    docs = load_table(spark, sf_dir, "documents")
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    _write_batches(spark, docs, src_dir)
    out = str(tmp_path / "out")
    corpus = os.path.join(out, "corpus")

    q = ingest.start_ingest_pipeline(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir),
        corpus_path=corpus,
        index_path=os.path.join(out, "index"),
        stats_path=os.path.join(out, "stats"),
        checkpoint_dir=os.path.join(out, "ckpt"),
        snapshot_corpus=True,
        corpus_partition_by=["source"],
    )
    q.awaitTermination(300)

    assert sn.partition_spec(corpus) == ["source"]
    assert _ids(sn.read_table(spark, corpus)) == _ids(dedup.lsh_keepers(docs))

    # probe is exact straight off the stream (tiny micro-batches coalesce
    # to one file each, which spans every source — nothing to skip yet)
    src0 = sn.read_table(spark, corpus).select("source").first()[0]
    probe = sn.read_table_where(spark, corpus, {"source": src0})
    want = sn.read_table(spark, corpus).filter(F.col("source") == src0)
    assert _ids(probe) == _ids(want)

    # compaction range-clusters on the spec and restores partition
    # locality: after OPTIMIZE the single-source probe opens a strict
    # subset of the corpus files
    n_kept = sn.read_table(spark, corpus).count()
    sn.optimize(spark, corpus, target_file_rows=max(10, n_kept // 8),
                small_file_rows=10**9)
    total = len(sn._read_entry(corpus, sn.current_version(corpus))["files"])
    probe2 = sn.read_table_where(spark, corpus, {"source": src0})
    assert _ids(probe2) == _ids(want)
    touched = (
        probe2.select(F.input_file_name().alias("f")).distinct().count()
    )
    assert 0 < touched < total
