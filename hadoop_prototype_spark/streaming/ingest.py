"""Streaming corpus ingest: quality filter → incremental LSH dedup →
exactly-once corpus append (engine extension — SURVEY.md §2.11; the
reference is batch-only, its closest analogue is the JobControl-chained
corpus DAG in plans/jobcontrol.py).

This is the shape a 100 TB/day training-data pipeline actually runs:
new crawl files land in a directory, Structured Streaming's file source
(checkpointed — each file consumed exactly once) delivers them in
micro-batches, and each micro-batch is

  1. quality-filtered map-side (textstats.quality_score_column — pure
     codegen, no shuffle),
  2. deduped against EVERYTHING already ingested via the persisted LSH
     band-key index (operators/dedup.incremental_lsh_dedup): the batch's
     keys broadcast, so a B-doc batch against an N-doc index costs O(B)
     shuffle, never O(N) — the corpus is never rescanned or re-hashed,
  3. appended to the curated corpus, with the batch's band keys (kept
     AND dup-dropped docs alike) appended to the index and a one-row
     accounting record appended to a stats table.

Exactly-once WITHOUT a commit ledger: all three outputs are written
``partitionBy(ingest_batch_id)`` under DYNAMIC partition-overwrite mode,
so a replayed micro-batch (crash between any two writes, or a restart
from the checkpoint) overwrites exactly its own partitions and nothing
else — idempotent no matter where the previous attempt died. The dedup
decisions themselves are replay-stable: if a crashed attempt's own keys
already landed in the index, every extra candidate pair they introduce
is a (batch doc, batch doc) pair the in-batch self-join produces anyway,
and the drop set is a DISTINCT union — so the replay computes the
identical keep set (pinned by tests/test_streaming_ingest.py).

Semantics are first-seen-wins: a doc is dropped iff an already-indexed
doc or a lower-id doc in the same batch shares an LSH band with it.
When batches arrive in ascending doc-id order this is bit-equal to the
global single-pass batch rule (tests/test_incremental_dedup.py); out of
order, the earlier arrival survives — the standard streaming contract.
Quality-rejected docs are NOT indexed: they never entered the corpus,
so they must not suppress a future better copy of the same content.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BATCH_COL = "ingest_batch_id"


@contextmanager
def _dynamic_partition_overwrite(spark: SparkSession):
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _write_batch_partition(df: DataFrame, path: str) -> None:
    """Overwrite exactly this batch's partition (caller holds the dynamic
    partition-overwrite conf)."""
    df.write.mode("overwrite").partitionBy(BATCH_COL).parquet(path)


def read_corpus(spark: SparkSession, corpus_path: str) -> DataFrame:
    """The curated corpus as ingested so far (empty-safe only once the
    first batch has landed — the path must exist). Transparent to the
    corpus layout: a snapshot-table corpus (snapshot_corpus=True ingest)
    resolves through its log, a plain partitioned corpus through the
    directory listing."""
    from ..sources import snapshots as sn

    if sn.current_version(corpus_path) > 0:
        return sn.read_table(spark, corpus_path)
    return spark.read.parquet(corpus_path).drop(BATCH_COL)


# the txn app id ingest stamps into snapshot-table commits (find_txn key)
SNAP_APP = "streaming_ingest"
RAG_APP = "streaming_ingest_rag"


def migrate_legacy_index(spark: SparkSession, index_path: str) -> int:
    """Rewrite pre-band_bucket ingest-index batch partitions (written as
    ``partitionBy(ingest_batch_id)`` only) into the prunable
    ``(ingest_batch_id, band_bucket)`` layout. Returns the number of batch
    partitions migrated (0 when the index is already uniform).

    Why this must happen BEFORE the stream starts: Spark's partition
    discovery refuses a parquet root whose leaf files sit at two different
    directory depths ("Conflicting directory structures"), so resuming an
    upgraded pipeline over a legacy index fails on the very first read —
    the legacy fallback inside read_lsh_index_pruned never gets a chance.

    Per-partition swap discipline: each legacy dir is renamed to a
    dot-prefixed backup (invisible to partition discovery), the migrated
    dir moved into place, then the backup removed — a crash mid-migration
    leaves either the backup or the migrated dir, never a mixed-depth
    root, and re-running completes the job."""
    import glob as _glob
    import shutil
    import uuid

    from ..operators import dedup

    legacy = sorted(
        d
        for d in _glob.glob(os.path.join(index_path, f"{BATCH_COL}=*"))
        if os.path.isdir(d) and _glob.glob(os.path.join(d, "*.parquet"))
    )
    if not legacy:
        return 0
    buckets = dedup.read_index_buckets(index_path) or dedup.BAND_BUCKETS
    dedup.record_index_buckets(index_path, buckets)
    staging = index_path.rstrip("/") + f"-migrate-{uuid.uuid4().hex}"
    for d in legacy:
        bid = int(os.path.basename(d).split("=", 1)[1])
        (
            spark.read.parquet(d)
            .select("doc_id", "band", "band_key")
            .withColumn("band_bucket", dedup.band_bucket_col(buckets))
            .withColumn(BATCH_COL, F.lit(bid))
            .repartition(F.col("band_bucket"))
            .write.mode("append")
            .option("parquet.bloom.filter.enabled#band_key", "true")
            .option("parquet.bloom.filter.adaptive.enabled", "true")
            .partitionBy(BATCH_COL, "band_bucket")
            .parquet(staging)
        )
    for d in legacy:
        bak = os.path.join(index_path, "." + os.path.basename(d) + ".pre-migrate")
        os.rename(d, bak)
        os.rename(os.path.join(staging, os.path.basename(d)), d)
        shutil.rmtree(bak)
    shutil.rmtree(staging, ignore_errors=True)
    return len(legacy)


def start_ingest_pipeline(
    stream: DataFrame,
    corpus_path: str,
    index_path: str,
    stats_path: str,
    checkpoint_dir: str,
    quality_threshold: float | None = None,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
    corpus_stats_path: str | None = None,
    snapshot_corpus: bool = False,
    views: list[dict] | None = None,
    optimize_every: int | None = None,
    optimize_target_rows: int = 1_000_000,
    rag_index_path: str | None = None,
    corpus_partition_by: list[str] | None = None,
):
    """Start the ingest query over a streaming DataFrame of documents.

    ``snapshot_corpus=True`` lands the corpus as a sources/snapshots.py
    TABLE instead of a batch-partitioned directory: every micro-batch is
    a versioned blind APPEND (O(batch) — no existing file is read or
    rewritten), so the ingested corpus gets time travel, OCC against
    other writers, ``table_changes`` CDC (each ingest batch shows up as
    exactly its appended slice), and vacuum — first-class lakehouse
    citizenship. Exactly-once here comes from the txn marker committed
    ATOMICALLY inside the snapshot log entry ({app, batch}): a replayed
    batch finds its marker via find_txn and skips the commit, so
    at-least-once delivery cannot double-append even when the previous
    attempt crashed between the commit and any later write. Index and
    stats outputs keep the partition-overwrite idempotency either way.

    ``views`` (snapshot_corpus only): materialized views maintained
    ALONGSIDE the ingest — each dict is ``{"path", "keys", "spec"}``
    (+ optional ``"name"``; operators/matview.py semantics). After every
    batch's corpus commit the views fold exactly the appended slice
    (O(batch + touched groups), the corpus is never rescanned); each
    view's own watermark/txn machinery makes the fold replay-safe
    independently of the corpus commit, so a crash between corpus append
    and view refresh just refreshes on the replay.

    ``optimize_every`` (snapshot_corpus only): run the snapshot
    OPTIMIZE verb after every N-th ingested batch — blind appends write
    one small file per batch, and without periodic folding a year of
    micro-batches is a 100k-small-file table. Compaction is a versioned
    commit like any other: it races concurrent writers through the
    normal OCC retry, readers pinned to older versions are untouched,
    and a REPLAYED batch's re-optimize is a no-op when there is nothing
    left to fold — so exactly-once ingest semantics are unchanged.
    ``optimize_target_rows`` is the Delta-auto-compaction rule: every
    file below the target is a fold victim and outputs aim at the
    target, so compacted chunks stop being rewritten once they reach it
    (bounded re-write amplification; files at or above the target are
    never read again).

    ``rag_index_path`` (snapshot_corpus only): maintain the RAG
    retrieval postings index (operators/retrieval.py) ALONGSIDE the
    corpus — after each batch's corpus commit, the KEPT documents'
    chunk postings land in the index table as one create-or-append
    commit with its own txn marker, so the index is always queryable
    (rag_query_indexed), versioned, and exactly-once under replays —
    the corpus, dedup index, corpus stats, rollup views and retrieval
    index all advance together per micro-batch.

    Returns the StreamingQuery. Outputs (all partitioned by
    ``ingest_batch_id`` for replay idempotency):
      - ``corpus_path``: surviving document rows,
      - ``index_path``: (doc_id, band, band_key) for every quality-passed
        doc in the batch — the persisted LSH index future batches dedup
        against,
      - ``stats_path``: one row per batch
        (n_in, n_quality_passed, n_kept, n_dup_dropped),
      - ``corpus_stats_path`` (optional): the batch's (source, qbin,
        n_docs, n_tokens) corpus-stats cells over the KEPT rows — the
        "stats maintained alongside the corpus at ingest" half of the
        operators/corpusstats.py design. Cells are additive, so readers
        fold all batch partitions with ``merged_corpus_stats`` and the
        scan-free consumers (BM25 / quality filter / mixture planners /
        budget_select) get exact corpus-wide statistics without ever
        rescanning the corpus; ``ingested_corpus_stats`` packages that
        read. Replay-idempotent like every other output: a re-run batch
        overwrites exactly its own partition.
    """
    from ..operators import dedup
    from ..operators.corpusstats import corpus_stats_table
    from ..operators.textstats import quality_score_column
    from ..sources import snapshots as sn

    if views and not snapshot_corpus:
        raise ValueError("views require snapshot_corpus=True (they fold the "
                         "versioned corpus's change feed)")
    if optimize_every is not None and not snapshot_corpus:
        raise ValueError("optimize_every requires snapshot_corpus=True "
                         "(compaction is a snapshot-log verb)")
    if rag_index_path is not None and not snapshot_corpus:
        raise ValueError("rag_index_path requires snapshot_corpus=True "
                         "(the retrieval index is maintained off the "
                         "versioned corpus commits)")
    if corpus_partition_by and not snapshot_corpus:
        raise ValueError("corpus_partition_by requires snapshot_corpus=True "
                         "(the partition spec is snapshot-log metadata)")

    # resuming over a pre-band_bucket index would fail partition discovery
    # (mixed directory depths) — rewrite it into the prunable layout first
    if os.path.exists(index_path):
        migrate_legacy_index(stream.sparkSession, index_path)
    # the layout's bucket count is a persisted contract: honor an existing
    # index's recorded count, record ours on a fresh index
    index_buckets = dedup.read_index_buckets(index_path) or dedup.BAND_BUCKETS

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bid = int(batch_id)
        # micro-batch sized (bounded by the trigger), so caching it is the
        # cheap way to avoid re-reading the source files per output
        batch = batch_df.persist()
        passed = None
        try:
            n_in = batch.count()
            passed = (
                batch.filter(quality_score_column(text_col) >= F.lit(quality_threshold))
                if quality_threshold is not None
                else batch
            ).persist()
            n_passed = passed.count()
            # the batch's keys come FIRST: their distinct band_bucket set
            # drives partition pruning of the persisted index, so a B-doc
            # batch against an N-doc index costs O(B) shuffle AND only
            # reads the index buckets it can collide in — per-batch IO no
            # longer grows with corpus age (round-9 verdict #1)
            keys = dedup.lsh_index_keys(
                passed, k, text_col, id_col, buckets=index_buckets
            ).localCheckpoint(eager=False)
            index = (
                dedup.read_lsh_index_pruned(spark, index_path, keys)
                if os.path.exists(index_path)
                # first batch: an empty index reduces the operator to the
                # plain in-batch rule
                else dedup.lsh_index_keys(passed.limit(0), k, text_col, id_col)
            )
            keepers, keys = dedup.incremental_lsh_dedup(
                passed, index, k, text_col, id_col, keys=keys
            )
            with _dynamic_partition_overwrite(spark):
                if n_passed > 0:
                    if snapshot_corpus:
                        # one eager materialization feeds the commit, the
                        # count, and the stats cells (batch-sized, bounded
                        # by the trigger)
                        kept = keepers.localCheckpoint(eager=True)
                        n_kept = kept.count()
                        if sn.find_txn(corpus_path, SNAP_APP, bid) is None:
                            txn = {"app": SNAP_APP, "batch": bid}
                            if sn.current_version(corpus_path) == 0:
                                # the spec recorded at create drives every
                                # later append's clustering + file stats
                                sn.create_table(
                                    kept, corpus_path, id_col, txn=txn,
                                    partition_by=corpus_partition_by,
                                )
                            else:
                                sn.append_table_retrying(
                                    spark, corpus_path, kept, id_col, txn=txn
                                )
                        # else: replay — the version already landed; the
                        # recomputed keepers are decision-identical
                        # (replay-stable, pinned) and feed only the
                        # idempotent stats overwrites below
                        if views:
                            from ..operators import matview as mvo

                            for vw in views:
                                if sn.current_version(vw["path"]) == 0:
                                    mvo.create_materialized_view(
                                        spark, corpus_path, vw["path"],
                                        vw["keys"], vw["spec"],
                                        name=vw.get("name", "default"),
                                    )
                                else:
                                    mvo.refresh_materialized_view(
                                        spark, corpus_path, vw["path"],
                                        vw["keys"], vw["spec"],
                                        name=vw.get("name", "default"),
                                    )
                        if rag_index_path is not None and n_kept > 0:
                            # retrieval-index maintenance: the kept docs'
                            # postings as ONE create-or-append commit,
                            # replay-safe via its own txn marker
                            from ..operators import retrieval as rag

                            rag.upsert_rag_index_batch(
                                spark, kept, rag_index_path,
                                txn={"app": RAG_APP, "batch": bid},
                            )
                        if optimize_every and (bid + 1) % optimize_every == 0:
                            # auto-compaction: fold the appends' small-file
                            # tail (one file per batch otherwise) as a
                            # normal versioned commit — OCC-retried, no-op
                            # on replay when nothing is left to fold
                            sn.optimize_retrying(
                                spark, corpus_path,
                                target_file_rows=optimize_target_rows,
                                small_file_rows=optimize_target_rows,
                            )
                    else:
                        _write_batch_partition(
                            keepers.withColumn(BATCH_COL, F.lit(bid)), corpus_path
                        )
                    # the index write keeps the prunable layout: partition
                    # dirs (ingest_batch_id, band_bucket), pre-shuffled on
                    # the bucket so each batch adds ≤ 1 file per bucket.
                    # Replay-idempotent like every output: band keys and
                    # buckets are deterministic per doc, so a re-run batch
                    # overwrites exactly its own (batch, bucket) partitions
                    dedup.record_index_buckets(index_path, index_buckets)
                    (
                        keys.withColumn(BATCH_COL, F.lit(bid))
                        .repartition(F.col("band_bucket"))
                        .write.mode("overwrite")
                        .option("parquet.bloom.filter.enabled#band_key", "true")
                        .option("parquet.bloom.filter.adaptive.enabled", "true")
                        .partitionBy(BATCH_COL, "band_bucket")
                        .parquet(index_path)
                    )
                    if snapshot_corpus:
                        kept_back = kept  # already materialized above
                    else:
                        # count the kept rows from the just-written,
                        # partition-pruned files instead of recomputing
                        # the dedup join
                        kept_back = spark.read.parquet(corpus_path).filter(
                            F.col(BATCH_COL) == bid
                        )
                        n_kept = kept_back.count()
                    if corpus_stats_path is not None and n_kept > 0:
                        # stats over this batch's kept rows — the
                        # ingest-maintained additive cells
                        _write_batch_partition(
                            corpus_stats_table(kept_back).withColumn(
                                BATCH_COL, F.lit(bid)
                            ),
                            corpus_stats_path,
                        )
                else:
                    # a fully-filtered (or empty) batch writes no corpus/
                    # index partitions — reading a not-yet-created corpus
                    # dir for the count would fail on schema inference
                    n_kept = 0
                stats = spark.createDataFrame(
                    [(n_in, n_passed, n_kept, n_passed - n_kept, bid)],
                    f"n_in bigint, n_quality_passed bigint, n_kept bigint, "
                    f"n_dup_dropped bigint, {BATCH_COL} bigint",
                )
                _write_batch_partition(stats, stats_path)
        finally:
            if passed is not None:
                passed.unpersist()
            batch.unpersist()

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# listing-fingerprint -> CorpusStats (plain immutable data, safe across
# sessions) — the same memoization contract as plans/corpus_stats_cache:
# a new ingested batch (or a replay overwrite) changes the stats dir's
# listing, moving the key; repeated consumers of an unchanged dir fold
# the cells exactly once instead of re-reading every batch partition.
_INGESTED_MEM: dict[str, object] = {}


def ingested_corpus_stats(spark: SparkSession, corpus_stats_path: str):
    """The ingest-maintained CorpusStats: fold every batch's cells (they
    are additive counts) into one exact corpus-wide stats object — the
    zero-corpus-scan input for BM25 / quality-filter / mixture /
    budget_select. Metadata-sized read (≤ |sources|·bins cells per batch),
    never touches the corpus itself — and memoized on the stats dir's
    listing fingerprint, so it happens once per ingested state."""
    from ..operators.corpusstats import CorpusStats, merged_corpus_stats
    from ..operators.textstats import QUALITY_HIST_BINS
    from ..plans.corpus_stats_cache import dir_fingerprint

    fp = dir_fingerprint(corpus_stats_path)
    cached = _INGESTED_MEM.get(fp)
    if cached is not None:
        return cached
    cells = merged_corpus_stats(
        spark.read.parquet(corpus_stats_path).drop(BATCH_COL)
    ).collect()
    stats = CorpusStats(
        bins=QUALITY_HIST_BINS,
        cells=tuple(
            sorted(
                (r.source, int(r.qbin), int(r.n_docs), int(r.n_tokens))
                for r in cells
            )
        ),
    )
    _INGESTED_MEM[fp] = stats
    return stats
