"""Incremental LSH dedup against a persisted index (operators/dedup.py).

The ingest-time contract: band keys of every seen doc (kept AND dropped)
are appended to a parquet index; each new batch dedups against the index +
itself and is bit-equal to rescanning the whole corpus with the global
no-lower-id-LSH-neighbor rule. Crash replay (appending a batch's keys
twice) must not change any decision.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hadoop_prototype_spark.operators import dedup
from hadoop_prototype_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_incremental_lsh_matches_global_over_three_batches(spark, docs, tmp_path):
    """Batches processed in ascending-id order reproduce the global rule."""
    hi = docs.agg(F.max("doc_id")).first()[0]
    cuts = [hi // 3, 2 * hi // 3]
    batches = [
        docs.filter(F.col("doc_id") <= cuts[0]),
        docs.filter((F.col("doc_id") > cuts[0]) & (F.col("doc_id") <= cuts[1])),
        docs.filter(F.col("doc_id") > cuts[1]),
    ]
    index_path = str(tmp_path / "lsh_index")

    kept = []
    # batch 0 bootstraps: empty index == batch-mode dedup of itself
    first_keep = dedup.lsh_keepers(batches[0])
    kept += _ids(first_keep)
    dedup.lsh_index_keys(batches[0]).write.mode("overwrite").parquet(index_path)
    for b in batches[1:]:
        index = spark.read.parquet(index_path)
        keepers, bk = dedup.incremental_lsh_dedup(b, index)
        kept += _ids(keepers)
        bk.write.mode("append").parquet(index_path)

    assert sorted(kept) == _ids(dedup.lsh_keepers(docs))
    # the index holds every doc's keys, dropped docs included
    n_indexed = (
        spark.read.parquet(index_path).select("doc_id").distinct().count()
    )
    assert n_indexed == docs.count()


def test_incremental_lsh_replayed_append_is_idempotent(spark, docs, tmp_path):
    """At-least-once ingest: duplicate index rows change no keep decision."""
    hi = docs.agg(F.max("doc_id")).first()[0]
    base = docs.filter(F.col("doc_id") <= hi // 2)
    batch = docs.filter(F.col("doc_id") > hi // 2)
    index_path = str(tmp_path / "lsh_index")
    dedup.lsh_index_keys(base).write.mode("overwrite").parquet(index_path)
    once, _ = dedup.incremental_lsh_dedup(batch, spark.read.parquet(index_path))
    # crash replay: the same base keys land a second time
    dedup.lsh_index_keys(base).write.mode("append").parquet(index_path)
    twice, _ = dedup.incremental_lsh_dedup(batch, spark.read.parquet(index_path))
    assert _ids(once) == _ids(twice)


def test_pruned_index_read_scans_only_touched_buckets(spark, docs, tmp_path):
    """Round-9 verdict #1: a band_bucket-partitioned index is partition-
    PRUNED by each batch's touched buckets — per-batch index IO must not
    grow with corpus age. Pins (a) listing-time pruning in the plan, (b)
    touched files ≪ index files on a many-batch index, (c) decisions
    bit-equal to the full-index read."""
    import glob as _glob

    hi = docs.agg(F.max("doc_id")).first()[0]
    index_path = str(tmp_path / "lsh_index")
    # grow the index over many "ingest batches" in the prunable layout
    n_batches = 8
    for i in range(n_batches):
        lo_b = i * hi // (n_batches + 1)
        hi_b = (i + 1) * hi // (n_batches + 1)
        part = docs.filter((F.col("doc_id") > lo_b) & (F.col("doc_id") <= hi_b))
        dedup.write_lsh_index(dedup.lsh_index_keys(part), index_path)
    total_files = len(
        _glob.glob(f"{index_path}/band_bucket=*/*.parquet")
    )
    assert total_files >= n_batches  # the index really is many files
    # a TINY late batch: 3 docs -> few band keys -> few touched buckets
    batch = docs.filter(F.col("doc_id") > hi - 3)
    keys = dedup.lsh_index_keys(batch).localCheckpoint(eager=False)
    pruned = dedup.read_lsh_index_pruned(spark, index_path, keys)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "band_bucket" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    # a small batch also pushes its exact band_key set into the scan
    # (row-group stats + bloom) — visible as a data-filter pushdown
    assert "PushedFilters" in plan and "band_key" in plan.split(
        "PushedFilters"
    )[1].split("]")[0], plan
    touched = (
        pruned.select(F.input_file_name().alias("f")).distinct().count()
    )
    assert touched < total_files / 2, (touched, total_files)
    # pruning never changes a decision: same keepers as the full read
    full = spark.read.parquet(index_path)
    kept_pruned, _ = dedup.incremental_lsh_dedup(batch, pruned, keys=keys)
    kept_full, _ = dedup.incremental_lsh_dedup(batch, full, keys=keys)
    assert _ids(kept_pruned) == _ids(kept_full)


def test_bulk_backfill_shuffle_path_matches_broadcast(spark, docs, tmp_path):
    """broadcast_batch=False (the bulk-backfill shape: batch too big to
    broadcast) makes identical decisions through a shuffled join."""
    hi = docs.agg(F.max("doc_id")).first()[0]
    base = docs.filter(F.col("doc_id") <= hi // 2)
    batch = docs.filter(F.col("doc_id") > hi // 2)
    index_path = str(tmp_path / "lsh_index")
    dedup.lsh_index_keys(base).write.parquet(index_path)
    index = spark.read.parquet(index_path)
    bc, _ = dedup.incremental_lsh_dedup(batch, index)
    sh, _ = dedup.incremental_lsh_dedup(batch, index, broadcast_batch=False)
    assert _ids(bc) == _ids(sh)


def test_pruned_read_falls_back_on_legacy_layout(spark, docs, tmp_path):
    """An index written before the band_bucket layout (no such column in
    the files) is read whole — correctness over pruning."""
    hi = docs.agg(F.max("doc_id")).first()[0]
    base = docs.filter(F.col("doc_id") <= hi // 2)
    batch = docs.filter(F.col("doc_id") > hi // 2)
    index_path = str(tmp_path / "legacy_index")
    dedup.lsh_index_keys(base).drop("band_bucket").write.parquet(index_path)
    keys = dedup.lsh_index_keys(batch)
    pruned = dedup.read_lsh_index_pruned(spark, index_path, keys)
    assert pruned.count() == spark.read.parquet(index_path).count()
    got, _ = dedup.incremental_lsh_dedup(batch, pruned, keys=keys)
    want, _ = dedup.incremental_lsh_dedup(
        batch, spark.read.parquet(index_path)
    )
    assert _ids(got) == _ids(want)


def test_incremental_lsh_broadcasts_batch_not_index(spark, docs, tmp_path):
    """Scale pin: the executed plan broadcasts the (small) batch band keys;
    the index side joins map-side without an Exchange of its own rows."""
    hi = docs.agg(F.max("doc_id")).first()[0]
    base = docs.filter(F.col("doc_id") <= hi // 2)
    batch = docs.filter(F.col("doc_id") > hi // 2)
    index_path = str(tmp_path / "lsh_index")
    dedup.lsh_index_keys(base).write.mode("overwrite").parquet(index_path)
    keepers, _ = dedup.incremental_lsh_dedup(batch, spark.read.parquet(index_path))
    keepers.collect()
    plan = keepers._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bucket_count_mismatch_cannot_miss_duplicates(spark, docs, tmp_path):
    """ADVICE r10: an index laid out with a non-default bucket count probed
    by batch keys bucketed at the default must still find every collision
    partner — the reader re-derives the batch's buckets from the sidecar
    the writer recorded, so mixed counts can't silently prune true pairs."""
    hi = docs.agg(F.max("doc_id")).first()[0]
    base = docs.filter(F.col("doc_id") <= hi // 2)
    batch = docs.filter(F.col("doc_id") > hi // 2)
    index_path = str(tmp_path / "idx8")
    dedup.write_lsh_index(
        dedup.lsh_index_keys(base, buckets=8), index_path, buckets=8
    )
    assert dedup.read_index_buckets(index_path) == 8
    # batch keys at the DEFAULT count (the silent-mismatch scenario)
    keys = dedup.lsh_index_keys(batch).localCheckpoint(eager=False)
    pruned = dedup.read_lsh_index_pruned(spark, index_path, keys)
    got, _ = dedup.incremental_lsh_dedup(batch, pruned, keys=keys)
    want, _ = dedup.incremental_lsh_dedup(
        batch, spark.read.parquet(index_path), keys=keys
    )
    assert _ids(got) == _ids(want)


def test_index_append_with_conflicting_bucket_count_raises(spark, docs, tmp_path):
    hi = docs.agg(F.max("doc_id")).first()[0]
    base = docs.filter(F.col("doc_id") <= hi // 2)
    index_path = str(tmp_path / "idx")
    dedup.write_lsh_index(dedup.lsh_index_keys(base), index_path)
    with pytest.raises(ValueError, match="band_buckets"):
        dedup.write_lsh_index(
            dedup.lsh_index_keys(base, buckets=16), index_path, buckets=16
        )


def test_write_lsh_index_recomputes_layout_from_buckets_arg(spark, docs, tmp_path):
    """The directories on disk must agree with the recorded count even when
    the caller's keys frame was bucketed differently."""
    import glob as _glob

    hi = docs.agg(F.max("doc_id")).first()[0]
    base = docs.filter(F.col("doc_id") <= hi // 4)
    index_path = str(tmp_path / "idx4")
    # keys bucketed at 64, written under a 4-bucket layout: write wins
    dedup.write_lsh_index(dedup.lsh_index_keys(base), index_path, buckets=4)
    vals = {
        int(d.rsplit("=", 1)[1])
        for d in _glob.glob(f"{index_path}/band_bucket=*")
    }
    assert vals and all(v < 4 for v in vals), vals
    assert dedup.read_index_buckets(index_path) == 4
