"""Manifest-backed pruning: zero per-file footer reads on the steady-state
merge/delete path, staleness-safe fallback on out-of-band writes, and
metadata-only row counts."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from hadoop_prototype_spark.sources import manifest as mf
from hadoop_prototype_spark.sources.merge import delete_from, merge_into
from hadoop_prototype_spark.sources.readers import (
    _bare_parquet_row_count,
    records_per_partition,
)


def _make_table(spark, path: str, n_files: int = 40, rows: int = 4000) -> None:
    (
        spark.range(rows)
        .selectExpr("id AS k", "id * 2 AS v")
        .repartitionByRange(n_files, "k")
        .sortWithinPartitions("k")
        .write.mode("overwrite")
        .parquet(path)
    )


def test_steady_state_merge_does_zero_old_file_footer_reads(spark, tmp_path):
    """First write bootstraps the manifest (one footer pass); every later
    merge/delete prunes against the manifest and footer-reads ONLY its own
    newly written files — the 100k-file bottleneck is gone."""
    target = str(tmp_path / "t")
    _make_table(spark, target, n_files=40)
    n_files = len(glob.glob(os.path.join(target, "*.parquet")))

    before = mf.FOOTER_READS
    merge_into(
        spark,
        target,
        spark.createDataFrame([(5, -1), (6, -1)], "k long, v long"),
        "k",
    )
    bootstrap_reads = mf.FOOTER_READS - before
    assert bootstrap_reads >= n_files  # bootstrap pays the one-time pass

    # steady state: the table has a fresh manifest now
    before = mf.FOOTER_READS
    stats = merge_into(
        spark,
        target,
        spark.createDataFrame([(7, -2)], "k long, v long"),
        "k",
    )
    added = stats["files_rewritten"]  # each rewritten slice re-lands as new files
    steady_reads = mf.FOOTER_READS - before
    # only the freshly written files get footer-read; 40 old files: zero
    assert steady_reads <= max(1, added) + 2, (steady_reads, added)
    assert steady_reads < n_files / 2

    before = mf.FOOTER_READS
    delete_from(
        spark, target, spark.createDataFrame([(8,)], "k long"), "k"
    )
    steady_reads = mf.FOOTER_READS - before
    assert steady_reads < n_files / 2


def test_manifest_staleness_fallback_on_out_of_band_write(spark, tmp_path):
    """An out-of-band append invalidates the manifest (file set mismatch):
    read_manifest returns None, pruning falls back to footers, results stay
    correct, and the manifest self-heals."""
    target = str(tmp_path / "t")
    _make_table(spark, target, n_files=8, rows=800)
    mf.key_ranges(target, "k")  # bootstrap
    assert mf.read_manifest(target, "k") is not None

    # out-of-band writer appends a file the manifest has never seen
    spark.createDataFrame([(10_000, 0)], "k long, v long").coalesce(1).write.mode(
        "append"
    ).parquet(target)
    assert mf.read_manifest(target, "k") is None, "stale manifest must not be served"

    # pruning still correct: delete the out-of-band key
    stats = delete_from(
        spark, target, spark.createDataFrame([(10_000,)], "k long"), "k"
    )
    assert stats["rows_deleted"] == 1
    assert spark.read.parquet(target).filter(F.col("k") == 10_000).count() == 0
    assert mf.read_manifest(target, "k") is not None, "manifest must self-heal"


def test_manifest_stale_on_in_place_rewrite_same_name(spark, tmp_path):
    """The round-7 advice case: an out-of-band writer REWRITES a data file
    under the same name — the basename set is unchanged, but the recorded
    (size, mtime) no longer match, so the manifest must refuse to serve
    pre-rewrite bounds."""
    import shutil

    target = str(tmp_path / "t")
    _make_table(spark, target, n_files=4, rows=400)
    mf.key_ranges(target, "k")  # bootstrap
    assert mf.read_manifest(target, "k") is not None

    # rewrite one file in place: same basename, different content/bounds
    victim = sorted(glob.glob(os.path.join(target, "*.parquet")))[0]
    stage = str(tmp_path / "stage")
    spark.createDataFrame([(10_000, 0)], "k long, v long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    src = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    # drop Hadoop's local-FS checksum sidecar: an out-of-band writer
    # wouldn't maintain it, and a stale .crc fails the read outright
    crc = os.path.join(target, f".{os.path.basename(victim)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    shutil.copyfile(src, victim)

    assert mf.read_manifest(target, "k") is None, (
        "in-place rewrite under an unchanged name must invalidate the manifest"
    )
    # and the system self-heals: pruning falls back to footers, stays correct
    stats = delete_from(
        spark, target, spark.createDataFrame([(10_000,)], "k long"), "k"
    )
    assert stats["rows_deleted"] == 1
    assert mf.read_manifest(target, "k") is not None


def test_merge_refreshes_every_key_manifest(spark, tmp_path):
    """A zorder table clusters on two columns; merge_into on one key must
    leave BOTH manifests fresh (round-7 advice: the un-merged key was
    stranded on the pre-swap file set, demoting its next op to a footer
    bootstrap)."""
    from hadoop_prototype_spark.sources.zorder import zorder_write

    target = str(tmp_path / "z")
    df = spark.range(2000).selectExpr("id AS a", "(id * 7) % 2000 AS b", "id AS v")
    zorder_write(df, target, ["a", "b"], num_files=8)
    assert mf.manifest_keys(target) == ["a", "b"]

    merge_into(
        spark,
        target,
        spark.createDataFrame([(3, 999, -1)], "a long, b long, v long"),
        "a",
    )
    assert mf.read_manifest(target, "a") is not None
    assert mf.read_manifest(target, "b") is not None, (
        "non-merge-key manifests must be refreshed by the swap"
    )

    # and the next delete on the OTHER key runs manifest-pruned: only its
    # own new files get footer-read, no bootstrap pass over the table
    before = mf.FOOTER_READS
    stats = delete_from(spark, target, spark.createDataFrame([(7,)], "b long"), "b")
    assert stats["rows_deleted"] == 1
    assert mf.FOOTER_READS - before <= stats["files_rewritten"] + 1


def test_manifest_1000_file_steady_state(spark, tmp_path):
    """The scale claim at the scale it was claimed for: a 1000-file table's
    steady-state merge footer-reads ONLY its own newly written files —
    zero of the 1000 old files — and the whole check runs in seconds."""
    import time

    target = str(tmp_path / "big")
    (
        spark.range(200_000)
        .selectExpr("id AS k", "id * 2 AS v")
        .repartitionByRange(1000, "k")
        .sortWithinPartitions("k")
        .write.mode("overwrite")
        .parquet(target)
    )
    n_files = len(glob.glob(os.path.join(target, "*.parquet")))
    assert n_files >= 1000

    mf.key_ranges(target, "k")  # bootstrap: the one-time footer pass

    t0 = time.perf_counter()
    before = mf.FOOTER_READS
    stats = merge_into(
        spark,
        target,
        # one in-range update + one true insert (1M > every file's range)
        spark.createDataFrame([(5, -1), (1_000_000, -2)], "k long, v long"),
        "k",
    )
    steady_reads = mf.FOOTER_READS - before
    wall = time.perf_counter() - t0
    assert stats["files_rewritten"] <= 4  # pruning actually pruned
    assert steady_reads <= stats["files_rewritten"] + 1, (
        "old files must not be footer-read at steady state"
    )
    assert stats["rows_after"] == 200_001  # one update + one insert
    assert wall < 60, f"1000-file steady-state merge took {wall:.1f}s"


def test_row_counts_are_metadata_only_and_exact(spark, tmp_path):
    target = str(tmp_path / "t")
    _make_table(spark, target, n_files=8, rows=1234)
    assert mf.table_row_count(target, "k") == 1234

    # repeated merges/deletes keep the manifest row count exact
    merge_into(
        spark,
        target,
        spark.createDataFrame([(5000, 1), (5001, 2)], "k long, v long"),
        "k",
    )
    stats = delete_from(
        spark,
        target,
        spark.createDataFrame([(0,), (1,), (99_999,)], "k long"),
        "k",
    )
    real = spark.read.parquet(target).count()
    assert stats["rows_after"] == real == 1234 + 2 - 2
    assert stats["rows_deleted"] == 2  # 99_999 never existed
    assert mf.table_row_count(target, "k") == real


def test_two_consecutive_deletes_report_exact_counts(spark, tmp_path):
    """Second delete's kept-file accounting must count only ITS new files,
    not survivors named kept-* from the first delete."""
    target = str(tmp_path / "t")
    _make_table(spark, target, n_files=4, rows=400)
    s1 = delete_from(spark, target, spark.createDataFrame([(1,)], "k long"), "k")
    s2 = delete_from(spark, target, spark.createDataFrame([(2,)], "k long"), "k")
    assert s1["rows_deleted"] == 1 and s2["rows_deleted"] == 1
    assert s2["rows_after"] == 398 == spark.read.parquet(target).count()


def test_zorder_write_persists_manifests_at_write_time(spark, tmp_path):
    """zorder_write leaves one manifest per clustering column, so the first
    merge/delete on the table already runs manifest-pruned (no bootstrap)."""
    from hadoop_prototype_spark.sources.zorder import zorder_write

    target = str(tmp_path / "z")
    df = spark.range(2000).selectExpr("id AS a", "(id * 7) % 2000 AS b", "id AS v")
    zorder_write(df, target, ["a", "b"], num_files=8)
    assert mf.manifest_keys(target) == ["a", "b"]
    assert mf.read_manifest(target, "a") is not None

    before = mf.FOOTER_READS
    stats = delete_from(spark, target, spark.createDataFrame([(3,)], "a long"), "a")
    assert stats["rows_deleted"] == 1
    # only the swap's new files were footer-read — no bootstrap pass
    assert mf.FOOTER_READS - before <= stats["files_rewritten"] + 1


def test_compact_keeps_manifest_fresh(spark, tmp_path):
    from hadoop_prototype_spark.sources.compact import compact

    target = str(tmp_path / "c")
    # many tiny files
    spark.range(500).selectExpr("id AS k", "id AS v").repartition(20).write.parquet(
        target
    )
    mf.key_ranges(target, "k")  # bootstrap manifest
    res = compact(spark, target, target_bytes=1 << 30)
    assert res["files_rewritten"] > 0
    assert mf.read_manifest(target, "k") is not None, "manifest must survive compact"
    assert mf.table_row_count(target, "k") == 500


def test_records_per_partition_uses_metadata_for_bare_scans(spark, tmp_path):
    target = str(tmp_path / "t")
    _make_table(spark, target, n_files=4, rows=1000)
    scan = spark.read.parquet(target)
    assert _bare_parquet_row_count(scan) == 1000
    # a filter changes the count → must NOT use footer sums
    assert _bare_parquet_row_count(scan.filter(F.col("k") > 10)) is None

    out = records_per_partition(scan, 100)
    assert out.rdd.getNumPartitions() == 10
    # explicit total (e.g. from the manifest) wins without any IO
    out2 = records_per_partition(scan, 100, total=mf.table_row_count(target, "k"))
    assert out2.rdd.getNumPartitions() == 10


def test_write_manifest_fingerprints_bounds_era_not_write_time(spark, tmp_path):
    """The round-9 advice TOCTOU: bounds are footer-read, a rewrite lands
    out-of-band, THEN write_manifest runs. A write-time re-stat would pair
    the NEW (size, mtime) with the STALE bounds and the next read_manifest
    would wrongly report fresh. The fingerprint must be the one captured
    at footer-read time, so the next read detects the mismatch."""
    import shutil
    import time

    target = str(tmp_path / "t")
    _make_table(spark, target, n_files=3, rows=300)
    files = sorted(glob.glob(os.path.join(target, "*.parquet")))
    entries = mf.footer_key_ranges(files, "k")  # stats captured here

    # out-of-band rewrite of one file between the footer read and the write
    victim = files[0]
    stage = str(tmp_path / "stage")
    spark.createDataFrame([(99_999, 0)], "k long, v long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    src = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    crc = os.path.join(target, f".{os.path.basename(victim)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    time.sleep(0.01)  # ensure mtime_ns moves even on coarse clocks
    shutil.copyfile(src, victim)

    mf.write_manifest(target, "k", entries)
    assert mf.read_manifest(target, "k") is None, (
        "manifest written after an out-of-band rewrite must read as stale"
    )


def test_refresh_carries_bounds_era_fingerprint_for_survivors(spark, tmp_path):
    """Survivor entries in refresh_after_swap must keep the fingerprint
    their bounds were recorded under (from the fresh manifest read), so a
    rewrite of a SURVIVOR between the manifest read and the refresh is
    detected on the next read instead of being fingerprint-laundered."""
    import shutil
    import time

    target = str(tmp_path / "t")
    _make_table(spark, target, n_files=3, rows=300)
    mf.key_ranges(target, "k")  # bootstrap manifest
    prior = mf.read_manifest(target, "k")
    assert prior is not None

    # out-of-band rewrite of a survivor AFTER the manifest read
    victim = prior[0][0]
    stage = str(tmp_path / "stage")
    spark.createDataFrame([(77_777, 0)], "k long, v long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    src = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    crc = os.path.join(target, f".{os.path.basename(victim)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    time.sleep(0.01)
    shutil.copyfile(src, victim)

    # a swap that neither removes nor adds the victim: survivors carry over
    mf.refresh_after_swap(target, "k", prior, removed=[], added=[])
    assert mf.read_manifest(target, "k") is None, (
        "survivor rewritten after the manifest read must invalidate the refresh"
    )
