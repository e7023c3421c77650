"""Copy-on-write MERGE (upsert) over a parquet directory.

The lakehouse write path a 100 TB fact table needs: apply a batch of
upserts WITHOUT rewriting the table. Parquet footer min/max stats on the
merge key identify the files an update batch can possibly touch; only
those are rewritten, everything else is untouched bytes. This is the
DBOutputFormat-era "load into the serving store" problem
(MR lib/db/DBOutputFormat.java:50) re-solved for object-store tables.

Scale shape:
- the footer scan is one metadata read per file (the same bounded
  metadata pass every table format does; at cluster scale the ranges
  live in a manifest instead of being re-read);
- affected-file selection is a broadcast interval join of file ranges
  against DISTINCT update keys — the update batch is never collected;
- the rewrite reads only affected files and full-outer-joins them with
  the updates (update wins per column), then swaps files in.

Swap-in is write-new-then-delete-old; a real deployment wraps the swap
in a transaction log (this module's contract is the pruning + merge
semantics, which the e2e test pins).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _file_key_ranges(
    files: list[str], key_col: str
) -> list[tuple[str, object, object, int]]:
    """(file, key_min, key_max, num_rows) from the parquet footers."""
    import pyarrow.parquet as pq

    out = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                cc = rgm.column(ci)
                if cc.path_in_schema == key_col and cc.statistics is not None:
                    s = cc.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        out.append((f, lo, hi, md.num_rows))
    return out


def _affected_files(
    spark: SparkSession, files: list[str], key_batch: DataFrame, key_col: str
) -> list[str]:
    """Files whose footer key-range can contain one of the batch's keys.

    The ranges frame gets an EXPLICIT schema (file + the key column's own
    type): files written without statistics yield all-None bounds, which
    schema inference would reject; with the typed schema they simply never
    match and such files are conservatively selected below."""
    ranges = _file_key_ranges(files, key_col)
    key_type = key_batch.schema[key_col].dataType.simpleString()
    # a zero-row file (committers write them for empty partitions) has no
    # stats AND no rows — it can never be affected; a statless file WITH
    # rows could hold any key, but only a non-empty batch can touch it
    no_stats = [
        f for f, lo, hi, n in ranges if n > 0 and (lo is None or hi is None)
    ]
    if no_stats and key_batch.select(key_col).isEmpty():
        no_stats = []
    ranged = [
        (f, lo, hi) for f, lo, hi, _ in ranges if lo is not None and hi is not None
    ]
    ranges_df = spark.createDataFrame(
        ranged, f"_file string, _lo {key_type}, _hi {key_type}"
    )
    keys = key_batch.select(F.col(key_col).alias("_k")).distinct()
    hit = [
        r._file
        for r in keys.join(
            F.broadcast(ranges_df),
            (F.col("_k") >= F.col("_lo")) & (F.col("_k") <= F.col("_hi")),
        )
        .select("_file")
        .distinct()
        .collect()
    ]
    # a file with no footer stats could hold any key — must be rewritten
    return sorted(set(hit) | set(no_stats))


def merge_into(
    spark: SparkSession, target_path: str, updates: DataFrame, key_col: str
) -> dict:
    """Upsert ``updates`` into the parquet table at ``target_path`` by
    ``key_col``; update rows replace matching keys, unmatched keys insert.
    Returns {"files_total", "files_rewritten", "rows_after"}."""
    files = sorted(glob.glob(os.path.join(target_path, "*.parquet")))
    affected = _affected_files(spark, files, updates, key_col) if files else []

    cols = spark.read.parquet(target_path).columns
    upd = updates.select(*cols)
    if affected:
        base = spark.read.parquet(*affected)
        u = upd.select(
            F.col(key_col), *[F.col(c).alias(f"_u_{c}") for c in cols if c != key_col]
        )
        merged = base.join(u, key_col, "full").select(
            key_col,
            *[F.coalesce(F.col(f"_u_{c}"), F.col(c)).alias(c) for c in cols if c != key_col],
        ).select(*cols)
    else:
        merged = upd
    # swap in: write the merged slice as new files, then drop the old ones
    staging = os.path.join(target_path, "_merge_staging")
    merged.write.mode("overwrite").parquet(staging)
    for f in affected:
        os.remove(f)
    for f in glob.glob(os.path.join(staging, "*.parquet")):
        os.rename(f, os.path.join(target_path, "merged-" + os.path.basename(f)))
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    return {
        "files_total": len(files),
        "files_rewritten": len(affected),
        "rows_after": spark.read.parquet(target_path).count(),
    }


def delete_from(
    spark: SparkSession, target_path: str, delete_keys: DataFrame, key_col: str
) -> dict:
    """Targeted copy-on-write DELETE (the GDPR/right-to-erasure write
    path): remove every row whose ``key_col`` appears in ``delete_keys``,
    rewriting ONLY the files whose footer key-range can contain one of
    the keys — the same pruning machinery as merge_into, with a
    left-anti join instead of the upsert merge.

    Returns {"files_total", "files_rewritten", "rows_deleted",
    "rows_after"}. Same swap-in caveat as merge_into: write-new-then-
    delete-old; a deployment wraps the swap in a transaction log."""
    files = sorted(glob.glob(os.path.join(target_path, "*.parquet")))
    if not files:
        # empty/nonexistent target: nothing to delete (and an empty
        # createDataFrame without a schema would raise before the old
        # guard could run)
        return {
            "files_total": 0,
            "files_rewritten": 0,
            "rows_deleted": 0,
            "rows_after": 0,
        }
    affected = _affected_files(spark, files, delete_keys, key_col)
    if not affected:
        return {
            "files_total": len(files),
            "files_rewritten": 0,
            "rows_deleted": 0,
            "rows_after": spark.read.parquet(target_path).count(),
        }
    base = spark.read.parquet(*affected)
    n_before = base.count()
    kept = base.join(
        delete_keys.select(F.col(key_col)).distinct(), key_col, "left_anti"
    )
    staging = os.path.join(target_path, "_delete_staging")
    kept.write.mode("overwrite").parquet(staging)
    # count the survivors from the STAGED files (the kept plan's source
    # files are about to be removed — recomputing it later would read
    # deleted paths)
    n_kept = spark.read.parquet(staging).count()
    for f in affected:
        os.remove(f)
    for f in glob.glob(os.path.join(staging, "*.parquet")):
        os.rename(f, os.path.join(target_path, "kept-" + os.path.basename(f)))
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    return {
        "files_total": len(files),
        "files_rewritten": len(affected),
        "rows_deleted": n_before - n_kept,
        "rows_after": spark.read.parquet(target_path).count(),
    }
