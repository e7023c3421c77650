"""Small-file compaction (bin-packing OPTIMIZE) over a parquet directory.

Streaming ingest, partitioned writes, and MERGE's copy-on-write all leave
tables as thousands of small files; at 100 TB the scan cost becomes
driver listing + task-per-file overhead instead of IO. Compaction
bin-packs ONLY the undersized files into ~target-size rewrites and leaves
every already-right-sized file as untouched bytes — the incremental
OPTIMIZE every lakehouse format ships (Hadoop-era analogue: the har
archive / CombineFileInputFormat pairing, MR input/CombineFileInputFormat
.java — which only coalesced at READ time; this fixes the layout once).

Scale shape:
- file listing + size stat is one metadata pass (the same bounded pass
  `merge_into` does; a manifest-backed table would serve it from the log);
- bin assignment is first-fit-decreasing over (file, bytes) pairs on the
  driver — thousands of entries, trivially bounded;
- each bin rewrites via ONE coalesce(1) read of just its files — no
  shuffle, no touching well-sized files; bins rewrite independently (and
  on a cluster, concurrently);
- swap-in is write-new-then-delete-old, same transactional caveat as
  merge.py (a deployment wraps it in a commit log).

Idempotent: a second run finds ≤1 undersized file per directory and
stops (needs_compaction reports the decision).
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024
# files at least this fraction of target are "right-sized" and never touched
RIGHT_SIZED_FRACTION = 0.5


def _list_small_files(path: str, target_bytes: int) -> tuple[list[tuple[str, int]], int]:
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    small = [
        (f, os.path.getsize(f))
        for f in files
        if os.path.getsize(f) < target_bytes * RIGHT_SIZED_FRACTION
    ]
    return small, len(files)


def plan_bins(small: list[tuple[str, int]], target_bytes: int) -> list[list[str]]:
    """First-fit-decreasing bin packing of (file, bytes) into ~target bins."""
    bins: list[tuple[int, list[str]]] = []
    for f, sz in sorted(small, key=lambda t: (-t[1], t[0])):
        for i, (used, members) in enumerate(bins):
            if used + sz <= target_bytes:
                bins[i] = (used + sz, members + [f])
                break
        else:
            bins.append((sz, [f]))
    return [members for _, members in bins]


def compact(
    spark: SparkSession, path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> dict:
    """Bin-pack undersized parquet files under ``path`` into ~target-size
    files. Returns {"files_before", "files_after", "files_rewritten",
    "bins"}; no-op (files_rewritten=0) when <2 undersized files exist."""
    small, files_before = _list_small_files(path, target_bytes)
    if len(small) < 2:
        return {
            "files_before": files_before,
            "files_after": files_before,
            "files_rewritten": 0,
            "bins": 0,
        }
    pre_files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    # capture manifest priors BEFORE the rewrite deletes files: freshness
    # is checked against the live (name, size, mtime) listing, which only
    # matches while the pre-compact files still exist
    from . import manifest as mf

    priors = {
        key: prior
        for key in mf.manifest_keys(path)
        if (prior := mf.read_manifest(path, key, pre_files)) is not None
    }
    bins = plan_bins(small, target_bytes)
    removed: list[str] = []
    added: list[str] = []
    for members in bins:
        out = os.path.join(path, f"compact-{uuid.uuid4().hex}")
        # one bin = one output file; reads only this bin's members
        spark.read.parquet(*members).coalesce(1).write.parquet(out)
        part = glob.glob(os.path.join(out, "part-*.parquet"))[0]
        dst = os.path.join(path, f"{os.path.basename(out)}.parquet")
        os.replace(part, dst)
        added.append(dst)
        shutil.rmtree(out)
        for f in members:
            os.remove(f)
        removed.extend(members)
    # keep any per-key manifests fresh across the rewrite: carry over
    # surviving entries, footer-read only the new compacted files —
    # without this every compaction would force downstream merges back
    # through the full bootstrap pass
    if priors:
        # one footer pass over the new files refreshes EVERY key's manifest
        mf.refresh_after_swap_multi(path, priors, removed, added)
    _, files_after = _list_small_files(path, target_bytes)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "files_rewritten": len(small),
        "bins": len(bins),
    }
