"""Named refs (tags) + zero-copy CLONE for snapshot tables — the
retention-and-lineage verbs of the lakehouse layer (Delta's SHALLOW
CLONE / Iceberg's tags), built on snapshots.py's log primitives. Engine
extension; the reference counterpart is HDFS snapshot naming
(hdfs dfs -createSnapshot <dir> <name>): a durable name for a point-in-
time file set that space reclamation must honor.

- **Tags** are immutable named pointers to versions, stored one file per
  tag under ``<table>/_refs/<name>.json`` with the same tmp+fsync+
  os.link commit discipline as log entries, so tag creation is atomic
  and first-writer-wins (re-tagging a name raises; delete + recreate is
  the explicit rename path). ``vacuum`` keeps every tagged version
  readable: a tagged version below the retention cutoff has its log
  entry rewritten as a FULL checkpoint (same rule as the cutoff itself)
  and its files counted into the keep set — a tag is a retention pin,
  not just a bookmark.
- **CLONE** is a metadata-speed copy: every data + deletion-vector file
  of the source's chosen version is HARDLINKED into the destination
  (one inode, two names — zero bytes moved, O(files) metadata ops; the
  100 TB cost is the link calls, never the data), and the destination
  gets a fresh v1 log entry carrying the source's recorded per-file
  stats verbatim (no footer re-reads). The two tables then live fully
  independent lives: either side's merges/deletes/optimize/vacuum never
  touch the other, because data files are immutable by the snapshot
  contract (writers only ever ADD files) and an unlink on one side just
  drops one name off a shared inode. Cloning is also this layer's
  BRANCH verb: branch = clone + mutate, merge-back = merge_into from
  the branch's read.
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from . import snapshots as snap

_REFS_DIR = "_refs"


def _refs_dir(path: str) -> str:
    return os.path.join(path, _REFS_DIR)


def _tag_path(path: str, name: str) -> str:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"invalid tag name {name!r}")
    return os.path.join(_refs_dir(path), f"{name}.json")


def create_tag(path: str, name: str, version: int | None = None) -> dict:
    """Tag ``version`` (default: current) of the table at ``path``.
    Atomic + immutable: a second create of the same name raises
    FileExistsError (delete_tag first to move a name). The tagged
    version must be readable NOW — tagging an already-vacuumed version
    is refused here rather than surfacing as a confusing read error
    later."""
    v = snap.current_version(path) if version is None else int(version)
    entry = snap._read_entry(path, v)  # raises if vacuumed / never written
    d = _refs_dir(path)
    os.makedirs(d, exist_ok=True)
    ref = {
        "name": name,
        "version": v,
        "ts": time.time(),
        "n_files": len(entry["files"]),
        "n_rows": snap._live_rows(entry["files"]),
    }
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(ref, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _tag_path(path, name))
    except FileExistsError:
        raise FileExistsError(
            f"tag {name!r} already exists on {path} (tags are immutable; "
            "delete_tag first to move it)"
        ) from None
    finally:
        os.unlink(tmp)
    # Close the tag↔vacuum race: a concurrent vacuum scans _refs at its
    # start and again right before its deletion phase, so a tag linked
    # after BOTH scans (pointing below the cutoff) is not pinned — the
    # vacuum may be reclaiming v right now. Re-verify the version is
    # still fully readable (log entry + every referenced data/DV file)
    # AFTER the link became visible: if it survived, every later vacuum
    # sees the tag and pins it; if not, unlink the dangling tag and fail
    # loud here rather than at some later read. (The pre-delete re-scan
    # plus this post-link verify leaves only a microsecond interleaving
    # window; a zero-retention vacuum racing tag creation should still
    # be a single maintenance writer's job, per the vacuum docstring.)
    try:
        entry2 = snap._read_entry(path, v)
        missing = [
            fe["name"] for fe in entry2["files"]
            if not os.path.exists(os.path.join(path, fe["name"]))
        ] + [
            d for fe in entry2["files"] for d in fe.get("dv", ())
            if not os.path.exists(os.path.join(snap._dv_dir(path), d))
        ]
        if missing:
            raise FileNotFoundError(missing[0])
    except FileNotFoundError:
        try:
            os.remove(_tag_path(path, name))
        except OSError:
            pass
        raise FileNotFoundError(
            f"tag {name!r} lost a race with a concurrent vacuum: version "
            f"{v} of {path} was reclaimed before the tag became visible"
        ) from None
    return ref


def delete_tag(path: str, name: str) -> None:
    p = _tag_path(path, name)
    if not os.path.exists(p):
        raise FileNotFoundError(f"no tag {name!r} on {path}")
    os.remove(p)


def list_tags(path: str) -> list[dict]:
    """All tags, sorted by name. Each dict is what create_tag recorded."""
    d = _refs_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for p in sorted(glob.glob(os.path.join(d, "*.json"))):
        with open(p) as f:
            out.append(json.load(f))
    return sorted(out, key=lambda r: r["name"])


def tag_version(path: str, name: str) -> int:
    p = _tag_path(path, name)
    if not os.path.exists(p):
        raise FileNotFoundError(f"no tag {name!r} on {path}")
    with open(p) as f:
        return int(json.load(f)["version"])


def tagged_versions(path: str) -> set[int]:
    """The set of versions pinned by tags — vacuum's extra keep set."""
    return {r["version"] for r in list_tags(path)}


def read_table_tag(spark: SparkSession, path: str, name: str) -> DataFrame:
    """The table exactly as tagged — sugar over read_table(version=…)."""
    return snap.read_table(spark, path, version=tag_version(path, name))


def clone_table(src: str, dst: str, version: int | None = None) -> dict:
    """Zero-copy clone of ``src`` at ``version`` (default: current) into a
    NEW table at ``dst``. Data and deletion-vector files are hardlinked
    (same filesystem required — the natural layout for a table family);
    the destination's v1 entry carries the source's per-file stats
    verbatim, so the clone costs O(files) metadata operations and ZERO
    footer reads or data bytes. Provenance (source path + version) rides
    in the v1 log entry. The clone is fully independent afterwards:
    vacuuming either side only unlinks names, never shared bytes that
    the other side still references."""
    if snap.current_version(dst) != 0:
        raise ValueError(f"{dst} already has a snapshot log")
    v = snap.current_version(src) if version is None else int(version)
    entry = snap._read_entry(src, v)  # raises if vacuumed
    os.makedirs(dst, exist_ok=True)

    def _link(s: str, d: str) -> bool:
        """Hardlink; an EEXIST whose target already shares our inode is a
        CONCURRENT IDENTICAL CLONE having linked it first — idempotent,
        skip (two clones of the same version converge instead of racing
        destructively)."""
        try:
            os.link(s, d)
            return True
        except FileExistsError:
            if os.stat(s).st_ino == os.stat(d).st_ino:
                return False
            raise

    linked: list[str] = []
    try:
        for fe in entry["files"]:
            s = os.path.join(src, fe["name"])
            d = os.path.join(dst, fe["name"])
            if _link(s, d):
                linked.append(d)
        dvs = sorted({d for fe in entry["files"] for d in fe.get("dv", ())})
        if dvs:
            os.makedirs(snap._dv_dir(dst), exist_ok=True)
        for name in dvs:
            s = os.path.join(snap._dv_dir(src), name)
            d = os.path.join(snap._dv_dir(dst), name)
            if _link(s, d):
                linked.append(d)
    except OSError:
        for f in linked:
            try:
                os.remove(f)
            except OSError:
                pass
        raise
    v1 = {
        "version": 1,
        "op": "clone",
        "key_col": entry["key_col"],
        "files": entry["files"],
        "cloned_from": {"path": os.path.abspath(src), "version": v},
    }
    # per-version table metadata (schema, CHECK constraints, column
    # mapping) travels with the clone — Delta SHALLOW CLONE copies table
    # metadata, and a clone missing the source's mapping or invariants
    # would misread renamed columns / accept rows the source refuses
    snap._copy_meta(v1, entry)
    try:
        snap._commit(dst, 1, v1)
    except snap.ConflictError:
        # someone committed dst's v1 between our emptiness check and now.
        # A twin clone of the SAME source version is idempotent — adopt
        # its commit (our links are its links: shared inodes). Anything
        # else: refuse WITHOUT unlinking (the winner's entry references
        # these names; removing them would brick its table).
        existing = snap._read_raw(dst, 1)
        if existing.get("cloned_from") == v1["cloned_from"]:
            return {
                "version": 1,
                "cloned_from": v1["cloned_from"],
                "files_linked": len(linked),
                "rows_after": snap._live_rows(entry["files"]),
                "raced_with_identical_clone": True,
            }
        raise ValueError(
            f"{dst} was concurrently initialized as a different table"
        ) from None
    return {
        "version": 1,
        "cloned_from": v1["cloned_from"],
        "files_linked": len(linked),
        "rows_after": snap._live_rows(entry["files"]),
    }
