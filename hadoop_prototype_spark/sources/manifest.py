"""File-level manifest for parquet tables: (file, key_min, key_max, num_rows).

merge_into/delete_from prune their rewrite set with per-file key ranges.
Reading those from parquet footers works, but it is one driver-side
metadata fetch PER FILE PER CALL — at 100k files on an object store that
is 100k sequential round trips before any work starts, the exact
bottleneck every table format (Iceberg/Delta/Hudi manifests) exists to
remove. This module is that manifest, scoped to what the engine needs:

- one tiny parquet file per (table, key column) under
  ``<table>/_manifest/``, written atomically (write-new-then-rename);
- STALENESS-SAFE BY CONSTRUCTION: the manifest records the exact
  (file name, size, mtime) set it describes; ``read_manifest`` returns
  None unless that set matches the table's current listing — so neither
  an out-of-band add/remove NOR an in-place rewrite under the same name
  can cause wrong pruning; callers just fall back to footers and rewrite
  the manifest (self-healing);
- INCREMENTALLY MAINTAINED: after a merge/delete swap, only the NEWLY
  written files need a footer read; surviving entries carry over. A
  1000-file table's steady-state merge does zero old-file footer reads.
- row counts come free: ``sum(num_rows)`` answers "how many rows does
  this table have" without touching a single data page.

The manifest is itself parquet (via pyarrow, no Spark job) so key bounds
round-trip with their real types — int, string, date — instead of being
squeezed through JSON.

The leading underscore directory is ignored by Spark's file index (same
convention as _SUCCESS / _metadata), so readers of the table never see it.
"""

from __future__ import annotations

import glob
import os
import uuid

# Module-level counter, incremented on every real footer fetch — tests pin
# "zero footer reads on the steady-state path" against it.
FOOTER_READS = 0

# Entry shape: (file, key_min, key_max, num_rows, size, mtime_ns). The
# trailing (size, mtime_ns) pair is the freshness fingerprint captured AT
# METADATA-READ TIME and it TRAVELS WITH the bounds it describes — the
# fingerprint write_manifest records must describe the file version the
# key bounds were read from; re-stat'ing at write time is a TOCTOU (an
# out-of-band rewrite between the footer read and the stat would pair NEW
# (size, mtime) with STALE bounds, and the next read_manifest would
# wrongly report fresh). The stat is captured BEFORE the footer read (a
# mid-read rewrite records the older stat → next check sees a mismatch →
# safe fallback); entries returned by read_manifest carry the fingerprint
# recorded in the manifest, so carried-over survivors keep the stats
# their bounds were recorded under. Threading the pair through the tuple
# (rather than a process-global keyed by path) means the pairing can
# never be refreshed out from under a caller still holding older bounds.
# Consumers that only need (file, lo, hi, n) unpack with a trailing
# ``*_``.


def _manifest_file(table_path: str, key_col: str) -> str:
    return os.path.join(table_path, "_manifest", f"key={key_col}.parquet")


def _data_files(table_path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(table_path, "*.parquet")))


def footer_key_ranges(
    files: list[str], key_col: str
) -> list[tuple[str, object, object, int, int, int]]:
    """(file, key_min, key_max, num_rows, size, mtime_ns) straight from
    parquet footers — the bootstrap / fallback path (and the per-NEW-file
    increment)."""
    global FOOTER_READS
    import pyarrow.parquet as pq

    out = []
    for f in files:
        FOOTER_READS += 1
        st = os.stat(f)  # BEFORE the footer read — see the entry-shape note
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
        out.append((f, lo, hi, md.num_rows, st.st_size, st.st_mtime_ns))
    return out


def footer_key_ranges_multi(
    files: list[str], key_cols: list[str]
) -> dict[str, list[tuple[str, object, object, int, int, int]]]:
    """Ranges for SEVERAL key columns in one metadata read per file —
    write paths that cluster on multiple columns (Z-order) persist one
    manifest per column for the price of one footer pass."""
    global FOOTER_READS
    import pyarrow.parquet as pq

    out: dict[str, list[tuple[str, object, object, int, int, int]]] = {
        c: [] for c in key_cols
    }
    want = set(key_cols)
    for f in files:
        FOOTER_READS += 1
        st = os.stat(f)  # BEFORE the footer read — see the entry-shape note
        md = pq.ParquetFile(f).metadata
        lo: dict[str, object] = {}
        hi: dict[str, object] = {}
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                cc = rgm.column(ci)
                c = cc.path_in_schema
                if c in want and cc.statistics is not None:
                    s = cc.statistics
                    lo[c] = s.min if c not in lo else min(lo[c], s.min)
                    hi[c] = s.max if c not in hi else max(hi[c], s.max)
        for c in key_cols:
            out[c].append(
                (f, lo.get(c), hi.get(c), md.num_rows, st.st_size, st.st_mtime_ns)
            )
    return out


def manifest_keys(table_path: str) -> list[str]:
    """Key columns that have a persisted manifest for this table."""
    return sorted(
        os.path.basename(p)[len("key=") : -len(".parquet")]
        for p in glob.glob(os.path.join(table_path, "_manifest", "key=*.parquet"))
    )


def write_manifest(
    table_path: str, key_col: str, entries: list[tuple[str, object, object, int]]
) -> None:
    """Persist entries atomically. File names are stored as basenames so
    the table directory can be moved/mounted elsewhere; each entry also
    records the file's (size, mtime_ns) so the freshness check catches
    in-place rewrites under an unchanged name, not just adds/removes.

    The recorded (size, mtime_ns) is the one the entry CARRIES — captured
    when its bounds were read (footer read or fresh-manifest read), never
    a fresh stat: a write-time re-stat would fingerprint a file version
    the bounds may not describe (TOCTOU). A stat here is only a fallback
    for legacy 4-tuple entries constructed outside this module's read
    paths."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    mdir = os.path.join(table_path, "_manifest")
    os.makedirs(mdir, exist_ok=True)

    def _fingerprint(e) -> tuple[int, int]:
        if len(e) >= 6 and e[4] is not None and e[5] is not None:
            return (int(e[4]), int(e[5]))
        st = os.stat(e[0])
        return (st.st_size, st.st_mtime_ns)

    stats = [_fingerprint(e) for e in entries]
    tbl = pa.table(
        {
            "file": [os.path.basename(e[0]) for e in entries],
            "key_min": [e[1] for e in entries],
            "key_max": [e[2] for e in entries],
            "num_rows": [int(e[3]) for e in entries],
            "size": pa.array([s[0] for s in stats], type=pa.int64()),
            "mtime_ns": pa.array([s[1] for s in stats], type=pa.int64()),
        }
    )
    tmp = os.path.join(mdir, f"_tmp_{uuid.uuid4().hex}.parquet")
    pq.write_table(tbl, tmp)
    os.replace(tmp, _manifest_file(table_path, key_col))


def read_manifest(
    table_path: str, key_col: str, files: list[str] | None = None
) -> list[tuple[str, object, object, int, int, int]] | None:
    """Entries for the table's CURRENT files, or None when absent/stale.

    Staleness = the recorded (basename, size, mtime_ns) set differs from
    the live listing — an out-of-band writer adding/removing files OR
    rewriting one in place under the same name. None means 'fall back to
    footers and rebuild' — pruning can therefore never act on stale
    bounds. Manifests written before size/mtime were recorded are treated
    as stale (one-time rebuild)."""
    import pyarrow.parquet as pq

    mf = _manifest_file(table_path, key_col)
    if not os.path.exists(mf):
        return None
    live = _data_files(table_path) if files is None else sorted(files)
    tbl = pq.read_table(mf)
    if "size" not in tbl.column_names or "mtime_ns" not in tbl.column_names:
        return None  # pre-fingerprint manifest format: rebuild
    recorded = tbl.column("file").to_pylist()
    sizes = tbl.column("size").to_pylist()
    mtimes = tbl.column("mtime_ns").to_pylist()
    try:
        live_stat = sorted(
            (os.path.basename(f), st.st_size, st.st_mtime_ns)
            for f in live
            for st in (os.stat(f),)
        )
    except OSError:
        return None  # a listed file vanished mid-check: definitely stale
    if sorted(zip(recorded, sizes, mtimes)) != live_stat:
        return None
    by_base = {os.path.basename(f): f for f in live}
    lo = tbl.column("key_min").to_pylist()
    hi = tbl.column("key_max").to_pylist()
    nr = tbl.column("num_rows").to_pylist()
    # entries carry the fingerprint their bounds were RECORDED under — a
    # later write_manifest that carries them forward re-records THAT
    # version, not a fresh stat
    return [
        (by_base[b], lo[i], hi[i], int(nr[i]), int(sizes[i]), int(mtimes[i]))
        for i, b in enumerate(recorded)
    ]


def key_ranges(
    table_path: str, key_col: str, files: list[str] | None = None
) -> list[tuple[str, object, object, int, int, int]]:
    """Manifest when fresh, footers otherwise — and in the fallback case
    the rebuilt manifest is persisted so the next call is metadata-free."""
    files = _data_files(table_path) if files is None else files
    cached = read_manifest(table_path, key_col, files)
    if cached is not None:
        return cached
    entries = footer_key_ranges(files, key_col)
    write_manifest(table_path, key_col, entries)
    return entries


def table_row_count(table_path: str, key_col: str | None = None) -> int:
    """Exact row count from metadata only (manifest if present for any
    key, else footers): never reads a data page."""
    files = _data_files(table_path)
    if key_col is not None:
        return sum(e[3] for e in key_ranges(table_path, key_col, files))
    for mf in sorted(glob.glob(os.path.join(table_path, "_manifest", "key=*.parquet"))):
        key = os.path.basename(mf)[len("key=") : -len(".parquet")]
        cached = read_manifest(table_path, key, files)
        if cached is not None:
            return sum(e[3] for e in cached)
    return sum(e[3] for e in footer_key_ranges(files, "_none_"))


def refresh_after_swap(
    table_path: str,
    key_col: str,
    prior: list[tuple[str, object, object, int]],
    removed: list[str],
    added: list[str],
) -> list[tuple[str, object, object, int]]:
    """Incremental maintenance after a copy-on-write swap: carry over the
    surviving entries, footer-read ONLY the newly written files, persist.
    Returns the new entry list (callers sum num_rows for rows_after)."""
    return refresh_after_swap_multi(table_path, {key_col: prior}, removed, added)[
        key_col
    ]


def refresh_after_swap_multi(
    table_path: str,
    priors: dict[str, list[tuple[str, object, object, int]]],
    removed: list[str],
    added: list[str],
) -> dict[str, list[tuple[str, object, object, int]]]:
    """refresh_after_swap for SEVERAL key columns in ONE footer pass over
    the added files: a table clustered on multiple columns (zorder_write
    persists one manifest per column) keeps every manifest fresh across
    merges/deletes/compactions for the price of a single metadata read
    per new file — no key is ever left recording the pre-swap file set
    (which would silently demote its next operation to a full footer
    bootstrap)."""
    gone = {os.path.basename(f) for f in removed}
    fresh = footer_key_ranges_multi(sorted(added), list(priors))
    out: dict[str, list[tuple[str, object, object, int]]] = {}
    for key_col, prior in priors.items():
        survivors = [e for e in prior if os.path.basename(e[0]) not in gone]
        entries = survivors + fresh[key_col]
        write_manifest(table_path, key_col, entries)
        out[key_col] = entries
    return out
