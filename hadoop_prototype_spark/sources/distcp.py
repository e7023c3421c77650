"""Distributed file copy with DistCp's dynamic work-stealing semantics.

The reference's DistCp has two input strategies: UniformSizeInputFormat
(static: split the copy list into one even-byte slice per map) and
DynamicInputFormat (hadoop-tools/hadoop-distcp/.../mapred/lib/
DynamicInputFormat.java:51 — split into MANY small chunks that idle maps
"steal" from a queue, so a straggler holding one huge file or one slow
node cannot gate the whole copy). copy_dataset() covers the structured
re-encode copy; this module covers the byte-preserving bulk copy with the
work-stealing property.

Spark-first translation: Spark's task scheduler IS the chunk queue — a
task is only assigned to a core when that core is free. So dynamic
work-stealing = planning MANY more chunks than execution slots (default
4x, DistCp's own split ratio default) with LPT size-balancing, one task
per chunk. Big files isolate into their own chunks; small files pack
together; a slow chunk delays one slot, not the job. This is the rare
legitimate RDD/mapPartitions use: raw byte IO has no DataFrame shape.

Paths work locally or through pyarrow.fs URIs (s3://, hdfs://, ...), the
same dual path the XML reader uses. Each task verifies its own copies by
byte count and returns an md5 per file; the driver report carries them so
a caller can audit against source checksums (DistCp -skipcrccheck
inverse)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession

CHUNKS_PER_SLOT = 4  # DistCp DynamicInputFormat's default split ratio


def _list_files(in_path: str) -> list[tuple[str, int, str]]:
    """(path, size, rel) for a file, directory, or glob — local or
    pyarrow.fs URI. ``rel`` is the destination-relative path: for a
    directory listing it preserves the source tree under the listing root
    (DistCp semantics — CopyMapper keys its work on source-root-relative
    paths); for a single file or a glob it is the basename (glob results
    with duplicate basenames are rejected by the caller)."""
    if "://" in in_path:
        from pyarrow import fs as pafs

        scheme = in_path.split("://", 1)[0]
        filesystem, p = pafs.FileSystem.from_uri(in_path)
        info = filesystem.get_file_info(p)
        if info.type == pafs.FileType.File:
            return [(in_path, info.size, p.rsplit("/", 1)[-1])]
        sel = pafs.FileSelector(p, recursive=True)
        root = p.rstrip("/")
        return sorted(
            (f"{scheme}://{f.path}", f.size, f.path[len(root) :].lstrip("/"))
            for f in filesystem.get_file_info(sel)
            if f.type == pafs.FileType.File
        )
    if os.path.isfile(in_path):
        return [(in_path, os.path.getsize(in_path), os.path.basename(in_path))]
    if os.path.isdir(in_path):
        root = in_path
        return [
            (p, os.path.getsize(p), os.path.relpath(p, root))
            for p in sorted(
                os.path.join(dp, f)
                for dp, _, fns in os.walk(root)
                for f in fns
            )
        ]
    return [
        (p, os.path.getsize(p), os.path.basename(p))
        for p in sorted(glob.glob(in_path))
    ]


def plan_chunks(files: list[tuple], n_chunks: int) -> list[list[tuple]]:
    """LPT bin-pack into exactly min(n_chunks, |files|) size-balanced
    chunks: files sorted by size descending, each assigned to the lightest
    chunk — the biggest file ends up alone in its chunk whenever
    n_chunks > a few, which is precisely the straggler-isolation DistCp's
    dynamic strategy buys."""
    import heapq

    n = max(1, min(n_chunks, len(files)))
    heap = [(0, i) for i in range(n)]  # (bytes, chunk index)
    heapq.heapify(heap)
    chunks: list[list[tuple]] = [[] for _ in range(n)]
    for item in sorted(files, key=lambda fs: (-fs[1], fs[0])):
        load, i = heapq.heappop(heap)
        chunks[i].append(item)
        heapq.heappush(heap, (load + item[1], i))
    return [c for c in chunks if c]


def _copy_chunk(
    chunk: list[tuple[str, int, str]], out_dir: str
) -> list[tuple[str, int, str]]:
    """Executor-side: copy each file to out_dir/<rel> (the source-relative
    path — subdirectories recreated), md5 the bytes in flight, verify the
    byte count. Returns (rel, bytes, md5)."""
    import hashlib

    results = []
    for src, size, rel in chunk:
        dst = os.path.join(out_dir, rel)
        h = hashlib.md5()
        n = 0
        if "://" in src:
            from pyarrow import fs as pafs

            filesystem, p = pafs.FileSystem.from_uri(src)
            fin = filesystem.open_input_stream(p)
        else:
            fin = open(src, "rb")
        try:
            os.makedirs(os.path.dirname(dst) or out_dir, exist_ok=True)
            with open(dst, "wb") as fout:
                while True:
                    buf = fin.read(4 * 1024 * 1024)
                    if not buf:
                        break
                    h.update(buf)
                    fout.write(buf)
                    n += len(buf)
        finally:
            fin.close()
        if n != size:
            raise IOError(f"short copy of {src}: {n} of {size} bytes")
        results.append((rel, n, h.hexdigest()))
    return results


def copy_files_dynamic(
    spark: SparkSession,
    in_path: str,
    out_dir: str,
    chunks_per_slot: int = CHUNKS_PER_SLOT,
) -> dict:
    """Work-stealing distributed copy of every file under ``in_path`` into
    ``out_dir``, preserving source-relative paths (DistCp CopyMapper
    semantics: ``a/x.txt`` and ``b/x.txt`` land at distinct destinations).
    Returns {"files", "bytes", "chunks", "checksums"} with checksums keyed
    by relative path.

    Chunk count = slots x chunks_per_slot (>= |files| caps it): enough
    granularity that the scheduler's pull-based task assignment reproduces
    DynamicInputFormat's chunk queue.

    Raises ValueError before any byte moves if two planned files map to
    the same destination (possible only for glob inputs, whose results
    flatten to basenames) — silent last-writer-wins clobbering is data
    loss for a byte-preserving copy tool."""
    files = _list_files(in_path)
    if not files:
        return {"files": 0, "bytes": 0, "chunks": 0, "checksums": {}}
    seen: dict[str, str] = {}
    for src, _, rel in files:
        if rel in seen:
            raise ValueError(
                f"destination collision: {seen[rel]!r} and {src!r} both map "
                f"to {rel!r} under {out_dir!r}"
            )
        seen[rel] = src
    slots = spark.sparkContext.defaultParallelism
    chunks = plan_chunks(files, slots * chunks_per_slot)
    out = (
        spark.sparkContext.parallelize(chunks, len(chunks))
        .flatMap(lambda c: _copy_chunk(c, out_dir))
        .collect()
    )
    return {
        "files": len(out),
        "bytes": sum(n for _, n, _ in out),
        "chunks": len(chunks),
        "checksums": {rel: md5 for rel, _, md5 in out},
    }
