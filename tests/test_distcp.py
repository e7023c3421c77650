"""Dynamic work-stealing copy (DistCp DynamicInputFormat analogue):
byte-exact copies, straggler isolation, and chunk granularity."""

from __future__ import annotations

import hashlib
import os

from hadoop_prototype_spark.sources.distcp import (
    copy_files_dynamic,
    plan_chunks,
)


def _write(path: str, size: int, seed: int) -> None:
    with open(path, "wb") as f:
        f.write(bytes((seed * 7 + i) % 256 for i in range(size)))


def test_plan_chunks_isolates_stragglers_and_balances():
    files = [("big", 1000)] + [(f"s{i}", 10) for i in range(40)]
    chunks = plan_chunks(files, 16)
    assert len(chunks) == 16
    big_chunk = next(c for c in chunks if any(p == "big" for p, _ in c))
    assert big_chunk == [("big", 1000)], "the huge file must sit alone"
    # the small files spread over the remaining chunks (none empty, since
    # 40 files >> 15 chunks)
    small_loads = [sum(s for _, s in c) for c in chunks if c is not big_chunk]
    assert max(small_loads) <= 3 * min(small_loads)
    # more chunks than files caps at one file per chunk
    assert [len(c) for c in plan_chunks(files[:3], 99)] == [1, 1, 1]


def test_copy_files_dynamic_byte_exact_with_skew(spark, tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    os.makedirs(src)
    # one 2 MB straggler + 30 small files
    _write(str(src / "huge.bin"), 2 * 1024 * 1024, 1)
    for i in range(30):
        _write(str(src / f"f{i:02d}.bin"), 1000 + i, i)

    report = copy_files_dynamic(spark, str(src), str(dst))
    assert report["files"] == 31
    assert report["chunks"] > 4, "work-stealing needs chunk granularity"

    for name in os.listdir(src):
        with open(src / name, "rb") as a, open(dst / name, "rb") as b:
            sa, sb = a.read(), b.read()
        assert sa == sb, name
        assert report["checksums"][name] == hashlib.md5(sa).hexdigest()
    assert report["bytes"] == sum(
        os.path.getsize(src / n) for n in os.listdir(src)
    )


def test_copy_files_dynamic_empty_source(spark, tmp_path):
    src = tmp_path / "nothing"
    os.makedirs(src)
    report = copy_files_dynamic(spark, str(src), str(tmp_path / "out"))
    assert report == {"files": 0, "bytes": 0, "chunks": 0, "checksums": {}}
