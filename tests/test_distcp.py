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


def test_copy_preserves_subdirectories_with_same_basename(spark, tmp_path):
    """a/x.bin and b/x.bin must land at DISTINCT destinations (the round-7
    review's silent-clobber bug): relative paths preserved, checksums keyed
    by relative path, byte totals counting both files."""
    src = tmp_path / "src"
    os.makedirs(src / "a")
    os.makedirs(src / "b" / "deep")
    _write(str(src / "a" / "x.bin"), 500, 1)
    _write(str(src / "b" / "x.bin"), 700, 2)
    _write(str(src / "b" / "deep" / "x.bin"), 900, 3)
    _write(str(src / "top.bin"), 100, 4)

    dst = tmp_path / "dst"
    report = copy_files_dynamic(spark, str(src), str(dst))
    assert report["files"] == 4
    assert report["bytes"] == 500 + 700 + 900 + 100

    for rel in ("a/x.bin", "b/x.bin", "b/deep/x.bin", "top.bin"):
        with open(src / rel, "rb") as f:
            want = f.read()
        with open(dst / rel, "rb") as f:
            got = f.read()
        assert got == want, rel
        assert report["checksums"][rel] == hashlib.md5(want).hexdigest()


def test_copy_glob_with_duplicate_basenames_raises_before_copying(spark, tmp_path):
    """Glob listings flatten to basenames; a duplicate basename must fail
    fast instead of clobbering one copy."""
    import pytest

    src = tmp_path / "src"
    os.makedirs(src / "a")
    os.makedirs(src / "b")
    _write(str(src / "a" / "x.bin"), 10, 1)
    _write(str(src / "b" / "x.bin"), 20, 2)
    dst = tmp_path / "dst"
    with pytest.raises(ValueError, match="collision"):
        copy_files_dynamic(spark, str(src / "*" / "x.bin"), str(dst))
    assert not os.path.exists(dst / "x.bin"), "no byte may move on collision"


def test_copy_files_dynamic_empty_source(spark, tmp_path):
    src = tmp_path / "nothing"
    os.makedirs(src)
    report = copy_files_dynamic(spark, str(src), str(tmp_path / "out"))
    assert report == {"files": 0, "bytes": 0, "chunks": 0, "checksums": {}}
