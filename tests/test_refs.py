"""Tags + zero-copy CLONE (sources/refs.py): immutable named versions
that pin vacuum retention, and hardlink clones whose lifecycles are
fully independent of the source table."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hadoop_prototype_spark.sources import refs
from hadoop_prototype_spark.sources import snapshots as sn


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def _table(spark, n=400, parts=4):
    return spark.range(n).repartitionByRange(parts, "id").selectExpr(
        "id AS k", "CAST(id * 10 AS BIGINT) AS v"
    )


def _merge_one(spark, path, k, v):
    upd = spark.createDataFrame([(k, v)], "k bigint, v bigint")
    return sn.merge_into(spark, path, upd, "k")


def test_tag_create_read_list_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")
    _merge_one(spark, path, 3, -3)

    ref = refs.create_tag(path, "release-a", version=1)
    assert ref["version"] == 1 and ref["n_rows"] == 400
    refs.create_tag(path, "release-b")  # defaults to current (v2)
    assert refs.tag_version(path, "release-b") == 2
    assert [r["name"] for r in refs.list_tags(path)] == ["release-a", "release-b"]

    # tagged read == versioned read, even after later writes
    _merge_one(spark, path, 5, -5)
    assert _rows(refs.read_table_tag(spark, path, "release-a")) == _rows(
        sn.read_table(spark, path, version=1)
    )

    # immutability: re-tagging a name raises; delete + recreate moves it
    with pytest.raises(FileExistsError):
        refs.create_tag(path, "release-a", version=3)
    refs.delete_tag(path, "release-a")
    refs.create_tag(path, "release-a", version=3)
    assert refs.tag_version(path, "release-a") == 3

    with pytest.raises(FileNotFoundError):
        refs.tag_version(path, "nope")
    with pytest.raises(FileNotFoundError):
        refs.delete_tag(path, "nope")
    with pytest.raises(ValueError):
        refs.create_tag(path, "bad/name")


def test_tag_of_missing_version_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")
    with pytest.raises(FileNotFoundError):
        refs.create_tag(path, "ghost", version=9)


def test_vacuum_keeps_tagged_version_readable(spark, tmp_path):
    """A tag is a retention pin: vacuum must keep the tagged version's
    log entry (rewritten as a full checkpoint when it was a delta) and
    its data files, while still reclaiming untagged dropped versions."""
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=200), path, "k")
    # build a delta chain long enough that the tag lands mid-chain
    for i in range(6):
        _merge_one(spark, path, 1000 + i, -i)
    tagged_v = 3  # a DELTA entry (not v1, not a checkpoint multiple)
    want = _rows(sn.read_table(spark, path, version=tagged_v))
    refs.create_tag(path, "pinned", version=tagged_v)

    r = sn.vacuum(path, keep_last=2, retention_seconds=0.0)
    assert r["log_entries_removed"] > 0
    # tagged version: entry retained AND readable (files kept)
    assert _rows(sn.read_table(spark, path, version=tagged_v)) == want
    assert _rows(refs.read_table_tag(spark, path, "pinned")) == want
    # untagged dropped versions are really gone
    with pytest.raises(FileNotFoundError):
        sn.read_table(spark, path, version=2)
    # current still fine; history folds cleanly over the gap
    assert sn.read_table(spark, path).count() == 206
    hist = sn.history(path)
    assert hist[0]["version"] == tagged_v
    assert hist[0]["n_rows"] == len(want)

    # dropping the tag releases the pin: the next vacuum reclaims it
    refs.delete_tag(path, "pinned")
    sn.vacuum(path, keep_last=2, retention_seconds=0.0)
    with pytest.raises(FileNotFoundError):
        sn.read_table(spark, path, version=tagged_v)


def test_vacuum_tag_pin_survives_restore(spark, tmp_path):
    """restore_table to a tagged version works after a vacuum that
    dropped everything untagged in between (the tag kept the target's
    files on disk — the exact scenario tags exist for)."""
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=100), path, "k")
    for i in range(5):
        _merge_one(spark, path, 2000 + i, i)
    want = _rows(sn.read_table(spark, path, version=2))
    refs.create_tag(path, "rollback-point", version=2)
    sn.vacuum(path, keep_last=1, retention_seconds=0.0)
    r = sn.restore_table(path, refs.tag_version(path, "rollback-point"))
    assert _rows(sn.read_table(spark, path, version=r["version"])) == want


def test_clone_is_zero_copy_and_independent(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    sn.create_table(_table(spark), src, "k")
    _merge_one(spark, src, 7, -7)
    want = _rows(sn.read_table(spark, src))

    r = refs.clone_table(src, dst)
    assert r["version"] == 1 and r["rows_after"] == 400
    assert r["cloned_from"]["version"] == 2

    # zero-copy: every cloned data file shares its inode with the source
    entry = sn._read_entry(dst, 1)
    for fe in entry["files"]:
        s, d = os.path.join(src, fe["name"]), os.path.join(dst, fe["name"])
        assert os.stat(s).st_ino == os.stat(d).st_ino
    assert _rows(sn.read_table(spark, dst)) == want

    # independent lifecycles: divergent writes never cross over
    _merge_one(spark, src, 50, -50)
    _merge_one(spark, dst, 50, 5050)
    assert dict(_rows(sn.read_table(spark, src)))[50] == -50
    assert dict(_rows(sn.read_table(spark, dst)))[50] == 5050

    # vacuum the SOURCE hard: the clone still reads (hardlinks keep the
    # shared inodes alive even after the source unlinks its names)
    sn.vacuum(src, keep_last=1, retention_seconds=0.0)
    assert dict(_rows(sn.read_table(spark, dst)))[50] == 5050
    assert len(_rows(sn.read_table(spark, dst))) == 400


def test_clone_carries_deletion_vectors_and_schema(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    sn.create_table(_table(spark, n=100), src, "k")
    sn.delete_from_mor(
        spark, src, spark.createDataFrame([(3,), (4,)], "k bigint"), "k"
    )
    sn.add_columns(spark, src, [("note", "string")])
    want = sorted(
        (r.k, r.v, r.note) for r in sn.read_table(spark, src).collect()
    )
    assert len(want) == 98

    refs.clone_table(src, dst)
    got = sorted((r.k, r.v, r.note) for r in sn.read_table(spark, dst).collect())
    assert got == want
    # and the clone's MoR state materializes away under its OWN lifecycle
    sn.optimize(spark, dst, purge_dv=True)
    got2 = sorted((r.k, r.v, r.note) for r in sn.read_table(spark, dst).collect())
    assert got2 == want


def test_clone_refuses_existing_table_and_missing_version(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    sn.create_table(_table(spark, n=50), src, "k")
    refs.clone_table(src, dst)
    with pytest.raises(ValueError):
        refs.clone_table(src, dst)
    with pytest.raises(FileNotFoundError):
        refs.clone_table(src, str(tmp_path / "dst2"), version=9)
