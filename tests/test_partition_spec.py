"""Partition-spec writes + manifest partition pruning
(sources/snapshots.create_table(partition_by=...) + read_table_where):
the spec is log metadata — every write clusters on it and records
per-file ranges, files stay flat (Iceberg manifest model), and a
single-partition probe opens only that partition's files, counted."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_prototype_spark.sources import refs
from hadoop_prototype_spark.sources import snapshots as sn


def _events(spark, n=2000, days=10):
    return spark.range(n).selectExpr(
        "id AS k",
        f"concat('2024-01-', lpad(CAST(id % {days} + 1 AS STRING), 2, '0')) AS day",
        "CAST(id % 7 AS BIGINT) AS metric",
    )


def _touched_files(df):
    return {
        r.f
        for r in df.select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("f")
        )
        .distinct()
        .collect()
    }


def test_single_day_probe_opens_only_that_days_files(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_events(spark), path, "k", partition_by=["day"],
                    partition_files=10)
    assert sn.partition_spec(path) == ["day"]
    entry = sn._read_entry(path, 1)
    total = len(entry["files"])
    assert total > 2
    # every file carries recorded day ranges
    assert all("day" in fe.get("stats", {}) for fe in entry["files"])

    probe = sn.read_table_where(spark, path, {"day": "2024-01-03"})
    want = sorted(r.k for r in sn.read_table(spark, path)
                  .filter(F.col("day") == "2024-01-03").collect())
    assert sorted(r.k for r in probe.collect()) == want
    touched = _touched_files(probe)
    # the probe's IO is the day's files, not the table: with 10 days
    # hash-clustered across 32 tasks, one day lands in ≲ a handful
    assert 0 < len(touched) <= max(1, total // 3)


def test_appends_keep_partition_pruning_tight(spark, tmp_path):
    """Each appended batch clusters on the spec, so a day probe keeps
    opening O(that day's batches) files as the table grows — and never
    the other days' files."""
    path = str(tmp_path / "t")
    first = _events(spark, n=500, days=5)
    sn.create_table(first, path, "k", partition_by=["day"])
    for b in range(3):
        batch = spark.range(1000 + b * 500, 1500 + b * 500).selectExpr(
            "id AS k",
            f"'2024-02-0{b + 1}' AS day",
            "CAST(id % 7 AS BIGINT) AS metric",
        )
        sn.append_table(spark, path, batch, "k")
    entry = sn._read_entry(path, sn.current_version(path))
    total = len(entry["files"])

    probe = sn.read_table_where(spark, path, {"day": "2024-02-02"})
    assert probe.count() == 500
    touched = _touched_files(probe)
    # exactly the one appended batch's file(s) — none of v1's files, none
    # of the other batches'
    assert len(touched) < total
    assert all(f.startswith("v3-") for f in touched)

    # multi-column probe intersects skips; missing-stats columns are
    # conservatively kept but the residual filter stays exact
    got = sn.read_table_where(
        spark, path, {"day": "2024-02-02", "metric": 3}
    )
    assert got.count() == sn.read_table(spark, path).filter(
        (F.col("day") == "2024-02-02") & (F.col("metric") == 3)
    ).count()


def test_partitioned_optimize_and_rename_keep_pruning(spark, tmp_path):
    """Compaction range-clusters on (spec, key) — partition values stay
    contiguous across the fold; renaming the spec column follows in the
    log and probes under the new name still skip files."""
    path = str(tmp_path / "t")
    sn.create_table(_events(spark, n=400, days=4), path, "k",
                    partition_by=["day"])
    for b in range(4):
        sn.append_table(
            spark, path,
            spark.range(1000 * (b + 1), 1000 * (b + 1) + 100).selectExpr(
                "id AS k",
                f"'2024-01-0{b % 4 + 1}' AS day",
                "CAST(id % 7 AS BIGINT) AS metric",
            ),
            "k",
        )
    sn.optimize(spark, path, target_file_rows=200, small_file_rows=10**9)
    entry = sn._read_entry(path, sn.current_version(path))
    probe = sn.read_table_where(spark, path, {"day": "2024-01-02"})
    want = sn.read_table(spark, path).filter(F.col("day") == "2024-01-02")
    assert sorted(r.k for r in probe.collect()) == sorted(
        r.k for r in want.collect()
    )
    assert len(_touched_files(probe)) < len(entry["files"])

    # rename the partition column: spec follows, probes keep skipping
    sn.rename_column(spark, path, "day", "event_day")
    assert sn.partition_spec(path) == ["event_day"]
    probe2 = sn.read_table_where(spark, path, {"event_day": "2024-01-02"})
    assert probe2.count() == probe.count()
    assert len(_touched_files(probe2)) < len(entry["files"])
    # dropping a spec column is refused
    with pytest.raises(ValueError, match="partition spec"):
        sn.drop_column(spark, path, "event_day")


def test_spec_travels_with_clone_restore_vacuum(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_events(spark, n=300, days=3), path, "k",
                    partition_by=["day"])
    sn.append_table(
        spark, path,
        spark.range(5000, 5100).selectExpr(
            "id AS k", "'2024-03-01' AS day", "CAST(0 AS BIGINT) AS metric"
        ),
        "k",
    )
    dst = str(tmp_path / "clone")
    refs.clone_table(path, dst)
    assert sn.partition_spec(dst) == ["day"]
    # appends to the clone cluster + record stats like the source's
    sn.append_table(
        spark, dst,
        spark.range(9000, 9050).selectExpr(
            "id AS k", "'2024-04-01' AS day", "CAST(1 AS BIGINT) AS metric"
        ),
        "k",
    )
    probe = sn.read_table_where(spark, dst, {"day": "2024-04-01"})
    assert probe.count() == 50
    assert all(f.startswith("v2-") for f in _touched_files(probe))

    r = sn.restore_table(path, 1)
    assert sn.partition_spec(path) == ["day"]  # spec restored with v1
    sn.vacuum(path, keep_last=1, retention_seconds=0.0)
    assert sn.partition_spec(path) == ["day"]
    assert sn.read_table(spark, path).count() == 300


def test_optimize_where_scopes_compaction_to_one_partition(spark, tmp_path):
    """OPTIMIZE ... WHERE (Delta's partition-scoped compaction): only the
    predicate's files fold; every other partition's files are carried
    forward byte-identical (same names in the new entry)."""
    path = str(tmp_path / "t")
    sn.create_table(
        spark.range(100).selectExpr(
            "id AS k", "'2024-01-01' AS day", "CAST(0 AS BIGINT) AS metric"
        ),
        path, "k", partition_by=["day"],
    )
    # many small files for TWO days
    for b in range(3):
        for day in ("2024-02-01", "2024-03-01"):
            sn.append_table(
                spark, path,
                spark.range(1000 * b + (0 if day < "2024-03" else 500),
                            1000 * b + (0 if day < "2024-03" else 500) + 50)
                .selectExpr(f"id + {10000 * (b + 1)} AS k", f"'{day}' AS day",
                            "CAST(1 AS BIGINT) AS metric"),
                "k",
            )
    before = sn._read_entry(path, sn.current_version(path))
    feb_before = sorted(
        fe["name"] for fe in before["files"]
        if fe.get("stats", {}).get("day", [None])[0] == "2024-02-01"
    )
    other_before = sorted(
        fe["name"] for fe in before["files"] if fe["name"] not in feb_before
    )
    want = sorted(r.k for r in sn.read_table(spark, path).collect())

    r = sn.optimize(spark, path, where={"day": "2024-02-01"},
                    target_file_rows=1000, small_file_rows=10**9)
    assert r["files_rewritten"] == len(feb_before) > 1
    after = sn._read_entry(path, sn.current_version(path))
    names_after = sorted(fe["name"] for fe in after["files"])
    # untouched partitions carried forward byte-identical
    assert all(n in names_after for n in other_before)
    assert all(n not in names_after for n in feb_before)
    # rows preserved exactly; scoped probe still exact
    assert sorted(r.k for r in sn.read_table(spark, path).collect()) == want
    probe = sn.read_table_where(spark, path, {"day": "2024-02-01"})
    assert probe.count() == 150


def test_bloom_columns_table_property(spark, tmp_path):
    """set_bloom_columns is log metadata (Delta's bloomFilter.columns):
    every later write lands parquet row-group blooms for the declared
    columns, verified against the actual bloom metadata the scan
    consults (bloom_prune_stats) — the point-lookup path for
    hash-distributed columns where min/max stats cannot prune. The
    declaration follows renames and leaves with a dropped column."""
    from hadoop_prototype_spark.sources.bloom import bloom_prune_stats

    path = str(tmp_path / "t")
    sn.create_table(
        spark.range(2000).selectExpr(
            "id AS k", "md5(CAST(id AS STRING)) AS payload"
        ),
        path, "k",
    )
    sn.set_bloom_columns(spark, path, {"payload": 4000})
    with pytest.raises(ValueError, match="not in the table"):
        sn.set_bloom_columns(spark, path, {"nope": None})

    # a rewrite (optimize) backfills blooms into the current files
    sn.optimize(spark, path, target_file_rows=2000, small_file_rows=10**9)
    entry = sn._read_entry(path, sn.current_version(path))
    import os as _os
    f = _os.path.join(path, entry["files"][0]["name"])
    total, with_bloom, excluded = bloom_prune_stats(
        spark, f, "payload", "definitely-absent-value"
    )
    assert with_bloom == total > 0
    assert excluded == total  # absent value: every row group excluded

    # point lookup is exact (predicate pushdown + blooms scan-side)
    probe = sn.read_table(spark, path).filter(
        F.col("payload") == F.expr("md5('7')")
    )
    assert [r.k for r in probe.collect()] == [7]

    # rename follows; drop removes the declaration
    sn.rename_column(spark, path, "payload", "digest")
    assert sn._read_entry(path, sn.current_version(path))["bloom_cols"] == {
        "digest": 4000
    }
    # appends after the rename still bloom the PHYSICAL column
    sn.append_table(
        spark, path,
        spark.range(9000, 9100).selectExpr(
            "id AS k", "md5(CAST(id AS STRING)) AS digest"
        ),
        "k",
    )
    entry = sn._read_entry(path, sn.current_version(path))
    newest = [fe["name"] for fe in entry["files"] if fe["name"].startswith("v")]
    vmax = max(int(n.split("-", 1)[0][1:]) for n in newest)
    nf = [n for n in newest if n.startswith(f"v{vmax}-")][0]
    total, with_bloom, excluded = bloom_prune_stats(
        spark, _os.path.join(path, nf), "payload", "absent"
    )
    assert with_bloom == total > 0
    sn.drop_column(spark, path, "digest")
    assert "bloom_cols" not in sn._read_entry(path, sn.current_version(path))

def test_set_partition_spec_on_existing_table(spark, tmp_path):
    """Partition-spec EVOLUTION (round-12 verdict #4, Iceberg semantics):
    an unpartitioned table gains a spec mid-life — files written before
    the change keep whatever stats their commit recorded (conservatively
    kept by probes), files written after cluster on the new spec and
    record its ranges, and OPTIMIZE migrates the old era eagerly."""
    path = str(tmp_path / "t")
    sn.create_table(_events(spark, n=1000), path, "k")     # no spec
    assert sn.partition_spec(path) == []

    r = sn.set_partition_spec(spark, path, ["day"])
    assert r["version"] == 2 and r["partition_spec"] == ["day"]
    assert sn.partition_spec(path) == ["day"]
    # log-only: v1's files carried, none rewritten
    assert {fe["name"] for fe in sn._read_entry(path, 2)["files"]} == {
        fe["name"] for fe in sn._read_entry(path, 1)["files"]
    }

    # appends now cluster on the new spec and record day ranges; this
    # batch's days (11..20) are DISJOINT from the probed day, so the
    # probe must skip every new-era file from the manifest alone
    batch = spark.range(1000).selectExpr(
        "id + 10000 AS k",
        "concat('2024-01-', lpad(CAST(id % 10 + 11 AS STRING), 2, '0')) AS day",
        "CAST(id % 7 AS BIGINT) AS metric",
    )
    sn.append_table(spark, path, batch, "k")
    entry = sn._read_entry(path, 3)
    new_files = [fe for fe in entry["files"] if fe["name"].startswith("v3-")]
    assert new_files and all("day" in fe.get("stats", {}) for fe in new_files)

    # the probe is EXACT across the mixed eras: old-era files (no day
    # stats) are conservatively kept, new-era files prune
    probe = sn.read_table_where(spark, path, {"day": "2024-01-03"})
    want = sorted(
        r.k
        for r in sn.read_table(spark, path)
        .filter(F.col("day") == "2024-01-03")
        .collect()
    )
    assert sorted(r.k for r in probe.collect()) == want
    touched_v3 = {f for f in _touched_files(probe) if f.startswith("v3-")}
    assert touched_v3 == set()  # new era pruned from the manifest

    # OPTIMIZE migrates the old era to the new clustering
    sn.optimize(spark, path, target_file_rows=250, small_file_rows=10**9)
    entry2 = sn._read_entry(path, sn.current_version(path))
    assert all("day" in fe.get("stats", {}) for fe in entry2["files"])
    probe2 = sn.read_table_where(spark, path, {"day": "2024-01-03"})
    assert sorted(r.k for r in probe2.collect()) == want
    touched = _touched_files(probe2)
    assert 0 < len(touched) < len(entry2["files"]) // 2  # now prunes everywhere

    # changing the spec names a real column or is refused
    import pytest as _pt

    with _pt.raises(ValueError):
        sn.set_partition_spec(spark, path, ["nope"])
    # dropping the spec is a plain log commit
    r2 = sn.set_partition_spec(spark, path, None)
    assert r2["partition_spec"] == [] and sn.partition_spec(path) == []


def test_read_table_where_range_probe(spark, tmp_path):
    """Range predicates ({col: (lo, hi)}) file-skip by OVERLAP against
    the manifest's recorded per-file ranges — the week-slice of a
    day-partitioned table (round-12 verdict #6) — and the residual
    BETWEEN keeps the row set exact."""
    path = str(tmp_path / "t")
    sn.create_table(_events(spark, n=2000, days=20), path, "k",
                    partition_by=["day"], partition_files=20)
    lo, hi = "2024-01-05", "2024-01-08"
    probe = sn.read_table_where(spark, path, {"day": (lo, hi)})
    want = sorted(
        r.k
        for r in sn.read_table(spark, path)
        .filter(F.col("day").between(lo, hi))
        .collect()
    )
    assert sorted(r.k for r in probe.collect()) == want

    entry = sn._read_entry(path, 1)
    total = len(entry["files"])
    touched = _touched_files(probe)
    # 4 of 20 days: the probe must open well under half the files
    assert 0 < len(touched) <= max(1, total // 2)

    # range + equality compose (day window ∩ single metric)
    both = sn.read_table_where(spark, path, {"day": (lo, hi), "metric": 3})
    wantb = sorted(
        r.k
        for r in sn.read_table(spark, path)
        .filter(F.col("day").between(lo, hi) & (F.col("metric") == 3))
        .collect()
    )
    assert sorted(r.k for r in both.collect()) == wantb

    # key-range probes use the log's key min/max the same way
    kr = sn.read_table_where(spark, path, {"k": (100, 140)})
    assert sorted(r.k for r in kr.collect()) == list(range(100, 141))

    # malformed range refused
    import pytest as _pt

    with _pt.raises(ValueError):
        sn.read_table_where(spark, path, {"day": (lo, hi, "x")}).collect()
