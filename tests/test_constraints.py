"""CHECK constraints on snapshot tables (sources/snapshots.py): a
log-carried constraint map validated against every write's OWN rows
(O(batch) per commit; O(table) only once, at set time), with SQL CHECK
semantics (NULL satisfies, only FALSE violates)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from hadoop_prototype_spark.sources import snapshots as sn


def _table(spark, n=200, parts=4):
    return spark.range(n).repartitionByRange(parts, "id").selectExpr(
        "id AS k", "CAST(id * 10 AS BIGINT) AS v"
    )


def _rows(spark, path):
    return sorted((r.k, r.v) for r in sn.read_table(spark, path).collect())


def test_set_and_enforce_on_append(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")
    r = sn.set_check_constraints(
        spark, path, {"v_nonneg": "v >= 0", "k_bound": "k < 100000"}
    )
    assert r["version"] == 2
    assert set(sn.get_check_constraints(path)) == {"v_nonneg", "k_bound"}

    ok = spark.createDataFrame([(5000, 1)], "k bigint, v bigint")
    assert sn.append_table(spark, path, ok, "k")["version"] == 3

    before = _rows(spark, path)
    bad = spark.createDataFrame([(6000, -1), (6001, 2)], "k bigint, v bigint")
    with pytest.raises(sn.ConstraintViolation) as ei:
        sn.append_table(spark, path, bad, "k")
    assert ei.value.violations == {"v_nonneg": 1}
    # nothing committed, no staging debris left behind
    assert sn.current_version(path) == 3
    assert _rows(spark, path) == before
    assert glob.glob(f"{path}/_snap_staging-*") == []


def test_set_refused_when_existing_data_violates(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(10).selectExpr("id AS k", "CAST(id - 5 AS BIGINT) AS v")
    sn.create_table(df, path, "k")
    with pytest.raises(sn.ConstraintViolation) as ei:
        sn.set_check_constraints(spark, path, {"v_nonneg": "v >= 0"})
    assert ei.value.violations == {"v_nonneg": 5}
    assert sn.current_version(path) == 1
    assert sn.get_check_constraints(path) == {}


def test_merge_validates_rewritten_slice(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")
    sn.set_check_constraints(spark, path, {"v_nonneg": "v >= 0"})
    good = spark.createDataFrame([(3, 33)], "k bigint, v bigint")
    assert sn.merge_into(spark, path, good, "k")["version"] == 3
    bad = spark.createDataFrame([(4, -44)], "k bigint, v bigint")
    before = _rows(spark, path)
    with pytest.raises(sn.ConstraintViolation):
        sn.merge_into(spark, path, bad, "k")
    assert sn.current_version(path) == 3
    assert _rows(spark, path) == before
    assert glob.glob(f"{path}/_snap_staging-*") == []


def test_null_satisfies_check(spark, tmp_path):
    """SQL CHECK semantics: a NULL predicate result is NOT a violation."""
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=20), path, "k")
    sn.add_columns(spark, path, [("note", "string")])
    # existing rows read note as NULL — the set-time scan must pass
    sn.set_check_constraints(spark, path, {"short_note": "length(note) < 8"})
    ok = spark.createDataFrame(
        [(100, 1, None), (101, 2, "hi")], "k bigint, v bigint, note string"
    )
    sn.append_table(spark, path, ok, "k")
    bad = spark.createDataFrame(
        [(102, 3, "waaaaaay too long")], "k bigint, v bigint, note string"
    )
    with pytest.raises(sn.ConstraintViolation) as ei:
        sn.append_table(spark, path, bad, "k")
    assert ei.value.violations == {"short_note": 1}


def test_constraints_carry_drop_and_restore(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")
    sn.set_check_constraints(spark, path, {"v_nonneg": "v >= 0"})  # v2
    for i in range(3):  # v3..v5: the map must ride every delta entry
        sn.merge_into(
            spark, path,
            spark.createDataFrame([(1000 + i, i)], "k bigint, v bigint"), "k",
        )
    bad = spark.createDataFrame([(2000, -1)], "k bigint, v bigint")
    with pytest.raises(sn.ConstraintViolation):
        sn.append_table(spark, path, bad, "k")

    r = sn.drop_check_constraint(path, "v_nonneg")  # v6
    assert sn.get_check_constraints(path) == {}
    sn.append_table(spark, path, bad, "k")  # now allowed (v7)

    with pytest.raises(KeyError):
        sn.drop_check_constraint(path, "nope")

    # restore to a constrained version rolls the constraint map back too
    sn.restore_table(path, 5)  # v8, files+constraints of v5
    assert set(sn.get_check_constraints(path)) == {"v_nonneg"}
    with pytest.raises(sn.ConstraintViolation):
        sn.append_table(spark, path, bad, "k")
    assert r["version"] == 6


def test_constraints_survive_vacuum_checkpoint_rewrite(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=100), path, "k")
    sn.set_check_constraints(spark, path, {"v_nonneg": "v >= 0"})
    for i in range(5):
        sn.merge_into(
            spark, path,
            spark.createDataFrame([(3000 + i, i)], "k bigint, v bigint"), "k",
        )
    sn.vacuum(path, keep_last=2, retention_seconds=0.0)
    assert set(sn.get_check_constraints(path)) == {"v_nonneg"}
    with pytest.raises(sn.ConstraintViolation):
        sn.append_table(
            spark, path,
            spark.createDataFrame([(4000, -1)], "k bigint, v bigint"), "k",
        )


def test_commit_staged_validates(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=50), path, "k")
    sn.set_check_constraints(spark, path, {"v_nonneg": "v >= 0"})
    staging = str(tmp_path / "staged")
    spark.createDataFrame(
        [(100, 1), (101, -2)], "k bigint, v bigint"
    ).coalesce(1).write.mode("overwrite").parquet(staging)
    files = sorted(glob.glob(f"{staging}/*.parquet"))
    with pytest.raises(sn.ConstraintViolation):
        sn.commit_staged(path, files, "k")
    assert sn.current_version(path) == 2
    # no version-prefixed debris linked into the table dir
    assert glob.glob(f"{path}/v3-*") == []
    # fixing the data lets the same staged path commit
    spark.createDataFrame(
        [(100, 1), (101, 2)], "k bigint, v bigint"
    ).coalesce(1).write.mode("overwrite").parquet(staging)
    files = sorted(glob.glob(f"{staging}/*.parquet"))
    assert sn.commit_staged(path, files, "k")["version"] == 3


def test_occ_race_constraint_set_vs_violating_append(spark, tmp_path):
    """Concurrent ADD CONSTRAINT vs violating append under optimistic
    concurrency: whichever commit wins the version race, the invariant
    holds — a table whose CURRENT version carries the constraint
    contains no violating rows. Either the append landed first (then
    set_check_constraints' table scan sees the bad rows and refuses) or
    the constraint landed first (then the append's retry re-reads the
    base, finds the new map, and its batch validation refuses)."""
    from concurrent.futures import ThreadPoolExecutor

    for trial in range(4):
        path = str(tmp_path / f"t{trial}")
        sn.create_table(_table(spark, n=50), path, "k")
        bad = spark.createDataFrame(
            [(900 + trial, -1)], "k bigint, v bigint"
        )

        def do_set():
            try:
                return ("set_ok", sn.set_check_constraints(
                    spark, path, {"v_nonneg": "v >= 0"}
                ))
            except (sn.ConstraintViolation, sn.ConflictError) as e:
                return ("set_fail", type(e).__name__)

        def do_append():
            try:
                return ("app_ok", sn.append_table_retrying(
                    spark, path, bad, "k"
                ))
            except (sn.ConstraintViolation, sn.ConflictError) as e:
                return ("app_fail", type(e).__name__)

        with ThreadPoolExecutor(max_workers=2) as pool:
            f1 = pool.submit(do_set)
            f2 = pool.submit(do_append)
            rset, rapp = f1.result(), f2.result()

        has_constraint = "v_nonneg" in sn.get_check_constraints(path)
        n_bad = (
            sn.read_table(spark, path).filter(F.col("v") < 0).count()
        )
        if has_constraint:
            # constraint present => no violating rows ever landed
            assert n_bad == 0, (trial, rset, rapp)
        else:
            # set refused => the append must have landed its rows first
            assert rset[0] == "set_fail" and n_bad == 1, (trial, rset, rapp)
        # exactly one of the two writes can have fully succeeded
        assert not (rset[0] == "set_ok" and rapp[0] == "app_ok"), (rset, rapp)
