"""The round-8 operational loop, end to end: a batch must pass the
one-scan validation gate before it may commit to the snapshot table;
committed changes flow through the CDC feed into a materialized rollup
that never rescans the table; a failing batch changes NOTHING (no new
version, view untouched). Each component is pinned in its own test file
(test_validate / test_snapshots); this test pins the composition."""

from __future__ import annotations

from hadoop_prototype_spark.operators import incremental as inc
from hadoop_prototype_spark.operators import validate as v
from hadoop_prototype_spark.sources import snapshots as sn

CHECKS = [("not_null", "k"), ("unique", "k"), ("non_negative", "v")]
SPEC = {"total_v": ("sum", "v"), "n": ("count", "v")}


def _publish(spark, path, batch, key="k"):
    """validate → merge → CDC-refresh; returns (committed, view_delta_fn)."""
    report = v.check_constraints(batch, CHECKS).collect()
    if not all(r.passed for r in report):
        return False, [r.asDict() for r in report]
    before = sn.current_version(path)
    sn.merge_into(spark, path, batch, key)
    return True, sn.table_changes(spark, path, before, before + 1)


def test_publish_gate_commits_good_batches_and_blocks_bad_ones(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.range(100).selectExpr(
        "id AS k", "CAST(id % 5 AS BIGINT) AS grp", "CAST(id AS BIGINT) AS v"
    )
    sn.create_table(base, path, "k")
    view = inc.summarize(sn.read_table(spark, path), ["grp"], SPEC)

    # good batch: one update (k=3 → v=300), one insert (k=200)
    good = spark.createDataFrame(
        [(3, 3, 300), (200, 0, 7)], "k bigint, grp bigint, v bigint"
    )
    ok, changes = _publish(spark, path, good)
    assert ok and sn.current_version(path) == 2
    view = inc.refresh_from_changes(view, changes, ["grp"], SPEC)
    expected = inc.summarize(sn.read_table(spark, path), ["grp"], SPEC)
    assert sorted(
        (r.grp, r.total_v, r.n) for r in view.filter("n > 0").collect()
    ) == sorted((r.grp, r.total_v, r.n) for r in expected.collect())

    # bad batch: duplicate key AND a negative value → gate refuses,
    # table version and view are untouched
    bad = spark.createDataFrame(
        [(9, 4, -5), (9, 4, 1)], "k bigint, grp bigint, v bigint"
    )
    ok, report = _publish(spark, path, bad)
    assert not ok
    assert {r["check_name"] for r in report if not r["passed"]} == {
        "unique",
        "non_negative",
    }
    assert sn.current_version(path) == 2  # nothing committed
    # the view still matches the (unchanged) table
    expected = inc.summarize(sn.read_table(spark, path), ["grp"], SPEC)
    assert sorted(
        (r.grp, r.total_v, r.n) for r in view.filter("n > 0").collect()
    ) == sorted((r.grp, r.total_v, r.n) for r in expected.collect())


def test_gate_blocks_referential_orphans_too(spark, tmp_path):
    path = str(tmp_path / "t")
    parent = spark.createDataFrame([(0,), (1,)], "grp bigint")
    sn.create_table(
        spark.range(10).selectExpr("id AS k", "CAST(id % 2 AS BIGINT) AS grp",
                                   "CAST(id AS BIGINT) AS v"),
        path,
        "k",
    )
    batch = spark.createDataFrame([(50, 9, 1)], "k bigint, grp bigint, v bigint")
    rep = v.validation_report(batch, CHECKS, refs=[("grp", parent, "grp")]).collect()
    assert not all(r.passed for r in rep)  # grp=9 has no parent
    orphan_row = [r for r in rep if r.check_name == "ref_integrity"][0]
    assert orphan_row.violations == 1
