"""Data-quality validation (operators/validate.py): crafted-violation
correctness, NULL semantics, the one-scan plan contract, and the approx
unique path."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hadoop_prototype_spark.operators import validate


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "O", 10.0, 100),
        (2, "F", -5.0, 100),  # negative price
        (2, "X", 20.0, None),  # dup id, bad status, null fk
        (None, "P", 30.0, 999),  # null id, orphan fk
    ]
    return spark.createDataFrame(
        rows, "id bigint, status string, price double, fk bigint"
    )


@pytest.fixture(scope="module")
def parent(spark):
    return spark.createDataFrame([(100,), (200,)], "pk bigint")


def _by_check(report):
    return {(r.check_name, r.col_name): r for r in report.collect()}


def test_violation_counts_and_null_semantics(frame, parent):
    rep = _by_check(
        validate.validation_report(
            frame,
            [
                ("not_null", "id"),
                ("unique", "id"),
                ("non_negative", "price"),
                ("accepted_values", "status", ("O", "F", "P")),
                ("value_range", "price", 0.0, 25.0),
            ],
            refs=[("fk", parent, "pk")],
        )
    )
    assert rep[("not_null", "id")].violations == 1
    # unique ignores NULL ids (SQL count semantics): one duplicated non-null
    assert rep[("unique", "id")].violations == 1
    assert rep[("non_negative", "price")].violations == 1
    assert rep[("accepted_values", "status")].violations == 1
    # value_range: -5 below, 30 above → 2 (no NULL prices here)
    assert rep[("value_range", "price")].violations == 2
    # fk: NULL passes (SQL FK semantics); 999 is the one orphan
    assert rep[("ref_integrity", "fk")].violations == 1
    assert all(not r.passed for r in rep.values())


def test_clean_table_passes_everything(spark, parent):
    clean = spark.createDataFrame(
        [(1, "O", 1.0, 100), (2, "F", 2.0, 200)],
        "id bigint, status string, price double, fk bigint",
    )
    rep = validate.validation_report(
        clean,
        [("not_null", "id"), ("unique", "id"), ("non_negative", "price")],
        refs=[("fk", parent, "pk")],
    )
    assert all(r.passed and r.violations == 0 for r in rep.collect())


def test_constraints_are_one_scan(spark, sf_dir):
    from hadoop_prototype_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    rep = validate.check_constraints(
        orders,
        [
            ("not_null", "o_orderkey"),
            ("unique", "o_orderkey"),
            ("non_negative", "o_totalprice"),
            ("accepted_values", "o_orderstatus", ("O", "F", "P")),
        ],
    )
    rep.collect()
    plan = (
        rep._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("FileScan parquet") == 1  # N constraints, ONE scan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_approx_unique_matches_exact_verdict_and_drops_expand(spark, sf_dir):
    from hadoop_prototype_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    checks = [("unique", "o_orderkey"), ("not_null", "o_orderkey")]
    exact = validate.check_constraints(orders, checks)
    approx = validate.check_constraints(orders, checks, approx=True)
    exact.collect()
    # exact distinct pays a key-partitioned pre-shuffle of the whole column
    assert "hashpartitioning(o_orderkey" in (
        exact._jdf.queryExecution().executedPlan().toString()
    )
    approx.collect()
    # approx keeps the scalar-aggregate shape: only the 1-row merge exchange
    assert "hashpartitioning" not in (
        approx._jdf.queryExecution().executedPlan().toString()
    )
    # the fixture's orderkey IS unique: both paths must agree on passed
    # (approx subtracts its 2·rsd noise margin, so HLL error cannot fail it)
    e = {(r.check_name, r.col_name): r.passed for r in exact.collect()}
    a = {(r.check_name, r.col_name): r.passed for r in approx.collect()}
    assert e == a

    # gross duplication (50% dups) must still fail the approx gate
    dups = spark.range(10_000).selectExpr("id % 5000 AS k")
    bad = validate.check_constraints(dups, [("unique", "k")], approx=True)
    assert not bad.collect()[0].passed


def test_accepted_values_escapes_quotes(spark):
    """Check values come from user JSON; a value containing a single quote
    (O'Brien) must neither break the generated SQL nor inject into it
    (round-9 advice)."""
    df = spark.createDataFrame(
        [("O'Brien",), ("Smith",), ("D'Arcy; DROP",)], "name string"
    )
    rep = validate.check_constraints(
        df, [("accepted_values", "name", ("O'Brien", "Smith"))]
    ).collect()
    assert rep[0].violations == 1  # only the injection-looking stranger
    # and the DuckDB oracle twin stays runnable with the same values
    import duckdb

    sql = validate.constraints_oracle_sql(
        "t", [("accepted_values", "name", ("O'Brien", "Smith"))]
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES ('O''Brien'), ('Smith'), ('D''Arcy; DROP')) v(name)")
    assert con.execute(sql).fetchall()[0][2] == 1


def test_unknown_column_raises_before_running(spark):
    df = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(ValueError, match="unknown column"):
        validate.check_constraints(df, [("not_null", "nope")])


def test_profile_mean_nulls_out_beyond_fixed_point_range(spark):
    """|x| > 9.2e12 cannot be fixed-point-cast exactly in int64; the mean
    must be reported NULL in BOTH engines instead of an engine-divergent
    saturated value (round-9 advice), while in-range columns are exact."""
    import duckdb

    df = spark.createDataFrame(
        [(1.5, 1.0e13), (2.5, 2.0), (None, 3.0)], "a double, b double"
    )
    rows = {r.col_name: r for r in validate.profile_numeric(df, ["a", "b"]).collect()}
    assert rows["a"].mean == 2.0 and rows["a"].n_non_null == 2
    assert rows["b"].mean is None, "overflow-range column must report NULL mean"
    assert rows["b"].min == 2.0 and rows["b"].max == 1.0e13  # min/max still real

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES (1.5, 1e13), (2.5, 2.0), (NULL, 3.0)) v(a, b)"
    )
    got = {
        r[0]: r for r in con.execute(
            validate.profile_numeric_oracle_sql("t", ["a", "b"])
        ).fetchall()
    }
    assert got["a"][6] == 2.0
    assert got["b"][6] is None  # identical NULL verdict, no error raised


def test_profile_strings_counts_and_order(spark):
    df = spark.createDataFrame(
        [("abc", "x"), ("", "x"), (None, "y"), ("zz", None)],
        "a string, b string",
    )
    rows = {r.col_name: r for r in validate.profile_strings(df, ["a", "b"]).collect()}
    a = rows["a"]
    assert (a.n_non_null, a.n_nulls, a.n_empty, a.n_distinct) == (3, 1, 1, 3)
    assert (a.min_len, a.max_len) == (0, 3)
    assert abs(a.mean_len - 5 / 3) < 1e-12
    assert (a.min_value, a.max_value) == ("", "zz")
    b = rows["b"]
    assert (b.n_non_null, b.n_nulls, b.n_distinct) == (3, 1, 2)
    # DuckDB twin agrees including NULL handling
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES ('abc','x'), ('','x'), (NULL,'y'), ('zz',NULL)) v(a,b)"
    )
    got = {r[0]: r for r in con.execute(validate.profile_strings_oracle_sql("t", ["a", "b"])).fetchall()}
    assert got["a"][1:7] == (3, 1, 1, 3, 0, 3)
    assert got["a"][8:10] == ("", "zz")


def test_profile_strings_unknown_column_raises(spark):
    df = spark.createDataFrame([("x",)], "a string")
    with pytest.raises(ValueError, match="unknown column"):
        validate.profile_strings(df, ["nope"])


def test_profile_strings_is_one_scan(spark, sf_dir):
    from hadoop_prototype_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        validate.profile_strings(docs, ["lang", "source"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan") <= 1 or plan.count("Scan parquet") <= 1
