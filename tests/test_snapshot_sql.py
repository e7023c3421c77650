"""SQL verb surface (sources/snapshot_sql.py): every statement form
routes to the same Python verb with identical results — pinned
verb-for-verb against the API — plus time-travel SELECT rewriting,
catalog/path resolution, and loud refusal of out-of-grammar text."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_prototype_spark.sources import snapshot_sql as ss
from hadoop_prototype_spark.sources import snapshots as sn


def _table(spark, n=400, parts=4):
    return spark.range(n).repartitionByRange(parts, "id").selectExpr(
        "id AS k", "CAST(id * 10 AS BIGINT) AS v", "CAST(id % 5 AS INT) AS g"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def pair(spark, tmp_path):
    """Two identical tables: one driven by SQL, one by the API."""
    a, b = str(tmp_path / "sql_t"), str(tmp_path / "api_t")
    df = _table(spark)
    sn.create_table(df, a, "k")
    sn.create_table(df, b, "k")
    return a, b


def test_create_insert_select_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark).createOrReplaceTempView("src_rows")
    rep = ss.snapshot_sql(
        spark,
        "CREATE TABLE t KEY k AS SELECT k, v, g FROM src_rows WHERE k < 100",
        tables={"t": path},
    )
    assert rep["version"] == 1
    got = ss.snapshot_sql(spark, "SELECT k, v FROM t WHERE g = 2",
                          tables={"t": path})
    want = sn.read_table(spark, path).filter("g = 2").select("k", "v")
    assert _rows(got) == _rows(want)

    rep = ss.snapshot_sql(
        spark,
        "INSERT INTO t SELECT k + 1000 AS k, v, g FROM src_rows WHERE k < 10",
        tables={"t": path},
    )
    assert rep["rows_after"] == 110
    # quoted-path reference works without a catalog
    got = ss.snapshot_sql(spark, f"SELECT count(*) AS n FROM '{path}'")
    assert got.collect()[0].n == 110


def test_merge_sql_equals_api(spark, pair):
    sql_t, api_t = pair
    upd = _table(spark).filter("k % 3 = 0").withColumn(
        "v", F.col("v") + F.lit(7)
    )
    upd.createOrReplaceTempView("upd_rows")
    rep = ss.snapshot_sql(
        spark,
        "MERGE INTO t AS tgt USING upd_rows AS s ON tgt.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        tables={"t": sql_t},
    )
    api = sn.merge_into(spark, api_t, upd, "k")
    assert rep["version"] == api["version"] == 2
    assert _rows(sn.read_table(spark, sql_t)) == _rows(
        sn.read_table(spark, api_t)
    )


def test_merge_subselect_insert_only_and_update_only(spark, pair):
    sql_t, api_t = pair
    # insert-only: existing keys must NOT be touched
    ss.snapshot_sql(
        spark,
        f"MERGE INTO '{sql_t}' USING (SELECT k + 500 AS k, v, g "
        f"FROM '{api_t}' WHERE k < 20) s ON k = k "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    got = {r.k: r.v for r in sn.read_table(spark, sql_t).collect()}
    assert got[500] == 0 and got[0] == 0 and len(got) == 420
    # update-only: new keys must NOT appear
    ss.snapshot_sql(
        spark,
        f"MERGE INTO '{sql_t}' USING (SELECT k, v + 1 AS v, g FROM "
        f"'{api_t}' WHERE k >= 395) s ON k = k "
        "WHEN MATCHED THEN UPDATE SET *",
    )
    got2 = {r.k: r.v for r in sn.read_table(spark, sql_t).collect()}
    assert got2[399] == 3991 and len(got2) == 420


def test_merge_with_schema_evolution(spark, pair):
    sql_t, api_t = pair
    upd = (
        _table(spark)
        .filter("k % 9 = 4")
        .withColumn("flag", F.lit("X"))
    )
    upd.createOrReplaceTempView("evo_rows")
    ss.snapshot_sql(
        spark,
        "MERGE WITH SCHEMA EVOLUTION INTO t USING evo_rows s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        tables={"t": sql_t},
    )
    sn.merge_into(spark, api_t, upd, "k", merge_schema=True)
    assert _rows(sn.read_table(spark, sql_t)) == _rows(
        sn.read_table(spark, api_t)
    )


def test_update_delete_sql_equals_api(spark, pair):
    sql_t, api_t = pair
    ss.snapshot_sql(
        spark,
        "UPDATE t SET v = v * 2 + g WHERE k % 4 = 1",
        tables={"t": sql_t},
    )
    cur = sn.read_table(spark, api_t)
    upd = cur.filter("k % 4 = 1").selectExpr("k", "(v * 2 + g) AS v", "g")
    sn.merge_into(spark, api_t, upd, "k")
    assert _rows(sn.read_table(spark, sql_t)) == _rows(
        sn.read_table(spark, api_t)
    )

    rep = ss.snapshot_sql(
        spark, "DELETE FROM t WHERE v > 3000", tables={"t": sql_t}
    )
    assert rep["rows_deleted"] > 0 and rep["dv_files_added"] >= 1  # MoR
    sn.delete_from_mor(
        spark, api_t, sn.read_table(spark, api_t).filter("v > 3000").select("k"), "k"
    )
    assert _rows(sn.read_table(spark, sql_t)) == _rows(
        sn.read_table(spark, api_t)
    )


def test_alter_family_and_describe(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")
    t = {"t": path}
    ss.snapshot_sql(spark, "ALTER TABLE t RENAME COLUMN v TO amount", tables=t)
    ss.snapshot_sql(spark, "ALTER TABLE t ADD COLUMN note string", tables=t)
    ss.snapshot_sql(spark, "ALTER TABLE t ADD COLUMNS (x int, y double)", tables=t)
    ss.snapshot_sql(spark, "ALTER TABLE t ALTER COLUMN x TYPE bigint", tables=t)
    ss.snapshot_sql(
        spark, "ALTER TABLE t ADD CONSTRAINT pos CHECK (amount >= 0)", tables=t
    )
    d = ss.snapshot_sql(spark, "DESCRIBE DETAIL t", tables=t)
    assert d["columns"] == ["k", "amount", "g", "note", "x", "y"]
    assert d["constraints"] == {"pos": "amount >= 0"}
    ss.snapshot_sql(spark, "ALTER TABLE t DROP CONSTRAINT pos", tables=t)
    ss.snapshot_sql(spark, "ALTER TABLE t DROP COLUMN note", tables=t)
    ss.snapshot_sql(spark, "ALTER TABLE t SET PARTITION SPEC (g)", tables=t)
    assert sn.partition_spec(path) == ["g"]
    ss.snapshot_sql(spark, "ALTER TABLE t DROP PARTITION SPEC", tables=t)
    assert sn.partition_spec(path) == []
    hist = ss.snapshot_sql(spark, "DESCRIBE HISTORY t", tables=t)
    assert [h["version"] for h in hist] == list(range(1, 11))
    assert dict(sn.read_table(spark, path).dtypes)["x"] == "bigint"


def test_optimize_vacuum_restore_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "t")
    t = {"t": path}
    sn.create_table(_table(spark, n=100), path, "k")          # v1
    for i in range(3):  # small-file tail
        sn.append_table(
            spark,
            path,
            spark.range(1000 + i * 10, 1010 + i * 10).selectExpr(
                "id AS k", "CAST(id * 10 AS BIGINT) AS v",
                "CAST(id % 5 AS INT) AS g"
            ),
            "k",
        )                                                      # v2..v4
    rep = ss.snapshot_sql(spark, "OPTIMIZE t", tables=t)
    assert rep["files_rewritten"] >= 2                          # v5
    want_v4 = _rows(sn.read_table(spark, path, version=4))
    got_v4 = ss.snapshot_sql(
        spark, "SELECT * FROM t VERSION AS OF 4", tables=t
    )
    assert _rows(got_v4) == want_v4

    rep = ss.snapshot_sql(spark, "RESTORE TABLE t TO VERSION AS OF 2", tables=t)
    assert rep["restored_to"] == 2                              # v6
    rep = ss.snapshot_sql(
        spark, "VACUUM t RETAIN 0 HOURS KEEP LAST 1", tables=t
    )
    assert rep["versions_kept"] if "versions_kept" in rep else True
    # vacuumed history is gone, current read still exact
    assert len(_rows(sn.read_table(spark, path))) == 110

    # ZORDER form parses and commits
    rep = ss.snapshot_sql(spark, "OPTIMIZE t ZORDER BY (v, g)", tables=t)
    assert rep["files_rewritten"] >= 1


def test_optimize_where_forms(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(
        _table(spark, n=2000), path, "k", partition_by=["g"], partition_files=10
    )
    rep = ss.snapshot_sql(
        spark, "OPTIMIZE t WHERE g = 2", tables={"t": path}
    )
    assert rep["version"] in (1, 2)  # no-op allowed when nothing small
    rep = ss.snapshot_sql(
        spark, "OPTIMIZE t WHERE k BETWEEN 0 AND 50 AND g = 1",
        tables={"t": path},
    )
    assert "files_total" in rep


def test_out_of_grammar_statements_fail_loud(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")
    t = {"t": path}
    bad = [
        "TRUNCATE TABLE t",
        "DELETE FROM t",  # unqualified
        "MERGE INTO t USING t2 ON t.k = t2.g WHEN MATCHED THEN UPDATE SET *",
        # conditioned clauses are out of grammar (unconditional-only verbs)
        "MERGE INTO t USING t ON t.k = t.k "
        "WHEN MATCHED AND v > 0 THEN UPDATE SET *",
        "UPDATE t SET k = 1",            # key update
        "UPDATE t SET nope = 1",         # unknown column
        "ALTER TABLE t FROB COLUMN v",
        "OPTIMIZE t WHERE v LIKE 'x%'",
    ]
    for stmt in bad:
        with pytest.raises(ss.SqlSurfaceError):
            ss.snapshot_sql(spark, stmt, tables=t)
    # unknown names in SELECT fall through to Spark's own resolver error
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        ss.snapshot_sql(spark, "SELECT * FROM unknown_name", tables=t)
    # constraint violations propagate from the verb, not swallowed
    ss.snapshot_sql(spark, "ALTER TABLE t ADD CONSTRAINT pos CHECK (v >= 0)",
                    tables=t)
    with pytest.raises(sn.ConstraintViolation):
        ss.snapshot_sql(spark, "UPDATE t SET v = -1 WHERE k = 3", tables=t)


def test_timestamp_as_of_select(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=50), path, "k")             # v1
    ss.snapshot_sql(spark, "UPDATE t SET v = v + 1 WHERE k < 10",
                    tables={"t": path})                          # v2
    ss.snapshot_sql(spark, "DELETE FROM t WHERE k >= 40",
                    tables={"t": path})                          # v3
    ts2 = sn._read_raw(path, 2)["ts"]  # v2's commit wall time
    got = ss.snapshot_sql(
        spark,
        f"SELECT count(*) AS n, sum(v) AS s FROM t TIMESTAMP AS OF {ts2!r}",
        tables={"t": path},
    ).collect()[0]
    want = sn.read_table(spark, path, version=2).agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    ).collect()[0]
    assert (got.n, got.s) == (want.n, want.s) and got.n == 50


def test_insert_overwrite_tags_and_scripts(spark, tmp_path):
    """Round-13 second batch: versioned INSERT OVERWRITE (old rows stay
    time-travel-readable), Iceberg-style tag verbs under ALTER TABLE,
    tag-name VERSION AS OF, SHOW TAGS, and the ';'-script runner."""
    path = str(tmp_path / "t")
    t = {"t": path}
    _table(spark, n=60).createOrReplaceTempView("ovw_rows")
    results = ss.snapshot_sql_script(
        spark,
        """
        CREATE TABLE t KEY k AS SELECT * FROM ovw_rows WHERE k < 40;
        ALTER TABLE t CREATE TAG genesis;
        INSERT OVERWRITE t SELECT k, v + 1 AS v, g FROM ovw_rows
            WHERE k BETWEEN 10 AND 19;
        ALTER TABLE t CREATE TAG small AS OF VERSION 2
        """,
        tables=t,
    )
    assert results[0]["version"] == 1
    assert results[2]["files_removed"] >= 1 and results[2]["rows_after"] == 10

    # current = only the overwrite slice
    cur = {r.k: r.v for r in sn.read_table(spark, path).collect()}
    assert len(cur) == 10 and cur[10] == 101

    # the tag pins v1; VERSION AS OF accepts the tag NAME
    got = ss.snapshot_sql(
        spark, "SELECT count(*) AS n FROM t VERSION AS OF 'genesis'", tables=t
    ).collect()[0]
    assert got.n == 40

    tags = ss.snapshot_sql(spark, "SHOW TAGS t", tables=t)
    assert {tg["name"]: tg["version"] for tg in tags} == {
        "genesis": 1, "small": 2
    }
    ss.snapshot_sql(spark, "ALTER TABLE t DROP TAG small", tables=t)
    assert [tg["name"] for tg in ss.snapshot_sql(spark, "SHOW TAGS t",
                                                 tables=t)] == ["genesis"]

    # overwrite respects CHECK constraints like every write
    ss.snapshot_sql(spark, "ALTER TABLE t ADD CONSTRAINT pos CHECK (v >= 0)",
                    tables=t)
    with pytest.raises(sn.ConstraintViolation):
        ss.snapshot_sql(
            spark,
            "INSERT OVERWRITE t SELECT k, -1 AS v, g FROM ovw_rows",
            tables=t,
        )
    # nothing committed by the rejected overwrite
    assert len(sn.read_table(spark, path).collect()) == 10


def test_shallow_clone_and_restore_forms(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    t = {"src": src, "dst": dst}
    sn.create_table(_table(spark, n=30), src, "k")             # v1
    ss.snapshot_sql(spark, "ALTER TABLE src CREATE TAG base", tables=t)
    ss.snapshot_sql(spark, "UPDATE src SET v = v + 1 WHERE k < 5", tables=t)

    rep = ss.snapshot_sql(
        spark, "CREATE TABLE dst SHALLOW CLONE src VERSION AS OF 'base'",
        tables=t,
    )
    assert rep.get("bytes_copied", 0) == 0 or rep  # zero-copy clone report
    got = {r.k: r.v for r in sn.read_table(spark, dst).collect()}
    assert got[0] == 0 and len(got) == 30  # pre-update state

    # diverge the clone, then restore the SOURCE by tag name
    ss.snapshot_sql(spark, "DELETE FROM dst WHERE k >= 20", tables=t)
    assert len(sn.read_table(spark, dst).collect()) == 20
    rep = ss.snapshot_sql(
        spark, "RESTORE TABLE src TO VERSION AS OF 'base'", tables=t
    )
    assert rep["restored_to"] == 1
    assert {r.k: r.v for r in sn.read_table(spark, src).collect()}[0] == 0

    # restore-to-timestamp form parses and routes
    ts2 = sn._read_raw(src, 2)["ts"]
    rep = ss.snapshot_sql(
        spark, f"RESTORE TABLE src TO TIMESTAMP AS OF {ts2!r}", tables=t
    )
    assert rep["restored_to"] == 2


def test_merge_delete_clauses(spark, tmp_path):
    """WHEN MATCHED THEN DELETE (alone -> MoR delete of the source's
    keys) and WHEN NOT MATCHED BY SOURCE THEN DELETE (full sync as ONE
    atomic overwrite commit — the table becomes a pure function of
    (table, source))."""
    path = str(tmp_path / "t")
    t = {"t": path}
    sn.create_table(_table(spark, n=50), path, "k")            # v1
    _table(spark, n=50).filter("k % 5 = 0").createOrReplaceTempView("del_keys")

    rep = ss.snapshot_sql(
        spark,
        "MERGE INTO t USING del_keys s ON t.k = s.k "
        "WHEN MATCHED THEN DELETE",
        tables=t,
    )
    assert rep["rows_deleted"] == 10 and rep["dv_files_added"] >= 1
    assert sn.read_table(spark, path).count() == 40             # v2

    # full sync: table must become exactly the source, in ONE commit
    spark.range(30, 70).selectExpr(
        "id AS k", "CAST(id AS BIGINT) AS v", "CAST(1 AS INT) AS g"
    ).createOrReplaceTempView("sync_src")
    rep = ss.snapshot_sql(
        spark,
        "MERGE INTO t USING sync_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
        tables=t,
    )
    assert rep["version"] == 3                                  # ONE commit
    got = _rows(sn.read_table(spark, path))
    want = _rows(spark.table("sync_src"))
    assert got == want

    # update+delete-by-source (no insert): src∩cur from src, cur-only dies
    spark.range(60, 80).selectExpr(
        "id AS k", "CAST(0 AS BIGINT) AS v", "CAST(2 AS INT) AS g"
    ).createOrReplaceTempView("sync_src2")
    ss.snapshot_sql(
        spark,
        "MERGE INTO t USING sync_src2 s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
        tables=t,
    )
    got = {r.k: r.v for r in sn.read_table(spark, path).collect()}
    assert sorted(got) == list(range(60, 70))  # 60..69 matched, rest died
    assert all(v == 0 for v in got.values())

    # keep-matched + delete-by-source (no update): cur values survive
    sn.create_table(_table(spark, n=20), str(tmp_path / "u"), "k")
    ss.snapshot_sql(
        spark,
        "MERGE INTO u USING (SELECT k, v, g FROM u WHERE k < 8) s "
        "ON u.k = s.k WHEN NOT MATCHED BY SOURCE THEN DELETE",
        tables={"u": str(tmp_path / "u")},
    )
    left = {r.k: r.v for r in sn.read_table(spark, str(tmp_path / "u")).collect()}
    assert sorted(left) == list(range(8)) and left[3] == 30

    # matched-delete composed with other clauses (refused until r13) now
    # routes through the general path: ONE commit that deletes the
    # matched keys and inserts the unmatched source rows
    v_before = sn.current_version(path)
    ss.snapshot_sql(
        spark,
        "MERGE INTO t USING sync_src2 s ON t.k = s.k "
        "WHEN MATCHED THEN DELETE WHEN NOT MATCHED THEN INSERT *",
        tables=t,
    )
    assert sn.current_version(path) == v_before + 1  # atomic: one commit
    got = {r.k: r.v for r in sn.read_table(spark, path).collect()}
    # table was 60..69 (matched ⊂ src 60..79): those die; 70..79 insert
    assert sorted(got) == list(range(70, 80))
    assert all(v == 0 for v in got.values())


def test_table_changes_and_scd2_tvfs(spark, tmp_path):
    """TABLE_CHANGES(t, from[, to]) and SCD2_HISTORY(t) rewrite as
    table-valued functions inside SELECTs (the Delta CDF TVF form) and
    agree with the Python verbs."""
    path = str(tmp_path / "t")
    t = {"t": path}
    sn.create_table(_table(spark, n=40), path, "k")            # v1
    ss.snapshot_sql(spark, "UPDATE t SET v = v + 1 WHERE k % 4 = 0",
                    tables=t)                                   # v2
    ss.snapshot_sql(spark, "DELETE FROM t WHERE k >= 30", tables=t)  # v3

    got = ss.snapshot_sql(
        spark,
        "SELECT _change, count(*) AS n FROM TABLE_CHANGES(t, 1, 3) "
        "GROUP BY _change ORDER BY _change",
        tables=t,
    ).collect()
    want = {
        r["_change"]: r["n"]
        for r in sn.table_changes(spark, path, 1, 3)
        .groupBy("_change").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert {r._change: r.n for r in got} == want and want["delete"] == 10

    got2 = ss.snapshot_sql(
        spark,
        "SELECT count(*) AS n FROM SCD2_HISTORY(t) WHERE valid_to IS NULL",
        tables=t,
    ).collect()[0]
    assert got2.n == 30  # open intervals = live rows

    # describe carries typed schema once the log pins one
    ss.snapshot_sql(spark, "ALTER TABLE t ALTER COLUMN g TYPE bigint",
                    tables=t)
    d = ss.snapshot_sql(spark, "DESCRIBE DETAIL t", tables=t)
    assert d["schema"] == ["k bigint", "v bigint", "g bigint"]


def test_rewriter_scope_discipline(spark, tmp_path):
    """The round-13 rewriter bug class: a catalog table name colliding
    with a string literal, a column name, or a CTE name must never be
    rewritten — only table-position references are. Each case must be
    byte-identical to running the same statement with no name collision."""
    path = str(tmp_path / "sales")
    df = spark.createDataFrame(
        [(1, "see sales table", 5), (2, "other", 7)],
        "k int, note string, sales int",
    )
    sn.create_table(df, path, "k")
    t = {"sales": path}

    # (a) the table name inside a data literal stays data
    got = ss.snapshot_sql(
        spark, "SELECT k FROM sales WHERE note = 'see sales table'", tables=t
    ).collect()
    assert [r.k for r in got] == [1]

    # (b) a COLUMN named like the table resolves as the column
    got = ss.snapshot_sql(
        spark, "SELECT sales FROM sales ORDER BY k", tables=t
    ).collect()
    assert [r.sales for r in got] == [5, 7]

    # (c) a quoted-path literal used as DATA is untouched
    got = ss.snapshot_sql(
        spark, f"SELECT count(*) AS n FROM sales WHERE note != '{path}'",
        tables=t,
    ).collect()
    assert got[0].n == 2

    # CTE names shadow the catalog (silent-wrong-table case from r13)
    got = ss.snapshot_sql(
        spark, "WITH sales AS (SELECT 99 AS k) SELECT k FROM sales", tables=t
    ).collect()
    assert [r.k for r in got] == [99]

    # qualified refs resolve: every occurrence shares ONE cached view
    got = ss.snapshot_sql(
        spark,
        "SELECT sales.k FROM sales WHERE sales.k > 1 ORDER BY sales.k",
        tables=t,
    ).collect()
    assert [r.k for r in got] == [2]

    # self-join with explicit aliases
    got = ss.snapshot_sql(
        spark,
        "SELECT a.k FROM sales a JOIN sales b ON a.k = b.k ORDER BY a.k",
        tables=t,
    ).collect()
    assert [r.k for r in got] == [1, 2]


def test_for_version_as_of_spelling_and_utc_ts(spark, tmp_path):
    """Spark's canonical FOR VERSION/TIMESTAMP AS OF aliases to the Delta
    spelling, and a naive ISO timestamp literal resolves as UTC."""
    import datetime as dt

    path = str(tmp_path / "t")
    sn.create_table(_table(spark, 10), path, "k")                      # v1
    sn.append_table(spark, path,
                    _table(spark, 20).filter("k >= 10"), "k")          # v2
    got = ss.snapshot_sql(
        spark, "SELECT count(*) AS n FROM t FOR VERSION AS OF 1",
        tables={"t": path},
    ).collect()
    assert got[0].n == 10

    # a naive ISO literal means UTC: pin to just after v1's commit time
    v1_ts = sn._read_raw(path, 1)["ts"]
    iso = dt.datetime.fromtimestamp(v1_ts + 0.001, dt.timezone.utc).replace(
        tzinfo=None
    ).isoformat()
    got = ss.snapshot_sql(
        spark, f"SELECT count(*) AS n FROM t FOR TIMESTAMP AS OF '{iso}'",
        tables={"t": path},
    ).collect()
    assert got[0].n == 10


def test_merge_matched_only_reclassifies_after_race(spark, tmp_path, monkeypatch):
    """A MATCHED-only merge that loses the OCC race must re-classify its
    source rows against the WINNER's table state: a key deleted by the
    concurrent winner stays deleted instead of being resurrected."""
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, 10), path, "k")
    spark.createDataFrame([(5, 999, 0)], "k long, v long, g int") \
        .createOrReplaceTempView("race_src")

    real = sn.merge_into
    calls = {"n": 0}

    def racing(spark_, p, upd, key, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            # a concurrent writer deletes key 5 and wins the race
            sn.delete_from_mor_retrying(
                spark_, p, spark_.createDataFrame([(5,)], "k long"), "k"
            )
            raise sn.ConflictError("lost the commit race")
        return real(spark_, p, upd, key, **kw)

    monkeypatch.setattr(sn, "merge_into", racing)
    ss.snapshot_sql(
        spark,
        "MERGE INTO t USING race_src ON t.k = race_src.k "
        "WHEN MATCHED THEN UPDATE SET *",
        tables={"t": path},
    )
    assert calls["n"] == 2  # retried once
    assert sn.read_table(spark, path).filter("k = 5").count() == 0


def test_merge_conditional_clauses(spark, tmp_path):
    """Conditional MERGE clauses + column-level assignments (round-13
    verdict #2): WHEN MATCHED AND <cond> THEN UPDATE SET c = expr,
    first-match ordering across clauses, INSERT (cols) VALUES (exprs),
    and conditional NOT MATCHED BY SOURCE DELETE — each equal to the
    hand-built DataFrame semantics, each ONE commit."""
    path = str(tmp_path / "t")
    t = {"t": path}
    sn.create_table(_table(spark, n=40), path, "k")            # v1
    # source overlaps keys 20..39, brings 40..49
    spark.range(20, 50).selectExpr(
        "id AS k", "CAST(id * 100 AS BIGINT) AS v", "CAST(id % 2 AS INT) AS g"
    ).createOrReplaceTempView("cond_src")

    rep = ss.snapshot_sql(
        spark,
        "MERGE INTO t USING cond_src s ON t.k = s.k "
        "WHEN MATCHED AND s.g = 0 THEN UPDATE SET v = t.v + s.v "
        "WHEN MATCHED AND t.k >= 35 THEN DELETE "
        "WHEN NOT MATCHED AND s.g = 1 THEN INSERT (k, v) VALUES (s.k, s.v + 5)",
        tables=t,
    )
    assert rep["version"] == 2  # updates + deletes + inserts, ONE commit
    got = {r.k: (r.v, r.g) for r in sn.read_table(spark, path).collect()}
    # k<20: untouched
    assert got[3] == (30, 3)
    # matched, s.g=0 (even k): v = old + 100k, g untouched
    assert got[20] == (20 * 10 + 2000, 0)
    assert got[34] == (34 * 10 + 3400, 4)
    # matched, s.g=1 (odd k) and k>=35: second clause fires -> deleted
    assert 35 not in got and 37 not in got and 39 not in got
    # matched, s.g=1, k<35: no clause fires -> untouched
    assert got[21] == (210, 1) and got[33] == (330, 3)
    # even matched >= 35: FIRST clause wins (update, not delete)
    assert got[36] == (36 * 10 + 3600, 1)
    # not matched, odd: inserted with column list, g defaults NULL
    assert got[41] == (4105, None)
    # not matched, even: no insert clause fires -> dropped
    assert 40 not in got and 48 not in got

    # conditional BY SOURCE: only stale rows below 5 die
    rep = ss.snapshot_sql(
        spark,
        "MERGE INTO t USING cond_src s ON t.k = s.k "
        "WHEN NOT MATCHED BY SOURCE AND t.k < 5 THEN DELETE",
        tables=t,
    )
    keys = sorted(r.k for r in sn.read_table(spark, path).collect())
    assert keys[0] == 5  # 0..4 died, 5..19 survived (not matched, k>=5)

    # SQL == API pin: the same conditional update via selectExpr + merge
    api = str(tmp_path / "api")
    sn.create_table(_table(spark, n=40), api, "k")
    cur = sn.read_table(spark, api)
    src = spark.table("cond_src")
    pairs = cur.alias("t").join(src.alias("s"), "k", "inner")
    upd = pairs.filter("s.g = 0").selectExpr(
        "k", "t.v + s.v AS v", "t.g AS g"
    )
    sn.merge_into(spark, api, upd, "k")
    sql_t = str(tmp_path / "sqlapi")
    sn.create_table(_table(spark, n=40), sql_t, "k")
    ss.snapshot_sql(
        spark,
        "MERGE INTO t USING cond_src s ON t.k = s.k "
        "WHEN MATCHED AND s.g = 0 THEN UPDATE SET v = t.v + s.v",
        tables={"t": sql_t},
    )
    assert _rows(sn.read_table(spark, sql_t)) == _rows(
        sn.read_table(spark, api)
    )


def test_merge_conditional_refusals(spark, tmp_path):
    """Out-of-grammar conditional MERGE forms still fail loud."""
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=10), path, "k")
    _table(spark, 5).createOrReplaceTempView("r_src")
    t = {"t": path}
    for stmt in (
        # key assignment refused
        "MERGE INTO t USING r_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET k = s.k + 1",
        # BY SOURCE UPDATE needs explicit assignments, never SET *
        "MERGE INTO t USING r_src s ON t.k = s.k "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *",
        # BY SOURCE cannot INSERT (there is no source row)
        "MERGE INTO t USING r_src s ON t.k = s.k "
        "WHEN NOT MATCHED BY SOURCE THEN INSERT *",
        # NOT MATCHED cannot DELETE
        "MERGE INTO t USING r_src s ON t.k = s.k "
        "WHEN NOT MATCHED THEN DELETE",
        # arity mismatch
        "MERGE INTO t USING r_src s ON t.k = s.k "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k)",
        # schema evolution + conditional refused
        "MERGE WITH SCHEMA EVOLUTION INTO t USING r_src s ON t.k = s.k "
        "WHEN MATCHED AND s.g = 0 THEN UPDATE SET v = s.v",
    ):
        with pytest.raises(ss.SqlSurfaceError):
            ss.snapshot_sql(spark, stmt, tables=t)


def test_script_as_df_uniform_results(spark, tmp_path):
    """as_df=True (round-13 verdict #5): every script statement returns
    a DataFrame — accounting dicts become one-row frames, DESCRIBE
    HISTORY one row per version — so a migration script's output chains
    straight into SQL (here: history filtered by op)."""
    from pyspark.sql import DataFrame

    path = str(tmp_path / "t")
    _table(spark, 30).createOrReplaceTempView("adf_src")
    results = ss.snapshot_sql_script(
        spark,
        "CREATE TABLE t KEY k AS SELECT * FROM adf_src; "
        "UPDATE t SET v = v + 1 WHERE k < 5; "
        "DELETE FROM t WHERE k >= 25; "
        "DESCRIBE HISTORY t; "
        "DESCRIBE DETAIL t; "
        "VACUUM t RETAIN 8760 HOURS DRY RUN; "
        "SHOW TAGS t",
        tables={"t": path},
        as_df=True,
    )
    assert all(isinstance(r, DataFrame) for r in results)
    results[3].createOrReplaceTempView("t_history")
    got = spark.sql(
        "SELECT count(*) AS n, max(version) AS vmax FROM t_history "
        "WHERE op <> 'create'"
    ).collect()[0]
    assert got.n == 2 and got.vmax == 3
    # the one-row DESCRIBE DETAIL frame keeps scalar types queryable
    d = results[4].collect()[0]
    assert d["key_col"] == "k" and int(d["version"]) == 3


def test_merge_residual_on_and_by_source_update(spark, tmp_path):
    """Residual ON conjuncts (matched = key equality AND residual, per
    Delta) and WHEN NOT MATCHED BY SOURCE THEN UPDATE SET — plus the
    loud refusal when a residual-failing pair would make INSERT
    duplicate an existing key."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i * 10, i % 3) for i in range(10)], "k int, v int, g int"
    )
    sn.create_table(df, path, "k")
    spark.createDataFrame(
        [(2, 999, 2), (5, 888, 1), (20, 777, 2)], "k int, v int, g int"
    ).createOrReplaceTempView("ron_src")
    t = {"t": path}

    # k=2: t.g=2 == s.g=2 -> matched, updated; k=5: t.g=2 != s.g=1 -> not
    ss.snapshot_sql(
        spark,
        "MERGE INTO t USING ron_src s ON t.k = s.k AND t.g = s.g "
        "WHEN MATCHED THEN UPDATE SET v = s.v",
        tables=t,
    )
    rows = {r.k: r.v for r in sn.read_table(spark, path).collect()}
    assert rows[2] == 999 and rows[5] == 50

    # INSERT under residual ON would duplicate key 5 -> refused loud
    with pytest.raises(ss.SqlSurfaceError):
        ss.snapshot_sql(
            spark,
            "MERGE INTO t USING ron_src s ON t.k = s.k AND t.g = s.g "
            "WHEN NOT MATCHED THEN INSERT *",
            tables=t,
        )

    # by-source UPDATE + DELETE split first-match over target-only rows
    v_before = sn.current_version(path)
    ss.snapshot_sql(
        spark,
        "MERGE INTO t USING ron_src s ON t.k = s.k "
        "WHEN NOT MATCHED BY SOURCE AND t.k < 3 THEN "
        "UPDATE SET v = t.v + 10000, g = 9 "
        "WHEN NOT MATCHED BY SOURCE AND t.k >= 8 THEN DELETE",
        tables=t,
    )
    assert sn.current_version(path) == v_before + 1  # one commit
    rows = {r.k: (r.v, r.g) for r in sn.read_table(spark, path).collect()}
    assert rows[0] == (10000, 9) and rows[1] == (10010, 9)
    assert 8 not in rows and 9 not in rows
    assert rows[3] == (30, 0)          # neither clause fires: kept as-is
    assert rows[2] == (999, 2)         # key-matched: by-source never touches

    # SET * is meaningless without a source row
    with pytest.raises(ss.SqlSurfaceError):
        ss.snapshot_sql(
            spark,
            "MERGE INTO t USING ron_src s ON t.k = s.k "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *",
            tables=t,
        )
    # ON without a key equality is refused
    with pytest.raises(ss.SqlSurfaceError):
        ss.snapshot_sql(
            spark,
            "MERGE INTO t USING ron_src s ON t.g = s.g "
            "WHEN MATCHED THEN UPDATE SET *",
            tables=t,
        )


def test_merge_duplicate_insert_side_keys_refused(spark, tmp_path):
    """The duplicate-source guard rides the merge's own jobs (r16: a
    window-count raise_error on the key column, not a separate
    aggregation pass) — it must still fire when the duplicated key
    matches NO table row (pure insert side), and must leave the table
    at its pre-statement version."""
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, 10), path, "k")
    spark.createDataFrame(
        [(100, 1, 0), (100, 2, 0)], "k long, v long, g int"
    ).createOrReplaceTempView("dup_ins_src")
    with pytest.raises(ss.SqlSurfaceError, match="multiple rows"):
        ss.snapshot_sql(
            spark,
            "MERGE INTO t USING dup_ins_src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
            tables={"t": path},
        )
    assert sn.current_version(path) == 1  # nothing committed
    assert sn.read_table(spark, path).count() == 10


def test_merge_duplicate_source_keys_refused(spark, tmp_path):
    """A MERGE source carrying the same key twice would fan out through
    the keyed upsert and commit a duplicate-key table — refused loud
    (Delta's 'multiple source rows matched' error)."""
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, 10), path, "k")
    spark.createDataFrame(
        [(3, 1, 0), (3, 2, 0), (7, 5, 1)], "k long, v long, g int"
    ).createOrReplaceTempView("dup_src")
    t = {"t": path}
    for stmt in (
        "MERGE INTO t USING dup_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        "MERGE INTO t USING dup_src s ON t.k = s.k "
        "WHEN MATCHED AND s.v = 1 THEN UPDATE SET v = s.v",
        "MERGE INTO t USING dup_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
    ):
        with pytest.raises(ss.SqlSurfaceError):
            ss.snapshot_sql(spark, stmt, tables=t)
    # delete-only merges are immune (keys are distinct-ed)
    rep = ss.snapshot_sql(
        spark,
        "MERGE INTO t USING dup_src s ON t.k = s.k WHEN MATCHED THEN DELETE",
        tables=t,
    )
    assert rep["rows_deleted"] == 2
    assert sn.read_table(spark, path).count() == 8


def test_merge_on_parenthesized_key_equality(spark, tmp_path):
    """A parenthesized ON key equality — '(t.k = s.k)' — parses like
    the bare form (migration scripts wrap conditions liberally)."""
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, 6), path, "k")
    spark.createDataFrame([(2, 7, 0)], "k long, v long, g int") \
        .createOrReplaceTempView("paren_src")
    ss.snapshot_sql(
        spark,
        "MERGE INTO t USING paren_src s ON (t.k = s.k) "
        "WHEN MATCHED THEN UPDATE SET *",
        tables={"t": path},
    )
    rows = {r.k: r.v for r in sn.read_table(spark, path).collect()}
    assert rows[2] == 7


def test_merge_on_top_level_or_refused(spark, tmp_path):
    """A top-level OR in MERGE ON would silently reinterpret SQL
    precedence under the AND-conjunct split — refused loud (r15 ADVICE).
    An OR INSIDE a parenthesized conjunct stays supported."""
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, 6), path, "k")
    spark.createDataFrame([(2, 7, 0)], "k long, v long, g int") \
        .createOrReplaceTempView("or_src")
    t = {"t": path}
    with pytest.raises(ss.SqlSurfaceError, match="top-level AND"):
        ss.snapshot_sql(
            spark,
            "MERGE INTO t USING or_src s ON t.k = s.k AND t.g = 1 OR s.v = 2 "
            "WHEN MATCHED THEN UPDATE SET *",
            tables=t,
        )
    # parenthesized OR is one conjunct — still in grammar
    ss.snapshot_sql(
        spark,
        "MERGE INTO t USING or_src s ON t.k = s.k AND (t.g = 2 OR s.v = 99) "
        "WHEN MATCHED THEN UPDATE SET v = s.v",
        tables=t,
    )
    rows = {r.k: r.v for r in sn.read_table(spark, path).collect()}
    assert rows[2] == 7


def test_merge_insert_list_must_carry_key(spark, tmp_path):
    """INSERT (cols) VALUES (…) omitting the table key would insert
    NULL-key rows no later merge could match or delete — refused loud
    (r15 ADVICE)."""
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, 6), path, "k")
    spark.createDataFrame([(100, 7, 0)], "k long, v long, g int") \
        .createOrReplaceTempView("nk_src")
    with pytest.raises(ss.SqlSurfaceError, match="must include the table key"):
        ss.snapshot_sql(
            spark,
            "MERGE INTO t USING nk_src s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (v) VALUES (s.v)",
            tables={"t": path},
        )


def test_with_recursive_cte_shadows_catalog(spark, tmp_path):
    """WITH RECURSIVE <name> must shadow a same-named catalog table just
    like a plain WITH (r15 ADVICE: the RECURSIVE keyword previously made
    CTE collection miss the binding)."""
    path = str(tmp_path / "sales")
    sn.create_table(
        spark.createDataFrame([(1, 5)], "k int, sales int"), path, "k"
    )
    got = ss.snapshot_sql(
        spark,
        "WITH RECURSIVE sales AS (SELECT 99 AS k) SELECT k FROM sales",
        tables={"sales": path},
    ).collect()
    assert [r.k for r in got] == [99]
