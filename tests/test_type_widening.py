"""ALTER COLUMN TYPE widening (sources/snapshots.alter_column_type —
the remaining Delta/Iceberg schema-evolution verb after ADD/RENAME/DROP):
a log-only commit widens the logical field; zero files are rewritten;
Spark 4's parquet reader promotes the old files' narrower physical
values, so mixed-width file sets read as one uniform wide column —
across time travel, CDC, scd2, restore, merges and the key column."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from hadoop_prototype_spark.sources import snapshots as sn


def _table(spark, n=400, parts=4):
    return spark.range(n).repartitionByRange(parts, "id").selectExpr(
        "CAST(id AS INT) AS k",
        "CAST(id * 10 AS INT) AS v",
        "CAST(id AS FLOAT) AS w",
        "CAST(id AS DECIMAL(10, 2)) AS d",
    )


def _kv(df, k="k", v="v"):
    return sorted((r[k], r[v]) for r in df.collect())


def test_widen_is_log_only_and_reads_mixed_files(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")
    files_before = sorted(os.path.basename(f)
                          for f in glob.glob(path + "/*.parquet"))
    want = _kv(sn.read_table(spark, path))

    r = sn.alter_column_type(spark, path, "v", "bigint")
    assert r["version"] == 2 and r["altered"] == {"v": "bigint"}
    files_after = sorted(os.path.basename(f)
                         for f in glob.glob(path + "/*.parquet"))
    assert files_after == files_before  # zero data files touched

    got = sn.read_table(spark, path)
    assert dict(got.dtypes)["v"] == "bigint"
    assert _kv(got) == want

    # an append AFTER the widen stores wide values; the mixed set (old
    # int32 files + new int64 file) reads as one uniform bigint column
    extra = spark.range(1000, 1010).selectExpr(
        "CAST(id AS INT) AS k",
        "CAST(id AS BIGINT) * 1000000000000 AS v",  # needs 64 bits
        "CAST(id AS FLOAT) AS w",
        "CAST(id AS DECIMAL(10, 2)) AS d",
    )
    sn.append_table(spark, path, extra, "k")
    allv = _kv(sn.read_table(spark, path))
    assert (1005, 1005 * 1000000000000) in allv
    assert len(allv) == 410


def test_float_double_and_decimal_widening(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")
    sn.alter_column_type(spark, path, "w", "double")
    sn.alter_column_type(spark, path, "d", "decimal(20, 4)")
    got = sn.read_table(spark, path)
    assert dict(got.dtypes)["w"] == "double"
    assert dict(got.dtypes)["d"] == "decimal(20,4)"
    row = got.filter(F.col("k") == 7).collect()[0]
    assert row["w"] == 7.0 and float(row["d"]) == 7.0


def test_narrowing_and_cross_family_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")
    sn.alter_column_type(spark, path, "v", "bigint")
    for col, bad in [
        ("v", "int"),          # narrowing back
        ("v", "double"),       # long->double is lossy
        ("w", "string"),       # cross-family
        ("d", "decimal(10, 1)"),  # scale shrink
        ("d", "decimal(11, 3)"),  # integer-digit budget shrink (8 -> 8 ok? 10-2=8, 11-3=8 equal) -> allowed actually
    ][:4]:
        with pytest.raises(ValueError):
            sn.alter_column_type(spark, path, col, bad)
    with pytest.raises(KeyError):
        sn.alter_column_type(spark, path, "nope", "bigint")
    with pytest.raises(ValueError):
        sn.alter_column_type(spark, path, "v", "bigint")  # already that type


def test_time_travel_and_restore_roll_the_type_back(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")
    sn.alter_column_type(spark, path, "v", "bigint")       # v2
    assert dict(sn.read_table(spark, path, version=1).dtypes)["v"] == "int"
    assert dict(sn.read_table(spark, path, version=2).dtypes)["v"] == "bigint"
    sn.restore_table(path, 1)                              # v3: old schema
    assert dict(sn.read_table(spark, path).dtypes)["v"] == "int"


def test_merge_and_mor_delete_after_widening_the_key(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")
    sn.alter_column_type(spark, path, "k", "bigint")       # widen the KEY
    got = sn.read_table(spark, path)
    assert dict(got.dtypes)["k"] == "bigint"

    upd = got.filter(F.col("k") % 5 == 0).withColumn(
        "v", F.col("v") + F.lit(100000)
    )
    sn.merge_into(spark, path, upd, "k")
    sn.delete_from_mor(
        spark, path, got.filter(F.col("k") % 7 == 0).select("k"), "k"
    )
    cur = sn.read_table(spark, path)
    rows = {r.k: r.v for r in cur.collect()}
    assert 0 not in rows and 7 not in rows          # deleted
    assert rows[10] == 100100 and rows[3] == 30     # merged / untouched
    assert dict(cur.dtypes)["k"] == "bigint"


def test_cdc_and_scd2_span_the_widen(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")              # v1
    sn.alter_column_type(spark, path, "v", "bigint")       # v2 (log-only)
    upd = sn.read_table(spark, path).filter(F.col("k") % 4 == 1).withColumn(
        "v", F.col("v") + F.lit(5_000_000_000)             # needs 64 bits
    )
    sn.merge_into(spark, path, upd, "k")                   # v3
    ch = sn.table_changes(spark, path, 1, 3)
    ups = {
        r.k: r.v
        for r in ch.filter(F.col("_change") == "update_postimage").collect()
    }
    assert ups[1] == 10 + 5_000_000_000
    hist = sn.scd2_history(spark, path)
    one = sorted(
        (r.valid_from, r.valid_to, r.v)
        for r in hist.filter(F.col("k") == 1).collect()
    )
    assert one == [(1, 3, 10), (3, None, 10 + 5_000_000_000)]


def test_widen_on_a_column_mapped_table(spark, tmp_path):
    """Widening composes with RENAME's column mapping: the physical name
    stays pinned, the logical field carries the wide type, and old files
    read through mapping + promotion at once."""
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")
    sn.rename_column(spark, path, "v", "amount")
    sn.alter_column_type(spark, path, "amount", "bigint")
    got = sn.read_table(spark, path)
    assert dict(got.dtypes)["amount"] == "bigint"
    assert _kv(got, v="amount")[:3] == [(0, 0), (1, 10), (2, 20)]
    # and the constraint guard still validates against the widened frame
    sn.set_check_constraints(spark, path, {"pos": "amount >= 0"})
    bad = got.limit(1).withColumn("amount", F.lit(-1).cast("bigint"))
    with pytest.raises(sn.ConstraintViolation):
        sn.merge_into(spark, path, bad, "k")


def test_merge_schema_widens_types_automatically(spark, tmp_path):
    """merge_into(merge_schema=True) widens EXISTING columns whose
    update-frame type is an allowlisted widening (Delta's automatic type
    evolution) — atomic with the upsert, composing with new-column adds."""
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")  # v int, w float
    cur = sn.read_table(spark, path)
    upd = (
        cur.filter(F.col("k") % 10 == 2)
        .withColumn("v", F.col("v").cast("bigint") + F.lit(9_000_000_000))
        .withColumn("flag", F.lit("Y"))
    )
    rep = sn.merge_into(spark, path, upd, "k", merge_schema=True)
    assert rep["version"] == 2
    got = sn.read_table(spark, path)
    assert dict(got.dtypes)["v"] == "bigint"
    assert dict(got.dtypes)["flag"] == "string"
    rows = {r.k: (r.v, r.flag) for r in got.collect()}
    assert rows[2] == (20 + 9_000_000_000, "Y")
    assert rows[3] == (30, None)   # untouched file, promoted + NULL
    # time travel still reads the narrow pre-merge type
    assert dict(sn.read_table(spark, path, version=1).dtypes)["v"] == "int"
    # a NARROWER update type does not shrink the schema (projection casts)
    upd2 = sn.read_table(spark, path).filter(F.col("k") == 5).withColumn(
        "v", F.lit(7).cast("int")
    )
    sn.merge_into(spark, path, upd2, "k", merge_schema=True)
    got2 = sn.read_table(spark, path)
    assert dict(got2.dtypes)["v"] == "bigint"
    assert {r.v for r in got2.filter("k = 5").collect()} == {7}


def test_staged_sink_append_to_widened_table(spark, tmp_path):
    """The DataSource batch sink (df.write.format('snapshot_table')
    mode('append')) on a WIDENED table: a narrow (int) batch lands as
    int32 pages and the mixed set reads back as one uniform bigint
    column — the widen is a read-side contract, writers need no
    migration."""
    from hadoop_prototype_spark.sources import snapshot_stream as ss

    ss.register(spark)
    path = str(tmp_path / "t")
    sn.create_table(
        spark.range(20).selectExpr("id AS k", "CAST(id AS INT) AS v"),
        path, "k",
    )
    sn.alter_column_type(spark, path, "v", "bigint")
    # a narrow post-widen batch through the staged sink
    spark.range(100, 105).selectExpr(
        "id AS k", "CAST(id AS INT) AS v"
    ).write.format("snapshot_table").mode("append").save(path)
    got = sn.read_table(spark, path)
    assert dict(got.dtypes)["v"] == "bigint"
    vals = {r.k: r.v for r in got.collect()}
    assert vals[102] == 102 and vals[7] == 7 and len(vals) == 25
