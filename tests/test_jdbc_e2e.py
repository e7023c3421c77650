"""End-to-end JDBC tests through the embedded Derby driver.

pyspark ships derby*.jar (for its Hive metastore), so a real JDBC driver is
on the JVM classpath: these tests exercise the reference's DB operators —
DBInputFormat (MR lib/db/DBInputFormat.java:61), DataDrivenDBInputFormat
(DataDrivenDBInputFormat.java:61), DBOutputFormat (DBOutputFormat.java:50),
and the DBCountPageView example (EX/DBCountPageView.java:79) — over an
actual database, not just the split math. Embedded Derby lives in the same
JVM as Spark's local executors, which mirrors how a driver jar reaches
cluster executors via --jars.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_prototype_spark.sources.jdbc import (
    db_count_page_view,
    read_jdbc_data_driven,
    write_jdbc,
)

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory) -> str:
    db = tmp_path_factory.mktemp("derby") / "db"
    return f"jdbc:derby:{db};create=true"


@pytest.fixture(scope="module")
def seeded(spark, derby_url):
    """Write a 500-row table once; Derby reports identifiers uppercase."""
    src = spark.range(500).select(
        F.col("id").cast("long").alias("ID"),
        F.concat(F.lit("user_"), (F.col("id") % 37).cast("string")).alias("NAME"),
        (F.col("id") % 7).cast("int").alias("BUCKET"),
    )
    # few partitions on the write: embedded Derby serializes DDL/inserts.
    # NAME must be VARCHAR, not Derby's default CLOB, to be range-comparable.
    write_jdbc(
        src.coalesce(2), derby_url, "PEOPLE", properties=DERBY_PROPS,
        column_types="NAME VARCHAR(64)",
    )
    return src


def test_write_read_roundtrip(spark, derby_url, seeded):
    """DBOutputFormat → DBInputFormat round trip preserves every row."""
    back = spark.read.jdbc(derby_url, "PEOPLE", properties=DERBY_PROPS)
    assert sorted(back.columns) == ["BUCKET", "ID", "NAME"]
    got = {(r.ID, r.NAME, r.BUCKET) for r in back.collect()}
    want = {(r.ID, r.NAME, r.BUCKET) for r in seeded.collect()}
    assert got == want


def test_data_driven_integer_partitions(spark, derby_url, seeded):
    """DataDrivenDBInputFormat numeric path: bounded column read produces
    the requested partition count and loses no rows at split boundaries."""
    df = read_jdbc_data_driven(
        spark, derby_url, "PEOPLE", column="ID", lower=0, upper=499,
        num_partitions=4, properties=DERBY_PROPS,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 500
    assert df.agg(F.sum("ID")).collect()[0][0] == sum(range(500))
    # every partition non-empty (bounds actually split the range)
    sizes = df.groupBy(F.spark_partition_id().alias("p")).count().collect()
    assert len(sizes) == 4 and all(r["count"] > 0 for r in sizes)


def test_data_driven_text_predicates(spark, derby_url, seeded):
    """TextSplitter path: per-split WHERE predicates partition the read.
    Text ranges can overlap-or-gap only at the boundaries the splitter
    chose, so the union must still be exactly the source rows."""
    df = read_jdbc_data_driven(
        spark, derby_url, "PEOPLE", column="NAME", lower="user_0", upper="user_9",
        num_partitions=3, properties=DERBY_PROPS,
    )
    assert df.count() == 500  # every NAME is in [user_0, user_9]
    assert df.select("NAME").distinct().count() == 37


def test_db_count_page_view_e2e(spark, derby_url):
    """EX/DBCountPageView.java:79 composition: access log in the DB →
    group-count per url → counts written back; the reference's verify()
    invariant (sum of pageviews == access rows) holds on the DB contents."""
    access = spark.range(300).select(
        F.concat(F.lit("/page/"), (F.col("id") % 11).cast("string")).alias("URL"),
        F.concat(F.lit("ref_"), (F.col("id") % 5).cast("string")).alias("REFERRER"),
        F.col("id").alias("TS"),
    )
    write_jdbc(access.coalesce(2), derby_url, "ACCESS", properties=DERBY_PROPS)

    # run TWICE: the reference recreates PAGEVIEW per run, so the verify()
    # invariant must hold after a re-run too (append mode doubled the rows)
    for _ in range(2):
        db_count_page_view(spark, derby_url, "ACCESS", "PAGEVIEW", properties=DERBY_PROPS)

        counts = spark.read.jdbc(derby_url, "PAGEVIEW", properties=DERBY_PROPS)
        rows = {r.URL: r.PAGEVIEW for r in counts.collect()}
        assert len(rows) == 11
        assert sum(rows.values()) == 300  # the reference's verify() check
        expected = {r.URL: r.cnt for r in access.groupBy("URL").agg(F.count("*").alias("cnt")).collect()}
        assert rows == expected


def test_jdbc_exactly_once_sink_skips_replayed_batches(spark, derby_url, tmp_path):
    """foreachBatch + batch-id ledger: re-running the stream over the same
    source (fresh checkpoint → same batch ids replayed) must not duplicate
    rows; resuming from the SAME checkpoint must write nothing new."""
    from hadoop_prototype_spark.streaming.sinks import jdbc_exactly_once_sink

    src_dir = str(tmp_path / "src")
    spark.range(100).selectExpr("id AS ID", "CAST(id % 5 AS INT) AS K").coalesce(
        2
    ).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    def run(checkpoint):
        stream = spark.readStream.schema(schema).parquet(src_dir)
        q = jdbc_exactly_once_sink(
            stream, derby_url, "SINK_ROWS", str(checkpoint), properties=DERBY_PROPS
        )
        q.awaitTermination(120)

    run(tmp_path / "cp1")
    count_after_first = (
        spark.read.jdbc(derby_url, "SINK_ROWS", properties=DERBY_PROPS).count()
    )
    assert count_after_first == 100

    # same checkpoint: no new source files → no batches → no writes
    run(tmp_path / "cp1")
    # fresh checkpoint: batch 0 replays over the same files; ledger skips it
    run(tmp_path / "cp2")
    final = spark.read.jdbc(derby_url, "SINK_ROWS", properties=DERBY_PROPS).count()
    assert final == 100
