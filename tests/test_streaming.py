"""Structured Streaming integration: the SAME window transforms used by the
batch queries run under readStream (file source → availableNow → memory
sink) and must produce the batch answer. Stateful operator smoke-tested via
applyInPandasWithState."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_prototype_spark.sources.tables import load_table
from hadoop_prototype_spark.streaming.stateful import running_user_totals
from hadoop_prototype_spark.streaming.windows import (
    session_window_agg,
    tumbling_window_agg,
    with_watermark,
)


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    # re-write events as a clean micro-batch source (normalized timestamps)
    out = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    return out


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_tumbling_equals_batch(spark, sf_dir, events_stream_dir):
    batch_events = spark.read.parquet(events_stream_dir)
    expected = sorted(
        (str(r.window_start), r.event_type, r.n_events)
        for r in tumbling_window_agg(batch_events, "1 hour").collect()
    )

    schema = batch_events.schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    windowed = tumbling_window_agg(with_watermark(stream, "2 hours"), "1 hour")
    got_df = _run_stream(spark, windowed, "tumbling_mem")
    got = sorted((str(r.window_start), r.event_type, r.n_events) for r in got_df.collect())
    assert got == expected


def test_streaming_sessions_equals_batch(spark, sf_dir, events_stream_dir):
    batch_events = spark.read.parquet(events_stream_dir)
    expected = sorted(
        (r.user_id, str(r.session_start), r.n_events)
        for r in session_window_agg(batch_events, "30 minutes").collect()
    )
    schema = batch_events.schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    windowed = session_window_agg(with_watermark(stream, "2 hours"), "30 minutes")
    got_df = _run_stream(spark, windowed, "sessions_mem")
    got = sorted((r.user_id, str(r.session_start), r.n_events) for r in got_df.collect())
    assert got == expected


def test_stateful_running_totals(spark, events_stream_dir):
    batch_events = spark.read.parquet(events_stream_dir)
    expected = {
        r.user_id: (r.n, round(r.total, 6))
        for r in batch_events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    schema = batch_events.schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("totals_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT user_id, max_by(n_events, n_events) n, max_by(total_value, n_events) t "
        "FROM totals_mem GROUP BY user_id"
    ).collect()
    got = {r.user_id: (r.n, round(r.t, 6)) for r in rows}
    assert got == expected
