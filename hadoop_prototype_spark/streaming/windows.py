"""Event-time windowed aggregations (engine extension — SURVEY.md §2.11:
the reference is batch-only; these are the Structured Streaming extras over
the `events` table).

Every transform here is expressed so it runs identically in BATCH mode
(events parquet → DataFrame) and STREAM mode (readStream → the same
transform → writeStream): F.window / F.session_window are supported in
both. Watermarking only applies in stream mode and is threaded through
`stream_ready` wrappers.

Scale notes: windowed groupBy shuffles on (window, keys); Spark compacts
tumbling windows to one row per group. Session windows in stream mode use
the state store — the gap bounds state lifetime; in batch they compile to
a sort-based aggregation within user partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    window_len: str = "1 hour",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling event-time windows: one row per (window, keys)."""
    aggs = aggs or [F.count("*").alias("n_events")]
    g = events.groupBy(F.window(F.col(ts_col), window_len).alias("win"), *keys).agg(*aggs)
    return g.select(
        F.col("win.start").alias("window_start"), F.col("win.end").alias("window_end"), *keys,
        *[c for c in g.columns if c not in ("win", *keys)],
    )


def sliding_window_agg(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Sliding windows: each event contributes to window_len/slide windows."""
    aggs = aggs or [F.count("*").alias("n_events")]
    g = events.groupBy(F.window(F.col(ts_col), window_len, slide).alias("win"), *keys).agg(*aggs)
    return g.select(
        F.col("win.start").alias("window_start"), F.col("win.end").alias("window_end"), *keys,
        *[c for c in g.columns if c not in ("win", *keys)],
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("user_id",),
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Session windows: events within `gap` of each other merge per key."""
    aggs = aggs or [F.count("*").alias("n_events")]
    g = events.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), *keys).agg(*aggs)
    return g.select(
        F.col("win.start").alias("session_start"), F.col("win.end").alias("session_end"), *keys,
        *[c for c in g.columns if c not in ("win", *keys)],
    )


def with_watermark(events: DataFrame, delay: str = "1 hour", ts_col: str = "ts") -> DataFrame:
    """Late-data bound for stream mode (no-op on batch DataFrames is an
    error in Spark, so callers apply it only on streaming inputs)."""
    return events.withWatermark(ts_col, delay)
