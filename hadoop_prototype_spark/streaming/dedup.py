"""Streaming deduplication and stream-static enrichment (engine extension —
SURVEY.md §2.11: the reference is batch-only).

- streaming_dedup: exactly-once-per-key over an event stream. State is one
  entry per key; with `within_watermark=True` the watermark bounds state
  lifetime (keys older than the horizon are evicted), which is the only
  form that survives an unbounded 100 TB/day stream. Without a watermark
  bound, state grows with distinct keys forever.
- stream_static_join: enrich a stream against a slowly-changing dimension.
  The static side is broadcast per micro-batch — no stream-side shuffle,
  the streaming analogue of the DistributedCache map-side hash join
  (MR core/filecache/DistributedCache.java:134).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(
    stream: DataFrame,
    keys: list[str],
    watermark_delay: str | None = "2 hours",
    ts_col: str = "ts",
    within_watermark: bool = False,
) -> DataFrame:
    """First event per key wins; later duplicates are dropped.

    With within_watermark=True, duplicates are only suppressed while the
    key is inside the watermark horizon (state evicted after) — bounded
    state, the production form. Plain dropDuplicates keeps state per key
    forever (fine for bounded/availableNow runs, wrong for 24/7 streams).
    """
    if watermark_delay is not None and stream.isStreaming:
        stream = stream.withWatermark(ts_col, watermark_delay)
    if within_watermark:
        return stream.dropDuplicatesWithinWatermark(keys)
    return stream.dropDuplicates(keys)


def stream_static_join(
    stream: DataFrame, dim: DataFrame, on: str, how: str = "inner"
) -> DataFrame:
    """Stream ⋈ static dimension: broadcast the dim, never shuffle the stream."""
    return stream.join(F.broadcast(dim), on, how)
