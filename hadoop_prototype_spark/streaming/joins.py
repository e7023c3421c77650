"""Stream-stream interval joins (engine extension — SURVEY.md §2.11).

The reference is batch-only; Structured Streaming's stream-stream join is
the streaming analogue of its reduce-side join family (datajoin
DataJoinReducerBase — MR-era cross-source correlation): correlate two live
event streams on a key within an event-time interval, e.g. "purchase
within 1 hour of a view by the same user".

Scale/state contract: BOTH sides carry watermarks and the join condition
bounds right-ts to a closed interval around left-ts, so the state store
evicts rows once the watermark passes the interval's far edge — without
the time bound, stream-stream state grows forever. State is keyed by the
join key; the shuffle partitions both streams on it (same co-partitioned
shape as the batch join).

The transform is expressed once and runs identically in batch mode (the
watermark is a no-op there), which is exactly how the parity test pins it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "1 hour",
    watermark: str | None = "2 hours",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing ``key`` where the right event lands in
    [left_ts, left_ts + upper]. Right columns come back ``right_prefix``ed.

    ``watermark=None`` skips watermarking for pure batch use; in stream
    mode a watermark is REQUIRED (Spark rejects unbounded-state joins in
    append mode).
    """
    if watermark is not None:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    r = right.select([F.col(c).alias(f"{right_prefix}{c}") for c in right.columns])
    rk, rts = f"{right_prefix}{key}", f"{right_prefix}{right_ts}"
    cond = (
        (F.col(key) == F.col(rk))
        & (F.col(rts) >= F.col(left_ts))
        & (F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(r, cond, how).drop(rk)
