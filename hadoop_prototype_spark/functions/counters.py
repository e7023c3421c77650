"""Job counters (SURVEY.md §2.5 last row).

Reference: global counters — TaskCounter enum (MR core/TaskCounter.java:27)
plus user counters via context.getCounter (MR core/Counters.java).

Spark-first: df.observe() attaches aggregate "counters" to a plan; they are
computed DURING the action with no extra pass (exactly like MapReduce
counters, which piggyback on task heartbeats). Accumulators cover the
imperative corner; observe is the declarative default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_counters(
    df: DataFrame, counters: dict[str, Column] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach counters to a plan; read obs.get after an action completes.

    Default counters mirror TaskCounter's INPUT_RECORDS.
    """
    obs = Observation()
    counters = counters or {"records": F.count(F.lit(1))}
    exprs = [c.alias(name) for name, c in counters.items()]
    return df.observe(obs, *exprs), obs


def with_stream_counters(
    df: DataFrame, name: str, counters: dict[str, Column] | None = None
) -> DataFrame:
    """Streaming counters: named observe() — metrics ride each micro-batch's
    progress event (StreamingQueryProgress.observedMetrics), the streaming
    analogue of counters on task heartbeats. Use read_stream_counters after
    the query finishes (or in a listener for live dashboards)."""
    counters = counters or {"records": F.count(F.lit(1))}
    return df.observe(name, *[c.alias(n) for n, c in counters.items()])


def read_stream_counters(query, name: str) -> dict | None:
    """Counters from the LAST micro-batch of a streaming query (per-batch
    values, like per-task counter deltas — sum across progress events for
    job totals)."""
    progress = query.lastProgress
    if not progress:
        return None
    metrics = progress.get("observedMetrics") or {}
    row = metrics.get(name)
    return dict(row.asDict()) if hasattr(row, "asDict") else (dict(row) if row else None)
