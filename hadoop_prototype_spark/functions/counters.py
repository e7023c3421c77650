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
