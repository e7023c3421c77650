"""transformWithState stateful processors (Spark 4.x arbitrary state API).

applyInPandasWithState (streaming/stateful.py) carries ONE state tuple per
key; the transformWithState API generalizes it: named state variables
(value/list/map), optional per-state TTL, timers, and initial state. This
module provides the operator the richer API exists for — per-key running
statistics PLUS a bounded recent-extremes list — as the template for
custom stateful operators the reference has no analogue of
(SURVEY.md §2.11: the reference is batch-only).

Scale notes: state is per-key in the executor state store (RocksDB on a
cluster); the list state is explicitly bounded (top-K via truncation on
every update) — unbounded list state is the classic stateful-streaming
OOM. TTL (ttlDurationMs) is plumbed through so idle keys expire.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_value double, "
    "top_values array<double>"
)

TOP_K = 3


class UserStatsProcessor(StatefulProcessor):
    """Running (count, sum, max) + bounded top-K values per user."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._stats = handle.getValueState(
            "stats", "n BIGINT, total DOUBLE, mx DOUBLE", ttlDurationMs=self._ttl_ms
        )
        self._top = handle.getListState("top_values", "v DOUBLE")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total, mx = (self._stats.get() or (0, 0.0, None)) if self._stats.exists() else (0, 0.0, None)
        values: list[float] = [v for (v,) in self._top.get()] if self._top.exists() else []
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = float(pdf["value"].max())
            mx = batch_max if mx is None else max(mx, batch_max)
            values.extend(float(v) for v in pdf["value"])
        # bounded: keep only the K largest, largest first (deterministic
        # tie handling: values are plain floats, sort is total)
        values = sorted(values, reverse=True)[:TOP_K]
        self._stats.update((n, total, mx))
        self._top.put([(v,) for v in values])
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx],
                "top_values": [values],
            }
        )

    def close(self) -> None:
        pass


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def user_stats_tws(stream: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Running per-user stats through transformWithStateInPandas.

    Requires the RocksDB state store provider (the transformWithState
    engine only supports it; it is also the production provider — the
    default HDFS-backed store keeps all state on-heap). Checked here so
    the failure is a clear message, not a crashed driver worker::

        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                       tws.ROCKSDB_PROVIDER)
    """
    provider = stream.sparkSession.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    if "RocksDB" not in (provider or ""):
        raise ValueError(
            "transformWithState requires the RocksDB state store: set "
            f"spark.sql.streaming.stateStore.providerClass={ROCKSDB_PROVIDER}"
        )
    try:  # the TWS python<->JVM state protocol is protobuf-serialized
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package for its "
            "state-server protocol; install protobuf (the processor logic "
            "itself is environment-independent and unit-tested directly)"
        ) from e
    return stream.groupBy("user_id").transformWithStateInPandas(
        UserStatsProcessor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
