"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference keeps in-memory progress counters while crawling
(app.js:497-508). The distributed streaming form is per-key mutable
state: this operator maintains a running (count, total value) per
``user_id`` across micro-batches — state lives in the state store,
checkpointed with the query, partitioned by the grouping key.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user counters over an events stream (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- emit-on-close sessions via event-time state timeout -------------------

CLOSED_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_GAP_MS = 30 * 60 * 1000  # same 30-min idle gap as windows.sessionized_stream


def _close_on_timeout(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, total = state.get
        state.remove()
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 4)]}
        )
        return
    n, total = state.get if state.exists else (0, 0.0)
    last_ms = 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_ms = max(last_ms, int(pdf["ts"].max().value // 1_000_000))
    state.update((n, total))
    # close when the watermark passes last-event + gap; the timeout fires
    # on the next micro-batch after that, emitting exactly one closed row
    state.setTimeoutTimestamp(last_ms + _GAP_MS)


def idle_closed_sessions(events: DataFrame) -> DataFrame:
    """Per-user sessions that EMIT ONLY WHEN CLOSED (30-min event-time idle).

    The watermark on ``ts`` drives ``EventTimeTimeout``: state for a user
    expires once the watermark passes their last event + gap, and the
    expired group emits its final (count, total) exactly once — the
    append-mode twin of ``running_user_totals``. State store size is
    bounded by the number of OPEN sessions, not users ever seen.
    """
    return (
        events.withWatermark("ts", "10 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _close_on_timeout,
            outputStructType=CLOSED_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
