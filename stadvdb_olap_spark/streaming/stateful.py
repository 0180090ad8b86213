"""Custom stateful streaming operator: session aggregation with
``applyInPandasWithState``.

Nothing like this exists in the reference (SURVEY.md §2.10) — this is the
engine's demonstration of arbitrary stateful processing: per-user sessions
that close after an inactivity gap, emitted when they time out. State is
one tiny tuple per user, partitioned by the grouping key, so it scales
horizontally with users, not events.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start long, end long, n long"

_GAP_MS = 30 * 60 * 1000


def _update_sessions(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold new events for one user into the open session; emit and reset
    when the inactivity gap passes (processing-time timeout)."""
    (user_id,) = key
    if state.hasTimedOut:
        start, end, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="ms")],
                "session_end": [pd.Timestamp(end, unit="ms")],
                "n_events": [n],
            }
        )
        return

    rows = pd.concat(list(pdfs), ignore_index=True)
    ts_ms = (rows["ts"].astype("int64") // 1_000_000).sort_values()
    closed: list[tuple[int, int, int]] = []
    if state.exists:
        start, end, n = state.get
    else:
        start = end = int(ts_ms.iloc[0])
        n = 0

    for t in ts_ms:
        t = int(t)
        if n > 0 and t - end > _GAP_MS:
            closed.append((start, end, n))
            start, n = t, 0
        end = max(end, t)
        n += 1

    state.update((start, end, n))
    state.setTimeoutDuration(_GAP_MS)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Per-user session aggregation over a stream (or batch test harness
    via the same groupBy body). Emits one row per closed session."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_sessions,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
