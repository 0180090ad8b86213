"""Custom stateful streaming operators.

Nothing like this exists in the reference (SURVEY.md §2.10) — these are
the engine's demonstrations of arbitrary stateful processing. State is
one tiny tuple per user, partitioned by the grouping key, so it scales
horizontally with users, not events. Both generations of the API are
covered:

- ``sessionize_stream`` — ``applyInPandasWithState`` (the GroupState API):
  per-user sessions that close after an inactivity gap, emitted when they
  time out.
- ``running_user_totals_stream`` — ``transformWithStateInPandas`` (the
  Spark 4 typed-state successor): per-user running totals in a named
  ``ValueState``, one updated row emitted per active user per micro-batch.
  The typed-state handle also offers ListState/MapState/TTL/timers for
  richer operators; the batch-agreement test pins that the streamed fold
  converges to the batch aggregate exactly. NOTE: executing a
  transformWithState query needs ``google.protobuf`` (the typed-state
  Python<->JVM protocol) and the RocksDB state store provider; this
  runtime ships neither protobuf nor media libs, so the agreement test
  auto-skips there while the plan-construction test always runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

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


def session_stats(events: DataFrame) -> DataFrame:
    """BATCH twin of :func:`sessionize_stream` — same output grain and
    schema (``SESSION_SCHEMA``: user_id, session_start, session_end,
    n_events; session_end = LAST EVENT ts, not ts+gap), computed with
    the certified lag/cumsum gap device instead of per-key state. A
    session the stream has closed is exactly a row of this relation —
    the agreement test in tests/test_streaming.py pins that, and the
    catalog query ``session_stats_30m`` certifies this body against a
    DuckDB oracle, making it the driver-signed surface for the stateful
    sessionizer's semantics. One shuffle on user_id at any scale."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(
        gap.isNull() | (gap > _GAP_MS * 1000), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        events.select("user_id", "ts")
        .withColumn("__sid", F.sum(is_new).over(run))
        .groupBy("user_id", "__sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .drop("__sid")
    )


TOTALS_SCHEMA = "user_id long, n_events long, last_event timestamp"


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running totals on the typed-state API: ValueState holds
    ``(n_events, last_event_ms)``; each micro-batch folds its rows into
    the state and emits the updated row. The emitted stream (in update
    mode) converges to the batch ``groupBy(user_id).agg(count, max(ts))``
    — asserted exactly by the agreement test."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n long, last_ms long")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        prev = self._totals.get()
        n, last_ms = (prev[0], prev[1]) if prev is not None else (0, None)
        for pdf in rows:
            ts_ms = pdf["ts"].astype("int64") // 1_000_000
            n += len(pdf)
            batch_max = int(ts_ms.max())
            last_ms = batch_max if last_ms is None else max(last_ms, batch_max)
        self._totals.update((n, last_ms))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "last_event": [pd.Timestamp(last_ms, unit="ms")],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Running per-user totals over a stream via transformWithStateInPandas
    (update mode, no timers). One output row per active user per batch."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=TOTALS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
