"""Watermarked windowed aggregation over an event stream.

The reference has no streaming at all (SURVEY.md §2.10); its stand-in for
incrementality is the 5,000-row batch loop. This module is the Spark-native
uplift: event-time tumbling windows with a watermark for late data. The
aggregation body is shared with the batch catalog query
``events_tumbling_1h`` so batch and streaming provably compute the same
thing (tested in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stadvdb_olap_spark.plans.compat import money_sum


def windowed_event_aggregate(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time window counts + value sums per event_type.

    On a stream, the watermark bounds state: windows older than
    (max event time - watermark) are finalized and dropped from the state
    store — the scale knob for unbounded streams.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), money_sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def session_window_aggregate(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user session aggregation on Spark's BUILT-IN merging session
    window (gap-based) — the streaming-native sibling of the custom
    GroupState sessionizer (stateful.py): under a watermark, closed
    sessions finalize, EMIT in append mode, and leave the state store.
    Output grain matches the certified batch query
    ``events_session_window_builtin`` (session_end = last event + gap);
    the stream-vs-batch agreement test pins the equality, using a
    far-future sentinel event to advance the global watermark so every
    real session flushes under availableNow."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.session_window(ts_col, gap).alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
