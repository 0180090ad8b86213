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
