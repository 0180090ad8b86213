"""Streaming deduplication and stream-static enrichment.

The reference deduplicates inside each 5,000-row pandas chunk only
(``/root/reference/ETL/user_ETL.py:58`` — duplicates that span chunks leak
through and are papered over by the upsert). The streaming-native answer
deduplicates across micro-batches with watermark-bounded state, which is
both correct across batch boundaries and bounded in memory — the two
properties the reference's loop lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from stadvdb_olap_spark.operators.joins import broadcast_if_small


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once-per-key event stream within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps one row per key and expires
    per-key state once the watermark passes it — state size tracks the
    number of DISTINCT keys inside the watermark window, not the stream
    length. On batch DataFrames it degrades to plain ``dropDuplicates``
    so the same body serves both modes.
    """
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: list[str] | None = None,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
) -> DataFrame:
    """Stream-static dimension join: each micro-batch hash-joins against
    the static (broadcastable) dimension — no stream-side state at all,
    the cheapest enrichment shape. For stream-stream joins Spark requires
    watermarks on both sides; a static dim needs none."""
    if on is not None:
        return events.join(broadcast_if_small(dim), on=on, how="left")
    cond = events[stream_key] == dim[dim_key]
    return events.join(broadcast_if_small(dim), cond, "left")
