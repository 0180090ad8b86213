"""Structured Streaming surface: incremental loads, windowed aggregates,
custom stateful sessionization."""

from stadvdb_olap_spark.streaming.incremental import incremental_upsert_stream
from stadvdb_olap_spark.streaming.windowed import windowed_event_aggregate

__all__ = ["incremental_upsert_stream", "windowed_event_aggregate"]
