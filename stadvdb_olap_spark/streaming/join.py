"""Stream-stream interval join (click→purchase attribution).

The reference has no streaming surface at all — its batch loop re-reads
and re-joins everything per run (``/root/reference/app.py:12-26``). The
Structured-Streaming-native equivalent of a time-bounded event
correlation is the stream-stream inner join with watermarks on BOTH
sides plus a time-range join condition: Spark derives the state
retention for each side from the watermark and the interval bound, so
join state is evicted as event time advances instead of growing with
the stream.

The same plan body works on batch DataFrames (watermarks are applied
only when the inputs are streaming), which is what the oracle-checked
catalog twin `click_purchase_attribution` runs.

Scale notes: the join shuffles both sides on the equi-key (user_id);
state per key is bounded by (watermark + within). At 100 TB-equivalent
event rates the knobs that matter are the watermark horizon (state
size) and `spark.sql.shuffle.partitions` for the state-store count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_click_purchase(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Project the two event roles into disjoint column namespaces so the
    self-join carries no ambiguous names (works on batch and streams)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return clicks, purchases


def click_purchase_attribution(
    events_clicks: DataFrame,
    events_purchases: DataFrame | None = None,
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Every (click, purchase) pair by the same user where the purchase
    lands in [click_ts, click_ts + within]. Pass one events frame (it is
    split by role) or two pre-split frames.

    Streaming inputs get watermarks on both event-time columns — required
    by Spark for stream-stream joins with a time condition, and the
    mechanism that bounds the join state store.

    ``how="left_outer"`` additionally emits every UNMATCHED click with
    NULL purchase columns — the "clicks that never converted" feed. On
    streams the null row for a click can only be emitted once the
    watermark has passed ``click_ts + within`` (before that a matching
    purchase could still arrive), so outer results trail the inner ones
    by the watermark delay: completeness-vs-latency is set by the
    ``watermark`` horizon, state size by ``watermark + within`` — the
    same dial at any event rate.
    """
    if events_purchases is None:
        clicks, purchases = split_click_purchase(events_clicks)
    else:
        clicks, purchases = events_clicks, events_purchases
    if clicks.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        purchases = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}"))
    )
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type {how!r}")
    return clicks.join(purchases, cond, how).select(
        "click_id", "purchase_id", "user_id", "click_ts", "purchase_ts",
        "purchase_value",
    )
