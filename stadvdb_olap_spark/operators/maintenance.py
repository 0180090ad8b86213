"""Table-maintenance planning — the lakehouse OPTIMIZE/compaction job
spec, shared between the batch catalog query (``compaction_plan_orders``)
and the streaming incremental planner
(``streaming/incremental.py:compaction_plan_stream``) so the two can
never diverge: the stream maintains only the tiny per-day file-stats
STATE; the plan itself is always derived by the same
:func:`compaction_groups` fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

COMPACT_ROW_BYTES = 120  # modeled avg row width (bytes)
COMPACT_TARGET = 4000  # target compacted file size (bytes, fixture scale)


def day_file_stats(
    df: DataFrame,
    date_col: str = "o_orderdate",
    row_bytes: int = COMPACT_ROW_BYTES,
) -> DataFrame:
    """Model each ingest day as one small file: ``(d, mon, est_bytes)``
    with est_bytes = row count x a modeled row width. One
    calendar-bounded aggregate — map-side partials, |days| output rows."""
    return df.groupBy(
        F.to_date(date_col).alias("d"),
        F.date_trunc("month", date_col).cast("date").alias("mon"),
    ).agg((F.count(F.lit(1)) * row_bytes).cast("long").alias("est_bytes"))


def compaction_groups(
    files: DataFrame, target: int = COMPACT_TARGET
) -> DataFrame:
    """Bin ADJACENT files within a month partition into merge groups
    near the target size via the cumsum-DIV device — group = (running
    bytes before me) DIV target, the scalable approximation of the
    greedy adjacent fold (no recursion, no sequential stage; compaction
    targets are soft, unlike pack_chunks_512's hard bins). Input:
    ``(d, mon, est_bytes)``; output: one row per (month, group)."""
    w = (
        Window.partitionBy("mon")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = files.withColumn(
        "group_id",
        ((F.sum("est_bytes").over(w) - F.col("est_bytes")) / target).cast(
            "long"
        ),
    )
    return grouped.groupBy("mon", "group_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("est_bytes").cast("long").alias("total_bytes"),
        F.min("d").alias("first_date"),
        F.max("d").alias("last_date"),
    )
