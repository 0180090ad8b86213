"""Distributed global order statistics WITHOUT the single-partition
window funnel.

``row_number().over(Window.orderBy(...))`` — i.e. a window with no
``partitionBy`` — plans as ``Exchange SinglePartition`` + sort: every row
funnels through ONE task, which is fatal at fact grain (Spark itself
warns "Moving all data to a single partition"). A global ORDER BY does
NOT have this problem: it range-partitions the sort. This module gives
global ranks the same range-partitioned shape:

two-pass offset rank
    1. ``repartitionByRange`` on the order keys — one full-data shuffle,
       the identical machinery a global ORDER BY uses; ascending key
       ranges land in ascending partition ids.
    2. ``sortWithinPartitions`` + ``monotonically_increasing_id`` — the
       id packs the partition id into the upper bits and a CONSECUTIVE
       0-based in-partition counter into the lower 33, so
       ``pid = id >> 33`` and ``local_rank = (id & (2^33-1)) + 1`` come
       out of pure JVM bit math, no Python, no extra shuffle.
    3. per-partition row counts (= max local rank) aggregate to
       |shuffle partitions| rows; a cumulative-sum window over THAT tiny
       relation (the only single-partition window, bounded by the
       partition count) yields each partition's global offset, broadcast
       back and added.

Determinism despite ``monotonically_increasing_id``'s nondeterministic
flag: the explicit ``sortWithinPartitions`` on a caller-guaranteed
UNIQUE key list fixes every partition's row order before ids are
assigned, so recomputation (task retry, branch re-evaluation) reproduces
identical ranks; additionally both consumers of the ranked relation
share one exchange subtree, which Spark's exchange reuse dedupes. The
lower-33-bit counter caps a partition at 2^33 rows — ordinary partition
sizing at 100 TB keeps partitions ~6 orders of magnitude below that.

Used by ``quantile_normalize_order_totals``, ``decile_bins_order_totals``
and ``zonemap_prune_layouts_orders`` (plans/), replacing their former
unpartitioned windows; ``tests/test_plan_audit.py`` now rejects any new
fact-grain single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LOW_BITS = (1 << 33) - 1


def global_row_number(
    df: DataFrame, order_keys: list[str], out: str = "gr"
) -> DataFrame:
    """All columns of ``df`` plus BIGINT ``out`` = the 1-based global
    ``row_number`` under ``ORDER BY order_keys`` — computed with ONE
    range shuffle of the data and a broadcast of per-partition offsets,
    never an ``Exchange SinglePartition`` at data grain.

    ``order_keys`` must be a deterministic TOTAL order (include a unique
    tiebreak column); otherwise ranks within ties are partition-order
    dependent, exactly as with a window ``row_number``.
    """
    parts = (
        df.repartitionByRange(*[F.col(k) for k in order_keys])
        .sortWithinPartitions(*order_keys)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright("__mid", 33).cast("long"))
        .withColumn(
            "__lr",
            (F.col("__mid").bitwiseAND(F.lit(_LOW_BITS)) + 1).cast("long"),
        )
        .drop("__mid")
    )
    counts = parts.groupBy("__pid").agg(F.max("__lr").alias("__cnt"))
    off_w = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(off_w), F.lit(0))
        .cast("long")
        .alias("__off"),
    )
    return (
        parts.join(F.broadcast(offsets), "__pid")
        .withColumn(out, (F.col("__off") + F.col("__lr")).cast("long"))
        .drop("__pid", "__lr", "__off")
    )


def global_ntile(
    df: DataFrame, order_keys: list[str], n: int, out: str = "bucket"
) -> DataFrame:
    """All columns of ``df`` plus BIGINT ``out`` = ``ntile(n)`` under
    ``ORDER BY order_keys``, via :func:`global_row_number` plus the
    closed-form SQL ntile bucket assignment (the first ``N mod n``
    buckets hold ``ceil(N/n)`` rows, the rest ``floor(N/n)`` — the
    standard-SQL definition both Spark and DuckDB implement). Pure
    BIGINT arithmetic on the global rank; same plan shape as
    :func:`global_row_number` plus one broadcast 1-row count.
    """
    ranked = global_row_number(df, order_keys, out="__gr")
    total = df.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    # Pure BIGINT: the first (N % n) buckets hold (N DIV n)+1 rows, the
    # rest (N DIV n). CASE short-circuits, so the ELSE's DIV never sees
    # a zero divisor (N < n puts every rank in the WHEN branch).
    bucket = (
        f"CAST(CASE WHEN __gr <= (__n % {n}) * ((__n DIV {n}) + 1) "
        f"THEN (__gr - 1) DIV ((__n DIV {n}) + 1) "
        f"ELSE (__n % {n}) + "
        f"(__gr - (__n % {n}) * ((__n DIV {n}) + 1) - 1) DIV (__n DIV {n}) "
        f"END + 1 AS BIGINT)"
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(out, F.expr(bucket))
        .drop("__gr", "__n")
    )
