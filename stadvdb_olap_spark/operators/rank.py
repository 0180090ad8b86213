"""Distributed global order statistics WITHOUT the single-partition
window funnel.

``row_number().over(Window.orderBy(...))`` — a window with no
``partitionBy`` — plans as ``Exchange SinglePartition`` + sort: every
row funnels through ONE task, which is fatal at fact grain (Spark
itself warns "Moving all data to a single partition"). The fix here is
a two-phase offset rank over a DETERMINISTIC coarse bucketing of the
sort key:

1. ``bucket`` — a caller-supplied expression that is a pure, monotone
   non-decreasing function of the leading order key (floor-division of
   a numeric key, the day/month of a date key). It plays the role the
   range-partition id plays in a global ORDER BY, but is derived from
   the ROW VALUE, not from physical placement.
2. local rank: ``row_number`` over ``Window.partitionBy(bucket)
   .orderBy(keys)`` — ONE hash shuffle of the data, each bucket sorted
   independently in parallel.
3. global offset: per-bucket counts hash-aggregate to |buckets| rows;
   a cumulative sum over that tiny post-aggregation relation (the only
   single-partition window, bounded by the bucket count) is broadcast
   back and added.

Why not ``repartitionByRange`` + ``monotonically_increasing_id`` (the
textbook zipWithIndex shape)? Spark's RangePartitioner SAMPLES its
bounds with an rdd-id-seeded RNG, so the ranked relation's two
consumers (the count branch and the output branch) are two separate
exchanges with DIFFERENT bounds whenever exchange reuse doesn't kick
in — offsets computed for one layout get added to local ranks from
another, silently corrupting ranks (observed: a modulus filter over
such ranks returned a different row count per run). A value-derived
bucket makes both passes pure functions of the data: deterministic
under recomputation, task retry, AQE re-planning, and plain sessions,
with no ``localCheckpoint``/``persist`` materialization.

Scale contract: buckets are the unit of sort parallelism — size the
bucket width so the largest bucket fits one task comfortably (aim for
~10x the shuffle partition count; at 100 TB pick widths from table
stats the same way a clustering writer picks split points). Order keys
must be NON-NULL (the offset join is an inner equi-join on the bucket)
and must form a total order (include a unique tiebreak) for
deterministic ranks.

Used by ``quantile_normalize_order_totals``, ``decile_bins_order_
totals``, ``zonemap_prune_layouts_orders`` and ``systematic_sample_
orders`` (plans/), replacing their former unpartitioned windows;
``tests/test_plan_audit.py`` rejects any new fact-grain
single-partition window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _checked_bucket(bucket: Column) -> Column:
    # A NULL bucket would silently corrupt EVERY rank, not just the null
    # rows: NULL sorts first in the offsets cumsum (shifting every other
    # bucket's offset) while the null rows themselves vanish at the inner
    # equi-join. Fail loudly at evaluation time instead — the check rides
    # the bucket expression itself, so column pruning can't elide it.
    return F.coalesce(
        bucket,
        F.raise_error(
            F.lit("global_row_number: bucket expression evaluated to NULL")
        ),
    )


def _bucket_counts(b: DataFrame) -> DataFrame:
    return b.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__cnt"))


def _rank_with_offsets(
    b: DataFrame, counts: DataFrame, order_keys: list[str], out: str
) -> DataFrame:
    off_w = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__bkt",
        F.coalesce(F.sum("__cnt").over(off_w), F.lit(0))
        .cast("long")
        .alias("__off"),
    )
    lw = Window.partitionBy("__bkt").orderBy(*order_keys)
    return (
        b.join(F.broadcast(offsets), "__bkt")
        .withColumn(
            out,
            (F.col("__off") + F.row_number().over(lw)).cast("long"),
        )
        .drop("__bkt", "__off")
    )


def global_row_number(
    df: DataFrame,
    order_keys: list[str],
    bucket: Column,
    out: str = "gr",
) -> DataFrame:
    """All columns of ``df`` plus BIGINT ``out`` = the 1-based global
    ``row_number`` under ``ORDER BY order_keys`` — one hash shuffle of
    the data plus a broadcast of per-bucket cumulative offsets, never
    an ``Exchange SinglePartition`` at data grain.

    ``bucket`` must be a deterministic, monotone non-decreasing
    function of the leading order key(s): rows in a smaller bucket must
    never sort after rows in a larger one. Monotonicity is the caller's
    contract (a floor-division or date-truncation of the leading key
    satisfies it by construction). A NULL bucket raises at runtime
    rather than silently shifting every offset.
    """
    b = df.withColumn("__bkt", _checked_bucket(bucket))
    return _rank_with_offsets(b, _bucket_counts(b), order_keys, out)


def global_ntile(
    df: DataFrame,
    order_keys: list[str],
    n: int,
    bucket: Column,
    out: str = "bucket",
) -> DataFrame:
    """All columns of ``df`` plus BIGINT ``out`` = ``ntile(n)`` under
    ``ORDER BY order_keys``, via :func:`global_row_number` plus the
    closed-form SQL ntile bucket assignment (the first ``N mod n``
    buckets hold ``ceil(N/n)`` rows, the rest ``floor(N/n)`` — the
    standard-SQL definition both Spark and DuckDB implement). Pure
    BIGINT arithmetic on the global rank; same plan shape as
    :func:`global_row_number` — the total N is summed from the same
    per-bucket counts relation the offsets use (one ReusedExchange,
    never a second pass over the ranked data's full lineage).
    """
    b = df.withColumn("__bkt", _checked_bucket(bucket))
    counts = _bucket_counts(b)
    ranked = _rank_with_offsets(b, counts, order_keys, "__gr")
    total = counts.agg(F.sum("__cnt").cast("long").alias("__n"))
    return ntile_from_global_rank(
        ranked, "__gr", n, out=out, total=total
    ).drop("__gr")


def ntile_from_global_rank(
    df: DataFrame,
    rank_col: str,
    n: int,
    out: str = "bucket",
    total: DataFrame | None = None,
) -> DataFrame:
    """BIGINT ``out`` = the ntile(n) bucket of an ALREADY-COMPUTED
    1-based dense global rank column (e.g. a :func:`global_row_number`
    output) — one broadcast row count plus closed-form integer
    arithmetic, no second rank pass. ``rank_col`` must hold exactly
    1..N once each. Pass ``total`` (a 1-row DataFrame with BIGINT
    ``__n`` = N) when N is already known from a cheaper relation;
    otherwise it is counted from ``df``."""
    if total is None:
        total = df.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    # Pure BIGINT: the first (N % n) buckets hold (N DIV n)+1 rows, the
    # rest (N DIV n). CASE short-circuits, so the ELSE's DIV never sees
    # a zero divisor (N < n puts every rank in the WHEN branch).
    expr = (
        f"CAST(CASE WHEN {rank_col} <= (__n % {n}) * ((__n DIV {n}) + 1) "
        f"THEN ({rank_col} - 1) DIV ((__n DIV {n}) + 1) "
        f"ELSE (__n % {n}) + "
        f"({rank_col} - (__n % {n}) * ((__n DIV {n}) + 1) - 1) "
        f"DIV (__n DIV {n}) "
        f"END + 1 AS BIGINT)"
    )
    return (
        df.crossJoin(F.broadcast(total))
        .withColumn(out, F.expr(expr))
        .drop("__n")
    )
