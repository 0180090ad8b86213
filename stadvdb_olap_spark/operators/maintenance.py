"""Storage-layout maintenance: small-file compaction and z-order clustering.

The reference writes through row-at-a-time SQL upserts, so physical layout
is whatever the warehouse B-tree gives it (``/root/reference/ETL/
user_ETL.py:105-117``). A parquet lake at 100 TB lives or dies by layout
instead:

- **Compaction** — streaming/incremental writers leave thousands of small
  files per partition; scans then pay per-file open/footer costs and lose
  vectorization. Rewriting to ~target-sized files is the standard fix
  (same operation as Delta/Iceberg OPTIMIZE, expressed with plain Spark).
- **Z-order clustering** — min/max row-group skipping only prunes on the
  sort column. Interleaving the bits of several columns' rank-buckets
  gives every interleaved column locality, so predicates on ANY of them
  skip files. This is the classic Morton-curve layout (public Delta
  OPTIMIZE ZORDER semantics), built here from approx-quantile buckets +
  bit arithmetic + repartitionByRange — all JVM-side expressions.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for a relation (file-size sum for scans).
    Driver-side metadata only — no job runs."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 256,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_mb``-sized files;
    returns the file count written. Round-robin repartition (not
    coalesce) so output files are even-sized regardless of input skew;
    coalesce would glue neighbors and preserve skew. With
    ``partition_by`` the repartition keys on those columns first so each
    hive partition is written by few tasks (avoiding the
    files = tasks x partitions explosion)."""
    df = spark.read.parquet(path)
    n_files = max(1, math.ceil(estimated_size_bytes(df) / (target_file_mb << 20)))
    if partition_by:
        writer = (
            df.repartition(n_files, *[F.col(c) for c in partition_by])
            .write.mode("overwrite").partitionBy(*partition_by)
        )
    else:
        writer = df.repartition(n_files).write.mode("overwrite")
    writer.parquet(out_path)
    return n_files


def _interleave_bits(bucket_cols: list[Column], bits: int) -> Column:
    """Morton/Z-value: bit j of dimension i lands at position
    j * ndims + i. Pure integer expressions — whole-stage codegen'd."""
    ndims = len(bucket_cols)
    z = F.lit(0).cast("long")
    for i, c in enumerate(bucket_cols):
        for j in range(bits):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * ndims + i))
    return z


def zorder_value(
    df: DataFrame, cols: list[str], bits_per_dim: int = 4
) -> tuple[DataFrame, str]:
    """Attach a z-value column interleaving each column's rank bucket.

    Buckets come from approxQuantile boundaries (equi-depth, so skewed
    distributions still spread across buckets; min/max-scaled buckets
    would collapse under skew). The quantile pass reads only the z-order
    columns; the returned frame carries ``__z`` for range-partitioned
    writing."""
    nb = 1 << bits_per_dim
    probs = [i / nb for i in range(1, nb)]
    bucket_exprs: list[Column] = []
    for c in cols:
        cuts = df.approxQuantile(c, probs, 0.01)
        b = F.lit(0)
        prev = None
        for cut in cuts:
            if prev is not None and cut == prev:
                continue  # duplicate boundary under heavy skew
            b = b + F.when(F.col(c) > cut, 1).otherwise(0)
            prev = cut
        bucket_exprs.append(b.cast("long"))
    return df.withColumn("__z", _interleave_bits(bucket_exprs, bits_per_dim)), "__z"


def zorder_bucket(col: Column, cuts: list) -> Column:
    """Equi-depth bucket id against PINNED boundaries: the count of cuts
    the value exceeds — monotone, so curve locality is preserved. The
    one shared construction for both the published bucket columns and
    the interleaved key (one copy ⇒ they cannot drift apart)."""
    b = F.lit(0)
    for cut in cuts:
        c = cut if isinstance(cut, Column) else F.lit(cut)
        b = b + F.when(col > c, 1).otherwise(0)
    return b.cast("long")


def zorder_key_pinned(
    dims: list[tuple[Column, list]],
    bits_per_dim: int = 4,
) -> Column:
    """Morton z-value over PINNED bucket boundaries — the publishable
    face of :func:`zorder_value` (whose approxQuantile cuts are
    algorithm-specific and not replayable elsewhere): compute the
    equi-depth cuts once, publish them, and every engine/run derives the
    identical key. ``dims`` is [(column, [cut, ...], ...)]; buckets cap
    by construction at ``2^bits_per_dim`` when ``len(cuts) == 2^bits -
    1``. Pure integer/comparison expressions — whole-stage codegen'd,
    exactly replayable in SQL.

    Raises ``ValueError`` when a dimension carries more cuts than the
    per-dimension bit budget can address: bucket ids would exceed
    ``2^bits_per_dim - 1`` and the interleave would silently mask the
    high bits, destroying curve locality with no error."""
    limit = (1 << bits_per_dim) - 1
    for i, (_, cuts) in enumerate(dims):
        if len(cuts) > limit:
            raise ValueError(
                f"dims[{i}] has {len(cuts)} cuts but bits_per_dim="
                f"{bits_per_dim} addresses at most {limit} cuts "
                f"({limit + 1} buckets); raise bits_per_dim or prune cuts"
            )
    bucket_exprs = [zorder_bucket(col, cuts) for col, cuts in dims]
    return _interleave_bits(bucket_exprs, bits_per_dim)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits_per_dim: int = 4,
) -> None:
    """Write ``df`` clustered on the Morton curve of ``cols``:
    range-partition on the z-value (contiguous curve segments per file)
    and sort within partitions, so every listed column gets tight
    per-file min/max ranges — the property file skipping needs. The
    z-value is dropped before writing; it is a layout device, not data."""
    zdf, zcol = zorder_value(df, cols, bits_per_dim)
    (
        zdf.repartitionByRange(n_files, F.col(zcol))
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Algebraic aggregate STATE per key: (n, sum, sumsq) with exact
    decimal sums — the persisted form of an incrementally maintained
    materialized view. States are a commutative monoid, so any partition
    of the input (daily deltas, backfills, late data) merges to the same
    state as a full recompute."""
    from pyspark.sql import functions as F

    v = F.col(value_col).cast("decimal(18,6)")
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("n"),
        F.sum(v).alias("sum_v"),
        F.sum((v * v).cast("decimal(38,12)")).alias("sumsq_v"),
    )


def merge_agg_states(*states: DataFrame) -> DataFrame:
    """Merge any number of state tables (same schema) by key-wise adding
    the components — the incremental-refresh step. Cost: one union + one
    hash aggregate over STATE rows (cardinality = distinct keys), never
    over the underlying facts."""
    from functools import reduce

    from pyspark.sql import functions as F

    merged = reduce(lambda a, b: a.unionByName(b), states)
    keys = [c for c in merged.columns if c not in ("n", "sum_v", "sumsq_v")]
    return merged.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").cast("decimal(18,6)").alias("sum_v"),
        F.sum("sumsq_v").cast("decimal(38,12)").alias("sumsq_v"),
    )


def finalize_agg_state(state: DataFrame) -> DataFrame:
    """Derive the published metrics (count, mean, population variance)
    from a state table — a narrow projection; rounding per compat.py."""
    from pyspark.sql import functions as F

    n = F.col("n")
    mean = F.col("sum_v").cast("double") / n
    meansq = F.col("sumsq_v").cast("double") / n
    # No cosmetic rounding: the decimal->double casts and IEEE divisions
    # are bit-identical across engines, while ROUND(x, 6) on values near
    # 1e10 exceeds 2^53 internally and diverges per engine.
    return state.select(
        *[c for c in state.columns if c not in ("n", "sum_v", "sumsq_v")],
        n.alias("n"),
        mean.alias("mean_v"),
        (meansq - mean * mean).alias("var_v"),
    )


def join_delta(
    base_left: DataFrame,
    delta_left: DataFrame,
    base_right: DataFrame,
    delta_right: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental inner-join maintenance: the NEW join rows created by
    appending ``delta_left``/``delta_right`` to their base tables.

        Δ(A ⋈ B) = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB

    (append-only deltas; for updates/deletes run the same identity on
    the retraction sets). Full refresh re-joins |A|·|B|-scale inputs;
    the delta form touches each base table once against a delta-sized
    probe — with the delta broadcast, the base is scanned in place and
    never shuffled, the same per-ingest-cost-tracks-the-batch shape as
    ``dedup_incremental_delta``. Certified by the catalog oracle: base
    join ∪ this delta == full join of the appended tables, exactly."""
    d_l = F.broadcast(delta_left)
    d_r = F.broadcast(delta_right)
    return (
        d_l.join(base_right, on)
        .unionByName(base_left.join(d_r, on))
        .unionByName(delta_left.join(d_r, on))
    )


# ---------------------------------------------------------------------------
# Compaction PLANNING (which files to rewrite) — shared between the batch
# catalog query (``compaction_plan_orders``) and the streaming incremental
# planner (``streaming/incremental.py:compaction_plan_stream``) so the two
# can never diverge: the stream maintains only the tiny per-day file-stats
# STATE; the plan itself is always derived by the same
# :func:`compaction_groups` fold. (:func:`compact_parquet` above EXECUTES
# a rewrite; these decide one.)
# ---------------------------------------------------------------------------

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


def compaction_groups(files: DataFrame, target: int = COMPACT_TARGET) -> DataFrame:
    """Bin ADJACENT files within a month partition into merge groups
    near the target size via the cumsum-DIV device — group = (running
    bytes before me) DIV target, the scalable approximation of the
    greedy adjacent fold (no recursion, no sequential stage; compaction
    targets are soft, unlike pack_chunks_512's hard bins). Input:
    ``(d, mon, est_bytes)``; output: one row per (month, group)."""
    from pyspark.sql import Window

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


def hilbert_key_pinned(
    x: Column, y: Column, order_bits: int = 4
) -> Column:
    """Hilbert-curve index of a 2D bucket pair — the locality-better
    alternative to the Morton interleave (``zorder_key_pinned``) for
    layout clustering: the Hilbert curve never takes the long diagonal
    jumps Morton takes at quadrant seams, so per-file min/max zones are
    tighter boxes and box predicates skip more files (the audit
    ``hilbert_vs_zorder_prune_orders`` quantifies it; lakehouse
    clustering services made the same move for the same reason).

    The classic xy2d walk (quadrant accumulate + rotate/reflect),
    UNROLLED over the ``order_bits`` levels into pure integer/CASE
    column expressions — whole-stage codegen'd, no UDF, and mechanically
    replayable in SQL (the oracle generates the same unrolled steps).
    The quadrant term ``(3*rx) XOR ry`` is lowered to the arithmetic
    identity ``3*rx + ry - 2*rx*ry`` so no engine needs a bitwise XOR.
    Inputs must already be bucket ids in ``[0, 2^order_bits)``; the
    validity of the unrolled walk (bijective, unit-step adjacent — the
    Hilbert property) is pinned by ``test_hilbert_key_is_a_hilbert_curve``."""
    if order_bits > 8:
        # Each unrolled level re-substitutes the running (x, y)
        # expressions into every branch (~5x tree growth per level);
        # past 8 levels the expression tree stalls Catalyst/codegen at
        # plan time. A finer grid needs the walk materialized as
        # per-level intermediate COLUMNS (one withColumn per step, the
        # shape the SQL oracle's sequential CTEs use) — fail loudly
        # rather than hang the planner.
        raise ValueError(
            f"order_bits={order_bits} would unroll a ~5^{order_bits}-node"
            " column expression; materialize per-level columns instead"
            " (<= 8 supported as a pure expression)"
        )
    n = 1 << order_bits
    d = F.lit(0).cast("long")
    cx, cy = x.cast("long"), y.cast("long")
    s = n // 2
    while s > 0:
        rx = F.floor(cx / s) % 2
        ry = F.floor(cy / s) % 2
        d = d + F.lit(s * s) * (3 * rx + ry - 2 * rx * ry)
        # rotate: when ry==0 → (reflect about n-1 when rx==1, then swap)
        refl_x = F.when(rx == 1, F.lit(n - 1) - cx).otherwise(cx)
        refl_y = F.when(rx == 1, F.lit(n - 1) - cy).otherwise(cy)
        nx = F.when(ry == 0, refl_y).otherwise(cx)
        ny = F.when(ry == 0, refl_x).otherwise(cy)
        cx, cy = nx, ny
        s //= 2
    return d
