"""Size-gated broadcast hinting for dimension joins.

The reference joins every dimension in pandas driver memory
(``fact_ETL.py:91-107`` merges); the Spark-first translation is a broadcast
hash join — but ONLY while the dimension actually fits in an executor.
TPC-H-geometry dims (``customer``, ``part``, ``supplier``) scale linearly
with the fact table: at a 100 TB scale factor they are multi-billion-row
tables, and a forced ``F.broadcast`` either trips the 8 GB broadcast hard
limit or OOMs the driver.

``broadcast_if_small`` applies the hint only when Catalyst's own size
estimate for the plan is under ``spark.sql.autoBroadcastJoinThreshold`` —
the same statistic AQE consults. Above the threshold it returns the frame
un-hinted, so the optimizer (CBO statically, AQE at runtime) is free to
pick SortMergeJoin / ShuffledHashJoin, or still to broadcast when the
*runtime* size turns out small. Fixed-cardinality tables (``nation``,
``region``, single-row scalar aggregates) keep hard ``F.broadcast`` hints
at their call sites; this gate is for anything that grows with the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "broadcast_if_small",
    "interval_overlap_join",
    "parse_byte_conf",
    "salted_equi_join",
]

_UNITS = {
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
    "t": 1 << 40,
    "tb": 1 << 40,
    "p": 1 << 50,
    "pb": 1 << 50,
}


def parse_byte_conf(value: str) -> int:
    """Parse a Spark byte-size conf string (``"10485760b"``, ``"10MB"``,
    ``"-1"``) into bytes. ``-1`` (broadcast disabled) passes through."""
    s = str(value).strip().lower()
    num = s
    mult = 1
    for suffix in sorted(_UNITS, key=len, reverse=True):
        if s.endswith(suffix):
            num, mult = s[: -len(suffix)], _UNITS[suffix]
            break
    return int(num.strip()) * mult


def _estimated_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes estimate for the optimized plan (driver-side
    planning only — nothing executes). Returns None if unavailable."""
    try:
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j converts scala BigInt to int; fall back to toString otherwise.
        return size if isinstance(size, int) else int(size.toString())
    except Exception:  # pragma: no cover - py4j surface differences
        return None


def broadcast_if_small(
    df: DataFrame,
    threshold_bytes: int | None = None,
    size_proxy: DataFrame | None = None,
) -> DataFrame:
    """Return ``F.broadcast(df)`` when Catalyst estimates the plan under
    the broadcast threshold, else ``df`` unchanged (strategy left to
    CBO/AQE).

    ``threshold_bytes`` overrides ``spark.sql.autoBroadcastJoinThreshold``
    (mainly for tests). A threshold of ``-1``/``0`` — broadcast disabled —
    never hints. An unavailable size estimate also declines to hint:
    un-hinted is always safe, because AQE can still choose a broadcast
    join from the observed runtime size.

    ``size_proxy``: gate on this frame's estimate instead of ``df``'s own.
    Catalyst's static join-output estimates multiply row counts, so a
    lookup enriched dim-side by a guaranteed-1:1 join (e.g. customer ⋈
    25-row nation) gets an estimate orders of magnitude above its true
    size; the pre-join base table is the honest proxy. The caller asserts
    the 1:1-ness — only pass a proxy whose cardinality provably bounds
    ``df``'s.
    """
    if threshold_bytes is None:
        conf = df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
        threshold_bytes = parse_byte_conf(conf)
    if threshold_bytes <= 0:
        return df
    est = _estimated_size_bytes(size_proxy if size_proxy is not None else df)
    if est is not None and est <= threshold_bytes:
        return F.broadcast(df)
    return df


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with manual key salting for skew: the big ``left`` side
    scatters each row to one of ``n_salts`` sub-keys (deterministic:
    ``xxhash64(key, other-cols) mod n``), and ``right`` replicates every
    row across ALL ``n_salts`` sub-keys via a generator — so a hot key's
    probe rows spread over ``n_salts`` reducers instead of stalling one.

    The join RESULT is exactly the plain equi-join (each left row still
    meets every matching right row exactly once); only the shuffle
    distribution changes. Replication multiplies the right side by
    ``n_salts`` — use for a small-but-not-broadcastable right side against
    a skewed big left. AQE's skew-join mitigation covers the adaptive case;
    this operator pins the plan where the hot keys are known a priori.

    Output columns: all of ``left`` then all of ``right`` (minus its key,
    which duplicates ``left``'s on inner joins).
    """
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    if how != "inner":
        # Outer variants need null-key handling on the salted side;
        # the skew pattern in practice is the inner fact-lookup join.
        raise ValueError("salted_equi_join supports how='inner' only")
    if "__salt" in left.columns or "__salt" in right.columns:
        raise ValueError("inputs must not already have a __salt column")
    salt = F.pmod(F.xxhash64(F.col(left_key), *left.columns), F.lit(n_salts))
    l_salted = left.withColumn("__salt", salt)
    r_replicated = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = l_salted.join(
        r_replicated,
        (l_salted[left_key] == r_replicated[right_key])
        & (l_salted["__salt"] == r_replicated["__salt"]),
        how,
    )
    keep = [l_salted[c] for c in left.columns] + [
        r_replicated[c] for c in right.columns if c != right_key
    ]
    return joined.select(*keep)


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """All (a, b) pairs whose [start, end] microsecond intervals overlap
    (inclusive endpoints), without the naive theta-join.

    The standard Spark shape for temporal joins: each interval explodes
    into the fixed-width time buckets it spans, the join runs as an
    EQUI-join on the bucket id, the true overlap predicate filters the
    collisions, and a distinct collapses pairs that met in several
    buckets. Cost tracks intervals x buckets-spanned + genuine temporal
    collisions — never |A| x |B|; pick ``bucket_us`` near the typical
    interval length so most intervals explode to O(1) rows.

    Both inputs must carry only the columns the caller wants in the
    output (plus the bounds); all of them key the final distinct — and
    the two column sets must be DISJOINT (checked), or the post-join
    bound references would be ambiguous. For a self-join, alias one
    side's columns first.
    """
    shared = set(a.columns) & set(b.columns)
    if shared:
        raise ValueError(
            f"interval_overlap_join requires disjoint column names; "
            f"shared: {sorted(shared)} — alias one side first"
        )
    # Integer `div` keeps bucketing exact (and monotone) at any epoch.
    ab = a.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{a_start} div {bucket_us}"),
                F.expr(f"{a_end} div {bucket_us}"),
            )
        ),
    )
    bb = b.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{b_start} div {bucket_us}"),
                F.expr(f"{b_end} div {bucket_us}"),
            )
        ),
    )
    return (
        ab.join(bb, "__bucket")
        .filter(
            (F.col(a_start) <= F.col(b_end))
            & (F.col(b_start) <= F.col(a_end))
        )
        .drop("__bucket")
        .distinct()
    )
