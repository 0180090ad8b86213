"""Deterministic key-subset deduplication — SURVEY.md §2.5 (D1/D2).

The reference relies on pandas ``drop_duplicates(subset=...)`` keep-first
semantics (``/root/reference/ETL/user_ETL.py:58``, ``loc_ETL.py:54``,
``prod_ETL.py:61``, ``fact_ETL.py:54``), which is only deterministic because
pandas is single-threaded and arrival-ordered. Spark's ``dropDuplicates``
keeps an ARBITRARY row per key under parallelism, so this engine makes the
tiebreak explicit: a ``row_number`` window over user-supplied order columns.

Scale notes: the window is a single hash-shuffle on the dedup keys — the
same shuffle ``dropDuplicates`` would do — so determinism costs only the
within-partition sort. Skewed keys are handled by AQE skew-join/partition
splitting; for the common "key is unique-ish" case the sort is tiny.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__dedup_rn__"


def dedup_keep_first(
    df: DataFrame,
    keys: Iterable[str],
    order_by: Iterable[Column | str],
    coarse_partition_by: Iterable[str] | None = None,
) -> DataFrame:
    """Keep exactly one row per ``keys`` — the first under ``order_by``.

    ``order_by`` must be a total order within each key group (e.g. a unique
    id) for fully deterministic output; ties fall back to arbitrary choice
    exactly like vanilla Spark.

    ``coarse_partition_by`` (a strict subset of ``keys``) is the scale
    lever: the window shuffles on ONLY those columns, and group boundaries
    for the remaining key columns are detected with ``lag`` inside the
    sorted partition. Use it when a downstream join/aggregate keys on the
    coarse columns — the exchange this window introduces then SATISFIES the
    join's distribution requirement and Catalyst inserts no second shuffle
    (e.g. dedup lineitem on (orderkey, linenumber) coarse-partitioned on
    orderkey, then join orders on orderkey: one shuffle total).
    """
    keys = list(keys)
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if not order_cols:
        raise ValueError("order_by must be non-empty for deterministic dedup")

    if coarse_partition_by is None:
        w = Window.partitionBy(*keys).orderBy(*order_cols)
        return (
            df.withColumn(_RN, F.row_number().over(w))
            .filter(F.col(_RN) == 1)
            .drop(_RN)
        )

    coarse = list(coarse_partition_by)
    fine = [k for k in keys if k not in coarse]
    if not fine or set(coarse) - set(keys):
        raise ValueError("coarse_partition_by must be a strict subset of keys")
    w = Window.partitionBy(*coarse).orderBy(
        *[F.col(c) for c in fine], *order_cols
    )
    fine_struct = F.struct(*[F.col(c) for c in fine])
    prev = F.lag(fine_struct).over(w)
    is_first = prev.isNull() | ~fine_struct.eqNullSafe(prev)
    return df.withColumn(_RN, is_first).filter(F.col(_RN)).drop(_RN)
