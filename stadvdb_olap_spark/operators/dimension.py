"""Dimension builder — the Spark-native shape of the reference's
dimension ETL (``extractUser`` ``/root/reference/ETL/user_ETL.py:61-144``,
``extractLocation`` ``loc_ETL.py:61-137``, ``extractDate``
``date_ETL.py:53-124``, ``extractProduct`` ``prod_ETL.py:65-139``).

The reference's per-dimension loop is: clean -> dedup-by-business-key ->
upsert -> harvest DB surrogate keys via RETURNING -> join back -> emit a
(nat_key, surrogate_key) map. Here the whole thing collapses into one lazy
plan: dedup deterministically, compute the surrogate key in-engine
(functions.keys), and the key map is just a projection — no second network
hop, no driver-side dict.
"""

from __future__ import annotations

from collections.abc import Iterable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stadvdb_olap_spark.functions.keys import surrogate_key
from stadvdb_olap_spark.operators.dedup import dedup_keep_first


@dataclass(frozen=True)
class Dimension:
    """A built dimension: the conformed table and its natural->surrogate
    key map (the reference's ``mapping_df``, user_ETL.py:144)."""

    table: DataFrame  # surrogate_key + business key + attributes
    key_map: DataFrame  # nat_key(s) + surrogate_key


def build_dimension(
    source: DataFrame,
    business_key: Iterable[str],
    attrs: Iterable[str],
    nat_key: Iterable[str],
    order_by: Iterable[Column | str] | None = None,
    key_method: str = "xxhash64",
    key_col: str = "surrogate_key",
) -> Dimension:
    """Build a conformed dimension from a cleaned source.

    - ``business_key``: the uniqueness/conflict columns (the reference's ON
      CONFLICT key, e.g. ``username`` user_ETL.py:110).
    - ``attrs``: non-key attributes carried into the dimension.
    - ``nat_key``: source natural-key columns for the key map (e.g. the
      OLTP ``id`` aliased ``nat_key``, user_ETL.py:72).
    - ``order_by``: deterministic keep-first tiebreak; defaults to nat_key.
    """
    business_key = list(business_key)
    attrs = list(attrs)
    nat_key = list(nat_key)
    order_by = list(order_by) if order_by is not None else list(nat_key)

    sk = surrogate_key(business_key, method=key_method)
    deduped = dedup_keep_first(source, business_key, order_by)
    table = deduped.select(
        sk.alias(key_col), *business_key, *[c for c in attrs if c not in business_key]
    )
    # Every source row maps via its business key — including rows dropped by
    # dedup (they share the business key, hence the same deterministic
    # surrogate). This mirrors the reference's inner-join-back (J2/J3,
    # user_ETL.py:125) but needs no join at all: pure projection.
    key_map = source.select(*nat_key, sk.alias(key_col)).distinct()
    return Dimension(table=table, key_map=key_map)


def scd2_history(
    changes: DataFrame,
    keys: Iterable[str],
    attrs: Iterable[str],
    ts_col: str,
    tiebreak: Iterable[str],
) -> DataFrame:
    """Type-2 slowly-changing dimension from a change feed.

    The reference only does SCD type-1 last-write-wins upserts
    (``ETL/user_ETL.py:105-114``); this is the versioned uplift: one output
    row per (key, attribute-run) with ``effective_from`` / ``effective_to``
    / ``version`` / ``is_current``. Change points are rows whose attributes
    null-safely differ from the previous row in (ts, tiebreak) order.

    Plan shape: both windows partition on ``keys``, so the whole history
    builds with ONE shuffle of the change feed (the second window reuses the
    first's partitioning); no self-join, no driver state. Deterministic
    under any parallelism because ``tiebreak`` totally orders same-timestamp
    changes.
    """
    from pyspark.sql.window import Window

    keys = list(keys)
    attrs = list(attrs)
    tiebreak = list(tiebreak)
    w = Window.partitionBy(*keys).orderBy(ts_col, *tiebreak)

    flagged = changes.select(*keys, *attrs, ts_col, *tiebreak).select(
        "*",
        F.row_number().over(w).alias("__rn"),
        *[F.lag(c).over(w).alias(f"__prev_{c}") for c in attrs],
    )
    is_change = F.lit(False)
    for c in attrs:
        is_change = is_change | ~F.col(c).eqNullSafe(F.col(f"__prev_{c}"))
    points = flagged.filter((F.col("__rn") == 1) | is_change)

    w2 = Window.partitionBy(*keys).orderBy(ts_col, *tiebreak)
    eff_to = F.lead(ts_col).over(w2)
    return points.select(
        *keys,
        *attrs,
        F.col(ts_col).alias("effective_from"),
        eff_to.alias("effective_to"),
        F.row_number().over(w2).alias("version"),
        eff_to.isNull().alias("is_current"),
    )


def scd2_validity_audit(
    hist: DataFrame,
    keys: Iterable[str],
) -> DataFrame:
    """Validity-interval audit over an SCD2 history — the DQ checks a
    warehouse runs on its versioned dimensions before trusting
    point-in-time joins:

    - ``overlap``: a version's ``effective_to`` is AFTER the next
      version's ``effective_from`` (two versions claim the same
      instant; a PIT join would double-match). A NULL ``effective_to``
      on a NON-terminal version counts here too — open-ended means
      +infinity, which overlaps everything after it,
    - ``gap``: ``effective_to`` is BEFORE the next ``effective_from``
      (instants with no effective version; a PIT join silently drops),
    - ``bad_current_count``: a key whose ``is_current`` row count is
      not exactly 1,
    - ``version_holes``: version numbers not dense 1..n (a duplicated
      version compensating for a missing one still fires — the rule
      checks min, max, AND distinctness against the row count).

    Output: one row per rule with the violating-key and violation
    counts. A history built by :func:`scd2_history` passes all four by
    construction (tested); the audit exists for histories that arrived
    from OUTSIDE — restored backups, vendor feeds, hand-patched
    tables. One shuffle on the keys (window + aggregate share it)."""
    from pyspark.sql.window import Window

    keys = list(keys)
    # effective_from tiebreak keeps lead() deterministic even on a
    # malformed history carrying duplicate version numbers
    w = Window.partitionBy(*keys).orderBy("version", "effective_from")
    flagged = hist.select(
        *keys,
        "version",
        "effective_to",
        "is_current",
        F.lead("effective_from").over(w).alias("__nxt_from"),
    )
    per_key = flagged.groupBy(*keys).agg(
        F.sum(
            F.when(
                F.col("__nxt_from").isNotNull()
                & (
                    F.col("effective_to").isNull()  # open-ended mid-history
                    | (F.col("effective_to") > F.col("__nxt_from"))
                ),
                1,
            ).otherwise(0)
        ).alias("n_overlap"),
        F.sum(
            F.when(
                F.col("__nxt_from").isNotNull()
                & (F.col("effective_to") < F.col("__nxt_from")),
                1,
            ).otherwise(0)
        ).alias("n_gap"),
        F.sum(F.col("is_current").cast("long")).alias("n_current"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min("version").alias("v_min"),
        F.max("version").alias("v_max"),
        F.countDistinct("version").alias("v_distinct"),
    )
    # coalesce: an EMPTY history is vacuously valid — it must report
    # four zero rows, not four NULL rows a `== 0` gate can't pass
    z = lambda c: F.coalesce(c.cast("long"), F.lit(0)).cast("long")  # noqa: E731
    summary = per_key.agg(
        z(F.sum("n_overlap")).alias("overlap_v"),
        z(F.sum((F.col("n_overlap") > 0).cast("long"))).alias("overlap_k"),
        z(F.sum("n_gap")).alias("gap_v"),
        z(F.sum((F.col("n_gap") > 0).cast("long"))).alias("gap_k"),
        z(F.sum((F.col("n_current") != 1).cast("long"))).alias("cur_k"),
        z(
            F.sum(
                (
                    (F.col("v_min") != 1)
                    | (F.col("v_max") != F.col("n_rows"))
                    | (F.col("v_distinct") != F.col("n_rows"))
                ).cast("long")
            )
        ).alias("holes_k"),
    )
    return summary.select(
        F.expr(
            "stack(4,"
            " 'overlap', overlap_k, overlap_v,"
            " 'gap', gap_k, gap_v,"
            " 'bad_current_count', cur_k, cur_k,"
            " 'version_holes', holes_k, holes_k)"
            " AS (rule, n_violating_keys, n_violations)"
        )
    )
