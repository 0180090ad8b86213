"""Fact construction — FK resolution via broadcast joins.

Reference counterpart: ``extractFact`` (``/root/reference/ETL/fact_ETL.py:
79-157``) builds 4 driver-side Python dicts from the dimension key maps
(fact_ETL.py:115-118) and resolves fact FKs with ``Series.map`` + a
keep-only-mapped mask (fact_ETL.py:60-74) — a hand-rolled broadcast hash
join that cannot scale past driver memory.

Spark-native: each key map is a DataFrame; FK resolution is a join the
planner can execute as BroadcastHashJoin while the map is small and
gracefully degrade to shuffle/sort-merge when it is not. The referential-
integrity filter (F3) is the inner join itself.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stadvdb_olap_spark.operators.joins import broadcast_if_small


def resolve_foreign_key(
    fact: DataFrame,
    key_map: DataFrame,
    fact_key: Iterable[str] | str,
    map_key: Iterable[str] | str,
    surrogate_col: str = "surrogate_key",
    out_col: str | None = None,
    how: str = "inner",
    broadcast: bool = True,
) -> DataFrame:
    """Replace ``fact_key`` natural-key column(s) with the dimension's
    surrogate key.

    ``how='inner'`` reproduces the reference's keep-only-mapped semantics
    (fact_ETL.py:67-74): unmapped fact rows are dropped. Use ``'left'`` to
    keep them with NULL surrogates instead.
    """
    fact_key = [fact_key] if isinstance(fact_key, str) else list(fact_key)
    map_key = [map_key] if isinstance(map_key, str) else list(map_key)
    out_col = out_col or surrogate_col

    side = key_map.select(
        *[F.col(m).alias(f"__map_{m}") for m in map_key],
        F.col(surrogate_col).alias(out_col),
    )
    if broadcast:
        # Size-gated: key maps scale with the dimension (customer/part grow
        # linearly with SF), so the hint applies only while Catalyst
        # estimates the map under autoBroadcastJoinThreshold; above it the
        # planner/AQE picks the join strategy from actual sizes.
        side = broadcast_if_small(side)
    cond = [fact[f] == side[f"__map_{m}"] for f, m in zip(fact_key, map_key)]
    joined = fact.join(side, cond, how)
    return joined.drop(*[f"__map_{m}" for m in map_key], *fact_key)


def resolve_late_arriving(
    fact: DataFrame,
    key_map_v1: DataFrame,
    key_map_v2: DataFrame,
    fact_key: str,
    map_key: str,
    surrogate_col: str = "surrogate_key",
    out_col: str = "surrogate_key",
    placeholder: str | int | float = "__unresolved__",
) -> DataFrame:
    """LATE-ARRIVING DIMENSION handling — the star-schema op the
    keep-only-mapped filter (reference fact_ETL.py:67-74) cannot
    express: facts whose dimension row hasn't landed yet must LOAD NOW
    with a placeholder surrogate and be REPAIRED when the dimension
    catches up, never dropped and never blocking the load.

    Pass 1 resolves against the load-time dimension snapshot
    (``key_map_v1``) with a left join, placeholder for misses. Pass 2
    re-joins ONLY the placeholder rows against the refreshed snapshot
    (``key_map_v2``) and unions them back — the repair job touches
    |late rows|, not |fact|. Output adds BOOLEAN ``was_late`` /
    ``repaired`` audit flags; rows still unknown after repair keep the
    placeholder. Both joins broadcast while the key maps are small.

    ``placeholder`` must match the surrogate key's type: the string
    default fits the md5 string keys; with ``xxhash64`` LONG surrogates
    pass a numeric sentinel (e.g. ``-1``) — a mismatch raises up front
    instead of failing inside the coalesce/union.
    """
    from pyspark.sql import types as T

    # Bidirectional type guard: a string placeholder on a numeric key
    # AND a numeric placeholder on a string key both raise up front —
    # otherwise coalesce silently coerces the sentinel (e.g. -1 -> '-1'
    # on a STRING surrogate) and downstream consumers filter on the
    # wrong sentinel value.
    sk_type = key_map_v2.schema[surrogate_col].dataType
    sk_is_string = isinstance(sk_type, T.StringType)
    if isinstance(placeholder, str) != sk_is_string:
        raise ValueError(
            f"placeholder {placeholder!r} ({type(placeholder).__name__}) "
            f"does not match the surrogate key type "
            f"{sk_type.simpleString()} — pass a sentinel of the key's "
            "type (e.g. -1 for xxhash64 LONG keys, a string for md5 keys)"
        )

    def _lookup(df: DataFrame, key_map: DataFrame, out: str) -> DataFrame:
        # Size-gated like resolve_foreign_key: broadcast while the key map
        # fits under autoBroadcastJoinThreshold, shuffle-join above it —
        # a 100M-row dimension must never be force-broadcast.
        side = broadcast_if_small(
            key_map.select(
                F.col(map_key).alias("__mk"),
                F.col(surrogate_col).alias(out),
            )
        )
        return df.join(side, df[fact_key] == side["__mk"], "left").drop("__mk")

    pass1 = _lookup(fact, key_map_v1, "__sk1")
    resolved = pass1.filter(F.col("__sk1").isNotNull()).select(
        *fact.columns,
        F.col("__sk1").alias(out_col),
        F.lit(False).alias("was_late"),
        F.lit(False).alias("repaired"),
    )
    late = pass1.filter(F.col("__sk1").isNull()).drop("__sk1")
    repaired = _lookup(late, key_map_v2, "__sk2").select(
        *fact.columns,
        F.coalesce(F.col("__sk2"), F.lit(placeholder)).alias(out_col),
        F.lit(True).alias("was_late"),
        F.col("__sk2").isNotNull().alias("repaired"),
    )
    return resolved.unionByName(repaired)
