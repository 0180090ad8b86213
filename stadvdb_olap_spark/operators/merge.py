"""SCD type-1 merge (upsert) — parity with the reference's Postgres
``INSERT ... ON CONFLICT (key) DO UPDATE SET ...``
(``/root/reference/ETL/user_ETL.py:105-117`` and the same pattern in every
ETL module).

Vanilla Spark has no mutable ON CONFLICT sink, and at 100 TB you don't want
one — per-row upserts serialize on the warehouse. The Spark-native shape is
a set-based merge: full outer join target ⟕⟖ source on the business key,
``coalesce(source.attr, target.attr)`` for last-write-wins, then an atomic
overwrite (parquet job commit / Delta txn stands in for the per-batch
``conn.commit()`` at user_ETL.py:117).

Scale notes: the join shuffles both sides on the business key once; with a
bucketed/partitioned target table the shuffle on the target side disappears.
Rerunning the merge with the same source is idempotent — the property the
reference gets from ON CONFLICT, here by construction.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Value-preserving widening ladder (Delta/Iceberg type-widening
# semantics): a drifted source column may only move a shared column UP
# this ladder, never sideways or down — int->long, float->double,
# byte/short/int->double (every int32 is exact in a double),
# date->timestamp. LONG->double is deliberately EXCLUDED: doubles hold
# only 53 mantissa bits, so |v| > 2^53 would corrupt silently — exactly
# the class of drift that must fail loudly. Anything not listed is real
# schema breakage and raises.
_WIDEN_LADDERS: tuple[tuple[type, ...], ...] = (
    (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    (T.ByteType, T.ShortType, T.IntegerType, T.DoubleType),
    (T.FloatType, T.DoubleType),
    (T.DateType, T.TimestampType),
)


# Cross-family meet: int32-and-below vs float32 share no ladder (each
# is lossy INTO the other) but both embed exactly in a double — the
# value-preserving join point. LongType stays excluded (53 mantissa
# bits).
_DOUBLE_EXACT = (T.ByteType, T.ShortType, T.IntegerType, T.FloatType)


def _widened_type(a: T.DataType, b: T.DataType) -> T.DataType:
    """The narrowest type both ``a`` and ``b`` widen to, or raise."""
    if a == b:
        return a
    for ladder in _WIDEN_LADDERS:
        try:
            ia, ib = ladder.index(type(a)), ladder.index(type(b))
        except ValueError:
            continue
        return ladder[max(ia, ib)]()
    if isinstance(a, _DOUBLE_EXACT) and isinstance(b, _DOUBLE_EXACT):
        return T.DoubleType()
    raise ValueError(
        f"incompatible schema drift: {a.simpleString()} vs "
        f"{b.simpleString()} has no value-preserving widening"
    )


def merge_scd1(
    target: DataFrame,
    source: DataFrame,
    keys: Iterable[str],
    update_cols: Iterable[str] | None = None,
    schema_evolution: bool = False,
) -> DataFrame:
    """Upsert ``source`` into ``target`` on ``keys`` (SCD type-1).

    - key in both      -> source's non-key attributes win (DO UPDATE SET)
    - key only in src  -> row inserted (DO NOTHING branch of INSERT)
    - key only in tgt  -> row kept unchanged

    ``source`` must be unique per key (pre-dedup with
    :func:`stadvdb_olap_spark.operators.dedup.dedup_keep_first`).
    Output schema == target schema — unless ``schema_evolution`` is set,
    in which case source-only attribute columns are APPENDED to the
    output (Delta/Iceberg ``mergeSchema`` semantics): pre-existing target
    rows read NULL for the new columns, and re-merging the same source is
    still idempotent because the second round's "new" columns already
    exist on the evolved target.

    TYPE drift on a shared update column is handled the same two ways:
    with ``schema_evolution`` the output column takes the widened type
    (value-preserving ladder only — int→long, float→double, int→double,
    date→timestamp; see ``_widened_type``) and both sides are cast
    explicitly; without it, drift raises immediately instead of letting
    implicit when/otherwise coercion pick a type silently.
    """
    keys = list(keys)
    attrs = [c for c in target.columns if c not in keys]
    if update_cols is None:
        update_cols = [c for c in attrs if c in source.columns]
    update_cols = list(update_cols)
    new_cols = (
        [c for c in source.columns if c not in target.columns and c not in keys]
        if schema_evolution
        else []
    )

    # KEY drift never widens — a coerced join key changes match
    # semantics ('007' vs 7), so it fails loudly in both modes.
    tgt_key_types = {f.name: f.dataType for f in target.schema.fields}
    src_key_types = {f.name: f.dataType for f in source.schema.fields}
    for k in keys:
        if tgt_key_types[k] != src_key_types[k]:
            raise ValueError(
                f"type drift on KEY {k!r}: target "
                f"{tgt_key_types[k].simpleString()} vs source "
                f"{src_key_types[k].simpleString()} — align key types "
                "upstream; keys are never widened"
            )

    src = source.select(
        *[F.col(k).alias(f"__src_{k}") for k in keys],
        *[F.col(c).alias(f"__src_{c}") for c in update_cols + new_cols],
        F.lit(True).alias("__src_present__"),
    )
    cond = [target[k].eqNullSafe(src[f"__src_{k}"]) for k in keys]
    joined = target.join(src, cond, "full_outer")

    out_cols = []
    for k in keys:
        out_cols.append(F.coalesce(target[k], src[f"__src_{k}"]).alias(k))
    tgt_types = {f.name: f.dataType for f in target.schema.fields}
    src_types = {f.name: f.dataType for f in source.schema.fields}
    for c in attrs:
        if c in update_cols:
            # Last-write-wins: if the source row exists (matched on key),
            # its value replaces the target's — including explicit NULLs.
            matched = src["__src_present__"].isNotNull()
            t_col, s_col = target[c], src[f"__src_{c}"]
            if tgt_types[c] != src_types[c]:
                if not schema_evolution:
                    raise ValueError(
                        f"type drift on {c!r}: target "
                        f"{tgt_types[c].simpleString()} vs source "
                        f"{src_types[c].simpleString()} — pass "
                        "schema_evolution=True to widen, or align upstream"
                    )
                widened = _widened_type(tgt_types[c], src_types[c])
                t_col, s_col = t_col.cast(widened), s_col.cast(widened)
            out_cols.append(F.when(matched, s_col).otherwise(t_col).alias(c))
        else:
            out_cols.append(target[c].alias(c))
    for c in new_cols:
        # Evolved column: only source rows can carry a value; unmatched
        # target rows surface NULL (exactly what a metadata-only ADD
        # COLUMN would give them).
        out_cols.append(src[f"__src_{c}"].alias(c))
    return joined.select(*out_cols)


def generate_cdc(
    old: DataFrame,
    new: DataFrame,
    keys: Iterable[str],
    seq: int = 1,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """The INVERSE of :func:`apply_cdc`: diff two snapshots of a table
    into an applyable change feed — op ``I`` for keys only in ``new``,
    ``U`` for keys whose non-key attributes changed (null-safe compare),
    ``D`` for keys only in ``old``. I/U rows carry the NEW row's full
    payload; D rows carry the OLD row's (apply only reads their key).
    Unchanged rows emit nothing, so replaying the feed onto ``old`` with
    :func:`apply_cdc` reproduces ``new`` exactly — the round-trip
    identity ``apply_cdc(old, generate_cdc(old, new)) == new``, pinned
    by the certified ``cdc_generate_apply_roundtrip_orders`` query and a
    property test.

    Scale: one full-outer shuffle on the key — the standard
    snapshot-diff shape for deriving a change feed when the upstream has
    no log (the feed then costs |changes| downstream, not |table|).
    """
    keys = list(keys)
    attrs = [c for c in old.columns if c not in keys]
    if [c for c in new.columns] != list(old.columns):
        raise ValueError("generate_cdc requires identical column lists")
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") for c in old.columns],
        F.lit(True).alias("__o_present__"),
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") for c in new.columns],
        F.lit(True).alias("__n_present__"),
    )
    cond = [o[f"__o_{k}"].eqNullSafe(n[f"__n_{k}"]) for k in keys]
    j = o.join(n, cond, "full_outer")
    in_old = j["__o_present__"].isNotNull()
    in_new = j["__n_present__"].isNotNull()
    changed = F.lit(False)
    for c in attrs:
        changed = changed | ~j[f"__o_{c}"].eqNullSafe(j[f"__n_{c}"])
    op = (
        F.when(~in_old, F.lit("I"))
        .when(~in_new, F.lit("D"))
        .when(changed, F.lit("U"))
    )
    payload = [
        F.when(in_new, j[f"__n_{c}"]).otherwise(j[f"__o_{c}"]).alias(c)
        for c in old.columns
    ]
    return (
        j.select(*payload, op.alias(op_col))
        .where(F.col(op_col).isNotNull())
        .withColumn(seq_col, F.lit(seq))
    )


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    keys: Iterable[str],
    seq_col: str = "seq",
    op_col: str = "op",
    op_delete: str = "D",
) -> DataFrame:
    """Apply a CDC change feed (the log-shipping uplift over
    :func:`merge_scd1`, which has no delete channel): ``changes`` carries
    insert/update/delete rows tagged with an op code and a per-key
    monotonically increasing sequence (log offset / LSN). The feed is
    first COMPACTED to each key's latest change — one window pass — then
    applied set-based: latest op ``D`` deletes the key, anything else
    upserts the row whole.

    ``(keys, seq_col)`` must be unique (true for any real change log —
    offsets order a key's history); ties would make "latest" ambiguous.

    Scale: one shuffle of the (already compacted) feed on the key for
    the window, one anti-join against the target, one union — the
    standard periodic-merge shape for maintaining a 100 TB table from a
    stream of deltas; with a target bucketed on the key the anti-join
    side of the shuffle disappears.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    upserts = latest.filter(F.col(op_col) != op_delete).select(*target.columns)
    # NULL-SAFE anti-join: generate_cdc matches keys with eqNullSafe, so
    # apply must too — a name-list anti-join would keep a NULL-keyed
    # target row alongside its own update (duplicate) and ignore a
    # NULL-keyed delete, breaking apply(old, generate(old, new)) == new.
    touched = latest.select(*[F.col(k).alias(f"__t_{k}") for k in keys])
    cond = [target[k].eqNullSafe(touched[f"__t_{k}"]) for k in keys]
    untouched = target.join(touched, cond, "left_anti")
    return untouched.unionByName(upserts)
