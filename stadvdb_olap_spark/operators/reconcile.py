"""Cross-system reconciliation: keyed table diff, order-independent fingerprint.

The operational pair every large migration / dual-write / restatement
needs (beyond-reference ops; the reference ETL has no verification story):

- ``table_diff``: given OLD and NEW versions of a keyed table, emit one
  row per difference — ``added`` / ``removed`` / ``changed`` with the
  exact set of changed columns. One full-outer shuffle join on the key
  (exchange-free when both sides are bucketed on it); comparisons are
  null-safe JVM expressions. This is the row-level answer to "what did
  the restatement touch?".
- ``table_fingerprint``: an order-independent checksum for "are these
  two copies identical?" at 100 TB without sorting or moving either
  copy: each row canonicalizes to a type-pinned string, hashes (md5,
  first 48 bits), and the checksums SUM exactly in decimal(38,0).
  Addition is commutative, so the result is independent of partitioning,
  row order, and engine — two sides can fingerprint independently and
  compare 1 row. A mismatch localizes by re-running grouped by any
  column (the aggregate is mergeable by construction).

Canonicalization pins every cross-engine formatting hazard: doubles go
through DECIMAL(18,6) (binary doubles never sit on a decimal-6 tie —
compat.py), timestamps print as fixed-width microseconds, NULL becomes a
sentinel that no real value can collide with.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NULL_SENTINEL = "\x01NULL\x01"


def _canon_cell(field: T.StructField) -> Column:
    c = F.col(field.name)
    if isinstance(field.dataType, T.DoubleType | T.FloatType):
        s = c.cast("decimal(18,6)").cast("string")
    elif isinstance(field.dataType, T.TimestampType | T.TimestampNTZType):
        s = F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    elif isinstance(field.dataType, T.DateType):
        s = F.date_format(c, "yyyy-MM-dd")
    else:
        s = c.cast("string")
    return F.coalesce(s, F.lit(_NULL_SENTINEL))


def canon_cell_sql(name: str, duck_type: str) -> str:
    """The DuckDB twin of ``_canon_cell`` — identical strings per type."""
    if duck_type == "DOUBLE":
        s = f"CAST(CAST({name} AS DECIMAL(18,6)) AS VARCHAR)"
    elif duck_type == "TIMESTAMP":
        s = f"strftime({name}, '%Y-%m-%d %H:%M:%S.%f')"
    elif duck_type == "DATE":
        s = f"strftime({name}, '%Y-%m-%d')"
    else:
        s = f"CAST({name} AS VARCHAR)"
    return f"COALESCE({s}, '\x01NULL\x01')"


def table_fingerprint(df: DataFrame, table_name: str) -> DataFrame:
    """One row: (table_name, n_rows, checksum). Checksum = exact
    decimal(38,0) sum of the first 48 bits of md5 over each row's
    canonical string — commutative, so partitioning- and order-free.

    The checksum PUBLISHES as a STRING: decimal(38,0) survives the
    internal sum exactly, but a decimal column in a result frame is a
    cross-engine representation hazard (pandas fetches Python Decimal
    from Spark and lossy float64 from DuckDB), while the digit string
    is exact, scale-proof, and comparable anywhere."""
    cells = [_canon_cell(f) for f in df.schema.fields]
    row_hash = (
        F.conv(F.substring(F.md5(F.concat_ws("|", *cells)), 1, 12), 16, 10)
        .cast("long")
        .cast("decimal(38,0)")
    )
    return df.agg(
        F.lit(table_name).alias("table_name"),
        F.count(F.lit(1)).alias("n_rows"),
        # Empty table -> checksum 0, not NULL: two empty copies must
        # compare equal to each other and unequal to nothing.
        F.coalesce(F.sum(row_hash), F.lit(0))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("checksum"),
    )


def table_fingerprint_sql(table: str, cols: list[tuple[str, str]]) -> str:
    """DuckDB twin: ``cols`` is [(name, duck_type), ...] in the SAME
    order as the Spark schema."""
    cells = ", ".join(canon_cell_sql(n, t) for n, t in cols)
    return f"""
SELECT '{table}' AS table_name,
       COUNT(*) AS n_rows,
       CAST(CAST(COALESCE(SUM(CAST(CAST('0x' ||
                substr(md5(concat_ws('|', {cells})), 1, 12)
                AS BIGINT) AS DECIMAL(38,0))), 0) AS DECIMAL(38,0))
            AS VARCHAR)
           AS checksum
FROM {table}
"""


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Keyed diff of two table versions: one output row per difference,
    (keys..., change_type in {added, removed, changed}, changed_cols).

    ``changed_cols`` lists the compare columns whose values differ
    (null-safe), in the fixed order given — deterministic, no sort.
    Identical rows produce no output. One full-outer join on the keys is
    the only wide operation; with both sides bucketed on the keys it is
    exchange-free.
    """
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__old_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__new_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, on=keys, how="full_outer")
    empty = F.array().cast("array<string>")
    changed_cols = F.concat(
        *[
            F.when(
                ~F.col(f"__old_{c}").eqNullSafe(F.col(f"__new_{c}")),
                F.array(F.lit(c)),
            ).otherwise(empty)
            for c in compare_cols
        ]
    )
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.withColumn(
            "changed_cols",
            F.when(
                F.col("__in_old").isNull() | F.col("__in_new").isNull(), empty
            ).otherwise(changed_cols),
        )
        .withColumn("change_type", change_type)
        .filter(
            F.col("__in_old").isNull()
            | F.col("__in_new").isNull()
            | (F.size("changed_cols") > 0)
        )
        .select(*keys, "change_type", "changed_cols")
    )


def schema_diff(old: DataFrame, new: DataFrame) -> list[dict]:
    """Schema drift report between two table versions: added / removed /
    type-changed / nullability-changed columns, as plain dicts (driver
    metadata, not a distributed op). The schema-level companion to
    ``table_diff`` — run it first; a type change usually explains a
    checksum mismatch without scanning a single row."""
    old_fields = {f.name: f for f in old.schema.fields}
    new_fields = {f.name: f for f in new.schema.fields}
    report: list[dict] = []
    for name in sorted(new_fields.keys() - old_fields.keys()):
        report.append(
            {"column": name, "change": "added",
             "new_type": new_fields[name].dataType.simpleString()}
        )
    for name in sorted(old_fields.keys() - new_fields.keys()):
        report.append(
            {"column": name, "change": "removed",
             "old_type": old_fields[name].dataType.simpleString()}
        )
    for name in sorted(old_fields.keys() & new_fields.keys()):
        o, n = old_fields[name], new_fields[name]
        if o.dataType != n.dataType:
            report.append(
                {"column": name, "change": "type_changed",
                 "old_type": o.dataType.simpleString(),
                 "new_type": n.dataType.simpleString()}
            )
        elif o.nullable != n.nullable:
            report.append(
                {"column": name, "change": "nullability_changed",
                 "old_nullable": o.nullable, "new_nullable": n.nullable}
            )
    return report


def range_fingerprints(
    df: DataFrame, key_col: str, width: int
) -> DataFrame:
    """Merkle-style range summary: one row per ``key DIV width`` bucket
    with (n_rows, lo_key, hi_key, checksum) — ``table_fingerprint``'s
    commutative 48-bit row-hash sum, subdivided so two 100 TB copies
    compare by shipping |buckets| rows and a mismatch LOCALIZES to a
    key range instead of condemning the whole table. The anti-entropy
    shape (Merkle trees in Dynamo/Cassandra repair) flattened to one
    level: at a billion keys per bucket-width of 4096 that is ~250k
    summary rows — still driver-trivial — and a second pass over only
    the mismatching ranges finds the rows (``table_diff``).

    Same publication rule as ``table_fingerprint``: the checksum is the
    exact decimal digit STRING. One map-side-combinable aggregate; the
    exchange carries |buckets| rows."""
    cells = [_canon_cell(f) for f in df.schema.fields]
    row_hash = (
        F.conv(F.substring(F.md5(F.concat_ws("|", *cells)), 1, 12), 16, 10)
        .cast("long")
        .cast("decimal(38,0)")
    )
    return df.groupBy(
        F.expr(f"{key_col} DIV {width}").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(key_col).cast("long").alias("lo_key"),
        F.max(key_col).cast("long").alias("hi_key"),
        F.sum(row_hash).cast("decimal(38,0)").cast("string").alias("checksum"),
    )
