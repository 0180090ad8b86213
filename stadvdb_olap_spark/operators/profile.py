"""Single-pass table profiling.

The data-quality scan every ETL pipeline runs before loading (the
reference approximates it manually with dropna + logged counters,
``/root/reference/ETL/loc_ETL.py:47,124``): per-column null counts, exact
distinct counts, and numeric ranges — computed in ONE aggregate pass over
the table, then pivoted to a long (column, stats) relation.

At 100 TB this is a single scan with partial aggregation; the result is
|columns| rows. Numeric min/max are emitted as typed doubles (not strings)
so results are engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all) in one aggregate pass.

    Output: one row per column — ``column, n_rows, n_nulls, n_distinct,
    min_num, max_num`` (min/max NULL for non-numeric columns; NULLs are
    excluded from n_distinct, matching COUNT(DISTINCT) SQL semantics).
    """
    cols = cols or df.columns
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
        if c in numeric:
            aggs.append(F.min(c).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"__max_{c}"))
    wide = df.agg(*aggs)

    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__dist_{c}").alias("n_distinct"),
            (
                F.col(f"__min_{c}") if c in numeric else F.lit(None).cast("double")
            ).alias("min_num"),
            (
                F.col(f"__max_{c}") if c in numeric else F.lit(None).cast("double")
            ).alias("max_num"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")
