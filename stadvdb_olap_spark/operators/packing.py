"""Sequence packing: bin chunks into fixed token budgets for training.

After chunking (plans/text_queries.py:chunk_documents_sliding), a training
pipeline packs pieces into fixed-length sequences so no accelerator step
pads more than it must. Exact global bin packing is NP-hard and inherently
sequential, so the scalable shape is two-level:

1. **Partition the items** by a deterministic hash bucket (content-
   addressed, like the sampling/split operators) — each bucket is small
   enough to pack on one executor and the assignment is reproducible.
2. **Pack within each bucket** with deterministic first-fit-decreasing
   over a stable item order — an Arrow-batched ``applyInPandas`` per
   bucket, the idiomatic Spark home for per-group sequential logic.

Result quality is the usual FFD bound (≤ 11/9·OPT + 1 bins per bucket);
determinism is total: same items → same bins, independent of cluster
layout, because both the bucketing and the within-bucket order are pure
functions of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)


def pack_sequences(
    items: DataFrame,
    id_cols: list[str],
    weight_col: str,
    budget: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign every item a (bucket, bin_id) such that each bin's total
    ``weight_col`` is ≤ ``budget``. Items heavier than ``budget`` get a
    bin of their own (they need truncation downstream, not packing).

    Output: ``id_cols`` + weight + ``bucket`` + ``bin_id`` (bin ids are
    dense per bucket; (bucket, bin_id) is the global bin key).
    """
    key = F.concat_ws("\x00", *[F.col(c).cast("string") for c in id_cols])
    df = items.select(
        *id_cols,
        F.col(weight_col).cast("long").alias("__w"),
        F.pmod(F.crc32(key.cast("binary")), F.lit(n_buckets)).alias("bucket"),
    )

    out_schema = StructType(
        [df.schema[c] for c in df.columns] + [StructField("bin_id", LongType())]
    )
    id_names = list(id_cols)

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            by=["__w"] + id_names, ascending=[False] + [True] * len(id_names)
        ).reset_index(drop=True)
        bins: list[int] = []  # remaining capacity per bin
        assigned = []
        for w in pdf["__w"]:
            w = int(w)
            placed = None
            if w < budget:  # strict first fit over open bins
                for i, rem in enumerate(bins):
                    if rem >= w:
                        placed = i
                        bins[i] = rem - w
                        break
            if placed is None:
                bins.append(max(budget - w, 0))
                placed = len(bins) - 1
            assigned.append(placed)
        pdf["bin_id"] = pd.Series(assigned, dtype="int64")
        return pdf

    return (
        df.groupBy("bucket")
        .applyInPandas(pack, schema=out_schema)
        .withColumnRenamed("__w", weight_col)
    )
