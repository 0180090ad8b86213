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

from pyspark.sql import DataFrame, Window
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
    bucket_col: str | None = None,
) -> DataFrame:
    """Assign every item a (bucket, bin_id) such that each bin's total
    ``weight_col`` is ≤ ``budget``. Items heavier than ``budget`` get a
    bin of their own (they need truncation downstream, not packing).

    Output: ``id_cols`` + weight + ``bucket`` + ``bin_id`` (bin ids are
    dense per bucket; (bucket, bin_id) is the global bin key).

    ``bucket_col`` names an existing column to use as the deterministic
    bucket instead of the built-in crc32 assignment — callers that need
    a cross-engine-replayable bucket (the certified pack query uses the
    salted-md5 device) pass their own.
    """
    if bucket_col is not None:
        df = items.select(
            *id_cols,
            F.col(weight_col).cast("long").alias("__w"),
            F.col(bucket_col).cast("long").alias("bucket"),
        )
    else:
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


def concat_pack(
    items: DataFrame,
    ctx_len: int,
    key_col: str = "doc_id",
    weight_col: str = "n_tokens",
    n_shards: int = 8,
    salt: str = "pack:",
) -> DataFrame:
    """Concat-and-chunk packing layout (the GPT-style alternative to bin
    packing): concatenate documents in deterministic salted-hash order
    and split the token stream at every ``ctx_len`` boundary — zero
    padding by construction; documents crossing a boundary continue in
    the next chunk (trainers mask attention across document boundaries,
    so no quality cost).

    Output per item: (key, shard, weight, start_off, chunk_first,
    n_chunks_spanned) — ``start_off`` is the item's offset in its
    shard's concatenated stream, ``chunk_first = start_off // ctx_len``
    its first chunk, so (shard, chunk_first..) addresses every training
    sequence. Unlike first-fit packing (``pack_sequences``) the layout
    is a PURE window cumsum — no sequential Python anywhere — which
    makes it exactly replayable in SQL and cheap at any scale: one
    exchange on the shard id, a per-shard sort, and integer arithmetic.
    Shards are the parallel unit (never one partition holding the
    world); the integer divisions divide exact multiples, so every
    offset is engine-exact."""
    from stadvdb_olap_spark.operators.mixture import salted_md5

    h = salted_md5(key_col, salt)
    shard = (
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % n_shards
    ).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy("__h", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(weight_col)).over(w)
    start = (cum - F.col(weight_col)).alias("__start")
    ctx = F.lit(ctx_len)
    base = items.select(
        key_col, F.col(weight_col), shard, h.alias("__h")
    ).select("*", start, (cum - F.lit(1)).alias("__endtok"))
    chunk_first = ((F.col("__start") - F.col("__start") % ctx) / ctx).cast("long")
    chunk_last = ((F.col("__endtok") - F.col("__endtok") % ctx) / ctx).cast("long")
    # A zero-weight item occupies no tokens: spans 0 chunks always.
    # (Without the guard, __endtok = start-1 makes the span 1 at
    # non-boundary offsets but 0 at exact ctx_len boundaries.)
    spanned = F.when(F.col(weight_col) == 0, F.lit(0).cast("long")).otherwise(
        (chunk_last - chunk_first + 1).cast("long")
    )
    return base.select(
        key_col,
        "shard",
        F.col(weight_col).cast("long").alias(weight_col),
        F.col("__start").cast("long").alias("start_off"),
        chunk_first.alias("chunk_first"),
        spanned.alias("n_chunks_spanned"),
    )
