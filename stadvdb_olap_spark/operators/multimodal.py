"""Multimodal (image/audio/video) column processing.

Media are opaque ``binary`` columns with a typed metadata struct — the
layout a 100 TB multimodal training pipeline uses (content-addressed bytes
+ queryable metadata, so filters prune on metadata without touching bytes).

The Spark-side plumbing (schemas, Arrow batching via mapInPandas, partition
sizing) is real and tested; the actual media codecs are STUBBED because the
runtime has no image/audio libraries:

- ``codec="fake"`` — deterministic md5-derived features (testable, and
  oracle-expressible in SQL for the catalog check)
- ``codec="pillow"`` / ``codec="ffmpeg"`` — raise NotImplementedError with
  the exact integration point documented, so wiring a real decoder is a
  one-function change.

Batch shape: mapInPandas streams Arrow record batches; each batch is
decoded as a unit, so executor memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` x max media size —
size that conf down (e.g. 64) for large media.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image/audio/video
        StructField("format", StringType()),      # png/jpeg/wav/mp4/...
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

N_FAKE_FEATURES = 8


def attach_media_column(
    df: DataFrame, payload_col: Column | str, media_type: str, fmt: str
) -> DataFrame:
    """Wrap a binary payload into the engine's media layout:
    ``content binary`` + ``meta struct``. Metadata is computed from the
    payload here (size-derived placeholders); a real ingest would parse
    container headers."""
    c = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    content = c.cast("binary")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.length(content).cast("long").alias("width"),
        F.lit(0).cast("long").alias("height"),
        F.lit(0).cast("long").alias("duration_ms"),
    )
    return df.withColumn("content", content).withColumn("meta", meta)


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real feature extractor: the first
    N_FAKE_FEATURES bytes of md5(payload), scaled to [0, 1]."""
    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:N_FAKE_FEATURES]]


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    codec: str = "fake",
) -> DataFrame:
    """Feature-extraction over media bytes with Arrow-batched mapInPandas.

    Real decoders plug in at ``_decode_batch``; everything around them
    (schema, batching, partition parallelism) is production plumbing.
    """
    if codec not in ("fake", "pillow", "ffmpeg"):
        raise ValueError(f"unknown codec {codec!r}")

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_bytes", LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )

    def _decode_batch(pdfs: Iterator) -> Iterator:
        import pandas as pd

        for pdf in pdfs:
            if codec == "fake":
                feats = [_fake_features(b) for b in pdf[content_col]]
            elif codec == "pillow":
                # Integration point: PIL.Image.open(io.BytesIO(b)) ->
                # resize -> np.asarray -> pooled embedding.
                raise NotImplementedError(
                    "pillow codec requires PIL at runtime; install and "
                    "implement decode here"
                )
            else:
                # Integration point: ffmpeg frame sampling for video/audio.
                raise NotImplementedError(
                    "ffmpeg codec requires ffmpeg bindings at runtime"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [len(b) for b in pdf[content_col]],
                    "features": feats,
                }
            )

    return df.select(id_col, content_col).mapInPandas(_decode_batch, out_schema)


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
    codec: str = "fake",
) -> DataFrame:
    """Frame-sampling plumbing for video: one output row per sampled
    'frame'. The fake codec samples byte offsets; a real one samples
    decoded frames at timestamps — identical dataflow shape (explode on
    the worker, never the driver)."""
    if codec != "fake":
        raise NotImplementedError("real frame sampling requires ffmpeg")
    n = F.length(F.col("__content"))
    offsets = F.sequence(
        F.lit(0).cast("long"), F.floor((n - 1) / every_n_bytes).cast("long")
    )
    return (
        df.select(id_col, F.col(content_col).alias("__content"))
        .withColumn("frame_no", F.explode(offsets))
        .select(
            id_col,
            F.col("frame_no").cast("long").alias("frame_no"),
            F.md5(
                F.concat(
                    F.base64(F.col("__content")),
                    F.lit("|"),
                    F.col("frame_no").cast("string"),
                )
            ).alias("frame_fingerprint"),
        )
    )


def resize_media(
    df: DataFrame,
    target_w: int,
    target_h: int,
    content_col: str = "content",
    id_col: str = "doc_id",
    codec: str = "fake",
) -> DataFrame:
    """Resize plumbing: binary in -> binary out with updated metadata.

    The fake codec produces a deterministic byte payload of exactly
    ``target_w * target_h`` bytes (md5-stretched from the source), so batch
    shape, output schema, and metadata updates — the parts Spark cares
    about — are fully exercised; a real image resample plugs in at the
    marked point. Output rows carry the new (width, height) in ``meta`` so
    downstream filters keep pruning on metadata without touching bytes.
    """
    if codec not in ("fake", "pillow"):
        raise ValueError(f"unknown codec {codec!r}")

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("content", BinaryType()),
            StructField("meta", MEDIA_META_SCHEMA),
        ]
    )
    n_bytes = target_w * target_h

    def _resize_batch(pdfs: Iterator) -> Iterator:
        import pandas as pd

        for pdf in pdfs:
            out_payloads = []
            for b in pdf[content_col]:
                if codec == "fake":
                    # Deterministic stretch: repeat md5 blocks to size.
                    seed = hashlib.md5(bytes(b)).digest()
                    reps = n_bytes // len(seed) + 1
                    out_payloads.append((seed * reps)[:n_bytes])
                else:
                    # Integration point: PIL.Image.open -> .resize(
                    # (target_w, target_h)) -> .tobytes()
                    raise NotImplementedError("pillow codec requires PIL")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "content": out_payloads,
                    "meta": [
                        {
                            "media_type": "image",
                            "format": "raw",
                            "width": target_w,
                            "height": target_h,
                            "duration_ms": 0,
                        }
                    ]
                    * len(pdf),
                }
            )

    return df.select(id_col, content_col).mapInPandas(_resize_batch, out_schema)
