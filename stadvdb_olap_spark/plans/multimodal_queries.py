"""Multimodal catalog queries: binary-column plumbing with the fake codec.

The payloads are the documents' utf-8 bytes (the container has no media
libs — TESTDATA has no binary fixtures either); the PLUMBING under test is
identical to real media: binary column + metadata struct in, Arrow-batched
Pandas decode out. The fake features are md5-derived, so the Spark
(hashlib in mapInPandas) and DuckDB (md5 hex arithmetic in SQL) sides are
comparable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stadvdb_olap_spark.operators.multimodal import (
    N_FAKE_FEATURES,
    attach_media_column,
    extract_features,
    resize_media,
    sample_frames,
)
from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.sources.parquet import load_table


def _feature_sql(j: int) -> str:
    """Byte j of md5(text) scaled to [0,1]: hex digits 2j+1, 2j+2."""
    d1 = f"(strpos('0123456789abcdef', md5(text)[{2 * j + 1}:{2 * j + 1}]) - 1)"
    d2 = f"(strpos('0123456789abcdef', md5(text)[{2 * j + 2}:{2 * j + 2}]) - 1)"
    return f"CAST({d1} * 16 + {d2} AS DOUBLE) / 255.0"


@query(
    "multimodal_fake_features",
    oracle=f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_bytes,
       [{', '.join(_feature_sql(j) for j in range(N_FAKE_FEATURES))}] AS features
FROM documents
""",
)
def multimodal_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media pipeline end-to-end with the deterministic fake codec:
    attach binary payload + metadata struct, then Arrow-batched
    mapInPandas feature extraction. Note the fixture text is ASCII, so
    length(text) == byte length on the oracle side."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_column(docs, F.encode("text", "utf-8"), "image", "raw")
    return extract_features(media, "content", "doc_id", codec="fake")


@query("multimodal_frame_sample", oracle=None, defer=True)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling plumbing (rows-only check): one row per
    sampled offset, exploded on the executors."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = attach_media_column(docs, F.encode("text", "utf-8"), "video", "raw")
    return sample_frames(media, "content", "doc_id", every_n_bytes=64)


@query("multimodal_resize", oracle=None, defer=True)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over fake image payloads (rows-only: binary output;
    a unit-style assertion lives in the schema itself — every row carries
    the new dimensions in meta). 16x16 target => 256-byte payloads."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = attach_media_column(
        docs.select("doc_id", F.encode("text", "utf-8").alias("payload")),
        "payload",
        "image",
        "raw",
    )
    return resize_media(media, target_w=16, target_h=16)
