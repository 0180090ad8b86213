"""Streaming deduplication and stream-static enrichment.

The reference deduplicates inside each 5,000-row pandas chunk only
(``/root/reference/ETL/user_ETL.py:58`` — duplicates that span chunks leak
through and are papered over by the upsert). The streaming-native answer
deduplicates across micro-batches with watermark-bounded state, which is
both correct across batch boundaries and bounded in memory — the two
properties the reference's loop lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from stadvdb_olap_spark.operators.joins import broadcast_if_small


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once-per-key event stream within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps one row per key and expires
    per-key state once the watermark passes it — state size tracks the
    number of DISTINCT keys inside the watermark window, not the stream
    length. On batch DataFrames it degrades to plain ``dropDuplicates``
    so the same body serves both modes.
    """
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def corpus_dedup_stream(
    docs_stream: DataFrame,
    corpus: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.2,
    num_hashes: int = 16,
    band_size: int = 2,
    shingle_n: int = 3,
    available_now: bool = True,
):
    """Continuous-ingestion near-dup dedup: every micro-batch of incoming
    documents LSH-matches against the standing corpus via
    ``incremental_lsh_matches`` (batch bands broadcast, corpus probed in
    place) and the verified (delta_id, corpus_id, jaccard) matches append
    to ``out_path``. Downstream consumers drop or canonicalize the matched
    ingest docs.

    The corpus frame is static per run — at 100 TB it is the PERSISTED
    band table refreshed by a compaction job, and each micro-batch's cost
    is O(batch + collisions). foreachBatch (not a stateful operator)
    because the match is a join against external state, not stream state.
    foreachBatch gives at-least-once delivery, so each batch writes to
    its own ``batch_id=N`` directory with overwrite — a replay after a
    crash-before-checkpoint rewrites the same directory instead of
    appending duplicates, making the sink effectively exactly-once.
    """
    from stadvdb_olap_spark.operators.text_dedup import incremental_lsh_matches

    def match_batch(batch: DataFrame, batch_id: int) -> None:
        (
            incremental_lsh_matches(
                batch,
                corpus,
                id_col,
                text_col,
                threshold,
                num_hashes,
                band_size,
                shingle_n,
            )
            .write.mode("overwrite")
            .parquet(f"{out_path}/batch_id={batch_id}")
        )

    writer = (
        docs_stream.writeStream.foreachBatch(match_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: list[str] | None = None,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
) -> DataFrame:
    """Stream-static dimension join: each micro-batch hash-joins against
    the static (broadcastable) dimension — no stream-side state at all,
    the cheapest enrichment shape. For stream-stream joins Spark requires
    watermarks on both sides; a static dim needs none."""
    if on is not None:
        return events.join(broadcast_if_small(dim), on=on, how="left")
    cond = events[stream_key] == dim[dim_key]
    return events.join(broadcast_if_small(dim), cond, "left")


def media_dedup_stream(
    media_stream: DataFrame,
    corpus_hashes: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    content_col: str = "content",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    available_now: bool = True,
    fingerprint=None,
):
    """Continuous-ingestion MEDIA near-dup: every micro-batch of binary
    media fingerprints on the executors (``ahash_bands`` by default —
    Arrow-batched, zero shuffle) and band-matches against the STANDING
    corpus fingerprint table via ``near_dup_matches_ahash`` (delta
    bands broadcast, corpus probed in place). Matches append per
    micro-batch to ``out_path`` under ``batch_id=N`` overwrite
    directories — the same idempotent-replay sink discipline as
    ``corpus_dedup_stream``, so a crash-replay rewrites rather than
    duplicates.

    The corpus side holds FINGERPRINTS (4 ints per item), not
    payloads: at 100 TB of media the standing state is ~32 bytes/item —
    the whole point of hashing before the match. ``fingerprint`` swaps
    the hashing step for other modalities on the same band contract:
    pass ``audio_energy_fingerprint`` (or a partial of it) for audio —
    agreement-tested in ``test_audio_dedup_stream_matches_batch``."""
    from stadvdb_olap_spark.operators.multimodal import (
        ahash_bands,
        near_dup_matches_ahash,
    )

    fp = fingerprint if fingerprint is not None else ahash_bands

    def match_batch(batch: DataFrame, batch_id: int) -> None:
        delta = fp(batch, content_col, id_col)
        (
            near_dup_matches_ahash(delta, corpus_hashes, max_hamming)
            .write.mode("overwrite")
            .parquet(f"{out_path}/batch_id={batch_id}")
        )

    writer = (
        media_stream.writeStream.foreachBatch(match_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
