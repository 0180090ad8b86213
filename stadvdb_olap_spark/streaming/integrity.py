"""Streaming integrity audit: per-micro-batch fingerprints.

The continuous-ingestion counterpart of operators/reconcile.py: every
micro-batch appends one (batch_id, table_name, n_rows, checksum) row to
an audit table. Because the fingerprint sum is COMMUTATIVE AND
MERGEABLE, summing the audit rows' checksums/counts reproduces the
fingerprint of everything ingested so far — a downstream consumer (or
the source system) can verify a day of streaming ingest without
re-reading the data, and a divergence localizes to the first batch whose
running total splits.

Sink idempotence follows the repo's batch_id-keyed convention
(streaming/dedup.py): foreachBatch is at-least-once, so each batch
overwrites its own ``batch_id=N`` directory — a crash-and-replay
rewrites the same row instead of appending a duplicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stadvdb_olap_spark.operators.reconcile import table_fingerprint


def fingerprint_stream(
    stream_df: DataFrame,
    table_name: str,
    audit_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Append one fingerprint row per micro-batch to ``audit_path``.
    Returns the started StreamingQuery."""

    def audit_batch(batch: DataFrame, batch_id: int) -> None:
        (
            table_fingerprint(batch, table_name)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .parquet(f"{audit_path}/batch_id={batch_id}")
        )

    writer = (
        stream_df.writeStream.foreachBatch(audit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
