"""Incremental upsert loading via Structured Streaming foreachBatch.

Reference counterpart: the chunked ``while True`` extract->clean->upsert
loop with per-batch commits (``/root/reference/ETL/user_ETL.py:91-136``).
Spark-native shape: a file/JDBC-CDC stream where every micro-batch runs the
same clean -> dedup -> SCD1-merge body against the target table, and the
checkpoint replaces the reference's implicit "resume from wherever the
cursor died" (it had none — a crash restarted from scratch).

The target here is a parquet directory swapped atomically (write new ->
rename); on a cluster with a table format (Delta/Iceberg) the merge step
becomes a native MERGE INTO and the swap disappears.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from stadvdb_olap_spark.operators.dedup import dedup_keep_first
from stadvdb_olap_spark.operators.merge import merge_scd1


def _recover_swap(target_path: str) -> None:
    """Undo a crash between _atomic_overwrite's two renames: if the
    table vanished after being renamed aside, restore it; then clear
    stale staging dirs. MUST run before reading the target — otherwise
    a post-crash batch sees "no table", merges against nothing, and the
    swap replaces the recovered state with delta-only rows."""
    old = target_path + ".__old__"
    if not os.path.exists(target_path) and os.path.exists(old):
        os.rename(old, target_path)
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(target_path + ".__new__", ignore_errors=True)


def _atomic_overwrite(df: DataFrame, target_path: str) -> None:
    tmp = target_path + ".__new__"
    old = target_path + ".__old__"
    shutil.rmtree(old, ignore_errors=True)  # defensive; _recover_swap ran
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(target_path):
        os.rename(target_path, old)
    os.rename(tmp, target_path)
    shutil.rmtree(old, ignore_errors=True)


def incremental_upsert_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    target_path: str,
    keys: list[str],
    checkpoint_dir: str,
    clean: Callable[[DataFrame], DataFrame] | None = None,
    order_by: list[str] | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream parquet files from ``source_dir`` and SCD1-upsert each
    micro-batch into the parquet table at ``target_path``.

    Per micro-batch (mirrors the reference loop body, set-based):
      1. ``clean`` transform (caller-supplied column expressions)
      2. deterministic dedup on ``keys`` (order_by tiebreak)
      3. merge_scd1 into the current target state
      4. atomic overwrite (the per-batch ``conn.commit()`` analogue)
    """

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        _recover_swap(target_path)
        df = clean(batch) if clean else batch
        tiebreak = order_by or (
            keys + [c for c in df.columns if c not in keys]
        )
        df = dedup_keep_first(df, keys, tiebreak)
        if os.path.exists(target_path):
            target = spark.read.parquet(target_path)
            merged = merge_scd1(target, df, keys=keys)
        else:
            merged = df
        # foreachBatch bodies must materialize eagerly; localCheckpoint
        # cuts the lineage back to the merged result before the swap.
        _atomic_overwrite(merged.localCheckpoint(), target_path)

    reader = spark.readStream.schema(source_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cdc_apply_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    target_path: str,
    keys: list[str],
    checkpoint_dir: str,
    seq_col: str = "seq",
    op_col: str = "op",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain a table from a STREAMING change feed: every micro-batch
    is compacted and applied set-based by ``operators.merge.apply_cdc``
    (insert/update/delete channels), then committed atomically — the
    log-shipping uplift of :func:`incremental_upsert_stream`.

    Ordering contract: the stream's batch boundaries must respect the
    feed's sequence order per key (true for any real log — Kafka
    offsets, binlog positions, file arrival order of log segments), i.e.
    a key's later change never lands in an EARLIER micro-batch. Within a
    batch any order is fine (apply_cdc compacts by ``seq_col``). Under
    that contract the maintained state converges to the one-shot batch
    ``apply_cdc`` of the whole feed — asserted exactly by the
    stream-vs-batch agreement test for any files-per-trigger split.
    """

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        from stadvdb_olap_spark.operators.merge import apply_cdc

        _recover_swap(target_path)
        if os.path.exists(target_path):
            target = spark.read.parquet(target_path)
        else:
            target = batch.drop(seq_col, op_col).limit(0)
        merged = apply_cdc(
            target, batch, keys=keys, seq_col=seq_col, op_col=op_col
        )
        _atomic_overwrite(merged.localCheckpoint(), target_path)

    reader = spark.readStream.schema(source_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_agg_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    target_path: str,
    group_cols: list[str],
    value_col: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Incrementally-maintained aggregate (a streaming materialized view):
    each micro-batch folds its partial (decimal sum, count) per group into
    the stored aggregate state — the warehouse rollup stays fresh without
    ever rescanning history.

    Because decimal sums and counts are commutative monoids, the
    maintained state is EXACTLY what a batch aggregate over all data would
    produce, regardless of how rows were split into batches (asserted in
    tests). State size is |groups|, not |rows|. Read the result with
    :func:`read_aggregate`, which finalizes sums to rounded doubles.
    """
    from pyspark.sql import functions as F

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        _recover_swap(target_path)
        partial = batch.groupBy(*group_cols).agg(
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__sum"),
            F.count(F.lit(1)).alias("__n"),
        )
        if os.path.exists(target_path):
            current = spark.read.parquet(target_path)
            merged = (
                current.unionByName(partial)
                .groupBy(*group_cols)
                .agg(F.sum("__sum").alias("__sum"), F.sum("__n").alias("__n"))
            )
        else:
            merged = partial
        _atomic_overwrite(merged.localCheckpoint(), target_path)

    stream = spark.readStream.schema(source_schema).parquet(source_dir)
    writer = (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_aggregate(spark: SparkSession, target_path: str, sum_alias: str = "sum_value"):
    """Finalize the maintained aggregate: decimal state -> rounded double
    sum + long count (the same convention as plans/compat.money_sum)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(target_path)
    return df.select(
        *[c for c in df.columns if c not in ("__sum", "__n")],
        F.round(F.col("__sum"), 2).cast("double").alias(sum_alias),
        F.col("__n").alias("n_rows"),
    )


def compaction_plan_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    state_path: str,
    checkpoint_dir: str,
    date_col: str = "o_orderdate",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Incrementally-maintained SMALL-FILE COMPACTION PLANNER: each
    micro-batch folds its per-day row counts into the stored file-stats
    state (``(d, mon, n_rows)`` — a commutative monoid, so the state is
    EXACTLY the batch aggregate of all data regardless of batch
    splits), and the compaction plan is derived from that state on read
    via the SAME ``operators/maintenance.py:compaction_groups`` fold
    the batch catalog query uses. State size is |ingest days|, never
    |rows|; the planner never rescans history. Read the current plan
    with :func:`read_compaction_plan`."""
    from pyspark.sql import functions as F

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        partial = batch.groupBy(
            F.to_date(date_col).alias("d"),
            F.date_trunc("month", date_col).cast("date").alias("mon"),
        ).agg(F.count(F.lit(1)).alias("n_rows"))
        if os.path.exists(state_path):
            current = spark.read.parquet(state_path)
            merged = (
                current.unionByName(partial)
                .groupBy("d", "mon")
                .agg(F.sum("n_rows").alias("n_rows"))
            )
        else:
            merged = partial
        _atomic_overwrite(merged.localCheckpoint(), state_path)

    reader = spark.readStream.schema(source_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    writer = (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_compaction_plan(
    spark: SparkSession,
    state_path: str,
    row_bytes: int | None = None,
    target: int | None = None,
) -> DataFrame:
    """Derive the compaction plan from the maintained day-stats state —
    the identical ``compaction_groups`` fold the batch planner runs, so
    stream-maintained and one-shot batch plans agree bit-for-bit."""
    from pyspark.sql import functions as F

    from stadvdb_olap_spark.operators.maintenance import (
        COMPACT_ROW_BYTES,
        COMPACT_TARGET,
        compaction_groups,
    )

    row_bytes = COMPACT_ROW_BYTES if row_bytes is None else row_bytes
    target = COMPACT_TARGET if target is None else target
    files = spark.read.parquet(state_path).select(
        "d", "mon", (F.col("n_rows") * row_bytes).cast("long").alias("est_bytes")
    )
    return compaction_groups(files, target)



def _derive_app_id(prefix: str, checkpoint_dir: str) -> str:
    """txn app_id derived from the CHECKPOINT LOCATION — the watermark
    is only meaningful relative to that checkpoint's batch-id sequence
    (round-10 advice: a constant id + fresh checkpoint silently drops
    batches; a derived id degrades to at-least-once instead)."""
    import hashlib

    return prefix + hashlib.sha256(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:16]


def _txn_append_batch(table_dir: str, app_id: str, transform=None):
    """foreachBatch body shared by every Delta-format sink: skip batches
    at-or-under the table's txn watermark, else append with the
    protocol's (app_id, batch_id) txn action — exactly-once under
    replay."""
    from stadvdb_olap_spark.sources.delta_log import (
        last_txn_version,
        write_delta,
    )

    def body(batch: DataFrame, batch_id: int) -> None:
        seen = last_txn_version(table_dir, app_id)
        if seen is not None and seen >= batch_id:
            return  # replayed batch: already committed
        out = transform(batch) if transform is not None else batch
        write_delta(
            out,
            table_dir,
            mode="append",
            operation="STREAMING UPDATE",
            txn=(app_id, batch_id),
        )

    return body


def delta_append_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    table_dir: str,
    checkpoint_dir: str,
    app_id: str | None = None,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Stream parquet files into a DELTA-FORMAT table
    (sources/delta_log.py): each micro-batch appends as one put-if-absent
    log commit carrying the protocol's ``txn`` action
    ``(app_id, batch_id)``, so a foreachBatch REPLAY after a crash —
    Structured Streaming's at-least-once reality — is detected against
    the table's own transaction watermark and skipped. Per-batch commit
    (SURVEY S6) on the open format, exactly-once end to end: the
    checkpoint dedups deliveries forward, the txn action dedups them
    backward.

    ``app_id`` defaults to a hash of the CHECKPOINT LOCATION — the txn
    watermark is only meaningful relative to the checkpoint's batch-id
    sequence, so a fresh checkpoint dir (whose batch ids restart at 0)
    automatically gets a fresh watermark. With a shared constant id,
    restarting with a new checkpoint after the source grew would
    silently DROP every batch whose id falls under the old watermark;
    with the derived id the failure mode is duplicate appends
    (at-least-once), which is recoverable — pass an explicit ``app_id``
    only if you migrate the checkpoint and want the watermark to carry
    over. Two different streams feeding one table must never share an
    id."""
    if app_id is None:
        app_id = _derive_app_id("delta_append_", checkpoint_dir)
    append_batch = _txn_append_batch(table_dir, app_id)

    reader = spark.readStream.schema(source_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.parquet(source_dir)
        .writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def delta_to_delta_stream(
    spark: SparkSession,
    source_table: str,
    target_table: str,
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    app_id: str | None = None,
) -> StreamingQuery:
    """Bronze -> silver: stream one Delta table into another with an
    optional per-batch transform — BOTH ends on the open format
    (sources/delta_stream.py `delta_tail` source, whose offsets are the
    bronze table's commit versions; sources/delta_log.py txn-stamped
    append sink). The medallion hop every lakehouse pipeline runs:

    - the SOURCE's offsets ride the stream checkpoint, so a restart
      resumes at the exact bronze commit it left off;
    - the SINK's txn action (app_id, batch_id) makes a foreachBatch
      replay a no-op — exactly-once end to end across BOTH logs;
    - OPTIMIZE on the bronze table is invisible (dataChange=false adds
      are skipped by the source), so maintenance never re-feeds silver.

    ``transform`` runs inside the micro-batch (plain DataFrame ->
    DataFrame); app_id derives from the checkpoint location like
    ``delta_append_stream``. Trigger is processingTime-paced; stop the
    query when the caller's convergence condition holds (Python
    DataSource stream readers do not support availableNow)."""
    from stadvdb_olap_spark.sources.delta_stream import register

    register(spark)
    if app_id is None:
        app_id = _derive_app_id("delta_to_delta_", checkpoint_dir)
    sink_batch = _txn_append_batch(target_table, app_id, transform)

    return (
        spark.readStream.format("delta_tail")
        .option("path", source_table)
        .load()
        .writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="1 seconds")
        .start()
    )
