"""Streaming mergeable-sketch maintenance: incremental distinct counts.

The batch side (plans/sketch_queries.py) shows HLL sketches as the
fixed-memory distinct-count path; this module keeps that estimate LIVE
over a stream: each micro-batch reduces to one HLL sketch per group
(bytes, not members), and ``foreachBatch`` unions it into a persisted
sketch-state table. The state size is groups x sketch bytes — constant
per group regardless of stream volume, and the union is associative +
idempotent-under-re-merge of the SAME batch only if batch sketches are
keyed, so the state table keys rows by (group, batch_id): a replayed
micro-batch (restart after crash between write and commit) OVERWRITES
its own row instead of double-merging — the same exactly-once device as
``streaming/integrity.py``'s fingerprints.

Reading the current estimate unions the per-batch sketches per group —
a group-keyed aggregate over (n_batches x n_groups) tiny rows.

Reference counterpart: none (the reference recomputes COUNT(DISTINCT)
from scratch per run); this is the 100 TB answer to "how many unique
users so far, updated continuously".
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def _atomic_append(df: DataFrame, target_path: str, batch_id: int) -> None:
    # One file-dir per batch_id: replays overwrite their own directory,
    # never double-append.
    path = os.path.join(target_path, f"batch_id={batch_id}")
    tmp = path + ".__new__"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def hll_distinct_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    target_path: str,
    group_col: str,
    id_col: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Maintain per-group HLL sketches of ``id_col`` over a file stream.
    Each micro-batch writes one sketch row per group under its own
    batch_id partition (restart-safe)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        sk = batch.groupBy(group_col).agg(
            F.hll_sketch_agg(id_col).alias("sk")
        )
        _atomic_append(sk, target_path, batch_id)

    return (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_distinct_estimates(
    spark: SparkSession, target_path: str, group_col: str
) -> DataFrame:
    """Current per-group distinct estimate: union the per-batch sketches.
    Also returns the global (cross-group) estimate as a separate row
    with group NULL — the mergeability demo."""
    state = spark.read.parquet(target_path)
    per_group = state.groupBy(group_col).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_est")
    )
    # NULL group marker must carry the stream's ACTUAL group type — a
    # hardcoded string cast breaks unionByName for non-string groups.
    group_type = state.schema[group_col].dataType
    total = state.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_est")
    ).select(F.lit(None).cast(group_type).alias(group_col), "distinct_est")
    return per_group.unionByName(total)


def countmin_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    target_path: str,
    term_col: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Maintain a count-min sketch over a streaming term column: each
    micro-batch reduces to <= d*w counter rows (integers, not members)
    written under its own batch_id partition — the same replay-safe
    overwrite device as the HLL stream. Counters ADD across batches
    (the merge the batch twin's property test pins), so unlike the HLL
    estimate the live sketch agrees EXACTLY with a batch build over the
    same files — integer state has no estimate band to hide in."""
    from stadvdb_olap_spark.plans.sketch_queries import _CM_D, _cm_bucket

    stream = spark.readStream.schema(schema).parquet(source_dir)

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        cells = batch.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            _cm_bucket(F.col(term_col), r).alias("b"),
                        )
                        for r in range(_CM_D)
                    ]
                )
            ).alias("e")
        ).select("e.r", "e.b")
        counters = cells.groupBy("r", "b").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        _atomic_append(counters, target_path, batch_id)

    return (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_countmin_counters(spark: SparkSession, target_path: str) -> DataFrame:
    """Current merged sketch: per-(row, bucket) counter sums across all
    batch partitions."""
    state = spark.read.parquet(target_path)
    return state.groupBy("r", "b").agg(F.sum("cnt").alias("cnt"))


def read_countmin_estimates(
    spark: SparkSession, target_path: str, terms: list[str]
) -> DataFrame:
    """Point-lookup estimates for ``terms`` against the merged counters
    (min over the d hashed cells; absent cells count 0)."""
    from stadvdb_olap_spark.plans.sketch_queries import _CM_D, _cm_bucket

    counters = read_countmin_counters(spark, target_path)
    probes = spark.createDataFrame([(t,) for t in terms], "term string")
    cells = probes.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cm_bucket(F.col("term"), r).alias("b"),
                    )
                    for r in range(_CM_D)
                ]
            )
        ).alias("e"),
    ).select("term", "e.r", "e.b")
    return (
        cells.join(counters, ["r", "b"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy("term")
        .agg(F.min("cnt").alias("cm_estimate"))
    )


def decayed_counts_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    target_path: str,
    key_col: str,
    ts_col: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Maintain per-(key, day) event counts over a file stream — the
    STATE behind a decayed trending score (plans/series_queries.py:
    decayed_trending_event_types). The decay weights are applied at
    READ time against the then-current max day, so the state itself is
    exact integers that simply ADD across batches (the count-min
    convention: replay-safe batch_id partitions, integer merge — the
    live value agrees EXACTLY with a batch rebuild, no estimate band;
    decay never bakes into stored state, which is what lets the
    horizon slide without rewriting history)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        counts = batch.groupBy(
            F.col(key_col).alias("key"),
            F.col(ts_col).cast("date").alias("d"),
        ).agg(F.count(F.lit(1)).alias("cnt"))
        _atomic_append(counts, target_path, batch_id)

    return (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_decayed_scores(
    spark: SparkSession,
    target_path: str,
    weights: tuple[float, ...],
) -> DataFrame:
    """Current decayed trending scores from the maintained (key, day)
    counters: merge batch partitions by +, derive each day's age from
    the observed max day, weight ages < len(weights) by the
    PRECOMPUTED literal table, and sorted-fold the per-key terms — the
    identical arithmetic (same weight literals, same fold device) as
    the certified batch query, so stream-maintained and batch-built
    scores are bit-equal over the same rows."""
    state = spark.read.parquet(target_path)
    counts = state.groupBy("key", "d").agg(F.sum("cnt").alias("c"))
    mx = counts.agg(F.max("d").alias("dmax"))
    wt = state.sparkSession.createDataFrame(
        [(k, w) for k, w in enumerate(weights)], "age int, w double"
    )
    terms = (
        counts.crossJoin(F.broadcast(mx))
        .select(
            "key",
            F.datediff("dmax", "d").alias("age"),
            "c",
        )
        .filter(F.col("age") < len(weights))
        .join(F.broadcast(wt), "age")
        .select("key", (F.col("c") * F.col("w")).alias("term"), "c")
    )
    return terms.groupBy("key").agg(
        F.sum("c").cast("long").alias("n_events_in_horizon"),
        F.aggregate(
            F.sort_array(F.collect_list("term")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("decayed_score"),
    )


def kmv_bottomk_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    target_path: str,
    group_col: str,
    hash_col: str,
    k: int,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Maintain per-group KMV (bottom-k hash) sketch states over a file
    stream: each micro-batch reduces to at most k rows per group (its
    own bottom-k) written under a batch_id partition — replay-safe like
    the HLL/count-min streams. KMV is min-wise mergeable
    (``test_kmv_bottomk_is_mergeable``), so re-ranking the UNION of
    per-batch states (``read_kmv_state``) is EXACTLY the batch sketch
    over the same files — integer state, no estimate band, the
    bit-replayable alternative to the HLL stream."""
    from stadvdb_olap_spark.plans.sketch_queries import bottomk_hashes

    stream = spark.readStream.schema(schema).parquet(source_dir)

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        state = bottomk_hashes(batch, group_col, hash_col, k).drop("rn")
        _atomic_append(state, target_path, batch_id)

    return (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_kmv_state(
    spark: SparkSession,
    target_path: str,
    group_col: str,
    hash_col: str,
    k: int,
) -> DataFrame:
    """Current per-group KMV state: re-rank the union of per-batch
    bottom-k states — k-sized merge cost, never a rescan of inputs."""
    from stadvdb_olap_spark.plans.sketch_queries import bottomk_hashes

    return bottomk_hashes(
        spark.read.parquet(target_path), group_col, hash_col, k
    )
