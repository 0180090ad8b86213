"""End-to-end training-corpus curation pipeline — the LLM-data
counterpart of :mod:`stadvdb_olap_spark.app`'s dim→fact DAG (SURVEY.md
§2.11 O1/O2/O4 parity for the pipeline-extension family).

Stages, each consuming the previous stage's survivors:

1. **screen** — pinned-blocklist safety screen + Gopher rule-stack +
   published-weight logit classifier
   (both must pass): the cheap scan-bound filters run FIRST so every
   later stage touches fewer bytes.
2. **scrub** — PII redaction over the surviving text (narrow regexp
   projection).
3. **dedup_exact** — one hash-aggregate on the token-set fingerprint;
   the smallest doc_id of each duplicate group survives.
4. **dedup_near** — MinHash/LSH candidates, exact-Jaccard verified,
   connected-component clusters; QUALITY-AWARE survivorship keeps the
   LONGEST member of each cluster (the shared, hash-certified
   ``text_dedup.survivor_longest`` policy — band-keyed shuffle only,
   never all-pairs).
5. **decontaminate** — GRADED n-gram contamination scoring against the
   certified train/val/test hash split (the shared
   ``mixture.contamination_scores`` device); docs stay unless their
   held-out shingle overlap exceeds a tolerance, instead of dropping
   on any single shared idiom.
6. **layout** — salted-hash training shards + concat-and-chunk packing
   offsets (one shard exchange).
7. **manifest** — per-shard doc/token counts and an order-independent
   content checksum (mergeable; the delivery-verification handle).

Every stage is rows-decreasing (filters/dedups) or rows-preserving
(scrub, layout), which `run_curation_pipeline`'s report makes auditable:
retention per stage is the first thing a curation review asks for.
Timing/row instrumentation mirrors app.py (O2/O4): wall clock per
materialized stage, counts via ``df.observe`` riding the write job when
an ``out_dir`` is given — never a post-write re-scan.
"""

from __future__ import annotations

import logging
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

log = logging.getLogger("stadvdb_olap_spark.curation_app")

_CTX_LEN = 512
_N_SHARDS = 8
_NEAR_T = 0.5
#: graded decontamination tolerance: drop only when more than 5% of a
#: doc's distinct 5-grams appear in the held-out split (the binary
#: any-hit policy lost every doc sharing one idiom with one eval item)
_CONTAM_TOL = 0.05


def _screened(docs: DataFrame, sf_dir: str) -> DataFrame:
    # All three screens are row-local COLUMN expressions from the shared
    # functions/screens.py (the same expressions the hash-certified
    # standalone queries publish), so the whole stage fuses into ONE
    # narrow filter over one documents scan — no joins, no re-scans,
    # whole-stage codegen end to end. Conjunction order is cheapest
    # first (blocklist short-circuits before the rule-stack folds and
    # the logit features evaluate).
    from stadvdb_olap_spark.functions.screens import (
        blocklist_keep,
        gopher_keep,
        quality_logit_keep,
    )

    del sf_dir  # screens need no second table — kept for signature parity
    return docs.filter(
        blocklist_keep("text") & gopher_keep("text") & quality_logit_keep("text")
    )


def run_curation_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    table_format: str = "parquet",
) -> dict[str, dict[str, float | int]]:
    """Run the 7-stage curation DAG; return per-stage
    ``{"rows": n, "seconds": s}`` (plus the final manifest row count).
    With ``out_dir``, the layout and manifest stages write parquet — or
    Delta-format versioned tables with ``table_format="delta"``
    (sources/delta_log.py; ``delta_version`` rides the stage report and
    prior corpus builds stay time-travelable, which is exactly what a
    training-data lineage audit asks for)."""
    from stadvdb_olap_spark.sources.parquet import load_table, spread
    from stadvdb_olap_spark.sources.sinks import write_table

    if table_format not in ("parquet", "delta"):
        raise ValueError(f"table_format must be parquet|delta, got {table_format!r}")
    report: dict[str, dict[str, float | int]] = {}
    persisted: list[DataFrame] = []

    def stage(name: str, df: DataFrame, write: bool = False) -> DataFrame:
        t0 = time.perf_counter()
        if write and out_dir is not None:
            obs = Observation(f"{name}_rows")
            observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
            extra: dict[str, float | int] = {}
            if table_format == "delta":
                from stadvdb_olap_spark.sources.delta_log import write_delta

                extra["delta_version"] = write_delta(
                    observed, f"{out_dir}/{name}", mode="overwrite",
                    operation="CURATION LOAD",
                )
            else:
                write_table(observed, f"{out_dir}/{name}")
            rows = int(obs.get["rows"])
            report[name] = {
                "rows": rows,
                "seconds": round(time.perf_counter() - t0, 3),
                **extra,
            }
            log.info("stage %s: %d rows", name, rows)
            return df
        else:
            # Persist before counting: each stage's count is also the
            # materialization the NEXT stage builds on, so the DAG costs
            # one pass per stage instead of re-executing the whole
            # upstream lineage per count (O(stages^2) at 100 TB).
            # MEMORY_AND_DISK and shrinking survivor sets keep it
            # bounded; everything unpersists when the run finishes.
            df = df.persist()
            persisted.append(df)
            rows = df.count()
        secs = round(time.perf_counter() - t0, 3)
        report[name] = {"rows": rows, "seconds": secs}
        log.info("stage %s: %d rows in %.3fs", name, rows, secs)
        return df

    docs = spread(load_table(spark, sf_dir, "documents"))

    # Any stage (or write) failure must still release the persisted
    # frames — a leaked persist lives for the whole session, which adds
    # up across repeated probe/benchmark runs.
    try:
        _run_stages(spark, stage, docs, sf_dir)
    finally:
        for df in persisted:
            df.unpersist()
    return report


def _run_stages(spark, stage, docs: DataFrame, sf_dir: str) -> None:
    from stadvdb_olap_spark.functions.pii import scrub_pii
    from stadvdb_olap_spark.functions.text import fingerprint, token_count
    from stadvdb_olap_spark.operators.mixture import (
        contamination_scores,
        split_column,
        training_shards,
    )
    from stadvdb_olap_spark.operators.packing import concat_pack
    from stadvdb_olap_spark.operators.text_dedup import survivor_longest

    screened = stage("screen", _screened(docs, sf_dir))

    scrubbed = stage(
        "scrub",
        screened.withColumn("text", scrub_pii(F.col("text"))),
    )

    # exact dedup: smallest doc_id per content fingerprint survives
    fp = scrubbed.withColumn("__fp", fingerprint("text"))
    keep_ids = fp.groupBy("__fp").agg(F.min("doc_id").alias("doc_id"))
    exact = stage(
        "dedup_exact",
        fp.join(keep_ids, ["__fp", "doc_id"]).drop("__fp"),
    )

    # near dedup: quality-aware survivorship — the LONGEST member of each
    # verified near-dup cluster survives (the certified
    # dedup_survivor_longest_docs policy, shared code path), not the
    # arbitrary lowest id: clusters usually pair a full document with
    # its truncated/boilerplate-stripped copies.
    surv = survivor_longest(exact, "doc_id", "text", _NEAR_T)
    drop = surv.filter(~F.col("is_survivor")).select("doc_id")
    near = stage("dedup_near", exact.join(drop, "doc_id", "left_anti"))

    # decontaminate: GRADED scoring (the certified contamination_score_docs
    # device, shared code path) against the certified train/val/test hash
    # split — keep docs at or under the tolerance instead of dropping on
    # any single shared n-gram.
    heldout = docs.filter(split_column("doc_id") != "train")
    scores = contamination_scores(near, heldout, "doc_id", "text").filter(
        F.col("contamination_frac") <= _CONTAM_TOL
    )
    clean = stage(
        "decontaminate",
        near.join(scores.select("doc_id"), "doc_id", "left_semi"),
    )

    # layout: shards + concat-pack offsets in one frame. BOTH layout
    # components must derive from the SAME salted shard assignment or
    # the pack offsets tile a different partition than the shard files.
    sharded = training_shards(clean, _N_SHARDS, salt="shard:").select(
        "doc_id", "text", "shard", "shard_pos"
    )
    offsets = concat_pack(
        clean.select("doc_id", token_count("text").alias("n_tokens")),
        ctx_len=_CTX_LEN,
        n_shards=_N_SHARDS,
        salt="shard:",
    )
    layout = stage(
        "layout",
        sharded.join(offsets.drop("shard"), "doc_id"),
        write=True,
    )

    # manifest: per-shard counts + order-independent checksum (STRING —
    # certified outputs never carry decimals)
    row_hash = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("doc_id").cast("string"), "text")),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
        .cast("decimal(38,0)")
    )
    manifest = stage(
        "manifest",
        layout.select("shard", F.col("n_tokens"), row_hash.alias("__rh"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.coalesce(F.sum("__rh"), F.lit(0))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("checksum"),
        ),
        write=True,
    )
    del manifest
