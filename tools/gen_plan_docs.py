"""Generate PLANS.md: formatted physical plans for representative queries.

Evidence artifact for the scale claims in SCALING.md/COVERAGE.md — shows
pushed filters, broadcast vs shuffle joins, exchange counts, and
whole-stage-codegen spans as Catalyst actually plans them at sf0.01.

Usage: python tools/gen_plan_docs.py > PLANS.md
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"

# (query, what the plan should show)
SHOWCASE = [
    ("q6_forecast_revenue",
     "every predicate reaches the parquet scan as PushedFilters; the "
     "round-robin exchange is spread() parallelizing the single-row-group "
     "fixture file (self-disabling on real multi-file data), then partial "
     "aggregate -> 1-row final aggregate"),
    ("q19_disjunctive_brackets",
     "the OR-of-ANDs splits: part-side brackets push to the part scan, the "
     "derived l_quantity bounds push to the fact scan, the residual "
     "disjunction evaluates post-join; part broadcasts"),
    ("q3_top_unshipped_revenue",
     "dim filters push into their scans, customer broadcasts, the top-10 is "
     "TakeOrderedAndProject (no global sort)"),
    ("q21_last_shipper_wait",
     "EXISTS/NOT EXISTS become semi/anti self-joins; at this SF they "
     "broadcast, at cluster scale AQE plans sort-merge co-located on "
     "l_orderkey"),
    ("fact_star",
     "every foreign-key resolution is a BroadcastHashJoin and same-key "
     "lookups are pre-combined dim-side (customer+nation, part+price), so "
     "the fact pays 3 broadcast probes and is never shuffled to build the "
     "star"),
    ("variant_props_bucketed",
     "the props JSON parses once into a VARIANT and typed paths extract "
     "from the parsed form (variant_get in the project) — no repeated "
     "string re-parsing; the distinct-user count is a two-phase aggregate"),
    ("udtf_chunk_ranges_docs",
     "the Python UDTF evaluates as a lateral Generate over Arrow batches "
     "(ArrowEvalPythonUDTF / BatchEvalPythonUDTF node) fed by a narrow "
     "token-count projection — the escape-hatch shape, kept off hot paths"),
    ("dedup_incremental_delta",
     "the delta batch's band table and shingle sets broadcast against the "
     "corpus (two BroadcastHashJoins) — the corpus is probed in place, "
     "never shuffled or recomputed, so per-ingest cost tracks the batch"),
    ("salted_join_event_value_by_segment",
     "the replicate side expands through a Generate (explode over the salt "
     "range) and the join key is (user_id, salt) — a hot key's rows spread "
     "over 8 reducers; the follow-up aggregate is two-phase on the segment"),
    ("dedup_minhash_pairs",
     "the only wide operation is the exchange on LSH band keys — no n^2 "
     "pair comparison appears anywhere in the plan"),
    ("pack_chunks_512",
     "per-group sequential logic (first-fit-decreasing) runs as ONE "
     "FlatMapGroupsInPandas (Arrow-batched) after a single exchange on the "
     "content-addressed bucket key; everything before it is narrow"),
    ("chunk_documents_sliding",
     "tokenize -> per-row sequence -> explode -> slice is all narrow "
     "(Generate + Project, no exchange beyond spread()'s widening)"),
    ("setjoin_prefix_jaccard_pairs",
     "the exact set-similarity self-join never goes n^2: the candidate "
     "exchange is keyed on PREFIX shingles only (rarest-first order, "
     "length-filtered), then exact Jaccard verifies just the surviving "
     "pairs — 100% recall with LSH-like cost"),
    ("interval_overlap_sessions_bursts",
     "the temporal join is an EQUI-join on exploded hour buckets (never "
     "BroadcastNestedLoop/Cartesian); the overlap predicate and distinct "
     "run on bucket collisions only"),
    ("corr_matrix_lineitem",
     "ONE scan + one two-phase aggregate computes all 15 prescaled "
     "integer moments; the 6 long-form correlation rows come from a "
     "Generate (explode of a literal struct array) over the 1-row "
     "moments frame, so adding measure pairs never rescans the fact"),
    ("markov_event_transitions",
     "one exchange on user_id for the lead() window, then a hash "
     "aggregate onto the |types|^2 transition matrix; the row-normalizing "
     "window runs on the tiny matrix side"),
    ("rcte_min_label_clusters",
     "Spark 4 WITH RECURSIVE plans as UnionLoop over the edge view -- "
     "depth-capped, improving-label-pruned min-label propagation; the "
     "declarative twin certifying the iterative clusterer"),
    ("fingerprint_core_tables",
     "each table is scan -> narrow canonicalize/hash projection -> "
     "partial+final 1-row aggregate; the three fingerprints union without "
     "any wide operation — the whole-warehouse compare ships 3 rows"),
    ("ann_ivf_fixed_topk",
     "the pinned centroid set broadcasts (bounded by construction); "
     "candidate assignment is an ARGMIN AGGREGATE over the cross "
     "(min(struct(d, cid)) — partial aggregation collapses the "
     "|centroids| copies map-side, so the exchange is ~N slim rows, "
     "never N x |centroids| vector payloads), query probing a bounded "
     "windowed rank; the search itself is a hash join ON THE CELL ID — "
     "the probe side touches n_probe/|cells| of the corpus, and no "
     "driver collect anywhere"),
    ("pack_concat_offsets_docs",
     "one exchange on the shard id, a per-shard sort for the running "
     "cumsum window, then pure integer-division projections — the whole "
     "packing layout without a global sort or any sequential stage"),
    ("pagerank_copurchase_3iter",
     "the 3 unrolled power iterations duplicate the edge-derivation "
     "subtree in the initial plan, but the executed adaptive plan "
     "collapses them: ~28 ReusedExchange nodes (exchange reuse is why "
     "unrolled iterative DataFrame plans don't rescan their inputs per "
     "iteration); each iteration itself is one edges-to-ranks join + one "
     "dst-keyed sorted-fold aggregation, and the node-count scalar rides "
     "a 1-row broadcast"),
    ("poisson_bootstrap_ci_revenue",
     "the 32-replicate resample is a map-side Generate (explode of the "
     "replicate range) with the Poisson weight computed inline from one "
     "md5 — partial aggregation reduces every partition to <=32 rows "
     "before the exchange, so the bootstrap's only wide operation moves "
     "32 keys (measured 1.7 KB at sf0.1)"),
    ("tree_ensemble_score_docs",
     "the pinned 4-tree ensemble lowers to nested CASE inside ONE "
     "WholeStageCodegen projection over the scan — model inference "
     "without leaving the generated code, no shuffle, no Python"),
    ("kcore_parts_k90",
     "each peel round is a degree hash-aggregate over both endpoint "
     "projections plus two survivor hash-joins, all keyed on node ids; "
     "rounds localCheckpoint (the connected_components device) because "
     "the peel recurrence references the prior round 3x — the displayed "
     "plan is the final round over the checkpointed survivor edges, "
     "linear in rounds instead of 3^rounds"),
    ("theil_sen_windowed_trend_daily_revenue",
     "the bounded-lag pair set builds as explode(1..W) + HASH equi-join "
     "on the day rank (never a BroadcastNestedLoop range join): O(n*W) "
     "rows through one keyed exchange, so the trend estimator survives "
     "a minute-grain series where the exact O(n^2) theta-join would not"),
    ("multimodal_ppm_resize_fingerprint",
     "render -> REAL nearest-neighbor resample -> fingerprint is three "
     "chained Arrow-batched mapInPandas nodes over a narrow projection — "
     "ZERO shuffle bytes end-to-end (measured at sf0.1); the media path "
     "scales embarrassingly with input splits"),
    ("systematic_sample_orders",
     "the bucketed two-phase offset rank (operators/rank.py): the data "
     "moves through ONE hash exchange on the value-derived daily bucket "
     "into a PARTITIONED window (per-bucket parallel sorts); the only "
     "SinglePartition exchange feeds the |buckets|-row cumulative-offset "
     "window ABOVE a HashAggregate; offsets broadcast back — no "
     "fact-grain single-partition stage anywhere (plan-audit rule 4)"),
    ("markov_removal_attribution",
     "the entire 12-step chain solve is a WITHIN-ROW nested fold over "
     "the dense per-variant matrix: after the sessionization window and "
     "one transition-count aggregate, the plan is joins/aggregates over "
     "bounded relations only — no per-iteration exchanges at all"),
    ("cdc_generate_apply_roundtrip_orders",
     "the generate->apply inverse identity in one plan: the snapshot "
     "diff is ONE full-outer sort-merge join on the key, the feed "
     "compaction a same-keyed window, the replay one anti-join + union "
     "— three key-partitioned exchanges total, nothing at driver, and "
     "the feed the downstream replays is |changes|-sized"),
    ("late_arriving_dim_repair_orders",
     "both the load-time resolve and the repair pass are "
     "BroadcastHashJoins against the dimension key map; the repair "
     "branch filters to the placeholder slice BEFORE its join, so the "
     "second pass touches |late rows|, never the fact table"),
    ("backfill_ranges_orders",
     "the only fact-sized work is the distinct-days aggregate with "
     "map-side partials; the calendar explodes from a 1-row bounds "
     "aggregate, and the islands window runs over the calendar-bounded "
     "missing-days relation (plan-audit rule 4: bounded grain above "
     "every unpartitioned window)"),
    ("dedup_survivor_longest_docs",
     "the survivorship policy adds exactly one partitioned window "
     "(cluster id) and one token-count join on top of the certified "
     "banded-LSH clustering — no new fact-grain exchange, and the "
     "cluster relation it ranks is |clustered docs|, not |corpus|"),
    ("ann_ivf_topk",
     "the certified Lloyd step: refined centroids come from a (cell, "
     "dim)-keyed aggregate over posexploded scalars (never whole "
     "vectors), broadcast back for assignment and probing; the search "
     "joins probes to candidates ON THE CELL ID, so the exact-cosine "
     "stage scans ~n_probe/|cells| of the corpus"),
    ("bloom_skip_audit_orders",
     "the mask build is one hash aggregate folding bit_or over 4 "
     "BIGINT words per ingest day — map-side combinable, |days| "
     "output rows; the probe stage is a broadcast cross of the "
     "bounded probe-key set against the |days|-row bloom relation "
     "plus one membership left-join, never fact-grain"),
    ("rolling_7d_distinct_users_daily",
     "the range-join-to-equi-join device: the day-deduplicated "
     "activity relation explodes x7 to the report days it feeds, "
     "then everything keys on the report day (semi-join + distinct "
     "aggregate) — no BNLJ range join, no per-day rescan"),
    ("spatial_radius_join_customers",
     "the 2D range join is an EQUI-join on r-sized grid-cell ids with "
     "a 9x Generate of the probe side only (never "
     "BroadcastNestedLoop/Cartesian); the exact squared-distance "
     "verify runs on cell collisions only — the interval-overlap "
     "device lifted to two dimensions"),
    ("image_near_dup_ahash",
     "one Arrow-batched mapInPandas computes every perceptual hash "
     "(zero shuffle), then the only wide operation is the exchange on "
     "(band index, band value) — the LSH banding shape applied to the "
     "image modality; Hamming verify touches colliding buckets only"),
    ("kmv_bottomk_ndv_orders",
     "the bottom-k sketch ranks inside (group, hash-bucket) partitions "
     "first — parallel, each keeping <= k survivors — so the final "
     "per-group rank sees a bounded relation; no group ever funnels "
     "through one task (the rank.py two-phase device), and the NDV "
     "ground-truth join rides a broadcast"),
    ("range_sync_plan_orders",
     "both copies reduce through map-side-combinable hash aggregates "
     "to |buckets|-row summaries (4.9 KB of shuffle at sf0.1, "
     "measured), and the full-outer compare joins ONLY summaries — "
     "the two-table diff never moves row data"),
    ("bpe_merge_step_docs",
     "one fact-sized word-count exchange, then the 8-merge replace "
     "chain and the pair explode run as narrow projections over the "
     "vocabulary; the frontier is a vocab-sized hash aggregate "
     "finished by TakeOrderedAndProject(10) — no global sort"),
    ("scd2_validity_audit_customers",
     "the history build, the damage projection, and the audit "
     "window+aggregate all share ONE exchange on the dimension key "
     "(the window partitioning is reused); the final 4-rule stack is "
     "a 1-row projection"),
]


def plan_text(df) -> str:
    spark = df.sparkSession
    try:
        jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        return df._jdf.queryExecution().explainString(jmode)
    except Exception:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def trim(text: str, max_lines: int = 60) -> str:
    # Drop the verbose Output/Arguments detail lines; keep structure,
    # pushed filters, and join/exchange nodes.
    keep: list[str] = []
    for line in text.splitlines():
        if re.search(r"Output \[|Arguments: \[|Input \[|^\(\d+\) Project", line):
            continue
        if "Location:" in line or "ReadSchema:" in line:
            continue
        keep.append(line.rstrip())
    out: list[str] = []
    blank = False
    for line in keep:
        if not line.strip():
            if blank:
                continue
            blank = True
        else:
            blank = False
        out.append(line)
    if len(out) > max_lines:
        out = out[:max_lines] + [f"... ({len(out) - max_lines} more lines)"]
    return "\n".join(out)


def main() -> None:
    from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded
    from stadvdb_olap_spark.session import get_session

    _ensure_loaded()
    spark = get_session()
    print("# PLANS — physical-plan evidence (generated by tools/gen_plan_docs.py)")
    print()
    print(f"`explain(formatted)` at `{SF_DIR}`, AQE on. What each plan is")
    print("evidence OF is stated above it; regenerate after plan-affecting")
    print("changes.")
    for name, claim in SHOWCASE:
        df = REGISTRY[name].fn(spark, SF_DIR)
        print(f"\n## {name}\n\n*{claim}*\n")
        print("```")
        print(trim(plan_text(df)))
        print("```")


if __name__ == "__main__":
    sys.exit(main())
