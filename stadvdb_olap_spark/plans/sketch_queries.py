"""DataSketches catalog queries — mergeable sketch estimators.

The scale story: exact COUNT(DISTINCT) / quantiles / set-overlap force a
shuffle of every distinct value; a mergeable sketch is a few KB of state
per group that partial-aggregates map-side and merges associatively, so
at 100 TB the same query is one narrow pass + a tiny exchange. Spark 4
ships Apache DataSketches (HLL, KLL, Theta, approx_top_k) as built-in
JVM expressions — no UDFs anywhere here.

Oracle convention (same as ``approx_percentiles_by_priority``): sketch
estimates are implementation-specific, so the hash-checked output is the
EXACT value plus a boolean claiming the estimate lies within the
sketch's error bound; the DuckDB twin asserts the claim is TRUE for
every row. ``sketch_topk_event_types`` is the exception: with
maxItemsTracked >= the distinct count the sketch is in its exact regime,
so the full (item, count) set hash-matches an exact GROUP BY.

count_min_sketch is deliberately absent: Spark exposes the binary
aggregate but no point-lookup expression, so there is no SQL-surface
query to mirror (the DataFrame-side ``df.stat.countMinSketch`` covers
that niche driver-side).

No counterpart exists in the reference (its only aggregates are exact
pandas groupbys, SURVEY.md §2.9) — this extends the approx family
(approx_percentile / approx_count_distinct) already certified in round 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.sources.parquet import load_table


@query(
    "sketch_hll_users_per_type",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE                    AS hll_within_5pct
FROM events GROUP BY event_type
""",
)
def sketch_hll_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group distinct-user estimate from an HllSketch (lgConfigK=12
    default: ~1.6% RSE, so 5% is a >3-sigma bound). Map-side the sketch
    partial-aggregates; only ~2.5 KB per (partition, group) crosses the
    exchange — versus the exact half's full distinct shuffle."""
    ev = load_table(spark, sf_dir, "events")
    exact = F.count_distinct("user_id")
    est = F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
    return ev.groupBy("event_type").agg(
        exact.alias("exact_users"),
        ((F.abs(est - exact) / exact) <= F.lit(0.05)).alias("hll_within_5pct"),
    )


@query(
    "sketch_hll_mergeable_rollup",
    oracle="""
SELECT count(DISTINCT user_id) AS exact_users,
       TRUE                    AS union_within_5pct
FROM events
""",
)
def sketch_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeability property itself: per-type sketches unioned with
    hll_union_agg must estimate the GLOBAL distinct count — the pattern
    that lets a 100 TB rollup reuse per-partition sketches instead of
    re-scanning (e.g. daily sketches -> monthly distinct in one merge of
    a few KB per day)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = ev.agg(F.count_distinct("user_id").alias("exact_users"))
    return exact.crossJoin(merged).select(
        "exact_users",
        ((F.abs(F.col("est") - F.col("exact_users")) / F.col("exact_users"))
         <= F.lit(0.05)).alias("union_within_5pct"),
    )


@query(
    "sketch_theta_click_purchase_overlap",
    oracle="""
SELECT count(*) AS exact_overlap,
       TRUE     AS theta_within_10pct
FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
)
""",
)
def sketch_theta_click_purchase_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Set-expression cardinality without materializing either set: Theta
    sketches of clickers and purchasers built in ONE pass over events
    (conditional aggregation), intersected sketch-side. The exact half
    pays two distincts + a join; the sketch half is two 4 KB summaries —
    the 100 TB path for audience-overlap questions."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("a"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("b"),
    ).select(
        F.theta_sketch_estimate(F.theta_intersection("a", "b")).alias("est")
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    exact = clicks.join(buys, "user_id").agg(
        F.count(F.lit(1)).alias("exact_overlap")
    )
    return exact.crossJoin(sk).select(
        "exact_overlap",
        ((F.abs(F.col("est") - F.col("exact_overlap")) / F.col("exact_overlap"))
         <= F.lit(0.10)).alias("theta_within_10pct"),
    )


@query(
    "sketch_kll_price_quantile_bracket",
    oracle="""
SELECT l_returnflag,
       CAST(round(quantile_cont(l_extendedprice, 0.50), 4) AS DOUBLE) AS p50_exact,
       TRUE AS kll_p50_in_rank_bounds
FROM lineitem GROUP BY l_returnflag
""",
)
def sketch_kll_price_quantile_bracket(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KLL quantile sketch vs its own guarantee: the estimate's RANK must
    land within +-4% of the target (k=200 bounds ~1.65% single-sided at
    99% confidence; 4% leaves randomization margin), asserted by
    bracketing the estimate between the exact p46 and p54 VALUES. KLL is
    the mergeable, fixed-memory quantile path at scale — the exact
    percentile needs the whole sorted group."""
    li = load_table(spark, sf_dir, "lineitem")
    kll = F.kll_sketch_get_quantile_double(
        F.kll_sketch_agg_double("l_extendedprice"), F.lit(0.5)
    )
    lo = F.percentile("l_extendedprice", F.lit(0.46))
    hi = F.percentile("l_extendedprice", F.lit(0.54))
    exact = F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).cast("double")
    return li.groupBy("l_returnflag").agg(
        exact.alias("p50_exact"),
        ((kll >= lo) & (kll <= hi)).alias("kll_p50_in_rank_bounds"),
    )


@query(
    "sketch_topk_event_types",
    oracle="""
SELECT event_type, count(*) AS freq
FROM events GROUP BY event_type
""",
)
def sketch_topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k in its exact regime: maxItemsTracked (default 10000)
    exceeds the distinct event_type count, so the sketch's (item, count)
    pairs are exact and hash-match a plain GROUP BY — while keeping the
    one-pass bounded-memory shape that still works when the domain
    explodes past memory (then counts degrade to within the sketch's
    documented error instead of OOMing)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.agg(F.expr("approx_top_k(event_type, 5)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("event_type"),
            F.col("e.count").alias("freq"),
        )
    )
