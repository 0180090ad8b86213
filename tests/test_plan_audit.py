"""Repo-wide physical-plan audit: every catalog query's plan is swept
for the anti-patterns that kill 100 TB jobs.

Rules (each exception is an explicit, justified allowlist entry — a new
query that trips a rule must either fix its plan or document why here):

1. ``CartesianProduct`` never appears — an unkeyed cross of two
   fact-sized inputs is never the right plan.
2. ``BroadcastNestedLoopJoin`` only where one side is a 1-row scalar
   aggregate (share-of-total style) or a broadcast interval dimension
   (range join) — the known-bounded NLJ shapes.
3. ``BatchEvalPython`` (row-at-a-time pickled Python UDF) never
   appears: Python reaches plans only through Arrow-vectorized nodes
   (ArrowEvalPython / *InPandas / MapInArrow).
4. An UNPARTITIONED window (``Exchange SinglePartition`` + WindowExec)
   may only consume a bounded grain: its input subtree must contain an
   aggregate (post-aggregation grains: calendar days, vocab, strata,
   per-range-partition offsets) or bottom out in local relations —
   never raw fact rows. A window the detector can't prove bounded
   (e.g. top-k-limited inputs) needs an ``_SP_WINDOW_OK`` entry naming
   the bound. Global ranks at data grain use the two-pass offset rank
   (``operators/rank.py``) instead.
"""

from __future__ import annotations

import pytest

from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR, query_df

_ensure_loaded()

# Queries whose BroadcastNestedLoopJoin is a bounded scalar/interval
# broadcast by construction (1-row aggregate side or tiny interval dim).
_BNLJ_OK = {
    "q11_important_parts",  # scalar threshold subquery
    "q15_top_supplier",  # scalar max-revenue subquery
    "q17_small_qty_avg_yearly",  # per-part avg, broadcast
    "q22_dormant_customers",  # scalar avg balance
    "orders_above_global_avg",  # scalar global avg
    "range_join_price_bands",  # broadcast interval dimension
    "histogram_order_totals",  # broadcast bin edges
    "benford_first_digit_orders",  # 1-row total
    "tv_distance_source_unigrams",  # 1-row corpus total
    "iqr_outlier_events",  # 1-row quartile bounds
    "stats_quantity_price",  # 1-row moments
    "variant_props_bucketed",  # 1-row scalar bounds
    "weighted_sample_orders_priority",  # 1-row total weight
    "negative_sample_customer_parts",  # bounded candidate cross
    "chunk_documents_sliding",  # posexplode over per-row ranges
    "poisson_bootstrap_ci_revenue",  # 1-row point estimate x 1-row CI
    "decile_qq_drift_events_value",  # 1-row midpoint + 9-row decile-rank broadcast
    "interpolate_hourly_signup_value",  # 1-row bounds -> grid
    "decontaminate_train_docs",  # broadcast heldout shingles
    "mixture_weighted_sample_docs",  # 1-row source weights
    "token_budget_per_source_docs",  # 1-row budget scalar
    "sketch_theta_click_purchase_overlap",  # 1-row sketch pair
    "sketch_kll_price_quantile_bracket",  # 1-row sketch
    "dq_checks_orders",  # 1-row conditional-aggregate summary
    "chi_square_priority_status",  # marginals broadcast
    "ab_test_purchase_rate",  # 1-row wide arms
    "ab_test_cuped_value",  # 1-row period-bounds broadcast
    "share_of_total_by_segment",  # 1-row total broadcast
    "autocorr_daily_revenue_lag7",  # 1-row moments
    "gini_customer_revenue",  # 1-row folded moments
    "survival_weekly_users",  # 1-row factor array broadcast
    "rfm_segments_customers",  # 1-row max-date broadcast
    "basket_part_pairs_lift",  # 1-row basket-count broadcast
    "corr_matrix_lineitem",  # 1-row moments unioned 6x
    "q2_min_cost_supplier",  # scalar min-cost subquery
    "q20_excess_quantity_suppliers",  # 1-row avg-threshold broadcast
    "ann_cosine_topk",  # broadcast query side (max_queries-bounded)
    "ann_binary_quant_topk",  # broadcast query codes, int coarse pass
    "hard_negatives_by_label",  # broadcast query side, label-blocked
    "sketch_hll_mergeable_rollup",  # 1-row merged-sketch side
    "term_lift_scores",  # 1-row corpus token total
    "q6_forecast_revenue",  # scalar revenue
    "q8_market_share",  # scalar year shares
    "q14_promo_revenue",  # scalar promo ratio
    "trimmed_mean_price_by_priority",  # per-group bounds broadcast
    "fuzzy_part_name_pairs",  # blocked vocab self-join
    "bigram_lm_logprob_docs",  # 1-row vocab size
    "bm25_topk_docs",  # 1-row corpus stats
    "tfidf_top_terms",  # 1-row doc count
    "key_skew_profile_events",  # 1-row total
    "simpson_diversity_source_unigrams",  # 1-row corpus total (if any)
    "weighted_median_price_by_flag",  # per-group totals
    "train_val_test_split_docs",  # 1-row split bounds
    "stratified_sample_per_status",  # per-group counts broadcast
    "rolling_origin_folds_events",  # fold spec cross
    "minhash_wide_signatures_docs",  # salt-group generator cross
    "segment_dedup_docs",  # 1-row corpus params
    "setjoin_prefix_jaccard_pairs",  # prefix-block self-join
    "vocab_build_docs",  # 1-row vocab size
    "pit_join_events_priority",  # as-of timeline union
    "label_purchase_within_7d",  # bounded horizon
    "funnel_view_click_purchase",  # bounded stage windows
    "ohlc_hourly_by_type",  # bounded bars
    "semdedup_fixed_centroids",  # bounded pinned-centroid broadcast
    "ann_ivf_fixed_topk",  # bounded pinned-centroid broadcast
    "rrf_fusion_topk_docs",  # 1-row corpus stats + 1-row query vector
    "cusum_changepoints_daily_revenue",  # 1-row total/mean broadcast
    "dedup_recall_audit_docs",  # three 1-row count aggregates crossed
    "pagerank_copurchase_3iter",  # 1-row node-count broadcast per iter
    "pagerank_weighted_copurchase_3iter",  # same 1-row broadcast
    "theil_sen_trend_daily_revenue",  # calendar-bounded pairwise-slope theta-join
    "mann_kendall_trend_daily_revenue",  # same calendar-bounded pair join
    "theil_sen_windowed_trend_daily_revenue",  # pair join IS equi; 1-row median/count scalars crossed
    "mann_kendall_windowed_trend_daily_revenue",  # same 1-row scalar cross
    "collocation_lift_bigrams",  # 1-row bigram-total broadcast
    "stratified_ate_priority_value",  # 1-row stratum-totals broadcast
    "quantile_normalize_order_totals",  # 1-row global-count broadcast
    "decile_bins_order_totals",  # 1-row global-count broadcast (ntile N)
    "curriculum_phases_docs",  # 1-row corpus-count broadcast (ntile N)
    "acf_panel_daily_revenue",  # 14-row literal lag-set cross
    "ewma_control_chart_daily_revenue",  # 1-row mu/var scalar cross
    "hits_copurchase_2iter",  # 1-row max-score broadcasts (normalization)
    "sketch_ams_f2_lineitem",  # 16-row literal seed cross + 1-row exact-F2
    "markov_removal_attribution",  # 4-row variant cross + 1-row base/total
    "ann_pq_adc_topk",  # 1-row query distance-table broadcast
    "mmr_diversified_topk",  # 20-row checkpointed candidate pool crosses
    "ccf_leadlag_click_purchase",  # 15-row literal lag-set cross
    "share_within_region_nation",  # 1-row world-total cross
    "bh_fdr_segment_purchase_rate",  # 1-row pooled-total + 1-row maxq cross
    "ks_test_value_click_purchase",  # 1-row n1/n2 scalar crosses
    "spearman_quantity_discount",  # bounded marginal/total broadcasts
    "kendall_tau_quantity_discount",  # 550-cell bounded contingency self-join
    "jackknife_ratio_se_revenue_per_order",  # 16-row bucket/total crosses
    "forecast_baselines_daily_revenue",  # 1-row train stats / y_last crosses
    "chapman_estimate_users",  # four 1-row count aggregates crossed
    "embedding_centroid_drift_labels",  # |labels|x|labels| centroid pair cross (10 rows)
    "decayed_trending_event_types",  # 1-row max-date broadcast
    "cramers_v_priority_status",  # 1-row chi2/dims scalar broadcasts
    "record_linkage_selfmatch_customers",  # 1-row dirty-count broadcast
    "littles_law_audit_sessions",  # 1-row sweep-area broadcast
    "abc_xyz_matrix_parts",  # 1-row week-horizon broadcast
    "temperature_mixture_docs",  # 1-row min-source-count broadcast
    "textrank_keywords_docs",  # 1-row node-count broadcast per iter
    "triangle_stats_parts",  # 1-row wedge-count broadcast
    "lpa_modularity_parts",  # 1-row edge-count broadcast
    "ann_pq_recall_audit",  # 1-row pinned query vector cross (measured)
    "ann_pq_fitted_rerank_topk",  # 1-row query ADC-table broadcast + R-bounded rerank
    "ann_pq_fitted_recall_audit",  # same fitted-PQ shape + 1-row query cross
    "ann_ivfadc_topk",  # broadcast pinned cells + 1-row query ADC table
    "ann_ivfadc_recall_audit",  # same IVFADC shape + 1-row query cross
    "ann_ivf_topk",  # aggregate-bounded Lloyd-refined centroid broadcast (8 rows)
    "semdedup_embeddings",  # same refined-centroid broadcast
    "ann_matryoshka_prefix_topk",  # broadcast query side (max_queries-bounded, measured)
    "snapshot_retention_gfs_orders",  # 1-row as-of max-date broadcast
    "triangle_census_copurchase_parts",  # three 1-row count aggregates crossed
    "bloom_skip_audit_orders",  # filter-bounded probe-key broadcast (measured)
    "gdpr_erasure_blast_radius_star",  # paired 1-row count aggregates crossed
    "hilbert_vs_zorder_prune_orders",  # 1-row grid-bounds broadcast cross
}


# Queries whose unpartitioned window consumes an input that is bounded
# by construction but not provably so from plan structure alone.
_SP_WINDOW_OK = {
    # full-outer join of two top-k lists (k=20 each, window-limit
    # filters upstream) — the fused window sees <= 2k rows
    "rrf_fusion_topk_docs",
}

# Rule-2 enforcement (round 8): an _BNLJ_OK entry is no longer taken on
# comment faith. Every BroadcastNestedLoopJoin BUILD side must either be
# PROVABLY bounded from plan structure (_bounded_grain: all paths pass
# an aggregate / bottom out in local relations) or, failing that, is
# EXECUTED and its row count asserted under this ceiling — so a future
# entry whose "bounded scalar" is actually fact-grain fails loudly with
# the measured size instead of shipping a 100 TB cross.
_BNLJ_BUILD_ROW_CEILING = 20_000


def _children(node):
    cs = node.children()
    kids = [cs.apply(i) for i in range(cs.length())]
    if not kids:
        try:  # ReusedExchangeExec: follow the reused subtree
            kids = [node.child()]
        except Exception:
            try:  # QueryStageExec (AQE): descend into the staged plan
                kids = [node.plan()]
            except Exception:
                pass
    return kids


def _bounded_grain(node, depth=0):
    """True when every path from `node` to a leaf passes through an
    aggregate or ends in a local relation — i.e. the relation's size is
    set by group cardinality / literals, not by raw fact rows."""
    if depth > 80:
        return False
    cn = node.getClass().getSimpleName()
    if "Aggregate" in cn or cn in ("LocalTableScanExec", "RangeExec"):
        return True
    kids = _children(node)
    if not kids:
        return False  # a real scan leaf
    return all(_bounded_grain(k, depth + 1) for k in kids)


def _walk(node):
    stack, seen = [node], set()
    while stack:
        n = stack.pop()
        if id(n) in seen:
            continue
        seen.add(id(n))
        yield n
        stack.extend(_children(n))


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_plan_has_no_antipatterns(spark, name):
    df = query_df(spark, name)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    body = plan.split("== Physical Plan ==")[-1]
    assert "CartesianProduct" not in body, f"{name}: unkeyed cartesian join"
    if name not in _BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in body, (
            f"{name}: unexpected nested-loop join — if the build side is "
            "a bounded scalar/interval broadcast, allowlist it with a "
            "justification"
        )
    elif "BroadcastNestedLoopJoin" in body:
        # Verify the allowlist claim: prove or MEASURE every build side.
        exec_plan = df._jdf.queryExecution().executedPlan()
        if exec_plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            exec_plan = exec_plan.initialPlan()
        unproven = False
        for node in _walk(exec_plan):
            if "BroadcastNestedLoopJoin" not in node.getClass().getSimpleName():
                continue
            builds = [
                k for k in _children(node)
                if "Broadcast" in k.getClass().getSimpleName()
            ]
            assert builds, f"{name}: BNLJ with no broadcast child?"
            unproven = unproven or not all(_bounded_grain(b) for b in builds)
        if unproven:
            # Structure alone can't bound the build side (interval dims,
            # blocked self-joins, checkpointed candidate pools). Run the
            # query and read each BNLJ-feeding BroadcastExchange's actual
            # numOutputRows metric — a measured bound, not comment faith.
            df.write.format("noop").mode("overwrite").save()
            final = df._jdf.queryExecution().executedPlan()
            if final.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
                final = final.executedPlan()
            for node in _walk(final):
                if "BroadcastNestedLoopJoin" not in node.getClass().getSimpleName():
                    continue
                for b in _children(node):
                    if "Broadcast" not in b.getClass().getSimpleName():
                        continue
                    if _bounded_grain(b):
                        continue
                    exchanges = [
                        x for x in _walk(b)
                        if x.getClass().getSimpleName() == "BroadcastExchangeExec"
                    ]
                    for x in exchanges[:1]:
                        n_rows = x.metrics().apply("numOutputRows").value()
                        assert n_rows <= _BNLJ_BUILD_ROW_CEILING, (
                            f"{name}: BNLJ build side is neither "
                            f"aggregate/literal-bounded nor small — "
                            f"measured {n_rows} rows at test SF (ceiling "
                            f"{_BNLJ_BUILD_ROW_CEILING}). The allowlist "
                            "comment is wrong; fix the plan."
                        )
    # UDTFs are a separate lateral surface (BatchEvalPythonUDTF /
    # ArrowEvalPythonUDTF — conf-dependent which); the ban is on
    # row-at-a-time SCALAR Python UDFs only.
    scalar_body = body.replace("BatchEvalPythonUDTF", "")
    assert "BatchEvalPython" not in scalar_body, (
        f"{name}: row-at-a-time Python UDF — use Arrow"
    )
    # Rule 4: unpartitioned windows only over bounded grains.
    if name not in _SP_WINDOW_OK and "SinglePartition" in body:
        exec_plan = df._jdf.queryExecution().executedPlan()
        if exec_plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            exec_plan = exec_plan.initialPlan()
        for node in _walk(exec_plan):
            cn = node.getClass().getSimpleName()
            if cn in ("WindowExec", "WindowGroupLimitExec"):
                if node.partitionSpec().isEmpty():
                    child = _children(node)[0]
                    assert _bounded_grain(child), (
                        f"{name}: unpartitioned window over an unbounded "
                        "(fact-grain) input — every row funnels through "
                        "one task. Use the two-pass offset rank "
                        "(operators/rank.py) or aggregate first; if the "
                        "input is bounded in a way the detector can't "
                        "see, allowlist it in _SP_WINDOW_OK with the "
                        "bound."
                    )
