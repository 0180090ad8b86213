"""Query catalog registry — the driver contract's backbone.

Every implemented operator from SURVEY.md §2 (and the training-data-pipeline
extensions) registers here as a named query: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus, where SQL-expressible, an equivalent
DuckDB oracle SQL string. ``__spark_entry__.queries()`` / ``oracle_sql()``
re-export this registry verbatim.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""
    defer: bool = False  # True => register after every oracle-backed query


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str, oracle: str | None = None, defer: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Register a catalog query. ``oracle`` is ANSI/DuckDB SQL over the
    pre-registered fixture views producing IDENTICAL column names, types
    (post the compat conventions below) and multiset of rows.

    ``defer=True`` pushes the query after every non-deferred one in the
    exported ordering: the external driver hash-checks the FIRST 50
    registered queries per round, so rows-only queries (no oracle by
    design) defer to keep the window spent on hash-certifiable entries.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", defer=defer
        )
        return fn

    return deco


# ROUND-8 WINDOW (query-level rotation): the external driver hash-certifies
# the FIRST 50 exported queries each round, cumulatively. Rounds 1-7 signed
# 272 of 306 oracle-backed queries (latest-fail 0). This front = the 34
# never-windowed round-7 additions (all judge-verified MATCH at sf0.01 in
# the r7 verdict, risk set also at sf0.1) followed by 16 staleness
# re-certifications (the r2-signed TPC-H family and ETL rows, now 6 rounds
# of refactors old). Produced verbatim by `python tools/next_window.py`,
# which appends the staleness fill after the never-windowed set. After
# this round the cumulative ledger covers all 306 oracle-backed queries.
#
# ROUND-9 ROTATION: run `python tools/next_window.py` — it diffs the
# catalog against every CORRECTNESS_r*.json (counting only
# rows+schema+hash-green rows as signed) and prints the next front list;
# replace this tuple with it.
ROUND8_FRONT: tuple[str, ...] = (
    # 34 never-windowed round-7 additions
    "share_within_region_nation",
    "padding_waste_audit_docs",
    "order_total_reconciliation_audit",
    "mahalanobis_outliers_lineitem",
    "hits_copurchase_2iter",
    "multimodal_resize",
    "l_diversity_audit_customers",
    "systematic_sample_orders",
    "incremental_agg_maintenance_orders",
    "acf_panel_daily_revenue",
    "sketch_ams_f2_lineitem",
    "chao1_vocab_estimate_docs",
    "ann_pq_adc_topk",
    "curriculum_phases_docs",
    "fd_g3_discovery_orders",
    "bh_fdr_segment_purchase_rate",
    "reservoir_k_per_priority_orders",
    "ewma_control_chart_daily_revenue",
    "mmr_diversified_topk",
    "sentence_boilerplate_docs",
    "markov_removal_attribution",
    "blocklist_screen_docs",
    "ccf_leadlag_click_purchase",
    "new_vs_returning_daily_revenue",
    "ks_test_value_click_purchase",
    "spearman_quantity_discount",
    "kendall_tau_quantity_discount",
    "wilson_ci_purchase_rate_segments",
    "jackknife_ratio_se_revenue_per_order",
    "forecast_baselines_daily_revenue",
    "cochran_armitage_trend_balance_bands",
    "chapman_estimate_users",
    "rolling_ols_slope_daily_revenue",
    "watermark_lateness_audit_events",
    "merge_upsert_orders_evolving",  # re-cert (signed r2)
    "minhash_signatures_docs",  # re-cert (signed r2)
    "parse_dates_mixed",  # re-cert (signed r2)
    "q10_returned_revenue",  # re-cert (signed r2)
    "q11_important_parts",  # re-cert (signed r2)
    "q12_late_lines_by_class",  # re-cert (signed r2)
    "q14_promo_revenue",  # re-cert (signed r2)
    "q15_top_supplier",  # re-cert (signed r2)
    "q16_supplier_part_variety",  # re-cert (signed r2)
    "q17_small_qty_avg_yearly",  # re-cert (signed r2)
    "q18_large_volume_customers",  # re-cert (signed r2)
    "q19_disjunctive_brackets",  # re-cert (signed r2)
    "q20_excess_quantity_suppliers",  # re-cert (signed r2)
    "q21_last_shipper_wait",  # re-cert (signed r2)
    "q22_dormant_customers",  # re-cert (signed r2)
    "q2_min_cost_supplier",  # re-cert (signed r2)
)


def _ordered_specs() -> list[QuerySpec]:
    front_pos = {n: i for i, n in enumerate(ROUND8_FRONT)}
    specs = list(REGISTRY.values())
    # A typo'd / renamed / deferred front name would silently shrink the
    # 50-query certification window — fail loudly instead (real raises,
    # not asserts: the guard must survive python -O).
    missing = set(ROUND8_FRONT) - set(REGISTRY)
    if missing:
        raise ValueError(f"front names not in registry: {sorted(missing)}")
    bad = [n for n in ROUND8_FRONT if REGISTRY[n].defer or REGISTRY[n].oracle is None]
    if bad:
        raise ValueError(
            f"front names must be oracle-backed and non-deferred: {bad}"
        )
    front = sorted(
        (s for s in specs if s.name in front_pos),
        key=lambda s: front_pos[s.name],
    )
    rest = [s for s in specs if s.name not in front_pos]
    return (
        front
        + [s for s in rest if not s.defer]
        + [s for s in rest if s.defer]
    )


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {spec.name: spec.fn for spec in _ordered_specs()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        spec.name: spec.oracle
        for spec in _ordered_specs()
        if spec.oracle is not None
    }


def _ensure_loaded() -> None:
    # Import the query modules for their registration side effects.
    #
    # Window positions are decided by the ROUND8_FRONT tuple above, not
    # by this import order (front names sort first; everything else
    # keeps registration order behind them, deferred rows-only last).
    # Import order only breaks ties among non-front queries, so the
    # rotation is a pure front-tuple swap each round.
    from stadvdb_olap_spark.plans import etl_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import tpch_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import text_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import sampling_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import vector_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import multimodal_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import curation_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import pandas_surface_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import reconcile_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import sketch_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import pii_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import mixture_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import funnel_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import dq_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import cdc_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import feature_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import scale_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import graph_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import series_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import pandas_on_spark_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import advanced_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import analytics_queries  # noqa: F401  # isort: skip
