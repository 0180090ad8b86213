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


# ROUND-6 WINDOW (query-level rotation): the external driver hash-certifies
# the FIRST 50 exported queries each round, cumulatively. Rounds 1-5 signed
# 239 queries (latest-fail 0). This front = the 19 remaining never-windowed
# oracle-backed queries (the late-round-5 forecasting/ops additions:
# Holt-Winters, Croston, Theil-Sen, Mann-Kendall, Mann-Whitney, Shapley,
# recsys offline eval, TWAP, Laspeyres, ABC-XYZ, streaks, Little's law,
# engagement, QQ drift, Hampel, Fano, episodes, decayed trending, lexical
# diversity) followed by 31 staleness re-certifications: signed queries
# oldest-green-row-first (r1-signed advanced/analytics/tpch rows, now four
# rounds of refactors old). Produced verbatim by `python
# tools/next_window.py`, which appends the staleness fill after the
# never-windowed set. After this round every oracle-backed query has a
# driver-signed row.
#
# ROUND-7 ROTATION: run `python tools/next_window.py` — it diffs the
# catalog against every CORRECTNESS_r*.json (counting only
# rows+schema+hash-green rows as signed) and prints the next front list;
# replace this tuple with it.
ROUND6_FRONT: tuple[str, ...] = (
    # 19 never-windowed (judge-verified MATCH in the r5 verdict)
    "episode_triples_sessions",
    "hampel_outliers_daily_revenue",
    "mase_seasonal_naive_daily_revenue",
    "decile_qq_drift_events_value",
    "mann_whitney_value_click_purchase",
    "purchase_streaks_customers",
    "twap_daily_value_by_type",
    "shapley_attribution_channels",
    "theil_sen_trend_daily_revenue",
    "mann_kendall_trend_daily_revenue",
    "decayed_trending_event_types",
    "recsys_eval_covisit_topk",
    "fano_burstiness_event_types",
    "littles_law_audit_sessions",
    "holt_winters_forecast_daily_revenue",
    "session_engagement_summary",
    "abc_xyz_matrix_parts",
    "croston_intermittent_demand",
    "price_index_laspeyres_yearly",
    # 31 staleness re-certs (signed r1, oldest green rows)
    "asof_join_events_orders",
    "click_purchase_attribution",
    "cohort_weekly_retention",
    "cube_order_status_priority",
    "distinct_parts_per_flag",
    "events_by_type",
    "events_json_props",
    "events_sessionize_30m",
    "events_sliding_3h_1h",
    "events_tumbling_1h",
    "gapfill_daily_revenue",
    "grouping_sets_revenue",
    "histogram_order_totals",
    "iqr_outlier_events",
    "min_price_row_per_part",
    "moving_avg_daily_revenue",
    "ntile_customers_by_balance",
    "ols_price_vs_quantity_by_flag",
    "order_gaps_lag",
    "order_keys_concat_per_customer",
    "orders_above_global_avg",
    "percentiles_by_priority",
    "pivot_event_type_daily",
    "profile_orders",
    "q13_customer_order_distribution",
    "q1_pricing_summary",
    "q3_top_unshipped_revenue",
    "q4_priority_with_late_lines",
    "q5_revenue_by_nation",
    "q7_nation_trade_volume",
    "q9_profit_by_nation_year",
)


def _ordered_specs() -> list[QuerySpec]:
    front_pos = {n: i for i, n in enumerate(ROUND6_FRONT)}
    specs = list(REGISTRY.values())
    # A typo'd / renamed / deferred front name would silently shrink the
    # 50-query certification window — fail loudly instead (real raises,
    # not asserts: the guard must survive python -O).
    missing = set(ROUND6_FRONT) - set(REGISTRY)
    if missing:
        raise ValueError(f"front names not in registry: {sorted(missing)}")
    bad = [n for n in ROUND6_FRONT if REGISTRY[n].defer or REGISTRY[n].oracle is None]
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
    # Window positions are decided by the ROUND6_FRONT tuple above, not
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
