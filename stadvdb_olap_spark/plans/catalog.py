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


# ROUND-4 WINDOW (query-level rotation): the external driver hash-certifies
# the FIRST 50 exported queries each round, cumulatively. Rounds 1-3 signed
# 139 (advanced+analytics; etl/tpch/text/sampling + headline dedup/vector;
# then the r3 family sweep). This front = the 11 latest-fail/lapsed queries
# FIRST (8 round-3 canon-contract failures now retyped to
# BIGINT/DOUBLE/VARCHAR outputs, plus 3 that gained oracles after their
# rows-only r1 window row), then 39 never-windowed ones family-balanced.
# Round 5's tail = the 6 series/scale-depth queries left at rotation
# time (holt_forecast_daily_revenue, max_concurrent_sessions_hourly,
# abc_classification_parts, holt_forecast_by_event_type,
# wow_growth_revenue, share_of_total_by_segment) PLUS every
# oracle-backed query added after the rotation — don't trust this
# comment's arithmetic, `python tools/next_window.py` prints the
# authoritative round-5 list.
#
# ROUND-5 ROTATION: run `python tools/next_window.py` — it diffs the
# catalog against every CORRECTNESS_r*.json (counting only
# rows+schema+hash-green rows as signed) and prints the next front list;
# replace this tuple with it.
ROUND4_FRONT: tuple[str, ...] = (
    # re-certification: round-3 canon-contract failures, outputs retyped
    "ab_test_purchase_rate",
    "encode_docs_token_ids",
    "fingerprint_core_tables",
    "incremental_agg_state_orders",
    "multimodal_fake_features",
    "pii_hits_by_source",
    "table_diff_orders_restated",
    "token_budget_per_source_docs",
    # re-certification: rows-only in r1, oracle-backed since
    "approx_distinct_parts_per_flag",
    "approx_percentiles_by_priority",
    "events_session_window_builtin",
    # never-windowed, family-balanced (curation / feature / funnel /
    # mixture / scale / series / sketch / vector round-robin)
    "bigram_lm_logprob_docs",
    "order_extremes_per_priority",
    "ab_test_cuped_value",
    "training_manifest_docs",
    "weighted_sample_orders_priority",
    "markov_event_transitions",
    "sketch_hll_mergeable_rollup",
    "hard_negatives_by_label",
    "debounce_events_10s",
    "pit_join_events_priority",
    "salted_join_event_value_by_segment",
    "user_first_paths",
    "dialogue_turns_per_session",
    "variant_props_bucketed",
    "simpson_diversity_source_unigrams",
    "dup_ngram_span_stats_docs",
    "udtf_chunk_ranges_docs",
    "autocorr_daily_revenue_lag7",
    "bfs_depth_dedup_clusters",
    "corr_matrix_lineitem",
    "minhash_wide_signatures_docs",
    "benford_first_digit_orders",
    "inverted_index_terms",
    "interpolate_hourly_signup_value",
    "term_cooccurrence_pairs",
    "decile_bins_order_totals",
    "term_lift_scores",
    "gini_customer_revenue",
    "inverted_index_merged_delta",
    "weighted_median_price_by_flag",
    "trailing_1h_user_value",
    "survival_weekly_users",
    "nullsafe_join_user_buckets",
    "basket_part_pairs_lift",
    "locf_forward_fill_events",
    "rfm_segments_customers",
    "mad_quantity_per_flag",
    "seasonal_decompose_daily_revenue",
    "key_skew_profile_events",
)


def _ordered_specs() -> list[QuerySpec]:
    front_pos = {n: i for i, n in enumerate(ROUND4_FRONT)}
    specs = list(REGISTRY.values())
    # A typo'd / renamed / deferred front name would silently shrink the
    # 50-query certification window — fail loudly instead (real raises,
    # not asserts: the guard must survive python -O).
    missing = set(ROUND4_FRONT) - set(REGISTRY)
    if missing:
        raise ValueError(f"front names not in registry: {sorted(missing)}")
    bad = [n for n in ROUND4_FRONT if REGISTRY[n].defer or REGISTRY[n].oracle is None]
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
    # Window positions are decided by the ROUND4_FRONT tuple above, not
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
    from stadvdb_olap_spark.plans import series_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import pandas_on_spark_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import advanced_queries  # noqa: F401  # isort: skip
    from stadvdb_olap_spark.plans import analytics_queries  # noqa: F401  # isort: skip
