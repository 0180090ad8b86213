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


# ROUND-5 WINDOW (query-level rotation): the external driver hash-certifies
# the FIRST 50 exported queries each round, cumulatively. Rounds 1-4 signed
# 189 queries (latest-fail 0). This front = 50 never-windowed
# oracle-backed queries (the 21 pending at rotation time plus the 14
# added later in round 5: graph analytics, sketches, multiprobe LSH,
# GEMM tiers, textrank, HLL, rendezvous, temperature mixture, k-core,
# k-anonymity, episode triples, Hampel, Poisson bootstrap,
# calibration bins), then 9
# staleness re-certifications: signed queries oldest-green-row first
# (r1-signed advanced/analytics/tpch rows, now three rounds of
# refactors old). Produced verbatim by `python tools/next_window.py`,
# which now appends the staleness fill after the never-windowed set.
#
# ROUND-6 ROTATION: run `python tools/next_window.py` — it diffs the
# catalog against every CORRECTNESS_r*.json (counting only
# rows+schema+hash-green rows as signed) and prints the next front list;
# replace this tuple with it.
ROUND5_FRONT: tuple[str, ...] = (
    # never-windowed, family-balanced: 50 of the 69 queries without a
    # driver row (19 spill to the round-6 window; the r1 staleness
    # refresh resumes in round 6)
    "domain_rollup_docs",
    "format_roundtrip_orders",
    "cramers_v_priority_status",
    "pagerank_copurchase_3iter",
    "pack_concat_offsets_docs",
    "gopher_rules_filter_docs",
    "poisson_bootstrap_ci_revenue",
    "zorder_key_orders",
    "holt_forecast_daily_revenue",
    "countmin_term_frequency_docs",
    "quality_logit_filter_docs",
    "ann_lsh_multiprobe_topk",
    "bpe_encode_pinned_docs",
    "record_linkage_selfmatch_customers",
    "supplier_covisit_jaccard",
    "epoch_shuffle_layout_docs",
    "k_anonymity_audit_customers",
    "conformal_interval_order_totals",
    "zonemap_prune_layouts_orders",
    "max_concurrent_sessions_hourly",
    "bloom_filter_customer_probe",
    "rrf_fusion_topk_docs",
    "ann_topk_pandas_gemm",
    "span_corrupt_docs",
    "diff_in_diff_event_value",
    "lpa_communities_parts",
    "temperature_mixture_docs",
    "calibration_bins_quality_vs_rules",
    "join_cardinality_audit_lineitem",
    "abc_classification_parts",
    "hll_registers_users_events",
    "tree_ensemble_score_docs",
    "ann_topk_arrow_gemm",
    "dedup_recall_audit_docs",
    "textrank_keywords_docs",
    "rendezvous_shard_docs",
    "holt_forecast_by_event_type",
    "readability_fk_docs",
    "ann_ivf_fixed_topk",
    "triangle_stats_parts",
    "wow_growth_revenue",
    "lexical_diversity_by_source",
    "semdedup_fixed_centroids",
    "lpa_modularity_parts",
    "share_of_total_by_segment",
    "pca_projection_embeddings",
    "kcore_parts_k90",
    "cusum_changepoints_daily_revenue",
    "pagerank_weighted_copurchase_3iter",
    "rolling_corr_click_purchase_7d",
)


def _ordered_specs() -> list[QuerySpec]:
    front_pos = {n: i for i, n in enumerate(ROUND5_FRONT)}
    specs = list(REGISTRY.values())
    # A typo'd / renamed / deferred front name would silently shrink the
    # 50-query certification window — fail loudly instead (real raises,
    # not asserts: the guard must survive python -O).
    missing = set(ROUND5_FRONT) - set(REGISTRY)
    if missing:
        raise ValueError(f"front names not in registry: {sorted(missing)}")
    bad = [n for n in ROUND5_FRONT if REGISTRY[n].defer or REGISTRY[n].oracle is None]
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
    # Window positions are decided by the ROUND5_FRONT tuple above, not
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
