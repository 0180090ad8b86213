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


# ROUND-7 WINDOW (query-level rotation): the external driver hash-certifies
# the FIRST 50 exported queries each round, cumulatively. Rounds 1-6 signed
# 258 queries (latest-fail 0). This front = the 14 remaining never-windowed
# oracle-backed queries (the late-round-6 additions: 5 multimodal
# rows-only→oracle conversions, windowed Theil-Sen/Mann-Kendall,
# collocation lift, centroid drift, stratified ATE, position attribution,
# arc elasticity, FD audit, quantile normalize) followed by 36 staleness
# re-certifications: signed queries oldest-green-row-first (the r1/r2-signed
# ETL/dedup/text rows, now 5-6 rounds of refactors old). Produced verbatim
# by `python tools/next_window.py`, which appends the staleness fill after
# the never-windowed set. After this round every oracle-backed query has a
# driver-signed row and no signed row is older than round 3.
#
# ROUND-8 ROTATION: run `python tools/next_window.py` — it diffs the
# catalog against every CORRECTNESS_r*.json (counting only
# rows+schema+hash-green rows as signed) and prints the next front list;
# replace this tuple with it.
ROUND7_FRONT: tuple[str, ...] = (
    # 14 never-windowed (late-round-6 additions; judge-verified MATCH in the
    # r6 verdict at sf0.01, risk set at sf0.1)
    "fd_violation_audit",
    "quantile_normalize_order_totals",
    "multimodal_frame_sample",
    "theil_sen_windowed_trend_daily_revenue",
    "collocation_lift_bigrams",
    "embedding_centroid_drift_labels",
    "multimodal_ppm_real_decode",
    "mann_kendall_windowed_trend_daily_revenue",
    "multimodal_y4m_frame_sample",
    "stratified_ate_priority_value",
    "multimodal_wav_real_decode",
    "position_attribution_channels",
    "multimodal_ppm_resize_fingerprint",
    "arc_price_elasticity_brand_yearly",
    "range_join_price_bands",  # re-cert (signed r1)
    "recode_segments_via_join",  # re-cert (signed r1)
    "rollup_revenue_region_nation",  # re-cert (signed r1)
    "running_total_per_customer",  # re-cert (signed r1)
    "scd2_customer_priority",  # re-cert (signed r1)
    "semi_join_active_customers",  # re-cert (signed r1)
    "set_ops_customer_status",  # re-cert (signed r1)
    "skew_twophase_agg_events",  # re-cert (signed r1)
    "sql_surface_revenue_by_region",  # re-cert (signed r1)
    "stats_quantity_price",  # re-cert (signed r1)
    "top3_parts_per_brand",  # re-cert (signed r1)
    "train_val_test_split_docs",  # re-cert (signed r1)
    "unpivot_part_measures",  # re-cert (signed r1)
    "window_rank_showcase",  # re-cert (signed r1)
    "word_frequencies",  # re-cert (signed r1)
    "zscore_quantity_per_flag",  # re-cert (signed r1)
    "bm25_topk_docs",  # re-cert (signed r2)
    "chunk_documents_sliding",  # re-cert (signed r2)
    "clean_customer_strings",  # re-cert (signed r2)
    "coerce_numeric_events",  # re-cert (signed r2)
    "curate_corpus_docs",  # re-cert (signed r2)
    "dedup_clusters_canonical",  # re-cert (signed r2)
    "dedup_exact_docs",  # re-cert (signed r2)
    "dedup_first_order_per_customer",  # re-cert (signed r2)
    "dedup_jaccard_verified",  # re-cert (signed r2)
    "dedup_minhash_pairs",  # re-cert (signed r2)
    "dim_customer",  # re-cert (signed r2)
    "dim_date",  # re-cert (signed r2)
    "dim_location",  # re-cert (signed r2)
    "dim_part",  # re-cert (signed r2)
    "distinct_order_dates",  # re-cert (signed r2)
    "fact_star",  # re-cert (signed r2)
    "flagship_fact_build",  # re-cert (signed r2)
    "fuzzy_part_name_pairs",  # re-cert (signed r2)
    "jdbc_merge_roundtrip_orders",  # re-cert (signed r2)
    "merge_upsert_orders",  # re-cert (signed r2)
)


def _ordered_specs() -> list[QuerySpec]:
    front_pos = {n: i for i, n in enumerate(ROUND7_FRONT)}
    specs = list(REGISTRY.values())
    # A typo'd / renamed / deferred front name would silently shrink the
    # 50-query certification window — fail loudly instead (real raises,
    # not asserts: the guard must survive python -O).
    missing = set(ROUND7_FRONT) - set(REGISTRY)
    if missing:
        raise ValueError(f"front names not in registry: {sorted(missing)}")
    bad = [n for n in ROUND7_FRONT if REGISTRY[n].defer or REGISTRY[n].oracle is None]
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
    # Window positions are decided by the ROUND7_FRONT tuple above, not
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
