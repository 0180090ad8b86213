"""Physical-plan regression tests: the scale properties SCALING.md and
PLANS.md claim, asserted against what Catalyst actually plans. These
guard against future edits silently turning a broadcast into a shuffle
or knocking a predicate off the scan."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry():
    from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded

    _ensure_loaded()
    return REGISTRY


def _formatted_plan(df) -> str:
    spark = df.sparkSession
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(jmode)


def test_fact_star_never_shuffles_the_fact(spark, registry):
    plan = _formatted_plan(registry["fact_star"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan   # FK resolution broadcasts dims
    assert "SortMergeJoin" not in plan   # the fact is never exchanged for a join


def test_q6_predicates_reach_the_scan(spark, registry):
    plan = _formatted_plan(registry["q6_forecast_revenue"].fn(spark, SF))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    line = pushed[0]
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in line  # every predicate pushed, none stranded post-scan


def test_q19_quantity_bounds_pushed_despite_disjunction(spark, registry):
    plan = _formatted_plan(registry["q19_disjunctive_brackets"].fn(spark, SF))
    fact_pushed = [
        ln for ln in plan.splitlines()
        if "PushedFilters" in ln and "l_quantity" in ln
    ]
    assert fact_pushed  # Catalyst extracted the common OR bounds for the fact scan


def test_q5_star_join_broadcasts_all_dims(spark, registry):
    plan = _formatted_plan(registry["q5_revenue_by_nation"].fn(spark, SF))
    # customer, nation, region all broadcast; orders⋈lineitem may shuffle
    assert plan.count("BroadcastHashJoin") >= 3


def test_chunking_has_no_exchange(spark, registry):
    plan = _formatted_plan(registry["chunk_documents_sliding"].fn(spark, SF))
    body = plan.split("== Physical Plan ==")[-1]
    # the only exchange allowed is spread()'s fixture-widening repartition
    # (keyed hash since r12 — REPARTITION_BY_NUM tags it; a required
    # ENSURE_REQUIREMENTS exchange would mean the chunking itself shuffles)
    n_exchange = sum(
        1
        for ln in body.splitlines()
        if ln.strip().startswith("(") and ") Exchange" in ln
    )
    widen = body.count("REPARTITION_BY_NUM")
    assert n_exchange == widen  # narrow-only besides spread()


def test_sample_orders_is_scan_plus_filter_only(spark, registry):
    plan = _formatted_plan(registry["sample_orders_hash"].fn(spark, SF))
    body = plan.split("== Physical Plan ==")[-1]
    assert "Exchange" not in body  # content-addressed sampling never shuffles


# ---------------------------------------------------------------------------
# Size-gated broadcast hinting (operators/joins.py)
# ---------------------------------------------------------------------------


def test_parse_byte_conf_units():
    from stadvdb_olap_spark.operators.joins import parse_byte_conf

    assert parse_byte_conf("10485760b") == 10 << 20
    assert parse_byte_conf("10MB") == 10 << 20
    assert parse_byte_conf("1g") == 1 << 30
    assert parse_byte_conf("512") == 512
    assert parse_byte_conf("-1") == -1


def test_broadcast_gate_hints_only_under_threshold(spark):
    from stadvdb_olap_spark.operators.joins import broadcast_if_small

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    hinted = broadcast_if_small(cust)           # ~33 KB << 10 MB default
    assert hinted is not cust
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    # Above the threshold: frame returned untouched, strategy left to AQE.
    assert broadcast_if_small(cust, threshold_bytes=1024) is cust
    # Broadcast disabled (-1): never hint.
    assert broadcast_if_small(cust, threshold_bytes=-1) is cust


def test_fact_star_falls_back_to_smj_when_dims_exceed_threshold(spark, registry):
    """Same 100×-scale pin for the star build: under a tiny threshold the
    combined customer lookup (gated via its size_proxy) and part/date maps
    must not be hinted, so the planner shuffles instead of broadcasting."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
    try:
        plan = _formatted_plan(registry["fact_star"].fn(spark, SF))
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    plan = _formatted_plan(registry["fact_star"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_broadcast_gate_size_proxy(spark):
    """size_proxy lets a provably-1:1-enriched lookup be gated on its base
    table's estimate: Catalyst's multiplied join estimate alone would
    wrongly decline the hint; a big proxy must still decline it."""
    from stadvdb_olap_spark.operators.joins import broadcast_if_small
    from stadvdb_olap_spark.sources.parquet import load_table

    cust = load_table(spark, SF, "customer")
    nation = load_table(spark, SF, "nation")
    lookup = cust.select("c_custkey", "c_nationkey").join(
        nation.select("n_nationkey"),
        cust.c_nationkey == nation.n_nationkey,
    )
    from stadvdb_olap_spark.operators.joins import _estimated_size_bytes

    own, proxy = _estimated_size_bytes(lookup), _estimated_size_bytes(cust)
    assert own > proxy  # the join-product estimate really is inflated
    mid = (own + proxy) // 2  # declines on own estimate, accepts on proxy

    unhinted = broadcast_if_small(lookup, threshold_bytes=mid)
    assert "ResolvedHint" not in unhinted._jdf.queryExecution().analyzed().toString()
    hinted = broadcast_if_small(lookup, threshold_bytes=mid, size_proxy=cust)
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    # a too-big proxy still declines
    small_thresh = broadcast_if_small(lookup, threshold_bytes=proxy - 1, size_proxy=cust)
    assert (
        "ResolvedHint"
        not in small_thresh._jdf.queryExecution().analyzed().toString()
    )


def test_flagship_falls_back_to_smj_when_dims_exceed_threshold(spark, registry):
    """The 100×-scale behavior, pinned: when customer/part no longer fit
    under autoBroadcastJoinThreshold, the gate must NOT hint and the
    planner must choose a sort-merge join instead of a forced broadcast
    (which at real scale would OOM the driver / trip the 8 GB limit)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
    try:
        plan = _formatted_plan(registry["flagship_fact_build"].fn(spark, SF))
        assert "SortMergeJoin" in plan
        assert "BroadcastHashJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # And back at the default threshold the small-SF dims broadcast again.
    plan = _formatted_plan(registry["flagship_fact_build"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_pii_scrub_is_a_narrow_projection(spark, registry):
    """The curation scrub must cost exactly one scan at 100 TB: a
    regexp projection with no exchange anywhere in the plan."""
    for name in ("pii_scrub_docs", "normalize_text_docs", "repetition_stats_docs"):
        plan = _formatted_plan(registry[name].fn(spark, SF))
        body = plan.split("== Physical Plan ==")[-1]
        assert "Exchange" not in body, name


def test_pii_rollup_exchanges_only_counters(spark, registry):
    """pii_hits_by_source: partial aggregation must sit below the single
    exchange so only per-source counters shuffle, never document text."""
    plan = _formatted_plan(registry["pii_hits_by_source"].fn(spark, SF))
    body = plan.split("== Physical Plan ==")[-1]
    n_exchange = sum(
        1
        for ln in body.splitlines()
        if ln.strip().startswith("(") and ") Exchange" in ln
    )
    assert n_exchange == 1
    assert body.index("HashAggregate") < body.index("Exchange") or body.count(
        "HashAggregate"
    ) == 2


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Semi-join reduction at scale: when a selective dim predicate feeds
    a shuffle join, Spark's runtime bloom filter (enabled in the session
    posture) must inject a might_contain() probe on the FACT side, so
    fact rows that cannot match are dropped before the exchange. The
    size thresholds are floored here only because the fixture is tiny —
    at 100 TB the defaults (10 MB creation side / 10 GB application
    side) fire on their own."""
    from pyspark.sql import functions as F

    from stadvdb_olap_spark.sources.parquet import load_table

    conf = spark.conf
    app_key = (
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    assert conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    prev_app, prev_bc = conf.get(app_key), conf.get(
        "spark.sql.autoBroadcastJoinThreshold"
    )
    conf.set(app_key, "0")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join
    try:
        li = load_table(spark, SF, "lineitem")
        orders = load_table(spark, SF, "orders").filter(
            F.col("o_orderstatus") == "F"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = _formatted_plan(j)
        assert "might_contain" in plan
        # the probe lands on the lineitem (fact) scan's filter condition
        fact_filter = [
            ln for ln in plan.splitlines()
            if "might_contain" in ln and "l_orderkey" in ln
        ]
        assert fact_filter, plan
    finally:
        conf.set(app_key, prev_app)
        conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)


def test_training_shards_single_exchange(spark, registry):
    """Shard layout must be ONE hash exchange (on the shard id) + window
    rank — never a global single-partition sort."""
    df = registry["training_shards_docs"].fn(spark, SF)
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    body = df._jdf.queryExecution().explainString(jmode)
    assert "Exchange SinglePartition" not in body
    # spread()'s fixture widening is a keyed REPARTITION_BY_NUM exchange
    # since r12 — count only the exchanges the query's semantics REQUIRE
    n_hash_exchange = sum(
        1
        for ln in body.splitlines()
        if "Exchange hashpartitioning" in ln and "REPARTITION_BY_NUM" not in ln
    )
    assert n_hash_exchange == 1, body


def test_decontaminate_broadcasts_heldout_shingles(spark, registry):
    """The held-out (benchmark) shingle set is the small side and must
    broadcast; the train side must never be exchanged for that join."""
    plan = _formatted_plan(registry["decontaminate_train_docs"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_incremental_dedup_broadcasts_the_delta(spark, registry):
    """The batch (delta) side of incremental dedup must broadcast against
    the corpus band table — the corpus is probed in place, never shuffled
    for the candidate join. The delta's shingle sets broadcast into the
    verify join the same way."""
    plan = _formatted_plan(registry["dedup_incremental_delta"].fn(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2


def test_inverted_index_two_hash_exchanges(spark, registry):
    """Posting-list build must cost exactly two hash exchanges — the
    per-(term,doc) distinct and the per-term aggregate; spread()'s
    round-robin on the fixture scan is not a hash exchange, and no
    single-partition (global) exchange may appear."""
    df = registry["inverted_index_terms"].fn(spark, SF)
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    body = df._jdf.queryExecution().explainString(jmode)
    assert "Exchange SinglePartition" not in body
    n_required = sum(
        1
        for ln in body.splitlines()
        if "Exchange hashpartitioning" in ln and "REPARTITION_BY_NUM" not in ln
    )
    # r12: spread()'s doc_id-keyed widening exchange now SATISFIES the
    # per-(term, doc) distinct's clustering requirement (hash on a subset
    # of the group keys clusters the full key), so Catalyst plans only
    # the per-term aggregate exchange on the single-file fixture. On a
    # real multi-file scan spread() is a no-op and the distinct pays its
    # own exchange again — still exactly two, never a global sort.
    assert n_required == 1, body


def test_interval_overlap_is_an_equi_join(spark, registry):
    """The temporal overlap join must plan as a hash/merge EQUI-join on
    the bucket id — never a BroadcastNestedLoop/Cartesian theta join."""
    plan = _formatted_plan(
        registry["interval_overlap_sessions_bursts"].fn(spark, SF)
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_dynamic_partition_pruning_fires_on_partitioned_fact(spark, tmp_path):
    """A fact table partitioned on the join key joined to a selectively
    filtered dim plans a dynamicpruning subquery in the fact scan's
    partition filters — at scale this skips whole partitions at runtime,
    the file-source analogue of the bloom-filter row pruning test."""
    from stadvdb_olap_spark.sources.parquet import load_table

    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    fact_path = str(tmp_path / "fact_part")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("A", 1), ("N", 2), ("R", 3)], "flag string, weight int"
    ).filter("weight = 3")

    joined = fact.join(dim, fact.l_returnflag == dim.flag).groupBy("flag").count()
    plan = _formatted_plan(joined)
    assert "dynamicpruning" in plan.lower()
