"""Session-posture pins for the round-12 performance configuration."""

from __future__ import annotations


def test_aqe_min_partition_size_floor(spark):
    """AQE's coalescing floor is lowered (default 1m caps small-shuffle
    stages at ~N/1MB tasks regardless of idle cores) and stays
    env-overridable for cluster tuning. Scale-neutral: production-sized
    shuffles are governed by advisory sizing long before this floor."""
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.minPartitionSize")
        == "64k"
    )
    # the floor only matters with coalescing on; pin both
    assert spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"


def test_spread_keyed_form_skips_the_presort(spark):
    """Keyed spread() must plan a hash repartition (REPARTITION_BY_NUM,
    no round-robin pre-sort); keyless spread() keeps round-robin."""
    from stadvdb_olap_spark.sources.parquet import load_table, spread

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    keyed = spread(li, "l_orderkey", "l_linenumber")
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(l_orderkey" in plan
    assert "RoundRobinPartitioning" not in plan
    keyless = spread(li)
    plan2 = keyless._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan2


def test_dataframe_debugging_off_by_default(spark):
    """PySpark's per-Column-call error-context capture (~11 py4j round
    trips per expression construction) is disabled in the performance
    posture; SPARK_GRAFT_DF_DEBUGGING=true restores it for debugging."""
    assert (
        spark.conf.get("spark.python.sql.dataFrameDebugging.enabled") == "false"
    )
