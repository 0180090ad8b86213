"""SparkSession factory with scale-first defaults.

The reference hand-manages memory with a 5,000-row batch loop and explicit
``gc.collect()`` (``/root/reference/ETL/user_ETL.py:16,91-136``). Spark
subsumes all of that with partitioned execution + AQE; the session factory
here encodes the configuration posture we want on a real cluster:

- AQE on (runtime coalescing, skew-join splitting, join-strategy switch)
- Arrow for any pandas interchange (vectorized UDF path)
- UTC session timezone (deterministic timestamps across engines/oracles)
- shuffle partitions sized for the local harness but overridable via env
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_session(
    app_name: str = "stadvdb-olap-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with the engine's defaults.

    On a real cluster ``master`` comes from spark-submit; locally we default
    to ``local[N]`` with N from ``SPARK_GRAFT_CPUS`` (driver contract) or all
    cores.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's coalescing floor (default 1m) caps the parallelism of
        # small-shuffle stages: a 12 MB post-shuffle stage coalesces to
        # ~12 tasks no matter how many cores are idle (measured -15..30%
        # on the window/merge/sessionize headliners at sf0.1 with 64k).
        # Scale-neutral: once per-partition bytes exceed the floor —
        # always true at production shuffle sizes, where advisory sizing
        # governs — the floor is inert; it also still bounds the
        # partition count of an N-byte shuffle at N/minPartitionSize.
        # Env-overridable for cluster tuning.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Runtime row-level pruning: inject bloom filters from the small
        # side of selective joins into the big side's scan — a large-scan
        # saver at 100 TB, harmless locally.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # PySpark 4's DataFrame error-context capture wraps EVERY Column
        # function in a user-stack walk plus ~11 extra py4j round trips
        # (getActiveSession + conf.get + PySparkCurrentOrigin.set per
        # call): measured 6.0 ms -> 0.8 ms per F.col with it off, ~25% of
        # headline plan-build driver wall. The cost is per expression
        # CONSTRUCTION, so it taxes every query build in the timed bench
        # region and every driver-sim sweep. Trade-off: error messages
        # lose the per-call-site enrichment (plans and results are
        # unaffected); flip the env to re-enable while debugging.
        .config(
            "spark.python.sql.dataFrameDebugging.enabled",
            os.environ.get("SPARK_GRAFT_DF_DEBUGGING", "false"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow-batch Python UDTF row transfer (functions/udtfs.py) —
        # the pickled fallback is correct but slower.
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet scans: vectorized reader + pushdown are on by default; keep
        # file-open costs low for the many-small-files local fixtures.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
