"""Measured-scaling probe: run the three canonical plan shapes (two-phase
aggregate, per-key window, shuffle join) over the synthetic DataSource at
geometrically increasing volumes and report wall-time growth vs data
growth. Linear-ish ratios are the empirical half of SCALING.md's claims —
the same plans, 16x the rows, ~16x the time, no superlinear blowup.

Fixture files play no part: the Python DataSource generates its
partitions executor-side, so the probe exercises exactly the shuffle /
sort / join machinery, not parquet decode.

Usage: python tools/scale_probe.py [rows_base [factor [steps]]]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def synthetic(spark, rows: int):
    return (
        spark.read.format("synthetic_events")
        .option("rows", str(rows))
        .option("numPartitions", "32")
        .load()
    )


def plan_agg(df):
    """Two-phase hash aggregate (map-side partials -> one exchange)."""
    return df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("total"),
    )


def plan_window(df):
    """Per-key window: one exchange + per-partition sort."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return df.select(
        "user_id",
        "event_id",
        (F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)).alias(
            "gap_us"
        ),
    )


def plan_join(df):
    """Shuffle join: events against a per-user dim derived from events."""
    dim = df.groupBy("user_id").agg(F.max("value").alias("peak"))
    return df.join(dim, "user_id").filter(F.col("value") >= F.col("peak") * 0.99)


PLANS = {"agg": plan_agg, "window": plan_window, "join": plan_join}


def run_once(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rows_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("scale-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from stadvdb_olap_spark.sources.synthetic import register

    register(spark)

    sizes = [rows_base * factor**i for i in range(steps)]
    results: dict[str, list[float]] = {name: [] for name in PLANS}
    for rows in sizes:
        df = synthetic(spark, rows)
        for name, build in PLANS.items():
            plan = build(df)
            run_once(plan)  # warm-up: JIT, codegen, Python worker spin-up
            t0 = time.time()
            run_once(plan)
            results[name].append(time.time() - t0)

    report = {"sizes": sizes, "secs": results, "ratios": {}}
    for name, ts in results.items():
        report["ratios"][name] = [round(t / ts[0], 2) for t in ts]
    print(json.dumps(report))


if __name__ == "__main__":
    main()
