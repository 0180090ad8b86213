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


# --- round-10 heavy families -------------------------------------------
# The three newest quadratic-WITHIN-BUCKET designs (triangle census,
# SemDedup pair scan, grid radius join), probed with their documented
# bound knobs scaled the way production would scale them: bucket size
# held CONSTANT as volume grows (basket size / cluster size / cell
# density), so the measured curve should be ~linear. A superlinear
# curve here falsifies the "bounded by construction" claim in
# SCALING.md; these run at sizes//16 because their constants are
# deliberately pair-heavy.


def plan_triangles(df, rows: int):
    """Triangle-census closure (plans/graph_queries.py shape): baskets
    of exactly 4 events, node space scaling WITH rows (rows//8) so the
    co-occurrence degree stays constant as volume grows."""
    li = df.select(
        (F.col("event_id") - F.pmod("event_id", F.lit(4))).alias("ok"),
        F.pmod(F.xxhash64(F.col("event_id").cast("string")), F.lit(max(rows // 8, 64))).alias("pk"),
    )
    a = li.select("ok", F.col("pk").alias("pa"))
    b = li.select("ok", F.col("pk").alias("pb"))
    pp = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
    )
    e1 = pp.select(F.col("pa").alias("x"), F.col("pb").alias("y"))
    e2 = pp.select(F.col("pa").alias("y"), F.col("pb").alias("z"))
    e3 = pp.select(F.col("pa").alias("x"), F.col("pb").alias("z"))
    return (
        e1.join(e2, "y")
        .join(e3, ["x", "z"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def plan_semdedup(df, rows: int):
    """SemDedup within-cluster pair scan (operators/similarity.py
    _mark_semantic_dups — the real code path) with cluster size pinned
    at 64 by construction: exactly what scaling n_clusters with the
    corpus (the paper's knob) achieves. Work = rows x 64 cosine evals."""
    from stadvdb_olap_spark.operators.similarity import _mark_semantic_dups

    vec = F.transform(
        F.sequence(F.lit(1), F.lit(8)),
        lambda d: (
            F.pmod(
                F.xxhash64(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit("_"),
                        d.cast("string"),
                    )
                ),
                F.lit(1000),
            )
            / 500.0
            - 1.0
        ),
    )
    assigned = df.select(
        F.col("event_id").alias("__id"),
        vec.alias("__v"),
        (F.col("event_id") - F.pmod("event_id", F.lit(64))).alias("cluster"),
    )
    marked = _mark_semantic_dups(assigned, "vec_id", 0.9, cluster_type="bigint")
    return marked.groupBy("keep").agg(F.count(F.lit(1)).alias("n"))


def plan_radius(df, rows: int):
    """Grid radius self-join (operators/spatial.py) at CONSTANT point
    density: the coordinate domain side grows with sqrt(rows), so cell
    occupancy (the within-bucket quadratic) is fixed (~4/cell) while
    cells scale with rows."""
    from stadvdb_olap_spark.operators.spatial import grid_radius_join

    side = max(int((rows**0.5) * 32), 4096)
    h = F.md5(F.col("event_id").cast("string"))
    pts = df.select(
        F.col("event_id").alias("id"),
        F.pmod(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(side)
        ).alias("x"),
        F.pmod(
            F.conv(F.substring(h, 9, 8), 16, 10).cast("long"), F.lit(side)
        ).alias("y"),
    )
    return grid_radius_join(pts, 64).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )


HEAVY_PLANS = {
    "triangles": plan_triangles,
    "semdedup_pairscan": plan_semdedup,
    "radius_join": plan_radius,
}


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

    heavy_sizes = [max(s // 16, 1024) for s in sizes]
    heavy_results: dict[str, list[float]] = {name: [] for name in HEAVY_PLANS}
    for rows in heavy_sizes:
        df = synthetic(spark, rows)
        for name, build in HEAVY_PLANS.items():
            plan = build(df, rows)
            run_once(plan)
            t0 = time.time()
            run_once(plan)
            heavy_results[name].append(time.time() - t0)

    report = {
        "sizes": sizes,
        "secs": results,
        "ratios": {},
        "heavy_sizes": heavy_sizes,
        "heavy_secs": heavy_results,
        "heavy_ratios": {},
    }
    for name, ts in results.items():
        report["ratios"][name] = [round(t / ts[0], 2) for t in ts]
    for name, ts in heavy_results.items():
        report["heavy_ratios"][name] = [round(t / ts[0], 2) for t in ts]
    print(json.dumps(report))


if __name__ == "__main__":
    main()
