"""Per-query, per-stage time breakdown for the headline bench queries.

For each query: wall time of the noop-sink execution (warm, min-of-N) plus
a stage table from the status REST API — task count, executor run/CPU time,
shuffle read/write bytes, input bytes — attributed via setJobDescription.
This is the guide-§1 "measure first" artifact: it says whether a wall
second is scan decode, shuffle, aggregation CPU, or scheduler overhead.

Usage: python tools/perf_probe.py [sf_dir] [query1,query2,...] [runs]
Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded  # noqa: E402
from stadvdb_olap_spark.session import get_session  # noqa: E402

HEADLINE = [
    "flagship_fact_build",
    "fact_star",
    "q1_pricing_summary",
    "q3_top_unshipped_revenue",
    "q5_revenue_by_nation",
    "rollup_revenue_region_nation",
    "top3_parts_per_brand",
    "events_sessionize_30m",
    "merge_upsert_orders",
    "dedup_minhash_pairs",
    "ann_cosine_topk",
    "text_quality_scores",
]


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=20) as r:
        return json.load(r)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 and sys.argv[2] else HEADLINE
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_session(
        app_name="perf-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    _ensure_loaded()
    base = spark.sparkContext.uiWebUrl + "/api/v1"
    app_id = spark.sparkContext.applicationId
    sc = spark.sparkContext

    # Warm once (codegen/JIT) at the smallest scale, like bench.py.
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        spec.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    out: dict[str, dict] = {}
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        walls = []
        sc.setJobDescription(f"probe:{name}")
        for i in range(runs):
            t0 = time.time()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)

        jobs = _api(base, f"/applications/{app_id}/jobs")
        stage_ids = sorted(
            {
                sid
                for j in jobs
                if j.get("description") == f"probe:{name}"
                for sid in j.get("stageIds", [])
            }
        )
        stages = []
        for s in _api(base, f"/applications/{app_id}/stages?status=complete"):
            if s["stageId"] not in stage_ids:
                continue
            stages.append(
                {
                    "stage": s["stageId"],
                    "tasks": s.get("numCompleteTasks"),
                    "run_ms": s.get("executorRunTime"),
                    "cpu_ms": round((s.get("executorCpuTime") or 0) / 1e6),
                    "input_mb": round(s.get("inputBytes", 0) / 2**20, 2),
                    "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 2**20, 2),
                    "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 2**20, 2),
                    "name": (s.get("name") or "")[:60],
                }
            )
        out[name] = {"walls": walls, "min_wall": min(walls), "stages": stages}

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
