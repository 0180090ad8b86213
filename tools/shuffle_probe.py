"""Measured shuffle volumes: run headline queries and report per-query
shuffle read/write bytes and input bytes from Spark's status REST API.

The "minimize shuffles" claims in SCALING.md get numbers here: a query
whose shuffle-write is a small fraction of its input is doing map-side
reduction / broadcast joins as designed. Prints ONE JSON line.

Usage: python tools/shuffle_probe.py [sf_dir] [query1,query2,...]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded  # noqa: E402
from stadvdb_olap_spark.session import get_session  # noqa: E402

DEFAULT_QUERIES = [
    "flagship_fact_build",
    "fact_star",
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "dedup_minhash_pairs",
    "markov_event_transitions",
]


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def _stage_totals(base: str, app_id: str) -> dict[str, int]:
    tot = {"input": 0, "shuffle_read": 0, "shuffle_write": 0}
    for s in _api(base, f"/applications/{app_id}/stages?status=complete"):
        tot["input"] += s.get("inputBytes", 0)
        tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
    return tot


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT_QUERIES
    )
    spark = get_session(
        app_name="shuffle-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    _ensure_loaded()
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        print(json.dumps({"error": "spark UI disabled; cannot probe"}))
        return
    base = ui + "/api/v1"
    app_id = spark.sparkContext.applicationId

    out: dict = {"metric": "shuffle_bytes", "sf_dir": sf_dir, "queries": {}}
    prev = _stage_totals(base, app_id)
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cur = _stage_totals(base, app_id)
        out["queries"][name] = {
            k: cur[k] - prev[k] for k in cur
        }
        prev = cur
    print(json.dumps(out))


if __name__ == "__main__":
    main()
