"""Capture explain('formatted') for headline queries -> plans/r13/<q>_<tag>.txt."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded
from stadvdb_olap_spark.session import get_session

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
NAMES = sys.argv[2].split(",") if len(sys.argv) > 2 else [
    "flagship_fact_build","fact_star","q1_pricing_summary","q3_top_unshipped_revenue",
    "q5_revenue_by_nation","rollup_revenue_region_nation","top3_parts_per_brand",
    "events_sessionize_30m","merge_upsert_orders","dedup_minhash_pairs",
    "ann_cosine_topk","text_quality_scores"]
SF = "/root/testdata/sf0.1"
spark = get_session(app_name="plan-capture")
_ensure_loaded()
out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
os.makedirs(out_dir, exist_ok=True)
jvm = spark._jvm
jmode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
for name in NAMES:
    df = REGISTRY[name].fn(spark, SF)
    txt = df._jdf.queryExecution().explainString(jmode)
    with open(os.path.join(out_dir, f"{name}_{TAG}.txt"), "w") as f:
        f.write(txt)
    print(name, "->", f"{name}_{TAG}.txt")
