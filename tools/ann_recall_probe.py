"""Measured ANN quality/cost: recall@k of the approximate indexes (LSH,
IVF) against exact brute force on the embeddings fixture, with wall
times. Prints ONE JSON line; recorded in SCALING.md so the approximate-
path claims carry numbers, not adjectives.

Usage: python tools/ann_recall_probe.py [sf_dir] [n_queries] [k]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stadvdb_olap_spark.operators.similarity import (  # noqa: E402
    binary_quant_topk,
    brute_force_topk,
    ivf_fixed_topk,
    ivf_topk,
    lsh_bucketed_topk,
)
from stadvdb_olap_spark.session import get_session  # noqa: E402
from stadvdb_olap_spark.sources.parquet import load_table  # noqa: E402


def _pairs(df) -> set[tuple[int, int]]:
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_session(app_name="ann-recall-probe")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(n_q)

    out: dict = {"metric": "ann_recall", "sf_dir": sf_dir, "n_queries": n_q, "k": k}

    t0 = time.time()
    exact = _pairs(brute_force_topk(queries, emb, k=k))
    out["brute_force_sec"] = round(time.time() - t0, 3)

    for name, fn, kwargs in [
        ("lsh_p6_t1", lsh_bucketed_topk, {"n_planes": 6}),
        ("lsh_p6_t8", lsh_bucketed_topk, {"n_planes": 6, "n_tables": 8}),
        ("lsh_p4_t8", lsh_bucketed_topk, {"n_planes": 4, "n_tables": 8}),
        (
            "lsh_p6_t8_mp1",
            lsh_bucketed_topk,
            {"n_planes": 6, "n_tables": 8, "multiprobe": True},
        ),
        (
            "lsh_p8_t8_mp1",
            lsh_bucketed_topk,
            {"n_planes": 8, "n_tables": 8, "multiprobe": True},
        ),
        ("ivf_c16_p4", ivf_topk, {"n_centroids": 16, "n_probe": 4}),
        ("ivf_c16_p8", ivf_topk, {"n_centroids": 16, "n_probe": 8}),
        # pinned-centroid (certifiable) IVF: first 16 vectors as centroids
        (
            "ivf_fixed_c16_p4",
            lambda q, c, k, n_probe: ivf_fixed_topk(
                q,
                c,
                c.filter(F.col("vec_id") < 16).select(
                    F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
                ),
                k=k,
                n_probe=n_probe,
            ),
            {"n_probe": 4},
        ),
        ("bq_pf50", binary_quant_topk, {"prefilter": 50}),
        ("bq_pf200", binary_quant_topk, {"prefilter": 200}),
    ]:
        t0 = time.time()
        approx = _pairs(fn(queries, emb, k=k, **kwargs))
        out[f"{name}_sec"] = round(time.time() - t0, 3)
        out[f"{name}_recall"] = round(len(exact & approx) / len(exact), 4)

    # candidate-set size proxy: fraction of corpus each LSH query compares
    n_cand = emb.count()
    out["corpus_size"] = n_cand
    print(json.dumps(out))


if __name__ == "__main__":
    main()
