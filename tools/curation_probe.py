"""Measured end-to-end curation throughput: run the 7-stage
curation_app DAG at a given scale and print ONE JSON line with
per-stage rows/seconds, retention, and docs/sec + tokens/sec for the
whole pipeline. Recorded in SCALING.md so the LLM-ops path carries
numbers, not adjectives.

Usage: python tools/curation_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from stadvdb_olap_spark.curation_app import run_curation_pipeline  # noqa: E402
from stadvdb_olap_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session(app_name="curation-probe")
    out_dir = tempfile.mkdtemp(prefix="stadvdb_curation_probe_")
    n_docs, n_tokens = duckdb.sql(
        f"SELECT count(*), CAST(SUM(len(regexp_split_to_array("
        f"trim(lower(text)), '\\s+'))) AS BIGINT)"
        f" FROM '{sf_dir}/documents.parquet'"
    ).fetchone()

    t0 = time.perf_counter()
    report = run_curation_pipeline(spark, sf_dir, out_dir=out_dir)
    total = time.perf_counter() - t0

    out = {
        "metric": "curation_pipeline",
        "sf_dir": sf_dir,
        "input_docs": n_docs,
        "input_tokens": n_tokens,
        "total_sec": round(total, 3),
        "docs_per_sec": round(n_docs / total, 1),
        "tokens_per_sec": round(n_tokens / total, 1),
        "stages": report,
        "retention": round(report["decontaminate"]["rows"] / n_docs, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
