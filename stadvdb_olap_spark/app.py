"""Full-pipeline entry point — the reference's ``app.py`` re-expressed.

SURVEY.md §2.11 parity:

- **O1 sequential dim→fact DAG** (``/root/reference/app.py:13-21``): the
  same five stages (user/customer, location, date, product/part dims,
  then the fact) composed as DataFrame transforms. Ordering exists only
  in the driver function; Spark's lineage turns the whole thing into one
  DAG, and the dim "outputs" feed the fact as broadcast key-map joins
  rather than driver-side dicts.
- **O2 timing instrumentation** (``app.py:7,23-26``): wall clock per
  stage around the materializing action, returned AND logged; row counts
  ride the write job itself via ``df.observe`` (no post-write re-scan).
- **O4 structured logging** (``ETL/user_ETL.py:12-14,84,97,139``):
  per-stage row counts and seconds through ``logging``.
- **O3 context-managed connections** — subsumed by SparkSession
  lifecycle (no per-stage connection churn to manage).
- **O5 manual ``del``/``gc.collect()`` per batch** — intentionally NOT
  replicated: executors manage memory; the reference's pattern also
  hides an unbound-variable bug on empty first batches
  (``ETL/prod_ETL.py:131``, SURVEY §2.11).
"""

from __future__ import annotations

import logging
import time
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

log = logging.getLogger("stadvdb_olap_spark.app")


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    table_format: str = "parquet",
    compact_target: int | None = None,
    keep_versions: int | None = None,
) -> dict[str, dict[str, float | int]]:
    """Run the dim→fact warehouse build; return per-stage
    ``{"rows": n, "seconds": s}``. With ``out_dir``, each stage also
    writes ``<out_dir>/<stage>`` — as a parquet atomic job commit
    (``table_format="parquet"``, the default) or as a DELTA-FORMAT
    transaction-log commit (``table_format="delta"``,
    sources/delta_log.py): every run lands as one overwrite version per
    table, the stage report records ``delta_version``, and earlier
    builds stay time-travelable. With delta, ``compact_target`` runs
    OPTIMIZE per table after the write (``optimize_version`` in the
    report) and ``keep_versions`` runs VACUUM with that retention —
    the load + maintenance loop a production lakehouse sink performs
    per batch."""
    from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded
    from stadvdb_olap_spark.sources.sinks import write_table

    if table_format not in ("parquet", "delta"):
        raise ValueError(f"table_format must be parquet|delta, got {table_format!r}")
    _ensure_loaded()
    stages: list[tuple[str, Callable[[SparkSession, str], DataFrame]]] = [
        (name, REGISTRY[name].fn)
        for name in ("dim_customer", "dim_location", "dim_date", "dim_part",
                     "fact_star")
    ]
    report: dict[str, dict[str, float | int]] = {}
    for name, fn in stages:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        if out_dir is not None:
            # df.observe collects the row count DURING the write job —
            # no post-write re-read (a second full scan at 100 TB).
            obs = Observation(f"{name}_rows")
            observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
            extra: dict[str, float | int] = {}
            if table_format == "delta":
                from stadvdb_olap_spark.sources.delta_log import (
                    cleanup_log,
                    compact_table,
                    vacuum_table,
                    write_delta,
                )

                table_dir = f"{out_dir}/{name}"
                extra["delta_version"] = write_delta(
                    observed, table_dir, mode="overwrite",
                    operation="PIPELINE LOAD",
                )
                if compact_target is not None:
                    extra["optimize_version"] = compact_table(
                        spark, table_dir, target_files=compact_target
                    )
                if keep_versions is not None:
                    # data retention (vacuum) + metadata retention
                    # (cleanup_log) together keep footprint AND
                    # _delta_log bounded across daily loads
                    vacuum_table(table_dir, keep_versions=keep_versions)
                    cleanup_log(table_dir, keep_versions=keep_versions)
            else:
                write_table(observed, f"{out_dir}/{name}")
            rows = int(obs.get["rows"])
        else:
            extra = {}
            rows = df.count()
        secs = round(time.perf_counter() - t0, 3)
        report[name] = {"rows": rows, "seconds": secs, **extra}
        log.info("stage %s: %d rows in %.3fs", name, rows, secs)
    return report
