"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``stadvdb_olap_spark``; this module only adapts the
catalog registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from stadvdb_olap_spark.plans.catalog import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's fact build, SURVEY.md §3.3) on
    /root/testdata/sf0.001; driver checks rows>0."""
    from stadvdb_olap_spark.plans.etl_queries import flagship_fact_build

    return flagship_fact_build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get rows-only checks."""
    return all_oracles()
