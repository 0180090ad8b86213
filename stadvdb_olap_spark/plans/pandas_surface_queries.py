"""Catalog queries for the Arrow-batched pandas API surface.

Certifies the two remaining vectorized-Python escape hatches
(operators/pandas_surface.py) against DuckDB oracles:

- the cogrouped-applyInPandas as-of join is checked against the SAME
  ASOF JOIN oracle as the declarative union-timeline twin
  (plans/advanced_queries.py:asof_join_events_orders), proving the
  escape-hatch path and the Catalyst path compute identical results;
- the GROUPED_AGG pandas UDF trimmed mean is checked against a window
  rank formulation of the same k-trim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stadvdb_olap_spark.operators.pandas_surface import (
    asof_join_cogrouped,
    trimmed_mean_grouped,
)
from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.sources.parquet import load_table

_TRIM_K = 5

# Keep byte-for-byte in sync with advanced_queries.asof_join_events_orders —
# the point is that BOTH implementations hash-match the SAME oracle.
_ASOF_ORACLE = """
WITH od AS (
    SELECT o_custkey, o_orderdate, o_orderkey FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) = 1
)
SELECT e.event_id, e.user_id, od.o_orderkey AS last_order_key
FROM events e
ASOF LEFT JOIN od ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
"""


@query("asof_join_cogrouped_pandas", oracle=_ASOF_ORACLE)
def asof_join_cogrouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join via cogrouped applyInPandas — one shuffle per
    side on the user key, then a per-key vectorized searchsorted inside a
    single Arrow-batched Python stage. Same oracle as the declarative
    ``asof_join_events_orders``, so the two paths are pinned together."""
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    w_tie = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.desc("o_orderkey")
    )
    od = (
        orders.select("o_custkey", "o_orderdate", "o_orderkey")
        .withColumn("__rn", F.row_number().over(w_tie))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return asof_join_cogrouped(
        events.select("event_id", "user_id", "ts"),
        od,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        left_id="event_id",
        right_val="o_orderkey",
        out_col="last_order_key",
    ).select("event_id", "user_id", "last_order_key")


@query(
    "trimmed_mean_price_by_priority",
    oracle=f"""
WITH r AS (
  SELECT o_orderpriority,
         CAST(o_totalprice * 100 AS BIGINT) AS cents,
         row_number() OVER (
           PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
), d AS (
  SELECT *, LEAST({_TRIM_K}, (n - 1) // 2) AS dr FROM r
)
SELECT o_orderpriority,
       CAST(MAX(n) AS BIGINT) AS n_values,
       CAST(SUM(cents) FILTER (WHERE rn > dr AND rn <= n - dr)
            AS DOUBLE) / (100.0 * MAX(n - 2 * dr)) AS trimmed_mean
FROM d
GROUP BY o_orderpriority
""",
)
def trimmed_mean_price_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """k-trimmed mean order value per priority through a GROUPED_AGG
    pandas UDF (exact integer-cents sum inside the UDF; which tied rows
    trim is arbitrary but the kept multiset — hence the result — is not).
    The oracle formulates the identical trim with window ranks."""
    orders = load_table(spark, sf_dir, "orders")
    return trimmed_mean_grouped(
        orders, "o_orderpriority", "o_totalprice", k=_TRIM_K
    )


@query(
    "udf_arrow_slugify_parts",
    oracle="""
SELECT p_partkey,
       trim(regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g'), '-')
           AS slug
FROM part
""",
)
def udf_arrow_slugify_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Arrow-optimized Python UDF (``F.udf(useArrow=True)``):
    slugify part names. Arrow batching removes pickle row-at-a-time
    overhead, but this is still the Python slow path — kept in the
    catalog ONLY to certify the surface end-to-end (the engine's hot
    paths use JVM expressions; see the regex twin in the oracle, which
    is what production code would run via ``F.regexp_replace``). The
    UDF is a pure per-row function: trivially parallel, no state, no
    shuffle — one narrow projection."""
    import re

    @F.udf(returnType="string", useArrow=True)
    def slugify(name: str) -> str:
        return re.sub(r"[^a-z0-9]+", "-", name.lower()).strip("-")

    part = load_table(spark, sf_dir, "part")
    return part.select("p_partkey", slugify("p_name").alias("slug"))
