"""Data-quality constraint suite over ``orders`` — the declarative
check families a warehouse runs before publishing a table (the
completeness / uniqueness / referential / domain validations of the
Deequ school), emitted as one (check_name, metric, passed) row each.

The reference validates implicitly (NOT NULL columns, ON CONFLICT keys
in its DDL — SURVEY §2.1); this makes the checks explicit, engine-level
and reportable. Extends ``profile_orders`` (per-column profiling) with
pass/fail semantics.

Scale shape: every row-level check folds into ONE conditional-aggregate
pass over the table (count/sum-of-cases — map-side partials, a 1-row
result); the uniqueness check is a distinct-count over the key; the
referential check is a broadcast anti-join count against the dimension
keys. Nothing materializes violations — counts only (a violation-sample
query would add a filter + limit, not a new shape).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stadvdb_olap_spark.operators.joins import broadcast_if_small
from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.sources.parquet import load_table, spread

_STATUS_DOMAIN = ("O", "F", "P")


@query(
    "dq_checks_orders",
    oracle=f"""
SELECT 'row_count_positive' AS check_name,
       (SELECT count(*) FROM orders) AS metric,
       (SELECT count(*) FROM orders) > 0 AS passed
UNION ALL
SELECT 'pk_unique_o_orderkey',
       (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders),
       (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) = 0
UNION ALL
SELECT 'fk_o_custkey_in_customer',
       (SELECT count(*) FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
       (SELECT count(*) FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) = 0
UNION ALL
SELECT 'o_totalprice_nonnegative',
       (SELECT count(*) FROM orders WHERE o_totalprice < 0),
       (SELECT count(*) FROM orders WHERE o_totalprice < 0) = 0
UNION ALL
SELECT 'o_orderdate_complete',
       (SELECT count(*) FROM orders WHERE o_orderdate IS NULL),
       (SELECT count(*) FROM orders WHERE o_orderdate IS NULL) = 0
UNION ALL
SELECT 'o_orderstatus_in_domain',
       (SELECT count(*) FROM orders
        WHERE o_orderstatus NOT IN {_STATUS_DOMAIN!r}),
       (SELECT count(*) FROM orders
        WHERE o_orderstatus NOT IN {_STATUS_DOMAIN!r}) = 0
""",
)
def dq_checks_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint report for orders: row count, key uniqueness,
    referential integrity into customer, non-negativity, completeness,
    and a categorical domain check — one (check_name, metric, passed)
    row per constraint. All row-level checks share a single
    conditional-aggregate scan; the FK check adds one broadcast
    anti-join count."""
    orders = load_table(spark, sf_dir, "orders")
    cust_keys = load_table(spark, sf_dir, "customer").select("c_custkey")

    wide = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("pk_dupes"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0))
        .cast("long")
        .alias("neg_price"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_date"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin(*_STATUS_DOMAIN), 1).otherwise(0)
        )
        .cast("long")
        .alias("bad_status"),
    )
    fk_bad = (
        orders.join(
            broadcast_if_small(cust_keys),
            orders.o_custkey == cust_keys.c_custkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("fk_orphans"))
    )
    m = wide.crossJoin(F.broadcast(fk_bad))

    def check(name: str, metric, passed):
        return m.select(
            F.lit(name).alias("check_name"),
            metric.cast("long").alias("metric"),
            passed.alias("passed"),
        )

    rows = [
        check("row_count_positive", F.col("n_rows"), F.col("n_rows") > 0),
        check("pk_unique_o_orderkey", F.col("pk_dupes"), F.col("pk_dupes") == 0),
        check(
            "fk_o_custkey_in_customer", F.col("fk_orphans"), F.col("fk_orphans") == 0
        ),
        check(
            "o_totalprice_nonnegative", F.col("neg_price"), F.col("neg_price") == 0
        ),
        check("o_orderdate_complete", F.col("null_date"), F.col("null_date") == 0),
        check(
            "o_orderstatus_in_domain", F.col("bad_status"), F.col("bad_status") == 0
        ),
    ]
    return reduce(DataFrame.unionByName, rows)


@query(
    "json_quarantine_events",
    oracle="""
WITH c AS (
  SELECT event_id,
         CASE WHEN event_id % 37 = 0 THEN 'x' || props
              WHEN event_id % 41 = 1 THEN '{"other": 1}'
              ELSE props END AS p
  FROM events
)
SELECT CASE
         WHEN p IS NULL OR NOT json_valid(p) THEN 'malformed'
         WHEN json_extract(
                CASE WHEN json_valid(p) THEN p ELSE '{}' END, '$.k')
              IS NULL THEN 'missing_key'
         ELSE 'ok' END AS reason,
       COUNT(*) AS n_events,
       MIN(event_id) AS min_event_id,
       MAX(event_id) AS max_event_id
FROM c
GROUP BY reason
""",
)
def json_quarantine_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bad-record quarantine for semi-structured ingestion: classify each
    props payload as ok / malformed (unparseable JSON) / missing_key
    (valid JSON without the required field) and report per-reason counts
    with an id range for debugging. Corruption is injected
    deterministically in-query (the fixture is clean) so both engines see
    identical bad rows. ``try_parse_json`` is the Spark 4 non-throwing
    parse — NULL for malformed instead of a poisoned task — and
    ``try_variant_get`` extracts from the parsed VARIANT without
    re-parsing. One conditional-aggregate pass; no row-at-a-time Python."""
    ev = spread(load_table(spark, sf_dir, "events"))
    corrupted = (
        F.when(
            F.col("event_id") % 37 == 0, F.concat(F.lit("x"), F.col("props"))
        )
        .when(F.col("event_id") % 41 == 1, F.lit('{"other": 1}'))
        .otherwise(F.col("props"))
    )
    v = F.try_parse_json(corrupted)
    # Extract as VARIANT (not a typed cast): k is "missing" only when the
    # KEY is absent — a non-integer k value still classifies ok, matching
    # the oracle's json_extract presence test; NULL props are malformed
    # on both sides.
    k = F.try_variant_get(v, "$.k", "variant")
    reason = (
        F.when(v.isNull(), F.lit("malformed"))
        .when(k.isNull(), F.lit("missing_key"))
        .otherwise(F.lit("ok"))
    )
    return (
        ev.select("event_id", reason.alias("reason"))
        .groupBy("reason")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
    )


# Candidate functional dependencies to profile: (name, table, lhs, rhs).
# Mix of true FDs (key-determined) and plausible-but-false ones — the
# point of FD profiling is MEASURING violation mass, not asserting.
_FD_CANDIDATES = (
    ("nation_region", "nation", "n_nationkey", "n_regionkey"),
    ("customer_segment", "customer", "c_custkey", "c_mktsegment"),
    ("order_priority_by_customer", "orders", "o_custkey", "o_orderpriority"),
    ("returnflag_by_order", "lineitem", "l_orderkey", "l_returnflag"),
)


def _fd_oracle() -> str:
    parts = []
    for name, table, lhs, rhs in _FD_CANDIDATES:
        parts.append(f"""
SELECT '{name}' AS fd,
       CAST(COUNT(*) AS BIGINT) AS n_lhs_groups,
       CAST(COUNT(*) FILTER (WHERE d > 1) AS BIGINT) AS n_violating_groups,
       CAST(MAX(d) AS BIGINT) AS max_rhs_per_lhs,
       CAST(COUNT(*) FILTER (WHERE d > 1) AS DOUBLE) / COUNT(*)
         AS violation_rate
FROM (
  SELECT {lhs}, COUNT(DISTINCT {rhs}) AS d
  FROM {table} GROUP BY {lhs}
)""")
    return "\nUNION ALL\n".join(parts)


@query("fd_violation_audit", oracle=_fd_oracle())
def fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiling (the FD-discovery primitive of
    data-profiling systems, cf. Papenbrock et al., VLDB 2015): for each
    candidate X -> Y, how many X-groups carry more than one distinct Y —
    zero violating groups certifies the dependency on this snapshot,
    nonzero quantifies the violation mass (a schema-design and
    DQ-regression signal; run per snapshot and diff). All-integer
    outputs plus one exact-operand division for the rate. 100 TB shape:
    per FD one map-side-combinable distinct-count aggregate keyed on X,
    then a 1-row reduce; candidates union at the row level, so adding
    candidates never rescans others' tables."""
    out = None
    for name, table, lhs, rhs in _FD_CANDIDATES:
        t = load_table(spark, sf_dir, table)
        g = (
            t.groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("d"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_lhs_groups"),
                F.sum(F.when(F.col("d") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating_groups"),
                F.max("d").cast("long").alias("max_rhs_per_lhs"),
            )
            .select(
                F.lit(name).alias("fd"),
                "n_lhs_groups",
                "n_violating_groups",
                "max_rhs_per_lhs",
                (
                    F.col("n_violating_groups").cast("double")
                    / F.col("n_lhs_groups")
                ).alias("violation_rate"),
            )
        )
        out = g if out is None else out.unionAll(g)
    return out
