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
from stadvdb_olap_spark.sources.parquet import load_spread, load_table

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
    ev = load_spread(spark, sf_dir, "events")
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


@query(
    "order_total_reconciliation_audit",
    oracle="""
WITH line AS (
    SELECT l_orderkey,
           CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                    * (10000 - CAST(round(l_discount * 10000, 0) AS BIGINT))
                    * (10000 + CAST(round(l_tax * 10000, 0) AS BIGINT)))
                AS BIGINT) AS recomputed_u
    FROM lineitem GROUP BY l_orderkey
),
j AS (
    SELECT o.o_orderstatus,
           abs(line.recomputed_u
               - CAST(round(o.o_totalprice * 100, 0) AS BIGINT)
                 * 100000000) AS adiff_u
    FROM orders o JOIN line ON o.o_orderkey = line.l_orderkey
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(*) FILTER (adiff_u > 50000000) AS BIGINT) AS n_mismatched,
       CAST(MAX(adiff_u) AS DOUBLE) / 10000000000 AS max_abs_diff_dollars
FROM j GROUP BY o_orderstatus
""",
)
def order_total_reconciliation_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-table financial reconciliation: recompute each order's
    total from its lines (Σ extendedprice·(1−discount)·(1+tax) — the
    TPC-H pricing identity) and audit the divergence from the stored
    o_totalprice per status — the ledger-vs-detail tie-out every
    finance pipeline runs nightly. EXACT integer device: prices go to
    BIGINT cents and rates to basis points via round() (ties-away in
    both engines), so each line's value is an exact integer in 1e-10
    dollar units, per-order sums are exact BIGINTs (≈7e15 max, well
    under 2^63), and the mismatch verdict |recomputed − stored| >
    half a cent is a pure integer comparison; the only float is the
    published max divergence. 100 TB shape: one lineitem aggregate
    keyed on the order key, one same-keyed join to orders (both sides
    co-partition on o_orderkey — bucket layouts make it shuffle-free),
    one status rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    line = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            * (10000 - F.round(F.col("l_discount") * 10000, 0).cast("long"))
            * (10000 + F.round(F.col("l_tax") * 10000, 0).cast("long"))
        )
        .cast("long")
        .alias("recomputed_u")
    )
    orders = load_table(spark, sf_dir, "orders")
    j = orders.join(
        line, orders["o_orderkey"] == line["l_orderkey"]
    ).select(
        "o_orderstatus",
        F.abs(
            F.col("recomputed_u")
            - F.round(F.col("o_totalprice") * 100, 0).cast("long")
            * F.lit(100000000).cast("long")
        ).alias("adiff_u"),
    )
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("adiff_u") > 50000000, 1).otherwise(0))
        .cast("long")
        .alias("n_mismatched"),
        (F.max("adiff_u").cast("double") / F.lit(10000000000.0)).alias(
            "max_abs_diff_dollars"
        ),
    )


# Pinned FD-discovery candidates over orders: determinant -> dependent.
_G3_CANDIDATES = (
    ("custkey->priority", "o_custkey", "o_orderpriority"),
    ("custkey->status", "o_custkey", "o_orderstatus"),
    ("priority->status", "o_orderpriority", "o_orderstatus"),
    ("orderdate->priority", "o_orderdate", "o_orderpriority"),
)


def _g3_oracle() -> str:
    parts = []
    for name, lhs, rhs in _G3_CANDIDATES:
        parts.append(f"""
SELECT '{name}' AS fd,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(SUM(mx) AS BIGINT) AS n_keep,
       CAST(SUM(c) - SUM(mx) AS BIGINT) AS n_remove,
       CAST(SUM(c) - SUM(mx) AS DOUBLE) / SUM(c) AS g3_error,
       SUM(c) = SUM(mx) AS holds_exactly
FROM (
    SELECT {lhs},
           CAST(SUM(cnt) AS BIGINT) AS c,
           CAST(MAX(cnt) AS BIGINT) AS mx
    FROM (SELECT {lhs}, {rhs}, COUNT(*) AS cnt
          FROM orders GROUP BY {lhs}, {rhs})
    GROUP BY {lhs}
)""")
    return " UNION ALL ".join(parts)


@query("fd_g3_discovery_orders", oracle=_g3_oracle())
def fd_g3_discovery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-FD discovery with the g3 repair metric (Kivinen &
    Mannila 1995; the measure TANE/Pyro-style profilers rank candidate
    dependencies by): for each pinned candidate X -> Y, g3 = the
    minimum fraction of rows to DELETE for the FD to hold exactly —
    n_rows − Σ_X max_Y count, all exact BIGINT counting with one final
    division. Complements `fd_violation_audit` (which counts violating
    groups) with the repair-cost view profilers actually rank by.
    100 TB shape: per candidate one (X, Y) hash aggregate then an
    X-keyed max — both map-side combinable; candidates are independent
    branches unioned at the result grain."""
    orders = load_table(spark, sf_dir, "orders")
    out = None
    for name, lhs, rhs in _G3_CANDIDATES:
        per_pair = orders.groupBy(lhs, rhs).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        per_lhs = per_pair.groupBy(lhs).agg(
            F.sum("cnt").cast("long").alias("c"),
            F.max("cnt").cast("long").alias("mx"),
        )
        g = per_lhs.agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.sum("mx").cast("long").alias("n_keep"),
        ).select(
            F.lit(name).alias("fd"),
            "n_rows",
            "n_keep",
            (F.col("n_rows") - F.col("n_keep")).cast("long").alias(
                "n_remove"
            ),
            (
                (F.col("n_rows") - F.col("n_keep")).cast("double")
                / F.col("n_rows")
            ).alias("g3_error"),
            (F.col("n_rows") == F.col("n_keep")).alias("holds_exactly"),
        )
        out = g if out is None else out.unionAll(g)
    return out


@query(
    "backfill_ranges_orders",
    oracle="""
WITH obs AS (
    SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders
    WHERE day(o_orderdate) % 5 <> 0 AND day(o_orderdate) NOT IN (11, 12, 13)
),
b AS (SELECT min(d) AS lo, max(d) AS hi FROM obs),
cal AS (
    SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                       CAST(hi AS TIMESTAMP),
                                       INTERVAL 1 DAY)) AS DATE) AS d
    FROM b
),
miss AS (SELECT d FROM cal WHERE d NOT IN (SELECT d FROM obs)),
isl AS (
    SELECT d, d - CAST(row_number() OVER (ORDER BY d) AS INTEGER) AS grp
    FROM miss
)
SELECT min(d) AS range_start, max(d) AS range_end,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM isl GROUP BY grp
""",
)
def backfill_ranges_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION BACKFILL PLANNER: find every missing daily partition in
    an ingest (here a deterministic outage pattern: days-of-month
    divisible by 5 plus the 11th-13th never landed) and compact the
    missing days into contiguous [start, end] ranges — exactly the job
    spec a backfill scheduler submits. Gaps-and-islands device: calendar
    from the observed bounds (1-row aggregate -> sequence explode), an
    anti-join against observed days, then the classic date-minus-
    row_number island key. All grains after the first distinct are
    calendar-bounded (~2.2k days at ANY data scale), so the global
    ordering window is plan-audit rule-4 safe; the only fact-sized work
    is the initial distinct-days aggregate with map-side partials."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    dom = F.dayofmonth("o_orderdate")
    obs = (
        orders.filter((dom % 5 != 0) & (~dom.isin(11, 12, 13)))
        .select(F.to_date("o_orderdate").alias("d"))
        .distinct()
    )
    bounds = obs.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    missing = cal.join(obs, "d", "left_anti")
    w = Window.orderBy("d")
    isl = missing.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    return isl.groupBy("grp").agg(
        F.min("d").alias("range_start"),
        F.max("d").alias("range_end"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    ).drop("grp")


from stadvdb_olap_spark.operators.maintenance import (  # noqa: E402  # isort: skip
    COMPACT_ROW_BYTES as _COMPACT_ROW_BYTES,
    COMPACT_TARGET as _COMPACT_TARGET,
)


@query(
    "compaction_plan_orders",
    oracle=f"""
WITH files AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
           CAST(COUNT(*) * {_COMPACT_ROW_BYTES} AS BIGINT) AS est_bytes
    FROM orders GROUP BY 1, 2
),
grouped AS (
    SELECT mon, d, est_bytes,
           CAST((SUM(est_bytes) OVER (PARTITION BY mon ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - est_bytes) // {_COMPACT_TARGET} AS BIGINT) AS group_id
    FROM files
)
SELECT mon, group_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(est_bytes) AS BIGINT) AS total_bytes,
       MIN(d) AS first_date, MAX(d) AS last_date
FROM grouped GROUP BY mon, group_id
""",
)
def compaction_plan_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMALL-FILE COMPACTION PLANNER (the lakehouse OPTIMIZE job spec):
    model each ingest day as one small file (row count x a modeled row
    width), then bin ADJACENT files within a month partition into
    merge groups near the target size via the cumsum-DIV device —
    group = (running bytes before me) DIV target, the standard
    scalable approximation of the greedy adjacent fold (no recursion,
    no sequential stage; compare pack_chunks_512, where exact FFD is
    worth a sequential per-bucket pass because bins must never
    overflow — compaction targets are soft). Shape: one
    calendar-bounded aggregate, one month-partitioned window, one
    group aggregate; nothing at fact grain after the first count.
    Body is the SHARED ``operators/maintenance.py`` pair — the same
    fold the streaming incremental planner derives its plan from, so
    batch and stream can never diverge (agreement-tested)."""
    from stadvdb_olap_spark.operators.maintenance import (
        compaction_groups,
        day_file_stats,
    )

    orders = load_table(spark, sf_dir, "orders")
    return compaction_groups(
        day_file_stats(orders, "o_orderdate", _COMPACT_ROW_BYTES),
        _COMPACT_TARGET,
    )


def _orphan_rel_sql(name: str, child: str, ck: str, parent_sql: str) -> str:
    return f"""
SELECT '{name}' AS relationship,
       CAST(COUNT(*) AS BIGINT) AS n_child,
       CAST(SUM(CASE WHEN {ck} NOT IN ({parent_sql}) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orphans,
       CAST(SUM(CASE WHEN {ck} NOT IN ({parent_sql}) THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS orphan_frac
FROM {child}
"""


@query(
    "orphan_fk_audit_star",
    oracle=" UNION ALL ".join(
        [
            _orphan_rel_sql(
                "lineitem->orders", "lineitem", "l_orderkey",
                "SELECT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0",
            ),
            _orphan_rel_sql(
                "orders->customer", "orders", "o_custkey",
                "SELECT c_custkey FROM customer WHERE c_custkey % 10 <> 3",
            ),
            _orphan_rel_sql(
                "lineitem->part", "lineitem", "l_partkey",
                "SELECT p_partkey FROM part WHERE p_partkey % 5 <> 2",
            ),
        ]
    ),
)
def orphan_fk_audit_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STAR-SCHEMA ORPHAN AUDIT: per FK relationship, how many fact rows
    point at a dimension row that hasn't landed — the report that decides
    between blocking a load, placeholder-resolving
    (operators/fact.py:resolve_late_arriving) and backfilling. Parents
    are deterministically THINNED (simulated partial dimension loads) so
    the audit exercises real non-zero orphan rates rather than a
    trivially-clean fixture. Shape per relationship: one broadcast-gated
    anti-probe folded into a conditional aggregate — each relationship is
    one pass over its child table with map-side partials, unioned into a
    |relationships|-row report."""
    rels = [
        ("lineitem->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey", 7, 0),
        ("orders->customer", "orders", "o_custkey",
         "customer", "c_custkey", 10, 3),
        ("lineitem->part", "lineitem", "l_partkey",
         "part", "p_partkey", 5, 2),
    ]
    out = None
    for name, child_t, ck, parent_t, pk, mod, drop in rels:
        child = load_table(spark, sf_dir, child_t).select(
            F.col(ck).alias("__k")
        )
        parent = (
            load_table(spark, sf_dir, parent_t)
            .filter(F.col(pk) % mod != drop)
            .select(F.col(pk).alias("__k"))
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        probed = child.join(broadcast_if_small(parent), "__k", "left")
        rel = probed.agg(
            F.count(F.lit(1)).cast("long").alias("n_child"),
            F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_orphans"),
        ).select(
            F.lit(name).alias("relationship"),
            "n_child",
            "n_orphans",
            (F.col("n_orphans").cast("double") / F.col("n_child")).alias(
                "orphan_frac"
            ),
        )
        out = rel if out is None else out.unionByName(rel)
    return out


@query(
    "orphan_fk_repair_roundtrip_orders",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_facts,
       CAST(SUM(CASE WHEN o_custkey % 10 = 3 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orphans_before,
       CAST(SUM(CASE WHEN o_custkey % 10 = 3 THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS orphan_frac_before,
       CAST(SUM(CASE WHEN o_custkey % 10 = 3 AND o_custkey % 100 <> 33
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_repaired,
       CAST(SUM(CASE WHEN o_custkey % 100 = 33 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orphans_after,
       CAST(SUM(CASE WHEN o_custkey % 100 = 33 THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS orphan_frac_after
FROM orders
""",
)
def orphan_fk_repair_roundtrip_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THE FULL DQ LOOP a warehouse operator actually runs:
    audit (``orphan_fk_audit_star`` detects orders pointing at missing
    customers) → repair (``operators/fact.py:resolve_late_arriving``
    placeholder-resolves at load, then re-resolves only the placeholder
    slice against the refreshed dimension) → RE-AUDIT (count what's
    still orphaned). One row: orphan count/rate before, rows repaired,
    orphan count/rate after. The load-time snapshot misses 10% of
    customers; the refreshed one still misses 1% (keys ≡ 33 mod 100),
    so 'after' shows the honest residual, and the companion unit test
    asserts the rate is EXACTLY ZERO for every key whose dimension row
    arrived. Spark runs the real two-pass operator and aggregates ITS
    outputs (was_late / repaired / placeholder sentinel — never the
    closed form); the oracle is the closed form of the same
    deterministic snapshots. 100 TB shape: two broadcast-gated lookups
    + one conditional-aggregate pass, repair touching |late| not
    |fact|."""
    from stadvdb_olap_spark.functions.keys import surrogate_key
    from stadvdb_olap_spark.operators.fact import resolve_late_arriving

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    customer = load_table(spark, sf_dir, "customer")
    key_map = customer.select(
        F.col("c_custkey"),
        surrogate_key(["c_custkey"], method="md5").alias("surrogate_key"),
    )
    v1 = key_map.filter(F.col("c_custkey") % 10 != 3)
    v2 = key_map.filter(F.col("c_custkey") % 100 != 33)
    out = resolve_late_arriving(
        orders, v1, v2,
        fact_key="o_custkey", map_key="c_custkey",
        out_col="customer_sk",
    )
    unresolved = (F.col("customer_sk") == "__unresolved__").cast("long")
    late = F.col("was_late").cast("long")
    rep = F.col("repaired").cast("long")
    return out.agg(
        F.count(F.lit(1)).cast("long").alias("n_facts"),
        F.sum(late).cast("long").alias("n_orphans_before"),
        (F.sum(late).cast("double") / F.count(F.lit(1))).alias(
            "orphan_frac_before"
        ),
        F.sum(rep).cast("long").alias("n_repaired"),
        F.sum(unresolved).cast("long").alias("n_orphans_after"),
        (F.sum(unresolved).cast("double") / F.count(F.lit(1))).alias(
            "orphan_frac_after"
        ),
    )


@query(
    "snapshot_retention_gfs_orders",
    oracle="""
WITH snaps AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders),
anchor AS (SELECT MAX(d) AS a FROM snaps),
marked AS (
    SELECT d, a,
           CAST(date_trunc('week', d) AS DATE) AS wk,
           CAST(date_trunc('month', d) AS DATE) AS mon
    FROM snaps CROSS JOIN anchor
),
kept AS (
    SELECT d, a,
           d >= a - 6 AS keep_daily,
           (d >= a - 27 AND d = MAX(d) OVER (PARTITION BY wk))
               AS keep_weekly,
           d = MAX(d) OVER (PARTITION BY mon) AS keep_monthly
    FROM marked
)
SELECT d AS snapshot_date,
       CASE WHEN keep_daily THEN 'daily'
            WHEN keep_weekly THEN 'weekly'
            WHEN keep_monthly THEN 'monthly'
            ELSE 'expire' END AS tier,
       (keep_daily OR keep_weekly OR keep_monthly) AS keep
FROM kept
""",
)
def snapshot_retention_gfs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT-EXPIRATION PLANNER with grandfather-father-son rotation
    (the Delta/Iceberg `expireSnapshots` retention policy every
    lakehouse runs): model one table snapshot per ingest day, keep the
    last 7 days at DAILY grain, the last-of-week for 4 weeks at WEEKLY
    grain, the last-of-month forever at MONTHLY grain — everything else
    expires. Pure calendar logic relative to the newest snapshot
    (data-derived as-of, so the plan is scale- and time-independent):
    two bounded-grain windows over |snapshot days| rows, one 1-row
    broadcast cross for the as-of — nothing at fact grain after the
    distinct-dates pass. Companion of `compaction_plan_orders` (what to
    rewrite) and `sources/versioned.py` (which versions to drop)."""
    from pyspark.sql import Window

    snaps = (
        load_table(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate").alias("d"))
        .distinct()
    )
    asof = snaps.agg(F.max("d").alias("a"))
    marked = snaps.crossJoin(F.broadcast(asof)).select(
        "d",
        "a",
        F.date_trunc("week", "d").cast("date").alias("wk"),
        F.date_trunc("month", "d").cast("date").alias("mon"),
    )
    w_wk = Window.partitionBy("wk")
    w_mon = Window.partitionBy("mon")
    kept = marked.select(
        "d",
        (F.col("d") >= F.date_sub("a", 6)).alias("keep_daily"),
        (
            (F.col("d") >= F.date_sub("a", 27))
            & (F.col("d") == F.max("d").over(w_wk))
        ).alias("keep_weekly"),
        (F.col("d") == F.max("d").over(w_mon)).alias("keep_monthly"),
    )
    return kept.select(
        F.col("d").alias("snapshot_date"),
        F.when(F.col("keep_daily"), "daily")
        .when(F.col("keep_weekly"), "weekly")
        .when(F.col("keep_monthly"), "monthly")
        .otherwise("expire")
        .alias("tier"),
        (
            F.col("keep_daily") | F.col("keep_weekly") | F.col("keep_monthly")
        ).alias("keep"),
    )


_ERASE_MOD = 131  # deletion-request key set: custkeys ≡ 0 (mod 131)


@query(
    "gdpr_erasure_blast_radius_star",
    oracle=f"""
WITH req AS (SELECT c_custkey AS k FROM customer
             WHERE c_custkey % {_ERASE_MOD} = 0),
aff_orders AS (
    SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT k FROM req)
)
SELECT 'customer' AS table_name,
       CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_rows,
       CAST((SELECT COUNT(*) FROM req) AS BIGINT) AS n_affected,
       CAST((SELECT COUNT(*) FROM req) AS DOUBLE)
           / (SELECT COUNT(*) FROM customer) AS affected_frac
UNION ALL
SELECT 'orders',
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
       CAST((SELECT COUNT(*) FROM aff_orders) AS BIGINT),
       CAST((SELECT COUNT(*) FROM aff_orders) AS DOUBLE)
           / (SELECT COUNT(*) FROM orders)
UNION ALL
SELECT 'lineitem',
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem
             WHERE l_orderkey IN (SELECT o_orderkey FROM aff_orders))
            AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem
             WHERE l_orderkey IN (SELECT o_orderkey FROM aff_orders))
            AS DOUBLE) / (SELECT COUNT(*) FROM lineitem)
""",
)
def gdpr_erasure_blast_radius_star(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RIGHT-TO-ERASURE BLAST-RADIUS AUDIT: given a deletion-request key
    set, the rows a cascading erasure must touch in every table of the
    star (customer -> their orders -> those orders' lineitems) — the
    impact report a privacy team signs off BEFORE running the delete,
    and the denominator for verifying the delete afterwards (re-run:
    every n_affected must read 0). Completes the privacy-ops family
    (k_anonymity / l_diversity audit risk; this audits erasure reach).
    Shape: the request set and affected-order keys are broadcast-gated
    semi-join probes; each table contributes one conditional-aggregate
    pass — no fact-sided shuffle, no row materialization (counts
    only, like dq_checks_orders)."""
    req = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % _ERASE_MOD == 0)
        .select(F.col("c_custkey").alias("k"))
    )
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    aff_orders = orders.join(
        broadcast_if_small(req), orders.o_custkey == req.k, "left_semi"
    ).select("o_orderkey")

    def audit(name: str, table: DataFrame, affected: DataFrame) -> DataFrame:
        tot = table.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        aff = affected.agg(F.count(F.lit(1)).cast("long").alias("n_affected"))
        return (
            F.broadcast(tot)
            .crossJoin(F.broadcast(aff))
            .select(
                F.lit(name).alias("table_name"),
                "n_rows",
                "n_affected",
                (
                    F.col("n_affected").cast("double") / F.col("n_rows")
                ).alias("affected_frac"),
            )
        )

    aff_li = lineitem.join(
        broadcast_if_small(aff_orders),
        lineitem.l_orderkey == aff_orders.o_orderkey,
        "left_semi",
    )
    return (
        audit("customer", customer, req)
        .unionByName(audit("orders", orders, aff_orders))
        .unionByName(audit("lineitem", lineitem, aff_li))
    )


_SCD2_DROP = 97  # damage: drop rows where (cust_id + version) % 97 == 0
_SCD2_BUMP = 89  # damage: effective_to + 3 days where % 89 == 0


@query(
    "scd2_validity_audit_customers",
    oracle=f"""
WITH ordered AS (
    SELECT o_custkey AS cust_id, o_orderpriority AS priority,
           o_orderdate AS eff_ts, o_orderkey,
           row_number() OVER w AS rn,
           lag(o_orderpriority) OVER w AS prev_p
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), points AS (
    SELECT * FROM ordered WHERE rn = 1 OR priority IS DISTINCT FROM prev_p
), hist AS (
    SELECT cust_id,
           CAST(eff_ts AS DATE) AS effective_from,
           CAST(lead(eff_ts) OVER w2 AS DATE) AS effective_to,
           CAST(row_number() OVER w2 AS INTEGER) AS version,
           (lead(eff_ts) OVER w2 IS NULL) AS is_current
    FROM points
    WINDOW w2 AS (PARTITION BY cust_id ORDER BY eff_ts, o_orderkey)
), damaged AS (
    SELECT cust_id, effective_from,
           CASE WHEN effective_to IS NOT NULL
                     AND (cust_id + version) % {_SCD2_BUMP} = 0
                THEN effective_to + 3 ELSE effective_to END AS effective_to,
           version, is_current
    FROM hist WHERE (cust_id + version) % {_SCD2_DROP} <> 0
), flagged AS (
    SELECT *,
           lead(effective_from)
             OVER (PARTITION BY cust_id
                   ORDER BY version, effective_from) AS nxt_from
    FROM damaged
), per_key AS (
    SELECT cust_id,
           SUM(CASE WHEN nxt_from IS NOT NULL
                     AND (effective_to IS NULL OR effective_to > nxt_from)
                    THEN 1 ELSE 0 END) AS n_overlap,
           SUM(CASE WHEN nxt_from IS NOT NULL AND effective_to < nxt_from
                    THEN 1 ELSE 0 END) AS n_gap,
           SUM(CASE WHEN is_current THEN 1 ELSE 0 END) AS n_current,
           COUNT(*) AS n_rows,
           MIN(version) AS v_min, MAX(version) AS v_max,
           COUNT(DISTINCT version) AS v_distinct
    FROM flagged GROUP BY cust_id
), s AS (
    SELECT CAST(SUM(n_overlap) AS BIGINT) AS overlap_v,
           CAST(SUM(CASE WHEN n_overlap > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS overlap_k,
           CAST(SUM(n_gap) AS BIGINT) AS gap_v,
           CAST(SUM(CASE WHEN n_gap > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS gap_k,
           CAST(SUM(CASE WHEN n_current <> 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS cur_k,
           CAST(SUM(CASE WHEN v_min <> 1 OR v_max <> n_rows
                           OR v_distinct <> n_rows
                    THEN 1 ELSE 0 END) AS BIGINT) AS holes_k
    FROM per_key
)
SELECT 'overlap' AS rule, overlap_k AS n_violating_keys,
       overlap_v AS n_violations FROM s
UNION ALL SELECT 'gap', gap_k, gap_v FROM s
UNION ALL SELECT 'bad_current_count', cur_k, cur_k FROM s
UNION ALL SELECT 'version_holes', holes_k, holes_k FROM s
""",
)
def scd2_validity_audit_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SCD2 VALIDITY-INTERVAL AUDIT (``dimension.scd2_validity_audit``)
    exercised against a deterministically DAMAGED history, so every
    rule demonstrably fires and both engines agree on the ground truth
    (the range-sync damage-injection convention): the certified
    customer-priority SCD2 history loses rows where
    (key + version) % 97 == 0 — version holes, gaps, and keys with no
    current row — and has effective_to bumped +3 days where % 89 == 0 —
    overlapping validity. The four audited invariants (no overlap, no
    gap, exactly one current, dense versions) are exactly what a
    point-in-time join (`pit_join_events_priority`) assumes; a clean
    ``scd2_history`` output passes all four by construction (unit
    test). One key-partitioned shuffle shared by the history build,
    the damage projection, and the audit window/aggregate."""
    from stadvdb_olap_spark.operators.dimension import (
        scd2_history,
        scd2_validity_audit,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust_id"),
        F.col("o_orderpriority").alias("priority"),
        "o_orderdate",
        "o_orderkey",
    )
    hist = scd2_history(
        orders,
        keys=["cust_id"],
        attrs=["priority"],
        ts_col="o_orderdate",
        tiebreak=["o_orderkey"],
    ).select(
        "cust_id",
        F.to_date("effective_from").alias("effective_from"),
        F.to_date("effective_to").alias("effective_to"),
        "version",
        "is_current",
    )
    damaged = hist.where(
        (F.col("cust_id") + F.col("version")) % _SCD2_DROP != 0
    ).withColumn(
        "effective_to",
        F.when(
            F.col("effective_to").isNotNull()
            & ((F.col("cust_id") + F.col("version")) % _SCD2_BUMP == 0),
            F.date_add("effective_to", 3),
        ).otherwise(F.col("effective_to")),
    )
    return scd2_validity_audit(damaged, ["cust_id"])
