"""Analytical query surface — SURVEY.md §2.9 uplift.

The reference's star schema exists to serve analytical rollups that live in
an external NextJS consumer (``/root/reference/README.md:4-7``); this module
makes them first-class engine queries: groupBy aggregates, windows, rollup/
cube, top-k, semi/anti joins, sessionization — all with DuckDB oracles.

Float determinism follows plans/compat.py: exact decimal sums, fixed-scale
rounding, double output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.plans.compat import dec, mean_round, mean_round_sql, money_sum, money_sum_sql
from stadvdb_olap_spark.sources.parquet import load_spread, load_table, spread
from stadvdb_olap_spark.operators.joins import broadcast_if_small

# ---------------------------------------------------------------------------
# TPC-H-style aggregations
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag,
       l_linestatus,
       {money_sum_sql('l_quantity')}                                   AS sum_qty,
       {money_sum_sql('l_extendedprice')}                              AS sum_base_price,
       {money_sum_sql('l_extendedprice * (1 - l_discount)')}           AS sum_disc_price,
       {money_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {mean_round_sql('l_quantity')}                                  AS avg_qty,
       {mean_round_sql('l_extendedprice')}                             AS avg_price,
       {mean_round_sql('l_discount')}                                  AS avg_disc,
       count(*)                                                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-11-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical wide aggregate over
    the fact table. One hash-shuffle on (returnflag, linestatus) with
    map-side partial aggregation — the plan Catalyst picks automatically.
    ``spread`` parallelizes the partial aggregate when the scan yields fewer
    partitions than cores (single-row-group fixture files); it keys on a
    high-cardinality measure the query already reads, so the widening
    exchange adds no scan columns."""
    li = load_spread(spark, sf_dir, "lineitem", "l_extendedprice")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-11-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(charge).alias("sum_charge"),
            mean_round("l_quantity").alias("avg_qty"),
            mean_round("l_extendedprice").alias("avg_price"),
            mean_round("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_top_unshipped_revenue",
    oracle=f"""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       {money_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
GROUP BY o_orderkey, order_date
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q3_top_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style top-k: filter + 3-way join + aggregate + total-order
    top-10 (revenue desc, orderkey as deterministic tiebreak). The customer
    side is a broadcastable dim; Spark's TakeOrderedAndProject handles the
    limit without a global sort."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast_if_small(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            orders.o_orderkey, F.to_date(orders.o_orderdate).alias("order_date")
        )
        .agg(money_sum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q5_revenue_by_nation",
    oracle=f"""
SELECT r_name, n_name,
       {money_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style multi-way star join: one big fact shuffle, three
    broadcast dims, aggregate on the dim attributes. The fact scan is
    spread so the probe + decimal partial-aggregate stage runs at full
    parallelism when the fixture is a single file (at scale the scan
    already parallelizes and spread() is a no-op, leaving the classic
    one-fact-shuffle star)."""
    li = load_spread(spark, sf_dir, "lineitem", "l_orderkey")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast_if_small(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(money_sum(revenue).alias("revenue"))
    )


@query(
    "events_by_type",
    oracle=f"""
SELECT event_type,
       count(*)                      AS n_events,
       count(DISTINCT user_id)       AS n_users,
       {money_sum_sql('value')}      AS sum_value,
       {mean_round_sql('value')}     AS avg_value,
       min(value)                    AS min_value,
       max(value)                    AS max_value
FROM events
GROUP BY event_type
""",
)
def events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate vocabulary: count / count-distinct / sum / avg / min /
    max over the event stream table."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        money_sum("value").alias("sum_value"),
        mean_round("value").alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "top3_parts_per_brand",
    oracle="""
SELECT p_brand, p_partkey, p_name, p_retailprice,
       CAST(rn AS BIGINT) AS brand_rank
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
    FROM part
) WHERE rn <= 3
""",
)
def top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-N per group: the classic rank-and-filter. One shuffle on
    the partition key; the per-group sort is bounded by group size."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("brand_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("brand_rank") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "brand_rank")
    )


@query(
    "running_total_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS running_spend
FROM orders
""",
)
def running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate window (rowsBetween): cumulative customer spend.
    Decimal accumulation keeps every prefix sum exact and engine-agnostic."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "order_gaps_lag",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       date_diff('day',
                 lag(CAST(o_orderdate AS DATE)) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                 CAST(o_orderdate AS DATE)) AS days_since_prev
FROM orders
""",
)
def order_gaps_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() window: days between consecutive orders per customer (NULL for
    the first order)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        d.alias("order_date"),
        F.datediff(d, F.lag(d).over(w)).cast("long").alias("days_since_prev"),
    )


# ---------------------------------------------------------------------------
# Rollup / cube / grouping sets
# ---------------------------------------------------------------------------


@query(
    "rollup_revenue_region_nation",
    oracle=f"""
SELECT r_name, n_name,
       CAST(GROUPING(r_name) AS BIGINT)*2 + CAST(GROUPING(n_name) AS BIGINT)
           AS gid,
       {money_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
""",
)
def rollup_revenue_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region -> nation -> grand total) with a
    grouping id to disambiguate NULL group labels from NULL data.

    Two-level shape (guide §2.3 "aggregate before you shuffle"): the fact
    is first aggregated ONCE at the finest (r_name, n_name) grain in
    exact decimal, and ROLLUP's Expand runs over those ~|regions x
    nations| rows instead of tripling every fact row. Decimal sums are
    exactly associative, so re-aggregating the per-(r, n) exact sums and
    rounding at the end is provably the same value the direct rollup
    produces — re-certified against the unchanged DuckDB oracle. At 100
    TB this removes an Expand over the whole fact (3x map-side rows)."""
    li = load_spread(spark, sf_dir, "lineitem", "l_orderkey")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast_if_small(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    base = joined.groupBy("r_name", "n_name").agg(
        F.sum(dec(revenue)).alias("__rev_exact")
    )
    return (
        base.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("__rev_exact"), 2).cast("double").alias("revenue"),
            F.grouping_id().alias("gid"),
        )
        .select("r_name", "n_name", F.col("gid").cast("long").alias("gid"), "revenue")
    )


@query(
    "cube_order_status_priority",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT)*2
           + CAST(GROUPING(o_orderpriority) AS BIGINT) AS gid,
       count(*) AS n
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
)
def cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two categorical dims: all 2^2 grouping combinations in one
    pass. Two-level (see rollup_revenue_region_nation): counts are
    exactly additive, so the cube's Expand runs over the ~|status x
    priority| base aggregate instead of 4x every order row."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("__n")
    )
    return (
        base.cube("o_orderstatus", "o_orderpriority")
        .agg(F.sum("__n").alias("n"), F.grouping_id().alias("gid"))
        .select(
            "o_orderstatus", "o_orderpriority",
            F.col("gid").cast("long").alias("gid"), "n",
        )
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS)
# ---------------------------------------------------------------------------


@query(
    "semi_join_active_customers",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
""",
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with at least one open order. The join is
    the filter — no duplication of the left side."""
    cust = load_table(spark, sf_dir, "customer")
    open_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cust.join(
        open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# Event-time queries (batch form; streaming versions in streaming/)
# ---------------------------------------------------------------------------


@query(
    "events_tumbling_1h",
    oracle=f"""
SELECT date_trunc('hour', ts)   AS window_start,
       event_type,
       count(*)                 AS n,
       {money_sum_sql('value')} AS sum_value
FROM events
GROUP BY window_start, event_type
""",
)
def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate — the batch twin of the
    Structured Streaming windowed count (streaming/windowed.py shares this
    exact aggregation body via foreachBatch)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), money_sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )


@query(
    "events_sessionize_30m",
    oracle="""
WITH flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                     OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                THEN 1 ELSE 0 END AS is_new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       CAST(SUM(is_new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       AS session_seq
FROM flagged
""",
)
def events_sessionize_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via gap detection: a new session starts after a >30
    minute silence; session ids are per-user running counts of boundaries.
    Two windows over the same (user, time) ordering -> a single shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Compare at microsecond precision on both sides (epoch_us in the
    # oracle) — second-truncated gaps would disagree near the boundary.
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("is_new_session", is_new)
        .select(
            "user_id",
            "event_id",
            F.sum("is_new_session").over(run).cast("long").alias("session_seq"),
        )
    )


@query(
    "q7_nation_trade_volume",
    oracle=f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       {money_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN supplier  ON l_suppkey = s_suppkey
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE ns.n_name <> nc.n_name
GROUP BY supp_nation, cust_nation
""",
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style cross-nation trade volume: a 5-way join where the
    same dimension (nation) enters twice under different roles. All dims
    broadcast; lineitem joins orders on the one real shuffle; the
    inequality filter runs post-join on broadcast attributes."""
    li = load_spread(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("__ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("__nc_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(broadcast_if_small(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast_if_small(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("__ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("__nc_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(money_sum(revenue).alias("revenue"))
    )


@query(
    "q9_profit_by_nation_year",
    oracle=f"""
SELECT ns.n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS order_year,
       {money_sum_sql('l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity')}
           AS profit
FROM lineitem
JOIN supplier  ON l_suppkey = s_suppkey
JOIN part      ON l_partkey = p_partkey
JOIN orders    ON l_orderkey = o_orderkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
GROUP BY nation, order_year
""",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style profit rollup (revenue minus a 60%-of-retail cost
    proxy, since the fixtures have no partsupp cost table) by supplier
    nation and order year. Part/supplier/nation broadcast; the measure is
    computed pre-aggregation so the decimal sum stays one pass."""
    li = load_spread(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(broadcast_if_small(supp), li.l_suppkey == supp.s_suppkey)
        .join(broadcast_if_small(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(money_sum(profit).alias("profit"))
    )


@query(
    "sql_surface_revenue_by_region",
    oracle=f"""
SELECT r_name, {money_sum_sql('o_totalprice')} AS revenue, count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def sql_surface_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point end-to-end: fixture tables registered as temp
    views, the query authored as Spark SQL text (same relational content
    as the DuckDB oracle, Spark dialect for the decimal convention) —
    proving a reference user can bring plain SQL, not just the DataFrame
    API. Catalyst plans it identically to the DataFrame form."""
    from stadvdb_olap_spark.sources.parquet import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r_name,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style customer order-count histogram: LEFT OUTER join with
    a non-key predicate inside the join condition (customers with zero
    matching orders survive with count 0), then a second aggregation over
    the counts. Two shuffles total; the second is over the tiny
    counts-per-customer relation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_spread(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "histogram_order_totals",
    oracle="""
WITH b AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
)
SELECT LEAST(CAST(floor((o_totalprice - lo) / ((hi - lo) / 10.0)) AS BIGINT),
             CAST(9 AS BIGINT)) AS bucket,
       count(*) AS n
FROM orders, b
GROUP BY bucket
""",
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (10 bins) of order totals — the profiling/
    visualization primitive. Two passes at any scale: a 1-row min/max
    aggregate broadcast into a narrow bucket map, then the bucket
    aggregate (10 groups). Bucket arithmetic is pure IEEE double + floor,
    bit-identical across engines; the max value folds into the last bin
    via LEAST."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    bucket = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("lo"))
            / ((F.col("hi") - F.col("lo")) / 10.0)
        ),
        F.lit(9).cast("long"),
    )
    return (
        orders.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "iqr_outlier_events",
    oracle="""
WITH q AS (
  SELECT event_type AS et,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY event_type
)
SELECT event_id, event_type, value
FROM events JOIN q ON event_type = et
WHERE value > q3 + 1.5 * (q3 - q1)
   OR value < q1 - 1.5 * (q3 - q1)
""",
)
def iqr_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier detection per group: quartiles per event type,
    broadcast back, keep rows outside 1.5 IQR — the data-quality
    quarantine step of an ingest pipeline (the heavy-tailed event values
    are where real pipelines need it; uniform columns have no fences to
    trip). The quartile aggregate is the only heavy op (per-group sort;
    swap in approx_percentile at cluster scale); the fence compare is
    pure double arithmetic, identical in both engines since
    quantile_cont == Spark percentile (linear interpolation)."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.percentile("value", 0.25).alias("q1"),
        F.percentile("value", 0.75).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        ev.join(F.broadcast(q), ev.event_type == q.et)
        .filter(
            (F.col("value") > F.col("q3") + 1.5 * iqr)
            | (F.col("value") < F.col("q1") - 1.5 * iqr)
        )
        .select("event_id", "event_type", "value")
    )


@query(
    "ols_price_vs_quantity_by_flag",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)        AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)   AS sy,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS DOUBLE) AS slope,
       CAST(ROUND(sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * (sx / n),
                  6) AS DOUBLE) AS intercept
FROM m
""",
)
def ols_price_vs_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares fit (price ~ quantity) from sufficient
    statistics: one aggregate pass collects exact decimal moments
    (n, Sx, Sy, Sxx, Sxy), the closed-form slope/intercept is IEEE double
    on those — the distributed way to fit millions of tiny models (one
    per group) with zero Python and one shuffle. Same moments pattern as
    the stddev/covariance query; Spark's built-in regr_slope would sum
    doubles in partition order and drift from the oracle."""
    li = load_spread(spark, sf_dir, "lineitem")
    qty, price = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(qty)).cast("double").alias("sx"),
        F.sum(dec(price)).cast("double").alias("sy"),
        F.sum(dec(qty * qty)).cast("double").alias("sxx"),
        F.sum(dec(qty * price)).cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "l_returnflag",
        F.round(slope, 6).cast("double").alias("slope"),
        F.round(
            F.col("sy") / F.col("n") - slope * (F.col("sx") / F.col("n")), 6
        ).cast("double").alias("intercept"),
    )


@query(
    "events_sliding_3h_1h",
    oracle=f"""
SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start,
       event_type,
       count(*)                 AS n,
       {money_sum_sql('value')} AS sum_value
FROM events CROSS JOIN unnest([0, 1, 2]) AS u(k)
GROUP BY window_start, event_type
""",
)
def events_sliding_3h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) 3-hour window with a 1-hour slide — each event
    lands in exactly three windows. Spark's `window(ts, '3 hours',
    '1 hour')` expands rows window-count times before the aggregate (the
    oracle makes the same expansion explicit with a 3-element unnest);
    the shuffle is on (window, type) after map-side partial aggregation,
    so the 3x blow-up never crosses the wire un-combined. The streaming
    twin is the same body under a watermark (streaming/windowed.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "3 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), money_sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )


@query(
    "events_session_window_builtin",
    oracle="""
WITH flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                     OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                THEN 1 ELSE 0 END AS is_new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, ts,
           SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM flagged
)
SELECT user_id,
       CAST(min(ts) AS TIMESTAMP) AS session_start,
       CAST(max(ts) AS TIMESTAMP) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, sid
""",
)
def events_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session aggregates via Spark's built-in session_window
    (30-min gap merge). With a FIXED gap the merge is fully deterministic
    — session boundary iff the micro-precision gap exceeds 30 min
    (verified empirically: a gap of exactly 30 min merges), start = first
    event ts, end = last event ts + gap — so the oracle reproduces it
    with the same lag/cumulative-sum pipeline as the custom sessionizer
    (events_sessionize_30m) plus per-session min/max. The built-in is the
    streaming-ready form: under a watermark it evicts closed sessions
    instead of re-scanning."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "session_stats_30m",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                     OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                THEN 1 ELSE 0 END AS is_new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
    SELECT user_id, ts,
           SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sess
GROUP BY user_id, sid
""",
)
def session_stats_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-grain aggregates in the EXACT output schema of the custom
    stateful streaming sessionizer (streaming/stateful.py SESSION_SCHEMA:
    session_end = last event ts, not ts+gap) — the driver-certified
    surface for that operator's semantics. The body is the shared batch
    twin ``streaming.stateful.session_stats``; the stream-vs-batch
    agreement test pins that every session the stream closes is a row of
    this relation. Gap boundaries compare at microsecond precision, same
    as events_sessionize_30m."""
    from stadvdb_olap_spark.streaming.stateful import session_stats

    return session_stats(load_table(spark, sf_dir, "events"))


@query(
    "share_within_region_nation",
    oracle="""
WITH rev AS (
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
),
reg AS (
    SELECT region, CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE)
               AS region_revenue
    FROM rev GROUP BY region
),
tot AS (
    SELECT CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE)
               AS total_revenue
    FROM rev
)
SELECT rev.region, rev.nation, rev.revenue,
       reg.region_revenue,
       rev.revenue / reg.region_revenue AS share_of_region,
       reg.region_revenue / tot.total_revenue AS region_share_of_total
FROM rev JOIN reg USING (region) CROSS JOIN tot
""",
)
def share_within_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent OLAP rollup: each nation's revenue share WITHIN
    its region, and each region's share of the world — the two-level
    percent-of-parent report (the drill-down companion to the plain
    `rollup_revenue_region_nation` totals and the flat
    `share_of_total_by_segment`). All revenue sums are exact DECIMAL at
    every level (the nation rows re-aggregate decimal-exactly into
    parent totals before the single double conversion per level), so
    each published share is one IEEE division of deterministic
    operands. 100 TB shape: one fact aggregation to nation grain
    (dims broadcast), then all parent math runs on |nations| rows; the
    shares come from a 25-row broadcast join + 1-row scalar cross."""
    orders = load_spread(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    rev = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
            )
            .cast("double")
            .alias("revenue")
        )
    )
    reg = rev.groupBy("region").agg(
        F.sum(F.col("revenue").cast("decimal(18,2)"))
        .cast("double")
        .alias("region_revenue")
    )
    tot = rev.agg(
        F.sum(F.col("revenue").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_revenue")
    )
    return (
        rev.join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            "revenue",
            "region_revenue",
            (F.col("revenue") / F.col("region_revenue")).alias(
                "share_of_region"
            ),
            (F.col("region_revenue") / F.col("total_revenue")).alias(
                "region_share_of_total"
            ),
        )
    )
