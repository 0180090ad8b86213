"""Advanced relational + training-pipeline operators beyond the reference.

The reference performs no aggregation/window/sort at all (SURVEY.md §2.9) —
its star schema implies an analytical consumer that lives elsewhere. This
module rounds out that implied surface with the operators a warehouse user
expects but vanilla SQL engines often special-case:

- as-of join (latest-order-per-event) — the single-shuffle union-timeline
  plan, not a per-row subquery
- range/band join against a broadcast interval dimension
- set ops (INTERSECT / EXCEPT), pivot, grouping sets
- exact interpolated percentiles, ntile quartiles, sliding moving average
- JSON property extraction (events.props)
- two-phase salted aggregation (the skew pattern, provably equal to the
  plain group-by)
- deterministic hash-based train/val/test split (reproducible sampling for
  training-data curation at any scale)
- moment-based statistical aggregates (stddev/corr from exact decimal sums)

Every query has a DuckDB oracle; float determinism follows plans/compat.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.plans.compat import dec, money_sum, money_sum_sql
from stadvdb_olap_spark.sources.parquet import load_spread, load_table
from stadvdb_olap_spark.operators.joins import broadcast_if_small

# ---------------------------------------------------------------------------
# As-of join
# ---------------------------------------------------------------------------


@query(
    "asof_join_events_orders",
    oracle="""
WITH od AS (
    SELECT o_custkey, o_orderdate, o_orderkey FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) = 1
)
SELECT e.event_id, e.user_id, od.o_orderkey AS last_order_key
FROM events e
ASOF LEFT JOIN od ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
""",
)
def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every event, the user's most recent order at or
    before the event timestamp.

    Spark has no ASOF JOIN; the scalable plan is a union timeline: tag
    orders kind=0 and events kind=1, ONE shuffle on user, sort by
    (time, kind) inside each partition, and carry the last non-null order
    key forward with an unbounded-preceding window. Cost is a single
    hash-partition of both inputs — no range self-join, no per-row probe.
    Ties (same user, same order timestamp) are pre-deduped keep-max-key so
    the result is deterministic.
    """
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
    order_rows = od.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("kind"),
        F.col("o_orderkey").alias("okey"),
        F.lit(None).cast("long").alias("event_id"),
    )
    event_rows = events.select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("okey"),
        "event_id",
    )
    w = (
        Window.partitionBy("uid")
        .orderBy("t", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        order_rows.unionByName(event_rows)
        .withColumn("last_order_key", F.last("okey", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select("event_id", F.col("uid").alias("user_id"), "last_order_key")
    )


# ---------------------------------------------------------------------------
# Range / band join
# ---------------------------------------------------------------------------

_BANDS = [
    ("band_900", 900.0, 925.0),
    ("band_925", 925.0, 950.0),
    ("band_950", 950.0, 975.0),
    ("band_975", 975.0, 1000.0),
]


@query(
    "range_join_price_bands",
    oracle=f"""
SELECT p.p_partkey, b.band_name, p.p_retailprice
FROM part p
JOIN (VALUES {", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)})
     AS b(band_name, lo, hi)
  ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
""",
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: map each part price into an interval dimension.
    The bands side is tiny, so the right plan is a broadcast nested-loop
    join with the range predicate evaluated streaming-side — no shuffle of
    the big table at any scale."""
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(_BANDS, ["band_name", "lo", "hi"])
    cond = (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi)
    return part.join(F.broadcast(bands), cond).select(
        "p_partkey", "band_name", "p_retailprice"
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "set_ops_customer_status",
    oracle="""
WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
     o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM f INTERSECT SELECT * FROM o)
UNION ALL
SELECT o_custkey, 'f_only' AS tag FROM (SELECT * FROM f EXCEPT SELECT * FROM o)
""",
)
def set_ops_customer_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT surface: customers with both finished and open
    orders vs finished-only, union-tagged into one relation."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    both = f.intersect(o).withColumn("tag", F.lit("both"))
    f_only = f.subtract(o).withColumn("tag", F.lit("f_only"))
    return both.unionByName(f_only)


# ---------------------------------------------------------------------------
# Pivot
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_event_type_daily",
    oracle=f"""
SELECT CAST(ts AS DATE) AS day,
       {", ".join(
           "CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))) "
           f"FILTER (WHERE event_type = '{t}'), 2) AS DOUBLE) AS {t}"
           for t in _EVENT_TYPES
       )}
FROM events
GROUP BY day
""",
)
def pivot_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily event-value totals, one column per event type. With an
    explicit value list the pivot is a single hash aggregate — no extra
    pass to discover the domain."""
    ev = load_spread(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(money_sum("value"))
    )


# ---------------------------------------------------------------------------
# Percentiles / ntile / moving average
# ---------------------------------------------------------------------------


@query(
    "percentiles_by_priority",
    oracle="""
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75
FROM orders
GROUP BY o_orderpriority
""",
)
def percentiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (Spark ``percentile``
    == DuckDB ``quantile_cont``). The exact form needs a per-group sort;
    the 100 TB path swaps in ``approx_percentile`` (t-digest, mergeable,
    one pass) — exposed separately as a rows-only query."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        *[
            F.round(F.percentile("o_totalprice", p), 4).alias(name)
            for name, p in [("p25", 0.25), ("p50", 0.50), ("p75", 0.75)]
        ]
    )


@query(
    "approx_percentiles_by_priority",
    oracle="""
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50_exact,
       TRUE AS p50_within_2pct
FROM orders
GROUP BY o_orderpriority
""",
)
def approx_percentiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles with a built-in error bound: the sketch
    estimate itself is implementation-specific, so the hash-checked output
    is the exact p50 plus the claim |approx-exact|/exact <= 2% as a
    boolean — the oracle asserts the claim holds for every group.
    Mergeable partial sketches are the one-pass scale path for quantiles;
    at 100 TB only the approx half runs and the guarantee is the sketch's
    accuracy parameter."""
    orders = load_table(spark, sf_dir, "orders")
    p50_exact = F.round(F.percentile("o_totalprice", F.lit(0.5)), 4)
    p50_approx = F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000))
    return orders.groupBy("o_orderpriority").agg(
        p50_exact.alias("p50_exact"),
        (F.abs(p50_approx - p50_exact) / p50_exact <= F.lit(0.02)).alias(
            "p50_within_2pct"
        ),
    )


@query(
    "ntile_customers_by_balance",
    oracle="""
SELECT c_custkey, c_nationkey,
       ntile(4) OVER (PARTITION BY c_nationkey
                      ORDER BY c_acctbal, c_custkey) AS balance_quartile
FROM customer
""",
)
def ntile_customers_by_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing per nation. Partitioned by nation so the sort is
    per-group, never a single global ordering; c_custkey tiebreak makes the
    bucket assignment deterministic (acctbal has duplicates)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey", "c_nationkey", F.ntile(4).over(w).alias("balance_quartile")
    )


@query(
    "moving_avg_daily_revenue",
    oracle="""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM orders GROUP BY day
)
SELECT day, revenue,
       CAST(ROUND(
           CAST(SUM(CAST(revenue AS DECIMAL(18,6))) OVER w AS DOUBLE)
           / COUNT(*) OVER w, 4) AS DOUBLE) AS revenue_7d_avg
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def moving_avg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row sliding mean over the daily revenue series. The frame sum is an
    exact decimal sum (sliding-window float summation differs between
    engines' segment-tree vs running implementations; decimal is
    order-insensitive). The window is over the tiny post-aggregate daily
    series, not the fact table."""
    orders = load_spread(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        money_sum("o_totalprice").alias("revenue")
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        "revenue",
        F.round(
            F.sum(dec("revenue")).over(w).cast("double") / F.count(F.lit(1)).over(w),
            4,
        ).alias("revenue_7d_avg"),
    )


# ---------------------------------------------------------------------------
# Grouping sets
# ---------------------------------------------------------------------------


@query(
    "grouping_sets_revenue",
    oracle=f"""
SELECT r_name, n_name,
       CAST(2 * grouping(r_name) + grouping(n_name) AS BIGINT) AS gid,
       {money_sum_sql("o_totalprice")} AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
""",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form under cube/rollup): revenue
    by (region, nation), by region, and grand total in one aggregate pass
    with the expand operator."""
    orders = load_spread(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(broadcast_if_small(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    # Two-level: one exact-decimal aggregate at the finest (r, n) grain,
    # then Expand over those ~|r x n| rows instead of every order row.
    # Decimal sums re-aggregate exactly, so the rounded double is
    # identical (same oracle; see rollup_revenue_region_nation).
    base = joined.groupBy("r_name", "n_name").agg(
        F.sum(dec("o_totalprice")).alias("__rev_exact")
    )
    return (
        base.groupingSets(
            [["r_name", "n_name"], ["r_name"], []], "r_name", "n_name"
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.round(F.sum("__rev_exact"), 2).cast("double").alias("revenue"),
        )
        .select("r_name", "n_name", "gid", "revenue")
    )


# ---------------------------------------------------------------------------
# JSON extraction
# ---------------------------------------------------------------------------


@query(
    "events_json_props",
    oracle="""
SELECT CAST(props->>'$.k' AS BIGINT) AS prop_k,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY prop_k
""",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface: extract a JSON property from the raw props
    string and aggregate on it. ``get_json_object`` evaluates JVM-side; at
    scale prefer parsing once with ``from_json`` into a struct column when
    several properties are read."""
    ev = load_spread(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("long").alias("prop_k"), "value"
        )
        .groupBy("prop_k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Two-phase (salted) aggregation — the skew pattern
# ---------------------------------------------------------------------------


@query(
    "skew_twophase_agg_events",
    oracle="""
SELECT user_id, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
""",
)
def skew_twophase_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation: partial-aggregate on (key, salt), then
    merge per key. On a skewed key distribution the first shuffle spreads a
    hot key over ``_N_SALT`` reducers; because count and decimal-sum are
    commutative monoids the merged result is provably identical to the
    direct group-by (which is exactly what the oracle runs)."""
    _N_SALT = 8
    ev = load_spread(spark, sf_dir, "events")
    partial = (
        ev.withColumn("__salt", F.pmod(F.col("event_id"), F.lit(_N_SALT)))
        .groupBy("user_id", "__salt")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(dec("value")).alias("__s"),
        )
    )
    return partial.groupBy("user_id").agg(
        F.sum("__n").alias("n_events"),
        F.round(F.sum("__s"), 2).cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Deterministic hash split (reproducible sampling)
# ---------------------------------------------------------------------------


@query(
    "train_val_test_split_docs",
    oracle="""
SELECT doc_id,
       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
            WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
)
def train_val_test_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test split by content-free key
    hash: the split of a document depends only on its id, so it is stable
    across runs, engines, partitionings, and data growth — the property
    random sampling lacks. Pure narrow map; no shuffle at any scale."""
    from stadvdb_olap_spark.operators.mixture import split_column

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", split_column("doc_id").alias("split"))


# ---------------------------------------------------------------------------
# Moment-based statistics (exact decimal moments -> double formulas)
# ---------------------------------------------------------------------------


@query(
    "stats_quantity_price",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(ROUND(
         sqrt((CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               - CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                 * CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
              / (COUNT(*) - 1)), 6) AS DOUBLE) AS qty_stddev,
       CAST(ROUND(
         (CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
          - CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
            * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
         / (COUNT(*) - 1), 4) AS DOUBLE) AS qty_price_cov
FROM lineitem
GROUP BY l_returnflag
""",
)
def stats_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev and covariance computed from exact decimal moments
    (sum, sum-of-squares, cross-sum) with the final formula in IEEE double.
    Unlike the built-in ``stddev``/``covar_samp`` (float accumulation order
    varies with partitioning), the moment sums are order-insensitive, so
    the result is deterministic and oracle-checkable at any parallelism."""
    li = load_spread(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    sq = F.sum(dec("l_quantity")).cast("double")
    sqq = F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(18,6)")).cast(
        "double"
    )
    sp_ = F.sum(dec("l_extendedprice")).cast("double")
    sqp = F.sum(
        (F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(27,6)")
    ).cast("double")
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.round(F.sqrt((sqq - sq * sq / n) / (n - 1)), 6).alias("qty_stddev"),
        F.round((sqp - sq * sp_ / n) / (n - 1), 4).alias("qty_price_cov"),
    )


# ---------------------------------------------------------------------------
# Exact + approx distinct
# ---------------------------------------------------------------------------


@query(
    "distinct_parts_per_flag",
    oracle="""
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
)
def distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per group (expand + two-phase aggregate)."""
    li = load_spread(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "approx_distinct_parts_per_flag",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts_exact,
       TRUE AS within_10pct
FROM lineitem
GROUP BY l_returnflag
""",
)
def approx_distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count with a built-in error bound: the HLL
    estimate is implementation-specific, so the hash-checked output is the
    exact count plus the claim |approx-exact|/exact <= 10% (rsd=0.02, so
    the bound is ~5 sigma) as a boolean the oracle asserts per group.
    Mergeable one-pass sketches are the scale path when the exact expand
    is too expensive; at 100 TB only the sketch half runs."""
    li = load_spread(spark, sf_dir, "lineitem")
    n_exact = F.count_distinct("l_partkey")
    n_approx = F.approx_count_distinct("l_partkey", rsd=0.02)
    return li.groupBy("l_returnflag").agg(
        n_exact.alias("n_parts_exact"),
        (
            F.abs(n_approx.cast("double") - n_exact.cast("double"))
            / n_exact.cast("double")
            <= F.lit(0.10)
        ).alias("within_10pct"),
    )


# ---------------------------------------------------------------------------
# SCD type-2 history
# ---------------------------------------------------------------------------


@query(
    "scd2_customer_priority",
    oracle="""
WITH ordered AS (
    SELECT o_custkey AS cust_id, o_orderpriority AS priority,
           o_orderdate AS eff_ts, o_orderkey,
           row_number() OVER w AS rn,
           lag(o_orderpriority) OVER w AS prev_p
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), points AS (
    SELECT * FROM ordered WHERE rn = 1 OR priority IS DISTINCT FROM prev_p
)
SELECT cust_id, priority,
       CAST(effective_from AS DATE) AS effective_from,
       CAST(effective_to AS DATE)   AS effective_to,
       version, is_current
FROM (
    SELECT cust_id, priority, eff_ts AS effective_from,
           lead(eff_ts) OVER w2 AS effective_to,
           CAST(row_number() OVER w2 AS INTEGER) AS version,
           (lead(eff_ts) OVER w2 IS NULL) AS is_current
    FROM points
    WINDOW w2 AS (PARTITION BY cust_id ORDER BY eff_ts, o_orderkey)
)
""",
)
def scd2_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 versioned dimension (the uplift over the reference's
    type-1 upserts, user_ETL.py:105-114): each customer's order-priority
    history as effective-dated versions, built from the orders change feed
    with one shuffle (operators.dimension.scd2_history)."""
    from stadvdb_olap_spark.operators.dimension import scd2_history

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust_id"),
        F.col("o_orderpriority").alias("priority"),
        "o_orderdate",
        "o_orderkey",
    )
    hist = scd2_history(
        orders, keys=["cust_id"], attrs=["priority"],
        ts_col="o_orderdate", tiebreak=["o_orderkey"],
    )
    return hist.select(
        "cust_id", "priority",
        F.to_date("effective_from").alias("effective_from"),
        F.to_date("effective_to").alias("effective_to"),
        "version", "is_current",
    )


# ---------------------------------------------------------------------------
# Window-function showcase + scalar subquery
# ---------------------------------------------------------------------------


@query(
    "window_rank_showcase",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(rank() OVER w AS INTEGER)        AS rnk,
       CAST(dense_rank() OVER w AS INTEGER)  AS drnk,
       CAST(ROUND(percent_rank() OVER w, 6) AS DOUBLE) AS pct_rank,
       CAST(ROUND(cume_dist() OVER w, 6) AS DOUBLE)    AS cdist,
       lag(o_totalprice) OVER w              AS prev_price,
       first_value(o_orderkey) OVER w        AS cheapest_key,
       nth_value(o_orderkey, 2) OVER w       AS second_cheapest_key
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""",
)
def window_rank_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking/navigation window family in one pass: rank, dense_rank,
    percent_rank, cume_dist, lag, first_value, nth_value all share ONE
    window spec, so Catalyst evaluates them in a single sort+window stage
    — one shuffle on the partition key. The (o_totalprice, o_orderkey)
    ordering is a total order, making every output deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_cheapest_key"),
    )


@query(
    "orders_above_global_avg",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (
    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
    FROM orders
)
""",
)
def orders_above_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery pattern: filter against a global aggregate. The
    aggregate collapses to one row and broadcasts — the big side streams
    through a single filter, no self-join shuffle. The threshold is an
    exact decimal mean so the predicate is deterministic at any
    parallelism."""
    orders = load_table(spark, sf_dir, "orders")
    avg_df = orders.agg(
        (F.sum(dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("__avg")
    )
    return (
        orders.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("__avg"))
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Correlated EXISTS / min-per-group / unpivot / explode / array agg
# ---------------------------------------------------------------------------


@query(
    "q4_priority_with_late_lines",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
""",
)
def q4_priority_with_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style correlated EXISTS: orders having at least one line
    shipped after the order date, counted by priority. The correlated
    subquery decorrelates to a LEFT SEMI join with the correlation
    predicate in the join condition — one shuffle, no duplicate
    amplification from multi-line orders."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "min_price_row_per_part",
    oracle="""
SELECT l.l_partkey, l.l_orderkey, l.l_extendedprice
FROM lineitem l
JOIN (
    SELECT l_partkey, MIN(l_extendedprice) AS min_price
    FROM lineitem GROUP BY l_partkey
) m ON l.l_partkey = m.l_partkey AND l.l_extendedprice = m.min_price
""",
)
def min_price_row_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-per-group join-back (the decorrelated 'row holding the group
    minimum' pattern, TPC-H Q2's core): aggregate once, rejoin on
    (group, min). Keeps ALL tying rows — set semantics identical to the
    correlated-subquery form. The aggregate side is small post-groupBy, so
    AQE broadcasts it back against the fact scan."""
    li = load_spread(spark, sf_dir, "lineitem")
    mins = (
        li.groupBy("l_partkey")
        .agg(F.min("l_extendedprice").alias("__min_price"))
        .withColumnRenamed("l_partkey", "__pk")
    )
    return (
        li.join(
            broadcast_if_small(mins),
            (F.col("l_partkey") == F.col("__pk"))
            & (F.col("l_extendedprice") == F.col("__min_price")),
        )
        .select("l_partkey", "l_orderkey", "l_extendedprice")
    )


@query(
    "unpivot_part_measures",
    oracle="""
SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS value FROM part
""",
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide part measures to long (key, measure, value)
    rows — the inverse of pivot, a pure narrow map (Spark's Expand, no
    shuffle)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "measure", "value")


@query(
    "word_frequencies",
    oracle=f"""
SELECT word, COUNT(*) AS n
FROM (SELECT unnest({{tokens}}) AS word FROM documents)
GROUP BY word
ORDER BY n DESC, word
LIMIT 100
""".replace("{tokens}", "regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')"),
)
def word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word frequencies (top 100): explode the token arrays and
    hash-aggregate. The canonical training-data vocabulary scan — explode
    is a narrow flatMap, the only shuffle is the aggregate on word, and
    the top-k is TakeOrdered (no global sort)."""
    from stadvdb_olap_spark.functions.text import tokens

    docs = load_spread(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(100)
    )


@query(
    "order_keys_concat_per_customer",
    oracle="""
SELECT o_custkey,
       array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS order_keys
FROM orders
GROUP BY o_custkey
""",
)
def order_keys_concat_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic array aggregation: collect each customer's order keys,
    sort in-engine (collect_list order is nondeterministic under
    parallelism — array_sort fixes it), and serialize. Nested-type surface
    with an order-insensitive, engine-portable result."""
    orders = load_spread(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.array_join(
            F.array_sort(F.collect_list("o_orderkey")), ","
        ).alias("order_keys")
    )


# ---------------------------------------------------------------------------
# Table profiling
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderpriority", False),
]


@query(
    "profile_orders",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS "column", COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       {f'CAST(MIN({c}) AS DOUBLE)' if is_num else 'CAST(NULL AS DOUBLE)'} AS min_num,
       {f'CAST(MAX({c}) AS DOUBLE)' if is_num else 'CAST(NULL AS DOUBLE)'} AS max_num
FROM orders"""
        for c, is_num in _PROFILE_COLS
    ),
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of the orders table: per-column null counts,
    exact distinct counts, numeric ranges — one aggregate pass
    (operators.profile.profile_columns), |columns| output rows."""
    from stadvdb_olap_spark.operators.profile import profile_columns

    orders = load_spread(spark, sf_dir, "orders")
    return profile_columns(orders, [c for c, _ in _PROFILE_COLS])


# ---------------------------------------------------------------------------
# Calendar gap filling (spine + zero-fill + LOCF)
# ---------------------------------------------------------------------------


@query(
    "gapfill_daily_revenue",
    oracle="""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS revenue
    FROM orders GROUP BY day
), b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
spine AS (
    SELECT CAST(unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP,
                                       INTERVAL 1 DAY)) AS DATE) AS day
    FROM b
)
SELECT s.day,
       coalesce(d.revenue, 0.0) AS revenue_zero,
       last_value(d.revenue IGNORE NULLS) OVER (
           ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS revenue_locf
FROM spine s LEFT JOIN daily d USING (day)
""",
)
def gapfill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: generate the full calendar spine between
    the observed bounds (sequence + explode — no driver loop), left-join
    the daily aggregate, and fill misses two ways: zero-fill and
    last-observation-carried-forward (ignore-nulls window). The spine is
    post-aggregate sized (one row per day), so the window is tiny
    regardless of fact-table scale."""
    orders = load_spread(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        money_sum("o_totalprice").alias("revenue")
    )
    spine = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    ).select(F.explode(F.sequence("lo", "hi")).alias("day"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce("revenue", F.lit(0.0)).alias("revenue_zero"),
        F.last("revenue", ignorenulls=True).over(w).alias("revenue_locf"),
    )


# ---------------------------------------------------------------------------
# Cohort retention + per-group normalization
# ---------------------------------------------------------------------------


@query(
    "cohort_weekly_retention",
    oracle="""
WITH firsts AS (
    SELECT user_id, min(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
    FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT e.user_id, f.cohort_week,
           datediff('week', f.cohort_week,
                    CAST(date_trunc('week', e.ts) AS DATE)) AS week_offset
    FROM events e JOIN firsts f USING (user_id)
)
SELECT cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
       count(*) AS n_users
FROM activity GROUP BY cohort_week, week_offset
""",
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    per week-offset of later activity. Two aggregates and one broadcast
    join of the (small) per-user firsts — the events table is scanned
    twice but shuffled only on user_id and the final group keys. Week
    arithmetic stays exact: both engines truncate weeks to Monday, so the
    day difference is always a multiple of 7."""
    ev = load_spread(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    firsts = (
        ev.select("user_id", week.alias("w"))
        .groupBy("user_id")
        .agg(F.min("w").alias("cohort_week"))
    )
    activity = (
        ev.select("user_id", week.alias("w"))
        .join(broadcast_if_small(firsts), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(F.col("w"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@query(
    "zscore_quantity_per_flag",
    oracle="""
WITH s AS (
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sq,
           CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               AS sqq
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_orderkey, l_linenumber, l_returnflag,
       CAST(ROUND((l_quantity - sq / n)
                  / sqrt((sqq - sq * sq / n) / (n - 1)), 6) AS DOUBLE) AS qty_z
FROM lineitem JOIN s USING (l_returnflag)
""",
)
def zscore_quantity_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization (the feature-scaling step of a
    training-data pipeline): group moments from exact decimal sums, then a
    broadcast join back and a pure-scalar normalization per row — two
    passes, one tiny broadcast, deterministic at any parallelism."""
    li = load_spread(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    stats = li.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("sq"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(18,6)"))
        .cast("double")
        .alias("sqq"),
    )
    z = (F.col("l_quantity") - F.col("sq") / F.col("n")) / F.sqrt(
        (F.col("sqq") - F.col("sq") * F.col("sq") / F.col("n")) / (F.col("n") - 1)
    )
    return (
        li.join(F.broadcast(stats), "l_returnflag")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.round(z, 6).alias("qty_z"),
        )
    )


# ---------------------------------------------------------------------------
# Recode through a broadcast mapping table (T4 at vocabulary scale)
# ---------------------------------------------------------------------------

_SEGMENT_MAP = [("building", "BLDG"), ("automobile", "AUTO")]


@query(
    "recode_segments_via_join",
    oracle=f"""
SELECT c_custkey, coalesce(m.to_value, lower(c_mktsegment)) AS segment_code
FROM customer
LEFT JOIN (VALUES {", ".join(f"('{k}', '{v}')" for k, v in _SEGMENT_MAP)})
     AS m(from_value, to_value)
  ON lower(c_mktsegment) = m.from_value
""",
)
def recode_segments_via_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 recode as a broadcast mapping-table join (SURVEY §4's 100 TB
    rewrite of literal when-chains): semantics identical to the expression
    recode, but the vocabulary is data — updating it never recompiles the
    query, and a million-entry map is still one broadcast hash table."""
    from stadvdb_olap_spark.functions.cleaning import recode_via_join

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.lower("c_mktsegment").alias("segment_code")
    )
    mapping = spark.createDataFrame(_SEGMENT_MAP, ["from_value", "to_value"])
    return recode_via_join(cust, "segment_code", mapping)


# ---------------------------------------------------------------------------
# Stream-stream interval join, batch twin (streaming/join.py)
# ---------------------------------------------------------------------------


@query(
    "click_purchase_attribution",
    oracle="""
WITH c AS (
  SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT event_id AS purchase_id, user_id AS p_user_id,
         CAST(ts AS TIMESTAMP) AS purchase_ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT click_id, purchase_id, user_id, click_ts, purchase_ts, purchase_value
FROM c JOIN p ON user_id = p_user_id
              AND purchase_ts >= click_ts
              AND purchase_ts <= click_ts + INTERVAL 1 DAY
""",
)
def click_purchase_attribution_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: every purchase within a day of the same user's
    click — the batch twin of the stream-stream watermarked join in
    streaming/join.py (same plan body; agreement is pinned by
    tests/test_streaming.py). One shuffle on user_id for both roles; the
    time bound is a residual condition, not a second shuffle. The oracle
    floors TIMESTAMP_NS to microseconds exactly as the Spark reader does."""
    from stadvdb_olap_spark.streaming.join import click_purchase_attribution

    ev = load_table(spark, sf_dir, "events")
    return click_purchase_attribution(ev, within="1 day")


@query(
    "interval_overlap_sessions_bursts",
    oracle="""
WITH sflag AS (
    SELECT user_id, event_id, ts,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                     OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
    SELECT user_id,
           CAST(SUM(new_s) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_seq,
           epoch_us(ts) AS us
    FROM sflag
), sint AS (
    SELECT user_id, session_seq,
           MIN(us) AS a_start, MAX(us) AS a_end
    FROM sess GROUP BY user_id, session_seq
), bflag AS (
    SELECT event_type, event_id, ts,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                     OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 600000000
                THEN 1 ELSE 0 END AS new_b
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), burst AS (
    SELECT event_type,
           CAST(SUM(new_b) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS burst_seq,
           epoch_us(ts) AS us
    FROM bflag
), bint AS (
    SELECT event_type, burst_seq,
           MIN(us) AS b_start, MAX(us) AS b_end
    FROM burst GROUP BY event_type, burst_seq
)
SELECT user_id, session_seq, event_type, burst_seq,
       LEAST(a_end, b_end) - GREATEST(a_start, b_start) AS overlap_us
FROM sint JOIN bint ON a_start <= b_end AND b_start <= a_end
""",
)
def interval_overlap_sessions_bursts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temporal overlap join: which per-user sessions (30-minute gap
    rule) overlap which per-type activity bursts (10-minute gap rule),
    with the exact overlap length in microseconds.

    Spark has no interval-overlap join; the scalable shape
    (operators/joins.py:interval_overlap_join) explodes each interval
    into the hour buckets it spans and EQUI-joins on the bucket id, so
    the shuffle key is time locality and cost tracks genuine temporal
    collisions — never |sessions| x |bursts|. The oracle runs the naive
    theta join, certifying the bucketed plan loses no pair. All bounds
    are integer epoch microseconds — exact on both engines.
    """
    from stadvdb_olap_spark.operators.joins import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))

    def intervals(key: str, gap_us: int, seq_name: str, s: str, e: str):
        w = Window.partitionBy(key).orderBy("ts", "event_id")
        run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        gap = us - F.lag(us).over(w)
        new_flag = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
        return (
            ev.withColumn("__new", new_flag)
            .withColumn(seq_name, F.sum("__new").over(run).cast("long"))
            .groupBy(key, seq_name)
            .agg(F.min(us).alias(s), F.max(us).alias(e))
        )

    sessions = intervals("user_id", 1_800_000_000, "session_seq", "a_start", "a_end")
    bursts = intervals("event_type", 600_000_000, "burst_seq", "b_start", "b_end")
    return interval_overlap_join(
        sessions, bursts, "a_start", "a_end", "b_start", "b_end"
    ).select(
        "user_id",
        "session_seq",
        "event_type",
        "burst_seq",
        (
            F.least(F.col("a_end"), F.col("b_end"))
            - F.greatest(F.col("a_start"), F.col("b_start"))
        ).alias("overlap_us"),
    )


_DEBOUNCE_US = 7_200_000_000  # 2 h refractory window (notification-throttle grain; the fixture's per-user event rate is ~1/39min, so this suppresses ~17% — a 5 s window would never fire)


@query(
    "debounce_events_per_user",
    oracle=f"""
WITH t AS (
    SELECT user_id, list_sort(list(epoch_us(ts))) AS us
    FROM events GROUP BY user_id
),
folded AS (
    SELECT user_id, len(us) AS n_events,
           list_reduce(
               list_prepend([CAST(-1000000000000000000 AS BIGINT),
                             CAST(0 AS BIGINT)],
                            list_transform(us, x -> [x])),
               (acc, e) -> CASE WHEN e[1] - acc[1] >= {_DEBOUNCE_US}
                                THEN [e[1], acc[2] + 1]
                                ELSE [acc[1], acc[2]] END
           ) AS st
    FROM t
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(st[2] AS BIGINT) AS n_kept,
       CAST(st[2] AS DOUBLE) / n_events AS kept_frac
FROM folded
""",
)
def debounce_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE DEBOUNCE (refractory-window event suppression): per user,
    keep an event only if >= 2 h have passed since the last KEPT event
    — the dedupe behind double-click/retry storms. Unlike the common
    lag()-based approximation (which compares to the previous RAW
    event and over-drops bursts longer than the window), the kept set
    depends on itself, so this is a genuine sequential recurrence —
    expressed as a per-user sorted-array FOLD over exact integer
    microsecond timestamps (state = [last_kept_us, n_kept]); both
    engines fold the identical order, so it is hash-exact. The batch
    twin of the stateful streaming sessionizer's arbitrary-state shape
    (applyInPandasWithState) — with per-user event counts bounded, the
    fold is a row-local array op after ONE user-keyed exchange; an
    unbounded-history user would stream through the stateful variant
    instead."""
    ev = load_spread(spark, sf_dir, "events")
    us_arr = F.sort_array(F.collect_list(F.unix_micros("ts")))
    t = ev.groupBy("user_id").agg(us_arr.alias("us"))
    init = F.struct(
        F.lit(-1_000_000_000_000_000_000).cast("long").alias("last"),
        F.lit(0).cast("long").alias("kept"),
    )
    st = F.aggregate(
        F.col("us"),
        init,
        lambda acc, x: F.when(
            x - acc["last"] >= F.lit(_DEBOUNCE_US),
            F.struct(x.alias("last"), (acc["kept"] + 1).alias("kept")),
        ).otherwise(acc),
    )
    return t.select(
        "user_id",
        F.size("us").cast("long").alias("n_events"),
        st["kept"].alias("n_kept"),
        (st["kept"].cast("double") / F.size("us")).alias("kept_frac"),
    )


_GEO_R = 64  # radius in grid units; cell size = radius (3x3 coverage)


@query(
    "spatial_radius_join_customers",
    oracle=f"""
WITH pts AS (
  SELECT c_custkey AS id,
         CAST((strpos('0123456789abcdef', md5(CAST(c_custkey AS VARCHAR))[1:1]) - 1) * 256
            + (strpos('0123456789abcdef', md5(CAST(c_custkey AS VARCHAR))[2:2]) - 1) * 16
            + (strpos('0123456789abcdef', md5(CAST(c_custkey AS VARCHAR))[3:3]) - 1)
           AS BIGINT) AS x,
         CAST((strpos('0123456789abcdef', md5(CAST(c_custkey AS VARCHAR))[4:4]) - 1) * 256
            + (strpos('0123456789abcdef', md5(CAST(c_custkey AS VARCHAR))[5:5]) - 1) * 16
            + (strpos('0123456789abcdef', md5(CAST(c_custkey AS VARCHAR))[6:6]) - 1)
           AS BIGINT) AS y
  FROM customer WHERE c_custkey % 5 = 0
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT)
         AS dist_sq
FROM pts a JOIN pts b
  ON a.id < b.id
 AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       <= {_GEO_R * _GEO_R}
""",
)
def spatial_radius_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPATIAL RADIUS SELF-JOIN (2D range join): every customer pair
    within Euclidean distance 64 (``_GEO_R``) of each other, coordinates
    content-addressed from the customer key (first six md5 hex digits
    -> a 4096x4096 integer grid — TPC-H carries no geometry, so the
    fixture is synthesized the same way the split/sample devices do).
    The engine path is ``operators/spatial.py:grid_radius_join``:
    r-sized grid cells, ONE hash shuffle on the cell id with a 9x
    explode of the probe side only, exact BIGINT squared-distance
    verify — all-pairs comparison never happens. The oracle is the
    NAIVE theta self-join, so the grid plan's zero-lost-pair claim is
    externally certified, exactly like ``interval_overlap_join``'s
    oracle. Subset via a deterministic key predicate (c_custkey % 5 =
    0) that scales WITH the fixture instead of capping it."""
    from stadvdb_olap_spark.operators.spatial import grid_radius_join

    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 5 == 0
    )
    h = F.md5(F.col("c_custkey").cast("string"))
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        F.conv(F.substring(h, 1, 3), 16, 10).cast("long").alias("x"),
        F.conv(F.substring(h, 4, 3), 16, 10).cast("long").alias("y"),
    )
    return grid_radius_join(pts, _GEO_R)
