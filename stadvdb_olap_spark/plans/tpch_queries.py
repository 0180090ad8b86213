"""Classic decision-support query shapes (TPC-H Q2/Q6/Q8/Q10-Q22 adapted).

The reference's star schema serves analytical rollups (SURVEY.md §0,
``/root/reference/README.md:4-7``); analytics_queries.py covers Q1/Q3/Q4/
Q5/Q7/Q9/Q13 shapes. This module completes the classic TPC-H query-shape
sweep, adapted to the fixture schema (no partsupp table, no commit/receipt
dates, no shipmode/container columns — each adaptation keeps the *plan
shape* that makes the original query interesting: correlated scalar
subqueries, disjunctive pushdown, exists/not-exists self-joins, having on
aggregates, conditional-aggregate ratios).

Float determinism follows plans/compat.py: exact decimal sums, fixed-scale
rounding, double output. Ratios divide two decimal-exact sums in IEEE
double and round to 4 places.

Scale notes (100 TB stance): every query here keeps the fact scan on the
shuffle-free side where possible — dims broadcast, scalar subqueries
compute as 1-row broadcasts, self-joins shuffle on the join key once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.plans.compat import (
    dec,
    mean_round,
    mean_round_sql,
    money_sum,
    money_sum_sql,
)
from stadvdb_olap_spark.sources.parquet import load_spread, load_table
from stadvdb_olap_spark.operators.joins import broadcast_if_small

_DISC_PRICE = "l_extendedprice * (1 - l_discount)"


def _disc_price() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _dec_zero() -> F.Column:
    return F.lit(0).cast("decimal(18,6)")


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier per part within a region (partsupp-less adaptation)
# ---------------------------------------------------------------------------


@query(
    "q2_min_cost_supplier",
    oracle="""
WITH unit AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA')
), mins AS (
  SELECT l_partkey, MIN(unit_price) AS min_unit_price
  FROM unit GROUP BY l_partkey
)
SELECT DISTINCT p_partkey, p_name, s_name, n_name, min_unit_price
FROM unit
JOIN mins ON unit.l_partkey = mins.l_partkey
         AND unit.unit_price = mins.min_unit_price
JOIN part     ON p_partkey = unit.l_partkey
JOIN supplier ON s_suppkey = unit.l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_type = 'SMALL'
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape without partsupp: for every SMALL part, the
    region-ASIA supplier(s) offering the minimum observed unit price.
    The per-part MIN is a correlated scalar subquery in the original;
    here it is an aggregate re-joined on (part, price==min) — one
    fact shuffle on l_partkey reused by both the agg and the re-join,
    dims broadcast. Unit price is a per-row IEEE double (deterministic);
    MIN/equality on doubles is order-insensitive."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    asia_supp = (
        supp.join(broadcast_if_small(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
              nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    unit = (
        load_table(spark, sf_dir, "lineitem")
        .join(broadcast_if_small(asia_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_partkey", "l_suppkey", "s_name", "n_name",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
    )
    mins = unit.groupBy("l_partkey").agg(F.min("unit_price").alias("min_unit_price"))
    return (
        unit.join(mins, ["l_partkey"])
        .filter(F.col("unit_price") == F.col("min_unit_price"))
        .join(broadcast_if_small(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_name", "s_name", "n_name", "min_unit_price")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure scan-filter-aggregate
# ---------------------------------------------------------------------------


@query(
    "q6_forecast_revenue",
    oracle=f"""
SELECT {money_sum_sql('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the canonical predicate-pushdown probe — every filter is
    a scan-level parquet pushdown (range on shipdate/discount/quantity),
    then a single global decimal sum. No shuffle beyond the final 1-row
    reduce; at 100 TB this is min/max row-group skipping territory."""
    li = load_spread(spark, sf_dir, "lineitem", "l_extendedprice")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — national market share within a consuming region
# ---------------------------------------------------------------------------


@query(
    "q8_market_share",
    oracle=f"""
SELECT year(o_orderdate) AS o_year,
       CAST(ROUND(
         COALESCE(CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                    THEN CAST({_DISC_PRICE} AS DECIMAL(18,6)) END) AS DOUBLE), 0)
         / CAST(SUM(CAST({_DISC_PRICE} AS DECIMAL(18,6))) AS DOUBLE),
       4) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3 suppliers' share of all revenue consumed
    in region ASIA, per order year. A conditional-aggregate ratio: both
    numerator and denominator are exact decimal sums over the same joined
    fact rows, divided in IEEE double. All five dims broadcast; the only
    shuffle is the final tiny groupBy on year."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = load_table(spark, sf_dir, "supplier")
    cn = nation.alias("cn")
    sn = nation.alias("sn")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast_if_small(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn.n_nationkey"))
        .join(F.broadcast(region), F.col("cn.n_regionkey") == region.r_regionkey)
        .join(broadcast_if_small(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn.n_nationkey"))
    )
    num = F.sum(F.when(F.col("sn.n_name") == "NATION_3", dec(_disc_price())))
    den = F.sum(dec(_disc_price()))
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.coalesce(num.cast("double"), F.lit(0.0)) / den.cast("double"), 4
            ).cast("double").alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item revenue ranking
# ---------------------------------------------------------------------------


@query(
    "q10_returned_revenue",
    oracle=f"""
SELECT c_custkey, c_name,
       {money_sum_sql(_DISC_PRICE)} AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in a
    half-year window. Fact-side filters (returnflag, orderdate) prune
    before the join; customer/nation broadcast; TakeOrderedAndProject
    gives the limit without a global sort. Orderkey→custkey tiebreak on
    c_custkey makes the top-20 deterministic."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast_if_small(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money_sum(_disc_price()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q11 — important parts (value above a fraction of the global total)
# ---------------------------------------------------------------------------


@query(
    "q11_important_parts",
    oracle="""
WITH pv AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS val
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(ROUND(val, 2) AS DOUBLE) AS part_value
FROM pv
WHERE CAST(val AS DOUBLE) >
      (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) * 1.5
              / COUNT(DISTINCT l_partkey)
       FROM lineitem)
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape without partsupp: parts whose total lineitem value
    exceeds 1.5x the average per-part value (a scale-invariant stand-in
    for the original's fixed fraction, which degenerates as part count
    grows). The global threshold is a 1-row aggregate broadcast into the
    per-part HAVING filter (Spark plans the cross join as
    BroadcastNestedLoopJoin over one row); the per-part agg is the only
    real shuffle. Both comparison sides are exact decimal sums cast to
    double; the distinct-part count is exact."""
    # spread on the group key: the widening exchange then SATISFIES the
    # per-part aggregate's clustering, so no second exchange is planned
    li = load_spread(spark, sf_dir, "lineitem", "l_partkey")
    pv = li.groupBy("l_partkey").agg(F.sum(dec("l_extendedprice")).alias("val"))
    total = li.agg(
        (
            F.sum(dec("l_extendedprice")).cast("double") * F.lit(1.5)
            / F.countDistinct("l_partkey")
        ).alias("threshold")
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("val").cast("double") > F.col("threshold"))
        .select("l_partkey", F.round("val", 2).cast("double").alias("part_value"))
    )


# ---------------------------------------------------------------------------
# Q12 — late-shipping lines by priority class (conditional counts)
# ---------------------------------------------------------------------------


@query(
    "q12_late_lines_by_class",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
GROUP BY l_linestatus
""",
)
def q12_late_lines_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape without shipmode/commitdate: lines shipped more
    than 60 days after their order date, bucketed into urgent-vs-not
    conditional counts per linestatus. Integer conditional aggregation —
    no float conventions needed; the ship-delay predicate is evaluated
    post-join (it references both tables) but the join itself shuffles
    on orderkey only once."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 60
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q14 — promotion revenue share
# ---------------------------------------------------------------------------


@query(
    "q14_promo_revenue",
    oracle=f"""
SELECT CAST(ROUND(
         100.0 * COALESCE(CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST({_DISC_PRICE} AS DECIMAL(18,6)) END) AS DOUBLE), 0)
         / CAST(SUM(CAST({_DISC_PRICE} AS DECIMAL(18,6))) AS DOUBLE),
       4) AS DOUBLE) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-03-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of a two-month revenue window attributable
    to PROMO parts. Part broadcasts into the filtered fact scan; the
    answer is one row — numerator and denominator are decimal-exact sums
    divided in double, scaled by 100 and rounded to 4 places."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-03-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    num = F.sum(F.when(F.col("p_type") == "PROMO", dec(_disc_price())))
    den = F.sum(dec(_disc_price()))
    return (
        li.join(broadcast_if_small(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0) * F.coalesce(num.cast("double"), F.lit(0.0))
                / den.cast("double"),
                4,
            ).cast("double").alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier by quarterly revenue (view + max scalar subquery)
# ---------------------------------------------------------------------------


@query(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST({_DISC_PRICE} AS DECIMAL(18,6))) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(ROUND(total, 2) AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total = (SELECT MAX(total) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum revenue in 1996Q1. The
    revenue 'view' is computed once and reused for both the max scalar
    and the equality filter (Spark caches nothing here, but the agg is
    tiny — one row per supplier); the MAX comparison happens on the
    exact decimal, so ties and equality are engine-independent."""
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(dec(_disc_price())).alias("total"))
    )
    best = rev.agg(F.max("total").alias("best_total"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total") == F.col("best_total"))
        .join(broadcast_if_small(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            F.round("total", 2).cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 — supplier variety per part class (NOT IN + count distinct)
# ---------------------------------------------------------------------------


@query(
    "q16_supplier_part_variety",
    oracle="""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    class, excluding a supplier denylist (NOT IN → broadcast anti-join;
    the original excludes complaint suppliers, here negative-balance
    ones). The observed part-supplier pairs stand in for partsupp —
    distinct-before-join keeps the shuffle narrow (2 bigint columns)."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey").distinct()
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(broadcast_if_small(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(broadcast_if_small(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg subquery)
# ---------------------------------------------------------------------------


@query(
    "q17_small_qty_avg_yearly",
    oracle=f"""
WITH pa AS (
  SELECT l_partkey AS pa_partkey,
         {mean_round_sql('l_quantity')} AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(ROUND(
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0,
       2) AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa   ON pa_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < 0.2 * avg_qty
""",
)
def q17_small_qty_avg_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue that would be lost by refusing small-quantity
    orders — the correlated `avg(l_quantity) per part` subquery becomes
    a per-part aggregate re-joined to the fact (the classic decorrelation
    Catalyst itself performs for scalar subqueries). The per-part avg
    uses the deterministic decimal-mean convention so the `< 0.2*avg`
    threshold is bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        mean_round("l_quantity").alias("avg_qty")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    return (
        li.join(broadcast_if_small(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(pa, F.col("pa_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(dec("l_extendedprice")).cast("double") / 7.0, 2)
            .cast("double").alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING on an aggregate, IN-subquery)
# ---------------------------------------------------------------------------


@query(
    "q18_large_volume_customers",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250
)
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       o_totalprice,
       {money_sum_sql('l_quantity')} AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_custkey, c_name, o_orderkey, order_date, o_totalprice
""",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 250, with their
    customers. The HAVING subquery is a semi-join from the fact onto its
    own aggregate — both shuffle on l_orderkey, so AQE coalesces them
    into one exchange lineage. The threshold compares the exact decimal
    sum (no float drift in membership)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty_total"))
        .filter(F.col("qty_total") > F.lit(250).cast("decimal(18,6)"))
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        li.join(big, li.l_orderkey == big.big_orderkey, "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast_if_small(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_custkey", "c_name", "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"), "o_totalprice",
        )
        .agg(money_sum("l_quantity").alias("sum_qty"))
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive bracket predicates (broadcast join + OR-of-ANDs)
# ---------------------------------------------------------------------------


@query(
    "q19_disjunctive_brackets",
    oracle=f"""
SELECT {money_sum_sql(_DISC_PRICE)} AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
       AND l_quantity >= 1 AND l_quantity <= 15)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
       AND l_quantity >= 10 AND l_quantity <= 25)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 40
       AND l_quantity >= 20 AND l_quantity <= 35)
""",
)
def q19_disjunctive_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-AND bracket predicates spanning both join sides.
    The part side broadcasts; Catalyst extracts the common l_quantity
    bounds (1..35) as a fact-scan pushdown and evaluates the residual
    disjunction post-join — the pattern the original query was designed
    to stress."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty, brand, size = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    bracket = (
        ((brand == "Brand#2") & size.between(1, 20) & (qty >= 1) & (qty <= 15))
        | ((brand == "Brand#3") & size.between(1, 30) & (qty >= 10) & (qty <= 25))
        | ((brand == "Brand#4") & size.between(1, 40) & (qty >= 20) & (qty <= 35))
    )
    return (
        li.join(broadcast_if_small(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(bracket)
        .agg(money_sum(_disc_price()).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20 — suppliers with excess supplied quantity (nested IN subqueries)
# ---------------------------------------------------------------------------


@query(
    "q20_excess_quantity_suppliers",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
    WITH sq AS (
      SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%widget%'
      GROUP BY l_suppkey)
    SELECT l_suppkey FROM sq
    WHERE CAST(qty AS DOUBLE) >
          (SELECT CAST(SUM(qty) AS DOUBLE) * 1.1 / COUNT(*) FROM sq))
  AND s_nationkey IN (
    SELECT n_nationkey FROM nation
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE')
""",
)
def q20_excess_quantity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: EUROPE suppliers whose total shipped widget
    quantity exceeds 1.1x the per-supplier average (scale-invariant
    stand-in for the original's fixed `0.5 * sum(qty)` stock threshold).
    Two nested IN subqueries become two semi-joins against the (tiny)
    supplier table; the inner threshold is a 1-row broadcast over the
    per-supplier aggregate. Exact decimal sums on both comparison
    sides."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    widget = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey")
    sq = (
        load_table(spark, sf_dir, "lineitem")
        .join(broadcast_if_small(widget), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
    )
    thresh = sq.agg(
        (F.sum("qty").cast("double") * F.lit(1.1) / F.count(F.lit(1))).alias("avg_qty")
    )
    heavy = (
        sq.crossJoin(F.broadcast(thresh))
        .filter(F.col("qty").cast("double") > F.col("avg_qty"))
        .select("l_suppkey")
    )
    euro_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(euro_nations),
              supp.s_nationkey == euro_nations.n_nationkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


# ---------------------------------------------------------------------------
# Q21 — the supplier that shipped last (EXISTS + NOT EXISTS self-joins)
# ---------------------------------------------------------------------------


@query(
    "q21_last_shipper_wait",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
""",
)
def q21_last_shipper_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape without receipt/commit dates: in finished
    multi-supplier orders, count per supplier the lines that shipped
    strictly after every other supplier's line (the one everyone waited
    for). EXISTS → left-semi self-join, NOT EXISTS → left-anti self-join
    with a non-equi shipdate condition; all three lineitem instances
    shuffle on l_orderkey, so the self-joins co-locate on one exchange
    lineage. Strict `>` keeps ties deterministic (tied last shippers
    all count)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supp = load_table(spark, sf_dir, "supplier")
    l1 = li.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3")
    waited_on = (
        l1.join(orders, F.col("l1.l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
            & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
            "left_anti",
        )
    )
    return (
        waited_on.join(broadcast_if_small(supp), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers (NOT EXISTS + global scalar)
# ---------------------------------------------------------------------------


@query(
    "q22_dormant_customers",
    oracle=f"""
WITH threshold AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
         / COUNT(c_acctbal) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment,
       count(*) AS numcust,
       {money_sum_sql('c_acctbal')} AS totacctbal
FROM customer, threshold
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
GROUP BY c_mktsegment
""",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance and
    no recent orders (the fixture has no phone column and every customer
    has *some* order, so 'dormant since mid-2000' replaces 'never
    ordered'). Global avg balance is a 1-row broadcast; NOT EXISTS is a
    left-anti join against the date-filtered orders — the anti side is
    pre-filtered so the shuffle carries only recent orderkeys."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-06-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    threshold = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum("c_acctbal").alias("totacctbal"),
        )
    )
