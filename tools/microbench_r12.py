"""Round-12 micro-benchmarks: isolate WHERE the expensive headline queries
spend their wall seconds (guide §1: measure first).

Variants per hypothesis, each timed min-of-N with the noop sink on sf0.1:
  q1_*      — decimal-aggregate cost vs scan/shuffle cost vs spread shape
  q5_*      — join strategy (SMJ vs broadcast orders) and agg placement
  spread_*  — round-robin (sort-before-repartition) vs hash repartition

Diagnostic only; nothing here feeds results into catalog queries.
Usage: python tools/microbench_r12.py [group ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stadvdb_olap_spark.plans.compat import dec, mean_round, money_sum  # noqa: E402
from stadvdb_olap_spark.session import get_session  # noqa: E402
from stadvdb_olap_spark.sources.parquet import load_table, spread  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 3


def timed(label, df_builder, spark):
    best = None
    spark.sparkContext.setJobDescription(f"micro:{label}")
    for _ in range(RUNS):
        t0 = time.time()
        df_builder().write.format("noop").mode("overwrite").save()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    spark.sparkContext.setJobDescription(None)
    print(f"{label:45s} {best:7.3f} s")
    return best


def q1_aggs(li):
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


def q1_long_aggs(li):
    """Decimal sums replaced by long micro-unit sums (diagnostic: how much
    of q1 is the decimal aggregation path?)."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))

    def micro(c):
        cc = F.col(c) if isinstance(c, str) else c
        return (dec(cc) * F.lit(1_000_000)).cast("long")

    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-11-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(micro("l_quantity")).alias("sum_qty"),
            F.sum(micro("l_extendedprice")).alias("sum_base_price"),
            F.sum(micro(disc_price)).alias("sum_disc_price"),
            F.sum(micro(charge)).alias("sum_charge"),
            F.sum(micro("l_discount")).alias("avg_disc_n"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q1_double_aggs(li):
    """Plain double sums (lower bound: agg with no decimal at all)."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-11-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity"),
            F.sum("l_extendedprice"),
            F.sum(disc_price),
            F.sum(charge),
            F.sum("l_discount"),
            F.count(F.lit(1)),
        )
    )


def main() -> None:
    spark = get_session(app_name="microbench-r12")
    li = lambda: load_table(spark, SF, "lineitem")  # noqa: E731
    orders = lambda: load_table(spark, SF, "orders")  # noqa: E731

    # warm
    q1_aggs(spread(load_table(spark, "/root/testdata/sf0.001", "lineitem"))).write.format(
        "noop"
    ).mode("overwrite").save()

    groups = set(sys.argv[1:]) or {"scan", "q1", "q5", "spread"}

    if "scan" in groups:
        timed("scan_only_7cols", lambda: li().select(
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate"), spark)
        timed("scan_spread_count7", lambda: spread(li().select(
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate")), spark)

    if "q1" in groups:
        timed("q1_current(spread+decimal)", lambda: q1_aggs(spread(li())), spark)
        timed("q1_nospread_decimal", lambda: q1_aggs(li()), spark)
        timed("q1_spread_longsum", lambda: q1_long_aggs(spread(li())), spark)
        timed("q1_nospread_longsum", lambda: q1_long_aggs(li()), spark)
        timed("q1_spread_doublesum", lambda: q1_double_aggs(spread(li())), spark)
        timed("q1_hashspread_decimal",
              lambda: q1_aggs(li().repartition(
                  spark.sparkContext.defaultParallelism, "l_orderkey", "l_linenumber")),
              spark)
        spark.conf.set("spark.sql.execution.sortBeforeRepartition", "false")
        timed("q1_spread_nosort_decimal", lambda: q1_aggs(spread(li())), spark)
        spark.conf.set("spark.sql.execution.sortBeforeRepartition", "true")

    if "q5" in groups:
        def q5(join_mode):
            l, o = li(), orders()
            cust = load_table(spark, SF, "customer")
            nation = load_table(spark, SF, "nation")
            region = load_table(spark, SF, "region")
            revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
            if join_mode == "bcast_orders":
                o = F.broadcast(o)
            elif join_mode == "bcast_orders_spread":
                l = spread(l)
                o = F.broadcast(o)
            j = (
                l.join(o, l.l_orderkey == o.o_orderkey)
                .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
                .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
                .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
                .groupBy("r_name", "n_name")
                .agg(money_sum(revenue).alias("revenue"))
            )
            return j

        timed("q5_current(smj_li_orders)", lambda: q5("smj"), spark)
        timed("q5_bcast_orders", lambda: q5("bcast_orders"), spark)
        timed("q5_bcast_orders_spread", lambda: q5("bcast_orders_spread"), spark)
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
        timed("q5_prefer_shj", lambda: q5("smj"), spark)
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")

    if "spread" in groups:
        base = lambda: li().select("l_orderkey", "l_linenumber", "l_quantity")  # noqa: E731
        timed("spread_rr_sort(count)", lambda: spread(base()), spark)
        spark.conf.set("spark.sql.execution.sortBeforeRepartition", "false")
        timed("spread_rr_nosort(count)", lambda: spread(base()), spark)
        spark.conf.set("spark.sql.execution.sortBeforeRepartition", "true")
        timed("spread_hash(count)", lambda: base().repartition(
            spark.sparkContext.defaultParallelism, "l_orderkey", "l_linenumber"), spark)


if __name__ == "__main__":
    main()
