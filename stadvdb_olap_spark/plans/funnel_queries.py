"""Event-sequence analytics over ``events``: conversion funnels and
OHLC time-bar resampling.

The product-analytics / time-series surface a warehouse serves on an
event stream (ClickHouse's ``windowFunnel`` / financial bar-resampling
families), expressed as one-pass window + aggregate plans. No
counterpart exists in the reference (its events never leave the fact
table); this extends §2.9's window family.

Both queries are deterministic: every ordering is pinned on
``(ts, event_id)`` so Spark and the DuckDB twin pick identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.plans.compat import money_sum, money_sum_sql
from stadvdb_olap_spark.sources.parquet import load_table


@query(
    "funnel_view_click_purchase",
    oracle="""
WITH staged AS (
    SELECT user_id, event_type, ts,
           MIN(CASE WHEN event_type = 'view' THEN ts END) OVER w AS first_view
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
staged2 AS (
    SELECT user_id, event_type, ts, first_view,
           MIN(CASE WHEN event_type = 'click' AND first_view IS NOT NULL
                    THEN ts END) OVER w AS first_qual_click
    FROM staged
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
per_user AS (
    SELECT user_id,
           MAX(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS viewed,
           MAX(CASE WHEN event_type = 'click'
                     AND first_view IS NOT NULL THEN 1 ELSE 0 END) AS clicked,
           MAX(CASE WHEN event_type = 'purchase'
                     AND first_qual_click IS NOT NULL THEN 1 ELSE 0 END)
               AS purchased
    FROM staged2 GROUP BY user_id
)
SELECT count(*)                  AS n_users,
       CAST(SUM(viewed) AS BIGINT)    AS n_viewed,
       CAST(SUM(clicked) AS BIGINT)   AS n_clicked_after_view,
       CAST(SUM(purchased) AS BIGINT) AS n_purchased_after_click
FROM per_user
""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user counts
    at stage k only if the stage-k event happened at-or-after their first
    qualifying stage-(k-1) event. Two cumulative-min window columns over
    the SAME per-user sort give the qualification timestamps in one
    shuffle; a per-user aggregate + single-row rollup finishes. At scale:
    one exchange on user_id, one on the global aggregate (1 row)."""
    ev = load_table(spark, sf_dir, "events")
    w1 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = ev.withColumn(
        "first_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w1),
    )
    # NOTE the second pass orders by (ts, event_type) — same as the twin —
    # so the cumulative min is insensitive to same-timestamp permutations.
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_type")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged2 = staged.withColumn(
        "first_qual_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & F.col("first_view").isNotNull(),
                F.col("ts"),
            )
        ).over(w2),
    )
    per_user = staged2.groupBy("user_id").agg(
        F.max(
            F.when(F.col("first_view").isNotNull(), 1).otherwise(0)
        ).alias("viewed"),
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & F.col("first_view").isNotNull(),
                1,
            ).otherwise(0)
        ).alias("clicked"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("first_qual_click").isNotNull(),
                1,
            ).otherwise(0)
        ).alias("purchased"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("viewed").cast("long").alias("n_viewed"),
        F.sum("clicked").cast("long").alias("n_clicked_after_view"),
        F.sum("purchased").cast("long").alias("n_purchased_after_click"),
    )


@query(
    "ohlc_hourly_by_type",
    oracle=f"""
WITH ranked AS (
    SELECT event_type, date_trunc('hour', ts) AS bar_ts, value,
           row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                              ORDER BY ts, event_id) AS rn_a,
           row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM events
)
SELECT event_type, bar_ts,
       MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value)                             AS high,
       MIN(value)                             AS low,
       MIN(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*)                               AS n_events,
       {money_sum_sql('value')}               AS volume
FROM ranked
GROUP BY event_type, bar_ts
""",
)
def ohlc_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bar resampling: per (event_type, hour) OHLC candle +
    count/volume — the downsampling step that turns a raw event stream
    into chartable bars. Open/close are picked by pinned
    ``(ts, event_id)`` rank (deterministic under ties, unlike arg_min
    on ts alone); both row_numbers share one hash exchange on the bar
    key, then a single hash aggregate finishes. Bars are independent, so
    the plan parallelizes by (type, hour) at any scale."""
    ev = load_table(spark, sf_dir, "events")
    bar = F.date_trunc("hour", F.col("ts")).alias("bar_ts")
    base = ev.select("event_type", bar, "ts", "event_id", "value")
    wa = Window.partitionBy("event_type", "bar_ts").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bar_ts").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = base.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return ranked.groupBy("event_type", "bar_ts").agg(
        F.min(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        money_sum("value").alias("volume"),
    )


@query(
    "ab_test_purchase_rate",
    oracle="""
WITH assigned AS (
    SELECT user_id,
           user_id % 2 AS variant,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
    FROM events GROUP BY user_id
),
arms AS (
    SELECT variant,
           count(*) AS n_users,
           sum(converted) AS n_converted
    FROM assigned GROUP BY variant
),
wide AS (
    SELECT
      max(CASE WHEN variant = 0 THEN n_users END) AS n0,
      max(CASE WHEN variant = 0 THEN n_converted END) AS c0,
      max(CASE WHEN variant = 1 THEN n_users END) AS n1,
      max(CASE WHEN variant = 1 THEN n_converted END) AS c1
    FROM arms
)
SELECT n0 AS control_users, c0 AS control_conversions,
       n1 AS treatment_users, c1 AS treatment_conversions,
       CAST(c0 AS DOUBLE) / n0 AS control_rate,
       CAST(c1 AS DOUBLE) / n1 AS treatment_rate,
       CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0 AS lift_abs,
       CASE WHEN sqrt( (CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                       * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                       * (1.0 / n0 + 1.0 / n1) ) = 0 THEN NULL
            ELSE (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
                 / sqrt( (CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                         * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                         * (1.0 / n0 + 1.0 / n1) )
       END AS z_score
FROM wide
""",
)
def ab_test_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: per-user conversion (any purchase) under
    a deterministic hash-bucket assignment (user_id parity — the
    stand-in for the murmur-bucket splitter a real platform uses),
    then the pooled two-proportion z-test. Two hash aggregates (per
    user, then 2 arms) — the per-user rollup is the only fact-sized
    pass. The z statistic is built entirely from exact BIGINT counts
    through +,−,×,÷,sqrt — each IEEE-correctly-rounded, so the hash
    oracle is stable with no decimal machinery at all (the device:
    keep everything integer until a final short correctly-rounded
    float expression). A saturated experiment (everyone converted, or
    nobody) has zero pooled variance, so z is NULL then — identically
    in both engines (Spark runs ANSI mode, so the guard is mandatory,
    not cosmetic)."""
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2).alias("variant"), "converted"
    )
    arms = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    n0, c0 = F.col("n0").cast("double"), F.col("c0").cast("double")
    n1, c1 = F.col("n1").cast("double"), F.col("c1").cast("double")
    pooled = (c0 + c1) / (n0 + n1)
    rate0, rate1 = c0 / n0, c1 / n1
    return wide.select(
        F.col("n0").alias("control_users"),
        F.col("c0").alias("control_conversions"),
        F.col("n1").alias("treatment_users"),
        F.col("c1").alias("treatment_conversions"),
        rate0.alias("control_rate"),
        rate1.alias("treatment_rate"),
        (rate1 - rate0).alias("lift_abs"),
        F.when(
            F.sqrt(
                pooled
                * (F.lit(1.0) - pooled)
                * (F.lit(1.0) / n0 + F.lit(1.0) / n1)
            )
            != 0,
            (rate1 - rate0)
            / F.sqrt(
                pooled
                * (F.lit(1.0) - pooled)
                * (F.lit(1.0) / n0 + F.lit(1.0) / n1)
            ),
        ).alias("z_score"),
    )
