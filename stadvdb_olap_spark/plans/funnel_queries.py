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
           CAST(sum(converted) AS BIGINT) AS n_converted
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


@query(
    "ab_test_cuped_value",
    oracle="""
WITH bounds AS (SELECT date_trunc('day', min(ts)) AS d0 FROM events),
per_user AS (
    SELECT user_id, user_id % 2 AS variant,
           CAST(round(sum(CASE WHEN date_diff('day', (SELECT d0 FROM bounds),
                                              date_trunc('day', ts)) < 15
                               THEN value ELSE 0 END) * 0.0625, 0)
                AS DECIMAL(10,0)) AS x,
           CAST(round(sum(CASE WHEN date_diff('day', (SELECT d0 FROM bounds),
                                              date_trunc('day', ts)) >= 15
                               THEN value ELSE 0 END) * 0.0625, 0)
                AS DECIMAL(10,0)) AS y
    FROM events GROUP BY user_id
),
arms AS (
    SELECT variant,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(x) AS DOUBLE) AS sx,
           CAST(sum(y) AS DOUBLE) AS sy,
           CAST(sum(x * y) AS DOUBLE) AS sxy,
           CAST(sum(x * x) AS DOUBLE) AS sxx,
           CAST(sum(y * y) AS DOUBLE) AS syy
    FROM per_user GROUP BY variant
),
w AS (
    SELECT
      max(CASE WHEN variant = 0 THEN n END) AS n0,
      max(CASE WHEN variant = 0 THEN sx END) AS sx0,
      max(CASE WHEN variant = 0 THEN sy END) AS sy0,
      max(CASE WHEN variant = 1 THEN n END) AS n1,
      max(CASE WHEN variant = 1 THEN sx END) AS sx1,
      max(CASE WHEN variant = 1 THEN sy END) AS sy1,
      sum(n) AS nn, sum(sx) AS tsx, sum(sy) AS tsy,
      sum(sxy) AS tsxy, sum(sxx) AS tsxx, sum(syy) AS tsyy
    FROM arms
),
m AS (
    SELECT *,
           tsxx / nn - (tsx / nn) * (tsx / nn) AS var_x,
           tsyy / nn - (tsy / nn) * (tsy / nn) AS var_y,
           tsxy / nn - (tsx / nn) * (tsy / nn) AS cov_xy
    FROM w
)
SELECT CAST(nn AS BIGINT) AS n_users,
       CASE WHEN var_x = 0 THEN NULL ELSE cov_xy / var_x END AS theta,
       sy1 / n1 - sy0 / n0 AS lift_raw,
       CASE WHEN var_x = 0 THEN NULL
            ELSE (sy1 / n1 - sy0 / n0)
                 - (cov_xy / var_x) * (sx1 / n1 - sx0 / n0)
       END AS lift_cuped,
       CASE WHEN var_x = 0 OR var_y = 0 THEN NULL
            ELSE (cov_xy * cov_xy) / (var_x * var_y)
       END AS var_reduction
FROM m
""",
)
def ab_test_cuped_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al. 2013, the
    public pre-period-covariate method every experimentation platform
    uses): per-user PRE-period value (first 15 days, the covariate x)
    and POST-period value (the metric y), theta = cov(x,y)/var(x)
    pooled, adjusted lift = raw lift − theta·(pre-period imbalance),
    variance reduction = rho². Everything reduces to per-arm moment
    sums of integer-quantized (x, y) — the ``_quantized`` device:
    round(v·2⁻⁴) in double is tie-compatible across engines, sums are
    exact integers under 2⁵³, and the closed form is correctly-rounded
    float ops — so even this multi-stage statistic is hash-checkable.
    One user-keyed aggregate is the only fact-sized pass; degenerate
    covariates (var=0) yield NULLs identically in both engines."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.date_trunc("day", F.min("ts")).alias("d0"))
    day_idx = F.datediff(F.date_trunc("day", F.col("ts")), F.col("d0"))
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.when(day_idx < 15, F.col("value")).otherwise(0.0))
                * F.lit(0.0625),
                0,
            )
            .cast("decimal(10,0)")
            .alias("x"),
            F.round(
                F.sum(F.when(day_idx >= 15, F.col("value")).otherwise(0.0))
                * F.lit(0.0625),
                0,
            )
            .cast("decimal(10,0)")
            .alias("y"),
        )
        .select((F.col("user_id") % 2).alias("variant"), "x", "y")
    )
    arms = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    w = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("sx"))).alias("sx0"),
        F.max(F.when(F.col("variant") == 0, F.col("sy"))).alias("sy0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("sx"))).alias("sx1"),
        F.max(F.when(F.col("variant") == 1, F.col("sy"))).alias("sy1"),
        F.sum("n").alias("nn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxy").alias("tsxy"),
        F.sum("sxx").alias("tsxx"),
        F.sum("syy").alias("tsyy"),
    )
    nn = F.col("nn")
    var_x = F.col("tsxx") / nn - (F.col("tsx") / nn) * (F.col("tsx") / nn)
    var_y = F.col("tsyy") / nn - (F.col("tsy") / nn) * (F.col("tsy") / nn)
    cov = F.col("tsxy") / nn - (F.col("tsx") / nn) * (F.col("tsy") / nn)
    lift_raw = F.col("sy1") / F.col("n1") - F.col("sy0") / F.col("n0")
    pre_imbal = F.col("sx1") / F.col("n1") - F.col("sx0") / F.col("n0")
    m = w.select(
        nn.cast("long").alias("n_users"),
        F.when(var_x != 0, cov / var_x).alias("theta"),
        lift_raw.alias("lift_raw"),
        F.when(var_x != 0, lift_raw - (cov / var_x) * pre_imbal).alias(
            "lift_cuped"
        ),
        F.when(
            (var_x != 0) & (var_y != 0), (cov * cov) / (var_x * var_y)
        ).alias("var_reduction"),
    )
    return m


@query(
    "funnel_time_to_convert",
    oracle="""
WITH per_user AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v_us,
           min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_us
    FROM events GROUP BY user_id
),
lat AS (
    SELECT CAST(p_us - v_us AS DOUBLE) / 3600000000.0 AS hours
    FROM per_user WHERE v_us IS NOT NULL AND p_us IS NOT NULL AND p_us >= v_us
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       ROUND(quantile_cont(hours, 0.25), 6) AS p25_hours,
       ROUND(quantile_cont(hours, 0.50), 6) AS p50_hours,
       ROUND(quantile_cont(hours, 0.75), 6) AS p75_hours,
       ROUND(quantile_cont(hours, 0.90), 6) AS p90_hours
FROM lat
""",
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, hours from first view to
    the GLOBAL first purchase, kept only when that first purchase is
    at-or-after the first view — users whose earliest purchase precedes
    their first view are EXCLUDED (even if they purchased again later),
    summarized as exact interpolated percentiles — the funnel's latency
    dimension
    (``funnel_view_click_purchase`` counts WHO converts; this measures
    HOW FAST). One conditional aggregate per user (no window needed —
    min timestamps commute), then percentile over the converters.
    Latency divides exact integer microsecond diffs — deterministic;
    percentile follows the established Spark percentile ==
    quantile_cont parity."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_micros("ts"))
        ).alias("v_us"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("p_us"),
    )
    lat = per_user.where(
        F.col("v_us").isNotNull()
        & F.col("p_us").isNotNull()
        & (F.col("p_us") >= F.col("v_us"))
    ).select(
        ((F.col("p_us") - F.col("v_us")).cast("double") / 3600000000.0).alias(
            "hours"
        )
    )
    return lat.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        *[
            F.round(F.percentile("hours", F.lit(p)), 6).alias(name)
            for name, p in [
                ("p25_hours", 0.25),
                ("p50_hours", 0.50),
                ("p75_hours", 0.75),
                ("p90_hours", 0.90),
            ]
        ],
    )


@query(
    "funnel_reentry_conversions_users",
    oracle="""
WITH e AS (
    SELECT user_id,
           list_sort(list(epoch_us(ts) * 4 +
               CASE event_type WHEN 'view' THEN 1
                               WHEN 'click' THEN 2 ELSE 3 END)) AS evs
    FROM events
    WHERE event_type IN ('view', 'click', 'purchase')
    GROUP BY user_id
),
folded AS (
    SELECT user_id, len(evs) AS n_events,
           list_reduce(
               list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
                            list_transform(evs, x -> [x])),
               (acc, e) -> CASE
                   WHEN e[1] % 4 = 1 AND acc[1] = 0 THEN [CAST(1 AS BIGINT), acc[2]]
                   WHEN e[1] % 4 = 2 AND acc[1] = 1 THEN [CAST(2 AS BIGINT), acc[2]]
                   WHEN e[1] % 4 = 3 AND acc[1] = 2 THEN [CAST(0 AS BIGINT), acc[2] + 1]
                   ELSE [acc[1], acc[2]] END
           ) AS st
    FROM e
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_funnel_events,
       CAST(st[2] AS BIGINT) AS n_conversions,
       CAST(st[1] AS BIGINT) AS end_stage
FROM folded
""",
)
def funnel_reentry_conversions_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RE-ENTRY FUNNEL (sequential multi-conversion counting): a strict
    view→click→purchase state machine per user that RESETS after each
    completed conversion, so one user converts many times — the journey
    semantics `funnel_view_click_purchase`'s first-touch cumulative
    windows cannot express (the kept state depends on itself, like
    `debounce_events_per_user`). Events encode as one BIGINT
    (microseconds x 4 + stage code — the type code doubles as the
    deterministic same-timestamp tiebreak on both engines) and a
    per-user sorted-array fold runs the machine with state
    [stage, n_conversions]. The oracle rebuilds the accumulator list on
    every step (DuckDB 1.0.0 vectorized list_reduce mis-folds on
    accumulator pass-through — see debounce_events_per_user). 100 TB
    shape: one user-keyed exchange, then a row-local array fold;
    unbounded-history users stream through applyInPandasWithState
    instead."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    code = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .otherwise(3)
        .cast("long")
    )
    enc = F.unix_micros("ts") * 4 + code
    t = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(enc)).alias("evs")
    )
    init = F.struct(
        F.lit(0).cast("long").alias("stage"),
        F.lit(0).cast("long").alias("conv"),
    )

    def step(acc, e):
        typ = e % 4
        return (
            F.when(
                (typ == 1) & (acc["stage"] == 0),
                F.struct(
                    F.lit(1).cast("long").alias("stage"),
                    acc["conv"].alias("conv"),
                ),
            )
            .when(
                (typ == 2) & (acc["stage"] == 1),
                F.struct(
                    F.lit(2).cast("long").alias("stage"),
                    acc["conv"].alias("conv"),
                ),
            )
            .when(
                (typ == 3) & (acc["stage"] == 2),
                F.struct(
                    F.lit(0).cast("long").alias("stage"),
                    (acc["conv"] + 1).alias("conv"),
                ),
            )
            .otherwise(acc)
        )

    st = F.aggregate(F.col("evs"), init, step)
    return t.select(
        "user_id",
        F.size("evs").cast("long").alias("n_funnel_events"),
        st["conv"].alias("n_conversions"),
        st["stage"].alias("end_stage"),
    )
