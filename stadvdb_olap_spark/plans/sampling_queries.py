"""Deterministic sampling — the reproducible alternative to random draws.

A 100 TB pipeline samples constantly (debug subsets, eval slices, k-means
training sets, profiling). `df.sample()` is seed- and partitioning-
dependent, so two runs — or two engines — disagree. These queries use
content-addressed (key-hash) sampling instead: membership depends only on
the row's key, so the sample is stable across runs, engines, partition
layouts, and data growth, and it is pushdown-friendly (a narrow map plus a
filter, no shuffle for the Bernoulli form).

Same md5-bucket convention as the train/val/test split
(plans/advanced_queries.py) and the reference-free split operator the
curation pipeline uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.sources.parquet import load_table


def hash_bucket(key: F.Column, nchars: int = 2) -> F.Column:
    """First ``nchars`` hex chars of md5(key-as-string) — a uniform
    bucket label in ['00'..'ff'] that any engine reproduces."""
    return F.substring(F.md5(key.cast("string").cast("binary")), 1, nchars)


def bernoulli_sample(df: DataFrame, key: str, cutoff: str = "1a") -> DataFrame:
    """Keep rows whose 2-hex-char key bucket sorts below ``cutoff``
    ('1a' ~ 26/256 ~ 10%). Narrow map + filter: no shuffle, no seed."""
    return df.filter(hash_bucket(F.col(key)) < cutoff)


@query(
    "sample_orders_hash",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
""",
)
def sample_orders_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic Bernoulli sample of orders by key hash. Unlike
    df.sample(), the kept set is a pure function of the keys — re-runs,
    other engines, and future appends agree on every row's membership."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        hash_bucket(F.col("o_orderkey")) < "1a"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "stratified_sample_per_status",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
QUALIFY row_number() OVER (
    PARTITION BY o_orderstatus
    ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) <= 40
""",
)
def stratified_sample_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N-per-stratum sample: rank each stratum by key hash (a
    deterministic 'random' order) and keep the first 40. One shuffle on
    the stratum key; at scale, skewed strata cost no more than their 40
    winners after the rank filter since row_number cuts inside each
    partition before any further work."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.md5(F.col("o_orderkey").cast("string").cast("binary")), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 40)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


@query(
    "rolling_origin_folds_events",
    oracle="""
WITH bounds AS (
    SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
), folds AS (
    SELECT k, lo + (4 + k) * ((hi - lo) // 8) AS cutoff, (hi - lo) // 8 AS h
    FROM bounds, unnest(generate_series(0, 2)) AS u(k)
)
SELECT k AS fold,
       CASE WHEN epoch_us(ts) < cutoff THEN 'train' ELSE 'test' END AS role,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS total_value
FROM events CROSS JOIN folds
WHERE epoch_us(ts) < cutoff + h
GROUP BY fold, role
""",
)
def rolling_origin_folds_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (time-series) cross-validation folds: three
    leakage-free (train, test) splits at successive time cutoffs — train
    is everything strictly before the cutoff, test the next horizon
    window. Cutoffs derive from the observed time range in exact integer
    microseconds (a 1-row broadcast), fold membership is a narrow
    predicate per fold, and the per-fold aggregates are one grouped pass
    over the fold-exploded stream. The time-based twin of the hash-based
    train/val/test split: temporal order, not content hash, decides
    membership — the only valid protocol for forecasting models."""
    from stadvdb_olap_spark.plans.compat import money_sum

    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    bounds = events.agg(
        F.min(us).alias("lo"), F.max(us).alias("hi")
    )
    folds = (
        bounds.select(
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("k"), "lo", "hi"
        )
        .select(
            F.col("k"),
            (
                F.col("lo")
                + (F.lit(4) + F.col("k"))
                * F.expr("(hi - lo) div 8")
            ).alias("cutoff"),
            F.expr("(hi - lo) div 8").alias("h"),
        )
    )
    return (
        events.select(us.alias("t_us"), "value")
        .crossJoin(F.broadcast(folds))
        .filter(F.col("t_us") < F.col("cutoff") + F.col("h"))
        .select(
            F.col("k").alias("fold"),
            F.when(F.col("t_us") < F.col("cutoff"), "train")
            .otherwise("test")
            .alias("role"),
            "value",
        )
        .groupBy("fold", "role")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("total_value"),
        )
    )


_NEG_K = 3       # negatives to keep per customer
_NEG_TRIES = 8   # deterministic candidate draws before giving up


@query(
    "negative_sample_customer_parts",
    oracle=f"""
WITH pos AS (
    SELECT DISTINCT o_custkey AS cust, l_partkey AS part
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), np AS (SELECT COUNT(*) AS n_parts FROM part),
cand AS (
    SELECT c.cust, u.i AS try_idx,
           1 + CAST('0x' || substr(md5(CAST(c.cust AS VARCHAR) || '#' ||
                                       CAST(u.i AS VARCHAR)), 1, 12)
                    AS BIGINT) % n_parts AS part
    FROM (SELECT DISTINCT cust FROM pos) c
    CROSS JOIN np
    CROSS JOIN unnest(generate_series(0, {_NEG_TRIES - 1})) AS u(i)
), dedup AS (
    SELECT cust, part, MIN(try_idx) AS try_idx FROM cand GROUP BY cust, part
), neg AS (
    SELECT d.cust, d.part, d.try_idx
    FROM dedup d ANTI JOIN pos p ON d.cust = p.cust AND d.part = p.part
)
SELECT cust AS o_custkey, part AS l_partkey,
       CAST(rn AS BIGINT) AS neg_rank
FROM (SELECT *, row_number() OVER (
          PARTITION BY cust ORDER BY try_idx, part) AS rn
      FROM neg)
WHERE rn <= {_NEG_K}
""",
)
def negative_sample_customer_parts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DETERMINISTIC NEGATIVE SAMPLING for recommender/contrastive
    training: per customer, up to 3 parts they never purchased, drawn by
    a content-addressed hash (md5 of customer#try) so every engine, run,
    and partitioning produces the same negatives — no RNG, no seed
    plumbing. Candidate draws are a narrow explode; the "never purchased"
    guarantee is a LEFT ANTI join against the positives on the composite
    key; ranking keeps the first K surviving tries. All shuffles are on
    keys; the positives set is the only large intermediate."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    pos = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    np_ = part.agg(F.count(F.lit(1)).alias("n_parts"))
    cand = (
        pos.select("cust")
        .distinct()
        .crossJoin(F.broadcast(np_))
        .select(
            "cust",
            "n_parts",
            F.explode(F.sequence(F.lit(0), F.lit(_NEG_TRIES - 1))).alias(
                "try_idx"
            ),
        )
        .select(
            "cust",
            "try_idx",
            (
                F.lit(1)
                + F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "#",
                                F.col("cust").cast("string"),
                                F.col("try_idx").cast("string"),
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n_parts")
            ).alias("part"),
        )
    )
    dedup = cand.groupBy("cust", "part").agg(F.min("try_idx").alias("try_idx"))
    neg = dedup.join(pos, ["cust", "part"], "left_anti")
    w = Window.partitionBy("cust").orderBy("try_idx", "part")
    return (
        neg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _NEG_K)
        .select(
            F.col("cust").alias("o_custkey"),
            F.col("part").alias("l_partkey"),
            F.col("rn").cast("long").alias("neg_rank"),
        )
    )


# Poisson(1) inverse-CDF thresholds on a 16-bit uniform: t[k] =
# floor(CDF(k) * 65536), computed once in Python (exp is never
# evaluated inside either engine). A draw u in [0, 65536) maps to
# weight w = #{k : u >= t[k]} in 0..7.
_POIS_T = (24109, 48218, 60273, 64291, 65296, 65497, 65530)
_BOOT_B = 32


def _boot_w_sql(b_expr: str) -> str:
    h = f"md5('boot' || CAST({b_expr} AS VARCHAR) || ':' || CAST(o_orderkey AS VARCHAR))"
    u = (
        f"((strpos('0123456789abcdef', {h}[1:1]) - 1) * 4096"
        f" + (strpos('0123456789abcdef', {h}[2:2]) - 1) * 256"
        f" + (strpos('0123456789abcdef', {h}[3:3]) - 1) * 16"
        f" + (strpos('0123456789abcdef', {h}[4:4]) - 1))"
    )
    terms = " + ".join(
        f"CASE WHEN u >= {t} THEN 1 ELSE 0 END" for t in _POIS_T
    )
    return f"(SELECT {terms} FROM (SELECT {u} AS u) __u)"


@query(
    "poisson_bootstrap_ci_revenue",
    oracle=f"""
WITH rows_w AS (
    SELECT b.b,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
           {_boot_w_sql('b.b')} AS w
    FROM orders CROSS JOIN (
        SELECT unnest(range({_BOOT_B})) AS b) b
),
reps AS (
    SELECT b, CAST(SUM(w * cents) AS BIGINT) AS s
    FROM rows_w GROUP BY b
),
sorted AS (
    SELECT list_sort(list(s)) AS ss,
           CAST(COUNT(*) AS BIGINT) AS n_replicates
    FROM reps
),
point AS (
    SELECT CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
               AS BIGINT) AS pc
    FROM orders
)
SELECT pc / CAST(100 AS DOUBLE) AS point_revenue,
       ss[2] / CAST(100 AS DOUBLE) AS ci_lo,
       ss[{_BOOT_B - 1}] / CAST(100 AS DOUBLE) AS ci_hi,
       n_replicates
FROM sorted CROSS JOIN point
""",
)
def poisson_bootstrap_ci_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for total order revenue via the
    DETERMINISTIC Poisson bootstrap (Chamandy et al. 2012, the
    one-pass resampling device built for map-reduce): each of 32
    replicates weights every order by an independent Poisson(1) count
    drawn by inverse-CDF lookup on a salted-md5 16-bit uniform — the
    same (replicate, orderkey) always draws the same weight in any
    engine, so the whole statistic is hash-exact. Everything is
    integer arithmetic (cents x integer weights, thresholds
    premultiplied into 16-bit space; exp() never runs in-engine); the
    CI endpoints are order statistics (ranks 2 and 31) of the 32 exact
    replicate sums. Scale shape: the replicate fan-out is a map-side
    explode (no pre-shuffle blow-up materialized), partial aggregation
    reduces each partition to <=32 rows, and the final exchange moves
    32 keys — the classic one-pass bootstrap at any corpus size."""
    orders = load_table(spark, sf_dir, "orders")

    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    # Explode the replicate index FIRST, then hash once with the salt
    # built from the b column — one compact md5/threshold expression
    # instead of 32 unrolled copies (which overflows whole-stage
    # codegen's method budget and falls back to interpreted eval).
    fanned = orders.select(
        "o_orderkey",
        cents.alias("cents"),
        F.explode(F.array(*[F.lit(b) for b in range(_BOOT_B)])).alias("b"),
    )
    h = F.md5(
        F.concat(
            F.lit("boot"),
            F.col("b").cast("string"),
            F.lit(":"),
            F.col("o_orderkey").cast("string"),
        ).cast("binary")
    )
    u = F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
    w = None
    for t in _POIS_T:
        term = F.when(u >= t, 1).otherwise(0)
        w = term if w is None else w + term
    reps = fanned.select("cents", "b", w.alias("w")).groupBy("b").agg(
        F.sum(F.col("w") * F.col("cents")).cast("long").alias("s")
    )
    sorted_reps = reps.agg(
        F.sort_array(F.collect_list("s")).alias("ss"),
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
    )
    point = orders.agg(F.sum(cents).cast("long").alias("pc"))
    return sorted_reps.crossJoin(F.broadcast(point)).select(
        (F.col("pc") / F.lit(100.0)).alias("point_revenue"),
        (F.element_at("ss", 2) / F.lit(100.0)).alias("ci_lo"),
        (F.element_at("ss", _BOOT_B - 1) / F.lit(100.0)).alias("ci_hi"),
        "n_replicates",
    )


@query(
    "conformal_interval_order_totals",
    oracle="""
WITH r AS (
    SELECT o_orderpriority,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders
),
pred AS (
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           list_sort(list(cents))[CAST((COUNT(*) + 1) // 2 AS BIGINT)]
               AS med_cents
    FROM r GROUP BY o_orderpriority
),
scored AS (
    SELECT r.o_orderpriority, r.cents, p.n, p.med_cents,
           abs(r.cents - p.med_cents) AS score
    FROM r JOIN pred p USING (o_orderpriority)
),
q AS (
    SELECT o_orderpriority, n, med_cents,
           list_sort(list(score))[
               CAST(least((9 * (n + 1) + 9) // 10, n) AS BIGINT)
           ] AS q_cents
    FROM scored GROUP BY o_orderpriority, n, med_cents
),
cov AS (
    SELECT s.o_orderpriority,
           CAST(COUNT(*) FILTER (s.score <= q.q_cents) AS BIGINT)
               AS n_covered
    FROM scored s JOIN q USING (o_orderpriority)
    GROUP BY s.o_orderpriority
)
SELECT q.o_orderpriority, n,
       med_cents / CAST(100 AS DOUBLE) AS pred,
       (med_cents - q_cents) / CAST(100 AS DOUBLE) AS lo,
       (med_cents + q_cents) / CAST(100 AS DOUBLE) AS hi,
       CAST(n_covered AS DOUBLE) / n AS coverage
FROM q JOIN cov USING (o_orderpriority)
""",
)
def conformal_interval_order_totals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split-conformal prediction intervals (Vovk et al.; Lei et al.
    2018) for order totals per priority class: predictor = the class's
    lower median, nonconformity = absolute residual, interval = pred ±
    the ⌈(n+1)·0.9⌉-th smallest residual — the distribution-free 90%
    interval modern ML-eval stacks attach to point predictions, plus
    the achieved in-sample coverage. Exactness: everything is integer
    cents and ORDER STATISTICS — the conformal rank ⌈0.9(n+1)⌉ is
    computed in pure integer arithmetic ((9(n+1)+9) DIV 10), so no
    float enters before the output divisions. The per-class sorted
    arrays are fine at the 5-class cardinality here; at 100 TB swap in
    the two-pass exact-median device (scalable_exact_median_price) per
    class — the conformal logic is unchanged."""
    from pyspark.sql import Window  # noqa: F401  (symmetry with siblings)

    orders = load_table(spark, sf_dir, "orders")
    r = orders.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    pred = r.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sort_array(F.collect_list("cents")).alias("arr"),
    ).select(
        "o_orderpriority",
        "n",
        F.element_at("arr", ((F.col("n") + 1) / 2).cast("int")).alias(
            "med_cents"
        ),
    )
    scored = r.join(pred, "o_orderpriority").select(
        "o_orderpriority",
        "n",
        "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("score"),
    )
    k = F.least((9 * (F.col("n") + 1) + 9) / 10, F.col("n")).cast("int")
    q = scored.groupBy("o_orderpriority", "n", "med_cents").agg(
        F.sort_array(F.collect_list("score")).alias("ss")
    ).select(
        "o_orderpriority",
        "n",
        "med_cents",
        F.element_at("ss", k).alias("q_cents"),
        "ss",
    )
    covered = q.select(
        "o_orderpriority",
        "n",
        "med_cents",
        "q_cents",
        F.size(
            F.filter("ss", lambda s: s <= F.col("q_cents"))
        ).cast("long").alias("n_covered"),
    )
    return covered.select(
        "o_orderpriority",
        "n",
        (F.col("med_cents") / F.lit(100.0)).alias("pred"),
        ((F.col("med_cents") - F.col("q_cents")) / F.lit(100.0)).alias("lo"),
        ((F.col("med_cents") + F.col("q_cents")) / F.lit(100.0)).alias("hi"),
        (F.col("n_covered").cast("double") / F.col("n")).alias("coverage"),
    )


_SYS_K = 100


@query(
    "systematic_sample_orders",
    oracle=f"""
WITH ranked AS (
    SELECT o_orderkey, o_orderdate, o_totalprice,
           CAST(row_number() OVER (ORDER BY o_orderdate, o_orderkey)
                AS BIGINT) AS gr
    FROM orders
)
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       gr
FROM ranked WHERE (gr - 1) % {_SYS_K} = 0
""",
)
def systematic_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (every k-th) sampling along the order-date timeline —
    the evenly-spaced eval slice survey methodology prefers over
    Bernoulli when the frame has a meaningful order (guaranteed temporal
    spread, exactly ceil(N/k) rows). The global position comes from
    ``operators/rank.py:global_row_number`` (deterministic daily
    buckets + per-bucket parallel ranks + broadcast cumulative offsets
    — ONE full shuffle, no single-partition funnel), then a modulus
    filter; the oracle uses the equivalent single-node window.
    Deterministic: (o_orderdate, o_orderkey) is a total order. 100 TB
    shape: identical to a global ORDER BY plus a narrow filter."""
    from stadvdb_olap_spark.operators.rank import global_row_number

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    ranked = global_row_number(
        orders,
        ["o_orderdate", "o_orderkey"],
        bucket=F.col("o_orderdate").cast("date"),  # daily buckets
        out="gr",
    )
    return ranked.filter((F.col("gr") - 1) % _SYS_K == 0).select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "gr",
    )


_RES_K = 5


@query(
    "reservoir_k_per_priority_orders",
    oracle=f"""
SELECT o_orderpriority, o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(pos AS BIGINT) AS pos
FROM (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
           ) AS pos
    FROM orders
)
WHERE pos <= {_RES_K}
""",
)
def reservoir_k_per_priority_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic fixed-k-per-group sample (the reproducible stand-in
    for per-group reservoir sampling): rank rows inside each group by
    the md5 of their key — a uniform, content-addressed order — and
    keep the first k. Every engine, run, and partition layout selects
    the SAME k rows per group, unlike rdd.takeSample / reservoir
    algorithms whose result depends on visit order. 100 TB shape: one
    hash shuffle on the group key; with heavy groups the rank is
    top-k-pruned per partition before the shuffle by Spark's
    WindowGroupLimit (rank filter pushdown), so no group's full row set
    is ever sorted."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string").cast("binary")),
        "o_orderkey",
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("pos"),
        )
        .filter(F.col("pos") <= _RES_K)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "pos",
        )
    )
