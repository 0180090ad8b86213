"""Sequence & time-series analytics catalog queries.

The behavioral-analytics family the reference's OLAP surface gestures at
(ordered event scans in ``app.py``'s report loop) re-expressed as
Catalyst-planned window/aggregate pipelines, plus the time-series
statistics a monitoring pipeline runs over daily facts:

- ``markov_event_transitions`` — per-user next-event transition counts
  and probabilities (first-order Markov chain over the event stream).
- ``user_first_paths`` — each user's first-3-event path, ranked by
  frequency (the classic "top onboarding paths" query).
- ``simpson_diversity_source_unigrams`` — per-source unigram
  Gini–Simpson diversity + effective vocabulary. Simpson (1 − Σp²) is
  chosen over Shannon entropy deliberately: Σc² is an EXACT integer
  aggregate, so the only float ops are one division and one subtract —
  both IEEE-correctly-rounded — where Shannon's ``ln`` is not
  correctly rounded and would break the cross-engine hash oracle.
- ``autocorr_daily_revenue_lag7`` — lag-7 Pearson autocorrelation of
  daily revenue (weekly seasonality detector). Moment sums fold over
  the date-SORTED pair array in plain doubles (the tv_distance
  sorted-fold pattern — viable because the series is calendar-sized);
  the closed form uses only +,−,×,÷,sqrt — every one correctly
  rounded, so the result is bit-identical across engines.
- ``corr_matrix_lineitem`` — pairwise Pearson correlation of the four
  lineitem measures in ONE aggregate pass (long-form output), moments
  exact via power-of-two-prescaled integer quantization (see
  ``_quantized`` — the fact-scale determinism device).
- ``benford_first_digit_orders`` — first-significant-digit distribution
  of order totals vs Benford's law (fraud/DQ screen). Expected shares
  are python-precomputed literals embedded in BOTH engines, sidestepping
  cross-engine ``log10`` rounding.
- ``interpolate_hourly_signup_value`` — linear interpolation of a
  sparse hourly series onto a dense grid (the resample/interpolate
  step LOCF can't do; complements ``locf_forward_fill_events``).
- ``decile_bins_order_totals`` — equi-depth (ntile) binning of order
  totals with per-bin edges and mass: the quantile-bucketize feature
  step, deterministic via a unique tiebreak column.
- ``gini_customer_revenue`` — revenue-concentration Gini coefficient
  from a fixed-resolution integer histogram + sorted-fold (the two
  determinism devices composed: fact-sized passes stay exact integer
  aggregates; the rank-weighted sum folds over a resolution-bounded
  array).
- ``weighted_median_price_by_flag`` — per-group quantity-weighted
  median by exact integer cumulative-weight selection (the answer is
  a raw input value — no float accumulation at all).
- ``survival_weekly_users`` — Kaplan-Meier-style weekly churn curve
  with right-censoring; the prefix product folds over the calendar-
  bounded week grid (sorted-fold device again).
- ``basket_part_pairs_lift`` — market-basket support/confidence/lift,
  pair explosion blocked on the order key (per-basket bounded).
- ``rfm_segments_customers`` — RFM quintile segmentation with
  deterministic ntile tiebreaks and exact-decimal monetary.
- ``seasonal_decompose_daily_revenue`` — classical additive
  decomposition (centered-MA trend, weekday seasonal, residual), all
  decimal-exact.
- ``holt_forecast_daily_revenue`` — Holt double-exponential-smoothing
  forecast: the sequential recurrence as a sorted-fold (binary-exact
  smoothing constants; DuckDB twin folds DOUBLE[2] state — see
  ``_holt_next_sql`` for the struct-accumulator quirk it avoids).
- ``max_concurrent_sessions_hourly`` — sweep-line peak concurrency:
  session intervals to +/-1 boundaries, tie-ordered running sum,
  per-hour max (counting overlap without a pair self-join).

Scale notes are per-query docstrings; the common theme: one window or
one-two hash aggregates, grouped/partitioned on keys that grow with the
data (user_id, source, event_type), never a driver-side loop.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stadvdb_olap_spark.functions.text import tokens, tokens_sql
from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.plans.compat import money_sum, money_sum_sql
from stadvdb_olap_spark.sources.parquet import load_spread, load_table


@query(
    "markov_event_transitions",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS next_type
    FROM events
),
cnt AS (
    SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE)
           / sum(n) OVER (PARTITION BY from_type) AS prob
FROM cnt
""",
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov chain over each user's event stream: count of
    (from_type → to_type) adjacent pairs and the row-normalized
    transition probability. One exchange on user_id for the ordering
    window (ts + event_id tiebreak pins determinism), then a hash
    aggregate on the 25-row transition matrix — the matrix itself is
    tiny at any corpus size, so the second shuffle is trivial. The
    probability divides two exact BIGINTs in one IEEE division:
    engine-independent. Mirrors the reference's ordered event scan
    (reference ``app.py:13-21`` report loop) as a declarative plan."""
    ev = load_spread(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    cnt = (
        seq.where(F.col("next_type").isNotNull())
        .select(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrow = Window.partitionBy("from_type")
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wrow)).alias("prob"),
    )


@query(
    "user_first_paths",
    oracle="""
WITH ranked AS (
    SELECT user_id, event_type,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS rn
    FROM events
),
paths AS (
    SELECT user_id,
           concat_ws('>',
               max(CASE WHEN rn = 1 THEN event_type END),
               max(CASE WHEN rn = 2 THEN event_type END),
               max(CASE WHEN rn = 3 THEN event_type END)) AS path
    FROM ranked WHERE rn <= 3 GROUP BY user_id
)
SELECT path, count(*) AS n_users
FROM paths GROUP BY path
""",
)
def user_first_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top onboarding paths: each user's first three event types (in
    ts, event_id order) joined into a '>'-delimited path, counted
    across users. The rn≤3 filter drops everything past the third
    event BEFORE the path aggregate, so per-user state is 3 rows no
    matter how long the user's history is. Two exchanges total (user
    window + path count); ``concat_ws`` skips NULLs, so users with <3
    events get their short path, same in both engines."""
    ev = load_spread(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= 3)
    paths = ranked.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 2, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 3, F.col("event_type"))),
        ).alias("path")
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "simpson_diversity_source_unigrams",
    oracle=f"""
WITH toks AS (
    SELECT source, unnest({tokens_sql('text')}) AS word FROM documents
),
cnt AS (SELECT source, word, count(*) AS c FROM toks GROUP BY source, word),
moments AS (
    SELECT source, sum(c) AS st, sum(c * c) AS sc2, count(*) AS vocab
    FROM cnt GROUP BY source
)
SELECT source, vocab,
       1 - CAST(sc2 AS DOUBLE) / (CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
           AS simpson_diversity,
       (CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) / CAST(sc2 AS DOUBLE)
           AS effective_vocab
FROM moments
""",
)
def simpson_diversity_source_unigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical diversity for corpus monitoring: Gini–Simpson
    index 1 − Σp² and the inverse-Simpson "effective vocabulary"
    (how many equally-common words would give the same concentration).
    A low-diversity source is boilerplate/spam — the cheap screen run
    alongside ``tv_distance_source_unigrams``. Σc² is an exact integer
    aggregate (no float summation order at all); the two final float
    ops are correctly-rounded IEEE division/multiply, so the hash
    oracle is stable. Two hash aggregates keyed on (source, word) then
    source — both keys grow with the corpus, no hot partition."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(tokens("text")).alias("word"))
    cnt = toks.groupBy("source", "word").agg(F.count(F.lit(1)).alias("c"))
    moments = cnt.groupBy("source").agg(
        F.sum("c").alias("st"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
        F.count(F.lit(1)).alias("vocab"),
    )
    st_d = F.col("st").cast("double")
    sc2_d = F.col("sc2").cast("double")
    return moments.select(
        "source",
        "vocab",
        (F.lit(1) - sc2_d / (st_d * st_d)).alias("simpson_diversity"),
        ((st_d * st_d) / sc2_d).alias("effective_vocab"),
    )


def _pearson_from_sums_sql(n: str, sx: str, sy: str, sxy: str, sxx: str, syy: str) -> str:
    """Pearson r from exact decimal moment sums, double closed form.

    ((n·Σxy − Σx·Σy) / (sqrt(n·Σx²−Σx²ᵉ) · sqrt(n·Σy²−Σy²ᵉ))) — only
    +,−,×,÷,sqrt, each IEEE-correctly-rounded, so identical across
    engines given identical inputs and expression tree."""
    return (
        f"(({n} * {sxy} - {sx} * {sy})"
        f" / (sqrt({n} * {sxx} - {sx} * {sx})"
        f" * sqrt({n} * {syy} - {sy} * {sy})))"
    )


def _pearson_from_sums(n, sx, sy, sxy, sxx, syy):
    return (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )


def _quantized(col: str, prescale: float):
    """Integer-quantized prescaled variable for exact cross-engine moments.

    Pearson r is invariant under per-variable positive scaling, so each
    variable is multiplied by a static prescale chosen to bring its
    magnitude into the low hundreds, then ROUNDED TO AN INTEGER in
    double arithmetic — ``round(double)`` is ties-away-from-zero in
    BOTH engines, and ``v * prescale`` is a single correctly-rounded
    multiply, so the quantized values are bit-identical. The decimal
    cast then touches only exact integer-valued doubles (no rounding →
    no HALF_UP-vs-half-even divergence; direct double→decimal casts DO
    diverge on ties, observed with price = odd·128 at DECIMAL(12,8)).
    Products/sums of DECIMAL(10,0) integers are exact in both engines,
    and with |x| ≲ 500, Σx² stays < 2⁵³ up to ~10¹⁰ rows — the final
    decimal→double conversions are exact, hence hash-stable. The ~9-bit
    quantization perturbs r by O(1e-5) — noise, not estimate error,
    since both engines (and the oracle) see the identical quantized
    multiset."""
    return F.round(F.col(col) * F.lit(prescale), 0).cast("decimal(10,0)")


def _quantized_sql(expr: str, prescale: float) -> str:
    return f"CAST(round(({expr}) * {prescale!r}, 0) AS DECIMAL(10,0))"


def _fold_sql(term: str) -> str:
    """Sequential double fold of ``term`` (an expression over list
    element ``e``) across the date-sorted pair list — same fold order
    as Spark's ``F.aggregate`` over ``sort_array``, so every partial
    double sum is bit-identical across engines."""
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(a, e -> {term})), (p, q) -> p + q)"
    )


@query(
    "autocorr_daily_revenue_lag7",
    oracle=f"""
WITH daily AS (
    SELECT date_trunc('day', o_orderdate) AS d,
           {money_sum_sql('o_totalprice')} AS revenue
    FROM orders GROUP BY 1
),
pairs AS (
    SELECT d, revenue AS y,
           lag(revenue, 7) OVER (ORDER BY d) AS x
    FROM daily
),
l AS (
    SELECT list_sort(list(struct_pack(d := d, x := x, y := y))) AS a
    FROM pairs WHERE x IS NOT NULL
),
m AS (
    SELECT CAST(len(a) AS DOUBLE) AS n,
           {_fold_sql('e.x')} AS sx,
           {_fold_sql('e.y')} AS sy,
           {_fold_sql('e.x * e.y')} AS sxy,
           {_fold_sql('e.x * e.x')} AS sxx,
           {_fold_sql('e.y * e.y')} AS syy
    FROM l
)
SELECT CAST(n AS BIGINT) AS n_pairs,
       {_pearson_from_sums_sql('n', 'sx', 'sy', 'sxy', 'sxx', 'syy')} AS autocorr_lag7
FROM m
""",
)
def autocorr_daily_revenue_lag7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-seasonality detector: Pearson correlation between daily
    revenue and the same series shifted 7 days. The daily rollup is
    the usual one-shuffle decimal-exact aggregate; the lag window runs
    over the DAY-GRAIN series (≤ a few thousand rows at any fact
    scale — a calendar, not the fact table), so its single-partition
    window is a non-issue, and the moment sums fold over the
    DATE-SORTED pair array in plain double arithmetic — same fold
    order in both engines, every op correctly rounded, so the hash is
    stable at full precision with no quantization (the tv_distance
    sorted-fold pattern; right only because the series is
    calendar-sized — for fact-sized inputs use ``_quantized``
    moments as in ``corr_matrix_lineitem``). For thousands of
    independent series, add the series key to the groupBy and the
    same plan parallelizes."""
    orders = load_spread(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("d")
    ).agg(money_sum("o_totalprice").alias("revenue"))
    w = Window.orderBy("d")
    pairs = daily.select(
        "d",
        F.col("revenue").alias("y"),
        F.lag("revenue", 7).over(w).alias("x"),
    ).where(F.col("x").isNotNull())
    arr = pairs.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("d"), F.col("x"), F.col("y")))
        ).alias("a")
    )

    def fold(term):
        return F.aggregate(F.col("a"), F.lit(0.0), lambda acc, e: acc + term(e))

    m = arr.select(
        F.size("a").cast("double").alias("n"),
        fold(lambda e: e["x"]).alias("sx"),
        fold(lambda e: e["y"]).alias("sy"),
        fold(lambda e: e["x"] * e["y"]).alias("sxy"),
        fold(lambda e: e["x"] * e["x"]).alias("sxx"),
        fold(lambda e: e["y"] * e["y"]).alias("syy"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_pairs"),
        _pearson_from_sums(
            F.col("n"), F.col("sx"), F.col("sy"),
            F.col("sxy"), F.col("sxx"), F.col("syy"),
        ).alias("autocorr_lag7"),
    )


_ACF_MAX_LAG = 14


@query(
    "acf_panel_daily_revenue",
    oracle=f"""
WITH daily AS (
    SELECT date_trunc('day', o_orderdate) AS d,
           {money_sum_sql('o_totalprice')} AS revenue
    FROM orders GROUP BY 1
),
ks AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS k),
pairs AS (
    SELECT ks.k, a.d AS d, a.revenue AS x, b.revenue AS y
    FROM daily a
    CROSS JOIN ks
    JOIN daily b ON b.d = a.d + ks.k * (INTERVAL 1 DAY)
),
l AS (
    SELECT k, list_sort(list(struct_pack(d := d, x := x, y := y))) AS a
    FROM pairs GROUP BY k
),
m AS (
    SELECT k, CAST(len(a) AS DOUBLE) AS n,
           {_fold_sql('e.x')} AS sx,
           {_fold_sql('e.y')} AS sy,
           {_fold_sql('e.x * e.y')} AS sxy,
           {_fold_sql('e.x * e.x')} AS sxx,
           {_fold_sql('e.y * e.y')} AS syy
    FROM l
)
SELECT CAST(k AS BIGINT) AS lag,
       CAST(n AS BIGINT) AS n_pairs,
       {_pearson_from_sums_sql('n', 'sx', 'sy', 'sxy', 'sxx', 'syy')} AS acf
FROM m
""",
)
def acf_panel_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function panel: Pearson autocorrelation of daily
    revenue at every lag 1..14 in ONE pass — the seasonality fingerprint
    (a weekly cycle shows as peaks at 7 and 14) that generalizes
    `autocorr_daily_revenue_lag7` from a point probe to the full
    correlogram. Pair generation is the explode+equi-join device (the
    windowed-trend plan): the calendar-grain series crosses a 14-row
    literal lag set and equi-joins itself on the shifted date — an
    O(days·L) hash join, never a theta join and never one window per
    lag. Per-lag moment sums fold over the DATE-SORTED pair array
    (identical fold order both engines, every op correctly rounded), so
    the hash is stable at full precision — valid because the grain is a
    calendar; fact-sized series would use `_quantized` moments. 100 TB
    shape: one fact shuffle for the daily rollup; everything after runs
    on ≤ days·14 rows."""
    orders = load_spread(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("d")
    ).agg(money_sum("o_totalprice").alias("revenue"))
    ks = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("k")
    )
    a = daily.select(F.col("d"), F.col("revenue").alias("x"))
    b = daily.select(
        F.col("d").alias("d2"), F.col("revenue").alias("y")
    )
    pairs = (
        a.crossJoin(F.broadcast(ks))
        .join(
            b,
            F.col("d2")
            == F.col("d") + F.make_interval(days=F.col("k")),
        )
        .select("k", "d", "x", "y")
    )
    arr = pairs.groupBy("k").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("d"), F.col("x"), F.col("y")))
        ).alias("a")
    )

    def fold(term):
        return F.aggregate(
            F.col("a"), F.lit(0.0), lambda acc, e: acc + term(e)
        )

    m = arr.select(
        "k",
        F.size("a").cast("double").alias("n"),
        fold(lambda e: e["x"]).alias("sx"),
        fold(lambda e: e["y"]).alias("sy"),
        fold(lambda e: e["x"] * e["y"]).alias("sxy"),
        fold(lambda e: e["x"] * e["x"]).alias("sxx"),
        fold(lambda e: e["y"] * e["y"]).alias("syy"),
    )
    return m.select(
        F.col("k").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        _pearson_from_sums(
            F.col("n"), F.col("sx"), F.col("sy"),
            F.col("sxy"), F.col("sxx"), F.col("syy"),
        ).alias("acf"),
    )


_CORR_PAIRS = [
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_quantity", "l_tax"),
    ("l_extendedprice", "l_discount"),
    ("l_extendedprice", "l_tax"),
    ("l_discount", "l_tax"),
]


# Per-variable power-of-two prescales (Pearson is invariant to them):
# bring each measure's magnitude into the low hundreds before integer
# quantization (see _quantized) so moment sums stay exactly
# double-convertible even at 1000x fact scale.
_CORR_PRESCALE = {
    "l_quantity": 8.0,
    "l_extendedprice": 2.0 ** -8,
    "l_discount": 4096.0,
    "l_tax": 4096.0,
}


def _corr_matrix_oracle() -> str:
    scaled_cols = ", ".join(
        f"{_quantized_sql(c, s)} AS x_{c}" for c, s in _CORR_PRESCALE.items()
    )
    moment_cols = []
    for c in _CORR_PRESCALE:
        moment_cols.append(f"CAST(sum(x_{c}) AS DOUBLE) AS s_{c}")
        moment_cols.append(f"CAST(sum(x_{c} * x_{c}) AS DOUBLE) AS ss_{c}")
    for a, b in _CORR_PAIRS:
        moment_cols.append(
            f"CAST(sum(x_{a} * x_{b}) AS DOUBLE) AS sp_{a}_{b}"
        )
    selects = []
    for a, b in _CORR_PAIRS:
        r = _pearson_from_sums_sql(
            "n", f"s_{a}", f"s_{b}", f"sp_{a}_{b}", f"ss_{a}", f"ss_{b}"
        )
        selects.append(f"SELECT '{a}' AS col_x, '{b}' AS col_y, {r} AS r FROM m")
    return (
        f"WITH scaled AS (SELECT {scaled_cols} FROM lineitem), "
        "m AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
        + ", ".join(moment_cols)
        + " FROM scaled) "
        + " UNION ALL ".join(selects)
    )


@query("corr_matrix_lineitem", oracle=_corr_matrix_oracle())
def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the four lineitem measures in a
    SINGLE aggregate pass (15 decimal moment sums → 6 correlations),
    long-form (col_x, col_y, r) output. The one-pass-moments shape is
    the scale-correct one: one scan + one partial-agg exchange however
    many measure pairs you add, vs ``F.corr`` per pair which is also
    float-accumulation order-sensitive — exact decimal moments keep
    the hash oracle stable. The 6-row long-form build explodes a
    literal struct array over the 1-row moments frame — ONE scan and
    ONE aggregate in the physical plan (a union of per-pair selects
    re-scans per branch; pinned by the plan test)."""
    li = load_spread(spark, sf_dir, "lineitem")
    scaled = li.select(
        *[
            _quantized(c, s).alias(f"x_{c}")
            for c, s in _CORR_PRESCALE.items()
        ]
    )
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in _CORR_PRESCALE:
        d = F.col(f"x_{c}")
        aggs.append(F.sum(d).cast("double").alias(f"s_{c}"))
        aggs.append(F.sum(d * d).cast("double").alias(f"ss_{c}"))
    for a, b in _CORR_PAIRS:
        da, db = F.col(f"x_{a}"), F.col(f"x_{b}")
        aggs.append(F.sum(da * db).cast("double").alias(f"sp_{a}_{b}"))
    m = scaled.agg(*aggs)
    # One explode over a literal struct array turns the 1-row moments
    # frame into the 6-row long form — a union of per-pair selects would
    # re-plan (and re-scan) the aggregate per branch.
    pair_structs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                _pearson_from_sums(
                    F.col("n"), F.col(f"s_{a}"), F.col(f"s_{b}"),
                    F.col(f"sp_{a}_{b}"), F.col(f"ss_{a}"), F.col(f"ss_{b}"),
                ).alias("r"),
            )
            for a, b in _CORR_PAIRS
        ]
    )
    return m.select(F.explode(pair_structs).alias("p")).select(
        "p.col_x", "p.col_y", "p.r"
    )


# log10(1 + 1/d) for d = 1..9, precomputed once in Python so BOTH engines
# compare against the identical literal — no cross-engine log10 rounding.
_BENFORD = {
    1: 0.301029995664,
    2: 0.176091259056,
    3: 0.124938736608,
    4: 0.096910013008,
    5: 0.079181246048,
    6: 0.066946789631,
    7: 0.057991946978,
    8: 0.051152522447,
    9: 0.045757490561,
}


def _benford_case_sql() -> str:
    # String-parsed DOUBLE literals: a bare decimal literal is DECIMAL
    # typed in DuckDB (a driver-canon hazard as an output column, and
    # decimal->double conversion is not the same op as the correctly
    # rounded string->double parse both engines share).
    whens = " ".join(
        f"WHEN {d} THEN CAST('{p!r}' AS DOUBLE)" for d, p in _BENFORD.items()
    )
    return f"CASE digit {whens} END"


@query(
    "benford_first_digit_orders",
    oracle=f"""
WITH digits AS (
    SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
                AS BIGINT) AS digit
    FROM orders WHERE o_totalprice >= 1
),
cnt AS (SELECT digit, count(*) AS n FROM digits GROUP BY digit),
tot AS (SELECT sum(n) AS t FROM cnt)
SELECT digit, n,
       CAST(n AS DOUBLE) / t AS share,
       {_benford_case_sql()} AS benford_expected,
       abs(CAST(n AS DOUBLE) / t - ({_benford_case_sql()})) AS abs_dev
FROM cnt CROSS JOIN tot
""",
)
def benford_first_digit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law DQ screen on order totals: distribution of the
    first significant digit vs log10(1+1/d). Fabricated/synthetic
    monetary data flunks this; it's the classic forensic-accounting
    check, here as a 9-row aggregate. The first digit comes from the
    DECIMAL(18,2) string form — decimal rendering is exact and
    identical across engines, where double→string or log10-based digit
    extraction is not. One hash aggregate to 9 rows + a broadcast
    1-row total: nothing here grows with the fact table."""
    orders = load_spread(spark, sf_dir, "orders")
    digits = orders.where(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    cnt = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.agg(F.sum("n").alias("t"))
    expected = F.element_at(
        F.create_map(
            *[F.lit(x) for d, p in _BENFORD.items() for x in (d, p)]
        ),
        F.col("digit").cast("int"),
    )
    share = F.col("n").cast("double") / F.col("t")
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            share.alias("share"),
            expected.alias("benford_expected"),
            F.abs(share - expected).alias("abs_dev"),
        )
    )


@query(
    "interpolate_hourly_signup_value",
    oracle=f"""
WITH obs AS (
    SELECT date_trunc('hour', ts) AS h, {money_sum_sql('value')} AS v
    FROM events WHERE event_type = 'signup' GROUP BY 1
),
bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM obs),
grid AS (
    SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
),
joined AS (
    SELECT grid.h,
           obs.v,
           CAST(date_diff('hour', (SELECT h0 FROM bounds), grid.h) AS BIGINT) AS idx
    FROM grid LEFT JOIN obs ON grid.h = obs.h
),
anchored AS (
    SELECT h, v, idx,
           last_value(v IGNORE NULLS) OVER
               (ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS pv,
           last_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS) OVER
               (ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS pi,
           first_value(v IGNORE NULLS) OVER
               (ORDER BY idx ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS nv,
           first_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS) OVER
               (ORDER BY idx ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS ni
    FROM joined
)
SELECT h, (v IS NOT NULL) AS observed,
       CASE WHEN v IS NOT NULL THEN v
            ELSE pv + (nv - pv) * (CAST(idx - pi AS DOUBLE)
                                   / CAST(ni - pi AS DOUBLE))
       END AS value_interp
FROM anchored
""",
)
def interpolate_hourly_signup_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of a sparse series onto a dense hourly
    grid — the resample step LOCF can't express (complements
    ``locf_forward_fill_events``): missing hours get
    prev + (next−prev)·(Δ/span) from the bracketing observations.
    Grid = sequence(min,max) exploded (no driver loop); anchors come
    from two ignore-nulls windows (forward last + backward first).
    Grid endpoints ARE observations, so anchors always exist. The
    interpolation fraction divides exact integer hour indexes — every
    float op correctly rounded, hash-stable. Single series ⇒ one
    window partition; for per-key grids add the key to partitionBy and
    build per-key bounds, same plan."""
    ev = load_spread(spark, sf_dir, "events")
    obs = (
        ev.where(F.col("event_type") == "signup")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(money_sum("value").alias("v"))
    )
    bounds = obs.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
        "h0",
    )
    joined = grid.join(obs, "h", "left").select(
        "h",
        "v",
        (
            (F.unix_timestamp("h") - F.unix_timestamp("h0")) / 3600
        )
        .cast("long")
        .alias("idx"),
    )
    wb = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    wf = Window.orderBy("idx").rowsBetween(0, Window.unboundedFollowing)
    obs_idx = F.when(F.col("v").isNotNull(), F.col("idx"))
    anchored = joined.select(
        "h",
        "v",
        "idx",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_idx, ignorenulls=True).over(wb).alias("pi"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_idx, ignorenulls=True).over(wf).alias("ni"),
    )
    frac = (F.col("idx") - F.col("pi")).cast("double") / (
        F.col("ni") - F.col("pi")
    ).cast("double")
    return anchored.select(
        "h",
        F.col("v").isNotNull().alias("observed"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
        .alias("value_interp"),
    )


@query(
    "decile_bins_order_totals",
    oracle=f"""
WITH binned AS (
    SELECT o_totalprice,
           ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
    FROM orders
)
SELECT decile,
       count(*) AS n,
       CAST(min(o_totalprice) AS DOUBLE) AS lo,
       CAST(max(o_totalprice) AS DOUBLE) AS hi,
       {money_sum_sql('o_totalprice')} AS mass
FROM binned GROUP BY decile
""",
)
def decile_bins_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile binning of order totals — the quantile-
    bucketize feature step — with per-bin count, edges, and exact-
    decimal mass. ``ntile`` over (value, key) is fully deterministic
    (unique tiebreak), same definition in both engines. The global
    ntile costs ONE range-partitioned sort — computed by
    ``operators/rank.py:global_ntile`` (bucketed two-phase offset rank + the
    closed-form ntile bucket from the global row number), NOT an
    unpartitioned window, so no row funnels through a single task; at
    100 TB you could also swap in approx_percentile edges + a
    broadcast range-join (see ``histogram_order_totals``) when exact
    equi-depth edges aren't required."""
    from stadvdb_olap_spark.operators.rank import global_ntile

    orders = load_spread(spark, sf_dir, "orders")
    binned = global_ntile(
        orders.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        10,
        bucket=F.floor(F.col("o_totalprice") / 10000).cast("long"),
        out="decile",
    ).select("o_totalprice", "decile")
    return binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
        money_sum("o_totalprice").alias("mass"),
    )


@query(
    "gini_customer_revenue",
    oracle=f"""
WITH cust AS (
    SELECT o_custkey, {money_sum_sql('o_totalprice')} AS revenue
    FROM orders GROUP BY o_custkey
),
hist AS (
    SELECT CAST(round(revenue * {2.0 ** -12!r}, 0) AS BIGINT) AS v,
           count(*) AS c
    FROM cust GROUP BY 1
),
cum AS (
    SELECT v, c,
           coalesce(sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS fprev
    FROM hist
),
l AS (
    SELECT list_sort(list(struct_pack(v := v, c := c, fprev := fprev))) AS a
    FROM cum
),
m AS (
    SELECT
      list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(a,
          e -> CAST(e.c AS DOUBLE))), (p, q) -> p + q) AS n,
      list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(a,
          e -> CAST(e.v AS DOUBLE) * CAST(e.c AS DOUBLE))), (p, q) -> p + q) AS sx,
      list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(a,
          e -> CAST(e.v AS DOUBLE) * (CAST(e.c AS DOUBLE) * CAST(e.fprev AS DOUBLE)
               + CAST(e.c AS DOUBLE) * (CAST(e.c AS DOUBLE) + 1) / 2.0))),
          (p, q) -> p + q) AS skx
    FROM l
)
SELECT CAST(n AS BIGINT) AS n_customers,
       2.0 * skx / (n * sx) - (n + 1) / n AS gini
FROM m
""",
)
def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer lifetime revenue — the standard
    concentration/inequality KPI ("do 1% of customers drive 50% of
    revenue?"). Scale design: the only fact-sized passes are two hash
    aggregates (customer rollup, then a FIXED-RESOLUTION integer
    histogram via the ``_quantized`` device — per-customer revenue
    doesn't grow with fact scale, so the static 2^-12 prescale holds);
    the rank-weighted Gini sum then folds over the SORTED histogram
    array (≤ a few thousand rows at ANY data size — resolution-bounded,
    not data-bounded). Fold order is pinned on both engines, every
    float op correctly rounded ⇒ hash-stable, with no >2^53 decimal
    conversions anywhere. Uses the grouped-ties rank identity
    Σrank·x = Σ_levels v·(c·F_prev + c(c+1)/2)."""
    orders = load_spread(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        money_sum("o_totalprice").alias("revenue")
    )
    hist = (
        cust.select(
            F.round(F.col("revenue") * F.lit(2.0 ** -12), 0)
            .cast("long")
            .alias("v")
        )
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = (
        Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.select(
        "v", "c", F.coalesce(F.sum("c").over(wcum), F.lit(0)).alias("fprev")
    )
    arr = cum.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("v"), F.col("c"), F.col("fprev")))
        ).alias("a")
    )

    def fold(term):
        return F.aggregate(F.col("a"), F.lit(0.0), lambda acc, e: acc + term(e))

    c_d = lambda e: e["c"].cast("double")  # noqa: E731
    m = arr.select(
        fold(c_d).alias("n"),
        fold(lambda e: e["v"].cast("double") * c_d(e)).alias("sx"),
        fold(
            lambda e: e["v"].cast("double")
            * (
                c_d(e) * e["fprev"].cast("double")
                + c_d(e) * (c_d(e) + F.lit(1.0)) / F.lit(2.0)
            )
        ).alias("skx"),
    )
    n, sx, skx = F.col("n"), F.col("sx"), F.col("skx")
    return m.select(
        n.cast("long").alias("n_customers"),
        (F.lit(2.0) * skx / (n * sx) - (n + F.lit(1.0)) / n).alias("gini"),
    )


@query(
    "weighted_median_price_by_flag",
    oracle="""
WITH w AS (
    SELECT l_returnflag, l_extendedprice,
           CAST(l_quantity AS BIGINT) AS qty,
           sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cumw,
           sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag
           ) AS total
    FROM lineitem
)
SELECT l_returnflag,
       CAST(min(l_extendedprice) AS DOUBLE) AS weighted_median_price,
       CAST(min(total) AS BIGINT) AS total_weight
FROM w WHERE 2 * cumw >= total
GROUP BY l_returnflag
""",
)
def weighted_median_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: the smallest
    price whose cumulative quantity weight reaches half the group
    total (lower weighted median). Selection is by EXACT integer
    weight comparisons over a deterministically ordered cumulative sum
    (price + key tiebreaks), so the answer is a raw input value — no
    float accumulation in the result at all. One exchange on the group
    key; within-group sort parallelizes across groups. At 100 TB with
    few huge groups, swap in a two-pass bucketed search (histogram on
    price buckets, then resolve inside the straddling bucket) — same
    exact-comparison semantics, no global sort."""
    li = load_spread(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    wcum = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy("l_returnflag")
    w = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum(qty).over(wcum).alias("cumw"),
        F.sum(qty).over(wall).alias("total"),
    )
    return (
        w.where(F.lit(2) * F.col("cumw") >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").cast("double").alias("weighted_median_price"),
            F.min("total").cast("long").alias("total_weight"),
        )
    )


@query(
    "survival_weekly_users",
    oracle="""
WITH span AS (
    SELECT user_id,
           date_diff('week', date_trunc('week', min(ts)),
                     date_trunc('week', max(ts))) AS wk
    FROM events GROUP BY user_id
),
horizon AS (SELECT max(wk) AS h, count(*) AS total FROM span),
cnt AS (SELECT wk, count(*) AS c FROM span GROUP BY wk),
grid AS (
    SELECT unnest(generate_series(0, (SELECT h FROM horizon))) AS week
),
risk AS (
    SELECT g.week,
           coalesce(c.c, 0) AS c,
           CASE WHEN g.week < (SELECT h FROM horizon)
                THEN coalesce(c.c, 0) ELSE 0 END AS d,
           sum(coalesce(c.c, 0)) OVER (
               ORDER BY g.week DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS n_risk
    FROM grid g LEFT JOIN cnt c ON c.wk = g.week
),
factors AS (
    SELECT week, d, n_risk,
           1 - CAST(d AS DOUBLE) / n_risk AS f
    FROM risk
),
l AS (
    SELECT list_sort(list(struct_pack(week := week, f := f))) AS a FROM factors
)
SELECT r.week, r.d AS churned, CAST(r.n_risk AS BIGINT) AS n_risk,
       list_reduce(
           list_prepend(CAST(1 AS DOUBLE),
               list_transform(
                   list_filter(a, e -> e.week <= r.week), e -> e.f)),
           (p, q) -> p * q) AS survival
FROM factors r CROSS JOIN l
""",
)
def survival_weekly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier-style weekly survival/churn curve: per user, active
    span in weeks (first->last event week); users whose span ends
    before the cohort horizon count as churn events at that week, those
    reaching the horizon are right-censored. S(w) = prod_{k<=w}
    (1 - d_k / n_risk_k) — the classic retention curve with censoring,
    which the cohort matrix (``cohort_weekly_retention``) doesn't
    model. Scale shape: one user-keyed aggregate is the only fact-sized
    pass; the curve itself lives on the CALENDAR week grid, so the
    reverse-cumulative risk window and the prefix product (sorted-fold
    over the week-ordered factor array, filter preserves order — every
    float op correctly rounded, identical in both engines) are
    resolution-bounded, not data-bounded."""
    ev = load_spread(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        (
            F.floor(
                (
                    F.unix_timestamp(F.date_trunc("week", F.max("ts")))
                    - F.unix_timestamp(F.date_trunc("week", F.min("ts")))
                )
                / (7 * 86400)
            )
        ).cast("long").alias("wk")
    )
    horizon = span.agg(F.max("wk").alias("h"))
    cnt = span.groupBy("wk").agg(F.count(F.lit(1)).alias("c"))
    grid = horizon.select(
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("h"))).alias("week"),
        "h",
    )
    wrev = Window.orderBy(F.col("week").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = (
        grid.join(cnt, grid.week == cnt.wk, "left")
        .select(
            "week",
            "h",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
        .select(
            "week",
            F.when(F.col("week") < F.col("h"), F.col("c"))
            .otherwise(F.lit(0))
            .alias("d"),
            F.sum("c").over(wrev).alias("n_risk"),
        )
    )
    factors = risk.select(
        "week",
        "d",
        "n_risk",
        (F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")).alias("f"),
    )
    arr = factors.agg(
        F.sort_array(F.collect_list(F.struct("week", "f"))).alias("a")
    )
    prefix = F.filter(F.col("a"), lambda e: e["week"] <= F.col("week"))
    return (
        factors.crossJoin(F.broadcast(arr))
        .select(
            "week",
            F.col("d").alias("churned"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.aggregate(
                prefix, F.lit(1.0), lambda acc, e: acc * e["f"]
            ).alias("survival"),
        )
    )



@query(
    "basket_part_pairs_lift",
    oracle="""
WITH baskets AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM baskets),
part_freq AS (
    SELECT l_partkey, count(*) AS c FROM baskets GROUP BY l_partkey
),
pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS together
    FROM baskets a JOIN baskets b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
)
SELECT p.part_a, p.part_b, p.together,
       CAST(p.together AS DOUBLE) / fa.c AS confidence_a_to_b,
       (CAST(p.together AS DOUBLE) * n.n) / (CAST(fa.c AS DOUBLE) * fb.c)
           AS lift
FROM pairs p
JOIN part_freq fa ON fa.l_partkey = p.part_a
JOIN part_freq fb ON fb.l_partkey = p.part_b
CROSS JOIN n_orders n
WHERE p.together >= 2
""",
)
def basket_part_pairs_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining over order baskets: support,
    confidence, and lift for every part pair co-purchased in >= 2
    orders. The pair generation self-joins ON THE ORDER KEY, so the
    blow-up is bounded by (lines per order)^2 — a per-basket constant,
    never corpus-quadratic (same blocking discipline as the text
    collocation twin ``term_lift_scores``). Lift divides exact BIGINT
    counts in a fixed double expression — hash-stable with no decimal
    machinery."""
    li = load_spread(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = baskets.agg(
        F.countDistinct("l_orderkey").alias("n")
    )
    part_freq = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("together"))
        .where(F.col("together") >= 2)
    )
    fa = part_freq.select(
        F.col("l_partkey").alias("part_a"), F.col("c").alias("ca")
    )
    fb = part_freq.select(
        F.col("l_partkey").alias("part_b"), F.col("c").alias("cb")
    )
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "together",
            (F.col("together").cast("double") / F.col("ca")).alias(
                "confidence_a_to_b"
            ),
            (
                (F.col("together").cast("double") * F.col("n"))
                / (F.col("ca").cast("double") * F.col("cb"))
            ).alias("lift"),
        )
    )


@query(
    "rfm_segments_customers",
    oracle="""
WITH maxd AS (SELECT max(o_orderdate) AS md FROM orders),
rfm AS (
    SELECT o_custkey,
           date_diff('day', max(o_orderdate), (SELECT md FROM maxd))
               AS recency_days,
           count(*) AS frequency,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS monetary
    FROM orders GROUP BY o_custkey
)
SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
       frequency, monetary,
       ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
       ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
       ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
FROM rfm
""",
)
def rfm_segments_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the canonical customer-value model: days since
    last order (recency), order count (frequency), exact-decimal
    lifetime revenue (monetary), each quintiled with ntile over a
    deterministic (value, custkey) order. One customer-keyed aggregate
    over the fact; the three ntiles each cost a total-order sort of the
    CUSTOMER table (dimension-sized). At extreme scale swap ntile for
    approx_percentile bucket edges + a broadcast range join, keeping
    the same output contract."""
    orders = load_spread(spark, sf_dir, "orders")
    maxd = orders.agg(F.max("o_orderdate").alias("md"))
    rfm = (
        orders.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("md"), F.max("o_orderdate")).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            money_sum("o_totalprice").alias("monetary"),
        )
    )
    return rfm.select(
        "o_custkey",
        F.col("recency_days").cast("long").alias("recency_days"),
        "frequency",
        "monetary",
        F.ntile(5)
        .over(Window.orderBy("recency_days", "o_custkey"))
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("frequency").desc(), "o_custkey"))
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("monetary").desc(), "o_custkey"))
        .alias("m_score"),
    )


@query(
    "seasonal_decompose_daily_revenue",
    oracle=f"""
WITH daily AS (
    SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
           {money_sum_sql('o_totalprice')} AS revenue
    FROM orders GROUP BY 1
),
trend AS (
    SELECT d, revenue,
           CASE WHEN count(*) OVER w = 7 THEN
               CAST(ROUND(sum(CAST(revenue AS DECIMAL(18,6))) OVER w / 7, 4)
                    AS DOUBLE)
           END AS trend_ma7
    FROM daily
    WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detrended AS (
    SELECT d, revenue, trend_ma7,
           dayofweek(d) AS dow,
           CAST(revenue AS DECIMAL(18,6))
               - CAST(trend_ma7 AS DECIMAL(18,6)) AS resid0
    FROM trend
),
seasonal AS (
    SELECT dow,
           CAST(ROUND(sum(resid0) / count(resid0), 4) AS DOUBLE) AS s
    FROM detrended WHERE resid0 IS NOT NULL GROUP BY dow
)
SELECT t.d, t.revenue, t.trend_ma7, s.s AS seasonal_dow,
       CASE WHEN t.trend_ma7 IS NOT NULL THEN
           CAST(CAST(t.revenue AS DECIMAL(18,6))
                - CAST(t.trend_ma7 AS DECIMAL(18,6))
                - CAST(s.s AS DECIMAL(18,6)) AS DOUBLE)
       END AS residual
FROM detrended t JOIN seasonal s USING (dow)
""",
)
def seasonal_decompose_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue:
    trend = centered 7-day moving average (full windows only),
    seasonal = mean detrended value per weekday, residual = value −
    trend − seasonal. The moving-average and seasonal means fold in
    exact DECIMAL then round to fixed scale (the compat convention), so
    every emitted float is a deterministic function of the input
    multiset. The day-grain series is calendar-sized; the weekday
    seasonal join is a 7-row broadcast — the only fact-sized work is
    the daily rollup. The additive decomposition identity
    (residual = revenue − trend − seasonal in exact decimal) is pinned
    by construction."""
    orders = load_spread(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("d")
    ).agg(money_sum("o_totalprice").alias("revenue"))
    w = Window.orderBy("d").rowsBetween(-3, 3)
    dec6 = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    trend = daily.select(
        "d",
        "revenue",
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.round(F.sum(dec6("revenue")).over(w) / 7, 4).cast("double"),
        ).alias("trend_ma7"),
    )
    detrended = trend.select(
        "d",
        "revenue",
        "trend_ma7",
        F.dayofweek("d").alias("dow"),
        (dec6("revenue") - dec6("trend_ma7")).alias("resid0"),
    )
    seasonal = (
        detrended.where(F.col("resid0").isNotNull())
        .groupBy("dow")
        .agg(
            F.round(F.sum("resid0") / F.count("resid0"), 4)
            .cast("double")
            .alias("s")
        )
    )
    return (
        detrended.join(F.broadcast(seasonal), "dow")
        .select(
            "d",
            "revenue",
            "trend_ma7",
            F.col("s").alias("seasonal_dow"),
            F.when(
                F.col("trend_ma7").isNotNull(),
                (dec6("revenue") - dec6("trend_ma7") - dec6("s")).cast(
                    "double"
                ),
            ).alias("residual"),
        )
    )


_HOLT_ALPHA = 0.5   # binary-exact smoothing constants: multiplication by
_HOLT_BETA = 0.25   # 0.5/0.25 is an exponent shift, one rounding max


def _holt_next_sql(acc: str, x: str) -> str:
    # DOUBLE[2] state [level, trend], NOT a struct: DuckDB's list_reduce
    # rebinds struct accumulator fields SEQUENTIALLY (field 2's acc.l
    # already sees the new level — verified empirically), while list
    # elements all read the pre-step accumulator. Spark's F.aggregate
    # struct fold has the correct snapshot semantics, so only the twin
    # needs the list encoding.
    a, b = _HOLT_ALPHA, _HOLT_BETA
    newl = f"({a} * {x}[1] + {1 - a} * ({acc}[1] + {acc}[2]))"
    newb = f"({b} * ({newl} - {acc}[1]) + {1 - b} * {acc}[2])"
    return f"[{newl}, {newb}]"


@query(
    "holt_forecast_daily_revenue",
    oracle=f"""
WITH daily AS (
    SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
           {money_sum_sql('o_totalprice')} AS revenue
    FROM orders GROUP BY 1
),
l AS (
    SELECT list_transform(
               list_sort(list(struct_pack(d := d, v := revenue))),
               e -> [e.v, CAST(0 AS DOUBLE)]) AS a
    FROM daily
),
state AS (
    SELECT len(a) AS n,
           list_reduce(a, (acc, x) -> {_holt_next_sql('acc', 'x')}) AS s
    FROM l
)
SELECT h.h AS horizon_days,
       CAST(n AS BIGINT) AS n_days,
       s[1] AS level,
       s[2] AS trend,
       s[1] + h.h * s[2] AS forecast
FROM state, (SELECT unnest(generate_series(1, 7)) AS h) h
""",
)
def holt_forecast_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential-smoothing forecast of daily revenue:
    level/trend recurrence folded over the DATE-SORTED series (l0 =
    first value, b0 = 0; alpha=0.5, beta=0.25 — binary-exact constants),
    then 1..7-day-ahead forecasts level + h*trend. A sequential
    recurrence is the textbook "can't parallelize" op — but the series
    is CALENDAR-sized, so the sorted-fold runs on one row of state
    after the one fact-sized daily rollup; both engines fold the
    identical expression tree in the identical order, so even an
    inherently sequential statistic stays hash-checkable. For per-key
    forecasting, the same fold runs per group in a grouped aggregate."""
    orders = load_spread(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("d")
    ).agg(money_sum("o_totalprice").alias("revenue"))
    arr = daily.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("d", F.col("revenue").alias("v")))),
            lambda e: F.struct(e["v"].alias("l"), F.lit(0.0).alias("b")),
        ).alias("a")
    )
    a, b = _HOLT_ALPHA, _HOLT_BETA

    def step(acc, x):
        newl = F.lit(a) * x["l"] + F.lit(1 - a) * (acc["l"] + acc["b"])
        newb = F.lit(b) * (newl - acc["l"]) + F.lit(1 - b) * acc["b"]
        return F.struct(newl.alias("l"), newb.alias("b"))

    state = arr.select(
        F.size("a").alias("n"),
        F.aggregate(
            F.slice("a", 2, F.size("a") - 1),
            F.element_at(F.col("a"), 1),
            step,
        ).alias("s"),
    )
    return state.select(
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("horizon_days"),
        F.col("n").cast("long").alias("n_days"),
        F.col("s")["l"].alias("level"),
        F.col("s")["b"].alias("trend"),
        (F.col("s")["l"] + F.col("horizon_days") * F.col("s")["b"]).alias(
            "forecast"
        ),
    )


@query(
    "max_concurrent_sessions_hourly",
    oracle="""
WITH flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                     OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                THEN 1 ELSE 0 END AS is_new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, session_seq, min(ts) AS s_start, max(ts) AS s_end
    FROM (
        SELECT user_id, ts,
               SUM(is_new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
        FROM flagged
    ) GROUP BY user_id, session_seq
),
bounds AS (
    SELECT s_start AS t, 1 AS delta FROM sessions
    UNION ALL
    SELECT s_end AS t, -1 AS delta FROM sessions
),
swept AS (
    SELECT t, delta,
           CAST(SUM(delta) OVER (
               ORDER BY t, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS concurrency
    FROM bounds
)
SELECT CAST(date_trunc('hour', t) AS TIMESTAMP) AS hour,
       max(concurrency) AS max_concurrent
FROM swept GROUP BY 1
""",
)
def max_concurrent_sessions_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per hour via the classic SWEEP-LINE: session
    intervals (from the 30-minute-gap sessionizer) become +1/-1
    boundary events; a running sum ordered by (t, delta) — the -1
    sorts first on ties, so back-to-back sessions at the same instant
    don't double-count — is the live-session count, maxed per hour
    bucket. This is the algorithmic pattern interval-overlap COUNTING
    needs (vs the pair-join of ``interval_overlap_sessions_bursts``):
    boundaries + prefix sum, never a self-join. The global running sum
    is the honest single-order cost (boundary stream = 2 rows per
    session); at extreme scale, sweep per shard-key then merge per-hour
    maxima with per-shard boundary offsets."""
    ev = load_spread(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                (
                    F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                )
                > 1800 * 1000 * 1000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new_session"),
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = (
        flagged.select(
            "user_id",
            "ts",
            F.sum("is_new_session").over(run).alias("session_seq"),
        )
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    bounds = sess.select(
        F.col("s_start").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        sess.select(F.col("s_end").alias("t"), F.lit(-1).alias("delta"))
    )
    sweep = Window.orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, 0
    )
    swept = bounds.select(
        "t",
        F.sum("delta").over(sweep).cast("long").alias("concurrency"),
    )
    return swept.groupBy(
        F.date_trunc("hour", "t").alias("hour")
    ).agg(F.max("concurrency").alias("max_concurrent"))


@query(
    "abc_classification_parts",
    oracle=f"""
WITH part_rev AS (
    SELECT l_partkey, {money_sum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM lineitem GROUP BY l_partkey
),
ranked AS (
    SELECT l_partkey, revenue,
           sum(CAST(revenue AS DECIMAL(18,6))) OVER (
               ORDER BY revenue DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev,
           sum(CAST(revenue AS DECIMAL(18,6))) OVER () AS total_rev
    FROM part_rev
)
SELECT l_partkey, revenue,
       CAST(cum_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) AS cum_share,
       CASE WHEN CAST(cum_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) <= 0.8
                THEN 'A'
            WHEN CAST(cum_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) <= 0.95
                THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
""",
)
def abc_classification_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification: parts ranked by revenue,
    cumulative-share thresholds 80%/95% assign classes A/B/C ("which
    20% of parts drive 80% of revenue"). The cumulative sum runs in
    exact DECIMAL over a deterministic (revenue desc, partkey) order,
    and each share is ONE double division of exact decimals —
    hash-stable. One fact aggregate + one part-table-sized total-order
    window (the honest Pareto cost; at extreme part counts, bucket by
    approx-quantile revenue bands first and rank within bands)."""
    li = load_spread(spark, sf_dir, "lineitem")
    part_rev = li.groupBy("l_partkey").agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )
    wcum = Window.orderBy(F.col("revenue").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    dec = F.col("revenue").cast("decimal(18,6)")
    ranked = part_rev.select(
        "l_partkey",
        "revenue",
        (
            F.sum(dec).over(wcum).cast("double")
            / F.sum(dec).over(wall).cast("double")
        ).alias("cum_share"),
    )
    return ranked.select(
        "l_partkey",
        "revenue",
        "cum_share",
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@query(
    "cohort_ltv_weekly",
    oracle=f"""
WITH first_order AS (
    SELECT o_custkey,
           CAST(date_trunc('week', min(o_orderdate)) AS TIMESTAMP) AS cohort_week
    FROM orders GROUP BY o_custkey
),
aged AS (
    SELECT f.cohort_week,
           date_diff('week', f.cohort_week,
                     CAST(date_trunc('week', o.o_orderdate) AS TIMESTAMP))
               AS age_weeks,
           o.o_totalprice
    FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
),
cohort_size AS (
    SELECT cohort_week, count(*) AS n_customers FROM first_order GROUP BY 1
),
weekly AS (
    SELECT cohort_week, age_weeks,
           sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
    FROM aged GROUP BY 1, 2
),
cum AS (
    SELECT cohort_week, age_weeks,
           sum(rev) OVER (PARTITION BY cohort_week ORDER BY age_weeks
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_rev
    FROM weekly
)
SELECT c.cohort_week, CAST(c.age_weeks AS BIGINT) AS age_weeks,
       s.n_customers,
       CAST(ROUND(c.cum_rev, 2) AS DOUBLE) AS cum_revenue,
       CAST((CAST(ROUND(c.cum_rev, 2) * 100 AS BIGINT) * 10000)
            // s.n_customers AS DOUBLE) / 1e6 AS ltv_per_customer
FROM cum c JOIN cohort_size s USING (cohort_week)
WHERE c.age_weeks <= 12
""",
)
def cohort_ltv_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by first-order
    week, cumulative revenue per cohort at each age (weeks since
    cohort), normalized per customer — the money-side complement to
    ``cohort_weekly_retention``, capped at 12 weeks of age. Revenue
    accumulates in exact DECIMAL inside a (cohort, age-ordered) window
    — age rows per cohort are calendar-bounded. The per-customer rate
    is an exact integer floor-division in micro-dollar units (see the
    inline note: ROUND(double, n) itself is engine-divergent on true
    decimal ties). Two fact-keyed aggregates + a broadcast cohort-size
    join; cohorts parallelize the window."""
    orders = load_spread(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.date_trunc("week", F.min("o_orderdate")).alias("cohort_week")
    )
    aged = orders.join(first, "o_custkey").select(
        "cohort_week",
        (
            F.floor(
                (
                    F.unix_timestamp(F.date_trunc("week", "o_orderdate"))
                    - F.unix_timestamp("cohort_week")
                )
                / (7 * 86400)
            )
        ).alias("age_weeks"),
        "o_totalprice",
    )
    cohort_size = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    weekly = aged.groupBy("cohort_week", "age_weeks").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev")
    )
    wcum = Window.partitionBy("cohort_week").orderBy("age_weeks").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = weekly.select(
        "cohort_week",
        "age_weeks",
        F.sum("rev").over(wcum).alias("cum_rev"),
    ).where(F.col("age_weeks") <= 12)
    return (
        cum.join(F.broadcast(cohort_size), "cohort_week")
        .select(
            "cohort_week",
            F.col("age_weeks").cast("long").alias("age_weeks"),
            "n_customers",
            F.round(F.col("cum_rev"), 2).cast("double").alias("cum_revenue"),
            # exact integer floor-division in micro-dollar units:
            # ROUND(double, n) itself diverges across engines on true
            # decimal ties (Spark rounds the shortest repr, DuckDB the
            # value - hit at cum/8 = x.56375), so the per-customer rate
            # is truncated from exact cents instead of float-rounded
            (
                F.expr(
                    "CAST(CAST(ROUND(cum_rev, 2) * 100 AS BIGINT) * 10000"
                    " DIV n_customers AS DOUBLE)"
                )
                / F.lit(1e6)
            ).alias("ltv_per_customer"),
        )
    )


@query(
    "scalable_exact_median_price",
    oracle="""
WITH ranked AS (
    SELECT l_extendedprice,
           row_number() OVER (
               ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
           count(*) OVER () AS n
    FROM lineitem
)
SELECT CAST(l_extendedprice AS DOUBLE) AS median_price,
       CAST(n AS BIGINT) AS n_rows
FROM ranked WHERE rn = (n + 1) // 2
""",
)
def scalable_exact_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT (lower) median without a global sort — the two-pass bucket
    search that replaces ``ntile``/``percentile``'s total ordering at
    100 TB:

    pass 1: fixed-width bucket histogram (one hash aggregate, ~100
    rows) + cumulative counts locate the bucket holding the median and
    the in-bucket offset;
    pass 2: ONLY that bucket's rows (a pushed-down range filter — a
    fraction of the fact) are sorted to pick the offset-th row.

    Everything is exact integer counting plus a deterministic
    (price, orderkey, linenumber) tiebreak, so the result is a RAW
    input value — bit-identical to the oracle's order-statistic
    formulation, which DOES pay the global sort. The bucket selection
    stays declarative (1-row broadcast join, no driver collect)."""
    li = load_spread(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / 1000).alias("bucket")
    hist = li.select(bucket).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    wcum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wn = Window.partitionBy()
    # target_rn is the INTEGER lower-median rank floor((n+1)/2); the bucket
    # test must use it directly — a fractional (n+1)/2 comparison rejects the
    # correct bucket whenever rank n/2 is that bucket's last row (even n).
    located = (
        hist.select(
            "bucket",
            "c",
            F.coalesce(F.sum("c").over(wcum), F.lit(0)).alias("cum_before"),
            F.sum("c").over(wn).alias("n"),
        )
        .withColumn(
            "target_rn", F.floor((F.col("n") + 1) / 2).cast("long")
        )
        .where(
            (F.col("cum_before") < F.col("target_rn"))
            & ((F.col("cum_before") + F.col("c")) >= F.col("target_rn"))
        )
        .select(
            F.col("bucket").alias("target_bucket"),
            "target_rn",
            "cum_before",
            "n",
        )
    )
    in_bucket = li.select(
        "l_extendedprice", "l_orderkey", "l_linenumber", bucket
    ).join(F.broadcast(located), F.col("bucket") == F.col("target_bucket"))
    wpick = Window.partitionBy("target_bucket").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return (
        in_bucket.withColumn("rn_in", F.row_number().over(wpick))
        .where(
            F.col("rn_in") == (F.col("target_rn") - F.col("cum_before"))
        )
        .select(
            F.col("l_extendedprice").cast("double").alias("median_price"),
            F.col("n").cast("long").alias("n_rows"),
        )
    )


@query(
    "holt_forecast_by_event_type",
    oracle=f"""
WITH daily AS (
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           {money_sum_sql('value')} AS v
    FROM events GROUP BY 1, 2
),
l AS (
    SELECT event_type,
           list_transform(
               list_sort(list(struct_pack(d := d, v := v))),
               e -> [e.v, CAST(0 AS DOUBLE)]) AS a
    FROM daily GROUP BY event_type
),
state AS (
    SELECT event_type, len(a) AS n,
           list_reduce(a, (acc, x) -> {_holt_next_sql('acc', 'x')}) AS s
    FROM l
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       s[1] AS level,
       s[2] AS trend,
       s[1] + 7 * s[2] AS forecast_7d
FROM state
""",
)
def holt_forecast_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED Holt forecasting — the per-key variant the single-series
    query promises: one fold per event_type, all folding in parallel
    inside a grouped aggregate (collect_list per group, not per
    corpus). This is how per-entity forecasting scales: thousands of
    independent series each pay their own calendar-sized fold, keyed
    shuffle only. Same binary-exact constants and DOUBLE[2]-state twin
    as ``holt_forecast_daily_revenue``."""
    ev = load_spread(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(money_sum("value").alias("v"))
    arr = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("d", "v"))),
            lambda e: F.struct(e["v"].alias("l"), F.lit(0.0).alias("b")),
        ).alias("a")
    )
    a, b = _HOLT_ALPHA, _HOLT_BETA

    def step(acc, x):
        newl = F.lit(a) * x["l"] + F.lit(1 - a) * (acc["l"] + acc["b"])
        newb = F.lit(b) * (newl - acc["l"]) + F.lit(1 - b) * acc["b"]
        return F.struct(newl.alias("l"), newb.alias("b"))

    state = arr.select(
        "event_type",
        F.size("a").alias("n"),
        F.aggregate(
            F.slice("a", 2, F.size("a") - 1),
            F.element_at(F.col("a"), 1),
            step,
        ).alias("s"),
    )
    return state.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("s")["l"].alias("level"),
        F.col("s")["b"].alias("trend"),
        (F.col("s")["l"] + F.lit(7) * F.col("s")["b"]).alias("forecast_7d"),
    )


@query(
    "wow_growth_revenue",
    oracle=f"""
WITH weekly AS (
    SELECT CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS wk,
           {money_sum_sql('o_totalprice')} AS revenue
    FROM orders GROUP BY 1
)
SELECT wk, revenue,
       lag(revenue) OVER (ORDER BY wk) AS prev_revenue,
       CASE WHEN lag(revenue) OVER (ORDER BY wk) IS NULL THEN NULL
            ELSE (revenue - lag(revenue) OVER (ORDER BY wk))
                 / lag(revenue) OVER (ORDER BY wk)
       END AS wow_growth
FROM weekly
""",
)
def wow_growth_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth: the period-comparison staple.
    Weekly totals are exact-decimal (money_sum); the growth rate is a
    single IEEE division of two scale-2 doubles with NO final rounding
    — correctly-rounded ops only, so no ROUND-tie hazard (see
    cohort_ltv_weekly for why that matters). Calendar-sized lag
    window after one fact aggregate."""
    orders = load_spread(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        F.date_trunc("week", "o_orderdate").alias("wk")
    ).agg(money_sum("o_totalprice").alias("revenue"))
    w = Window.orderBy("wk")
    prev = F.lag("revenue").over(w)
    return weekly.select(
        "wk",
        "revenue",
        prev.alias("prev_revenue"),
        F.when(
            prev.isNotNull(), (F.col("revenue") - prev) / prev
        ).alias("wow_growth"),
    )


@query(
    "share_of_total_by_segment",
    oracle=f"""
WITH seg AS (
    SELECT c.c_mktsegment,
           {money_sum_sql('o.o_totalprice')} AS revenue,
           count(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
),
tot AS (SELECT sum(CAST(revenue AS DECIMAL(18,6))) AS t FROM seg)
SELECT c_mktsegment, revenue, n_orders,
       CAST(revenue AS DOUBLE) / CAST(t AS DOUBLE) AS revenue_share
FROM seg CROSS JOIN tot
""",
)
def share_of_total_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total contribution analysis (the ratio_to_report
    pattern): each market segment's revenue as a fraction of the
    whole. Exact decimal numerator and denominator, one double
    division each — the 1-row total broadcasts, so the share is a
    narrow projection after a single fact aggregate."""
    orders = load_spread(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    seg = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            money_sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    tot = seg.agg(
        F.sum(F.col("revenue").cast("decimal(18,6)")).alias("t")
    )
    return seg.crossJoin(F.broadcast(tot)).select(
        "c_mktsegment",
        "revenue",
        "n_orders",
        (
            F.col("revenue").cast("double") / F.col("t").cast("double")
        ).alias("revenue_share"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint screen over daily revenue
# ---------------------------------------------------------------------------

_CUSUM_SHARE = 0.05  # flag days where |cusum| exceeds 5% of total revenue


@query(
    "cusum_changepoints_daily_revenue",
    oracle=f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           {money_sum_sql('o_totalprice')} AS revenue
    FROM orders GROUP BY 1
),
tot AS (
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM daily
),
c AS (
    SELECT d, revenue,
           CAST(SUM(CAST(revenue AS DECIMAL(18,2))) OVER (
               ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS prefix,
           CAST(row_number() OVER (ORDER BY d) AS DOUBLE) AS t
    FROM daily
)
SELECT d, revenue,
       prefix - t * (total / n) AS cusum,
       (prefix - t * (total / n)) / total AS cusum_share,
       abs((prefix - t * (total / n)) / total) > {_CUSUM_SHARE!r} AS flagged
FROM c CROSS JOIN tot
""",
)
def cusum_changepoints_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint screen: per day, the cumulative deviation of
    daily revenue from the series mean (CUSUM(t) = Σ_{{i<=t}} rev_i −
    t·μ), normalized by total revenue, flagged where the drift exceeds
    {share}% — the classical level-shift detector behind SLA/seasonality
    break monitoring. Float-determinism device: windowed FLOAT sums are
    engine-divergent (DuckDB aggregates frames via a segment tree, Spark
    sequentially), so the running sum is an order-insensitive exact
    DECIMAL(18,2) prefix converted once to DOUBLE, and CUSUM derives as
    prefix − t·μ with a pinned operation order. The decimal prefix keeps
    under 2^53 unscaled through ~1e15 in summed revenue cents — far past
    any per-day series. The global window runs on the calendar-bounded
    daily series (thousands of rows), never the fact table; the 1-row
    total broadcasts."""
    from pyspark.sql import Window

    orders = load_spread(spark, sf_dir, "orders")
    # DATE-typed day key on BOTH sides (Spark date_trunc returns
    # TIMESTAMP where DuckDB's returns DATE — cast is the convention).
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(money_sum("o_totalprice").alias("revenue"))
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("revenue").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = daily.select(
        "d",
        "revenue",
        F.sum(F.col("revenue").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("prefix"),
        F.row_number().over(Window.orderBy("d")).cast("double").alias("t"),
    )
    mu = F.col("total") / F.col("n")
    cusum = F.col("prefix") - F.col("t") * mu
    return c.crossJoin(F.broadcast(tot)).select(
        "d",
        "revenue",
        cusum.alias("cusum"),
        (cusum / F.col("total")).alias("cusum_share"),
        (F.abs(cusum / F.col("total")) > F.lit(_CUSUM_SHARE)).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# Rolling correlation between two daily series
# ---------------------------------------------------------------------------

_RC_PRESCALE = 0.01  # daily value sums -> low hundreds (see _quantized)
_RC_WIN = 7


@query(
    "rolling_corr_click_purchase_7d",
    oracle=f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d,
           COALESCE({money_sum_sql(
               "CASE WHEN event_type = 'click' THEN value END")},
                    0.0) AS vx,
           COALESCE({money_sum_sql(
               "CASE WHEN event_type = 'purchase' THEN value END")},
                    0.0) AS vy
    FROM events WHERE event_type IN ('click', 'purchase')
    GROUP BY 1
),
q AS (
    SELECT d, vx, vy,
           {_quantized_sql('vx', _RC_PRESCALE)} AS xq,
           {_quantized_sql('vy', _RC_PRESCALE)} AS yq
    FROM daily
),
m AS (
    SELECT d, vx, vy,
           CAST(COUNT(*) OVER w AS DOUBLE) AS n,
           CAST(SUM(xq) OVER w AS DOUBLE) AS sx,
           CAST(SUM(yq) OVER w AS DOUBLE) AS sy,
           CAST(SUM(xq * yq) OVER w AS DOUBLE) AS sxy,
           CAST(SUM(xq * xq) OVER w AS DOUBLE) AS sxx,
           CAST(SUM(yq * yq) OVER w AS DOUBLE) AS syy
    FROM q
    WINDOW w AS (ORDER BY d ROWS BETWEEN {_RC_WIN - 1} PRECEDING AND CURRENT ROW)
)
SELECT d, vx, vy, CAST(n AS BIGINT) AS n_days,
       CASE WHEN (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) = 0
            THEN NULL
            ELSE {_pearson_from_sums_sql('n', 'sx', 'sy', 'sxy', 'sxx', 'syy')}
       END AS corr_7d
FROM m
""",
)
def rolling_corr_click_purchase_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day Pearson correlation between the click and purchase
    daily value series — the co-movement monitor (is engagement still
    tracking revenue?) behind metric-drift alerting. Float-determinism
    devices: daily values quantize through ``_quantized`` (integer
    DECIMAL(10,0) after a static prescale — Pearson is scale-invariant,
    and integer decimals make every windowed product/sum EXACT and
    order-free, where windowed FLOAT sums diverge between DuckDB's
    segment-tree and Spark's sequential frames); the closed form then
    runs in +,−,×,÷,sqrt on exactly-converted doubles, with an explicit
    zero-variance guard (NULL, not 0/0). The window runs on the
    calendar-bounded daily series, never the event table; the daily
    aggregate is the only fact-sized pass."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.coalesce(
                money_sum(F.when(F.col("event_type") == "click", F.col("value"))),
                F.lit(0.0),
            ).alias("vx"),
            F.coalesce(
                money_sum(
                    F.when(F.col("event_type") == "purchase", F.col("value"))
                ),
                F.lit(0.0),
            ).alias("vy"),
        )
    )
    q = daily.select(
        "d", "vx", "vy",
        _quantized("vx", _RC_PRESCALE).alias("xq"),
        _quantized("vy", _RC_PRESCALE).alias("yq"),
    )
    w = Window.orderBy("d").rowsBetween(-(_RC_WIN - 1), Window.currentRow)
    m = q.select(
        "d", "vx", "vy",
        F.count(F.lit(1)).over(w).cast("double").alias("n"),
        F.sum("xq").over(w).cast("double").alias("sx"),
        F.sum("yq").over(w).cast("double").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).over(w).cast("double").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).over(w).cast("double").alias("sxx"),
        F.sum(F.col("yq") * F.col("yq")).over(w).cast("double").alias("syy"),
    )
    den = F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    r = _pearson_from_sums(
        F.col("n"), F.col("sx"), F.col("sy"),
        F.col("sxy"), F.col("sxx"), F.col("syy"),
    )
    return m.select(
        "d", "vx", "vy",
        F.col("n").cast("long").alias("n_days"),
        F.when(den == 0, F.lit(None).cast("double")).otherwise(r).alias("corr_7d"),
    )


@query(
    "episode_triples_sessions",
    oracle="""
WITH flagged AS (
    SELECT user_id, event_id, ts, event_type,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                     OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                THEN 1 ELSE 0 END AS is_new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, event_id, ts, event_type,
           SUM(is_new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_seq
    FROM flagged
),
seq AS (
    SELECT event_type AS e1,
           lead(event_type, 1) OVER ws AS e2,
           lead(event_type, 2) OVER ws AS e3
    FROM sess
    WINDOW ws AS (PARTITION BY user_id, session_seq ORDER BY ts, event_id)
)
SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY e1, e2, e3
""",
)
def episode_triples_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining, episode length 3: counts of every
    consecutive event-type triple INSIDE a 30-minute session (the
    session boundary stops triples from spanning unrelated visits) —
    the support table a PrefixSpan-style miner builds its first
    candidate generation from, and a direct behavioral-analytics
    deliverable (top browse→click→purchase paths). Reuses the
    certified sessionize-by-gap device (events_sessionize_30m), then
    two leads over the (user, session) ordering and one hash aggregate
    on the ≤|types|³ triple key — all integer counting, hash-exact.
    At 100 TB: one exchange on user_id feeds both the session window
    and the leads (same ordering key), then a tiny aggregate."""
    ev = load_spread(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.withColumn(
        "session_seq", F.sum(is_new).over(run)
    )
    ws = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    seq = sess.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(ws).alias("e2"),
        F.lead("event_type", 2).over(ws).alias("e3"),
    )
    return (
        seq.where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@query(
    "hampel_outliers_daily_revenue",
    oracle="""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents
    FROM orders GROUP BY 1
),
win AS (
    SELECT d, cents,
           list(cents) OVER (
               ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
           ) AS arr
    FROM daily
),
med AS (
    SELECT d, cents,
           CASE WHEN len(arr) = 7 THEN list_sort(arr)[4] END AS med_cents,
           arr
    FROM win
),
mad AS (
    SELECT d, cents, med_cents,
           CASE WHEN med_cents IS NOT NULL THEN
               list_sort(list_transform(arr, x -> abs(x - med_cents)))[4]
           END AS mad_cents
    FROM med
)
SELECT d,
       cents / CAST(100 AS DOUBLE) AS revenue,
       med_cents / CAST(100 AS DOUBLE) AS rolling_med,
       mad_cents / CAST(100 AS DOUBLE) AS rolling_mad,
       COALESCE(10000 * abs(cents - med_cents) > 44478 * mad_cents,
                FALSE) AS is_outlier
FROM mad
""",
)
def hampel_outliers_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel identifier over the daily-revenue series: a point is an
    outlier when it sits more than 3·1.4826 scaled MADs from the
    centered 7-day rolling median — the robust despiking filter that
    survives the level shifts a z-score filter chases. Float
    determinism: the whole test runs in INTEGER cents (exact decimal
    day sums ×100), the rolling median/MAD are order-statistics of the
    collected 7-element window (sorted, so collect order is
    irrelevant), and the 3σ threshold compares 10000·|x−med| against
    44478·MAD — the constant 4.4478 premultiplied into integers, no
    float op anywhere before the output division by 100. Edge days
    without a full window are never flagged. The global window runs on
    the calendar-bounded daily series, never the fact table (the cusum
    convention)."""
    from pyspark.sql import Window

    orders = load_spread(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("cents")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    arr = F.collect_list("cents").over(w7)
    med = F.when(
        F.size(arr) == 7, F.element_at(F.sort_array(arr), 4)
    )
    step = daily.select("d", "cents", arr.alias("arr"), med.alias("med_cents"))
    mad = F.when(
        F.col("med_cents").isNotNull(),
        F.element_at(
            F.sort_array(
                F.transform("arr", lambda x: F.abs(x - F.col("med_cents")))
            ),
            4,
        ),
    )
    step2 = step.select("d", "cents", "med_cents", mad.alias("mad_cents"))
    return step2.select(
        "d",
        (F.col("cents") / F.lit(100.0)).alias("revenue"),
        (F.col("med_cents") / F.lit(100.0)).alias("rolling_med"),
        (F.col("mad_cents") / F.lit(100.0)).alias("rolling_mad"),
        F.coalesce(
            10000 * F.abs(F.col("cents") - F.col("med_cents"))
            > 44478 * F.col("mad_cents"),
            F.lit(False),
        ).alias("is_outlier"),
    )


@query(
    "mase_seasonal_naive_daily_revenue",
    oracle="""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents
    FROM orders GROUP BY 1
),
lagged AS (
    SELECT cents,
           lag(cents, 1) OVER (ORDER BY d) AS l1,
           lag(cents, 7) OVER (ORDER BY d) AS l7
    FROM daily
),
m AS (
    SELECT CAST(COUNT(l1) AS BIGINT) AS n1,
           CAST(SUM(abs(cents - l1)) AS BIGINT) AS ae1,
           CAST(COUNT(l7) AS BIGINT) AS n7,
           CAST(SUM(abs(cents - l7)) AS BIGINT) AS ae7
    FROM lagged
)
SELECT n7 AS n_scored,
       (ae1 / CAST(n1 AS DOUBLE)) / 100 AS mae_naive1,
       (ae7 / CAST(n7 AS DOUBLE)) / 100 AS mae_seasonal7,
       (ae7 / CAST(n7 AS DOUBLE)) / (ae1 / CAST(n1 AS DOUBLE)) AS mase
FROM m
""",
)
def mase_seasonal_naive_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Forecast-accuracy scoring with MASE (Hyndman & Koehler 2006):
    the seasonal-naive (lag-7) forecast's mean absolute error on daily
    revenue, scaled by the one-step-naive MAE — the unit-free metric
    every forecasting bake-off reports (MASE < 1 means the model beats
    last-value persistence; for this weekday-seasonal series lag-7
    should win). All errors are exact integer cents; the only float
    ops are two exact-integer divisions and their quotient — identical
    operand bits on both engines, hence hash-exact. The lag windows run
    on the calendar-bounded daily aggregate, never the fact table."""
    from pyspark.sql import Window

    orders = load_spread(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "cents",
        F.lag("cents", 1).over(w).alias("l1"),
        F.lag("cents", 7).over(w).alias("l7"),
    )
    m = lagged.agg(
        F.count("l1").cast("long").alias("n1"),
        F.sum(F.abs(F.col("cents") - F.col("l1"))).cast("long").alias("ae1"),
        F.count("l7").cast("long").alias("n7"),
        F.sum(F.abs(F.col("cents") - F.col("l7"))).cast("long").alias("ae7"),
    )
    mae1 = F.col("ae1") / F.col("n1").cast("double")
    mae7 = F.col("ae7") / F.col("n7").cast("double")
    return m.select(
        F.col("n7").alias("n_scored"),
        (mae1 / 100).alias("mae_naive1"),
        (mae7 / 100).alias("mae_seasonal7"),
        (mae7 / mae1).alias("mase"),
    )


@query(
    "decile_qq_drift_events_value",
    oracle="""
WITH b AS (
    SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid FROM events
),
halves AS (
    SELECT CASE WHEN epoch_us(ts) <= mid THEN 'first' ELSE 'second' END
               AS half,
           value, event_id
    FROM events CROSS JOIN b
),
ranked AS (
    SELECT half, value,
           row_number() OVER (
               PARTITION BY half ORDER BY value, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY half) AS n
    FROM halves
),
decs AS (
    SELECT half, CAST(i AS BIGINT) AS decile, value
    FROM ranked
    JOIN (SELECT unnest(range(1, 10)) AS i) q
      ON rn = (i * n + 9) // 10
)
SELECT f.decile,
       f.value AS v_first,
       s.value AS v_second,
       s.value - f.value AS drift
FROM (SELECT decile, value FROM decs WHERE half = 'first') f
JOIN (SELECT decile, value FROM decs WHERE half = 'second') s
  USING (decile)
""",
)
def decile_qq_drift_events_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift QQ table: the nine decile values of the event
    `value` distribution in the first vs second half of the observed
    time range, with their per-decile drift — the quantile-quantile
    comparison a data-drift monitor plots before alerting (and the
    ln-free alternative to PSI, whose log term is not correctly
    rounded cross-engine). Deciles are EXACT order statistics: each
    half is ranked once (value, event_id total order so ties are
    pinned), the decile ranks ⌈i·n/10⌉ are computed in pure integer
    arithmetic, and picking an element never invents a float. The time
    midpoint is a 1-row broadcast of exact integer microseconds. At
    100 TB the rank window is the only heavy stage (one exchange per
    half); swap in the two-pass exact-quantile device if a global sort
    per half ever dominates."""
    from pyspark.sql import Window

    ev = load_spread(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    b = ev.agg(
        ((F.min(us) + F.max(us)) / 2).cast("long").alias("mid")
    )
    halves = (
        ev.select(us.alias("t_us"), "value", "event_id")
        .crossJoin(F.broadcast(b))
        .select(
            F.when(F.col("t_us") <= F.col("mid"), "first")
            .otherwise("second")
            .alias("half"),
            "value",
            "event_id",
        )
    )
    w = Window.partitionBy("half").orderBy("value", "event_id")
    wn = Window.partitionBy("half")
    ranked = halves.select(
        "half",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    qs = spark.range(1, 10).select(F.col("id").cast("long").alias("decile"))
    decs = ranked.join(
        F.broadcast(qs),
        F.col("rn")
        == F.expr("(decile * n + 9) div 10"),
    ).select("half", "decile", "value")
    f = decs.filter(F.col("half") == "first").select(
        "decile", F.col("value").alias("v_first")
    )
    s = decs.filter(F.col("half") == "second").select(
        "decile", F.col("value").alias("v_second")
    )
    return f.join(s, "decile").select(
        "decile",
        "v_first",
        "v_second",
        (F.col("v_second") - F.col("v_first")).alias("drift"),
    )


@query(
    "mann_whitney_value_click_purchase",
    oracle="""
WITH sub AS (
    SELECT event_type, value FROM events
    WHERE event_type IN ('click', 'purchase')
),
ranked AS (
    SELECT event_type,
           2 * rank() OVER (ORDER BY value)
               + COUNT(*) OVER (PARTITION BY value) - 1 AS two_avg_rank
    FROM sub
),
g AS (
    SELECT CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n1,
           CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n2,
           CAST(SUM(two_avg_rank) FILTER (event_type = 'click') AS BIGINT)
               AS two_r1
    FROM ranked
),
s AS (
    SELECT n1, n2, two_r1,
           two_r1 - n1 * (n1 + 1) AS two_u1
    FROM g
)
SELECT n1 AS n_click, n2 AS n_purchase,
       two_u1 / CAST(2 AS DOUBLE) AS u_stat,
       (two_u1 - n1 * n2) / (CAST(2 AS DOUBLE)
           * sqrt((CAST(n1 AS DOUBLE) * n2 * (n1 + n2 + 1)) / 12))
           AS z_score,
       CAST(n1 * n2 - two_u1 AS DOUBLE) / (n1 * n2) AS rank_biserial
FROM s
""",
)
def mann_whitney_value_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test comparing the `value`
    distributions of click vs purchase events — the nonparametric
    two-sample test an experimentation platform reaches for when
    revenue-like metrics are too heavy-tailed for the t-test. Float
    determinism: ranks (with average-tie correction) are kept DOUBLED
    so every rank statistic is an exact BIGINT (2·avg_rank = 2·min_rank
    + tie_size − 1); U, its mean, and the rank-biserial effect size
    derive in pure integer arithmetic, and the z-score's only float ops
    are one division, one sqrt (correctly rounded per IEEE), and one
    exact ×2 — identical bits on both engines. The normal-approximation
    variance n1·n2·(N+1) stays under 2^53 through ~1e8-row subsets.
    Plan shape: rank sums only need PER-VALUE counts, so the fact rows
    hash-aggregate to the distinct-value grain FIRST (one shuffle, big
    reduction) and the rank cumsum window runs over that post-
    aggregation relation — never an unpartitioned window at event
    grain (2·rank(v) + tie(v) − 1 = 2·cum_prev(v) + c(v) + 1, summed
    with weight c1(v))."""
    from pyspark.sql import Window

    ev = load_spread(spark, sf_dir, "events")
    sub = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_type", "value"
    )
    pv = sub.groupBy("value").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("c1"),
    )
    w_cum = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = pv.select(
        "c",
        "c1",
        F.coalesce(F.sum("c").over(w_cum), F.lit(0))
        .cast("long")
        .alias("fprev"),
    )
    g = ranked.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).cast("long").alias("n2"),
        F.sum(
            F.col("c1") * (2 * F.col("fprev") + F.col("c") + 1)
        )
        .cast("long")
        .alias("two_r1"),
    )
    s = g.select(
        "n1",
        "n2",
        (F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)).alias("two_u1"),
    )
    sigma2x = F.lit(2.0) * F.sqrt(
        (F.col("n1").cast("double") * F.col("n2") * (F.col("n1") + F.col("n2") + 1))
        / 12
    )
    return s.select(
        F.col("n1").alias("n_click"),
        F.col("n2").alias("n_purchase"),
        (F.col("two_u1") / F.lit(2.0)).alias("u_stat"),
        ((F.col("two_u1") - F.col("n1") * F.col("n2")) / sigma2x).alias(
            "z_score"
        ),
        (
            (F.col("n1") * F.col("n2") - F.col("two_u1")).cast("double")
            / (F.col("n1") * F.col("n2"))
        ).alias("rank_biserial"),
    )


@query(
    "purchase_streaks_customers",
    oracle="""
WITH months AS (
    SELECT DISTINCT o_custkey,
           CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
               AS midx
    FROM orders
),
islands AS (
    SELECT o_custkey,
           midx - row_number() OVER (
               PARTITION BY o_custkey ORDER BY midx) AS island
    FROM months
),
streaks AS (
    SELECT o_custkey, island, CAST(COUNT(*) AS BIGINT) AS len
    FROM islands GROUP BY o_custkey, island
)
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS max_streak_months,
       CAST(SUM(len) AS BIGINT) AS active_months
FROM streaks GROUP BY o_custkey
HAVING MAX(len) >= 2
""",
)
def purchase_streaks_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands retention analytic: per customer, maximal runs
    of CONSECUTIVE active purchase months (the classic island device —
    month index minus its per-customer rank is constant within a run),
    reporting streak count, longest streak, and total active months for
    every customer that ever managed two consecutive months — the
    engagement-streak feature behind churn models and loyalty tiers.
    Pure integer month arithmetic; one exchange on the customer key
    drives the dedup, the rank window, and both aggregations (same
    partitioning reused end-to-end)."""
    from pyspark.sql import Window

    orders = load_spread(spark, sf_dir, "orders")
    months = orders.select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        )
        .cast("long")
        .alias("midx"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("midx")
    islands = months.select(
        "o_custkey",
        (F.col("midx") - F.row_number().over(w)).alias("island"),
    )
    streaks = islands.groupBy("o_custkey", "island").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    return (
        streaks.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
            F.max("len").cast("long").alias("max_streak_months"),
            F.sum("len").cast("long").alias("active_months"),
        )
        .filter(F.col("max_streak_months") >= 2)
    )


@query(
    "twap_daily_value_by_type",
    oracle="""
WITH seq AS (
    SELECT event_type,
           CAST(ts AS DATE) AS d,
           value,
           epoch_us(ts) AS t_us,
           lead(epoch_us(ts)) OVER (
               PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY ts, event_id) AS next_us
    FROM events
),
seg AS (
    SELECT event_type, d, value, next_us - t_us AS w_us
    FROM seq WHERE next_us IS NOT NULL
)
SELECT event_type, d,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(w_us) AS BIGINT) AS span_us,
       list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_sort(list(value * CAST(w_us AS DOUBLE)))),
           (a, b) -> a + b)
           / CAST(SUM(w_us) AS DOUBLE) AS twap
FROM seg GROUP BY event_type, d
""",
)
def twap_daily_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) of the event `value` per type and
    day — the correct mean for an IRREGULARLY sampled signal, where the
    plain average over-weights bursts (each observation holds until the
    next one; its weight is that holding duration). The finance/metrics
    primitive behind TWAP pricing and time-weighted utilization.
    Exactness: durations are exact integer microseconds from the lead
    window (ties pinned by event_id); each value·duration product is
    one correctly rounded double op; the per-group sum folds over the
    SORTED product array (the sorted-fold device), and the final
    division is exact-operand IEEE. Day-final observations carry no
    weight (no successor) — the documented convention. One exchange on
    (type, day) drives the ordering window and the aggregate."""
    from pyspark.sql import Window

    ev = load_spread(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    us = F.unix_micros(F.col("ts"))
    seq = ev.select(
        "event_type",
        d.alias("d"),
        "value",
        us.alias("t_us"),
        F.lead(us).over(
            Window.partitionBy("event_type", d).orderBy("ts", "event_id")
        ).alias("next_us"),
    )
    seg = seq.filter(F.col("next_us").isNotNull()).select(
        "event_type",
        "d",
        "value",
        (F.col("next_us") - F.col("t_us")).alias("w_us"),
    )
    return seg.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("w_us").cast("long").alias("span_us"),
        (
            F.aggregate(
                F.sort_array(
                    F.collect_list(
                        F.col("value") * F.col("w_us").cast("double")
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.sum("w_us").cast("double")
        ).alias("twap"),
    )


# Shapley weights for 3 players, by |S| of the coalition being joined:
# |S|!·(3-|S|-1)!/3! — precomputed in Python, entering both engines as
# identical double literals.
_SHAP_W = {0: 2 / 6, 1: 1 / 6, 2: 2 / 6}
_CHANNELS = ("view", "click", "signup")


def _shapley_oracle() -> str:
    flags = ", ".join(
        f"MAX(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END) AS f_{c}"
        for c in _CHANNELS
    )
    # v(S): conversion rate of sessions whose EXACT channel set is S —
    # guarded to 0 when the subset never occurs (ANSI 0/0 guard).
    subset_cols = []
    for mask in range(8):
        bits = [(c, (mask >> i) & 1) for i, c in enumerate(_CHANNELS)]
        cond = " AND ".join(f"f_{c} = {b}" for c, b in bits)
        name = "v_" + "".join(str(b) for _c, b in bits)
        subset_cols.append(
            f"CASE WHEN COUNT(*) FILTER ({cond}) = 0 THEN CAST(0 AS DOUBLE)"
            f" ELSE CAST(COUNT(*) FILTER ({cond} AND converted) AS DOUBLE)"
            f" / COUNT(*) FILTER ({cond}) END AS {name}"
        )

    def vname(mask: int) -> str:
        return "v_" + "".join(str((mask >> i) & 1) for i in range(3))

    shap_exprs = []
    for i, c in enumerate(_CHANNELS):
        terms = []
        for mask in range(8):
            if (mask >> i) & 1:
                continue
            s_size = bin(mask).count("1")
            w = _SHAP_W[s_size]
            terms.append(
                f"CAST('{w!r}' AS DOUBLE)"
                f" * ({vname(mask | (1 << i))} - {vname(mask)})"
            )
        # fixed left-to-right association on both engines
        shap_exprs.append("(" + " + ".join(terms) + f") AS shapley_{c}")
    return f"""
WITH flagged AS (
    SELECT user_id, event_id, ts, event_type,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                     OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                THEN 1 ELSE 0 END AS is_new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, event_type,
           SUM(is_new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_seq
    FROM flagged
),
per_session AS (
    SELECT user_id, session_seq, {flags},
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
               AS converted
    FROM sess GROUP BY user_id, session_seq
),
v AS (SELECT {", ".join(subset_cols)} FROM per_session)
SELECT {", ".join(shap_exprs)} FROM v
"""


@query("shapley_attribution_channels", oracle=_shapley_oracle())
def shapley_attribution_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value marketing attribution (the cooperative-game credit
    split, Shapley 1953, as used in modern MTA systems): players are
    the pre-purchase channels (view / click / signup), a session's
    coalition is the EXACT set of channels it contains, v(S) is the
    conversion rate of sessions with coalition S, and each channel's
    credit is the Shapley-weighted average of its marginal
    contributions over all 2² sub-coalitions. Certification devices:
    sessions reuse the certified 30-minute gap device; every v(S) is
    one exact-integer division (0 when the coalition never occurs —
    ANSI 0/0 guard on both sides); the 4-term Shapley sums run in a
    PINNED left-to-right order with weight literals precomputed in
    Python — correctly rounded identical ops, hash-exact. Scale: one
    user-keyed exchange for sessionization, a (user, session) hash
    aggregate, then a single 8-column fold to one row."""
    from pyspark.sql import Window

    ev = load_spread(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.withColumn("session_seq", F.sum(is_new).over(run))
    per_session = sess.groupBy("user_id", "session_seq").agg(
        *[
            F.max(
                F.when(F.col("event_type") == c, 1).otherwise(0)
            ).alias(f"f_{c}")
            for c in _CHANNELS
        ],
        (
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            == 1
        ).alias("converted"),
    )

    def vexpr(mask: int):
        cond = None
        for i, c in enumerate(_CHANNELS):
            bit = (mask >> i) & 1
            term = F.col(f"f_{c}") == bit
            cond = term if cond is None else cond & term
        n_s = F.sum(F.when(cond, 1).otherwise(0))
        n_conv = F.sum(F.when(cond & F.col("converted"), 1).otherwise(0))
        return F.when(n_s == 0, F.lit(0.0)).otherwise(
            n_conv.cast("double") / n_s
        )

    def vname(mask: int) -> str:
        return "v_" + "".join(str((mask >> i) & 1) for i in range(3))

    v = per_session.agg(
        *[vexpr(mask).alias(vname(mask)) for mask in range(8)]
    )
    out_cols = []
    for i, c in enumerate(_CHANNELS):
        acc = None
        for mask in range(8):
            if (mask >> i) & 1:
                continue
            term = F.lit(_SHAP_W[bin(mask).count("1")]) * (
                F.col(vname(mask | (1 << i))) - F.col(vname(mask))
            )
            acc = term if acc is None else acc + term
        out_cols.append(acc.alias(f"shapley_{c}"))
    return v.select(*out_cols)


@query(
    "theil_sen_trend_daily_revenue",
    oracle="""
WITH daily AS (
    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents,
           CAST(row_number() OVER (ORDER BY CAST(o_orderdate AS DATE))
               AS BIGINT) AS t
    FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
slopes AS (
    SELECT CAST(b.cents - a.cents AS DOUBLE) / (b.t - a.t) AS s
    FROM daily a JOIN daily b ON b.t > a.t
),
med AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           list_sort(list(s))[CAST((COUNT(*) + 1) // 2 AS BIGINT)]
               AS slope_cents
    FROM slopes
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
ic AS (
    SELECT list_sort(list(cents - slope_cents * t))[
               CAST((COUNT(*) + 1) // 2 AS BIGINT)] AS icpt_cents
    FROM daily CROSS JOIN med
)
SELECT n_days, n_pairs,
       slope_cents / 100 AS slope_per_day,
       icpt_cents / 100 AS intercept
FROM med CROSS JOIN nd CROSS JOIN ic
""",
)
def theil_sen_trend_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend estimator for daily revenue: slope = the
    median of all pairwise slopes (breakdown point 29%, immune to the
    outlier days that wreck OLS), intercept = median residual at that
    slope — the robust-regression baseline every monitoring stack
    should fit before an OLS line. Exactness: y is integer cents, x an
    integer day rank; each pairwise slope is ONE correctly rounded
    division of exact integers; both medians are lower-median ORDER
    STATISTICS of those identical doubles (no averaging, no float
    sums). The O(n²) pair join is over the calendar-bounded daily
    aggregate (~2.4k days → ~3M pairs at sf0.1, trivial); for longer
    series the standard repeated-median / sampling variants drop in
    without changing the certification shape."""
    from pyspark.sql import Window

    orders = load_spread(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("cents")
    ).select(
        "cents",
        F.row_number().over(Window.orderBy("d")).cast("long").alias("t"),
    )
    a = daily.select(F.col("cents").alias("ca"), F.col("t").alias("ta"))
    b = daily.select(F.col("cents").alias("cb"), F.col("t").alias("tb"))
    slopes = a.join(b, F.col("tb") > F.col("ta")).select(
        (
            (F.col("cb") - F.col("ca")).cast("double")
            / (F.col("tb") - F.col("ta"))
        ).alias("s")
    )
    med = slopes.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sort_array(F.collect_list("s")).alias("ss"),
    ).select(
        "n_pairs",
        F.element_at(
            "ss", ((F.col("n_pairs") + 1) / 2).cast("int")
        ).alias("slope_cents"),
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    ic = (
        daily.crossJoin(F.broadcast(med))
        .select(
            (F.col("cents") - F.col("slope_cents") * F.col("t")).alias("r")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("nr"),
            F.sort_array(F.collect_list("r")).alias("rs"),
        )
        .select(
            F.element_at(
                "rs", ((F.col("nr") + 1) / 2).cast("int")
            ).alias("icpt_cents")
        )
    )
    return (
        med.crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(ic))
        .select(
            "n_days",
            "n_pairs",
            (F.col("slope_cents") / 100).alias("slope_per_day"),
            (F.col("icpt_cents") / 100).alias("intercept"),
        )
    )


@query(
    "mann_kendall_trend_daily_revenue",
    oracle="""
WITH daily AS (
    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents,
           CAST(row_number() OVER (ORDER BY CAST(o_orderdate AS DATE))
               AS BIGINT) AS t
    FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
s AS (
    SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                         WHEN b.cents < a.cents THEN -1 ELSE 0 END)
               AS BIGINT) AS s_stat
    FROM daily a JOIN daily b ON b.t > a.t
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
ties AS (
    SELECT CAST(COALESCE(SUM(tc * (tc - 1) * (2 * tc + 5)), 0) AS BIGINT)
               AS t_corr
    FROM (SELECT COUNT(*) AS tc FROM daily GROUP BY cents HAVING COUNT(*) > 1)
),
v AS (
    SELECT s_stat, n,
           (n * (n - 1) * (2 * n + 5) - t_corr) / CAST(18 AS DOUBLE)
               AS var_s
    FROM s CROSS JOIN nd CROSS JOIN ties
)
SELECT n AS n_days, s_stat, var_s,
       CAST(s_stat AS DOUBLE) / (n * (n - 1) // 2) AS kendall_tau,
       CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
            WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
            ELSE CAST(0 AS DOUBLE) END AS z_score
FROM v
""",
)
def mann_kendall_trend_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mann–Kendall monotone-trend test on daily revenue: S = the sum of
    pairwise signs, Kendall's τ-a, and the tie-corrected normal
    z-score — the standard nonparametric 'is this series trending'
    test (used with Theil–Sen, whose slope it significance-tests;
    Mann 1945, Kendall 1975). Everything up to the output is INTEGER:
    S, n, and the tie correction Σt(t-1)(2t+5) are exact BIGINTs, τ
    divides two exact integers once, and the z-score spends one
    division + one sqrt (correctly rounded) on exact-integer-derived
    operands — hash-identical. Same calendar-bounded O(n²) pair join
    as Theil–Sen (a few million pairs at most); the continuity
    correction (∓1) follows the published statistic."""
    from pyspark.sql import Window

    orders = load_spread(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("cents")
    ).select(
        "cents",
        F.row_number().over(Window.orderBy("d")).cast("long").alias("t"),
    )
    a = daily.select(F.col("cents").alias("ca"), F.col("t").alias("ta"))
    b = daily.select(F.col("cents").alias("cb"), F.col("t").alias("tb"))
    s = a.join(b, F.col("tb") > F.col("ta")).agg(
        F.sum(
            F.when(F.col("cb") > F.col("ca"), 1)
            .when(F.col("cb") < F.col("ca"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("s_stat")
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        daily.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("tc"))
        .filter(F.col("tc") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tc")
                    * (F.col("tc") - 1)
                    * (2 * F.col("tc") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("t_corr")
        )
    )
    v = (
        s.crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(ties))
        .select(
            "s_stat",
            "n",
            (
                (
                    F.col("n")
                    * (F.col("n") - 1)
                    * (2 * F.col("n") + 5)
                    - F.col("t_corr")
                )
                / F.lit(18.0)
            ).alias("var_s"),
        )
    )
    return v.select(
        F.col("n").alias("n_days"),
        "s_stat",
        "var_s",
        (
            F.col("s_stat").cast("double")
            / F.expr("n * (n - 1) div 2")
        ).alias("kendall_tau"),
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt("var_s"),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt("var_s"),
        )
        .otherwise(F.lit(0.0))
        .alias("z_score"),
    )


_DECAY_LAMBDA = 0.9
_DECAY_H = 30  # horizon (days): ages beyond this contribute nothing
_DECAY_W = tuple(_DECAY_LAMBDA**k for k in range(_DECAY_H))


@query(
    "decayed_trending_event_types",
    oracle=f"""
WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS dmax FROM events),
cnt AS (
    SELECT event_type,
           date_diff('day', CAST(ts AS DATE), dmax) AS age,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events CROSS JOIN mx
    WHERE date_diff('day', CAST(ts AS DATE), dmax) < {_DECAY_H}
    GROUP BY 1, 2
),
wt AS (
    SELECT * FROM (VALUES {", ".join(
        f"({k}, CAST('{w!r}' AS DOUBLE))" for k, w in enumerate(_DECAY_W)
    )}) AS t(age, w)
),
terms AS (
    SELECT event_type, cnt.c * wt.w AS term, cnt.c AS c
    FROM cnt JOIN wt USING (age)
)
SELECT event_type,
       CAST(SUM(c) AS BIGINT) AS n_events_in_horizon,
       list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_sort(list(term))), (a, b) -> a + b) AS decayed_score
FROM terms GROUP BY event_type
""",
)
def decayed_trending_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed activity score per event type over a
    30-day horizon (λ=0.9/day) — the trending-topics primitive: recent
    bursts outrank old volume, and the bounded horizon makes the state
    finite (ages past the horizon contribute exactly zero, so the
    incremental-maintenance story is a 30-row ring per key). Float
    determinism: λ^k is PRECOMPUTED in Python for every age (pow() is
    not correctly rounded in-engine) and enters both plans as a literal
    weight table; each count·weight term is one exact multiply and the
    per-type sum folds over the sorted term array. One narrow aggregate
    on (type, day-age), a 30-row broadcast join, a tiny fold."""
    ev = load_spread(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    mx = ev.agg(F.max(d).alias("dmax"))
    cnt = (
        ev.select("event_type", d.alias("d"))
        .crossJoin(F.broadcast(mx))
        .select("event_type", F.datediff("dmax", "d").alias("age"))
        .filter(F.col("age") < _DECAY_H)
        .groupBy("event_type", "age")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wt = spark.createDataFrame(
        [(k, w) for k, w in enumerate(_DECAY_W)], "age int, w double"
    )
    terms = cnt.join(F.broadcast(wt), "age").select(
        "event_type", (F.col("c") * F.col("w")).alias("term"), "c"
    )
    return terms.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n_events_in_horizon"),
        F.aggregate(
            F.sort_array(F.collect_list("term")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("decayed_score"),
    )


# NDCG rank discounts 1/log2(r+1) and their prefix sums, precomputed in
# Python (log2 is not correctly rounded in-engine) and entering both
# plans as identical literals.
_NDCG_K = 10
_COVISIT_M = 20  # candidate-generation prune: top-M neighbors per item
_NDCG_W = tuple(1 / math.log2(r + 1) for r in range(1, _NDCG_K + 1))
_NDCG_PRE = tuple(
    sum(_NDCG_W[:m], 0.0) for m in range(0, _NDCG_K + 1)
)  # left-to-right python fold == the same literal on both sides


def _recsys_oracle() -> str:
    wcase = " ".join(
        f"WHEN {r} THEN CAST('{_NDCG_W[r - 1]!r}' AS DOUBLE)"
        for r in range(1, _NDCG_K + 1)
    )
    icase = " ".join(
        f"WHEN {m} THEN CAST('{_NDCG_PRE[m]!r}' AS DOUBLE)"
        for m in range(1, _NDCG_K + 1)
    )
    return f"""
WITH lastord AS (
    SELECT o_custkey, o_orderkey AS test_ok
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
),
train AS (
    SELECT o.o_custkey, o.o_orderkey, l.l_partkey
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey NOT IN (SELECT test_ok FROM lastord)
),
tb AS (SELECT DISTINCT o_orderkey, l_partkey FROM train),
covisit0 AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb,
           CAST(COUNT(*) AS BIGINT) AS w
    FROM tb a JOIN tb b
      ON a.o_orderkey = b.o_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2
),
covisit AS (
    SELECT pa, pb, w FROM covisit0
    QUALIFY row_number() OVER (PARTITION BY pa
        ORDER BY w DESC, pb) <= {_COVISIT_M}
),
profile AS (SELECT DISTINCT o_custkey, l_partkey FROM train),
test_parts AS (
    SELECT DISTINCT lo.o_custkey, l.l_partkey
    FROM lastord lo JOIN lineitem l ON l.l_orderkey = lo.test_ok
),
scores0 AS (
    SELECT p.o_custkey, c.pb AS cand, CAST(SUM(c.w) AS BIGINT) AS score
    FROM profile p JOIN covisit c ON p.l_partkey = c.pa
    GROUP BY 1, 2
),
scores AS (
    SELECT s.* FROM scores0 s
    ANTI JOIN profile p ON s.o_custkey = p.o_custkey AND s.cand = p.l_partkey
),
topk AS (
    SELECT o_custkey, cand,
           row_number() OVER (PARTITION BY o_custkey
               ORDER BY score DESC, cand) AS rnk
    FROM scores
    QUALIFY rnk <= {_NDCG_K}
),
hits AS (
    SELECT t.o_custkey, t.rnk
    FROM topk t JOIN test_parts tp
      ON t.o_custkey = tp.o_custkey AND t.cand = tp.l_partkey
),
nt AS (
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_test
    FROM test_parts GROUP BY 1
),
eval_set AS (SELECT DISTINCT o_custkey FROM profile),
per_cust AS (
    SELECT e.o_custkey,
           nt.n_test,
           COALESCE(h.n_hits, 0) AS n_hits,
           COALESCE(h.dcg, CAST(0 AS DOUBLE)) AS dcg,
           CASE least(nt.n_test, {_NDCG_K}) {icase} END AS idcg
    FROM eval_set e
    JOIN nt ON e.o_custkey = nt.o_custkey
    LEFT JOIN (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_hits,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_sort(list(CASE rnk {wcase} END))),
                   (a, b) -> a + b) AS dcg
        FROM hits GROUP BY 1
    ) h ON e.o_custkey = h.o_custkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(n_hits) AS BIGINT) AS total_hits,
       CAST(SUM(n_hits) AS DOUBLE) / ({_NDCG_K} * COUNT(*))
           AS precision_at_10,
       CAST(SUM(n_hits) AS DOUBLE) / SUM(n_test) AS recall_at_10,
       list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_sort(list(dcg / idcg))), (a, b) -> a + b) / COUNT(*)
           AS mean_ndcg
FROM per_cust
"""


@query("recsys_eval_covisit_topk", oracle=_recsys_oracle())
def recsys_eval_covisit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline recommender evaluation, end to end in-engine: hold out
    each customer's LAST order (leave-one-basket-out, the standard
    temporal protocol), train an item-item co-visitation model on the
    rest, recommend top-10 unseen parts per customer (score = summed
    co-visits with the profile, ties broken by part id), and score
    precision@10 / recall@10 / mean NDCG@10 against the held-out
    basket. Determinism devices: the whole pipeline is integer counting
    until the metrics; NDCG's log2 discounts and ideal-DCG prefix sums
    are PRECOMPUTED Python literals (log2 is not correctly rounded
    in-engine); per-customer DCG folds its ≤10 literal terms sorted,
    and the corpus-level NDCG mean folds the per-customer ratios
    sorted (the sorted-fold device; at 100 TB swap the final collect
    for a pairwise tree-reduce — only this one 1-row stage changes).
    Scale shape: covisit pairs are keyed on the shared basket
    (bounded per-order fan-out, never |parts|²); the model keeps only
    the top-20 neighbors per item (the candidate-generation prune
    every production recsys applies — unpruned scoring is
    |profile|×avg-degree and blows up quadratically), so scoring is
    one bounded profile⋈neighbors join + per-customer aggregate and
    the top-k is a rank window — the exact offline-eval DAG
    production recsys teams run nightly."""
    from pyspark.sql import Window

    orders = load_spread(spark, sf_dir, "orders")
    li = load_spread(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), "l_partkey"
    )
    wlast = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    lastord = (
        orders.withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderkey").alias("test_ok"))
    )
    train = (
        orders.join(
            lastord.select(F.col("test_ok").alias("o_orderkey")),
            "o_orderkey",
            "left_anti",
        )
        .select("o_custkey", F.col("o_orderkey").alias("ok"))
        .join(li, "ok")
    )
    tb = train.select("ok", "l_partkey").distinct()
    a = tb.select("ok", F.col("l_partkey").alias("pa"))
    b = tb.select("ok", F.col("l_partkey").alias("pb"))
    covisit0 = (
        a.join(b, "ok")
        .filter(F.col("pa") != F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    wnbr = Window.partitionBy("pa").orderBy(
        F.col("w").desc(), F.col("pb").asc()
    )
    covisit = (
        covisit0.withColumn("nrn", F.row_number().over(wnbr))
        .filter(F.col("nrn") <= _COVISIT_M)
        .select("pa", "pb", "w")
    )
    profile = train.select("o_custkey", "l_partkey").distinct()
    test_parts = (
        lastord.join(
            li.select(F.col("ok").alias("test_ok"), "l_partkey"), "test_ok"
        )
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    # Repartition the scored pairs by CUSTOMER before aggregating
    # (guide §2.5/§5): the profile⋈covisit output is part-partitioned,
    # so every map-side partial-agg map would hold a near-global mix of
    # the ~|customers|·|cands| group space (32 concurrent ~0.5M-entry
    # hash maps OOM a default local[32] heap; the same blow-up is the
    # 100 TB scale-killer). Keyed on o_custkey each task's map holds
    # only its own customers' groups. The partition count is pinned
    # (parallelism-proportional, scale-adaptive) rather than left to
    # AQE byte-based coalescing: 64 MB of (cust, cand, w) rows expands
    # to ~1.5 M aggregation groups — far past a task's share of
    # execution memory — because the advisory sizing cannot see the
    # aggregation-state blow-up behind the exchange.
    scores0 = (
        profile.join(covisit, profile["l_partkey"] == covisit["pa"])
        .repartition(
            spark.sparkContext.defaultParallelism * 4, "o_custkey"
        )
        .groupBy("o_custkey", F.col("pb").alias("cand"))
        .agg(F.sum("w").cast("long").alias("score"))
    )
    # SHUFFLE_HASH for the seen-item anti join (guide §3.1): the build
    # side is the |profile| relation (bounded per-customer fan-out);
    # sort-merge would sort the ~20x larger scored-candidate stream on
    # (custkey, cand) — measured as the straw that OOMs a default
    # local[32] heap once the window machinery runs alongside.
    scores = scores0.join(
        profile.select(
            "o_custkey", F.col("l_partkey").alias("cand")
        ).hint("shuffle_hash"),
        ["o_custkey", "cand"],
        "left_anti",
    # Pin the top-k window's input partitioning the same way as
    # scores0 above: the ~10M-row candidate relation sorted in a few
    # AQE byte-coalesced partitions blows task sort memory (spill-file
    # reader buffers OOM a default local[32] heap); keyed on o_custkey
    # at parallelism-proportional width the window's per-task sorts
    # stay bounded and the exchange doubles as the window's required
    # clustering.
    ).repartition(spark.sparkContext.defaultParallelism * 4, "o_custkey")
    wtop = Window.partitionBy("o_custkey").orderBy(
        F.col("score").desc(), F.col("cand").asc()
    )
    topk = (
        scores.withColumn("rnk", F.row_number().over(wtop))
        .filter(F.col("rnk") <= _NDCG_K)
        .select("o_custkey", "cand", "rnk")
    )
    hits = topk.join(
        test_parts.select(
            "o_custkey", F.col("l_partkey").alias("cand")
        ),
        ["o_custkey", "cand"],
    ).select("o_custkey", "rnk")
    wterm = F.col("rnk")
    wexpr = None
    for r in range(1, _NDCG_K + 1):
        wexpr = (
            F.when(wterm == r, F.lit(_NDCG_W[r - 1]))
            if wexpr is None
            else wexpr.when(wterm == r, F.lit(_NDCG_W[r - 1]))
        )
    hagg = hits.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.aggregate(
            F.sort_array(F.collect_list(wexpr)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("dcg"),
    )
    nt = test_parts.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_test")
    )
    eval_set = profile.select("o_custkey").distinct()
    iexpr = None
    mterm = F.least(F.col("n_test"), F.lit(_NDCG_K))
    for m in range(1, _NDCG_K + 1):
        iexpr = (
            F.when(mterm == m, F.lit(_NDCG_PRE[m]))
            if iexpr is None
            else iexpr.when(mterm == m, F.lit(_NDCG_PRE[m]))
        )
    per_cust = (
        eval_set.join(nt, "o_custkey")
        .join(hagg, "o_custkey", "left")
        .select(
            "o_custkey",
            "n_test",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.coalesce("dcg", F.lit(0.0)).alias("dcg"),
            iexpr.alias("idcg"),
        )
    )
    return per_cust.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("n_hits").cast("long").alias("total_hits"),
        (
            F.sum("n_hits").cast("double")
            / (_NDCG_K * F.count(F.lit(1)))
        ).alias("precision_at_10"),
        (F.sum("n_hits").cast("double") / F.sum("n_test")).alias(
            "recall_at_10"
        ),
        (
            F.aggregate(
                F.sort_array(
                    F.collect_list(F.col("dcg") / F.col("idcg"))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1))
        ).alias("mean_ndcg"),
    )


@query(
    "fano_burstiness_event_types",
    oracle="""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
m AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(c) AS BIGINT) AS s1,
           CAST(SUM(c * c) AS BIGINT) AS s2
    FROM daily GROUP BY event_type
)
SELECT event_type, n_days, s1 AS n_events,
       CAST(s1 AS DOUBLE) / n_days AS mean_daily,
       (n_days * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1)
           / (CAST(n_days AS DOUBLE) * (n_days - 1)) AS var_daily,
       ((n_days * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1)
           / (CAST(n_days AS DOUBLE) * (n_days - 1)))
           / (CAST(s1 AS DOUBLE) / n_days) AS fano_factor
FROM m
""",
)
def fano_burstiness_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean dispersion of daily counts) per
    event type — the burstiness screen for event streams: ≈1 means a
    Poisson-like steady arrival, >1 means bursty/overdispersed (and a
    salting/skew risk for any per-day partitioning downstream). The
    daily counts are small exact integers, so Σc and Σc² are exact
    BIGINTs (no 2^53 hazard at any realistic day count) and the
    sample variance computes from them with a PINNED op order —
    divisions of exact operands only, hash-exact. One (type, day)
    aggregate, then arithmetic on a 5-row table."""
    ev = load_spread(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    mean_d = F.col("s1").cast("double") / F.col("n_days")
    var_d = (
        F.col("n_days") * F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1")
    ) / (F.col("n_days").cast("double") * (F.col("n_days") - 1))
    return m.select(
        "event_type",
        "n_days",
        F.col("s1").alias("n_events"),
        mean_d.alias("mean_daily"),
        var_d.alias("var_daily"),
        (var_d / mean_d).alias("fano_factor"),
    )


@query(
    "littles_law_audit_sessions",
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
    SELECT user_id,
           SUM(is_new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_seq,
           epoch_us(ts) AS t_us
    FROM flagged
),
spans AS (
    SELECT MIN(t_us) AS s_us, MAX(t_us) AS e_us
    FROM sess GROUP BY user_id, session_seq
),
horizon AS (
    SELECT CAST(MIN(s_us) AS BIGINT) AS t0,
           CAST(MAX(e_us) AS BIGINT) AS t1,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(e_us - s_us) AS BIGINT) AS sum_dur_us
    FROM spans
),
bounds AS (
    SELECT s_us AS t, 1 AS delta FROM spans
    UNION ALL SELECT e_us AS t, -1 AS delta FROM spans
),
lv AS (
    SELECT t, delta,
           SUM(delta) OVER (ORDER BY t, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS level,
           lead(t) OVER (ORDER BY t, delta) AS t_next
    FROM bounds
),
sweep AS (
    SELECT CAST(SUM(level * (t_next - t)) AS BIGINT) AS area_us
    FROM lv WHERE t_next IS NOT NULL
)
SELECT n_sessions,
       CAST(sum_dur_us AS DOUBLE) / (t1 - t0) AS l_direct,
       CAST(area_us AS DOUBLE) / (t1 - t0) AS l_sweep,
       area_us = sum_dur_us AS littles_law_holds,
       (CAST(n_sessions AS DOUBLE) * 3600000000) / (t1 - t0)
           AS lambda_per_hour,
       CAST(sum_dur_us AS DOUBLE) / n_sessions / 60000000
           AS w_mean_minutes
FROM horizon CROSS JOIN sweep
""",
)
def littles_law_audit_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law audit over 30-minute sessions: time-average
    concurrency computed two independent ways — directly as Σduration/T
    and through a +1/−1 boundary SWEEP (the interval machinery behind
    max_concurrent_sessions_hourly) — plus arrival rate λ and mean
    residence W. The sweep's time integral Σ level·dt equals Σduration
    exactly in INTEGER microseconds (Little's identity for a closed
    window), so `littles_law_holds` is a certified cross-check of the
    sweep implementation, not a float coincidence; λ and W are single
    exact-integer divisions. One user-keyed exchange for sessionization,
    a per-session min/max, then a calendar-bounded boundary sort — the
    capacity-planning readout (and its self-audit) in one query."""
    from pyspark.sql import Window

    ev = load_spread(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.select(
        "user_id",
        F.sum(is_new).over(run).alias("session_seq"),
        us.alias("t_us"),
    )
    spans = sess.groupBy("user_id", "session_seq").agg(
        F.min("t_us").alias("s_us"), F.max("t_us").alias("e_us")
    )
    horizon = spans.agg(
        F.min("s_us").cast("long").alias("t0"),
        F.max("e_us").cast("long").alias("t1"),
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.col("e_us") - F.col("s_us")).cast("long").alias("sum_dur_us"),
    )
    bounds = spans.select(
        F.col("s_us").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        spans.select(F.col("e_us").alias("t"), F.lit(-1).alias("delta"))
    )
    wb = Window.orderBy("t", "delta")
    lv = bounds.select(
        "t",
        F.sum("delta")
        .over(wb.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("level"),
        F.lead("t").over(wb).alias("t_next"),
    )
    sweep = lv.filter(F.col("t_next").isNotNull()).agg(
        F.sum(F.col("level") * (F.col("t_next") - F.col("t")))
        .cast("long")
        .alias("area_us")
    )
    return horizon.crossJoin(F.broadcast(sweep)).select(
        "n_sessions",
        (
            F.col("sum_dur_us").cast("double") / (F.col("t1") - F.col("t0"))
        ).alias("l_direct"),
        (F.col("area_us").cast("double") / (F.col("t1") - F.col("t0"))).alias(
            "l_sweep"
        ),
        (F.col("area_us") == F.col("sum_dur_us")).alias("littles_law_holds"),
        (
            (F.col("n_sessions").cast("double") * 3_600_000_000)
            / (F.col("t1") - F.col("t0"))
        ).alias("lambda_per_hour"),
        (
            F.col("sum_dur_us").cast("double")
            / F.col("n_sessions")
            / 60_000_000
        ).alias("w_mean_minutes"),
    )


_HW_ALPHA = 0.5
_HW_BETA = 0.25
_HW_GAMMA = 0.5
_HW_M = 7  # weekly season


def _hw_step_sql(acc: str, y: str) -> str:
    """One Holt-Winters additive step over a DOUBLE[10] list state
    [l, b, s0..s6, t] — list elements all read the PRE-step state
    (memory device #7: DuckDB struct accumulators rebind sequentially,
    lists don't), and new-level is INLINED wherever the published
    recurrence references it, so both engines evaluate the identical
    expression tree."""
    a, b, g, m = _HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_M
    l, tr = f"{acc}[1]", f"{acc}[2]"
    t = f"{acc}[10]"
    j = f"(CAST({t} AS BIGINT) % {m})"
    sj = f"{acc}[3 + {j}]"
    newl = (
        f"(CAST('{a!r}' AS DOUBLE) * ({y} - {sj})"
        f" + CAST('{1 - a!r}' AS DOUBLE) * ({l} + {tr}))"
    )
    newb = (
        f"(CAST('{b!r}' AS DOUBLE) * ({newl} - {l})"
        f" + CAST('{1 - b!r}' AS DOUBLE) * {tr})"
    )
    s_new = ", ".join(
        f"CASE WHEN {j} = {jp} THEN CAST('{g!r}' AS DOUBLE) * ({y} - {newl})"
        f" + CAST('{1 - g!r}' AS DOUBLE) * {acc}[{3 + jp}]"
        f" ELSE {acc}[{3 + jp}] END"
        for jp in range(m)
    )
    return f"[{newl}, {newb}, {s_new}, {t} + 1]"


@query(
    "holt_winters_forecast_daily_revenue",
    oracle=f"""
WITH daily AS (
    SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
           {money_sum_sql('o_totalprice')} AS revenue
    FROM orders GROUP BY 1
),
l AS (
    SELECT list_transform(
               list_sort(list(struct_pack(d := d, v := revenue))),
               e -> e.v) AS a
    FROM daily
),
state AS (
    -- DuckDB list_reduce takes no init: the init state rides as the
    -- first element (DOUBLE[] elements may differ in length)
    SELECT len(a) AS n,
           list_reduce(
               list_prepend(
                   [a[1], CAST(0 AS DOUBLE),
                    CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                    CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                    CAST(0 AS DOUBLE), CAST(1 AS DOUBLE)],
                   list_transform(a[2:], y -> [y])),
               (acc, x) -> {_hw_step_sql('acc', 'x[1]')}) AS s
    FROM l
)
SELECT h.h AS horizon_days,
       CAST(n AS BIGINT) AS n_days,
       s[1] AS level,
       s[2] AS trend,
       s[3 + (n - 1 + h.h) % {_HW_M}] AS seasonal,
       s[1] + h.h * s[2] + s[3 + (n - 1 + h.h) % {_HW_M}] AS forecast
FROM state, (SELECT unnest(generate_series(1, {_HW_M})) AS h) h
""",
)
def holt_winters_forecast_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal forecast (weekly m=7) of daily
    revenue — the full triple-exponential-smoothing upgrade of the
    certified Holt query, the workhorse for seasonal operational
    series. State is a 10-element DOUBLE list [level, trend, s0..s6,
    t] folded over the date-sorted series: the list accumulator is the
    established cross-engine device (struct accumulators rebind
    sequentially in DuckDB), the new level is INLINED into the trend
    and seasonal updates so both engines evaluate one identical
    expression tree, and α=0.5, β=0.25, γ=0.5 are binary-exact. Init
    is pinned (l0 = y0, b0 = 0, s = 0⃗ — the first week learns the
    seasonals). Forecast ŷ(h) = l + h·b + s[(n−1+h) mod 7]. Like all
    the calendar folds: one fact-sized rollup, then one row of
    state."""
    orders = load_spread(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("d")
    ).agg(money_sum("o_totalprice").alias("revenue"))
    arr = daily.agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("d", F.col("revenue").alias("v")))
            ),
            lambda e: e["v"],
        ).alias("a")
    )
    a_, b_, g_, m = _HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_M

    def step(acc, y):
        l = F.element_at(acc, 1)
        tr = F.element_at(acc, 2)
        t = F.element_at(acc, 10)
        j = t.cast("long") % m
        sj = F.element_at(acc, (j + 3).cast("int"))
        newl = F.lit(a_) * (y - sj) + F.lit(1 - a_) * (l + tr)
        newb = F.lit(b_) * (newl - l) + F.lit(1 - b_) * tr
        parts = [newl, newb]
        for jp in range(m):
            sjp = F.element_at(acc, 3 + jp)
            parts.append(
                F.when(
                    j == jp,
                    F.lit(g_) * (y - newl) + F.lit(1 - g_) * sjp,
                ).otherwise(sjp)
            )
        parts.append(t + 1)
        return F.array(*parts)

    init = F.array(
        F.element_at(F.col("a"), 1),
        *([F.lit(0.0)] * (m + 1)),
        F.lit(1.0),
    )
    state = arr.select(
        F.size("a").alias("n"),
        F.aggregate(
            F.slice("a", 2, F.size("a") - 1), init, step
        ).alias("s"),
    )
    return state.select(
        F.explode(F.sequence(F.lit(1), F.lit(m))).alias("horizon_days"),
        F.col("n").cast("long").alias("n_days"),
        F.element_at("s", 1).alias("level"),
        F.element_at("s", 2).alias("trend"),
        F.element_at(
            "s",
            (3 + (F.col("n") - 1 + F.col("horizon_days")) % m).cast("int"),
        ).alias("seasonal"),
        (
            F.element_at("s", 1)
            + F.col("horizon_days") * F.element_at("s", 2)
            + F.element_at(
                "s",
                (3 + (F.col("n") - 1 + F.col("horizon_days")) % m).cast(
                    "int"
                ),
            )
        ).alias("forecast"),
    )


@query(
    "session_engagement_summary",
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
    SELECT user_id,
           SUM(is_new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_seq,
           epoch_us(ts) AS t_us
    FROM flagged
),
spans AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(t_us) - MIN(t_us) AS BIGINT) AS dur_us
    FROM sess GROUP BY user_id, session_seq
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) FILTER (n_events = 1) AS BIGINT) AS n_bounces,
       CAST(COUNT(*) FILTER (n_events = 1) AS DOUBLE) / COUNT(*)
           AS bounce_rate,
       CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS events_per_session,
       (CAST(SUM(dur_us) AS DOUBLE) / COUNT(*)) / 60000000
           AS mean_dwell_minutes,
       list_sort(list(dur_us))[CAST((COUNT(*) + 1) // 2 AS BIGINT)]
           / CAST(60000000 AS DOUBLE) AS median_dwell_minutes
FROM spans
""",
)
def session_engagement_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics engagement readout over 30-minute sessions:
    session count, bounce rate (single-event sessions), events per
    session, and mean + median dwell time — the dashboard row every
    web/app analytics stack reports. Durations are exact integer
    microseconds; the median is a lower-median ORDER STATISTIC and
    every rate is one exact-integer division, so the whole row is
    hash-exact. Same one-exchange sessionize device as the certified
    session family; the final fold is one row."""
    from pyspark.sql import Window

    ev = load_spread(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.select(
        "user_id",
        F.sum(is_new).over(run).alias("session_seq"),
        us.alias("t_us"),
    )
    spans = sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("t_us") - F.min("t_us")).cast("long").alias("dur_us"),
    )
    agg = spans.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
        F.sum("n_events").cast("long").alias("tot_events"),
        F.sum("dur_us").cast("long").alias("tot_dur"),
        F.sort_array(F.collect_list("dur_us")).alias("ds"),
    )
    return agg.select(
        "n_sessions",
        "n_bounces",
        (F.col("n_bounces").cast("double") / F.col("n_sessions")).alias(
            "bounce_rate"
        ),
        (F.col("tot_events").cast("double") / F.col("n_sessions")).alias(
            "events_per_session"
        ),
        (
            (F.col("tot_dur").cast("double") / F.col("n_sessions"))
            / 60_000_000
        ).alias("mean_dwell_minutes"),
        (
            F.element_at(
                "ds", ((F.col("n_sessions") + 1) / 2).cast("int")
            )
            / F.lit(60_000_000.0)
        ).alias("median_dwell_minutes"),
    )


def _abc_xyz_oracle() -> str:
    from stadvdb_olap_spark.plans.catalog import REGISTRY

    abc = REGISTRY["abc_classification_parts"].oracle
    return f"""
WITH abc AS MATERIALIZED ({abc}),
wk AS (
    SELECT l_partkey,
           date_trunc('week', l_shipdate) AS w,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
    FROM lineitem GROUP BY 1, 2
),
horizon AS (
    SELECT CAST(COUNT(DISTINCT date_trunc('week', l_shipdate)) AS BIGINT)
        AS n_weeks
    FROM lineitem
),
mom AS (
    SELECT l_partkey,
           CAST(SUM(q) AS BIGINT) AS s1,
           CAST(SUM(q * q) AS BIGINT) AS s2
    FROM wk GROUP BY l_partkey
),
cv AS (
    SELECT l_partkey,
           sqrt(greatest(
               CAST(s2 AS DOUBLE) / n_weeks
                   - (CAST(s1 AS DOUBLE) / n_weeks)
                   * (CAST(s1 AS DOUBLE) / n_weeks),
               CAST(0 AS DOUBLE)))
               / (CAST(s1 AS DOUBLE) / n_weeks) AS cv
    FROM mom CROSS JOIN horizon
)
SELECT abc.l_partkey, abc.abc_class, cv.cv,
       CASE WHEN cv.cv <= 0.5 THEN 'X'
            WHEN cv.cv <= 1.0 THEN 'Y'
            ELSE 'Z' END AS xyz_class
FROM abc JOIN cv USING (l_partkey)
"""


@query("abc_xyz_matrix_parts", oracle=_abc_xyz_oracle())
def abc_xyz_matrix_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC×XYZ inventory matrix: the certified Pareto revenue classes
    crossed with demand-variability classes from the coefficient of
    variation of WEEKLY demand (zero-demand weeks included via the
    global week horizon — the standard XYZ convention: X ≤ 0.5 steady,
    Y ≤ 1.0 seasonal/irregular, Z erratic). The planning matrix behind
    stocking policy (A-X → automate, C-Z → make-to-order). Exactness:
    weekly quantities are exact BIGINTs, population variance derives
    from Σq, Σq² and the week count with a PINNED op order (guarded at
    zero), and CV spends one sqrt + divisions — identical doubles both
    engines. One extra (part, week) aggregate + a part-keyed join onto
    the ABC ranking."""

    abc = abc_classification_parts(spark, sf_dir).select(
        "l_partkey", "abc_class"
    )
    li = load_spread(spark, sf_dir, "lineitem")
    wk = li.groupBy(
        "l_partkey", F.date_trunc("week", "l_shipdate").alias("w")
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
    horizon = li.agg(
        F.count_distinct(F.date_trunc("week", "l_shipdate"))
        .cast("long")
        .alias("n_weeks")
    )
    mom = wk.groupBy("l_partkey").agg(
        F.sum("q").cast("long").alias("s1"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_weeks")
    var = F.greatest(
        F.col("s2").cast("double") / F.col("n_weeks") - mean * mean,
        F.lit(0.0),
    )
    cv = mom.crossJoin(F.broadcast(horizon)).select(
        "l_partkey", (F.sqrt(var) / mean).alias("cv")
    )
    return abc.join(cv, "l_partkey").select(
        "l_partkey",
        "abc_class",
        "cv",
        F.when(F.col("cv") <= 0.5, "X")
        .when(F.col("cv") <= 1.0, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )


_CROSTON_ALPHA = 0.5
_CROSTON_QMIN = 49  # rare-demand screen: quantity >= 49 is ~4% of lines


def _croston_step_sql(acc: str, x: str) -> str:
    a = _CROSTON_ALPHA
    z, p, prev = f"{acc}[1]", f"{acc}[2]", f"{acc}[3]"
    y, day = f"{x}[1]", f"{x}[2]"
    newz = f"(CAST('{a!r}' AS DOUBLE) * {y} + CAST('{1 - a!r}' AS DOUBLE) * {z})"
    newp = (
        f"(CAST('{a!r}' AS DOUBLE) * ({day} - {prev})"
        f" + CAST('{1 - a!r}' AS DOUBLE) * {p})"
    )
    return f"[{newz}, {newp}, {day}]"


@query(
    "croston_intermittent_demand",
    oracle=f"""
WITH demand AS (
    SELECT CAST(l_shipdate AS DATE) AS d,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
    FROM lineitem WHERE l_quantity >= {_CROSTON_QMIN}
    GROUP BY 1
),
l AS (
    SELECT list_transform(
               list_sort(list(struct_pack(d := d, q := q))),
               e -> [CAST(e.q AS DOUBLE),
                     CAST(date_diff('day', DATE '1970-01-01', e.d)
                          AS DOUBLE)]) AS a
    FROM demand
),
state AS (
    SELECT len(a) AS n,
           list_reduce(
               list_prepend([a[1][1], CAST(1 AS DOUBLE), a[1][2]], a[2:]),
               (acc, x) -> {_croston_step_sql('acc', 'x')}) AS s
    FROM l
)
SELECT CAST(n AS BIGINT) AS n_demand_days,
       s[1] AS demand_level,
       s[2] AS mean_interval_days,
       s[1] / s[2] AS forecast_per_day
FROM state
""",
)
def croston_intermittent_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (1972) for INTERMITTENT demand — the standard
    forecaster when most periods have zero demand (spare parts, tail
    SKUs), where plain exponential smoothing collapses toward zero:
    smooth the nonzero demand sizes and the inter-demand intervals
    SEPARATELY (α=0.5, binary-exact), forecast = level/interval per
    day. The demand series is the rare-tail screen (daily quantity
    from lines with q >= 49); the fold runs over nonzero-demand
    days only with calendar-day intervals, state [z, p, last_day] as a
    DOUBLE[3] list (the Holt-Winters list-fold device, init prepended),
    so both engines replay the identical recurrence. One fact-sized
    filtered rollup, one row of state."""
    li = load_spread(spark, sf_dir, "lineitem")
    demand = (
        li.filter(F.col("l_quantity") >= _CROSTON_QMIN)
        .groupBy(F.col("l_shipdate").cast("date").alias("d"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
    )
    arr = demand.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("d", "q"))),
            lambda e: F.array(
                e["q"].cast("double"),
                F.datediff(e["d"], F.lit("1970-01-01").cast("date")).cast(
                    "double"
                ),
            ),
        ).alias("a")
    )
    a_ = _CROSTON_ALPHA

    def step(acc, x):
        z = F.element_at(acc, 1)
        p = F.element_at(acc, 2)
        prev = F.element_at(acc, 3)
        y = F.element_at(x, 1)
        day = F.element_at(x, 2)
        newz = F.lit(a_) * y + F.lit(1 - a_) * z
        newp = F.lit(a_) * (day - prev) + F.lit(1 - a_) * p
        return F.array(newz, newp, day)

    first = F.element_at(F.col("a"), 1)
    init = F.array(
        F.element_at(first, 1), F.lit(1.0), F.element_at(first, 2)
    )
    state = arr.select(
        F.size("a").alias("n"),
        F.aggregate(
            F.slice("a", 2, F.size("a") - 1), init, step
        ).alias("s"),
    )
    return state.select(
        F.col("n").cast("long").alias("n_demand_days"),
        F.element_at("s", 1).alias("demand_level"),
        F.element_at("s", 2).alias("mean_interval_days"),
        (F.element_at("s", 1) / F.element_at("s", 2)).alias(
            "forecast_per_day"
        ),
    )


@query(
    "price_index_laspeyres_yearly",
    oracle="""
WITH py AS (
    SELECT CAST(year(l_shipdate) AS BIGINT) AS y,
           l_partkey,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS p
    FROM lineitem GROUP BY 1, 2
),
base AS (
    SELECT l_partkey, q AS q0, p AS p0 FROM py
    WHERE y = (SELECT MIN(y) FROM py)
),
terms AS (
    SELECT py.y,
           py.p * b.q0 AS num_term,
           b.p0 * b.q0 AS den_term
    FROM py JOIN base b USING (l_partkey)
)
SELECT y,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_sort(list(num_term))), (a, b) -> a + b)
       / list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_sort(list(den_term))), (a, b) -> a + b) AS laspeyres_index
FROM terms GROUP BY y
""",
)
def price_index_laspeyres_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index per ship-year: Σ p_t·q₀ / Σ p₀·q₀ over the
    parts traded in the base (first) year — the fixed-basket inflation
    measure (the CPI construction), answering "how much would the
    base-year basket cost at year-t prices". Per-(year, part) unit
    price = exact decimal revenue / exact integer quantity (one
    division); each basket term is one double multiply; both basket
    sums fold over SORTED term arrays (the sorted-fold device) so the
    index is hash-exact. Two keyed aggregates + one part-keyed join;
    the base-year basket broadcasts at any scale."""
    from pyspark.sql import Window  # noqa: F401

    li = load_spread(spark, sf_dir, "lineitem")
    py = li.groupBy(
        F.year("l_shipdate").cast("long").alias("y"), "l_partkey"
    ).agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"),
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                "double"
            )
            / F.sum(F.col("l_quantity").cast("long")).cast("double")
        ).alias("p"),
    )
    y0 = py.agg(F.min("y").alias("y0"))
    base = (
        py.join(F.broadcast(y0), py["y"] == y0["y0"])
        .select(
            "l_partkey",
            F.col("q").alias("q0"),
            F.col("p").alias("p0"),
        )
    )
    terms = py.join(base, "l_partkey").select(
        "y",
        (F.col("p") * F.col("q0")).alias("num_term"),
        (F.col("p0") * F.col("q0")).alias("den_term"),
    )
    fold = lambda c: F.aggregate(
        F.sort_array(F.collect_list(c)), F.lit(0.0), lambda a, x: a + x
    )
    return terms.groupBy("y").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        (fold("num_term") / fold("den_term")).alias("laspeyres_index"),
    )


_TREND_WINDOW_DAYS = 90


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue as exact integer cents with a dense day rank —
    shared base of the trend estimators (exact: decimal sum, *100,
    BIGINT)."""
    orders = load_spread(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
        .select(
            "cents",
            F.row_number().over(Window.orderBy("d")).cast("long").alias("t"),
        )
    )


def _windowed_pairs(daily: DataFrame, w: int) -> DataFrame:
    """All (a, b) day pairs with 1 <= t_b - t_a <= w, built as an
    explode + EQUI-join rather than a range join: each left row fans
    out into its w candidate lags and joins hash-partitioned on the
    right day rank. A `b.t BETWEEN a.t+1 AND a.t+w` predicate would
    plan as BroadcastNestedLoopJoin (all-pairs work bounded only by
    the broadcast); the explode form shuffles O(n*w) rows on an exact
    key and survives a minute-grain series where n^2 pairs would not."""
    a = daily.select(F.col("cents").alias("ca"), F.col("t").alias("ta"))
    b = daily.select(F.col("cents").alias("cb"), F.col("t").alias("tb"))
    fan = a.select(
        "ca",
        "ta",
        F.explode(F.sequence(F.lit(1), F.lit(w))).alias("lag"),
    ).select("ca", "ta", (F.col("ta") + F.col("lag")).alias("tb"))
    return fan.join(b, "tb")


@query(
    "theil_sen_windowed_trend_daily_revenue",
    oracle=f"""
WITH daily AS (
    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents,
           CAST(row_number() OVER (ORDER BY CAST(o_orderdate AS DATE))
               AS BIGINT) AS t
    FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
slopes AS (
    SELECT CAST(b.cents - a.cents AS DOUBLE) / (b.t - a.t) AS s
    FROM daily a JOIN daily b
      ON b.t > a.t AND b.t <= a.t + {_TREND_WINDOW_DAYS}
),
med AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           list_sort(list(s))[CAST((COUNT(*) + 1) // 2 AS BIGINT)]
               AS slope_cents
    FROM slopes
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
ic AS (
    SELECT list_sort(list(cents - slope_cents * t))[
               CAST((COUNT(*) + 1) // 2 AS BIGINT)] AS icpt_cents
    FROM daily CROSS JOIN med
)
SELECT n_days, n_pairs,
       slope_cents / 100 AS slope_per_day,
       icpt_cents / 100 AS intercept
FROM med CROSS JOIN nd CROSS JOIN ic
""",
)
def theil_sen_windowed_trend_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bounded-lag Theil–Sen: the median pairwise slope restricted to
    pairs at most 90 days apart — the variant that survives a
    100x-finer time grain, where the exact estimator's O(n^2) pair set
    (fine at calendar resolution, see `theil_sen_trend_daily_revenue`)
    would explode. Pair generation is an explode + equi-join on the
    day rank (O(n*W) rows, hash-shuffled — never a nested-loop range
    join), so cost is linear in series length at fixed W. The
    windowed estimator keeps Theil–Sen's exactness story: integer
    cents / integer day gaps, one correctly rounded division per pair,
    lower-median order statistics only. Siegel (1982) and the
    monitoring literature use the same bounded-lag device for long
    series."""
    daily = _daily_cents(spark, sf_dir)
    slopes = _windowed_pairs(daily, _TREND_WINDOW_DAYS).select(
        (
            (F.col("cb") - F.col("ca")).cast("double")
            / (F.col("tb") - F.col("ta"))
        ).alias("s")
    )
    med = slopes.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sort_array(F.collect_list("s")).alias("ss"),
    ).select(
        "n_pairs",
        F.element_at(
            "ss", ((F.col("n_pairs") + 1) / 2).cast("int")
        ).alias("slope_cents"),
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    ic = (
        daily.crossJoin(F.broadcast(med))
        .select(
            (F.col("cents") - F.col("slope_cents") * F.col("t")).alias("r")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("nr"),
            F.sort_array(F.collect_list("r")).alias("rs"),
        )
        .select(
            F.element_at(
                "rs", ((F.col("nr") + 1) / 2).cast("int")
            ).alias("icpt_cents")
        )
    )
    return (
        med.crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(ic))
        .select(
            "n_days",
            "n_pairs",
            (F.col("slope_cents") / 100).alias("slope_per_day"),
            (F.col("icpt_cents") / 100).alias("intercept"),
        )
    )


@query(
    "mann_kendall_windowed_trend_daily_revenue",
    oracle=f"""
WITH daily AS (
    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents,
           CAST(row_number() OVER (ORDER BY CAST(o_orderdate AS DATE))
               AS BIGINT) AS t
    FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
s AS (
    SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                         WHEN b.cents < a.cents THEN -1 ELSE 0 END)
               AS BIGINT) AS s_stat,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM daily a JOIN daily b
      ON b.t > a.t AND b.t <= a.t + {_TREND_WINDOW_DAYS}
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
SELECT n_days, n_pairs, s_stat,
       CAST(s_stat AS DOUBLE) / n_pairs AS tau_windowed
FROM s CROSS JOIN nd
""",
)
def mann_kendall_windowed_trend_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bounded-lag Mann–Kendall trend agreement: S summed over pairs at
    most 90 days apart, published with the windowed pair count and
    the ratio S/n_pairs (a windowed tau in [-1, 1]). The classical
    variance/z-score formula assumes the FULL pair set, so this
    variant deliberately reports the agreement score only — the exact
    tie-corrected test lives in `mann_kendall_trend_daily_revenue`;
    this one is the long-series screen run at grains where n^2 pairs
    are unaffordable. Same explode + equi-join pair plan as windowed
    Theil–Sen (O(n*W), hash-shuffled); all-integer arithmetic until
    the single output division."""
    daily = _daily_cents(spark, sf_dir)
    s = _windowed_pairs(daily, _TREND_WINDOW_DAYS).agg(
        F.sum(
            F.when(F.col("cb") > F.col("ca"), 1)
            .when(F.col("cb") < F.col("ca"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("s_stat"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return s.crossJoin(F.broadcast(nd)).select(
        "n_days",
        "n_pairs",
        "s_stat",
        (F.col("s_stat").cast("double") / F.col("n_pairs")).alias(
            "tau_windowed"
        ),
    )


@query(
    "stratified_ate_priority_value",
    oracle="""
WITH joined AS (
  SELECT c_mktsegment AS seg,
         year(CAST(o_orderdate AS DATE)) AS y,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS tr,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
),
strata AS MATERIALIZED (
  SELECT seg, y,
         CAST(SUM(tr) AS BIGINT) AS n1,
         CAST(SUM(1 - tr) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN tr = 1 THEN cents ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN tr = 0 THEN cents ELSE 0 END) AS BIGINT) AS s0
  FROM joined GROUP BY seg, y
  HAVING SUM(tr) > 0 AND SUM(1 - tr) > 0
),
tot AS (
  SELECT CAST(SUM(n1 + n0) AS BIGINT) AS n,
         CAST(SUM(n1) AS BIGINT) AS n1t,
         CAST(SUM(n0) AS BIGINT) AS n0t,
         CAST(SUM(s1) AS BIGINT) AS s1t,
         CAST(SUM(s0) AS BIGINT) AS s0t,
         CAST(COUNT(*) AS BIGINT) AS n_strata
  FROM strata
),
terms AS (
  SELECT
    (CAST(n1 + n0 AS DOUBLE) / n)
      * (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0) AS ate_term,
    (CAST(n1 AS DOUBLE) / n1t)
      * (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0) AS att_term
  FROM strata CROSS JOIN tot
)
SELECT n_strata,
       n1t AS n_treated,
       n0t AS n_control,
       list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                list_sort(list(ate_term))),
                   (a, x) -> a + x) / 100 AS ate,
       list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                list_sort(list(att_term))),
                   (a, x) -> a + x) / 100 AS att,
       (CAST(s1t AS DOUBLE) / n1t - CAST(s0t AS DOUBLE) / n0t) / 100
         AS naive_diff
FROM terms CROSS JOIN tot
GROUP BY n_strata, n1t, n0t, s1t, s0t
""",
)
def stratified_ate_priority_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stratified average-treatment-effect estimate (standardization /
    direct adjustment, Cochran 1968): does urgent/high order priority
    move order value once market segment and order year are held fixed?
    Strata = segment x year; ATE weights each within-stratum
    treated-minus-control mean difference by stratum share, ATT by the
    stratum's share of TREATED units; only strata with both arms enter
    (the positivity screen), and the unadjusted naive difference is
    published beside the adjusted estimates to expose the confounding
    correction — completing the causal family next to
    `diff_in_diff_event_value` and `shapley_attribution_channels`.
    Exactness: all sums are integer cents / integer counts; each
    stratum's term spends three exact-operand divisions, one subtraction
    and one multiplication (correctly rounded on identical inputs); the
    cross-stratum reduction is a sorted fold over the ~35 bounded
    stratum terms (compat device #4). 100 TB shape: one fact-side hash
    join on the customer key, ONE hash aggregate to stratum grain
    (map-side combinable conditional sums), then driver-trivial
    35-row arithmetic."""
    orders = load_spread(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.year(F.col("o_orderdate").cast("date")).alias("y"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("tr"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    strata = (
        joined.groupBy("seg", "y")
        .agg(
            F.sum("tr").cast("long").alias("n1"),
            F.sum(1 - F.col("tr")).cast("long").alias("n0"),
            F.sum(F.when(F.col("tr") == 1, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("s1"),
            F.sum(F.when(F.col("tr") == 0, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("s0"),
        )
        .filter((F.col("n1") > 0) & (F.col("n0") > 0))
    )
    tot = strata.agg(
        F.sum(F.col("n1") + F.col("n0")).cast("long").alias("n"),
        F.sum("n1").cast("long").alias("n1t"),
        F.sum("n0").cast("long").alias("n0t"),
        F.sum("s1").cast("long").alias("s1t"),
        F.sum("s0").cast("long").alias("s0t"),
        F.count(F.lit(1)).cast("long").alias("n_strata"),
    )
    diff = F.col("s1").cast("double") / F.col("n1") - F.col(
        "s0"
    ).cast("double") / F.col("n0")
    terms = strata.crossJoin(F.broadcast(tot)).select(
        "n_strata",
        "n1t",
        "n0t",
        "s1t",
        "s0t",
        (
            ((F.col("n1") + F.col("n0")).cast("double") / F.col("n")) * diff
        ).alias("ate_term"),
        ((F.col("n1").cast("double") / F.col("n1t")) * diff).alias(
            "att_term"
        ),
    )
    fold = lambda c: F.aggregate(
        F.sort_array(F.collect_list(c)), F.lit(0.0), lambda a, x: a + x
    )
    return terms.groupBy("n_strata", "n1t", "n0t", "s1t", "s0t").agg(
        (fold("ate_term") / 100).alias("ate"),
        (fold("att_term") / 100).alias("att"),
        (
            (
                F.first("s1t").cast("double") / F.first("n1t")
                - F.first("s0t").cast("double") / F.first("n0t")
            )
            / 100
        ).alias("naive_diff"),
    ).select(
        "n_strata",
        F.col("n1t").alias("n_treated"),
        F.col("n0t").alias("n_control"),
        "ate",
        "att",
        "naive_diff",
    )


@query(
    "position_attribution_channels",
    oracle="""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vmicro
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT event_id AS touch_id, user_id, ts, event_type AS channel
  FROM events WHERE event_type IN ('view', 'click', 'signup')
),
seq AS MATERIALIZED (
  SELECT c.conv_id, c.vmicro, t.channel,
         CAST(row_number() OVER (
           PARTITION BY c.conv_id ORDER BY t.ts, t.touch_id
         ) AS BIGINT) AS pos,
         CAST(count(*) OVER (PARTITION BY c.conv_id) AS BIGINT) AS k
  FROM conv c JOIN touch t
    ON t.user_id = c.user_id
   AND t.ts < c.ts AND t.ts >= c.ts - INTERVAL 1 DAY
),
credit AS (
  SELECT conv_id, channel,
         vmicro * CASE
           WHEN k = 1 THEN 1000
           WHEN k = 2 THEN 500
           WHEN pos = 1 OR pos = k THEN 400
           ELSE (200 // (k - 2))
                + CASE WHEN pos - 1 <= 200 - (200 // (k - 2)) * (k - 2)
                       THEN 1 ELSE 0 END
         END AS units
  FROM seq
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_conversions,
       CAST(CAST(SUM(units) AS BIGINT) AS VARCHAR) AS credit_units,
       CAST(CAST(SUM(units) AS BIGINT) // 10000000 AS DOUBLE) / 100
         AS credit_dollars
FROM credit
GROUP BY channel
""",
)
def position_attribution_channels(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution — the rules-based
    industry model beside the game-theoretic
    `shapley_attribution_channels`: each purchase's value splits 40/20/40
    across its prior-day touch sequence (first touch 400 per-mille, last
    400, the middle 200 split evenly with the integer REMAINDER going
    one per-mille each to the earliest middle touches; k=1 takes all
    1000, k=2 splits 500/500). Credits are EXACT INTEGERS end-to-end:
    value in micro-units x per-mille weights, so conservation (every
    conversion's credits sum to exactly vmicro*1000) holds by integer
    arithmetic, not float approximation — the published total converts
    via the DIV-to-cents device (channel sums exceed 2^53, where a
    direct BIGINT->DOUBLE conversion diverges between engines) plus the
    exact digit string. The touch join shuffles BOTH roles once on
    user_id with the day bound as a residual predicate (same plan
    family as `click_purchase_attribution`), then one window per
    conversion and one hash aggregate to |channels| rows."""
    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
        (F.col("value").cast("decimal(18,6)") * 1000000)
        .cast("long")
        .alias("vmicro"),
    )
    touch = ev.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("tu"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
    )
    seq = (
        conv.join(
            touch,
            (F.col("tu") == F.col("cu"))
            & (F.col("tts") < F.col("cts"))
            & (F.col("tts") >= F.col("cts") - F.expr("INTERVAL 1 DAY")),
        )
        .select(
            "conv_id",
            "vmicro",
            "channel",
            F.row_number()
            .over(
                Window.partitionBy("conv_id").orderBy("tts", "touch_id")
            )
            .cast("long")
            .alias("pos"),
            F.count(F.lit(1))
            .over(Window.partitionBy("conv_id"))
            .cast("long")
            .alias("k"),
        )
    )
    units = F.col("vmicro") * (
        F.when(F.col("k") == 1, F.lit(1000))
        .when(F.col("k") == 2, F.lit(500))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("k")), F.lit(400))
        .otherwise(
            F.expr("200 DIV (k - 2)")
            + F.when(
                F.col("pos") - 1 <= 200 - F.expr("200 DIV (k - 2)") * (F.col("k") - 2),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
    )
    credit = seq.select("conv_id", "channel", units.alias("units"))
    return credit.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.countDistinct("conv_id").cast("long").alias("n_conversions"),
        F.sum("units").cast("long").cast("string").alias("credit_units"),
        (
            F.expr("sum(units) DIV 10000000").cast("double") / 100
        ).alias("credit_dollars"),
    )


@query(
    "arc_price_elasticity_brand_yearly",
    oracle="""
WITH li AS (
  SELECT p.p_brand AS brand,
         year(CAST(o.o_orderdate AS DATE)) AS y,
         CAST(l.l_quantity AS BIGINT) AS q,
         CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
),
by_year AS MATERIALIZED (
  SELECT brand, y,
         CAST(SUM(q) AS BIGINT) AS qty,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM li GROUP BY brand, y
),
paired AS (
  SELECT brand, y, qty, cents,
         lag(qty) OVER (PARTITION BY brand ORDER BY y) AS q1,
         lag(cents) OVER (PARTITION BY brand ORDER BY y) AS c1,
         lag(y) OVER (PARTITION BY brand ORDER BY y) AS y1
  FROM by_year
)
SELECT brand, y1 AS year_from, y AS year_to,
       CAST(q1 AS BIGINT) AS qty_from,
       CAST(qty AS BIGINT) AS qty_to,
       CAST(c1 AS DOUBLE) / q1 / 100 AS unit_price_from,
       CAST(cents AS DOUBLE) / qty / 100 AS unit_price_to,
       CASE WHEN (CAST(cents AS DOUBLE) / qty - CAST(c1 AS DOUBLE) / q1)
                 = CAST(0 AS DOUBLE)
            THEN CAST(NULL AS DOUBLE)
            ELSE (CAST(qty - q1 AS DOUBLE) / CAST(qty + q1 AS DOUBLE))
                 / ((CAST(cents AS DOUBLE) / qty - CAST(c1 AS DOUBLE) / q1)
                    / (CAST(cents AS DOUBLE) / qty + CAST(c1 AS DOUBLE) / q1))
       END AS arc_elasticity
FROM paired
WHERE y1 IS NOT NULL AND y1 = y - 1
""",
)
def arc_price_elasticity_brand_yearly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Arc (midpoint) price elasticity of demand per brand across
    consecutive years — Allen's midpoint formula
    ((q2-q1)/(q2+q1)) / ((p2-p1)/(p2+p1)), the log-free elasticity
    every pricing team computes before fitting a log-log model (ln is
    banned from hashed outputs per compat). Unit price = yearly revenue
    cents / yearly quantity, both exact BIGINTs, so every published
    value is a short chain of correctly rounded IEEE ops on exact
    operands — bit-identical across engines; a zero price change yields
    NULL (explicit CASE on BOTH sides — Spark runs ANSI, 0-division
    would throw). 100 TB shape: one fact-side double join (part/orders
    dims broadcast-eligible), ONE hash aggregate to brand x year grain,
    then a lag window over the tiny aggregate."""
    li = load_spread(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year(F.col("o_orderdate").cast("date")).alias("y")
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    by_year = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("brand", "y")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
                .cast("long")
            )
            .cast("long")
            .alias("cents"),
        )
    )
    w = Window.partitionBy("brand").orderBy("y")
    paired = by_year.select(
        "brand",
        "y",
        "qty",
        "cents",
        F.lag("qty").over(w).alias("q1"),
        F.lag("cents").over(w).alias("c1"),
        F.lag("y").over(w).alias("y1"),
    ).filter(F.col("y1").isNotNull() & (F.col("y1") == F.col("y") - 1))
    p2 = F.col("cents").cast("double") / F.col("qty")
    p1 = F.col("c1").cast("double") / F.col("q1")
    return paired.select(
        "brand",
        F.col("y1").alias("year_from"),
        F.col("y").alias("year_to"),
        F.col("q1").cast("long").alias("qty_from"),
        F.col("qty").cast("long").alias("qty_to"),
        (p1 / 100).alias("unit_price_from"),
        (p2 / 100).alias("unit_price_to"),
        F.when((p2 - p1) == F.lit(0.0), F.lit(None).cast("double"))
        .otherwise(
            (
                (F.col("qty") - F.col("q1")).cast("double")
                / (F.col("qty") + F.col("q1")).cast("double")
            )
            / ((p2 - p1) / (p2 + p1))
        )
        .alias("arc_elasticity"),
    )


@query(
    "ewma_control_chart_daily_revenue",
    oracle=f"""
WITH RECURSIVE daily AS (
    SELECT date_trunc('day', o_orderdate) AS d,
           {money_sum_sql('o_totalprice')} AS x
    FROM orders GROUP BY 1
),
seq AS MATERIALIZED (
    SELECT d, x, row_number() OVER (ORDER BY d) AS rn FROM daily
),
l AS MATERIALIZED (
    SELECT list_sort(list(struct_pack(d := d, x := x))) AS a FROM daily
),
m AS (
    SELECT CAST(len(a) AS DOUBLE) AS n,
           {_fold_sql('e.x')} AS sx
    FROM l
),
mv AS (
    SELECT n, sx / n AS mu FROM m
),
v AS (
    SELECT mv.n, mv.mu,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(l.a, e -> (e.x - mv.mu) * (e.x - mv.mu))),
               (p, q) -> p + q) / mv.n AS var
    FROM l CROSS JOIN mv
),
rec AS (
    SELECT d, rn, x, x AS y, CAST('0.25' AS DOUBLE) AS qpow
    FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.d, s.rn, s.x,
           CAST('0.5' AS DOUBLE) * s.x + CAST('0.5' AS DOUBLE) * r.y,
           CAST('0.25' AS DOUBLE) * r.qpow
    FROM seq s JOIN rec r ON s.rn = r.rn + 1
)
SELECT CAST(rec.d AS DATE) AS d,
       rec.x AS revenue,
       rec.y AS ewma,
       v.mu - 3 * sqrt((v.var / 3) * (1 - rec.qpow)) AS lcl,
       v.mu + 3 * sqrt((v.var / 3) * (1 - rec.qpow)) AS ucl,
       rec.y < v.mu - 3 * sqrt((v.var / 3) * (1 - rec.qpow))
         OR rec.y > v.mu + 3 * sqrt((v.var / 3) * (1 - rec.qpow))
         AS out_of_control
FROM rec CROSS JOIN v
""",
)
def ewma_control_chart_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EWMA control chart (Roberts 1959 / NIST handbook form) over daily
    revenue: the small-shift-sensitive SPC monitor. EWMA recursion
    y_t = λx_t + (1-λ)y_{t-1} with λ=1/2 (binary-exact multiplies, the
    `ewma_daily_value_by_type` device) runs as a JVM fold over the
    date-sorted calendar series, CARRYING the variance-decay power
    (1-λ)^{2t} = 0.25^t in the fold state (exact dyadic multiplies —
    never `pow`, which isn't correctly rounded); control limits are
    μ ± 3·sqrt(σ²·(λ/(2-λ))·(1-0.25^t)) with μ, σ² phase-I estimates
    from the same series via sorted-fold moments. Both engines execute
    the IDENTICAL op sequence (fold order pinned by date sort; each
    *, /, sqrt correctly rounded), so even this stateful chart
    hash-matches. 100 TB shape: one fact shuffle to the calendar grain;
    the recursion is resolution-bounded (≤ a few thousand days)."""
    orders = load_spread(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("d")
    ).agg(money_sum("o_totalprice").alias("x"))
    arr = daily.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("d"), F.col("x")))
        ).alias("a")
    )
    mv = arr.select(
        "a",
        F.size("a").cast("double").alias("n"),
        F.aggregate(
            F.col("a"), F.lit(0.0), lambda acc, e: acc + e["x"]
        ).alias("sx"),
    ).select("a", "n", (F.col("sx") / F.col("n")).alias("mu"))
    v = mv.select(
        "a",
        "mu",
        (
            F.aggregate(
                F.col("a"),
                F.lit(0.0),
                lambda acc, e: acc
                + (e["x"] - F.col("mu")) * (e["x"] - F.col("mu")),
            )
            / F.col("n")
        ).alias("var"),
    )
    state0 = F.expr(
        "CAST(array() AS ARRAY<STRUCT<d: TIMESTAMP, x: DOUBLE, "
        "y: DOUBLE, qpow: DOUBLE>>)"
    )
    folded = v.select(
        "mu",
        "var",
        F.aggregate(
            F.col("a"),
            state0,
            lambda acc, e: F.when(
                F.size(acc) == 0,
                F.array(
                    F.struct(
                        e["d"].alias("d"),
                        e["x"].alias("x"),
                        e["x"].alias("y"),
                        F.lit(0.25).alias("qpow"),
                    )
                ),
            ).otherwise(
                F.concat(
                    acc,
                    F.array(
                        F.struct(
                            e["d"].alias("d"),
                            e["x"].alias("x"),
                            (
                                F.lit(0.5) * e["x"]
                                + F.lit(0.5)
                                * F.element_at(acc, -1)["y"]
                            ).alias("y"),
                            (
                                F.lit(0.25)
                                * F.element_at(acc, -1)["qpow"]
                            ).alias("qpow"),
                        )
                    ),
                )
            ),
        ).alias("s"),
    )
    ex = folded.select(
        "mu", "var", F.explode("s").alias("e")
    )
    half_width = F.lit(3) * F.sqrt(
        (F.col("var") / F.lit(3)) * (F.lit(1) - F.col("e.qpow"))
    )
    lcl = F.col("mu") - half_width
    ucl = F.col("mu") + half_width
    return ex.select(
        F.col("e.d").cast("date").alias("d"),
        F.col("e.x").alias("revenue"),
        F.col("e.y").alias("ewma"),
        lcl.alias("lcl"),
        ucl.alias("ucl"),
        ((F.col("e.y") < lcl) | (F.col("e.y") > ucl)).alias(
            "out_of_control"
        ),
    )



# ---------------------------------------------------------------------------
# Markov-chain (removal-effect) data-driven attribution
# ---------------------------------------------------------------------------

_MKV_T = 12  # pinned backward-induction horizon
# dense state order: indices 1..4 transient, 5 = CONV, 6 = LOSS
_MKV_NAMES = ("START", "view", "click", "signup", "CONV", "LOSS")


def _mkv_fold_sql(inner: str) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(list_sort(list({inner})), e -> e.t)), "
        "(a, b) -> a + b)"
    )


def _markov_oracle() -> str:
    names_sql = "[" + ", ".join(f"'{n}'" for n in _MKV_NAMES) + "]"
    return f"""
WITH flagged AS (
    SELECT user_id, event_id, ts, event_type,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                     OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                THEN 1 ELSE 0 END AS is_new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, ts, event_id, event_type,
           SUM(is_new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_seq
    FROM flagged
),
touch AS (
    SELECT user_id, session_seq,
           list(event_type ORDER BY ts, event_id)
               FILTER (WHERE event_type IN ('view', 'click', 'signup'))
               AS touches,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
               AS conv
    FROM sess GROUP BY user_id, session_seq
),
seqs AS (
    SELECT list_concat(
               list_concat(['START'], COALESCE(touches, [])),
               [CASE WHEN conv THEN 'CONV' ELSE 'LOSS' END]) AS sq
    FROM touch
),
trans AS (
    SELECT sq[i] AS src, sq[i + 1] AS dst
    FROM seqs, unnest(generate_series(1, len(sq) - 1)) AS u(i)
),
cnt AS MATERIALIZED (
    SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c
    FROM trans GROUP BY src, dst
),
variants AS (SELECT unnest(['', 'view', 'click', 'signup']) AS removed),
vcnt AS (
    SELECT v.removed, cnt.src,
           CASE WHEN cnt.dst = v.removed THEN 'LOSS' ELSE cnt.dst END AS dst,
           CAST(SUM(c) AS BIGINT) AS c
    FROM cnt CROSS JOIN variants v
    WHERE cnt.src <> v.removed
    GROUP BY 1, 2, 3
),
tot AS (SELECT removed, src, CAST(SUM(c) AS BIGINT) AS t
        FROM vcnt GROUP BY 1, 2),
p AS (
    SELECT vcnt.removed, vcnt.src, vcnt.dst,
           CAST(vcnt.c AS DOUBLE) / tot.t AS p
    FROM vcnt JOIN tot ON tot.removed = vcnt.removed AND tot.src = vcnt.src
),
dense AS MATERIALIZED (
    SELECT removed,
           list_transform(generate_series(1, 24), idx ->
               COALESCE(
                   list_filter(
                       list(struct_pack(src := src, dst := dst, p := p)),
                       e -> e.src = {names_sql}[(idx - 1) // 6 + 1]
                        AND e.dst = {names_sql}[(idx - 1) % 6 + 1]
                   )[1].p,
                   CAST(0 AS DOUBLE))) AS m
    FROM p GROUP BY removed
),
iter AS (
    SELECT removed,
           list_reduce(
               list_prepend(
                   [CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                    CAST(0 AS DOUBLE), CAST(1 AS DOUBLE), CAST(0 AS DOUBLE)],
                   list_transform(generate_series(1, {_MKV_T}),
                                  x -> CAST(NULL AS DOUBLE[]))),
               (acc, step) -> list_transform(generate_series(1, 6), s ->
                   CASE WHEN s <= 4 THEN
                       list_reduce(
                           list_prepend(CAST(0 AS DOUBLE),
                               list_transform(generate_series(1, 6), j ->
                                   m[6 * (s - 1) + j] * acc[j])),
                           (a2, b2) -> a2 + b2)
                   WHEN s = 5 THEN CAST(1 AS DOUBLE)
                   ELSE CAST(0 AS DOUBLE) END)) AS u
    FROM dense
),
pstart AS (SELECT removed, u[1] AS pc FROM iter),
base AS (SELECT pc AS p0 FROM pstart WHERE removed = ''),
eff AS (
    SELECT removed AS channel, pc AS p_removed, p0,
           (p0 - pc) / p0 AS removal_effect
    FROM pstart CROSS JOIN base
    WHERE removed <> ''
),
teff AS (
    SELECT {_mkv_fold_sql("struct_pack(d := channel, t := removal_effect)")}
        AS s
    FROM eff
)
SELECT channel, p0 AS p_conversion, p_removed,
       removal_effect,
       CASE WHEN s = 0 THEN CAST(0 AS DOUBLE)
            ELSE removal_effect / s END AS attribution_share
FROM eff CROSS JOIN teff
"""


@query("markov_removal_attribution", oracle=_markov_oracle())
def markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven Markov-chain attribution (first-order chain, removal
    effect — the model behind data-driven attribution systems): build
    the session-level touch chain START → touches → CONV/LOSS (the
    certified 30-minute sessionization), estimate transition
    probabilities from exact integer counts, and credit each channel by
    how much the pinned-horizon conversion probability of START drops
    when the channel is removed (its inbound edges redirect to LOSS at
    COUNT level, so probabilities stay exact integer ratios).
    Conversion probability is 12-step backward induction
    u' (s) = Σ_j P[s][j]·u[j] with absorbing CONV=1/LOSS=0, computed as
    a WITHIN-ROW nested fold over a dense 4x6 matrix per chain variant
    — index-ordered lambda arithmetic, every multiply-add correctly
    rounded in the same sequence on both engines, no joins or
    iteration-state shuffles at all. All four variants (base + 3
    removals) are rows of one 4-row relation. 100 TB shape: the only
    fact-scale work is sessionization (one user-keyed exchange) and the
    transition count (one hash aggregate); the model solve is 4 rows x
    a closed expression, and thousands of variants/segments would
    parallelize as ordinary rows."""
    ev = load_spread(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.withColumn("session_seq", F.sum(is_new).over(run))
    touch = sess.groupBy("user_id", "session_seq").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("evs"),
        (
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            == 1
        ).alias("conv"),
    )
    touches = F.filter(
        F.transform(F.col("evs"), lambda e: e["event_type"]),
        lambda t: t.isin("view", "click", "signup"),
    )
    seq = F.concat(
        F.array(F.lit("START")),
        touches,
        F.array(F.when(F.col("conv"), "CONV").otherwise("LOSS")),
    )
    trans = touch.select(seq.alias("sq")).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("sq") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("sq"), i).alias("src"),
                    F.element_at(F.col("sq"), i + 1).alias("dst"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    cnt = trans.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    variants = spark.createDataFrame(
        [("",), ("view",), ("click",), ("signup",)], ["removed"]
    )
    vcnt = (
        cnt.crossJoin(F.broadcast(variants))
        .filter(F.col("src") != F.col("removed"))
        .groupBy(
            "removed",
            "src",
            F.when(F.col("dst") == F.col("removed"), "LOSS")
            .otherwise(F.col("dst"))
            .alias("dst"),
        )
        .agg(F.sum("c").cast("long").alias("c"))
    )
    tot = vcnt.groupBy("removed", "src").agg(
        F.sum("c").cast("long").alias("t")
    )
    p = vcnt.join(tot, ["removed", "src"]).select(
        "removed",
        "src",
        "dst",
        (F.col("c").cast("double") / F.col("t")).alias("p"),
    )
    names = F.array(*[F.lit(n) for n in _MKV_NAMES])
    dense = p.groupBy("removed").agg(
        F.collect_list(F.struct("src", "dst", "p")).alias("edges")
    ).select(
        "removed",
        F.transform(
            F.sequence(F.lit(1), F.lit(24)),
            lambda idx: F.coalesce(
                F.get(
                    F.filter(
                        F.col("edges"),
                        lambda e: (
                            e["src"]
                            == F.element_at(names, ((idx - 1) / 6).cast("int") + 1)
                        )
                        & (
                            e["dst"]
                            == F.element_at(names, ((idx - 1) % 6).cast("int") + 1)
                        ),
                    ),
                    F.lit(0),
                )["p"],
                F.lit(0.0),
            ),
        ).alias("m"),
    )
    u0 = F.array(
        F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0)
    )
    stepped = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(_MKV_T)),
            lambda x: F.lit(None).cast("double"),
        ),
        u0,
        lambda acc, step: F.transform(
            F.sequence(F.lit(1), F.lit(6)),
            lambda s: F.when(
                s <= 4,
                F.aggregate(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(6)),
                        lambda j: F.element_at(
                            F.col("m"), (6 * (s - 1) + j).cast("int")
                        )
                        * F.element_at(acc, j.cast("int")),
                    ),
                    F.lit(0.0),
                    lambda a2, b2: a2 + b2,
                ),
            )
            .when(s == 5, F.lit(1.0))
            .otherwise(F.lit(0.0)),
        ),
    )
    pstart = dense.select(
        "removed", F.element_at(stepped, 1).alias("pc")
    )
    base = pstart.filter(F.col("removed") == "").select(
        F.col("pc").alias("p0")
    )
    eff = (
        pstart.filter(F.col("removed") != "")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("removed").alias("channel"),
            F.col("pc").alias("p_removed"),
            "p0",
            ((F.col("p0") - F.col("pc")) / F.col("p0")).alias(
                "removal_effect"
            ),
        )
    )
    teff = eff.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("channel").alias("d"),
                        F.col("removal_effect").alias("t"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, e: acc + e["t"],
        ).alias("s")
    )
    return eff.crossJoin(F.broadcast(teff)).select(
        "channel",
        F.col("p0").alias("p_conversion"),
        "p_removed",
        "removal_effect",
        F.when(F.col("s") == 0, F.lit(0.0))
        .otherwise(F.col("removal_effect") / F.col("s"))
        .alias("attribution_share"),
    )


_CCF_MAX_LAG = 7


@query(
    "ccf_leadlag_click_purchase",
    oracle=f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS x,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS y
    FROM events GROUP BY 1
),
ks AS (SELECT unnest(generate_series(-{_CCF_MAX_LAG}, {_CCF_MAX_LAG})) AS k),
pairs AS (
    SELECT ks.k, a.d AS d, CAST(a.x AS DOUBLE) AS x, CAST(b.y AS DOUBLE) AS y
    FROM daily a
    CROSS JOIN ks
    JOIN daily b ON b.d = a.d + CAST(ks.k AS INTEGER)
),
l AS (
    SELECT k, list_sort(list(struct_pack(d := d, x := x, y := y))) AS a
    FROM pairs GROUP BY k
),
m AS (
    SELECT k, CAST(len(a) AS DOUBLE) AS n,
           {_fold_sql('e.x')} AS sx,
           {_fold_sql('e.y')} AS sy,
           {_fold_sql('e.x * e.y')} AS sxy,
           {_fold_sql('e.x * e.x')} AS sxx,
           {_fold_sql('e.y * e.y')} AS syy
    FROM l
)
SELECT CAST(k AS BIGINT) AS lag,
       CAST(n AS BIGINT) AS n_pairs,
       {_pearson_from_sums_sql('n', 'sx', 'sy', 'sxy', 'sxx', 'syy')} AS ccf
FROM m
""",
)
def ccf_leadlag_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between daily click and purchase
    counts at lags −7..+7 — the lead/lag detector (a peak at positive
    lag k means clicks lead purchases by k days, the input to
    marketing-mix timing models; the two-series generalization of
    `acf_panel_daily_revenue`). Counts are exact BIGINTs, pair
    generation is the explode+equi-join device over the calendar grain
    (date + integer-lag equi-key), and per-lag Pearson moments fold
    over the date-sorted pair list. 100 TB shape: one fact shuffle for
    the daily rollup; everything after runs on ≤ days·15 rows."""
    ev = load_spread(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    ks = spark.range(-_CCF_MAX_LAG, _CCF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("k")
    )
    a = daily.select("d", F.col("x").cast("double").alias("x"))
    b = daily.select(
        F.col("d").alias("d2"), F.col("y").cast("double").alias("y")
    )
    pairs = (
        a.crossJoin(F.broadcast(ks))
        .join(b, F.col("d2") == F.date_add(F.col("d"), F.col("k")))
        .select("k", "d", "x", "y")
    )
    arr = pairs.groupBy("k").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("d"), F.col("x"), F.col("y")))
        ).alias("a")
    )

    def fold(term):
        return F.aggregate(
            F.col("a"), F.lit(0.0), lambda acc, e: acc + term(e)
        )

    m = arr.select(
        "k",
        F.size("a").cast("double").alias("n"),
        fold(lambda e: e["x"]).alias("sx"),
        fold(lambda e: e["y"]).alias("sy"),
        fold(lambda e: e["x"] * e["y"]).alias("sxy"),
        fold(lambda e: e["x"] * e["x"]).alias("sxx"),
        fold(lambda e: e["y"] * e["y"]).alias("syy"),
    )
    return m.select(
        F.col("k").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        _pearson_from_sums(
            F.col("n"), F.col("sx"), F.col("sy"),
            F.col("sxy"), F.col("sxx"), F.col("syy"),
        ).alias("ccf"),
    )


@query(
    "new_vs_returning_daily_revenue",
    oracle=f"""
WITH first_order AS (
    SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_d
    FROM orders GROUP BY o_custkey
)
SELECT CAST(o.o_orderdate AS DATE) AS d,
       CAST(COUNT(*) FILTER (CAST(o.o_orderdate AS DATE) = f.first_d)
            AS BIGINT) AS n_new,
       CAST(COUNT(*) FILTER (CAST(o.o_orderdate AS DATE) <> f.first_d)
            AS BIGINT) AS n_returning,
       {money_sum_sql('CASE WHEN CAST(o.o_orderdate AS DATE) = f.first_d '
                      'THEN o.o_totalprice ELSE 0 END')} AS new_revenue,
       {money_sum_sql('CASE WHEN CAST(o.o_orderdate AS DATE) <> f.first_d '
                      'THEN o.o_totalprice ELSE 0 END')} AS returning_revenue
FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
GROUP BY 1
""",
)
def new_vs_returning_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """New-vs-returning decomposition of daily revenue — the growth
    accounting view every revenue dashboard leads with: an order is
    "new" when placed on its customer's first-ever order date,
    "returning" otherwise. One aggregate to per-customer first dates,
    one same-keyed join back (first_order is customer-grain — at 100 TB
    this is a co-partitioned shuffle join on o_custkey, or a broadcast
    when the customer dimension fits), one calendar-grain aggregate.
    Counts are BIGINT; the split revenues are exact decimal sums with
    one double conversion each."""
    orders = load_spread(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    first = orders.groupBy("o_custkey").agg(
        F.min(d).alias("first_d")
    )
    is_new = d == F.col("first_d")
    return (
        orders.join(first, "o_custkey")
        .groupBy(d.alias("d"))
        .agg(
            F.sum(F.when(is_new, 1).otherwise(0)).cast("long").alias("n_new"),
            F.sum(F.when(is_new, 0).otherwise(1))
            .cast("long")
            .alias("n_returning"),
            money_sum(
                F.when(is_new, F.col("o_totalprice")).otherwise(F.lit(0))
            ).alias("new_revenue"),
            money_sum(
                F.when(is_new, F.lit(0)).otherwise(F.col("o_totalprice"))
            ).alias("returning_revenue"),
        )
    )


@query(
    "ks_test_value_click_purchase",
    oracle="""
WITH sub AS (
    SELECT event_type, value FROM events
    WHERE event_type IN ('click', 'purchase')
),
pv AS (
    SELECT value,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS c1,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS c2
    FROM sub GROUP BY value
),
cum AS (
    SELECT value,
           CAST(SUM(c1) OVER (ORDER BY value) AS BIGINT) AS f1,
           CAST(SUM(c2) OVER (ORDER BY value) AS BIGINT) AS f2
    FROM pv
),
n AS (
    SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
    FROM pv
),
d AS (
    SELECT CAST(MAX(abs(f1 * n2 - f2 * n1)) AS BIGINT) AS d_num
    FROM cum CROSS JOIN n
)
SELECT n1, n2, d_num,
       CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2) AS d_stat,
       CAST('1.358' AS DOUBLE)
           * sqrt((CAST(n1 AS DOUBLE) + n2) / (CAST(n1 AS DOUBLE) * n2))
           AS d_crit_05,
       CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)
           > CAST('1.358' AS DOUBLE)
             * sqrt((CAST(n1 AS DOUBLE) + n2) / (CAST(n1 AS DOUBLE) * n2))
           AS reject_05
FROM d CROSS JOIN n
""",
)
def ks_test_value_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test comparing the `value`
    distributions of click vs purchase events — the distribution-shape
    companion to the location-only Mann-Whitney U: D = max |ECDF₁ −
    ECDF₂|, with the 5% decision at c(α)·sqrt((n1+n2)/(n1·n2)),
    c(0.05)=1.358 (Smirnov's asymptotic table, pinned literal). EXACT
    device: the ECDF gap maximand is kept as the INTEGER |F1·n2 −
    F2·n1| (max over integers needs no float care at all), so D spends
    one division and the critical value one sqrt — deterministic both
    engines. Plan: the fact rows hash-aggregate to the distinct-value
    grain first (the mann_whitney device), the two cumulative sums run
    on that post-aggregation relation, and the max folds to one row.
    100 TB: value-grain cumsum — band per hash-bucket of values past
    ~1e8 distincts (documented mann_whitney convention)."""
    ev = load_spread(spark, sf_dir, "events")
    sub = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_type", "value"
    )
    pv = sub.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = pv.select(
        F.sum("c1").over(w).cast("long").alias("f1"),
        F.sum("c2").over(w).cast("long").alias("f2"),
    )
    n = pv.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    d = cum.crossJoin(F.broadcast(n)).agg(
        F.max(
            F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
        )
        .cast("long")
        .alias("d_num")
    )
    n1d = F.col("n1").cast("double")
    d_stat = F.col("d_num").cast("double") / (n1d * F.col("n2"))
    d_crit = F.lit(1.358) * F.sqrt(
        (n1d + F.col("n2")) / (n1d * F.col("n2"))
    )
    return d.crossJoin(F.broadcast(n)).select(
        "n1",
        "n2",
        "d_num",
        d_stat.alias("d_stat"),
        d_crit.alias("d_crit_05"),
        (d_stat > d_crit).alias("reject_05"),
    )


# contingency pair for the rank-correlation family: "do larger line
# quantities carry larger discounts?" — both variables have a small
# bounded domain (50 quantities x 11 discount steps), so every rank
# statistic reduces to exact integer arithmetic on the contingency table.
def _qd_contingency_sql() -> str:
    return """
cont AS MATERIALIZED (
    SELECT CAST(l_quantity AS BIGINT) AS q,
           CAST(round(l_discount * 100, 0) AS BIGINT) AS d,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM lineitem GROUP BY 1, 2
),
qm AS MATERIALIZED (
    SELECT q, CAST(SUM(c) AS BIGINT) AS cq,
           CAST(COALESCE(SUM(SUM(c)) OVER (ORDER BY q
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS fq
    FROM cont GROUP BY q
),
dm AS MATERIALIZED (
    SELECT d, CAST(SUM(c) AS BIGINT) AS cd,
           CAST(COALESCE(SUM(SUM(c)) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS fd
    FROM cont GROUP BY d
),
nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cont)
"""


@query(
    "spearman_quantity_discount",
    oracle=f"""
WITH {_qd_contingency_sql()},
s AS (
    SELECT cont.c,
           2 * qm.fq + qm.cq + 1 - (nn.n + 1) AS sx,
           2 * dm.fd + dm.cd + 1 - (nn.n + 1) AS sy
    FROM cont JOIN qm USING (q) JOIN dm USING (d) CROSS JOIN nn
),
m AS (
    SELECT CAST(SUM(c * sx * sy) AS BIGINT) AS sxy,
           CAST(SUM(c * sx * sx) AS BIGINT) AS sxx,
           CAST(SUM(c * sy * sy) AS BIGINT) AS syy
    FROM s
)
SELECT (SELECT n FROM nn) AS n_rows, sxy, sxx, syy,
       CAST(sxy AS DOUBLE)
           / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE)))
           AS spearman_rho
FROM m
""",
)
def spearman_quantity_discount(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spearman rank correlation between line quantity and discount —
    the monotone-association screen that ignores both variables' skew.
    EXACT device: with doubled average ranks R=2r̄ (integer, the
    mann_whitney tie device) CENTERED by (n+1), the rank means are
    exactly zero, so ρ = ΣSxSy / (√ΣSx²·√ΣSy²) needs NO n·Σ products —
    every moment is an exact BIGINT accumulated over the CONTINGENCY
    grain (50 quantities × 11 discount steps: Σc·Sx·Sy, c from the one
    fact aggregate), and the publish step is two correctly-rounded
    sqrts and one division. 100 TB shape: one (q,d) hash aggregate
    over the fact; everything after runs on ≤550 contingency cells and
    two ≤50-row marginals."""
    li = load_table(spark, sf_dir, "lineitem")
    cont = li.groupBy(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    wq = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
    qm = (
        cont.groupBy("q")
        .agg(F.sum("c").cast("long").alias("cq"))
        .select(
            "q",
            "cq",
            F.coalesce(F.sum("cq").over(wq), F.lit(0))
            .cast("long")
            .alias("fq"),
        )
    )
    wd = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    dm = (
        cont.groupBy("d")
        .agg(F.sum("c").cast("long").alias("cd"))
        .select(
            "d",
            "cd",
            F.coalesce(F.sum("cd").over(wd), F.lit(0))
            .cast("long")
            .alias("fd"),
        )
    )
    nn = cont.agg(F.sum("c").cast("long").alias("n"))
    s = (
        cont.join(F.broadcast(qm), "q")
        .join(F.broadcast(dm), "d")
        .crossJoin(F.broadcast(nn))
        .select(
            "c",
            (
                2 * F.col("fq") + F.col("cq") + 1 - (F.col("n") + 1)
            ).alias("sx"),
            (
                2 * F.col("fd") + F.col("cd") + 1 - (F.col("n") + 1)
            ).alias("sy"),
        )
    )
    m = s.agg(
        F.sum(F.col("c") * F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("sxy"),
        F.sum(F.col("c") * F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("sxx"),
        F.sum(F.col("c") * F.col("sy") * F.col("sy"))
        .cast("long")
        .alias("syy"),
    )
    return m.crossJoin(F.broadcast(nn)).select(
        F.col("n").alias("n_rows"),
        "sxy",
        "sxx",
        "syy",
        (
            F.col("sxy").cast("double")
            / (
                F.sqrt(F.col("sxx").cast("double"))
                * F.sqrt(F.col("syy").cast("double"))
            )
        ).alias("spearman_rho"),
    )


@query(
    "kendall_tau_quantity_discount",
    oracle=f"""
WITH {_qd_contingency_sql()},
pairs AS (
    SELECT CAST(SUM(CASE WHEN (b.q > a.q AND b.d > a.d)
                           OR (b.q < a.q AND b.d < a.d)
                         THEN a.c * b.c ELSE 0 END) AS BIGINT) AS conc2,
           CAST(SUM(CASE WHEN (b.q > a.q AND b.d < a.d)
                           OR (b.q < a.q AND b.d > a.d)
                         THEN a.c * b.c ELSE 0 END) AS BIGINT) AS disc2
    FROM cont a JOIN cont b ON a.q <> b.q OR a.d <> b.d
),
ties AS (
    SELECT CAST(SUM(cq * (cq - 1)) AS BIGINT) AS tq2 FROM qm
),
tiesd AS (
    SELECT CAST(SUM(cd * (cd - 1)) AS BIGINT) AS td2 FROM dm
)
SELECT (SELECT n FROM nn) AS n_rows,
       CAST(conc2 // 2 AS BIGINT) AS concordant,
       CAST(disc2 // 2 AS BIGINT) AS discordant,
       CAST(conc2 - disc2 AS DOUBLE)
           / (sqrt(CAST((SELECT n * (n - 1) FROM nn) - tq2 AS DOUBLE))
              * sqrt(CAST((SELECT n * (n - 1) FROM nn) - td2 AS DOUBLE)))
           AS tau_b
FROM pairs CROSS JOIN ties CROSS JOIN tiesd
""",
)
def kendall_tau_quantity_discount(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kendall τ-b rank correlation between line quantity and discount —
    the concordant/discordant-pair view of the same monotone
    association as `spearman_quantity_discount` (τ is more robust to a
    few wild rows, and its pair counts are directly interpretable).
    EXACT device: over the bounded contingency grain (≤550 cells),
    DOUBLED pair counts accumulate as Σ a.c·b.c over ordered cell pairs
    — exact BIGINTs (≤n², ~3.6e11 at sf0.1) halved by integer DIV; the
    tie corrections Σt(t−1) come from the marginals; and the
    denominator multiplies two CORRECTLY-ROUNDED sqrts instead of
    forming (n(n−1)−tq)(n(n−1)−td), whose product would overflow
    BIGINT at fact scale. 100 TB: one (q,d) fact aggregate, then a
    550×550 bounded cell self-join — never a row-pair join."""
    li = load_table(spark, sf_dir, "lineitem")
    cont = li.groupBy(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = cont.select(
        F.col("q").alias("qa"), F.col("d").alias("da"), F.col("c").alias("ca")
    )
    b = cont.select(
        F.col("q").alias("qb"), F.col("d").alias("db"), F.col("c").alias("cb")
    )
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("qa") != F.col("qb")) | (F.col("da") != F.col("db")),
        )
        .agg(
            F.sum(
                F.when(
                    (
                        (F.col("qb") > F.col("qa"))
                        & (F.col("db") > F.col("da"))
                    )
                    | (
                        (F.col("qb") < F.col("qa"))
                        & (F.col("db") < F.col("da"))
                    ),
                    F.col("ca") * F.col("cb"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("conc2"),
            F.sum(
                F.when(
                    (
                        (F.col("qb") > F.col("qa"))
                        & (F.col("db") < F.col("da"))
                    )
                    | (
                        (F.col("qb") < F.col("qa"))
                        & (F.col("db") > F.col("da"))
                    ),
                    F.col("ca") * F.col("cb"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("disc2"),
        )
    )
    qm = cont.groupBy("q").agg(F.sum("c").cast("long").alias("cq"))
    dm = cont.groupBy("d").agg(F.sum("c").cast("long").alias("cd"))
    tq = qm.agg(
        F.sum(F.col("cq") * (F.col("cq") - 1)).cast("long").alias("tq2")
    )
    td = dm.agg(
        F.sum(F.col("cd") * (F.col("cd") - 1)).cast("long").alias("td2")
    )
    nn = cont.agg(F.sum("c").cast("long").alias("n"))
    return (
        pairs.crossJoin(F.broadcast(tq))
        .crossJoin(F.broadcast(td))
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("n").alias("n_rows"),
            F.expr("conc2 DIV 2").cast("long").alias("concordant"),
            F.expr("disc2 DIV 2").cast("long").alias("discordant"),
            (
                (F.col("conc2") - F.col("disc2")).cast("double")
                / (
                    F.sqrt(
                        (F.col("n") * (F.col("n") - 1) - F.col("tq2"))
                        .cast("double")
                    )
                    * F.sqrt(
                        (F.col("n") * (F.col("n") - 1) - F.col("td2"))
                        .cast("double")
                    )
                )
            ).alias("tau_b"),
        )
    )


_WILSON_Z = 1.959963984540054  # Phi^-1(0.975), Python-precomputed


@query(
    "wilson_ci_purchase_rate_segments",
    oracle=f"""
WITH seg AS (
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (e.event_type = 'purchase') AS BIGINT) AS k
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
)
SELECT segment, n, k,
       CAST(k AS DOUBLE) / n AS rate,
       ((CAST(k AS DOUBLE) / n
         + CAST('{_WILSON_Z!r}' AS DOUBLE) * CAST('{_WILSON_Z!r}' AS DOUBLE)
           / (2 * CAST(n AS DOUBLE)))
        - (CAST('{_WILSON_Z!r}' AS DOUBLE)
           * sqrt((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n)
                  / CAST(n AS DOUBLE)
                  + CAST('{_WILSON_Z!r}' AS DOUBLE)
                    * CAST('{_WILSON_Z!r}' AS DOUBLE)
                    / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))))
       / (1 + CAST('{_WILSON_Z!r}' AS DOUBLE) * CAST('{_WILSON_Z!r}' AS DOUBLE)
              / CAST(n AS DOUBLE)) AS wilson_lo,
       ((CAST(k AS DOUBLE) / n
         + CAST('{_WILSON_Z!r}' AS DOUBLE) * CAST('{_WILSON_Z!r}' AS DOUBLE)
           / (2 * CAST(n AS DOUBLE)))
        + (CAST('{_WILSON_Z!r}' AS DOUBLE)
           * sqrt((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n)
                  / CAST(n AS DOUBLE)
                  + CAST('{_WILSON_Z!r}' AS DOUBLE)
                    * CAST('{_WILSON_Z!r}' AS DOUBLE)
                    / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))))
       / (1 + CAST('{_WILSON_Z!r}' AS DOUBLE) * CAST('{_WILSON_Z!r}' AS DOUBLE)
              / CAST(n AS DOUBLE)) AS wilson_hi
FROM seg
""",
)
def wilson_ci_purchase_rate_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Wilson score 95% confidence interval for each segment's purchase
    rate — the binomial interval dashboards should use instead of the
    Wald ±z√(p(1−p)/n) (Wilson never leaves [0,1] and behaves at small
    k; Brown, Cai & DasGupta 2001's recommendation). z=Φ⁻¹(0.975) is a
    Python-precomputed literal; every other term is a fixed chain of
    correctly-rounded IEEE ops on exact-integer counts, written in the
    IDENTICAL association on both engines, so the bounds hash-match.
    100 TB: one fact join+aggregate to |segments| rows; the interval
    math is a row-local projection."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    seg = (
        ev.join(cust, ev["user_id"] == cust["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("k"),
        )
    )
    z = F.lit(_WILSON_Z)
    nd = F.col("n").cast("double")
    p = F.col("k").cast("double") / F.col("n")
    center = p + z * z / (2 * nd)
    halfw = z * F.sqrt(
        p * (1 - p) / nd + z * z / (4 * nd * nd)
    )
    denom = 1 + z * z / nd
    return seg.select(
        "segment",
        "n",
        "k",
        p.alias("rate"),
        ((center - halfw) / denom).alias("wilson_lo"),
        ((center + halfw) / denom).alias("wilson_hi"),
    )


_JK_B = 16  # delete-a-group buckets


@query(
    "jackknife_ratio_se_revenue_per_order",
    oracle=f"""
WITH b AS (
    SELECT CAST(strpos('0123456789abcdef',
                substring(md5(CAST(o_custkey AS VARCHAR)), 1, 1)) - 1
                AS BIGINT) AS bk,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS s,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY 1
),
tot AS (SELECT CAST(SUM(s) AS BIGINT) AS st, CAST(SUM(n) AS BIGINT) AS nt
        FROM b),
loo AS (
    SELECT bk,
           CAST(tot.st - b.s AS DOUBLE) / (tot.nt - b.n) AS theta_i
    FROM b CROSS JOIN tot
),
l AS (
    SELECT list_sort(list(struct_pack(bk := bk, t := theta_i))) AS a
    FROM loo
),
m AS (
    SELECT CAST(len(a) AS DOUBLE) AS bb,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(a, e -> e.t)), (p, q) -> p + q) AS sum_t
    FROM l
),
mm AS (SELECT bb, sum_t / bb AS tbar FROM m),
v AS (
    SELECT mm.bb, mm.tbar,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(l.a, e -> (e.t - mm.tbar) * (e.t - mm.tbar))),
               (p, q) -> p + q) AS ss
    FROM l CROSS JOIN mm
)
SELECT CAST(tot.st AS DOUBLE) / tot.nt AS revenue_per_order,
       CAST(v.bb AS BIGINT) AS n_buckets,
       sqrt(((v.bb - 1) / v.bb) * v.ss) AS jackknife_se
FROM v CROSS JOIN tot
""",
)
def jackknife_ratio_se_revenue_per_order(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delete-a-group jackknife standard error for a RATIO metric
    (revenue per order) — the uncertainty workhorse for big-data ratio
    metrics, where the bootstrap is too expensive and the delta method
    too fragile: customers hash into 16 deterministic groups, the
    metric recomputes leaving each group out (pure arithmetic on the
    16-row totals — no data re-pass), and SE = sqrt((B−1)/B·Σ(θᵢ−θ̄)²).
    Determinism: bucket = first md5 hex digit of the customer key
    (content-addressed, the sampling-family convention), group sums are
    exact BIGINT cents, each θᵢ is one division, and the two variance
    folds run over the BUCKET-SORTED 16-row list (identical fold order
    both engines). Grouping by customer (not row) respects the
    clustering unit, so the SE is valid under within-customer
    correlation. 100 TB shape: ONE map-side-combinable 16-group
    aggregate over the fact; everything else is 16-row arithmetic."""
    orders = load_spread(spark, sf_dir, "orders")
    bk = (
        F.expr(
            "conv(substring(md5(CAST(CAST(o_custkey AS STRING) AS BINARY)),"
            " 1, 1), 16, 10)"
        )
        .cast("long")
        .alias("bk")
    )
    b = orders.groupBy(bk).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    tot = b.agg(
        F.sum("s").cast("long").alias("st"),
        F.sum("n").cast("long").alias("nt"),
    )
    loo = b.crossJoin(F.broadcast(tot)).select(
        "bk",
        (
            (F.col("st") - F.col("s")).cast("double")
            / (F.col("nt") - F.col("n"))
        ).alias("theta_i"),
    )
    arr = loo.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("bk"), F.col("theta_i").alias("t")))
        ).alias("a")
    )
    m = arr.select(
        "a",
        F.size("a").cast("double").alias("bb"),
        F.aggregate(
            F.col("a"), F.lit(0.0), lambda acc, e: acc + e["t"]
        ).alias("sum_t"),
    ).select("a", "bb", (F.col("sum_t") / F.col("bb")).alias("tbar"))
    v = m.select(
        "bb",
        "tbar",
        F.aggregate(
            F.col("a"),
            F.lit(0.0),
            lambda acc, e: acc
            + (e["t"] - F.col("tbar")) * (e["t"] - F.col("tbar")),
        ).alias("ss"),
    )
    return v.crossJoin(F.broadcast(tot)).select(
        (F.col("st").cast("double") / F.col("nt")).alias(
            "revenue_per_order"
        ),
        F.col("bb").cast("long").alias("n_buckets"),
        F.sqrt(((F.col("bb") - 1) / F.col("bb")) * F.col("ss")).alias(
            "jackknife_se"
        ),
    )


_FB_H = 28  # holdout horizon (days)


def _fb_fold_sql(term: str) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(a, e -> {term})), (p, q) -> p + q)"
    )


@query(
    "forecast_baselines_daily_revenue",
    oracle=f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS c
    FROM orders GROUP BY 1
),
mx AS (SELECT MAX(d) AS maxd FROM daily),
train AS MATERIALIZED (
    SELECT d, c FROM daily CROSS JOIN mx WHERE d <= maxd - {_FB_H}
),
test AS MATERIALIZED (
    SELECT d, c FROM daily CROSS JOIN mx WHERE d > maxd - {_FB_H}
),
tstat AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_train,
           MAX(d) AS last_d, MIN(d) AS first_d,
           CAST(SUM(c) AS BIGINT) AS sum_c
    FROM train
),
yl AS (SELECT c AS y_last FROM train CROSS JOIN tstat WHERE d = last_d),
yf AS (SELECT c AS y_first FROM train CROSS JOIN tstat WHERE d = first_d),
wd_last AS (
    SELECT wd, c AS y_wd
    FROM (
        SELECT CAST(date_diff('day', DATE '1990-01-01', d) AS BIGINT) % 7
                   AS wd,
               c,
               row_number() OVER (
                   PARTITION BY CAST(date_diff('day', DATE '1990-01-01', d)
                                     AS BIGINT) % 7
                   ORDER BY d DESC) AS rn
        FROM train
    ) WHERE rn = 1
),
mase_den AS (
    SELECT CAST(SUM(abs(a.c - b.c)) AS BIGINT) AS sad,
           CAST(COUNT(*) AS BIGINT) AS np
    FROM train a JOIN train b ON b.d = a.d - 7
),
fc AS (
    SELECT t.d, t.c,
           yl.y_last AS f_naive,
           w.y_wd AS f_snaive,
           CAST(yl.y_last AS DOUBLE)
             + CAST(date_diff('day', ts.last_d, t.d) AS DOUBLE)
               * (CAST(yl.y_last AS DOUBLE) - yf.y_first)
               / (CAST(ts.n_train AS DOUBLE) - 1) AS f_drift,
           CAST(ts.sum_c AS DOUBLE) / ts.n_train AS f_mean
    FROM test t
    CROSS JOIN yl CROSS JOIN yf CROSS JOIN tstat ts
    JOIN wd_last w
      ON w.wd = CAST(date_diff('day', DATE '1990-01-01', t.d) AS BIGINT) % 7
),
l AS (
    SELECT list_sort(list(struct_pack(
               d := d, c := c, fn := f_naive, fs := f_snaive,
               fd := f_drift, fm := f_mean))) AS a,
           CAST(COUNT(*) AS BIGINT) AS nh
    FROM fc
),
m AS (
    SELECT nh,
           {_fb_fold_sql('abs(CAST(e.c AS DOUBLE) - e.fn)')} AS mae_n,
           {_fb_fold_sql('abs(CAST(e.c AS DOUBLE) - e.fs)')} AS mae_s,
           {_fb_fold_sql('abs(CAST(e.c AS DOUBLE) - e.fd)')} AS mae_d,
           {_fb_fold_sql('abs(CAST(e.c AS DOUBLE) - e.fm)')} AS mae_m,
           {_fb_fold_sql('2 * abs(CAST(e.c AS DOUBLE) - e.fn)'
                         ' / (CAST(e.c AS DOUBLE) + e.fn)')} AS sm_n,
           {_fb_fold_sql('2 * abs(CAST(e.c AS DOUBLE) - e.fs)'
                         ' / (CAST(e.c AS DOUBLE) + e.fs)')} AS sm_s,
           {_fb_fold_sql('2 * abs(CAST(e.c AS DOUBLE) - e.fd)'
                         ' / (CAST(e.c AS DOUBLE) + e.fd)')} AS sm_d,
           {_fb_fold_sql('2 * abs(CAST(e.c AS DOUBLE) - e.fm)'
                         ' / (CAST(e.c AS DOUBLE) + e.fm)')} AS sm_m
    FROM l
),
den AS (SELECT CAST(sad AS DOUBLE) / np AS d1 FROM mase_den)
SELECT 'naive' AS method, mae_n / nh / 100 AS mae_dollars,
       sm_n / nh AS smape, (mae_n / nh) / d1 AS mase
FROM m CROSS JOIN den
UNION ALL
SELECT 'seasonal_naive', mae_s / nh / 100, sm_s / nh, (mae_s / nh) / d1
FROM m CROSS JOIN den
UNION ALL
SELECT 'drift', mae_d / nh / 100, sm_d / nh, (mae_d / nh) / d1
FROM m CROSS JOIN den
UNION ALL
SELECT 'mean', mae_m / nh / 100, sm_m / nh, (mae_m / nh) / d1
FROM m CROSS JOIN den
""",
)
def forecast_baselines_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Forecast-baseline evaluation panel: the four classical baselines
    every forecasting study must beat (naive last-value, seasonal-naive
    by weekday, drift, train mean) scored on a 28-day holdout with MAE,
    SMAPE and MASE — the benchmark harness that turns the repo's
    forecasting family (Holt, Holt-Winters, Croston) into comparable
    numbers. Determinism: daily revenue stays in BIGINT cents; naive/
    seasonal-naive forecasts are integers by construction, drift/mean
    spend one fixed-order float chain each; every per-day error folds
    over the DATE-SORTED 28-element holdout list; the MASE scale is the
    exact-integer train seasonal-difference MAE. 100 TB shape: one fact
    shuffle to the calendar grain; split, lookups, and scoring all run
    on resolution-bounded relations (the forecasting-family
    convention)."""
    orders = load_spread(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("c")
    )
    mx = daily.agg(F.max("d").alias("maxd"))
    with_mx = daily.crossJoin(F.broadcast(mx))
    train = with_mx.filter(
        F.col("d") <= F.date_sub(F.col("maxd"), _FB_H)
    ).select("d", "c")
    test = with_mx.filter(
        F.col("d") > F.date_sub(F.col("maxd"), _FB_H)
    ).select("d", "c")
    tstat = train.agg(
        F.count(F.lit(1)).cast("long").alias("n_train"),
        F.max("d").alias("last_d"),
        F.min("d").alias("first_d"),
        F.sum("c").cast("long").alias("sum_c"),
    )
    yl = (
        train.crossJoin(F.broadcast(tstat))
        .filter(F.col("d") == F.col("last_d"))
        .select(F.col("c").alias("y_last"))
    )
    yf = (
        train.crossJoin(F.broadcast(tstat))
        .filter(F.col("d") == F.col("first_d"))
        .select(F.col("c").alias("y_first"))
    )
    wd = (
        F.datediff(F.col("d"), F.lit("1990-01-01").cast("date")).cast(
            "long"
        )
        % 7
    )
    ww = Window.partitionBy(wd).orderBy(F.col("d").desc())
    wd_last = (
        train.select(
            wd.alias("wd"), "c", F.row_number().over(ww).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .select("wd", F.col("c").alias("y_wd"))
    )
    ta = train.select(F.col("d").alias("da"), F.col("c").alias("ca"))
    tb = train.select(F.col("d").alias("db"), F.col("c").alias("cb"))
    mase_den = (
        ta.join(tb, F.col("db") == F.date_sub(F.col("da"), 7))
        .agg(
            F.sum(F.abs(F.col("ca") - F.col("cb")))
            .cast("long")
            .alias("sad"),
            F.count(F.lit(1)).cast("long").alias("np"),
        )
    )
    fc = (
        test.crossJoin(F.broadcast(yl))
        .crossJoin(F.broadcast(yf))
        .crossJoin(F.broadcast(tstat))
        .join(
            F.broadcast(wd_last),
            wd_last["wd"]
            == F.datediff(
                F.col("d"), F.lit("1990-01-01").cast("date")
            ).cast("long")
            % 7,
        )
        .select(
            "d",
            "c",
            F.col("y_last").alias("fn"),
            F.col("y_wd").alias("fs"),
            (
                F.col("y_last").cast("double")
                + F.datediff(F.col("d"), F.col("last_d")).cast("double")
                * (
                    F.col("y_last").cast("double")
                    - F.col("y_first")
                )
                / (F.col("n_train").cast("double") - 1)
            ).alias("fd"),
            (F.col("sum_c").cast("double") / F.col("n_train")).alias(
                "fm"
            ),
        )
    )
    arr = fc.agg(
        F.sort_array(
            F.collect_list(
                F.struct("d", "c", "fn", "fs", "fd", "fm")
            )
        ).alias("a"),
        F.count(F.lit(1)).cast("long").alias("nh"),
    )

    def fold(term):
        return F.aggregate(
            F.col("a"), F.lit(0.0), lambda acc, e: acc + term(e)
        )

    cd = lambda e: e["c"].cast("double")  # noqa: E731
    m = arr.select(
        "nh",
        fold(lambda e: F.abs(cd(e) - e["fn"])).alias("mae_n"),
        fold(lambda e: F.abs(cd(e) - e["fs"])).alias("mae_s"),
        fold(lambda e: F.abs(cd(e) - e["fd"])).alias("mae_d"),
        fold(lambda e: F.abs(cd(e) - e["fm"])).alias("mae_m"),
        fold(
            lambda e: 2 * F.abs(cd(e) - e["fn"]) / (cd(e) + e["fn"])
        ).alias("sm_n"),
        fold(
            lambda e: 2 * F.abs(cd(e) - e["fs"]) / (cd(e) + e["fs"])
        ).alias("sm_s"),
        fold(
            lambda e: 2 * F.abs(cd(e) - e["fd"]) / (cd(e) + e["fd"])
        ).alias("sm_d"),
        fold(
            lambda e: 2 * F.abs(cd(e) - e["fm"]) / (cd(e) + e["fm"])
        ).alias("sm_m"),
    )
    den = mase_den.select(
        (F.col("sad").cast("double") / F.col("np")).alias("d1")
    )
    base = m.crossJoin(F.broadcast(den))
    out = None
    for name, mae, sm in (
        ("naive", "mae_n", "sm_n"),
        ("seasonal_naive", "mae_s", "sm_s"),
        ("drift", "mae_d", "sm_d"),
        ("mean", "mae_m", "sm_m"),
    ):
        row = base.select(
            F.lit(name).alias("method"),
            (F.col(mae) / F.col("nh") / 100).alias("mae_dollars"),
            (F.col(sm) / F.col("nh")).alias("smape"),
            ((F.col(mae) / F.col("nh")) / F.col("d1")).alias("mase"),
        )
        out = row if out is None else out.unionAll(row)
    return out


@query(
    "cochran_armitage_trend_balance_bands",
    oracle="""
WITH bands AS (
    SELECT CAST(LEAST(GREATEST(FLOOR(c.c_acctbal / 2500), -1), 4) AS BIGINT)
               AS band,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (e.event_type = 'purchase') AS BIGINT) AS k
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(k) AS BIGINT) AS kt,
           CAST(SUM(band * n) AS BIGINT) AS swn,
           CAST(SUM(band * band * n) AS BIGINT) AS swwn,
           CAST(SUM(band * k) AS BIGINT) AS swk
    FROM bands
)
SELECT nt AS n_events, kt AS n_purchases,
       CAST(nt * swk - kt * swn AS BIGINT) AS num_scaled,
       (CAST(nt AS DOUBLE) * swk - CAST(kt AS DOUBLE) * swn)
       / (CAST(nt AS DOUBLE)
          * sqrt((CAST(kt AS DOUBLE) / nt) * (1 - CAST(kt AS DOUBLE) / nt)
                 * (CAST(swwn AS DOUBLE)
                    - CAST(swn AS DOUBLE) * swn / nt)))
           AS z_trend
FROM tot
""",
)
def cochran_armitage_trend_balance_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cochran-Armitage test for trend (Cochran 1954, Armitage 1955):
    does purchase propensity rise MONOTONICALLY across ordered
    account-balance bands — the ordered-categories test a flat chi²
    wastes power on. Integer band scores (floor(balance/2500), clamped)
    make every moment an exact BIGINT (Σwn, Σw²n, Σwk and the scaled
    numerator n·Σwk − k·Σwn are published as exact integers); the z
    statistic spends a fixed chain of correctly-rounded ops in
    identical association on both engines. 100 TB shape: one fact
    join+aggregate to ≤6 band rows, then 1-row arithmetic."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    bands = (
        ev.join(cust, ev["user_id"] == cust["c_custkey"])
        .groupBy(
            F.least(
                F.greatest(
                    F.floor(F.col("c_acctbal") / 2500), F.lit(-1)
                ),
                F.lit(4),
            )
            .cast("long")
            .alias("band")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("k"),
        )
    )
    tot = bands.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("k").cast("long").alias("kt"),
        F.sum(F.col("band") * F.col("n")).cast("long").alias("swn"),
        F.sum(F.col("band") * F.col("band") * F.col("n"))
        .cast("long")
        .alias("swwn"),
        F.sum(F.col("band") * F.col("k")).cast("long").alias("swk"),
    )
    ntd = F.col("nt").cast("double")
    ktd = F.col("kt").cast("double")
    pbar = ktd / F.col("nt")
    return tot.select(
        F.col("nt").alias("n_events"),
        F.col("kt").alias("n_purchases"),
        (F.col("nt") * F.col("swk") - F.col("kt") * F.col("swn"))
        .cast("long")
        .alias("num_scaled"),
        (
            (ntd * F.col("swk") - ktd * F.col("swn"))
            / (
                ntd
                * F.sqrt(
                    pbar
                    * (1 - pbar)
                    * (
                        F.col("swwn").cast("double")
                        - F.col("swn").cast("double")
                        * F.col("swn")
                        / F.col("nt")
                    )
                )
            )
        ).alias("z_trend"),
    )


@query(
    "chapman_estimate_users",
    oracle="""
WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m
      FROM a JOIN b ON a.user_id = b.user_id),
cnts AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n1,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n2,
           (SELECT m FROM m) AS m,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
               AS true_users
)
SELECT n1 AS n_click_users, n2 AS n_view_users, m AS n_overlap,
       true_users,
       CAST((n1 + 1) * (n2 + 1) AS DOUBLE) / (m + 1) - 1
           AS chapman_estimate,
       (CAST((n1 + 1) * (n2 + 1) AS DOUBLE) / (m + 1) - 1) / true_users
           AS estimate_ratio
FROM cnts
""",
)
def chapman_estimate_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture population estimate (Chapman 1951's
    bias-corrected Lincoln-Petersen): treat click users and view users
    as two "capture occasions" and estimate the TOTAL user population
    from their overlap — N̂ = (n1+1)(n2+1)/(m+1) − 1. The
    mark-recapture trick data engineers reach for when the full
    distinct count is too expensive but two indexed subsets overlap
    (log dedup, coverage estimation); here the exact distinct count is
    published alongside, so the row quantifies the estimator's bias on
    this data. All counts are exact BIGINTs (two distinct-aggregates +
    one semi-join-sized intersection); the estimate is one multiply +
    division. 100 TB: three hash distinct-aggregates on user_id — the
    overlap join co-partitions on the same key."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    a = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    b = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    m = a.join(b, "user_id").agg(F.count(F.lit(1)).cast("long").alias("m"))
    n1 = a.agg(F.count(F.lit(1)).cast("long").alias("n1"))
    n2 = b.agg(F.count(F.lit(1)).cast("long").alias("n2"))
    tu = ev.agg(F.countDistinct("user_id").cast("long").alias("true_users"))
    est = (
        (F.col("n1") + 1) * (F.col("n2") + 1)
    ).cast("double") / (F.col("m") + 1) - 1
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(tu))
        .select(
            F.col("n1").alias("n_click_users"),
            F.col("n2").alias("n_view_users"),
            F.col("m").alias("n_overlap"),
            "true_users",
            est.alias("chapman_estimate"),
            (est / F.col("true_users")).alias("estimate_ratio"),
        )
    )


_ROLS_W = 28  # trailing window (days)


@query(
    "rolling_ols_slope_daily_revenue",
    oracle=f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
                AS BIGINT) AS t,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS y
    FROM orders GROUP BY 1, 2
),
win AS (
    SELECT d,
           CAST(COUNT(*) OVER w AS BIGINT) AS n,
           CAST(SUM(t) OVER w AS BIGINT) AS st,
           CAST(SUM(y) OVER w AS BIGINT) AS sy,
           CAST(SUM(t * y) OVER w AS BIGINT) AS sty,
           CAST(SUM(t * t) OVER w AS BIGINT) AS stt
    FROM daily
    WINDOW w AS (ORDER BY d ROWS BETWEEN {_ROLS_W - 1} PRECEDING
                 AND CURRENT ROW)
)
SELECT d,
       n AS n_days,
       CAST(n * sty - st * sy AS BIGINT) AS slope_num,
       CAST(n * stt - st * st AS BIGINT) AS slope_den,
       (CAST(n * sty - st * sy AS BIGINT)
        / CAST(n * stt - st * st AS DOUBLE)) / 100 AS slope_dollars_per_day
FROM win WHERE n = {_ROLS_W}
""",
)
def rolling_ols_slope_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rolling 28-day OLS trend slope of daily revenue — the windowed
    least-squares momentum signal (the parametric sibling of the
    windowed Theil-Sen median slope). EXACT device: with t = integer
    day index and y = BIGINT cents, every rolling moment (Σt, Σy, Σty,
    Σt², n) is an order-insensitive INTEGER frame sum, and the slope's
    numerator n·Σty − Σt·Σy and denominator n·Σt² − (Σt)² are published
    as exact BIGINTs (≈2e15 peak — far under 2^63); the only float op
    is the final division. Full windows only. 100 TB shape: one fact
    shuffle to the calendar grain, then a resolution-bounded sliding
    window (the documented calendar-grain single-partition window);
    per-series variants add the key to partitionBy."""
    orders = load_spread(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1990-01-01").cast("date"),
        )
        .cast("long")
        .alias("t"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("y")
    )
    w = Window.orderBy("d").rowsBetween(-( _ROLS_W - 1), 0)
    win = daily.select(
        "d",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("t").over(w).cast("long").alias("st"),
        F.sum("y").over(w).cast("long").alias("sy"),
        F.sum(F.col("t") * F.col("y")).over(w).cast("long").alias("sty"),
        F.sum(F.col("t") * F.col("t")).over(w).cast("long").alias("stt"),
    ).filter(F.col("n") == _ROLS_W)
    num = (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).cast(
        "long"
    )
    den = (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast(
        "long"
    )
    return win.select(
        "d",
        F.col("n").alias("n_days"),
        num.alias("slope_num"),
        den.alias("slope_den"),
        ((num / den.cast("double")) / 100).alias(
            "slope_dollars_per_day"
        ),
    )


_LATE_BUCKETS = (0, 60, 300, 1800, 7200)  # seconds


@query(
    "watermark_lateness_audit_events",
    oracle=f"""
WITH arr AS (
    SELECT event_type, user_id, event_id, ts,
           MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seen
    FROM events
),
lat AS (
    SELECT event_type,
           CASE WHEN seen IS NULL OR ts >= seen THEN 0
                ELSE CAST(date_diff('second', ts, seen) AS BIGINT)
           END AS late_s
    FROM arr
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (late_s > 0) AS BIGINT) AS n_out_of_order,
       CAST(COUNT(*) FILTER (late_s > {_LATE_BUCKETS[1]}) AS BIGINT)
           AS n_late_1m,
       CAST(COUNT(*) FILTER (late_s > {_LATE_BUCKETS[2]}) AS BIGINT)
           AS n_late_5m,
       CAST(COUNT(*) FILTER (late_s > {_LATE_BUCKETS[3]}) AS BIGINT)
           AS n_late_30m,
       CAST(COUNT(*) FILTER (late_s > {_LATE_BUCKETS[4]}) AS BIGINT)
           AS n_late_2h,
       CAST(MAX(late_s) AS BIGINT) AS max_late_s
FROM lat GROUP BY event_type
""",
)
def watermark_lateness_audit_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermark-sizing audit: how out-of-order does each event type
    arrive? Treating event_id as arrival order within a user, an
    event's lateness is how far its event time lags the running
    event-time high-water mark — exactly the quantity a Structured
    Streaming `withWatermark` bound must cover (events later than the
    watermark are dropped from stateful aggregations). The survival
    counts at 1m/5m/30m/2h bounds read directly as the fraction each
    candidate watermark would drop. All integer seconds and BIGINT
    counts — hash-exact. 100 TB shape: one user-keyed window (the
    sessionization exchange) and one per-type aggregate; this audit is
    the empirical input the streaming twins' watermark settings cite."""
    ev = load_spread(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    arr = ev.select(
        "event_type",
        "ts",
        F.max("ts").over(w).alias("seen"),
    )
    late = F.when(
        F.col("seen").isNull() | (F.col("ts") >= F.col("seen")), 0
    ).otherwise(
        (F.unix_timestamp("seen") - F.unix_timestamp("ts")).cast("long")
    )
    lat = arr.select("event_type", late.alias("late_s"))
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("late_s") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_out_of_order"),
    ]
    for b, name in zip(
        _LATE_BUCKETS[1:], ("n_late_1m", "n_late_5m", "n_late_30m", "n_late_2h")
    ):
        aggs.append(
            F.sum(F.when(F.col("late_s") > b, 1).otherwise(0))
            .cast("long")
            .alias(name)
        )
    aggs.append(F.max("late_s").cast("long").alias("max_late_s"))
    return lat.groupBy("event_type").agg(*aggs)


@query(
    "rolling_7d_distinct_users_daily",
    oracle="""
WITH du AS (
    SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
),
days AS (SELECT DISTINCT d FROM du),
contrib AS (
    SELECT du.d + CAST(off AS INTEGER) AS rd, du.user_id
    FROM du, unnest(generate_series(0, 6)) AS g(off)
),
win AS (
    SELECT c.rd, c.user_id FROM contrib c JOIN days ON days.d = c.rd
)
SELECT rd AS d,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_7d,
       (SELECT CAST(COUNT(DISTINCT u2.user_id) AS BIGINT)
        FROM du u2 WHERE u2.d = win.rd) AS n_users_1d
FROM win GROUP BY rd
""",
)
def rolling_7d_distinct_users_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ROLLING 7-DAY DISTINCT USERS per day (the WAU-by-day metric):
    distinct counts do NOT decompose over sliding windows (yesterday's
    WAU can't be updated incrementally — a user may appear on several
    days), so the exact computation is the range join 'day d counts
    users active in [d-6, d]'. Expressed with the
    range-join-to-equi-join device: each (day, user) activity row
    EXPLODES to the 7 report days it contributes to, then one hash
    aggregate per report day counts distinct — no BNLJ range join, no
    per-day rescan; work = |active-day pairs| x 7. Daily distinct rides
    along for the WAU/DAU stickiness ratio downstream. 100 TB shape:
    the explode multiplies the (already day-deduplicated) activity
    relation by the window length only, and both the semi-join and the
    final aggregate key on the report day."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    days = du.select("d").distinct()
    contrib = du.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "d",
        "user_id",
    ).select(F.date_add("d", F.col("off")).alias("rd"), "user_id")
    win = contrib.join(
        days.select(F.col("d").alias("rd")), "rd", "left_semi"
    )
    daily = du.groupBy(F.col("d").alias("rd")).agg(
        F.countDistinct("user_id").cast("long").alias("n_users_1d")
    )
    return (
        win.groupBy("rd")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users_7d"))
        .join(daily, "rd")
        .select(F.col("rd").alias("d"), "n_users_7d", "n_users_1d")
    )


@query(
    "median_ci_order_stats_priority",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority AS priority, o_totalprice AS v,
         row_number() OVER w AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey)
)
SELECT priority,
       CAST(MAX(n) AS BIGINT) AS n,
       MAX(CASE WHEN rn = (n + 1) // 2 THEN v END) AS median,
       MAX(CASE WHEN rn = GREATEST(1, CAST(floor((n - 1.96 * sqrt(n)) / 2)
                                           AS BIGINT)) THEN v END) AS ci_lo,
       MAX(CASE WHEN rn = LEAST(n, CAST(ceil(1 + (n + 1.96 * sqrt(n)) / 2)
                                        AS BIGINT)) THEN v END) AS ci_hi
FROM ranked GROUP BY priority
""",
)
def median_ci_order_stats_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DISTRIBUTION-FREE median confidence interval per group: the
    classic order-statistic CI (binomial ranks, normal approximation —
    the nonparametric companion to the Wilson interval for
    proportions): lo/hi are the values at ranks floor((n - z*sqrt(n))/2)
    and ceil(1 + (n + z*sqrt(n))/2), clamped to [1, n], with the lower
    median at rank (n+1) DIV 2. No distributional assumption, no
    bootstrap resampling — one ranked pass. Cross-engine exactness:
    the published values are RAW order statistics (no arithmetic on
    them), and the rank formulas spend one correctly rounded sqrt and
    a few IEEE ops on an exact integer n, written in the identical
    order in both engines. Scale shape: one per-group ranked window +
    a conditional aggregate, the ``percentiles_by_priority`` shape."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("priority").orderBy("v", "o_orderkey")
    wc = Window.partitionBy("priority")
    ranked = (
        orders.select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("v"),
            "o_orderkey",
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wc))
    )
    zsn = F.lit(1.96) * F.sqrt(F.col("n"))
    lo_rank = F.greatest(
        F.lit(1).cast("long"),
        F.floor((F.col("n") - zsn) / 2).cast("long"),
    )
    hi_rank = F.least(
        F.col("n").cast("long"),
        F.ceil(1 + (F.col("n") + zsn) / 2).cast("long"),
    )
    med_rank = F.expr("(n + 1) DIV 2")
    return ranked.groupBy("priority").agg(
        F.max("n").cast("long").alias("n"),
        F.max(F.when(F.col("rn") == med_rank, F.col("v"))).alias("median"),
        F.max(F.when(F.col("rn") == lo_rank, F.col("v"))).alias("ci_lo"),
        F.max(F.when(F.col("rn") == hi_rank, F.col("v"))).alias("ci_hi"),
    )
