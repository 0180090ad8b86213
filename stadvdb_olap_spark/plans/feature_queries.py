"""Feature-preparation & corpus-monitoring catalog queries.

Two families the training-data pipeline runs after curation:

- ``winsorize_price_per_flag`` — per-group percentile clipping (the
  robust-scaling cousin of the z-score query in advanced_queries).
- ``tv_distance_source_unigrams`` — distribution drift per source:
  total-variation distance between each source's unigram distribution
  and the corpus-wide one. TV (0.5 · Σ|p−q|) is chosen over KL
  deliberately: it needs only +,−,×,÷,abs — every one IEEE-correctly-
  rounded and therefore bit-identical across engines — where KL's
  ``ln`` is not correctly-rounded and would break hash oracles. The
  per-source sum folds in SORTED word order on both engines, so even
  the float summation order is pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stadvdb_olap_spark.functions.text import tokens, tokens_sql
from stadvdb_olap_spark.operators.rank import global_row_number
from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.sources.parquet import load_spread, load_table


@query(
    "winsorize_price_per_flag",
    oracle="""
WITH b AS (
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.05) AS lo,
           quantile_cont(l_extendedprice, 0.95) AS hi
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_orderkey, l_linenumber, l.l_returnflag,
       CAST(l_extendedprice AS DOUBLE) AS price,
       CAST(CASE WHEN l_extendedprice < lo THEN lo
                 WHEN l_extendedprice > hi THEN hi
                 ELSE l_extendedprice END AS DOUBLE) AS price_winsorized
FROM lineitem l JOIN b USING (l_returnflag)
""",
)
def winsorize_price_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: clip values to the group's [p05, p95] —
    the outlier-robust feature-scaling step (vs z-score's mean/σ). One
    aggregate over the fact for the bounds (3 fixed groups → broadcast
    join back), then a narrow clamp projection."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("lo"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("hi"),
    )
    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.col("l_extendedprice").cast("double").alias("price"),
            F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi"))
            .cast("double")
            .alias("price_winsorized"),
        )
    )


@query(
    "tv_distance_source_unigrams",
    oracle=f"""
WITH toks AS (
    SELECT source, unnest({tokens_sql('text')}) AS word FROM documents
),
cnt AS (SELECT source, word, count(*) AS c FROM toks GROUP BY source, word),
stot AS (SELECT source, sum(c) AS st FROM cnt GROUP BY source),
wtot AS (SELECT word, sum(c) AS wc FROM cnt GROUP BY word),
ctot AS (SELECT sum(c) AS ct FROM cnt),
terms AS (
    SELECT cnt.source, cnt.word,
           abs(CAST(cnt.c AS DOUBLE) / st - CAST(wc AS DOUBLE) / ct) AS term
    FROM cnt JOIN stot USING (source) JOIN wtot USING (word) CROSS JOIN ctot
)
SELECT source,
       0.5 * list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
               list_transform(
                   list_sort(list(struct_pack(word := word, term := term))),
                   x -> x.term)),
           (p, q) -> p + q) AS tv_distance
FROM terms GROUP BY source
""",
)
def tv_distance_source_unigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift monitor: per-source total-variation distance between
    the source's unigram distribution and the corpus-wide one — the
    cheap alarm for "this source's text stopped looking like the rest".
    Two hash aggregates + a word-keyed join; the per-source Σ|p−q| folds
    over the SORTED word list so the double summation order (hence the
    hash) is engine-independent. State per group is vocabulary-sized;
    for open vocabularies fold per hash-bucket of words first, then sum
    buckets in bucket order."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(tokens("text")).alias("word"))
    cnt = toks.groupBy("source", "word").agg(F.count(F.lit(1)).alias("c"))
    stot = cnt.groupBy("source").agg(F.sum("c").alias("st"))
    wtot = cnt.groupBy("word").agg(F.sum("c").alias("wc"))
    ctot = cnt.agg(F.sum("c").alias("ct"))
    terms = (
        cnt.join(stot, "source")
        .join(wtot, "word")
        .crossJoin(F.broadcast(ctot))
        .select(
            "source",
            "word",
            F.abs(
                F.col("c").cast("double") / F.col("st")
                - F.col("wc").cast("double") / F.col("ct")
            ).alias("term"),
        )
    )
    folded = F.aggregate(
        F.array_sort(F.collect_list(F.struct("word", "term"))),
        F.lit(0.0),
        lambda acc, x: acc + x["term"],
    )
    return terms.groupBy("source").agg((F.lit(0.5) * folded).alias("tv_distance"))


@query(
    "ewma_daily_value_by_type",
    oracle="""
WITH RECURSIVE daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS x
    FROM events GROUP BY event_type, CAST(ts AS DATE)
),
seq AS (
    SELECT event_type, d, x,
           row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
    FROM daily
),
rec AS (
    SELECT event_type, d, rn, x AS y FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.event_type, s.d, s.rn, 0.5 * s.x + 0.5 * r.y
    FROM seq s JOIN rec r ON s.event_type = r.event_type AND s.rn = r.rn + 1
)
SELECT event_type, d, y AS ewma FROM rec
""",
)
def ewma_daily_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha=0.5) of daily event
    value per type — trend smoothing, the classic sequential recursion
    y_t = a*x_t + (1-a)*y_{t-1} that windows can't express.

    Spark runs the recursion as a JVM ``aggregate`` left-fold over each
    type's date-sorted daily series (one shuffle for the daily aggregate,
    one for the per-type collect; the fold itself is row-local); the
    DuckDB twin is a recursive CTE stepping rn -> rn+1. Both sides
    execute the IDENTICAL sequence of IEEE ops (0.5*x + 0.5*y, with x the
    decimal-exact daily sum), so even this stateful float recursion
    hash-matches. Alpha is 0.5 — binary-exact — by design; the fold
    appends per element (fine for bounded series like days; a multi-year
    tick-level series would run the same fold in applyInPandas)."""
    from stadvdb_olap_spark.plans.compat import money_sum

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(money_sum("value").alias("x"))
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("d", "x"))).alias("s")
    )
    folded = F.aggregate(
        F.col("s"),
        F.expr("CAST(array() AS ARRAY<STRUCT<d: DATE, y: DOUBLE>>)"),
        lambda acc, e: F.when(
            F.size(acc) == 0,
            F.array(F.struct(e["d"].alias("d"), e["x"].alias("y"))),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(
                        e["d"].alias("d"),
                        (
                            F.lit(0.5) * e["x"]
                            + F.lit(0.5) * F.element_at(acc, -1)["y"]
                        ).alias("y"),
                    )
                ),
            )
        ),
    )
    return (
        series.select("event_type", F.explode(folded).alias("e"))
        .select(
            "event_type",
            F.col("e.d").alias("d"),
            F.col("e.y").alias("ewma"),
        )
    )


@query(
    "order_extremes_per_priority",
    oracle="""
WITH mx AS (
    SELECT o_orderpriority, o_totalprice AS max_price,
           o_orderkey AS max_price_orderkey
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_orderpriority
        ORDER BY o_totalprice DESC, o_orderkey DESC) = 1
), mn AS (
    SELECT o_orderpriority, o_totalprice AS min_price,
           o_orderkey AS min_price_orderkey
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_orderpriority
        ORDER BY o_totalprice ASC, o_orderkey ASC) = 1
), n AS (
    SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
    GROUP BY o_orderpriority
)
SELECT o_orderpriority, n_orders,
       max_price, max_price_orderkey, min_price, min_price_orderkey
FROM mx JOIN mn USING (o_orderpriority) JOIN n USING (o_orderpriority)
""",
)
def order_extremes_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 per group WITHOUT a window: max/min over a (value, key)
    struct gives the argmax/argmin with a deterministic key tie-break as
    a plain two-phase aggregate — map-side partials touch each row once,
    versus the window's full shuffle-and-sort of every row per group.
    THE pattern for max_by/min_by-style questions at 100 TB. The oracle
    formulates the same answer the window way, so the two shapes
    cross-check each other."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max(F.struct("o_totalprice", "o_orderkey")).alias("__mx"),
            F.min(F.struct("o_totalprice", "o_orderkey")).alias("__mn"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            F.col("__mx.o_totalprice").alias("max_price"),
            F.col("__mx.o_orderkey").alias("max_price_orderkey"),
            F.col("__mn.o_totalprice").alias("min_price"),
            F.col("__mn.o_orderkey").alias("min_price_orderkey"),
        )
    )


@query(
    "chi_square_priority_status",
    oracle="""
WITH cells AS (
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS observed
    FROM orders GROUP BY o_orderpriority, o_orderstatus
), rt AS (
    SELECT o_orderpriority, SUM(observed) AS row_total FROM cells
    GROUP BY o_orderpriority
), ct AS (
    SELECT o_orderstatus, SUM(observed) AS col_total FROM cells
    GROUP BY o_orderstatus
), tot AS (SELECT SUM(observed) AS n FROM cells),
scored AS (
    SELECT o_orderpriority, o_orderstatus, observed,
           ROUND(CAST(row_total AS DOUBLE) * col_total / n, 6) AS expected,
           ROUND(POW(observed - CAST(row_total AS DOUBLE) * col_total / n, 2)
                 / (CAST(row_total AS DOUBLE) * col_total / n), 6) AS contrib
    FROM cells JOIN rt USING (o_orderpriority)
               JOIN ct USING (o_orderstatus) CROSS JOIN tot
)
SELECT o_orderpriority, o_orderstatus, observed, expected, contrib,
       CAST(ROUND(CAST(SUM(CAST(contrib AS DECIMAL(18,6))) OVER ()
                       AS DOUBLE), 4) AS DOUBLE) AS chi2
FROM scored
""",
)
def chi_square_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between order priority and status:
    observed/expected/contribution per contingency cell plus the global
    statistic. ONE pass over the fact builds the contingency cells; row
    totals, column totals, N, and the statistic all derive from the tiny
    cell table (re-aggregates and a global window over ~15 rows — the
    empty-partition window is safe ONLY because it runs post-aggregation
    on a bounded result, never on raw data). Per-cell contributions are
    IEEE-identical cross-engine; the statistic decimal-sums the rounded
    contributions, per compat.py."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cells = (
        orders.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    rt = cells.groupBy("o_orderpriority").agg(
        F.sum("observed").alias("row_total")
    )
    ct = cells.groupBy("o_orderstatus").agg(F.sum("observed").alias("col_total"))
    tot = cells.agg(F.sum("observed").alias("n"))
    expected_raw = (
        F.col("row_total").cast("double") * F.col("col_total") / F.col("n")
    )
    scored = (
        cells.join(F.broadcast(rt), "o_orderpriority")
        .join(F.broadcast(ct), "o_orderstatus")
        .crossJoin(F.broadcast(tot))
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "observed",
            F.round(expected_raw, 6).alias("expected"),
            F.round(
                F.pow(F.col("observed") - expected_raw, 2) / expected_raw, 6
            ).alias("contrib"),
        )
    )
    w = Window.partitionBy()  # global: input is the bounded cell table
    return scored.select(
        "o_orderpriority",
        "o_orderstatus",
        "observed",
        "expected",
        "contrib",
        F.round(
            F.sum(F.col("contrib").cast("decimal(18,6)")).over(w).cast("double"),
            4,
        )
        .cast("double")
        .alias("chi2"),
    )


# Keep the CTE in sync with advanced_queries.scd2_customer_priority —
# the PIT join is certified against the SAME versioned-dimension state.
_SCD2_SQL = """
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
           CAST(eff_ts AS DATE) AS effective_from,
           CAST(row_number() OVER w2 AS INTEGER) AS version
    FROM points
    WINDOW w2 AS (PARTITION BY cust_id ORDER BY eff_ts, o_orderkey)
"""


@query(
    "pit_join_events_priority",
    oracle=f"""
WITH scd2 AS ({_SCD2_SQL})
SELECT e.event_id, e.user_id, v.priority, v.version
FROM events e
LEFT JOIN scd2 v
  ON v.cust_id = e.user_id
 AND CAST(v.effective_from AS TIMESTAMP) <= e.ts
QUALIFY row_number() OVER (
    PARTITION BY e.event_id
    ORDER BY v.effective_from DESC, v.version DESC) = 1
""",
)
def pit_join_events_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join — the feature-store pattern that prevents label
    leakage: each event reads the customer-priority version effective AT
    its timestamp, never a later one. The scalable shape is the union
    timeline (version-start rows kind=0 before event rows kind=1 at the
    same instant, version ascending so a same-day re-version supersedes),
    ONE shuffle on the entity key, last-non-null carried forward — no
    expand-and-pick interval join anywhere. The oracle IS the naive
    expand-and-pick, so agreement certifies the timeline semantics.
    Events before the first version read NULL (no feature existed yet —
    exactly what training-time correctness requires)."""
    from pyspark.sql import Window

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
    ).select(
        "cust_id",
        "priority",
        F.to_date("effective_from").alias("effective_from"),
        "version",
    )
    events = load_table(spark, sf_dir, "events")

    vrows = hist.select(
        F.col("cust_id").alias("uid"),
        F.to_timestamp("effective_from").alias("t"),
        F.lit(0).alias("kind"),
        F.col("version"),
        F.col("priority"),
        F.lit(None).cast("long").alias("event_id"),
    )
    erows = events.select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("int").alias("version"),
        F.lit(None).cast("string").alias("priority"),
        "event_id",
    )
    w = (
        Window.partitionBy("uid")
        .orderBy("t", "kind", "version")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # One struct per version row (NULL on event rows) so priority and
    # version always travel together — they can never be carried forward
    # from two different versions.
    vstate = F.when(
        F.col("kind") == 0, F.struct(F.col("version"), F.col("priority"))
    )
    return (
        vrows.unionByName(erows)
        .withColumn("__v", F.last(vstate, ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            F.col("uid").alias("user_id"),
            F.col("__v.priority").alias("priority"),
            F.col("__v.version").alias("version"),
        )
    )


@query(
    "label_purchase_within_7d",
    oracle="""
SELECT e.event_id, e.user_id,
       CASE WHEN EXISTS (
           SELECT 1 FROM orders o
           WHERE o.o_custkey = e.user_id
             AND o.o_orderdate >  e.ts
             AND o.o_orderdate <= e.ts + INTERVAL 7 DAY)
            THEN 1 ELSE 0 END AS label
FROM events e
""",
)
def label_purchase_within_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-looking LABEL GENERATION: does the user place an order
    strictly after the event, within 7 days? The training-target twin of
    the PIT join — features may only look backward, labels only forward.
    Scalable shape: one DESCENDING union timeline per user (events sort
    before orders at the same instant, so a same-timestamp order is
    excluded — strictly-after semantics), the nearest future order
    timestamp carried via last-non-null, then an integer-microsecond
    horizon check. ONE shuffle on the user key; the oracle is the naive
    correlated EXISTS."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    orows = orders.select(
        F.col("o_custkey").alias("uid"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("t_us"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
    )
    erows = events.select(
        F.col("user_id").alias("uid"),
        F.unix_micros(F.col("ts")).alias("t_us"),
        F.lit(0).alias("kind"),
        "event_id",
    )
    w = (
        Window.partitionBy("uid")
        .orderBy(F.col("t_us").desc(), F.col("kind").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    next_order_us = F.last(
        F.when(F.col("kind") == 1, F.col("t_us")), ignorenulls=True
    ).over(w)
    horizon_us = 7 * 86_400 * 1_000_000
    return (
        orows.unionByName(erows)
        .withColumn("__next", next_order_us)
        .filter(F.col("kind") == 0)
        .select(
            "event_id",
            F.col("uid").alias("user_id"),
            F.when(
                F.col("__next").isNotNull()
                & (F.col("__next") - F.col("t_us") <= horizon_us),
                1,
            )
            .otherwise(0)
            .alias("label"),
        )
    )


@query(
    "cramers_v_priority_status",
    oracle="""
WITH cells AS (
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS observed
    FROM orders GROUP BY o_orderpriority, o_orderstatus
), rt AS (
    SELECT o_orderpriority, SUM(observed) AS row_total FROM cells
    GROUP BY o_orderpriority
), ct AS (
    SELECT o_orderstatus, SUM(observed) AS col_total FROM cells
    GROUP BY o_orderstatus
), tot AS (SELECT SUM(observed) AS n FROM cells),
scored AS (
    SELECT ROUND(POW(observed - CAST(row_total AS DOUBLE) * col_total / n, 2)
                 / (CAST(row_total AS DOUBLE) * col_total / n), 6) AS contrib
    FROM cells JOIN rt USING (o_orderpriority)
               JOIN ct USING (o_orderstatus) CROSS JOIN tot
),
agg AS (
    SELECT CAST(ROUND(CAST(SUM(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE), 4)
               AS DOUBLE) AS chi2
    FROM scored
),
dims AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS r,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS c,
           (SELECT CAST(n AS BIGINT) FROM tot) AS n
)
SELECT chi2,
       (r - 1) * (c - 1) AS dof,
       n,
       sqrt(chi2 / (n * least(r - 1, c - 1))) AS cramers_v
FROM agg CROSS JOIN dims
""",
)
def cramers_v_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for the priority×status contingency table
    — the [0,1]-normalized strength of association that makes the
    chi-square statistic comparable across table sizes (chi2 alone
    grows with N; V = √(χ²/(N·min(r−1,c−1))) does not). Reuses the
    certified chi-square device (rounded per-cell contributions,
    exact decimal sum) and spends one division + one sqrt, both
    correctly rounded on exact operands. One pass over the fact, then
    arithmetic on a ≤15-row cell table and three scalars."""
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("observed")
    )
    rt = cells.groupBy("o_orderpriority").agg(
        F.sum("observed").alias("row_total")
    )
    ct = cells.groupBy("o_orderstatus").agg(
        F.sum("observed").alias("col_total")
    )
    tot = cells.agg(F.sum("observed").alias("n"))
    expected_raw = (
        F.col("row_total").cast("double") * F.col("col_total") / F.col("n")
    )
    scored = (
        cells.join(F.broadcast(rt), "o_orderpriority")
        .join(F.broadcast(ct), "o_orderstatus")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                F.pow(F.col("observed") - expected_raw, 2) / expected_raw,
                6,
            ).alias("contrib")
        )
    )
    agg = scored.agg(
        F.round(
            F.sum(F.col("contrib").cast("decimal(18,6)")).cast("double"), 4
        ).alias("chi2")
    )
    dims = (
        rt.agg(F.count(F.lit(1)).cast("long").alias("r"))
        .crossJoin(
            F.broadcast(ct.agg(F.count(F.lit(1)).cast("long").alias("c")))
        )
        .crossJoin(
            F.broadcast(tot.select(F.col("n").cast("long").alias("n")))
        )
    )
    return agg.crossJoin(F.broadcast(dims)).select(
        "chi2",
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        "n",
        F.sqrt(
            F.col("chi2")
            / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
        ).alias("cramers_v"),
    )


_RL_W_EXACT = 30
_RL_W_LEV = 15
_RL_W_BAND = 5
_RL_THRESH = 20


def _rl_hex4_sql(h: str) -> str:
    return (
        f"((strpos('0123456789abcdef', {h}[1:1]) - 1) * 4096"
        f" + (strpos('0123456789abcdef', {h}[2:2]) - 1) * 256"
        f" + (strpos('0123456789abcdef', {h}[3:3]) - 1) * 16"
        f" + (strpos('0123456789abcdef', {h}[4:4]) - 1))"
    )


@query(
    "record_linkage_selfmatch_customers",
    oracle=f"""
WITH dirty AS (
    SELECT c_custkey AS true_id, c_nationkey, c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS band,
           -- deterministic corruption: 1-3 digit positions -> 'X'
           CASE WHEN u % 7 = 0 THEN
               substr(n2, 1, p3 - 1) || 'X' || substr(n2, p3 + 1)
           ELSE n2 END AS name
    FROM (
        SELECT *,
               CASE WHEN u % 3 = 0 THEN
                   substr(n1, 1, p2 - 1) || 'X' || substr(n1, p2 + 1)
               ELSE n1 END AS n2
        FROM (
            SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal, u,
                   substr(c_name, 1, p1 - 1) || 'X'
                       || substr(c_name, p1 + 1) AS n1,
                   10 + (u // 8) % 8 AS p2,
                   10 + (u // 64) % 8 AS p3
            FROM (
                SELECT *,
                       {_rl_hex4_sql("md5('rl:' || CAST(c_custkey AS VARCHAR))")}
                           AS u,
                       10 + {_rl_hex4_sql("md5('rl:' || CAST(c_custkey AS VARCHAR))")}
                           % 8 AS p1
                FROM customer
            )
        )
    )
),
clean AS (
    SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS band
    FROM customer
),
cand AS (
    SELECT c.c_custkey, d.true_id,
           CASE WHEN c.c_name = d.name THEN {_RL_W_EXACT} ELSE 0 END
         + CASE WHEN levenshtein(c.c_name, d.name) <= 2
                THEN {_RL_W_LEV} ELSE 0 END
         + CASE WHEN c.band = d.band THEN {_RL_W_BAND} ELSE 0 END AS score
    FROM clean c JOIN dirty d
      ON c.c_nationkey = d.c_nationkey
     AND c.c_mktsegment = d.c_mktsegment
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
           CAST(COUNT(*) FILTER (score >= {_RL_THRESH}) AS BIGINT)
               AS n_matches,
           CAST(COUNT(*) FILTER (score >= {_RL_THRESH}
                                 AND c_custkey = true_id) AS BIGINT) AS tp
    FROM cand
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_records FROM dirty)
SELECT n_candidate_pairs, n_matches, tp, n_records,
       CASE WHEN n_matches = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(tp AS DOUBLE) / n_matches END AS precision_,
       CAST(tp AS DOUBLE) / n_records AS recall_
FROM m CROSS JOIN nd
""",
)
def record_linkage_selfmatch_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Probabilistic record linkage, self-evaluating: corrupt every
    customer name DETERMINISTICALLY (1-3 salted-hash-chosen digits
    become 'X' — so ground truth is known), then link the dirty copy
    back with the Fellegi-Sunter recipe: blocking on (nation, segment),
    integer agreement weights on exact-name / edit-distance≤2 (both
    engines implement classic Levenshtein DP — identical integers) /
    balance-band features, threshold at a published score, and report
    candidate volume, matches, precision and recall against the known
    identity. The entity-resolution pipeline in one certified query:
    blocking bounds the pair space (never |A|×|B|), features are
    row-local, and the only floats are two exact-integer divisions.
    Weights are integers, not log-likelihood ratios, keeping the scorer
    hash-exact (the standard m/u-probability weights are logs — their
    RANKING is what matters, and integer approximations of it replay
    exactly)."""
    from stadvdb_olap_spark.operators.mixture import salted_md5

    c = load_table(spark, sf_dir, "customer")
    u = F.conv(
        F.substring(salted_md5("c_custkey", "rl:"), 1, 4), 16, 10
    ).cast("long")
    band = F.floor(F.col("c_acctbal") / 1000).cast("long")

    # positions derived from the same 16-bit draw as the oracle
    base = c.select(
        F.col("c_custkey"),
        "c_nationkey",
        "c_mktsegment",
        band.alias("band"),
        "c_name",
        u.alias("u"),
        (10 + u % 8).cast("int").alias("p1"),
        (10 + (u / 8).cast("long") % 8).cast("int").alias("p2"),
        (10 + (u / 64).cast("long") % 8).cast("int").alias("p3"),
    )

    def splice(col, pos):
        return F.concat(
            col.substr(F.lit(1), pos - 1),
            F.lit("X"),
            col.substr(pos + 1, F.length(col)),
        )

    n1 = splice(F.col("c_name"), F.col("p1"))
    step1 = base.select(
        F.col("c_custkey").alias("true_id"),
        "c_nationkey",
        "c_mktsegment",
        "band",
        "u",
        "p2",
        "p3",
        n1.alias("n1"),
    )
    n2 = F.when(
        F.col("u") % 3 == 0, splice(F.col("n1"), F.col("p2"))
    ).otherwise(F.col("n1"))
    step2 = step1.select(
        "true_id", "c_nationkey", "c_mktsegment", "band", "u", "p3",
        n2.alias("n2"),
    )
    name = F.when(
        F.col("u") % 7 == 0, splice(F.col("n2"), F.col("p3"))
    ).otherwise(F.col("n2"))
    dirty = step2.select(
        "true_id", "c_nationkey", "c_mktsegment", "band",
        name.alias("name"),
    )
    clean = c.select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment",
        band.alias("cband"),
    )
    cand = clean.join(dirty, ["c_nationkey", "c_mktsegment"]).select(
        "c_custkey",
        "true_id",
        (
            F.when(
                F.col("c_name") == F.col("name"), _RL_W_EXACT
            ).otherwise(0)
            + F.when(
                F.levenshtein("c_name", "name") <= 2, _RL_W_LEV
            ).otherwise(0)
            + F.when(F.col("cband") == F.col("band"), _RL_W_BAND).otherwise(
                0
            )
        ).alias("score"),
    )
    m = cand.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"),
        F.sum(F.when(F.col("score") >= _RL_THRESH, 1).otherwise(0))
        .cast("long")
        .alias("n_matches"),
        F.sum(
            F.when(
                (F.col("score") >= _RL_THRESH)
                & (F.col("c_custkey") == F.col("true_id")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("tp"),
    )
    nd = dirty.agg(F.count(F.lit(1)).cast("long").alias("n_records"))
    return m.crossJoin(F.broadcast(nd)).select(
        "n_candidate_pairs",
        "n_matches",
        "tp",
        "n_records",
        F.when(F.col("n_matches") == 0, F.lit(0.0))
        .otherwise(F.col("tp").cast("double") / F.col("n_matches"))
        .alias("precision_"),
        (F.col("tp").cast("double") / F.col("n_records")).alias("recall_"),
    )


_DID_CUTOFF = "2024-01-16"


@query(
    "diff_in_diff_event_value",
    oracle=f"""
WITH assigned AS (
    SELECT CASE WHEN user_id % 2 = 0 THEN 'treat' ELSE 'control' END
               AS grp,
           CASE WHEN CAST(ts AS DATE) >= DATE '{_DID_CUTOFF}'
                THEN 'post' ELSE 'pre' END AS period,
           value
    FROM events
),
cell AS (
    SELECT grp, period,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE)
               AS total
    FROM assigned GROUP BY grp, period
),
wide AS (
    SELECT
        (SELECT total / n FROM cell WHERE grp = 'treat'   AND period = 'pre')  AS t_pre,
        (SELECT total / n FROM cell WHERE grp = 'treat'   AND period = 'post') AS t_post,
        (SELECT total / n FROM cell WHERE grp = 'control' AND period = 'pre')  AS c_pre,
        (SELECT total / n FROM cell WHERE grp = 'control' AND period = 'post') AS c_post,
        (SELECT CAST(SUM(n) AS BIGINT) FROM cell) AS n_events
)
SELECT n_events, t_pre, t_post, c_pre, c_post,
       (t_post - t_pre) - (c_post - c_pre) AS did_estimate
FROM wide
""",
)
def diff_in_diff_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of the treatment effect on
    mean event value: deterministic hash-parity assignment (the
    certified A/B device), a pinned calendar cutoff splitting pre/post,
    and DiD = (treat_post − treat_pre) − (control_post − control_pre) —
    the quasi-experimental workhorse when randomization happens at
    rollout time rather than per-request. Exactness: the four cell
    means are exact-decimal sums rounded once then divided by exact
    counts (the money_sum convention), and the DiD combination runs in
    a PINNED op order — three subtractions of identical doubles. One
    grouped pass over events into a 4-cell table; everything after is
    scalar arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.select(
        F.when(F.col("user_id") % 2 == 0, "treat")
        .otherwise("control")
        .alias("grp"),
        F.when(
            F.col("ts").cast("date") >= F.lit(_DID_CUTOFF).cast("date"),
            "post",
        )
        .otherwise("pre")
        .alias("period"),
        "value",
    )
    cell = assigned.groupBy("grp", "period").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
        .cast("double")
        .alias("total"),
    )
    wide = cell.agg(
        F.sum("n").cast("long").alias("n_events"),
        F.max(
            F.when(
                (F.col("grp") == "treat") & (F.col("period") == "pre"),
                F.col("total") / F.col("n"),
            )
        ).alias("t_pre"),
        F.max(
            F.when(
                (F.col("grp") == "treat") & (F.col("period") == "post"),
                F.col("total") / F.col("n"),
            )
        ).alias("t_post"),
        F.max(
            F.when(
                (F.col("grp") == "control") & (F.col("period") == "pre"),
                F.col("total") / F.col("n"),
            )
        ).alias("c_pre"),
        F.max(
            F.when(
                (F.col("grp") == "control") & (F.col("period") == "post"),
                F.col("total") / F.col("n"),
            )
        ).alias("c_post"),
    )
    return wide.select(
        "n_events",
        "t_pre",
        "t_post",
        "c_pre",
        "c_post",
        (
            (F.col("t_post") - F.col("t_pre"))
            - (F.col("c_post") - F.col("c_pre"))
        ).alias("did_estimate"),
    )


@query(
    "quantile_normalize_order_totals",
    oracle="""
WITH vals AS MATERIALIZED (
  SELECT o_orderkey,
         o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
g AS MATERIALIZED (
  SELECT o_orderkey, o_orderpriority, cents,
         CAST(row_number() OVER (
           PARTITION BY o_orderpriority ORDER BY cents, o_orderkey
         ) AS BIGINT) AS i,
         CAST(count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS ng
  FROM vals
),
gdist AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY cents, o_orderkey) AS BIGINT)
           AS gr,
         cents AS gcents
  FROM vals
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM vals)
SELECT o_orderkey, o_orderpriority,
       cents AS total_cents,
       CAST(gcents AS DOUBLE) / 100 AS qnorm_total
FROM g CROSS JOIN n
JOIN gdist ON gdist.gr = (g.i * n.n_all + g.ng - 1) // g.ng
""",
)
def quantile_normalize_order_totals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Group-wise quantile normalization (the cross-batch feature-scaling
    primitive used to remove per-group distribution shift, e.g.
    microarray/feature pipelines): each order's total is replaced by the
    GLOBAL distribution's value at the same within-group quantile —
    rank i of a group of n_g maps to global order statistic
    ceil(i*N/n_g). After normalization every priority group follows the
    pooled distribution exactly while preserving within-group ranks.
    Exactness: ranks and target indices are pure BIGINT arithmetic
    (i*N < 2^38 at sf0.1), the mapping is an equi-join on the target
    rank, and the only float op is the final cents/100 division.
    Deterministic total order via the (cents, o_orderkey) tiebreak
    (o_orderkey is unique). 100 TB shape: the group rank partitions by
    the group key (one hash shuffle); the GLOBAL rank is the two-phase
    offset rank of ``operators/rank.py:global_row_number`` — a
    deterministic $10k value bucket partitions the sort, per-bucket
    ranks run in parallel, and the tiny cumulative per-bucket offsets
    broadcast back — so NO row ever funnels through an Exchange
    SinglePartition at fact grain (the only single-partition window
    runs over the |buckets| offset rows; determinism rationale in the
    operator's docstring). Final mapping is one hash equi-join on the
    computed index — no theta join, no driver collect."""
    o = load_spread(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    from pyspark.sql import Window

    gw = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    g = o.select(
        "o_orderkey",
        "o_orderpriority",
        "cents",
        F.row_number().over(gw).cast("long").alias("i"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_orderpriority"))
        .cast("long")
        .alias("ng"),
    )
    glob = global_row_number(
        o.select("cents", "o_orderkey"),
        ["cents", "o_orderkey"],
        bucket=F.expr("cents DIV 1000000"),  # $10k value buckets
        out="gr",
    ).select("gr", F.col("cents").alias("gcents"))
    n = o.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    return (
        g.crossJoin(F.broadcast(n))
        .withColumn(
            "target",
            F.expr("(i * n_all + ng - 1) DIV ng").cast("long"),
        )
        .join(glob, F.col("target") == F.col("gr"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("cents").alias("total_cents"),
            (F.col("gcents").cast("double") / 100).alias("qnorm_total"),
        )
    )


# Pinned Mahalanobis parameters (the published-weights device): a
# phase-I robust fit of (l_quantity, l_extendedprice) — mean vector and
# inverse covariance — frozen as literals, as a monitoring deployment
# would freeze its reference window fit.
_MAHA_MU_Q = 25.5
_MAHA_MU_P = 38250.0
_MAHA_A = 0.0048  # S^-1[0][0]
_MAHA_B = -3.1e-06  # S^-1[0][1] = S^-1[1][0]
_MAHA_C = 2.1e-09  # S^-1[1][1]
_MAHA_THR = 13.8155  # chi2(2 dof, 0.999)


@query(
    "mahalanobis_outliers_lineitem",
    oracle=f"""
WITH d AS (
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS DOUBLE) - CAST('{_MAHA_MU_Q!r}' AS DOUBLE)
               AS dq,
           CAST(l_extendedprice AS DOUBLE) - CAST('{_MAHA_MU_P!r}' AS DOUBLE)
               AS dp
    FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       ((CAST('{_MAHA_A!r}' AS DOUBLE) * dq * dq
         + (2 * CAST('{_MAHA_B!r}' AS DOUBLE)) * dq * dp)
         + CAST('{_MAHA_C!r}' AS DOUBLE) * dp * dp) AS d2,
       ((CAST('{_MAHA_A!r}' AS DOUBLE) * dq * dq
         + (2 * CAST('{_MAHA_B!r}' AS DOUBLE)) * dq * dp)
         + CAST('{_MAHA_C!r}' AS DOUBLE) * dp * dp)
         > CAST('{_MAHA_THR!r}' AS DOUBLE) AS is_outlier
FROM d
""",
)
def mahalanobis_outliers_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multivariate (Mahalanobis-distance) outlier screen over
    (quantity, price): d² = (x−μ)ᵀ Σ⁻¹ (x−μ) against the χ²(2, 0.999)
    cutoff — the joint-distribution anomaly detector that catches rows
    each univariate z-score passes (e.g. high quantity WITH low price).
    μ and Σ⁻¹ are pinned literals (the published-weights device — a
    production monitor freezes its reference-window fit exactly like
    this), so d² is a fixed chain of correctly-rounded multiply-adds in
    identical order on both engines, and the verdict is one literal
    comparison. 100 TB shape: a pure narrow projection — no shuffle, no
    aggregate, whole-stage codegen over the scan with both filter
    columns pruned at the reader."""
    li = load_table(spark, sf_dir, "lineitem")
    dq = F.col("l_quantity").cast("double") - F.lit(_MAHA_MU_Q)
    dp = F.col("l_extendedprice").cast("double") - F.lit(_MAHA_MU_P)
    d2 = (
        F.lit(_MAHA_A) * dq * dq + (2 * F.lit(_MAHA_B)) * dq * dp
    ) + F.lit(_MAHA_C) * dp * dp
    return li.select(
        "l_orderkey",
        "l_linenumber",
        d2.alias("d2"),
        (d2 > F.lit(_MAHA_THR)).alias("is_outlier"),
    )


# Benjamini-Hochberg critical |z| values for m=5 two-sided tests at
# FDR alpha=0.05: z_crit(i) = Phi^-1(1 - (i*alpha/m)/2), precomputed
# with Python's statistics.NormalDist (ln/erf never run in-engine).
_BH_M = 5
_BH_CRIT = (
    2.5758293035489,
    2.3263478740408408,
    2.17009037758456,
    2.053748910631822,
    1.9599639845400536,
)


def _bh_crit_sql(rank_expr: str) -> str:
    cases = " ".join(
        f"WHEN {i + 1} THEN CAST('{c!r}' AS DOUBLE)"
        for i, c in enumerate(_BH_CRIT)
    )
    return f"CASE {rank_expr} {cases} END"


@query(
    "bh_fdr_segment_purchase_rate",
    oracle=f"""
WITH seg AS (
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (e.event_type = 'purchase') AS BIGINT) AS k
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(k) AS BIGINT) AS kt
        FROM seg),
z AS (
    SELECT segment, n, k,
           CAST(k AS DOUBLE) / n AS rate,
           (CAST(k AS DOUBLE) / n
            - CAST(kt - k AS DOUBLE) / (nt - n))
           / sqrt((CAST(kt AS DOUBLE) / nt) * (1 - CAST(kt AS DOUBLE) / nt)
                  * (CAST(1 AS DOUBLE) / n + CAST(1 AS DOUBLE) / (nt - n)))
               AS zval
    FROM seg CROSS JOIN tot
),
r AS (
    SELECT segment, n, k, rate, zval,
           CAST(row_number() OVER (ORDER BY abs(zval) DESC, segment)
                AS BIGINT) AS zrank
    FROM z
),
q AS (
    SELECT CAST(COALESCE(MAX(zrank), 0) AS BIGINT) AS maxq
    FROM r WHERE abs(zval) >= {_bh_crit_sql('zrank')}
)
SELECT segment, n AS n_events, k AS n_purchases, rate, zval AS z_score,
       zrank, {_bh_crit_sql('zrank')} AS z_crit,
       zrank <= maxq AS reject
FROM r CROSS JOIN q
""",
)
def bh_fdr_segment_purchase_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benjamini-Hochberg FDR-controlled multiple testing (the
    step-up procedure, 1995) over 5 one-vs-rest two-proportion z-tests:
    does any market segment's purchase rate differ from the rest, with
    the false-discovery rate held at 5% across ALL five looks — the
    correction every experimentation platform applies when it slices an
    A/B readout by segment. Determinism devices: all counts are BIGINT;
    each z is a fixed chain of correctly-rounded ops on exact-integer
    ratios; the BH critical values Phi^-1(1-(i·α/m)/2) are PYTHON-
    precomputed literals (ln/erf never execute in-engine, the Benford
    convention), so the step-up comparison |z|_(i) ≥ crit(i) and the
    max-qualifying-rank cut are pure literal comparisons. 100 TB
    shape: one fact join+aggregate to 5 segment rows; the ranking and
    step-up run on that bounded post-aggregation grain."""
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
    tot = seg.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("k").cast("long").alias("kt"),
    )
    pooled = F.col("kt").cast("double") / F.col("nt")
    zval = (
        F.col("k").cast("double") / F.col("n")
        - (F.col("kt") - F.col("k")).cast("double")
        / (F.col("nt") - F.col("n"))
    ) / F.sqrt(
        pooled
        * (1 - pooled)
        * (
            F.lit(1.0) / F.col("n")
            + F.lit(1.0) / (F.col("nt") - F.col("n"))
        )
    )
    z = seg.crossJoin(F.broadcast(tot)).select(
        "segment",
        "n",
        "k",
        (F.col("k").cast("double") / F.col("n")).alias("rate"),
        zval.alias("zval"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.abs(F.col("zval")).desc(), "segment")
    r = z.withColumn("zrank", F.row_number().over(w).cast("long"))
    crit = F.col("zrank").cast("int")
    crit_expr = None
    for i, c in enumerate(_BH_CRIT):
        cond = crit == (i + 1)
        crit_expr = (
            F.when(cond, F.lit(c))
            if crit_expr is None
            else crit_expr.when(cond, F.lit(c))
        )
    q = r.filter(F.abs(F.col("zval")) >= crit_expr).agg(
        F.coalesce(F.max("zrank"), F.lit(0)).cast("long").alias("maxq")
    )
    return r.crossJoin(F.broadcast(q)).select(
        "segment",
        F.col("n").alias("n_events"),
        F.col("k").alias("n_purchases"),
        "rate",
        F.col("zval").alias("z_score"),
        "zrank",
        crit_expr.alias("z_crit"),
        (F.col("zrank") <= F.col("maxq")).alias("reject"),
    )
