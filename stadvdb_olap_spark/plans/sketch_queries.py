"""DataSketches catalog queries — mergeable sketch estimators.

The scale story: exact COUNT(DISTINCT) / quantiles / set-overlap force a
shuffle of every distinct value; a mergeable sketch is a few KB of state
per group that partial-aggregates map-side and merges associatively, so
at 100 TB the same query is one narrow pass + a tiny exchange. Spark 4
ships Apache DataSketches (HLL, KLL, Theta, approx_top_k) as built-in
JVM expressions — no UDFs anywhere here.

Oracle convention (same as ``approx_percentiles_by_priority``): sketch
estimates are implementation-specific, so the hash-checked output is the
EXACT value plus a boolean claiming the estimate lies within the
sketch's error bound; the DuckDB twin asserts the claim is TRUE for
every row. ``sketch_topk_event_types`` is the exception: with
maxItemsTracked >= the distinct count the sketch is in its exact regime,
so the full (item, count) set hash-matches an exact GROUP BY.

count-min and Bloom don't use Spark's built-in binaries (count_min_sketch
has no point-lookup expression; bloom_filter_agg's bit layout is
implementation-private): both are rebuilt from first principles as
DataFrame aggregations over deterministic salted-md5 hashes, which makes
every counter/bit word engine-replayable — the oracle certifies not just
the estimates but the sketch guarantees themselves (count-min never
underestimates; Bloom has no false negatives) as computed booleans.

No counterpart exists in the reference (its only aggregates are exact
pandas groupbys, SURVEY.md §2.9) — this extends the approx family
(approx_percentile / approx_count_distinct) already certified in round 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.sources.parquet import load_spread, load_table


@query(
    "sketch_hll_users_per_type",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE                    AS hll_within_5pct
FROM events GROUP BY event_type
""",
)
def sketch_hll_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group distinct-user estimate from an HllSketch (lgConfigK=12
    default: ~1.6% RSE, so 5% is a >3-sigma bound). Map-side the sketch
    partial-aggregates; only ~2.5 KB per (partition, group) crosses the
    exchange — versus the exact half's full distinct shuffle."""
    ev = load_table(spark, sf_dir, "events")
    exact = F.count_distinct("user_id")
    est = F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
    return ev.groupBy("event_type").agg(
        exact.alias("exact_users"),
        ((F.abs(est - exact) / exact) <= F.lit(0.05)).alias("hll_within_5pct"),
    )


@query(
    "sketch_hll_mergeable_rollup",
    oracle="""
SELECT count(DISTINCT user_id) AS exact_users,
       TRUE                    AS union_within_5pct
FROM events
""",
)
def sketch_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeability property itself: per-type sketches unioned with
    hll_union_agg must estimate the GLOBAL distinct count — the pattern
    that lets a 100 TB rollup reuse per-partition sketches instead of
    re-scanning (e.g. daily sketches -> monthly distinct in one merge of
    a few KB per day)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = ev.agg(F.count_distinct("user_id").alias("exact_users"))
    return exact.crossJoin(merged).select(
        "exact_users",
        ((F.abs(F.col("est") - F.col("exact_users")) / F.col("exact_users"))
         <= F.lit(0.05)).alias("union_within_5pct"),
    )


@query(
    "sketch_theta_click_purchase_overlap",
    oracle="""
SELECT count(*) AS exact_overlap,
       TRUE     AS theta_within_10pct
FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
)
""",
)
def sketch_theta_click_purchase_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Set-expression cardinality without materializing either set: Theta
    sketches of clickers and purchasers built in ONE pass over events
    (conditional aggregation), intersected sketch-side. The exact half
    pays two distincts + a join; the sketch half is two 4 KB summaries —
    the 100 TB path for audience-overlap questions."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("a"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("b"),
    ).select(
        F.theta_sketch_estimate(F.theta_intersection("a", "b")).alias("est")
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    exact = clicks.join(buys, "user_id").agg(
        F.count(F.lit(1)).alias("exact_overlap")
    )
    return exact.crossJoin(sk).select(
        "exact_overlap",
        ((F.abs(F.col("est") - F.col("exact_overlap")) / F.col("exact_overlap"))
         <= F.lit(0.10)).alias("theta_within_10pct"),
    )


@query(
    "sketch_kll_price_quantile_bracket",
    oracle="""
SELECT l_returnflag,
       CAST(round(quantile_cont(l_extendedprice, 0.50), 4) AS DOUBLE) AS p50_exact,
       TRUE AS kll_p50_in_rank_bounds
FROM lineitem GROUP BY l_returnflag
""",
)
def sketch_kll_price_quantile_bracket(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KLL quantile sketch vs its own guarantee: the estimate's RANK must
    land within +-4% of the target (k=200 bounds ~1.65% single-sided at
    99% confidence; 4% leaves randomization margin), asserted by
    bracketing the estimate between the exact p46 and p54 VALUES. KLL is
    the mergeable, fixed-memory quantile path at scale — the exact
    percentile needs the whole sorted group."""
    li = load_table(spark, sf_dir, "lineitem")
    kll = F.kll_sketch_get_quantile_double(
        F.kll_sketch_agg_double("l_extendedprice"), F.lit(0.5)
    )
    lo = F.percentile("l_extendedprice", F.lit(0.46))
    hi = F.percentile("l_extendedprice", F.lit(0.54))
    exact = F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).cast("double")
    return li.groupBy("l_returnflag").agg(
        exact.alias("p50_exact"),
        ((kll >= lo) & (kll <= hi)).alias("kll_p50_in_rank_bounds"),
    )


@query(
    "sketch_topk_event_types",
    oracle="""
SELECT event_type, count(*) AS freq
FROM events GROUP BY event_type
""",
)
def sketch_topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k in its exact regime: maxItemsTracked (default 10000)
    exceeds the distinct event_type count, so the sketch's (item, count)
    pairs are exact and hash-match a plain GROUP BY — while keeping the
    one-pass bounded-memory shape that still works when the domain
    explodes past memory (then counts degrade to within the sketch's
    documented error instead of OOMing)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.agg(F.expr("approx_top_k(event_type, 5)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("event_type"),
            F.col("e.count").alias("freq"),
        )
    )




# --- count-min sketch (from first principles, engine-replayable) ------

_CM_D = 4  # hash rows
_CM_W = 256  # buckets per row
_CM_PROBES = (
    # frequent, mid, rare, and absent terms — the estimate/guarantee is
    # interesting across the whole frequency spectrum
    "the", "a", "data", "stream", "table", "query",
    "fast", "row", "engine", "zxqv_absent", "no_such_token",
)


def _hex4_sql(h: str) -> str:
    """First 4 hex chars of md5 expression ``h`` as a BIGINT (the
    DuckDB twin of Spark's conv(substring(h,1,4),16,10))."""
    return (
        f"CAST(((strpos('0123456789abcdef', {h}[1:1]) - 1) * 4096"
        f" + (strpos('0123456789abcdef', {h}[2:2]) - 1) * 256"
        f" + (strpos('0123456789abcdef', {h}[3:3]) - 1) * 16"
        f" + (strpos('0123456789abcdef', {h}[4:4]) - 1)) AS BIGINT)"
    )


def _cm_bucket(term, r: int):
    from stadvdb_olap_spark.operators.mixture import salted_md5

    h = salted_md5(term, f"cm{r}:")
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % _CM_W


def _cm_bucket_sql(term_expr: str, r: int) -> str:
    h = f"md5('cm{r}:' || {term_expr})"
    return f"({_hex4_sql(h)} % {_CM_W})"


_CM_PROBE_VALUES = ", ".join(f"('{t}')" for t in _CM_PROBES)
_CM_TOKS_SQL = r"""
toks AS MATERIALIZED (
    SELECT term FROM (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
            AS term
        FROM documents)
    WHERE length(term) > 0
)"""
_CM_ENTRIES_SQL = " UNION ALL ".join(
    f"SELECT {r} AS r, {_cm_bucket_sql('term', r)} AS b FROM toks"
    for r in range(_CM_D)
)
_CM_CELLS_SQL = " UNION ALL ".join(
    f"SELECT term, {r} AS r, {_cm_bucket_sql('term', r)} AS b FROM probes"
    for r in range(_CM_D)
)


@query(
    "countmin_term_frequency_docs",
    oracle=f"""
WITH {_CM_TOKS_SQL},
entries AS MATERIALIZED ({_CM_ENTRIES_SQL}),
counters AS MATERIALIZED (
    SELECT r, b, COUNT(*) AS cnt FROM entries GROUP BY r, b
),
probes AS (SELECT term FROM (VALUES {_CM_PROBE_VALUES}) AS p(term)),
cells AS ({_CM_CELLS_SQL}),
est AS (
    SELECT cells.term, MIN(COALESCE(c.cnt, 0)) AS cm_estimate
    FROM cells LEFT JOIN counters c USING (r, b)
    GROUP BY cells.term
),
truec AS (
    SELECT p.term, COALESCE(t.n, 0) AS true_count
    FROM probes p LEFT JOIN (
        SELECT term, COUNT(*) AS n FROM toks GROUP BY term) t USING (term)
)
SELECT t.term,
       CAST(t.true_count AS BIGINT) AS true_count,
       CAST(e.cm_estimate AS BIGINT) AS cm_estimate,
       e.cm_estimate >= t.true_count AS overestimate_ok
FROM truec t JOIN est e USING (term)
""",
)
def countmin_term_frequency_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) built as plain
    DataFrame aggregation: 4 salted-md5 hash rows x 256 buckets; a
    term's frequency estimate is the MIN of its 4 counters. The counter
    build partial-aggregates map-side to <= d*w cells per partition —
    constant state regardless of corpus size, the mergeable
    heavy-hitter primitive at 100 TB (counters from two corpora ADD).
    Deterministic hashes make the whole sketch engine-replayable, so the
    oracle hash-certifies the counters, the estimates for a pinned probe
    set spanning frequent->absent terms, AND the one-sided error
    guarantee (estimate >= truth, always) as a computed boolean."""
    from stadvdb_olap_spark.functions.text import tokens
    from stadvdb_olap_spark.sources.parquet import spread

    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("term")).filter(
        F.length("term") > 0
    )

    def cm_cells(df):
        return df.select(
            "*",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            _cm_bucket(F.col("term"), r).alias("b"),
                        )
                        for r in range(_CM_D)
                    ]
                )
            ).alias("e"),
        ).select(*df.columns, "e.r", "e.b")

    counters = (
        cm_cells(toks)
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = spark.createDataFrame([(t,) for t in _CM_PROBES], "term string")
    est = (
        cm_cells(probes)
        .join(counters, ["r", "b"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy("term")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
    truec = probes.join(
        toks.groupBy("term").agg(F.count(F.lit(1)).alias("n")), "term", "left"
    ).select("term", F.coalesce("n", F.lit(0)).alias("true_count"))
    return truec.join(est, "term").select(
        "term",
        F.col("true_count").cast("long").alias("true_count"),
        F.col("cm_estimate").cast("long").alias("cm_estimate"),
        (F.col("cm_estimate") >= F.col("true_count")).alias("overestimate_ok"),
    )


# --- Bloom filter (from first principles, engine-replayable) ----------

_BF_WORDS = 8  # 8 x 32-bit words = 256 bits (32-bit words keep the
_BF_BITS = 32  # set-bit values inside positive BIGINT range everywhere)
_BF_K = 3  # hash functions
# Pinned probe keys: low custkeys exist at every sf; the 1e9+ keys never.
_BF_PROBES = (1, 2, 3, 4, 5, 6, 1000000001, 1000000002, 1000000003)


def _bf_pos_sql(key_expr: str, i: int) -> str:
    h = f"md5('bf{i}:' || CAST({key_expr} AS VARCHAR))"
    return f"({_hex4_sql(h)} % {_BF_WORDS * _BF_BITS})"


def _bf_pos(key, i: int):
    from stadvdb_olap_spark.operators.mixture import salted_md5

    h = salted_md5(key, f"bf{i}:")
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % (
        _BF_WORDS * _BF_BITS
    )


_BF_BUILD_SQL = " UNION ALL ".join(
    f"SELECT {_bf_pos_sql('c_custkey', i)} AS p FROM customer"
    for i in range(_BF_K)
)
_BF_PROBE_VALUES = ", ".join(f"({k})" for k in _BF_PROBES)
_BF_CELLS_SQL = " UNION ALL ".join(
    f"SELECT probe_key, {_bf_pos_sql('probe_key', i)} AS p FROM probes"
    for i in range(_BF_K)
)


@query(
    "bloom_filter_customer_probe",
    oracle=f"""
WITH positions AS MATERIALIZED ({_BF_BUILD_SQL}),
words AS MATERIALIZED (
    SELECT p // {_BF_BITS} AS word,
           bit_or(CAST(1 AS BIGINT) << CAST(p % {_BF_BITS} AS INTEGER))
               AS bits
    FROM positions GROUP BY p // {_BF_BITS}
),
probes AS (SELECT CAST(k AS BIGINT) AS probe_key
           FROM (VALUES {_BF_PROBE_VALUES}) AS v(k)),
cells AS ({_BF_CELLS_SQL}),
hits AS (
    SELECT c.probe_key,
           bool_and((COALESCE(w.bits, 0) & (CAST(1 AS BIGINT)
               << CAST(c.p % {_BF_BITS} AS INTEGER))) <> 0) AS bloom_maybe
    FROM cells c LEFT JOIN words w ON c.p // {_BF_BITS} = w.word
    GROUP BY c.probe_key
),
truth AS (
    SELECT p.probe_key,
           EXISTS(SELECT 1 FROM customer
                  WHERE c_custkey = p.probe_key) AS truly_present
    FROM probes p
)
SELECT t.probe_key, t.truly_present, h.bloom_maybe,
       (h.bloom_maybe OR NOT t.truly_present) AS no_false_negative
FROM truth t JOIN hits h USING (probe_key)
""",
)
def bloom_filter_customer_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter build + membership probe as pure DataFrame ops: every
    customer key sets 3 salted-md5 bit positions across 8 32-bit words;
    the build is one bit_or aggregation (mergeable: filters of two
    partitions OR together — the runtime-filter/join-pruning primitive a
    100 TB engine pushes into scans). A pinned probe set of present and
    absent keys certifies the word values, the membership verdicts, and
    the no-false-negative guarantee as a computed boolean. (Spark's
    built-in bloom_filter_agg keeps its bit layout private — rebuilding
    from deterministic hashes is what makes the filter engine-portable
    and hash-checkable.)"""
    from stadvdb_olap_spark.sources.parquet import spread

    cust = load_spread(spark, sf_dir, "customer")
    setbit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {_BF_BITS} AS INT))")
    word_of = F.expr(f"p DIV {_BF_BITS}")
    positions = cust.select(
        F.explode(
            F.array(*[_bf_pos(F.col("c_custkey"), i) for i in range(_BF_K)])
        ).alias("p")
    )
    words = positions.groupBy(word_of.alias("word")).agg(
        F.bit_or(setbit).alias("bits")
    )
    probes = spark.createDataFrame(
        [(int(k),) for k in _BF_PROBES], "probe_key long"
    )
    cells = probes.select(
        "probe_key",
        F.explode(
            F.array(*[_bf_pos(F.col("probe_key"), i) for i in range(_BF_K)])
        ).alias("p"),
    )
    hits = (
        cells.withColumn("word", word_of)
        .withColumn("setbit", setbit)
        .join(words, "word", "left")
        .select(
            "probe_key",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("setbit"))
                != 0
            ).alias("hit"),
        )
        .groupBy("probe_key")
        .agg(F.bool_and("hit").alias("bloom_maybe"))
    )
    present = (
        probes.join(
            cust.select(F.col("c_custkey").alias("probe_key")),
            "probe_key",
            "left_semi",
        )
        .withColumn("truly_present", F.lit(True))
    )
    truth = probes.join(present, "probe_key", "left").select(
        "probe_key",
        F.coalesce("truly_present", F.lit(False)).alias("truly_present"),
    )
    return truth.join(hits, "probe_key").select(
        "probe_key",
        "truly_present",
        "bloom_maybe",
        (F.col("bloom_maybe") | ~F.col("truly_present")).alias(
            "no_false_negative"
        ),
    )


# --- HyperLogLog registers (from first principles, engine-replayable) --

_HLL_M = 256  # buckets (first 2 hex chars of the salted hash)
_HLL_RHO_HEX = 12  # 48-bit rho field (hex chars 3..14)


def _hex2_sql(h: str) -> str:
    return (
        f"CAST(((strpos('0123456789abcdef', {h}[1:1]) - 1) * 16"
        f" + (strpos('0123456789abcdef', {h}[2:2]) - 1)) AS BIGINT)"
    )


@query(
    "hll_registers_users_events",
    oracle=f"""
WITH h AS (
    SELECT md5('hll:' || CAST(user_id AS VARCHAR)) AS h FROM events
),
b AS (
    SELECT {_hex2_sql('h')} % {_HLL_M} AS j,
           substring(h, 3, {_HLL_RHO_HEX}) AS s
    FROM h
),
r AS (
    SELECT j,
           4 * length(regexp_extract(s, '^0*'))
           + CASE substring(s, length(regexp_extract(s, '^0*')) + 1, 1)
                 WHEN '1' THEN 3
                 WHEN '2' THEN 2 WHEN '3' THEN 2
                 WHEN '4' THEN 1 WHEN '5' THEN 1
                 WHEN '6' THEN 1 WHEN '7' THEN 1
                 ELSE 0 END
           + 1 AS rho
    FROM b
)
SELECT j, CAST(MAX(rho) AS BIGINT) AS register
FROM r GROUP BY j
""",
)
def hll_registers_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog REGISTER TABLE (Flajolet et al. 2007) from first
    principles: bucket j = first 8 hash bits, rho = leading-zero count
    of the next 48 bits + 1, register = per-bucket MAX — one
    hash-aggregate producing the <= 256-row mergeable state (two
    corpora's registers MAX together; property-tested). The registers —
    not the estimate — are the asset at 100 TB: tiny per-partition
    state, shippable, unionable, and (unlike Spark's built-in HllSketch
    binary, certified separately via its error bound) bit-replayable in
    any engine because the hash and the leading-zero arithmetic are all
    string/integer ops. The cardinality ESTIMATE deliberately stays out
    of the certified output: the standard small-range correction needs
    ln(), which is not correctly rounded cross-engine — a unit test
    computes the corrected estimate driver-side from these registers
    and bounds it against the exact count instead."""
    from stadvdb_olap_spark.operators.mixture import salted_md5

    ev = load_spread(spark, sf_dir, "events")
    h = salted_md5("user_id", "hll:")
    s = F.substring(h, 3, _HLL_RHO_HEX)
    df = ev.select(
        (F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % _HLL_M).alias(
            "j"
        ),
        s.alias("__s"),
        F.length(F.regexp_extract(s, "^0*", 0)).alias("__z"),
    )
    nib = F.expr("substr(__s, __z + 1, 1)")
    rho = (
        F.lit(4) * F.col("__z")
        + F.when(nib == "1", 3)
        .when(nib.isin("2", "3"), 2)
        .when(nib.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
        + F.lit(1)
    )
    return (
        df.select("j", rho.alias("__rho"))
        .groupBy("j")
        .agg(F.max("__rho").cast("long").alias("register"))
    )


_AMS_S = 16  # independent sign estimators


@query(
    "sketch_ams_f2_lineitem",
    oracle=f"""
WITH z AS (
    SELECT i,
           CAST(SUM(CASE WHEN (strpos('0123456789abcdef',
                       substring(md5(CAST(i AS VARCHAR) || ':' ||
                                 CAST(l_partkey AS VARCHAR)), 1, 1)) - 1)
                       % 2 = 0
                     THEN 1 ELSE -1 END) AS BIGINT) AS zi
    FROM lineitem, unnest(generate_series(0, {_AMS_S - 1})) AS u(i)
    GROUP BY i
),
est AS (
    SELECT CAST(SUM(zi * zi) AS BIGINT) AS sum_z2,
           CAST(COUNT(*) AS BIGINT) AS s
    FROM z
),
exact AS (
    SELECT CAST(SUM(n * n) AS BIGINT) AS f2
    FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n
          FROM lineitem GROUP BY l_partkey)
)
SELECT s AS n_estimators,
       sum_z2,
       CAST(sum_z2 AS DOUBLE) / s AS est_f2,
       f2 AS exact_f2,
       CAST(sum_z2 AS DOUBLE) / s / f2 - 1 AS rel_error
FROM est CROSS JOIN exact
""",
)
def sketch_ams_f2_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS F2 sketch (Alon-Matias-Szegedy 1996): estimate the second
    frequency moment Σf_k² of l_partkey — the self-join size — from 16
    independent ±1 sign sums instead of per-key counts. Each estimator
    Z_i = Σ_rows σ_i(key) is an EXACT BIGINT (the sign is an md5-parity
    hash both engines compute identically), so Z_i², their sum, and the
    exact F2 baseline are all integers; the only floats are the two
    final divisions. This is the mergeable streaming estimator for join
    cardinality (cf. the exact audit `join_cardinality_audit_lineitem`):
    at 100 TB each estimator is one commutative integer sum — a 16-cell
    state regardless of key cardinality, map-side combinable, while the
    exact Σn² needs a full key aggregate. The published rel_error shows
    the estimator's accuracy against ground truth in the same row."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    seeds = spark.range(_AMS_S).select(F.col("id").cast("int").alias("i"))
    # first md5 hex digit parity: Spark via conv(hex,16,10), DuckDB via
    # a strpos digit lookup — same integer, hence the same sign
    sign = F.when(
        (
            F.expr(
                "conv(substring(md5(CAST(concat(CAST(i AS STRING), ':', "
                "CAST(l_partkey AS STRING)) AS BINARY)), 1, 1), 16, 10)"
            ).cast("long")
            % 2
        )
        == 0,
        1,
    ).otherwise(-1)
    z = (
        li.crossJoin(F.broadcast(seeds))
        .groupBy("i")
        .agg(F.sum(sign).cast("long").alias("zi"))
    )
    est = z.agg(
        F.sum(F.col("zi") * F.col("zi")).cast("long").alias("sum_z2"),
        F.count(F.lit(1)).cast("long").alias("s"),
    )
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .agg(F.sum(F.col("n") * F.col("n")).cast("long").alias("f2"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        F.col("s").alias("n_estimators"),
        "sum_z2",
        (F.col("sum_z2").cast("double") / F.col("s")).alias("est_f2"),
        F.col("f2").alias("exact_f2"),
        (
            F.col("sum_z2").cast("double") / F.col("s") / F.col("f2")
            - 1
        ).alias("rel_error"),
    )


_KMV_K = 32
_KMV_DOMAIN = 1 << 48  # hash domain: first 12 md5 hex digits
_KMV_BUCKET_SHIFT = 36  # coarse bucket = hv >> 36 (4096 buckets)


def _hex12_sql(h: str) -> str:
    """48-bit integer from the first 12 hex digits of ``h`` (DuckDB)."""
    return "(" + " + ".join(
        f"(strpos('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (11 - i)}"
        for i in range(12)
    ) + ")"


def bottomk_hashes(
    df: DataFrame, group_col: str, hash_col: str, k: int
) -> DataFrame:
    """The k smallest hash values per group — the KMV (k-minimum-values)
    sketch state, computed with the two-phase shape that survives
    100 TB groups: phase 1 ranks within (group, value-derived coarse
    bucket) partitions — high cardinality, fully parallel, each keeps
    at most k survivors — and phase 2 ranks only the bounded survivor
    set (<= 4096k rows per group). A single window partitioned by the
    group key alone would funnel each group through one task; the
    bucket split is the same device as ``operators/rank.py``.

    KMV is MERGEABLE: bottomk(A ∪ B) == bottomk(bottomk(A) ∪
    bottomk(B)) — min-wise state, the property test pins it — so
    per-partition / per-day sketch states union and re-rank at k-sized
    cost, never re-scanning inputs."""
    from pyspark.sql.window import Window

    bucket = (F.col(hash_col) / F.lit(1 << _KMV_BUCKET_SHIFT)).cast("long")
    w1 = Window.partitionBy(group_col, "kmv_bucket").orderBy(hash_col)
    w2 = Window.partitionBy(group_col).orderBy(hash_col)
    return (
        df.withColumn("kmv_bucket", bucket)
        .withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= k)
        .drop("rn", "kmv_bucket")
        .withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
    )


@query(
    "kmv_bottomk_ndv_orders",
    oracle=f"""
WITH d AS (
    SELECT DISTINCT o_orderpriority AS priority, o_custkey FROM orders
),
h AS (
    SELECT priority,
           {_hex12_sql("md5(CAST(o_custkey AS VARCHAR))")} AS hv
    FROM d
),
ranked AS (
    SELECT priority, hv,
           row_number() OVER (PARTITION BY priority ORDER BY hv) AS rn,
           COUNT(*) OVER (PARTITION BY priority) AS ndv
    FROM h
)
SELECT priority,
       CAST(hv AS BIGINT) AS kth_hash,
       CAST({(_KMV_K - 1) * (1 << 48)} AS DOUBLE) / hv AS est_ndv,
       CAST(ndv AS BIGINT) AS exact_ndv
FROM ranked WHERE rn = {_KMV_K}
""",
)
def kmv_bottomk_ndv_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, REPLAYABLE
    bit-for-bit: per order priority, the 32 smallest 48-bit md5 hashes
    of the customer key are the sketch state; the estimator is the
    classic (k-1) / R_k with R_k the kth value normalized to (0,1) —
    published as one exact division of exact integer operands, next to
    the exact NDV ground truth in the same row (the
    estimate-beside-exact convention of the AMS/Chapman/Chao1 family).
    Unlike the built-in HLL binary, every byte of KMV state is an
    engine-agnostic integer: the oracle re-derives the exact kth hash.
    Scale shape: one distinct aggregate, then the two-phase bucketed
    bottom-k (``bottomk_hashes``) — no single-task group funnels. KMV
    state is mergeable min-wise (property-tested), so per-shard
    sketches union at k-sized cost."""
    d = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_custkey").alias("ck"),
        )
        .distinct()
    )
    h = d.select(
        "priority",
        F.conv(F.substring(F.md5(F.col("ck").cast("string")), 1, 12), 16, 10)
        .cast("long")
        .alias("hv"),
    )
    ndv = h.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("exact_ndv")
    )
    kth = (
        bottomk_hashes(h, "priority", "hv", _KMV_K)
        .where(F.col("rn") == _KMV_K)
        .select("priority", F.col("hv").alias("kth_hash"))
    )
    return kth.join(F.broadcast(ndv), "priority").select(
        "priority",
        "kth_hash",
        (
            F.lit(float((_KMV_K - 1) * (1 << 48))) / F.col("kth_hash")
        ).alias("est_ndv"),
        "exact_ndv",
    )
