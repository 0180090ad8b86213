"""Scale-pattern queries: weighted sampling, skew-salted joins, and
incremental (delta-vs-corpus) dedup.

Three patterns every 100 TB pipeline needs beyond the reference's surface
(reference has no analog — its ETL is single-batch pandas,
``/root/reference/ETL/user_ETL.py``):

- **Deterministic weighted sampling** (priority sampling, Duffield-Lund-
  Thorup): priority = weight / u with u a content-addressed uniform from the
  row key; top-k by priority is a weighted-without-replacement sample that
  every run, engine, and partition layout reproduces. Pure IEEE arithmetic
  (one division — no ln/pow), so the DuckDB oracle is bit-exact.
- **Skew-salted join**: replicate the small side over N salt values and
  scatter the big side's hot keys across (key, salt) reducers. The RESULT
  equals the plain join — which is exactly what the oracle asserts — only
  the shuffle distribution changes. This is the manual fallback for skew
  that AQE's skew-join handles adaptively; having it as an operator means a
  pipeline can pin it where a hot key is known a priori (e.g. the null/bot
  user in event streams).
- **Incremental LSH dedup**: dedup a small DELTA batch against the big
  standing corpus without recomputing the corpus — at 100 TB the corpus
  band table is computed once and persisted; each ingest batch only
  computes its own signatures, broadcasts them against the corpus bands,
  and Jaccard-verifies the collisions. Cost per batch tracks the batch, not
  the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stadvdb_olap_spark.operators.joins import salted_equi_join
from stadvdb_olap_spark.operators.text_dedup import (
    bfs_depth_from_sources,
    connected_components,
    incremental_lsh_matches,
    jaccard_verified_pairs,
)
from stadvdb_olap_spark.plans import compat
from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.plans.text_queries import (
    _BAND_SIZE,
    _NUM_HASHES,
    _SHINGLE_N,
    _bands_sql,
    _shingled_sql,
    _sigs_sql,
)
from stadvdb_olap_spark.sources.parquet import load_spread, load_table

# ---------------------------------------------------------------------------
# Deterministic weighted sampling (priority sampling)
# ---------------------------------------------------------------------------

_U32 = 4294967296.0  # 2^32


def _key_uniform(key: F.Column) -> F.Column:
    """Content-addressed uniform in (0, 1]: the first 8 hex chars of
    md5(key) as a 32-bit integer v, mapped to (v+1)/2^32. A narrow map —
    no seed, no shuffle, reproducible in any engine."""
    v = F.conv(
        F.substring(F.md5(key.cast("string").cast("binary")), 1, 8), 16, 10
    ).cast("double")
    return (v + F.lit(1.0)) / F.lit(_U32)


def _key_uniform_sql(key_expr: str) -> str:
    """DuckDB twin of :func:`_key_uniform`. Hex -> int via per-digit strpos
    (DuckDB has no base-conv builtin); 8 digits keep every intermediate
    exact in a double, so the division is bit-identical to Spark's."""
    h = f"md5(CAST({key_expr} AS VARCHAR))"
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substring({h}, {i}, 1)) - 1) * {16 ** (8 - i)}.0"
        for i in range(1, 9)
    )
    return f"(({digits}) + 1.0) / {_U32}"


@query(
    "weighted_sample_orders_priority",
    oracle=f"""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
QUALIFY row_number() OVER (
    PARTITION BY o_orderstatus
    ORDER BY o_totalprice / ({_key_uniform_sql('o_orderkey')}) DESC,
             o_orderkey) <= 30
""",
)
def weighted_sample_orders_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement, 30 orders per status, inclusion
    probability ~ o_totalprice (priority sampling: rank by w/u descending).
    High-value orders are overwhelmingly likely to be kept; the tail still
    gets a proportional chance. One shuffle on the stratum key; row_number
    truncates inside each reducer, so skewed strata never materialize more
    than their winners. Priority = weight / uniform is a single IEEE
    division — deterministic across engines, partitionings, and re-runs."""
    orders = load_table(spark, sf_dir, "orders")
    prio = F.col("o_totalprice") / _key_uniform(F.col("o_orderkey"))
    w = Window.partitionBy("o_orderstatus").orderBy(
        prio.desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 30)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Skew-salted join
# ---------------------------------------------------------------------------


@query(
    "salted_join_event_value_by_segment",
    oracle="""
SELECT c.c_mktsegment AS segment,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def salted_join_event_value_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event value by customer segment through an 8-way SALTED join: events
    scatter over (user_id, salt), customer replicates x8. Identical result
    to the plain join — the oracle IS the plain join — but a hot user (bot
    traffic, the null user) now spreads across 8 reducers instead of
    stalling one. The follow-up aggregate is two-phase on c_mktsegment, so
    the salt never leaks downstream."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_equi_join(
        events, customer, left_key="user_id", right_key="c_custkey", n_salts=8
    )
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            compat.money_sum("value").alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured surface (Spark 4)
# ---------------------------------------------------------------------------


@query(
    "variant_props_bucketed",
    oracle="""
SELECT CAST(FLOOR(CAST(props->>'$.k' AS BIGINT) / 10) AS BIGINT) AS k_bucket,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY k_bucket
""",
)
def variant_props_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type: the raw
    JSON string parses ONCE into a binary variant (``parse_json``), typed
    paths extract from the parsed form (``variant_get``) — the scale
    answer to repeated ``get_json_object`` calls, which re-parse the
    string per extraction. Shredded parquet VARIANT columns additionally
    push the path extraction into the scan. Buckets of the extracted
    k-property with event and distinct-user counts."""
    events = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        events.select(
            F.floor(k / 10).cast("long").alias("k_bucket"), "user_id"
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# Python UDTF surface (Spark 4): lateral one-to-many expansion
# ---------------------------------------------------------------------------


@query(
    "udtf_chunk_ranges_docs",
    oracle="""
WITH counted AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS BIGINT) AS n
  FROM documents
)
, expanded AS (
  SELECT doc_id, n, unnest(generate_series(0, CAST(n AS BIGINT))) AS i
  FROM counted
)
SELECT doc_id,
       CAST(i AS INTEGER) AS chunk_idx,
       CAST(i * 40 AS INTEGER) AS start_tok,
       CAST(LEAST(i * 40 + 50, n) AS INTEGER) AS end_tok
FROM expanded
WHERE i * 40 < n
""",
)
def udtf_chunk_ranges_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-range planning through a Python UDTF lateral join: each
    document's token count expands to one row per (chunk_idx, start, end)
    sliding window (50 tokens, stride 40). The production chunker is the
    expression-only ``chunk_documents_sliding``; this query keeps the
    UDTF escape hatch — per-row one-to-many logic in Python, streamed
    back row-by-row, Arrow-batched when the session enables it — wired
    and oracle-checked (the DuckDB twin is a ``generate_series``
    lateral)."""
    from stadvdb_olap_spark.functions.text import token_count
    from stadvdb_olap_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents")
    docs.select("doc_id", token_count("text").alias("n")).createOrReplaceTempView(
        "__udtf_counted"
    )
    return spark.sql(
        """
        SELECT c.doc_id, r.chunk_idx, r.start_tok, r.end_tok
        FROM __udtf_counted c, LATERAL chunk_ranges(CAST(c.n AS INT), 50, 40) r
        """
    )


# ---------------------------------------------------------------------------
# Incremental (delta-vs-corpus) LSH dedup
# ---------------------------------------------------------------------------

_DELTA_CUT = "14"  # first md5 byte < 0x14 => ~8% of docs form the delta batch
_JACCARD_T = 0.2


def _delta_pred_sql() -> str:
    return f"substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_DELTA_CUT}'"


@query(
    "dedup_incremental_delta",
    oracle=f"""
WITH sigs AS ({_sigs_sql()}),
bands AS ({_bands_sql()}),
delta_bands AS (SELECT * FROM bands WHERE {_delta_pred_sql()}),
corpus_bands AS (SELECT * FROM bands WHERE NOT ({_delta_pred_sql()})),
cands AS (
    SELECT DISTINCT d.doc_id AS delta_id, c.doc_id AS corpus_id
    FROM delta_bands d JOIN corpus_bands c USING (band_id, band_key)
),
sets_ AS (SELECT doc_id, list_distinct(sh) AS sh FROM ({_shingled_sql()}))
SELECT delta_id, corpus_id,
       CAST(len(list_intersect(sd.sh, sc.sh)) AS DOUBLE)
           / len(list_distinct(sd.sh || sc.sh)) AS jaccard
FROM cands
JOIN sets_ sd ON sd.doc_id = delta_id
JOIN sets_ sc ON sc.doc_id = corpus_id
WHERE CAST(len(list_intersect(sd.sh, sc.sh)) AS DOUBLE)
          / len(list_distinct(sd.sh || sc.sh)) >= {_JACCARD_T}
""",
)
def dedup_incremental_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: the ~8% of documents whose doc-id hash falls
    under the cut play the role of a freshly ingested batch; the other 92%
    are the standing corpus. Each verified (delta, corpus) near-dup pair
    comes back with its exact n-gram Jaccard. The delta's band table
    BROADCASTS against the corpus bands (size-gated), so the corpus is
    probed in place — the per-batch cost is O(batch + collisions), the
    pattern that keeps continuous ingestion dedup affordable at 100 TB."""
    docs = load_spread(spark, sf_dir, "documents")
    bucket = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2
    )
    delta = docs.filter(bucket < _DELTA_CUT)
    corpus = docs.filter(bucket >= _DELTA_CUT)
    return incremental_lsh_matches(
        delta,
        corpus,
        "doc_id",
        "text",
        _JACCARD_T,
        _NUM_HASHES,
        _BAND_SIZE,
        _SHINGLE_N,
    )


# ---------------------------------------------------------------------------
# Iterative graph traversal: BFS depth inside dedup clusters
# ---------------------------------------------------------------------------


@query(
    "bfs_depth_dedup_clusters",
    oracle=f"""
WITH RECURSIVE
-- MATERIALIZED: DuckDB inlines plain CTEs into every reference, so the
-- whole LSH pipeline would otherwise re-evaluate inside EACH recursive
-- iteration (measured 70 s -> <1 s at sf0.01; results identical —
-- evaluation strategy only).
sigs AS MATERIALIZED ({_sigs_sql()}),
bands AS MATERIALIZED ({_bands_sql()}),
cands AS MATERIALIZED (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b USING (band_id, band_key)
    WHERE a.doc_id < b.doc_id
),
sets_ AS MATERIALIZED (
    SELECT doc_id, list_distinct(sh) AS sh FROM ({_shingled_sql()})
),
verified AS MATERIALIZED (
    SELECT id_a, id_b
    FROM cands
    JOIN sets_ sa ON sa.doc_id = id_a
    JOIN sets_ sb ON sb.doc_id = id_b
    WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / len(list_distinct(sa.sh || sb.sh)) >= {_JACCARD_T}
),
edges AS MATERIALIZED (
    SELECT id_a AS a, id_b AS b FROM verified
    UNION ALL
    SELECT id_b AS a, id_a AS b FROM verified
),
reach(id, lbl) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.id = e.b
),
canon AS (SELECT id, MIN(lbl) AS canonical_id FROM reach GROUP BY id),
walk(id, d) AS (
    SELECT id, 0 FROM canon WHERE id = canonical_id
    UNION
    SELECT e.a, w.d + 1 FROM edges e JOIN walk w ON w.id = e.b WHERE w.d < 32
)
SELECT id AS doc_id, CAST(MIN(d) AS BIGINT) AS depth
FROM walk GROUP BY id
""",
)
def bfs_depth_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative frontier BFS, externally certified: every clustered
    document's hop distance from its cluster's canonical (min-id) doc over
    the verified near-dup graph. The Spark side iterates join + min-merge
    rounds to a fixpoint (``bfs_depth_from_sources`` — lineage cut per
    round, rounds = source eccentricity, loud failure past the depth cap);
    the DuckDB twin walks the same edges with a depth-capped recursive CTE
    and takes MIN(d). Near-dup clusters have tiny diameters by
    construction (similar-to-common ⇒ similar-to-each-other), so the cap
    is slack, never a truncation."""
    docs = load_spread(spark, sf_dir, "documents")
    pairs = jaccard_verified_pairs(
        docs, "doc_id", "text", _JACCARD_T, _NUM_HASHES, _BAND_SIZE, _SHINGLE_N
    ).select("id_a", "id_b").localCheckpoint()
    comps = connected_components(pairs)
    sources = comps.filter(F.col("id") == F.col("comp")).select("id")
    return (
        bfs_depth_from_sources(pairs, sources, max_depth=32)
        .select(F.col("id").alias("doc_id"), F.col("depth"))
    )


# ---------------------------------------------------------------------------
# Wide MinHash signatures: the salted multi-digest-group path
# ---------------------------------------------------------------------------


@query(
    "minhash_wide_signatures_docs",
    oracle=f"{_sigs_sql(24)}",
)
def minhash_wide_signatures_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-hash MinHash signatures — hashes 16-23 come from the SECOND
    (salted ``sha256(s || '#1')``) digest group, so this externally
    certifies the multi-group widening path that lets ``num_hashes``
    scale to 64+ for fine LSH band tuning (the 16-hash catalog default
    only exercises group 0). Still one narrow row-local projection, two
    digests per shingle."""
    from stadvdb_olap_spark.operators.text_dedup import minhash_signatures

    docs = load_spread(spark, sf_dir, "documents")
    return minhash_signatures(docs, "doc_id", "text", 24, _SHINGLE_N)


# ---------------------------------------------------------------------------
# Inverted index build: term -> posting list
# ---------------------------------------------------------------------------


@query(
    "inverted_index_terms",
    oracle="""
WITH postings AS (
    SELECT t.term, d.doc_id
    FROM documents d,
         unnest(regexp_split_to_array(trim(lower(d.text)), '[ \\t\\n\\x0b\\f\\r]+')) AS t(term)
    GROUP BY t.term, d.doc_id
)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ' ' ORDER BY doc_id) AS posting
FROM postings
GROUP BY term
HAVING COUNT(*) >= 25
""",
)
def inverted_index_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-index construction: one posting list (sorted doc ids) per
    term, restricted to terms appearing in >= 25 documents so the output
    is the high-value index core. explode -> per-(term, doc) distinct ->
    hash-aggregate with sort_array(collect_set) — two exchanges on the
    term key at any corpus size, posting lists built executor-side (never
    a driver collect). At 100 TB the same plan writes term-bucketed
    parquet so lookups prune to one bucket; a df cap (stopword guard)
    bounds the largest list."""
    docs = load_spread(spark, sf_dir, "documents")
    from stadvdb_olap_spark.functions.text import tokens

    postings = (
        docs.select(F.explode(tokens("text")).alias("term"), "doc_id")
        .distinct()
    )
    # Posting lists publish as space-joined id strings (certified
    # outputs carry no ARRAY columns — driver-canon hazard); the
    # persisted-index form stays array-typed executor-side.
    return (
        postings.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_set("doc_id")),
                    lambda d: d.cast("string"),
                ),
                " ",
            ).alias("posting"),
        )
        .filter(F.col("df") >= 25)
    )


@query(
    "term_cooccurrence_pairs",
    oracle="""
WITH toks AS (
    SELECT d.doc_id, t.term
    FROM documents d,
         unnest(list_distinct(regexp_split_to_array(trim(lower(d.text)), '[ \\t\\n\\x0b\\f\\r]+'))) AS t(term)
),
vocab AS (SELECT term FROM toks GROUP BY term HAVING COUNT(*) >= 25),
vt AS (SELECT doc_id, term FROM toks WHERE term IN (SELECT term FROM vocab))
SELECT a.term AS term_a, b.term AS term_b, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.term < b.term
GROUP BY term_a, term_b
HAVING COUNT(*) >= 10
""",
)
def term_cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: document-level term co-occurrence counts for
    the df>=25 vocabulary, support floor 10 — the raw input to PMI/
    association scoring. The df floor comes FIRST (broadcast semi-join
    against the small vocabulary), so the within-doc self-join explodes
    only vocab terms — pairs per doc are bounded by the per-doc vocab
    hits squared, never raw-token-count squared, and the support floor
    keeps the output the dense core. Same blocked-self-join discipline as
    the dedup family: the join key is doc_id, never an unbounded pair
    space."""
    from stadvdb_olap_spark.functions.text import tokens
    from stadvdb_olap_spark.operators.joins import broadcast_if_small

    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("term")
    )
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") >= 25
    ).select("term")
    vt = toks.join(broadcast_if_small(vocab), "term")
    a = vt.select(F.col("doc_id"), F.col("term").alias("term_a"))
    b = vt.select(F.col("doc_id"), F.col("term").alias("term_b"))
    return (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 10)
    )


@query(
    "term_lift_scores",
    oracle="""
WITH toks AS (
    SELECT d.doc_id, t.term
    FROM documents d,
         unnest(list_distinct(regexp_split_to_array(trim(lower(d.text)), '[ \\t\\n\\x0b\\f\\r]+'))) AS t(term)
),
n_total AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM toks GROUP BY term),
vocab AS (SELECT term, df FROM df WHERE df >= 25),
vt AS (SELECT doc_id, term FROM toks WHERE term IN (SELECT term FROM vocab)),
pairs AS (
    SELECT a.term AS term_a, b.term AS term_b, CAST(COUNT(*) AS DOUBLE) AS n_ab
    FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.term < b.term
    GROUP BY term_a, term_b
    HAVING COUNT(*) >= 10
)
SELECT term_a, term_b,
       CAST(n_ab AS BIGINT) AS n_docs,
       (n_ab * (SELECT n FROM n_total)) / (va.df * vb.df) AS lift
FROM pairs
JOIN vocab va ON va.term = term_a
JOIN vocab vb ON vb.term = term_b
""",
)
def term_lift_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association lift per collocated pair: P(a,b) / (P(a)·P(b)) =
    n_ab·N / (df_a·df_b) — >1 means the terms co-occur more than chance.
    Lift over PMI deliberately: PMI's ln is not correctly-rounded across
    libms and would break the hash oracle, while lift is one multiply and
    one divide — IEEE-exact in any engine (same reasoning as the
    TV-distance drift monitor). Counts ride the co-occurrence plan; the
    df and N factors join back from the tiny vocabulary (broadcast) and a
    1-row scalar."""
    from stadvdb_olap_spark.functions.text import tokens
    from stadvdb_olap_spark.operators.joins import broadcast_if_small

    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("term")
    )
    n_total = docs.select(
        F.countDistinct("doc_id").cast("double").alias("n")
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
        .filter(F.col("df") >= 25)
    )
    vt = toks.join(broadcast_if_small(vocab.select("term")), "term")
    a = vt.select(F.col("doc_id"), F.col("term").alias("term_a"))
    b = vt.select(F.col("doc_id"), F.col("term").alias("term_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("double").alias("n_ab"))
        .filter(F.col("n_ab") >= 10)
    )
    va = vocab.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    vb = vocab.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    return (
        pairs.join(broadcast_if_small(va), "term_a")
        .join(broadcast_if_small(vb), "term_b")
        .crossJoin(F.broadcast(n_total))
        .select(
            "term_a",
            "term_b",
            F.col("n_ab").cast("long").alias("n_docs"),
            ((F.col("n_ab") * F.col("n")) / (F.col("df_a") * F.col("df_b"))).alias(
                "lift"
            ),
        )
    )


@query(
    "inverted_index_merged_delta",
    oracle="""
WITH postings AS (
    SELECT t.term, d.doc_id
    FROM documents d,
         unnest(regexp_split_to_array(trim(lower(d.text)), '[ \\t\\n\\x0b\\f\\r]+')) AS t(term)
    GROUP BY t.term, d.doc_id
)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ' ' ORDER BY doc_id) AS posting
FROM postings
GROUP BY term
HAVING COUNT(*) >= 25
""",
)
def inverted_index_merged_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance: the ~8% delta batch's postings
    full-outer-merge into the standing corpus index (term-keyed join;
    merged posting = sorted distinct union, df recomputed from the
    merge), then the df floor applies to the MERGED index. The oracle is
    the full-corpus index itself — the invariant that makes incremental
    maintenance trustworthy: merge(index(corpus), index(delta)) must
    equal index(corpus ∪ delta) exactly, since the doc sets are disjoint.
    At 100 TB the corpus index is the persisted table and only the delta
    side is computed per ingest; the merge join is term-partitioned, and
    the delta side broadcasts when small."""
    from stadvdb_olap_spark.functions.text import tokens
    from stadvdb_olap_spark.operators.joins import broadcast_if_small

    docs = load_spread(spark, sf_dir, "documents")
    bucket = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2
    )

    def unfloored_index(side: DataFrame) -> DataFrame:
        postings = side.select(
            F.explode(tokens("text")).alias("term"), "doc_id"
        ).distinct()
        return postings.groupBy("term").agg(
            F.sort_array(F.collect_set("doc_id")).alias("posting")
        )

    corpus_ix = unfloored_index(docs.filter(bucket >= _DELTA_CUT))
    delta_ix = unfloored_index(docs.filter(bucket < _DELTA_CUT))
    empty = F.array().cast("array<bigint>")
    merged = (
        corpus_ix.withColumnRenamed("posting", "p_c")
        .join(
            broadcast_if_small(delta_ix.withColumnRenamed("posting", "p_d")),
            "term",
            "full_outer",
        )
        .select(
            "term",
            F.sort_array(
                F.array_distinct(
                    F.concat(
                        F.coalesce(F.col("p_c"), empty),
                        F.coalesce(F.col("p_d"), empty),
                    )
                )
            ).alias("posting"),
        )
    )
    return (
        merged.select(
            "term",
            F.size("posting").cast("long").alias("df"),
            # Same no-ARRAY-output publication rule as inverted_index_terms.
            F.array_join(
                F.transform(F.col("posting"), lambda d: d.cast("string")), " "
            ).alias("posting"),
        )
        .filter(F.col("df") >= 25)
    )


# ---------------------------------------------------------------------------
# Time-based RANGE window frame: trailing interval aggregates
# ---------------------------------------------------------------------------


@query(
    "trailing_1h_user_value",
    oracle="""
SELECT event_id, user_id,
       CAST(ROUND(
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 2) AS DOUBLE) AS value_1h
FROM events
""",
)
def trailing_1h_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-one-hour value per event via a time-based RANGE frame —
    the velocity/rate-limit feature (fraud scoring, abuse detection) that
    row-count frames cannot express: each event's frame covers however
    many events landed in its last 3600 seconds, including timestamp
    peers. One shuffle on user_id; the frame sum is an exact decimal sum
    (the sliding-sum convention from plans/compat.py — engines disagree
    on float summation order inside frames, decimals are
    order-insensitive), rounded to cents as DOUBLE."""
    from stadvdb_olap_spark.plans.compat import dec

    events = load_table(spark, sf_dir, "events")
    # Order by exact MICROsecond epochs (unix_micros / epoch_us): both
    # engines see identical integers, where second-granularity epochs
    # would truncate sub-second timestamps differently at the frame edge.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.round(F.sum(dec("value")).over(w).cast("double"), 2)
        .cast("double")
        .alias("value_1h"),
    )


# ---------------------------------------------------------------------------
# Null semantics: null-safe join equality and LOCF forward fill
# ---------------------------------------------------------------------------


@query(
    "nullsafe_join_user_buckets",
    oracle="""
WITH ev AS (
    SELECT event_id,
           CASE WHEN user_id % 97 = 0 THEN NULL ELSE user_id % 10 END AS bucket
    FROM events
),
dim AS (
    SELECT CASE WHEN b = 10 THEN NULL ELSE b END AS bucket,
           CASE WHEN b = 10 THEN 'unattributed' ELSE 'bucket-' || CAST(b AS VARCHAR) END AS label
    FROM (SELECT unnest(generate_series(0, 10)) AS b)
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_events
FROM ev JOIN dim ON ev.bucket IS NOT DISTINCT FROM dim.bucket
GROUP BY label
""",
)
def nullsafe_join_user_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of vanishing — how an 'unattributed' dim row
    catches the null-key fact rows that a plain equi-join silently drops.
    Nulls are injected deterministically (user_id % 97 == 0) and the
    11-row dim (10 buckets + the NULL row) broadcasts; the plan is the
    same broadcast hash join, just with null-safe key equality."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_id",
        F.when(F.col("user_id") % 97 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("user_id") % 10)
        .alias("bucket"),
    )
    dim = spark.range(0, 11).select(
        F.when(F.col("id") == 10, F.lit(None).cast("bigint"))
        .otherwise(F.col("id"))
        .alias("bucket"),
        F.when(F.col("id") == 10, F.lit("unattributed"))
        .otherwise(F.concat(F.lit("bucket-"), F.col("id").cast("string")))
        .alias("label"),
    )
    return (
        ev.join(F.broadcast(dim), ev["bucket"].eqNullSafe(dim["bucket"]))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "locf_forward_fill_events",
    oracle="""
WITH ev AS (
    SELECT event_id, user_id, ts,
           CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
    FROM events
)
SELECT event_id, user_id, v,
       last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS v_filled
FROM ev
""",
)
def locf_forward_fill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap fill: deterministically
    null out every 7th reading, then forward-fill per user with
    ``last(v, ignorenulls=True)`` over an unbounded-preceding frame —
    the sensor/telemetry repair step (leading nulls stay null: nothing
    to carry). One shuffle on user_id; the frame is a running window, so
    state per row is O(1)."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "v",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )


@query(
    "mad_quantity_per_flag",
    oracle="""
WITH med AS (
    SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med_qty
    FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       ANY_VALUE(m.med_qty) AS med_qty,
       quantile_cont(abs(l.l_quantity - m.med_qty), 0.5) AS mad_qty
FROM lineitem l JOIN med m USING (l_returnflag)
GROUP BY l.l_returnflag
""",
)
def mad_quantity_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion
    measure (unlike stddev, one corrupt reading cannot blow it up; the
    outlier-quarantine companion to the IQR query). Two aggregate passes
    by construction (the median must exist before deviations from it):
    per-group medians broadcast back onto the fact, then a second
    percentile over the absolute deviations. Interpolated percentiles
    are exact arithmetic on doubles — both engines compute the identical
    value, as the percentile family queries already certify."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    med = lineitem.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("med_qty")
    )
    from stadvdb_olap_spark.operators.joins import broadcast_if_small

    joined = lineitem.join(broadcast_if_small(med), "l_returnflag")
    return joined.groupBy("l_returnflag").agg(
        F.any_value("med_qty").alias("med_qty"),
        F.percentile(
            F.abs(F.col("l_quantity") - F.col("med_qty")), F.lit(0.5)
        ).alias("mad_qty"),
    )


@query(
    "key_skew_profile_events",
    oracle="""
WITH per_key AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY user_id
)
SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS log2_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       MIN(n) AS min_rows, MAX(n) AS max_rows,
       CAST(SUM(n) AS BIGINT) AS total_rows
FROM per_key
GROUP BY log2_bucket
""",
)
def key_skew_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the frequency-of-frequencies histogram
    of events per user, bucketed by floor(log2(n)) — the profile that
    decides whether a key needs salting (`salted_equi_join`) or AQE's
    skew split suffices before a 100 TB join. The log2 bucket is computed
    EXACTLY as length(bin(n)) - 1 (binary-string length), sidestepping
    libm log2 whose last-ulp rounding differs across engines. Two
    exchanges: per-key count, then the tiny bucket rollup."""
    events = load_table(spark, sf_dir, "events")
    per_key = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_key.select(
            (F.length(F.bin("n")) - 1).cast("long").alias("log2_bucket"), "n"
        )
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.min("n").alias("min_rows"),
            F.max("n").alias("max_rows"),
            F.sum("n").alias("total_rows"),
        )
    )


@query(
    "rcte_min_label_clusters",
    oracle=f"""
WITH RECURSIVE
-- MATERIALIZED: DuckDB inlines plain CTEs into every reference, so the
-- whole LSH pipeline would otherwise re-evaluate inside EACH recursive
-- iteration (measured 70 s -> <1 s at sf0.01; results identical —
-- evaluation strategy only).
sigs AS MATERIALIZED ({_sigs_sql()}),
bands AS MATERIALIZED ({_bands_sql()}),
cands AS MATERIALIZED (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b USING (band_id, band_key)
    WHERE a.doc_id < b.doc_id
),
sets_ AS MATERIALIZED (
    SELECT doc_id, list_distinct(sh) AS sh FROM ({_shingled_sql()})
),
verified AS MATERIALIZED (
    SELECT id_a, id_b
    FROM cands
    JOIN sets_ sa ON sa.doc_id = id_a
    JOIN sets_ sb ON sb.doc_id = id_b
    WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / len(list_distinct(sa.sh || sb.sh)) >= {_JACCARD_T}
),
edges AS MATERIALIZED (
    SELECT id_a AS a, id_b AS b FROM verified
    UNION ALL
    SELECT id_b AS a, id_a AS b FROM verified
),
reach(id, lbl) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.id = e.b
)
SELECT id AS doc_id, MIN(lbl) AS canonical_id
FROM reach GROUP BY id
""",
)
def rcte_min_label_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup connected components via Spark 4's ``WITH RECURSIVE`` —
    the DECLARATIVE twin of the iterative ``dedup_clusters_canonical``
    operator (same verified-pair graph, same min-reachable-id
    canonical). Spark's recursive CTEs allow only UNION ALL, so the
    recursion is made finite two ways: a depth cap (16 ≫ any near-dup
    cluster diameter — similar-to-common means similar-to-each-other)
    and an improving-label prune (a label propagates onto a node only
    if it is smaller than that node's id — exactly the rows that can
    survive the final MIN). The DuckDB twin uses its UNION-distinct
    fixpoint form (no cap needed). Scale verdict in SCALING.md: the
    recursive plan re-joins the FULL reach set per level (no
    per-round convergence pruning), so the iterative operator with
    lineage cuts stays the 100 TB path; this query certifies the two
    agree and pins the new SQL surface."""
    docs = load_spread(spark, sf_dir, "documents")
    pairs = jaccard_verified_pairs(
        docs, "doc_id", "text", _JACCARD_T, _NUM_HASHES, _BAND_SIZE, _SHINGLE_N
    ).select("id_a", "id_b").localCheckpoint()
    edges = pairs.select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    ).unionAll(pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
    edges.createOrReplaceTempView("rcte_neardup_edges")
    return spark.sql("""
WITH RECURSIVE reach(id, lbl, d) AS (
    SELECT a, a, 0 FROM rcte_neardup_edges
    UNION ALL
    SELECT e.a, r.lbl, r.d + 1
    FROM rcte_neardup_edges e JOIN reach r ON r.id = e.b
    WHERE r.d < 16 AND r.lbl < e.a
)
SELECT id AS doc_id, MIN(lbl) AS canonical_id
FROM reach GROUP BY id
""")


# ---------------------------------------------------------------------------
# Z-order layout key with published cuts
# ---------------------------------------------------------------------------

# Published equi-depth boundaries (computed once offline, pinned here —
# the production posture for a layout spec: every engine/run derives the
# identical curve). Prices are ~uniform on [1e3, 5e5] and dates span
# 1995-01-01..2001-08-01 at EVERY fixture scale, so the cuts hold sf-wide.
_Z_PRICE_CUTS = (
    32246, 62854, 94077, 125118, 156437, 187831, 218509, 249938,
    281257, 312494, 343733, 375054, 406323, 437341, 468628,
)
_Z_DATE_CUTS = (
    "1995-05-31", "1995-10-28", "1996-03-26", "1996-08-23",
    "1997-01-20", "1997-06-19", "1997-11-16", "1998-04-15",
    "1998-09-12", "1999-02-09", "1999-07-09", "1999-12-06",
    "2000-05-04", "2000-10-01", "2001-02-28",
)
_Z_BITS = 4


def _z_bucket_sql(col: str, cuts: tuple, quote: bool) -> str:
    terms = " + ".join(
        f"(CASE WHEN {col} > "
        + (f"TIMESTAMP '{c}'" if quote else str(c))
        + " THEN 1 ELSE 0 END)"
        for c in cuts
    )
    return f"CAST({terms} AS BIGINT)"


def _z_interleave_sql(b_exprs: list[str], bits: int) -> str:
    ndims = len(b_exprs)
    parts = [
        f"((({b} >> {j}) & 1) << {j * ndims + i})"
        for i, b in enumerate(b_exprs)
        for j in range(bits)
    ]
    return "CAST(" + " | ".join(parts) + " AS BIGINT)"


@query(
    "zorder_key_orders",
    oracle=f"""
SELECT o_orderkey,
       {_z_bucket_sql('o_totalprice', _Z_PRICE_CUTS, False)} AS bucket_price,
       {_z_bucket_sql('o_orderdate', _Z_DATE_CUTS, True)} AS bucket_date,
       {_z_interleave_sql([_z_bucket_sql('o_totalprice', _Z_PRICE_CUTS, False),
                           _z_bucket_sql('o_orderdate', _Z_DATE_CUTS, True)],
                          _Z_BITS)} AS zkey
FROM orders
""",
)
def zorder_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional layout key: the Morton/Z-value over published
    equi-depth (price, date) bucket boundaries — what OPTIMIZE ZORDER
    clusters on, certified bit-for-bit (buckets are monotone cut counts,
    the interleave is pure integer shifts). Writing range-partitioned +
    sorted on this key (operators/maintenance.py:write_zordered) gives
    every listed dimension tight per-file min/max ranges, so scans
    filtering on EITHER dimension skip most files; the published-cuts
    form keeps layout stable across engines, runs, and data growth."""
    from stadvdb_olap_spark.operators.maintenance import (
        zorder_bucket,
        zorder_key_pinned,
    )

    orders = load_spread(spark, sf_dir, "orders")
    price_dim = (
        F.col("o_totalprice"),
        [float(c) for c in _Z_PRICE_CUTS],
    )
    date_dim = (
        F.col("o_orderdate"),
        [F.lit(d).cast("timestamp") for d in _Z_DATE_CUTS],
    )
    return orders.select(
        "o_orderkey",
        zorder_bucket(*price_dim).alias("bucket_price"),
        zorder_bucket(*date_dim).alias("bucket_date"),
        zorder_key_pinned([price_dim, date_dim], _Z_BITS).alias("zkey"),
    )


_ZM_FILE_ROWS = 256
_ZM_LO, _ZM_HI = "1997-01-01", "1997-06-30"


@query(
    "zonemap_prune_layouts_orders",
    oracle=f"""
WITH by_key AS (
    SELECT 'by_key' AS layout,
           CAST(o_orderkey // {_ZM_FILE_ROWS} AS BIGINT) AS file_id,
           CAST(o_orderdate AS DATE) AS d
    FROM orders
),
by_date AS (
    SELECT 'by_date' AS layout,
           CAST((row_number() OVER (ORDER BY o_orderdate, o_orderkey) - 1)
                // {_ZM_FILE_ROWS} AS BIGINT) AS file_id,
           CAST(o_orderdate AS DATE) AS d
    FROM orders
),
u AS (SELECT * FROM by_key UNION ALL SELECT * FROM by_date),
zones AS (
    SELECT layout, file_id,
           MIN(d) AS zmin, MAX(d) AS zmax,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM u GROUP BY layout, file_id
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(COUNT(*) FILTER (
           zmax < DATE '{_ZM_LO}' OR zmin > DATE '{_ZM_HI}'
       ) AS BIGINT) AS n_files_skipped,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows_total,
       CAST(COALESCE(SUM(n_rows) FILTER (
           zmax < DATE '{_ZM_LO}' OR zmin > DATE '{_ZM_HI}'
       ), 0) AS BIGINT) AS n_rows_skipped,
       CAST(COALESCE(SUM(n_rows) FILTER (
           zmax < DATE '{_ZM_LO}' OR zmin > DATE '{_ZM_HI}'
       ), 0) AS DOUBLE) / SUM(n_rows) AS skip_frac
FROM zones GROUP BY layout
""",
)
def zonemap_prune_layouts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max statistics) pruning audit for a date-range
    predicate under two physical layouts: files written in key order
    vs files written date-clustered — the quantified argument for the
    clustering/Z-order maintenance pass (operators/maintenance.py):
    the SAME scan predicate skips ~0% of key-ordered files but almost
    every date-clustered file outside the window, exactly how Parquet
    row-group statistics and lakehouse data skipping behave at 100 TB.
    Simulated file id = 256-row chunks (key division vs date-rank
    division); zones are per-file MIN/MAX; a file is skippable when its
    zone misses the pinned window. Pure integer/date arithmetic plus one
    exact division — hash-certified. The date-rank layout's global
    row_number comes from ``operators/rank.py:global_row_number``
    (deterministic daily buckets + per-bucket ranks + broadcast
    cumulative offsets — exactly the sort a real clustering writer
    performs), never an unpartitioned window."""
    from stadvdb_olap_spark.operators.rank import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    by_key = orders.select(
        F.lit("by_key").alias("layout"),
        F.expr(f"o_orderkey div {_ZM_FILE_ROWS}").alias("file_id"),
        d.alias("d"),
    )
    by_date = global_row_number(
        orders.select("o_orderdate", "o_orderkey"),
        ["o_orderdate", "o_orderkey"],
        bucket=F.col("o_orderdate").cast("date"),  # daily buckets
        out="gr",
    ).select(
        F.lit("by_date").alias("layout"),
        F.expr(f"(gr - 1) div {_ZM_FILE_ROWS}").alias("file_id"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    zones = (
        by_key.unionAll(by_date)
        .groupBy("layout", "file_id")
        .agg(
            F.min("d").alias("zmin"),
            F.max("d").alias("zmax"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )
    skippable = (F.col("zmax") < F.lit(_ZM_LO).cast("date")) | (
        F.col("zmin") > F.lit(_ZM_HI).cast("date")
    )
    return zones.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(F.when(skippable, 1).otherwise(0))
        .cast("long")
        .alias("n_files_skipped"),
        F.sum("n_rows").cast("long").alias("n_rows_total"),
        F.sum(F.when(skippable, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("n_rows_skipped"),
        (
            F.sum(F.when(skippable, F.col("n_rows")).otherwise(0)).cast(
                "double"
            )
            / F.sum("n_rows")
        ).alias("skip_frac"),
    )


@query(
    "join_cardinality_audit_lineitem",
    oracle="""
WITH per_key AS (
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_partkey
),
agg AS (
    SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS ndv_partkey,
           CAST(SUM(n * n) AS BIGINT) AS exact_join_rows,
           CAST(MAX(n) AS BIGINT) AS max_key_rows
    FROM per_key
)
SELECT n_rows, ndv_partkey, exact_join_rows, max_key_rows,
       (CAST(n_rows AS DOUBLE) * n_rows) / ndv_partkey AS uniform_est,
       exact_join_rows
           / ((CAST(n_rows AS DOUBLE) * n_rows) / ndv_partkey)
           AS skew_multiplier
FROM agg
""",
)
def join_cardinality_audit_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Planner-style join-cardinality audit for the partkey self-join
    (the shape behind every co-purchase / set-similarity query here):
    the EXACT output size Σ n_k² computed from per-key counts alone —
    no join executed — against the uniform-distribution estimate
    N²/ndv that a naive optimizer would use, and their ratio (the skew
    multiplier that tells you how badly uniform-NDV estimation
    undercounts). This is the pre-flight check a 100 TB pipeline runs
    before an expensive self-join: one hash aggregate on the join key,
    five integers, two exact divisions. All counting is BIGINT (Σ n²
    stays far under 2^63 at any realistic key fan-out); the only
    doubles are single correctly-rounded divisions of exact integers."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    agg = per_key.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("ndv_partkey"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("exact_join_rows"),
        F.max("n").cast("long").alias("max_key_rows"),
    )
    uniform = (
        F.col("n_rows").cast("double") * F.col("n_rows")
    ) / F.col("ndv_partkey")
    return agg.select(
        "n_rows",
        "ndv_partkey",
        "exact_join_rows",
        "max_key_rows",
        uniform.alias("uniform_est"),
        (F.col("exact_join_rows") / uniform).alias("skew_multiplier"),
    )


_INC_CUTOFF = "1997-07-01"


@query(
    "incremental_agg_maintenance_orders",
    oracle=f"""
SELECT o_orderpriority,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {compat.money_sum_sql('o_totalprice')} AS revenue
FROM orders
GROUP BY 1, 2
""",
)
def incremental_agg_maintenance_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental materialized-aggregate maintenance, certified by the
    algebraic-merge property: the pipeline maintains a (priority, year)
    revenue rollup as BASE (orders before {_INC_CUTOFF}) and folds in a
    DELTA batch (orders on/after it) by MERGING the two partial
    aggregates — full-outer join on the group key, coalesced count adds
    and decimal sum adds — instead of recomputing over all history. The
    oracle IS the full recompute, so a hash match proves merge ==
    recompute exactly (counts and sums are algebraic; the decimal->
    double conversion happens once, after the merge, per compat.py).
    100 TB shape: the delta aggregate touches only the new partition's
    rows; the merge joins two |groups|-sized relations (broadcastable),
    never the fact — turning a daily full-table scan into an
    O(delta + groups) update, the lakehouse merge-tree pattern."""
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_INC_CUTOFF).cast("date")
    d = F.col("o_orderdate").cast("date")

    def partial(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy(
            "o_orderpriority",
            F.year("o_orderdate").cast("long").alias("yr"),
        ).agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{tag}"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                f"s_{tag}"
            ),
        )

    base = partial(orders.filter(d < cutoff), "b")
    delta = partial(orders.filter(d >= cutoff), "d")
    merged = base.join(delta, ["o_orderpriority", "yr"], "full_outer")
    zero = F.lit(0).cast("decimal(18,2)")
    return merged.select(
        "o_orderpriority",
        "yr",
        (
            F.coalesce(F.col("n_b"), F.lit(0))
            + F.coalesce(F.col("n_d"), F.lit(0))
        )
        .cast("long")
        .alias("n_orders"),
        (
            F.coalesce(F.col("s_b"), zero) + F.coalesce(F.col("s_d"), zero)
        )
        .cast("double")
        .alias("revenue"),
    )


@query(
    "ivm_agg_deletes_orders",
    oracle="""
WITH base AS (
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS s
    FROM orders WHERE o_orderkey % 5 <> 4 GROUP BY 1
),
ins AS (
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS s
    FROM orders WHERE o_orderkey % 5 = 4 GROUP BY 1
),
del AS (
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS s
    FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 5 <> 4 GROUP BY 1
),
maintained AS (
    SELECT b.o_orderpriority,
           b.n + COALESCE(i.n, 0) - COALESCE(d.n, 0) AS n_orders,
           b.s + COALESCE(i.s, CAST(0 AS DECIMAL(18,6)))
               - COALESCE(d.s, CAST(0 AS DECIMAL(18,6))) AS s
    FROM base b
    LEFT JOIN ins i USING (o_orderpriority)
    LEFT JOIN del d USING (o_orderpriority)
),
recomputed AS (
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS s
    FROM orders
    WHERE NOT (o_orderkey % 7 = 0 AND o_orderkey % 5 <> 4)
    GROUP BY 1
)
SELECT m.o_orderpriority,
       CAST(m.n_orders AS BIGINT) AS n_orders,
       CAST(ROUND(m.s, 2) AS DOUBLE) AS revenue,
       (m.n_orders = r.n AND m.s = r.s) AS consistent
FROM maintained m JOIN recomputed r USING (o_orderpriority)
""",
)
def ivm_agg_deletes_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance under INSERTS AND DELETES (bag
    semantics — the case `incremental_agg_maintenance_orders` doesn't
    cover): the stored (priority) rollup folds in an insert batch and
    SUBTRACTS a delete batch as signed multiplicities — counts and
    exact decimal sums form a group (invertible monoid), so deletion is
    algebraic, never a rescan. The published `consistent` flag compares
    the maintained state against the from-scratch recompute IN DECIMAL
    (exact on both engines; the double conversion happens once, for the
    published revenue) — the query certifies its own correctness
    invariant. 100 TB shape: each delta aggregates only its batch;
    the merge joins |groups|-sized relations (broadcastable); a
    support-reaching-zero group would leave with n_orders = 0 rather
    than lingering (delete-aware IVM semantics)."""
    orders = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,6)")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(dec).alias("s"),
        )

    k = F.col("o_orderkey")
    base = partial(orders.filter(k % 5 != 4))
    ins = partial(orders.filter(k % 5 == 4)).select(
        "o_orderpriority", F.col("n").alias("n_i"), F.col("s").alias("s_i")
    )
    dele = partial(orders.filter((k % 7 == 0) & (k % 5 != 4))).select(
        "o_orderpriority", F.col("n").alias("n_d"), F.col("s").alias("s_d")
    )
    zero = F.lit(0).cast("decimal(18,6)")
    maintained = (
        base.join(ins, "o_orderpriority", "left")
        .join(dele, "o_orderpriority", "left")
        .select(
            "o_orderpriority",
            (
                F.col("n") + F.coalesce("n_i", F.lit(0)) - F.coalesce("n_d", F.lit(0))
            ).cast("long").alias("n_orders"),
            (
                F.col("s") + F.coalesce(F.col("s_i"), zero)
                - F.coalesce(F.col("s_d"), zero)
            ).alias("s_m"),
        )
    )
    recomputed = partial(
        orders.filter(~((k % 7 == 0) & (k % 5 != 4)))
    ).select(
        "o_orderpriority", F.col("n").alias("n_r"), F.col("s").alias("s_r")
    )
    return maintained.join(recomputed, "o_orderpriority").select(
        "o_orderpriority",
        "n_orders",
        F.round(F.col("s_m"), 2).cast("double").alias("revenue"),
        (
            (F.col("n_orders") == F.col("n_r")) & (F.col("s_m") == F.col("s_r"))
        ).alias("consistent"),
    )


# ---------------------------------------------------------------------------
# Per-partition Bloom-filter data skipping
# ---------------------------------------------------------------------------
# 252-bit blooms as four 63-bit BIGINT words (bit 63 never set, so every
# word stays non-negative on both engines); two salted-md5 hash
# functions per key; one bloom per ingest DAY (the file-ish grain —
# production sizes m by per-file ndv, the docstring covers the knob).
_BF_WORDS = 4
_BF_WBITS = 63
_BF_M = _BF_WORDS * _BF_WBITS  # 252
_BF_SALTS = ("bf1:", "bf2:")
_BF_PROBE_MOD = 97  # probe key set: custkeys ≡ 0 (mod 97)


def _bf_bit_sql(salt: str, key: str) -> str:
    h = f"md5('{salt}' || CAST({key} AS VARCHAR))"
    return (
        f"(((strpos('0123456789abcdef', {h}[1:1]) - 1) * 16"
        f" + strpos('0123456789abcdef', {h}[2:2]) - 1) % {_BF_M})"
    )


def _bf_bit_spark(salt: str, key: str) -> str:
    return (
        f"(conv(substring(md5(concat('{salt}', CAST({key} AS STRING))),"
        f" 1, 2), 16, 10) % {_BF_M})"
    )


def _bf_word_term(b: str, j: int, sql: bool) -> str:
    shift = (
        f"(CAST(1 AS BIGINT) << (({b}) % {_BF_WBITS}))"
        if sql
        else f"shiftleft(CAST(1 AS BIGINT), CAST(({b}) % {_BF_WBITS} AS INT))"
    )
    div = "//" if sql else "DIV"
    return (
        f"(CASE WHEN ({b}) {div} {_BF_WBITS} = {j} "
        f"THEN {shift} ELSE CAST(0 AS BIGINT) END)"
    )


def _bf_masks_sql() -> str:
    cols = []
    for j in range(_BF_WORDS):
        terms = " | ".join(
            _bf_word_term(_bf_bit_sql(s, "k"), j, sql=True) for s in _BF_SALTS
        )
        cols.append(f"bit_or({terms}) AS w{j}")
    return ",\n           ".join(cols)


def _bf_hit_sql(b: str) -> str:
    word = (
        f"(CASE ({b}) // {_BF_WBITS} WHEN 0 THEN w0 WHEN 1 THEN w1 "
        f"WHEN 2 THEN w2 ELSE w3 END)"
    )
    return f"((({word}) >> (({b}) % {_BF_WBITS})) & 1) = 1"


@query(
    "bloom_skip_audit_orders",
    oracle=f"""
WITH members AS (
    SELECT DISTINCT CAST(o_orderdate AS DATE) AS d, o_custkey AS k
    FROM orders
),
blooms AS (
    SELECT d,
           {_bf_masks_sql()}
    FROM members GROUP BY d
),
probes AS (
    SELECT c_custkey AS k FROM customer WHERE c_custkey % {_BF_PROBE_MOD} = 0
),
tested AS (
    SELECT b.d, p.k,
           ({_bf_hit_sql(_bf_bit_sql('bf1:', 'p.k'))})
           AND ({_bf_hit_sql(_bf_bit_sql('bf2:', 'p.k'))}) AS bloom_hit,
           m.k IS NOT NULL AS present
    FROM blooms b
    CROSS JOIN probes p
    LEFT JOIN members m ON m.d = b.d AND m.k = p.k
)
SELECT CAST(date_trunc('month', d) AS DATE) AS mon,
       CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(CASE WHEN present THEN 1 ELSE 0 END) AS BIGINT) AS n_present,
       CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN bloom_hit AND NOT present THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       CAST(SUM(CASE WHEN NOT bloom_hit THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS skip_frac,
       CASE WHEN COUNT(*) = SUM(CASE WHEN present THEN 1 ELSE 0 END)
            THEN 0.0
            ELSE CAST(SUM(CASE WHEN bloom_hit AND NOT present
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / (COUNT(*) - SUM(CASE WHEN present THEN 1 ELSE 0 END))
       END AS fp_rate
FROM tested GROUP BY 1
""",
)
def bloom_skip_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-FILTER DATA-SKIPPING AUDIT (the per-file bloom index
    Delta/Iceberg/Parquet ship for point-lookup pruning, built from
    scratch with deterministic hashes): one 252-bit bloom per ingest
    DAY — four 63-bit BIGINT words folded with bit_or (a commutative
    monoid: map-side combinable, mergeable across files) over each
    member custkey's two salted-md5 bit positions. A fixed probe-key
    set then measures what the engine would actually get, rolled up
    monthly: hit/skip decisions, measured false-positive rate among
    absent keys, and the skip fraction. NO false negatives is
    guaranteed by construction (every present key's bits are set); the
    published fp numbers quantify m=252, k=2 at the partition's actual
    cardinality — the sizing knob a real deployment turns (production
    sizes m per file by ndv; a saturated bloom shows up here as
    fp_rate -> 1, which the month-grain first draft of this query
    demonstrated). 100 TB shape: the mask build is one |members|-pass
    aggregate down to |days| x 4 longs; probing is |days| x |probe
    keys| — both bounded, never fact-grain."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    members = orders.select(
        F.to_date("o_orderdate").alias("d"),
        F.col("o_custkey").alias("k"),
    ).distinct()
    mask_cols = []
    for j in range(_BF_WORDS):
        terms = " | ".join(
            _bf_word_term(_bf_bit_spark(s, "k"), j, sql=False)
            for s in _BF_SALTS
        )
        mask_cols.append(F.bit_or(F.expr(terms)).alias(f"w{j}"))
    blooms = members.groupBy("d").agg(*mask_cols)

    probes = customer.filter(F.col("c_custkey") % _BF_PROBE_MOD == 0).select(
        F.col("c_custkey").alias("k")
    )

    def hit(salt: str):
        b = _bf_bit_spark(salt, "k")
        word = (
            f"(CASE ({b}) DIV {_BF_WBITS} WHEN 0 THEN w0 WHEN 1 THEN w1 "
            f"WHEN 2 THEN w2 ELSE w3 END)"
        )
        return F.expr(
            f"((({word}) >> CAST(({b}) % {_BF_WBITS} AS INT)) & 1) = 1"
        )

    tested = (
        blooms.crossJoin(F.broadcast(probes))
        .join(members.withColumn("present", F.lit(True)), ["d", "k"], "left")
        .select(
            "d",
            (hit(_BF_SALTS[0]) & hit(_BF_SALTS[1])).alias("bloom_hit"),
            F.coalesce("present", F.lit(False)).alias("present"),
        )
    )
    hits = F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).cast("long")
    pres = F.sum(F.when(F.col("present"), 1).otherwise(0)).cast("long")
    fp = F.sum(
        F.when(F.col("bloom_hit") & ~F.col("present"), 1).otherwise(0)
    ).cast("long")
    n = F.count(F.lit(1)).cast("long")
    return tested.groupBy(
        F.date_trunc("month", "d").cast("date").alias("mon")
    ).agg(
        n.alias("n_probes"),
        pres.alias("n_present"),
        hits.alias("n_hits"),
        fp.alias("n_false_pos"),
        (
            F.sum(F.when(~F.col("bloom_hit"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("skip_frac"),
        F.when(F.count(F.lit(1)) == pres, F.lit(0.0))
        .otherwise(fp.cast("double") / (n - pres))
        .alias("fp_rate"),
    )


_HVZ_FILE_ROWS = 256
_HVZ_GRID_BITS = 4  # 16x16 bucket grid
_HVZ_BOX = (5, 9, 6, 10)  # pinned box predicate: bx in [5,9], by in [6,10]


def _hvz_oracle() -> str:
    """DuckDB twin of hilbert_vs_zorder_prune_orders: the Hilbert walk
    unrolled into sequential CTE steps (identical formulas to
    ``maintenance.hilbert_key_pinned``), the Morton interleave as plain
    div/mod bit math, one row_number per layout, then the zone/skip
    aggregate."""
    n = 1 << _HVZ_GRID_BITS
    steps, prev, i, s = [], "h0", 0, n // 2
    while s > 0:
        steps.append(f"""h{i + 1} AS (
  SELECT o_orderkey, bx, by,
         d{i} + {s * s} * (3 * rx + ry - 2 * rx * ry) AS d{i + 1},
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {n - 1} - y{i} ELSE y{i} END)
              ELSE x{i} END AS x{i + 1},
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {n - 1} - x{i} ELSE x{i} END)
              ELSE y{i} END AS y{i + 1}
  FROM (SELECT *, (x{i} // {s}) % 2 AS rx, (y{i} // {s}) % 2 AS ry FROM {prev})
)""")
        prev = f"h{i + 1}"
        i += 1
        s //= 2
    morton = " + ".join(
        f"((bx // {2 ** j}) % 2) * {2 ** (2 * j)}"
        f" + ((by // {2 ** j}) % 2) * {2 ** (2 * j + 1)}"
        for j in range(_HVZ_GRID_BITS)
    )
    bxlo, bxhi, bylo, byhi = _HVZ_BOX
    skip = (
        f"xhi < {bxlo} OR xlo > {bxhi} OR yhi < {bylo} OR ylo > {byhi}"
    )
    return f"""
WITH bounds AS (
  SELECT MIN(o_custkey) AS clo, MAX(o_custkey) AS chi,
         MIN(CAST(o_orderdate AS DATE)) AS dlo,
         MAX(CAST(o_orderdate AS DATE)) AS dhi
  FROM orders
),
h0 AS (
  SELECT o_orderkey,
         CAST((o_custkey - clo) * {n} // (chi - clo + 1) AS BIGINT) AS bx,
         CAST((CAST(o_orderdate AS DATE) - dlo) * {n}
              // (dhi - dlo + 1) AS BIGINT) AS by,
         0 AS d0,
         CAST((o_custkey - clo) * {n} // (chi - clo + 1) AS BIGINT) AS x0,
         CAST((CAST(o_orderdate AS DATE) - dlo) * {n}
              // (dhi - dlo + 1) AS BIGINT) AS y0
  FROM orders, bounds
),
{','.join(steps)},
lay AS (
  SELECT 'hilbert' AS layout, CAST(d{i} AS BIGINT) AS cv, o_orderkey, bx, by
  FROM h{i}
  UNION ALL
  SELECT 'morton', CAST({morton} AS BIGINT), o_orderkey, bx, by FROM h0
  UNION ALL
  SELECT 'linear_cust', bx, o_orderkey, bx, by FROM h0
),
filed AS (
  SELECT layout, bx, by,
         (row_number() OVER (PARTITION BY layout ORDER BY cv, o_orderkey)
           - 1) // {_HVZ_FILE_ROWS} AS file_id
  FROM lay
),
zones AS (
  SELECT layout, file_id,
         MIN(bx) AS xlo, MAX(bx) AS xhi, MIN(by) AS ylo, MAX(by) AS yhi,
         COUNT(*) AS n_rows
  FROM filed GROUP BY layout, file_id
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN {skip} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_files_skipped,
       CAST(SUM(CASE WHEN {skip} THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS skip_frac,
       CAST(SUM(CASE WHEN {skip} THEN 0 ELSE n_rows END) AS BIGINT)
         AS rows_read
FROM zones GROUP BY layout
"""


@query("hilbert_vs_zorder_prune_orders", oracle=_hvz_oracle())
def hilbert_vs_zorder_prune_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HILBERT vs MORTON vs LINEAR clustering, judged by what actually
    matters at 100 TB — how many simulated files a 2D box predicate
    (customer band x date window) can SKIP on min/max zones. Rows are
    laid on each curve (``maintenance.hilbert_key_pinned`` — the
    unrolled xy2d walk, validated bijective and unit-step adjacent —
    vs the Morton interleave vs 1D customer order), chunked into
    256-row files by the deterministic bucketed global rank
    (operators/rank.py — never an unpartitioned window), zones are
    per-file min/max of both bucket axes. Hilbert's no-diagonal-jumps
    property shows up as tighter zones and a higher skip fraction than
    Morton; both 2D curves dominate the 1D layout, which can only
    prune one axis — the quantified case for curve-clustered layout
    maintenance (companion to ``zonemap_prune_layouts_orders`` and
    ``zorder_key_orders``). Equi-width bucket ids derive from a 1-row
    bounds broadcast, all integer arithmetic; the oracle replays the
    identical unrolled walk in SQL."""
    from stadvdb_olap_spark.operators.maintenance import (
        _interleave_bits,
        hilbert_key_pinned,
    )
    from stadvdb_olap_spark.operators.rank import global_row_number

    n = 1 << _HVZ_GRID_BITS
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_custkey").alias("clo"),
        F.max("o_custkey").alias("chi"),
        F.min(F.col("o_orderdate").cast("date")).alias("dlo"),
        F.max(F.col("o_orderdate").cast("date")).alias("dhi"),
    )
    b = orders.crossJoin(F.broadcast(bounds)).select(
        "o_orderkey",
        F.expr(
            f"CAST((o_custkey - clo) * {n} DIV (chi - clo + 1) AS BIGINT)"
        ).alias("bx"),
        F.expr(
            f"CAST(datediff(CAST(o_orderdate AS DATE), dlo) * {n}"
            " DIV (datediff(dhi, dlo) + 1) AS BIGINT)"
        ).alias("by"),
    )

    def layout_zones(cv, name: str) -> DataFrame:
        lay = b.select(
            "o_orderkey", "bx", "by", cv.cast("long").alias("cv")
        )
        ranked = global_row_number(
            lay, ["cv", "o_orderkey"], bucket=F.col("cv"), out="gr"
        )
        return (
            ranked.select(
                "bx",
                "by",
                F.expr(
                    f"CAST((gr - 1) DIV {_HVZ_FILE_ROWS} AS BIGINT)"
                ).alias("file_id"),
            )
            .groupBy("file_id")
            .agg(
                F.min("bx").alias("xlo"),
                F.max("bx").alias("xhi"),
                F.min("by").alias("ylo"),
                F.max("by").alias("yhi"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
            )
            .select(F.lit(name).alias("layout"), "*")
        )

    zones = (
        layout_zones(
            hilbert_key_pinned(F.col("bx"), F.col("by"), _HVZ_GRID_BITS),
            "hilbert",
        )
        .unionAll(
            layout_zones(
                _interleave_bits(
                    [F.col("bx"), F.col("by")], _HVZ_GRID_BITS
                ),
                "morton",
            )
        )
        .unionAll(layout_zones(F.col("bx"), "linear_cust"))
    )
    bxlo, bxhi, bylo, byhi = _HVZ_BOX
    skip = (
        (F.col("xhi") < bxlo)
        | (F.col("xlo") > bxhi)
        | (F.col("yhi") < bylo)
        | (F.col("ylo") > byhi)
    )
    return zones.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(F.when(skip, 1).otherwise(0)).cast("long").alias(
            "n_files_skipped"
        ),
        (
            F.sum(F.when(skip, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("skip_frac"),
        F.sum(F.when(skip, 0).otherwise(F.col("n_rows")))
        .cast("long")
        .alias("rows_read"),
    )
