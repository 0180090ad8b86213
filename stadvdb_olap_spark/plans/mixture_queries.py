"""Mixture-assembly catalog queries over ``documents``.

The post-curation stage of the training-data pipeline
(operators/mixture.py): eval decontamination, per-source mixture
weighting, token budgets, and the sharded training layout. All four are
deterministic (content-addressed hashes, no RNG), so every one is
DuckDB-oracle-checked — including the decontamination join and the
per-shard orderings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stadvdb_olap_spark.functions.text import word_shingles_sql
from stadvdb_olap_spark.operators import mixture as MX
from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.sources.parquet import load_spread

_SHINGLE_N = 5
_RATES = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25}
_DEFAULT_RATE = 0.1
_BUDGET = 2000
_N_SHARDS = 8

_SPLIT_SQL = """
CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
     WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
     ELSE 'test' END
"""


def _md5_salted_sql(salt: str) -> str:
    return f"md5('{salt}' || CAST(doc_id AS VARCHAR))"


@query(
    "decontaminate_train_docs",
    oracle=f"""
WITH sp AS (SELECT doc_id, text, source, {_SPLIT_SQL} AS split FROM documents),
tr AS (SELECT doc_id, text, source FROM sp WHERE split = 'train'),
hosh AS (
    SELECT DISTINCT unnest({word_shingles_sql('text', _SHINGLE_N)}) AS sh
    FROM sp WHERE split <> 'train'
),
trsh AS (
    SELECT doc_id, unnest(list_distinct({word_shingles_sql('text', _SHINGLE_N)})) AS sh
    FROM tr
),
bad AS (SELECT DISTINCT doc_id FROM trsh JOIN hosh USING (sh))
SELECT doc_id, source FROM tr
WHERE doc_id NOT IN (SELECT doc_id FROM bad)
""",
)
def decontaminate_train_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval decontamination: training documents sharing ANY word 5-gram
    with a val/test document are dropped, so benchmarks measure
    generalization rather than memorization. The join is keyed on the
    shingle hash (the held-out side is distinct benchmark shingles —
    small, broadcast); work scales with actual collisions, never
    |train| x |heldout|."""
    docs = load_spread(spark, sf_dir, "documents")
    with_split = docs.withColumn("split", MX.split_column("doc_id"))
    train = with_split.filter(F.col("split") == "train")
    heldout = with_split.filter(F.col("split") != "train")
    return MX.decontaminate(train, heldout, "doc_id", "text", _SHINGLE_N).select(
        "doc_id", "source"
    )


@query(
    "mixture_weighted_sample_docs",
    oracle=f"""
SELECT doc_id, source
FROM documents
WHERE substring({_md5_salted_sql('mix:')}, 1, 4) <
      CASE source
           WHEN 'src0' THEN 'g'
           WHEN 'src1' THEN 'c000'
           WHEN 'src2' THEN '8000'
           WHEN 'src3' THEN '4000'
           ELSE '1999' END
""",
)
def mixture_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture weighting: per-source deterministic Bernoulli rates
    (src0 100%, src1 75%, src2 50%, src3 25%, everything else 10%) — the
    data-recipe step that upsamples curated sources and downsamples
    crawl. Membership is a pure function of the salted key hash: narrow
    map + filter, no shuffle, reproducible across engines and runs."""
    docs = load_spread(spark, sf_dir, "documents")
    return MX.weighted_source_sample(docs, _RATES, _DEFAULT_RATE).select(
        "doc_id", "source"
    )


@query(
    "token_budget_per_source_docs",
    oracle=f"""
WITH t AS (
    SELECT doc_id, source,
           CAST(len(regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS BIGINT)
               AS n_tokens,
           {_md5_salted_sql('budget:')} AS h
    FROM documents
),
c AS (
    SELECT doc_id, source, n_tokens,
           CAST(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_tokens
    FROM t
)
SELECT doc_id, source, n_tokens, cum_tokens
FROM c WHERE cum_tokens <= {_BUDGET}
""",
)
def token_budget_per_source_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting: each source contributes at most {budget} tokens,
    taking documents in content-addressed hash order (a deterministic
    shuffle) until the budget fills. One exchange on the source key; the
    prefix scan inside a source is sequential BY DEFINITION of "first
    documents under the budget" — sources are the parallel unit."""
    docs = load_spread(spark, sf_dir, "documents")
    return MX.token_budget_take(docs, _BUDGET).select(
        "doc_id", "source", "n_tokens", "cum_tokens"
    )


@query(
    "training_shards_docs",
    oracle=f"""
WITH h AS (
    SELECT doc_id, {_md5_salted_sql('shard:')} AS h FROM documents
),
s AS (
    SELECT doc_id, h,
           CAST(((strpos('0123456789abcdef', h[1:1]) - 1) * 4096
               + (strpos('0123456789abcdef', h[2:2]) - 1) * 256
               + (strpos('0123456789abcdef', h[3:3]) - 1) * 16
               + (strpos('0123456789abcdef', h[4:4]) - 1)) AS BIGINT)
               % {_N_SHARDS} AS shard
    FROM h
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT)
           AS shard_pos
FROM s
""",
)
def training_shards_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded training layout: (shard, shard_pos) for every document —
    shard = salted-hash mod {n}, position = hash rank within the shard.
    Materialized as {n} independently-ordered files this gives trainers a
    deterministic global shuffle WITHOUT a global sort: the only exchange
    is on the shard id and each shard orders its own rows."""
    docs = load_spread(spark, sf_dir, "documents")
    return MX.training_shards(docs, _N_SHARDS).select("doc_id", "shard", "shard_pos")


_CTX_LEN = 512


@query(
    "pack_concat_offsets_docs",
    oracle=f"""
WITH t AS (
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS BIGINT)
               AS n_tokens,
           {_md5_salted_sql('pack:')} AS h
    FROM documents
),
s AS (
    SELECT doc_id, n_tokens, h,
           CAST(((strpos('0123456789abcdef', h[1:1]) - 1) * 4096
               + (strpos('0123456789abcdef', h[2:2]) - 1) * 256
               + (strpos('0123456789abcdef', h[3:3]) - 1) * 16
               + (strpos('0123456789abcdef', h[4:4]) - 1)) AS BIGINT)
               % {_N_SHARDS} AS shard
    FROM t
),
c AS (
    SELECT doc_id, shard, n_tokens,
           CAST(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum
    FROM s
)
SELECT doc_id, shard, n_tokens,
       cum - n_tokens AS start_off,
       (cum - n_tokens) // {_CTX_LEN} AS chunk_first,
       CASE WHEN n_tokens = 0 THEN 0
            ELSE (cum - 1) // {_CTX_LEN} - (cum - n_tokens) // {_CTX_LEN} + 1
       END AS n_chunks_spanned
FROM c
""",
)
def pack_concat_offsets_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing layout: documents concatenate per shard
    in salted-hash order and the token stream splits at every {ctx}
    boundary — zero padding, deterministic addressing of every training
    sequence as (shard, chunk). The certifiable sibling of the FFD bin
    packer (operators/packing.py:pack_sequences): the whole layout is a
    window cumsum + exact integer division, so it replays in SQL and
    costs one shard exchange at any scale."""
    from stadvdb_olap_spark.functions.text import token_count
    from stadvdb_olap_spark.operators.packing import concat_pack

    docs = load_spread(spark, sf_dir, "documents")
    items = docs.select("doc_id", token_count("text").alias("n_tokens"))
    return concat_pack(items, ctx_len=_CTX_LEN, n_shards=_N_SHARDS)


@query(
    "training_manifest_docs",
    oracle=f"""
WITH h AS (
    SELECT doc_id, text, {_md5_salted_sql('shard:')} AS h FROM documents
),
s AS (
    SELECT doc_id, text,
           CAST(((strpos('0123456789abcdef', h[1:1]) - 1) * 4096
               + (strpos('0123456789abcdef', h[2:2]) - 1) * 256
               + (strpos('0123456789abcdef', h[3:3]) - 1) * 16
               + (strpos('0123456789abcdef', h[4:4]) - 1)) AS BIGINT)
               % {_N_SHARDS} AS shard
    FROM h
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')))
            AS BIGINT) AS n_tokens,
       CAST(CAST(COALESCE(SUM(CAST(CAST('0x' ||
                substr(md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 12)
                AS BIGINT) AS DECIMAL(38,0))), 0) AS DECIMAL(38,0))
            AS VARCHAR)
           AS checksum
FROM s
GROUP BY shard
""",
)
def training_manifest_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DELIVERY MANIFEST for a sharded training corpus: per shard,
    the document count, total token budget, and an order-independent
    content checksum (the reconcile fingerprint over doc_id|text). A
    trainer — or the producer, independently — verifies a delivered
    shard by recomputing one aggregate; checksums are commutative sums,
    so the manifest rows also merge into a whole-corpus fingerprint.
    One narrow hash projection + one grouped pass; no sort, no join."""
    from stadvdb_olap_spark.functions.text import token_count
    from stadvdb_olap_spark.operators.mixture import salted_md5

    docs = load_spread(spark, sf_dir, "documents")
    h = salted_md5("doc_id", "shard:")
    shard = (
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % _N_SHARDS
    ).alias("shard")
    row_hash = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col("doc_id").cast("string"), F.col("text")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
        .cast("decimal(38,0)")
    )
    return (
        docs.select(shard, token_count("text").alias("n_tok"), row_hash.alias("rh"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            # Checksum publishes as its exact digit STRING — decimal
            # output columns are a driver-canon hazard (reconcile.py).
            F.coalesce(F.sum("rh"), F.lit(0))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("checksum"),
        )
    )


_N_EPOCHS = 3


def _epoch_shard_sql(salt: str) -> str:
    h = f"md5('{salt}' || CAST(doc_id AS VARCHAR))"
    return (
        f"CAST(((strpos('0123456789abcdef', {h}[1:1]) - 1) * 4096"
        f"    + (strpos('0123456789abcdef', {h}[2:2]) - 1) * 256"
        f"    + (strpos('0123456789abcdef', {h}[3:3]) - 1) * 16"
        f"    + (strpos('0123456789abcdef', {h}[4:4]) - 1)) AS BIGINT)"
        f" % {_N_SHARDS}"
    )


@query(
    "epoch_shuffle_layout_docs",
    oracle=" UNION ALL ".join(
        f"""
SELECT doc_id, {e} AS epoch,
       {_epoch_shard_sql(f'epoch{e}:')} AS shard,
       CAST(row_number() OVER (
           PARTITION BY {_epoch_shard_sql(f'epoch{e}:')}
           ORDER BY md5('epoch{e}:' || CAST(doc_id AS VARCHAR)), doc_id)
         AS BIGINT) AS shard_pos
FROM documents"""
        for e in range(_N_EPOCHS)
    ),
)
def epoch_shuffle_layout_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch training layout: an INDEPENDENT deterministic global
    shuffle per epoch — shard and within-shard order re-derive from an
    epoch-salted content hash, so every epoch's read order is different,
    reproducible, and derivable by any worker without coordination (the
    property that makes multi-epoch training restartable mid-epoch).
    One exchange per epoch on the shard id; epochs are embarrassingly
    parallel and typically materialized lazily one epoch ahead."""
    from stadvdb_olap_spark.operators.mixture import training_shards

    docs = load_spread(spark, sf_dir, "documents")
    parts = [
        training_shards(docs, _N_SHARDS, salt=f"epoch{e}:")
        .select(
            "doc_id",
            F.lit(e).cast("long").alias("epoch"),
            "shard",
            "shard_pos",
        )
        for e in range(_N_EPOCHS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Temperature-based mixture sampling (tau = 0.5)
# ---------------------------------------------------------------------------


def _key_uniform_doc_sql() -> str:
    from stadvdb_olap_spark.plans.scale_queries import _key_uniform_sql

    return _key_uniform_sql("'temp:' || CAST(doc_id AS VARCHAR)")


@query(
    "temperature_mixture_docs",
    oracle="""
WITH c AS MATERIALIZED (
    SELECT source, CAST(COUNT(*) AS DOUBLE) AS n_s
    FROM documents GROUP BY source
),
m AS (SELECT MIN(n_s) AS n_min FROM c),
r AS (SELECT source, sqrt(n_min / n_s) AS keep_rate FROM c CROSS JOIN m)
SELECT d.doc_id, d.source, r.keep_rate,
       {_KEY_UNIFORM_DOC_SQL} <= r.keep_rate AS kept
FROM documents d JOIN r USING (source)
""".format(_KEY_UNIFORM_DOC_SQL=_key_uniform_doc_sql()),
)
def temperature_mixture_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture sampling, tau = 0.5 (the standard
    low-resource rebalancing of multilingual/multi-source LLM recipes:
    sample sources proportional to n^tau instead of n): each source
    keeps documents at rate sqrt(n_min / n_s), so the rarest source
    keeps everything and head sources downsample toward the tempered
    distribution. tau = 1/2 is chosen deliberately — the weight
    transform is then a single sqrt, which IEEE requires to be
    correctly rounded, so unlike pow(n, 0.7) the rates (and every keep
    decision) are bit-identical across engines and hash-certifiable.
    Plan shape: one tiny per-source aggregate broadcast back over the
    corpus + a content-addressed uniform per doc — no corpus shuffle."""
    from stadvdb_olap_spark.plans.scale_queries import _key_uniform

    docs = load_spread(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n_s")
    )
    nmin = counts.agg(F.min("n_s").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        "source", F.sqrt(F.col("n_min") / F.col("n_s")).alias("keep_rate")
    )
    u = _key_uniform(F.concat(F.lit("temp:"), F.col("doc_id").cast("string")))
    return docs.join(F.broadcast(rates), "source").select(
        "doc_id",
        "source",
        "keep_rate",
        (u <= F.col("keep_rate")).alias("kept"),
    )


# ---------------------------------------------------------------------------
# Rendezvous (HRW) sharding
# ---------------------------------------------------------------------------

_HRW_SHARDS = 8
_HRW_VALUES = ", ".join(f"({s})" for s in range(_HRW_SHARDS))


@query(
    "rendezvous_shard_docs",
    oracle=f"""
WITH sh AS (SELECT CAST(s AS BIGINT) AS s
            FROM (VALUES {_HRW_VALUES}) AS v(s)),
hh AS (
    SELECT d.doc_id, sh.s,
           md5('hrw' || CAST(sh.s AS VARCHAR) || ':'
               || CAST(d.doc_id AS VARCHAR)) AS h
    FROM documents d CROSS JOIN sh
)
SELECT doc_id, s AS shard
FROM (SELECT doc_id, s,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY h DESC, s) AS rn
      FROM hh)
WHERE rn = 1
""",
)
def rendezvous_shard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding of the corpus: each
    doc lands on the shard whose salted hash of its key is largest.
    The growable-layout device mod-hash can't offer: adding a shard
    moves ONLY the ~1/(n+1) of keys the new shard wins, each moving TO
    the new shard — an exact property pinned by test, not a
    probabilistic claim — so an 8->9 reshard of a 100 TB corpus
    rewrites one new shard file instead of all nine. Spark side is a
    pure narrow greatest() over n hashes (no shuffle, no explode); the
    oracle replays it as an unnested argmax window."""
    from stadvdb_olap_spark.operators.mixture import rendezvous_shard

    docs = load_spread(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", rendezvous_shard("doc_id", _HRW_SHARDS).alias("shard")
    )


@query(
    "contamination_score_docs",
    oracle=f"""
WITH sp AS (SELECT doc_id, text, {_SPLIT_SQL} AS split FROM documents),
hosh AS MATERIALIZED (
    SELECT DISTINCT unnest({word_shingles_sql('text', _SHINGLE_N)}) AS sh
    FROM sp WHERE split <> 'train'
),
trsh AS (
    SELECT doc_id,
           unnest(list_distinct({word_shingles_sql('text', _SHINGLE_N)})) AS sh
    FROM sp WHERE split = 'train'
),
scored AS (
    SELECT t.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN h.sh IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated
    FROM trsh t LEFT JOIN hosh h USING (sh)
    GROUP BY t.doc_id
)
SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles, n_contaminated,
       CASE WHEN n_shingles = 0 THEN 0.0
            ELSE CAST(n_contaminated AS DOUBLE) / n_shingles END
           AS contamination_frac
FROM scored
""",
)
def contamination_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRADED eval contamination (the thresholdable uplift over
    decontaminate_train_docs' drop-on-any-hit): per training document,
    the fraction of its distinct word 5-grams that also occur in the
    held-out split — 0.0 is clean, a full benchmark copy scores 1.0,
    and a pipeline can now set a tolerance (e.g. drop > 0.05) instead
    of losing every doc that shares one idiom with one eval question.
    Same join shape as the binary pass: distinct held-out shingles
    (small, broadcast) left-joined to per-doc distinct train shingles,
    one per-doc aggregate. The shingle unit, split assignment and
    tokenizer are the certified devices shared with the binary query.
    The body is the SHARED ``mixture.contamination_scores`` — the same
    definition the curation pipeline's decontaminate stage runs, so the
    app-embedded scores can never drift from this certified one."""
    docs = load_spread(spark, sf_dir, "documents")
    with_split = docs.withColumn("split", MX.split_column("doc_id"))
    return MX.contamination_scores(
        with_split.filter(F.col("split") == "train"),
        with_split.filter(F.col("split") != "train"),
        "doc_id",
        "text",
        _SHINGLE_N,
    )


# DSIR-style hashed-n-gram importance weights (Xie et al. 2023, public
# recipe): target/raw log-probability ratios per hash bucket, fitted
# OFFLINE and pinned as literals (the published-weights device). The
# certified surface is the scoring + selection pass — exactly how
# production runs it (fit rarely, score every document).
_DSIR_BUCKETS = 16
_DSIR_W = (
    0.2231, -0.1054, 0.0953, -0.3567, 0.1823, 0.0488, -0.2231, 0.3365,
    -0.0513, 0.1398, -0.1625, 0.0198, 0.2624, -0.0943, 0.1133, -0.2877,
)
_DSIR_TAU = 0.0  # keep iff the summed log ratio favors the target


@query(
    "dsir_importance_weights_docs",
    oracle=f"""
WITH sh AS (
    SELECT doc_id, {word_shingles_sql('text', 2)} AS s FROM documents
)
SELECT doc_id,
       CAST(len(s) AS BIGINT) AS n_shingles,
       list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(s, x ->
                   (CAST({list(_DSIR_W)!r} AS DOUBLE[]))[
                       strpos('0123456789abcdef', substring(md5(x), 1, 1))])),
           (a, b) -> a + b) AS dsir_logweight,
       list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(s, x ->
                   (CAST({list(_DSIR_W)!r} AS DOUBLE[]))[
                       strpos('0123456789abcdef', substring(md5(x), 1, 1))])),
           (a, b) -> a + b) >= {_DSIR_TAU!r} AS selected
FROM sh
""",
)
def dsir_importance_weights_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (hashed n-gram importance resampling,
    the public Xie et al. 2023 recipe): each word bigram hashes to one
    of {b} buckets (first md5 nibble) carrying a PINNED
    target-vs-raw log-probability-ratio weight; the document's
    importance log-weight is the sum over its shingles, and selection
    keeps documents whose weight favors the target distribution. The
    fold runs in ARRAY ORDER on both engines (same addition sequence —
    hash-exact without sorting), the bucket weights are literals in
    both plans, and md5 is byte-identical. 100 TB shape: one narrow
    per-row pass (shingle → nibble → literal-array lookup → fold), no
    shuffle, no join — the cheapest possible 'which 20% of the crawl
    looks like Wikipedia' screen."""
    from stadvdb_olap_spark.functions.text import word_shingles

    docs = load_spread(spark, sf_dir, "documents")
    w_arr = F.array(*[F.lit(w) for w in _DSIR_W])
    sh = word_shingles("text", 2)
    score = F.aggregate(
        sh,
        F.lit(0.0),
        lambda acc, x: acc
        + F.element_at(
            w_arr, (F.conv(F.substring(F.md5(x), 1, 1), 16, 10).cast("int") + 1)
        ),
    )
    return docs.select(
        "doc_id",
        F.size(sh).cast("long").alias("n_shingles"),
        score.alias("dsir_logweight"),
        (score >= F.lit(_DSIR_TAU)).alias("selected"),
    )


@query(
    "decontaminate_bloom_gated_docs",
    oracle=f"""
WITH sp AS (SELECT doc_id, text, source, {_SPLIT_SQL} AS split FROM documents),
tr AS (SELECT doc_id, text, source FROM sp WHERE split = 'train'),
hosh AS (
    SELECT DISTINCT unnest({word_shingles_sql('text', _SHINGLE_N)}) AS sh
    FROM sp WHERE split <> 'train'
),
trsh AS (
    SELECT doc_id, unnest(list_distinct({word_shingles_sql('text', _SHINGLE_N)})) AS sh
    FROM tr
),
bad AS (SELECT DISTINCT doc_id FROM trsh JOIN hosh USING (sh))
SELECT doc_id, source FROM tr
WHERE doc_id NOT IN (SELECT doc_id FROM bad)
""",
)
def decontaminate_bloom_gated_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Eval decontamination behind a BLOOM RUNTIME PREFILTER
    (``mixture.decontaminate_bloom_gated``): a 2 KB bloom mask of the
    held-out shingles drops non-colliding train shingles BEFORE the
    exact join — the scale path for a held-out set too big to
    broadcast, where the exact join would otherwise shuffle every
    train shingle. THE ORACLE IS THE EXACT PATH (the same SQL as
    ``decontaminate_train_docs``): hash-equality certifies the bloom's
    no-false-negative guarantee end-to-end, not just an estimate —
    false positives only cost verify work on surviving shingles. Same
    pattern as Spark's own runtime bloom join pruning, expressed at
    the operator level."""
    docs = load_spread(spark, sf_dir, "documents")
    with_split = docs.withColumn("split", MX.split_column("doc_id"))
    train = with_split.filter(F.col("split") == "train")
    heldout = with_split.filter(F.col("split") != "train")
    return MX.decontaminate_bloom_gated(
        train, heldout, "doc_id", "text", _SHINGLE_N
    ).select("doc_id", "source")
