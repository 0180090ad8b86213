"""Similarity-search catalog queries over ``embeddings``.

Exact brute-force top-k, blocked near-dup pairs, the (deterministically
seeded) LSH/IVF-fixed/binary-quant variants, and the exact-fold
Arrow/pandas batch tiers are all oracle-checked — every certified plan
reproduces the pinned IEEE summation order on both engines. Only the
k-means-fitted paths (ivf_topk, semdedup) remain rows-only (iterative
fit, no SQL twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stadvdb_olap_spark.functions.vectors import cosine_sql, l2_sq_sql
from stadvdb_olap_spark.operators.similarity import (
    brute_force_topk,
    cosine_topk_pandas,
    lsh_bucketed_topk,
    near_dup_pairs_blocked,
)
from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.sources.parquet import load_table, spread

_N_QUERIES = 5
_K = 10
_NEAR_DUP_T = 0.3


# Shared exact-cosine-top-k oracle: brute_force_topk and both
# exact-fold GEMM tiers replay the identical pinned IEEE fold, so one
# SQL twin certifies all three plans.
_BRUTE_TOPK_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < {_N_QUERIES}),
pairs AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           {cosine_sql('q.qv', 'e.embedding')} AS cosine
    FROM q CROSS JOIN embeddings e
    WHERE q.query_id <> e.vec_id
)
SELECT query_id, neighbor_id, cosine,
       CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
      FROM pairs)
WHERE rn <= {_K}
"""


@query("ann_cosine_topk", oracle=_BRUTE_TOPK_ORACLE)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-{k}: broadcast query set x all candidates, windowed
    top-k per query. The correctness baseline for ANN variants."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return brute_force_topk(queries, emb, k=_K)


@query(
    "embedding_near_dup_blocked",
    oracle=f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {cosine_sql('a.embedding', 'b.embedding')} AS cosine
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {cosine_sql('a.embedding', 'b.embedding')} >= {_NEAR_DUP_T}
""",
)
def embedding_near_dup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs blocked on the label column — the
    shuffle key is the block, never the n^2 pair space."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return near_dup_pairs_blocked(emb, "label", _NEAR_DUP_T)


def _lsh_sig_sql(vec: str, n_planes: int = 6, dim: int = 64, seed: int = 42) -> str:
    # DuckDB twin of operators/similarity.py:lsh_signature. The hyperplanes
    # are DETERMINISTIC (seeded generator, rounded to 6 decimals) and enter
    # the Spark plan as float literals, so the twin embeds the identical
    # literals; both sides left-fold the dot product in IEEE order, so the
    # sign (and hence the bucket id) is bit-identical.
    from stadvdb_olap_spark.operators.similarity import _hyperplanes

    terms = []
    for r, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        lit = "[" + ", ".join(repr(float(v)) for v in plane) + "]"
        d = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform({vec}, (x, i) -> CAST(x AS DOUBLE) * ({lit})[i])), "
            f"(p, q) -> p + q)"
        )
        terms.append(f"(CASE WHEN {d} > 0 THEN {2 ** r} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_LSH_TABLES = 8


def _lsh_multi_sigs_sql() -> str:
    # One (vec_id, t, sig) row per hash table — UNION ALL over the same
    # deterministic per-table plane literals the operator uses
    # (seed + 7919*t, matching lsh_bucketed_topk).
    parts = [
        f"SELECT vec_id, embedding, {t} AS t, "
        f"{_lsh_sig_sql('embedding', seed=42 + 7919 * t)} AS sig FROM embeddings"
        for t in range(_LSH_TABLES)
    ]
    return " UNION ALL ".join(parts)


@query(
    "ann_lsh_topk",
    oracle=f"""
WITH sigs AS ({_lsh_multi_sigs_sql()}),
q AS (SELECT vec_id AS query_id, embedding AS qv, t, sig
      FROM sigs WHERE vec_id < {_N_QUERIES}),
pairs AS (
    SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id,
           {cosine_sql('q.qv', 'c.embedding')} AS cosine
    FROM q JOIN sigs c USING (t, sig)
    WHERE q.query_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
      FROM pairs)
WHERE rn <= {_K}
""",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via MULTI-TABLE random-hyperplane LSH — the
    100 TB scale path: cosine runs only inside signature-collision
    buckets, and the shuffle key is (table, bucket), never the Q*N pair
    space. Eight independent 6-plane tables lift measured recall@10
    from ~5% (single table) to ~39% on the sf0.1 embeddings
    (tools/ann_recall_probe.py; numbers in SCALING.md — n_planes/
    n_tables is the precision/recall dial). The deterministic (seeded,
    literal) hyperplanes make even this approximate query
    hash-checkable: the DuckDB twin buckets with identical literals and
    deduplicates multi-table collisions the same way."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return lsh_bucketed_topk(
        queries, emb, k=_K, n_planes=6, n_tables=_LSH_TABLES
    )


def _lsh_probe_sigs_sql(n_planes: int = 6) -> str:
    # Query-side signature set for multi-probe: the base signature plus
    # every 1-bit flip (Hamming-1 buckets), mirroring the operator's
    # probe_flips fan-out exactly.
    base = (
        f"SELECT vec_id AS query_id, embedding AS qv, t, sig "
        f"FROM sigs WHERE vec_id < {_N_QUERIES}"
    )
    flips = [
        f"SELECT vec_id AS query_id, embedding AS qv, t, "
        f"xor(sig, {1 << r}) AS sig "
        f"FROM sigs WHERE vec_id < {_N_QUERIES}"
        for r in range(n_planes)
    ]
    return " UNION ALL ".join([base] + flips)


@query(
    "ann_lsh_multiprobe_topk",
    oracle=f"""
WITH sigs AS MATERIALIZED ({_lsh_multi_sigs_sql()}),
q AS ({_lsh_probe_sigs_sql(6)}),
pairs AS (
    SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id,
           {cosine_sql('q.qv', 'c.embedding')} AS cosine
    FROM q JOIN sigs c USING (t, sig)
    WHERE q.query_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
      FROM pairs)
WHERE rn <= {_K}
""",
)
def ann_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-{k} (Lv et al. 2007): per table, the query
    probes its own bucket AND every bucket at Hamming distance 1 from
    its signature — the vectors most likely to be near-misses are
    exactly those one hyperplane sign away. Only the query side fans
    out (candidate index unchanged, shuffle key still (table, bucket)),
    so recall rises steeply for a bounded ~(1+n_planes)x candidate
    cost; measured recall@10 vs the plain 8-table config is in
    SCALING.md. Deterministic pinned hyperplanes keep even the probed
    variant hash-certifiable — the oracle replays the flipped-signature
    fan-out bit-for-bit."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return lsh_bucketed_topk(
        queries,
        emb,
        k=_K,
        n_planes=6,
        n_tables=_LSH_TABLES,
        multiprobe=True,
    )


@query("ann_topk_pandas_gemm", oracle=_BRUTE_TOPK_ORACLE)
def ann_topk_pandas_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k through the Arrow-batched numpy path (mapInPandas),
    certified: ``exact_fold=True`` accumulates dim-sequentially —
    bit-identical to the JVM/DuckDB IEEE left-fold — while staying
    vectorized across the pair axis, so the SAME brute-force oracle that
    certifies the expression path hash-certifies this Python batch
    plumbing (broadcast queries, per-batch top-k, global merge). The
    raw-BLAS variant of the operator (``exact_fold=False``) stays the
    throughput path; a unit test pins its rank agreement."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk_pandas(queries, emb, k=_K, exact_fold=True)


@query("ann_topk_arrow_gemm", oracle=_BRUTE_TOPK_ORACLE)
def ann_topk_arrow_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow twin of the pandas batch path: the embedding list
    column reshapes straight from the Arrow value buffer into the
    accumulation operand — no pandas materialization. Certified via the
    same ``exact_fold=True`` device as ``ann_topk_pandas_gemm``."""
    from stadvdb_olap_spark.operators.similarity import cosine_topk_arrow

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk_arrow(queries, emb, k=_K, exact_fold=True)


@query("ann_ivf_topk", defer=True)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned approximate top-k (rows-only: k-means cells are
    approximate by construction). Candidates are probed only in the
    n_probe nearest cells — the inverted-file scale path; a unit test
    bounds recall against the exact brute force."""
    from stadvdb_olap_spark.operators.similarity import ivf_topk

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivf_topk(queries, emb, k=_K, n_centroids=16, n_probe=4)


@query(
    "hard_negatives_by_label",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
           FROM embeddings WHERE vec_id < {_N_QUERIES}),
pairs AS (
    SELECT q.query_id, e.vec_id AS neighbor_id, e.label AS neg_label,
           {cosine_sql('q.qv', 'e.embedding')} AS cosine
    FROM q CROSS JOIN embeddings e
    WHERE q.query_id <> e.vec_id AND q.qlabel <> e.label
)
SELECT query_id, neighbor_id, neg_label, cosine, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
      FROM pairs)
WHERE rn <= 5
""",
)
def hard_negatives_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING for contrastive training: per anchor, the 5
    most-similar embeddings carrying a DIFFERENT label — the negatives
    that actually teach the model. Same broadcast-anchor / windowed-top-k
    shape as the exact ANN baseline, with the label-mismatch predicate
    fused into the candidate filter (evaluated before any cosine math, so
    same-label rows cost nothing). Scale path: swap the crossJoin for the
    LSH-bucketed candidate generator unchanged — the label filter
    composes with either."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    from pyspark.sql import Window

    from stadvdb_olap_spark.functions.vectors import cosine

    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        F.col("label").alias("__qlabel"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__cv"),
        F.col("label").alias("neg_label"),
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(
            (F.col("query_id") != F.col("neighbor_id"))
            & (F.col("__qlabel") != F.col("neg_label"))
        )
        .select(
            "query_id",
            "neighbor_id",
            "neg_label",
            cosine("__qv", "__cv").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
    )


_BQ_PREFILTER = 50  # hamming candidates per query before exact rerank


def _bq_code_sql(vec: str, lo: int, n: int) -> str:
    # Sign-bit binary quantization, MSB-first fold acc*2 + bit over a
    # 32-dim slice (two INT codes per 64-dim vector keeps the fold out
    # of BIGINT sign-bit overflow under Spark ANSI).
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({vec}[{lo}:{lo + n - 1}], x -> CASE WHEN x > 0 "
        "THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)), "
        "(a, b) -> a * 2 + b)"
    )


@query(
    "ann_binary_quant_topk",
    oracle=f"""
WITH coded AS (
    SELECT vec_id, embedding,
           {_bq_code_sql('embedding', 1, 32)} AS code_hi,
           {_bq_code_sql('embedding', 33, 32)} AS code_lo
    FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS qv,
             code_hi AS qhi, code_lo AS qlo
      FROM coded WHERE vec_id < {_N_QUERIES}),
ham AS (
    SELECT q.query_id, q.qv, c.vec_id AS neighbor_id, c.embedding AS cv,
           bit_count(xor(q.qhi, c.code_hi))
               + bit_count(xor(q.qlo, c.code_lo)) AS hamming,
           row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY bit_count(xor(q.qhi, c.code_hi))
                        + bit_count(xor(q.qlo, c.code_lo)), c.vec_id) AS hrn
    FROM q JOIN coded c ON q.query_id <> c.vec_id
),
rerank AS (
    SELECT query_id, neighbor_id, hamming,
           {cosine_sql('qv', 'cv')} AS cosine,
           row_number() OVER (
               PARTITION BY query_id
               ORDER BY {cosine_sql('qv', 'cv')} DESC, neighbor_id) AS rn
    FROM ham WHERE hrn <= {_BQ_PREFILTER}
)
SELECT query_id, neighbor_id, CAST(hamming AS BIGINT) AS hamming,
       cosine, CAST(rn AS BIGINT) AS rank
FROM rerank WHERE rn <= {_K}
""",
)
def ann_binary_quant_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN (the modern vector-DB compression pipeline,
    e.g. the public sign-bit BQ every major vector store ships): each
    64-dim float vector compresses 256x into ONE BIGINT of sign bits;
    the coarse pass ranks candidates by Hamming distance (one XOR +
    popcount per pair — integer ops, exact, deterministic) and only the
    top {_BQ_PREFILTER} per query pay the exact-cosine rerank. At scale
    the coarse pass streams the corpus against broadcast query codes
    at a fraction of float-dot cost, and the rerank touches a constant
    candidate set per query. Every stage is hash-checkable: codes and
    Hamming are exact integers, ties break on ids, and the rerank uses
    the pinned-order cosine fold."""
    from stadvdb_olap_spark.operators.similarity import binary_quant_topk

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return binary_quant_topk(queries, emb, k=_K, prefilter=_BQ_PREFILTER)


@query("semdedup_embeddings", oracle=None, defer=True)
def semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): k-means
    clusters bound the pair search, then within each cluster every row
    whose cosine to a lower-id row reaches the threshold is dropped —
    the embedding-space dedup tier above exact/MinHash (wording-level)
    dedup. Rows-only by design (k-means has no SQL twin); the kept-set
    independence + dropped-row witness + determinism invariants are
    pinned by test_semdedup_kept_set_is_independent, and the keep policy
    itself is deterministic (lower-id witness, seeded sampled fit)."""
    from stadvdb_olap_spark.operators.similarity import semdedup

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return semdedup(emb, n_clusters=8, threshold=0.8)


_IVF_C = 8  # pinned centroid set: the embeddings with vec_id < 8
_IVF_PROBE = 2


def _argnear_sql(probe_limit: int, extra_where: str = "") -> str:
    """(vector, cell) rows: rank centroids per vector by squared
    euclidean distance (ties to smallest centroid id), keep the nearest
    ``probe_limit``. Shared by the IVF assignment (limit 1) and query
    probe (limit n_probe) sides of the oracle."""
    return f"""
    SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY {l2_sq_sql('e.embedding', 'c.cv')}, c.cid) AS rn
        FROM embeddings e CROSS JOIN c {extra_where}
    ) WHERE rn <= {probe_limit}
"""


@query(
    "ann_ivf_fixed_topk",
    oracle=f"""
WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
           WHERE vec_id < {_IVF_C}),
ca AS ({_argnear_sql(1)}),
qp AS ({_argnear_sql(_IVF_PROBE, f"WHERE e.vec_id < {_N_QUERIES}")}),
pairs AS (
    SELECT qp.vec_id AS query_id, ca.vec_id AS neighbor_id,
           {cosine_sql('qp.embedding', 'ca.embedding')} AS cosine
    FROM qp JOIN ca USING (cell)
    WHERE qp.vec_id <> ca.vec_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
      FROM pairs)
WHERE rn <= {_K}
""",
)
def ann_ivf_fixed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-{k} over a PINNED centroid set — the hash-certifiable
    face of ``ann_ivf_topk`` (whose k-means fit keeps it rows-only), by
    the same publish-the-learned-component device as
    ``semdedup_fixed_centroids``: candidates assign to their nearest
    centroid, queries probe their {p} nearest cells, exact cosine ranks
    within probed cells only. Fully distributed (windowed probe ranks,
    no driver collect); the oracle replays assignment, probing and
    ranking exactly."""
    from stadvdb_olap_spark.operators.similarity import ivf_fixed_topk

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    cents = emb.filter(F.col("vec_id") < _IVF_C).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivf_fixed_topk(queries, emb, cents, k=_K, n_probe=_IVF_PROBE)


_SEM_C = 8  # pinned centroid set: the embeddings with vec_id < 8
_SEM_T = 0.3  # drop threshold (matches the near-dup certification band)


@query(
    "semdedup_fixed_centroids",
    oracle=f"""
WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
           WHERE vec_id < {_SEM_C}),
scored AS (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {cosine_sql('e.embedding', 'c.cv')} DESC, c.cid) AS rn
    FROM embeddings e CROSS JOIN c
),
assigned AS (
    SELECT vec_id, embedding, cid AS cluster FROM scored WHERE rn = 1
),
dropped AS (
    SELECT DISTINCT a.vec_id
    FROM assigned a JOIN assigned b
      ON a.cluster = b.cluster AND b.vec_id < a.vec_id
    WHERE {cosine_sql('a.embedding', 'b.embedding')} >= {_SEM_T}
)
SELECT a.vec_id,
       CAST(a.cluster AS BIGINT) AS cluster,
       d.vec_id IS NULL AS keep
FROM assigned a LEFT JOIN dropped d USING (vec_id)
""",
)
def semdedup_fixed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with a PINNED centroid set — the hash-certifiable face of
    ``semdedup_embeddings``: rows assign to their max-cosine centroid
    (vec_id < {C}, ties to the smallest centroid id) and the standard
    within-cluster lower-id drop pass runs. Same device as ann_lsh_topk's
    pinned hyperplanes: fix the learned component, and the whole operator
    (assignment argmax + pair search + keep policy) replays exactly in
    SQL — the oracle doubles as proof the drop pass is engine-exact.
    Centroids broadcast (bounded by construction); the pair self-join is
    keyed on the cluster id, never the n^2 pair space."""
    from stadvdb_olap_spark.operators.similarity import semdedup_fixed

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    cents = emb.filter(F.col("vec_id") < _SEM_C).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    return semdedup_fixed(emb, cents, threshold=_SEM_T)
