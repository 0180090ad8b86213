"""Similarity search over embedding columns.

Three tiers, trading exactness for scale:

1. ``brute_force_topk`` — exact: broadcast the (small) query set against
   every candidate row, cosine per pair, windowed top-k. O(Q*N) but
   embarrassingly parallel and shuffle-free until the final per-query
   top-k (which TakeOrdered handles without a global sort). The baseline
   and the oracle-checked path.
2. ``lsh_bucketed_topk`` — approximate: random-hyperplane LSH signature
   (sign bits of dot products with R fixed planes) buckets both sides;
   cosine is computed only inside matching buckets. At 100 TB this is the
   scale path: the shuffle key is the bucket signature, so comparisons
   track collision counts, not Q*N. Recall is tunable via number of
   planes / multi-probe tables.
3. ``cosine_topk_pandas`` — the same exact math as (1) but executed as an
   Arrow-batched numpy matmul per partition (mapInPandas): one BLAS GEMM
   per batch instead of per-row expression trees. Wins when vectors are
   wide; results are identical up to float-sum order (so it is NOT the
   oracle path).
   ``cosine_topk_arrow`` is its mapInArrow twin: identical math, but the
   embedding column is reshaped straight from the Arrow list buffer into
   the GEMM operand — no pandas materialization, no per-row object
   conversion. The lowest-overhead Python decode path Spark offers.
"""

from __future__ import annotations

import re as _re
from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stadvdb_olap_spark.functions.vectors import cosine, dot, l2_norm, l2_sq

_IDENT_RE = _re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")

#: Hard ceiling on how many query rows the pandas/IVF paths will pull onto
#: the driver. ANN query sets are small by contract (the corpus is the big
#: side); this guard turns a miscalled operator — a corpus passed as the
#: query side — into an immediate error instead of a driver OOM.
DEFAULT_MAX_QUERIES = 10_000


def _collect_query_rows(queries: DataFrame, cols: list[str], max_queries: int):
    """Collect the query side with an explicit cap: fetches at most
    ``max_queries + 1`` rows (never the full frame) and raises if the cap
    is exceeded."""
    rows = queries.select(*cols).limit(max_queries + 1).collect()
    if len(rows) > max_queries:
        raise ValueError(
            f"query side exceeds max_queries={max_queries} rows; the "
            "driver-side ANN paths require a small query set — swap the "
            "sides, raise max_queries explicitly, or use the fully "
            "distributed lsh_bucketed_topk/brute_force_topk instead"
        )
    return rows


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for every query row, the k most similar
    candidate rows (self-matches excluded). Query side is broadcast."""
    # Materialize each side's norm ONCE per row instead of re-folding it
    # per pair: cosine = dot/(||q||*||c||) is 3 array aggregates; with
    # the norms precomputed the O(Q*N) pair stage pays 1. Bit-identical —
    # sqrt(dot(v,v)) is the same IEEE value wherever it is evaluated.
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("__qn", l2_norm("__qv"))
    c = candidates.select(
        F.col(cand_id).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).withColumn("__cn", l2_norm("__cv"))
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot("__qv", "__cv") / (F.col("__qn") * F.col("__cn"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_signature_expr_sql(vec_expr: str, planes: list[list[float]]) -> str:
    """Spark-SQL text of :func:`lsh_signature` — the identical tree in one
    parse. The hyperplane literals alone are n_planes x dim Column ops on
    the py4j path (~1 ms each of driver wall per QUERY BUILD; the 8-table
    multiprobe plan embeds 3072 of them), so the string form cuts seconds
    off every LSH plan construction."""
    dim = len(planes[0])
    guard = (
        f"CAST(CASE WHEN size({vec_expr}) != {dim} THEN "
        f"raise_error(concat('lsh_signature: vector length (', "
        f"CAST(size({vec_expr}) AS STRING), ') != plane dim ({dim})')) "
        f"ELSE 0 END AS BIGINT)"
    )
    terms = [guard]
    for r, plane in enumerate(planes):
        lit = "array(" + ", ".join(f"{float(v)!r}D" for v in plane) + ")"
        d = (
            f"aggregate(zip_with({vec_expr}, {lit}, "
            f"(x, y) -> CAST(x AS DOUBLE) * y), "
            f"0.0D, (acc, x) -> acc + x)"
        )
        terms.append(f"CAST(CASE WHEN {d} > 0 THEN {2 ** r} ELSE 0 END AS BIGINT)")
    return "(" + " + ".join(terms) + ")"


def lsh_signature(vec_col, planes: list[list[float]]):
    """Bit-signature column: bit r = 1 iff dot(vec, plane_r) > 0.

    FAILS LOUDLY on a vector whose length differs from the plane
    dimension: ``zip_with`` would null-pad the shorter side, every dot
    product would go NULL, and EVERY row would land in bucket 0 — a
    silent O(Q*N) single-bucket skew cliff instead of an error.

    Plain column names take the one-parse ``F.expr`` path (identical
    tree; see :func:`lsh_signature_expr_sql`)."""
    if isinstance(vec_col, str) and _IDENT_RE.match(vec_col):
        return F.expr(lsh_signature_expr_sql(f"`{vec_col}`", planes))
    dim_guard = F.raise_error(
        F.concat(
            F.lit("lsh_signature: vector length ("),
            F.size(vec_col).cast("string"),
            F.lit(f") != plane dim ({len(planes[0])})"),
        )
    )
    sig = F.when(
        F.size(vec_col) != F.lit(len(planes[0])), dim_guard
    ).otherwise(F.lit(0)).cast("long")
    for r, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(float(v)) for v in plane])
        d = F.aggregate(
            F.zip_with(vec_col, plane_arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(d > 0, F.lit(2**r)).otherwise(F.lit(0)).cast("long")
    return sig


def lsh_bucketed_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    n_tables: int = 1,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: compare only pairs whose random-hyperplane
    signatures collide in at least one of ``n_tables`` independent hash
    tables. The join key is (table, signature) — at scale the shuffle is
    on ``n_tables * 2^n_planes`` buckets, never Q*N pairs.

    Multi-table is THE recall lever for hyperplane LSH: one 6-plane
    table recalls only neighbors agreeing on all 6 bits (measured ~5%
    recall@10 on the sf0.1 embeddings — tools/ann_recall_probe.py);
    eight independent tables union their buckets and lift recall to the
    ~60% band at ~8x candidate cost, still a vanishing fraction of the
    corpus. Tune (n_planes, n_tables) together: planes shrink buckets
    (precision), tables multiply chances (recall). Candidate pairs
    found by several tables are deduplicated BEFORE ranking, so the
    result multiset is table-count-independent.

    ``multiprobe=True`` additionally probes, PER TABLE, every bucket at
    Hamming distance 1 from the query's signature (the classic
    multi-probe LSH recall lever, Lv et al. 2007): only the QUERY side
    emits the ``n_planes`` flipped signatures, so the candidate index is
    unchanged and the extra cost is a bounded fan-out of the (tiny)
    query side — candidates examined grow ~(1 + n_planes)x while recall
    rises steeply (the nearest misses are exactly the vectors one
    hyperplane sign away). Measured numbers in SCALING.md."""
    tables = [
        _hyperplanes(dim, n_planes, seed + 7919 * t) for t in range(n_tables)
    ]

    def with_sigs(df, id_alias, id_src, vec_alias, probe_flips=False):
        entries = []
        for t in range(n_tables):
            s = lsh_signature(vec_col, tables[t])
            entries.append(
                F.struct(F.lit(t).cast("int").alias("t"), s.alias("s"))
            )
            if probe_flips:
                entries.extend(
                    F.struct(
                        F.lit(t).cast("int").alias("t"),
                        s.bitwiseXOR(F.lit(1 << r)).alias("s"),
                    )
                    for r in range(n_planes)
                )
        return df.select(
            F.col(id_src).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
            F.explode(F.array(*entries)).alias("__ts"),
        )

    q = with_sigs(queries, "query_id", query_id, "__qv", probe_flips=multiprobe)
    c = with_sigs(candidates, "neighbor_id", cand_id, "__cv")
    pairs = (
        q.join(c, "__ts")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", cosine("__qv", "__cv").alias("cosine")
        )
        .distinct()  # a pair colliding in several tables scores once
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _fold_cosines(q_mat: np.ndarray, c_mat: np.ndarray) -> np.ndarray:
    """(Q, B) cosine matrix replicating the JVM expression path
    (functions/vectors.py:cosine) BIT-FOR-BIT: every dot product folds
    left-to-right over the dim axis — one correctly rounded multiply +
    add per step, exactly the ``F.aggregate``/`list_reduce`` order —
    while staying vectorized across the pair axes (64 AXPY passes
    instead of one BLAS call; BLAS blocks/FMAs in an unspecified order,
    which is the entire float divergence of the plain GEMM path)."""
    dots = np.zeros((q_mat.shape[0], c_mat.shape[0]))
    for d in range(q_mat.shape[1]):
        dots += q_mat[:, d : d + 1] * c_mat[None, :, d]

    def norms(m: np.ndarray) -> np.ndarray:
        acc = np.zeros(m.shape[0])
        for d in range(m.shape[1]):
            acc += m[:, d] * m[:, d]
        return np.sqrt(acc)

    return dots / (norms(q_mat)[:, None] * norms(c_mat)[None, :])


def _batch_topk(
    ids: np.ndarray,
    c_ids: np.ndarray,
    sims: np.ndarray,
    k: int,
    exact_fold: bool,
) -> dict[str, np.ndarray]:
    """Per-batch top-(k+1) selection (k + a possible self-match). The
    exact path sorts by (-cosine, neighbor_id) so a tie at the cut keeps
    the id the global window rank prefers; the GEMM path keeps the
    cheaper argpartition (its float sums aren't certified anyway)."""
    top = min(k + 1, sims.shape[1])
    if exact_fold:
        idx = np.stack(
            [np.lexsort((c_ids, -sims[qi]))[:top] for qi in range(len(ids))]
        )
    else:
        idx = np.argpartition(-sims, top - 1, axis=1)[:, :top]
    return {
        "query_id": np.repeat(ids, top),
        "neighbor_id": c_ids[idx].ravel(),
        "cosine": np.take_along_axis(sims, idx, axis=1).ravel(),
    }


def cosine_topk_pandas(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = DEFAULT_MAX_QUERIES,
    exact_fold: bool = False,
) -> DataFrame:
    """Exact top-k via Arrow-batched numpy GEMM (mapInPandas): queries are
    collected once (capped at ``max_queries`` — raises above), normalized,
    and matmul'd against each candidate Arrow batch; per-batch top-k then a
    final global top-k merge. ~10-100x the per-row expression path on wide
    vectors.

    ``exact_fold=True`` swaps the BLAS matmul for a dim-sequential
    accumulation that reproduces the JVM/DuckDB IEEE left-fold
    bit-for-bit (still Arrow-batched, still vectorized across pairs) —
    the hash-certifiable face of this path."""
    import pandas as pd

    q_rows = _collect_query_rows(queries, [query_id, vec_col], max_queries)
    if not q_rows:  # empty query frame -> empty result, not an AxisError
        spark = queries.sparkSession
        qt = queries.schema[query_id].dataType.simpleString()
        ct = candidates.schema[cand_id].dataType.simpleString()
        return spark.createDataFrame(
            [], f"query_id {qt}, neighbor_id {ct}, cosine double, rank long"
        )
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    if not exact_fold:
        q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)

    spark = queries.sparkSession
    bq_ids = spark.sparkContext.broadcast(q_ids)
    bq_mat = spark.sparkContext.broadcast(q_mat)

    def topk_batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        ids, mat = bq_ids.value, bq_mat.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            c_ids = pdf[cand_id].to_numpy()
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if exact_fold:
                sims = _fold_cosines(mat, c_mat)
            else:
                c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
                sims = mat @ c_mat.T  # (Q, B)
            yield pd.DataFrame(_batch_topk(ids, c_ids, sims, k, exact_fold))

    partial = candidates.select(cand_id, vec_col).mapInPandas(
        topk_batches, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        partial.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_arrow(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = DEFAULT_MAX_QUERIES,
    exact_fold: bool = False,
) -> DataFrame:
    """Exact top-k via mapInArrow: same GEMM as ``cosine_topk_pandas``
    but each candidate RecordBatch's list column reshapes zero-copy-ish
    from the Arrow value buffer into the (B, dim) operand — no pandas
    frame, no per-row Python objects anywhere on the decode path.
    ``exact_fold=True`` as in :func:`cosine_topk_pandas`."""
    import pyarrow as pa

    q_rows = _collect_query_rows(queries, [query_id, vec_col], max_queries)
    if not q_rows:  # empty query frame -> empty result, not an AxisError
        spark = queries.sparkSession
        qt = queries.schema[query_id].dataType.simpleString()
        ct = candidates.schema[cand_id].dataType.simpleString()
        return spark.createDataFrame(
            [], f"query_id {qt}, neighbor_id {ct}, cosine double, rank long"
        )
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    if not exact_fold:
        q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)

    spark = queries.sparkSession
    bq_ids = spark.sparkContext.broadcast(q_ids)
    bq_mat = spark.sparkContext.broadcast(q_mat)

    def topk_batches(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        ids, mat = bq_ids.value, bq_mat.value
        for batch in it:
            if batch.num_rows == 0:
                continue
            c_ids = batch.column(0).to_numpy()
            emb = batch.column(1)
            # flatten() honors the array's offset; fixed-dim embeddings
            # reshape the contiguous value buffer directly.
            c_mat = (
                emb.flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(len(c_ids), -1)
            )
            if exact_fold:
                sims = _fold_cosines(mat, c_mat)
            else:
                c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
                sims = mat @ c_mat.T  # (Q, B)
            yield pa.RecordBatch.from_pydict(
                _batch_topk(ids, c_ids, sims, k, exact_fold)
            )

    partial = candidates.select(cand_id, vec_col).mapInArrow(
        topk_batches, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        partial.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = DEFAULT_MAX_QUERIES,
    train_sample: int = 10_000,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means-partition the
    candidate space once, then probe only the ``n_probe`` nearest cells per
    query.

    The 100 TB shape: centroid training touches a BOUNDED deterministic
    sample (the ``train_sample`` hash-smallest candidates by xxhash64 of
    their id — a TakeOrderedAndProject per-partition top-k, one narrow
    pass, never a full-corpus fit), cell assignment is a narrow map
    (model.transform) over the FULL corpus, and the search joins the
    (small) query×probe-cell list against candidates ON THE CELL ID — a
    hash join whose probe side is |cells probed| / n_centroids of the
    corpus, never a full scan. Recall is tuned by ``n_probe``
    (== n_centroids degrades to exact brute force over all cells).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    cand = candidates.select(
        F.col(cand_id).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).withColumn(
        "__fv", array_to_vector(F.transform(F.col("__cv"), lambda x: x.cast("double")))
    )

    # Content-addressed sample: hash-order is stable across runs/partitions,
    # and limit() compiles to TakeOrderedAndProject (no global sort shuffle).
    train = (
        cand.select(
            "__fv",
            F.xxhash64(F.col("neighbor_id").cast("string")).alias("__h"),
        )
        .orderBy("__h")
        .limit(train_sample)
    )
    model = KMeans(k=n_centroids, seed=seed, featuresCol="__fv").fit(train)
    assigned = model.transform(cand).select(
        "neighbor_id", "__cv", F.col("prediction").alias("__cell")
    )

    # Queries are small by contract — enforced by the max_queries guard:
    # pick probe cells driver-side with the (tiny) centroid matrix, then
    # rejoin distributively.
    centers = np.array(model.clusterCenters())
    q_rows = _collect_query_rows(queries, [query_id, vec_col], max_queries)
    probe_rows = []
    for r in q_rows:
        qv = np.asarray(r[1], dtype=np.float64)
        d = np.linalg.norm(centers - qv, axis=1)
        for cell in np.argsort(d)[:n_probe]:
            probe_rows.append((int(r[0]), qv.tolist(), int(cell)))
    spark = queries.sparkSession
    probes = spark.createDataFrame(
        probe_rows, "query_id long, __qv array<double>, __cell int"
    )

    pairs = (
        F.broadcast(probes)
        .join(assigned, "__cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine("__qv", "__cv").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def near_dup_pairs_blocked(
    df: DataFrame,
    block_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs within blocking-key groups: the join
    shuffles on the block key so only same-block pairs are compared (the
    embedding analogue of LSH banding; at scale the block key would be an
    LSH signature)."""
    a = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
    )
    b = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine("__va", "__vb").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def binary_quant_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    prefilter: int = 50,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-quantized top-k: sign-bit codes (two INT32 halves per
    64-dim vector — 256x compression), Hamming-distance coarse ranking
    (XOR + popcount, exact integers), exact-cosine rerank of the top
    ``prefilter`` candidates per query. The coarse pass streams the
    corpus against broadcast query codes at a fraction of float-dot
    cost; recall is set by ``prefilter`` (the rerank depth). Fully
    deterministic: integer coarse metric with id tiebreaks + the
    pinned-order cosine fold."""

    def half_code(lo: int):
        bits = F.transform(
            F.slice(F.col(vec_col), lo, 32),
            lambda x: F.when(x > 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        return F.aggregate(
            bits, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b
        )

    def coded(df, id_src, id_alias, vec_alias, hi, lo):
        return df.select(
            F.col(id_src).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
            half_code(1).alias(hi),
            half_code(33).alias(lo),
        )

    q = coded(queries, query_id, "query_id", "qv", "qhi", "qlo")
    c = coded(candidates, cand_id, "neighbor_id", "cv", "code_hi", "code_lo")
    # The coarse pass runs over SLIM rows (ids + 2 code words): the
    # Hamming prefilter window would otherwise shuffle Q x N rows each
    # carrying BOTH full embedding vectors — defeating the compressed
    # pass's point. Vectors re-attach to the <= Q*prefilter survivors
    # only: the survivor side is bounded by construction, so it
    # broadcasts and the candidate table is probed in place.
    ham = (
        F.broadcast(q.select("query_id", "qhi", "qlo"))
        .join(
            c.select("neighbor_id", "code_hi", "code_lo"),
            F.col("query_id") != F.col("neighbor_id"),
        )
        .select(
            "query_id",
            "neighbor_id",
            (
                F.bit_count(F.col("qhi").bitwiseXOR(F.col("code_hi")))
                + F.bit_count(F.col("qlo").bitwiseXOR(F.col("code_lo")))
            ).alias("hamming"),
        )
    )
    whrn = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    survivors = ham.withColumn("hrn", F.row_number().over(whrn)).where(
        F.col("hrn") <= prefilter
    )
    cand = F.broadcast(survivors).join(
        c.select("neighbor_id", "cv"), "neighbor_id"
    ).join(F.broadcast(q.select("query_id", "qv")), "query_id")
    wrank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    return (
        cand.select(
            "query_id",
            "neighbor_id",
            F.col("hamming").cast("long").alias("hamming"),
            cosine("qv", "cv").alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(wrank).cast("long"))
        .where(F.col("rank") <= k)
    )


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
    train_sample: int = 10_000,
) -> DataFrame:
    """Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023):
    k-means-cluster the embedding space, then inside each cluster drop
    every row whose cosine similarity to a LOWER-ID row of the same
    cluster reaches ``threshold`` — semantically-redundant documents that
    exact and MinHash dedup (text_dedup.py) cannot see because their
    wording differs.

    Keep policy is deterministic and order-free: row i is dropped iff
    some j < i (by id) in its cluster has cos(i, j) >= threshold. The
    kept set is therefore an INDEPENDENT SET under within-cluster
    T-similarity — no two kept rows of a cluster are mutual near-dups
    (pinned by test_semdedup_kept_set_is_independent).

    100 TB shape: centroids fit on a bounded content-addressed sample
    (same device as ``ivf_topk``); assignment is a narrow map; the pair
    search self-joins ON THE CLUSTER ID, so comparisons are quadratic
    only WITHIN a cluster — scale ``n_clusters`` with the corpus
    (SemDeDup uses ~100k clusters for web scale) to bound cluster sizes,
    exactly the knob the paper uses. Returns (id, cluster, keep) for
    every input row; filter ``keep`` for the surviving corpus.

    Rows-only by design (k-means has no SQL twin); the independence and
    coverage invariants are property-tested instead.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).withColumn(
        "__fv", array_to_vector(F.transform(F.col("__v"), lambda x: x.cast("double")))
    )
    train = (
        base.select("__fv", F.xxhash64(F.col("__id").cast("string")).alias("__h"))
        .orderBy("__h")
        .limit(train_sample)
    )
    model = KMeans(k=n_clusters, seed=seed, featuresCol="__fv").fit(train)
    assigned = model.transform(base).select(
        "__id", "__v", F.col("prediction").alias("cluster")
    )

    return _mark_semantic_dups(assigned, id_col, threshold, cluster_type="int")


def _mark_semantic_dups(
    assigned: DataFrame, id_col: str, threshold: float, cluster_type: str
) -> DataFrame:
    """Shared SemDeDup drop pass over (__id, __v, cluster) assignments:
    drop row i iff some j < i (by id) in the same cluster has
    cos(i, j) >= threshold. The self-join key is the CLUSTER ID, so the
    pair space is quadratic only within a cluster."""
    a = assigned.select(
        F.col("cluster"), F.col("__id").alias("__id_a"), F.col("__v").alias("__v_a")
    )
    b = assigned.select(
        F.col("cluster"), F.col("__id").alias("__id_b"), F.col("__v").alias("__v_b")
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("__id_b") < F.col("__id_a"))
        .filter(cosine("__v_a", "__v_b") >= threshold)
        .select(F.col("__id_a").alias("__id"))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("__dropped", F.lit(True)), "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.col("cluster").cast(cluster_type).alias("cluster"),
            F.coalesce(~F.col("__dropped"), F.lit(True)).alias("keep"),
        )
    )


def ivf_fixed_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "cid",
    centroid_vec: str = "cv",
) -> DataFrame:
    """IVF approximate top-k over a PINNED centroid set — the
    hash-certifiable face of :func:`ivf_topk`, same device as
    ``semdedup_fixed``: fix the learned component (publish the
    centroids) and the whole index replays as relational algebra.

    Candidates assign to their min-squared-euclidean centroid (k-means
    metric; ties to the smallest centroid id); each query probes its
    ``n_probe`` nearest cells; exact cosine ranks only within probed
    cells. Unlike :func:`ivf_topk` this needs NO driver-side collect —
    probe selection is a windowed rank over the (queries x centroids)
    broadcast cross, so the whole plan is distributed end-to-end.

    100 TB shape: centroid broadcast is bounded by construction, cell
    assignment is a narrow per-row pass, and the search joins query
    probes against candidates ON THE CELL ID — the probe side scans
    ~n_probe/|centroids| of the corpus, never all of it."""
    from pyspark.sql import Window

    cents = centroids.select(
        F.col(centroid_id).alias("__cid"), F.col(centroid_vec).alias("__cv2")
    )

    # argmin as an aggregate (lexicographic min(struct) == the windowed
    # rank's (__d, __cid) tiebreak): partial aggregation collapses the
    # |centroids| copies map-side, so the candidate-side exchange moves
    # ~N slim rows, never N x |centroids| embedding payloads.
    assigned = (
        candidates.select(
            F.col(cand_id).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        )
        .crossJoin(F.broadcast(cents))
        .withColumn("__d", l2_sq("__cv", "__cv2"))
        .groupBy("neighbor_id")
        .agg(
            F.first("__cv").alias("__cv"),  # constant within the group
            F.min(F.struct("__d", "__cid")).alias("__best"),
        )
        .select("neighbor_id", "__cv", F.col("__best.__cid").alias("__cell"))
    )

    w_q = Window.partitionBy("query_id").orderBy("__d", "__cid")
    probes = (
        queries.select(
            F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv")
        )
        .crossJoin(F.broadcast(cents))
        .withColumn("__d", l2_sq("__qv", "__cv2"))
        .withColumn("__rn", F.row_number().over(w_q))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "__qv", F.col("__cid").alias("__cell"))
    )

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        F.broadcast(probes)
        .join(assigned, "__cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", cosine("__qv", "__cv").alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def semdedup_fixed(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "cid",
    centroid_vec: str = "cv",
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup with a PINNED centroid set instead of a fitted k-means
    model: every row assigns to its max-cosine centroid (ties to the
    smallest centroid id), then the standard within-cluster drop pass
    runs. Same keep policy and output shape as :func:`semdedup`; the
    ``cluster`` column is the winning centroid's id (BIGINT).

    This is the certifiable face of the operator — assignment by argmax
    over a bounded centroid set is pure relational algebra, so a SQL
    oracle can replay it exactly, the way ``ann_lsh_topk`` pins literal
    hyperplanes. Production use: refit centroids offline (or take
    ``semdedup``'s fitted model), PUBLISH them, and run this pinned
    variant in the pipeline — assignments are then reproducible across
    runs and engines, which the fitted path cannot promise.

    100 TB shape: centroids broadcast (bounded set by construction), the
    argmax is a narrow per-row pass, and the pair search self-joins on
    the cluster id exactly as in :func:`semdedup`."""
    from pyspark.sql import Window

    cents = centroids.select(
        F.col(centroid_id).alias("__cid"), F.col(centroid_vec).alias("__cv")
    )
    scored = (
        df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .crossJoin(F.broadcast(cents))
        .withColumn("__cos", cosine("__v", "__cv"))
    )
    # argmax-by-cosine as an aggregate: min over (-cos, cid) reproduces
    # the old window's (cos DESC, cid ASC) tiebreak exactly (negating a
    # double is an exact sign flip), and map-side partial aggregation
    # keeps the exchange at ~N slim rows instead of N x |centroids|
    # embedding payloads.
    assigned = (
        scored.groupBy("__id")
        .agg(
            F.first("__v").alias("__v"),  # constant within the group
            F.min(F.struct((-F.col("__cos")).alias("__negcos"), "__cid")).alias(
                "__best"
            ),
        )
        .select("__id", "__v", F.col("__best.__cid").alias("cluster"))
    )
    return _mark_semantic_dups(assigned, id_col, threshold, cluster_type="long")


def _assign_min_l2(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "cid",
    centroid_vec: str = "cv",
) -> DataFrame:
    """Nearest-centroid assignment by squared euclidean distance (the
    k-means metric; ties to the smallest centroid id). Returns
    ``(__id, __v, cluster)``. Centroid set is broadcast (bounded by
    construction); the argmin is an AGGREGATE over the broadcast cross
    — ``min(struct(__d, __cid))`` is lexicographic, so the tiebreak is
    identical to the old windowed rank, but partial aggregation
    collapses the |centroids| copies of each row MAP-SIDE (they are
    co-located straight out of the cross join), so the exchange moves
    ~N slim rows instead of N x |centroids| rows each carrying the full
    embedding — the difference between a narrow pass and a
    vector-payload shuffle at 100 TB."""
    cents = centroids.select(
        F.col(centroid_id).alias("__cid"), F.col(centroid_vec).alias("__cv0")
    )
    return (
        df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .crossJoin(F.broadcast(cents))
        .withColumn("__d", l2_sq("__v", "__cv0"))
        .groupBy("__id")
        .agg(
            F.first("__v").alias("__v"),  # constant within the group
            F.min(F.struct("__d", "__cid")).alias("__best"),
        )
        .select("__id", "__v", F.col("__best.__cid").alias("cluster"))
    )


def kmeans_lloyd_step(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "cid",
    centroid_vec: str = "cv",
) -> DataFrame:
    """ONE exact Lloyd (k-means) iteration from a pinned centroid set —
    the closed-form assignment+update step that makes the iterative
    trainer's core hash-certifiable (the fitted multi-iteration path,
    :func:`ivf_topk`/:func:`semdedup`, stays engine-side by nature).

    Assignment: argmin squared-L2 (ties to the smallest centroid id).
    Update: each new centroid coordinate is the member mean computed as
    a SORTED left-fold sum divided once (compat device #4, the
    ``embedding_centroid_drift_labels`` canon) — identical addition
    order in both engines, so the update replays bit-for-bit in a SQL
    oracle. Empty cells keep their OLD centroid (n_members = 0), so the
    step is total and deterministic for ANY pinned init.

    Returns ``(cid, cv array<double>, n_members)``.

    100 TB shape: the certified sorted-fold is the canon device — a
    production multi-iteration fit would use the plain map-side-
    combinable per-dimension ``F.sum`` (means don't need bit-exactness
    across engines); assignment is a narrow broadcast pass either way,
    and the update aggregate shuffles (cell, dim) keyed rows, never
    whole vectors."""
    assigned = _assign_min_l2(df, centroids, id_col, vec_col, centroid_id, centroid_vec)
    dims = assigned.select(
        F.col("cluster"),
        F.posexplode(
            F.transform("__v", lambda x: x.cast("double"))
        ).alias("dim", "val"),
    )
    per_dim = dims.groupBy("cluster", "dim").agg(
        (
            F.aggregate(
                F.sort_array(F.collect_list("val")),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.count(F.lit(1))
        ).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )
    updated = per_dim.groupBy("cluster").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "c"))),
            lambda s: s["c"],
        ).alias("__cv1"),
        F.max("n").alias("n_members"),
    )
    # total step: centroids whose cell went empty carry forward unchanged
    base = centroids.select(
        F.col(centroid_id).alias("cid"),
        F.transform(F.col(centroid_vec), lambda x: x.cast("double")).alias("__cv0"),
    )
    return (
        base.join(updated, base["cid"] == updated["cluster"], "left")
        .select(
            "cid",
            F.coalesce("__cv1", "__cv0").alias(centroid_vec),
            F.coalesce("n_members", F.lit(0)).cast("long").alias("n_members"),
        )
    )


def semdedup_refined(
    df: DataFrame,
    init_centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "cid",
    centroid_vec: str = "cv",
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup whose clusters come from ONE certified Lloyd iteration
    off a pinned init (:func:`kmeans_lloyd_step`): refine the centroids,
    re-assign by min squared-L2 against the refined set, then run the
    standard within-cluster lower-id drop pass. The whole pipeline —
    update step included — replays exactly in SQL, unlike the fitted
    :func:`semdedup` (engine-side k-means). Same output shape:
    ``(id, cluster BIGINT, keep BOOLEAN)``."""
    c1 = kmeans_lloyd_step(
        df, init_centroids, id_col, vec_col, centroid_id, centroid_vec
    ).select(F.col("cid"), F.col(centroid_vec))
    assigned = _assign_min_l2(df, c1, id_col, vec_col, "cid", centroid_vec)
    return _mark_semantic_dups(assigned, id_col, threshold, cluster_type="long")
