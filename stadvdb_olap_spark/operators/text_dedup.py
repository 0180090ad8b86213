"""Document deduplication families for training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup detection, all as
pure DataFrame transforms designed for the 100 TB regime:

- Signatures (minhash/simhash/fingerprints) are computed PER ROW with
  JVM-side higher-order functions — no explode, no shuffle, no Python.
- Candidate generation is LSH banding: explode only the B band keys per
  doc (B≈8 rows/doc, not one per shingle), shuffle on band value, and
  self-join inside buckets. All-pairs comparison never happens.
- Exact verification (Jaccard) runs only on LSH candidates.

Hash functions: hex-string md5/sha256 rather than xxhash64 — bit-identical
in every engine (the DuckDB oracle included). For maximum throughput on a
real cluster swap the digests to xxhash64; the structure is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stadvdb_olap_spark.functions.text import (
    let,
    tokens,
    word_shingles,
    word_shingles_spark_sql,
)

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-duplicate groups by normalized-content hash: one row per
    content hash with the canonical (minimum) doc id and the group size.
    A single hash-aggregate — the cheapest dedup at any scale."""
    content_hash = F.md5(F.array_join(tokens(text_col), " "))
    return (
        df.select(F.col(id_col), content_hash.alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document MinHash signature computed row-locally — a narrow map,
    no shuffle.

    One-permutation style: hash k is the minimum of the (k mod 16)-th
    disjoint 4-hex-char slice of digest group k//16 — 16 hashes per digest
    invocation instead of salted re-hashing per hash, with the same banding
    behavior (sha256's slices are independent uniform bits). Group 0 is the
    plain ``sha256(shingle)``; each further group of 16 hashes salts the
    shingle (``sha256(s || '#g')``) for fresh independent bits, so
    ``num_hashes`` scales to 64+ for fine-grained LSH band tuning while
    staying one narrow projection. sha256 over md5 because its 64 hex chars
    carry twice the slices per hash invocation (DuckDB's ``sha256`` is
    hex-identical, so the oracle twin stays exact).
    """
    if num_hashes < 1:
        raise ValueError("num_hashes must be >= 1")
    # Contentless docs (NULL / whitespace-only text) have no shingles:
    # they would all share the degenerate md5('') band key in EVERY
    # band — an m^2 candidate blowup in the LSH self-join — and their
    # [NULL]-vs-[NULL] shingle sets would "verify" at jaccard 1.0
    # (array_intersect treats NULL elements as equal), merging
    # unrelated empty docs into one near-dup cluster. No content, no
    # near-dup relation: they are excluded up front.
    df = df.where(f"`{text_col}` IS NOT NULL AND trim(`{text_col}`) != ''")
    sh_sql = word_shingles_spark_sql(f"`{text_col}`", shingle_n)
    n_groups = -(-num_hashes // 16)

    # Whole digest projection as parsed SQL strings (same trees the
    # previous Column-object construction produced; values identical).
    def salted_digest_sql(g: int) -> str:
        if g == 0:
            return f"transform({sh_sql}, s -> sha2(s, 256)) AS __dg{g}"
        return (
            f"transform({sh_sql}, s -> sha2(concat(s, '#{g}'), 256)) AS __dg{g}"
        )

    out = df.selectExpr(
        f"`{id_col}`",
        *[salted_digest_sql(g) for g in range(n_groups)],
    )
    # One selectExpr call for all hash columns: the per-column
    # Column-object construction (array_min/transform/lambda per hash)
    # costs ~100 py4j round-trips at 16 hashes — measurably ~0.2s of
    # DRIVER time per query build at the bench. Same expressions, parsed
    # JVM-side in one shot.
    sig_exprs = [
        f"array_min(transform(__dg{k // 16}, "
        f"d -> substring(d, {4 * (k % 16) + 1}, 4))) AS mh{k}"
        for k in range(num_hashes)
    ]
    return out.selectExpr(f"`{id_col}`", *sig_exprs)


def minhash_band_keys(
    sig: DataFrame, id_col: str, num_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """Band the signature: band key = md5 of the concatenated rows of each
    band. Output one row per (doc, band): (id, band_id, band_key)."""
    if num_hashes % band_size:
        raise ValueError(
            f"num_hashes={num_hashes} not divisible by band_size="
            f"{band_size}: the trailing {num_hashes % band_size} hashes "
            "would be computed but never banded — paid-for recall "
            "silently thrown away; pick a divisible pair"
        )
    n_bands = num_hashes // band_size
    # Single parsed expression (see minhash_signatures): one py4j call
    # instead of one Column-object tree per band.
    structs = ", ".join(
        f"struct(CAST({b} AS INT) AS band_id, md5(concat_ws('|', "
        + ", ".join(f"mh{b * band_size + j}" for j in range(band_size))
        + ")) AS band_key)"
        for b in range(n_bands)
    )
    return sig.selectExpr(
        f"`{id_col}`", f"explode(array({structs})) AS b"
    ).selectExpr(f"`{id_col}`", "b.band_id AS band_id", "b.band_key AS band_key")


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) sharing at least one
    LSH band. The shuffle is on band_key — documents land in the same
    reducer only when they collide, so cost tracks the number of true
    near-dups, not n^2."""
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    bands = minhash_band_keys(sig, id_col, num_hashes, band_size)
    left = bands.select(
        F.col("band_id"), F.col("band_key"), F.col(id_col).alias("id_a")
    )
    right = bands.select(
        F.col("band_id"), F.col("band_key"), F.col(id_col).alias("id_b")
    )
    return (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _shingle_sets(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int, out_id: str, out_set: str
) -> DataFrame:
    """(id, distinct-shingle-set) frame — the verify-side input, built
    identically wherever Jaccard verification happens."""
    return df.select(
        F.col(id_col).alias(out_id),
        F.array_distinct(word_shingles(text_col, shingle_n)).alias(out_set),
    )


def _jaccard(a_set: str, b_set: str) -> Column:
    """Exact set Jaccard |A∩B| / |A∪B| as DOUBLE — the single shared
    definition, so the full-corpus and incremental paths cannot diverge."""
    inter = F.size(F.array_intersect(a_set, b_set))
    union = F.size(F.array_distinct(F.concat(a_set, b_set)))
    return inter.cast("double") / union


def jaccard_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidates verified with exact shingle-set Jaccard similarity.
    Only candidate pairs pay the set-intersection cost."""
    cands = lsh_candidate_pairs(df, id_col, text_col, num_hashes, band_size, shingle_n)
    a = _shingle_sets(df, id_col, text_col, shingle_n, "id_a", "sh_a")
    b = _shingle_sets(df, id_col, text_col, shingle_n, "id_b", "sh_b")
    jac = _jaccard("sh_a", "sh_b")
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def incremental_lsh_matches(
    delta: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Dedup a small DELTA batch against the standing CORPUS without any
    corpus-side recomputation beyond its band table: (delta_id, corpus_id,
    jaccard) for every verified near-dup across the boundary.

    The 100 TB ingestion shape: the corpus band table is computed once and
    persisted (it is exactly :func:`minhash_band_keys` over
    :func:`minhash_signatures` — reuse the saved table in production; here
    it is recomputed from the corpus frame so the operator is
    self-contained). Each incoming batch computes only its OWN signatures
    (narrow map over the batch), broadcasts its bands against the corpus
    bands — the batch side is small by construction, so the join is a
    broadcast probe of the big band table with NO corpus shuffle — and
    Jaccard-verifies the collisions. Per-batch cost tracks the batch size
    and the collision count, never the corpus size.
    """
    from stadvdb_olap_spark.operators.joins import broadcast_if_small

    d_bands = minhash_band_keys(
        minhash_signatures(delta, id_col, text_col, num_hashes, shingle_n),
        id_col,
        num_hashes,
        band_size,
    ).withColumnRenamed(id_col, "delta_id")
    c_bands = minhash_band_keys(
        minhash_signatures(corpus, id_col, text_col, num_hashes, shingle_n),
        id_col,
        num_hashes,
        band_size,
    ).withColumnRenamed(id_col, "corpus_id")
    cands = (
        c_bands.join(broadcast_if_small(d_bands), ["band_id", "band_key"])
        .select("delta_id", "corpus_id")
        .distinct()
    )
    d_sets = _shingle_sets(delta, id_col, text_col, shingle_n, "delta_id", "sh_d")
    # Verify-side shingle sets are built only for corpus docs that
    # actually COLLIDED: the semi-join prunes the corpus before the
    # expensive tokenize/shingle projection, so the per-batch verify
    # cost tracks the collision count — without it the full corpus
    # would re-shingle every batch, contradicting the contract above.
    colliders = corpus.join(
        broadcast_if_small(
            cands.select(F.col("corpus_id").alias(id_col)).distinct()
        ),
        id_col,
        "left_semi",
    )
    c_sets = _shingle_sets(
        colliders, id_col, text_col, shingle_n, "corpus_id", "sh_c"
    )
    jac = _jaccard("sh_d", "sh_c")
    return (
        cands.join(broadcast_if_small(d_sets), "delta_id")
        .join(c_sets, "corpus_id")
        .select("delta_id", "corpus_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(col: Column | str, bits: int = 16) -> Column:
    """SimHash over whitespace tokens: bit j of the hash is the sign of the
    sum over tokens of (bit j of md5(token))*2-1. Computed entirely with
    portable string/arith ops (hex-digit -> int via strpos) so the DuckDB
    oracle reproduces it bit-for-bit.

    ``bits`` hex-derived bits (default 16 = first 4 md5 hex chars);
    raising ``bits`` widens the hash up to 63 — bit 63 would need the
    literal 2^63, which overflows a signed BIGINT on BOTH engines, so
    bits >= 64 raises here instead of failing opaquely at plan time
    (split across two 32-bit halves if a full 64-bit variant is ever
    needed, the binary-quant code-word pattern).
    """
    if not 1 <= bits <= 63:
        raise ValueError(f"bits must be in [1, 63], got {bits}")
    def bit_of(h: Column, j: int) -> Column:
        # hex digit value via base conversion, then extract bit (3 - j%4)
        hex_pos = j // 4 + 1
        shift = 3 - j % 4
        return (
            F.floor(F.conv(F.substring(h, hex_pos, 1), 16, 10).cast("long") / (2**shift))
            .cast("long")
            % 2
        )

    # One pass over the token hashes: accumulate all ``bits`` signed sums in
    # an array accumulator (HOFs get no subexpression elimination, so the
    # naive per-bit aggregate would re-tokenize and re-hash `bits` times).
    sums = F.aggregate(
        F.transform(tokens(col), lambda x: F.md5(x)),
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[bit_of(h, j) * 2 - 1 for j in range(bits)]),
            lambda a, b: a + b,
        ),
    )
    return let(
        sums,
        lambda s: sum(
            (
                F.when(F.element_at(s, j + 1) > 0, F.lit(2**j)).otherwise(F.lit(0))
                for j in range(bits)
            ),
            start=F.lit(0),
        ).cast("long"),
    )


def simhash_sql(expr: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`simhash` (same [1, 63] bits bound)."""
    if not 1 <= bits <= 63:
        raise ValueError(f"bits must be in [1, 63], got {bits}")
    from stadvdb_olap_spark.functions.text import tokens_sql

    t = tokens_sql(expr)
    hs = f"list_transform({t}, x -> md5(x))"
    parts = []
    for j in range(bits):
        hex_pos = j // 4 + 1
        shift = 3 - j % 4
        bit_sum = (
            f"list_aggregate(list_transform({hs}, h -> "
            f"(CAST(floor((strpos('0123456789abcdef', h[{hex_pos}:{hex_pos}]) - 1)"
            f" / {2 ** shift}) AS BIGINT) % 2) * 2 - 1), 'sum')"
        )
        parts.append(f"(CASE WHEN {bit_sum} > 0 THEN {2 ** j} ELSE 0 END)")
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


# ---------------------------------------------------------------------------
# Duplicate clusters: connected components over candidate pairs
# ---------------------------------------------------------------------------


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by iterative minimum-label propagation:
    ``(node, component)`` with component = the smallest node id reachable.

    The dedup endgame: near-dup PAIRS (minhash/LSH output) become duplicate
    CLUSTERS, and min-id-per-cluster picks the canonical document. Each
    round is one join + one min-aggregate (both shuffles on node id — at
    scale they co-partition), and rounds needed = graph diameter, which for
    near-dup clusters is tiny (docs similar to a common doc are similar to
    each other). ``localCheckpoint`` cuts lineage per round so plans don't
    grow exponentially; the convergence check rides the SAME checkpoint
    job as an observed metric (old/neighbor label rows are source-tagged
    and the per-node struct-min says which side won), so a round costs
    ONE job, not a checkpoint + a separate count. Raises if ``max_iter``
    rounds don't converge rather than returning a partial labeling.
    """
    from pyspark.sql import Observation

    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).localCheckpoint()
    nodes = sym.select(F.col("a").alias("id")).distinct()
    # no checkpoint on the seed labels: round 1's checkpoint materializes
    # this short lineage anyway
    labels = nodes.select("id", F.col("id").alias("comp"))

    for rnd in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
            .select(F.col("a").alias("id"), "comp")
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        )
        # Tag sources and take the per-node struct-min: ties go to the
        # old row (tag 0), so tag 1 winning == a STRICTLY smaller
        # neighbor label arrived == this node changed this round.
        tagged = labels.select("id", "comp", F.lit(0).alias("t")).unionByName(
            neighbor_min.select("id", "comp", F.lit(1).alias("t"))
        )
        obs = Observation(f"cc_changed_{rnd}")
        new_labels = (
            tagged.groupBy("id")
            .agg(F.min(F.struct("comp", "t")).alias("m"))
            .select(
                "id",
                F.col("m.comp").alias("comp"),
                (F.col("m.t") == 1).cast("long").alias("__chg"),
            )
            .observe(obs, F.sum("__chg").alias("changed"))
            .localCheckpoint()
        )
        labels = new_labels.drop("__chg")
        if int(obs.get["changed"] or 0) == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def bfs_depth_from_sources(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_col: str = "id",
    max_depth: int = 32,
) -> DataFrame:
    """Minimum hop distance from a set of source nodes over an undirected
    edge list: ``(id, depth)`` for every reachable node.

    Frontier-style iteration: each round joins the current best depths to
    the edges and min-merges ``depth+1`` candidates — one co-partitioned
    join + aggregate per round, ``localCheckpoint`` cutting lineage, and
    rounds = eccentricity from the sources plus one no-change round to
    observe convergence (the loop budget accounts for the extra round, so
    depths up to exactly ``max_depth`` are supported — matching the
    depth-capped recursive-CTE oracle twin). A deeper graph raises
    instead of returning partial depths — at 100 TB an unexpectedly deep
    graph means bad input (a dedup cluster's diameter is small by
    construction), and a loud failure beats silent truncation.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).localCheckpoint()
    depths = (
        sources.select(F.col(id_col).alias("id"))
        .distinct()
        .select("id", F.lit(0).cast("long").alias("depth"))
        .localCheckpoint()
    )
    for _ in range(max_depth + 1):
        candidates = (
            sym.join(depths, sym.b == depths.id)
            .select(F.col("a").alias("id"), (F.col("depth") + 1).alias("depth"))
        )
        new_depths = (
            depths.unionByName(candidates)
            .groupBy("id")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint()
        )
        changed = (
            new_depths.alias("n")
            .join(depths.alias("o"), "id", "left")
            .filter(
                F.col("o.depth").isNull() | (F.col("n.depth") != F.col("o.depth"))
            )
            .limit(1)
            .count()
        )
        depths = new_depths
        if changed == 0:
            return depths
    raise RuntimeError(f"bfs did not converge within {max_depth} rounds")


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """End-to-end near-dup clustering: LSH candidates -> Jaccard verify ->
    connected components -> (doc_id, canonical_id) for every clustered
    document (canonical = min doc id in the cluster). Feed the complement
    (docs not listed, plus the canonicals) downstream as the deduplicated
    corpus."""
    pairs = jaccard_verified_pairs(
        df, id_col, text_col, threshold, num_hashes, band_size, shingle_n
    )
    comps = connected_components(pairs.select("id_a", "id_b"))
    return comps.select(F.col("id").alias(id_col), F.col("comp").alias("canonical_id"))


def survivor_longest(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.2,
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Quality-aware near-dup survivorship: cluster via
    :func:`dedup_clusters`, then keep the LONGEST member of each cluster
    (token count from the certified tokenizer, doc-id tiebreak) instead
    of the arbitrary min-id. ONE definition shared by the certified
    catalog query (``dedup_survivor_longest_docs``) and the curation
    pipeline's near-dedup stage, so the app-embedded policy can never
    drift from the hash-certified one. Returns every CLUSTERED doc as
    ``(id, canonical_id, n_tokens, is_survivor)``; unclustered docs are
    absent (they all survive). One per-cluster window — bounded grain,
    one shuffle beyond the clustering itself."""
    from pyspark.sql import Window

    clusters = dedup_clusters(
        df, id_col, text_col, threshold, num_hashes, band_size, shingle_n
    )
    scored = clusters.join(
        df.select(
            id_col, F.size(tokens(text_col)).cast("long").alias("n_tokens")
        ),
        id_col,
    )
    w = (
        Window.partitionBy("canonical_id")
        .orderBy(F.col("n_tokens").desc(), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return scored.select(
        id_col,
        "canonical_id",
        "n_tokens",
        (F.col(id_col) == F.first(id_col).over(w)).alias("is_survivor"),
    )
