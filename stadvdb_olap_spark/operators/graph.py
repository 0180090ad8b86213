"""Distributed graph analytics over edge-list DataFrames.

The dedup stack already covers connectivity (min-label connected
components, BFS depth — operators/text_dedup.py); this module adds the
value-propagation tier: fixed-iteration PageRank with a cross-engine
exactness device, and the neighborhood-overlap similarity that backs
co-visitation / link-prediction queries.

Scale shape: everything is edge-list joins + keyed aggregations — the
vertex-centric pattern every distributed graph engine lowers to. No
driver-side adjacency, no per-node Python. Iterations unroll into one
lazy plan; the edge relation is repartitioned on the join key ONCE so
every iteration's join reuses the same exchange (Spark's ReusedExchange
dedups identical subplans at execution).

Float exactness (PageRank): per-node contribution sums fold over
SORTED double arrays — ``F.aggregate(F.sort_array(collect_list(...)))``
on Spark, ``list_reduce(list_prepend(0.0, list_sort(list(...))))`` in
the DuckDB oracle. Same multiset + same order + correctly rounded IEEE
ops = bit-identical ranks at full precision, no quantization (the
sorted-fold device from plans/series_queries.py, applied per-group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed(
    edges: DataFrame,
    n_iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """PageRank after a FIXED number of power iterations over a
    dangling-free directed graph — returns (node, pr).

    Fixed iteration count is the certification device (the analogue of
    the pinned centroids/merges elsewhere): convergence-loop PageRank
    has no SQL twin, but k unrolled iterations replay exactly in
    chained CTEs, and in practice production PageRank runs a fixed
    iteration budget anyway.

    Every node must have ≥1 out-edge (no dangling-mass redistribution
    term): symmetrize undirected/bipartite graphs first, which
    guarantees it. Per iteration: one join of edges to current ranks on
    ``src`` (edges pre-partitioned once, exchange reused across
    iterations) and one aggregation keyed on ``dst`` — the vertex-
    centric shape that scales to any edge count. The per-node sum folds
    over the sorted contribution array so results are bit-identical
    across engines; group sizes are in-degrees, bounded by the fan-in
    of real graphs (a hub with extreme in-degree would sort its own
    list — salt the fold pairwise if that ever dominates).

    Node keys may be any equi-joinable type (BIGINT ids, VARCHAR terms,
    …) — the algorithm only joins, groups and counts on them.

    ``weight`` names an integer edge-weight column: contributions become
    pr · w/Σw_out (weighted PageRank). The per-edge norm w/Σw divides
    two exact integers once (correctly rounded, engine-identical); the
    sorted fold then sees identical double multisets either way.
    """
    wcol = (
        F.col(weight).cast("long")
        if weight is not None
        else F.lit(1).cast("long")
    )
    # Pinned parallelism-proportional width (not bare repartition(col):
    # AQE byte-coalescing shrinks a ~40 MB edge relation to ~1 partition,
    # serializing EVERY unrolled iteration's join and concentrating its
    # build memory on one task — guide §2.2/§5).
    e = edges.select(
        F.col(src).alias("__src"),
        F.col(dst).alias("__dst"),
        wcol.alias("__w"),
    ).repartition(
        edges.sparkSession.sparkContext.defaultParallelism * 2, "__src"
    )
    deg = e.groupBy("__src").agg(
        F.sum("__w").cast("double").alias("__outdeg")
    )
    nodes = deg.select(F.col("__src").alias("node"), "__outdeg")
    n_row = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    # 1 - damping computed ONCE driver-side: Python float subtraction is
    # the same correctly rounded IEEE op both engines would perform.
    base = 1.0 - damping
    pr = (
        nodes.crossJoin(F.broadcast(n_row))
        .select("node", "__outdeg", (F.lit(1.0) / F.col("__n")).alias("pr"))
    )
    for _ in range(n_iters):
        # Unweighted keeps the original single-division form — the
        # certified oracles replay pr/outdeg bit-for-bit; the weighted
        # form multiplies by the per-edge norm instead.
        contrib = (
            F.col("pr") / F.col("__outdeg")
            if weight is None
            else F.col("pr")
            * (F.col("__w").cast("double") / F.col("__outdeg"))
        )
        contribs = e.join(pr, e["__src"] == pr["node"]).select(
            F.col("__dst").alias("node"), contrib.alias("__c")
        )
        summed = contribs.groupBy("node").agg(
            F.aggregate(
                F.sort_array(F.collect_list("__c")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("__s")
        )
        pr = (
            summed.join(nodes, "node")
            .crossJoin(F.broadcast(n_row))
            .select(
                "node",
                "__outdeg",
                (
                    F.lit(base) / F.col("__n")
                    + F.lit(damping) * F.col("__s")
                ).alias("pr"),
            )
        )
    return pr.select("node", "pr")


def neighborhood_jaccard(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 1,
) -> DataFrame:
    """Pairwise Jaccard overlap of in-neighborhoods: for every pair of
    ``dst`` nodes sharing ≥ ``min_common`` ``src`` neighbors, the count
    of common neighbors and |A∩B| / |A∪B| — the co-visitation
    similarity / common-neighbors link-prediction primitive.

    Pair generation is keyed on the SHARED NEIGHBOR (self-join on
    ``src``), so the cost is Σ_src deg(src)² — bounded by the square of
    the per-source fan-out, never |dst|². Appropriate when sources have
    bounded degree (a customer buys from bounded suppliers); for
    hub-heavy sources, prefilter hubs or sample their edge lists.
    All-integer counts + one final double division = hash-exact.
    """
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d")
    ).distinct()
    deg = e.groupBy("__d").agg(F.count(F.lit(1)).alias("__deg"))
    a = e.select("__s", F.col("__d").alias("id_a"))
    b = e.select("__s", F.col("__d").alias("id_b"))
    # Repartition the generated pairs by id_a before counting (guide
    # §2.5/§5): the pair stream is keyed on the shared neighbor, so a
    # map-side partial-agg map would otherwise fill with a near-global
    # mix of the |dst|² pair space per task (OOMs a default local[32]
    # heap at sf0.1; unbounded at 100 TB). Keyed on id_a each task's
    # map holds only its own slice of pairs. Partition count is pinned
    # parallelism-proportional instead of AQE byte-coalesced: advisory
    # sizing cannot see the aggregation-group blow-up behind the
    # exchange (64 MB of pair rows ≫ a task's share of agg memory).
    common = (
        a.join(b, "__s")
        .filter(F.col("id_a") < F.col("id_b"))
        .repartition(
            edges.sparkSession.sparkContext.defaultParallelism * 4, "id_a"
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    da = deg.select(F.col("__d").alias("id_a"), F.col("__deg").alias("__da"))
    db = deg.select(F.col("__d").alias("id_b"), F.col("__deg").alias("__db"))
    return (
        common.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("__da") + F.col("__db") - F.col("n_common")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


def label_propagation(
    edges: DataFrame,
    n_iters: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) for a FIXED
    number of rounds — returns (node, label) community assignments.

    Initial label = own node id; each round every node adopts the most
    frequent label among its in-neighbors, ties broken by the SMALLEST
    label. Both rules are pure integer counting + ordering, so unlike
    classic randomized LPA the result is deterministic and replays
    exactly in SQL (the fixed-round device of :func:`pagerank_fixed`).
    Per round: one edges-to-labels join and one (node, label) count
    aggregation finished by a per-node argmax window — vertex-centric,
    two keyed exchanges, no driver state. Pass a symmetrized UNIPARTITE
    edge list: synchronous updates on bipartite graphs oscillate
    between the two sides (a documented LPA failure mode, not a bug
    here)."""
    # pinned width: see pagerank_fixed — bare repartition(col) lets AQE
    # coalesce the edge relation to ~1 partition and serialize rounds
    e = edges.select(
        F.col(src).cast("long").alias("__src"),
        F.col(dst).cast("long").alias("__dst"),
    ).repartition(
        edges.sparkSession.sparkContext.defaultParallelism * 2, "__src"
    )
    labels = e.select(F.col("__src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(n_iters):
        votes = (
            e.join(labels, e["__src"] == labels["node"])
            .select(F.col("__dst").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        # Per-node argmax (count desc, smallest label on ties) as ONE
        # hash aggregate: max of the struct (cnt, -label) is exactly
        # that ordering (labels are non-negative node ids), so the
        # per-round row_number window — a full sort of the vote relation
        # per iteration — becomes a sort-free aggregation (guide §2.4).
        labels = (
            votes.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("__cnt"), (-F.col("label")).alias("__nl"))
                ).alias("__m")
            )
            .select("node", (-F.col("__m.__nl")).alias("label"))
        )
    return labels


def oriented_edges(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Degree-ordered orientation of a canonical undirected edge list
    (``src < dst``, distinct): each edge points from its lower-degree
    endpoint to its higher-degree endpoint (ties by node id), returned
    as (u, w, dw) where ``dw`` is the head's degree — the standard
    hub-skew mitigation for triangle/wedge enumeration (Chiba &
    Nishizeki 1985; "compact-forward"). Under this orientation every
    node's OUT-degree is bounded by O(sqrt(|E|)) regardless of its raw
    degree, so wedge generation keyed on the tail never fans out on a
    hub. Pure integer counting + comparisons: deterministic at any
    parallelism."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = (
        e.select(F.col("src").alias("v"))
        .unionAll(e.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # shuffled-hash for the degree attach (guide §3.1): deg is the
    # |V|-bounded build side; sort-merge would sort the |E|-sized edge
    # relation twice just to look up two integers per edge.
    da = deg.select(F.col("v").alias("src"), F.col("d").alias("ds")).hint(
        "shuffle_hash"
    )
    db = deg.select(F.col("v").alias("dst"), F.col("d").alias("dd")).hint(
        "shuffle_hash"
    )
    fwd = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    return (
        e.join(da, "src")
        .join(db, "dst")
        .select(
            F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
            F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("w"),
            F.when(fwd, F.col("dd")).otherwise(F.col("ds")).alias("dw"),
        )
    )


def triangle_count_oriented(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact triangle count of an undirected graph given as a canonical
    edge list (``src < dst``, distinct) — one row: (n_triangles).

    Algorithm: degree-ordered orientation (:func:`oriented_edges`), then
    per-node sorted out-neighbor arrays, then one pass over the oriented
    edges summing |N+(u) ∩ N+(w)| — every triangle a→b→c (ordered by
    (degree, id)) is counted exactly once, at its base edge a→b. This is
    the adjacency-intersection ("compact-forward") formulation: compared
    with the naive wedge self-join it never MATERIALIZES the wedge set
    (Σ out-deg² rows — tens of millions on the sf0.1 part graph, an OOM
    at local[32]/1g) as join input; the same volume collapses into
    per-row array intersections inside one codegen stage. All integer
    counting — hash-exact, engine-independent. Out-arrays are bounded by
    the orientation's O(sqrt(|E|)) out-degree, so no hub blows a task's
    memory at any scale."""
    eo = oriented_edges(edges, src, dst).select("u", "w")
    adj = eo.groupBy("u").agg(F.sort_array(F.collect_list("w")).alias("nbrs"))
    # SHUFFLE_HASH on the adjacency side (guide §3.1, a deliberate
    # strategy pick): sort-merge would SORT the probe side's array
    # payloads (edges x avg-degree longs — the whole wedge volume as
    # sort-buffer bytes, an OOM at local[32] on a 1g heap); a shuffled
    # hash join builds only the per-partition adjacency hash table
    # (|V|-bounded, arrays included) and streams the edges through it.
    au = adj.select("u", F.col("nbrs").alias("nu")).hint("shuffle_hash")
    aw = adj.select(F.col("u").alias("w"), F.col("nbrs").alias("nw")).hint(
        "shuffle_hash"
    )
    per_edge = (
        eo.select("u", "w")
        .join(au, "u")
        .join(aw, "w")
        .select(F.size(F.array_intersect("nu", "nw")).alias("c"))
    )
    return per_edge.agg(F.sum("c").cast("long").alias("n_triangles")).select(
        F.coalesce(F.col("n_triangles"), F.lit(0).cast("long")).alias(
            "n_triangles"
        )
    )


def kcore_peel(
    edges: DataFrame,
    k: int,
    n_rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Peel toward the k-core of an undirected graph for a FIXED number
    of rounds — returns (node, deg): every node still alive after
    ``n_rounds`` of peeling, with its degree in the surviving subgraph.

    One peel round = drop every node whose current degree is below
    ``k``, plus all its incident edges (Matula & Beck 1983, bounded
    budget). Full k-core decomposition iterates to a fixpoint; the
    fixed round count is the certification device used across this
    repo (pagerank_fixed / ivf_fixed / pinned BPE merges) — the loop
    unrolls into one lazy plan that replays exactly as chained SQL
    CTEs, and bounded peel budgets are standard practice on large
    graphs anyway (each round is a full-scan sweep).

    Pass the canonical undirected edge list (src < dst, distinct).
    Per round: one degree aggregation over both endpoint projections
    and two semi-join-shaped inner joins back to the survivor set —
    all integer counting on keyed exchanges, no driver state. Cost per
    round is O(|E|) shuffled on node keys. Each round's survivor edge
    list is localCheckpoint'ed (the connected_components device): the
    peel recurrence references the previous round's edges three times
    (degree union + both survivor joins), so an unbroken lineage grows
    3^rounds — checkpointing keeps the plan linear in rounds without
    changing a single value.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    )
    for _ in range(n_rounds):
        deg = (
            e.select(F.col("src").alias("v"))
            .unionAll(e.select(F.col("dst").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("v")
        e = (
            e.join(keep.withColumnRenamed("v", "src"), "src")
            .join(keep.withColumnRenamed("v", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint()
        )
    return (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
