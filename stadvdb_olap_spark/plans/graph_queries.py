"""Graph-analytics catalog queries over the order co-purchase graph.

The graph: customer c bought from supplier s (distinct pairs from
orders ⋈ lineitem), symmetrized — bipartite, so symmetrizing leaves no
dangling nodes, which is exactly what :func:`pagerank_fixed` requires.
Node encoding packs both key spaces into one BIGINT (customer → 2k,
supplier → 2k+1) so the edge list stays a two-column relation.

Certification devices:
- PageRank runs a FIXED 3-iteration budget (the pinned-component
  convention: ivf_fixed / semdedup_fixed / bpe pinned merges), so the
  DuckDB twin replays it as three chained MATERIALIZED CTEs.
- Per-node contribution sums fold over SORTED double arrays on both
  engines (the sorted-fold device of plans/series_queries.py) — every
  op correctly rounded in the same order, hence bit-identical ranks at
  full precision.
- Float literals enter both plans as CAST('<repr>' AS DOUBLE) /
  F.lit(double) of the SAME Python-computed value (1 - d is computed
  once driver-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stadvdb_olap_spark.operators.graph import (
    neighborhood_jaccard,
    pagerank_fixed,
)
from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.sources.parquet import load_spread

_ITERS = 3
_DAMPING = 0.85
_D_LIT = f"CAST('{_DAMPING!r}' AS DOUBLE)"
_BASE_LIT = f"CAST('{1.0 - _DAMPING!r}' AS DOUBLE)"

# Shared by both oracles: distinct customer→supplier purchase pairs.
_E0_SQL = """
e0 AS MATERIALIZED (
    SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS src,
           CAST(l_suppkey AS BIGINT) * 2 + 1 AS dst
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
)"""


def _pagerank_chain_sql(n_iters: int) -> tuple[str, str]:
    """(CTE chain, final-table name) replaying :func:`pagerank_fixed`
    over an already-defined ``edges(src, dst)`` CTE — shared by every
    PageRank-family oracle regardless of node type (BIGINT keys or
    VARCHAR terms). Every CTE is MATERIALIZED: DuckDB inlines plain
    CTEs into each reference, and the iteration chain references
    edges/deg/nn k times — materialization keeps the oracle one-pass
    per stage."""
    its = []
    prev = "p0"
    for k in range(1, n_iters + 1):
        its.append(
            f"""
i{k} AS MATERIALIZED (
    SELECT e.dst AS node,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_sort(list(p.pr / p.outdeg))), (a, b) -> a + b) AS s
    FROM edges e JOIN {prev} p ON e.src = p.node
    GROUP BY e.dst
),
p{k} AS MATERIALIZED (
    SELECT i.node, d.outdeg, {_BASE_LIT} / nn.n + {_D_LIT} * i.s AS pr
    FROM i{k} i JOIN deg d ON i.node = d.node CROSS JOIN nn
)"""
        )
        prev = f"p{k}"
    chain = f"""
deg AS MATERIALIZED (
    SELECT src AS node, CAST(COUNT(*) AS DOUBLE) AS outdeg
    FROM edges GROUP BY src
),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
p0 AS MATERIALIZED (
    SELECT node, outdeg, CAST(1 AS DOUBLE) / nn.n AS pr
    FROM deg CROSS JOIN nn
),{",".join(its)}"""
    return chain, prev


def _pagerank_oracle(n_iters: int) -> str:
    chain, last = _pagerank_chain_sql(n_iters)
    return f"""
WITH {_E0_SQL},
edges AS MATERIALIZED (
    SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
),{chain}
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
           AS node_type,
       node // 2 AS node_key,
       pr
FROM {last}
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_spread(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").cast("long").alias("c"),
    )
    li = load_spread(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_suppkey").cast("long").alias("s"),
    )
    return (
        orders.join(li, "ok")
        .select(
            (F.col("c") * 2).alias("src"),
            (F.col("s") * 2 + 1).alias("dst"),
        )
        .distinct()
    )


@query("pagerank_copurchase_3iter", oracle=_pagerank_oracle(_ITERS))
def pagerank_copurchase_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 fixed power iterations, d=0.85) over the symmetrized
    customer↔supplier co-purchase graph — which customers/suppliers sit
    at the center of the order network. The iterative-graph-algorithm
    certification: fixed iterations unroll into chained CTEs, sorted
    contribution folds make the floats engine-exact, and each iteration
    is one edges-to-ranks join plus one dst-keyed aggregation — the
    vertex-centric shape that holds at any edge count (edges partition
    once on the join key; ReusedExchange covers the unrolled plan)."""
    e0 = _copurchase_edges(spark, sf_dir)
    edges = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    pr = pagerank_fixed(edges, n_iters=_ITERS, damping=_DAMPING)
    return pr.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node DIV 2").alias("node_key"),
        "pr",
    )


@query(
    "supplier_covisit_jaccard",
    oracle=f"""
WITH {_E0_SQL},
e AS MATERIALIZED (SELECT src AS c, dst AS s FROM e0),
deg AS MATERIALIZED (SELECT s, COUNT(*) AS d FROM e GROUP BY s),
common AS (
    SELECT a.s AS node_a, b.s AS node_b, COUNT(*) AS n_common
    FROM e a JOIN e b ON a.c = b.c AND a.s < b.s
    GROUP BY a.s, b.s
    HAVING COUNT(*) >= 2
)
SELECT (node_a - 1) // 2 AS supp_a,
       (node_b - 1) // 2 AS supp_b,
       n_common,
       CAST(n_common AS DOUBLE) / CAST(da.d + db.d - n_common AS DOUBLE)
           AS jaccard
FROM common
JOIN deg da ON node_a = da.s
JOIN deg db ON node_b = db.s
""",
)
def supplier_covisit_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier co-visitation similarity: for every supplier pair with
    ≥2 shared customers, the common-customer count and the Jaccard of
    their customer sets — the common-neighbors link-prediction /
     'suppliers like this one' primitive. Pair generation is keyed on
    the shared CUSTOMER (bounded fan-out side: a customer buys from
    bounded suppliers), so cost is Σ_c deg(c)², never |suppliers|²;
    counts are exact integers and the single closing division makes
    the score hash-exact."""
    e = _copurchase_edges(spark, sf_dir)
    nj = neighborhood_jaccard(e, min_common=2)
    return nj.select(
        F.expr("(id_a - 1) DIV 2").alias("supp_a"),
        F.expr("(id_b - 1) DIV 2").alias("supp_b"),
        "n_common",
        "jaccard",
    )


_LPA_ITERS = 3


def _lpa_oracle(n_iters: int) -> str:
    its = []
    prev = "l0"
    for k in range(1, n_iters + 1):
        its.append(
            f"""
v{k} AS MATERIALIZED (
    SELECT e.dst AS node, l.label, COUNT(*) AS cnt
    FROM edges e JOIN {prev} l ON e.src = l.node
    GROUP BY e.dst, l.label
),
l{k} AS MATERIALIZED (
    SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, label) AS rn
        FROM v{k}
    ) WHERE rn = 1
)"""
        )
        prev = f"l{k}"
    return f"""
WITH e0 AS MATERIALIZED (
    SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS src,
           CAST(b.l_partkey AS BIGINT) AS dst
    FROM lineitem a
    JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey
),
edges AS MATERIALIZED (
    SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
),
l0 AS MATERIALIZED (
    SELECT DISTINCT src AS node, src AS label FROM edges
),{",".join(its)}
SELECT node AS part_key, label AS community FROM {prev}
"""


@query("lpa_communities_parts", oracle=_lpa_oracle(_LPA_ITERS))
def lpa_communities_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the part co-occurrence graph (parts bought
    in the same order, symmetrized — a UNIPARTITE projection, as
    synchronous LPA requires) via 3 deterministic label-propagation
    rounds: most-frequent neighbor label, ties to the smallest. The
    all-integer sibling of ``pagerank_copurchase_3iter`` — counting +
    ordering only, so the chained-CTE oracle replays every round with
    no float device at all. Pair generation is keyed on the order
    (bounded lines-per-order fan-out); each round is one edges-to-labels
    join + one (node, label) count argmax — the vertex-centric shape."""
    from stadvdb_olap_spark.operators.graph import label_propagation

    li = load_spread(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").cast("long").alias("pk"),
    )
    a = li.select("ok", F.col("pk").alias("src"))
    b = li.select("ok", F.col("pk").alias("dst"))
    e0 = (
        a.join(b, "ok")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    edges = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = label_propagation(edges, n_iters=_LPA_ITERS)
    return labels.select(
        F.col("node").alias("part_key"), F.col("label").alias("community")
    )


_TR_TOPK = 50


def _textrank_oracle(n_iters: int) -> str:
    chain, last = _pagerank_chain_sql(n_iters)
    return f"""
WITH t AS MATERIALIZED (
    SELECT regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS toks
    FROM documents
),
bg AS MATERIALIZED (
    SELECT toks[i] AS w1, toks[i + 1] AS w2
    FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
    WHERE len(toks) >= 2
),
e0 AS MATERIALIZED (
    SELECT DISTINCT w1 AS src, w2 AS dst FROM bg
    WHERE w1 <> w2 AND length(w1) > 0 AND length(w2) > 0
),
edges AS MATERIALIZED (
    SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)
),{chain}
SELECT node AS term, pr, CAST(rn AS BIGINT) AS rank
FROM (SELECT node, pr,
             row_number() OVER (ORDER BY pr DESC, node) AS rn
      FROM {last})
WHERE rn <= {_TR_TOPK}
"""


@query("textrank_keywords_docs", oracle=_textrank_oracle(_ITERS))
def textrank_keywords_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004) over the
    corpus: PageRank on the token-adjacency graph (distinct adjacent
    word pairs, symmetrized) ranks terms by graph centrality — the
    classic unsupervised complement to frequency scores (TF-IDF / RAKE
    in plans/text_queries.py): a term scores high by KEEPING COMPANY
    with high-scoring terms, not by raw count. Reuses
    ``pagerank_fixed`` unchanged with VARCHAR nodes — the operator only
    joins/groups on keys. The graph is vocabulary-sized (bounded, far
    below the corpus), so the closing global top-{k} window is a
    non-issue; everything corpus-sized is the one adjacency-pair
    distinct."""
    from stadvdb_olap_spark.functions.text import tokens

    docs = load_spread(spark, sf_dir, "documents")
    toked = docs.select(tokens("text").alias("toks")).filter(
        F.size("toks") >= 2
    )
    bg = toked.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("toks"), i).alias("w1"),
                    F.element_at(F.col("toks"), i + 1).alias("w2"),
                ),
            )
        ).alias("b")
    ).select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    e0 = (
        bg.filter(
            (F.col("w1") != F.col("w2"))
            & (F.length("w1") > 0)
            & (F.length("w2") > 0)
        )
        .select(F.col("w1").alias("src"), F.col("w2").alias("dst"))
        .distinct()
    )
    edges = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    pr = pagerank_fixed(edges, n_iters=_ITERS, damping=_DAMPING)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("pr").desc(), F.col("node").asc())
    return (
        pr.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _TR_TOPK)
        .select(F.col("node").alias("term"), "pr", "rank")
    )


# Shared by the LPA / triangle / modularity oracles: distinct id-ordered
# part co-occurrence pairs (parts bought in the same order).
_PART_E0_SQL = """
e0 AS MATERIALIZED (
    SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS src,
           CAST(b.l_partkey AS BIGINT) AS dst
    FROM lineitem a
    JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey
)"""


def _part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_spread(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").cast("long").alias("pk"),
    )
    a = li.select("ok", F.col("pk").alias("src"))
    b = li.select("ok", F.col("pk").alias("dst"))
    return (
        a.join(b, "ok")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


@query(
    "triangle_stats_parts",
    oracle=f"""
WITH {_PART_E0_SQL},
deg AS MATERIALIZED (
    SELECT v, COUNT(*) AS d FROM (
        SELECT src AS v FROM e0 UNION ALL SELECT dst AS v FROM e0)
    GROUP BY v
),
w AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
tr AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e0 p1
    JOIN e0 p2 ON p1.dst = p2.src
    JOIN e0 p3 ON p3.src = p1.src AND p3.dst = p2.dst
)
SELECT n_triangles, n_wedges,
       CASE WHEN n_wedges = 0 THEN CAST(0 AS DOUBLE)
            ELSE (CAST(3 AS DOUBLE) * n_triangles) / n_wedges
       END AS global_clustering
FROM tr CROSS JOIN w
""",
)
def triangle_stats_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the part
    co-occurrence graph — the classic cohesion analytic. Triangles are
    counted by DEGREE-ORDERED adjacency intersection
    (operators/graph.py:triangle_count_oriented): edges orient from the
    lower-(degree, id) endpoint to the higher, per-node out-neighbor
    arrays are bounded by O(sqrt(|E|)) even at a hub, and one pass over
    the oriented edges sums |N+(u) ∩ N+(w)| — each triangle counted
    exactly once at its base edge. The same integer n_triangles as the
    id-ordered wedge self-join the oracle replays, WITHOUT materializing
    the Σ out-deg² wedge relation as join input (tens of millions of
    rows at sf0.1 — an OOM at local[32] on the default heap, and the
    hub-skew scale-killer at 100 TB). All integers until one final
    division — hash-exact."""
    from stadvdb_olap_spark.operators.graph import triangle_count_oriented

    e0 = _part_pairs(spark, sf_dir)
    deg = (
        e0.select(F.col("src").alias("v"))
        .unionAll(e0.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) DIV 2")).cast("long").alias("n_wedges")
    )
    tri = triangle_count_oriented(e0)
    return tri.crossJoin(F.broadcast(wedges)).select(
        "n_triangles",
        "n_wedges",
        F.when(F.col("n_wedges") == 0, F.lit(0.0))
        .otherwise(
            (F.lit(3.0) * F.col("n_triangles")) / F.col("n_wedges")
        )
        .alias("global_clustering"),
    )


def _modularity_oracle(n_iters: int) -> str:
    # Reuse the LPA chain (it defines e0/edges/l0..lK over the part
    # graph), then score the partition: Q = sum_c (e_c/m - (d_c/2m)^2).
    lpa = _lpa_oracle(n_iters)
    head, _tail = lpa.rsplit("SELECT node AS part_key", 1)
    return f"""{head.rstrip()},
labels AS MATERIALIZED (SELECT node, label FROM l{n_iters}),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM e0),
within AS (
    SELECT la.label, CAST(COUNT(*) AS BIGINT) AS ec
    FROM e0 JOIN labels la ON e0.src = la.node
            JOIN labels lb ON e0.dst = lb.node
    WHERE la.label = lb.label
    GROUP BY la.label
),
degsum AS (
    SELECT label, CAST(SUM(d) AS BIGINT) AS dc FROM (
        SELECT v, COUNT(*) AS d FROM (
            SELECT src AS v FROM e0 UNION ALL SELECT dst AS v FROM e0)
        GROUP BY v) deg
    JOIN labels ON deg.v = labels.node
    GROUP BY label
),
terms AS (
    SELECT d.label,
           COALESCE(w.ec, 0) / m.m
             - (d.dc / (CAST(2 AS DOUBLE) * m.m))
               * (d.dc / (CAST(2 AS DOUBLE) * m.m)) AS term
    FROM degsum d LEFT JOIN within w USING (label) CROSS JOIN m
),
folded AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(
                   list_sort(list(struct_pack(label := label,
                                              term := term))),
                   e -> e.term)),
               (a, b) -> a + b) AS modularity
    FROM terms
)
SELECT n_communities, modularity FROM folded
"""


@query("lpa_modularity_parts", oracle=_modularity_oracle(_LPA_ITERS))
def lpa_modularity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity Q of the 3-round LPA partition of the part graph —
    the standard community-quality score (Newman 2006): Q = sum over
    communities of (within-edge share minus the squared degree share).
    All inputs are integer counts; each community's term uses the same
    correctly rounded op order on both engines and the community terms
    fold in label-sorted order (the sorted-fold device), so Q is
    hash-exact. One row out: the partition audit a community-detection
    pipeline reports."""
    from stadvdb_olap_spark.operators.graph import label_propagation

    e0 = _part_pairs(spark, sf_dir)
    edges = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = label_propagation(edges, n_iters=_LPA_ITERS)
    m_row = e0.agg(F.count(F.lit(1)).cast("double").alias("m"))
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("la"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("lb"))
    within = (
        e0.join(la, "src")
        .join(lb, "dst")
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("ec"))
    )
    deg = (
        e0.select(F.col("src").alias("v"))
        .unionAll(e0.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    degsum = (
        deg.join(labels, deg["v"] == labels["node"])
        .groupBy("label")
        .agg(F.sum("d").cast("long").alias("dc"))
    )
    k = F.col("dc") / (F.lit(2.0) * F.col("m"))
    terms = (
        degsum.join(within, "label", "left")
        .crossJoin(F.broadcast(m_row))
        .select(
            "label",
            (
                F.coalesce(F.col("ec"), F.lit(0)) / F.col("m") - k * k
            ).alias("term"),
        )
    )
    folded = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("label", "term"))),
            F.lit(0.0),
            lambda acc, e: acc + e["term"],
        ).alias("modularity"),
    )
    return folded


_KCORE_K = 90
_KCORE_ROUNDS = 3


def _kcore_oracle(k: int, n_rounds: int) -> str:
    """Replay kcore_peel exactly: n_rounds of (degree, keep, filter)
    over the part co-occurrence graph, every stage MATERIALIZED (the
    chain references each e{i} twice for degrees and once for the
    filter — DuckDB would otherwise inline and re-evaluate)."""
    stages = []
    prev = "e0"
    for i in range(1, n_rounds + 1):
        stages.append(
            f"""
d{i} AS MATERIALIZED (
    SELECT v, COUNT(*) AS d FROM (
        SELECT src AS v FROM {prev}
        UNION ALL SELECT dst AS v FROM {prev})
    GROUP BY v
),
k{i} AS MATERIALIZED (SELECT v FROM d{i} WHERE d >= {k}),
e{i} AS MATERIALIZED (
    SELECT e.src, e.dst FROM {prev} e
    JOIN k{i} a ON e.src = a.v
    JOIN k{i} b ON e.dst = b.v
)"""
        )
        prev = f"e{i}"
    chain = ",".join(stages)
    return f"""
WITH {_PART_E0_SQL},{chain}
SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT src AS node FROM {prev}
    UNION ALL SELECT dst AS node FROM {prev})
GROUP BY node
"""


@query(
    "kcore_parts_k90",
    oracle=_kcore_oracle(_KCORE_K, _KCORE_ROUNDS),
)
def kcore_parts_k90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nodes surviving 3 peel rounds toward the 90-core of the part
    co-occurrence graph, with their degree in the surviving subgraph —
    the dense-cohesion screen (recommendation cores, fraud rings,
    community seeds). Pure integer counting per round, so the unrolled
    plan is hash-exact against the chained-CTE replay. At 100 TB each
    round is one degree aggregation + two survivor joins keyed on node
    ids — the vertex-centric sweep bounded-budget k-core uses on any
    distributed engine."""
    from stadvdb_olap_spark.operators.graph import kcore_peel

    e0 = _part_pairs(spark, sf_dir)
    return kcore_peel(e0, k=_KCORE_K, n_rounds=_KCORE_ROUNDS)


def _wpagerank_chain_sql(n_iters: int) -> tuple[str, str]:
    """Weighted twin of :func:`_pagerank_chain_sql` over an
    ``edges(src, dst, w)`` CTE: per-node out-STRENGTH replaces
    out-degree and each contribution is pr · (w / strength) — the
    exact op order of the weighted branch of ``pagerank_fixed``."""
    its = []
    prev = "p0"
    for k in range(1, n_iters + 1):
        its.append(
            f"""
i{k} AS MATERIALIZED (
    SELECT e.dst AS node,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_sort(list(p.pr * (CAST(e.w AS DOUBLE) / p.outdeg)))),
               (a, b) -> a + b) AS s
    FROM edges e JOIN {prev} p ON e.src = p.node
    GROUP BY e.dst
),
p{k} AS MATERIALIZED (
    SELECT i.node, d.outdeg, {_BASE_LIT} / nn.n + {_D_LIT} * i.s AS pr
    FROM i{k} i JOIN deg d ON i.node = d.node CROSS JOIN nn
)"""
        )
        prev = f"p{k}"
    chain = f"""
deg AS MATERIALIZED (
    SELECT src AS node, CAST(SUM(w) AS DOUBLE) AS outdeg
    FROM edges GROUP BY src
),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
p0 AS MATERIALIZED (
    SELECT node, outdeg, CAST(1 AS DOUBLE) / nn.n AS pr
    FROM deg CROSS JOIN nn
),{",".join(its)}"""
    return chain, prev


_WE0_SQL = """
we0 AS MATERIALIZED (
    SELECT CAST(o_custkey AS BIGINT) * 2 AS src,
           CAST(l_suppkey AS BIGINT) * 2 + 1 AS dst,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS w
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY 1, 2
)"""


def _wpagerank_oracle(n_iters: int) -> str:
    chain, last = _wpagerank_chain_sql(n_iters)
    return f"""
WITH {_WE0_SQL},
edges AS MATERIALIZED (
    SELECT src, dst, w FROM we0 UNION ALL SELECT dst, src, w FROM we0
),{chain}
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
           AS node_type,
       node // 2 AS node_key,
       pr
FROM {last}
"""


@query(
    "pagerank_weighted_copurchase_3iter", oracle=_wpagerank_oracle(_ITERS)
)
def pagerank_weighted_copurchase_3iter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WEIGHTED PageRank (3 fixed iterations, d=0.85) over the
    customer↔supplier graph with edge weight = number of distinct
    orders connecting the pair — repeat business pulls rank, which is
    what a purchasing-network centrality actually wants (the unweighted
    twin treats one order and fifty identically). Same certification
    devices as pagerank_copurchase_3iter plus one: each contribution
    multiplies the rank by a per-edge norm w/strength that divides two
    exact integers once, so the sorted fold still sees engine-identical
    doubles. Weights come from the same orders⋈lineitem pass that built
    the edge list — no extra scan."""
    orders = load_spread(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").cast("long").alias("c"),
    )
    li = load_spread(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_suppkey").cast("long").alias("s"),
    )
    we0 = (
        orders.join(li, "ok")
        .groupBy(
            (F.col("c") * 2).alias("src"),
            (F.col("s") * 2 + 1).alias("dst"),
        )
        .agg(F.count_distinct("ok").cast("long").alias("w"))
    )
    edges = we0.unionAll(
        we0.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    pr = pagerank_fixed(
        edges, n_iters=_ITERS, damping=_DAMPING, weight="w"
    )
    return pr.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node DIV 2").alias("node_key"),
        "pr",
    )


@query(
    "hits_copurchase_2iter",
    oracle="""
WITH e AS MATERIALIZED (
    SELECT DISTINCT CAST(o_custkey AS BIGINT) AS c,
           CAST(l_suppkey AS BIGINT) AS s
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
a1 AS MATERIALIZED (
    SELECT s, CAST(COUNT(*) AS BIGINT) AS a FROM e GROUP BY s
),
h1 AS MATERIALIZED (
    SELECT c, CAST(SUM(a) AS BIGINT) AS h
    FROM e JOIN a1 USING (s) GROUP BY c
),
a2 AS MATERIALIZED (
    SELECT s, CAST(SUM(h) AS BIGINT) AS a
    FROM e JOIN h1 USING (c) GROUP BY s
),
h2 AS MATERIALIZED (
    SELECT c, CAST(SUM(a) AS BIGINT) AS h
    FROM e JOIN a2 USING (s) GROUP BY c
),
mh AS (SELECT CAST(MAX(h) AS BIGINT) AS m FROM h2),
ma AS (SELECT CAST(MAX(a) AS BIGINT) AS m FROM a2)
SELECT 'hub_customer' AS node_type, c AS node_key, h AS score,
       CAST(h AS DOUBLE) / m AS score_norm
FROM h2 CROSS JOIN mh
UNION ALL
SELECT 'authority_supplier' AS node_type, s AS node_key, a AS score,
       CAST(a AS DOUBLE) / m AS score_norm
FROM a2 CROSS JOIN ma
""",
)
def hits_copurchase_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) on the bipartite
    customer→supplier purchase graph, 2 full power iterations
    UNNORMALIZED: customers that buy broadly from important suppliers
    are hubs, suppliers bought by important hubs are authorities.
    Skipping the per-step normalization keeps every score an EXACT
    BIGINT (a1 = indegree; each later step is an integer-sum join —
    h2 peaks ~1e8 at sf0.1 and stays far under 2^63 at 1000x), so the
    only float op is the final score/max division — no sorted-fold
    needed at all, the strongest determinism device in the graph
    family (cf. the sorted-fold PageRank). HITS ranks are invariant to
    the skipped scaling because normalization multiplies each side by
    a constant per step. 100 TB shape: vertex-centric — each
    iteration is one edges-to-scores hash join plus one key-grouped
    integer aggregate; edge relation partitions once per join key,
    max-score scalars broadcast."""
    orders = load_spread(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").cast("long").alias("c"),
    )
    li = load_spread(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_suppkey").cast("long").alias("s"),
    )
    e = orders.join(li, "ok").select("c", "s").distinct()
    a1 = e.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("a"))
    h1 = (
        e.join(a1, "s")
        .groupBy("c")
        .agg(F.sum("a").cast("long").alias("h"))
    )
    a2 = (
        e.join(h1, "c")
        .groupBy("s")
        .agg(F.sum("h").cast("long").alias("a"))
    )
    h2 = (
        e.join(a2, "s")
        .groupBy("c")
        .agg(F.sum("a").cast("long").alias("h"))
    )
    mh = h2.agg(F.max("h").cast("long").alias("m"))
    ma = a2.agg(F.max("a").cast("long").alias("m"))
    hubs = h2.crossJoin(F.broadcast(mh)).select(
        F.lit("hub_customer").alias("node_type"),
        F.col("c").alias("node_key"),
        F.col("h").alias("score"),
        (F.col("h").cast("double") / F.col("m")).alias("score_norm"),
    )
    auths = a2.crossJoin(F.broadcast(ma)).select(
        F.lit("authority_supplier").alias("node_type"),
        F.col("s").alias("node_key"),
        F.col("a").alias("score"),
        (F.col("a").cast("double") / F.col("m")).alias("score_norm"),
    )
    return hubs.unionAll(auths)


@query(
    "triangle_census_copurchase_parts",
    oracle="""
WITH pp AS MATERIALIZED (
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    WHERE a.l_partkey % 10 = 0 AND b.l_partkey % 10 = 0
),
tri AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM pp e1
    JOIN pp e2 ON e2.pa = e1.pb
    JOIN pp e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
),
deg AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT pa AS node FROM pp UNION ALL SELECT pb AS node FROM pp
    ) GROUP BY node
),
agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges,
           CAST(MAX(d) AS BIGINT) AS max_degree
    FROM deg
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pp) AS n_edges,
       agg.n_nodes, agg.max_degree, agg.n_wedges, tri.n_triangles,
       CASE WHEN agg.n_wedges = 0 THEN 0.0
            ELSE 3.0 * tri.n_triangles / agg.n_wedges END
           AS global_clustering
FROM agg CROSS JOIN tri
""",
)
def triangle_census_copurchase_parts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TRIANGLE CENSUS + global clustering coefficient over the
    part-copurchase projection (parts co-ordered in the same order;
    thinned to every-10th part so the projection's density stays
    scale-proportional, the orphan-audit thinning precedent). Triangles
    are counted by degree-ordered adjacency intersection
    (operators/graph.py:triangle_count_oriented) — each triangle counted
    EXACTLY once at its base edge, the same integer the oracle's
    id-ordered two-join closure produces, with hub out-degrees bounded
    by the orientation; wedges = sum over nodes of deg-choose-2 (BIGINT
    DIV), and 3*triangles/wedges is the one final float. 100 TB shape:
    the pair-generation shuffle keys on the order id (within-order
    quadratic only — basket sizes are bounded), the orientation and
    adjacency joins key on vertex ids."""
    li = load_spread(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).filter(F.col("pk") % 10 == 0)
    a = li.select("ok", F.col("pk").alias("pa"))
    b = li.select("ok", F.col("pk").alias("pb"))
    pp = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
    )
    from stadvdb_olap_spark.operators.graph import triangle_count_oriented

    tri = triangle_count_oriented(pp, src="pa", dst="pb")
    deg = (
        pp.select(F.col("pa").alias("node"))
        .unionAll(pp.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    agg = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) DIV 2")).cast("long").alias("n_wedges"),
        F.max("d").cast("long").alias("max_degree"),
    )
    edges = pp.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        F.broadcast(edges)
        .crossJoin(F.broadcast(agg))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_edges", "n_nodes", "max_degree", "n_wedges", "n_triangles",
            F.when(F.col("n_wedges") == 0, F.lit(0.0))
            .otherwise(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges")
            )
            .alias("global_clustering"),
        )
    )
