"""Graph operator tests: PageRank exactness + invariants, neighborhood
Jaccard by hand."""

from __future__ import annotations

from pyspark.sql import functions as F

from stadvdb_olap_spark.operators.graph import (
    neighborhood_jaccard,
    pagerank_fixed,
)


def _expected_pagerank(edges, n_iters=3, damping=0.85):
    """Driver-side replication with the SAME op order as the operator:
    sorted-fold contribution sums, base/n + d*s."""
    from collections import defaultdict

    out = defaultdict(list)
    outdeg = defaultdict(int)
    for s, d in edges:
        out[s].append(d)
        outdeg[s] += 1
    nodes = sorted(outdeg)
    n = float(len(nodes))
    base = 1.0 - damping
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(n_iters):
        contribs = defaultdict(list)
        for s, ds in out.items():
            c = pr[s] / float(outdeg[s])
            for d in ds:
                contribs[d].append(c)
        new = {}
        for v in nodes:
            acc = 0.0
            for c in sorted(contribs[v]):
                acc += c
            new[v] = base / n + damping * acc
        pr = new
    return pr


def test_pagerank_matches_driver_replication_bitexact(spark):
    # Asymmetric-degree graph: path + chord, symmetrized.
    und = [(1, 2), (2, 3), (3, 4), (1, 3)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["pr"] for r in pagerank_fixed(df, 3).collect()}
    assert got == _expected_pagerank(edges, 3)  # exact float equality


def test_pagerank_regular_graph_stays_uniform(spark):
    # Triangle: every node keeps pr == 1/3 under any iteration count
    # (regular graphs are PageRank fixed points).
    und = [(1, 2), (2, 3), (1, 3)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, "src long, dst long")
    expected = _expected_pagerank(edges, 4)
    got = {r["node"]: r["pr"] for r in pagerank_fixed(df, 4).collect()}
    assert got == expected
    for v in got.values():
        assert abs(v - 1.0 / 3.0) < 1e-15


def test_pagerank_mass_conserved_on_symmetric_graph(spark):
    from stadvdb_olap_spark.plans.graph_queries import _copurchase_edges

    e0 = _copurchase_edges(spark, "/root/testdata/sf0.001")
    edges = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    prs = [r["pr"] for r in pagerank_fixed(edges, 2).collect()]
    assert abs(sum(prs) - 1.0) < 1e-9  # no dangling mass leaks
    assert all(p > 0 for p in prs)


def test_neighborhood_jaccard_by_hand(spark):
    # src customers {10,11,12}; dst suppliers {1,2,3}.
    edges = [
        (10, 1), (10, 2),
        (11, 1), (11, 2),
        (12, 2), (12, 3),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["jaccard"])
        for r in neighborhood_jaccard(df, min_common=1).collect()
    }
    # supplier 1: {10,11}; supplier 2: {10,11,12}; supplier 3: {12}
    assert rows[(1, 2)] == (2, 2 / 3)  # |{10,11}| / |{10,11,12}|
    assert rows[(2, 3)] == (1, 1 / 3)
    assert (1, 3) not in rows  # no shared customer
    # min_common filters
    filtered = neighborhood_jaccard(df, min_common=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in filtered} == {(1, 2)}


def test_countmin_counters_are_mergeable(spark):
    """Counters built on two disjoint halves SUM to the whole-corpus
    counters — the property that lets 100 TB count-min build per
    partition and add."""
    from stadvdb_olap_spark.functions.text import tokens
    from stadvdb_olap_spark.plans.sketch_queries import _CM_D, _cm_bucket
    from stadvdb_olap_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    toks = docs.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(tokens("text")).alias("term"),
    ).filter(F.length("term") > 0)

    def counters(df):
        cells = df.select(
            "half",
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
        ).select("half", "e.r", "e.b")
        return cells

    whole = {
        (r["r"], r["b"]): r["cnt"]
        for r in counters(toks)
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    halves = counters(toks).groupBy("half", "r", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    merged: dict = {}
    for row in halves.collect():
        k = (row["r"], row["b"])
        merged[k] = merged.get(k, 0) + row["cnt"]
    assert merged == whole


def test_bloom_words_are_mergeable(spark):
    """Bloom words built on two disjoint halves OR to the whole-set
    words (bit_or is the merge)."""
    from stadvdb_olap_spark.plans.sketch_queries import _BF_K, _bf_pos
    from stadvdb_olap_spark.sources.parquet import load_table

    cust = load_table(spark, "/root/testdata/sf0.001", "customer")
    pos = cust.select(
        (F.col("c_custkey") % 2).alias("half"),
        F.explode(
            F.array(*[_bf_pos(F.col("c_custkey"), i) for i in range(_BF_K)])
        ).alias("p"),
    )
    setbit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))")
    word_of = F.expr("p DIV 32")
    whole = {
        r["word"]: r["bits"]
        for r in pos.groupBy(word_of.alias("word"))
        .agg(F.bit_or(setbit).alias("bits"))
        .collect()
    }
    merged: dict = {}
    for r in (
        pos.groupBy("half", word_of.alias("word"))
        .agg(F.bit_or(setbit).alias("bits"))
        .collect()
    ):
        merged[r["word"]] = merged.get(r["word"], 0) | r["bits"]
    assert merged == whole


def test_lsh_multiprobe_dominates_plain_config(spark):
    """Multi-probe's candidate set is a strict superset of the plain
    config's (same planes/tables), so at every (query, rank) its ranked
    cosine is >= the plain path's, and recall vs brute force can only
    rise."""
    from stadvdb_olap_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
    )
    from stadvdb_olap_spark.sources.parquet import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    kw = dict(k=5, n_planes=6, n_tables=4)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(q, emb, k=5).collect()
    }
    plain = lsh_bucketed_topk(q, emb, **kw).collect()
    probed = lsh_bucketed_topk(q, emb, multiprobe=True, **kw).collect()
    plain_c = {(r["query_id"], r["rank"]): r["cosine"] for r in plain}
    probed_c = {(r["query_id"], r["rank"]): r["cosine"] for r in probed}
    for key, c in plain_c.items():
        assert key in probed_c and probed_c[key] >= c
    rec = lambda rows: len({(r["query_id"], r["neighbor_id"]) for r in rows} & exact) / len(exact)  # noqa: E731
    assert rec(probed) >= rec(plain)


def test_hll_registers_merge_by_max_and_estimate_is_sound(spark):
    """Registers from two disjoint halves MAX-merge to the whole-set
    registers, and the standard corrected estimate computed from the
    certified register table lands within 15% of the exact distinct
    count (m=256 -> 6.5% RSE; 15% > 2 sigma)."""
    import math

    from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded
    from stadvdb_olap_spark.sources.parquet import load_table

    _ensure_loaded()
    sf = "/root/testdata/sf0.01"
    regs = {
        r["j"]: r["register"]
        for r in REGISTRY["hll_registers_users_events"].fn(spark, sf).collect()
    }

    # mergeability: split events by user parity, registers MAX together
    ev = load_table(spark, sf, "events")
    halves = [ev.filter(F.col("user_id") % 2 == i) for i in (0, 1)]
    merged: dict = {}
    from stadvdb_olap_spark.operators.mixture import salted_md5

    def registers_of(df):
        h = salted_md5("user_id", "hll:")
        s = F.substring(h, 3, 12)
        z = F.length(F.regexp_extract(s, "^0*", 0))
        base = df.select(
            (F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % 256).alias("j"),
            s.alias("__s"),
            z.alias("__z"),
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
        return {
            r["j"]: r["register"]
            for r in base.select("j", rho.alias("r"))
            .groupBy("j")
            .agg(F.max("r").alias("register"))
            .collect()
        }

    for half in halves:
        for j, m_ in registers_of(half).items():
            merged[j] = max(merged.get(j, 0), m_)
    assert merged == regs

    # corrected estimate from the certified registers
    m = 256
    s_sum = sum(2.0 ** -regs.get(j, 0) for j in range(m))
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / s_sum
    zeros = m - len(regs)
    est = m * math.log(m / zeros) if (raw <= 2.5 * m and zeros > 0) else raw
    exact = ev.select("user_id").distinct().count()
    assert abs(est - exact) / exact <= 0.15


def test_rendezvous_reshard_moves_only_to_the_new_shard(spark):
    """THE defining HRW property, exact not statistical: going from n to
    n+1 shards, every key that moves moves TO the new shard (a key
    changes owner only if the new shard's hash beats its previous
    winner), and roughly 1/(n+1) of keys move."""
    from stadvdb_olap_spark.operators.mixture import rendezvous_shard
    from stadvdb_olap_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    both = docs.select(
        "doc_id",
        rendezvous_shard("doc_id", 8).alias("s8"),
        rendezvous_shard("doc_id", 9).alias("s9"),
    ).collect()
    moved = [r for r in both if r["s8"] != r["s9"]]
    assert all(r["s9"] == 8 for r in moved)  # only ever to the new shard
    frac = len(moved) / len(both)
    assert 0.03 <= frac <= 0.25  # ~1/9 expected, generous band
    # and every shard id is in range for both configs
    assert all(0 <= r["s8"] < 8 and 0 <= r["s9"] < 9 for r in both)


def test_label_propagation_matches_replication_and_finds_cliques(spark):
    """Deterministic synchronous LPA equals a driver-side replication
    exactly, and two cliques joined by one bridge resolve to two
    communities labelled by each clique's min id."""
    from collections import Counter, defaultdict

    from stadvdb_olap_spark.operators.graph import label_propagation

    und = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    edges = und + [(b, a) for a, b in und]

    def replicate(n_iters):
        inn = defaultdict(list)
        for s, d in edges:
            inn[d].append(s)
        labels = {v: v for v in inn}
        for _ in range(n_iters):
            new = {}
            for v, nbrs in inn.items():
                c = Counter(labels[u] for u in nbrs)
                best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
            labels = new
        return labels

    df = spark.createDataFrame(edges, "src long, dst long")
    for k in (1, 3):
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, n_iters=k).collect()
        }
        assert got == replicate(k)
    final = {
        r["node"]: r["label"] for r in label_propagation(df, 3).collect()
    }
    # the first clique holds its min label; across the bridge the
    # min-tiebreak floods low labels, so 5 and 6 agree with each other
    # (exact values are already pinned by the replication check above)
    assert final[1] == final[2] == final[3] == 1
    assert final[5] == final[6]


def test_triangle_stats_by_hand(spark):
    """Two triangles sharing no edge + one bridge: exactly 2 triangles;
    wedges from the degree sequence; clustering = 3*2/wedges."""
    from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded

    _ensure_loaded()
    # build the tiny graph through the operator shapes directly
    und = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    e0 = spark.createDataFrame(und, "src long, dst long")
    deg = (
        e0.select(F.col("src").alias("v"))
        .unionAll(e0.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    degs = {r["v"]: r["d"] for r in deg.collect()}
    assert degs == {1: 2, 2: 2, 3: 3, 4: 3, 5: 2, 6: 2}
    wedges = sum(d * (d - 1) // 2 for d in degs.values())
    p1 = e0.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    p2 = e0.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    closing = e0.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = p1.join(p2, "b").join(closing, ["a", "c"]).count()
    assert tri == 2
    assert wedges == 4 * 1 + 2 * 3  # four deg-2 nodes + two deg-3 nodes


def test_triangle_count_oriented_equals_wedge_join(spark):
    """The degree-ordered adjacency-intersection count (r13: replaces
    the wedge self-join inside triangle queries) equals the naive
    id-ordered wedge-join count on a random graph WITH A HUB — the
    exact case the orientation exists for — and on hand graphs."""
    import itertools
    import random

    from stadvdb_olap_spark.operators.graph import triangle_count_oriented

    rng = random.Random(13)
    nodes = list(range(30))
    edges = {(a, b) for a in nodes for b in nodes if a < b and rng.random() < 0.2}
    edges |= {(0, b) for b in nodes[1:]}  # node 0 is a hub
    adj = {v: set() for v in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    e0 = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = triangle_count_oriented(e0).collect()[0]["n_triangles"]
    assert got == want and want > 50

    # triangle-free graph -> 0 (coalesced, not null)
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    assert triangle_count_oriented(path).collect()[0]["n_triangles"] == 0


def test_kcore_peel_keeps_clique_drops_tail(spark):
    from stadvdb_olap_spark.operators.graph import kcore_peel

    # K4 on {1,2,3,4} plus a tail 4-5-6: 3 peel rounds at k=3 must strip
    # the tail (deg 1/2 nodes) and keep exactly the clique at degree 3.
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges += [(4, 5), (5, 6)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r.node, r.deg) for r in kcore_peel(e, k=3, n_rounds=3).collect()
    }
    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}


def test_kcore_peel_zero_rounds_is_identity_degrees(spark):
    from stadvdb_olap_spark.operators.graph import kcore_peel

    e = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    got = {(r.node, r.deg) for r in kcore_peel(e, k=99, n_rounds=0).collect()}
    assert got == {(1, 1), (2, 2), (3, 1)}


def test_weighted_pagerank_reduces_to_unweighted_on_unit_weights(spark):
    # With all weights 1 the weighted branch must produce the same
    # RANKING as unweighted (values differ only by the extra multiply's
    # rounding, which cancels nowhere — so compare to a tolerance).
    und = [(1, 2), (2, 3), (3, 4), (1, 3)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(
        [(a, b, 1) for a, b in edges], "src long, dst long, w long"
    )
    unw = {r["node"]: r["pr"] for r in pagerank_fixed(df, 3).collect()}
    wtd = {
        r["node"]: r["pr"]
        for r in pagerank_fixed(df, 3, weight="w").collect()
    }
    assert set(unw) == set(wtd)
    for n in unw:
        assert abs(unw[n] - wtd[n]) < 1e-12
    assert sorted(unw, key=unw.get) == sorted(wtd, key=wtd.get)


def test_weighted_pagerank_heavy_edge_pulls_rank(spark):
    # Star with one heavy spoke: the heavy neighbor must outrank the
    # light ones under weighted PR while unweighted ties them.
    und = [(0, 1, 10), (0, 2, 1), (0, 3, 1)]
    edges = und + [(b, a, w) for a, b, w in und]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    wtd = {
        r["node"]: r["pr"]
        for r in pagerank_fixed(df, 3, weight="w").collect()
    }
    assert wtd[1] > wtd[2]
    assert abs(wtd[2] - wtd[3]) < 1e-15


def test_pca_projection_basis_is_orthonormal_and_centered(spark):
    # the pinned basis must actually be a PCA basis: unit-norm,
    # orthogonal directions, and the projected corpus ~zero-mean at the
    # fit scale (sf0.001).
    import math

    from stadvdb_olap_spark.plans.vector_queries import (
        _PCA_MU,
        _PCA_V1,
        _PCA_V2,
        pca_projection_embeddings,
    )

    n1 = sum(x * x for x in _PCA_V1)
    n2 = sum(x * x for x in _PCA_V2)
    dot = sum(a * b for a, b in zip(_PCA_V1, _PCA_V2))
    assert math.isclose(n1, 1.0, rel_tol=1e-9)
    assert math.isclose(n2, 1.0, rel_tol=1e-9)
    assert abs(dot) < 1e-9
    rows = pca_projection_embeddings(
        spark, "/root/testdata/sf0.001"
    ).collect()
    m1 = sum(r.pc1 for r in rows) / len(rows)
    m2 = sum(r.pc2 for r in rows) / len(rows)
    assert abs(m1) < 1e-9 and abs(m2) < 1e-9


def test_kmv_bottomk_is_mergeable(spark):
    """KMV min-wise mergeability: the bottom-k of a union equals the
    bottom-k of the UNION OF PER-SHARD BOTTOM-K STATES — so per-shard
    sketches merge at k-sized cost. Also: fewer than k values means the
    kth row simply doesn't exist (no padding row to mis-estimate on)."""
    from pyspark.sql import functions as F

    from stadvdb_olap_spark.plans.sketch_queries import bottomk_hashes

    import hashlib

    def hv(s):
        return int(hashlib.md5(str(s).encode()).hexdigest()[:12], 16)

    rows_a = [("g", hv(f"a{i}")) for i in range(200)]
    rows_b = [("g", hv(f"b{i}")) for i in range(300)] + [
        ("tiny", hv(i)) for i in range(7)
    ]
    k = 32
    a = spark.createDataFrame(rows_a, "priority string, hv long")
    b = spark.createDataFrame(rows_b, "priority string, hv long")
    whole = bottomk_hashes(a.union(b), "priority", "hv", k)
    merged = bottomk_hashes(
        bottomk_hashes(a, "priority", "hv", k)
        .drop("rn")
        .union(bottomk_hashes(b, "priority", "hv", k).drop("rn")),
        "priority",
        "hv",
        k,
    )
    got_whole = sorted(
        (r["priority"], r["hv"], r["rn"]) for r in whole.collect()
    )
    got_merged = sorted(
        (r["priority"], r["hv"], r["rn"]) for r in merged.collect()
    )
    assert got_whole == got_merged
    # exact bottom-k vs a python reference
    want_g = sorted(h for p, h in rows_a + rows_b if p == "g")[:k]
    assert [h for p, h, _ in got_whole if p == "g"] == want_g
    # the 7-value group yields 7 rows, ranks 1..7 — never a kth row
    tiny = [(h, rn) for p, h, rn in got_whole if p == "tiny"]
    assert len(tiny) == 7 and [rn for _, rn in tiny] == list(range(1, 8))
