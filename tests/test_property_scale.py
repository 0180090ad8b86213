"""Property-based tests (hypothesis) for the scale-pattern operators:
salting must never change join results, chunk-range planning must tile
documents exactly. Spark-session examples are capped small — the point is
adversarial shapes (nulls, hot keys, empty sides), not volume."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stadvdb_olap_spark.functions.udtfs import ChunkRanges
from stadvdb_olap_spark.operators.joins import salted_equi_join

keys = st.one_of(st.none(), st.integers(min_value=0, max_value=3))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(keys, st.integers(0, 100)), max_size=12),
    right=st.lists(st.tuples(keys, st.text("ab", max_size=2)), max_size=6),
    n_salts=st.integers(min_value=1, max_value=4),
)
def test_salting_never_changes_the_join(spark, left, right, n_salts):
    """For ANY inputs — hot keys, null keys, empty sides — the salted join
    equals the plain inner join as a multiset. Nulls never match in either
    form; a key appearing k_l x k_r times yields k_l*k_r rows in both."""
    ldf = spark.createDataFrame(left, "k bigint, v bigint")
    rdf = spark.createDataFrame(right, "rk bigint, tag string")
    got = sorted(
        tuple(r)
        for r in salted_equi_join(
            ldf, rdf, left_key="k", right_key="rk", n_salts=n_salts
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in ldf.join(rdf, ldf.k == rdf.rk).select("k", "v", "tag").collect()
    )
    assert got == want


@given(
    n=st.integers(min_value=0, max_value=500),
    chunk=st.integers(min_value=1, max_value=60),
    stride=st.integers(min_value=1, max_value=60),
)
@settings(max_examples=200, deadline=None)
def test_chunk_ranges_tile_exactly(n, chunk, stride):
    """Chunk planning invariants for every (n, chunk, stride): indexes are
    contiguous from 0, starts advance by exactly `stride`, ends clip to n,
    every token is covered when stride <= chunk, and nothing exceeds n."""
    rows = list(ChunkRanges.func().eval(n, chunk, stride))
    if n == 0:
        assert rows == []
        return
    assert [r[0] for r in rows] == list(range(len(rows)))
    assert [r[1] for r in rows] == [i * stride for i in range(len(rows))]
    assert all(end == min(start + chunk, n) for _, start, end in rows)
    assert all(end <= n for _, _, end in rows)
    if stride <= chunk:
        # gapless tiling: every token covered, last chunk reaches the end
        assert rows[-1][2] == n
        covered = set()
        for _, start, end in rows:
            covered.update(range(start, end))
        assert covered == set(range(n))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 30)), min_size=1, max_size=10
    ),
    b=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 30)), min_size=1, max_size=10
    ),
    bucket=st.integers(min_value=1, max_value=17),
)
def test_interval_overlap_join_equals_naive(spark, a, b, bucket):
    """For ANY interval sets and ANY bucket width, the bucketed overlap
    join equals the naive theta join — completeness does not depend on
    bucket tuning (intervals here are [start, start+len] in raw units)."""
    from stadvdb_olap_spark.operators.joins import interval_overlap_join

    adf = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(a)],
        "a_id long, a_start long, a_end long",
    )
    bdf = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(b)],
        "b_id long, b_start long, b_end long",
    )
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            adf, bdf, "a_start", "a_end", "b_start", "b_end", bucket_us=bucket
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (s1, l1) in enumerate(a)
        for j, (s2, l2) in enumerate(b)
        if s1 <= s2 + l2 and s2 <= s1 + l1
    )
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("ab"), min_size=1, max_size=9).map("".join).map(
            lambda w: w  # single token
        ).flatmap(
            lambda _: st.lists(
                st.sampled_from(["aa", "ab", "ba", "bb", "xy"]),
                min_size=1,
                max_size=8,
            ).map(" ".join)
        ),
        min_size=1,
        max_size=8,
    ),
    seg_len=st.integers(1, 3),
    min_df=st.integers(1, 3),
)
def test_segment_dedup_matches_python_reference(spark, docs, seg_len, min_df):
    """For ANY corpus over a tiny vocabulary and ANY (segment length,
    doc-frequency threshold), segment_dedup reproduces a direct Python
    computation of drop-duplicated-segments-and-reassemble."""
    import math

    from stadvdb_olap_spark.operators.curation import segment_dedup

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["kept_text"], r["n_segments"], r["n_dropped"])
        for r in segment_dedup(
            df, "doc_id", "text", seg_len=seg_len, min_doc_freq=min_df
        ).collect()
    }

    def segments(text):
        toks = text.split()
        return [
            " ".join(toks[i * seg_len : (i + 1) * seg_len])
            for i in range(math.ceil(len(toks) / seg_len))
        ]

    seg_docs = {}
    for i, text in enumerate(docs):
        for seg in segments(text):
            seg_docs.setdefault(seg, set()).add(i)
    want = {}
    for i, text in enumerate(docs):
        segs = segments(text)
        kept = [s for s in segs if len(seg_docs[s]) < min_df]
        want[i] = (" ".join(kept), len(segs), len(segs) - len(kept))
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base_l=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 99)),
                    max_size=12),
    delta_l=st.lists(st.tuples(st.integers(0, 5), st.integers(100, 199)),
                     max_size=6),
    base_r=st.lists(st.tuples(st.integers(0, 5), st.integers(200, 299)),
                    max_size=12),
    delta_r=st.lists(st.tuples(st.integers(0, 5), st.integers(300, 399)),
                     max_size=6),
)
def test_join_delta_identity(spark, base_l, delta_l, base_r, delta_r):
    """For ANY append-only deltas: full join of the appended tables ==
    base join ∪ join_delta output, as multisets."""
    from collections import Counter

    from stadvdb_olap_spark.operators.maintenance import join_delta

    schema_l, schema_r = "k int, lv int", "k int, rv int"

    def df(rows, schema):
        return spark.createDataFrame(rows or [(None, None)], schema).where(
            "k IS NOT NULL"
        )

    bl, dl = df(base_l, schema_l), df(delta_l, schema_l)
    br, dr = df(base_r, schema_r), df(delta_r, schema_r)

    full = Counter(
        (r["k"], r["lv"], r["rv"])
        for r in bl.unionByName(dl).join(br.unionByName(dr), "k").collect()
    )
    base = Counter(
        (r["k"], r["lv"], r["rv"]) for r in bl.join(br, "k").collect()
    )
    delta = Counter(
        (r["k"], r["lv"], r["rv"])
        for r in join_delta(bl, dl, br, dr, on=["k"]).collect()
    )
    assert base + delta == full


def test_binary_quant_degenerates_to_exact_with_full_prefilter(spark):
    """prefilter >= corpus makes the BQ coarse pass a no-op: the rerank
    must return exactly the brute-force top-k."""
    from stadvdb_olap_spark.operators.similarity import (
        binary_quant_topk,
        brute_force_topk,
    )
    from stadvdb_olap_spark.sources.parquet import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter("vec_id < 3")
    exact = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in brute_force_topk(queries, emb, k=5).collect()
    }
    bq = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in binary_quant_topk(
            queries, emb, k=5, prefilter=10_000_000
        ).collect()
    }
    assert bq == exact


@settings(max_examples=50, deadline=None)
@given(
    syms=st.lists(st.sampled_from(["a", "b", "ab", "c"]), max_size=12),
    pair=st.tuples(
        st.sampled_from(["a", "b", "ab", "c"]),
        st.sampled_from(["a", "b", "ab", "c"]),
    ),
)
def test_bpe_merge_symbols_invariants(syms, pair):
    """_merge_symbols preserves concatenation and consumes exactly the
    non-overlapping left-to-right occurrences."""
    from stadvdb_olap_spark.operators.bpe import _merge_symbols

    a, b = pair
    out = _merge_symbols(syms, a, b)
    assert "".join(out) == "".join(syms)
    # count of merges == greedy non-overlapping occurrence count
    n_merged = len(syms) - len(out)
    i = greedy = 0
    while i < len(syms) - 1:
        if syms[i] == a and syms[i + 1] == b:
            greedy += 1
            i += 2
        else:
            i += 1
    assert n_merged == greedy


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 8),
    h=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
def test_ppm_codec_roundtrip(w, h, seed):
    """decode(encode(img)) == img for any image, and decode rejects
    truncated payloads."""
    import numpy as np
    import pytest as _pytest

    from stadvdb_olap_spark.operators.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    with _pytest.raises(ValueError):
        decode_ppm(encode_ppm(img)[:-1])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(st.integers(min_value=0, max_value=900), min_size=1, max_size=40),
    ctx=st.integers(min_value=1, max_value=128),
    n_shards=st.integers(min_value=1, max_value=4),
)
def test_concat_pack_tiles_every_shard(spark, weights, ctx, n_shards):
    """For ANY item weights (including zeros), context length, and shard
    count: within each shard the start offsets tile the concatenated
    stream with no gap or overlap, and chunk addressing matches the
    integer arithmetic."""
    from stadvdb_olap_spark.operators.packing import concat_pack

    items = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id bigint, n_tokens bigint"
    )
    rows = concat_pack(items, ctx_len=ctx, n_shards=n_shards).collect()
    assert len(rows) == len(weights)
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for members in by_shard.values():
        total = sum(r["n_tokens"] for r in members)
        # zero-weight items share a start offset with their successor, so
        # the strict no-gap/no-overlap tiling applies to the rows that
        # actually consume stream; zero-weight rows must still sit at a
        # valid offset inside the stream.
        expect = 0
        for r in sorted(
            (r for r in members if r["n_tokens"] > 0),
            key=lambda r: r["start_off"],
        ):
            assert r["start_off"] == expect
            first = r["start_off"] // ctx
            last = (r["start_off"] + r["n_tokens"] - 1) // ctx
            assert r["chunk_first"] == first
            assert r["n_chunks_spanned"] == last - first + 1
            expect += r["n_tokens"]
        assert expect == total
        for r in members:
            if r["n_tokens"] == 0:
                assert 0 <= r["start_off"] <= total
                # zero tokens consumed => zero chunks spanned, always
                assert r["n_chunks_spanned"] == 0
                assert r["chunk_first"] == r["start_off"] // ctx


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=30
    ),
    cuts=st.lists(
        st.integers(min_value=-500, max_value=500), min_size=1, max_size=15
    ),
)
def test_zorder_bucket_is_monotone_cut_count(spark, values, cuts):
    """zorder_bucket == the count of cuts strictly below the value, for
    ANY values and cut multiset — monotone in the value (curve locality)
    and bounded by len(cuts)."""
    from pyspark.sql import functions as F

    from stadvdb_olap_spark.operators.maintenance import zorder_bucket

    df = spark.createDataFrame([(v,) for v in values], "v bigint")
    got = {
        r["v"]: r["b"]
        for r in df.select(
            "v", zorder_bucket(F.col("v"), [float(c) for c in cuts]).alias("b")
        ).collect()
    }
    for v in values:
        assert got[v] == sum(1 for c in cuts if v > c)


def test_zorder_key_pinned_rejects_overflowing_cuts():
    """More cuts than the per-dimension bit budget can address must raise
    (the interleave would silently mask high bucket bits otherwise)."""
    import pytest
    from pyspark.sql import functions as F

    from stadvdb_olap_spark.operators.maintenance import zorder_key_pinned

    # 2 bits address at most 3 cuts (4 buckets); 4 cuts must raise.
    with pytest.raises(ValueError, match="at most 3 cuts"):
        zorder_key_pinned(
            [(F.col("a"), [1.0, 2.0, 3.0, 4.0])], bits_per_dim=2
        )
    # At-the-cap is fine (pure expression construction, no session needed).
    zorder_key_pinned([(F.col("a"), [1.0, 2.0, 3.0])], bits_per_dim=2)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ).filter(lambda p: p[0] < p[1]),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    k=st.integers(min_value=1, max_value=4),
    rounds=st.integers(min_value=1, max_value=3),
)
def test_kcore_peel_matches_python_reference(spark, edges, k, rounds):
    from stadvdb_olap_spark.operators.graph import kcore_peel

    def peel(es, k, rounds):
        es = set(es)
        for _ in range(rounds):
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            keep = {v for v, d in deg.items() if d >= k}
            es = {(a, b) for a, b in es if a in keep and b in keep}
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        return deg

    expected = peel(edges, k, rounds)
    df = spark.createDataFrame(list(edges), "src long, dst long")
    got = {
        r.node: r.deg for r in kcore_peel(df, k=k, n_rounds=rounds).collect()
    }
    assert got == expected
    # k-monotonicity: a higher bar never keeps more nodes
    got_hi = {
        r.node
        for r in kcore_peel(df, k=k + 1, n_rounds=rounds).collect()
    }
    assert got_hi <= set(got)


def test_twap_bounded_by_group_extremes(spark):
    from stadvdb_olap_spark.plans.series_queries import (
        twap_daily_value_by_type,
    )
    from stadvdb_olap_spark.sources.parquet import load_table
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    twap = twap_daily_value_by_type(spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events").groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    joined = twap.join(ev, ["event_type", "d"]).collect()
    assert joined
    for r in joined:
        # weighted mean of in-group observations (last one excluded as
        # weightless) stays within the group's value envelope
        assert r.vmin - 1e-9 <= r.twap <= r.vmax + 1e-9


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 10**6)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[1],
    ),
    width=st.integers(min_value=1, max_value=16),
    n=st.integers(min_value=2, max_value=7),
)
def test_offset_rank_equals_window_for_any_bucket_width(
    spark, vals, width, n
):
    """For ANY data (ties in the value column, any monotone bucket
    width, any ntile n) the bucketed two-phase offset rank and ntile
    equal the textbook unpartitioned-window definitions exactly —
    the bucket choice affects only the plan, never the answer."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stadvdb_olap_spark.operators.rank import (
        global_ntile,
        global_row_number,
    )

    df = spark.createDataFrame(vals, "v bigint, id bigint")
    bucket = F.expr(f"v DIV {width}")
    got_r = {
        (r["id"], r["gr"])
        for r in global_row_number(
            df, ["v", "id"], bucket=bucket, out="gr"
        ).collect()
    }
    w = Window.orderBy("v", "id")
    want_r = {
        (r["id"], r["gr"])
        for r in df.select(
            "id", F.row_number().over(w).cast("long").alias("gr")
        ).collect()
    }
    assert got_r == want_r
    got_n = {
        (r["id"], r["b"])
        for r in global_ntile(
            df, ["v", "id"], n, bucket=bucket, out="b"
        ).collect()
    }
    want_n = {
        (r["id"], r["b"])
        for r in df.select(
            "id", F.ntile(n).over(w).cast("long").alias("b")
        ).collect()
    }
    assert got_n == want_n


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    old=st.dictionaries(
        st.integers(0, 6),
        st.tuples(st.one_of(st.none(), st.text("xy", max_size=2)),
                  st.one_of(st.none(), st.integers(0, 9))),
        max_size=7,
    ),
    new=st.dictionaries(
        st.integers(0, 6),
        st.tuples(st.one_of(st.none(), st.text("xy", max_size=2)),
                  st.one_of(st.none(), st.integers(0, 9))),
        max_size=7,
    ),
)
def test_generate_apply_cdc_roundtrip_property(spark, old, new):
    """For ANY pair of keyed snapshots — overlapping, disjoint, empty,
    with NULL attributes — apply_cdc(old, generate_cdc(old, new)) == new
    as a multiset, and the feed contains no row for unchanged keys."""
    from stadvdb_olap_spark.operators.merge import apply_cdc, generate_cdc

    schema = "k long, s string, v long"
    odf = spark.createDataFrame(
        [(k, s, v) for k, (s, v) in old.items()], schema
    )
    ndf = spark.createDataFrame(
        [(k, s, v) for k, (s, v) in new.items()], schema
    )
    feed = generate_cdc(odf, ndf, keys=["k"])
    rows = feed.collect()
    unchanged = {
        k for k in set(old) & set(new) if old[k] == new[k]
    }
    assert not [r for r in rows if r["k"] in unchanged]
    replayed = apply_cdc(odf, feed, keys=["k"])
    assert sorted(map(tuple, replayed.collect())) == sorted(
        (k, s, v) for k, (s, v) in new.items()
    )
