"""Independent plain-Python references for the round-6 text/vector
statistics queries (the parity suite certifies Spark == DuckDB; these
catch a formula both SQL twins could share wrongly)."""

from __future__ import annotations

import re
from collections import Counter

import duckdb
import numpy as np
import pytest

from tests.conftest import SF_DIR


def test_collocation_lift_matches_python_reference(spark):
    from stadvdb_olap_spark.plans.text_queries import (
        _COLLOC_MIN_SUPPORT,
        _COLLOC_TOPK,
        collocation_lift_bigrams,
    )

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    ]
    bigrams: Counter = Counter()
    c1: Counter = Counter()
    c2: Counter = Counter()
    for t in texts:
        toks = re.split(r"\s+", t.strip().lower())
        for a, b in zip(toks, toks[1:]):
            bigrams[(a, b)] += 1
            c1[a] += 1
            c2[b] += 1
    n = sum(bigrams.values())
    scored = [
        (c12 * n / (c1[w1] * c2[w2]), w1, w2, c12)
        for (w1, w2), c12 in bigrams.items()
        if c12 >= _COLLOC_MIN_SUPPORT
    ]
    scored.sort(key=lambda r: (-r[0], r[1], r[2]))
    want = scored[:_COLLOC_TOPK]
    got = sorted(
        collocation_lift_bigrams(spark, SF_DIR).collect(),
        key=lambda r: r.rk,
    )
    assert len(got) == min(_COLLOC_TOPK, len(scored))
    for g, (lift, w1, w2, c12) in zip(got, want):
        assert (g.w1, g.w2, g.c12) == (w1, w2, c12)
        assert g.lift == lift  # exact: one division of exact integers


def test_embedding_centroid_drift_matches_numpy_reference(spark):
    from stadvdb_olap_spark.plans.vector_queries import (
        embedding_centroid_drift_labels,
    )

    rows = duckdb.sql(
        f"SELECT label, embedding FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    by_label: dict = {}
    for label, emb in rows:
        by_label.setdefault(label, []).append(np.asarray(emb, dtype=np.float64))
    cents = {
        lbl: np.mean(np.stack(vs), axis=0) for lbl, vs in by_label.items()
    }
    got = embedding_centroid_drift_labels(spark, SF_DIR).collect()
    labels = sorted(cents)
    assert len(got) == len(labels) * (len(labels) - 1) // 2
    for r in got:
        a, b = cents[r.label_a], cents[r.label_b]
        cos_ref = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        l2_ref = float(np.linalg.norm(a - b))
        assert r.label_a < r.label_b
        # numpy sums in a different order -> approx; exact cross-engine
        # equality is the parity suite's job (sorted-fold canon)
        assert r.cosine == pytest.approx(cos_ref, rel=1e-9)
        assert r.l2 == pytest.approx(l2_ref, rel=1e-9)
        assert -1.0 - 1e-12 <= r.cosine <= 1.0 + 1e-12
        assert r.l2 >= 0.0


def _merges(df):
    return [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in df.orderBy("rank").collect()
    ]


@pytest.mark.parametrize("frontier", [1, 4, 16])
def test_bpe_frontier_equals_sequential_on_corpus(spark, frontier):
    """Frontier-batched training == the sequential trainer, merge for
    merge (rank, pair, count), on a real corpus slice at every batch
    width — frontier=1 degenerates to the sequential path, 16 is the
    catalog query's width."""
    from stadvdb_olap_spark.operators.bpe import bpe_train, bpe_train_frontier

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cats eat the fish"),
            (3, "low lower lowest low low"),
            (4, "newer newest new new new"),
        ],
        ["doc_id", "text"],
    )
    want = _merges(bpe_train(spark, docs, 12))
    got = _merges(bpe_train_frontier(spark, docs, 12, frontier=frontier))
    assert got == want and len(got) > 5


def test_bpe_frontier_equals_sequential_adversarial(spark):
    """Corpora built to trip each admission rule:

    - `zab`*N: the merged symbol's created pairs become the NEXT argmax
      (prefix rule must stop the batch at 1);
    - `abu/abv` + `cd`: a disjoint pair survives the prefix rule and the
      created-pair bounds admit a 2-merge batch;
    - `ab` words where `ab` later re-merges next to `</w>` twice (the
      new-symbol rule's alphabet-collision path).
    Every one must equal the sequential trajectory exactly."""
    from stadvdb_olap_spark.operators.bpe import bpe_train, bpe_train_frontier

    corpora = [
        ["zab zab zab zab zab zab"] * 2,
        ["abu abu abu abu abv abv abv cd cd cd cd cd"],
        ["ab ab ab ab a b ab aab aab", "babab babab abab"],
        ["xy xy yx yx yx xyx yxy xxyy"],
    ]
    for i, texts in enumerate(corpora):
        docs = spark.createDataFrame(
            [(j, t) for j, t in enumerate(texts)], ["doc_id", "text"]
        )
        want = _merges(bpe_train(spark, docs, 10))
        got = _merges(bpe_train_frontier(spark, docs, 10, frontier=8))
        assert got == want, f"corpus {i}: {got} != {want}"


def test_bpe_frontier_batches_more_than_one(spark):
    """The batching must actually batch — on the disjoint-pair corpus
    the first round admits >= 2 merges (fewer driver round trips), which
    is the entire point of the frontier variant."""
    from stadvdb_olap_spark.operators import bpe as bpe_mod

    docs = spark.createDataFrame(
        [(1, "abu abu abu abu abv abv abv cd cd cd cd cd")],
        ["doc_id", "text"],
    )
    calls = {"n": 0}
    orig = bpe_mod._pair_counts

    def counting(vocab):
        calls["n"] += 1
        return orig(vocab)

    bpe_mod._pair_counts = counting
    try:
        got = _merges(bpe_mod.bpe_train_frontier(docs.sparkSession, docs, 6))
    finally:
        bpe_mod._pair_counts = orig
    assert len(got) == 6
    assert calls["n"] < 6, f"no batching happened: {calls['n']} rounds for 6 merges"
