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
