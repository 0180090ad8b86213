"""Corpus curation — the training-data pipeline stages composed end to end.

Each stage is one of the engine's tested operators; this module only
chains them, in the order a pretraining data pipeline runs them:

1. quality gate   — cheap column-expression filters first (narrow, no
                    shuffle), so later stages see fewer rows
2. language gate  — n-gram/stopword heuristic filter
3. exact dedup    — hash-aggregate on normalized content, keep min id
4. near-dup prune — MinHash/LSH candidates -> Jaccard verify -> connected
                    components; only cluster canonicals survive
5. split          — deterministic md5-range train/val/test assignment

Every stage is deterministic, so the curated corpus is reproducible
byte-for-byte across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stadvdb_olap_spark.functions.text import lang_scores, quality_stats
from stadvdb_olap_spark.operators.text_dedup import (
    dedup_clusters,
    exact_dedup_groups,
)

DEFAULT_STOPWORDS = ("the", "a")


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_stopword_ratio: float = 0.9,
    languages: tuple[str, ...] | None = None,
    lang_profiles: dict[str, tuple[str, ...]] | None = None,
    jaccard_threshold: float = 0.5,
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Curated corpus: (id, text, lang_pred, split) for every surviving
    document. Survivors are quality-passing, language-matching cluster
    canonicals (exact and near-dup losers removed)."""
    stats = quality_stats(text_col, stopwords)
    gated = docs.filter(
        (stats["n_tokens"] >= min_tokens)
        & (stats["stopword_ratio"] <= max_stopword_ratio)
    )

    if lang_profiles:
        gated = gated.withColumn("lang_pred", lang_scores(text_col, lang_profiles))
        if languages:
            gated = gated.filter(F.col("lang_pred").isin(*languages))
    else:
        gated = gated.withColumn("lang_pred", F.lit(None).cast("string"))

    # Exact dedup: survivors are each content-hash group's canonical id.
    exact_keep = exact_dedup_groups(gated, id_col, text_col).select(
        F.col("canonical_id").alias(id_col)
    )
    gated = gated.join(exact_keep, id_col)

    # Near-dup prune: every clustered doc that is NOT its cluster canonical
    # is dropped (canonicals and unclustered docs survive).
    clusters = dedup_clusters(
        gated, id_col, text_col, jaccard_threshold
    )
    losers = clusters.filter(F.col(id_col) != F.col("canonical_id")).select(id_col)
    survivors = gated.join(losers, id_col, "left_anti")

    from stadvdb_olap_spark.operators.mixture import split_column

    return survivors.select(
        id_col,
        text_col,
        "lang_pred",
        split_column(id_col).alias("split"),
    )
