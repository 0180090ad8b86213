"""Row-local quality/safety screen COLUMN expressions.

ONE definition shared by the certified standalone catalog queries
(``blocklist_screen_docs``, ``gopher_rules_filter_docs``,
``quality_logit_filter_docs``) and the curation pipeline's screen stage,
which fuses all three keep verdicts into a SINGLE narrow filter over one
documents scan — no joins, no re-scans, whole-stage codegen end to end.
Because the standalone queries build their outputs from these same
expressions, the app-embedded screen can never drift from the
hash-certified semantics.

Every expression here is row-local (token arrays, higher-order folds,
literal weights) — scan-bound at any corpus size.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

from stadvdb_olap_spark.functions.text import (
    quality_stats,
    tokens,
    word_shingles,
)

# Pinned content blocklist — the multi-term screen a safety filter runs
# (terms chosen to hit the synthetic fixture's vocabulary).
BLOCKLIST: tuple[str, ...] = (
    "error", "null", "undefined", "lorem", "spam",
    "xxx", "casino", "deprecated",
)

# Fixture-vocabulary subset of Gopher's stopword list (Rae et al. 2021).
GOPHER_STOPWORDS: tuple[str, ...] = ("the", "a")

# Published linear quality classifier (the pinned-weights device):
# logit over certified quality signals; thresholding the logit IS
# thresholding the probability (sigmoid is monotone).
QUALITY_WEIGHTS: dict[str, float] = {
    "bias": -2.5,
    "stopword_ratio": 9.0,
    "mean_word_len": 0.35,
    "punct_ratio": -6.0,
    "len_capped": 0.004,  # per token, capped at 500
}
QUALITY_KEEP_LOGIT = 0.0  # keep iff logit >= this (p >= 0.5)


def blocklist_hits(col: Column | str = "text") -> Column:
    """The blocklisted tokens of the text (array<string>)."""
    return F.filter(tokens(col), lambda t: t.isin(*BLOCKLIST))


def blocklist_keep(col: Column | str = "text") -> Column:
    """Zero-tolerance blocklist verdict: keep iff no hits."""
    return F.size(blocklist_hits(col)) == 0


def gopher_features(col: Column | str = "text") -> dict[str, Column]:
    """The Gopher rule-stack's feature signals, each a row-local
    expression (the repetition signals use the sorted-array-run device,
    never explode+regroup)."""
    t = tokens(col)
    sh = word_shingles(col, 2)
    n = F.size(t)
    run = F.aggregate(
        F.array_sort(t),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best, F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    sw = F.array([F.lit(s) for s in GOPHER_STOPWORDS])
    return {
        "n_tokens": n.cast("long"),
        "mean_word_len": (
            F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
            .cast("double")
            / n
        ),
        "n_stop": F.size(F.filter(t, lambda x: F.array_contains(sw, x))).cast(
            "long"
        ),
        "dup_word_frac": (
            F.lit(1.0) - F.size(F.array_distinct(t)).cast("double") / n
        ),
        "top_word_frac": run.cast("double") / n,
        "dup_bigram_frac": (
            F.lit(1.0) - F.size(F.array_distinct(sh)).cast("double") / F.size(sh)
        ),
    }


def gopher_rules(f: Mapping[str, Column]) -> dict[str, Column]:
    """The published Gopher thresholds over the feature signals —
    callable on materialized feature COLUMNS (the standalone query's
    two-step shape) or directly on :func:`gopher_features` expressions
    (the fused single-filter shape)."""
    return {
        "ok_len": f["n_tokens"].between(50, 100000),
        "ok_word_len": f["mean_word_len"].between(3.0, 10.0),
        "ok_stopwords": f["n_stop"] >= 2,
        "ok_dup_words": f["dup_word_frac"] <= 0.80,
        "ok_top_word": f["top_word_frac"] <= 0.20,
        "ok_dup_bigrams": f["dup_bigram_frac"] <= 0.40,
    }


def gopher_keep(col: Column | str = "text") -> Column:
    """Rule-stack verdict: fail zero rules."""
    keep = None
    for c in gopher_rules(gopher_features(col)).values():
        keep = c if keep is None else keep & c
    return keep


def quality_logit(col: Column | str = "text") -> Column:
    """The published linear classifier's logit over the certified
    quality signals."""
    stats = quality_stats(col, GOPHER_STOPWORDS)
    len_capped = F.least(stats["n_tokens"], F.lit(500)).cast("double")
    return (
        F.lit(QUALITY_WEIGHTS["bias"])
        + F.lit(QUALITY_WEIGHTS["stopword_ratio"]) * stats["stopword_ratio"]
        + F.lit(QUALITY_WEIGHTS["mean_word_len"]) * stats["mean_word_len"]
        + F.lit(QUALITY_WEIGHTS["punct_ratio"]) * stats["punct_ratio"]
        + F.lit(QUALITY_WEIGHTS["len_capped"]) * len_capped
    )


def quality_logit_keep(col: Column | str = "text") -> Column:
    return quality_logit(col) >= F.lit(QUALITY_KEEP_LOGIT)
