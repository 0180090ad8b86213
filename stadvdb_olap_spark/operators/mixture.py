"""Training-data mixture assembly: decontamination, source weighting,
token budgets, and shard layout.

The last mile of a pretraining corpus pipeline, after curation
(operators/pipeline.py) has produced clean deduplicated documents:

1. decontaminate   — remove training documents that share an n-gram with
                     any held-out evaluation document, so benchmark
                     numbers measure generalization, not memorization.
2. weighted sample — per-source sampling rates (the "mixture weights"
                     of a data recipe), deterministic per key.
3. token budget    — cap each source's contribution at a token budget,
                     taking documents in a content-addressed order.
4. shard layout    — assign every document a (shard, position) so the
                     corpus materializes as N independently-ordered
                     shard files, the layout trainers stream.

No counterpart exists in the reference (its pipeline ends at the star
schema); this extends the curation surface the way SURVEY.md §6's
training-data brief requires. Everything is deterministic — membership
and order are pure functions of document keys — so two engines (or two
runs at different cluster sizes) assemble byte-identical mixtures; every
operator here is DuckDB-oracle-checkable.

Scale notes (100 TB):
- Decontamination joins on the shingle hash — work is proportional to
  matching shingles, never |train| x |heldout|; the held-out side is a
  benchmark suite (tiny) and broadcasts.
- Weighted sampling and budget-taking are a narrow map + filter and a
  single per-source window respectively. The per-source cumulative sum
  is sequential BY DESIGN (a prefix in a pinned order defines "which
  documents fit the budget"); sources are the parallel unit. A heavily
  skewed source can be pre-split by hash range into sub-budgets.
- Shard layout shuffles once on the shard id; within-shard positions
  are per-partition window ranks, never a global single-partition sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from stadvdb_olap_spark.functions.text import token_count, word_shingles
from stadvdb_olap_spark.operators.joins import broadcast_if_small


def salted_md5(key: Column | str, salt: str) -> Column:
    """md5 over ``salt || key-as-string`` — an independent uniform draw
    per (salt, key), reproducible in any engine. Distinct salts decouple
    the mixture decisions (sampling, budget order, shard) from each other
    and from the train/val/test split hash."""
    c = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat(F.lit(salt), c.cast("string")).cast("binary"))


def split_column(id_col: Column | str = "doc_id") -> Column:
    """The CERTIFIED train/val/test split device — one definition so the
    four call sites (split query, curation pipeline, decontamination,
    contamination scoring) can never desynchronize from each other or
    from their oracles' `_SPLIT_SQL` twin: first md5 hex byte of the id,
    '< cc' ≈ 80% train, '< e6' ≈ 10% val, rest test. Content-free and
    engine-free: stable across runs, partitionings, and data growth."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    bucket = F.substring(F.md5(c.cast("string").cast("binary")), 1, 2)
    return (
        F.when(bucket < "cc", "train")
        .when(bucket < "e6", "val")
        .otherwise("test")
    )


def decontaminate(
    train: DataFrame,
    heldout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
) -> DataFrame:
    """Drop every training document sharing at least one word
    ``shingle_n``-gram with any held-out document.

    The standard n-gram decontamination pass run before pretraining so
    eval benchmarks stay out of the training set. Both sides explode to
    distinct shingle hashes; the join is keyed on the hash (bounded
    width), so the candidate work is only actual shingle collisions.
    The held-out side is DISTINCT shingles of a benchmark suite — small —
    and broadcasts; at worst the join shuffles on the shingle hash."""
    t_sh = train.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, shingle_n))).alias("__sh"),
    ).select(id_col, F.md5(F.col("__sh")).alias("__shh"))
    h_sh = (
        heldout.select(
            F.explode(F.array_distinct(word_shingles(text_col, shingle_n))).alias(
                "__sh"
            )
        )
        .select(F.md5(F.col("__sh")).alias("__shh"))
        .distinct()
    )
    contaminated = (
        t_sh.join(broadcast_if_small(h_sh), "__shh").select(id_col).distinct()
    )
    return train.join(contaminated, id_col, "left_anti")


def weighted_source_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix:",
) -> DataFrame:
    """Per-source deterministic Bernoulli sampling — the mixture-weights
    step of a data recipe (e.g. upsample curated sources, downsample
    crawl). A document survives iff its salted key hash falls under its
    source's rate; membership is a pure function of (salt, key), so the
    recipe reproduces anywhere. Narrow map + filter: no shuffle."""
    bucket = F.substring(salted_md5(key_col, salt), 1, 4)  # 65536 buckets

    def cutoff(rate: float) -> str:
        return format(min(int(rate * 65536), 65536), "05x")[-4:] if rate < 1.0 else "g"
        # 'g' > 'ffff' lexicographically: rate 1.0 keeps everything

    expr = F.lit(cutoff(default_rate))
    for src, rate in sorted(rates.items()):
        expr = F.when(F.col(source_col) == src, F.lit(cutoff(rate))).otherwise(expr)
    return df.filter(bucket < expr)


def token_budget_take(
    df: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    key_col: str = "doc_id",
    salt: str = "budget:",
) -> DataFrame:
    """Cap each source at ``budget_tokens``: order its documents by salted
    key hash (a deterministic "random" order) and keep the prefix whose
    running token total stays within budget. Returns the kept rows plus
    their ``cum_tokens`` running total. One shuffle, on the source key."""
    w = (
        Window.partitionBy(source_col)
        .orderBy(salted_md5(key_col, salt), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("n_tokens", token_count(text_col))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
    )


def training_shards(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "shard:",
) -> DataFrame:
    """Assign every row a (shard, shard_pos): shard = hash mod n_shards,
    position = rank of the salted hash within the shard. The corpus then
    materializes as ``n_shards`` independently-ordered files — the layout
    trainers stream round-robin for a deterministic global shuffle
    WITHOUT a global sort: the only exchange is on the shard id, and
    each shard orders independently (never one partition holding the
    world)."""
    h = salted_md5(key_col, salt)
    shard = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % n_shards).alias(
        "shard"
    )
    with_shard = df.withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(salted_md5(key_col, salt), F.col(key_col))
    return with_shard.withColumn("shard_pos", F.row_number().over(w).cast("long"))


def rendezvous_shard(
    key: Column | str, n_shards: int, salt: str = "hrw"
) -> Column:
    """Rendezvous (highest-random-weight) shard id: the shard whose
    salted hash of the key is LARGEST wins. Unlike mod-hash
    (:func:`training_shards`), resharding n -> n+1 moves ONLY the keys
    the new shard wins (~1/(n+1) of them, each moving TO the new shard
    — an exact property, tested) instead of reshuffling ~all keys; the
    coordination-free layout device for growable shard sets. A pure
    narrow expression: n hashes + one greatest() per row, no shuffle.
    The struct compares (hash, shard) lexicographically; md5 collisions
    are the only tie source, i.e. none in practice."""
    return F.greatest(
        *[
            F.struct(
                salted_md5(key, f"{salt}{s}:").alias("h"),
                F.lit(s).cast("long").alias("s"),
            )
            for s in range(n_shards)
        ]
    ).getField("s")


def contamination_scores(
    train: DataFrame,
    heldout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
) -> DataFrame:
    """GRADED eval-contamination scores — the thresholdable uplift over
    :func:`decontaminate`'s drop-on-any-hit: per training document, the
    fraction of its distinct word ``shingle_n``-grams that also occur
    anywhere in the held-out corpus. ONE definition shared by the
    certified catalog query (``contamination_score_docs``) and the
    curation pipeline's decontaminate stage, so the app-embedded scores
    can never drift from the hash-certified ones. Returns
    ``(id, n_shingles, n_contaminated, contamination_frac)``.

    Scale shape: the held-out side reduces to DISTINCT shingles (a
    benchmark suite — small) and goes through the size-gated
    ``broadcast_if_small``; the train side explodes to per-doc distinct
    shingles and the join keys on the shingle, so work tracks actual
    collisions, never the cross product."""
    h_sh = (
        heldout.select(
            F.explode(
                F.array_distinct(word_shingles(text_col, shingle_n))
            ).alias("sh")
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    t_sh = train.select(
        id_col,
        F.explode(F.array_distinct(word_shingles(text_col, shingle_n))).alias(
            "sh"
        ),
    )
    scored = (
        t_sh.join(broadcast_if_small(h_sh), "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("n_contaminated"),
        )
    )
    return scored.select(
        id_col,
        "n_shingles",
        "n_contaminated",
        F.when(F.col("n_shingles") == 0, F.lit(0.0))
        .otherwise(
            F.col("n_contaminated").cast("double") / F.col("n_shingles")
        )
        .alias("contamination_frac"),
    )


def decontaminate_bloom_gated(
    train: DataFrame,
    heldout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    m_words: int = 256,
    k_hashes: int = 3,
) -> DataFrame:
    """``decontaminate`` with a Bloom-filter RUNTIME PREFILTER — the
    scale path for when the held-out shingle set is too big to
    broadcast: the exact shingle join then shuffles EVERY train shingle,
    but a (m_words x 64)-bit Bloom mask of the held-out shingles (a few
    KB, always broadcastable) drops the non-colliding train shingles
    BEFORE that shuffle. Bloom membership has NO false negatives (the
    same salted-md5 positions build and probe the mask), so the final
    EXACT join over surviving shingles returns exactly
    ``decontaminate``'s answer — certified by using the exact path as
    the oracle. False positives only cost verify work, never
    correctness. This is the same runtime-filter discipline Spark's own
    bloom pruning applies to joins, expressed as catalog-level ops."""
    bits_total = m_words * 64

    def positions(sh_col):
        return [
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"bf{i}:"), sh_col)), 1, 8),
                16,
                10,
            ).cast("long")
            % bits_total
            for i in range(k_hashes)
        ]

    h_sh = (
        heldout.select(
            F.explode(
                F.array_distinct(word_shingles(text_col, shingle_n))
            ).alias("__sh")
        )
        .select(F.md5(F.col("__sh")).alias("__shh"))
        .distinct()
    )
    bloom = (
        h_sh.select(
            F.explode(F.array(*positions(F.col("__shh")))).alias("pos")
        )
        .select(
            F.expr("CAST(pos DIV 64 AS BIGINT)").alias("word_idx"),
            # SQL shiftleft takes a column bit count (the pyspark
            # function wrapper would demand a Python int literal)
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )
    t_sh = train.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_shingles(text_col, shingle_n))
        ).alias("__sh"),
    ).select(id_col, F.md5(F.col("__sh")).alias("__shh"))
    probes = t_sh.select(
        id_col,
        "__shh",
        F.explode(F.array(*positions(F.col("__shh")))).alias("pos"),
    ).select(
        id_col,
        "__shh",
        (F.col("pos") / 64).cast("long").alias("word_idx"),
        (F.col("pos") % 64).cast("int").alias("bit"),
    )
    # inner join vs the broadcast mask: a missing word means the bit is
    # unset, the probe row drops, and the all-k condition below fails
    survivors = (
        probes.join(F.broadcast(bloom), "word_idx")
        .where(F.expr("((bits >> bit) & 1) = 1"))
        .groupBy(id_col, "__shh")
        .agg(F.count(F.lit(1)).alias("__k_set"))
        .where(F.col("__k_set") == k_hashes)
        .select(id_col, "__shh")
    )
    contaminated = (
        survivors.join(broadcast_if_small(h_sh), "__shh")
        .select(id_col)
        .distinct()
    )
    return train.join(contaminated, id_col, "left_anti")
