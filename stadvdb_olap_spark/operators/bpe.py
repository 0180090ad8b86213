"""Distributed BPE (byte-pair-encoding) tokenizer training.

The real merge-loop algorithm (Sennrich et al. 2016, the public BPE
formulation every LLM tokenizer descends from), shaped for Spark:

1. ONE corpus-wide pass builds the word-frequency vocabulary — the only
   fact-sized shuffle. Everything after runs on the VOCABULARY
   DataFrame (bounded: ~10⁵-10⁶ rows at any corpus size — Heaps' law),
   which is why BPE training scales to 100 TB: the corpus contributes
   counts once, the iterations never touch it again.
2. Each of ``n_merges`` rounds: explode adjacent symbol pairs from the
   word vocabulary (weighted by word count), aggregate pair counts,
   pick the argmax pair (count desc, then lexicographic pair — fully
   deterministic), and rewrite every word's symbol array merging that
   pair (left-to-right, non-overlapping — the pandas step; the vocab is
   small, so the per-round cost is a vocabulary-sized map + a
   vocabulary-sized aggregate).
3. The merge list IS the tokenizer; ``bpe_encode`` applies the merges
   in learned order to any text.

The driver loop is bounded by ``n_merges`` (a config, not data) — the
same bounded-iteration discipline as ``connected_components``. Rounds
``localCheckpoint`` the evolving vocab every few merges to cut lineage.

Determinism: word splits, pair counting, argmax tie-break, and
left-to-right merge application are all order-free or explicitly
ordered, so the learned merge table is identical at any parallelism —
property-tested against a pure-Python reference implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stadvdb_olap_spark.functions.text import tokens

END = "</w>"  # end-of-word sentinel, per the public BPE formulation


def _merge_symbols(symbols: list[str], a: str, b: str) -> list[str]:
    """Merge every non-overlapping left-to-right (a, b) adjacency."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus pass: (word, count) with words split to character symbols
    + the end-of-word sentinel. The ONLY fact-sized aggregation."""
    words = docs.select(F.explode(tokens(text_col)).alias("word")).where(
        F.col("word") != ""
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    symbols = F.concat(
        F.split(F.col("word"), ""), F.array(F.lit(END))
    )
    return counts.select("word", "n", symbols.alias("symbols"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    idx = F.sequence(F.lit(0), F.size("symbols") - 2)
    return (
        vocab.where(F.size("symbols") >= 2)
        .select(
            "n",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.col("symbols")[i].alias("a"),
                        F.col("symbols")[i + 1].alias("b"),
                    ),
                )
            ).alias("p"),
        )
        .groupBy("p.a", "p.b")
        .agg(F.sum("n").alias("cnt"))
    )


def bpe_train(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns (rank, left, right, pair_count).

    Stops early when no pair reaches ``min_pair_count`` (nothing left
    worth merging). The returned rank order is the application order."""
    vocab = word_vocab(docs, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merges.append((rank, a, b, int(cnt)))

        def apply_merge(pdf, a=a, b=b):
            pdf["symbols"] = [
                _merge_symbols(list(s), a, b) for s in pdf["symbols"]
            ]
            return pdf

        vocab = vocab.mapInPandas(
            lambda it, a=a, b=b: (
                apply_merge(pdf, a, b) for pdf in it
            ),
            vocab.schema,
        )
        if (rank + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return spark.createDataFrame(
        merges, "rank long, left string, right string, pair_count long"
    )


def pair_frontier_after(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    top: int = 10,
) -> DataFrame:
    """The BPE TRAINING STEP as a closed-form aggregate: pair counts of
    the corpus vocabulary AFTER applying ``merges`` in order, ranked
    exactly as ``bpe_train``'s argmax (count desc, then lexicographic
    pair). Row 1 IS the next merge the trainer would learn; the top-k
    rows are the candidate frontier.

    Same device as the DuckDB replay oracle (``_bpe_replay_sql`` in
    plans/curation_queries.py): each symbol rides CHR(31)-wrapped in a
    space-joined state string, so one merge is EXACTLY one left-to-right
    non-overlapping literal ``replace`` — the same scan semantics as
    ``_merge_symbols``, and expressible identically in Spark and SQL.
    This is what lets the iterative trainer's per-round step be
    hash-certified cross-engine (the k-means Lloyd-step treatment).

    100 TB shape: ONE fact-sized shuffle (the word-count pass — Heaps'
    law bounds the vocabulary), then narrow per-word expression work,
    one vocabulary-sized pair aggregate, and a TakeOrdered(top)."""
    us = "\x1f"
    words = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    state = F.concat(
        F.regexp_replace("word", "(.)", f"{us}$1{us} "),
        F.lit(f"{us}{END}{us}"),
    )
    for a, b in merges:
        state = F.replace(
            state,
            F.lit(f"{us}{a}{us} {us}{b}{us}"),
            F.lit(f"{us}{a + b}{us}"),
        )
    syms = words.select("n", F.split(state, " ").alias("arr"))
    idx = F.sequence(F.lit(0), F.size("arr") - 2)
    pairs = syms.where(F.size("arr") >= 2).select(
        "n",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.col("arr")[i].alias("a"),
                    F.col("arr")[i + 1].alias("b"),
                ),
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(
            F.btrim(F.col("p.a"), F.lit(us)).alias("left_sym"),
            F.btrim(F.col("p.b"), F.lit(us)).alias("right_sym"),
        )
        .agg(F.sum("n").cast("long").alias("pair_cnt"))
        .orderBy(F.col("pair_cnt").desc(), "left_sym", "right_sym")
        .limit(top)
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize text with a learned merge list (applied in rank order
    per word, the standard greedy BPE encoder). The merge list is a
    broadcast-sized plain Python list riding the mapInPandas closure —
    never a join."""

    import re

    # EXACTLY the certified tokenizer's split class (explicit ASCII
    # whitespace: space, tab, LF, VT, FF, CR — the same explicit class
    # `tokens()`/`tokens_sql` use, immune to the Java-\s-vs-RE2-\s \x0b
    # gap). Python str.split()/str.strip() additionally break on Unicode
    # whitespace (U+00A0, U+2028, \x1c-\x1f), which would silently
    # diverge from the cross-engine device the replay oracle certifies
    # against — so NO .strip(): edge whitespace only yields empty split
    # pieces, which the `if not w` filter already drops. NULL text
    # encodes as empty.
    ws = re.compile(r"[ \t\n\x0b\x0c\r]+")

    def encode_batch(pdfs):
        for pdf in pdfs:
            out = []
            for t in pdf[text_col]:
                toks: list[str] = []
                text = "" if t is None else str(t)
                for w in ws.split(text.lower()):
                    if not w:
                        continue
                    syms = list(w) + [END]
                    for a, b in merges:
                        syms = _merge_symbols(syms, a, b)
                    toks.extend(syms)
                out.append(toks)
            yield type(pdf)({"doc_id": pdf[id_col], "bpe_tokens": out})

    return docs.select(id_col, text_col).mapInPandas(
        encode_batch, "doc_id long, bpe_tokens array<string>"
    )
