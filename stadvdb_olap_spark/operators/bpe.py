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
   deterministic), and rewrite every word's symbol state merging that
   pair (left-to-right, non-overlapping — ONE literal ``replace`` over
   the CHR(31)-wrapped state string, a pure JVM expression; the vocab
   is small, so the per-round cost is a vocabulary-sized projection +
   a vocabulary-sized aggregate, with no Python boundary anywhere in
   the training loop).
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


_US = "\x1f"  # unit-separator symbol wrapper; never appears in tokens


def _wrap(sym: str) -> str:
    return f"{_US}{sym}{_US}"


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus pass: (word, n, state) where ``state`` is the word's
    symbol sequence (character symbols + the end-of-word sentinel) as a
    CHR(31)-wrapped, space-joined string — the representation in which
    one literal ``replace`` IS one left-to-right non-overlapping merge
    (identical semantics to ``_merge_symbols``; the same device as
    :func:`pair_frontier_after` and the DuckDB replay oracle). The ONLY
    fact-sized aggregation."""
    words = docs.select(F.explode(tokens(text_col)).alias("word")).where(
        F.col("word") != ""
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    state = F.concat(
        F.regexp_replace("word", "(.)", f"{_US}$1{_US} "),
        F.lit(_wrap(END)),
    )
    return counts.select("word", "n", state.alias("state"))


def _apply_merge(state_col, a: str, b: str):
    """One merge as one literal replace over the wrapped state string —
    a JVM expression, so merge application never crosses the Python
    boundary (guide §4: the trainers previously rewrote every word's
    symbol list in per-round ``mapInPandas`` stages)."""
    return F.replace(
        state_col, F.lit(f"{_wrap(a)} {_wrap(b)}"), F.lit(_wrap(a + b))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    arr = F.split(F.col("state"), " ")
    idx = F.sequence(F.lit(0), F.size("arr") - 2)
    return (
        vocab.select("n", arr.alias("arr"))
        .where(F.size("arr") >= 2)
        .select(
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
        .groupBy(
            F.btrim(F.col("p.a"), F.lit(_US)).alias("a"),
            F.btrim(F.col("p.b"), F.lit(_US)).alias("b"),
        )
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
    vocab = word_vocab(docs, text_col).select("n", "state").localCheckpoint()
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
        vocab = vocab.select(
            "n", _apply_merge(F.col("state"), a, b).alias("state")
        )
        if (rank + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return spark.createDataFrame(
        merges, "rank long, left string, right string, pair_count long"
    )


def _created_pair_bounds(
    spark: SparkSession,
    vocab: DataFrame,
    cands: list[tuple[str, str]],
) -> dict[tuple[str, str], int]:
    """Upper bound on the count of ANY SINGLE pair that merging
    candidate (a, b) can create: merging makes only pairs (x, ab) and
    (ab, y), and each instance of one comes from a triple occurrence
    (x, a, b) / (a, b, y) in the CURRENT vocabulary, so
    ``max over distinct neighbors of the weighted triple count`` bounds
    every created pair's count from above (left-to-right non-overlap
    only removes instances, never adds). One vocabulary-sized aggregate
    for the whole candidate batch; candidates ride a broadcast join."""
    cand_df = spark.createDataFrame(list(cands), "ca string, cb string")
    arr = F.split(F.col("state"), " ")
    unwrapped = vocab.select(
        "n",
        F.transform(arr, lambda s: F.btrim(s, F.lit(_US))).alias("symbols"),
    )
    idx = F.sequence(F.lit(0), F.size("symbols") - 3)
    triples = (
        unwrapped.where(F.size("symbols") >= 3)
        .select(
            "n",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.col("symbols")[i].alias("x"),
                        F.col("symbols")[i + 1].alias("y"),
                        F.col("symbols")[i + 2].alias("z"),
                    ),
                )
            ).alias("t"),
        )
        .select("n", "t.x", "t.y", "t.z")
    )
    left = triples.join(
        F.broadcast(cand_df),
        (F.col("y") == F.col("ca")) & (F.col("z") == F.col("cb")),
    ).select("ca", "cb", F.col("x").alias("nb"), F.lit("L").alias("side"), "n")
    right = triples.join(
        F.broadcast(cand_df),
        (F.col("x") == F.col("ca")) & (F.col("y") == F.col("cb")),
    ).select("ca", "cb", F.col("z").alias("nb"), F.lit("R").alias("side"), "n")
    rows = (
        left.unionByName(right)
        .groupBy("ca", "cb", "nb", "side")
        .agg(F.sum("n").alias("c"))
        .groupBy("ca", "cb")
        .agg(F.max("c").alias("m"))
        .collect()
    )
    return {(r["ca"], r["cb"]): int(r["m"]) for r in rows}


def bpe_train_frontier(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    frontier: int = 16,
    checkpoint_every: int = 4,
) -> DataFrame:
    """``bpe_train`` with FRONTIER BATCHING: per round, collect the
    top-``frontier`` pair counts once and apply the longest rank-prefix
    of them that PROVABLY reproduces the sequential Sennrich trajectory,
    cutting driver round trips ~batch× (the round-9 verdict's known
    scale-out for real 32k-merge vocabularies; `operators/bpe.py`
    bpe_train keeps the certified 1-per-round twin).

    A rank-prefix p_1..p_m of the frontier is safe — batched application
    EQUALS merging them one at a time with a full argmax recount between
    — when, processing in rank order:

    1. PREFIX RULE: acceptance stops at the FIRST pair sharing a symbol
       with an earlier accepted pair (or its merged symbol). A rejected
       pair's count can change under the earlier merge, so everything
       at or below its rank must wait for the next recount.
    2. NEW-SYMBOL RULE: once an accepted pair's merged symbol already
       exists in the alphabet, it becomes the batch's last member —
       later original pairs involving that symbol could gain count from
       the merge's created adjacencies.
    3. BOUND RULE: every earlier accepted pair's created-pair upper
       bound (``_created_pair_bounds`` — one extra aggregate per round,
       skipped for singleton batches) must be STRICTLY below the last
       accepted count, so no created pair can outrank (or lex-tie into)
       a later accepted pair at its sequential step.

    Under 1+2, an accepted pair's count is untouched by earlier batch
    merges and every original non-accepted pair still ranks after it;
    under 3 the created pairs do too — so each p_i is exactly the argmax
    sequential would compute at step i (rank 1 unconditionally is).
    Equality is property-tested against ``bpe_train`` and the pure-
    Python reference; the catalog entry reuses the unrolled sequential
    DuckDB oracle, so the driver hash-certifies the equivalence too.

    Round trips: 2 collects per round for m merges (worst case m=1
    skips the bounds job — exact parity with the sequential trainer);
    typical English-like corpora batch 2-6 disjoint top pairs per
    round. All distributed work stays vocabulary-sized (Heaps' law)."""
    vocab = word_vocab(docs, text_col).select("n", "state").localCheckpoint()
    alphabet = {
        r["s"]
        for r in vocab.select(F.explode(F.split("state", " ")).alias("s"))
        .select(F.btrim("s", F.lit(_US)).alias("s"))
        .distinct()
        .collect()
    }
    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        budget = n_merges - len(merges)
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(frontier)
            .collect()
        )
        cands = [
            (r["a"], r["b"], int(r["cnt"]))
            for r in top
            if r["cnt"] >= min_pair_count
        ]
        if not cands:
            break
        accepted = [cands[0]]
        blocked = {cands[0][0], cands[0][1], cands[0][0] + cands[0][1]}
        sealed = (cands[0][0] + cands[0][1]) in alphabet
        for a, b, cnt in cands[1:]:
            if sealed or len(accepted) >= budget:
                break
            if a in blocked or b in blocked or (a + b) in blocked:
                break  # prefix rule: stop at the first rejection
            accepted.append((a, b, cnt))
            blocked.update((a, b, a + b))
            sealed = (a + b) in alphabet
        if len(accepted) > 1:
            bounds = _created_pair_bounds(
                spark, vocab, [(a, b) for a, b, _ in accepted[:-1]]
            )
            # keep the longest prefix whose earlier created-pair bounds
            # all stay strictly below its LAST accepted count
            m = len(accepted)
            while m > 1:
                last_cnt = accepted[m - 1][2]
                if all(
                    bounds.get((a, b), 0) < last_cnt
                    for a, b, _ in accepted[: m - 1]
                ):
                    break
                m -= 1
            accepted = accepted[:m]
        batch = [(a, b) for a, b, _ in accepted]
        base = len(merges)
        merges.extend(
            (base + i, a, b, cnt) for i, (a, b, cnt) in enumerate(accepted)
        )
        alphabet.update(a + b for a, b in batch)

        state = F.col("state")
        for a, b in batch:
            state = _apply_merge(state, a, b)
        vocab = vocab.select("n", state.alias("state"))
        rounds += 1
        if rounds % checkpoint_every == 0:
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
