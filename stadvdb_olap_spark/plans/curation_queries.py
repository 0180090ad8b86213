"""Sub-document curation catalog queries over ``documents``.

The curation stage between raw text and mixture assembly
(operators/curation.py): C4-style segment-level boilerplate removal with
order-preserving reassembly, an EXACT prefix-filtered set-similarity
self-join (the deterministic twin of the MinHash-LSH near-dup path), and
bigram language-model scoring (the CCNet-style perplexity filter, with
the corpus itself as the LM). All three are deterministic and fully
DuckDB-oracle-checked — the set-similarity oracle is an independent
blocked all-pairs join, so the prefix filter's zero-false-negative claim
is externally verified, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stadvdb_olap_spark.functions.text import tokens, tokens_sql, word_shingles_sql
from stadvdb_olap_spark.operators import curation as CU
from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.sources.parquet import load_spread, load_table

_SEG_LEN = 3
_SEG_MIN_DF = 5
_SETJOIN_T = 0.5
_SETJOIN_SHINGLE_N = 3


@query(
    "segment_dedup_docs",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {tokens_sql('text')} AS toks FROM documents
), segs AS (
  SELECT doc_id, s AS seg_idx,
         array_to_string(toks[s * {_SEG_LEN} + 1 : s * {_SEG_LEN} + {_SEG_LEN}],
                         ' ') AS seg
  FROM t,
       unnest(generate_series(
         0, CAST(ceil(len(toks) / {_SEG_LEN}.0) AS BIGINT) - 1)) AS u(s)
), freq AS (
  SELECT seg, COUNT(DISTINCT doc_id) AS seg_doc_freq FROM segs GROUP BY seg
)
SELECT doc_id,
       COALESCE(string_agg(seg, ' ' ORDER BY seg_idx)
                  FILTER (WHERE seg_doc_freq < {_SEG_MIN_DF}), '') AS kept_text,
       COUNT(*) AS n_segments,
       CAST(SUM(CASE WHEN seg_doc_freq >= {_SEG_MIN_DF} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped
FROM segs JOIN freq USING (seg)
GROUP BY doc_id
""",
)
def segment_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style segment-level dedup: drop every 3-token segment whose
    exact content appears in >= 5 distinct documents (corpus boilerplate),
    reassemble the survivors in original order. Three key-partitioned
    shuffles at any scale — segment doc-frequency aggregate, the
    same-keyed frequency join, and the per-document reassembly regroup."""
    docs = load_spread(spark, sf_dir, "documents")
    return CU.segment_dedup(
        docs, "doc_id", "text", seg_len=_SEG_LEN, min_doc_freq=_SEG_MIN_DF
    )


def _setjoin_sets_sql() -> str:
    t = tokens_sql("text")
    n = _SETJOIN_SHINGLE_N
    return f"""
  SELECT doc_id,
         list_distinct(
           CASE WHEN len({t}) >= {n} THEN
             list_transform(range(1, len({t}) - {n} + 2),
                            i -> array_to_string({t}[i:i+{n - 1}], ' '))
           ELSE [array_to_string({t}, ' ')] END) AS s
  FROM documents
"""


@query(
    "setjoin_prefix_jaccard_pairs",
    oracle=f"""
WITH sh AS MATERIALIZED ({_setjoin_sets_sql()}),
sz AS (SELECT doc_id, len(s) AS n FROM sh),
e AS (SELECT doc_id, unnest(s) AS g FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       CAST(ROUND(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) AS DOUBLE)
           AS jaccard
FROM inter
JOIN sz na ON na.doc_id = id_a
JOIN sz nb ON nb.doc_id = id_b
WHERE ROUND(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) >= {_SETJOIN_T}
""",
)
def setjoin_prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs set-similarity self-join (3-shingle Jaccard >= 0.5)
    via rarest-first prefix filtering — provably no missed pair, unlike
    the probabilistic LSH recall of ``dedup_jaccard_verified``. The
    oracle generates candidates the INDEPENDENT way — every pair sharing
    any shingle, with |A∩B| counted by join-and-group rather than list
    intersection (|A∪B| = |A|+|B|-|A∩B|) — so agreement certifies the
    prefix filter's completeness, not just the verify arithmetic."""
    docs = load_spread(spark, sf_dir, "documents")
    return CU.prefix_filter_jaccard_pairs(
        docs, "doc_id", "text", _SETJOIN_T, shingle_n=_SETJOIN_SHINGLE_N
    )


@query(
    "bigram_lm_logprob_docs",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {tokens_sql('text')} AS toks FROM documents
), bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
), c12 AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2
), c1 AS (
  SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1
), v AS (
  SELECT COUNT(DISTINCT tok) AS v
  FROM (SELECT unnest(toks) AS tok FROM t)
), scored AS (
  SELECT doc_id, ROUND(ln((c12 + 1.0) / (c1 + v)), 6) AS lp
  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(CAST(lp AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
           AS avg_logprob
FROM scored
GROUP BY doc_id
""",
)
def bigram_lm_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM document scoring (the CCNet/KenLM-style perplexity
    filter): train add-one-smoothed bigram probabilities on the corpus
    itself, score each document by mean ln P(w2|w1). Every aggregate is
    map-side-combinable and every join is on the model key ((w1,w2) then
    w1); the vocabulary size is a 1-row broadcast. Per compat.py, each
    per-bigram ln is rounded then decimal-summed so the mean is a
    deterministic function of the bigram multiset."""
    docs = load_spread(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") >= 2
    )
    bg = toked.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("toks"), i).alias("w1"),
                    F.element_at(F.col("toks"), i + 1).alias("w2"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "lp",
            F.round(
                F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("v"))), 6
            ),
        )
    )
    # No final round: the decimal sum -> double and the integer count are
    # identical in both engines, so the IEEE division is bit-identical; a
    # cosmetic round-to-6 can land on a decimal tie where Spark (shortest
    # repr) and DuckDB (full binary value) disagree in the last digit.
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.sum(F.col("lp").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_logprob"),
    )


_VOCAB_MIN_FREQ = 2
_UNK_ID = 1  # 0 = <pad>, 1 = <unk>; real words start at 2


def _vocab_df(docs: DataFrame) -> DataFrame:
    """The ONE Spark-side vocabulary builder (word, freq, word_id) —
    shared by vocab_build_docs and encode_docs_token_ids exactly as
    ``_vocab_sql`` is shared by their oracles, so the two paths cannot
    drift."""
    from pyspark.sql import Window

    freq = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= _VOCAB_MIN_FREQ)
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("word"))
    return freq.select(
        "word",
        "freq",
        (F.lit(1) + F.row_number().over(w)).cast("long").alias("word_id"),
    )


def _vocab_sql() -> str:
    return f"""
  SELECT word, freq,
         CAST(1 + row_number() OVER (ORDER BY freq DESC, word) AS BIGINT)
             AS word_id
  FROM (
    SELECT w AS word, COUNT(*) AS freq
    FROM (SELECT unnest({tokens_sql('text')}) AS w FROM documents)
    GROUP BY w
  )
  WHERE freq >= {_VOCAB_MIN_FREQ}
"""


@query("vocab_build_docs", oracle=f"SELECT * FROM ({_vocab_sql()})")
def vocab_build_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-style vocabulary construction: corpus word frequencies,
    a min-frequency floor, and dense ids assigned by (freq desc, word) —
    deterministic across engines and runs. Ids 0/1 are reserved for
    <pad>/<unk>, so real words start at 2. The id-assignment window is
    global over the VOCABULARY (bounded, ~10^6 at web scale), never over
    the corpus — one hash aggregate on the token stream does all the
    heavy lifting."""
    docs = load_spread(spark, sf_dir, "documents")
    return _vocab_df(docs)


@query(
    "encode_docs_token_ids",
    oracle=f"""
WITH vocab AS ({_vocab_sql()}),
t AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents),
pos AS (
  SELECT doc_id, i AS pos, toks[i] AS word
  FROM t, unnest(generate_series(1, len(toks))) AS u(i)
)
SELECT doc_id,
       string_agg(CAST(COALESCE(word_id, {_UNK_ID}) AS VARCHAR),
                  ' ' ORDER BY pos) AS token_ids,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN word_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unk
FROM pos LEFT JOIN vocab USING (word)
GROUP BY doc_id
""",
)
def encode_docs_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document ENCODING: text -> position-ordered token-id sequences via
    the built vocabulary, out-of-vocabulary words mapping to <unk>=1 —
    the final step before sequence packing. Tokens explode with their
    position, join the vocabulary on the word (broadcast while the vocab
    fits, shuffle join beyond), and each document reassembles by sorting
    its (pos, id) pairs in-memory — documents are bounded, so no global
    sort anywhere. The id sequence publishes as a space-joined string
    (certified outputs carry no ARRAY columns — a list cell crashes the
    driver's pandas canonicalizer); downstream packing consumes the
    array form directly from the operator."""
    docs = load_spread(spark, sf_dir, "documents")
    vocab = _vocab_df(docs).select("word", "word_id")
    pos = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "word")
    )
    return (
        pos.join(vocab, "word", "left")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "pos",
                                F.coalesce(
                                    F.col("word_id"), F.lit(_UNK_ID)
                                ).alias("id"),
                            )
                        )
                    ),
                    lambda s: s["id"].cast("string"),
                ),
                " ",
            ).alias("token_ids"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("word_id").isNull().cast("long")).alias("n_unk"),
        )
    )


@query(
    "debounce_events_10s",
    oracle="""
WITH g AS (
    SELECT event_id, user_id, event_type, ts,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
)
SELECT event_id, user_id, event_type, ts
FROM g WHERE gap_us IS NULL OR gap_us > 10000000
""",
)
def debounce_events_10s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce / rate-limit dedup: drop any event arriving within 10
    seconds of the previous SAME (user, type) event — the duplicate-click
    / retry-storm filter every event pipeline runs before counting
    anything. One lag window per (user, type) in exact integer
    microseconds; survivors keep their original rows untouched."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    return (
        ev.withColumn("__gap", gap)
        .filter(F.col("__gap").isNull() | (F.col("__gap") > 10_000_000))
        .select("event_id", "user_id", "event_type", "ts")
    )


@query(
    "dialogue_turns_per_session",
    oracle="""
WITH flagged AS (
    SELECT user_id, event_id, event_type, ts,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                     OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
    SELECT user_id, event_id, event_type, ts,
           CAST(SUM(new_s) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_seq
    FROM flagged
)
SELECT user_id, session_seq,
       COUNT(*) AS n_turns,
       string_agg(event_type, ' -> ' ORDER BY ts, event_id) AS turn_script
FROM sess
GROUP BY user_id, session_seq
HAVING COUNT(*) >= 3
""",
)
def dialogue_turns_per_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation/trajectory assembly (the chat-corpus prep shape):
    sessionize per user (30-minute gap), then reassemble each session's
    events into an ORDERED turn script, keeping sessions with >= 3 turns.
    Same order-preserving in-memory reassembly as document encoding —
    sort the bounded per-session array, never a global sort. The output
    is exactly what an SFT-style pipeline feeds a formatter."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    new_s = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.withColumn("__new", new_s).withColumn(
        "session_seq", F.sum("__new").over(run).cast("long")
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(us.alias("us"), "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                " -> ",
            ).alias("turn_script"),
        )
        .filter(F.col("n_turns") >= 3)
    )


@query(
    "intra_doc_dedup_docs",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {tokens_sql('text')} AS toks FROM documents
), segs AS (
  SELECT doc_id, s AS seg_idx,
         array_to_string(toks[s * {_SEG_LEN} + 1 : s * {_SEG_LEN} + {_SEG_LEN}],
                         ' ') AS seg
  FROM t,
       unnest(generate_series(
         0, CAST(ceil(len(toks) / {_SEG_LEN}.0) AS BIGINT) - 1)) AS u(s)
), ranked AS (
  SELECT doc_id, seg_idx, seg,
         row_number() OVER (
             PARTITION BY doc_id, seg ORDER BY seg_idx) AS occ
  FROM segs
)
SELECT doc_id,
       COALESCE(string_agg(seg, ' ' ORDER BY seg_idx)
                  FILTER (WHERE occ = 1), '') AS kept_text,
       COUNT(*) AS n_segments,
       CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM ranked
GROUP BY doc_id
""",
)
def intra_doc_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTRA-document repetition removal (the cleaning step behind
    Gopher's repetition FILTERS): keep only the first occurrence of each
    3-token segment WITHIN a document and reassemble in order — looping
    generation artifacts and boilerplate refrains collapse to one copy.
    Corpus-free: one window over (doc, segment) plus the per-doc
    reassembly, both partitioned by doc_id — a single exchange, no
    cross-document state at all (contrast segment_dedup_docs, which
    consults corpus-wide frequencies)."""
    from pyspark.sql import Window

    from stadvdb_olap_spark.operators.curation import doc_segments

    docs = load_spread(spark, sf_dir, "documents")
    segs = doc_segments(docs, "doc_id", "text", _SEG_LEN)
    w = Window.partitionBy("doc_id", "seg").orderBy("seg_idx")
    ranked = segs.withColumn("occ", F.row_number().over(w))
    kept_structs = F.collect_list(
        F.when(F.col("occ") == 1, F.struct("seg_idx", "seg"))
    )
    return ranked.groupBy("doc_id").agg(
        F.concat_ws(
            " ", F.transform(F.array_sort(kept_structs), lambda s: s["seg"])
        ).alias("kept_text"),
        F.count(F.lit(1)).alias("n_segments"),
        F.sum((F.col("occ") > 1).cast("long")).alias("n_dropped"),
    )


_BPE_TRAIN_N = 16
_BPE_TRAIN_MIN_CNT = 2


def _bpe_train_oracle(n_merges: int = _BPE_TRAIN_N) -> str:
    """DuckDB replay of the ENTIRE Sennrich merge loop: the pair-count
    frontier device (``_merge_step_oracle``) unrolled over every rank,
    with each stage's merge taken from the PREVIOUS stage's argmax as
    scalar subqueries — the data-dependent training trajectory itself,
    not a pinned approximation. Every vocabulary state is MATERIALIZED
    (each is read by its frontier AND its successor; without it the
    CTE chain re-evaluates exponentially). The early-stop is the same
    running conjunction bpe_train implements: rank k publishes only if
    every rank <= k cleared min_pair_count (pair counts are NOT
    monotone across merges, so the validity must chain rather than
    filter)."""

    def pairs(state: str, k: int) -> str:
        return f"""
p{k} AS (
  SELECT trim(arr[i], chr(31)) AS l, trim(arr[i+1], chr(31)) AS r,
         CAST(SUM(n) AS BIGINT) AS cnt
  FROM (SELECT n, string_split(s, ' ') AS arr FROM {state}),
       unnest(generate_series(1, len(arr) - 1)) AS g(i)
  GROUP BY 1, 2
),
m{k} AS MATERIALIZED (
  SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1
)"""

    ctes = [
        f"""
s0 AS MATERIALIZED (
  SELECT n, array_to_string(list_transform(string_split(word, ''),
           c -> chr(31)||c||chr(31)), ' ')
         || ' ' || chr(31)||'</w>'||chr(31) AS s
  FROM (
    SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents,
         unnest(list_filter({tokens_sql('text')}, x -> x <> '')) AS t(w)
    GROUP BY w
  )
)"""
    ]
    for k in range(n_merges):
        ctes.append(pairs(f"s{k}", k))
        if k < n_merges - 1:
            ctes.append(f"""
s{k + 1} AS MATERIALIZED (
  SELECT n, replace(s,
      chr(31)||(SELECT l FROM m{k})||chr(31)||' '
        ||chr(31)||(SELECT r FROM m{k})||chr(31),
      chr(31)||(SELECT l FROM m{k})||(SELECT r FROM m{k})||chr(31)) AS s
  FROM s{k}
)""")
    selects = []
    for k in range(n_merges):
        valid = " AND ".join(
            f"(SELECT cnt FROM m{j}) >= {_BPE_TRAIN_MIN_CNT}"
            for j in range(k + 1)
        )
        selects.append(
            f"SELECT CAST({k} AS BIGINT) AS rank, l AS left, r AS right,"
            f" cnt AS pair_count FROM m{k} WHERE {valid}"
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


@query("bpe_merges_docs", oracle=_bpe_train_oracle())
def bpe_merges_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BPE tokenizer training (Sennrich merge loop) over the
    corpus: one fact-sized word-count pass, then 16 bounded merge
    rounds on the vocabulary-sized symbol table (operators/bpe.py —
    scale analysis there and in SCALING.md). ORACLE-BACKED since
    round 9: the merge-step frontier device unrolls over all 16 ranks
    with each stage's merge flowing from the previous argmax as scalar
    subqueries (``_bpe_train_oracle``), so DuckDB re-learns the entire
    data-dependent merge TABLE — ranks, tiebreaks, counts, early-stop
    — bit-for-bit. With this conversion every query in the catalog is
    hash-certified; the pure-Python reference equality property test
    (test_bpe_train_matches_python_reference) stays as the third
    independent witness."""
    from stadvdb_olap_spark.operators.bpe import bpe_train

    docs = load_spread(spark, sf_dir, "documents")
    return bpe_train(spark, docs, n_merges=_BPE_TRAIN_N)


@query("bpe_merges_frontier_docs", oracle=_bpe_train_oracle())
def bpe_merges_frontier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRONTIER-BATCHED BPE training (round-10 scale-out of
    ``bpe_merges_docs``): per round, ONE top-16 pair-count collect plus
    one created-pair-bound aggregate admit the longest provably-safe
    rank-prefix of merges, cutting driver round trips ~batch× vs the
    1-collect-per-merge sequential trainer — the known bottleneck for
    real 32k-merge vocabularies (operators/bpe.py:bpe_train_frontier
    states and proves the three admission rules). The ORACLE IS THE
    SEQUENTIAL TRAJECTORY — the same unrolled 16-rank DuckDB replay
    that certifies ``bpe_merges_docs`` — so the driver's hash check IS
    the batched==sequential equivalence proof on real data, alongside
    the property tests (tests/test_text_stats.py)."""
    from stadvdb_olap_spark.operators.bpe import bpe_train_frontier

    docs = load_spread(spark, sf_dir, "documents")
    return bpe_train_frontier(spark, docs, n_merges=_BPE_TRAIN_N)


# Merge table learned ONCE offline (operators/bpe.py:bpe_train over the
# sf0.01 documents fixture, n_merges=16) and pinned as literals — the
# PQ-codebook device: the certified surface is the ENCODER applying a
# fixed tokenizer, which is exactly how production works (train rarely,
# encode every document). Pinning makes the query scale-independent and
# gives the iterative trainer's output an end-to-end hash check.
_PINNED_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"),
    ("o", "w"), ("ow", "</w>"), ("o", "r"), ("s", "t"),
    ("h", "</w>"), ("a", "t"), ("l", "u"), ("i", "n"),
    ("a", "</w>"), ("g", "</w>"), ("y", "</w>"), ("a", "r"),
)


def _bpe_replay_sql() -> str:
    """DuckDB replay of greedy BPE encoding with the pinned merges.

    Device: each symbol is wrapped in a CHR(31) unit separator and
    symbols are space-joined, so one merge (a, b) is EXACTLY one
    left-to-right non-overlapping string replace of
    ``\\x1fa\\x1f \\x1fb\\x1f`` with ``\\x1fab\\x1f`` — the same scan
    semantics as the operator's ``_merge_symbols``. The whole document
    encodes as ONE string: a cross-word false match is impossible
    because every word's last symbol contains the ``</w>`` sentinel and
    no learned merge's LEFT side can contain it (within a word the
    sentinel-bearing symbol is always last, so it never pairs on the
    left)."""
    # coalesce(text, ''): a NULL document encodes to the empty token
    # string on both engines (the Python encoder maps None -> "").
    expr = """array_to_string(
  list_transform(
    list_filter(regexp_split_to_array(trim(lower(coalesce(text, ''))),
                                      '[ \\t\\n\\x0b\\f\\r]+'),
                w -> w <> ''),
    w -> array_to_string(list_transform(string_split(w, ''),
                         c -> chr(31)||c||chr(31)), ' ')
         || ' ' || chr(31) || '</w>' || chr(31)
  ), ' ')"""
    for a, b in _PINNED_MERGES:
        expr = (
            f"replace({expr}, chr(31)||'{a}'||chr(31)||' '"
            f"||chr(31)||'{b}'||chr(31), chr(31)||'{a + b}'||chr(31))"
        )
    return f"trim(replace({expr}, chr(31)||' '||chr(31), ' '), chr(31))"


@query(
    "bpe_encode_replay_docs",
    oracle=f"""
WITH enc AS (
    SELECT doc_id, {_bpe_replay_sql()} AS bpe_text FROM documents
)
SELECT doc_id, bpe_text,
       CAST(CASE WHEN bpe_text = '' THEN 0
                 ELSE len(string_split(bpe_text, ' ')) END AS BIGINT)
           AS n_bpe_tokens
FROM enc
""",
)
def bpe_encode_replay_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy BPE ENCODE with a pinned 16-merge tokenizer (learned once
    by the distributed trainer, frozen as literals — see
    ``_PINNED_MERGES``): the real ``operators/bpe.py:bpe_encode``
    Arrow-batched mapInPandas encoder, hash-certified against a DuckDB
    replay that applies each merge as one delimiter-wrapped string
    replace (device notes on ``_bpe_replay_sql``). Published as the
    space-joined token string + token count (BPE symbols never contain
    spaces, so the join is lossless). 100 TB shape: the merge list
    rides the task closure (never a join), the encode is per-row narrow
    work — zero shuffles, parallelism = input partitions."""
    from stadvdb_olap_spark.operators.bpe import bpe_encode

    docs = load_spread(spark, sf_dir, "documents")
    enc = bpe_encode(docs, list(_PINNED_MERGES))
    return enc.select(
        "doc_id",
        F.array_join("bpe_tokens", " ").alias("bpe_text"),
        F.size("bpe_tokens").cast("long").alias("n_bpe_tokens"),
    )


_STEP_K = 8  # pinned tokenizer prefix applied before the certified step


def _merge_step_oracle() -> str:
    """DuckDB twin of ``operators/bpe.py:pair_frontier_after`` with the
    first ``_STEP_K`` pinned merges: rebuild each distinct word's
    CHR(31)-wrapped symbol state, apply the merges as literal replaces
    (identical scan semantics — see ``_bpe_replay_sql``), unnest
    adjacent pairs weighted by word count, rank (count desc, pair)."""
    expr = (
        "array_to_string(list_transform(string_split(word, ''), "
        "c -> chr(31)||c||chr(31)), ' ') || ' ' || chr(31)||'</w>'||chr(31)"
    )
    for a, b in _PINNED_MERGES[:_STEP_K]:
        expr = (
            f"replace({expr}, chr(31)||'{a}'||chr(31)||' '"
            f"||chr(31)||'{b}'||chr(31), chr(31)||'{a + b}'||chr(31))"
        )
    return f"""
WITH words AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents,
       unnest(list_filter({tokens_sql('text')}, x -> x <> '')) AS t(w)
  GROUP BY w
),
syms AS (
  SELECT n, string_split({expr}, ' ') AS arr FROM words
),
pairs AS (
  SELECT trim(arr[i], chr(31)) AS left_sym,
         trim(arr[i + 1], chr(31)) AS right_sym, n
  FROM syms, unnest(generate_series(1, len(arr) - 1)) AS g(i)
)
SELECT left_sym, right_sym, CAST(SUM(n) AS BIGINT) AS pair_cnt
FROM pairs GROUP BY left_sym, right_sym
ORDER BY pair_cnt DESC, left_sym, right_sym
LIMIT 10
"""


@query("bpe_merge_step_docs", oracle=_merge_step_oracle())
def bpe_merge_step_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE TRAINING STEP, hash-certified (the Lloyd-step treatment
    applied to tokenizer training): pair-count frontier of the corpus
    vocabulary after the first 8 pinned merges (``_STEP_K``), ranked exactly
    as ``bpe_train``'s argmax — row 1 IS the merge the trainer learns
    next. With ``bpe_encode_replay_docs`` certifying deployed encoding
    and ``bpe_merges_docs`` now hash-certified end-to-end (the unrolled
    ``_bpe_train_oracle``), every component of the BPE loop has a hash
    check; this query stays as the cheap single-step probe a tokenizer
    CI would run per-ingest. 100 TB shape: one fact-sized word-count shuffle, then
    vocabulary-sized work (Heaps' law) and a TakeOrdered(10)."""
    from stadvdb_olap_spark.operators.bpe import pair_frontier_after

    docs = load_spread(spark, sf_dir, "documents")
    return pair_frontier_after(docs, list(_PINNED_MERGES[:_STEP_K]), top=10)


# (bpe_encode_docs — the former rows-only train-then-encode end-to-end
# query — was retired in round 8: its two halves are now each certified
# harder elsewhere. Training: bpe_merges_docs (hash-certified since
# round 9 via the unrolled trainer replay, plus the pure-Python
# reference equality test). Encoding: bpe_encode_replay_docs
# hash-certifies the full token STRING of the real mapInPandas encoder
# against a DuckDB replay, strictly stronger than the retired query's
# rows-only check. The end-to-end composition stays covered by
# test_bpe_encode_roundtrip.)


_PAD_CTXS = (512, 1024, 2048)


@query(
    "padding_waste_audit_docs",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, CAST(len({tokens_sql('text')}) AS BIGINT) AS n
    FROM documents
),
per_ctx AS (
    SELECT ctx, n, (n + ctx - 1) // ctx AS n_seq
    FROM toks, unnest([{', '.join(str(c) for c in _PAD_CTXS)}]) AS c(ctx)
)
SELECT CAST(ctx AS BIGINT) AS ctx_len,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       CAST(SUM(n_seq) AS BIGINT) AS n_sequences,
       CAST(SUM(n_seq * ctx - n) AS BIGINT) AS padded_tokens,
       CAST(SUM(n_seq * ctx - n) AS DOUBLE) / SUM(n_seq * ctx)
           AS waste_frac
FROM per_ctx GROUP BY ctx
""",
)
def padding_waste_audit_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit for sequence packing: for each candidate
    context length, the token budget a naive one-doc-per-sequence
    batcher burns on pad tokens (each doc occupies ceil(n/ctx)
    sequences; waste = that capacity minus real tokens) — the number
    that justifies the packed-sequence pipeline (`operators/packing.py`)
    and picks the context length. Token counts come from the certified
    whitespace tokenizer, all arithmetic is BIGINT ceil-division, and
    the only float op is the final waste fraction. 100 TB shape: one
    narrow projection per doc, a 3x literal explode, and a hash
    aggregate to |contexts| rows — no shuffle of text bytes."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n")
    )
    per_ctx = toks.select(
        "n",
        F.explode(
            F.array(*[F.lit(c) for c in _PAD_CTXS])
        ).alias("ctx"),
    ).withColumn("n_seq", F.expr("(n + ctx - 1) DIV ctx"))
    return (
        per_ctx.groupBy(F.col("ctx").cast("long").alias("ctx_len"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("total_tokens"),
            F.sum("n_seq").cast("long").alias("n_sequences"),
            F.sum(F.expr("n_seq * ctx - n")).cast("long").alias(
                "padded_tokens"
            ),
            (
                F.sum(F.expr("n_seq * ctx - n")).cast("double")
                / F.sum(F.expr("n_seq * ctx"))
            ).alias("waste_frac"),
        )
    )


_DUPSPAN_N = 8
_DUPSPAN_MIN = 2


@query(
    "dup_ngram_span_stats_docs",
    oracle=f"""
WITH spans AS (
    SELECT doc_id, unnest({word_shingles_sql('text', _DUPSPAN_N)}) AS span FROM documents
), freq AS (
    SELECT span, count(*) AS c FROM spans GROUP BY span
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(count(*) FILTER (WHERE c >= {_DUPSPAN_MIN}) AS BIGINT)
           AS n_dup_spans,
       CAST(count(*) FILTER (WHERE c >= {_DUPSPAN_MIN}) AS DOUBLE)
           / count(*) AS dup_span_ratio
FROM spans JOIN freq USING (span)
GROUP BY doc_id
""",
)
def dup_ngram_span_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span scoring (Lee et al. substring-dedup signal):
    fraction of each document's token 8-gram spans that repeat verbatim
    anywhere in the corpus (multiplicity counted). One span-keyed
    frequency shuffle + a same-keyed join + per-doc regroup — see
    operators/curation.py:duplicate_ngram_spans for the 100 TB shape."""
    docs = load_spread(spark, sf_dir, "documents")
    return CU.duplicate_ngram_spans(
        docs, "doc_id", "text", n=_DUPSPAN_N, min_count=_DUPSPAN_MIN
    )


# ---------------------------------------------------------------------------
# URL/domain curation: domain rollup + blocklist flag
# ---------------------------------------------------------------------------
#
# The fixture corpus carries no URLs, so (same device as the PII family's
# _inject_pii) each document gets one deterministic doc_id-derived URL
# appended before extraction — the operator under test is the
# extract-domain -> rollup -> blocklist stage a crawl-curation pipeline
# runs (C4/RefinedWeb-style per-domain stats, blocklists, caps).

_BLOCKED_DOMAINS = ("site3.example0.com", "site7.example1.com", "site13.example2.com")


def _inject_url(doc_id: F.Column, text: F.Column) -> F.Column:
    i = doc_id.cast("int")
    s = lambda c: c.cast("string")  # noqa: E731
    return F.concat(
        text,
        F.lit(" see https://site"), s((i * 11) % 20),
        F.lit(".example"), s(i % 3),
        F.lit(".com/page/"), s(doc_id),
    )


def _inject_url_sql(doc_id: str, text: str) -> str:
    i = f"CAST({doc_id} AS INTEGER)"
    return (
        f"{text} || ' see https://site' || CAST(({i} * 11) % 20 AS VARCHAR)"
        f" || '.example' || CAST({i} % 3 AS VARCHAR)"
        f" || '.com/page/' || CAST({doc_id} AS VARCHAR)"
    )


@query(
    "domain_rollup_docs",
    oracle=f"""
WITH d AS (
    SELECT doc_id,
           regexp_extract({_inject_url_sql('doc_id', 'text')},
                          'https://([a-z0-9.]+)/', 1) AS domain,
           CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tok
    FROM documents
)
SELECT domain,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       domain IN {_BLOCKED_DOMAINS!r} AS blocked
FROM d
GROUP BY domain
""",
)
def domain_rollup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-curation domain accounting: extract each document's source
    domain, roll up doc/token counts per domain, and flag blocklisted
    domains — the table a per-domain cap or blocklist filter consumes.
    One regexp projection + one hash aggregate on the domain key; at
    100 TB the rollup output is domain-cardinality-sized (millions, not
    billions) and the blocklist is a literal/broadcast lookup."""
    from stadvdb_olap_spark.functions.text import token_count

    docs = load_spread(spark, sf_dir, "documents")
    domain = F.regexp_extract(
        _inject_url(F.col("doc_id"), F.col("text")), r"https://([a-z0-9.]+)/", 1
    )
    return (
        docs.select(domain.alias("domain"), token_count("text").alias("n_tok"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .withColumn(
            "blocked",
            F.col("domain").isin(*_BLOCKED_DOMAINS),
        )
    )


# ---------------------------------------------------------------------------
# BPE encoding with a PUBLISHED merge table
# ---------------------------------------------------------------------------

# The first 12 merges bpe_train learns on the fixture corpus, published as
# literals — the tokenizer-file posture: training runs offline
# (bpe_merges_docs), but DEPLOYED encoding always runs against
# a shipped merge list, and with the list pinned the encoder becomes a
# deterministic expression both engines replay identically.
_BPE_MERGES = (
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"),
    ("o", "w"), ("ow", "</w>"), ("o", "r"), ("s", "t"),
    ("h", "</w>"), ("a", "t"), ("l", "u"), ("i", "n"),
)
# Each merge's space-delimited replace runs twice: a single replace-all
# pass consumes the shared boundary space of back-to-back occurrences
# (' e r e r ' -> ' er e r '), the second pass closes them. Two passes
# are exact for the fixture vocabulary (no 3+ adjacent repeats of one
# pair inside a word); cross-engine equality holds REGARDLESS, because
# both engines execute the identical pass sequence.
_BPE_PASSES = 2


def _bpe_symcount_sql(tok: str) -> str:
    s = f"' ' || regexp_replace({tok}, '(.)', '\\1 ', 'g') || '</w> '"
    for left, right in _BPE_MERGES:
        for _ in range(_BPE_PASSES):
            s = f"replace({s}, ' {left} {right} ', ' {left}{right} ')"
    return f"CAST(len(string_split(trim({s}), ' ')) AS BIGINT)"


@query(
    "bpe_encode_pinned_docs",
    oracle=f"""
WITH t AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(list_aggregate(list_transform(toks, x -> {_bpe_symcount_sql('x')}),
                           'sum') AS BIGINT) AS n_symbols,
       CAST(list_aggregate(list_transform(toks, x -> {_bpe_symcount_sql('x')}),
                           'sum') AS DOUBLE) / len(toks) AS symbols_per_token
FROM t
""",
)
def bpe_encode_pinned_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer fertility with a PUBLISHED merge table: per document,
    the whitespace token count, the post-merge BPE symbol count, and
    symbols-per-token — the metric that prices a corpus in model tokens
    and compares tokenizers. Training runs offline
    (bpe_merges_docs); deployed ENCODING runs the shipped merge list as a
    fixed chain of space-delimited merges over the char-split word, a
    pure expression both engines execute identically (the certifiable
    face of operators/bpe.py:bpe_encode, same device as the pinned
    IVF/SemDeDup/z-order queries). Narrow per-row projection: no
    shuffle, scan-bound at any corpus size."""
    docs = load_spread(spark, sf_dir, "documents")

    def symcount(tok):
        s = F.concat(
            F.lit(" "),
            F.regexp_replace(tok, "(.)", "$1 "),
            F.lit("</w> "),
        )
        for left, right in _BPE_MERGES:
            for _ in range(_BPE_PASSES):
                s = F.replace(
                    s, F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
                )
        return F.size(F.split(F.trim(s), " ")).cast("long")

    toks = tokens("text")
    n_sym = F.aggregate(
        F.transform(toks, symcount), F.lit(0).cast("long"), lambda a, x: a + x
    )
    n_tok = F.size(toks).cast("long")
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_sym.alias("n_symbols"),
        (n_sym.cast("double") / n_tok).alias("symbols_per_token"),
    )


# ---------------------------------------------------------------------------
# Span corruption (T5-style denoising objective)
# ---------------------------------------------------------------------------

_SC_CUT = "4d"  # first md5 byte < 0x4d => masked (~30% of tokens)
_SC_MARK = "_M_"  # span sentinel; fixture tokens are [a-z0-9]+, no collision


@query(
    "span_corrupt_docs",
    oracle=f"""
WITH t AS (
    SELECT doc_id, {tokens_sql('text')} AS toks FROM documents
),
m AS (
    SELECT doc_id,
           list_transform(toks, (x, i) -> struct_pack(
               tok := x,
               msk := substring(md5(CAST(doc_id AS VARCHAR) || ':'
                                    || CAST(i AS VARCHAR)), 1, 2)
                      < '{_SC_CUT}')) AS items
    FROM t
),
folded AS (
    SELECT doc_id,
           trim(list_reduce(list_prepend(CAST('' AS VARCHAR),
               list_transform(items, it ->
                   CASE WHEN it.msk THEN '\x01M'
                        ELSE ' ' || it.tok END)),
               (acc, step) ->
                   CASE WHEN step = '\x01M'
                        THEN CASE WHEN ends_with(acc, '{_SC_MARK}')
                                  THEN acc ELSE acc || '{_SC_MARK}' END
                        ELSE acc || step END)) AS corrupted,
           trim(list_reduce(list_prepend(CAST('' AS VARCHAR),
               list_transform(items, it ->
                   CASE WHEN it.msk THEN ' ' || it.tok
                        ELSE '\x01M' END)),
               (acc, step) ->
                   CASE WHEN step = '\x01M'
                        THEN CASE WHEN ends_with(acc, '{_SC_MARK}')
                                  THEN acc ELSE acc || '{_SC_MARK}' END
                        ELSE acc || step END)) AS target,
           CAST(len(list_filter(items, it -> it.msk)) AS BIGINT) AS n_masked,
           CAST(len(items) AS BIGINT) AS n_tokens
    FROM m
)
SELECT doc_id, corrupted, target, n_tokens, n_masked,
       CAST((length(corrupted)
             - length(replace(corrupted, '{_SC_MARK}', '')))
            / {len(_SC_MARK)} AS BIGINT) AS n_spans
FROM folded
""",
)
def span_corrupt_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption: ~30% of tokens mask by a
    content-addressed per-(doc, position) hash, consecutive masked
    tokens collapse into ONE sentinel in the corrupted text while the
    target keeps the masked spans (sentinel-separated) — the
    denoising-objective pair generator, deterministic across engines,
    runs, and partitionings. (Sentinels are unnumbered; numbering
    <extra_id_k> is a trivial downstream split-join.) Everything is
    row-local: one token-array transform plus two single-value string
    folds — single-value accumulators by design, because DuckDB's
    struct-accumulator fold rebinds fields sequentially (compat.py
    device list) while a scalar fold is safe in both engines. No
    shuffle; scan-bound at any corpus size."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = tokens("text")

    def masked(i):  # i is 0-based in Spark's transform; oracle is 1-based
        return (
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        (i + 1).cast("string"),
                    ).cast("binary")
                ),
                1,
                2,
            )
            < _SC_CUT
        )

    def fold(step_when_masked, step_when_plain):
        steps = F.transform(
            toks,
            lambda x, i: F.when(masked(i), step_when_masked(x)).otherwise(
                step_when_plain(x)
            ),
        )
        return F.trim(
            F.aggregate(
                steps,
                F.lit(""),
                lambda acc, step: F.when(
                    step == "\x01M",
                    F.when(acc.endswith(_SC_MARK), acc).otherwise(
                        F.concat(acc, F.lit(_SC_MARK))
                    ),
                ).otherwise(F.concat(acc, step)),
            )
        )

    mark = lambda x: F.lit("\x01M")  # noqa: E731
    keep = lambda x: F.concat(F.lit(" "), x)  # noqa: E731
    corrupted = fold(mark, keep)
    target = fold(keep, mark)
    n_masked = F.size(
        F.filter(F.transform(toks, lambda x, i: masked(i)), lambda b: b)
    ).cast("long")
    n_spans = (
        (F.length(corrupted) - F.length(F.replace(corrupted, F.lit(_SC_MARK), F.lit(""))))
        / len(_SC_MARK)
    ).cast("long")
    return docs.select(
        "doc_id",
        corrupted.alias("corrupted"),
        target.alias("target"),
        F.size(toks).cast("long").alias("n_tokens"),
        n_masked.alias("n_masked"),
        n_spans.alias("n_spans"),
    )


# ---------------------------------------------------------------------------
# Dedup recall audit: LSH-verified pairs vs the exact set-similarity join
# ---------------------------------------------------------------------------

from stadvdb_olap_spark.plans.text_queries import (  # noqa: E402
    _bands_sql,
    _shingled_sql,
    _sigs_sql,
)

_AUDIT_T = 0.5


@query(
    "dedup_recall_audit_docs",
    oracle=f"""
WITH sh AS MATERIALIZED ({_setjoin_sets_sql()}),
sz AS (SELECT doc_id, len(s) AS n FROM sh),
e AS (SELECT doc_id, unnest(s) AS g FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
exact AS MATERIALIZED (
  SELECT id_a, id_b
  FROM inter
  JOIN sz na ON na.doc_id = id_a
  JOIN sz nb ON nb.doc_id = id_b
  WHERE ROUND(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) >= {_AUDIT_T}
),
sigs AS MATERIALIZED ({_sigs_sql(8)}),
bands AS MATERIALIZED ({_bands_sql(8, 2)}),
cands AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band_id, band_key)
  WHERE a.doc_id < b.doc_id
),
sets_ AS MATERIALIZED (
  SELECT doc_id, list_distinct(sh) AS sh FROM ({_shingled_sql()})
),
lsh AS MATERIALIZED (
  SELECT id_a, id_b
  FROM cands
  JOIN sets_ sa ON sa.doc_id = id_a
  JOIN sets_ sb ON sb.doc_id = id_b
  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
            / len(list_distinct(sa.sh || sb.sh)) >= {_AUDIT_T}
)
SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
       (SELECT COUNT(*) FROM lsh) AS n_lsh,
       (SELECT COUNT(*) FROM exact ex WHERE NOT EXISTS (
            SELECT 1 FROM lsh l
            WHERE l.id_a = ex.id_a AND l.id_b = ex.id_b)) AS n_missed,
       CASE WHEN (SELECT COUNT(*) FROM exact) = 0 THEN NULL
            ELSE CAST((SELECT COUNT(*) FROM exact) -
                      (SELECT COUNT(*) FROM exact ex WHERE NOT EXISTS (
                           SELECT 1 FROM lsh l
                           WHERE l.id_a = ex.id_a AND l.id_b = ex.id_b))
                   AS DOUBLE)
                 / (SELECT COUNT(*) FROM exact)
       END AS recall
""",
)
def dedup_recall_audit_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-PIPELINE dedup recall audit: the probabilistic MinHash/LSH
    near-dup pass (8 hashes, band size 2) measured against the exact
    prefix-filtered set-similarity join at the same Jaccard threshold —
    one row: exact pairs, LSH-verified pairs, pairs the banding missed,
    recall. The audit every production dedup deployment should ship:
    banding recall is a tunable probabilistic guarantee, and this query
    turns it into a monitored number using only certified components.
    Both pair sets are bounded (near-dup pairs, not the n^2 space);
    counts reduce to one row."""
    from stadvdb_olap_spark.operators.text_dedup import jaccard_verified_pairs

    docs = load_spread(spark, sf_dir, "documents")
    exact = CU.prefix_filter_jaccard_pairs(
        docs, "doc_id", "text", _AUDIT_T, shingle_n=_SETJOIN_SHINGLE_N
    ).select("id_a", "id_b")
    lsh = jaccard_verified_pairs(docs, "doc_id", "text", _AUDIT_T).select(
        "id_a", "id_b"
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    n_lsh = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    n_missed = exact.join(lsh, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("n_missed")
    )
    joined = (
        n_exact.crossJoin(F.broadcast(n_lsh)).crossJoin(F.broadcast(n_missed))
    )
    recall = F.when(
        F.col("n_exact") == 0, F.lit(None).cast("double")
    ).otherwise(
        (F.col("n_exact") - F.col("n_missed")).cast("double") / F.col("n_exact")
    )
    return joined.select("n_exact", "n_lsh", "n_missed", recall.alias("recall"))


_CURR_PHASES = 10


@query(
    "curriculum_phases_docs",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tokens
    FROM documents
)
SELECT doc_id, n_tokens,
       CAST(ntile({_CURR_PHASES}) OVER (ORDER BY n_tokens, doc_id)
            AS BIGINT) AS phase,
       CAST(row_number() OVER (ORDER BY n_tokens, doc_id) AS BIGINT)
           AS position
FROM toks
""",
)
def curriculum_phases_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-based curriculum ordering: rank the corpus easiest-first
    (shorter documents first — the standard curriculum-learning
    difficulty proxy) and cut it into 10 equal-depth training phases.
    Both the global position and the phase come from
    ``operators/rank.py`` (``global_row_number`` / the closed-form
    ntile on it) over deterministic 16-token-wide buckets — ONE data
    shuffle, per-bucket parallel sorts, broadcast offsets, never an
    unpartitioned window at corpus grain. Token counts use the
    certified whitespace tokenizer; ranks and phases are pure BIGINT.
    100 TB shape: the curriculum writer streams phase-by-phase with a
    partition filter on `phase`; the same plan serves any monotone
    difficulty score (swap the key and bucket expressions)."""
    from stadvdb_olap_spark.operators.rank import (
        global_row_number,
        ntile_from_global_rank,
    )

    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    ranked = global_row_number(
        toks,
        ["n_tokens", "doc_id"],
        bucket=F.expr("n_tokens DIV 16"),
        out="position",
    )
    phased = ntile_from_global_rank(
        ranked, "position", _CURR_PHASES, out="phase"
    )
    return phased.select("doc_id", "n_tokens", "phase", "position")


_SENT_MIN_CHARS = 20


@query(
    "sentence_boilerplate_docs",
    oracle=f"""
WITH s0 AS (
    SELECT doc_id, trim(s) AS sent
    FROM documents,
         unnest(regexp_split_to_array(text, '\\. ')) AS u(s)
),
s1 AS MATERIALIZED (
    SELECT doc_id, sent FROM s0 WHERE length(sent) >= {_SENT_MIN_CHARS}
),
sdf AS MATERIALIZED (
    SELECT sent, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
    FROM s1 GROUP BY sent
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_sentences,
       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boilerplate,
       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS boilerplate_frac
FROM s1 JOIN sdf USING (sent)
GROUP BY doc_id
""",
)
def sentence_boilerplate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-level cross-document boilerplate screen (the CCNet /
    RefinedWeb sentence-dedup grain, complementing the 3-token
    `segment_dedup_docs`): split each document on '. ', keep sentences
    of >= 20 chars, count how many DISTINCT documents each exact
    sentence appears in, and report per-document how much of it is
    corpus boilerplate (sentences shared with any other doc). Split is
    the same regex on both engines; counting is all-BIGINT with one
    final fraction. 100 TB shape: explode -> one sentence-keyed
    hash aggregate (sentences would be md5-keyed at scale to bound key
    width) -> one same-keyed join back -> one doc-keyed aggregate; the
    flagged sentences feed a removal pass exactly like the segment
    variant."""
    docs = load_spread(spark, sf_dir, "documents")
    s1 = (
        docs.select(
            "doc_id",
            F.explode(F.split("text", r"\. ")).alias("s"),
        )
        .select("doc_id", F.trim("s").alias("sent"))
        .filter(F.length("sent") >= _SENT_MIN_CHARS)
    )
    sdf = s1.groupBy("sent").agg(
        F.countDistinct("doc_id").cast("long").alias("nd")
    )
    boiler = F.sum(
        F.when(F.col("nd") >= 2, 1).otherwise(0)
    ).cast("long")
    return (
        s1.join(sdf, "sent")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sentences"),
            boiler.alias("n_boilerplate"),
            (boiler.cast("double") / F.count(F.lit(1))).alias(
                "boilerplate_frac"
            ),
        )
    )


# Pinned content blocklist (shared definition: functions/screens.py —
# the curation pipeline's fused screen filter uses the same expressions).
from stadvdb_olap_spark.functions.screens import (  # noqa: E402  # isort: skip
    BLOCKLIST as _BLOCKLIST,
)


@query(
    "blocklist_screen_docs",
    oracle=f"""
WITH t AS (
    SELECT doc_id, {tokens_sql('text')} AS toks FROM documents
)
SELECT doc_id,
       CAST(len(list_filter(toks,
            x -> list_contains({list(_BLOCKLIST)!r}, x))) AS BIGINT)
           AS n_hits,
       CAST(len(list_distinct(list_filter(toks,
            x -> list_contains({list(_BLOCKLIST)!r}, x)))) AS BIGINT)
           AS n_distinct_terms,
       CASE WHEN len(toks) = 0 THEN 0.0
            ELSE CAST(len(list_filter(toks,
                 x -> list_contains({list(_BLOCKLIST)!r}, x))) AS DOUBLE)
                 / len(toks) END AS hit_ratio,
       len(list_filter(toks,
            x -> list_contains({list(_BLOCKLIST)!r}, x))) = 0 AS keep
FROM t
""",
)
def blocklist_screen_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned-blocklist content screen (the multi-pattern safety filter
    every corpus pipeline runs before training): per document, the
    blocklisted-token hit count, distinct matched terms, hit ratio, and
    the keep decision at zero tolerance. The match runs WITHIN-ROW over
    the certified tokenizer's array (array filter against an 8-term
    literal set — whole-stage-codegen, no join, no shuffle); counting
    is BIGINT with one final ratio. At 100 TB this is the cheapest
    screen in the curation DAG and runs first (`curation_app` ordering);
    a 100k-term production blocklist would swap the literal array for a
    broadcast hash join against exploded tokens — same semantics, same
    per-row verdict."""
    from stadvdb_olap_spark.functions.screens import blocklist_hits

    docs = load_spread(spark, sf_dir, "documents")
    blocked = blocklist_hits("text")
    return docs.select(
        "doc_id",
        F.size(blocked).cast("long").alias("n_hits"),
        F.size(F.array_distinct(blocked)).cast("long").alias(
            "n_distinct_terms"
        ),
        # Zero-token guard: Spark's Divide is null-on-zero but DuckDB's
        # IEEE float divide yields NaN/inf — pin both sides to 0.0.
        F.when(F.size(tokens("text")) == 0, F.lit(0.0))
        .otherwise(
            F.size(blocked).cast("double") / F.size(tokens("text"))
        )
        .alias("hit_ratio"),
        (F.size(blocked) == 0).alias("keep"),
    )
