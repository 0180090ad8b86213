"""Sub-document corpus curation: segment dedup, exact set-similarity join.

Beyond-reference training-data operators (the reference ETL at
/root/reference has no text surface at all — these extend the engine for
the LLM-pipeline brief):

- ``segment_dedup`` is the C4/CCNet-family *line-level* dedup: split each
  document into fixed-length token segments, drop every segment whose
  exact content recurs across >= ``min_doc_freq`` distinct documents
  (boilerplate), and reassemble the survivors in original order. The
  public formulation is C4's "discard every three-sentence span occurring
  more than once" (Raffel et al. 2020, §2.2) adapted to the fixture's
  newline-free token streams.
- ``prefix_filter_jaccard_pairs`` is an EXACT set-similarity self-join
  (all pairs with shingle-set Jaccard >= t) via prefix filtering
  (Bayardo/Ma/Srikant "Scaling Up All Pairs Similarity Search", WWW'07;
  the PPJoin family): order each document's shingles rarest-first by
  global document frequency and index only the first
  ``n - ceil(t*n) + 1`` of them — any pair at Jaccard >= t must collide
  on at least one prefix shingle, so recall is provably 100% while the
  candidate join touches only rare shingles. This is the deterministic
  counterpart to MinHash-LSH (operators/text_dedup.py): same output
  contract, no probabilistic recall loss, cost bounded by
  sum-over-prefix-shingles of freq^2 instead of n^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stadvdb_olap_spark.functions.text import tokens, word_shingles
from stadvdb_olap_spark.operators.text_dedup import _jaccard, _shingle_sets


def doc_segments(
    df: DataFrame, id_col: str, text_col: str, seg_len: int
) -> DataFrame:
    """One row per (doc, segment): non-overlapping ``seg_len``-token
    windows with their position. Pure narrow ops — tokenize, per-row
    start sequence, explode, slice — no shuffle; parallelism equals the
    input partition count at any scale."""
    toked = (
        df.select(F.col(id_col), tokens(text_col).alias("toks"))
        .withColumn("n", F.size("toks").cast("long"))
        # Token-less rows (NULL text -> size -1) must yield ZERO segment
        # rows, matching generate_series(0, -1) = empty on the oracle
        # side; without this, Spark's sequence(0, -1) counts DOWN and
        # fabricates two phantom segments.
        .filter(F.col("n") >= 1)
    )
    seg_idx = F.explode(
        F.sequence(
            F.lit(0).cast("long"),
            F.ceil(F.col("n") / seg_len).cast("long") - 1,
        )
    ).alias("seg_idx")
    out = toked.select(id_col, "toks", seg_idx)
    return out.select(
        id_col,
        "seg_idx",
        F.array_join(
            F.slice("toks", F.col("seg_idx") * seg_len + 1, seg_len), " "
        ).alias("seg"),
    )


def segment_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seg_len: int = 3,
    min_doc_freq: int = 5,
) -> DataFrame:
    """Order-preserving segment-level dedup with reassembly.

    Returns (id, kept_text, n_segments, n_dropped): ``kept_text`` is the
    document with every corpus-duplicated segment removed, surviving
    segments rejoined in original order ('' when everything was
    boilerplate).

    Three shuffles at any scale, all on keys: (1) segment doc-frequency
    hash-aggregate on the segment value, (2) segments join that frequency
    table on the same key (AQE reuses the co-partitioning; the frequency
    side holds one row per DISTINCT segment, far smaller than the segment
    stream), (3) per-document regroup to reassemble. The reassembly sorts
    a per-document in-memory array (documents are bounded; no global
    sort). countDistinct is exact — swap for approx_count_distinct at
    extreme segment cardinalities where +-2% boilerplate recall is
    acceptable.
    """
    segs = doc_segments(df, id_col, text_col, seg_len)
    freq = segs.groupBy("seg").agg(
        F.countDistinct(id_col).alias("seg_doc_freq")
    )
    flagged = segs.join(freq, "seg").withColumn(
        "is_dup", F.col("seg_doc_freq") >= min_doc_freq
    )
    kept_structs = F.collect_list(
        F.when(~F.col("is_dup"), F.struct("seg_idx", "seg"))
    )
    return flagged.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(F.array_sort(kept_structs), lambda s: s["seg"]),
        ).alias("kept_text"),
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.col("is_dup").cast("long")).alias("n_dropped"),
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 3,
) -> DataFrame:
    """ALL pairs (id_a < id_b) with distinct-shingle-set Jaccard >=
    ``threshold``, exactly — no candidate is missed.

    Prefix filter: with shingles ordered by a global total order (here:
    ascending document frequency, shingle text as tiebreak), two sets at
    Jaccard >= t must share an element among the first
    ``n - ceil(t*n) + 1`` of each (else the overlap ceil(t/(1+t)*(na+nb))
    required by J >= t cannot be reached). Only those prefix shingles are
    exploded into the candidate self-join, and rarest-first ordering makes
    prefixes the low-frequency tail, so the join cost is
    sum(prefix_freq^2) — near-linear on real corpora versus n^2 for the
    naive join. Verification then computes exact Jaccard on candidates
    only, with the same shared ``_jaccard`` definition as the LSH path.
    """
    sets = df.select(
        F.col(id_col),
        F.array_distinct(word_shingles(text_col, shingle_n)).alias("sh"),
    )
    freq = (
        sets.select(F.col(id_col), F.explode("sh").alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("g_freq"))
    )
    # Rarest-first prefix of each document's shingle set. ``ordered``
    # carries every shingle of the doc, so the set size — and with it the
    # prefix length — derives from it directly; no second join back to
    # ``sets``.
    n_col = F.size("ordered").cast("long")
    prefix_len = n_col - F.ceil(F.lit(threshold) * n_col).cast("long") + 1
    prefixes = (
        sets.select(F.col(id_col), F.explode("sh").alias("g"))
        .join(freq, "g")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("g_freq", "g"))
            ).alias("ordered")
        )
        .select(
            F.col(id_col),
            n_col.alias("n"),
            F.explode(
                F.transform(
                    F.slice("ordered", 1, prefix_len),
                    lambda s: s["g"],
                )
            ).alias("g"),
        )
    )
    # Length filter (lossless): J >= t forces t*|A| <= |B| and t*|B| <= |A|,
    # so size-discordant collisions drop before the distinct.
    cands = (
        prefixes.select(F.col("g"), F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
        .join(
            prefixes.select(
                F.col("g"), F.col(id_col).alias("id_b"), F.col("n").alias("n_b")
            ),
            "g",
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("n_b") >= F.lit(threshold) * F.col("n_a"))
            & (F.col("n_a") >= F.lit(threshold) * F.col("n_b"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    a = _shingle_sets(df, id_col, text_col, shingle_n, "id_a", "sh_a")
    b = _shingle_sets(df, id_col, text_col, shingle_n, "id_b", "sh_b")
    jac = F.round(_jaccard("sh_a", "sh_b"), 6).cast("double")
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def duplicate_ngram_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicated n-gram span statistics — the corpus-level signal
    behind substring deduplication (Lee et al., "Deduplicating Training
    Data Makes Language Models Better": long token spans that repeat
    VERBATIM across a web corpus are near-always boilerplate or mirror
    content, and models memorize them disproportionately).

    Per document: how many token ``n``-gram spans it contains, how many
    of those occur at least ``min_count`` times corpus-wide (counting
    multiplicity, including repeats within one document), and the
    duplicated fraction — the score a curation pass thresholds or weights
    on. Documents shorter than ``n`` tokens contribute their full token
    join as a single pseudo-span (``word_shingles`` semantics), so no
    document is unscored.

    100 TB shape: the span explode is a narrow per-row flatMap (output
    linear in corpus token count); the frequency aggregate is ONE shuffle
    on the span text with map-side combine; scoring joins spans back to
    frequencies on the same span key — same-keyed, so no extra exchange
    on the frequency side — then regroups per document. Grouping on the
    span TEXT (not a hash of it) keeps the operator engine-portable and
    collision-free; swap in a 128-bit hash projection before the shuffle
    to shrink rows when span length >> 16 bytes.
    """
    spans = df.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("span")
    )
    freq = spans.groupBy("span").agg(F.count(F.lit(1)).alias("__c"))
    dup = (F.col("__c") >= min_count).cast("long")
    return (
        spans.join(freq, "span")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(dup).alias("n_dup_spans"),
        )
        .select(
            id_col,
            "n_spans",
            "n_dup_spans",
            # exact small-int division: IEEE-correctly-rounded in every
            # engine, no decimal device needed
            (F.col("n_dup_spans").cast("double") / F.col("n_spans"))
            .alias("dup_span_ratio"),
        )
    )
