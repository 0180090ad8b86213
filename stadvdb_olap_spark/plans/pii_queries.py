"""PII-scrub / normalization / repetition-filter catalog queries.

The corpus-curation stages between raw crawl and tokenizer: redact PII,
canonicalize text, and drop pathologically repetitive documents (the
public Gopher/Dolma quality rules). The fixture documents are clean ASCII
word soup, so each query deterministically INJECTS the dirty content
(PII strings, HTML tags, accents, doubled whitespace) as a pure function
of (doc_id, text) on BOTH engines — the DuckDB twin performs the same
injection — which makes the differential comparison a real end-to-end
test of the scrub/normalize expressions rather than an identity pass.

Scale shape: every query here is a single narrow projection over the
corpus (regexp/translate/HOF expressions, no Python, no shuffle) except
the final per-source aggregate, which exchanges only a few counters per
source. The repetition signals are computed row-locally via sorted-array
runs — NOT explode + groupBy(doc_id), which would shuffle the whole
token stream at 100 TB.

No counterpart in the reference (cleaning there is dim trim/recode,
SURVEY.md §2.5); this is the training-data-pipeline extension family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from stadvdb_olap_spark.functions.pii import (
    normalize_text,
    normalize_text_sql,
    pii_counts,
    pii_counts_sql,
    scrub_pii,
    scrub_pii_sql,
)
from stadvdb_olap_spark.functions.text import tokens, tokens_sql, word_shingles, word_shingles_sql
from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.sources.parquet import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# --- deterministic dirty-content injection (identical on both engines) ---

def _inject_pii(doc_id: Column, text: Column) -> Column:
    i = doc_id.cast("int")
    s = lambda c: c.cast("string")  # noqa: E731
    return F.concat(
        text,
        F.lit(" contact user"), doc_id, F.lit("@mail.example.com call +1-555-"),
        F.lpad(s((i * 7) % 10000), 4, "0"),
        F.lit(" from 10."), s(i % 256), F.lit("."), s((i * 3) % 256),
        F.lit(".4 card 4111-1111-1111-"), F.lpad(s(i % 10000), 4, "0"),
        F.lit(" ssn "), F.lpad(s((i * 13) % 1000), 3, "0"),
        F.lit("-"), F.lpad(s(i % 100), 2, "0"),
        F.lit("-"), F.lpad(s((i * 7) % 10000), 4, "0"),
        F.lit(" key AKIA"),
        F.upper(F.substring(F.md5(s(i).cast("binary")), 1, 16)),
    )


def _inject_pii_sql(doc_id: str, text: str) -> str:
    i = f"CAST({doc_id} AS INTEGER)"
    return (
        f"{text} || ' contact user' || {doc_id} || '@mail.example.com call +1-555-'"
        f" || lpad(CAST(({i} * 7) % 10000 AS VARCHAR), 4, '0')"
        f" || ' from 10.' || CAST({i} % 256 AS VARCHAR) || '.'"
        f" || CAST(({i} * 3) % 256 AS VARCHAR)"
        f" || '.4 card 4111-1111-1111-' || lpad(CAST({i} % 10000 AS VARCHAR), 4, '0')"
        f" || ' ssn ' || lpad(CAST(({i} * 13) % 1000 AS VARCHAR), 3, '0')"
        f" || '-' || lpad(CAST({i} % 100 AS VARCHAR), 2, '0')"
        f" || '-' || lpad(CAST(({i} * 7) % 10000 AS VARCHAR), 4, '0')"
        f" || ' key AKIA' || upper(substring(md5(CAST({i} AS VARCHAR)), 1, 16))"
    )


def _inject_markup(text: Column) -> Column:
    # HTML wrapper, accented 'a'/'e', doubled spaces: everything
    # normalize_text must undo to round-trip back to the original.
    dirty = F.regexp_replace(text, "a", "á")
    dirty = F.regexp_replace(dirty, "e", "é")
    dirty = F.regexp_replace(dirty, " ", "  ")
    return F.concat(F.lit("<p class=\"doc\">"), dirty, F.lit("</p>"))


def _inject_markup_sql(text: str) -> str:
    dirty = f"replace({text}, 'a', 'á')"
    dirty = f"replace({dirty}, 'e', 'é')"
    dirty = f"replace({dirty}, ' ', '  ')"
    return f"'<p class=\"doc\">' || {dirty} || '</p>'"


# --- queries ---

_PII_COUNT_COLS = ("n_email", "n_card", "n_phone", "n_ip", "n_ssn", "n_secret")

_scrub_counts_sql = pii_counts_sql(_inject_pii_sql("doc_id", "text"))

@query(
    "pii_scrub_docs",
    oracle=f"""
SELECT doc_id,
       {scrub_pii_sql(_inject_pii_sql("doc_id", "text"))} AS scrubbed,
       {_scrub_counts_sql["n_email"]}  AS n_email,
       {_scrub_counts_sql["n_card"]}   AS n_card,
       {_scrub_counts_sql["n_phone"]}  AS n_phone,
       {_scrub_counts_sql["n_ip"]}     AS n_ip,
       {_scrub_counts_sql["n_ssn"]}    AS n_ssn,
       {_scrub_counts_sql["n_secret"]} AS n_secret
FROM documents
""",
)
def pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails/cards/phones/IPs/SSNs/access keys and count per-kind
    hits. One regexp projection per pattern, fused by codegen into a
    single scan — the whole stage is shuffle-free at any corpus size."""
    docs = _docs(spark, sf_dir)
    dirty = _inject_pii(F.col("doc_id"), F.col("text"))
    counts = pii_counts(dirty)
    return docs.select(
        "doc_id",
        scrub_pii(dirty).alias("scrubbed"),
        *[counts[c].alias(c) for c in _PII_COUNT_COLS],
    )


_src_counts_sql = pii_counts_sql(_inject_pii_sql("doc_id", "text"))

@query(
    "pii_hits_by_source",
    oracle=f"""
SELECT source,
       CAST(sum({_src_counts_sql["n_email"]})  AS BIGINT) AS emails,
       CAST(sum({_src_counts_sql["n_phone"]})  AS BIGINT) AS phones,
       CAST(sum({_src_counts_sql["n_ip"]})     AS BIGINT) AS ips,
       CAST(sum({_src_counts_sql["n_card"]})   AS BIGINT) AS cards,
       CAST(sum({_src_counts_sql["n_ssn"]})    AS BIGINT) AS ssns,
       CAST(sum({_src_counts_sql["n_secret"]}) AS BIGINT) AS secrets
FROM documents GROUP BY source
""",
)
def pii_hits_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII audit rollup: total redactions per source — the report a
    curation run emits. Map-side partial sums; only one counter row per
    source crosses the exchange."""
    docs = _docs(spark, sf_dir)
    counts = pii_counts(_inject_pii(F.col("doc_id"), F.col("text")))
    return docs.groupBy("source").agg(
        F.sum(counts["n_email"]).alias("emails"),
        F.sum(counts["n_phone"]).alias("phones"),
        F.sum(counts["n_ip"]).alias("ips"),
        F.sum(counts["n_card"]).alias("cards"),
        F.sum(counts["n_ssn"]).alias("ssns"),
        F.sum(counts["n_secret"]).alias("secrets"),
    )


@query(
    "normalize_text_docs",
    oracle=f"""
SELECT doc_id,
       {normalize_text_sql(_inject_markup_sql("text"))} AS norm_text,
       {normalize_text_sql(_inject_markup_sql("text"))} = text AS roundtrip_ok
FROM documents
""",
)
def normalize_text_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML-strip + accent-fold + case/whitespace canonicalization. The
    fixture text is already canonical, so normalizing the injected dirty
    variant must round-trip exactly (`roundtrip_ok`) — a self-checking
    invariant the oracle also verifies value-by-value."""
    docs = _docs(spark, sf_dir)
    norm = normalize_text(_inject_markup(F.col("text")))
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        (norm == F.col("text")).alias("roundtrip_ok"),
    )


@query(
    "repetition_stats_docs",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, {tokens_sql("text")} AS t, {word_shingles_sql("text", 2)} AS sh
    FROM documents
),
top AS (
    SELECT doc_id, max(c) AS top_count FROM (
        SELECT doc_id, tok, count(*) AS c
        FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
        GROUP BY doc_id, tok
    ) GROUP BY doc_id
)
SELECT toks.doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS dup_word_frac,
       CAST(top_count AS DOUBLE) / len(t) AS top_word_frac,
       1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh) AS dup_bigram_frac
FROM toks JOIN top ON toks.doc_id = top.doc_id
""",
)
def repetition_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate-word fraction, top-word
    fraction, duplicate-bigram fraction. Computed ROW-LOCALLY — the
    top-word count is the longest equal run of the sorted token array via
    one aggregate() pass — so the stage is a narrow projection; the
    explode+groupBy(doc_id) formulation (the oracle's, fine for DuckDB)
    would shuffle the entire token stream at 100 TB."""
    docs = _docs(spark, sf_dir)
    t = tokens("text")
    sh = word_shingles("text", 2)
    n = F.size(t)
    # Longest equal-adjacent run of the sorted array == max token count.
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
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        (F.lit(1.0) - F.size(F.array_distinct(t)).cast("double") / n).alias(
            "dup_word_frac"
        ),
        (run.cast("double") / n).alias("top_word_frac"),
        (
            F.lit(1.0) - F.size(F.array_distinct(sh)).cast("double") / F.size(sh)
        ).alias("dup_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# Gopher-style rule-stack filter (Rae et al. 2021 §A1.1; public rules)
# ---------------------------------------------------------------------------
#
# The hand-rule companion to the learned scorer (quality_logit_filter_docs):
# each rule is a boolean over the already-certified feature expressions, the
# verdict is "fail zero rules". Thresholds are the published Gopher ones
# where the signal exists here (token-count bounds, mean-word-length band,
# stopword evidence, repetition caps).

from stadvdb_olap_spark.functions.screens import (  # noqa: E402  # isort: skip
    GOPHER_STOPWORDS as _GOPHER_STOPWORDS,
)


@query(
    "gopher_rules_filter_docs",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, {tokens_sql("text")} AS t, {word_shingles_sql("text", 2)} AS sh
    FROM documents
),
top AS (
    SELECT doc_id, max(c) AS top_count FROM (
        SELECT doc_id, tok, count(*) AS c
        FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
        GROUP BY doc_id, tok
    ) GROUP BY doc_id
),
f AS (
    SELECT toks.doc_id,
           len(t) AS n_tokens,
           CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum')
                AS DOUBLE) / len(t) AS mean_word_len,
           CAST(len(list_filter(t, x -> list_contains({list(_GOPHER_STOPWORDS)!r}, x)))
                AS BIGINT) AS n_stop,
           1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS dup_word_frac,
           CAST(top_count AS DOUBLE) / len(t) AS top_word_frac,
           1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh) AS dup_bigram_frac
    FROM toks JOIN top ON toks.doc_id = top.doc_id
)
SELECT doc_id,
       n_tokens BETWEEN 50 AND 100000            AS ok_len,
       mean_word_len BETWEEN 3.0 AND 10.0        AS ok_word_len,
       n_stop >= 2                               AS ok_stopwords,
       dup_word_frac <= 0.80                     AS ok_dup_words,
       top_word_frac <= 0.20                     AS ok_top_word,
       dup_bigram_frac <= 0.40                   AS ok_dup_bigrams,
       CAST((CASE WHEN n_tokens BETWEEN 50 AND 100000 THEN 0 ELSE 1 END)
          + (CASE WHEN mean_word_len BETWEEN 3.0 AND 10.0 THEN 0 ELSE 1 END)
          + (CASE WHEN n_stop >= 2 THEN 0 ELSE 1 END)
          + (CASE WHEN dup_word_frac <= 0.80 THEN 0 ELSE 1 END)
          + (CASE WHEN top_word_frac <= 0.20 THEN 0 ELSE 1 END)
          + (CASE WHEN dup_bigram_frac <= 0.40 THEN 0 ELSE 1 END) AS BIGINT)
           AS n_failed,
       (n_tokens BETWEEN 50 AND 100000)
       AND (mean_word_len BETWEEN 3.0 AND 10.0)
       AND n_stop >= 2
       AND dup_word_frac <= 0.80
       AND top_word_frac <= 0.20
       AND dup_bigram_frac <= 0.40               AS keep
FROM f
""",
)
def gopher_rules_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-stack quality filter: the published hand rules
    (token-count bounds, mean-word-length band, stopword evidence,
    repetition caps) each as a boolean verdict plus the failure count and
    overall keep — the transparent companion to the learned
    ``quality_logit_filter_docs``. All features are row-local (the
    repetition signals use the sorted-array-run device, never
    explode+regroup), so the whole stack is one narrow scan-bound
    projection at any corpus size. Features, thresholds and the keep
    verdict are the SHARED ``functions/screens.py`` expressions — the
    same ones the curation pipeline's fused screen filter evaluates, so
    the app policy can never drift from this certified one."""
    from stadvdb_olap_spark.functions.screens import (
        gopher_features,
        gopher_rules,
    )

    docs = _docs(spark, sf_dir)
    f = gopher_features("text")
    feats = docs.select(
        "doc_id",
        *[c.alias(name) for name, c in f.items()],
    )
    rules = gopher_rules({name: F.col(name) for name in f})
    n_failed = None
    keep = None
    for c in rules.values():
        fail = F.when(c, F.lit(0)).otherwise(F.lit(1))
        n_failed = fail if n_failed is None else n_failed + fail
        keep = c if keep is None else keep & c
    return feats.select(
        "doc_id",
        *[c.alias(name) for name, c in rules.items()],
        n_failed.cast("long").alias("n_failed"),
        keep.alias("keep"),
    )


_K_ANON = 5


@query(
    "k_anonymity_audit_customers",
    oracle=f"""
WITH cls AS (
    SELECT c_nationkey,
           c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS balance_band,
           CAST(COUNT(*) AS BIGINT) AS class_size
    FROM customer
    GROUP BY 1, 2, 3
)
SELECT c_nationkey, c_mktsegment, balance_band, class_size,
       class_size < {_K_ANON} AS violates_k
FROM cls
""",
)
def k_anonymity_audit_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) of the customer table under the
    quasi-identifier (nation, market segment, $1000 balance band): the
    size of every equivalence class and whether it violates k=5 — the
    re-identification screen a privacy review runs before releasing a
    dataset keyed on demographic columns. Pure integer grouping (the
    acctbal band is a floor of an exact cents-backed double divided by
    1000 — correctly rounded on both engines), so hash-exact. At 100 TB
    this is one hash aggregation over the quasi-identifier key; the
    violating classes feed a suppression/generalization pass."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias(
                "balance_band"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "balance_band",
            "class_size",
            (F.col("class_size") < _K_ANON).alias("violates_k"),
        )
    )


_L_DIV = 3


@query(
    "l_diversity_audit_customers",
    oracle=f"""
WITH cls AS (
    SELECT c_nationkey,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS balance_band,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_distinct
    FROM customer
    GROUP BY 1, 2
)
SELECT c_nationkey, balance_band, class_size, l_distinct,
       l_distinct < {_L_DIV} AS violates_l
FROM cls
""",
)
def l_diversity_audit_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. 2007) — the
    companion screen to `k_anonymity_audit_customers`: a class can be
    large (k-anonymous) yet still leak its sensitive attribute when
    every member shares one value. Quasi-identifier = (nation, $1000
    balance band); sensitive attribute = market segment; a class
    violates l=3 when fewer than 3 distinct segments appear. Pure
    integer grouping + COUNT(DISTINCT) — hash-exact. 100 TB shape: one
    hash aggregation over the QI key with a distinct-aggregate
    (two-phase partial/final under AQE); violating classes feed the
    same suppression pass as the k-anonymity audit."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias(
                "balance_band"
            ),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("class_size"),
            F.countDistinct("c_mktsegment").cast("long").alias("l_distinct"),
        )
        .select(
            "c_nationkey",
            "balance_band",
            "class_size",
            "l_distinct",
            (F.col("l_distinct") < _L_DIV).alias("violates_l"),
        )
    )


_CAL_LO, _CAL_W, _CAL_NBINS = -2.0, 0.4, 10


def _calibration_oracle() -> str:
    from stadvdb_olap_spark.plans.catalog import REGISTRY

    ql = REGISTRY["quality_logit_filter_docs"].oracle
    gr = REGISTRY["gopher_rules_filter_docs"].oracle
    return f"""
WITH ql AS MATERIALIZED ({ql}),
gr AS MATERIALIZED ({gr}),
j AS (
    SELECT ql.logit, gr.keep AS label
    FROM ql JOIN gr ON ql.doc_id = gr.doc_id
),
b AS (
    SELECT least(greatest(CAST(floor((logit - CAST('{_CAL_LO!r}' AS DOUBLE))
                   / CAST('{_CAL_W!r}' AS DOUBLE)) AS BIGINT), 0),
                 {_CAL_NBINS - 1}) AS bin,
           label
    FROM j
)
SELECT bin,
       CAST('{_CAL_LO!r}' AS DOUBLE)
           + (bin + CAST('0.5' AS DOUBLE)) * CAST('{_CAL_W!r}' AS DOUBLE)
           AS bin_mid_logit,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (label) AS BIGINT) AS n_rule_keep,
       CAST(COUNT(*) FILTER (label) AS DOUBLE) / COUNT(*) AS rule_keep_rate
FROM b GROUP BY bin
"""


@query("calibration_bins_quality_vs_rules", oracle=_calibration_oracle())
def calibration_bins_quality_vs_rules(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability-diagram table for the learned quality scorer against
    the Gopher rule-stack label: documents bucketed into 10 fixed logit
    bins, each with its size, rule-keep count, and empirical keep rate
    — the calibration audit (Guo et al. 2017) a curation pipeline runs
    before trusting a classifier to replace its rule filters (a
    well-calibrated scorer's keep rate climbs monotonically through
    the bins). Determinism: both inputs are already-certified queries;
    binning floors an identical double against literal edges, and the
    only float outputs are a literal-derived bin midpoint and one
    exact-integer division. One narrow join on doc_id (at 100 TB both
    sides are projections of the same scan, so the join fuses; the
    aggregate is 10 rows)."""
    from stadvdb_olap_spark.plans.text_queries import quality_logit_filter_docs

    ql = quality_logit_filter_docs(spark, sf_dir).select("doc_id", "logit")
    gr = gopher_rules_filter_docs(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("label")
    )
    binned = ql.join(gr, "doc_id").select(
        F.least(
            F.greatest(
                F.floor(
                    (F.col("logit") - F.lit(_CAL_LO)) / F.lit(_CAL_W)
                ).cast("long"),
                F.lit(0),
            ),
            F.lit(_CAL_NBINS - 1),
        ).alias("bin"),
        "label",
    )
    return binned.groupBy("bin").agg(
        (
            F.lit(_CAL_LO)
            + (F.col("bin") + F.lit(0.5)) * F.lit(_CAL_W)
        ).alias("bin_mid_logit"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("label"), 1).otherwise(0))
        .cast("long")
        .alias("n_rule_keep"),
        (
            F.sum(F.when(F.col("label"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("rule_keep_rate"),
    )
