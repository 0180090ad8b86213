"""Text-analysis column expressions for training-data pipelines.

All JVM-side (split/transform/aggregate higher-order functions) — no Python
UDFs — so they scale linearly over 100 TB document corpora. Each helper has
a DuckDB-SQL twin (suffix ``_sql``) used by the oracle-checked catalog
queries; both sides compute the identical value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenization — the fixtures' documents are space-separated
# lowercase word soup; a BPE-ish regex tokenizer is provided separately.
#
# The split class is EXPLICIT ASCII whitespace rather than `\s`: Java
# regex `\s` includes vertical tab (\x0b) while DuckDB's RE2 `\s`
# excludes it, so a bare `\s+` silently tokenizes differently across the
# two engines on \x0b-bearing text. Writing the class out pins both
# sides to the identical set (space, tab, LF, VT, FF, CR).
_WS = r"[ \t\n\x0b\f\r]+"
_WS_SQL = r"[ \t\n\x0b\f\r]+"  # RE2 understands the same escapes

# Spark-SQL string-literal form of _WS: the SQL parser unescapes
# backslash sequences in literals, so they are doubled here; after
# unescaping the Java regex receives exactly the _WS pattern.
_WS_SPARK = _WS.replace("\\", "\\\\")

# Simple-identifier test: column names that can be safely backtick-quoted
# into a Spark SQL expression string. Anything else (Column objects,
# composed expressions) keeps the Column-builder path.
import re as _re

_IDENT = _re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def _ident(col) -> str | None:
    if isinstance(col, str) and _IDENT.match(col):
        return f"`{col}`"
    return None


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def let(value: Column, body) -> Column:
    """Bind ``value`` once and reference it many times inside ``body``.

    Higher-order-function expressions (transform/aggregate/filter) are
    codegen-fallback in Spark, so common-subexpression elimination does NOT
    apply inside them: every Column reference re-evaluates its whole subtree
    per row (or worse, per array element). Wrapping the shared value as a
    lambda variable of a singleton-array ``transform`` forces exactly one
    evaluation per row — a `let` binding in expression space.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def tokens_spark_sql(expr: str) -> str:
    """Spark-SQL-dialect twin of :func:`tokens` (same tree, one parse)."""
    return f"split(trim(lower({expr})), '{_WS_SPARK}')"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the trimmed, lowercased text.

    Plain column names go through one ``F.expr`` parse instead of a py4j
    round trip per function call — identical expression, measurably less
    DRIVER time per query build (guide §1: the build is inside the timed
    region of every bench/driver run)."""
    ident = _ident(col)
    if ident is not None:
        return F.expr(tokens_spark_sql(ident))
    return F.split(F.trim(F.lower(_c(col))), _WS)


def tokens_sql(expr: str) -> str:
    return f"regexp_split_to_array(trim(lower({expr})), '{_WS_SQL}')"


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col)).cast("long")


def token_count_sql(expr: str) -> str:
    return f"CAST(len({tokens_sql(expr)}) AS BIGINT)"


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: words + digits + punctuation marks counted
    separately (a cheap proxy for BPE token counts used to budget LLM
    training data)."""
    c = _c(col)
    # explicit whitespace in the negated class too (Java \s vs RE2 \s
    # differ on \x0b — see the _WS note above)
    pieces = F.regexp_extract_all(
        c, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\x0b\f\r]"), 0
    )
    return F.size(pieces).cast("long")


def bpe_ish_token_count_sql(expr: str) -> str:
    return (
        f"CAST(len(regexp_extract_all({expr}, "
        f"'[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\x0b\\f\\r]')) AS BIGINT)"
    )


def word_shingles_spark_sql(expr: str, n: int = 3) -> str:
    """Spark-SQL-dialect twin of :func:`word_shingles`: the identical
    let-bound transform tree, emitted as one parseable string."""
    t = tokens_spark_sql(expr)
    body = (
        f"CASE WHEN size(t) >= {n} THEN "
        f"transform(sequence(0, size(t) - {n}), "
        f"i -> array_join(slice(t, i + 1, {n}), ' ')) "
        f"ELSE array(array_join(t, ' ')) END"
    )
    return f"element_at(transform(array({t}), t -> {body}), 1)"


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>), the MinHash input unit.
    Documents shorter than ``n`` tokens yield their full token join as the
    single shingle so no document is dropped. Plain column names take the
    one-parse ``F.expr`` path (same tree; see :func:`tokens`)."""
    ident = _ident(col)
    if ident is not None:
        return F.expr(word_shingles_spark_sql(ident, n))
    return let(
        tokens(col),
        lambda t: F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.array_join(F.slice(t, i + 1, n), " "),
            ),
        ).otherwise(F.array(F.array_join(t, " "))),
    )


def word_shingles_sql(expr: str, n: int = 3) -> str:
    t = tokens_sql(expr)
    return (
        f"CASE WHEN len({t}) >= {n} THEN "
        f"list_transform(range(1, len({t}) - {n} + 2), "
        f"i -> array_to_string({t}[i:i+{n - 1}], ' ')) "
        f"ELSE [array_to_string({t}, ' ')] END"
    )


def quality_stats(col: Column | str, stopwords: tuple[str, ...]) -> dict[str, Column]:
    """Quality-scoring signals: char length, token count, mean word length,
    punctuation ratio, stopword ratio. Ratios are plain IEEE doubles
    (identical across engines)."""
    c = _c(col)
    t = tokens(col)
    n_tok = F.size(t)
    n_chars = F.length(c).cast("long")
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()-]", ""))
    sw = F.array([F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok.cast("long"),
        "mean_word_len": (
            F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
            .cast("double")
            / n_tok
        ),
        "punct_ratio": n_punct.cast("double") / n_chars,
        "stopword_ratio": n_stop.cast("double") / n_tok,
    }


def lang_scores(col: Column | str, profiles: dict[str, tuple[str, ...]]) -> Column:
    """n-gram/stopword language-ID heuristic: for each language profile,
    the fraction of tokens that are profile words; returns the argmax
    language (ties broken by language code order)."""
    t = tokens(col)
    n_tok = F.size(t)
    best_lang = None
    best_score = None
    for lang in sorted(profiles):
        words = F.array([F.lit(w) for w in profiles[lang]])
        score = F.size(F.filter(t, lambda x: F.array_contains(words, x))).cast(
            "double"
        ) / n_tok
        if best_lang is None:
            best_lang, best_score = F.lit(lang), score
        else:
            # strict > keeps the earlier (alphabetically first) language on ties
            best_lang = F.when(score > best_score, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(score > best_score, score).otherwise(best_score)
    return best_lang


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 over the sorted distinct token set — a
    canonical content hash robust to word order and duplication (the
    'sorted shingle fingerprint' family)."""
    t = F.array_sort(F.array_distinct(tokens(col)))
    return F.md5(F.array_join(t, " "))


def fingerprint_sql(expr: str) -> str:
    t = tokens_sql(expr)
    return f"md5(array_to_string(list_sort(list_distinct({t})), ' '))"
