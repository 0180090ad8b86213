"""PII scrubbing + text normalization expressions for corpus curation.

The redaction/normalization stages every LLM training-data pipeline runs
before tokenization (c.f. the public CCNet/Dolma/RefinedWeb recipes):
regex redaction of emails / phone numbers / IPs / card numbers, HTML tag
stripping, accent folding, and whitespace canonicalization.

All JVM-side ``regexp_replace`` / ``regexp_count`` column expressions —
single narrow pass, no shuffle, no Python — so the stage costs one scan
at 100 TB. Every helper has a DuckDB twin (``*_sql``) computing the
identical value; the regex subset used is common to Java regex and RE2
(no lookaround, no backreferences) so both engines agree match-for-match.

No counterpart exists in the reference (its cleaning is trim/title-case
recodes over warehouse dims — SURVEY.md §2.5); this extends the text
family for the training-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Redaction patterns — Java-regex AND RE2 compatible (no lookaround).
# Applied in list order; counts are taken on the pre-redaction text so
# they are order-independent.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b\d{4}-\d{4}-\d{4}-\d{4}\b", "<CARD>"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # cloud access-key-id shape (AKIA + 16 uppercase base36) — the
    # leaked-credential scrub every crawl pipeline runs.
    ("secret", r"\bAKIA[0-9A-Z]{16}\b", "<SECRET>"),
)

_HTML_TAG = r"<[^>]+>"
_WS_RUN = r"\s+"
# Minimal accent-fold table; extend as corpora demand. translate() is
# codepoint-wise in both engines.
_ACCENTED = "áàâäéèêëíìîïóòôöúùûüñç"
_FOLDED = "aaaaeeeeiiiioooouuuunc"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def scrub_pii(col: Column | str) -> Column:
    """Text with every PII_PATTERNS match replaced by its placeholder."""
    out = _c(col)
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_pii_sql(expr: str) -> str:
    out = expr
    for _, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind match counts on the UN-scrubbed text (order-independent)."""
    c = _c(col)
    return {
        f"n_{kind}": F.regexp_count(c, F.lit(pat)).cast("long")
        for kind, pat, _ in PII_PATTERNS
    }


def pii_counts_sql(expr: str) -> dict[str, str]:
    return {
        f"n_{kind}": f"CAST(len(regexp_extract_all({expr}, '{pat}')) AS BIGINT)"
        for kind, pat, _ in PII_PATTERNS
    }


def normalize_text(col: Column | str) -> Column:
    """Canonical text: HTML tags stripped, accents folded, lowercased,
    whitespace runs collapsed to single spaces, trimmed."""
    c = F.regexp_replace(_c(col), _HTML_TAG, " ")
    c = F.translate(c, _ACCENTED, _FOLDED)
    c = F.lower(c)
    return F.trim(F.regexp_replace(c, _WS_RUN, " "))


def normalize_text_sql(expr: str) -> str:
    c = f"regexp_replace({expr}, '{_HTML_TAG}', ' ', 'g')"
    c = f"translate({c}, '{_ACCENTED}', '{_FOLDED}')"
    c = f"lower({c})"
    return f"trim(regexp_replace({c}, '{_WS_RUN}', ' ', 'g'))"
