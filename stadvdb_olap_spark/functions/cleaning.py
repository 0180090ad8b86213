"""Cleaning column expressions — SURVEY.md §2.6–§2.8 parity.

Every transform the reference does in pandas (``cleanUserData``
``/root/reference/ETL/user_ETL.py:46-59``, ``cleanLocationData``
``loc_ETL.py:46-55``, ``cleanProductData`` ``prod_ETL.py:47-62``,
``cleanFactData`` ``fact_ETL.py:47-58``, ``cleanDateData``
``date_ETL.py:46-50``) re-expressed as built-in Spark column expressions so
they stay inside whole-stage codegen. No Python UDFs anywhere in this
module — even the pandas-exact title-case is a JVM-side higher-order
function over a char array.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# String cleaning (T1/T2/T3/T4)
# ---------------------------------------------------------------------------


def trim_cols(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """T1 — whitespace trim (pandas ``.str.strip()``, user_ETL.py:47-53)."""
    return df.withColumns({c: F.trim(F.col(c)) for c in cols})


def lower_cols(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """T2 — lowercase (pandas ``.str.lower()``, user_ETL.py:47,53)."""
    return df.withColumns({c: F.lower(F.col(c)) for c in cols})


def titlecase_initcap(col: Column | str) -> Column:
    """T3 (default) — Spark ``initcap``: word-initial capitals on
    whitespace boundaries. Fast path; differs from pandas on ``"men's"``."""
    return F.initcap(F.col(col) if isinstance(col, str) else col)


def titlecase_exact(col: Column | str) -> Column:
    """T3 (exact) — byte-for-byte pandas ``str.title()`` semantics
    (user_ETL.py:48-49): a letter is uppercased iff it is the first char or
    the previous char is not a letter; all other letters lowercased.

    Implemented as a JVM-side higher-order function over the char array —
    no Python round-trip, stays in codegen, scales linearly. ASCII letters
    (the fixture domain); extend the class for unicode if needed.
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    # transform(..., (x, i) -> ...): i is 0-based; element_at is 1-based, so
    # element_at(chars, i) is the PREVIOUS char. The i==0 branch is checked
    # first, so element_at never sees index 0.
    titled = F.transform(
        chars,
        lambda x, i: F.when(i == F.lit(0), F.upper(x))
        .when(~F.element_at(chars, i).rlike("[A-Za-z]"), F.upper(x))
        .otherwise(F.lower(x)),
    )
    return F.array_join(titled, "")


def recode(col: Column | str, mapping: Mapping[str, str], keep_unmatched: bool = True) -> Column:
    """T4 — dictionary value recode (pandas ``.replace``; gender map
    user_ETL.py:50-55, category synonyms prod_ETL.py:55-59).

    Compiled to a literal MAP lookup (``element_at(map, col)``) rather than
    an N-deep ``when`` chain: constant-time per row, one expression node, and
    Catalyst constant-folds the map. For very large vocabularies prefer a
    broadcast-joined mapping table (see operators.dedup docstring).
    """
    c = F.col(col) if isinstance(col, str) else col
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    looked_up = F.element_at(F.create_map(*pairs), c)
    return F.coalesce(looked_up, c) if keep_unmatched else looked_up


def recode_via_join(
    df,
    col: str,
    mapping_df,
    out_col: str | None = None,
    key_col: str = "from_value",
    value_col: str = "to_value",
    keep_unmatched: bool = True,
):
    """T4 at vocabulary scale: recode through a broadcast-joined mapping
    TABLE instead of a literal map expression (the SURVEY §4 rewrite
    candidate). Right for mappings that are data (thousands+ of entries,
    maintained outside the code): the mapping ships once per executor as a
    broadcast hash table, and updates don't recompile the query."""
    out_col = out_col or col
    m = mapping_df.select(
        F.col(key_col).alias("__from"), F.col(value_col).alias("__to")
    )
    joined = df.join(F.broadcast(m), df[col] == m["__from"], "left")
    replacement = (
        F.coalesce(F.col("__to"), F.col(col)) if keep_unmatched else F.col("__to")
    )
    return joined.withColumn(out_col, replacement).drop("__from", "__to")


# ---------------------------------------------------------------------------
# Date/time (C1/C2)
# ---------------------------------------------------------------------------

DEFAULT_DATETIME_FORMATS = (
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "MM/dd/yyyy",
    "MMMM d, yyyy",
    "dd-MMM-yyyy",
)


def parse_datetime_mixed(
    col: Column | str, formats: Iterable[str] = DEFAULT_DATETIME_FORMATS
) -> Column:
    """C1 — mixed-format datetime parsing (pandas ``to_datetime(...,
    format='mixed')``, user_ETL.py:56, date_ETL.py:47).

    Spark has no per-row format sniffing; ``coalesce`` over
    ``try_to_timestamp`` with the known format vocabulary gives identical
    results for any enumerable format set and stays vectorized.
    """
    c = F.col(col) if isinstance(col, str) else col
    attempts = [F.try_to_timestamp(c, F.lit(fmt)) for fmt in formats]
    # Final fallback: default-format parse (ISO-ish), NULL if unparseable.
    attempts.append(F.try_to_timestamp(c))
    return F.coalesce(*attempts)


def normalize_date(col: Column | str) -> Column:
    """C2 — truncate to midnight (pandas ``.dt.normalize()``,
    date_ETL.py:47). Returns a DATE, the canonical warehouse grain."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c)


# ---------------------------------------------------------------------------
# Numeric (P5/M2/M3/F2)
# ---------------------------------------------------------------------------


def ceil_to_cents(col: Column | str) -> Column:
    """P5/M2 — round UP to 2 decimals: ``np.ceil(x*100)/100``
    (prod_ETL.py:53, fact_ETL.py:56). IEEE-double semantics match numpy
    exactly (same representable values, same ceil)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.ceil(c * 100) / 100


def coerce_numeric(col: Column | str) -> Column:
    """F2/M3 — ``pd.to_numeric(errors='coerce')`` (fact_ETL.py:52):
    unparseable -> NULL. ANSI-safe via ``try_cast`` (Spark 4 ANSI mode would
    raise on a plain cast)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")
