"""Column-expression function libraries (all JVM-side unless noted)."""

from stadvdb_olap_spark.functions.cleaning import (
    ceil_to_cents,
    coerce_numeric,
    lower_cols,
    normalize_date,
    parse_datetime_mixed,
    recode,
    titlecase_exact,
    titlecase_initcap,
    trim_cols,
)
from stadvdb_olap_spark.functions.keys import surrogate_key

__all__ = [
    "ceil_to_cents",
    "coerce_numeric",
    "lower_cols",
    "normalize_date",
    "parse_datetime_mixed",
    "recode",
    "surrogate_key",
    "titlecase_exact",
    "titlecase_initcap",
    "trim_cols",
]
