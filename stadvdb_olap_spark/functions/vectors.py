"""Vector column expressions for embedding similarity search.

Dense vectors are plain ``array<float>`` columns; all math is JVM-side
higher-order functions over double-widened elements with a PINNED
left-to-right summation order, so the DuckDB oracle (``*_sql`` twins using
``list_reduce``) reproduces every result bit-for-bit.

At 100 TB scale these expressions run inside whole-stage codegen per row —
no Python, no UDF serialization. For maximum throughput on very wide
vectors a Pandas-UDF/numpy batch variant is provided in
operators/similarity.py; the expression form here is the correctness
reference and the oracle-checkable path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-to-right dot product in double precision."""
    prods = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({a}, (x, i) -> CAST(x AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(p, q) -> p + q)"
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def l2_norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity = dot(a,b) / (||a|| * ||b||), all IEEE-ordered."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({l2_norm_sql(a)} * {l2_norm_sql(b)}))"


def l2_sq(a: Column | str, b: Column | str) -> Column:
    """Squared euclidean distance, left-to-right double fold (the
    k-means/IVF assignment metric; squared form skips the sqrt without
    changing any argmin/argsort)."""
    diffs = F.zip_with(
        _c(a),
        _c(b),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def l2_sq_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({a}, (x, i) -> "
        f"(CAST(x AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
        f"(CAST(x AS DOUBLE) - CAST({b}[i] AS DOUBLE)))), "
        f"(p, q) -> p + q)"
    )
