"""Deterministic surrogate keys — the scale-first replacement for the
reference's ``INSERT ... RETURNING id`` round trips
(``/root/reference/ETL/user_ETL.py:105-123``).

DB-assigned autoincrement keys serialize every load through the warehouse
and force a second network hop to harvest the mapping. A deterministic hash
of the business key needs no coordination, is idempotent across reruns, and
lets fact FK resolution become a plain (broadcastable) join — or disappear
entirely when both sides compute the same hash.

Two strategies:

- ``xxhash64`` (default): 64-bit JVM-side hash -> LONG keys. The production
  path at 100 TB — 8-byte keys, whole-stage codegen, no Python.
- ``md5``: 128-bit hex STRING keys. Bit-identical to DuckDB's ``md5()``,
  used by the oracle-checked query catalog so the driver can verify key
  assignment end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

# Field separator + null sentinel so ("a", None) != ("a", "") != ("a",).
_SEP = "\x1f"
_NULL = "\x00"


def _canonical(cols: Iterable[Column | str]) -> Column:
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(_NULL))
        for c in cols
    ]
    return F.concat_ws(_SEP, *parts)


import re as _re

_IDENT = _re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def _canonical_spark_sql(cols: list[str]) -> str:
    # _SEP/_NULL are control characters — legal raw chars inside a Spark
    # SQL string literal, and they contain no backslash to re-escape.
    parts = ", ".join(
        f"coalesce(CAST(`{c}` AS STRING), '{_NULL}')" for c in cols
    )
    return f"concat_ws('{_SEP}', {parts})"


def surrogate_key(cols: Iterable[Column | str], method: str = "xxhash64") -> Column:
    """Deterministic surrogate key over the business-key columns.

    Plain column names build via one ``F.expr`` parse (identical tree —
    each py4j Column op costs ~1 ms of driver time per query build, and the
    star builds call this 4x per query); Column inputs keep the
    Column-builder path."""
    cols = list(cols)
    if method not in ("xxhash64", "md5"):
        raise ValueError(f"unknown surrogate key method {method!r}")
    if all(isinstance(c, str) and _IDENT.match(c) for c in cols):
        return F.expr(f"{method}({_canonical_spark_sql(cols)})")
    if method == "xxhash64":
        return F.xxhash64(_canonical(cols))
    return F.md5(_canonical(cols))


def surrogate_key_sql(cols: Iterable[str], dialect: str = "duckdb") -> str:
    """The DuckDB-SQL expression equivalent to ``surrogate_key(cols,
    'md5')`` — same separator, same null sentinel, same hex output."""
    if dialect != "duckdb":
        raise ValueError(f"unsupported dialect {dialect!r}")
    parts = ", ".join(f"coalesce(CAST({c} AS VARCHAR), chr(0))" for c in cols)
    return f"md5(concat_ws(chr(31), {parts}))"
