"""Certification output-type lint: every oracle-backed catalog query's
output must be represented identically by the driver's pandas canon on
both engines.

The driver materializes the Spark result via ``toPandas()`` and the
DuckDB oracle via ``.df()``, sorts with ``sort_values`` and hashes a
dtype-sensitive stringification. Empirically (round 3 cost 8 window
rows to this):

- ARRAY/LIST outputs CRASH the canon (``TypeError: unhashable type``
  inside pandas factorize);
- DECIMAL outputs fetch asymmetrically (Python Decimal from Spark,
  lossy float64 from DuckDB) — guaranteed hash mismatch;
- DuckDB HUGEINT (bare integer ``sum()``) fetches float64 against
  Spark's int64 — "5.0" vs "5";
- int-vs-float family mismatches between the two sides fail the same
  way even when values are numerically equal.

Mechanical rule enforced here BEFORE a query reaches a certification
window: output columns may only be integer / DOUBLE / VARCHAR / DATE /
TIMESTAMP / BOOLEAN, with matching name sets and per-column type
families across engines (date and timestamp count as one family — the
canon prints midnight timestamps as bare dates, and driver-signed DATE
queries prove the tolerance).

Rows-only queries (``oracle=None``) are exempt: they register with
``defer=True`` and never occupy a certification-window slot, and their
outputs (signature arrays, binary payloads) are legitimately non-SQL
shapes.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR, query_df

_ensure_loaded()

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# DuckDB type -> family. Anything not mapped is banned (HUGEINT,
# DECIMAL(p,s), x[], STRUCT, UHUGEINT, ...).
_DUCK_FAMILY = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "DOUBLE": "float",
    "VARCHAR": "str",
    "DATE": "datetime",
    "TIMESTAMP": "datetime",
    "TIMESTAMP_NS": "datetime",
    "BOOLEAN": "bool",
}

# Spark simpleString -> family. FLOAT is banned (float32 vs float64
# repr drift), DECIMAL/ARRAY/MAP/STRUCT/BINARY are banned.
_SPARK_FAMILY = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "double": "float",
    "string": "str",
    "date": "datetime",
    "timestamp": "datetime",
    "timestamp_ntz": "datetime",
    "boolean": "bool",
}

_ORACLE_SPECS = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("SET memory_limit='4GB'")
    con.execute("SET threads=8")
    for t in _TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLE_SPECS)
def test_certified_output_types(spark, duck, name):
    spec = REGISTRY[name]
    sdf = query_df(spark, name)

    spark_types: dict[str, str] = {}
    for f in sdf.schema.fields:
        simple = f.dataType.simpleString()
        fam = _SPARK_FAMILY.get(simple)
        assert fam is not None, (
            f"{name}: Spark output column {f.name!r} has canon-hazard type "
            f"{simple!r} (allowed families: {sorted(set(_SPARK_FAMILY))})"
        )
        spark_types[f.name] = fam

    desc = duck.execute(f"DESCRIBE {spec.oracle}").fetchall()
    duck_types: dict[str, str] = {}
    for col, dtype, *_ in desc:
        base = re.sub(r"\(.*\)", "", dtype).strip()
        fam = _DUCK_FAMILY.get(base)
        assert fam is not None, (
            f"{name}: oracle output column {col!r} has canon-hazard type "
            f"{dtype!r} (DECIMAL/HUGEINT/LIST are banned in certified outputs)"
        )
        duck_types[col] = fam

    assert sorted(spark_types) == sorted(duck_types), (
        f"{name}: column names differ: Spark {sorted(spark_types)} vs "
        f"oracle {sorted(duck_types)}"
    )
    for col in spark_types:
        assert spark_types[col] == duck_types[col], (
            f"{name}: column {col!r} family mismatch — Spark "
            f"{spark_types[col]} vs oracle {duck_types[col]} (int-vs-float "
            "asymmetry is a guaranteed driver hash failure)"
        )
