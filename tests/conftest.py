"""Shared fixtures: one SparkSession per test run, DuckDB oracle helper."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

from stadvdb_olap_spark.session import get_session
from stadvdb_olap_spark.sources.parquet import TABLES

SF_DIR = "/root/testdata/sf0.001"

# Session-wide memo of built catalog-query DataFrames. Three modules
# sweep the whole 366-query catalog (oracle parity, plan audit, output
# type lint) and each used to rebuild every plan — ~0.1-0.3 s of driver
# wall per build, plus a full re-execution for the imperative (Delta)
# queries whose fn() writes tmp tables. A DataFrame is an immutable
# plan and the imperative side effects persist for the session, so one
# build serves every module.
_QUERY_DF_MEMO: dict = {}


def query_df(spark, name: str, sf_dir: str = SF_DIR):
    key = (name, sf_dir)
    df = _QUERY_DF_MEMO.get(key)
    if df is None:
        from stadvdb_olap_spark.plans.catalog import REGISTRY

        df = REGISTRY[name].fn(spark, sf_dir)
        _QUERY_DF_MEMO[key] = df
    return df


@pytest.fixture(scope="session")
def spark():
    # 2g driver heap: one session now serves the whole 1468-test run
    # INCLUDING the shared query_df plan memo below (366 pinned plans +
    # their analyzed state + test broadcasts) — the 1g default has died
    # mid-run under that accumulation, failing every later test with
    # connection errors. Test-harness sizing only; query semantics are
    # heap-independent.
    spark = get_session(
        app_name="stadvdb-olap-spark-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "2g"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    # Bounded working set + thread count: the sf0.001 oracles need a few
    # hundred MB at most, but DuckDB's default limit (80% of RAM) lets a
    # single operator balloon exactly when the shared host is under an
    # external memory squeeze (observed: transient malloc failures mid
    # full-suite run), and 32 threads oversubscribe the local[8] session.
    con.execute("SET memory_limit='4GB'")
    con.execute("SET threads=8")
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    return str(v)


def canonical_rows(cols, rows):
    """Column-name-sorted, order-insensitive canonical row list — mirrors
    the driver's order-insensitive value-hash comparison."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(row[i]) for i in order) for row in rows]
    out.sort()
    return sorted(cols), out


def assert_frames_match(spark_df, duck_rel, query_name=""):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = [d[0] for d in duck_rel.description]
    d_rows = duck_rel.fetchall()

    sc, sr = canonical_rows(s_cols, s_rows)
    dc, dr = canonical_rows(d_cols, d_rows)
    assert sc == dc, f"{query_name}: column mismatch {sc} vs {dc}"
    assert len(sr) == len(dr), f"{query_name}: row count {len(sr)} vs {len(dr)}"
    if sr != dr:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:5]
        raise AssertionError(f"{query_name}: value mismatch, first diffs: {diffs}")
