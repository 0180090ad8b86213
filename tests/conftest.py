"""Shared fixtures: one SparkSession per test run, DuckDB oracle helper."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

from stadvdb_olap_spark.session import get_session
from stadvdb_olap_spark.sources.parquet import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_session(app_name="stadvdb-olap-spark-tests", master="local[8]",
                        shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
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
