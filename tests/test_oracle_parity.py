"""Differential test mirroring the driver's DuckDB-oracle comparison:
every catalog query with an oracle must match it exactly at sf0.001."""

from __future__ import annotations

import pytest

from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR, assert_frames_match, query_df

_ensure_loaded()
_WITH_ORACLE = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
_ROWS_ONLY = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    sdf = query_df(spark, name)
    rel = duck.execute(spec.oracle)
    assert_frames_match(sdf, rel, query_name=name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    sdf = query_df(spark, name)
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()).issuperset(set(e.oracle_sql()))


def test_harness_detects_mismatches(spark, duck):
    """Meta-test: the oracle comparison must FAIL on wrong values, wrong
    row counts, wrong columns, and float last-ulp drift — a harness that
    silently passes would invalidate every green row above."""
    import pytest

    from tests.conftest import assert_frames_match

    good = spark.createDataFrame([(1, 2.5), (2, 3.5)], ["k", "v"])
    assert_frames_match(good, duck.execute(
        "SELECT * FROM (VALUES (1, 2.5), (2, 3.5)) t(k, v)"))

    with pytest.raises(AssertionError, match="value mismatch"):
        assert_frames_match(good, duck.execute(
            "SELECT * FROM (VALUES (1, 2.5), (2, 3.6)) t(k, v)"))
    with pytest.raises(AssertionError, match="row count"):
        assert_frames_match(good, duck.execute(
            "SELECT * FROM (VALUES (1, 2.5)) t(k, v)"))
    with pytest.raises(AssertionError, match="column mismatch"):
        assert_frames_match(good, duck.execute(
            "SELECT * FROM (VALUES (1, 2.5), (2, 3.5)) t(k, other)"))
    # one-ulp float drift must NOT slip through
    import math

    ulp_off = spark.createDataFrame(
        [(1, math.nextafter(2.5, 3)), (2, 3.5)], ["k", "v"]
    )
    with pytest.raises(AssertionError, match="value mismatch"):
        assert_frames_match(ulp_off, duck.execute(
            "SELECT * FROM (VALUES (1, 2.5), (2, 3.5)) t(k, v)"))
