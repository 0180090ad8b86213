"""Differential test mirroring the driver's DuckDB-oracle comparison:
every catalog query with an oracle must match it exactly at sf0.001."""

from __future__ import annotations

import pytest

from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR, assert_frames_match

_ensure_loaded()
_WITH_ORACLE = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
_ROWS_ONLY = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    rel = duck.execute(spec.oracle)
    assert_frames_match(sdf, rel, query_name=name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()).issuperset(set(e.oracle_sql()))
