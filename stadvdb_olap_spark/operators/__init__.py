"""Composite DataFrame -> DataFrame operators."""

from stadvdb_olap_spark.operators.dedup import dedup_keep_first
from stadvdb_olap_spark.operators.dimension import build_dimension
from stadvdb_olap_spark.operators.fact import resolve_foreign_key
from stadvdb_olap_spark.operators.merge import merge_scd1

__all__ = ["build_dimension", "dedup_keep_first", "merge_scd1", "resolve_foreign_key"]
