"""Query catalog: declared Spark queries + DuckDB oracles."""

from stadvdb_olap_spark.plans.catalog import REGISTRY, all_oracles, all_queries, query

__all__ = ["REGISTRY", "all_oracles", "all_queries", "query"]
