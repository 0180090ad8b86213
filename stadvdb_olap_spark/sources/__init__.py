"""Sources & sinks: parquet catalog, JDBC reader builder, merge/upsert sink."""

from stadvdb_olap_spark.sources.parquet import TABLES, load_table, load_tables, register_views

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]
