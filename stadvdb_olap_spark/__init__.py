"""stadvdb_olap_spark — a PySpark-native analytics engine.

A from-scratch Spark implementation of the data-processing capabilities of
the Solenad/stadvdb-olap reference (a pandas/SQLAlchemy star-schema ETL
loader), re-expressed as idiomatic, scale-first Spark:

- ``session``     — SparkSession factory (AQE, Arrow, UTC, tuned shuffles)
- ``sources``     — parquet/JDBC readers, schema registry, merge/upsert sinks
- ``functions``   — column-expression libraries (cleaning, keys, text, vectors)
- ``operators``   — composite DataFrame->DataFrame operators (dedup families,
                    SCD1 merge, dimension/fact builders, similarity search)
- ``plans``       — the declared query catalog (Spark fn + DuckDB oracle SQL)
- ``streaming``   — Structured Streaming incremental load & windowed aggs

Design stance (SURVEY.md §7): DataFrame/Catalyst first; deterministic
surrogate keys instead of DB round-trips; broadcast joins for dims; no
driver-side collect loops in any operator.
"""

from stadvdb_olap_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
