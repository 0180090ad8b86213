"""JDBC source configuration — parity with the reference's streamed MySQL
extraction (``/root/reference/ETL/user_ETL.py:71-81``: reflected table,
projected columns, server-side cursor with ``yield_per=BATCH_SIZE``).

Spark-native mapping:

- schema reflection (S2)  -> the JDBC reader discovers the schema
- chunked fetch loop (S3) -> ``numPartitions`` + ``partitionColumn`` ranged
  predicates: N *parallel* range scans instead of one serial cursor
- ``BATCH_SIZE`` knob     -> ``fetchsize`` (per round-trip row count)
- projection pushdown (P1)-> pass a ``query`` with the projected columns,
  or select() after read — Catalyst pushes the pruning into the JDBC SQL

No live database exists in this container, so this module only BUILDS
readers/writers (tested for option wiring); ``.load()`` is the caller's
action. The same builder works against MySQL/Postgres on a real cluster.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrameReader, SparkSession


@dataclass(frozen=True)
class JdbcSource:
    """Connection + parallelism settings for one JDBC extraction."""

    url: str  # e.g. jdbc:mysql://host:3306/db
    table: str | None = None  # dbtable; mutually exclusive with query
    query: str | None = None  # pushdown SQL (projection/join on the DB side)
    user: str | None = None
    password: str | None = None
    driver: str | None = None  # e.g. com.mysql.cj.jdbc.Driver
    fetchsize: int = 5000  # reference BATCH_SIZE default (user_ETL.py:16)
    partition_column: str | None = None  # numeric/date column for ranged reads
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int | None = None
    extra_options: dict[str, str] = field(default_factory=dict)

    def reader(self, spark: SparkSession) -> DataFrameReader:
        if (self.table is None) == (self.query is None):
            raise ValueError("exactly one of table/query must be set")
        r = spark.read.format("jdbc").option("url", self.url)
        if self.table is not None:
            r = r.option("dbtable", self.table)
        else:
            r = r.option("query", self.query)
        for key, value in (
            ("user", self.user),
            ("password", self.password),
            ("driver", self.driver),
        ):
            if value is not None:
                r = r.option(key, value)
        r = r.option("fetchsize", str(self.fetchsize))
        if self.partition_column is not None:
            if None in (self.lower_bound, self.upper_bound, self.num_partitions):
                raise ValueError(
                    "partition_column requires lower_bound/upper_bound/num_partitions"
                )
            r = (
                r.option("partitionColumn", self.partition_column)
                .option("lowerBound", str(self.lower_bound))
                .option("upperBound", str(self.upper_bound))
                .option("numPartitions", str(self.num_partitions))
            )
        for k, v in self.extra_options.items():
            r = r.option(k, v)
        return r
