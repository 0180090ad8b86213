"""CDC apply catalog query — maintaining a table from a change log.

The reference's only write path is the per-batch ON CONFLICT upsert
(``/root/reference/ETL/user_ETL.py:105-117``) — no delete channel. This
is the log-shipping generalization every warehouse eventually needs:
compact an (op, seq) change feed to last-state-per-key, then merge
inserts/updates and apply deletes in one set-based pass
(operators/merge.py:apply_cdc).

The feed here is synthesized DETERMINISTICALLY from the orders fixture
(no RNG), so the query is fully DuckDB-oracle-checked: base snapshot =
even order keys; the feed updates keys divisible by 3, inserts keys
≡ 1 (mod 3), and at a later sequence number deletes keys divisible
by 5 — exercising update-then-delete compaction, pure inserts, and
untouched-base retention in one query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stadvdb_olap_spark.operators.merge import apply_cdc
from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.sources.parquet import load_table

_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


@query(
    "cdc_apply_orders",
    oracle="""
WITH base AS (
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 2 = 0
),
feed AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           o_totalprice + 100.0 AS o_totalprice, 1 AS seq, 'U' AS op
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 1, 'I'
    FROM orders WHERE o_orderkey % 3 = 1
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 2, 'D'
    FROM orders WHERE o_orderkey % 5 = 0
),
latest AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                     ORDER BY seq DESC) AS rn
        FROM feed
    ) WHERE rn = 1
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM base
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM latest WHERE op <> 'D'
""",
)
def cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-wins CDC merge with deletes: window-compact the change feed
    per key, anti-join the base, union the surviving upserts. One feed
    shuffle + one anti-join at any scale."""
    orders = load_table(spark, sf_dir, "orders").select(*_COLS)
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    key = F.col("o_orderkey")
    updates = (
        orders.filter(key % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 100.0)
        .withColumn("seq", F.lit(1))
        .withColumn("op", F.lit("U"))
    )
    inserts = (
        orders.filter(key % 3 == 1)
        .withColumn("seq", F.lit(1))
        .withColumn("op", F.lit("I"))
    )
    deletes = (
        orders.filter(key % 5 == 0)
        .withColumn("seq", F.lit(2))
        .withColumn("op", F.lit("D"))
    )
    feed = updates.unionByName(inserts).unionByName(deletes)
    return apply_cdc(base, feed, keys=["o_orderkey"])
