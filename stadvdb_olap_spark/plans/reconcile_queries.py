"""Reconciliation catalog queries (operators/reconcile.py).

Migration/restatement verification: the keyed row-level diff and the
order-independent table fingerprint. Both oracle-checked — the
fingerprint oracle recomputes the identical canonicalization + 48-bit
md5 sum in DuckDB, which doubles as proof that the canonical row format
really is engine-independent (one formatting divergence anywhere and the
checksums split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stadvdb_olap_spark.operators.reconcile import (
    table_diff,
    table_fingerprint,
    table_fingerprint_sql,
)
from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.sources.parquet import load_table

# (name, duck_type) per table, in Spark schema order — keep in sync with
# the fixture schemas (TESTDATA.md).
_FP_TABLES = {
    "orders": [
        ("o_orderkey", "BIGINT"),
        ("o_custkey", "BIGINT"),
        ("o_orderstatus", "VARCHAR"),
        ("o_totalprice", "DOUBLE"),
        ("o_orderdate", "TIMESTAMP"),
        ("o_orderpriority", "VARCHAR"),
    ],
    "customer": [
        ("c_custkey", "BIGINT"),
        ("c_name", "VARCHAR"),
        ("c_nationkey", "INTEGER"),
        ("c_acctbal", "DOUBLE"),
        ("c_mktsegment", "VARCHAR"),
    ],
    "lineitem": [
        ("l_orderkey", "BIGINT"),
        ("l_partkey", "BIGINT"),
        ("l_suppkey", "BIGINT"),
        ("l_linenumber", "INTEGER"),
        ("l_quantity", "DOUBLE"),
        ("l_extendedprice", "DOUBLE"),
        ("l_discount", "DOUBLE"),
        ("l_tax", "DOUBLE"),
        ("l_returnflag", "VARCHAR"),
        ("l_linestatus", "VARCHAR"),
        ("l_shipdate", "TIMESTAMP"),
    ],
}


@query(
    "fingerprint_core_tables",
    oracle=" UNION ALL ".join(
        table_fingerprint_sql(t, cols) for t, cols in _FP_TABLES.items()
    ),
)
def fingerprint_core_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent checksums of orders/customer/lineitem: compare
    two copies of a 100 TB warehouse by shipping 3 rows. Each table is
    one scan + one mergeable sum — no sort, no shuffle beyond the final
    1-row aggregate; the canonical row string pins every cross-engine
    formatting hazard (doubles via decimal(18,6), fixed-width timestamp
    micros, NULL sentinel)."""
    parts = [
        table_fingerprint(
            load_table(spark, sf_dir, t).select(*[c for c, _ in cols]), t
        )
        for t, cols in _FP_TABLES.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_DIFF_COMPARE = ["o_custkey", "o_orderpriority", "o_orderstatus", "o_totalprice"]


def _restated_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic restatement of orders: drop keys ≡7 (mod 1000),
    bump price +1.00 and re-flag priority for keys ≡3 (mod 100), append
    copies with shifted keys for keys ≡13 (mod 1000)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", *_DIFF_COMPARE
    )
    changed = F.col("o_orderkey") % 100 == 3
    base = orders.filter(F.col("o_orderkey") % 1000 != 7).select(
        "o_orderkey",
        "o_custkey",
        F.when(changed, F.lit("RESTATED"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
        "o_orderstatus",
        F.when(changed, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    added = orders.filter(F.col("o_orderkey") % 1000 == 13).select(
        (F.col("o_orderkey") + F.lit(10_000_000_000)).alias("o_orderkey"),
        "o_custkey",
        "o_orderpriority",
        "o_orderstatus",
        "o_totalprice",
    )
    return base.unionByName(added)


@query(
    "table_diff_orders_restated",
    oracle="""
WITH newt AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 100 = 3 THEN 'RESTATED'
              ELSE o_orderpriority END AS o_orderpriority,
         o_orderstatus,
         CASE WHEN o_orderkey % 100 = 3 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 1000 <> 7
  UNION ALL
  SELECT o_orderkey + 10000000000, o_custkey, o_orderpriority,
         o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 1000 = 13
), j AS (
  SELECT o.o_orderkey AS ko, n.o_orderkey AS kn,
         CASE WHEN o.o_custkey IS DISTINCT FROM n.o_custkey
              THEN ['o_custkey'] ELSE [] END
         || CASE WHEN o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
                 THEN ['o_orderpriority'] ELSE [] END
         || CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                 THEN ['o_orderstatus'] ELSE [] END
         || CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                 THEN ['o_totalprice'] ELSE [] END AS diffs
  FROM orders o FULL OUTER JOIN newt n ON o.o_orderkey = n.o_orderkey
)
SELECT COALESCE(ko, kn) AS o_orderkey,
       CASE WHEN ko IS NULL THEN 'added'
            WHEN kn IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type,
       CASE WHEN ko IS NULL OR kn IS NULL
            THEN '' ELSE array_to_string(diffs, ',') END AS changed_cols
FROM j
WHERE ko IS NULL OR kn IS NULL OR len(diffs) > 0
""",
)
def table_diff_orders_restated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff of orders vs its deterministic restatement:
    added / removed / changed rows with the exact changed-column list.
    One full-outer key join is the only wide operation. The operator's
    ``changed_cols`` array publishes as a comma-joined string: certified
    outputs carry no ARRAY columns (a list cell crashes pandas
    ``sort_values`` in the driver's canonicalizer)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", *_DIFF_COMPARE
    )
    return table_diff(
        orders,
        _restated_orders(spark, sf_dir),
        keys=["o_orderkey"],
        compare_cols=_DIFF_COMPARE,
    ).withColumn("changed_cols", F.array_join("changed_cols", ","))


_SYNC_WIDTH = 4096
_SYNC_COLS = _FP_TABLES["orders"]  # projection under comparison
_SYNC_LOST = 997  # replica lost rows: o_orderkey % 997 == 0
_SYNC_CORRUPT = 1013  # replica bit-rot: o_custkey+1 where key % 1013 == 0


def _sync_hash_sql() -> str:
    from stadvdb_olap_spark.operators.reconcile import canon_cell_sql

    cells = ", ".join(canon_cell_sql(n, t) for n, t in _SYNC_COLS)
    return (
        "CAST(CAST('0x' || substr(md5(concat_ws('|', "
        + cells
        + ")), 1, 12) AS BIGINT) AS DECIMAL(38,0))"
    )


@query(
    "range_sync_plan_orders",
    oracle=f"""
WITH proj AS (
  SELECT {', '.join(n for n, _ in _SYNC_COLS)} FROM orders
),
src AS (
  SELECT o_orderkey // {_SYNC_WIDTH} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MIN(o_orderkey) AS BIGINT) AS lo,
         CAST(MAX(o_orderkey) AS BIGINT) AS hi,
         CAST(SUM({_sync_hash_sql()}) AS DECIMAL(38,0)) AS chk
  FROM proj GROUP BY 1
),
replica AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % {_SYNC_CORRUPT} = 0
              THEN o_custkey + 1 ELSE o_custkey END AS o_custkey,
         {', '.join(n for n, _ in _SYNC_COLS if n not in ('o_orderkey', 'o_custkey'))}
  FROM proj WHERE o_orderkey % {_SYNC_LOST} <> 0
),
dst AS (
  SELECT o_orderkey // {_SYNC_WIDTH} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM({_sync_hash_sql()}) AS DECIMAL(38,0)) AS chk
  FROM replica GROUP BY 1
)
SELECT COALESCE(s.bucket, d.bucket) AS bucket,
       s.lo AS lo_key, s.hi AS hi_key,
       COALESCE(s.n, 0) AS n_rows_src,
       COALESCE(d.n, 0) AS n_rows_dst,
       CAST(COALESCE(s.chk, 0) AS VARCHAR) AS checksum_src,
       CAST(COALESCE(d.chk, 0) AS VARCHAR) AS checksum_dst
FROM src s FULL OUTER JOIN dst d ON s.bucket = d.bucket
WHERE COALESCE(s.n, 0) <> COALESCE(d.n, 0)
   OR CAST(COALESCE(s.chk, 0) AS VARCHAR)
        <> CAST(COALESCE(d.chk, 0) AS VARCHAR)
""",
)
def range_sync_plan_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANTI-ENTROPY RANGE SYNC PLANNER (the Merkle-repair shape of
    Dynamo/Cassandra, one level deep): fingerprint a table and its
    replica per 4096-key range (``range_fingerprints`` — the certified
    canonical-row 48-bit checksum, subdivided), compare ONLY the
    |buckets|-sized summaries, and emit exactly the ranges that need
    repair. The replica is the source with deterministic damage
    injected in-query — rows lost (key % 997 == 0) and bit-rot
    (o_custkey bumped where key % 1013 == 0) — so both engines agree on
    the ground truth and the oracle certifies every surviving range
    row: count mismatches catch the losses, checksum-only mismatches
    catch the silent corruption. 100 TB shape: two map-side-combinable
    aggregates whose exchanges carry |buckets| rows, one |buckets|-row
    full-outer join; row-level work happens only in a later
    ``table_diff`` pass over the emitted ranges."""
    from stadvdb_olap_spark.operators.reconcile import range_fingerprints

    proj = load_table(spark, sf_dir, "orders").select(
        *[n for n, _ in _SYNC_COLS]
    )
    replica = proj.where(
        F.col("o_orderkey") % _SYNC_LOST != 0
    ).withColumn(
        "o_custkey",
        F.when(
            F.col("o_orderkey") % _SYNC_CORRUPT == 0,
            F.col("o_custkey") + 1,
        ).otherwise(F.col("o_custkey")),
    ).select(*[n for n, _ in _SYNC_COLS])
    src = range_fingerprints(proj, "o_orderkey", _SYNC_WIDTH)
    dst = range_fingerprints(replica, "o_orderkey", _SYNC_WIDTH).drop(
        "lo_key", "hi_key"
    )
    j = (
        src.alias("s")
        .join(dst.alias("d"), "bucket", "full_outer")
        .select(
            "bucket",
            F.col("s.lo_key").alias("lo_key"),
            F.col("s.hi_key").alias("hi_key"),
            F.coalesce(F.col("s.n_rows"), F.lit(0)).alias("n_rows_src"),
            F.coalesce(F.col("d.n_rows"), F.lit(0)).alias("n_rows_dst"),
            F.coalesce(F.col("s.checksum"), F.lit("0")).alias("checksum_src"),
            F.coalesce(F.col("d.checksum"), F.lit("0")).alias("checksum_dst"),
        )
    )
    return j.where(
        (F.col("n_rows_src") != F.col("n_rows_dst"))
        | (F.col("checksum_src") != F.col("checksum_dst"))
    )
