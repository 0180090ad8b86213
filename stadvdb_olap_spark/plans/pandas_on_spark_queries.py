"""The pandas-on-Spark migration surface: the reference's OWN idioms,
near-verbatim, running distributed.

The reference is a pandas ETL (``/root/reference/ETL/user_ETL.py``:
``dropna`` / ``.str.strip().str.lower()`` / ``.str.title()`` / dict
recodes / ``sort_values`` + ``drop_duplicates(keep='first')`` /
``.merge`` / arithmetic columns). ``pyspark.pandas`` accepts that code
with pandas syntax while planning through Catalyst — the zero-rewrite
first step for a reference user, before graduating to the DataFrame API
modules. These queries write the reference's steps in the pandas API
and hash-check them against the SAME DuckDB oracles as their DataFrame
twins, certifying the two surfaces agree.

Determinism note: every output here is ROW-LEVEL (cleaning, dedup,
merge, per-row arithmetic — the reference's actual ETL domain), so
there are no float aggregation-order hazards; keep-first dedup is
pinned by an explicit total ``sort_values`` order first, exactly the
discipline the DataFrame twin uses.

Scale note: pandas-on-Spark tracks row order internally (its default
index), which can force exchanges a plain DataFrame plan avoids — fine
for migration, and the reason the engine's hot paths stay in the
DataFrame API (see SCALING.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stadvdb_olap_spark.plans.catalog import query
from stadvdb_olap_spark.plans.etl_queries import _TITLE_SQL


def _ps():
    import pyspark.pandas as ps

    return ps


@query(
    "ps_reference_clean_customers",
    oracle=f"""
SELECT
    c_custkey,
    trim(lower(c_name))                                   AS name_norm,
    {_TITLE_SQL.format(s="lower(c_mktsegment)")}          AS segment_title,
    CASE lower(c_mktsegment)
        WHEN 'building' THEN 'BLDG' WHEN 'automobile' THEN 'AUTO'
        ELSE lower(c_mktsegment) END                      AS segment_code
FROM customer
""",
)
def ps_reference_clean_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's string-cleaning block in ITS OWN pandas idioms
    (``user_ETL.py:47-55``): ``.str.strip().str.lower()``,
    ``.str.title()``, dict ``.replace`` recode with passthrough — run
    distributed via pyspark.pandas and hash-checked against the same
    oracle as the DataFrame twin ``clean_customer_strings`` (pandas
    ``str.title`` semantics and all)."""
    ps = _ps()
    df = ps.read_parquet(f"{sf_dir}/customer.parquet")
    seg_lower = df["c_mktsegment"].str.lower()
    out = df.assign(
        name_norm=df["c_name"].str.strip().str.lower(),
        segment_title=seg_lower.str.title(),
        # .replace leaves unmapped values unchanged — the reference's
        # dict-recode-with-fallback in one pandas call
        segment_code=seg_lower.replace({"building": "BLDG", "automobile": "AUTO"}),
    )[["c_custkey", "name_norm", "segment_title", "segment_code"]]
    return out.to_spark()


@query(
    "ps_reference_dedup_first_order",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate
FROM (
    SELECT o_custkey, o_orderkey, o_orderdate,
           row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS rn
    FROM orders
) WHERE rn = 1
""",
)
def ps_reference_dedup_first_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's dedup idiom — ``sort_values`` then
    ``drop_duplicates(keep='first')`` (``user_ETL.py:57-60``) — in the
    pandas API. The explicit total sort order (date + unique orderkey
    tiebreak) is what makes keep-first deterministic; pyspark.pandas
    preserves sorted order through drop_duplicates exactly like
    pandas. Same oracle as the window-function formulation."""
    ps = _ps()
    orders = ps.read_parquet(f"{sf_dir}/orders.parquet")
    first = (
        orders[["o_custkey", "o_orderkey", "o_orderdate"]]
        .sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        .drop_duplicates(subset=["o_custkey"], keep="first")
    )
    return first.to_spark()


@query(
    "ps_reference_merge_revenue",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority,
       ceil(l.l_quantity * l.l_extendedprice * (1 - l.l_discount) * 100)
           / 100 AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
""",
)
def ps_reference_merge_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's merge + arithmetic-column + ceil-to-cent block
    (``fact_ETL.py:91-118``) in the pandas API: ``.merge`` on the order
    key, ``quantity * price * (1 - discount)``, ``np.ceil(x*100)/100``.
    Per-row IEEE arithmetic and ceil are exactly defined, so the
    row-level output hash-matches the SQL twin with no decimal
    machinery."""
    import numpy as np

    ps = _ps()
    li = ps.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"]
    ]
    orders = ps.read_parquet(f"{sf_dir}/orders.parquet")[
        ["o_orderkey", "o_orderpriority"]
    ]
    fact = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    out = fact.assign(
        revenue=np.ceil(
            fact["l_quantity"]
            * fact["l_extendedprice"]
            * (1 - fact["l_discount"])
            * 100
        )
        / 100
    )[["l_orderkey", "l_linenumber", "o_orderpriority", "revenue"]]
    return out.to_spark()
