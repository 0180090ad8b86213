"""End-to-end star-schema warehouse test (SURVEY.md §5 item 3): run the
full dim→fact pipeline on the fixtures, persist the warehouse, and assert
the three properties the reference's upsert loop was meant to guarantee —
key-map completeness, referential integrity of fact FKs, and idempotence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded
from stadvdb_olap_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"

_ensure_loaded()


def _build_warehouse(spark, base):
    """Persist dims + fact exactly as a deployment would."""
    from stadvdb_olap_spark.functions.cleaning import normalize_date
    from stadvdb_olap_spark.functions.keys import surrogate_key
    from stadvdb_olap_spark.operators.dimension import build_dimension

    cust = load_table(spark, SF_DIR, "customer")
    part = load_table(spark, SF_DIR, "part")
    nation = load_table(spark, SF_DIR, "nation")
    orders = load_table(spark, SF_DIR, "orders")

    dims = {
        "dim_user": build_dimension(
            cust, ["c_name"], ["c_nationkey", "c_acctbal"], ["c_custkey"],
            key_method="md5",
        ).table,
        "dim_product": build_dimension(
            part, ["p_name", "p_type"], ["p_retailprice"], ["p_partkey"],
            key_method="md5",
        ).table,
        "dim_location": build_dimension(
            nation, ["n_name"], [], ["n_nationkey"], key_method="md5"
        ).table,
        "dim_date": orders.select(
            normalize_date("o_orderdate").alias("order_date")
        )
        .distinct()
        .select(
            surrogate_key(["order_date"], method="md5").alias("surrogate_key"),
            "order_date",
        ),
    }
    for name, df in dims.items():
        df.write.mode("overwrite").parquet(f"{base}/{name}")
    REGISTRY["fact_star"].fn(spark, SF_DIR).write.mode("overwrite").parquet(
        f"{base}/fact_sales"
    )


def _content_hash(df):
    cols = sorted(df.columns)
    return (
        df.select(F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols])).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)")))
        .collect()[0][0]
    )


def test_warehouse_integrity_and_idempotence(spark, tmp_path):
    base1 = str(tmp_path / "wh1")
    _build_warehouse(spark, base1)

    fact = spark.read.parquet(f"{base1}/fact_sales")
    n_fact = fact.count()
    assert n_fact > 0

    # Referential integrity: every fact FK resolves in its dimension.
    for fk, dim_name in [
        ("user_sk", "dim_user"),
        ("product_sk", "dim_product"),
        ("location_sk", "dim_location"),
        ("date_sk", "dim_date"),
    ]:
        dim = spark.read.parquet(f"{base1}/{dim_name}")
        dangling = fact.join(
            dim, fact[fk] == dim["surrogate_key"], "left_anti"
        ).count()
        assert dangling == 0, f"{dangling} fact rows dangle on {fk}"
        # surrogate keys are unique within the dimension
        assert dim.count() == dim.select("surrogate_key").distinct().count()

    # Degenerate dimension is unique post-dedup.
    assert fact.select("order_number").distinct().count() == n_fact

    # Idempotence: rebuilding from the same inputs yields byte-identical
    # content (deterministic keys + deterministic dedup).
    base2 = str(tmp_path / "wh2")
    _build_warehouse(spark, base2)
    for t in ["dim_user", "dim_product", "dim_location", "dim_date", "fact_sales"]:
        a = spark.read.parquet(f"{base1}/{t}")
        b = spark.read.parquet(f"{base2}/{t}")
        assert _content_hash(a) == _content_hash(b), f"{t} not reproducible"


def test_run_pipeline_all_stages_and_written_star(spark, tmp_path):
    from stadvdb_olap_spark.app import run_pipeline

    out = str(tmp_path / "warehouse")
    report = run_pipeline(spark, "/root/testdata/sf0.001", out_dir=out)
    assert list(report) == [
        "dim_customer", "dim_location", "dim_date", "dim_part", "fact_star"
    ]
    for stage, m in report.items():
        assert m["rows"] > 0, stage
        assert m["seconds"] >= 0
    # the written star is re-readable and row-stable
    fact = spark.read.parquet(out + "/fact_star")
    assert fact.count() == report["fact_star"]["rows"]


def test_cli_list_run_explain(spark, capsys):
    """The __main__ CLI surfaces the catalog: list filters, run prints
    rows, explain prints a physical plan; unknown names exit 2."""
    from stadvdb_olap_spark.__main__ import main

    assert main(["list", "markov"]) == 0
    out = capsys.readouterr().out
    assert "markov_event_transitions" in out and "1 queries" in out

    assert main([
        "run", "events_by_type", "--sf-dir", "/root/testdata/sf0.001",
        "--json",
    ]) == 0
    out = capsys.readouterr().out
    assert '"event_type"' in out

    assert main([
        "explain", "events_by_type", "--sf-dir", "/root/testdata/sf0.001",
    ]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out

    assert main(["run", "no_such_query"]) == 2
