"""operators/rank.py — the distributed global-rank surface.

Semantics: the two-pass offset rank must equal the textbook
``row_number``/``ntile`` window definitions exactly (the windows ARE the
oracle here, run on the same small fixture where their single-partition
cost is irrelevant). Plan: the helper must never funnel data-grain rows
through an Exchange SinglePartition — that is its entire reason to
exist — and must stay deterministic across re-evaluation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stadvdb_olap_spark.operators.rank import global_ntile, global_row_number
from stadvdb_olap_spark.sources.parquet import load_table
from tests.conftest import SF_DIR

from tests.test_plan_audit import _bounded_grain, _children, _walk


def _orders(spark):
    return load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )


def _bkt():
    # $100 buckets over the leading sort key — monotone by construction
    return F.floor(F.col("o_totalprice") / 100).cast("long")


def test_global_row_number_matches_window_row_number(spark):
    o = _orders(spark)
    got = global_row_number(
        o, ["o_totalprice", "o_orderkey"], bucket=_bkt(), out="gr"
    ).select("o_orderkey", "gr")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    want = o.select(
        "o_orderkey", F.row_number().over(w).cast("long").alias("gr")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_global_row_number_deterministic_across_reevaluation(spark):
    # The ranked relation is consumed twice (self-join on the key): both
    # branches must see identical ranks — guaranteed because bucket ids
    # and offsets are pure functions of the data, never of physical
    # placement (the repartitionByRange+monotonic-id shape failed this:
    # RangePartitioner samples with an rdd-id seed, so unreused branches
    # got different bounds).
    o = _orders(spark)
    r = global_row_number(
        o, ["o_totalprice", "o_orderkey"], bucket=_bkt(), out="gr"
    )
    a = r.select("o_orderkey", F.col("gr").alias("g1"))
    b = r.select("o_orderkey", F.col("gr").alias("g2"))
    mismatched = (
        a.join(b, "o_orderkey")
        .filter(F.col("g1") != F.col("g2"))
        .count()
    )
    assert mismatched == 0


def test_global_ntile_matches_window_ntile(spark):
    o = _orders(spark)
    for n in (3, 10, 7):
        got = global_ntile(
            o, ["o_totalprice", "o_orderkey"], n, bucket=_bkt(), out="b"
        ).select("o_orderkey", "b")
        w = Window.orderBy("o_totalprice", "o_orderkey")
        want = o.select(
            "o_orderkey", F.ntile(n).over(w).cast("long").alias("b")
        )
        assert got.exceptAll(want).count() == 0, f"ntile({n})"
        assert want.exceptAll(got).count() == 0, f"ntile({n})"


def test_global_ntile_fewer_rows_than_buckets(spark):
    o = _orders(spark).limit(0)  # empty input: no rows, no DIV-by-zero
    assert (
        global_ntile(o, ["o_totalprice", "o_orderkey"], 10, bucket=_bkt())
        .count() == 0
    )
    few = _orders(spark).filter(F.col("o_orderkey") <= 7)
    n_rows = few.count()
    assert 0 < n_rows < 10
    got = global_ntile(
        few, ["o_totalprice", "o_orderkey"], 10, bucket=_bkt(), out="b"
    )
    # each row lands alone in buckets 1..n_rows
    assert sorted(r["b"] for r in got.select("b").collect()) == list(
        range(1, n_rows + 1)
    )


def test_global_row_number_plan_has_no_fact_grain_single_partition(spark):
    df = global_row_number(
        _orders(spark), ["o_totalprice", "o_orderkey"], bucket=_bkt(), out="gr"
    )
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.initialPlan()
    saw_partitioned_window = False
    for node in _walk(plan):
        cn = node.getClass().getSimpleName()
        if cn in ("WindowExec", "WindowGroupLimitExec"):
            if node.partitionSpec().isEmpty():
                assert _bounded_grain(_children(node)[0]), (
                    "offset-rank window must sit on the per-bucket "
                    "count aggregate, not data rows"
                )
            else:
                saw_partitioned_window = True
    assert saw_partitioned_window, (
        "the data-grain rank must be a bucket-PARTITIONED window"
    )
