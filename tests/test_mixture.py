"""Invariant tests for the mixture-assembly operators
(operators/mixture.py) beyond the DuckDB-oracle parity checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from stadvdb_olap_spark.functions.text import word_shingles
from stadvdb_olap_spark.operators import mixture as MX
from stadvdb_olap_spark.sources.parquet import load_table
from tests.conftest import SF_DIR


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def _split(docs):
    bucket = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    return docs.withColumn(
        "split",
        F.when(bucket < "cc", "train").when(bucket < "e6", "val").otherwise("test"),
    )


def test_decontaminate_removes_every_shared_shingle(spark):
    docs = _split(_docs(spark))
    train = docs.filter(F.col("split") == "train")
    heldout = docs.filter(F.col("split") != "train")
    survivors = MX.decontaminate(train, heldout, "doc_id", "text", shingle_n=5)

    # Survivors are a subset of train.
    assert survivors.join(train, "doc_id", "left_anti").count() == 0
    assert 0 < survivors.count() <= train.count()

    # No surviving doc shares a 5-gram with any held-out doc.
    s_sh = survivors.select(
        F.explode(word_shingles("text", 5)).alias("sh")
    ).distinct()
    h_sh = heldout.select(
        F.explode(word_shingles("text", 5)).alias("sh")
    ).distinct()
    assert s_sh.join(h_sh, "sh").count() == 0

    # And every dropped doc DOES share one (no over-removal).
    dropped = train.join(survivors, "doc_id", "left_anti")
    d_sh = dropped.select(
        "doc_id", F.explode(word_shingles("text", 5)).alias("sh")
    )
    sharing = d_sh.join(h_sh, "sh").select("doc_id").distinct()
    assert sharing.count() == dropped.count()


def test_weighted_sample_rates_and_determinism(spark):
    docs = _docs(spark)
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    out = MX.weighted_source_sample(docs, rates, default_rate=0.1)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    totals = {r["source"]: r["n"] for r in
              docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts.get("src0") == totals["src0"]  # rate 1.0 keeps all
    assert "src2" not in counts  # rate 0.0 keeps none
    assert 0 < counts.get("src1", 0) < totals["src1"]
    # Deterministic: a second invocation selects the identical id set.
    again = MX.weighted_source_sample(docs, rates, default_rate=0.1)
    assert out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0
    assert again.select("doc_id").exceptAll(out.select("doc_id")).count() == 0


def test_token_budget_respects_budget_and_prefix(spark):
    docs = _docs(spark)
    out = MX.token_budget_take(docs, budget_tokens=300)
    # Per-source totals never exceed the budget.
    mx = out.groupBy("source").agg(F.max("cum_tokens").alias("m"))
    assert mx.filter(F.col("m") > 300).count() == 0
    # The kept set is a PREFIX of the hash order: every kept doc's
    # cum_tokens equals the running sum of kept docs before it plus its
    # own count (i.e. no gaps — recompute and compare).
    recomputed = (
        out.groupBy("source")
        .agg(F.sum("n_tokens").alias("s"), F.max("cum_tokens").alias("m"))
        .filter(F.col("s") != F.col("m"))
    )
    assert recomputed.count() == 0


def test_training_shards_partition_and_positions(spark):
    docs = _docs(spark)
    out = MX.training_shards(docs, n_shards=4)
    assert out.count() == docs.count()
    assert out.filter((F.col("shard") < 0) | (F.col("shard") >= 4)).count() == 0
    # Positions within each shard are exactly 1..count(shard).
    per = out.groupBy("shard").agg(
        F.count("*").alias("n"),
        F.min("shard_pos").alias("lo"),
        F.max("shard_pos").alias("hi"),
        F.count_distinct("shard_pos").alias("d"),
    )
    bad = per.filter(
        (F.col("lo") != 1) | (F.col("hi") != F.col("n")) | (F.col("d") != F.col("n"))
    )
    assert bad.count() == 0
