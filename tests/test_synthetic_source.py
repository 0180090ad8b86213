"""Tests for the pure-Python Spark 4 DataSource (sources/synthetic.py):
declared partitioning, determinism, Arrow batch path, stream offsets."""

from __future__ import annotations

import time

import pytest

from stadvdb_olap_spark.sources.synthetic import register


@pytest.fixture()
def synth(spark):
    register(spark)
    return spark


def _batch(spark, rows, parts, seed=42):
    return (
        spark.read.format("synthetic_events")
        .option("rows", rows)
        .option("numPartitions", parts)
        .option("seed", seed)
        .load()
    )


def test_batch_counts_schema_and_declared_parallelism(synth):
    df = _batch(synth, 5000, 8)
    assert df.schema.simpleString() == (
        "struct<event_id:bigint,ts:timestamp,user_id:bigint,"
        "event_type:string,value:double>"
    )
    assert df.rdd.getNumPartitions() == 8  # parallelism declared, not discovered
    assert df.count() == 5000
    assert df.select("event_id").distinct().count() == 5000


def test_batch_determinism_across_partitionings_and_runs(synth):
    a = _batch(synth, 2000, 8).orderBy("event_id").collect()
    b = _batch(synth, 2000, 3).orderBy("event_id").collect()
    assert a == b  # pure function of (seed, id): layout-invariant
    c = _batch(synth, 2000, 8, seed=7).orderBy("event_id").collect()
    assert a != c  # the seed actually matters


def test_stream_offsets_and_batch_agreement(synth):
    sdf = (
        synth.readStream.format("synthetic_events")
        .option("rowsPerBatch", 100)
        .option("numPartitions", 2)
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("synth_src_test")
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            n = synth.sql("SELECT count(*) AS c FROM synth_src_test").collect()[0].c
            if n >= 200:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()
    got = synth.sql(
        "SELECT count(*) AS c, count(DISTINCT event_id) AS d FROM synth_src_test"
    ).collect()[0]
    assert got.c >= 200 and got.c % 100 == 0  # whole micro-batches, no dupes
    assert got.d == got.c
    # The stream's first rows are bit-identical to the batch reader's —
    # one generator, two access paths.
    streamed = synth.sql(
        "SELECT * FROM synth_src_test ORDER BY event_id LIMIT 100"
    ).collect()
    batched = _batch(synth, 100, 2).orderBy("event_id").collect()
    assert streamed == batched
