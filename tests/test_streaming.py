"""Streaming tests: batch/stream agreement for windowed aggregates,
incremental upsert loop semantics, stateful sessionization."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from stadvdb_olap_spark.sources.parquet import load_table
from stadvdb_olap_spark.streaming.incremental import incremental_upsert_stream
from stadvdb_olap_spark.streaming.windowed import windowed_event_aggregate

SF_DIR = "/root/testdata/sf0.001"


def _poll_rows(spark, q, table, ready, deadline_s=120.0):
    """Collect a memory-sink table once ``ready(rows)`` holds, then stop
    the query. For stateful queries whose processing-time timeouts keep
    availableNow scheduling empty batches forever, this replaces an
    awaitTermination(deadline) that always slept out the full budget."""
    import time

    t0 = time.time()
    rows = []
    try:
        while time.time() - t0 < deadline_s:
            rows = spark.sql(f"SELECT * FROM {table}").collect()
            if ready(rows):
                break
            time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination()
    return rows


@pytest.fixture()
def events_stream_dir(spark, tmp_path):
    """Events re-materialized as a two-file stream source directory."""
    ev = load_table(spark, SF_DIR, "events")
    d = str(tmp_path / "events_src")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(
        d + "/half0"
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(
        d + "/half1"
    )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    i = 0
    for root, _, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(root, f), os.path.join(flat, f"part{i}.parquet"))
                i += 1
    return flat


def test_stream_window_agg_matches_batch(spark, events_stream_dir, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    batch = windowed_event_aggregate(ev)
    batch_rows = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in batch.collect()
    }

    stream = (
        spark.readStream.schema(ev.schema)
        .parquet(events_stream_dir)
    )
    agg = windowed_event_aggregate(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_win"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    assert got == batch_rows


def test_incremental_upsert_stream_converges_to_batch_state(
    spark, events_stream_dir, tmp_path
):
    ev = load_table(spark, SF_DIR, "events")
    target = str(tmp_path / "target")

    q = incremental_upsert_stream(
        spark,
        source_dir=events_stream_dir,
        source_schema=ev.schema,
        target_path=target,
        keys=["event_id"],
        checkpoint_dir=str(tmp_path / "ckpt_inc"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)

    final = spark.read.parquet(target)
    # Upserting every event keyed by event_id must converge to the distinct
    # event set regardless of batch boundaries.
    assert final.count() == ev.select("event_id").distinct().count()
    src = {r["event_id"]: r["value"] for r in ev.collect()}
    got = {r["event_id"]: r["value"] for r in final.collect()}
    assert got == src


def test_builtin_session_window_stream_flushes_to_batch(spark, tmp_path):
    """Append-mode streaming session_window must emit EXACTLY the
    certified batch sessions once the watermark passes them. A
    far-future sentinel event advances the global watermark so every
    real session closes under one availableNow run; the sentinel user's
    own (still-open) session must NOT emit."""
    from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded
    from stadvdb_olap_spark.streaming.windowed import session_window_aggregate

    _ensure_loaded()
    ev = load_table(spark, SF_DIR, "events")
    src_dir = str(tmp_path / "sess_src")
    ev.write.parquet(src_dir)
    # Two sentinel files, written LAST in separate micro-batches: the
    # watermark a batch uses comes from the PREVIOUS batch's max event
    # time, so sentinel #1 raises it and the batch carrying sentinel #2
    # flushes every real session.
    import time

    for uid, ts in ((-1, "2030-01-01 00:00:00"), (-2, "2030-01-02 00:00:00")):
        ev.sparkSession.createDataFrame([(uid,)], "user_id long").select(
            "user_id", F.to_timestamp(F.lit(ts)).alias("ts")
        ).coalesce(1).write.mode("append").parquet(src_dir)
        time.sleep(0.05)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .select("user_id", "ts")
    )
    q = (
        session_window_aggregate(stream)
        .writeStream.format("memory")
        .queryName("builtin_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql(
            "SELECT * FROM builtin_sessions WHERE user_id >= 0"
        ).collect()
    }
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in REGISTRY["events_session_window_builtin"].fn(
            spark, SF_DIR
        ).collect()
    }
    assert got == batch
    # sentinel #2's session is still open (nothing advanced the
    # watermark past it) and must not have emitted; sentinel #1's
    # legitimately closed once #2 raised the watermark.
    assert not [
        r for r in spark.sql("SELECT * FROM builtin_sessions").collect()
        if r["user_id"] == -2
    ]


def test_cdc_apply_stream_converges_to_batch_apply(spark, tmp_path):
    """A streamed I/U/D change feed (log segments arriving seq-ordered,
    one file per trigger) maintained by cdc_apply_stream must land on
    EXACTLY the state a one-shot batch apply_cdc of the whole feed
    produces — including delete-then-reinsert lifecycles."""
    import time

    from stadvdb_olap_spark.operators.merge import apply_cdc
    from stadvdb_olap_spark.streaming.incremental import cdc_apply_stream

    v1 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    target = str(tmp_path / "cdc_target")
    v1.write.parquet(target)

    feed_schema = "k long, s string, v double, seq int, op string"
    steps = [
        # seq 1: update 2, delete 3, insert 5
        [(2, "B", 2.5, 1, "U"), (3, "c", 3.0, 1, "D"), (5, "e", 5.0, 1, "I")],
        # seq 2: delete 5 (inserted last step), update 1
        [(5, "e", 5.0, 2, "D"), (1, "A", 1.5, 2, "U")],
        # seq 3: reinsert 3 at a new value, delete 4
        [(3, "C2", 3.5, 3, "I"), (4, "d", 4.0, 3, "D")],
    ]
    src_dir = str(tmp_path / "cdc_feed")
    for rows in steps:
        spark.createDataFrame(rows, feed_schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        time.sleep(0.05)  # distinct mtimes -> deterministic file order

    q = cdc_apply_stream(
        spark,
        source_dir=src_dir,
        source_schema=feed_schema,
        target_path=target,
        keys=["k"],
        checkpoint_dir=str(tmp_path / "cdc_ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)

    whole_feed = spark.createDataFrame(
        [r for rows in steps for r in rows], feed_schema
    )
    expected = sorted(map(tuple, apply_cdc(v1, whole_feed, ["k"]).collect()))
    got = sorted(map(tuple, spark.read.parquet(target).collect()))
    assert got == expected
    # and the lifecycle landed where it should
    state = {r[0]: (r[1], r[2]) for r in got}
    assert state == {1: ("A", 1.5), 2: ("B", 2.5), 3: ("C2", 3.5)}


def test_stateful_sessionize_batch_shape(spark, tmp_path):
    # applyInPandasWithState requires a streaming source; exercise the
    # plumbing through a rate-limited memory stream of synthetic events.
    import pandas as pd

    from stadvdb_olap_spark.streaming.stateful import sessionize_stream

    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 02:00",
                 "2024-01-01 00:05"]
            ),
        }
    )
    src_dir = str(tmp_path / "stateful_src")
    spark.createDataFrame(pdf).write.parquet(src_dir)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src_dir)
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "stateful_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # applyInPandasWithState + processing-time timeouts keeps scheduling
    # empty batches, so availableNow never self-terminates — poll for
    # the expected emission instead of sleeping out the full timeout
    # (the old awaitTermination(120) burnt exactly 120 s per test).
    rows = _poll_rows(
        spark, q, "sessions",
        lambda rs: any((r["user_id"], r["n_events"]) == (1, 2) for r in rs),
    )
    # One closed session for user 1 (00:00-00:10, 2 events); the 02:00
    # event and user 2's single event stay in open state (no timeout fires
    # within an availableNow run).
    got = {(r["user_id"], r["n_events"]) for r in rows}
    assert (1, 2) in got


def test_stateful_sessionize_agrees_with_batch_twin(spark, tmp_path):
    """Every session the stateful stream CLOSES must be a row of the
    batch twin (streaming.stateful.session_stats — the body behind the
    certified session_stats_30m catalog query): same user, same start,
    same end, same event count. Whole-second timestamps so the stream's
    ms state and the twin's µs gap device can't disagree on truncation."""
    import pandas as pd

    from stadvdb_olap_spark.streaming.stateful import (
        session_stats,
        sessionize_stream,
    )

    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 1, 2, 2, 2, 3],
            "ts": pd.to_datetime(
                [
                    # user 1: session A (3 events), gap, session B (2 events)
                    "2024-01-01 00:00:00", "2024-01-01 00:10:00",
                    "2024-01-01 00:20:05", "2024-01-01 02:00:00",
                    "2024-01-01 02:29:59",
                    # user 2: session (2 events), gap, open tail
                    "2024-01-01 05:00:00", "2024-01-01 05:30:00",
                    "2024-01-01 08:00:00",
                    # user 3: one open session, never closed
                    "2024-01-01 09:00:00",
                ]
            ),
        }
    )
    src_dir = str(tmp_path / "agree_src")
    spark.createDataFrame(pdf).write.parquet(src_dir)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(
        src_dir
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("agree_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "agree_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # poll-then-stop: see test_stateful_sessionize_batch_shape — the
    # stateful query never self-terminates under availableNow. Both
    # in-batch-closable sessions (user 1's first, user 2's first) land
    # together once the data batch commits.
    rows = _poll_rows(spark, q, "agree_sessions", lambda rs: len(rs) >= 2)
    closed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in rows
    }
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_stats(spark.read.parquet(src_dir)).collect()
    }
    # Closed sessions: user 1's first (a later session follows in-batch),
    # user 2's first. Open tails aren't emitted without a timeout firing.
    assert closed, "stream closed no sessions — fixture gap logic broken"
    assert closed <= batch
    assert (1, pd.Timestamp("2024-01-01 00:00:00"),
            pd.Timestamp("2024-01-01 00:20:05"), 3) in {
        (u, pd.Timestamp(s), pd.Timestamp(e), n) for u, s, e, n in closed
    }


def test_transform_with_state_plan_builds(spark, tmp_path):
    """The typed-state operator's plan must construct against a streaming
    source regardless of the runtime gate below (schema + grouping wiring)."""
    from stadvdb_olap_spark.sources.parquet import load_table
    from stadvdb_olap_spark.streaming.stateful import running_user_totals_stream

    src_dir = str(tmp_path / "plan_src")
    load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts"
    ).limit(10).write.parquet(src_dir)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src_dir)
    out = running_user_totals_stream(stream)
    assert out.isStreaming
    assert [f.simpleString() for f in out.schema.fields] == [
        "user_id:bigint", "n_events:bigint", "last_event:timestamp",
    ]


def test_transform_with_state_running_totals_converge_to_batch(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 typed-state API): fold events
    into per-user ValueState across MULTIPLE micro-batches; the final
    update per user must equal the batch groupBy exactly.

    Runtime-gated: the typed-state Python<->JVM protocol is protobuf-based
    and this runtime ships no google.protobuf — the operator itself is
    complete; the skip marks the missing runtime dependency, mirroring the
    multimodal codec gates."""
    pytest.importorskip("google.protobuf")
    from pyspark.sql import functions as F

    from stadvdb_olap_spark.sources.parquet import load_table
    from stadvdb_olap_spark.streaming.stateful import running_user_totals_stream

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts"
    )
    src_dir = str(tmp_path / "totals_src")
    # several files + maxFilesPerTrigger=1 => guaranteed multi-batch fold
    events.repartition(3).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    # transformWithState requires the RocksDB state store provider
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            running_user_totals_stream(stream)
            .writeStream.format("memory")
            .queryName("running_totals")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "totals_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set(provider_key, prev)

    # last update per user = the converged state
    got = {
        r["user_id"]: (r["n_events"], r["last_event"])
        for r in spark.sql(
            """SELECT user_id, n_events, last_event FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY n_events DESC) AS rn
                 FROM running_totals) WHERE rn = 1"""
        ).collect()
    }
    expected = {
        r["user_id"]: (r["n"], r["last_event"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("ts").alias("max_ts"))
        .withColumn(  # state stores epoch millis; floor batch side alike
            "last_event", F.timestamp_millis(F.unix_millis(F.col("max_ts")))
        )
        .select("user_id", "n", "last_event")
        .collect()
    }
    assert set(got) == set(expected)
    mismatches = {u: (got[u], expected[u]) for u in expected if got[u] != expected[u]}
    assert not mismatches, list(mismatches.items())[:5]


def test_stream_dedup_across_microbatches(spark, tmp_path):
    """Duplicate keys split across two stream files collapse to one row —
    the cross-chunk dedup the reference's per-chunk drop_duplicates misses."""
    from stadvdb_olap_spark.streaming.dedup import dedup_stream

    src = str(tmp_path / "src")
    rows1 = [(1, "2024-01-01 10:00:00", 5.0), (2, "2024-01-01 10:01:00", 6.0)]
    rows2 = [(1, "2024-01-01 10:02:00", 7.0), (3, "2024-01-01 10:03:00", 8.0)]
    schema = "k long, ts string, v double"
    for i, rows in enumerate([rows1, rows2]):
        spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("k long, ts timestamp, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = dedup_stream(stream, ["k"], ts_col="ts", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["k"] for r in spark.sql("select k from dedup_out").collect()}
    assert got == {1, 2, 3}
    # batch mode: same body, plain dropDuplicates
    batch = spark.read.parquet(src)
    assert dedup_stream(batch, ["k"]).count() == 3


def test_stream_static_enrichment_matches_batch(spark, events_stream_dir, tmp_path):
    from stadvdb_olap_spark.streaming.dedup import enrich_stream

    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    ev_schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = spark.readStream.schema(ev_schema).parquet(events_stream_dir)
    enriched = enrich_stream(stream, cust, stream_key="user_id", dim_key="c_custkey")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select c_mktsegment, count(*) as n from enrich_out group by c_mktsegment order by c_mktsegment"
    ).collect()
    ev = spark.read.schema(ev_schema).parquet(events_stream_dir)
    expected = (
        enrich_stream(ev, cust, stream_key="user_id", dim_key="c_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
        .collect()
    )
    assert [(r["c_mktsegment"], r["n"]) for r in got] == [
        (r["c_mktsegment"], r["n"]) for r in expected
    ]


def test_incremental_agg_stream_equals_batch_aggregate(
    spark, events_stream_dir, tmp_path
):
    from stadvdb_olap_spark.plans.compat import money_sum
    from stadvdb_olap_spark.streaming.incremental import (
        incremental_agg_stream,
        read_aggregate,
    )

    ev_schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    target = str(tmp_path / "agg_state")
    q = incremental_agg_stream(
        spark,
        events_stream_dir,
        ev_schema,
        target,
        group_cols=["event_type"],
        value_col="value",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        r["event_type"]: (r["sum_value"], r["n_rows"])
        for r in read_aggregate(spark, target).collect()
    }
    ev = spark.read.schema(ev_schema).parquet(events_stream_dir)
    expected = {
        r["event_type"]: (r["sum_value"], r["n_rows"])
        for r in ev.groupBy("event_type")
        .agg(money_sum("value").alias("sum_value"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    assert got == expected


def test_stream_stream_interval_join_matches_batch(spark, events_stream_dir, tmp_path):
    from stadvdb_olap_spark.streaming.join import (
        click_purchase_attribution,
        split_click_purchase,
    )

    ev = load_table(spark, SF_DIR, "events")
    batch = click_purchase_attribution(ev, within="1 day")
    want = {(r["click_id"], r["purchase_id"]) for r in batch.collect()}
    assert want  # non-degenerate fixture

    stream = spark.readStream.schema(ev.schema).parquet(events_stream_dir)
    clicks, purchases = split_click_purchase(stream)
    # Watermark beyond the fixture's whole time span: availableNow replays
    # history, so a production-sized watermark would drop genuinely-late
    # rows; state-bounding is exercised, completeness is kept.
    joined = click_purchase_attribution(
        clicks, purchases, within="1 day", watermark="36500 days"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_attrib"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM attrib").collect()
    }
    assert got == want


def test_builtin_session_window_agrees_with_custom_sessionizer(spark):
    from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded

    _ensure_loaded()
    sf = SF_DIR
    builtin = REGISTRY["events_session_window_builtin"].fn(spark, sf)
    custom = REGISTRY["events_sessionize_30m"].fn(spark, sf)

    # same number of sessions per user
    b = {
        r["user_id"]: r["n"]
        for r in builtin.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    c = {
        r["user_id"]: r["n"]
        for r in custom.select("user_id", "session_seq").distinct()
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert b == c
    # and identical per-session event counts (as multisets per user)
    sizes_b = {}
    for r in builtin.collect():
        sizes_b.setdefault(r["user_id"], []).append(r["n_events"])
    sizes_c = {}
    for r in (
        custom.groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ):
        sizes_c.setdefault(r["user_id"], []).append(r["n"])
    assert {k: sorted(v) for k, v in sizes_b.items()} == {
        k: sorted(v) for k, v in sizes_c.items()
    }


def test_corpus_dedup_stream_matches_batch_incremental(spark, tmp_path):
    """Streaming delta-vs-corpus dedup must converge to the batch
    incremental matches regardless of how the delta splits into
    micro-batches (per-doc matches are independent, so the union over
    batches is exactly the whole-delta result)."""
    from pyspark.sql import functions as F

    from stadvdb_olap_spark.operators.text_dedup import incremental_lsh_matches
    from stadvdb_olap_spark.sources.parquet import load_table
    from stadvdb_olap_spark.streaming.dedup import corpus_dedup_stream

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    delta = docs.filter(bucket < "14").select("doc_id", "text")
    corpus = docs.filter(bucket >= "14").select("doc_id", "text")

    src = str(tmp_path / "incoming")
    # two files => (up to) two micro-batches under maxFilesPerTrigger=1
    delta.filter(F.col("doc_id") % 2 == 0).write.parquet(src)
    delta.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)

    out = str(tmp_path / "matches")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = corpus_dedup_stream(
        stream, corpus, out, str(tmp_path / "ckpt"), threshold=0.2
    )
    assert q.awaitTermination(180)

    got = {
        (r["delta_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in spark.read.parquet(out)
        .select("delta_id", "corpus_id", "jaccard")
        .collect()
    }
    want = {
        (r["delta_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in incremental_lsh_matches(
            delta, corpus, "doc_id", "text", 0.2, 16, 2, 3
        ).collect()
    }
    assert got == want and len(want) > 0


def test_incremental_upsert_stream_resumes_from_checkpoint(spark, tmp_path):
    """Crash/restart semantics: a second stream run with the SAME
    checkpoint must process only files that arrived after the first run
    drained, and the upsert target must converge to last-write-wins per
    key — the resume capability the reference's cursor-less loop lacked
    (a crash there restarted the full extract)."""
    import os

    from pyspark.sql import functions as F

    from stadvdb_olap_spark.sources.parquet import load_table
    from stadvdb_olap_spark.streaming.incremental import incremental_upsert_stream

    ev = load_table(spark, "/root/testdata/sf0.001", "events").limit(2000)
    src = str(tmp_path / "src")
    os.makedirs(src)
    ev.coalesce(1).write.mode("overwrite").parquet(src + "/__tmp0")
    for f in os.listdir(src + "/__tmp0"):
        if f.endswith(".parquet"):
            os.rename(f"{src}/__tmp0/{f}", f"{src}/file0.parquet")

    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    kwargs = dict(
        source_dir=src,
        source_schema=ev.schema,
        target_path=target,
        keys=["event_id"],
        checkpoint_dir=ckpt,
    )
    q1 = incremental_upsert_stream(spark, **kwargs)
    assert q1.awaitTermination(120)
    base = {r["event_id"]: r["value"] for r in spark.read.parquet(target).collect()}

    # "restated" feed arrives after the first run drained: same keys,
    # values shifted — last-write-wins must replace every touched row.
    restated = ev.filter(F.col("event_id") % 3 == 0).withColumn(
        "value", F.col("value") + 1000.0
    )
    restated.coalesce(1).write.mode("overwrite").parquet(src + "/__tmp1")
    for f in os.listdir(src + "/__tmp1"):
        if f.endswith(".parquet"):
            os.rename(f"{src}/__tmp1/{f}", f"{src}/file1.parquet")

    q2 = incremental_upsert_stream(spark, **kwargs)
    assert q2.awaitTermination(120)

    got = {r["event_id"]: r["value"] for r in spark.read.parquet(target).collect()}
    assert len(got) == len(base)
    for k, v in got.items():
        if k % 3 == 0:
            assert v == base[k] + 1000.0
        else:
            assert v == base[k]


def test_corpus_dedup_stream_resumes_without_duplicates(spark, tmp_path):
    """Restarting the corpus-dedup stream with the same checkpoint must
    process only newly arrived files, and the batch_id-keyed sink must
    never duplicate earlier matches."""
    from pyspark.sql import functions as F

    from stadvdb_olap_spark.operators.text_dedup import incremental_lsh_matches
    from stadvdb_olap_spark.sources.parquet import load_table
    from stadvdb_olap_spark.streaming.dedup import corpus_dedup_stream

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    delta = docs.filter(bucket < "14").select("doc_id", "text")
    corpus = docs.filter(bucket >= "14").select("doc_id", "text")

    src = str(tmp_path / "incoming")
    half0 = delta.filter(F.col("doc_id") % 2 == 0)
    half1 = delta.filter(F.col("doc_id") % 2 == 1)
    half0.write.parquet(src)

    out = str(tmp_path / "matches")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = corpus_dedup_stream(stream, corpus, out, ckpt, threshold=0.2)
        assert q.awaitTermination(180)

    run_once()
    first = [
        tuple(r)
        for r in spark.read.parquet(out)
        .select("delta_id", "corpus_id")
        .collect()
    ]
    assert len(first) == len(set(first))  # no dupes within the first run

    half1.write.mode("append").parquet(src)
    run_once()

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out)
        .select("delta_id", "corpus_id")
        .collect()
    )
    want = sorted(
        (r["delta_id"], r["corpus_id"])
        for r in incremental_lsh_matches(
            delta, corpus, "doc_id", "text", 0.2, 16, 2, 3
        ).collect()
    )
    assert got == want  # full-delta matches, each exactly once


def test_fingerprint_stream_audit_merges_to_batch_fingerprint(
    spark, events_stream_dir, tmp_path
):
    """Per-batch audit fingerprints are mergeable: summing the audit
    rows' (n_rows, checksum) reproduces the whole-input batch
    fingerprint, and a restart over the same source adds no rows."""
    from stadvdb_olap_spark.operators.reconcile import table_fingerprint
    from stadvdb_olap_spark.streaming.integrity import fingerprint_stream

    ev = load_table(spark, SF_DIR, "events")
    audit = str(tmp_path / "audit")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_stream_dir)
    )
    fingerprint_stream(stream, "events", audit, ckpt).awaitTermination(120)

    rows = spark.read.parquet(audit).collect()
    assert len(rows) >= 2  # one per micro-batch (maxFilesPerTrigger=1)
    merged_n = sum(r["n_rows"] for r in rows)
    merged_sum = sum(int(r["checksum"]) for r in rows)

    whole = table_fingerprint(
        spark.read.parquet(events_stream_dir), "events"
    ).collect()[0]
    assert (merged_n, merged_sum) == (whole["n_rows"], int(whole["checksum"]))

    # Replay with the same checkpoint: no new batches, audit unchanged.
    fingerprint_stream(stream, "events", audit, ckpt).awaitTermination(120)
    assert len(spark.read.parquet(audit).collect()) == len(rows)


def test_stream_stream_left_outer_join_emits_unmatched(
    spark, events_stream_dir, tmp_path
):
    """Left-outer stream-stream join: inner pairs are complete, and
    clicks with no purchase inside the window emit NULL purchase rows
    once the watermark passes click_ts + within. With availableNow
    replay the FINAL watermark is max(event_ts) - delay, so null rows
    appear only for clicks older than that — the streamed outer result
    must be the batch outer result restricted to that frontier."""
    import datetime

    from stadvdb_olap_spark.streaming.join import (
        click_purchase_attribution,
        split_click_purchase,
    )

    ev = load_table(spark, SF_DIR, "events")
    batch = click_purchase_attribution(ev, within="1 hour", how="left_outer")
    want_inner = {
        (r["click_id"], r["purchase_id"])
        for r in batch.collect()
        if r["purchase_id"] is not None
    }
    want_unmatched = {
        r["click_id"]: r["click_ts"]
        for r in batch.collect()
        if r["purchase_id"] is None
    }
    assert want_unmatched  # fixture has non-converting clicks

    stream = spark.readStream.schema(ev.schema).parquet(events_stream_dir)
    clicks, purchases = split_click_purchase(stream)
    joined = click_purchase_attribution(
        clicks, purchases, within="1 hour", watermark="1 day", how="left_outer"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_outer"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM attrib_outer").collect()
    got_inner = {
        (r["click_id"], r["purchase_id"])
        for r in rows
        if r["purchase_id"] is not None
    }
    got_null = {r["click_id"] for r in rows if r["purchase_id"] is None}

    # inner matches never wait on the watermark: must be complete & exact
    assert got_inner == want_inner
    # every emitted null row is a genuinely unmatched click
    assert got_null <= set(want_unmatched)
    # and the frontier explains which unmatched clicks emitted: those
    # whose join window closed before the final watermark. Spark's
    # exact outer-eviction boundary trails the naive max−delay by the
    # join's time-range bound plus per-batch watermark lag, so require
    # emission only comfortably (a full extra day) behind it — still
    # hundreds of rows across the 30-day fixture.
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    frontier = max_ts - datetime.timedelta(days=2)
    expect_null = {
        cid
        for cid, cts in want_unmatched.items()
        if cts + datetime.timedelta(hours=1) < frontier
    }
    assert len(expect_null) > 100
    assert expect_null <= got_null


def test_hll_distinct_stream_matches_batch(spark, events_stream_dir, tmp_path):
    """Streaming per-micro-batch HLL sketches, unioned at read time,
    agree with the BATCH sketch estimate exactly (HLL union is
    associative — micro-batching must not change the estimate), and
    with exact distinct counts within HLL error."""
    from stadvdb_olap_spark.streaming.sketches import (
        hll_distinct_stream,
        read_distinct_estimates,
    )

    ev = load_table(spark, SF_DIR, "events")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    target = str(tmp_path / "hll_state")
    q = hll_distinct_stream(
        spark, events_stream_dir, schema, target,
        group_col="event_type", id_col="user_id",
        checkpoint_dir=str(tmp_path / "ckpt_hll"),
    )
    q.awaitTermination(120)

    got = {
        r["event_type"]: r["distinct_est"]
        for r in read_distinct_estimates(spark, target, "event_type").collect()
    }
    batch = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    for k, v in batch.items():
        assert got[k] == v  # associativity: identical sketch -> identical est
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(2, 0.05 * n)
    # global row present and >= any group estimate
    assert got[None] >= max(v for k, v in got.items() if k is not None)


def test_countmin_stream_agrees_exactly_with_batch(
    spark, events_stream_dir, tmp_path
):
    """Streaming per-micro-batch count-min counters, SUMMED at read
    time, equal a batch-built sketch over the same rows EXACTLY
    (integer counters add — no estimate band), and the point estimates
    respect the one-sided guarantee vs exact counts."""
    from stadvdb_olap_spark.plans.sketch_queries import _CM_D, _cm_bucket
    from stadvdb_olap_spark.streaming.sketches import (
        countmin_stream,
        read_countmin_counters,
        read_countmin_estimates,
    )

    ev = load_table(spark, SF_DIR, "events")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    target = str(tmp_path / "cm_state")
    q = countmin_stream(
        spark, events_stream_dir, schema, target,
        term_col="event_type",
        checkpoint_dir=str(tmp_path / "ckpt_cm"),
    )
    q.awaitTermination(120)

    got = {
        (r["r"], r["b"]): r["cnt"]
        for r in read_countmin_counters(spark, target).collect()
    }
    batch_cells = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cm_bucket(F.col("event_type"), r).alias("b"),
                    )
                    for r in range(_CM_D)
                ]
            )
        ).alias("e")
    ).select("e.r", "e.b")
    want = {
        (r["r"], r["b"]): r["cnt"]
        for r in batch_cells.groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want  # exact, not approximate

    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    terms = list(exact) + ["zz_absent_type"]
    est = {
        r["term"]: r["cm_estimate"]
        for r in read_countmin_estimates(spark, target, terms).collect()
    }
    for t, n in exact.items():
        assert est[t] >= n  # count-min never underestimates
    assert est["zz_absent_type"] >= 0


def test_decayed_counts_stream_agrees_bitexactly_with_batch(
    spark, events_stream_dir, tmp_path
):
    """Stream-maintained (key, day) counters + read-time decay produce
    BIT-EXACT scores vs the certified batch query over the same rows:
    integer state merges by +, and the read side reuses the identical
    weight literals and sorted-fold arithmetic."""
    from stadvdb_olap_spark.plans.series_queries import (
        _DECAY_W,
        decayed_trending_event_types,
    )
    from stadvdb_olap_spark.streaming.sketches import (
        decayed_counts_stream,
        read_decayed_scores,
    )

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    target = str(tmp_path / "decay_state")
    q = decayed_counts_stream(
        spark,
        events_stream_dir,
        schema,
        target,
        key_col="event_type",
        ts_col="ts",
        checkpoint_dir=str(tmp_path / "ckpt_decay"),
    )
    q.awaitTermination(120)

    live = {
        r.key: (r.n_events_in_horizon, r.decayed_score)
        for r in read_decayed_scores(spark, target, _DECAY_W).collect()
    }
    batch = {
        r.event_type: (r.n_events_in_horizon, r.decayed_score)
        for r in decayed_trending_event_types(spark, SF_DIR).collect()
    }
    assert live == batch  # exact float equality, not approx


def test_compaction_plan_stream_equals_batch_planner(spark, tmp_path):
    """Stream-maintained compaction planning == the one-shot batch
    catalog query: fold orders into the per-day file-stats state across
    micro-batches (3 file splits, maxFilesPerTrigger=1), derive the
    plan from the state, and compare bit-for-bit with
    compaction_plan_orders — same shared compaction_groups fold, same
    constants."""
    from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded
    from stadvdb_olap_spark.streaming.incremental import (
        compaction_plan_stream,
        read_compaction_plan,
    )

    _ensure_loaded()
    orders = load_table(spark, SF_DIR, "orders")
    src = str(tmp_path / "orders_src")
    os.makedirs(src)
    for i in range(3):
        orders.filter(F.col("o_orderkey") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"slice{i}"))
    j = 0
    for i in range(3):
        for root, _, files in os.walk(str(tmp_path / f"slice{i}")):
            for f in files:
                if f.endswith(".parquet"):
                    shutil.copy(
                        os.path.join(root, f),
                        os.path.join(src, f"part{j}.parquet"),
                    )
                    j += 1
    assert j == 3

    schema = spark.read.parquet(str(tmp_path / "slice0")).schema
    state = str(tmp_path / "day_stats")
    q = compaction_plan_stream(
        spark,
        src,
        schema,
        state_path=state,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    got = sorted(map(tuple, read_compaction_plan(spark, state).collect()))
    want = sorted(
        map(tuple, REGISTRY["compaction_plan_orders"].fn(spark, SF_DIR).collect())
    )
    assert got == want


def test_media_dedup_stream_matches_batch(spark, tmp_path):
    """Streaming image near-dup must converge to the batch
    delta-vs-corpus matches regardless of micro-batch splits (per-image
    matches are independent, so the union over batches is the
    whole-delta result). Corpus state is fingerprints only."""
    from pyspark.sql import functions as F

    from stadvdb_olap_spark.operators.multimodal import (
        ahash_bands,
        near_dup_matches_ahash,
    )
    from stadvdb_olap_spark.plans.multimodal_queries import (
        _text_to_ppm_pair_batch,
    )
    from stadvdb_olap_spark.sources.parquet import load_table
    from stadvdb_olap_spark.streaming.dedup import media_dedup_stream

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .where(F.col("doc_id") < 80)
        .select("doc_id", "text")
    )
    media = docs.mapInPandas(
        _text_to_ppm_pair_batch, "doc_id long, content binary"
    )
    # originals form the standing corpus; perturbed twins arrive as the
    # stream — every twin should match its original at small Hamming
    corpus = media.where(F.col("doc_id") % 2 == 0)
    delta = media.where(F.col("doc_id") % 2 == 1)
    corpus_hashes = ahash_bands(corpus)

    src = str(tmp_path / "incoming")
    delta.where(F.col("doc_id") % 4 == 1).write.parquet(src)
    delta.where(F.col("doc_id") % 4 == 3).write.mode("append").parquet(src)

    out = str(tmp_path / "matches")
    stream = (
        spark.readStream.schema("doc_id long, content binary")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = media_dedup_stream(
        stream, corpus_hashes, out, str(tmp_path / "ckpt"), max_hamming=6
    )
    assert q.awaitTermination(180)

    got = {
        (r["delta_id"], r["corpus_id"], r["hamming"])
        for r in spark.read.parquet(out)
        .select("delta_id", "corpus_id", "hamming")
        .collect()
    }
    want = {
        (r["delta_id"], r["corpus_id"], r["hamming"])
        for r in near_dup_matches_ahash(
            ahash_bands(delta), corpus_hashes, max_hamming=6
        ).collect()
    }
    assert got == want and len(want) > 0
    # the perturbed twin of every corpus image is in the delta: its
    # match (2d+1 -> 2d) must be present whenever a band survived
    twins = {(a, b) for a, b, _ in got if a == b + 1}
    assert len(twins) >= len(got) // 2


def test_kmv_stream_state_equals_batch_sketch(spark, tmp_path):
    """The streamed KMV state (union of per-micro-batch bottom-k,
    re-ranked) must equal the batch sketch over the same files EXACTLY
    — min-wise mergeability makes the streaming maintenance lossless,
    unlike estimate-banded sketches."""
    import hashlib

    from stadvdb_olap_spark.plans.sketch_queries import bottomk_hashes
    from stadvdb_olap_spark.streaming.sketches import (
        kmv_bottomk_stream,
        read_kmv_state,
    )

    def hv(s):
        return int(hashlib.md5(str(s).encode()).hexdigest()[:12], 16)

    rows = [("g1" if i % 3 else "g2", hv(i)) for i in range(400)]
    df = spark.createDataFrame(rows, "grp string, hv long")
    src = str(tmp_path / "incoming")
    df.where("hv % 2 = 0").write.parquet(src)
    df.where("hv % 2 = 1").write.mode("append").parquet(src)

    out = str(tmp_path / "state")
    q = kmv_bottomk_stream(
        spark, src, "grp string, hv long", out, "grp", "hv", 32,
        str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(180)

    got = sorted(
        (r["grp"], r["hv"], r["rn"])
        for r in read_kmv_state(spark, out, "grp", "hv", 32).collect()
    )
    want = sorted(
        (r["grp"], r["hv"], r["rn"])
        for r in bottomk_hashes(
            spark.read.parquet(src), "grp", "hv", 32
        ).collect()
    )
    assert got == want and len(want) == 64


def test_audio_dedup_stream_matches_batch(spark, tmp_path):
    """The media dedup stream with the AUDIO fingerprint swapped in
    (shared band contract) converges to the batch delta-vs-corpus
    matches — one streaming wrapper serves every fingerprintable
    modality."""
    from pyspark.sql import functions as F

    from stadvdb_olap_spark.operators.multimodal import (
        audio_energy_fingerprint,
        near_dup_matches_ahash,
    )
    from stadvdb_olap_spark.plans.multimodal_queries import (
        _text_to_wav_pair_batch,
    )
    from stadvdb_olap_spark.sources.parquet import load_table
    from stadvdb_olap_spark.streaming.dedup import media_dedup_stream

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .where(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    media = docs.mapInPandas(
        _text_to_wav_pair_batch, "doc_id long, content binary"
    )
    corpus = media.where(F.col("doc_id") % 2 == 0)
    delta = media.where(F.col("doc_id") % 2 == 1)
    corpus_fps = audio_energy_fingerprint(corpus)

    src = str(tmp_path / "incoming")
    delta.where(F.col("doc_id") % 4 == 1).write.parquet(src)
    delta.where(F.col("doc_id") % 4 == 3).write.mode("append").parquet(src)

    out = str(tmp_path / "matches")
    q = media_dedup_stream(
        spark.readStream.schema("doc_id long, content binary")
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        corpus_fps,
        out,
        str(tmp_path / "ckpt"),
        max_hamming=4,
        fingerprint=audio_energy_fingerprint,
    )
    assert q.awaitTermination(180)

    got = {
        (r["delta_id"], r["corpus_id"], r["hamming"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["delta_id"], r["corpus_id"], r["hamming"])
        for r in near_dup_matches_ahash(
            audio_energy_fingerprint(delta), corpus_fps, max_hamming=4
        ).collect()
    }
    assert got == want and len(want) > 0


def test_kmv_stream_state_equals_batch_sketch_sf01(spark, tmp_path):
    """sf0.1 fixture-driven KMV stream ↔ batch agreement (the
    sessionizer batch-twin pattern, round-10): the streamed per-batch
    bottom-k states over the REAL orders table — same 48-bit md5
    hashing as the certified kmv_bottomk_ndv_orders — re-rank to
    EXACTLY the batch sketch over the same rows, across multiple
    micro-batches. 10x the driver gate: sub-second hash collisions and
    deep per-group ties only exist at this volume."""
    from stadvdb_olap_spark.plans.sketch_queries import bottomk_hashes
    from stadvdb_olap_spark.sources.parquet import load_table
    from stadvdb_olap_spark.streaming.sketches import (
        kmv_bottomk_stream,
        read_kmv_state,
    )

    orders = load_table(spark, "/root/testdata/sf0.1", "orders")
    hashed = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.conv(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 12), 16, 10
        )
        .cast("long")
        .alias("hv"),
    )
    src = str(tmp_path / "incoming")
    # three files => multiple micro-batches; uneven, overlapping groups
    hashed.where("hv % 3 = 0").write.parquet(src)
    hashed.where("hv % 3 = 1").write.mode("append").parquet(src)
    hashed.where("hv % 3 = 2").write.mode("append").parquet(src)

    out = str(tmp_path / "state")
    q = kmv_bottomk_stream(
        spark, src, "grp string, hv long", out, "grp", "hv", 32,
        str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(300)

    got = sorted(
        (r["grp"], r["hv"], r["rn"])
        for r in read_kmv_state(spark, out, "grp", "hv", 32).collect()
    )
    want = sorted(
        (r["grp"], r["hv"], r["rn"])
        for r in bottomk_hashes(
            spark.read.parquet(src), "grp", "hv", 32
        ).collect()
    )
    assert got == want
    # every priority carries a full k=32 state at this scale
    assert len(want) == 5 * 32
