"""Tests for JDBC reader wiring and parquet/JDBC sinks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stadvdb_olap_spark.sources.jdbc import JdbcSource
from stadvdb_olap_spark.sources.parquet import load_table
from stadvdb_olap_spark.sources.sinks import (
    upsert_parquet,
    upsert_statement,
    write_jdbc_upsert,
    write_table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_jdbc_reader_builds_with_partitioned_read(spark):
    src = JdbcSource(
        url="jdbc:postgresql://localhost:5432/wh",
        table="users",
        user="u",
        password="p",
        fetchsize=5000,
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=32,
    )
    reader = src.reader(spark)  # builds without connecting
    assert reader is not None


def test_jdbc_reader_validates_options(spark):
    with pytest.raises(ValueError):
        JdbcSource(url="jdbc:x", table="t", query="SELECT 1").reader(spark)
    with pytest.raises(ValueError):
        JdbcSource(url="jdbc:x", table="t", partition_column="id").reader(spark)


def test_write_table_partitioned_roundtrip(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_tbl")
    write_table(orders, path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # partition pruning: a status filter should read only one directory
    pruned = back.filter(F.col("o_orderstatus") == "F")
    assert "o_orderstatus" in [f.name for f in back.schema.fields]
    assert pruned.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_upsert_parquet_idempotent(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    path = str(tmp_path / "upsert_tbl")
    first = orders.filter(F.col("o_orderkey") % 2 == 0)
    upsert_parquet(spark, first, path, keys=["o_orderkey"])
    assert spark.read.parquet(path).count() == first.count()

    restated = orders.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "o_orderstatus", F.lit("X")
    )
    upsert_parquet(spark, restated, path, keys=["o_orderkey"])
    state1 = {
        r["o_orderkey"]: r["o_orderstatus"]
        for r in spark.read.parquet(path).collect()
    }
    assert all(v == "X" for k, v in state1.items() if k % 3 == 0)

    # idempotence: same upsert again -> identical state
    upsert_parquet(spark, restated, path, keys=["o_orderkey"])
    state2 = {
        r["o_orderkey"]: r["o_orderstatus"]
        for r in spark.read.parquet(path).collect()
    }
    assert state1 == state2


def test_upsert_statement_shape():
    sql = upsert_statement(
        "Users", ["username", "firstName", "gender"], ["username"]
    )
    assert sql == (
        "INSERT INTO Users (username, firstName, gender) VALUES (%s, %s, %s) "
        "ON CONFLICT (username) DO UPDATE SET "
        "firstName = EXCLUDED.firstName, gender = EXCLUDED.gender"
    )


def test_upsert_statement_mysql_dialect():
    """MySQL twin of the reference's Postgres upsert: ON DUPLICATE KEY
    UPDATE with VALUES() refs (the reference's local deployment is a
    MySQL DSN — config/local.py); conflict columns are carried by the
    table's unique key, never named in the statement."""
    sql = upsert_statement(
        "Users", ["username", "firstName", "gender"], ["username"],
        dialect="mysql",
    )
    assert sql == (
        "INSERT INTO Users (username, firstName, gender) VALUES (%s, %s, %s) "
        "ON DUPLICATE KEY UPDATE "
        "firstName = VALUES(firstName), gender = VALUES(gender)"
    )


def test_upsert_statement_rejects_bad_input():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported dialect"):
        upsert_statement("t", ["a", "b"], ["a"], dialect="oracle")
    with _pytest.raises(ValueError, match="unique key"):
        upsert_statement("t", ["a", "b"], [])


def test_merge_statement_postgres_unquoted():
    """merge_statement with quote='' emits the identifier style Postgres
    15+ folds itself — the second real-dialect target from the reference
    (config/supa.py is a Postgres DSN)."""
    from stadvdb_olap_spark.sources.sinks import merge_statement

    sql = merge_statement(
        "users", "users__stage", ["id", "name"], ["id"], quote=""
    )
    assert sql == (
        "MERGE INTO users t USING users__stage s ON (t.id = s.id) "
        "WHEN MATCHED THEN UPDATE SET name = s.name "
        "WHEN NOT MATCHED THEN INSERT (id, name) VALUES (s.id, s.name)"
    )


def test_merge_statement_shape():
    from stadvdb_olap_spark.sources.sinks import merge_statement

    sql = merge_statement(
        "orders_tgt", "orders_tgt__stage",
        ["o_orderkey", "o_totalprice", "o_orderstatus"], ["o_orderkey"],
    )
    assert sql == (
        'MERGE INTO orders_tgt t USING orders_tgt__stage s '
        'ON (t."o_orderkey" = s."o_orderkey") '
        'WHEN MATCHED THEN UPDATE SET "o_totalprice" = s."o_totalprice", '
        '"o_orderstatus" = s."o_orderstatus" '
        'WHEN NOT MATCHED THEN INSERT '
        '("o_orderkey", "o_totalprice", "o_orderstatus") '
        'VALUES (s."o_orderkey", s."o_totalprice", s."o_orderstatus")'
    )


def test_jdbc_derby_merge_roundtrip(spark, tmp_path):
    """LIVE JDBC integration against Spark's bundled embedded Derby:
    parallel JDBC write → staged set-based MERGE → partitioned ranged
    read-back. Asserts upsert semantics and idempotence against a real
    database, not a mock."""
    from stadvdb_olap_spark.sources.sinks import write_jdbc_merge

    derby = "org.apache.derby.jdbc.EmbeddedDriver"
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    opts = {"createTableColumnTypes": "o_orderstatus VARCHAR(4)"}
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    base = orders.filter(F.col("o_orderkey") % 4 == 0)
    (
        base.write.format("jdbc").option("url", url).option("driver", derby)
        .option("dbtable", "orders_tgt")
        .option("createTableColumnTypes", opts["createTableColumnTypes"])
        .mode("overwrite").save()
    )
    restated = orders.filter(F.col("o_orderkey") % 6 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
        F.lit("X").alias("o_orderstatus"),
    )
    affected = write_jdbc_merge(
        restated, url, "orders_tgt", keys=["o_orderkey"], driver=derby, options=opts
    )
    assert affected == restated.count()

    back = JdbcSource(
        url=url, table="orders_tgt", driver=derby,
        partition_column='"o_orderkey"', lower_bound=0,
        upper_bound=10_000_000, num_partitions=8,
    ).reader(spark).load()
    assert back.rdd.getNumPartitions() == 8  # ranged scan is really parallel

    b, r = base.alias("b"), restated.alias("r")
    expected = (
        b.join(r, F.col("b.o_orderkey") == F.col("r.o_orderkey"), "full_outer")
        .select(
            F.coalesce("r.o_orderkey", "b.o_orderkey").alias("o_orderkey"),
            F.when(F.col("r.o_orderkey").isNotNull(), F.col("r.o_totalprice"))
            .otherwise(F.col("b.o_totalprice")).alias("o_totalprice"),
            F.when(F.col("r.o_orderkey").isNotNull(), F.col("r.o_orderstatus"))
            .otherwise(F.col("b.o_orderstatus")).alias("o_orderstatus"),
        )
    )
    got = sorted(map(tuple, back.collect()))
    assert got == sorted(map(tuple, expected.collect()))

    # idempotence: merging the same feed again leaves the state unchanged
    write_jdbc_merge(
        restated, url, "orders_tgt", keys=["o_orderkey"], driver=derby, options=opts
    )
    assert sorted(map(tuple, back.collect())) == got


def test_jdbc_predicate_and_projection_pushdown(spark, tmp_path):
    """Filters and column pruning on a JDBC read must reach the database
    as SQL, not run in Spark after a full-table fetch — at 100 TB the
    difference is shipping a table vs shipping a slice. Verified against
    LIVE embedded Derby: the scan's PushedFilters carries the predicates,
    the ReadSchema carries only the projected columns, and the result
    matches the parquet-side equivalent."""
    derby = "org.apache.derby.jdbc.EmbeddedDriver"
    url = f"jdbc:derby:{tmp_path}/pushdb;create=true"
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    (
        orders.write.format("jdbc").option("url", url).option("driver", derby)
        .option("dbtable", "orders_src")
        .option("createTableColumnTypes", "o_orderstatus VARCHAR(4)")
        .mode("overwrite").save()
    )
    src = JdbcSource(url=url, table="orders_src", driver=derby).reader(
        spark
    ).load()
    q = src.filter(
        (F.col("o_totalprice") > 150000.0) & (F.col("o_orderstatus") == "O")
    ).select("o_orderkey", "o_totalprice")

    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    scan = [
        block for block in plan.split("\n\n")
        if "Scan JDBCRelation" in block or "PushedFilters" in block
    ]
    assert scan, f"no JDBC scan block in plan:\n{plan}"
    meta = "\n".join(scan)
    assert "GreaterThan(o_totalprice,150000.0)" in meta.replace(" ", ""), meta
    assert "EqualTo(o_orderstatus,O)" in meta.replace(" ", ""), meta
    # Projection pruning: the fetched schema holds ONLY the needed
    # columns (filter columns may ride along; o_custkey must not).
    rs = [ln for ln in meta.splitlines() if "ReadSchema" in ln]
    assert rs and "o_custkey" not in rs[0], meta

    expected = {
        (r["o_orderkey"], r["o_totalprice"])
        for r in orders.filter(
            (F.col("o_totalprice") > 150000.0)
            & (F.col("o_orderstatus") == "O")
        ).collect()
    }
    assert {(r["o_orderkey"], r["o_totalprice"]) for r in q.collect()} == expected


def test_write_jdbc_upsert_requires_factory(spark):
    df = load_table(spark, SF_DIR, "nation")
    with pytest.raises(ValueError):
        write_jdbc_upsert(df, "jdbc:x", "nation", ["n_nationkey"])


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from stadvdb_olap_spark.sources.parquet import load_table
    from stadvdb_olap_spark.sources.sinks import write_bucketed

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_bkt", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(orders, "ord_bkt", ["o_orderkey"], 8, sort_cols=["o_orderkey"])

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        # force a sort-merge path so bucketing (not broadcast) carries the join
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_bkt").join(
            spark.table("ord_bkt"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket-aligned: zero shuffle
        # and the result is identical to the plain join
        expected = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")


def test_partitioned_write_enables_partition_pruning(spark, tmp_path):
    from stadvdb_olap_spark.sources.parquet import load_table
    from stadvdb_olap_spark.sources.sinks import write_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_table(orders, path, partition_by=["order_year"])

    scan = spark.read.parquet(path).filter(F.col("order_year") == 1995)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "order_year" in plan
    # pruning is real: only the 1995 directory is listed
    n_1995 = scan.count()
    assert 0 < n_1995 < orders.count()
    assert (
        orders.filter(F.col("order_year") == 1995).count() == n_1995
    )


def test_csv_and_jsonl_loaders_roundtrip(spark, tmp_path):
    from stadvdb_olap_spark.sources.parquet import load_csv, load_jsonl, load_table

    orders = (
        load_table(spark, "/root/testdata/sf0.001", "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(500)
    )
    schema = "o_orderkey long, o_orderstatus string, o_totalprice double"

    csv_path = str(tmp_path / "orders_csv")
    orders.write.mode("overwrite").option("header", "true").csv(csv_path)
    got_csv = load_csv(spark, csv_path, schema)
    assert sorted(map(tuple, got_csv.collect())) == sorted(map(tuple, orders.collect()))

    json_path = str(tmp_path / "orders_jsonl")
    orders.write.mode("overwrite").json(json_path)
    got_json = load_jsonl(spark, json_path, schema)
    assert sorted(map(tuple, got_json.collect())) == sorted(map(tuple, orders.collect()))

    # explicit schema means no inference pass: dtypes match exactly
    assert dict(got_csv.dtypes) == dict(orders.dtypes)
    assert dict(got_json.dtypes) == dict(orders.dtypes)


def test_orc_roundtrip_preserves_rows_and_pushdown(spark, tmp_path):
    from stadvdb_olap_spark.sources.parquet import load_orc, load_table
    from stadvdb_olap_spark.sources.sinks import write_orc

    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = load_orc(spark, path)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)

    filtered = back.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus" in plan  # filter reaches the scan operator
    n_f = orders.filter(F.col("o_orderstatus") == "F").count()
    assert filtered.count() == n_f


def test_dynamic_partition_overwrite_replaces_only_touched_partitions(spark, tmp_path):
    from stadvdb_olap_spark.sources.parquet import load_table
    from stadvdb_olap_spark.sources.sinks import overwrite_partitions_dynamic

    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "by_status")
    orders.write.partitionBy("status").parquet(path)
    before = {
        r["status"]: r["n"]
        for r in spark.read.parquet(path).groupBy("status").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }

    # backfill: replace ONLY the 'F' partition with a 1-row frame
    one = orders.filter(F.col("status") == "F").limit(1)
    overwrite_partitions_dynamic(one, path, ["status"])

    after = {
        r["status"]: r["n"]
        for r in spark.read.parquet(path).groupBy("status").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert after["F"] == 1
    for k in before:
        if k != "F":
            assert after[k] == before[k]  # untouched partitions intact
    # conf restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode") != "dynamic"
    )


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Appends with a widened schema stay readable: mergeSchema unions
    the per-file schemas and back-fills missing columns with NULL — the
    lake-side schema-evolution pattern (explicit opt-in; the default
    single-footer read stays cheap)."""
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows == {1: None, 2: 9.5}


def test_text_loader_line_and_wholefile_modes(spark, tmp_path):
    """Raw-text ingestion round trip: line mode yields one row per line;
    whole-file mode yields one row per file with newlines intact."""
    from stadvdb_olap_spark.sources.parquet import load_text

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("first doc line one\nsecond line")
    (d / "b.txt").write_text("other doc")
    lines = sorted(r["value"] for r in load_text(spark, str(d)).collect())
    assert lines == ["first doc line one", "other doc", "second line"]

    whole = sorted(
        r["value"] for r in load_text(spark, str(d), whole_file=True).collect()
    )
    assert whole == ["first doc line one\nsecond line", "other doc"]


def test_binary_file_source_feeds_multimodal_features(spark, tmp_path):
    """binaryFile ingestion -> multimodal feature extraction: payload
    bytes survive intact and the deterministic 'fake' codec runs over
    the content column exactly as over fixture binaries."""
    from stadvdb_olap_spark.operators.multimodal import extract_features
    from stadvdb_olap_spark.sources.parquet import load_binary_files

    d = tmp_path / "media"
    d.mkdir()
    payloads = {"x.img": b"\x00\x01payload-x", "y.img": b"\xffpayload-y"}
    for name, blob in payloads.items():
        (d / name).write_bytes(blob)
    (d / "skip.txt").write_bytes(b"not media")

    df = load_binary_files(spark, str(d), glob="*.img")
    rows = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in df.collect()}
    assert rows == payloads

    media = df.select(
        F.xxhash64("path").alias("doc_id"), F.col("content")
    )
    feats = extract_features(media, content_col="content", id_col="doc_id")
    got = {r["doc_id"]: (r["n_bytes"], len(r["features"])) for r in feats.collect()}
    sizes = sorted(n for n, _ in got.values())
    assert sizes == sorted(len(b) for b in payloads.values())
    assert all(nf > 0 for _, nf in got.values())


def test_versioned_snapshots_time_travel(spark, tmp_path):
    """write → commit → retention-prune lifecycle: old versions stay
    readable while retained, pruned versions are refused, latest wins
    by default, and the keyed diff explains what changed."""
    from stadvdb_olap_spark.sources.versioned import (
        diff_snapshots,
        list_versions,
        read_snapshot,
        write_snapshot,
    )

    d = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "s", "x"]
    )
    assert write_snapshot(base, d, retain=2) == 1
    v2_df = spark.createDataFrame(
        [(1, "a", 11.0), (2, "b", 20.0), (4, "d", 40.0)], ["id", "s", "x"]
    )
    assert write_snapshot(v2_df, d, retain=2) == 2
    assert list_versions(d) == [1, 2]

    # time travel to v1 while it is retained
    got_v1 = {(r["id"], r["x"]) for r in read_snapshot(spark, d, 1).collect()}
    assert got_v1 == {(1, 10.0), (2, 20.0), (3, 30.0)}

    # snapshot isolation: a reader holding v2 survives a later commit
    held = read_snapshot(spark, d)  # resolves to v2 NOW
    assert write_snapshot(base, d, retain=2) == 3  # prunes v1
    assert list_versions(d) == [2, 3]
    assert {(r["id"], r["x"]) for r in held.collect()} == {
        (1, 11.0), (2, 20.0), (4, 40.0),
    }

    # pruned version refused with the retained list in the message
    import pytest as _pytest

    with _pytest.raises(ValueError, match=r"\[2, 3\]"):
        read_snapshot(spark, d, 1)

    # latest by default
    assert {(r["id"], r["x"]) for r in read_snapshot(spark, d).collect()} == {
        (1, 10.0), (2, 20.0), (3, 30.0),
    }

    # diff v2 -> v3: id 1 changed back, id 3 re-added, id 4 removed
    diff = {
        (r["id"], r["change_type"])
        for r in diff_snapshots(spark, d, 2, 3, keys=["id"]).collect()
    }
    assert diff == {(1, "changed"), (3, "added"), (4, "removed")}


def test_versioned_snapshot_prune_grace_window(spark, tmp_path):
    """A version superseded by commit N keeps its FILES until commit N+1:
    a reader that resolved it while retained survives the very next
    commit (grace window), and the directory is only removed after a
    further commit."""
    import os

    from stadvdb_olap_spark.sources.versioned import (
        list_versions,
        read_snapshot,
        write_snapshot,
    )

    d = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, 10.0)], ["id", "x"])
    write_snapshot(base, d, retain=1)  # v1
    held_v1 = read_snapshot(spark, d)  # resolves v1 NOW

    write_snapshot(spark.createDataFrame([(2, 20.0)], ["id", "x"]), d, retain=1)
    # v1 left the manifest but its files are pending-pruned, not deleted:
    assert list_versions(d) == [2]
    assert os.path.isdir(os.path.join(d, "v1"))
    assert [r["id"] for r in held_v1.collect()] == [1]

    write_snapshot(spark.createDataFrame([(3, 30.0)], ["id", "x"]), d, retain=1)
    # the NEXT commit actually removes v1 (and v2 becomes pending)
    assert not os.path.isdir(os.path.join(d, "v1"))
    assert os.path.isdir(os.path.join(d, "v2"))


def test_versioned_snapshot_atomic_commit(spark, tmp_path):
    """A failed write never moves the manifest: readers keep the last
    committed version."""
    from stadvdb_olap_spark.sources.versioned import (
        read_snapshot,
        write_snapshot,
    )

    d = str(tmp_path / "tbl2")
    ok = spark.createDataFrame([(1, 1.0)], ["id", "x"])
    write_snapshot(ok, d)

    class Boom(Exception):
        pass

    import pytest as _pytest
    from pyspark.sql import functions as F

    bad = ok.select("id", (F.col("x") / F.lit(0)).alias("x"))  # ANSI: fails
    with _pytest.raises(Exception):
        write_snapshot(bad, d)
    # still serving v1
    assert [r["x"] for r in read_snapshot(spark, d).collect()] == [1.0]


def test_upsert_parquet_partitioned_prunes_untouched(spark, tmp_path):
    """Partition-pruned SCD1 merge: a delta touching one partition
    (a) merges exactly like the full-table SCD1, (b) leaves the untouched
    partition's files BYTE-IDENTICAL on disk, (c) is idempotent."""
    import hashlib
    import os

    from stadvdb_olap_spark.sources.sinks import upsert_parquet_partitioned

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [
            (1, "2024-01-01", 10.0),
            (2, "2024-01-01", 20.0),
            (3, "2024-01-02", 30.0),
            (4, "2024-01-02", 40.0),
        ],
        ["id", "d", "x"],
    )
    upsert_parquet_partitioned(spark, base, path, keys=["id"], partition_by=["d"])

    def file_state(part_dir):
        out = {}
        for root, _, files in os.walk(part_dir):
            for f in files:
                if f.startswith(("_", ".")):
                    continue
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    out[p] = hashlib.sha256(fh.read()).hexdigest()
        return out

    untouched_before = file_state(os.path.join(path, "d=2024-01-01"))
    assert untouched_before  # partition layout actually materialized

    delta = spark.createDataFrame(
        [(3, "2024-01-02", 31.0), (5, "2024-01-02", 50.0)], ["id", "d", "x"]
    )
    upsert_parquet_partitioned(spark, delta, path, keys=["id"], partition_by=["d"])

    # partition-column inference reads the dir values back as DATEs
    got = {
        (r["id"], str(r["d"]), r["x"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        (1, "2024-01-01", 10.0),
        (2, "2024-01-01", 20.0),
        (3, "2024-01-02", 31.0),
        (4, "2024-01-02", 40.0),
        (5, "2024-01-02", 50.0),
    }
    # untouched partition: same files, same bytes
    assert file_state(os.path.join(path, "d=2024-01-01")) == untouched_before

    # idempotence: same delta again -> same table contents
    upsert_parquet_partitioned(spark, delta, path, keys=["id"], partition_by=["d"])
    again = {
        (r["id"], str(r["d"]), r["x"])
        for r in spark.read.parquet(path).collect()
    }
    assert again == got


def test_upsert_parquet_partitioned_nonstring_partition_values(spark, tmp_path):
    """Regression: boolean/double partition values render differently in
    Python (`str(True)`='True', `str(1e-07)`='1e-07') vs Spark partition
    directories ('true', '1.0E-7'). The prune predicate must compare
    TYPED values, or it matches zero target rows and the dynamic
    overwrite silently drops the partition's pre-existing rows."""
    from stadvdb_olap_spark.sources.sinks import upsert_parquet_partitioned

    # boolean partition column
    path = str(tmp_path / "tbl_bool")
    base = spark.createDataFrame(
        [(1, True, 10.0), (2, True, 20.0), (3, False, 30.0)],
        ["id", "flag", "x"],
    )
    upsert_parquet_partitioned(spark, base, path, keys=["id"], partition_by=["flag"])
    delta = spark.createDataFrame([(2, True, 21.0)], ["id", "flag", "x"])
    upsert_parquet_partitioned(spark, delta, path, keys=["id"], partition_by=["flag"])
    # NB partition inference never infers BOOLEAN — read-back dir values
    # stay the strings 'true'/'false'; the loss bug is what we assert on.
    got = {(r["id"], r["flag"], r["x"]) for r in spark.read.parquet(path).collect()}
    # id=1 must SURVIVE the merge of the flag=true partition
    assert got == {(1, "true", 10.0), (2, "true", 21.0), (3, "false", 30.0)}

    # double partition column with scientific-notation rendering
    path2 = str(tmp_path / "tbl_double")
    base2 = spark.createDataFrame(
        [(1, 1e-07, "a"), (2, 1e-07, "b"), (3, 0.5, "c")],
        ["id", "rate", "s"],
    )
    upsert_parquet_partitioned(spark, base2, path2, keys=["id"], partition_by=["rate"])
    delta2 = spark.createDataFrame([(2, 1e-07, "B")], ["id", "rate", "s"])
    upsert_parquet_partitioned(spark, delta2, path2, keys=["id"], partition_by=["rate"])
    got2 = {(r["id"], r["rate"], r["s"]) for r in spark.read.parquet(path2).collect()}
    assert got2 == {(1, 1e-07, "a"), (2, 1e-07, "B"), (3, 0.5, "c")}


def test_upsert_parquet_partitioned_bounds_and_validation(spark, tmp_path):
    import pytest as _pytest

    from stadvdb_olap_spark.sources.sinks import upsert_parquet_partitioned

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], ["id", "d", "x"]
    )
    with _pytest.raises(ValueError, match="partition columns"):
        upsert_parquet_partitioned(
            spark, df, path, keys=["id"], partition_by=["nope"]
        )
    upsert_parquet_partitioned(spark, df, path, keys=["id"], partition_by=["d"])
    with _pytest.raises(ValueError, match="touches >"):
        upsert_parquet_partitioned(
            spark, df, path, keys=["id"], partition_by=["d"],
            max_touched_partitions=1,
        )


def test_upsert_parquet_swap_crash_recovery(spark, tmp_path):
    """Every crash point of the write-new-rename swap is recoverable:
    (a) crash AFTER the table was renamed aside but BEFORE the new one
    was published -> next run restores the old table and re-merges;
    (b) leftover .__old__ / .__new__ staging dirs never wedge a run."""
    import os
    import shutil

    path = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    upsert_parquet(spark, base, path, keys=["id"])

    # simulate crash (a): table renamed aside, replacement never landed
    os.rename(path, path + ".__old__")
    delta = spark.createDataFrame([(2, "B"), (3, "c")], ["id", "v"])
    upsert_parquet(spark, delta, path, keys=["id"])
    got = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}  # old rows survived

    # simulate crash (b): stale staging dirs from an interrupted run
    shutil.copytree(path, path + ".__old__")
    shutil.copytree(path, path + ".__new__")
    upsert_parquet(
        spark,
        spark.createDataFrame([(4, "d")], ["id", "v"]),
        path,
        keys=["id"],
    )
    got = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}
    assert not os.path.exists(path + ".__old__")
    assert not os.path.exists(path + ".__new__")


def test_upsert_parquet_duplicate_source_default_tiebreak(spark, tmp_path):
    """With order_by omitted, duplicate-key source rows resolve by the
    FULL column list — a deterministic pick, stable across reruns (the
    old keys-only default left the choice to partition order)."""
    path = str(tmp_path / "t")
    dup = spark.createDataFrame(
        [(1, "b"), (1, "a"), (2, "z")], ["id", "v"]
    ).repartition(7)
    upsert_parquet(spark, dup, path, keys=["id"])
    first = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert first == {(1, "a"), (2, "z")}  # ascending full-row order


def test_upsert_parquet_schema_evolution_survives_remerge(spark, tmp_path):
    """After an evolving merge, a later merge touching the same table
    must NOT lose the evolved column's stored values (mergeSchema on
    the target read — single-file inference could miss the column)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    upsert_parquet(spark, base, path, keys=["id"])
    evolved = spark.createDataFrame([(2, "B", "x2")], ["id", "v", "extra"])
    upsert_parquet(spark, evolved, path, keys=["id"], schema_evolution=True)
    plain = spark.createDataFrame([(3, "c")], ["id", "v"])
    upsert_parquet(spark, plain, path, keys=["id"], schema_evolution=True)
    got = {
        (r["id"], r["v"], r["extra"])
        for r in spark.read.option("mergeSchema", "true")
        .parquet(path)
        .select("id", "v", F.col("extra"))
        .collect()
    }
    assert got == {(1, "a", None), (2, "B", "x2"), (3, "c", None)}


def test_statements_pure_key_table(spark):
    """Key-only tables generate valid no-op-on-conflict SQL instead of
    an empty UPDATE SET list (a syntax error in every dialect)."""
    from stadvdb_olap_spark.sources.sinks import (
        merge_statement,
        upsert_statement,
    )

    pg = upsert_statement("t", ["a", "b"], ["a", "b"])
    assert pg.endswith("DO NOTHING") and "SET" not in pg
    my = upsert_statement("t", ["a", "b"], ["a", "b"], dialect="mysql")
    assert my.endswith("ON DUPLICATE KEY UPDATE a = a")
    m = merge_statement("t", "s", ["a", "b"], ["a", "b"])
    assert "WHEN MATCHED" not in m and "WHEN NOT MATCHED" in m
