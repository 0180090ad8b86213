"""Golden-file protocol conformance for sources/delta_log.py.

No off-the-shelf Delta reader is installable in this runtime (delta-rs /
delta-spark / DuckDB's delta extension all need a network fetch), so the
"any Delta reader can open these tables" claim is pinned the next-best
way: a scripted commit sequence must produce EXACTLY the action stream
delta-io/delta PROTOCOL.md prescribes — action kinds, field names,
field types, and ordering — with only the genuinely volatile fields
(uuids, timestamps, byte sizes) normalized. Any drift in what we write
to ``_delta_log`` fails this test before it can break an external
reader."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from stadvdb_olap_spark.sources.delta_log import (
    checkpoint_table,
    compact_table,
    delete_where,
    table_versions,
    write_delta,
)


def _normalized_log(table_dir: str) -> list[list[dict]]:
    """All commit actions, volatile fields replaced by stable tokens.

    File paths are replaced by sequence tokens CONSISTENTLY across
    actions (an add and a later remove of the same file normalize to
    the same token), so copy-on-write identity is part of the golden."""
    path_tokens: dict[str, str] = {}

    def tok(path: str) -> str:
        if path not in path_tokens:
            prefix = path.rsplit("/", 1)[0] + "/" if "/" in path else ""
            path_tokens[path] = f"{prefix}<file-{len(path_tokens)}>"
        return path_tokens[path]

    out = []
    for v in table_versions(table_dir):
        commit = []
        p = os.path.join(table_dir, "_delta_log", f"{v:020d}.json")
        for line in open(p):
            if not line.strip():
                continue
            a = json.loads(line)
            kind = next(iter(a))
            body = dict(a[kind])
            if kind == "commitInfo":
                body["timestamp"] = 0
            elif kind == "metaData":
                body["id"] = "<uuid>"
                body["createdTime"] = 0
                body["schemaString"] = json.loads(body["schemaString"])
            elif kind == "add":
                body["path"] = tok(body["path"])
                body["size"] = "<bytes>"
                body["modificationTime"] = 0
                # stats are DETERMINISTIC for the scripted data — pin
                # values, not just shape (parsed like schemaString)
                body["stats"] = json.loads(body["stats"])
            elif kind == "remove":
                body["path"] = tok(body["path"])
                body["deletionTimestamp"] = 0
            commit.append({kind: body})
        out.append(commit)
    return out


def _field(name, type_, nullable=True):
    return {"name": name, "type": type_, "nullable": nullable, "metadata": {}}


_SCHEMA = {
    "type": "struct",
    "fields": [_field("id", "long"), _field("s", "string")],
}

_CI = {
    "engineInfo": "stadvdb-olap-spark delta_log writer",
    "timestamp": 0,
}

GOLDEN = [
    # v0: CREATE (overwrite into empty dir): commitInfo, protocol,
    # metaData, adds — protocol version 1/2 (plain parquet, no column
    # mapping / deletion vectors), exactly what old readers accept.
    [
        {"commitInfo": dict(_CI, operation="WRITE",
                            operationParameters={"mode": "OVERWRITE",
                                                 "partitionBy": "[]"})},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "<uuid>",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": _SCHEMA,
                      "partitionColumns": [],
                      "configuration": {},
                      "createdTime": 0}},
        {"add": {"path": "<file-0>", "partitionValues": {},
                 "size": "<bytes>", "modificationTime": 0,
                 "dataChange": True,
                 "stats": {"maxValues": {"id": 2, "s": "b"},
                   "minValues": {"id": 1, "s": "a"},
                   "nullCount": {"id": 0, "s": 0},
                   "numRecords": 2}}},
    ],
    # v1: APPEND with an idempotent-writer txn action
    [
        {"commitInfo": dict(_CI, operation="APPEND",
                            operationParameters={"mode": "APPEND",
                                                 "partitionBy": "[]"})},
        {"txn": {"appId": "golden_app", "version": 1}},
        {"add": {"path": "<file-1>", "partitionValues": {},
                 "size": "<bytes>", "modificationTime": 0,
                 "dataChange": True,
                 "stats": {"maxValues": {"id": 3, "s": "c"},
                   "minValues": {"id": 3, "s": "c"},
                   "nullCount": {"id": 0, "s": 0},
                   "numRecords": 1}}},
    ],
    # v2: copy-on-write DELETE — remove(hit file-0) + add(rewrite)
    [
        {"commitInfo": dict(_CI, operation="DELETE",
                            operationParameters={"predicate": "id = 1",
                                                 "rewrittenFiles": 1})},
        {"remove": {"path": "<file-0>", "partitionValues": {},
                    "deletionTimestamp": 0, "dataChange": True}},
        {"add": {"path": "<file-2>", "partitionValues": {},
                 "size": "<bytes>", "modificationTime": 0,
                 "dataChange": True,
                 "stats": {"maxValues": {"id": 2, "s": "b"},
                   "minValues": {"id": 2, "s": "b"},
                   "nullCount": {"id": 0, "s": 0},
                   "numRecords": 1}}},
    ],
    # v3: OPTIMIZE — dataChange=false on BOTH sides so streaming
    # consumers skip it
    [
        {"commitInfo": dict(_CI, operation="OPTIMIZE",
                            operationParameters={"targetFiles": 1,
                                                 "zOrderBy": "[]"})},
        {"remove": {"path": "<file-1>", "partitionValues": {},
                    "deletionTimestamp": 0, "dataChange": False}},
        {"remove": {"path": "<file-2>", "partitionValues": {},
                    "deletionTimestamp": 0, "dataChange": False}},
        {"add": {"path": "<file-3>", "partitionValues": {},
                 "size": "<bytes>", "modificationTime": 0,
                 "dataChange": True,
                 "stats": {"maxValues": {"id": 3, "s": "c"},
                   "minValues": {"id": 2, "s": "b"},
                   "nullCount": {"id": 0, "s": 0},
                   "numRecords": 2}}},
    ],
]


def test_delta_log_matches_protocol_golden(spark, tmp_path):
    t = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    write_delta(base.coalesce(1), t, mode="overwrite")
    write_delta(
        spark.createDataFrame([(3, "c")], "id long, s string").coalesce(1),
        t,
        mode="append",
        txn=("golden_app", 1),
    )
    delete_where(spark, t, "id = 1")
    compact_table(spark, t, target_files=1)
    got = _normalized_log(t)
    # compact writes dataChange=False adds; golden pins the protocol's
    # requirement that OPTIMIZE output files carry dataChange=false too
    golden = [list(c) for c in GOLDEN]
    golden[3][3]["add"] = dict(golden[3][3]["add"], dataChange=False)
    assert got == golden


def test_delta_checkpoint_matches_protocol_columns(spark, tmp_path):
    """The parquet checkpoint exposes the protocol's top-level action
    columns with the protocol's nested field names — what an external
    reader's checkpoint loader keys on."""
    import pyarrow.parquet as papq

    t = str(tmp_path / "tbl")
    write_delta(
        spark.createDataFrame([(1, "a")], "id long, s string"),
        t,
        mode="overwrite",
        txn=("golden_app", 1),
    )
    v = checkpoint_table(t)
    cp = os.path.join(t, "_delta_log", f"{v:020d}.checkpoint.parquet")
    assert os.path.isfile(cp)
    schema = papq.read_schema(cp)
    assert set(schema.names) == {"protocol", "metaData", "txn", "add"}
    meta_fields = {f.name for f in schema.field("metaData").type}
    assert {
        "id", "format", "schemaString", "partitionColumns",
        "configuration", "createdTime",
    } <= meta_fields
    add_fields = {f.name for f in schema.field("add").type}
    assert {
        "path", "partitionValues", "size", "modificationTime", "dataChange",
        "stats",
    } <= add_fields
    lc = json.load(open(os.path.join(t, "_delta_log", "_last_checkpoint")))
    assert lc["version"] == v and lc["size"] >= 3


def test_delta_partitioned_add_paths_are_hive_relative(spark, tmp_path):
    """Partitioned adds: path is table-relative with hive-style
    segments, partitionValues carries the raw string values (null for
    the hive default partition) — the layout external readers expect."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "x", 1.0), (2, None, 2.0)], "id long, grp string, v double"
    )
    write_delta(df, t, mode="overwrite", partition_by=["grp"])
    log0 = os.path.join(t, "_delta_log", f"{0:020d}.json")
    adds = [
        json.loads(line)["add"]
        for line in open(log0)
        if line.strip() and "add" in json.loads(line)
    ]
    by_val = {a["partitionValues"]["grp"]: a for a in adds}
    assert set(by_val) == {"x", None}
    assert by_val["x"]["path"].startswith("grp=x/")
    assert by_val[None]["path"].startswith("grp=__HIVE_DEFAULT_PARTITION__/")
    meta = next(
        json.loads(line)["metaData"]
        for line in open(log0)
        if line.strip() and "metaData" in json.loads(line)
    )
    assert meta["partitionColumns"] == ["grp"]
    # partition column is NOT in the data files (protocol requirement)
    import pyarrow.parquet as papq

    data_file = os.path.join(t, by_val["x"]["path"])
    assert "grp" not in papq.read_schema(data_file).names


def test_delta_golden_uses_plain_column_filter(spark, tmp_path):
    """delete_where accepts Column predicates too — parity with the
    string path used in the golden sequence."""
    t = str(tmp_path / "tbl")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"),
        t,
        mode="overwrite",
    )
    delete_where(spark, t, F.col("id") == 2)
    from stadvdb_olap_spark.sources.delta_log import read_delta

    assert [tuple(r) for r in read_delta(spark, t).collect()] == [(1, "a")]
