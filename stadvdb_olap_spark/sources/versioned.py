"""Versioned parquet snapshots: minimal time travel for the warehouse.

The reference overwrites its warehouse tables in place on every ETL run
(``/root/reference/app.py:13-21`` rebuilds dims+fact per run) — a reader
mid-query can observe a half-written table, and yesterday's state is
gone. Real deployments put Delta/Iceberg under the engine for this; the
same two guarantees are reproduced here with nothing but parquet +
an atomically-swapped manifest:

- **Snapshot isolation**: each write lands in a fresh ``v{N}/``
  directory; the JSON manifest (single file, staged + ``os.replace``
  which is atomic on POSIX) is the only commit point. Readers resolve
  the manifest once at DataFrame construction, so an in-flight or
  failed write is invisible and a reader holding version N is
  untouched by later commits.
- **Time travel**: ``read_snapshot(..., version=k)`` reads any
  retained version; ``diff_snapshots`` reconciles two versions with
  the keyed table-diff operator (the audit trail for "what did the
  ETL change").

Retention is bounded (``retain``): superseded version directories are
deleted with a ONE-COMMIT GRACE WINDOW — commit N only removes
directories that already left the manifest at commit N-1, so a reader
that resolved any then-retained version keeps its files until a further
commit lands. That is the compaction knob keeping the 100 TB footprint
linear in ``retain``, not in run count.

Concurrency contract (documented, not enforced): **single writer**.
Two concurrent ``write_snapshot`` calls both read the manifest and the
second ``os.replace`` silently discards the first commit (lost update);
serialize writers externally (one ETL driver, or a lock around the
call). Readers are lock-free: a reader holding version N survives the
NEXT commit unconditionally (grace window); a reader that outlives TWO
subsequent commits of the same table may lose its files — size
``retain`` and the commit cadence so query lifetime < 2 commits, as
Delta/Iceberg deployments do with their retention clocks.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_manifest.json"


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, _MANIFEST)


def _load_manifest(table_dir: str) -> dict:
    p = _manifest_path(table_dir)
    if not os.path.exists(p):
        return {"versions": []}
    with open(p) as f:
        return json.load(f)


def _commit_manifest(table_dir: str, manifest: dict) -> None:
    # Single-file staged write + os.replace: the atomic commit point.
    # fsync BEFORE the replace (and the directory after): without it a
    # power loss can persist the rename ahead of the data blocks and
    # leave a zero-length manifest — a bricked table, the exact failure
    # the staged write exists to prevent.
    tmp = _manifest_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _manifest_path(table_dir))
    dfd = os.open(table_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def list_versions(table_dir: str) -> list[int]:
    return [v["version"] for v in _load_manifest(table_dir)["versions"]]


def write_snapshot(df: DataFrame, table_dir: str, retain: int = 3) -> int:
    """Write ``df`` as the next table version and commit it atomically.
    Returns the new version id. Single-writer (see module docstring).

    Versions beyond ``retain`` leave the manifest now but their files
    are only deleted by the NEXT commit (``pending_prune`` grace
    window): a reader that resolved a retained version is never
    rmtree'd by the commit that supersedes it. A crash between commit
    and prune only leaves extra data, never a broken table."""
    if retain < 1:
        raise ValueError("retain must be >= 1")
    os.makedirs(table_dir, exist_ok=True)
    manifest = _load_manifest(table_dir)
    versions = manifest["versions"]
    next_v = (versions[-1]["version"] + 1) if versions else 1
    vdir = f"v{next_v}"
    df.write.mode("overwrite").parquet(os.path.join(table_dir, vdir))

    versions.append({"version": next_v, "dir": vdir})
    pruned, kept = versions[:-retain], versions[-retain:]
    prune_now = list(manifest.get("pending_prune", []))
    manifest["versions"] = kept
    manifest["pending_prune"] = [v["dir"] for v in pruned]
    _commit_manifest(table_dir, manifest)
    for d in prune_now:
        shutil.rmtree(os.path.join(table_dir, d), ignore_errors=True)
    return next_v


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Latest (default) or a specific retained version. The version→path
    resolution happens NOW, so the returned DataFrame keeps reading its
    snapshot even if later commits land mid-query."""
    manifest = _load_manifest(table_dir)
    versions = manifest["versions"]
    if not versions:
        raise FileNotFoundError(f"no committed versions in {table_dir}")
    if version is None:
        entry = versions[-1]
    else:
        match = [v for v in versions if v["version"] == version]
        if not match:
            raise ValueError(
                f"version {version} not retained; have {list_versions(table_dir)}"
            )
        entry = match[0]
    return spark.read.parquet(os.path.join(table_dir, entry["dir"]))


def diff_snapshots(
    spark: SparkSession,
    table_dir: str,
    v_old: int,
    v_new: int,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed diff (added / removed / changed rows) between two retained
    versions — the ETL audit trail, reusing the reconcile operator.
    ``compare_cols`` defaults to every shared non-key column."""
    from stadvdb_olap_spark.operators.reconcile import table_diff

    old = read_snapshot(spark, table_dir, v_old)
    new = read_snapshot(spark, table_dir, v_new)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    return table_diff(old, new, keys, compare_cols)
