"""Measure the Delta-log maintenance wins instead of asserting them.

Three measurements on a throwaway table of N tiny commits (the shape a
per-micro-batch streaming sink accrues in hours):

1. **Checkpoint read speedup** — wall time of ``read_delta`` state
   reconstruction with parquet checkpoints vs a checkpoint-free log
   (O(interval) vs O(commits) commit-JSON replays).
2. **Log cleanup** — ``_delta_log`` file count before/after
   ``cleanup_log`` (bounded metadata).
3. **Partition pruning** — files scanned with vs without a partition
   predicate on a hive-partitioned table (log-only skip).

Prints ONE JSON line. Usage: python tools/delta_probe.py [n_commits]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _synthetic_log(table_dir: str, n_commits: int) -> None:
    """A streaming-sink-shaped log (one add per commit) written
    directly as commit JSONs — state reconstruction reads exactly this,
    so replay timing needs no Spark jobs or data files."""
    from stadvdb_olap_spark.sources.delta_log import _commit_path, _log_dir

    os.makedirs(_log_dir(table_dir), exist_ok=True)
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}}
            ],
        }
    )
    for v in range(n_commits):
        actions = [
            {"commitInfo": {"timestamp": v, "operation": "APPEND",
                            "operationParameters": {}, "engineInfo": "probe"}}
        ]
        if v == 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            actions.append(
                {"metaData": {"id": "probe", "format": {"provider": "parquet",
                 "options": {}}, "schemaString": schema,
                 "partitionColumns": [], "configuration": {},
                 "createdTime": 0}}
            )
        actions.append(
            {"add": {"path": f"part-{v:05d}-probe.snappy.parquet",
                     "partitionValues": {}, "size": 1000,
                     "modificationTime": v, "dataChange": True}}
        )
        with open(_commit_path(table_dir, v), "x") as f:
            for a in actions:
                f.write(json.dumps(a, sort_keys=True) + "\n")


def main() -> None:
    # default 10_000 commits (a few days of 30 s micro-batches). NOTE
    # what the replay numbers mean: on LOCAL cache-hot fs a commit JSON
    # read costs ~20 us, so the checkpoint only wins once the tail is
    # thousands of commits; on object storage every commit is a ~20-50
    # ms GET, so the same ratio applies at ~100x lower commit counts.
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000

    from pyspark.sql import functions as F

    from stadvdb_olap_spark.session import get_session
    from stadvdb_olap_spark.sources.delta_log import (
        _replay,
        checkpoint_table,
        cleanup_log,
        live_files,
        write_delta,
    )

    spark = get_session(app_name="delta-probe")
    root = tempfile.mkdtemp(prefix="stadvdb_delta_probe_")
    out: dict = {"n_commits": n_commits}
    try:
        # --- 1: state reconstruction, checkpointed vs not ------------------
        # SAME log, timed before and after a checkpoint lands: O(commits)
        # JSON replay vs checkpoint + tail. (read_delta timing would be
        # dominated by Spark DataFrame construction, not reconstruction.)
        t_log = os.path.join(root, "synthetic")
        _synthetic_log(t_log, n_commits)

        def time_replay(reps: int = 5) -> float:
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                _replay(t_log)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return best

        plain_s = time_replay()
        checkpoint_table(t_log)
        ckpt_s = time_replay()
        out["replay_plain_s"] = round(plain_s, 4)
        out["replay_checkpointed_s"] = round(ckpt_s, 4)
        out["replay_speedup"] = round(plain_s / ckpt_s, 1) if ckpt_s else None
        # The metric that transfers to production: I/O ROUND TRIPS per
        # open. Local cache-hot JSON reads cost ~40 us so wall time is
        # O(live files) Python-dict building either way; on object
        # storage every commit is a separate ~20-50 ms GET and the
        # checkpoint collapses them to one GET + the tail.
        from stadvdb_olap_spark.sources.delta_log import (
            checkpoint_versions,
        )

        cp = checkpoint_versions(t_log)[-1]
        out["io_calls_plain"] = n_commits
        out["io_calls_checkpointed"] = 1 + (n_commits - 1 - cp)

        # --- 2: log cleanup bound -----------------------------------------
        log_dir = os.path.join(t_log, "_delta_log")
        before = len(os.listdir(log_dir))
        # keep_versions=1: the floor is the fresh checkpoint at HEAD, so
        # everything below it is reclaimable — the steady state a
        # checkpoint-every-N streaming sink maintains
        cleanup_log(t_log, keep_versions=1)
        after = len(os.listdir(log_dir))
        out["log_files_before_cleanup"] = before
        out["log_files_after_cleanup"] = after

        # --- 3: partition pruning -----------------------------------------
        t_part = os.path.join(root, "part")
        df = spark.range(100_000).select(
            F.col("id"),
            (F.col("id") % 16).cast("string").alias("grp"),
            (F.col("id") * 2).alias("v"),
        )
        write_delta(
            df.repartition(32), t_part, mode="overwrite", partition_by=["grp"]
        )
        total = len(live_files(t_part))
        pruned = len(
            live_files(t_part, partition_predicate="grp = '3'", spark=spark)
        )
        out["part_files_total"] = total
        out["part_files_scanned_selective"] = pruned
        out["part_skip_ratio"] = round(1 - pruned / total, 3) if total else None

        # --- 4: stats-based data skipping (round 12) ----------------------
        # a z-ordered table's payoff, consumed from the LOG ALONE: a
        # selective range predicate prunes the file list from per-add
        # stats with zero parquet I/O, then the (identical-result) scan
        # touches only the kept files
        from stadvdb_olap_spark.sources.delta_log import (
            compact_table,
            read_delta,
        )

        t_skip = os.path.join(root, "skip")
        df = spark.range(200_000).select(
            F.col("id"), (F.col("id") % 97).alias("v")
        )
        write_delta(df.repartition(8), t_skip, mode="overwrite")
        compact_table(spark, t_skip, target_files=64, zorder_by=["id"])
        skip_pred = "id >= 100000 AND id < 103000"
        t0 = time.perf_counter()
        kept = live_files(t_skip, data_predicate=skip_pred)
        prune_s = time.perf_counter() - t0
        out["skip_files_total"] = len(live_files(t_skip))
        out["skip_files_scanned"] = len(kept)
        out["skip_prune_wall_s"] = round(prune_s, 4)

        def time_agg(**kw) -> float:
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                read_delta(spark, t_skip, **kw).where(skip_pred).agg(
                    F.count(F.lit(1))
                ).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return best

        out["skip_scan_full_s"] = round(time_agg(), 3)
        out["skip_scan_pruned_s"] = round(
            time_agg(data_predicate=skip_pred), 3
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
