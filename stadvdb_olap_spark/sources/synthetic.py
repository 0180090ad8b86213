"""Deterministic synthetic event source — a pure-Python Spark 4
DataSource (`spark.dataSource.register`), batch + streaming.

Why an engine ships one: load generation and pipeline rehearsal at
arbitrary scale WITHOUT fixture files — a 1000-executor cluster can
materialize a 100 TB synthetic event stream straight from the source's
partitions, each executor generating its slice independently. The
reference hard-wires its input to a live MySQL URL
(``/root/reference/ETL/user_ETL.py:12-14``); this is the opposite
posture: a source you can point any test, bench, or soak run at.

Scale/shape notes:
- ``partitions()`` splits the keyspace into ``numPartitions`` disjoint
  id ranges — parallelism is declared to Spark, not discovered.
- ``read()`` yields **pyarrow RecordBatches** computed with vectorized
  numpy, not per-row Python tuples — the Arrow fast path of the Python
  DataSource API (per-row tuple yielding would serialize row-at-a-time).
- Generation is a pure function of (seed, row id): re-reads, different
  partition counts, and the batch/stream variants all agree row-for-row
  — the same determinism contract the rest of the engine keeps.
- The stream reader exposes the same rows as monotonically growing
  offsets (``rows_per_batch`` per micro-batch), so Structured Streaming
  jobs rehearse against a reproducible feed with real offset semantics
  (progress tracking, restart from checkpointed offset).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double"
)
_TYPES = ("view", "click", "purchase", "signup", "error")
_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z


@dataclass
class _Range(InputPartition):
    start: int
    end: int
    seed: int


def _gen_batch(start: int, end: int, seed: int):
    """One Arrow RecordBatch for ids [start, end) — vectorized numpy,
    deterministic in (seed, id)."""
    import numpy as np
    import pyarrow as pa

    ids = np.arange(start, end, dtype=np.int64)
    # splitmix64-style integer hash: a stateless uniform stream per id.
    h = (ids + np.int64(seed)).astype(np.uint64)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h = h ^ (h >> np.uint64(31))
    user = (h % np.uint64(10_000)).astype(np.int64)
    etype = (h >> np.uint64(16)) % np.uint64(len(_TYPES))
    value = ((h >> np.uint64(24)) % np.uint64(100_000)).astype(np.float64) / 100.0
    ts = _EPOCH_US + ids * 1_000_000  # one event per second per id
    return pa.RecordBatch.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array(ts, pa.timestamp("us")),
            pa.array(user, pa.int64()),
            pa.array([_TYPES[i] for i in etype.tolist()], pa.string()),
            pa.array(value, pa.float64()),
        ],
        names=["event_id", "ts", "user_id", "event_type", "value"],
    )


class _SyntheticBatchReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = -(-self.rows // self.num_partitions)
        return [
            _Range(start=i * per, end=min((i + 1) * per, self.rows), seed=self.seed)
            for i in range(self.num_partitions)
            if i * per < self.rows
        ]

    def read(self, partition: _Range):
        # Cap batch size so a huge partition streams in bounded memory.
        step = 64_000
        for s in range(partition.start, partition.end, step):
            yield _gen_batch(s, min(s + step, partition.end), partition.seed)


class _SyntheticStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.num_partitions = int(options.get("numPartitions", 4))
        self.seed = int(options.get("seed", 42))
        self._offset = 0

    def initialOffset(self):
        return {"row": 0}

    def latestOffset(self):
        self._offset += self.rows_per_batch
        return {"row": self._offset}

    def partitions(self, start, end):
        lo, hi = start["row"], end["row"]
        per = -(-(hi - lo) // self.num_partitions)
        return [
            _Range(start=lo + i * per, end=min(lo + (i + 1) * per, hi), seed=self.seed)
            for i in range(self.num_partitions)
            if lo + i * per < hi
        ]

    def read(self, partition: _Range):
        yield _gen_batch(partition.start, partition.end, partition.seed)

    def commit(self, end):
        pass


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` /
    ``spark.readStream.format("synthetic_events")``.

    Options: ``rows`` (batch total), ``rowsPerBatch`` (stream),
    ``numPartitions``, ``seed``.
    """

    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return _SCHEMA

    def reader(self, schema: StructType):
        return _SyntheticBatchReader(self.options)

    def streamReader(self, schema: StructType):
        return _SyntheticStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
