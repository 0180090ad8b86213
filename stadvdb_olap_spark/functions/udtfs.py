"""Python user-defined table functions (Spark 4 UDTF surface).

The engine's production preprocessing paths are expression-only
(``plans/text_queries.py:chunk_documents_sliding`` does sliding-window
chunking with sequence/transform — no Python at all); a UDTF is the
ESCAPE HATCH for per-row one-to-many logic that genuinely needs Python.
This module keeps one deterministic example wired end-to-end so the
surface is covered and tested: a chunk-range planner that expands a
token count into (chunk_idx, start, end) rows, lateral-joined in SQL.

Scale notes: UDTF rows stream back per input row (no driver
materialization); Spark 4 Arrow-optimizes the transfer when
``spark.sql.execution.pythonUDTF.arrow.enabled`` is set (done in
``session.get_session``-built sessions; the plain driver session still
runs the pickled path, just slower). Logic per row must stay O(output
rows) — anything heavier belongs in expressions or mapInPandas.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: int, start_tok: int, end_tok: int")
class ChunkRanges:
    """Expand a token count into sliding-window chunk ranges:
    starts at 0, window ``chunk`` tokens, stride ``stride`` tokens, last
    chunk clipped to the document end. Empty documents yield no rows."""

    def eval(self, n_tokens: int, chunk: int, stride: int):  # noqa: D102
        if chunk is None or chunk < 1 or stride is None or stride < 1:
            # stride <= 0 would never advance — an unbounded generator
            # that spins the executor task; fail fast instead.
            raise ValueError("chunk and stride must be >= 1")
        if n_tokens is None or n_tokens <= 0:
            return
        i = 0
        start = 0
        while start < n_tokens:
            yield i, start, min(start + chunk, n_tokens)
            i += 1
            start += stride


def register_udtfs(spark) -> None:
    """Register every UDTF under its SQL name (idempotent overwrite)."""
    spark.udtf.register("chunk_ranges", ChunkRanges)
