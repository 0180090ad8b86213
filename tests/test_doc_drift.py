"""Docs-vs-registry drift gate.

Round-7 verdict found COVERAGE.md carrying a stale hand-written catalog
count (298/293 vs the actual 311/306). The fix: QUERIES.md is the single
generated source of counts (tools/gen_query_docs.py) and this test
asserts its header against the live registry, so a doc count can never
drift silently again. COVERAGE.md deliberately carries no number.
"""

from __future__ import annotations

import re
from pathlib import Path

from stadvdb_olap_spark.plans.catalog import REGISTRY, _ensure_loaded

ROOT = Path(__file__).resolve().parents[1]

_HEADER = re.compile(
    r"^(\d+) queries; (\d+) DuckDB-oracle-checked, (\d+) rows-only",
    re.M,
)


def test_queries_md_counts_match_registry() -> None:
    _ensure_loaded()
    total = len(REGISTRY)
    oracle = sum(1 for s in REGISTRY.values() if s.oracle is not None)
    rows_only = total - oracle

    text = (ROOT / "QUERIES.md").read_text()
    m = _HEADER.search(text)
    assert m, "QUERIES.md header line missing — regenerate via tools/gen_query_docs.py"
    assert (int(m[1]), int(m[2]), int(m[3])) == (total, oracle, rows_only), (
        f"QUERIES.md says {m[1]}/{m[2]}/{m[3]} but registry holds "
        f"{total}/{oracle}/{rows_only} — rerun "
        "`python tools/gen_query_docs.py > QUERIES.md`"
    )


def test_coverage_md_carries_no_catalog_count() -> None:
    # COVERAGE.md must not restate the catalog size (it drifted in r7);
    # any "N queries (M ..." claim there is a regression.
    text = (ROOT / "COVERAGE.md").read_text()
    assert not re.search(r"\*\*\d+ queries \(\d+", text), (
        "COVERAGE.md restates a catalog count — point at QUERIES.md instead"
    )
