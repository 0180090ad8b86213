"""Plan the next driver certification window.

The external driver hash-certifies the FIRST 50 exported catalog queries
per round, cumulatively across rounds. This tool diffs the catalog
against every CORRECTNESS_r*.json in the repo root and prints:

- how many oracle-backed queries still lack a PASSED certification row
  (a window appearance that failed or was rows-only does NOT count —
  "signed" means rows+schema+hash all green in the LATEST round that
  checked the query),
- a suggested next ``ROUNDx_FRONT`` tuple: latest-failed/lapsed queries
  FIRST (they must re-enter a window to flip their red row), then
  never-windowed ones family-balanced (one pass interleaving modules),
  ready to paste into ``plans/catalog.py``.

Usage:  python tools/next_window.py [window_size]
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")

from stadvdb_olap_spark.plans import catalog  # noqa: E402


def _latest_results() -> dict[str, dict]:
    """name -> result row from the HIGHEST round that included it."""
    latest: dict[str, dict] = {}
    for path in sorted(
        glob.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    ):
        for name, row in json.load(open(path)).items():
            latest[name] = row
    return latest


def _passed(row: dict) -> bool:
    return bool(
        row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
    )


def _module_of(fn) -> str:
    return fn.__module__.rsplit(".", 1)[-1]


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    catalog._ensure_loaded()
    latest = _latest_results()

    retry: list[str] = []  # windowed before, latest row not green
    fresh_by_module: dict[str, list[str]] = {}  # never windowed
    for spec in catalog.REGISTRY.values():
        if spec.oracle is None or spec.defer:
            continue
        row = latest.get(spec.name)
        if row is not None and _passed(row):
            continue
        if row is not None:
            retry.append(spec.name)
        else:
            fresh_by_module.setdefault(_module_of(spec.fn), []).append(spec.name)

    total = len(retry) + sum(len(v) for v in fresh_by_module.values())
    print(f"# oracle-backed queries without a green row: {total}")
    print(f"#   latest-fail/lapsed (re-certify first): {len(retry)}")
    for mod, names in sorted(fresh_by_module.items()):
        print(f"#   never-windowed {mod}: {len(names)}")

    picked = sorted(retry)[:window]
    # Family-balanced fill: round-robin across modules so every family
    # lands inside the window before any single module fills it.
    queues = {m: list(v) for m, v in sorted(fresh_by_module.items())}
    while len(picked) < window and any(queues.values()):
        for mod in list(queues):
            if queues[mod] and len(picked) < window:
                picked.append(queues[mod].pop(0))

    print(f"\nROUND_NEXT_FRONT: tuple[str, ...] = (  # {len(picked)} queries")
    for name in picked:
        print(f'    "{name}",')
    print(")")
    leftover = sum(len(v) for v in queues.values()) + max(0, len(retry) - window)
    print(f"# left for the following round: {leftover}")


if __name__ == "__main__":
    main()
