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
  then — if slots remain — staleness re-certification: already-signed
  queries oldest-signed-round first, so no green row ages more than a
  couple of rounds of refactors without a fresh driver signature.

Usage:  python tools/next_window.py [window_size]
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")

from stadvdb_olap_spark.plans import catalog  # noqa: E402


def _latest_results() -> tuple[dict[str, dict], dict[str, int]]:
    """(name -> result row, name -> round) from the HIGHEST round that
    included each query."""
    latest: dict[str, dict] = {}
    rounds: dict[str, int] = {}
    for path in sorted(
        glob.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    ):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        for name, row in json.load(open(path)).items():
            latest[name] = row
            rounds[name] = rnd
    return latest, rounds


def _passed(row: dict) -> bool:
    return bool(
        row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
    )


def _module_of(fn) -> str:
    return fn.__module__.rsplit(".", 1)[-1]


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    catalog._ensure_loaded()
    latest, rounds = _latest_results()

    retry: list[str] = []  # windowed before, latest row not green
    fresh_by_module: dict[str, list[str]] = {}  # never windowed
    stale: list[tuple[int, str]] = []  # signed: (round_signed, name)
    for spec in catalog.REGISTRY.values():
        if spec.oracle is None or spec.defer:
            continue
        row = latest.get(spec.name)
        if row is not None and _passed(row):
            stale.append((rounds[spec.name], spec.name))
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

    # Staleness fill: remaining slots go to signed queries whose latest
    # green row is oldest (ties broken alphabetically for determinism).
    recert = [n for _, n in sorted(stale)][: max(0, window - len(picked))]
    picked += recert

    print(
        f"\nROUND_NEXT_FRONT: tuple[str, ...] = (  # {len(picked)} queries"
        f" ({len(picked) - len(recert)} uncertified + {len(recert)} re-cert)"
    )
    for name in picked:
        mark = ""
        if name in recert:
            mark = f"  # re-cert (signed r{rounds[name]})"
        print(f'    "{name}",{mark}')
    print(")")
    leftover = sum(len(v) for v in queues.values()) + max(0, len(retry) - window)
    print(f"# left for the following round: {leftover}")


if __name__ == "__main__":
    main()
