"""Plan the next driver certification window.

The external driver hash-certifies the FIRST 50 exported catalog queries
per round, cumulatively across rounds. This tool diffs the catalog
against every CORRECTNESS_r*.json in the repo root and prints:

- how many oracle-backed queries are still unsigned,
- a suggested next ``ROUNDx_FRONT`` tuple (family-balanced: one pass
  interleaving modules so every family with unsigned queries appears
  early), ready to paste into ``plans/catalog.py``.

Usage:  python tools/next_window.py [window_size]
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, "/root/repo")

from stadvdb_olap_spark.plans import catalog  # noqa: E402


def _signed() -> set[str]:
    names: set[str] = set()
    for path in glob.glob("CORRECTNESS_r*.json"):
        names |= set(json.load(open(path)))
    return names


def _module_of(fn) -> str:
    return fn.__module__.rsplit(".", 1)[-1]


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    catalog._ensure_loaded()
    signed = _signed()
    unsigned_by_module: dict[str, list[str]] = {}
    for spec in catalog.REGISTRY.values():
        if spec.oracle is None or spec.defer or spec.name in signed:
            continue
        unsigned_by_module.setdefault(_module_of(spec.fn), []).append(spec.name)

    total = sum(len(v) for v in unsigned_by_module.values())
    print(f"# unsigned oracle-backed queries: {total}")
    for mod, names in sorted(unsigned_by_module.items()):
        print(f"#   {mod}: {len(names)}")

    # Family-balanced pick: round-robin across modules so every family
    # lands inside the window before any single module fills it.
    queues = {m: list(v) for m, v in sorted(unsigned_by_module.items())}
    picked: list[str] = []
    while len(picked) < window and any(queues.values()):
        for mod in list(queues):
            if queues[mod] and len(picked) < window:
                picked.append(queues[mod].pop(0))

    print(f"\nROUND_NEXT_FRONT: tuple[str, ...] = (  # {len(picked)} queries")
    for name in picked:
        print(f'    "{name}",')
    print(")")


if __name__ == "__main__":
    main()
