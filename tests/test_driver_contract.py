"""Contract tests for the certification machinery itself: the window
export ordering and the driver-sim canon's hazard fidelity. These guard
the graders' interface — a regression here silently costs certification
rows even when every query is correct."""

from __future__ import annotations

import datetime as dt
import decimal

import pandas as pd
import pytest

from stadvdb_olap_spark.plans.catalog import (
    REGISTRY,
    ROUND_FRONT,
    all_oracles,
    all_queries,
)


def test_window_front_is_first_50_oracle_backed():
    """The driver certifies the FIRST 50 exported queries: they must be
    exactly the rotation front, every one oracle-backed, with deferred
    rows-only queries exporting last."""
    names = list(all_queries())
    assert names[:50] == list(ROUND_FRONT)
    oracles = all_oracles()
    assert all(n in oracles for n in names[:50])
    # negative-slice pitfall: names[-0:] is the WHOLE list, so guard
    # the now-reachable empty case (round 9 converted the last deferred
    # rows-only query to oracle-backed)
    deferred = [n for n in names if REGISTRY[n].defer]
    assert names[len(names) - len(deferred):] == deferred


def test_front_matches_generator():
    """The committed round_front.py must EQUAL tools/next_window.py's
    canonical computation over the front's pinned generation basis
    (artifacts from rounds strictly before TARGET_ROUND) — the round-9
    failure mode (a hand-tuned front whose re-cert slots were squeezed
    out by new queries) becomes uncommittable: adding a catalog query
    without rerunning `next_window.py --write` fails here. The basis
    pin keeps this green when TARGET_ROUND's own artifact lands at
    judging time; letting the front lag more than one landed round
    behind fails the TARGET_ROUND window check below, forcing
    regeneration within a round."""
    from stadvdb_olap_spark.plans.round_front import TARGET_ROUND
    from tools.next_window import artifact_rounds, compute_front

    seen = artifact_rounds()
    assert seen, "no CORRECTNESS artifacts found"
    assert seen[-1] <= TARGET_ROUND <= seen[-1] + 1, (
        f"front targets round {TARGET_ROUND} but artifacts reach "
        f"r{seen[-1]} — regenerate with `python tools/next_window.py --write`"
    )
    picked, _ = compute_front(50, TARGET_ROUND)
    assert list(ROUND_FRONT) == picked, (
        "round_front.py is stale — regenerate with "
        "`python tools/next_window.py --write`"
    )


def _canon():
    import tools.driver_sim as ds

    return ds


def test_sim_canon_reproduces_driver_hazards():
    """tools/driver_sim's canon must fail/crash on exactly the output
    shapes that failed round-3 certification: ARRAY cells crash
    sort_values, DECIMAL never equals float, HUGEINT-as-float64 never
    equals int64 — while int/double/string/date/timestamp/bool column
    pairs with equal values canonicalize identically."""
    ds = _canon()

    # An ARRAY column beside any other column crashes multi-key
    # sort_values (pandas factorize on unhashable lists) — the exact
    # shape of the three round-3 driver crashes (id + array columns).
    with pytest.raises(TypeError):
        ds.canon_frame(pd.DataFrame({"id": [1, 2], "a": [[1, 2], [3]]}))

    # dtype sensitivity: int64 vs float64 of equal values differ
    _, int_rows = ds.canon_frame(pd.DataFrame({"a": pd.array([5], "int64")}))
    _, flt_rows = ds.canon_frame(pd.DataFrame({"a": pd.array([5.0], "float64")}))
    assert int_rows != flt_rows

    # Decimal (Spark fetch) never matches the float the oracle side sees
    _, dec_rows = ds.canon_frame(pd.DataFrame({"a": [decimal.Decimal("1.500000")]}))
    _, f_rows = ds.canon_frame(pd.DataFrame({"a": [1.5]}))
    assert dec_rows != f_rows

    # DATE tolerance: Spark datetime.date vs DuckDB midnight Timestamp agree
    _, d_rows = ds.canon_frame(pd.DataFrame({"a": [dt.date(2024, 1, 2)]}))
    _, ts_rows = ds.canon_frame(
        pd.DataFrame({"a": pd.to_datetime(["2024-01-02"])})
    )
    assert d_rows == ts_rows

    # equal safe-typed frames canonicalize identically across row orders
    left = pd.DataFrame({"k": [2, 1], "v": [2.5, 1.5], "s": ["b", "a"]})
    right = pd.DataFrame({"s": ["a", "b"], "k": [1, 2], "v": [1.5, 2.5]})
    assert ds.canon_frame(left) == ds.canon_frame(right)

    # NULL/NaN normalize to one token
    _, n1 = ds.canon_frame(pd.DataFrame({"a": [None]}, dtype="object"))
    _, n2 = ds.canon_frame(pd.DataFrame({"a": [float("nan")]}))
    assert n1 == n2


def test_staleness_rotation_is_canonical():
    """Staleness guard: the front's re-certification slots must go to
    exactly the OLDEST-signed queries (next_window.py's canonical
    order), and nothing signed may drift >= 8 rounds stale outside the
    front. A hard small bound is impossible — 50 slots per round can't
    re-sign a 300+ query catalog faster than ~7 rounds — but the
    rotation CAN always pick the oldest first, and this pins that, so
    signature debt (56 queries were 5-6 rounds stale by round 8) can
    never re-accumulate past one full rotation cycle silently."""
    import glob
    import json
    import re

    from stadvdb_olap_spark.plans.round_front import TARGET_ROUND

    rounds_seen = sorted(
        int(re.search(r"r(\d+)", p).group(1))
        for p in glob.glob("CORRECTNESS_r*.json")
    )
    assert rounds_seen, "no CORRECTNESS artifacts found"
    # Evaluate against the front's pinned generation basis: artifacts
    # from rounds strictly before TARGET_ROUND. The front plans FOR
    # TARGET_ROUND, so once its own artifact lands (judging time) the
    # newly-signed rows must not count against the rotation that
    # produced them — that was the round-9 red-suite shape.
    current = TARGET_ROUND
    last_signed: dict[str, int] = {}
    for rnd in rounds_seen:
        if rnd >= TARGET_ROUND:
            continue
        for name, row in json.load(open(f"CORRECTNESS_r{rnd:02d}.json")).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                last_signed[name] = rnd

    # a signature that predates a declared semantics/schema change no
    # longer certifies the current code — such queries are LAPSED (they
    # re-enter as uncertified), not re-cert occupants
    from tools.next_window import CHANGED_IN_ROUND

    eligible = {
        n: r
        for n, r in last_signed.items()
        if n in REGISTRY
        and REGISTRY[n].oracle is not None
        and not REGISTRY[n].defer
        and r >= CHANGED_IN_ROUND.get(n, 0)
    }

    # hard backstop: one full rotation cycle is the worst allowed drift
    over_backstop = sorted(
        n
        for n, r in eligible.items()
        if current - r >= 8 and n not in ROUND_FRONT
    )
    assert not over_backstop, (
        f"{len(over_backstop)} signed queries are >=8 rounds stale and "
        f"outside the front: {over_backstop[:10]}"
    )

    # canonical rotation: the re-cert slots (front names already signed)
    # must be the first-K of the (signed round, name) staleness ordering
    recert_in_front = [n for n in ROUND_FRONT if n in eligible]
    canonical = [n for _, n in sorted((r, n) for n, r in eligible.items())]
    expect = canonical[: len(recert_in_front)]
    assert sorted(recert_in_front) == sorted(expect), (
        "front re-cert slots are not the oldest-signed queries — "
        f"regenerate with tools/next_window.py; got {sorted(recert_in_front)[:6]}..., "
        f"expected {sorted(expect)[:6]}..."
    )
