"""Property-based soundness proof for the data-skipping evaluator
(sources/delta_stats.py).

The invariant data skipping lives or dies by: if ``file_might_match``
says False for a file, then NO row of that file satisfies the
predicate under SQL three-valued logic. Hypothesis generates random
row sets (ints, floats, strings, temporal strings, NULLs), derives the
file's stats exactly the way a parquet footer would (min/max over
non-null values, null count), generates random predicates from the
skipping grammar, and checks the skip decision against a ground-truth
Python evaluator of the same three-valued semantics. Any
counterexample is a silent-wrong-results bug, so this test is the
strongest guard on the trickiest round-12 code path (the temporal
boundary bug the round-12 review caught would have been found here)."""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from stadvdb_olap_spark.sources.delta_stats import (
    _expand_temporal,
    _TEMPORAL_RE,
    file_might_match,
)

# ---------------------------------------------------------------------------
# ground truth: three-valued SQL evaluation of the skipping AST per row
# ---------------------------------------------------------------------------


def _sql_cmp(op: str, a, b):
    """SQL comparison: None if either side is NULL or incomparable,
    else a bool. Temporal strings compare by expanded value (the
    semantics Spark/DuckDB give TIMESTAMP/DATE columns)."""
    if a is None or b is None:
        return None
    if isinstance(a, bool) != isinstance(b, bool):
        return None
    if isinstance(a, str) != isinstance(b, str):
        return None
    if isinstance(a, str) and isinstance(b, str):
        a_t, b_t = _TEMPORAL_RE.match(a), _TEMPORAL_RE.match(b)
        if a_t and b_t:
            a, b = _expand_temporal(a), _expand_temporal(b)
        elif a_t or b_t:
            # mixed temporal/plain never occurs in typed engines; treat
            # as unknown so the evaluator must keep the file
            return None
    return {
        "=": a == b,
        "!=": a != b,
        "<": a < b,
        "<=": a <= b,
        ">": a > b,
        ">=": a >= b,
    }[op]


def _truth(node, row: dict):
    """TRUE/FALSE/None (unknown) for one row."""
    kind = node[0]
    if kind == "and":
        l, r = _truth(node[1], row), _truth(node[2], row)
        if l is False or r is False:
            return False
        if l is None or r is None:
            return None
        return True
    if kind == "or":
        l, r = _truth(node[1], row), _truth(node[2], row)
        if l is True or r is True:
            return True
        if l is None or r is None:
            return None
        return False
    if kind == "not":
        v = _truth(node[1], row)
        return None if v is None else (not v)
    if kind == "isnull":
        return row.get(node[1]) is None
    if kind == "notnull":
        return row.get(node[1]) is not None
    if kind == "in":
        vals = [_sql_cmp("=", row.get(node[1]), v) for v in node[2]]
        if any(v is True for v in vals):
            return True
        if any(v is None for v in vals):
            return None
        return False
    _, op, col, v = node
    return _sql_cmp(op, row.get(col), v)


def _footer_stats(rows: list[dict], cols: list[str]) -> dict:
    """Stats exactly as collect_file_stats derives them from a footer:
    min/max over non-null values (per type), nullCount, numRecords.
    Mixed-type columns (never produced by a real engine) omit bounds."""
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    for c in cols:
        vals = [r.get(c) for r in rows]
        nn = [v for v in vals if v is not None]
        nulls[c] = len(vals) - len(nn)
        if nn and len({(type(v) is bool, isinstance(v, str)) for v in nn}) == 1:
            try:
                mins[c] = min(nn)
                maxs[c] = max(nn)
            except TypeError:
                pass
    return {
        "numRecords": len(rows),
        "minValues": mins,
        "maxValues": maxs,
        "nullCount": nulls,
    }


# ---------------------------------------------------------------------------
# strategies
# ---------------------------------------------------------------------------

_COLS = ["i", "f", "s", "t"]


def _temporal_str():
    return st.builds(
        lambda d, sec, frac, form: {
            "date": d.isoformat(),
            "sec": f"{d.isoformat()} 00:00:{sec:02d}",
            "frac": f"{d.isoformat()} 00:00:{sec:02d}.{frac}",
        }[form],
        st.dates(
            min_value=datetime.date(2024, 1, 1),
            max_value=datetime.date(2024, 1, 5),
        ),
        st.integers(0, 59),
        st.sampled_from(["5", "50", "500000", "000001"]),
        st.sampled_from(["date", "sec", "frac"]),
    )


_VALUE = {
    "i": st.integers(-5, 5),
    "f": st.floats(-2, 2, allow_nan=False, width=32).map(
        lambda x: round(x, 2)
    ),
    "s": st.text(alphabet="abc", min_size=0, max_size=3),
    "t": _temporal_str(),
}


def _row():
    return st.fixed_dictionaries(
        {c: st.one_of(st.none(), _VALUE[c]) for c in _COLS}
    )


def _literal(col):
    return _VALUE[col]


def _leaf():
    def build(col, kind, op, lit, lits, lo, hi):
        if kind == "cmp":
            return ("cmp", op, col, lit)
        if kind == "isnull":
            return ("isnull", col)
        if kind == "notnull":
            return ("notnull", col)
        if kind == "in":
            return ("in", col, lits)
        return ("and", ("cmp", ">=", col, lo), ("cmp", "<=", col, hi))

    col = st.sampled_from(_COLS)
    return col.flatmap(
        lambda c: st.builds(
            build,
            st.just(c),
            st.sampled_from(["cmp", "isnull", "notnull", "in", "between"]),
            st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
            _literal(c),
            st.lists(_literal(c), min_size=1, max_size=3),
            _literal(c),
            _literal(c),
        )
    )


def _pred(depth=2):
    if depth == 0:
        return _leaf()
    sub = _pred(depth - 1)
    return st.one_of(
        _leaf(),
        st.builds(lambda a, b: ("and", a, b), sub, sub),
        st.builds(lambda a, b: ("or", a, b), sub, sub),
        st.builds(lambda a: ("not", a), sub),
    )


# ---------------------------------------------------------------------------
# the property
# ---------------------------------------------------------------------------


@settings(max_examples=400, deadline=None)
@given(rows=st.lists(_row(), min_size=0, max_size=8), node=_pred())
def test_skip_decision_is_sound(rows, node):
    """might_match == False implies no row evaluates TRUE."""
    stats = _footer_stats(rows, _COLS)
    if not file_might_match(node, stats):
        matching = [r for r in rows if _truth(node, r) is True]
        assert matching == [], (
            f"UNSOUND SKIP: stats={stats} node={node} "
            f"matching rows={matching}"
        )


@settings(max_examples=200, deadline=None)
@given(rows=st.lists(_row(), min_size=1, max_size=8), node=_pred())
def test_skip_under_temporal_ok_false_is_still_sound(rows, node):
    """The non-UTC guard may only ADD conservatism, never skip more."""
    stats = _footer_stats(rows, _COLS)
    if not file_might_match(node, stats, temporal_ok=False):
        assert not file_might_match(node, stats)
        assert [r for r in rows if _truth(node, r) is True] == []
