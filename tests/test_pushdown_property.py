"""Property-based tests (hypothesis) for the pushdown layer — the §5.2
"random filter trees" item: translation and pruning must be SOUND under any
generated filter/value combination.

Invariants:
1. Partition pruning never drops a file whose partition values satisfy the
   filters (pruning is an optimization, not a correctness filter).
2. Stats pruning never drops a file that contains at least one matching row.
3. The JSON hint tree is implied by the original filters: any row that
   passes all filters passes the hint (hints may be weaker — untranslatable
   filters are skipped — but never stronger).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.datasource import (
    EqualNullSafe,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
)

from duck_delta_share_spark.sources.pushdown import (
    filters_to_json_hints,
    partition_matches,
    stats_allow,
)

COLS = ("a", "b")

_ints = st.integers(min_value=-50, max_value=50)
_col = st.sampled_from(COLS)


@st.composite
def leaf_filters(draw):
    col = draw(_col)
    kind = draw(
        st.sampled_from(["eq", "eqns", "lt", "le", "gt", "ge", "in", "null", "notnull"])
    )
    attr = (col,)
    if kind == "eq":
        return EqualTo(attr, draw(_ints))
    if kind == "eqns":
        # null-safe equality may legitimately carry None (`col <=> NULL`)
        return EqualNullSafe(attr, draw(st.one_of(st.none(), _ints)))
    if kind == "lt":
        return LessThan(attr, draw(_ints))
    if kind == "le":
        return LessThanOrEqual(attr, draw(_ints))
    if kind == "gt":
        return GreaterThan(attr, draw(_ints))
    if kind == "ge":
        return GreaterThanOrEqual(attr, draw(_ints))
    if kind == "in":
        # IN lists can contain NULL elements (which match no row)
        return In(
            attr,
            tuple(draw(st.lists(st.one_of(st.none(), _ints), min_size=1, max_size=4))),
        )
    if kind == "null":
        return IsNull(attr)
    return IsNotNull(attr)


@st.composite
def filter_lists(draw):
    leaves = draw(st.lists(leaf_filters(), min_size=1, max_size=4))
    # sprinkle Not around negatable leaves (the grammar the planner emits)
    out = []
    for f in leaves:
        if draw(st.booleans()) and isinstance(f, (EqualTo, In, IsNull, IsNotNull)):
            out.append(Not(f))
        else:
            out.append(f)
    return out


def _eval_filter(f, row: dict) -> bool:
    """Reference evaluator: SQL comparison semantics on a concrete row
    (None fails every comparison; IsNull/IsNotNull see it)."""
    if isinstance(f, Not):
        return not _eval_filter(f.child, row)
    v = row.get(f.attribute[0])
    if isinstance(f, IsNull):
        return v is None
    if isinstance(f, IsNotNull):
        return v is not None
    if isinstance(f, EqualNullSafe):
        return v is None if f.value is None else v == f.value
    if v is None or getattr(f, "value", 0) is None:
        return False  # SQL: any comparison against NULL is not-true
    if isinstance(f, EqualTo):
        return v == f.value
    if isinstance(f, LessThan):
        return v < f.value
    if isinstance(f, LessThanOrEqual):
        return v <= f.value
    if isinstance(f, GreaterThan):
        return v > f.value
    if isinstance(f, GreaterThanOrEqual):
        return v >= f.value
    if isinstance(f, In):
        return v in f.value
    raise AssertionError(f"unhandled {f}")


@given(
    filters=filter_lists(),
    pv=st.fixed_dictionaries({c: st.one_of(st.none(), _ints) for c in COLS}),
)
@settings(max_examples=300, deadline=None)
def test_partition_pruning_sound(filters, pv):
    # partition values arrive as strings over the wire (or None)
    wire = {c: (None if v is None else str(v)) for c, v in pv.items()}
    row_matches = all(_eval_filter(f, pv) for f in filters)
    if row_matches:
        assert partition_matches(filters, wire), (
            f"pruned a matching file: filters={filters} pv={pv}"
        )


@given(
    filters=st.lists(leaf_filters(), min_size=1, max_size=3),
    rows=st.lists(
        st.fixed_dictionaries({c: _ints for c in COLS}), min_size=1, max_size=8
    ),
)
@settings(max_examples=300, deadline=None)
def test_stats_pruning_sound(filters, rows):
    stats = {
        "minValues": {c: min(r[c] for r in rows) for c in COLS},
        "maxValues": {c: max(r[c] for r in rows) for c in COLS},
    }
    any_match = any(all(_eval_filter(f, r) for f in filters) for r in rows)
    if any_match:
        assert stats_allow(filters, stats), (
            f"stats-pruned a file with matches: filters={filters} stats={stats}"
        )


def _eval_hint(node: dict, row: dict):
    """Interpreter for the Delta Sharing jsonPredicateHints grammar."""
    op = node["op"]
    if op == "and":
        return all(_eval_hint(c, row) for c in node["children"])
    if op == "or":
        return any(_eval_hint(c, row) for c in node["children"])
    if op == "not":
        return not _eval_hint(node["children"][0], row)
    if op == "isNull":
        col = node["children"][0]
        return row.get(col["name"]) is None
    # binary comparison: children = [column, literal]
    col, lit = node["children"]
    v = row.get(col["name"])
    if v is None:
        return False
    litv = int(lit["value"]) if lit["valueType"] in ("int", "long") else lit["value"]
    return {
        "equal": v == litv,
        "lessThan": v < litv,
        "lessThanOrEqual": v <= litv,
        "greaterThan": v > litv,
        "greaterThanOrEqual": v >= litv,
    }[op]


@given(
    filters=st.lists(leaf_filters(), min_size=1, max_size=4),
    row=st.fixed_dictionaries({c: st.one_of(st.none(), _ints) for c in COLS}),
)
@settings(max_examples=300, deadline=None)
def test_hint_tree_implied_by_filters(filters, row):
    hints = filters_to_json_hints(filters)
    if hints is None:
        return
    if all(_eval_filter(f, row) for f in filters):
        assert _eval_hint(hints, row), f"hint rejected a matching row: {filters} {row}"


@given(
    f=leaf_filters(),
    row=st.fixed_dictionaries({c: _ints for c in COLS}),
)
@settings(max_examples=300, deadline=None)
def test_single_hint_exact_on_nonnull_rows(f, row):
    """On non-null rows each translated hint is EQUIVALENT to its filter
    (weakening only comes from skipping untranslatable filters)."""
    hints = filters_to_json_hints([f])
    if hints is None:
        return
    assert _eval_hint(hints, row) == _eval_filter(f, row)


def _duck_sql_value(v):
    return "CAST(NULL AS BIGINT)" if v is None else str(v)


@given(
    filters=st.lists(leaf_filters(), min_size=1, max_size=4),
    row=st.fixed_dictionaries({c: st.one_of(st.none(), _ints) for c in COLS}),
)
@settings(max_examples=200, deadline=None)
def test_sql_hints_implied_by_filters(filters, row):
    """Legacy SQL predicateHints must be IMPLIED BY the filters: whenever
    the row satisfies every filter, the AND of the rendered SQL strings —
    evaluated by DuckDB, a real SQL engine — must not be FALSE (NULL is
    fine: servers only drop files on definite FALSE)."""
    import duckdb

    from duck_delta_share_spark.sources.pushdown import filters_to_sql_hints

    sqls = filters_to_sql_hints(filters)
    if not sqls:
        return
    if not all(_eval_filter(f, row) for f in filters):
        return
    expr = " AND ".join(f"({s})" for s in sqls)
    sel = ", ".join(f"{_duck_sql_value(row[c])} AS {c}" for c in COLS)
    got = duckdb.sql(f"SELECT ({expr}) FROM (SELECT {sel})").fetchone()[0]
    assert got is not False, f"hint {expr!r} excludes matching row {row}"


def test_sql_hint_rendering():
    import datetime as dt

    from duck_delta_share_spark.sources.pushdown import filter_to_sql

    assert filter_to_sql(EqualTo(("a",), 5)) == "a = 5"
    assert filter_to_sql(GreaterThan(("ship_date",), dt.date(2021, 3, 2))) == (
        "ship_date > DATE '2021-03-02'"
    )
    assert filter_to_sql(EqualTo(("s",), "o'brien")) == "s = 'o''brien'"
    assert filter_to_sql(In(("p",), ("eu", "us"))) == "p IN ('eu', 'us')"
    assert filter_to_sql(In(("p",), (None, "eu"))) == "p IN ('eu')"
    assert filter_to_sql(In(("p",), (None,))) is None
    assert filter_to_sql(IsNull(("x",))) == "x IS NULL"
    assert filter_to_sql(Not(IsNull(("x",)))) == "x IS NOT NULL"
    assert filter_to_sql(EqualNullSafe(("x",), None)) == "x IS NULL"
    assert filter_to_sql(EqualTo(("x",), None)) is None
    assert filter_to_sql(LessThan(("x",), None)) is None
    # non-identifier column names get quoted
    assert filter_to_sql(EqualTo(("weird col",), 1)) == '"weird col" = 1'


def test_null_safe_equal_null_emits_is_null_hint():
    """Regression (ADVICE r1): `col <=> NULL` must become an isNull hint,
    never {op: equal, literal: 'None'} — a 'None'-string hint can make the
    server exclude exactly the files holding the matching NULL rows."""
    from duck_delta_share_spark.sources.pushdown import filter_to_hint

    h = filter_to_hint(EqualNullSafe(("a",), None))
    assert h == {
        "op": "isNull",
        "children": [{"op": "column", "name": "a", "valueType": "string"}],
    }
    assert filter_to_hint(EqualTo(("a",), None)) is None
    assert filter_to_hint(LessThan(("a",), None)) is None
    h = filter_to_hint(In(("a",), (None, 3)))
    assert "None" not in str(h) and "3" in str(h)
    assert filter_to_hint(In(("a",), (None,))) is None


# ---------------------------------------------------------------------------
# Temporal literals through BOTH hint grammars (VERDICT r4 #7) — the
# reference's double-mistyped-as-int bug class (extension.cpp:271-295)
# applied to DATE/TIMESTAMP: the hint must carry the correct valueType and
# a value string a real SQL engine parses back to the same instant.
# ---------------------------------------------------------------------------

import datetime as _dt

_dates = st.dates(min_value=_dt.date(1992, 1, 1), max_value=_dt.date(2035, 12, 31))
_tss = st.datetimes(
    min_value=_dt.datetime(1992, 1, 1), max_value=_dt.datetime(2035, 12, 31)
)
_TCOLS = {"d": _dates, "t": _tss}


@st.composite
def temporal_leaf_filters(draw):
    col = draw(st.sampled_from(sorted(_TCOLS)))
    vals = _TCOLS[col]
    kind = draw(st.sampled_from(["eq", "lt", "le", "gt", "ge", "in"]))
    attr = (col,)
    if kind == "eq":
        return EqualTo(attr, draw(vals))
    if kind == "lt":
        return LessThan(attr, draw(vals))
    if kind == "le":
        return LessThanOrEqual(attr, draw(vals))
    if kind == "gt":
        return GreaterThan(attr, draw(vals))
    if kind == "ge":
        return GreaterThanOrEqual(attr, draw(vals))
    return In(attr, tuple(draw(st.lists(vals, min_size=1, max_size=3))))


def _parse_hint_literal(lit: dict):
    vt, v = lit["valueType"], lit["value"]
    if vt == "date":
        return _dt.date.fromisoformat(v)
    if vt == "timestamp":
        return _dt.datetime.fromisoformat(v)
    if vt in ("int", "long"):
        return int(v)
    raise AssertionError(f"unexpected valueType {vt} for temporal test")


def _eval_hint_typed(node: dict, row: dict):
    op = node["op"]
    if op == "and":
        return all(_eval_hint_typed(c, row) for c in node["children"])
    if op == "or":
        return any(_eval_hint_typed(c, row) for c in node["children"])
    if op == "not":
        return not _eval_hint_typed(node["children"][0], row)
    if op == "isNull":
        return row.get(node["children"][0]["name"]) is None
    col, lit = node["children"]
    v = row.get(col["name"])
    if v is None:
        return False
    litv = _parse_hint_literal(lit)
    return {
        "equal": v == litv,
        "lessThan": v < litv,
        "lessThanOrEqual": v <= litv,
        "greaterThan": v > litv,
        "greaterThanOrEqual": v >= litv,
    }[op]


@given(
    f=temporal_leaf_filters(),
    row=st.fixed_dictionaries({c: vals for c, vals in _TCOLS.items()}),
)
@settings(max_examples=300, deadline=None)
def test_temporal_json_hint_typed_and_exact(f, row):
    """A temporal hint must (a) declare valueType date/timestamp — never
    int/string — on BOTH the column and literal nodes, and (b) evaluate
    exactly like the filter once the value string is parsed back by type."""
    from duck_delta_share_spark.sources.pushdown import filter_to_hint

    h = filter_to_hint(f)
    assert h is not None
    want_vt = "date" if f.attribute[0] == "d" else "timestamp"

    def walk(node):
        if node["op"] in ("and", "or", "not"):
            for c in node["children"]:
                walk(c)
            return
        for c in node["children"]:
            assert c["valueType"] == want_vt, f"mistyped hint node {c}"

    walk(h)
    assert _eval_hint_typed(h, row) == _eval_filter(f, row)


def _duck_temporal_literal(v):
    if isinstance(v, _dt.datetime):
        return "TIMESTAMP '" + v.isoformat(sep=" ") + "'"
    return "DATE '" + v.isoformat() + "'"


@given(
    filters=st.lists(temporal_leaf_filters(), min_size=1, max_size=3),
    row=st.fixed_dictionaries({c: vals for c, vals in _TCOLS.items()}),
)
@settings(max_examples=150, deadline=None)
def test_temporal_sql_hints_exact_under_duckdb(filters, row):
    """Legacy SQL predicateHints with DATE/TIMESTAMP literals, evaluated by
    DuckDB on a one-row relation: each rendered hint must agree exactly
    with the reference evaluator (temporal leaves are always translatable,
    so no weakening is in play)."""
    import duckdb

    from duck_delta_share_spark.sources.pushdown import filter_to_sql

    sel = ", ".join(f"{_duck_temporal_literal(row[c])} AS {c}" for c in sorted(_TCOLS))
    for f in filters:
        s = filter_to_sql(f)
        assert s is not None
        got = duckdb.sql(f"SELECT ({s}) FROM (SELECT {sel})").fetchone()[0]
        assert bool(got) == _eval_filter(f, row), f"{s!r} vs row {row}"


def test_temporal_json_hint_value_format():
    """Spec formats: date hints carry YYYY-MM-DD; timestamp hints carry an
    ISO-8601 'T'-separated string (both fromisoformat-parsable)."""
    from duck_delta_share_spark.sources.pushdown import filter_to_hint

    h = filter_to_hint(EqualTo(("d",), _dt.date(2021, 3, 2)))
    assert h["children"][1] == {
        "op": "literal",
        "value": "2021-03-02",
        "valueType": "date",
    }
    h = filter_to_hint(GreaterThan(("t",), _dt.datetime(2021, 3, 2, 4, 5, 6)))
    lit = h["children"][1]
    assert lit["valueType"] == "timestamp"
    assert _dt.datetime.fromisoformat(lit["value"]) == _dt.datetime(2021, 3, 2, 4, 5, 6)
    assert "T" in lit["value"]


# ---------------------------------------------------------------------------
# 3VL (Kleene) soundness: a stats-pruning server evaluates hints under SQL
# three-valued logic, where a NULL operand makes a comparison UNKNOWN and
# not(UNKNOWN) stays UNKNOWN — "unknown for a matching row" means the server
# may legally prune the file holding that row. The 2VL test above cannot see
# this class: the Not(EqualNullSafe) unsoundness (fixed in r5) evaluated
# not(False) = True under 2VL while being UNKNOWN under 3VL.
# ---------------------------------------------------------------------------


def _eval_hint3(node: dict, row: dict):
    """Kleene interpreter: returns True / False / None (unknown)."""
    op = node["op"]
    if op == "and":
        vals = [_eval_hint3(c, row) for c in node["children"]]
        if any(v is False for v in vals):
            return False
        return None if any(v is None for v in vals) else True
    if op == "or":
        vals = [_eval_hint3(c, row) for c in node["children"]]
        if any(v is True for v in vals):
            return True
        return None if any(v is None for v in vals) else False
    if op == "not":
        v = _eval_hint3(node["children"][0], row)
        return None if v is None else (not v)
    if op == "isNull":
        return row.get(node["children"][0]["name"]) is None
    col, lit = node["children"]
    v = row.get(col["name"])
    if v is None:
        return None  # UNKNOWN, not False — the whole point of 3VL
    litv = int(lit["value"]) if lit["valueType"] in ("int", "long") else lit["value"]
    return {
        "equal": v == litv,
        "lessThan": v < litv,
        "lessThanOrEqual": v <= litv,
        "greaterThan": v > litv,
        "greaterThanOrEqual": v >= litv,
    }[op]


@st.composite
def negated_filter_lists(draw):
    """Like filter_lists but Not may wrap ANY negatable leaf, including
    EqualNullSafe — the exact shape whose naive translation is unsound."""
    leaves = draw(st.lists(leaf_filters(), min_size=1, max_size=4))
    out = []
    for f in leaves:
        if draw(st.booleans()) and isinstance(
            f, (EqualTo, EqualNullSafe, In, IsNull, IsNotNull)
        ):
            out.append(Not(f))
        else:
            out.append(f)
    return out


def _eval_filter3(f, row: dict):
    """SQL (Kleene) reference semantics for the pushed Filters themselves:
    True / False / None. A row MATCHES a filter only when this is True —
    the plain `_eval_filter` above collapses Not(UNKNOWN) to True, which
    over-claims which rows match (SQL NOT(a=0) is UNKNOWN for NULL a)."""
    if isinstance(f, Not):
        v = _eval_filter3(f.child, row)
        return None if v is None else (not v)
    v = row.get(f.attribute[0])
    if isinstance(f, IsNull):
        return v is None
    if isinstance(f, IsNotNull):
        return v is not None
    if isinstance(f, EqualNullSafe):  # <=> is 2VL by definition
        return v is None if f.value is None else (v is not None and v == f.value)
    if isinstance(f, In):
        if v is None:
            return None
        if v in [x for x in f.value if x is not None]:
            return True
        return None if any(x is None for x in f.value) else False
    if v is None or getattr(f, "value", 0) is None:
        return None
    if isinstance(f, EqualTo):
        return v == f.value
    if isinstance(f, LessThan):
        return v < f.value
    if isinstance(f, LessThanOrEqual):
        return v <= f.value
    if isinstance(f, GreaterThan):
        return v > f.value
    if isinstance(f, GreaterThanOrEqual):
        return v >= f.value
    raise AssertionError(f"unhandled {f}")


@given(
    filters=negated_filter_lists(),
    row=st.fixed_dictionaries({c: st.one_of(st.none(), _ints) for c in COLS}),
)
@settings(max_examples=400, deadline=None)
def test_hint_tree_3vl_sound(filters, row):
    """For every row matching all filters (definitely TRUE under SQL
    semantics), the emitted hint tree must also be DEFINITELY TRUE under
    Kleene logic — UNKNOWN lets a stats-pruning server drop the file that
    holds the matching row. This is the class the r5 Not(EqualNullSafe)
    fix closed; the generator covers every negatable leaf."""
    hints = filters_to_json_hints(filters)
    if hints is None:
        return
    if all(_eval_filter3(f, row) is True for f in filters):
        assert _eval_hint3(hints, row) is True, (
            f"hint UNKNOWN/False for a matching row: {filters} {row}"
        )
