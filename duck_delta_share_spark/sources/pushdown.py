"""Catalyst filter → Delta Sharing JSON predicate hints, plus file-level
pruning (partition values and min/max stats).

Reference analogue: ``ParseExpressionHint``/``GetPredicateHints``
(`/root/reference/src/duck_delta_share_extension.cpp:318-425`) emit the
JSON grammar {column, literal, equal, lessThan, greaterThan,
lessThanOrEqual, greaterThanOrEqual, not, isNull, and, or}. Differences
by design:

- valueType is spec-correct per the public Delta Sharing protocol
  ("boolean"/"int"/"long"/"float"/"double"/"string"/"date"/"timestamp") —
  the reference mislabels doubles as "int"
  (`duck_delta_share_extension.cpp:271-277,289-295`, SURVEY.md §2D).
- Hints are ADVISORY: every filter stays in Spark's plan and is re-applied
  after the scan, fixing the reference's filter swallowing
  (`duck_delta_share_extension.cpp:492`).
- Partition pruning actually prunes: predicates on partition columns are
  evaluated against ``FileAction.partition_values`` and files are skipped
  — the reference parses partition values but never uses them
  (`delta_sharing_client.cpp:445-446`).
- File-stats min/max pruning: the reference parses ``stats`` and ignores
  them (`delta_sharing_client.cpp:450-451`); we skip files whose ranges
  exclude the predicate.
"""

from __future__ import annotations

import datetime as dt
from typing import Any

from pyspark.sql.datasource import (
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

# ---------------------------------------------------------------------------
# Filter → JSON hint tree
# ---------------------------------------------------------------------------


def _value_type(value: Any) -> str:
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "int" if -(2**31) <= value < 2**31 else "long"
    if isinstance(value, float):
        return "double"
    if isinstance(value, dt.datetime):
        return "timestamp"
    if isinstance(value, dt.date):
        return "date"
    return "string"


def _attr_name(f: Filter) -> str:
    # ColumnPath is a tuple of name parts; hints address top-level columns.
    return ".".join(f.attribute)


def _column(name: str, value_type: str) -> dict[str, Any]:
    return {"op": "column", "name": name, "valueType": value_type}


def _literal(value: Any) -> dict[str, Any]:
    return {"op": "literal", "value": _literal_str(value), "valueType": _value_type(value)}


def _literal_str(value: Any) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, dt.datetime):
        return value.isoformat(sep="T")
    return str(value)


def _binary(op: str, f: Filter) -> dict[str, Any]:
    name = _attr_name(f)
    return {
        "op": op,
        "children": [_column(name, _value_type(f.value)), _literal(f.value)],
    }


def filter_to_hint(f: Filter) -> dict[str, Any] | None:
    """Translate one pushed Filter to a hint subtree; None if untranslatable
    (the filter still runs in Spark either way)."""
    if isinstance(f, (EqualTo, EqualNullSafe)):
        if f.value is None:
            # `col <=> NULL` means IS NULL. Stringifying None would emit
            # {op: equal, literal: 'None'} and let the server exclude the
            # files that hold the matching NULL rows — unrecoverable, since
            # Spark's re-applied filter never sees those files.
            if isinstance(f, EqualNullSafe):
                return {"op": "isNull", "children": [_column(_attr_name(f), "string")]}
            return None  # col = NULL matches nothing; emit no hint
        return _binary("equal", f)
    if (
        isinstance(f, (LessThan, LessThanOrEqual, GreaterThan, GreaterThanOrEqual))
        and f.value is None
    ):
        return None
    if isinstance(f, LessThan):
        return _binary("lessThan", f)
    if isinstance(f, LessThanOrEqual):
        return _binary("lessThanOrEqual", f)
    if isinstance(f, GreaterThan):
        return _binary("greaterThan", f)
    if isinstance(f, GreaterThanOrEqual):
        return _binary("greaterThanOrEqual", f)
    if isinstance(f, IsNull):
        return {"op": "isNull", "children": [_column(_attr_name(f), "string")]}
    if isinstance(f, IsNotNull):
        return {
            "op": "not",
            "children": [{"op": "isNull", "children": [_column(_attr_name(f), "string")]}],
        }
    if isinstance(f, In):
        # A NULL element of an IN list matches no row — drop it rather
        # than serialize 'None'.
        children = [
            {
                "op": "equal",
                "children": [
                    _column(_attr_name(f), _value_type(v)),
                    _literal(v),
                ],
            }
            for v in f.value
            if v is not None
        ]
        if not children:
            return None
        return children[0] if len(children) == 1 else {"op": "or", "children": children}
    if isinstance(f, Not):
        if isinstance(f.child, EqualNullSafe) and f.child.value is not None:
            # NOT(col <=> v) is TRUE for NULL rows, but not(equal(col, v))
            # evaluates to NULL for them under SQL 3VL — a stats-pruning
            # server (min=max=v, nullCount>0) would conclude no row can
            # match and drop the file holding the NULL rows. The hint must
            # be IMPLIED BY the filter: emit nothing. (Not(EqualTo) stays
            # sound because `=` is null-rejecting on the filter side too.)
            return None
        child = filter_to_hint(f.child)
        return {"op": "not", "children": [child]} if child else None
    # StringStartsWith/EndsWith/Contains have no hint-grammar equivalent.
    return None


def filters_to_json_hints(filters: list[Filter]) -> dict[str, Any] | None:
    """AND-combine translatable filters into one jsonPredicateHints tree."""
    hints = [h for h in (filter_to_hint(f) for f in filters) if h is not None]
    if not hints:
        return None
    return hints[0] if len(hints) == 1 else {"op": "and", "children": hints}


# ---------------------------------------------------------------------------
# Filter → legacy SQL-string predicateHints
# ---------------------------------------------------------------------------
#
# Older Delta Sharing servers predate jsonPredicateHints and only apply the
# legacy ``predicateHints`` field: a list of SQL boolean expressions,
# implicitly AND-ed. The reference renders these in GetPredicateHints
# (`/root/reference/src/duck_delta_share_extension.cpp:126-262`); this
# renderer keeps its operator surface but fixes its operand-swap bugs
# (SURVEY.md §2D) and applies the same NULL discipline as the JSON path:
# a hint must be IMPLIED BY the filter — when in doubt, emit nothing.


def _sql_ident(name: str) -> str:
    if name.replace("_", "").isalnum() and not name[:1].isdigit():
        return name
    return '"' + name.replace('"', '""') + '"'


def _sql_literal(value: Any) -> str | None:
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return str(value)
    if isinstance(value, dt.datetime):
        return "TIMESTAMP '" + value.isoformat(sep=" ") + "'"
    if isinstance(value, dt.date):
        return "DATE '" + value.isoformat() + "'"
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    return None  # unknown literal type: no hint rather than a wrong hint


def filter_to_sql(f: Filter) -> str | None:
    """One pushed Filter as a legacy SQL hint string; None if untranslatable."""
    value = getattr(f, "value", None)
    if isinstance(f, IsNull):
        return f"{_sql_ident(_attr_name(f))} IS NULL"
    if isinstance(f, IsNotNull):
        return f"{_sql_ident(_attr_name(f))} IS NOT NULL"
    if isinstance(f, EqualNullSafe) and value is None:
        return f"{_sql_ident(_attr_name(f))} IS NULL"
    if isinstance(f, In):
        items = [_sql_literal(v) for v in f.value if v is not None]
        if not items or any(i is None for i in items):
            return None
        return f"{_sql_ident(_attr_name(f))} IN ({', '.join(items)})"
    if isinstance(f, Not):
        # NOT(child) as a hint requires child to be exactly decidable; the
        # only safe case in the legacy grammar is NOT(IS NULL) and
        # NOT(equal) on non-null values — conservatively support IsNull.
        if isinstance(f.child, IsNull):
            return f"{_sql_ident('.'.join(f.child.attribute))} IS NOT NULL"
        return None
    ops = {
        EqualTo: "=",
        EqualNullSafe: "=",
        LessThan: "<",
        LessThanOrEqual: "<=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
    }
    for cls, op in ops.items():
        if isinstance(f, cls):
            if value is None:
                return None  # comparison to NULL: matches nothing, no hint
            lit = _sql_literal(value)
            if lit is None:
                return None
            # column LEFT, literal RIGHT — the reference swaps operands for
            # flipped comparisons without flipping the operator (cpp:227-244)
            return f"{_sql_ident(_attr_name(f))} {op} {lit}"
    return None  # StringStartsWith etc.: no legacy-grammar equivalent


def filters_to_sql_hints(filters: list[Filter]) -> list[str]:
    """All translatable filters as legacy predicateHints (AND-implied)."""
    return [s for s in (filter_to_sql(f) for f in filters) if s is not None]


# ---------------------------------------------------------------------------
# File pruning: partition values + stats
# ---------------------------------------------------------------------------


def _coerce(raw: Any, sample: Any) -> Any:
    """Coerce a partition-value/stats string to the comparison value's type;
    None → not comparable (never prune on uncertainty)."""
    if raw is None:
        return None
    try:
        if isinstance(sample, bool):
            return str(raw).lower() == "true"
        if isinstance(sample, int):
            return int(raw)
        if isinstance(sample, float):
            return float(raw)
        if isinstance(sample, dt.datetime):
            if isinstance(raw, dt.datetime):
                return raw
            return dt.datetime.fromisoformat(str(raw).replace("Z", "+00:00")).replace(tzinfo=None)
        if isinstance(sample, dt.date):
            if isinstance(raw, dt.date):
                return raw
            return dt.date.fromisoformat(str(raw)[:10])
        return str(raw)
    except (ValueError, TypeError):
        return None


def _compare_ok(f: Filter, actual: Any) -> bool:
    """Can a row with column value ``actual`` satisfy the filter? Unknown →
    True (never prune on uncertainty)."""
    value = getattr(f, "value", None)
    if isinstance(f, EqualNullSafe) and value is None:
        return actual is None  # col <=> NULL: exact on constant partitions
    if value is None and not isinstance(f, (IsNull, IsNotNull, In)):
        return True  # comparison against NULL: never prune on uncertainty
    if isinstance(f, (EqualTo, EqualNullSafe)):
        coerced = _coerce(actual, value)
        return coerced is None or coerced == value
    if isinstance(f, LessThan):
        coerced = _coerce(actual, value)
        return coerced is None or coerced < value
    if isinstance(f, LessThanOrEqual):
        coerced = _coerce(actual, value)
        return coerced is None or coerced <= value
    if isinstance(f, GreaterThan):
        coerced = _coerce(actual, value)
        return coerced is None or coerced > value
    if isinstance(f, GreaterThanOrEqual):
        coerced = _coerce(actual, value)
        return coerced is None or coerced >= value
    if isinstance(f, In):
        # type sample must be a NON-NULL element: a leading NULL in the IN
        # list would degrade coercion to strings and wrongly prune files
        # whose value matches a later element (NULL itself matches no row)
        sample = next((v for v in f.value if v is not None), None)
        coerced = _coerce(actual, sample)
        return coerced is None or coerced in f.value
    if isinstance(f, IsNull):
        return actual is None
    if isinstance(f, IsNotNull):
        return actual is not None
    return True


def partition_matches(filters: list[Filter], partition_values: dict[str, Any]) -> bool:
    """True if a file with these partition values can contain matching rows.
    Only filters naming a partition column participate; everything else is
    the parquet scan's job."""
    for f in filters:
        attr = getattr(f, "attribute", None) or getattr(
            getattr(f, "child", None), "attribute", None
        )
        if attr is None:
            continue
        name = ".".join(attr)
        if name not in partition_values:
            continue
        if isinstance(f, Not):
            if _definitely_matches(f.child, partition_values[name]):
                return False
            continue
        if not _compare_ok(f, partition_values[name]):
            return False
    return True


def _definitely_matches(f: Filter, actual: Any) -> bool:
    """For Not-pruning we need 'every row definitely matches child' — for a
    constant partition value the row set is uniform, so child-match is
    decidable the same way (unknown → False, never prune)."""
    value = getattr(f, "value", None)
    if isinstance(f, (EqualTo, EqualNullSafe)):
        coerced = _coerce(actual, value)
        return coerced is not None and coerced == value
    if isinstance(f, In):
        sample = next((v for v in f.value if v is not None), None)
        coerced = _coerce(actual, sample)
        return coerced is not None and coerced in f.value
    if isinstance(f, IsNull):
        return actual is None
    if isinstance(f, IsNotNull):
        return actual is not None
    return False


def stats_allow(filters: list[Filter], stats: dict[str, Any]) -> bool:
    """Min/max file-stats pruning: False → no row in the file can match.
    ``stats`` is the parsed FileAction.stats JSON with minValues/maxValues.
    """
    mins = stats.get("minValues") or {}
    maxs = stats.get("maxValues") or {}
    nulls = stats.get("nullCount") or {}
    num_records = stats.get("numRecords")
    for f in filters:
        attr = getattr(f, "attribute", None)
        if attr is None:
            continue
        name = ".".join(attr)
        # nullCount pruning (Delta stats carry per-column null counts):
        # a file with zero nulls can't match IS NULL; an all-null column
        # can't match IS NOT NULL
        if isinstance(f, IsNull):
            if nulls.get(name) == 0:
                return False
            continue
        if isinstance(f, IsNotNull):
            nc = nulls.get(name)
            if nc is not None and num_records is not None and nc >= num_records:
                return False
            continue
        value = getattr(f, "value", None)
        if value is None and not isinstance(f, In):
            continue  # NULL comparisons carry no min/max information
        nc = nulls.get(name)
        if nc is not None and num_records is not None and nc >= num_records:
            return False  # every value NULL: no comparison can match
        # In carries a tuple; coerce stats bounds with a NON-NULL element
        # as the type sample, not the tuple (which would degrade to
        # strings — and so would a leading None element).
        sample = (
            next((v for v in value if v is not None), None)
            if isinstance(f, In)
            else value
        )
        if isinstance(f, In) and sample is None:
            continue  # IN (NULL, ...only) matches nothing we can bound
        lo = _coerce(mins.get(name), sample)
        hi = _coerce(maxs.get(name), sample)
        if isinstance(f, EqualTo):
            if lo is not None and value < lo:
                return False
            if hi is not None and value > hi:
                return False
        elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            if hi is not None and (value > hi or (isinstance(f, GreaterThan) and value >= hi)):
                return False
        elif isinstance(f, (LessThan, LessThanOrEqual)):
            if lo is not None and (value < lo or (isinstance(f, LessThan) and value <= lo)):
                return False
        elif isinstance(f, In):
            if lo is not None and hi is not None and not any(
                lo <= v <= hi for v in f.value if v is not None
            ):
                return False
    return True
