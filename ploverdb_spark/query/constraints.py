"""TRAPI attribute-constraint -> Spark Column compiler (F3).

Reference behavior reimplemented (NOT ported): plover.py:2418-2584.
Semantics preserved:

- operators ``==, <, >, <=, >=, ===`` plus a ``not`` flag;
- list-vs-scalar broadcast: if either side is a list, ``any()`` matching
  applies (except ``===`` which is exact equality of the raw values);
- trial-phase enum strings are converted to numbers before comparison;
- constraint values go through the reference's string->scalar coercion;
- type errors make the constraint fail (not raise);
- unknown operators are ignored with a warning (constraint passes);
- ``knowledge_source`` constraints match any of the source-role
  properties (primary/aggregator knowledge source);
- all constraints must pass (AND), each fulfillable by a *top-level*
  attribute; remaining constraints must all be fulfilled by sub-attributes
  of one single zipped attribute (nested case, plover.py:2444-2454).

The compiled result is a single boolean Column over the edge DataFrame,
evaluated JVM-side (higher-order array functions, no Python UDFs).
"""

from __future__ import annotations

import logging
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ploverdb_spark.sources.kgx import TRIAL_PHASES

logger = logging.getLogger(__name__)

# attribute_type_id aliases that fulfill a 'knowledge_source' constraint
# (reference plover.py:699-704 knowledge_source_properties)
KNOWLEDGE_SOURCE_PROPERTIES = (
    "knowledge_source",
    "primary_knowledge_source",
    "aggregator_knowledge_source",
)

_PHASE_TO_NUM = {name: num for num, name in TRIAL_PHASES.items()}

_OPS = {"==", "<", ">", "<=", ">=", "==="}

_NUMERIC_TYPES = {"tinyint", "smallint", "int", "bigint", "float", "double"}

# Outcomes of adapting a constraint literal to a column's type.  The
# reference compares Python values: == on mismatched types is just False
# (so 'not' still applies), while </>/<=/>= raise TypeError, which fails
# the whole constraint BEFORE 'not' (plover.py:2580-2584).  Our columns
# are schema-typed, so the same decision is made from the schema.
_OK = "ok"
_EQ_FALSE = "eq_false"  # comparison is constant-False; 'not' applies
_FAIL = "fail"  # constraint fails outright; 'not' does NOT apply


def _adapt_scalar(raw, coerced, elem_type: str, op: str):
    """Fit one constraint literal to the column element type."""
    mismatch = _EQ_FALSE if op in ("==", "===") else _FAIL
    if elem_type == "string":
        # schema says string: compare the raw (uncoerced) literal
        return (_OK, raw) if isinstance(raw, str) else (mismatch, None)
    if elem_type == "boolean":
        return (_OK, coerced) if isinstance(coerced, bool) else (mismatch, None)
    if elem_type in _NUMERIC_TYPES:
        if isinstance(coerced, (int, float)) and not isinstance(coerced, bool):
            return (_OK, coerced)
        return (mismatch, None)
    return (_OK, coerced)  # other types: pass through


def _adapt_value(raw, elem_type: str, op: str):
    """Adapt a scalar-or-list constraint value; returns (kind, value).

    List semantics mirror the reference's any() matching: for ==, elements
    that cannot match are dropped; for ordering ops one incompatible
    element fails the constraint (TypeError parity)."""
    if isinstance(raw, list):
        out = []
        for r in raw:
            r = _phase_normalize(r)
            kind, v = _adapt_scalar(r, _load_scalar(r), elem_type, op)
            if kind == _FAIL:
                return _FAIL, None
            if kind == _EQ_FALSE:
                continue
            out.append(v)
        if not out:
            return _EQ_FALSE, None
        return _OK, out
    raw = _phase_normalize(raw)
    return _adapt_scalar(raw, _load_scalar(raw), elem_type, op)


def _load_scalar(value: Any) -> Any:
    """Reference ``_load_value`` (plover.py:458-471) for constraint
    literals: '7'->int, '7.5'->float, 't'/'true'->bool, 'none'->None."""
    if not isinstance(value, str):
        return value
    v = value.strip()
    low = v.lower()
    if low in ("t", "true"):
        return True
    if low in ("f", "false"):
        return False
    if low in ("none", "null"):
        return None
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    return v


def _phase_normalize(value: Any) -> Any:
    if isinstance(value, list):
        return [_PHASE_TO_NUM.get(v, v) for v in value]
    return _PHASE_TO_NUM.get(value, value)


def _compare(attr: Column, attr_is_array: bool, op: str, value: Any) -> Column:
    """Build the op(attr, value) Column with list-broadcast semantics."""
    value_is_list = isinstance(value, list)

    def scalar_cmp(a: Column, v: Any) -> Column:
        lit = F.lit(v)
        if op in ("==", "==="):
            return a.eqNullSafe(lit) if v is None else (a == lit)
        if op == "<":
            return a < lit
        if op == ">":
            return a > lit
        if op == "<=":
            return a <= lit
        return a >= lit

    if op == "===":  # exact match of raw values, no list broadcast
        if attr_is_array and value_is_list:
            return attr == F.lit(value)
        if not attr_is_array and not value_is_list:
            return scalar_cmp(attr, value)
        return F.lit(False)

    if attr_is_array and value_is_list:
        return F.exists(
            attr, lambda a: F.greatest(*[scalar_cmp(a, v) for v in value])
            if len(value) > 1
            else scalar_cmp(a, value[0]),
        )
    if attr_is_array:
        return F.exists(attr, lambda a: scalar_cmp(a, value))
    if value_is_list:
        if not value:
            return F.lit(False)
        cmps = [scalar_cmp(attr, v) for v in value]
        return F.greatest(*cmps) if len(cmps) > 1 else cmps[0]
    return scalar_cmp(attr, value)


def compile_constraint(
    df: DataFrame,
    constraint: dict,
    attribute_columns: dict[str, str] | None = None,
) -> Column:
    """Compile one TRAPI attribute constraint to a boolean Column.

    ``attribute_columns`` maps attribute_type_id -> column name; by default
    the constraint id is used as the column name directly (our engine keeps
    edge properties as columns; the TRAPI attribute template applies the
    same name mapping at response time).
    """
    attribute_columns = attribute_columns or {}
    cid = constraint["id"]
    op = constraint["operator"]
    is_not = bool(constraint.get("not"))
    value = constraint["value"]

    if op not in _OPS:
        logger.warning("Unsupported constraint operator %r; ignoring constraint", op)
        return F.lit(True)

    # knowledge_source pseudo-attribute: match any source-role column
    if cid == "knowledge_source":
        candidates = [
            attribute_columns.get(p, p)
            for p in KNOWLEDGE_SOURCE_PROPERTIES
            if attribute_columns.get(p, p) in df.columns
        ]
    else:
        candidates = [attribute_columns.get(cid, cid)]
        candidates = [c for c in candidates if c in df.columns]

    if not candidates:
        # Absent attribute never fulfills a constraint — even a 'not' one
        # (reference: id mismatch returns False before 'not' applies).
        return F.lit(False)

    dtypes = dict(df.dtypes)
    parts: list[Column] = []
    for col_name in candidates:
        dt = dtypes[col_name]
        is_array = dt.startswith("array")
        col = F.col(col_name)
        if is_array and dt.startswith("array<struct"):
            continue  # zipped attributes handled by nested path
        elem_type = dt[6:-1] if is_array else dt
        kind, adapted = _adapt_value(value, elem_type, op)
        if kind == _FAIL:
            parts.append(F.lit(False))  # TypeError parity: 'not' ignored
            continue
        if kind == _EQ_FALSE:
            cmp = F.lit(False)
        else:
            cmp = F.coalesce(
                _compare(col, is_array, op, adapted), F.lit(False)
            )
        # 'not' applies per-attribute, inside the presence check: the
        # attribute must exist AND its (whole-value) comparison negate.
        per_attr = (~cmp) if is_not else cmp
        parts.append(col.isNotNull() & per_attr)
    if not parts:
        return F.lit(False)
    return F.greatest(*parts) if len(parts) > 1 else parts[0]


def compile_nested_element(field_names: dict[str, str], constraint: dict):
    """Per-ELEMENT predicate for one constraint against one zipped
    attribute instance: returns ``x -> Column`` usable inside a
    higher-order ``exists`` lambda.  ``None`` means the constraint is
    ignored entirely (unsupported operator — parity with the top-level
    warn-and-ignore)."""
    cid, op = constraint["id"], constraint["operator"]
    is_not = bool(constraint.get("not"))
    value = constraint["value"]
    if op not in _OPS:
        return None
    if cid not in field_names:
        return lambda x: F.lit(False)  # absent sub-attribute never fulfills

    kind, adapted = _adapt_value(value, field_names[cid], op)
    if kind == _FAIL:
        return lambda x: F.lit(False)

    def sub_meets(x: Column) -> Column:
        if kind == _EQ_FALSE:
            cmp = F.lit(False)
        else:
            cmp = F.coalesce(_compare(x[cid], False, op, adapted), F.lit(False))
        per_attr = (~cmp) if is_not else cmp
        return x[cid].isNotNull() & per_attr

    return sub_meets

def compile_nested_single(
    df: DataFrame, col_name: str, field_names: dict[str, str], constraint: dict
) -> Column:
    """Does SOME element of the zipped column satisfy the constraint via
    its subattributes?  (Kept for single-constraint callers; the
    multi-constraint path uses :func:`compile_nested_element` so the
    same-attribute-instance rule holds across constraints.)"""
    elem = compile_nested_element(field_names, constraint)
    if elem is None:
        return F.lit(True)
    return F.coalesce(F.exists(F.col(col_name), elem), F.lit(False))


def _struct_fields(df: DataFrame, col_name: str) -> dict[str, str]:
    """field name -> simple dtype string for an array<struct<...>> column."""
    for f in df.schema.fields:
        if f.name == col_name:
            return {
                sf.name: sf.dataType.simpleString()
                for sf in f.dataType.elementType.fields
            }
    return {}


def apply_attribute_constraints(
    df: DataFrame,
    constraints: list[dict],
    attribute_columns: dict[str, str] | None = None,
) -> DataFrame:
    """Filter edges by TRAPI attribute constraints: each constraint must be
    met by a top-level attribute, OR all constraints not met top-level must
    be met within a single zipped (nested) attribute."""
    if not constraints:
        return df
    dtypes = dict(df.dtypes)
    zipped_cols = [c for c, t in dtypes.items() if t.startswith("array<struct")]

    top_level = [
        compile_constraint(df, c, attribute_columns) for c in constraints
    ]
    all_top = top_level[0]
    for c in top_level[1:]:
        all_top = all_top & c

    if zipped_cols:
        # Reference plover.py:2444-2454: constraints not met by top-level
        # attributes must ALL be met by subattributes of the SAME
        # attribute instance.  Compiled as: for some zipped column Z,
        # EXISTS one element x of Z with AND_i (top_i OR nested_i(x)) —
        # the exists wraps the conjunction, so one instance must carry
        # every unfulfilled constraint (different elements fulfilling
        # different constraints is NOT enough).
        def make_one_instance(elems):
            # single-parameter closure: pyspark's _create_lambda maps EVERY
            # parameter (defaults included) to a lambda variable, so the
            # element predicates must be captured, not defaulted
            def one_instance(x: Column) -> Column:
                conds = [
                    top_level[i]
                    | (F.lit(True) if elems[i] is None else elems[i](x))
                    for i in range(len(constraints))
                ]
                acc = conds[0]
                for c in conds[1:]:
                    acc = acc & c
                return acc

            return one_instance

        per_col = []
        for z in zipped_cols:
            fields = _struct_fields(df, z)
            elems = [
                compile_nested_element(fields, c) for c in constraints
            ]
            per_col.append(
                F.coalesce(
                    F.exists(F.col(z), make_one_instance(elems)), F.lit(False)
                )
            )
        combined = all_top
        for pc in per_col:
            combined = combined | pc
        return df.where(combined)
    return df.where(all_top)
