"""Driver-cheap predicate builders for the hot serving path.

``Column.isin(values)`` constructs one JVM literal per element — one py4j
socket round-trip each (classic PySpark ``_create_column_from_literal``).
For subclass-expanded id lists (thousands of ids, cap
``MAX_ISIN_PUSHDOWN=8192``) that is seconds of pure *driver* time per
query (profiled at sf0.1: 7,420 literals = 3.7 s inside a single
doubly-pinned lookup), and under concurrent serving it burns exactly the
driver GIL/scheduling throughput the fast path protects.

:func:`in_predicate` renders the whole ``col IN (...)`` expression as one
SQL string and parses it JVM-side with a SINGLE ``F.expr`` call.  The
parsed form is the same Catalyst ``In(attr, literals)`` the per-literal
path produces, so everything downstream — parquet/bucket pushdown,
cached-scan min/max batch pruning (which evaluates ``In`` but ignores
``InSet``) — is unchanged; only the construction cost drops from O(n)
py4j calls to O(1).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def sql_string_literal(value: str) -> str:
    """Escape a Python string as a Spark SQL single-quoted literal.

    Spark's default parser treats backslash as an escape character inside
    string literals, so both the backslash itself and the quote must be
    escaped.  Control characters pass through verbatim (legal inside
    Spark SQL literals).
    """
    return "'" + value.replace("\\", "\\\\").replace("'", "\\'") + "'"


def in_predicate(col_name: str, values) -> Column:
    """``col IN (values)`` built in ONE py4j call.

    Supports string and int/float value lists (the engine's id and
    predicate columns); anything else falls back to classic ``isin``
    (cold paths only).  Empty list -> ``lit(False)`` (SQL ``IN ()`` is a
    parse error, and an empty id set matches nothing).
    """
    vals = list(values)
    if not vals:
        return F.lit(False)
    if all(isinstance(v, str) for v in vals):
        rendered = ", ".join(sql_string_literal(v) for v in vals)
    elif all(
        isinstance(v, (int, float))
        and not isinstance(v, bool)
        # repr(nan)/repr(inf) parse as bare identifiers and fail analysis;
        # route non-finite floats through the isin fallback, which builds
        # proper float literals
        and (isinstance(v, int) or math.isfinite(v))
        for v in vals
    ):
        rendered = ", ".join(repr(v) for v in vals)
    else:
        return F.col(col_name).isin(vals)
    return F.expr(f"`{col_name}` IN ({rendered})")
