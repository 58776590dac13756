"""Physical-plan assertions — the guardrails that keep operators
100 TB-ready.

Each headline query's plan is checked for the properties that matter at
scale (SURVEY §4): filters reaching the parquet scan (PushedFilters),
column pruning (ReadSchema), small dimensions going broadcast, and wide
whole-stage-codegen spans.  Tests call these so a regression that, say,
swaps a broadcast join for a sort-merge join fails CI rather than
surfacing as a 100x slowdown on the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if a parquet scan pushes a filter mentioning ``fragment``."""
    plan = formatted_plan(df)
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if fragment in m.group(1):
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of every parquet ReadSchema in the plan (pruning check)."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if ":" in c]
        out.append(cols)
    return out


def count_broadcast_joins(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def count_sort_merge_joins(df: DataFrame) -> int:
    return formatted_plan(df).count("SortMergeJoin")


def codegen_stage_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)


def assert_scale_ready(
    df: DataFrame,
    pushed_filter: str | None = None,
    max_read_columns: int | None = None,
    require_broadcast: bool = False,
    forbid_sort_merge: bool = False,
    name: str = "?",
) -> None:
    plan = formatted_plan(df)
    if pushed_filter is not None and not has_pushed_filter(df, pushed_filter):
        raise AssertionError(
            f"{name}: expected pushed filter containing {pushed_filter!r};"
            f" plan:\n{plan}"
        )
    if max_read_columns is not None:
        widths = [len(c) for c in read_schema_columns(df)]
        if widths and max(widths) > max_read_columns:
            raise AssertionError(
                f"{name}: a scan reads {max(widths)} columns (> "
                f"{max_read_columns}) — column pruning regressed; plan:\n{plan}"
            )
    if require_broadcast and count_broadcast_joins(df) == 0:
        raise AssertionError(f"{name}: no broadcast join in plan:\n{plan}")
    if forbid_sort_merge and count_sort_merge_joins(df) > 0:
        raise AssertionError(
            f"{name}: unexpected sort-merge join (small side should "
            f"broadcast); plan:\n{plan}"
        )
