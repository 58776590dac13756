"""Physical-plan guardrails for the headline queries (SURVEY §4): filter
pushdown, column pruning, broadcast joins.  A failure here means the plan
regressed in a way that only shows up at cluster scale."""

from __future__ import annotations

import pytest

from ploverdb_spark.catalog import get
from ploverdb_spark.plans.checks import (
    assert_scale_ready,
    count_broadcast_joins,
    read_schema_columns,
)
from tests.conftest import SF_ORACLE


def test_a1_pushdown_and_pruning(spark):
    df = get("a1_pricing_summary").fn(spark, SF_ORACLE)
    # the shipdate filter must reach the parquet scan, and the scan must
    # not read more than the 6 referenced columns (5 projected + the
    # filter column, kept for residual evaluation)
    assert_scale_ready(
        df,
        pushed_filter="l_shipdate",
        max_read_columns=6,
        name="a1_pricing_summary",
    )


def test_j2_broadcasts_dimensions(spark):
    df = get("j2_region_revenue").fn(spark, SF_ORACLE)
    assert_scale_ready(
        df,
        pushed_filter="o_orderstatus",
        require_broadcast=True,
        forbid_sort_merge=True,
        name="j2_region_revenue",
    )
    assert count_broadcast_joins(df) >= 3  # customer, nation, region


def test_j3_semi_joins_broadcast(spark):
    df = get("j3_doubly_pinned").fn(spark, SF_ORACLE)
    assert_scale_ready(
        df,
        require_broadcast=True,
        forbid_sort_merge=True,
        name="j3_doubly_pinned",
    )


def test_t1_scan_prunes_to_text(spark):
    df = get("t1_token_counts").fn(spark, SF_ORACLE)
    cols = read_schema_columns(df)
    assert cols, "expected a parquet scan"
    assert all(set(c) <= {"doc_id", "text"} for c in cols), cols


def test_partial_aggregation(spark):
    # map-side combine: the aggregation must plan partial_sum/partial_count
    # before the exchange, or every group row ships through the shuffle
    from ploverdb_spark.plans.checks import formatted_plan

    df = get("a1_pricing_summary").fn(spark, SF_ORACLE)
    plan = formatted_plan(df)
    assert "partial_sum" in plan and "partial_count" in plan
