"""in_predicate: one-py4j-call IN construction (the round-3 verdict's #1
fix).  Classic ``Column.isin`` costs one py4j round-trip per literal —
3.7s of driver time for a single subclass-expanded lookup at sf0.1.
These tests pin (a) escaping correctness, (b) semantic equality with
``isin``, and (c) a hard py4j-literal-call budget on the pushdown path so
the regression cannot silently return."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ploverdb_spark.functions.predicates import in_predicate, sql_string_literal

pytestmark = pytest.mark.shard2


def test_sql_string_literal_escaping(spark):
    tricky = ["plain", "it's", 'dq"uo', "back\\slash", "new\nline", "CURIE:1"]
    df = spark.createDataFrame([(v,) for v in tricky] + [("absent",)], "k string")
    got = {r.k for r in df.where(in_predicate("k", tricky)).collect()}
    assert got == set(tricky)
    assert sql_string_literal("a'b\\c") == "'a\\'b\\\\c'"


def test_in_predicate_matches_isin(spark):
    df = spark.range(200).select(F.col("id").cast("string").alias("k"))
    ids = [str(i) for i in range(0, 200, 7)]
    a = {r.k for r in df.where(in_predicate("k", ids)).collect()}
    b = {r.k for r in df.where(F.col("k").isin(ids)).collect()}
    assert a == b == set(ids)


def test_in_predicate_ints_and_empty(spark):
    df = spark.range(50)
    got = {r.id for r in df.where(in_predicate("id", [3, 7, 49])).collect()}
    assert got == {3, 7, 49}
    assert df.where(in_predicate("id", [])).count() == 0


def test_pushdown_builds_in_constant_py4j_calls(spark, monkeypatch):
    """Budget: pushdown_id_filter over thousands of ids must not create
    py4j literals per element (the 30,193-round-trip regression)."""
    from pyspark.sql.classic import column as ccol

    from ploverdb_spark.query.compiler import pushdown_id_filter

    calls = {"n": 0}
    orig = ccol._create_column_from_literal

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(ccol, "_create_column_from_literal", counting)
    df = spark.range(10).select(F.col("id").cast("string").alias("node_id"))
    ids = [f"SB:{i}" for i in range(4000)]
    filtered = pushdown_id_filter(df, "node_id", ids)
    # between() contributes a constant handful; the IN list must add ~0
    assert calls["n"] <= 8, f"{calls['n']} per-literal py4j calls"
    assert filtered.count() == 0  # and the plan still executes


def test_in_predicate_membership_form_split(spark):
    """Pin the serving membership-form split (SERVING_SQL_CONF threshold
    16): small pinned-id lists stay In (full cached-batch stat pruning),
    big batches become InSet (hash per-row).  Round-10 profiling on the
    cached 60M-row edges_bidir: a 100-id linear In costs 0.90-1.7 s per
    scan — it WAS the /neighbors repeat-batch cost — vs 0.24-0.31 s as
    InSet; stat pruning for big batches survives via the explicit
    BETWEEN conjunct in get_neighbors."""
    from ploverdb_spark.session import SERVING_SQL_CONF

    old = spark.conf.get("spark.sql.optimizer.inSetConversionThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.inSetConversionThreshold",
            SERVING_SQL_CONF["spark.sql.optimizer.inSetConversionThreshold"],
        )
        df = spark.range(10).select(F.col("id").cast("string").alias("k"))

        def optimized(n):
            return (
                df.where(in_predicate("k", [f"X:{i}" for i in range(n)]))
                ._jdf.queryExecution()
                .optimizedPlan()
                .toString()
            )

        small = optimized(10)
        assert " IN (" in small or "In(" in small, small
        assert "INSET" not in small.upper().replace("IN SET", "INSET"), small

        big = optimized(100)
        assert "INSET" in big.upper().replace("IN SET", "INSET"), big
    finally:
        spark.conf.set("spark.sql.optimizer.inSetConversionThreshold", old)
