"""Every registered oracle-backed query must hash-match DuckDB at sf0.01 —
the same check the driver's verify performs."""

from __future__ import annotations

import pytest

from ploverdb_spark.catalog import all_oracles, all_queries, get
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import assert_matches_oracle


def _oracle_names():
    return sorted(all_oracles().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_matches_oracle(spark, name):
    spec = get(name)
    df = spec.fn(spark, SF_ORACLE)
    assert_matches_oracle(df, spec.oracle, SF_ORACLE, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_all_queries_run_smoke(spark):
    for name, fn in all_queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name


def test_multiprobe_recall_monotone(spark):
    """s5: probing 3 cells can only add candidates, so per-query recall@10
    must be >= the single-probe recall."""
    from ploverdb_spark.catalog import get
    from tests.conftest import SF_ORACLE

    rows = get("s5_ivf_multiprobe").fn(spark, SF_ORACLE).collect()
    assert rows
    assert all(r.recall_p3 >= r.recall_p1 for r in rows)
    # and multi-probe genuinely helps somewhere at this scale (the cells
    # are label-partitioned, so some true neighbors sit across cells)
    assert any(r.recall_p3 > r.recall_p1 for r in rows)


def test_emission_drop_set_is_exactly_the_pinned_tail():
    """The driver emits at most DRIVER_EMIT_CAP correctness rows; the
    entries that fall off MUST be exactly the deliberately-pinned
    _EMIT_LAST tail — growing the catalog without growing the tail would
    otherwise silently push an unpinned entry out of the correctness
    window."""
    from ploverdb_spark.catalog import (
        DRIVER_EMIT_CAP,
        _EMIT_FIRST,
        _EMIT_LAST,
        all_oracles,
        all_queries,
    )

    names = list(all_queries())
    assert list(all_oracles()) == names  # same order, fully oracle-backed
    assert len(set(names)) == len(names)
    assert set(_EMIT_FIRST).isdisjoint(_EMIT_LAST)
    overflow = names[DRIVER_EMIT_CAP:]
    assert set(overflow) == set(_EMIT_LAST), (
        f"catalog has {len(names)} entries but the pinned tail has "
        f"{len(_EMIT_LAST)} — the drop set would include unpinned "
        f"entries: {sorted(set(overflow) - set(_EMIT_LAST))}"
    )
    # every head pin must exist (a typo here silently unpins an entry)
    registered = set(names)
    assert set(_EMIT_FIRST) <= registered and set(_EMIT_LAST) <= registered
