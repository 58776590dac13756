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
