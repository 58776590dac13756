"""Local replica of the driver's Spark-vs-DuckDB comparison so tests catch
mismatches before the per-round verify does.

Comparison semantics (mirroring the driver contract): sort columns by name,
sort rows by all columns, compare row count + values (floats to 1e-9
relative tolerance; everything else exactly).
"""

from __future__ import annotations

import math

import duckdb

from ploverdb_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetch_df()


def _canon(df_pd):
    df = df_pd.reindex(sorted(df_pd.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        rows.append(tuple(_canon_val(v) for v in row))
    return sorted(rows, key=repr)


def _canon_val(v):
    import numpy as np
    import pandas as pd

    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_canon_val(x) for x in v)
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating, float)):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    return v


def _val_eq(a, b) -> bool:
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_val_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    # The driver's value hash is type-sensitive: an int column on one side
    # and a float column on the other (e.g. a DuckDB HUGEINT SUM surfacing
    # as float64) hash differently even when 94 == 94.0 — the exact failure
    # mode that made c14_span_redaction driver-red in r12 while this
    # replica stayed green.  Refuse the cross-type comparison.
    if isinstance(a, float) != isinstance(b, float):
        return False
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    return a == b


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, name: str = "?"):
    spark_rows = _canon(spark_df.toPandas())
    oracle_rows = _canon(run_oracle(sql, sf_dir))
    assert len(spark_rows) == len(oracle_rows), (
        f"{name}: row count {len(spark_rows)} != oracle {len(oracle_rows)}"
    )
    for i, (srow, orow) in enumerate(zip(spark_rows, oracle_rows)):
        assert _val_eq(srow, orow), f"{name}: row {i} differs:\n spark={srow}\noracle={orow}"
