"""Audit every oracle-backed catalog entry for cross-dtype hazards:
columns where live Spark output and the DuckDB oracle disagree on
int-vs-float (the c14 failure class — driver hashes 94 != 94.0)."""
import os
import sys

import numpy as np
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from ploverdb_spark.session import get_spark  # noqa: E402
from ploverdb_spark.catalog import all_queries, all_oracles  # noqa: E402
from tests.oracle_utils import run_oracle  # noqa: E402

spark = get_spark()
qs, os_ = all_queries(), all_oracles()


def kind(s: pd.Series) -> str:
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if s.dtype == object:
        # inspect first non-null value
        nn = s.dropna()
        if len(nn) == 0:
            return "empty"
        v = nn.iloc[0]
        if isinstance(v, (bool, np.bool_)):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        if isinstance(v, (list, np.ndarray, tuple)):
            return "array"
        return type(v).__name__
    return str(s.dtype)


bad = 0
for name in sorted(qs):
    if name not in os_:
        continue
    try:
        sdf = qs[name](spark, sf_dir).toPandas()
        odf = run_oracle(os_[name], sf_dir)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: ERROR {e}")
        bad += 1
        continue
    scols = {c.lower(): kind(sdf[c]) for c in sdf.columns}
    ocols = {c.lower(): kind(odf[c]) for c in odf.columns}
    if set(scols) != set(ocols):
        print(f"{name}: COLUMN SET DIFFERS spark={sorted(scols)} oracle={sorted(ocols)}")
        bad += 1
        continue
    for c in scols:
        sk, ok = scols[c], ocols[c]
        if sk == ok or "empty" in (sk, ok):
            continue
        # int-vs-float (and bool-vs-int) are the hash-divergent classes
        print(f"{name}: col {c}: spark={sk} oracle={ok}  rows={len(sdf)}")
        bad += 1
print("hazards:", bad)
spark.stop()
