"""Reproduce the driver's c14 comparison: live Spark vs DuckDB oracle,
cell-by-cell diff at a given SF (default sf0.01, the driver's verify SF)."""
import os
import sys

import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from ploverdb_spark.session import get_spark  # noqa: E402
from ploverdb_spark.catalog import get  # noqa: E402

spark = get_spark()
ent = get("c14_span_redaction")
sdf = ent.fn(spark, sf_dir).toPandas()

con = duckdb.connect()
for t in ("documents",):
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
    )
odf = con.execute(ent.oracle).fetchdf()

print("spark rows:", len(sdf), "oracle rows:", len(odf))
print("spark cols:", list(sdf.columns))
print("oracle cols:", list(odf.columns))

s = sdf.sort_values("doc_id").reset_index(drop=True)
o = odf.sort_values("doc_id").reset_index(drop=True)
o.columns = list(s.columns)  # align names for positional compare

ndiff = 0
for i in range(max(len(s), len(o))):
    for c in s.columns:
        sv = s.at[i, c] if i < len(s) else "<missing>"
        ov = o.at[i, c] if i < len(o) else "<missing>"
        if str(sv) != str(ov):
            ndiff += 1
            print(f"DIFF row {i} doc_id={s.at[i, 'doc_id'] if i < len(s) else '?'} col={c}: spark={sv!r} oracle={ov!r}")
print("total cell diffs:", ndiff)
if ndiff == 0:
    print("MATCH: spark output identical to oracle")
spark.stop()
