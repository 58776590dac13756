"""Capture .explain('formatted') for named queries into plans/r13/.

Usage: python tools_r13_plans.py before q1 q2 ...   (suffix, then names)
"""
import os
import sys

suffix = sys.argv[1]
names = sys.argv[2:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from ploverdb_spark.session import get_spark  # noqa: E402
from ploverdb_spark.catalog import get  # noqa: E402

spark = get_spark()
outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r13")
os.makedirs(outdir, exist_ok=True)
for name in names:
    df = get(name).fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(outdir, f"{name}_{suffix}.txt")
    with open(path, "w", encoding="utf-8") as f:
        f.write(plan)
    print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
spark.stop()
