"""Round-12 optimization profiler.

For each named query: warmup (full count), then timed reps of the same
action bench.py uses (count), plus an optional noop-sink rep (guide §1.4)
to time all-columns materialization, and the .explain("formatted") text
written to plans/r12/<name>_<tag>.txt.

Usage:
  python tools_r12_profile.py <tag> [q1,q2,...] [reps]

tag: "before" / "after" (plan file suffix).  Default queries: the floor-
critical set.  Prints one JSON line per query with count/noop timings.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = (
        [n for n in sys.argv[2].split(",") if n]
        if len(sys.argv) > 2
        else [
            "d6_dup_groups",
            "c7_training_mix",
            "d7_edit_distance_verify",
            "s5_ivf_multiprobe",
            "c2_decontamination",
            "c10_lsh_decontamination",
            "s2_ivf_topk",
            "t8_quality_quantile",
            "d2_minhash_lsh_pairs",
            "s6_signed_projection",
            "c8_bloom_decontamination",
            "c12_token_window_decontamination",
            "s4_ivf_recall",
            "t9_tfidf_topk",
            "c1_clean_corpus",
        ]
    )
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs("plans/r12", exist_ok=True)

    from ploverdb_spark.catalog import all_queries
    from ploverdb_spark.session import get_spark

    spark = get_spark("ploverdb_r12_profile")
    qs = all_queries()
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"{name} warmup")
        df = fn(spark, sf_dir)
        # plan text
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"plans/r12/{name}_{tag}.txt", "w", encoding="utf-8") as f:
            f.write(buf.getvalue())
        t0 = time.perf_counter()
        df.count()
        warm = time.perf_counter() - t0
        runs = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 4))
        noop = []
        for i in range(max(1, reps - 1)):
            spark.sparkContext.setJobDescription(f"{name} noop{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop.append(round(time.perf_counter() - t0, 4))
        print(
            json.dumps(
                {
                    "q": name,
                    "warm": round(warm, 4),
                    "count_min": min(runs),
                    "count_reps": runs,
                    "noop_min": min(noop),
                    "noop_reps": noop,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
