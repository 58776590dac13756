"""Corpus-pipeline scale benchmark (VERDICT r5 item #1).

The catalog proves the LLM-data-pipeline operators CORRECT at sf0.1;
this script proves they hold their shape at corpus scale: a synthetic
documents table of ~10 GB of text (env-scalable to 50 GB), generated
with pure column expressions over ``spark.range`` (no driver loops, no
UDFs), run end-to-end through the operator families the 100 TB design
claims rest on:

  d2  MinHash signatures -> banded LSH candidate pairs (hot-bucket salted)
  d7  edit-distance verification over the candidate pairs (JVM levenshtein)
  d6  duplicate groups: pointer-jumping connected components
  c8  Bloom-filter benchmark decontamination (n_bits-bounded broadcast)
  c7  training-mix chain: quality filter -> stratified sample ->
      per-domain cap -> repetition filter -> sequence packing

Per phase it records wall seconds, output rows, input MB/s, and the
SHUFFLE read/write byte deltas from the Spark UI REST API — the number
that must scale LINEARLY with input for the 100 TB story to hold.  A
control run at 10x smaller (``python corpusbench.py control``) gives the
linearity denominator: shuffle-bytes ratio between primary and control
should track the 10x row ratio, never the square.

The corpus plants near-duplicate groups (runs of 3 doc_ids share a seed
text, two of them with a one-word mutation) so dedup has real work:
~23% of docs sit in a 3-clique, LSH must recover ~2 pairs/group, and CC
must collapse each clique to one group id.  One domain (src0) holds 30%
of all docs to exercise cap_per_domain's hot-key gate, and doc_id % 997
== 0 marks the held-out "benchmark" slice for decontamination.

Run:   python corpusbench.py            # primary, ~10 GB text
       python corpusbench.py control    # 10x smaller, for linearity
       CORPUSBENCH_DOCS=25000000 python corpusbench.py   # ~50 GB
       CORPUSBENCH_PHASES=d2,d7,d6,c8 python corpusbench.py
           # phase-split decades: c7's shuffle writes ~2 GB/M docs, so
           # on the ~78 GB thin-provisioned box the third decade (40M
           # docs, ~57 GB parquet) only fits with c7 excluded; the
           # dedup/decontamination family's shuffles (~18 GB total at
           # 40M) do fit.  c7's own linearity is proven through 20M.
Writes one JSON line to stdout; append tables to SCALEBENCH.md by hand
(the curated history there is never machine-overwritten).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

N_DOCS = int(os.environ.get("CORPUSBENCH_DOCS", 5_000_000))
WORK_DIR = os.environ.get("CORPUSBENCH_DIR", "/tmp/corpusbench")
UI_PORT = int(os.environ.get("CORPUSBENCH_UI_PORT", 4046))
# 50k tokens (web-corpus order), hash-numbered so generation stays a pure
# projection.  The round-8 200-word vocab made accidental LSH band
# collisions dominate candidate growth (d7 shuffle 21x at 10x rows, all
# rejected by verification) — with ~50k tokens, 3-gram shingle space is
# ~1.25e14 so candidate volume tracks the PLANTED near-dup density.
VOCAB_SIZE = 50_000
SEQ_LEN = 2048


def host_load() -> float:
    with open("/proc/loadavg", encoding="utf-8") as f:
        return float(f.read().split()[0])


def get_spark():
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("corpusbench")
        .config("spark.driver.memory", os.environ.get("CORPUSBENCH_MEM", "96g"))
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.local.dir", os.path.join(WORK_DIR, "spark-tmp"))
        .getOrCreate()
    )


# -- shuffle/IO accounting via the UI REST API ------------------------------


def _stage_totals(spark) -> dict:
    """Cumulative bytes over all completed stages (UI REST API; local)."""
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages?status=complete"
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.load(r)
    except Exception:
        return {}
    out = {"shuffle_read": 0, "shuffle_write": 0, "input": 0, "output": 0}
    for s in stages:
        out["shuffle_read"] += s.get("shuffleReadBytes", 0)
        out["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        out["input"] += s.get("inputBytes", 0)
        out["output"] += s.get("outputBytes", 0)
    return out


class PhaseMeter:
    def __init__(self, spark):
        self.spark = spark
        self.phases: dict[str, dict] = {}
        self._last = _stage_totals(spark)

    def measure(self, name: str, fn):
        t0 = time.time()
        result = fn()
        wall = time.time() - t0
        now = _stage_totals(self.spark)
        delta = {
            k: now.get(k, 0) - self._last.get(k, 0) for k in now
        } if now and self._last else {}
        self._last = now or self._last
        rec = {"wall_sec": round(wall, 1), **{
            f"{k}_mb": round(v / 1e6, 1) for k, v in delta.items()
        }}
        # Nudge the JVM so ContextCleaner reaps the previous phase's
        # shuffle files promptly: on the ~78 GB thin-provisioned box the
        # 40M-doc run's parquet (~57 GB) plus two phases' un-reaped
        # shuffles would ENOSPC, while any single phase fits comfortably.
        try:
            self.spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        if isinstance(result, dict):
            rec.update({k: v for k, v in result.items() if not k.startswith("_")})
        self.phases[name] = rec
        print(f"# {name}: {rec}", flush=True)
        return result


# -- corpus generation (pure column expressions) ----------------------------


def generate_corpus(spark, out_dir: str, n_docs: int) -> dict:
    """documents.parquet at scale: deterministic word-salad text with
    planted near-dup 3-cliques, a hot domain, and a benchmark slice.

    Shape notes for 100 TB: everything is one narrow projection over
    ``spark.range`` (no shuffle, no UDF, no driver data); text bytes are
    born distributed, and the only wide op is the final file write."""
    from pyspark.sql import functions as F

    n_parts = max(64, n_docs // 40_000)
    df = spark.range(0, n_docs, 1, n_parts)
    # near-dup 3-cliques: ids {13m, 13m+1, 13m+2} share a seed
    seed = F.when(
        F.col("id") % 13 < 3, F.col("id") - (F.col("id") % 13)
    ).otherwise(F.col("id"))
    n_words = (120 + F.pmod(F.xxhash64(seed, F.lit(1)), F.lit(440))).cast("int")
    # token = "w" + hash-picked vocab index: a 50k vocab with ZERO plan
    # literals (an F.elt over 50k F.lit args would bloat the plan); stays
    # a whole-stage-codegen projection.
    word = lambda i: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.xxhash64(seed, i), F.lit(VOCAB_SIZE)).cast("string")
    )
    base_text = F.array_join(
        F.transform(F.sequence(F.lit(1), n_words), word), " "
    )
    # the two mutated clique members append one distinct word each:
    # shingle sets differ by ~2 of ~300 -> Jaccard ~0.99, LSH must hit
    text = F.when(
        (F.col("id") % 13).isin(1, 2),
        F.concat(base_text, F.lit(" mutated"), (F.col("id") % 13).cast("string")),
    ).otherwise(base_text)
    lang = F.elt(
        (1 + F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(10))).cast("int"),
        *[F.lit(x) for x in
          ["en", "en", "en", "en", "en", "en", "de", "fr", "es", "zh"]],
    )
    u = F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(100))
    source = F.when(u < 30, F.lit("src0")).otherwise(
        F.concat(F.lit("src"), (1 + u % 49).cast("string"))
    )
    out = df.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        source.alias("source"),
        F.length(text).alias("n_chars"),
    )
    if os.environ.get("CORPUSBENCH_INFLIGHT"):
        # Fourth-decade mode: 80M docs is ~115 GB parquet, past this
        # box's thin-provisioned free space — the corpus stays a
        # DETERMINISTIC PROJECTION the phases scan directly (byte-
        # identical rows to what the parquet would hold).  Shuffle-byte
        # linearity — the 100 TB claim under test — is unaffected (the
        # scan source feeds the same shuffles); wall clock swaps parquet
        # decode for text-generation CPU and is labeled as such in
        # SCALEBENCH.md.
        stats = out.agg(
            F.count(F.lit(1)).alias("rows"), F.sum("n_chars").alias("chars")
        ).collect()[0]
        return {
            "rows": stats["rows"],
            "text_gb": round(stats["chars"] / 1e9, 2),
            "parquet_gb": 0.0,
            "inflight": True,
            "_docs_df": out,
        }
    path = os.path.join(out_dir, "documents.parquet")
    out.write.mode("overwrite").parquet(path)
    stats = spark.read.parquet(path).agg(
        F.count(F.lit(1)).alias("rows"), F.sum("n_chars").alias("chars")
    ).collect()[0]
    disk = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
    )
    return {
        "rows": stats["rows"],
        "text_gb": round(stats["chars"] / 1e9, 2),
        "parquet_gb": round(disk / 1e9, 2),
    }


# -- phases -----------------------------------------------------------------


def run(n_docs: int, label: str) -> dict:
    from pyspark.sql import functions as F

    from ploverdb_spark.operators import dedup as D
    from ploverdb_spark.operators import packing as P
    from ploverdb_spark.operators import text as T
    from scalebench import jvm_peak_rss_gb

    # Self-gate on a quiet host (1-min AND 5-min load) like bench.py /
    # scalebench.py; CORPUSBENCH_NO_GATE=1 skips the bounded wait.
    if os.environ.get("CORPUSBENCH_NO_GATE"):
        load_gate = {"gate_passed": None, "waited_sec": 0.0}
    else:
        from ploverdb_spark.session import wait_for_quiet_host

        print("# waiting (<= 30 min) for quiet host ...", flush=True)
        load_gate = wait_for_quiet_host()
        print(f"# load gate: {load_gate}", flush=True)
    load0 = host_load()
    spark = get_spark()
    sf_dir = os.path.join(WORK_DIR, label)
    meter = PhaseMeter(spark)
    t_all = time.time()

    phases_env = os.environ.get("CORPUSBENCH_PHASES", "")
    enabled = {p.strip() for p in phases_env.split(",") if p.strip()} or None

    def on(phase: str) -> bool:
        return enabled is None or phase in enabled

    gen = meter.measure("gen", lambda: generate_corpus(spark, sf_dir, n_docs))
    docs = gen.pop("_docs_df", None)
    if docs is None:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    text_gb = gen["text_gb"]

    # d2: candidate pairs, persisted once for the two downstream verifiers
    # (exactly what a production dedup DAG does: candidates are the
    # expensive artifact, verify+group both reuse them)
    # xxhash64 hash family: the production configuration at corpus scale —
    # identical banded-LSH/Bloom DAG shapes (same shuffles, same bucketing,
    # same hot-key salting) with long hashes folded straight off the token
    # windows instead of md5-on-strings (the md5 family exists for DuckDB
    # oracle bit-parity; pytest pins family recall parity on planted dups).
    def d2():
        pairs = D.lsh_candidate_pairs(
            D.minhash_signatures(docs, hash_family="xxhash64"),
            distinct=True,
            hash_family="xxhash64",
        ).persist()
        return {"out_rows": pairs.count(), "_pairs": pairs}

    pairs = None
    if on("d2") or on("d7") or on("d6"):
        d2_res = meter.measure("d2_lsh_pairs", d2)
        pairs = d2_res.pop("_pairs")

    def d7():
        verified = D.edit_distance_pairs(pairs, docs)
        agg = verified.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("rel_distance") <= 0.05, 1).otherwise(0)
            ).alias("confirmed"),
        ).collect()[0]
        return {"out_rows": agg["n"], "confirmed_dups": agg["confirmed"]}

    if on("d7"):
        meter.measure("d7_edit_verify", d7)

    def d6():
        groups = D.connected_components(pairs)
        agg = groups.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("group_id").alias("n_groups"),
        ).collect()[0]
        return {"out_rows": agg["n"], "n_groups": agg["n_groups"]}

    if on("d6"):
        meter.measure("d6_dup_groups", d6)
    if pairs is not None:
        pairs.unpersist()

    def c8():
        grams = D.exploded_word_grams(docs, k=3, as_hash=True)
        bench = grams.where(F.col("doc_id") % 997 == 0).select("g").distinct()
        corpus = grams.where(F.col("doc_id") % 997 != 0).dropDuplicates(
            ["doc_id", "g"]
        )
        flagged = D.bloom_decontaminate(
            corpus, bench, n_bits=1 << 22, n_hashes=3, hash_family="xxhash64"
        )
        return {"out_rows": flagged.count()}

    if on("c8"):
        meter.measure("c8_bloom_decontamination", c8)

    def c12():
        """Token-window exact-substring decontamination at corpus scale,
        with an EXACT planted-overlap invariant: the only 13-token
        overlaps in the 50k-vocab word salad are within planted
        near-dup cliques (cross-clique collision space ~50000^13), so
        every corpus member of a clique containing a benchmark member
        must be flagged with exactly one span starting at token 1 with
        n_base - 12 matched windows (n_base = the clique seed's word
        count; the mutated members' appended token can never match), and
        nothing else may be flagged."""
        spans = D.token_window_decontaminate(
            docs, window=13, bench_mod=997, hash_family="xxhash64"
        ).persist()
        n_spans = spans.count()
        flagged = spans.select("doc_id").distinct()
        clique = docs.where(F.col("doc_id") % 13 < 3).select(
            "doc_id",
            (F.col("doc_id") - F.pmod(F.col("doc_id"), F.lit(13))).alias("m"),
        )
        bench_m = (
            clique.where(F.col("doc_id") % 997 == 0).select("m").distinct()
        )
        expected = clique.join(F.broadcast(bench_m), "m").where(
            F.col("doc_id") % 997 != 0
        )
        n_expected = expected.count()
        # both sides are distinct on doc_id, so after the union a doc
        # appears twice iff it is in BOTH sets; count != 2 = the
        # symmetric difference (over- or under-flagging)
        sym_diff = (
            flagged.unionByName(expected.select("doc_id"))
            .groupBy("doc_id")
            .count()
            .where(F.col("count") != 2)
            .count()
        )
        n_base = (
            120 + F.pmod(F.xxhash64(F.col("m"), F.lit(1)), F.lit(440))
        ).cast("int")
        bad_spans = (
            spans.join(expected.select("doc_id", "m"), "doc_id")
            .where(
                (F.col("span_start") != 1)
                | (F.col("n_windows") != n_base - 12)
            )
            .count()
        )
        out = {
            "out_rows": n_spans,
            "flagged_docs_expected": n_expected,
            "flag_set_symmetric_diff": sym_diff,
            "bad_span_geometry": bad_spans,
        }
        spans.unpersist()
        return out

    if on("c12"):
        meter.measure("c12_token_window_decontamination", c12)

    def c14():
        """Span redaction (the c12 remediation) at corpus scale, with an
        EXACT planted invariant stronger than c12's flag set: each
        clique's seed-copy member (doc_id % 13 == 0) is verbatim
        benchmark text, so its single span covers tokens 1..n_base and
        redaction keeps ZERO tokens; each mutated member keeps EXACTLY
        its one appended token, whose md5 ("mutated1"/"mutated2") is a
        closed-form constant.  Any geometry drift, off-by-one in the
        span merge, or tokenization mismatch between the scan and the
        surgery shows up as a nonzero violation count."""
        from ploverdb_spark.operators import curation as Cu

        spans = D.token_window_decontaminate(
            docs, window=13, bench_mod=997, hash_family="xxhash64"
        )
        red = Cu.redact_token_spans(docs, spans).persist()
        n_red = red.count()
        clique = docs.where(F.col("doc_id") % 13 < 3).select(
            "doc_id",
            (F.col("doc_id") - F.pmod(F.col("doc_id"), F.lit(13))).alias("m"),
        )
        bench_m = (
            clique.where(F.col("doc_id") % 997 == 0).select("m").distinct()
        )
        expected = clique.join(F.broadcast(bench_m), "m").where(
            F.col("doc_id") % 997 != 0
        )
        n_expected = expected.count()
        sym_diff = (
            red.select("doc_id")
            .unionByName(expected.select("doc_id"))
            .groupBy("doc_id")
            .count()
            .where(F.col("count") != 2)
            .count()
        )
        n_base = (
            120 + F.pmod(F.xxhash64(F.col("m"), F.lit(1)), F.lit(440))
        ).cast("int")
        mod = F.pmod(F.col("doc_id"), F.lit(13))
        ok_seed = (mod == 0) & (F.col("n_tokens_kept") == 0)
        ok_mut = (
            mod.isin(1, 2)
            & (F.col("n_tokens_kept") == 1)
            & (
                F.col("redacted_hash")
                == F.md5(F.concat(F.lit("mutated"), mod.cast("string")))
            )
        )
        bad = (
            red.join(expected.select("doc_id", "m"), "doc_id")
            .where(
                ~(ok_seed | ok_mut)
                | (F.col("n_spans") != 1)
                | (F.col("n_tokens_removed") != n_base)
            )
            .count()
        )
        out = {
            "out_rows": n_red,
            "flagged_docs_expected": n_expected,
            "flag_set_symmetric_diff": sym_diff,
            "bad_redaction_rows": bad,
        }
        red.unpersist()
        return out

    if on("c14"):
        meter.measure("c14_span_redaction", c14)

    def c7():
        feats = T.text_features(docs).select(
            "doc_id", "n_tokens", "quality_score"
        )
        clean = (
            docs.join(feats, "doc_id")
            .where(
                (F.col("quality_score") >= 0.4) & (F.col("n_tokens") >= 20)
            )
            .select(*docs.columns)
        )
        samp = P.stratified_sample(clean, {"en": 0.5})
        capped = P.cap_per_domain(samp, cap=max(1000, n_docs // 500))
        # aggregation barrier before the repetition filter — see the
        # pushdown-substitution note at queries/pipeline.py c7_training_mix
        # (measured 80x: 180 ms/doc inlined vs 2.2 ms/doc staged)
        keep = (
            T.repetition_scores(capped)
            .groupBy("doc_id")
            .agg(F.max("top_bigram_frac").alias("__frac"))
            .where(F.col("__frac") < 0.3)
            .select("doc_id")
        )
        calm = capped.join(keep, "doc_id", "left_semi")
        packed = P.pack_sequences(calm, seq_len=SEQ_LEN, n_shards=64)
        agg = packed.agg(
            F.count(F.lit(1)).alias("docs"),
            F.countDistinct("shard", "seq_idx").alias("sequences"),
        ).collect()[0]
        return {"out_rows": agg["docs"], "sequences": agg["sequences"]}

    if on("c7"):
        meter.measure("c7_training_mix", c7)

    report = {
        "metric": "corpusbench",
        "label": label,
        "n_docs": n_docs,
        "text_gb": text_gb,
        "parquet_gb": gen["parquet_gb"],
        "total_wall_sec": round(time.time() - t_all, 1),
        "host_load_avg_start": load0,
        "load_gate": load_gate,
        "peak_jvm_rss_gb": jvm_peak_rss_gb(spark),
        "phases": meter.phases,
    }
    for name, rec in meter.phases.items():
        if name != "gen" and rec.get("wall_sec"):
            rec["input_mb_per_sec"] = round(text_gb * 1000 / rec["wall_sec"], 1)
    spark.stop()
    shutil.rmtree(os.path.join(sf_dir), ignore_errors=True)
    return report


def main() -> None:
    label = "control" if "control" in sys.argv[1:] else "primary"
    n_docs = N_DOCS // 10 if label == "control" else N_DOCS
    report = run(n_docs, label)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
