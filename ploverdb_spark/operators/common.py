"""Shared operator utilities."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession

_DEFAULT_MAX_SPLIT_BYTES = 128 * 1024 * 1024


def ensure_worker_imports(spark: SparkSession) -> None:
    """Make ``ploverdb_spark`` importable on executor Python workers.

    cloudpickle serializes module-level functions *by reference*, so a
    pandas UDF that closes over e.g. ``operators.multimodal.decode_png``
    needs the package importable on the worker.  When the driver runs
    from the repo root that is free (cwd is on ``sys.path`` and local
    workers inherit it), but a driver launched from any other cwd — or a
    real cluster whose executors never saw the repo checkout — fails
    with ``ModuleNotFoundError`` at task time.  Shipping the package via
    ``sc.addPyFile`` (a ~100 KB source zip, sent once per session and
    cached per executor) removes the deployment assumption entirely; on
    a 1000-executor cluster this is exactly how Python deps ride along.

    Idempotent per SparkContext; fail-safe (a sandboxed driver that
    cannot write the temp zip just keeps the cwd assumption).
    """
    sc = spark.sparkContext
    if getattr(sc, "_ploverdb_pyfiles_shipped", False):
        return
    try:
        pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        zpath = os.path.join(
            tempfile.gettempdir(), f"ploverdb_spark_pyfiles_{os.getpid()}.zip"
        )
        with zipfile.ZipFile(zpath, "w") as zf:
            for dirpath, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if fname.endswith(".py"):
                        full = os.path.join(dirpath, fname)
                        rel = os.path.join(
                            "ploverdb_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
        sc.addPyFile(zpath)
        sc._ploverdb_pyfiles_shipped = True
    except Exception:
        pass


def _size_suffix_to_bytes(v: str) -> int:
    """Parse Spark size-conf strings ('134217728', '134217728b', '128MB')."""
    s = v.strip().lower()
    mult = 1
    for suffix, m in (
        ("tb", 1024**4), ("gb", 1024**3), ("mb", 1024**2), ("kb", 1024),
        ("t", 1024**4), ("g", 1024**3), ("m", 1024**2), ("k", 1024),
        ("b", 1),
    ):
        if s.endswith(suffix):
            s = s[: -len(suffix)]
            mult = m
            break
    return int(float(s) * mult)


def fan_out_narrow_input(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a *small* input so a CPU-bound projection
    uses every core.

    OPT-IN: call this only where the downstream work is CPU-heavy per
    input byte (md5 shingle hashing over token arrays, pixel decode) —
    for cheap projections the shuffle costs more than the parallelism
    buys (round-4 bench: the similarity family regressed 1.6-1.8x when
    this wrapped a plain Arrow-cosine scan, so those call sites dropped
    it).

    The gate uses Catalyst's size estimate (``optimizedPlan().stats()``
    — a plan-time constant, no job, no plan-to-RDD conversion like the
    old ``df.rdd.getNumPartitions()`` probe): the scan will emit roughly
    ``est_bytes / spark.sql.files.maxPartitionBytes`` splits, and once
    that's at least HALF the target parallelism the repartition is
    skipped — at >= target/2 natural splits the cores are already mostly
    busy and the all-to-all shuffle costs more than the residual idle
    cores (the earlier ``>= target`` form repartitioned a ~3 GiB input
    emitting ~24 of 32 splits for marginal gain).  At real scale the
    input always clears the bar, so this is a no-op there — the
    condition, not the repartition, is the scale story.  (Measured at
    sf0.1: 2.3s -> 1.6s for the LSH pair plan.)
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        # py4j maps scala.BigInt to a plain Python int for some Spark
        # versions and returns the Java object for others — accept both
        # (the .toString()-only form silently threw on the int case,
        # which turned the gate into its except-path behavior)
        raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        est_bytes = int(raw.toString()) if hasattr(raw, "toString") else int(raw)
        max_split = _size_suffix_to_bytes(
            spark.conf.get(
                "spark.sql.files.maxPartitionBytes", str(_DEFAULT_MAX_SPLIT_BYTES)
            )
        )
    except Exception:
        # Stats probe unavailable (e.g. Spark Connect has no df._jdf, or an
        # internal-API change).  Fail SAFE: skip the fan-out rather than
        # shuffle an input of unknown size — an unconditional repartition
        # here would collapse a multi-TB scan to ~defaultParallelism giant
        # partitions.  Worst case we lose a small-input optimization.
        return df
    try:
        # Known-row-count leg: Catalyst's BYTE estimate undercounts
        # computed/generated sources by orders of magnitude (a
        # range->concat text projection estimates ~34 B/row while the
        # actual text is kilobytes — measured in corpusbench's in-flight
        # fourth decade, where the byte leg repartitioned a 92 GB corpus
        # it had estimated at ~1.4 GB: a 72 GB all-to-all shuffle for
        # zero parallelism gain).  When the plan KNOWS its row count
        # (range / local relations — exactly the source shapes whose
        # byte estimates lie) and it is at least 1M rows, the input is
        # never "narrow" in the sense this guard exists for (1-2-split
        # tiny test files); skip.  File sources have no plan row count
        # and keep the byte leg.
        row_opt = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
        if row_opt.isDefined() and int(row_opt.get().toString()) >= 1_000_000:
            return df
    except Exception:
        pass  # byte leg below decides
    est_splits = est_bytes // max_split
    if est_splits >= max(1, target // 2):
        return df
    return df.repartition(target)
