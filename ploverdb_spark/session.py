"""SparkSession factory tuned for both local testing and cluster scale.

Local mode runs a single JVM with N threads; on a real cluster the same
settings hold (AQE handles runtime re-planning, skew joins and partition
coalescing).  ``spark.sql.session.timeZone=UTC`` is pinned so timestamp
results compare exactly against the DuckDB oracle (DuckDB timestamps are
UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Sized for local[32] testing; on a 1000-executor cluster these would be set
# by the deployment (shuffle.partitions ~ 2-3x total cores, autoBroadcast
# threshold per executor memory).
_DEFAULTS = {
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Coalesce small post-shuffle partitions instead of maximizing task
    # count — tiny stages otherwise pay 32-128x scheduling overhead.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Concurrent queries share the session fairly instead of FIFO-starving
    # (serving stance — the reference runs 8-16 parallel workers).
    "spark.scheduler.mode": "FAIR",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    "spark.ui.enabled": "false",
    "spark.sql.parquet.filterPushdown": "true",
    # limit().collect() otherwise probes 1 partition, then 4, 16, ... —
    # on a selective serving lookup (few matching rows) that is 4
    # SEQUENTIAL job waves per query (~1.3s measured at 30M-edge scale
    # where the single parallel wave costs ~0.2s).  Serving latency wants
    # one wave over all partitions.
    "spark.sql.limit.initialNumPartitions": "10000",
    # Keep pinned-id IN-lists in their In form (default converts >10
    # values to InSet): cached-scan stat pruning evaluates In per value
    # but ignores InSet entirely — measured 2x+ on scattered-id lookups
    # at 30M-edge scale (doubly-pinned 1.26s -> 0.56s).
    "spark.sql.optimizer.inSetConversionThreshold": "1024",
    # Spark 4.1's checksummed checkpoint writer deadlocks its async
    # commit on local-FS stateful-streaming state stores (observed:
    # HDFSBackedStateStore.commit stuck in
    # ChecksumCheckpointFileManager.awaitResult); plain checkpoint files
    # are fine for this engine's streaming operators.
    "spark.sql.streaming.checkpoint.fileChecksum.enabled": "false",
}


def get_spark(app_name: str = "ploverdb_spark", extra_conf: dict | None = None) -> SparkSession:
    """Return (or create) the singleton SparkSession.

    If a session already exists (e.g. the driver created one and passed it
    to ``entry()``), its config wins; we only apply defaults on first
    creation.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
