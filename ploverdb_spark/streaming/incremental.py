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

from ploverdb_spark.build.closure import (
    apply_closure_prunes,
    extend_closure,
    subclass_edges,
)
from ploverdb_spark.build.ingest import build_edges_bidir, flip_noncanonical_edges
from ploverdb_spark.ontology.biolink_lite import BiolinkLite, default_model

# Seen-id sidecar layout: hash-partitioned so per-batch dedup reads only
# the partitions the batch's ids can live in (O(batch neighborhood), not
# O(accumulated artifact)).  256 buckets keeps directories coarse enough
# for small deployments while still pruning ~everything at 100 TB scale
# when a batch touches a handful of buckets.
N_ID_BUCKETS = 256


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Explicit existence probe via the Hadoop FileSystem API (works for
    any scheme, local or object store) — replaces the old
    ``except Exception: pass`` around the read, which also swallowed real
    read errors (a corrupt artifact would have caused silent duplicate
    ingestion)."""
    fs, hpath, _ = _hadoop_fs(spark, path)
    return fs.exists(hpath)


def _has_committed_files(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` holds at least one COMMITTED data file.  A crash
    during the very first append can leave the directory with only the
    committer's ``_temporary`` scratch inside — ``fs.exists`` is then
    true but ``spark.read.parquet`` throws on every replay, poisoning the
    stream.  Readers must gate on committed files, not bare existence."""
    fs, hpath, _ = _hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return False
    root = hpath.toUri().getPath()
    it = fs.listFiles(hpath, True)  # recursive: sees bucket partitions
    while it.hasNext():
        p = it.next().getPath().toUri().getPath()
        rel = p[len(root) :].lstrip("/")
        # every path segment must be a real data segment — files under
        # _temporary/ (committer scratch) or any hidden dir don't count
        if all(
            not seg.startswith("_") and not seg.startswith(".")
            for seg in rel.split("/")
        ):
            return True
    return False


def _atomic_swap_in(spark: SparkSession, tmp_path: str, final_path: str) -> None:
    """Promote a fully-written temp dir over ``final_path`` via renames
    (rename is atomic per path on HDFS/local; the final→old→delete dance
    leaves a recoverable state at every crash point — see
    :func:`_read_swappable`)."""
    fs, final, jvm = _hadoop_fs(spark, final_path)
    tmp = jvm.org.apache.hadoop.fs.Path(tmp_path)
    old = jvm.org.apache.hadoop.fs.Path(final_path + ".old")
    if fs.exists(old):
        fs.delete(old, True)
    if fs.exists(final):
        fs.rename(final, old)
    fs.rename(tmp, final)
    fs.delete(old, True)


def _read_swappable(spark: SparkSession, final_path: str) -> DataFrame | None:
    """Read an artifact maintained by :func:`_atomic_swap_in`, recovering
    from a crash mid-swap: if the final dir is missing, a COMPLETE
    ``.tmp`` (written before any rename; complete iff the writer's
    ``_SUCCESS`` marker exists — a truncated first write must never be
    promoted and served as the full artifact) or ``.old`` (the pre-swap
    version) is promoted back.  An incomplete ``.tmp`` is deleted so the
    next write starts clean."""
    fs, final, jvm = _hadoop_fs(spark, final_path)
    if not fs.exists(final):
        tmp = jvm.org.apache.hadoop.fs.Path(final_path + ".tmp")
        if fs.exists(tmp):
            if fs.exists(jvm.org.apache.hadoop.fs.Path(final_path + ".tmp/_SUCCESS")):
                fs.rename(tmp, final)
            else:
                fs.delete(tmp, True)
        if not fs.exists(final):
            old = jvm.org.apache.hadoop.fs.Path(final_path + ".old")
            if fs.exists(old):
                fs.rename(old, final)
            else:
                return None
    return spark.read.parquet(final_path)


def _with_bucket(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "id_bucket", F.pmod(F.xxhash64("id"), F.lit(N_ID_BUCKETS))
    )


def seen_ids_reader(
    spark: SparkSession, sidecar_path: str, buckets: list[int]
) -> DataFrame:
    """The per-batch view of the seen-id sidecar: partition-pruned to the
    hash buckets the batch's ids can occupy.  ``id_bucket`` is a physical
    partition column, so this scan touches only ``len(buckets)`` of the
    ``N_ID_BUCKETS`` directories regardless of total accumulated ids."""
    return (
        spark.read.parquet(sidecar_path)
        .where(F.col("id_bucket").isin([int(b) for b in buckets]))
        .select("id")
    )


def _clear_committer_scratch(spark: SparkSession, path: str) -> None:
    """Delete ``<path>/_temporary`` left by a crashed append.  Batch jobs
    all commit under ``_temporary/0`` (the Hadoop committer's job id is
    always 0), so stale scratch from a crashed write collides with the
    NEXT append's commitJob on top of poisoning bare reads.  The stream
    is the artifact's only writer, so clearing scratch between batches is
    always safe."""
    scratch = f"{path.rstrip('/')}/_temporary"
    fs, hpath, _ = _hadoop_fs(spark, scratch)
    if fs.exists(hpath):
        fs.delete(hpath, True)


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
    id).

    Replay safety: ``foreachBatch`` is AT-LEAST-ONCE — a batch can be
    re-delivered after a crash anywhere between its two writes (artifact
    rows, then sidecar ids).  The appends are made content-idempotent by
    deduping the artifact append against BOTH the seen-id sidecar AND the
    artifact slice itself: the artifact is laid out partitioned by
    ``id_bucket``, so the self-check reads only the batch's bucket
    partitions (id column only) — a replayed batch whose rows landed but
    whose sidecar append was lost finds its ids already in the artifact
    and appends nothing.  Re-appending ids to the sidecar is harmless
    (existence semantics).

    Scale design: dedup against already-served ids goes through a compact
    ids-only sidecar (``edge_ids_seen.parquet``) hash-partitioned into
    :data:`N_ID_BUCKETS` buckets — each batch reads ONLY the bucket
    partitions its own ids hash into, so per-batch work is proportional
    to the batch, never to the accumulated artifact (the old design
    re-scanned + re-shuffled the entire ``edges_bidir`` artifact every
    batch, a non-starter at 30M+ edges).  The idempotency self-check
    follows the same bucket pruning.  Deployments whose artifact predates
    the bucketed layout keep the flat layout (mixing would break
    partition discovery) and pay a full id-column scan for the
    self-check instead.

    Batches carrying subclass edges also fold them into the
    subclass-closure artifacts via :func:`extend_closure`:
    ``subclass_closure_full.parquet`` holds the UNPRUNED depth-tracked
    closure (pruned pairs still serve as path segments, so the maintained
    state must keep them — reference plover.py:1652-1661 semantics), and
    the served ``subclass_closure.parquet`` is re-derived from it with
    :func:`apply_closure_prunes` after every fold.  Both artifacts are
    replaced via write-temp-then-rename (:func:`_atomic_swap_in`) instead
    of overwrite-in-place, so a crash mid-write can never corrupt the
    only copy.
    """
    model = model or default_model()
    raw = (
        spark.readStream.schema(edge_schema)
        .option("maxFilesPerTrigger", 8)
        .json(drop_dir)
    )
    artifact = f"{out_dir}/edges_bidir.parquet"
    sidecar = f"{out_dir}/edge_ids_seen.parquet"
    closure_full_path = f"{out_dir}/subclass_closure_full.parquet"
    closure_served_path = f"{out_dir}/subclass_closure.parquet"

    def _artifact_bucketed(session: SparkSession) -> bool:
        """Fresh deployments use the id_bucket-partitioned layout; an
        existing flat artifact keeps its layout (mixing loose files with
        partition dirs breaks Spark's partition discovery).  A directory
        with no COMMITTED files (first-append crash debris) counts as
        fresh, not legacy-flat."""
        if not _has_committed_files(session, artifact):
            return True
        fs, hpath, _ = _hadoop_fs(session, artifact)
        for st in fs.listStatus(hpath):
            if st.getPath().getName().startswith("id_bucket="):
                return True
        return False

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        session = batch_df.sparkSession
        _clear_committer_scratch(session, artifact)
        _clear_committer_scratch(session, sidecar)
        edges = flip_noncanonical_edges(batch_df, model)
        bidir = _with_bucket(build_edges_bidir(edges, nodes)).persist()
        try:
            if not _has_committed_files(
                session, sidecar
            ) and _has_committed_files(session, artifact):
                # Migration: deployment predates the sidecar — backfill it
                # from the artifact once (the only remaining full scan).
                # Only FULLY-committed edges qualify: an id whose append
                # lost one direction row to a partial job commit must not
                # be marked seen, or the artifact self-check below never
                # gets the chance to restore the missing row.
                complete = (
                    session.read.parquet(artifact)
                    .groupBy("id")
                    .agg(F.countDistinct("direction").alias("__nd"))
                    .where(F.col("__nd") >= 2)
                    .select("id")
                )
                _with_bucket(complete).write.partitionBy(
                    "id_bucket"
                ).mode("overwrite").parquet(sidecar)
            batch_ids = bidir.select("id", "id_bucket").distinct().persist()
            bucketed = _artifact_bucketed(session)
            new_rows, new_ids = bidir, batch_ids
            buckets = [
                r.id_bucket
                for r in batch_ids.select("id_bucket").distinct().collect()
            ]
            if _has_committed_files(session, sidecar):
                seen = seen_ids_reader(session, sidecar, buckets)
                new_rows = new_rows.join(seen, on="id", how="left_anti")
                new_ids = new_ids.join(seen, on="id", how="left_anti")
            if _has_committed_files(session, artifact):
                # Replay idempotency: a retried epoch whose rows landed but
                # whose sidecar append was lost must not re-append.  Check
                # the artifact itself, pruned to the batch's buckets (flat
                # legacy layout: full scan of the two key columns).  The
                # anti-join key is (id, direction), NOT id alone: each edge
                # writes a forward and a reverse row from different tasks,
                # and a crash mid job-commit can land one without the
                # other — keying by id would make the replay drop the
                # missing direction row forever.
                prior = session.read.parquet(artifact)
                if bucketed:
                    prior = prior.where(
                        F.col("id_bucket").isin([int(b) for b in buckets])
                    )
                new_rows = new_rows.join(
                    prior.select("id", "direction").distinct(),
                    on=["id", "direction"],
                    how="left_anti",
                )
            if bucketed:
                new_rows.write.partitionBy("id_bucket").mode("append").parquet(
                    artifact
                )
            else:
                new_rows.drop("id_bucket").write.mode("append").parquet(
                    artifact
                )
            new_ids.write.partitionBy("id_bucket").mode("append").parquet(
                sidecar
            )
            batch_ids.unpersist()
        finally:
            bidir.unpersist()

        sub_pairs = subclass_edges(edges)
        if not sub_pairs.isEmpty():
            full = _read_swappable(session, closure_full_path)
            if full is None:
                full = session.createDataFrame(
                    [], "ancestor string, descendant string, depth int"
                )
            updated = extend_closure(full, sub_pairs)  # localCheckpointed
            tmp = f"{closure_full_path}.tmp"
            updated.write.mode("overwrite").parquet(tmp)
            _atomic_swap_in(session, tmp, closure_full_path)
            served_tmp = f"{closure_served_path}.tmp"
            apply_closure_prunes(updated).write.mode("overwrite").parquet(
                served_tmp
            )
            _atomic_swap_in(session, served_tmp, closure_served_path)

    writer = raw.writeStream.foreachBatch(process_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def fold_session_events(
    state: tuple[int, int, int] | None,
    ts_sorted: list[int],
    gap_sec: int,
) -> tuple[list[tuple[int, int, int]], tuple[int, int, int] | None]:
    """Fold a sorted batch of event timestamps into an open session.

    Pure core of :func:`stream_sessionize` (unit-testable without a
    stream).  Returns ``(closed_sessions, open_state)`` where each state
    is ``(start, end, n_events)``.

    Out-of-order handling: an event that predates the open session's
    bounds (carried over from a prior batch) folds in via min/max — it
    must never move the session end BACKWARDS, else a later in-order
    event reads as a > gap_sec jump and falsely splits one session in
    two.
    """
    start, end, n = state if state is not None else (None, None, 0)
    closed: list[tuple[int, int, int]] = []
    for t in ts_sorted:
        if start is None:
            start, end, n = t, t, 1
        elif t - end > gap_sec:
            closed.append((start, end, n))
            start, end, n = t, t, 1
        else:
            start, end, n = min(start, t), max(end, t), n + 1
    open_state = (start, end, n) if start is not None else None
    return closed, open_state


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
        prior = tuple(state.get) if state.exists else None
        closed, open_state = fold_session_events(prior, ts, gap_sec)
        if open_state is not None:
            state.update(open_state)
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

def stream_document_deltas(
    spark: SparkSession,
    drop_dir: str,
    doc_schema: StructType,
    out_dir: str,
    checkpoint_dir: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> StreamingQuery:
    """Stream document files (JSONL) from ``drop_dir`` into an
    exact-deduplicated corpus artifact — the continuous-ingest front of a
    training-data pipeline (crawl batches land as files; only
    never-seen-before content enters the corpus).

    Per micro-batch: hash content (``md5(text)``), keep the smallest id
    per hash WITHIN the batch, then drop hashes already accepted by any
    earlier batch.  The seen-hash set lives in a sidecar hash-partitioned
    into :data:`N_ID_BUCKETS` buckets by ``xxhash64(content_hash)``, and
    the batch reads only the bucket partitions its own hashes land in —
    per-batch cost is O(batch), never O(corpus), the same scale shape as
    :func:`stream_edge_deltas`.

    Replay safety (foreachBatch is at-least-once): the corpus artifact is
    itself partitioned by ``hash_bucket``, and the append is deduped
    against the bucket-pruned artifact slice as well as the sidecar — a
    replayed batch whose rows landed but whose sidecar append was lost
    appends nothing.
    """
    from pyspark.sql import Window

    artifact = f"{out_dir}/corpus.parquet"
    sidecar = f"{out_dir}/doc_hashes_seen.parquet"
    raw = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", 8)
        .json(drop_dir)
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        session = batch_df.sparkSession
        _clear_committer_scratch(session, artifact)
        _clear_committer_scratch(session, sidecar)
        hashed = batch_df.withColumn("content_hash", F.md5(F.col(text_col)))
        w = Window.partitionBy("content_hash").orderBy(id_col)
        uniq = (
            hashed.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn(
                "hash_bucket",
                F.pmod(F.xxhash64("content_hash"), F.lit(N_ID_BUCKETS)),
            )
            .persist()
        )
        try:
            buckets = [
                int(r.hash_bucket)
                for r in uniq.select("hash_bucket").distinct().collect()
            ]
            new_rows = uniq
            if _has_committed_files(session, sidecar):
                seen = (
                    session.read.parquet(sidecar)
                    .where(F.col("hash_bucket").isin(buckets))
                    .select("content_hash")
                )
                new_rows = new_rows.join(
                    seen, on="content_hash", how="left_anti"
                )
            if _has_committed_files(session, artifact):
                prior = (
                    session.read.parquet(artifact)
                    .where(F.col("hash_bucket").isin(buckets))
                    .select("content_hash")
                    .distinct()
                )
                new_rows = new_rows.join(
                    prior, on="content_hash", how="left_anti"
                )
            # persist: the corpus append and the sidecar append must not
            # each re-run the window + anti-join + artifact-scan lineage
            new_rows = new_rows.persist()
            try:
                new_rows.write.partitionBy("hash_bucket").mode(
                    "append"
                ).parquet(artifact)
                new_rows.select(
                    "content_hash", "hash_bucket"
                ).write.partitionBy("hash_bucket").mode("append").parquet(
                    sidecar
                )
            finally:
                new_rows.unpersist()
        finally:
            uniq.unpersist()

    writer = raw.writeStream.foreachBatch(process_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
