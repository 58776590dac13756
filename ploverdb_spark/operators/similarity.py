"""Similarity search over embedding columns.

Two paths:
- brute-force cosine top-k (the correctness baseline): query set is tiny
  and broadcast; candidates stream through one scan — no shuffle except
  the final per-query top-k.
- IVF (inverted-file) top-k (the 100 TB scale path): centroids from a
  cheap distributed aggregation (here: per-label means, i.e. one k-means
  step with given assignments), queries probe only their nearest cell(s),
  so the candidate set is |cell| not |corpus|.

The top-k itself is a window row_number over (query, score) — Spark's
native top-k-per-group pattern with partial sort pushdown.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ploverdb_spark.operators.dedup import QUANT_SCALE, quantized_cosine_udf

TOPK_SALT = 16


def topk_per_query(scored: DataFrame, k: int, salt: int = TOPK_SALT) -> DataFrame:
    """Exact two-phase top-k per query_id over (cos desc, neighbor_id asc).

    A single window over query_id funnels EVERY scored row of a query into
    one partition — at corpus scale that one task is the whole job.  Phase
    1 takes the local top-k within (query_id, neighbor_id %% salt) groups;
    any global top-k row necessarily survives its salt group, so phase 2's
    window sees at most salt*k rows per query.  Results are identical to
    the one-window form (same tie-break), shuffle volume is bounded.
    """
    w1 = Window.partitionBy("query_id", "__salt").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("__salt", F.col("neighbor_id") % salt)
        .withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos")
        )
    )


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for the given query ids against the full corpus."""
    queries = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb")
    )
    # No fan-out here: the per-row Arrow cosine is cheap relative to the
    # shuffle a repartition costs (round-4 bench: +77% on s1 with it), and
    # at real scale the scan already has >= cores splits.
    candidates = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_emb")
    )
    qcos = quantized_cosine_udf()
    scored = (
        candidates.crossJoin(F.broadcast(queries))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", qcos(F.col("q_emb"), F.col("c_emb")))
    )
    return topk_per_query(scored, k)


def ivf_centroids(
    embeddings: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell centroid vectors via elementwise mean — a distributed
    aggregate (posexplode + groupBy), no driver-side math.

    Components are int64-quantized (``floor(x * 1e7 + 0.5)``) before
    summing, so the per-cell sums are exact integers and the mean is a
    single float division — accumulation-order-independent and therefore
    exactly reproducible in a SQL oracle (same trick as
    :func:`quantized_cosine_udf`)."""
    exploded = embeddings.select(
        F.col(cell_col).alias("cell"), F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    qv = F.floor(F.col("v").cast("double") * QUANT_SCALE + 0.5).cast("long")
    return (
        exploded.select("cell", "pos", qv.alias("qv"))
        .groupBy("cell", "pos")
        .agg(F.sum("qv").alias("qsum"), F.count(F.lit(1)).alias("n"))
        .withColumn(
            "mean_v",
            F.col("qsum").cast("double")
            / (F.col("n").cast("double") * float(QUANT_SCALE)),
        )
        .groupBy("cell")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "mean_v"))
            ).alias("pairs")
        )
        .select(
            "cell",
            F.transform(F.col("pairs"), lambda p: p.mean_v).alias("centroid"),
        )
    )


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    assignment_rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Learned IVF cells: Lloyd's k-means by cosine, fully deterministic
    so a SQL oracle can replay it exactly.

    - init: centroid j = the vector whose id is j (fixed seeds, no RNG);
    - assignment: argmax quantized-cosine, ties to the smallest cell id
      (one broadcast of K x dim; the scored set is |corpus| x K rows but
      never materializes — row_number keeps the top-1 per vector);
    - update: int64-quantized elementwise mean (:func:`ivf_centroids`) —
      exact integer sums, so accumulation order cannot perturb centroids.

    ``assignment_rounds`` assignments run with centroid updates between
    them (2 rounds = assign -> update -> assign).  Returns (id, cell).
    """
    centroids = embeddings.where(F.col(id_col) < k).select(
        F.col(id_col).cast("int").alias("cell"), F.col(vec_col).alias("centroid")
    )
    assign = None
    for r in range(assignment_rounds):
        # Assignment is a PURE MAP: the K x dim centroid matrix is
        # K-sized (not data-sized), so it collects to the driver and
        # rides into an Arrow UDF closure — every vector scores all K
        # cells in one numpy matmul with zero shuffle and zero row
        # blow-up.  (The earlier shape crossJoined |corpus| x K rows and
        # ranked them with a per-vector window — a full shuffle per
        # round whose only output was an argmax.)  Ties break to the
        # smallest cell id: rows are sorted by cell and np.argmax takes
        # the first maximum, matching the SQL oracle's
        # (sim DESC, cell ASC) ranking.
        cent_rows = sorted(
            (row["cell"], np.asarray(row["centroid"], dtype=np.float64))
            for row in centroids.collect()
        )
        cells = np.array([c for c, _ in cent_rows], dtype=np.int32)
        Cq = np.floor(
            np.stack([v for _, v in cent_rows]) * QUANT_SCALE + 0.5
        ).astype(np.int64)
        cnorm = np.sqrt((Cq * Cq).sum(axis=1).astype(np.float64))

        @F.pandas_udf("int")
        def assign_cell(v: pd.Series) -> pd.Series:
            M = np.stack(v.to_numpy()).astype(np.float64)
            Q = np.floor(M * QUANT_SCALE + 0.5).astype(np.int64)
            cos = (Q @ Cq.T).astype(np.float64) / (
                np.sqrt((Q * Q).sum(axis=1).astype(np.float64))[:, None]
                * cnorm[None, :]
            )
            return pd.Series(cells[np.argmax(cos, axis=1)])

        assign = embeddings.select(
            id_col, vec_col, assign_cell(F.col(vec_col)).alias("cell")
        )
        if r < assignment_rounds - 1:
            centroids = ivf_centroids(assign, cell_col="cell", vec_col=vec_col)
    return assign.select(id_col, "cell")


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe_cells: int = 1,
) -> DataFrame:
    """Approximate top-k: route each query to its ``n_probe_cells`` nearest
    centroids, then brute-force only within those cells.

    At 100 TB: centroids are broadcast (K x dim doubles), the candidate
    join is an equi-join on the cell id — candidate volume is
    |query| x |cell| instead of |query| x |corpus|.  Store the corpus
    PARTITIONED BY the cell column and Spark's dynamic partition pruning
    turns this broadcast join into a probed-cells-only scan at runtime —
    the whole routing + pruning stays ONE lazy plan.  (Collecting the
    routing driver-side and pushing a literal cell IN was tried and
    measured SLOWER: it splits the query into three actions whose
    scheduling overhead exceeds the scan savings on anything but a
    cell-partitioned store, where DPP already gets the same pruning for
    free.)
    """
    centroids = ivf_centroids(embeddings, cell_col, vec_col)
    queries = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
    )
    qcos = quantized_cosine_udf()
    routed = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("cdist", qcos(F.col("q_emb"), F.col("centroid")))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("cdist").desc(), F.col("cell"))
    probe = (
        routed.withColumn("crank", F.row_number().over(wq))
        .where(F.col("crank") <= n_probe_cells)
        .select("query_id", "q_emb", "cell")
    )
    candidates = embeddings.select(
        F.col(cell_col).alias("cell"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_emb"),
    )
    scored = (
        candidates.join(F.broadcast(probe), on="cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", qcos(F.col("q_emb"), F.col("c_emb")))
    )
    return topk_per_query(scored, k)


def quantize_embeddings(
    embeddings: DataFrame,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int quantization — the storage-compression
    step a 100 TB embedding store runs before shipping vectors to
    training or ANN serving (4x smaller than float32 at 8 bits).

    Per vector: ``scale = max(|x_i|)``; each component maps to
    ``floor(x_i / scale * qmax + 0.5)`` with ``qmax = 2^(bits-1) - 1``
    (127 for int8).  All math is elementwise IEEE double with
    order-independent reductions (max, not sum), so a SQL oracle
    reproduces it bit-for-bit.  Returns (id, n_dims, scale, q,
    max_abs_err) where ``max_abs_err`` is the per-vector worst-case
    reconstruction error — the metric that decides whether int8 is safe
    for the downstream consumer.

    Pure Column expressions over one scan: zero shuffles, zero UDFs —
    embarrassingly parallel at any scale.  The scale column is staged in
    its own projection so the per-element lambda does not re-evaluate the
    array_max per component (same quadratic-per-row trap as
    ``shingles_of``).
    """
    qmax = float(2 ** (bits - 1) - 1)
    v = F.col(vec_col)
    staged = embeddings.select(
        F.col(id_col),
        v,
        F.size(v).alias("n_dims"),
        F.greatest(
            F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))),
            F.lit(0.0),
        ).alias("__absmax"),
    ).select(
        F.col(id_col),
        v,
        "n_dims",
        F.when(F.col("__absmax") > 0, F.col("__absmax"))
        .otherwise(F.lit(1.0))
        .alias("__scale"),
    )
    s = F.col("__scale")
    q = F.transform(
        v, lambda x: F.floor(x.cast("double") / s * qmax + 0.5).cast("int")
    )
    staged = staged.withColumn("q", q)
    err = F.array_max(
        F.zip_with(
            v,
            F.col("q"),
            lambda x, c: F.abs(x.cast("double") - c.cast("double") * s / qmax),
        )
    )
    return staged.select(
        F.col(id_col),
        "n_dims",
        F.round(s, 6).alias("scale"),
        "q",
        F.round(err, 9).alias("max_abs_err"),
    )


def srp_weights(n_bits: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 projection matrix (Achlioptas-style sign matrix)
    seeded by md5 — generated driver-side at plan-build time, so engine
    and oracle embed the IDENTICAL literals and no cross-engine hash
    agreement is needed."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"srp{b}|{d}".encode()).hexdigest()[:8], 16) % 2
            == 0
            else -1
            for d in range(dim)
        ]
        for b in range(n_bits)
    ]


def signed_random_projection(
    embeddings: DataFrame,
    n_bits: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Signed random projection (SimHash for dense vectors): each vector
    maps to an ``n_bits``-bit signature whose bit b is the sign of the
    dot product with a deterministic ±1 hyperplane — the standard
    LSH family for cosine similarity (Charikar), complementing d3's
    text SimHash and the IVF family: vectors in the same signature
    bucket are near-duplicate candidates at O(1) probe cost.

    Exactness: components are int64-quantized (``floor(x*1e7+0.5)``, the
    proven d5/s1 chain) so each hyperplane sum is *integer* arithmetic —
    bit-identical in any engine, no float dot-product order variance.

    Scale shape: ONE Arrow-vectorized projection — per batch, the whole
    n x dim int64 matrix multiplies the dim x n_bits sign matrix in a
    single numpy matmul (integer sums, exact — identical bits to the SQL
    oracle's per-plane folds).  The earlier form ran 16 interpreted
    ``zip_with``/``aggregate`` folds per row (~16 us per HOF eval — the
    same interpreted-HOF cost :func:`~ploverdb_spark.operators.dedup.cosine`
    documents); the matmul replaces 16 x dim interpreted evals per row
    with amortized nanoseconds (guide §4.2: batch native compute inside
    the Arrow boundary).  The only shuffle is the bucket-size window on
    the 16-bit signature — 65k groups, never skewed beyond corpus/65k on
    random data, and droppable if the caller only wants signatures.
    Returns (id, srp_sig, n_bucket).

    Degenerate rows (NULL vector, wrong length, NULL component) keep the
    old fold semantics: every plane sum is NULL there, so every bit is 0
    and the signature is 0.
    """
    from pyspark.sql.window import Window

    from ploverdb_spark.operators.dedup import QUANT_SCALE

    W = np.asarray(srp_weights(n_bits, dim), dtype=np.int64).T  # dim x bits
    bitvals = (np.int64(1) << np.arange(n_bits, dtype=np.int64))

    @F.pandas_udf("int")
    def srp_sig(v: pd.Series) -> pd.Series:
        vals = v.to_numpy()
        ok = np.array(
            [
                x is not None
                and len(x) == dim
                and not pd.isna(np.asarray(x, dtype=np.float64)).any()
                for x in vals
            ]
        )
        sig = np.zeros(len(vals), dtype=np.int64)
        if ok.any():
            M = np.stack(
                [np.asarray(x, dtype=np.float64) for x in vals[ok]]
            )
            Q = np.floor(M * QUANT_SCALE + 0.5).astype(np.int64)
            S = Q @ W  # exact int64 per-plane sums
            sig[ok] = ((S >= 0) * bitvals[None, :]).sum(axis=1)
        return pd.Series(sig.astype(np.int32))

    out = embeddings.select(
        F.col(id_col), srp_sig(F.col(vec_col)).alias("srp_sig")
    )
    return out.withColumn(
        "n_bucket", F.count(F.lit(1)).over(Window.partitionBy("srp_sig"))
    )
