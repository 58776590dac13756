"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_narrow_input(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the input has fewer partitions than the
    cluster has cores.  CPU-bound projections (md5 shingle hashing, Arrow
    cosine batches) over a small parquet input arrive as 1-2 splits —
    without this, 2 of 32 cores do all the compute (measured: 2.3s ->
    1.6s for the LSH pair plan at sf0.1).  At real scale the input
    already has more splits than cores and this is a no-op — the
    condition, not the repartition, is the scale story."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
