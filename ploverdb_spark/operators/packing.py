"""Training-set assembly operators: sequence packing, stratified
sampling, per-domain caps.

These are the operators a pretraining-data pipeline runs AFTER cleaning
and dedup (operators/dedup.py, operators/text.py): turn a document corpus
into the fixed-length, distribution-balanced shards a trainer consumes.
All randomness is md5-derived — deterministic, engine-agnostic (the
DuckDB oracles recompute it bit-for-bit), and reshuffle-stable, which is
what a reproducible data pipeline needs anyway (re-running a 100 TB job
must not sample a different corpus).

Scale shapes:

- ``pack_sequences``: the GPT-style concat-and-chunk packer.  A single
  global document order would serialize on one sorted range — instead the
  corpus is hash-sharded (shard = md5(doc_id) % n_shards, the same unit a
  trainer reads as one data file) and the running token offset is a
  per-shard window cumsum: one hash shuffle, every shard packs in
  parallel, no global sort anywhere.
- ``stratified_sample``: per-stratum Bernoulli with a deterministic md5
  uniform — a pure row-local filter, ZERO shuffles at any scale.  Exact
  per-stratum counts would need a rank window per stratum; rate-based
  rebalancing (the common case: downweight the dominant language) does
  not.
- ``cap_per_domain``: top-``cap`` docs per domain is a rank window, and a
  pathologically hot domain (SEO spam, crawler traps) would sort millions
  of rows to keep 100.  The two-phase shape bounds that: broadcast the
  per-domain counts (domain-cardinality-sized), Bernoulli-pre-gate each
  hot domain to ~``gate_factor * cap`` expected survivors using the SAME
  md5 uniform the final rank orders by (the kept top-``cap`` have the
  smallest uniforms, so the gate is effectively lossless), then rank only
  the survivors.  The window input shrinks from |domain| to O(cap) rows
  regardless of domain size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ploverdb_spark.operators.text import ws_tokens

__all__ = [
    "md5_uniform",
    "pack_sequences",
    "stratified_sample",
    "cap_per_domain",
    "temperature_mixture_sample",
]


def md5_uniform(key: Column, salt: str = "") -> Column:
    """Deterministic uniform in [0, 1): the first 4 md5 hex digits of
    ``salt || key`` scaled by 16^4.  Coarse (1/65536 granularity) but
    engine-agnostic and cheap; sampling rates are never specified finer
    than that."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 4),
            16,
            10,
        ).cast("long")
        / F.lit(65536.0)
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are concatenated in a
    deterministic order and cut into fixed ``seq_len``-token training
    sequences; each document is mapped to the sequence its first token
    lands in.

    Returns (doc_id, shard, n_tokens, seq_idx, seq_offset, straddles):
    ``seq_idx`` is the per-shard sequence number, ``seq_offset`` the
    document's first-token position within that sequence, ``straddles``
    whether the document crosses a sequence boundary (a trainer masking
    cross-document attention wants this bit).

    One shuffle total (hash partition by shard + per-shard sort by id);
    shards pack independently, so a 1000-executor cluster packs 1000
    shards with no coordination.  Zero-token documents are dropped (they
    occupy no sequence position).
    """
    with_tokens = docs.select(
        F.col(id_col).alias("doc_id"),
        (
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
            ).cast("long")
            % n_shards
        ).alias("shard"),
        F.size(ws_tokens(F.col(text_col))).alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return with_tokens.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(cum_before / seq_len).alias("seq_idx"),
        (cum_before % seq_len).alias("seq_offset"),
        ((cum_before % seq_len) + F.col("n_tokens") > seq_len).alias(
            "straddles"
        ),
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    default_rate: float = 1.0,
    salt: str = "strat",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff its md5
    uniform is below the stratum's rate.  The canonical language/source
    rebalancing step — e.g. ``{"en": 0.5}`` halves English while keeping
    every other stratum intact.

    Pure row-local filter: no shuffle, no window, no counts — the only
    operator shape that stays free at 100 TB.  Re-running with the same
    salt reproduces the exact sample.
    """
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(float(v))).otherwise(rate)
    return docs.where(md5_uniform(F.col(id_col), salt) < rate)


def cap_per_domain(
    docs: DataFrame,
    cap: int = 10,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "domcap",
    gate_factor: float = 4.0,
) -> DataFrame:
    """Keep at most ``cap`` documents per domain, chosen deterministically
    (smallest md5 uniform wins; ties impossible — the id is part of the
    hash input and the final ordering).  Bounds any single domain's
    contribution to the corpus — the standard guard against SEO-farm /
    crawler-trap domains that are thousands of times overrepresented.

    Two-phase so the rank window never sorts a whole hot domain: domains
    with more than ``gate_factor * cap`` documents are pre-gated to an
    expected ``gate_factor * cap`` survivors by the same uniform the rank
    orders by, so the gate keeps every row the rank could select (the
    top-``cap`` uniforms are far below the gate threshold at any
    realistic ``gate_factor``).  The counts side is
    domain-cardinality-sized and broadcast.
    """
    u = md5_uniform(F.col(id_col), salt)
    counts = docs.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    gated = (
        docs.withColumn("__u", u)
        .join(F.broadcast(counts), on=domain_col)
        .where(F.col("__u") * F.col("__n") < F.lit(float(gate_factor * cap)))
    )
    w = Window.partitionBy(domain_col).orderBy("__u", id_col)
    return (
        gated.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .select(*docs.columns)  # original column order (join reordered)
    )


def temperature_mixture_sample(
    docs: DataFrame,
    budget: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Temperature-scaled mixture sampling (the mT5/XLM-R alpha-sampling
    recipe at alpha = 0.5): sample stratum ``l`` with probability
    proportional to ``sqrt(n_l)``, upweighting low-resource strata
    relative to their natural share, targeting ``budget`` kept rows in
    expectation.  Per-stratum keep rate =
    ``min(1, budget * sqrt(n_l) / (sum_k sqrt(n_k)) / n_l)``; a row is
    kept iff its deterministic md5 uniform falls below its stratum's
    rate.

    alpha is fixed at 0.5 because IEEE ``sqrt`` is correctly rounded —
    bit-identical across engines — where ``pow(x, alpha)`` is not, and
    the sqrt weights are rounded to 6 decimals and summed as DECIMAL so
    the normalizer is exact regardless of addition order.  Everything
    downstream of the (stratum-cardinality-sized, broadcast) rate table
    is a row-local filter: zero data-sized shuffles at any scale, and
    re-running with the same salt reproduces the exact mixture.
    """
    counts = docs.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    weighted = counts.withColumn(
        "__w",
        F.round(F.sqrt(F.col("__n").cast("double")), 6).cast("decimal(18,6)"),
    )
    # global window over the stratum-cardinality-sized counts table (a
    # crossJoin with a derived aggregate would be a self-join — ambiguous
    # attribute lineage — and buys nothing on a |strata|-row input)
    norm = F.sum("__w").over(Window.partitionBy())
    rates = weighted.select(
        stratum_col,
        F.least(
            F.lit(1.0),
            F.lit(float(budget))
            * F.col("__w").cast("double")
            / norm.cast("double")
            / F.col("__n").cast("double"),
        ).alias("__rate"),
    )
    return (
        docs.join(F.broadcast(rates), on=stratum_col)
        .where(md5_uniform(F.col(id_col), salt) < F.col("__rate"))
        .select(*docs.columns)
    )
