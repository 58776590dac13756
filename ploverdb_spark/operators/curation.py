"""Corpus-curation operators: the decide-what-survives steps between
detection and the training mix.

The dedup family (operators/dedup.py) *finds* duplicate clusters and
contaminated spans; these operators act on those findings the way a
production training-data pipeline does:

- :func:`canonical_selection` — keep ONE representative per duplicate
  cluster, chosen by a quality signal instead of arbitrary row order
  (dropping a random member throws away the best copy ~(n-1)/n of the
  time; published pipelines keep the longest/highest-quality member).
- :func:`redact_token_spans` — surgically EXCISE contaminated token
  spans (the c12 output) from the documents that contain them, instead
  of dropping whole documents — the remediation that preserves the
  uncontaminated 95% of a long document.

Beyond-reference scope (SURVEY.md §2 pipeline extensions): the
reference engine (plover.py) has no corpus-curation surface; these
compose with the dedup/decontamination operators the same way its
build-time dedup stages compose with its query layer.

Scale design notes are on each function; both operators are pure
DataFrame compositions — no UDFs, no collects, nothing driver-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def canonical_selection(
    df: DataFrame,
    group_col: str,
    quality_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Pick one canonical member per duplicate cluster by quality.

    Adds three columns to ``df``: ``cluster_size`` (members in this
    cluster), ``canonical_id`` (the ``id_col`` of the highest-quality
    member, ties broken by smallest id — deterministic for the oracle
    and for reruns), and ``is_canonical``.  Callers keep the winners
    with ``.where("is_canonical")`` or build a rewrite map from
    ``(id_col, canonical_id)`` for the losers.

    Grouping is caller-supplied so one operator serves every dedup
    signal: md5(text) exact groups (d1), connected-component group ids
    (d6) at corpus scale, or a cheap SQL-expressible proxy like a
    normalized-prefix shingle.

    Scale shape: ONE shuffle on ``group_col`` (both window frames share
    it — Catalyst plans a single exchange).  Cluster sizes are duplicate
    multiplicities, which real corpora keep small; a degenerate hot key
    (e.g. the empty document) is bounded by upstream cleaning (c1), the
    same stance d6 takes on giant components.
    """
    w_rank = Window.partitionBy(group_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    w_all = Window.partitionBy(group_col)
    return (
        df.withColumn("cluster_size", F.count(F.lit(1)).over(w_all))
        .withColumn("canonical_id", F.first(id_col).over(w_rank))
        .withColumn("is_canonical", F.col(id_col) == F.col("canonical_id"))
    )


def redact_token_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Excise contaminated token spans from the documents they flag.

    ``spans`` is the output of
    :func:`~ploverdb_spark.operators.dedup.token_window_decontaminate`
    (or any frame with ``id_col`` / ``span_start`` / ``span_end`` /
    ``span_len``, 1-based inclusive token positions, spans disjoint per
    doc).  Positions refer to the SAME normalized token stream the
    decontamination scanned (non-empty whitespace tokens of the
    lowercased text) — redacting positions found in one tokenization
    from a different one would excise the wrong words.

    Returns one row per FLAGGED document: ``n_spans``, ``n_tokens``
    (before), ``n_tokens_removed``, ``n_tokens_kept``, and
    ``redacted_hash`` (md5 of the space-joined surviving tokens; a
    fully-contained document — e.g. a verbatim benchmark copy — keeps
    zero tokens and hashes the empty string).  Unflagged documents pass
    through a pipeline untouched, so they are not re-emitted here.

    Scale shape: the span aggregation shuffles only the sparse hit set
    (decontamination outputs are a vanishing fraction of a corpus), and
    the per-doc span list then joins onto the corpus as a BROADCAST
    hash join — the corpus side never shuffles.  Tokenization happens
    AFTER that sparse inner join (r12, guide §2.3 "filter before
    expensive work"): the captured before-plan showed the tokenize
    Project under the join, re-tokenizing the WHOLE corpus side just
    for the probe to discard ~99% of it — deterministic per-row work
    commutes with an inner equi-join, so only flagged documents pay it
    (O(flagged), not O(corpus); results proven identical by exceptAll
    at sf0.1 + oracle at both SFs).  Token surgery is higher-order
    column expressions (zip_with/filter/exists/transform): per-token
    cost is O(spans-in-doc), no Python in the hot path, and the HOF
    interpretation overhead is bounded by the same flagged-only input.
    """
    from ploverdb_spark.operators.text import ws_tokens

    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("__spans"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_len").alias("n_tokens_removed"),
    )
    joined = (
        docs.select(F.col(id_col), F.col(text_col))
        .join(F.broadcast(per_doc), on=id_col, how="inner")
        .withColumn("__toks", ws_tokens(F.lower(F.col(text_col))))
    )
    # flagged docs carry >= window tokens by construction, so the
    # 1..size position sequence is never ill-formed
    tok_pos = F.zip_with(
        F.col("__toks"),
        F.sequence(F.lit(1), F.size("__toks")),
        lambda t, p: F.struct(t.alias("t"), p.cast("long").alias("p")),
    )
    kept = F.filter(
        tok_pos,
        lambda s: ~F.exists(
            F.col("__spans"),
            lambda sp: (s["p"] >= sp["s"]) & (s["p"] <= sp["e"]),
        ),
    )
    return joined.select(
        id_col,
        F.col("n_spans").cast("long").alias("n_spans"),
        F.size("__toks").cast("long").alias("n_tokens"),
        F.col("n_tokens_removed").cast("long").alias("n_tokens_removed"),
        F.size(kept).cast("long").alias("n_tokens_kept"),
        F.md5(
            F.concat_ws(" ", F.transform(kept, lambda s: s["t"]))
        ).alias("redacted_hash"),
    )
