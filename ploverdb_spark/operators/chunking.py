"""Document chunking for training-sequence preparation.

Long documents are split into overlapping fixed-size token windows — the
standard context-window preparation step between corpus cleaning and
sequence packing (``operators/packing.py`` packs whole documents; this
produces the bounded-length pieces a tokenizer-budgeted pipeline packs
instead).  Beyond-reference surface: the reference engine (plover.py) has
no corpus operators at all; this follows the LLM-pipeline mandate.

Scale shape: one narrow projection + one explode — zero shuffles, zero
UDFs, no driver-side state.  The explode factor is bounded by
``ceil(n_tokens / stride)`` per document, so output size is a constant
multiple of input tokens regardless of corpus size; every expression is
whole-stage-codegen'd Column math, and the parquet scan reads only
(id, text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str) -> Column:
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    return F.filter(toks, lambda x: x != F.lit(""))


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into windows of ``chunk_tokens`` whitespace
    tokens advancing by ``chunk_tokens - overlap`` (so consecutive
    chunks share ``overlap`` tokens, preserving cross-boundary context
    for training).

    Returns one row per chunk: ``(id, chunk_idx, n_chunk_tokens,
    chunk_hash)`` where ``chunk_hash`` is the md5 of the
    space-rejoined window — deterministic and engine-portable, and what
    a chunk-level dedup or decontamination stage keys on.  An empty
    document yields exactly one empty chunk (idx 0, 0 tokens) so every
    input id survives into the chunked table.

    The final (ragged) window is kept whenever its start is inside the
    document — standard practice so no suffix of any document is lost.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    # starts 0, stride, 2*stride, ... < max(n_tokens, 1); the max(_, 1)
    # keeps empty documents at one (empty) chunk instead of zero rows
    tokenized = docs.select(
        F.col(id_col), _tokens(text_col).alias("__toks")
    )
    exploded = tokenized.select(
        id_col,
        "__toks",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.size("__toks"), F.lit(1)) - 1,
                F.lit(stride),
            )
        ).alias("__start"),
    )
    window = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
    return exploded.select(
        id_col,
        F.expr(f"__start div {stride}").alias("chunk_idx"),
        F.size(window).alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", window)).alias("chunk_hash"),
    )
