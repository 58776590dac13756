"""Corpus-curation operators: canonical selection + span redaction."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ploverdb_spark.operators.curation import (
    canonical_selection,
    redact_token_spans,
)
from tests.conftest import SF_ORACLE


def test_canonical_selection_picks_quality_then_id(spark):
    df = spark.createDataFrame(
        [
            # cluster a: clear quality winner (id 3)
            (1, "a", 0.2),
            (2, "a", 0.5),
            (3, "a", 0.9),
            # cluster b: quality tie -> smallest id (4) wins
            (4, "b", 0.7),
            (5, "b", 0.7),
            # singleton cluster: its own canonical
            (6, "c", 0.1),
        ],
        "doc_id long, grp string, q double",
    )
    rows = {
        r.doc_id: r
        for r in canonical_selection(
            df, group_col="grp", quality_col="q"
        ).collect()
    }
    assert [rows[i].canonical_id for i in (1, 2, 3)] == [3, 3, 3]
    assert [rows[i].is_canonical for i in (1, 2, 3)] == [False, False, True]
    assert [rows[i].canonical_id for i in (4, 5)] == [4, 4]
    assert rows[4].is_canonical and not rows[5].is_canonical
    assert rows[6].is_canonical and rows[6].canonical_id == 6
    assert [rows[i].cluster_size for i in (1, 4, 6)] == [3, 2, 1]


def test_canonical_selection_one_winner_per_cluster(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    clustered = docs.select(
        "doc_id",
        (F.col("doc_id") % 7).alias("grp"),
        F.length("text").cast("double").alias("q"),
    )
    out = canonical_selection(clustered, group_col="grp", quality_col="q")
    per_group = (
        out.groupBy("grp")
        .agg(
            F.sum(F.col("is_canonical").cast("int")).alias("n_canon"),
            F.countDistinct("canonical_id").alias("n_ids"),
        )
        .collect()
    )
    assert all(r.n_canon == 1 and r.n_ids == 1 for r in per_group)


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _mk_spans(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, span_start long, span_end long"
    )
    return df.withColumn(
        "span_len", F.col("span_end") - F.col("span_start") + 1
    )


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_redact_token_spans_surgery(spark):
    docs = _mk_docs(
        spark,
        [
            (1, "Alpha beta gamma delta epsilon zeta"),  # cut middle
            (2, "one two three four"),  # fully contained
            (3, "untouched document"),  # no spans -> not emitted
        ],
    )
    spans = _mk_spans(spark, [(1, 2, 4), (2, 1, 4)])
    rows = {r.doc_id: r for r in redact_token_spans(docs, spans).collect()}
    assert set(rows) == {1, 2}
    # doc 1: tokens 2..4 (beta gamma delta) excised from the LOWERCASED
    # token stream (the stream the decontamination scanned)
    assert rows[1].n_tokens == 6
    assert rows[1].n_tokens_removed == 3
    assert rows[1].n_tokens_kept == 3
    assert rows[1].redacted_hash == _md5("alpha epsilon zeta")
    # doc 2: verbatim containment -> empty document sentinel
    assert rows[2].n_tokens_kept == 0
    assert rows[2].redacted_hash == _md5("")


def test_redact_token_spans_multiple_disjoint_spans(spark):
    docs = _mk_docs(spark, [(9, "t1 t2 t3 t4 t5 t6 t7 t8")])
    spans = _mk_spans(spark, [(9, 1, 2), (9, 6, 7)])
    r = redact_token_spans(docs, spans).collect()[0]
    assert r.n_spans == 2
    assert r.n_tokens_removed == 4
    assert r.n_tokens_kept == 4
    assert r.redacted_hash == _md5("t3 t4 t5 t8")


def test_redaction_excises_planted_benchmark_copies(spark):
    """End-to-end planted invariant (the corpus-scale c12 geometry, at
    sf0.001): every corpus document whose text verbatim-matches a
    benchmark document (its doubled clone, or a natural cross-pair)
    redacts to EXACTLY zero kept tokens — and every other flagged doc
    keeps at least one."""
    from ploverdb_spark.catalog import get

    out = get("c14_span_redaction").fn(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows, "planted clones must flag"
    from ploverdb_spark.queries.pipeline import _ID_SHIFT, _doubled_docs

    docs = _doubled_docs(spark, "/root/testdata/sf0.001")
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit(""))
        .alias("toks"),
    )
    bench_texts = {
        tuple(r.toks)
        for r in toks.where(
            (F.col("doc_id") % 97 == 0) & (F.size("toks") >= 13)
        ).collect()
    }
    corpus_toks = {
        r.doc_id: tuple(r.toks)
        for r in toks.where(F.col("doc_id") % 97 != 0).collect()
    }
    full_copies = {
        d for d, t in corpus_toks.items() if t in bench_texts and len(t) >= 13
    }
    flagged_empty = {r.doc_id for r in rows if r.n_tokens_kept == 0}
    assert full_copies <= flagged_empty
    # conservation on every flagged doc
    assert all(
        r.n_tokens == r.n_tokens_removed + r.n_tokens_kept for r in rows
    )
    assert _ID_SHIFT  # clones exist by construction
