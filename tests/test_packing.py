"""Training-set assembly operators (operators/packing.py): packing
invariants, sampling determinism, domain-cap exactness, and the plan
shapes that make each one 100 TB-safe."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from ploverdb_spark.operators.packing import (
    cap_per_domain,
    md5_uniform,
    pack_sequences,
    stratified_sample,
    temperature_mixture_sample,
)
from tests.conftest import SF_ORACLE

pytestmark = pytest.mark.shard2

SEQ_LEN = 128


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_ORACLE}/documents.parquet")


def test_pack_sequences_invariants(docs):
    packed = pack_sequences(docs, seq_len=SEQ_LEN, n_shards=4).collect()
    assert packed and all(r.n_tokens > 0 for r in packed)
    by_shard: dict[int, list] = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) == 4
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.doc_id)
        # replay the concat stream: each doc starts where the previous
        # one ended, and the seq/offset/straddle fields describe exactly
        # that position
        cum = 0
        for r in rows:
            assert r.seq_idx == cum // SEQ_LEN
            assert r.seq_offset == cum % SEQ_LEN
            assert r.straddles == (r.seq_offset + r.n_tokens > SEQ_LEN)
            cum += r.n_tokens


def test_pack_sequences_drops_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "one two three"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    out = pack_sequences(df, seq_len=4, n_shards=1).collect()
    assert [r.doc_id for r in out] == [1]


def test_stratified_sample_deterministic_and_stratified(docs):
    rates = {"en": 0.25, "de": 0.5}
    kept = stratified_sample(docs, rates).select("doc_id").collect()
    again = stratified_sample(docs, rates).select("doc_id").collect()
    assert sorted(kept) == sorted(again)  # same salt -> same sample
    # rate 0 strata vanish, rate 1.0 (default) strata survive intact
    none_en = stratified_sample(docs, {"en": 0.0}).groupBy("lang").count()
    got = {r.lang: r["count"] for r in none_en.collect()}
    base = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert "en" not in got
    for lang, n in base.items():
        if lang != "en":
            assert got[lang] == n
    # a different salt draws a different sample
    other = stratified_sample(docs, rates, salt="other").select("doc_id")
    assert sorted(kept) != sorted(other.collect())


def test_stratified_sample_zero_shuffle(docs):
    from ploverdb_spark.plans.checks import formatted_plan

    plan = formatted_plan(stratified_sample(docs, {"en": 0.25}))
    assert "Exchange" not in plan, plan


def test_cap_per_domain_cap_and_gate_losslessness(docs):
    capped = cap_per_domain(docs.select("doc_id", "source"), cap=7)
    per_dom = capped.groupBy("source").count().collect()
    assert per_dom and all(r["count"] <= 7 for r in per_dom)
    # the Bernoulli pre-gate must not change WHICH docs win: compare
    # against the exact single-phase rank over the full domain
    u = md5_uniform(F.col("doc_id"), "domcap")
    w = Window.partitionBy("source").orderBy("__u", "doc_id")
    exact = (
        docs.select("doc_id", "source")
        .withColumn("__u", u)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 7)
        .select("doc_id", "source")
    )
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_cap_per_domain_broadcasts_counts(docs):
    from ploverdb_spark.plans.checks import formatted_plan

    plan = formatted_plan(cap_per_domain(docs.select("doc_id", "source")))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pack_sequences_single_exchange(docs):
    # one hash shuffle on shard; the window sort rides the same
    # partitioning (Exchange count == 1 in the physical plan)
    from ploverdb_spark.plans.checks import formatted_plan

    plan = formatted_plan(pack_sequences(docs))
    exchanges = set(re.findall(r"\((\d+)\) Exchange", plan))
    assert len(exchanges) == 1, plan


def test_temperature_mixture_upweights_low_resource(docs):
    base = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    kept = temperature_mixture_sample(docs, budget=200)
    got = {r.lang: r["count"] for r in kept.groupBy("lang").count().collect()}
    # alpha=0.5 flattening: every low-resource language keeps a HIGHER
    # fraction than the dominant one (sqrt weighting), and the total
    # lands near the budget (Bernoulli, so a loose band)
    dominant = max(base, key=base.get)
    dom_frac = got.get(dominant, 0) / base[dominant]
    for lang, n in base.items():
        if lang != dominant:
            assert got.get(lang, 0) / n >= dom_frac
    assert 120 <= sum(got.values()) <= 280
    # determinism: same salt -> identical sample
    again = temperature_mixture_sample(docs, budget=200)
    assert sorted(kept.select("doc_id").collect()) == sorted(
        again.select("doc_id").collect()
    )


def test_temperature_mixture_rate_caps_at_one(spark):
    # a 2-row stratum under a huge budget must keep BOTH rows (rate
    # clamps to 1.0), never oversample
    df = spark.createDataFrame(
        [(i, "big") for i in range(500)] + [(9001, "rare"), (9002, "rare")],
        "doc_id long, lang string",
    )
    kept = temperature_mixture_sample(df, budget=100_000)
    got = {r.lang: r["count"] for r in kept.groupBy("lang").count().collect()}
    assert got == {"big": 500, "rare": 2}


def test_temperature_mixture_broadcasts_rates(docs):
    # the rate table is stratum-cardinality-sized: the corpus-side join
    # must be broadcast, never a sort-merge shuffle of the corpus
    from ploverdb_spark.plans.checks import formatted_plan

    plan = formatted_plan(temperature_mixture_sample(docs, budget=200))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_quality_quantile_filter_is_per_language_top_decile(docs):
    from ploverdb_spark.operators.text import quality_quantile_filter

    kept = quality_quantile_filter(docs).collect()
    base = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    by_lang: dict[str, list] = {}
    for r in kept:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == set(base)
    for lang, rows in by_lang.items():
        # at least the top 10% of the language survives, threshold is
        # honored, and nothing below the threshold bucket leaks through
        assert len(rows) >= base[lang] / 10
        thr = rows[0].thr_bucket
        assert all(r.thr_bucket == thr for r in rows)
        assert all(r.bucket >= thr for r in rows)
    # cross-check against the naive exact formulation: every kept doc's
    # score bucket must be >= the language's exact 90th-percentile bucket
    from ploverdb_spark.operators.text import _quality_raw, ws_tokens

    t = F.col("text")
    _p, _s, _m, raw = _quality_raw(t, ws_tokens(F.lower(t)))
    scored = docs.select(
        "doc_id", "lang", F.floor(raw * 1000).cast("long").alias("bucket")
    )
    w = Window.partitionBy("lang").orderBy("bucket")
    ranked = scored.withColumn("cr", F.cume_dist().over(w))
    naive_thr = {
        r.lang: r.thr
        for r in ranked.where(F.col("cr") * 10 >= 9)
        .groupBy("lang")
        .agg(F.min("bucket").alias("thr"))
        .collect()
    }
    for lang, rows in by_lang.items():
        assert rows[0].thr_bucket == naive_thr[lang]


def test_quality_quantile_filter_drops_null_text(spark):
    # unscoreable docs leave the histogram AND the output — Spark
    # (NULLS FIRST) and DuckDB (NULLS LAST) order null buckets
    # differently, so letting them in would shift the cumulative counts
    # differently per engine
    from ploverdb_spark.operators.text import quality_quantile_filter

    df = spark.createDataFrame(
        [(i, "en", "the quick brown fox jumps over it") for i in range(10)]
        + [(99, "en", None)],
        "doc_id long, lang string, text string",
    )
    rows = quality_quantile_filter(df).collect()
    assert rows and all(r.doc_id != 99 for r in rows)


def test_quality_quantile_filter_histogram_not_corpus_sort(docs):
    # the corpus side must NOT be sorted per language — the only sort
    # belongs to the tiny histogram window; the corpus side is a
    # broadcast join + row-local filter
    from ploverdb_spark.operators.text import quality_quantile_filter
    from ploverdb_spark.plans.checks import formatted_plan

    plan = formatted_plan(quality_quantile_filter(docs))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_quantize_embeddings_zero_shuffle(spark):
    from ploverdb_spark.operators.similarity import quantize_embeddings
    from ploverdb_spark.plans.checks import formatted_plan

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    plan = formatted_plan(quantize_embeddings(emb))
    assert "Exchange" not in plan, plan


def test_quantize_embeddings_roundtrip_error_bound(spark):
    from ploverdb_spark.operators.similarity import quantize_embeddings

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    rows = quantize_embeddings(emb).collect()
    assert rows
    for r in rows:
        assert len(r.q) == r.n_dims
        assert all(-127 <= c <= 127 for c in r.q)
        # symmetric int8: worst-case error is scale/(2*127) per component
        assert r.max_abs_err <= r.scale / 254 + 1e-9
