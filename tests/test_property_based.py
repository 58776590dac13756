"""Property-based checks (hypothesis) for the custom distributed
algorithms: random inputs, compared against simple driver-side reference
implementations.  Example counts are kept small — every example runs real
Spark jobs."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.shard2  # second CI shard (<300s each)

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

pair_lists = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
        lambda p: p[0] != p[1]
    ),
    min_size=1,
    max_size=25,
)


def _union_find_groups(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Reference: classic union-find, group id = component minimum."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots: dict[int, list[int]] = {}
    for n in parent:
        roots.setdefault(find(n), []).append(n)
    return {n: min(members) for members in roots.values() for n in members}


@settings(max_examples=3, deadline=None)  # each example runs a full
# iterative Spark CC job; 3 random graphs + the salted/closure suites keep
# the shard under its 300s budget while still exercising chains and cycles
@given(pair_lists)
def test_connected_components_matches_union_find(spark, pairs):
    from ploverdb_spark.operators.dedup import connected_components

    ordered = [(min(a, b), max(a, b)) for a, b in pairs]
    df = spark.createDataFrame(ordered, "doc_a long, doc_b long")
    got = {
        r.doc_id: r.group_id for r in connected_components(df, max_iter=40).collect()
    }
    assert got == _union_find_groups(ordered)


scored_rows = st.lists(
    st.tuples(
        st.integers(0, 3),  # query_id
        st.integers(0, 60),  # neighbor_id
        st.integers(-1000, 1000),  # score millis (exact when /1000 in f64)
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda r: (r[0], r[1]),
)


@settings(max_examples=8, deadline=None)
@given(scored_rows)
def test_salted_topk_equals_single_window(spark, rows):
    """topk_per_query's two-phase salted ranking must be indistinguishable
    from the naive single-window form (same tie-break)."""
    from pyspark.sql import Window

    from ploverdb_spark.operators.similarity import topk_per_query

    df = spark.createDataFrame(
        [(q, n, s / 1000.0) for q, n, s in rows],
        "query_id long, neighbor_id long, cos double",
    )
    k = 5
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in topk_per_query(df, k).collect()
    }
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    expected = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .collect()
    }
    assert got == expected


edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(
        lambda p: p[0] != p[1]
    ),
    min_size=2,
    max_size=16,
)


@settings(max_examples=2, deadline=None)  # two random splits; the
# deterministic depth-cap/shortcut tests in test_build_modules cover the
# tricky paths
@given(edge_lists, st.integers(0, 2**31 - 1))
def test_extend_closure_matches_full_recompute(spark, edges, seed):
    """Folding a random split of the edge set into an existing closure
    must equal closing everything from scratch (cycles included — the
    bounded loops make them safe)."""
    import random

    from ploverdb_spark.build.closure import extend_closure, transitive_closure

    rng = random.Random(seed)
    split = max(1, len(edges) // 2)
    shuffled = edges[:]
    rng.shuffle(shuffled)
    base_e, new_e = shuffled[:split], shuffled[split:]
    schema = "parent int, child int"
    base = transitive_closure(
        spark.createDataFrame(base_e, schema), prune_prefix=None
    )
    if not new_e:
        new_e = [base_e[0]]
    got = {
        (r.ancestor, r.descendant)
        for r in extend_closure(
            base, spark.createDataFrame(new_e, schema)
        ).collect()
    }
    expected = {
        (r.ancestor, r.descendant)
        for r in transitive_closure(
            spark.createDataFrame(edges, schema), prune_prefix=None
        ).collect()
    }
    assert got == expected


# -- training-set assembly (operators/packing.py) ---------------------------

doc_corpora = st.lists(
    st.tuples(
        st.integers(0, 10_000),
        st.text(
            alphabet=st.sampled_from("ab \t\n"), min_size=0, max_size=40
        ),
    ),
    min_size=0,
    max_size=40,
    unique_by=lambda t: t[0],
)


@settings(max_examples=4, deadline=None)
@given(doc_corpora, st.integers(2, 16))
def test_pack_sequences_replays_concat_stream(spark, corpus, seq_len):
    """Whatever the corpus, the packed output must describe exactly the
    positions a single-pass concat of each shard's docs (ordered by id)
    would produce."""
    from ploverdb_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = pack_sequences(df, seq_len=seq_len, n_shards=3).collect()
    expected_tokens = {
        i: len(t.split()) for i, t in corpus if len(t.split()) > 0
    }
    assert {r.doc_id for r in rows} == set(expected_tokens)
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r.n_tokens == expected_tokens[r.doc_id]
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        cum = 0
        for r in sorted(shard_rows, key=lambda r: r.doc_id):
            assert (r.seq_idx, r.seq_offset) == (
                cum // seq_len,
                cum % seq_len,
            )
            assert r.straddles == (r.seq_offset + r.n_tokens > seq_len)
            cum += r.n_tokens


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 10_000), st.sampled_from(["d0", "d1", "d2"])
        ),
        min_size=0,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 5),
)
def test_cap_per_domain_matches_exact_rank(spark, rows, cap):
    """The two-phase gate+rank must select exactly the docs a plain
    full-domain rank would, for any domain skew."""
    from ploverdb_spark.operators.packing import cap_per_domain, md5_uniform
    from pyspark.sql import Window

    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(map(tuple, cap_per_domain(df, cap=cap).collect()))
    w = Window.partitionBy("source").orderBy("__u", "doc_id")
    exact = (
        df.withColumn("__u", md5_uniform(F.col("doc_id"), "domcap"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .select("doc_id", "source")
    )
    assert got == sorted(map(tuple, exact.collect()))


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.lists(
                st.floats(
                    min_value=-50, max_value=50,
                    allow_nan=False, allow_infinity=False, width=32,
                ),
                min_size=4,
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    )
)
def test_quantize_embeddings_roundtrip_property(spark, rows):
    """For any float32 vectors: q stays in int8 range, scale is the
    per-vector abs-max, and reconstruction error respects the symmetric
    quantizer's bound (scale / 254)."""
    from ploverdb_spark.operators.similarity import quantize_embeddings

    import numpy as _np

    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # the returned scale is rounded to 6dp; bound against the TRUE scale
    # recomputed from the float32 input (rounding makes scale/254 unsound
    # for tiny-magnitude vectors)
    true_scale = {
        i: max((abs(float(_np.float32(x))) for x in v), default=0.0) or 1.0
        for i, v in rows
    }
    for r in quantize_embeddings(df).collect():
        assert len(r.q) == r.n_dims == 4
        assert all(-127 <= c <= 127 for c in r.q)
        assert r.max_abs_err <= true_scale[r.vec_id] / 254 + 1e-9


strata_corpora = st.lists(
    st.tuples(
        st.sampled_from(["en", "de", "fr", "es", "zh", "ru"]),
        st.integers(1, 60),  # stratum size
    ),
    min_size=1,
    max_size=5,
    unique_by=lambda t: t[0],
)


@settings(max_examples=4, deadline=None)
@given(strata_corpora, st.integers(10, 500))
def test_temperature_mixture_matches_driver_reference(spark, strata, budget):
    """temperature_mixture_sample == a driver-side reference that
    recomputes the identical rate formula and md5 uniforms row by row —
    on random stratum shapes and budgets (clamped and unclamped)."""
    import hashlib
    import math

    from ploverdb_spark.operators.packing import temperature_mixture_sample

    rows, next_id = [], 0
    for lang, n in strata:
        for _ in range(n):
            rows.append((next_id, lang))
            next_id += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    # driver-side reference: same sqrt weights rounded to 6 decimals,
    # summed exactly (Fraction-free: scaled-int arithmetic), same
    # budget*w/W/n rate, same md5 uniform
    w6 = {
        lang: round(math.sqrt(float(n)), 6) for lang, n in strata
    }
    total_micro = sum(int(round(w * 1e6)) for w in w6.values())
    W = total_micro / 1e6
    rate = {
        lang: min(1.0, float(budget) * w6[lang] / W / n)
        for lang, n in strata
    }
    expected = {
        doc_id
        for doc_id, lang in rows
        if int(hashlib.md5(f"mix{doc_id}".encode()).hexdigest()[:4], 16)
        / 65536.0
        < rate[lang]
    }
    got = {
        r.doc_id
        for r in temperature_mixture_sample(df, budget=budget).collect()
    }
    assert got == expected
