"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-conscious and expressed with built-in
functions only (md5 is the shared deterministic hash, so the DuckDB oracle
can recompute every stage bit-for-bit):

- exact:          hash-groupBy on md5(text); one shuffle on the hash
- MinHash + LSH:  shingles -> H minhashes -> B band keys -> bucket
                  self-join; candidate pairs only ever join within a
                  bucket (the 100 TB-scale path: no all-pairs product)
- SimHash:        per-token hash bit votes -> 16-bit signature; one
                  explode + groupBy
- n-gram Jaccard: token-set intersection/union for candidate pairs
- embedding near-dup: cosine over a blocking key (label/IVF cell), so the
                  pair space is |block|² not |corpus|²

At scale, two quadratic corners are explicitly bounded:
- LSH hot buckets: buckets over ``max_bucket_size`` switch from a
  single-task ``collect_list`` expansion to a distributed self-join on
  the bucket key (identical pair set, bounded task memory);
- near-dup blocks: blocks over ``max_block_size`` are deterministically
  hash-split into capped sub-blocks (bounded-recall trade; results are
  unchanged whenever blocks fit the cap).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ploverdb_spark.operators.common import fan_out_narrow_input
from ploverdb_spark.operators.text import ws_tokens


def _md5_salt(id_col: Column) -> Column:
    """Deterministic small salt from an id: first 4 md5 hex digits as an
    integer — engine-agnostic (SQL oracles and Python tests recompute it
    exactly) and uniform enough for bucket splitting."""
    return F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, 4), 16, 10
    ).cast("long")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup via hash-groupBy (map-side partial agg + one shuffle).

    Returns one row per distinct content hash: the kept (minimum) id, the
    copy count, and the dropped ids.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("all_ids"),
        )
    )


def shingles_of(toks: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles from a MATERIALIZED token array column.

    ``toks`` must be a bound column (not an inline expression): the lambda
    body re-evaluates outer expressions per element, so an inline
    split-based token expression would turn this quadratic per row.
    """
    n = F.size(toks)
    return F.array_distinct(
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: F.array_join(F.slice(toks, i, k), " "),
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles of a text column.  Prefer staging
    tokens via :func:`shingles_of` in hot paths — see its warning."""
    return shingles_of(ws_tokens(F.lower(text)), k)


def exploded_word_grams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    as_hash: bool = False,
) -> DataFrame:
    """(id, gram) ROWS via explode-before-gram-construction — the
    whole-stage-codegen shape of :func:`shingles_of`.

    Why rows, not arrays: array higher-order functions (``F.transform``)
    are INTERPRETED per element (measured ~16 us/eval — 578 s for 200k
    docs' minhash at 8 hashes), while an exploded index plus plain
    projections stays inside WholeStageCodegen.  Gram VALUES are
    identical to ``shingles_of``'s: word k-grams joined by a space for
    docs with >= k tokens, else one whole-doc gram — so md5-family
    consumers keep their cross-engine SQL oracles unchanged.  Duplicate
    grams within a doc are NOT removed (min/semi-join/distinct consumers
    are all idempotent to them; the dedup is the consumer's choice).

    ``as_hash=True`` emits ``xxhash64`` longs instead of gram strings,
    skipping string construction entirely for >= k-token docs (the hash
    folds the k token columns directly) — the production family at
    corpus scale, where no SQL oracle needs to replay the hash.
    """
    toks = df.select(
        F.col(id_col), ws_tokens(F.lower(F.col(text_col))).alias("__t")
    )
    n = F.size(F.col("__t"))
    idx = toks.select(
        id_col,
        "__t",
        n.alias("__n"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
        ).alias("__i"),
    )
    win = [F.get(F.col("__t"), F.col("__i") - 1 + j) for j in range(k)]
    if as_hash:
        gram = F.when(F.col("__n") >= k, F.xxhash64(*win)).otherwise(
            F.xxhash64(F.array_join(F.col("__t"), " "))
        )
    else:
        gram = F.when(F.col("__n") >= k, F.concat_ws(" ", *win)).otherwise(
            F.array_join(F.col("__t"), " ")
        )
    return idx.select(id_col, gram.alias("g"))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    hash_family: str = "md5",
) -> DataFrame:
    """MinHash signature per document.

    ``hash_family="md5"``: hash function i is ``md5(i || '|' || shingle)``
    and the signature component is the lexical minimum — deterministic
    and identical in any engine with md5 (the SQL-oracle family).

    ``hash_family="xxhash64"``: one xxhash64 per gram folded from the
    token window (no gram string is ever built), then per-function mixes
    ``xxhash64(gram_hash, i)`` — same banded-LSH semantics, long
    signatures, ~200x faster (measured 578 s -> 2.8 s for 200k docs).
    The production family at corpus scale; no cross-engine oracle.

    Both families run the exploded whole-stage-codegen shape
    (:func:`exploded_word_grams` -> map-side partial min-agg, one
    shuffle of num_hashes mins per doc): the md5 family's VALUES are
    bit-identical to the historical array-HOF form (pytest-pinned), it
    is just ~5x faster.
    """
    grams = exploded_word_grams(
        fan_out_narrow_input(df),
        text_col,
        id_col,
        as_hash=hash_family == "xxhash64",
    )
    if hash_family == "xxhash64":
        mins = [
            F.min(F.xxhash64(F.col("g"), F.lit(i))).alias(f"minhash_{i}")
            for i in range(num_hashes)
        ]
    else:
        mins = [
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("g")))).alias(
                f"minhash_{i}"
            )
            for i in range(num_hashes)
        ]
    return grams.groupBy(id_col).agg(*mins)


def _lsh_band_keys(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    hash_family: str = "md5",
) -> DataFrame:
    """(id, band, band_key) rows: one key per LSH band, all bands
    emitted in ONE projection (array of structs -> explode) so the
    signature subtree evaluates exactly once — never a per-band UNION,
    which Catalyst would evaluate once per branch.  Band keys are
    md5-of-concat strings for the md5 family, ``xxhash64`` longs for the
    xxhash64 family (smaller bucket-shuffle rows, no string building)."""
    bands = num_hashes // band_size

    def key_of(b: int) -> Column:
        cols = [
            F.col(f"minhash_{i}")
            for i in range(b * band_size, (b + 1) * band_size)
        ]
        if hash_family == "xxhash64":
            return F.xxhash64(*cols).alias("band_key")
        return F.md5(F.concat_ws("|", *cols)).alias("band_key")

    band_structs = F.array(
        *[
            F.struct(F.lit(b).alias("band"), key_of(b))
            for b in range(bands)
        ]
    )
    return signatures.select(
        F.col(id_col), F.explode(band_structs).alias("bk")
    ).select(id_col, "bk.band", "bk.band_key")


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    max_bucket_size: int = 4096,
    distinct: bool = True,
    hash_family: str = "md5",
    star: bool = False,
) -> DataFrame:
    """Docs agreeing on all hashes within any band become candidate pairs
    (a < b).

    Shape matters here: a per-band UNION followed by a self-join would
    evaluate the (expensive) signature plan once per band per join side —
    Catalyst does not dedupe common subplans.  Instead all band keys are
    emitted in ONE projection (array of structs -> explode), and pairs are
    generated inside each bucket via groupBy + collect_list: the signature
    plan runs exactly once and the only shuffle is the bucket groupBy.

    Hot-bucket guard: a pathological bucket (e.g. an empty-text cluster)
    would make ``collect_list`` buffer the whole bucket in ONE task and
    emit |bucket|² pairs.  Buckets over ``max_bucket_size`` are
    deterministically md5-salted into ``ceil(size / cap)`` sub-buckets and
    pairs form only within a sub-bucket — the standard LSH hot-key
    treatment (bounded task memory AND bounded pair volume, at the price
    of recall only inside pathological buckets).  Buckets under the cap
    are untouched, and the whole thing stays ONE plan: window count +
    groupBy cluster on the same bucket key, so the expensive signature
    subtree still evaluates exactly once.

    ``star=True`` emits, per (sub-)bucket, only the STAR pairs
    (bucket-minimum id, other member) instead of all a<b combinations —
    a bucket of n members contributes n-1 edges instead of n(n-1)/2.
    The star spans exactly the same connectivity (every member touches
    the minimum), so consumers that only need the induced components —
    connected_components/d6 — get IDENTICAL groups from a linear, not
    quadratic, edge volume; the r12 guide §2.3 move of shuffling fewer
    rows by shrinking the generated set itself.  Pair-semantics
    consumers (d2's declared pair list, d4/d7 verification) keep the
    full form.
    """
    banded = _lsh_band_keys(
        signatures, id_col, num_hashes, band_size, hash_family
    )
    # one shuffle on the bucket key; the groupBy below clusters on the
    # same leading keys (no second full exchange)
    n_sub = F.ceil(
        F.count(F.lit(1)).over(Window.partitionBy("band", "band_key"))
        / F.lit(max_bucket_size)
    )
    banded = banded.withColumn("__sub", _md5_salt(F.col(id_col)) % n_sub)
    buckets = (
        banded.groupBy("band", "band_key", "__sub")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .where(F.size("ids") > 1)
    )
    # all a<b combinations within a (sub-)bucket: ids is sorted, so
    # pairing each element with its strict successors keeps doc_a < doc_b
    # (``distinct=False`` skips the cross-band dedup shuffle for
    # consumers idempotent to duplicate pairs, e.g. connected_components'
    # min-agg)
    if star:
        # ids is sorted, so ids[0] is the bucket minimum: (min, other)
        # keeps doc_a < doc_b and spans the bucket's connectivity.
        out = buckets.select(
            F.element_at("ids", 1).alias("doc_a"),
            F.explode(
                F.slice(F.col("ids"), 2, F.size(F.col("ids")))
            ).alias("doc_b"),
        )
    else:
        # Two Generate operators (posexplode, then explode of the strict
        # successors) instead of the earlier nested
        # transform-inside-transform, which built the whole per-bucket
        # pair array through INTERPRETED higher-order functions before
        # exploding it (guide §4: array HOFs evaluate per element outside
        # codegen).  Pair values and order semantics are identical
        # (verified: exact set equality at sf0.1); the double Generate
        # streams pairs without materializing the quadratic array per
        # bucket — which also bounds task memory by |bucket|, not
        # |bucket|², in the pre-salt-cap regime.
        out = buckets.select(
            "ids", F.posexplode("ids").alias("__i", "doc_a")
        ).select(
            "doc_a",
            F.explode(
                F.slice(F.col("ids"), F.col("__i") + 2, F.size("ids"))
            ).alias("doc_b"),
        )
    return out.distinct() if distinct else out


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """SimHash signature: each token votes +1/-1 per bit position; bit b of
    the signature is the vote sign.  Bit source: the high bit of hex digit
    b of md5(token) (shared between engines).  One explode + one groupBy."""
    toks = df.select(
        F.col(id_col), F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("tok")
    ).withColumn("h", F.md5(F.col("tok")))
    high = tuple("89abcdef")
    votes = [
        F.sum(
            F.when(F.substring("h", b + 1, 1).isin(*high), 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    bit_exprs = [
        F.when(F.col(f"v{b}") >= 0, F.lit("1")).otherwise(F.lit("0"))
        for b in range(bits)
    ]
    return agg.select(F.col(id_col), F.concat(*bit_exprs).alias("simhash"))


def ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    left_col: str = "doc_a",
    right_col: str = "doc_b",
) -> DataFrame:
    """Token-set Jaccard similarity for given candidate pairs.

    ``pairs`` carries (doc_a, doc_b); token sets are joined in (broadcast
    when small) and compared with array_intersect — integer set sizes, so
    the single division is oracle-exact.
    """
    toksets = docs.select(
        F.col(id_col), F.array_distinct(F.sort_array(ws_tokens(F.lower(F.col(text_col))))).alias("toks")
    )
    a = toksets.select(
        F.col(id_col).alias(left_col), F.col("toks").alias("toks_a")
    )
    b = toksets.select(
        F.col(id_col).alias(right_col), F.col("toks").alias("toks_b")
    )
    joined = pairs.join(a, on=left_col).join(b, on=right_col)
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size("toks_a") + F.size("toks_b") - inter
    return joined.select(
        left_col,
        right_col,
        F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
    )


# Below this many symmetrized edges, connected_components skips the
# up-front repartition(dst) of its cached edge list: the per-round
# Exchange it would save is cheaper than the extra edge-sized shuffle
# at small scale (A/B'd at sf0.1 vs the 5M/20M-doc corpus runs — see
# the comment at the repartition site).
CC_PREPARTITION_MIN_EDGES = 1_000_000


def connected_components(
    pairs: DataFrame,
    left_col: str = "doc_a",
    right_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Duplicate-group assignment: connected components over a candidate
    pair list, returned as (doc_id, group_id) with group_id = the
    component's minimum id.

    Spark-first shape: min-label propagation with POINTER JUMPING — per
    round, each node takes the min label over its closed neighborhood
    (one shuffle join + one aggregation), then labels short-circuit
    through their own targets (``label := label(label)``, one more join).
    The jump halves remaining chain lengths every round, so convergence
    takes O(log diameter) rounds instead of O(diameter) — the same
    round-compression idea as large-star/small-star CC.  Chain-shaped
    duplicate sets (doc_i ~ doc_{i+1}) are exactly the case where plain
    propagation degenerates to diameter-many rounds.

    Cost anatomy (measured at bench scale, where fixed per-job overhead
    dominates): duplicate candidate pairs are NOT deduped — min-agg is
    idempotent to them, and the dedup shuffle costs more than the dup
    rows; the symmetrized edge list is materialized ONCE via
    localCheckpoint (also evaluates the possibly-expensive upstream pair
    plan exactly once); each round is one lineage-truncating action plus
    a convergence probe over already-checkpointed inputs.
    """
    # Symmetrize with ONE evaluation of the pairs plan: explode both
    # orientations from each row instead of a self-union, which would run
    # the upstream plan twice.
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(left_col).alias("src"),
                        F.col(right_col).alias("dst"),
                    ),
                    F.struct(
                        F.col(right_col).alias("src"),
                        F.col(left_col).alias("dst"),
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node"))
    # Static self-loops fold "keep your own label" into the SAME min
    # aggregation as the neighbor labels — one join + one agg per round
    # instead of join + agg + join.
    #
    # repartition("dst") BEFORE persist: every round joins this edge list
    # on ``dst``, and a cached-but-unpartitioned edge list pays a full
    # edge-sized Exchange per round (exchanges are not reused across the
    # per-round jobs).  Caching it already hash-partitioned on the join
    # key makes EnsureRequirements skip that Exchange every round — the
    # per-round shuffle drops from O(edges) to O(nodes) (labels side +
    # post-agg rows), which is the term that dominated d6 at corpus scale
    # (SCALEBENCH.md 5M-doc run: 263 s → 37.8 s, wall flat across two
    # corpus decades).
    #
    # GATED on edge count: the pre-partition is an up-front edge-sized
    # Exchange that tiny inputs pay without amortizing (sf0.1 bench read
    # 3.27 → 3.88 s when it was unconditional — the 32-partition
    # round-robin cache already overlaps the per-round Exchange with the
    # join at that size).  ``sym`` is already localCheckpointed, so the
    # count is a cached-block scan, not a recompute.  Threshold A/B'd at
    # sf0.1 (≈86k sym edges: skip wins) vs the 5M-doc corpus (≈9.2M sym
    # edges: pre-partition wins 7×); the crossover sits where per-round
    # Exchange cost exceeds one job's fixed overhead — ~1M edges.
    und = sym.unionByName(
        nodes.select(F.col("node").alias("src"), F.col("node").alias("dst"))
    )
    if sym.count() >= CC_PREPARTITION_MIN_EDGES:
        und = und.repartition(F.col("dst"))
    und_self = und.persist()

    def step(lab: DataFrame) -> DataFrame:
        # One propagation step: min over the closed neighborhood (the
        # self-loop row carries each node's OWN previous label into
        # ``old_label`` — the convergence signal rides the same
        # shuffle+agg), then a pointer jump (labels always point to a
        # smaller node in the same component, so label(label) is valid
        # and no larger; a component minimum maps to itself, guarded
        # with coalesce).
        prop = (
            und_self.join(
                lab.select(
                    F.col("node").alias("dst"), F.col("label").alias("nlabel")
                ),
                on="dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(
                F.min("nlabel").alias("label"),
                F.min(
                    F.when(F.col("dst") == F.col("src"), F.col("nlabel"))
                ).alias("old_label"),
            )
        )
        return prop.join(
            prop.select(
                F.col("node").alias("label"), F.col("label").alias("jlabel")
            ),
            on="label",
            how="left",
        ).select(
            "node",
            F.least(F.col("label"), F.coalesce("jlabel", "label")).alias(
                "label"
            ),
            "old_label",
        )

    # One propagation step per materialized round.  (Fusing two steps
    # into one action was tried and measured SLOWER: ``prop`` appears
    # twice inside ``step``, so a fused step(step(..)) plan carries four
    # copies of the inner subtree and exchange reuse does not reliably
    # dedupe them — the recompute dwarfs the saved job barrier.)
    # ``step``'s output appears twice in its own jump join, so the round
    # result must be lineage-truncated (localCheckpoint) — chaining
    # persisted plans would double the logical-plan size every round and
    # OOM the driver on plan analysis long before any data is large.
    # Folding the probe into the materializing action (lazy
    # localCheckpoint + a changed-label count as the one job per round)
    # was tried and measured SLOWER (2.69s vs 2.31s min-of-3 at sf0.1):
    # the count's filter+aggregate over the full frame costs more than an
    # eager checkpoint followed by an isEmpty over already-cached blocks.
    # Keep the two-action shape; the probes are ~each a block-cached scan.
    for i in range(max_iter):
        new_labels = step(labels).localCheckpoint(eager=True)
        # Round 0 converges only on an edgeless graph — skip its probe.
        converged = i > 0 and (
            new_labels.where(F.col("label") != F.col("old_label")).isEmpty()
        )
        labels = new_labels
        if converged:
            break
    und_self.unpersist()
    # labels is already checkpointed; the rename projection is free.
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("group_id")
    )



def edit_distance_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    left_col: str = "doc_a",
    right_col: str = "doc_b",
    prefix_len: int = 256,
) -> DataFrame:
    """Exact edit-distance verification for CANDIDATE pairs — the
    second-stage check after LSH/SimHash blocking (MinHash finds
    lookalikes; Levenshtein proves them).

    Never all-pairs: ``pairs`` comes from a bounded candidate generator,
    and the comparison is capped at ``prefix_len`` characters per side,
    so per-pair cost is O(prefix_len^2) regardless of document length —
    the standard bound a production near-dup verifier puts on the DP
    matrix.  ``rel_distance`` normalizes by the longer compared prefix.
    JVM-side ``levenshtein`` expression (no UDF); DuckDB ships the same
    function, so the oracle is exact.

    The prefix proxy is localCheckpointed (r12, guide §8): the doc_a and
    doc_b join sides are alias-identical subtrees that Catalyst does NOT
    reuse (verified on the executed plan — two BroadcastExchange builds,
    zero ReusedExchange), so without the checkpoint the corpus text is
    scanned and decoded TWICE.  The checkpointed frame is the NARROW
    (id, <=prefix_len chars) proxy, never the full text; results are
    byte-identical (exceptAll 0 at sf0.1; interleaved A/B 2.54 -> 1.63 s
    min-of-4).
    """
    t = docs.select(
        F.col(id_col),
        F.substring(F.col(text_col), 1, prefix_len).alias("__t"),
    ).localCheckpoint(eager=False)
    a = t.select(F.col(id_col).alias(left_col), F.col("__t").alias("t_a"))
    b = t.select(F.col(id_col).alias(right_col), F.col("__t").alias("t_b"))
    joined = pairs.join(a, on=left_col).join(b, on=right_col)
    dist = F.levenshtein("t_a", "t_b")
    rel = dist / F.greatest(
        F.greatest(F.length("t_a"), F.length("t_b")), F.lit(1)
    )
    return joined.select(
        left_col,
        right_col,
        dist.alias("edit_distance"),
        F.round(rel, 6).alias("rel_distance"),
    )

def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns, accumulated in double
    with a fixed left-to-right fold (bit-identical across engines).

    NOTE: higher-order-function folds are interpreted (not codegen'd) —
    fine for small pair counts; hot paths use
    :func:`quantized_cosine_udf` instead (vectorized numpy, still
    oracle-exact via integer quantization).
    """
    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


QUANT_SCALE = 10_000_000  # 1e7: fits 64 x (1e7 x maxval)^2 in int64


def quantized_cosine_udf():
    """Arrow-vectorized cosine over int64-quantized vectors.

    Each element is quantized as ``floor(x * 1e7 + 0.5)`` (exact in
    float64 for |x| < ~100); dot products and norms are then *integer*
    sums — order-independent and exactly reproducible in SQL — and only
    the final division happens in float.  This keeps the DuckDB oracle
    bit-exact while running ~100x faster than an interpreted
    zip_with/aggregate fold (numpy matmul per Arrow batch).
    """

    @F.pandas_udf("double")
    def qcos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack([np.asarray(v, dtype=np.float64) for v in a])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in b])
        Aq = np.floor(A * QUANT_SCALE + 0.5).astype(np.int64)
        Bq = np.floor(B * QUANT_SCALE + 0.5).astype(np.int64)
        dots = (Aq * Bq).sum(axis=1).astype(np.float64)
        na = np.sqrt((Aq * Aq).sum(axis=1).astype(np.float64))
        nb = np.sqrt((Bq * Bq).sum(axis=1).astype(np.float64))
        # zero-norm mask: 0/0 is NaN and NaN sorts ABOVE every number in
        # Spark, so a degenerate vector would near-dup everything
        den = na * nb
        return pd.Series(np.where(den == 0, 0.0, dots / np.where(den == 0, 1.0, den)))

    return qcos


def embedding_near_dups(
    embeddings: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_block_size: int = 4096,
) -> DataFrame:
    """Embedding-cosine near-duplicates within a blocking key: the join is
    on ``block_col`` (label / IVF cell), so pair count is bounded per block
    instead of corpus-quadratic.

    Block-size cap: with coarse labels a block of size B still costs B²
    pairs, which at corpus scale is the whole job.  Blocks over
    ``max_block_size`` are hash-split into ``ceil(B / cap)`` sub-blocks
    (deterministic md5 salt on the id, so re-runs and SQL oracles agree);
    near-dup search then only compares within a sub-block — the standard
    bounded-recall trade every production dedup pipeline makes.  Blocks
    under the cap are untouched, so small-scale results are identical to
    the uncapped form.
    """
    n_sub = F.ceil(
        F.count(F.lit(1)).over(Window.partitionBy(block_col))
        / F.lit(max_block_size)
    )
    blocked = embeddings.withColumn(
        "__b",
        F.concat_ws(
            "#",
            F.col(block_col).cast("string"),
            (_md5_salt(F.col(id_col)) % n_sub).cast("string"),
        ),
    )
    # One applyInPandas per (sub-)block: every vector ships over Arrow
    # ONCE, and the block's pairwise cosines come out of a single int64
    # gram matrix (Q @ Q.T).  The earlier self-join + per-pair UDF shape
    # shipped each vector once PER PAIR — a |block|x data blow-up on the
    # Arrow boundary that dominated the stage (measured 1.6 s -> 0.5 s at
    # bench scale).  Same quantization as quantized_cosine_udf, so results
    # (and the SQL oracle) are bit-identical; the block cap bounds the
    # gram matrix at 4096² int64 = 128 MB per task.

    def block_pairs(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cos": "float64"}
            )
        ids = pdf["__id"].to_numpy()
        M = np.stack(pdf["__vec"].to_numpy()).astype(np.float64)
        Q = np.floor(M * QUANT_SCALE + 0.5).astype(np.int64)
        G = Q @ Q.T
        norms = np.sqrt(np.diag(G).astype(np.float64))
        iu, ju = np.triu_indices(n, k=1)
        den = norms[iu] * norms[ju]  # zero-norm mask, as in quantized_cosine_udf
        cos = np.where(
            den == 0, 0.0, G[iu, ju].astype(np.float64) / np.where(den == 0, 1.0, den)
        )
        a_ids, b_ids = ids[iu], ids[ju]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(a_ids, b_ids),
                "vec_b": np.maximum(a_ids, b_ids),
                "cos": cos,
            }
        )

    out = (
        blocked.select(
            "__b",
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__vec"),
        )
        .groupBy("__b")
        .applyInPandas(block_pairs, "vec_a bigint, vec_b bigint, cos double")
    )
    return out.select(
        "vec_a", "vec_b", F.round("cos", 6).alias("cos")
    ).where(F.col("cos") > threshold)


def bloom_bit_positions(
    gram: Column, n_bits: int, n_hashes: int, hash_family: str = "md5"
) -> Column:
    """The ``n_hashes`` Bloom-filter bit positions of a gram column, as
    an array<long>.

    ``md5`` family: per-hash prefix salt, first 8 hex digits ->
    [0, 2^32) -> mod n_bits — md5 is the one hash Spark and the DuckDB
    oracle share, so the filter's exact bit pattern (false positives
    included) is reproducible on both sides.  ``xxhash64`` family:
    ``pmod(xxhash64(gram, i), n_bits)`` — accepts long gram hashes from
    :func:`exploded_word_grams(as_hash=True)` and skips all string
    building; the production family at corpus scale.  Both are plain
    JVM-side projections (whole-stage codegen, no UDF)."""
    if hash_family == "xxhash64":
        return F.array(
            *[
                F.pmod(F.xxhash64(gram, F.lit(i)), F.lit(n_bits))
                for i in range(n_hashes)
            ]
        )
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"b{i}|"), gram)), 1, 8),
                16,
                10,
            ).cast("long")
            % n_bits
            for i in range(n_hashes)
        ]
    )


def bloom_decontaminate(
    corpus_grams: DataFrame,
    bench_grams: DataFrame,
    gram_col: str = "g",
    doc_col: str = "doc_id",
    n_bits: int = 65536,
    n_hashes: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """Benchmark decontamination through a Bloom filter instead of the
    exact broadcast set (c2's shape): count, per corpus document, the
    n-grams the filter reports as benchmark members.

    PRECONDITION: ``corpus_grams`` must be distinct on
    ``(doc_col, gram_col)`` — unlike the old ``shingles_of`` path,
    ``exploded_word_grams`` keeps within-doc duplicate grams, and a
    duplicated gram inflates ``n_flagged_grams``.  Callers own the
    ``dropDuplicates([doc_col, gram_col])`` (every in-repo caller does it
    before the explode-heavy plan section where it is cheapest); it is
    not applied here so already-distinct inputs don't pay a redundant
    shuffle.

    Why this exists next to c2: an exact benchmark n-gram set broadcasts
    fine for eval sets, but a multi-benchmark suite at web scale can reach
    billions of grams — a Bloom filter bounds the broadcast at
    ``n_bits/8`` bytes for an arbitrarily large build side, trading a
    deterministic, measurable false-positive rate (over-flagging only:
    Bloom filters have NO false negatives, so no contamination escapes).

    Execution shape: the build side aggregates to its DISTINCT set bit
    positions — at most ``n_bits`` rows no matter how many benchmark
    grams exist, so it broadcasts BY CONSTRUCTION — and membership
    ("every one of the gram's positions is set") is one broadcast left
    SEMI join per hash: all map-side, the broadcast built once and
    reused (ReusedExchange), the whole operator one lazy plan whose only
    shuffle is the final per-doc count's map-side-combined aggregation.
    For n_bits beyond broadcast comfort (~100M+), the same positions
    fold into a packed-long bitmap in a broadcast variable probed by an
    Arrow UDF; the relational form is preferred while the positions
    relation broadcasts.
    """
    g, d = F.col(gram_col), F.col(doc_col)
    bits = bench_grams.select(
        F.explode(
            bloom_bit_positions(g, n_bits, n_hashes, hash_family)
        ).alias("bit")
    ).distinct()
    pos = bloom_bit_positions(g, n_bits, n_hashes, hash_family)
    probe = corpus_grams.select(
        d.alias("doc_id"),
        *[pos[i].alias(f"__p{i}") for i in range(n_hashes)],
    )
    # "every position is set" = one broadcast LEFT SEMI join per hash —
    # map-side (no shuffle), one lazy plan (no driver collect), and the
    # identical ~n_bits-row broadcast is built once and reused across the
    # joins (ReusedExchange).  Measured alternatives at sf0.1, rejected:
    # a per-gram count(*)==count(matched) left join adds a data-sized
    # shuffle; collecting the positions into a literal bitmap costs a
    # second job plus plan-time literal folding (0.5s packed / 28s as a
    # 65k-element array) every call.
    for i in range(n_hashes):
        bits_i = bits.withColumnRenamed("bit", f"__b{i}")
        probe = probe.join(
            F.broadcast(bits_i),
            probe[f"__p{i}"] == bits_i[f"__b{i}"],
            "left_semi",
        )
    return probe.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_flagged_grams")
    )


def exploded_positional_grams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 13,
    as_hash: bool = False,
) -> DataFrame:
    """(id, pos, h) rows: the hash of every k-token window of the
    document, keyed by its 1-based start-token position — the
    position-AWARE sibling of :func:`exploded_word_grams` (same
    explode-before-construction whole-stage-codegen shape; same
    tokenization).  Documents shorter than ``k`` tokens emit NO windows
    (a doc that cannot contain a k-token overlap has nothing to check),
    unlike exploded_word_grams' whole-doc fallback — set-membership
    consumers want a gram per doc, span consumers want exactly the real
    windows.

    ``as_hash=True`` emits ``xxhash64`` longs folded straight off the k
    token columns (no window string is ever built) — the production
    family at corpus scale, where a 13-token md5 string per window would
    dominate the scan; md5 (default) is the family the DuckDB oracle can
    replay."""
    toks = df.select(
        F.col(id_col), ws_tokens(F.lower(F.col(text_col))).alias("__t")
    )
    n = F.size(F.col("__t"))
    idx = toks.where(n >= k).select(
        id_col,
        "__t",
        F.explode(F.sequence(F.lit(1), n - k + 1)).alias("pos"),
    )
    win = [F.get(F.col("__t"), F.col("pos") - 1 + j) for j in range(k)]
    h = F.xxhash64(*win) if as_hash else F.md5(F.concat_ws(" ", *win))
    return idx.select(id_col, "pos", h.alias("h"))


def merge_window_hits(
    hits: DataFrame,
    window: int,
    id_col: str = "doc_id",
    pos_col: str = "pos",
) -> DataFrame:
    """Merge matched k-token window start positions into maximal
    contaminated token spans (gaps-and-islands): windows at ``p1 <= p2``
    belong to one span when ``p2 - p1 <= window`` (their token ranges
    overlap or touch).  ``window`` MUST be the gram size k used to build
    the hits: it is both the merge-gap threshold and the length added to
    the last start position (``span_end = max(pos) + window - 1``) —
    passing a merge gap different from k would silently skew the span
    geometry.  Output per span: 1-based ``span_start`` / ``span_end``
    token indices, ``span_len``, and ``n_windows`` (matched windows
    inside the span).  One shuffle on ``id_col`` — hits are the sparse
    output of a contamination join, tiny next to the corpus."""
    w = Window.partitionBy(id_col).orderBy(pos_col)
    p = F.col(pos_col)
    marked = hits.withColumn(
        "__brk",
        F.when(p - F.lag(pos_col).over(w) <= window, F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    grp = marked.withColumn("__g", F.sum("__brk").over(w))
    return (
        grp.groupBy(id_col, "__g")
        .agg(
            F.min(pos_col).alias("span_start"),
            (F.max(pos_col) + window - 1).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .withColumn(
            "span_len", F.col("span_end") - F.col("span_start") + F.lit(1)
        )
        .drop("__g")
    )


def token_window_decontaminate(
    docs: DataFrame,
    window: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_mod: int = 97,
    hash_family: str = "md5",
) -> DataFrame:
    """Token-window exact-substring decontamination (the standard "any
    N-consecutive-token overlap with a benchmark" check; N=50 in most
    published pipelines, smaller here for the short synthetic docs):
    corpus documents are scanned with a stride-1 sliding window of
    ``window`` tokens, every window that exactly matches ANY benchmark
    window is a hit, and hits merge into maximal contaminated spans so
    the pipeline can EXCISE the span (the usual remediation) instead of
    dropping the document.

    Where this sits in the family: c2 is exact n-gram SET membership
    (small n, doc-level flag), c8 is the Bloom-bounded version, c10 is
    probabilistic near-dup (LSH) — this is the positional exact check:
    same broadcast-the-benchmark scale shape (eval suites are tiny; the
    corpus side streams through one explode + broadcast semi join), plus
    one sparse per-doc window merge.  Docs with doc_id %% ``bench_mod``
    == 0 stand in for the benchmark suite.  ``hash_family="xxhash64"``
    skips window-string construction entirely (corpusbench's production
    configuration); md5 keeps DuckDB-oracle replayability."""
    grams = exploded_positional_grams(
        docs,
        text_col=text_col,
        id_col=id_col,
        k=window,
        as_hash=hash_family == "xxhash64",
    )
    bench = (
        grams.where(F.col(id_col) % bench_mod == 0).select("h").distinct()
    )
    hits = (
        grams.where(F.col(id_col) % bench_mod != 0)
        .join(F.broadcast(bench), on="h", how="left_semi")
        .select(id_col, "pos")
    )
    return merge_window_hits(hits, window, id_col=id_col)


class BloomBitmap(NamedTuple):
    """Packed Bloom filter artifact: ``n_bits/8`` bytes of packbits plus
    the hash-family parameters that produced it.  Carrying ``n_bits`` /
    ``n_hashes`` WITH the bits makes a build/probe desync impossible —
    probing with a different hash count than the build would silently
    reintroduce false negatives, the one failure mode a Bloom filter
    must never have."""

    packed: np.ndarray  # uint8, length n_bits // 8
    n_bits: int
    n_hashes: int


def bloom_bitmap(
    bench_grams: DataFrame,
    gram_col: str = "g",
    n_bits: int = 65536,
    n_hashes: int = 3,
) -> BloomBitmap:
    """Materialize the Bloom filter as a packed bitmap artifact — the
    build-side input to :func:`flag_contaminated_docs`.  The collect is
    bounded at ``n_bits`` rows BY CONSTRUCTION (distinct set positions),
    the same bounded-artifact stance as the K-sized centroid matrices in
    similarity.py — never data-sized.  NULL grams (e.g. from an upstream
    outer join) set no bits, matching the relational build side where a
    null never equi-joins."""
    bits = (
        bench_grams.where(F.col(gram_col).isNotNull())
        .select(
            F.explode(
                bloom_bit_positions(F.col(gram_col), n_bits, n_hashes)
            ).alias("bit")
        )
        .distinct()
    )
    arr = np.zeros(n_bits, dtype=bool)
    arr[bits.toPandas()["bit"].to_numpy(dtype=np.int64)] = True
    return BloomBitmap(np.packbits(arr), n_bits, n_hashes)


def flag_contaminated_docs(
    docs: DataFrame,
    bloom: BloomBitmap,
    k: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Per-document Bloom contamination count as a STATELESS row-local
    transformation — the form a Structured-Streaming ingest pipeline
    composes (no join, no aggregation, no state: appends work under any
    watermark, and the plan is identical on a batch frame).

    This is the "packed bitmap in a broadcast variable probed by an
    Arrow UDF" alternative documented in :func:`bloom_decontaminate`:
    the relational semi-join form wins while the positions relation
    broadcasts, but a stream (or an n_bits beyond broadcast comfort)
    wants the filter as a task-local artifact — packed at ``n_bits/8``
    bytes and shipped once per executor via a Spark broadcast variable,
    not re-pickled into every UDF command.  Tokenizing + shingling stay
    JVM-side (staged through a materialized token column per
    :func:`shingles_of`'s contract); the Arrow UDF only re-derives the
    same md5 hash family (:func:`bloom_bit_positions`) per DISTINCT
    non-null gram and probes the bitmap, so batch and streaming flag
    identically — stream/batch/relational parity is pytest-enforced.

    Every input document survives with its count (0 included; NULL text
    counts 0), unlike the aggregate form which only emits flagged docs.
    """
    import hashlib

    n_bits, n_hashes = bloom.n_bits, bloom.n_hashes
    packed_bc = docs.sparkSession.sparkContext.broadcast(bloom.packed)

    @F.pandas_udf("long")
    def n_flagged(grams: pd.Series) -> pd.Series:
        packed = packed_bc.value
        out = []
        for gs in grams:
            c = 0
            for gram in set(gs) if gs is not None else ():
                if gram is None:
                    continue  # a null gram never matches the semi-join form
                ok = True
                for i in range(n_hashes):
                    h = (
                        int(
                            hashlib.md5(
                                f"b{i}|{gram}".encode()
                            ).hexdigest()[:8],
                            16,
                        )
                        % n_bits
                    )
                    if not (packed[h >> 3] >> (7 - (h & 7))) & 1:
                        ok = False
                        break
                if ok:
                    c += 1
            out.append(c)
        return pd.Series(out, dtype="int64")

    staged = docs.withColumn(
        "__toks", ws_tokens(F.lower(F.col(text_col)))
    )
    return (
        staged.withColumn(
            "n_flagged_grams", n_flagged(shingles_of(F.col("__toks"), k=k))
        )
        .drop("__toks")
    )


def lsh_cross_contamination(
    corpus_sigs: DataFrame,
    bench_sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    hash_family: str = "md5",
) -> DataFrame:
    """NEAR-duplicate benchmark decontamination: corpus documents that
    share any LSH band bucket with any benchmark document, with the
    count of distinct benchmark near-matches.

    Exact n-gram decontamination (c2/c8) misses paraphrased
    contamination — a benchmark answer lightly reworded shares few exact
    3-grams but most of its MinHash signature.  This is the LSH
    candidate machinery of :func:`lsh_candidate_pairs` pointed across
    two corpora instead of at itself: band keys for both sides from the
    SAME single-projection shape, then corpus x bench bucket equi-join.

    Scale shape: the benchmark side is benchmark-sized (eval suites are
    thousands-to-millions of docs — broadcastable by nature, and
    |bands| x that in rows), so the join is a map-side broadcast hash
    join over the corpus band keys; the only shuffle is the final
    per-document distinct-count aggregation.  A corpus-sized bench
    would flip this to a plain shuffle join — drop the broadcast hint,
    nothing else changes.
    """
    corpus_b = _lsh_band_keys(
        corpus_sigs, id_col, num_hashes, band_size, hash_family
    )
    bench_b = _lsh_band_keys(
        bench_sigs, id_col, num_hashes, band_size, hash_family
    ).withColumnRenamed(id_col, "__bench_id")
    joined = corpus_b.join(
        F.broadcast(bench_b), on=["band", "band_key"]
    )
    return joined.groupBy(id_col).agg(
        F.countDistinct("__bench_id").alias("n_bench_dups")
    )
