"""LLM-training-data pipeline operators over documents/embeddings,
oracle-checked where SQL-expressible.

Dedup strategies run against a doubled corpus (documents UNION documents
with shifted ids) so every strategy provably detects the planted exact
duplicates — the raw table has no duplicate texts, which would make the
checks vacuous.

md5 is the shared deterministic hash between Spark and DuckDB, so
MinHash/LSH and SimHash are *exactly* reproducible in the oracle
(the multimodal entries live in queries/media.py); IVF centroids are made
order-independent by int64-quantizing components before summing — every
entry here is oracle-checked, no rows-only downgrades.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ploverdb_spark.catalog import load, register
from ploverdb_spark.operators import dedup as D
from ploverdb_spark.operators import packing as P
from ploverdb_spark.operators import similarity as S
from ploverdb_spark.operators import text as T

_ID_SHIFT = 1_000_000

# SQL fragments shared by oracles -------------------------------------------

_TOKENS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"
_DOUBLED = f"""
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_ID_SHIFT} AS doc_id, text FROM documents
"""
_SHINGLES3 = (
    "CASE WHEN len(toks) >= 3 THEN list_distinct(list_transform("
    "range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')))"
    " ELSE [array_to_string(toks, ' ')] END"
)


def _doubled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.unionByName(
        docs.select((F.col("doc_id") + _ID_SHIFT).alias("doc_id"), "text")
    )


# -- text analysis ----------------------------------------------------------


@register(
    "t1_token_counts",
    oracle=f"""
    SELECT doc_id,
           len({_TOKENS}) AS n_ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
             AS n_bpe_tokens
    FROM documents
    """,
    doc="Token counting: whitespace + BPE-ish regex pre-tokenization "
    "(pure scan, no shuffle).",
)
def t1_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.token_counts(load(spark, sf_dir, "documents"))


@register(
    "t2_quality_scores",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {_TOKENS} AS toks,
             length(text) AS n_chars_actual
      FROM documents
    ), s AS (
      SELECT doc_id, n_chars_actual,
             len(toks) AS n_tokens,
             (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
               / GREATEST(length(text), 1) AS punct_ratio_raw,
             len(list_filter(toks, x -> list_contains(
                 ['the','a','of','and','to','in','is','it'], x)))
               / GREATEST(len(toks), 1) AS stop_ratio_raw,
             length(regexp_replace(text, '\\s+', '', 'g'))
               / GREATEST(len(toks), 1) AS mean_token_len
      FROM t
    )
    SELECT doc_id, n_chars_actual, n_tokens,
           ROUND(punct_ratio_raw, 6) AS punct_ratio,
           ROUND(stop_ratio_raw, 6) AS stopword_ratio,
           ROUND(0.4 * stop_ratio_raw + 0.3 * (1.0 - punct_ratio_raw)
                 + 0.3 * LEAST(mean_token_len / 10.0, 1.0), 6) AS quality_score
    FROM s
    """,
    doc="Quality scoring: length/punctuation/stopword ratios + composite "
    "score; single-division ratios keep it oracle-exact.",
)
def t2_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.quality_scores(load(spark, sf_dir, "documents"))


@register(
    "t3_language_id",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKENS} AS toks FROM documents
    ), s AS (
      SELECT doc_id,
        len(list_filter(toks, x -> list_contains(['the','and','of','is'], x))) AS score_en,
        len(list_filter(toks, x -> list_contains(['der','und','das','ist'], x))) AS score_de,
        len(list_filter(toks, x -> list_contains(['le','et','les','est'], x))) AS score_fr,
        len(list_filter(toks, x -> list_contains(['el','y','los','es'], x))) AS score_es
      FROM t
    )
    SELECT doc_id, score_en, score_de, score_fr, score_es,
      CASE
        WHEN GREATEST(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
        WHEN score_en = GREATEST(score_en, score_de, score_fr, score_es) THEN 'en'
        WHEN score_de = GREATEST(score_en, score_de, score_fr, score_es) THEN 'de'
        WHEN score_fr = GREATEST(score_en, score_de, score_fr, score_es) THEN 'fr'
        ELSE 'es'
      END AS predicted_lang
    FROM s
    """,
    doc="Language-ID marker heuristic: per-language marker-word hits, "
    "fixed-precedence argmax.",
)
def t3_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.language_id(load(spark, sf_dir, "documents"))


@register(
    "t4_fingerprints",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKENS} AS toks FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(toks) >= 4
                THEN list_min(list_transform(range(1, len(toks) - 2),
                     i -> md5(array_to_string(toks[i:i+3], ' '))))
                ELSE md5(array_to_string(toks, ' '))
           END AS fingerprint,
           len(toks) AS n_tokens
    FROM t
    """,
    doc="Document fingerprint: min of md5 word-4-gram hashes "
    "(winnowing-style; md5 shared between engines).",
)
def t4_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.fingerprints(load(spark, sf_dir, "documents"))


@register(
    "t5_pii_scan",
    oracle="""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 50 = 0 THEN
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com from 10.0.'
                    || CAST(doc_id % 256 AS VARCHAR) || '.7 id 123-45-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
           len(regexp_extract_all(text,
               '\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}([-. ][0-9]{3,4})?'))
             AS n_phone,
           len(regexp_extract_all(text,
               '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS n_ssn_like,
           len(regexp_extract_all(text,
               '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS n_ipv4,
           CASE WHEN len(regexp_extract_all(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                + len(regexp_extract_all(text,
                    '\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}([-. ][0-9]{3,4})?'))
                + len(regexp_extract_all(text,
                    '[0-9]{3}-[0-9]{2}-[0-9]{4}'))
                + len(regexp_extract_all(text,
                    '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) > 0
                THEN 1 ELSE 0 END AS has_pii
    FROM corpus
    """,
    doc="PII-pattern scan (the redaction pre-pass every training corpus "
    "runs): per-document email/phone/SSN-like/IPv4 match counts + flag. "
    "Pure column expressions over one scan (no UDFs, no shuffle); the "
    "patterns avoid backrefs/lookaround so Java regex and RE2 agree. "
    "The raw synthetic docs contain no digits, so every 50th doc gets a "
    "deterministic planted email/IP/SSN-like suffix — same planted-"
    "evidence convention as the doubled-corpus dedup checks (the scan "
    "must find exactly those, everywhere else exactly zero).",
)
def t5_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 id 123-45-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    corpus = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 50 == 0, planted).otherwise(F.col("text")),
    )
    return T.pii_scan(corpus)


# -- dedup ------------------------------------------------------------------


@register(
    "d1_exact_dedup",
    oracle=f"""
    WITH corpus AS ({_DOUBLED})
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies,
           ARRAY_TO_STRING(LIST_SORT(LIST(doc_id)), '|') AS all_ids
    FROM corpus
    GROUP BY md5(text)
    """,
    doc="Exact dedup: hash-groupBy on md5(text) over the doubled corpus "
    "(map-side partial agg, one shuffle on the hash). The id set is "
    "'|'-joined so the driver's hasher can canonicalize the row.",
)
def d1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = D.exact_dedup(_doubled_docs(spark, sf_dir))
    return out.select(
        "content_hash",
        "keep_id",
        "n_copies",
        F.array_join(
            F.transform(F.sort_array("all_ids"), lambda x: x.cast("string")), "|"
        ).alias("all_ids"),
    )


_D2_ORACLE = f"""
    WITH corpus AS ({_DOUBLED}),
    tk AS (
      SELECT doc_id, {_TOKENS} AS toks FROM corpus
    ),
    sh AS (
      SELECT doc_id, {_SHINGLES3} AS shingles FROM tk
    ),
    sigs AS (
      SELECT doc_id,
        list_min(list_transform(shingles, s -> md5('0|' || s))) AS m0,
        list_min(list_transform(shingles, s -> md5('1|' || s))) AS m1,
        list_min(list_transform(shingles, s -> md5('2|' || s))) AS m2,
        list_min(list_transform(shingles, s -> md5('3|' || s))) AS m3,
        list_min(list_transform(shingles, s -> md5('4|' || s))) AS m4,
        list_min(list_transform(shingles, s -> md5('5|' || s))) AS m5,
        list_min(list_transform(shingles, s -> md5('6|' || s))) AS m6,
        list_min(list_transform(shingles, s -> md5('7|' || s))) AS m7
      FROM sh
    ),
    bands AS (
      SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS band_key FROM sigs
      UNION ALL
      SELECT doc_id, 1 AS band, md5(m2 || '|' || m3) AS band_key FROM sigs
      UNION ALL
      SELECT doc_id, 2 AS band, md5(m4 || '|' || m5) AS band_key FROM sigs
      UNION ALL
      SELECT doc_id, 3 AS band, md5(m6 || '|' || m7) AS band_key FROM sigs
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


@register(
    "d2_minhash_lsh_pairs",
    oracle=_D2_ORACLE,
    doc="MinHash+LSH near-dup candidates: word-3-gram shingles -> 8 "
    "md5-derived minhashes -> 4 bands -> bucket self-join. The scale path: "
    "candidate pairs only form within a band bucket.",
)
def d2_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = D.minhash_signatures(_doubled_docs(spark, sf_dir))
    return D.lsh_candidate_pairs(sigs)


@register(
    "d6_dup_groups",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_D2_ORACLE}),
    und AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(n, m) AS (
      SELECT src, src FROM und
      UNION
      SELECT u.dst, r.m FROM reach r JOIN und u ON u.src = r.n
    )
    SELECT n AS doc_id, MIN(m) AS group_id FROM reach GROUP BY n
    """,
    doc="Duplicate-group assignment: connected components over the LSH "
    "candidate pairs via iterative min-label propagation (one shuffle "
    "join + agg per round, rounds = component diameter). The oracle walks "
    "the same graph with a recursive CTE.",
)
def d6_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distinct=False: CC's min-agg is idempotent to duplicate candidate
    # pairs, so the cross-band dedup shuffle is pure waste here.
    # star=True (r12): CC only needs the components, and a per-bucket
    # star (member -> bucket minimum) spans exactly the same
    # connectivity as all C(n,2) pairs — the edge list entering every
    # CC round drops from quadratic to linear in bucket size, with
    # identical groups (oracle unchanged: the recursive CTE walks the
    # full pair graph, whose components equal the star graph's).
    pairs = D.lsh_candidate_pairs(
        D.minhash_signatures(_doubled_docs(spark, sf_dir)),
        distinct=False,
        star=True,
    )
    return D.connected_components(pairs)


@register(
    "d3_simhash",
    oracle=f"""
    WITH corpus AS ({_DOUBLED}),
    tk AS (
      SELECT doc_id, unnest({_TOKENS}) AS tok FROM corpus
    ),
    h AS (
      SELECT doc_id, md5(tok) AS hh FROM tk
    ),
    v AS (
      SELECT doc_id,
        {', '.join(
            f"SUM(CASE WHEN substr(hh, {b + 1}, 1) IN "
            f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v{b}"
            for b in range(16)
        )}
      FROM h GROUP BY doc_id
    )
    SELECT doc_id,
           {" || ".join(
               f"(CASE WHEN v{b} >= 0 THEN '1' ELSE '0' END)" for b in range(16)
           )} AS simhash
    FROM v
    """,
    doc="SimHash signatures: per-token md5 hex-digit bit votes -> 16-bit "
    "signature; one explode + one groupBy.",
)
def d3_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash(_doubled_docs(spark, sf_dir))


@register(
    "d4_ngram_jaccard",
    oracle=f"""
    WITH corpus AS ({_DOUBLED}),
    tk AS (
      SELECT doc_id, list_distinct({_TOKENS}) AS toks FROM corpus
    ),
    pairs AS (
      SELECT doc_id AS doc_a, doc_id + {_ID_SHIFT} AS doc_b FROM documents
      UNION ALL
      SELECT doc_id AS doc_a, doc_id + 1 AS doc_b FROM documents
      WHERE doc_id + 1 IN (SELECT doc_id FROM documents)
    )
    SELECT p.doc_a, p.doc_b,
           ROUND(len(list_intersect(a.toks, b.toks)) * 1.0 /
                 GREATEST(len(a.toks) + len(b.toks)
                          - len(list_intersect(a.toks, b.toks)), 1), 6)
             AS jaccard
    FROM pairs p
    JOIN tk a ON a.doc_id = p.doc_a
    JOIN tk b ON b.doc_id = p.doc_b
    """,
    doc="Token-set Jaccard for candidate pairs (planted dup pairs score "
    "1.0; adjacent-id pairs give a non-trivial distribution).",
)
def d4_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    dup_pairs = docs.select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + _ID_SHIFT).alias("doc_b"),
    )
    ids = docs.select("doc_id")
    adj_pairs = (
        docs.select(
            F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 1).alias("doc_b")
        )
        .join(ids.select(F.col("doc_id").alias("doc_b")), on="doc_b", how="left_semi")
    )
    pairs = dup_pairs.unionByName(adj_pairs)
    return D.ngram_jaccard(pairs, _doubled_docs(spark, sf_dir))


def _qdot(a: str, b: str) -> str:
    """DuckDB fragment: integer-quantized dot product — exactly the
    computation quantized_cosine_udf performs (floor(x*1e7+0.5) -> int64
    products -> exact integer sum)."""
    q1 = "CAST(FLOOR(CAST(x[1] AS DOUBLE) * 10000000 + 0.5) AS BIGINT)"
    q2 = "CAST(FLOOR(CAST(x[2] AS DOUBLE) * 10000000 + 0.5) AS BIGINT)"
    return f"list_sum(list_transform(list_zip({a}, {b}), x -> {q1} * {q2}))"


def _qcos(a: str, b: str) -> str:
    # zero-norm guard: 0/0 would be NaN, which DuckDB and Spark both order
    # ABOVE every number -- a degenerate vector would "near-dup" its whole
    # block.  Engine (quantized_cosine_udf / block_pairs) applies the same
    # cos=0 masking, so the two sides stay bit-identical.
    den = (
        f"(SQRT(CAST({_qdot(a, a)} AS DOUBLE)) * "
        f"SQRT(CAST({_qdot(b, b)} AS DOUBLE)))"
    )
    return (
        f"(CASE WHEN {den} = 0 THEN 0.0 "
        f"ELSE CAST({_qdot(a, b)} AS DOUBLE) / {den} END)"
    )


@register(
    "d5_embedding_neardup",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({_qcos('a.embedding', 'b.embedding')}, 6) AS cos
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_qcos('a.embedding', 'b.embedding')} > 0.3
    """,
    doc="Embedding-cosine near-dup with label blocking: pair space is "
    "per-block, not corpus-quadratic; int64-quantized dot products make "
    "the numpy pandas_udf bit-identical to the SQL oracle.",
)
def d5_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.embedding_near_dups(
        load(spark, sf_dir, "embeddings"), threshold=0.3
    )


@register(
    "c1_clean_corpus",
    oracle=f"""
    WITH corpus AS ({_DOUBLED}),
    t AS (
      SELECT doc_id, text, {_TOKENS} AS toks FROM corpus
    ), s AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
               / GREATEST(length(text), 1) AS punct_ratio_raw,
             len(list_filter(toks, x -> list_contains(
                 ['the','a','of','and','to','in','is','it'], x)))
               / GREATEST(len(toks), 1) AS stop_ratio_raw,
             length(regexp_replace(text, '\\s+', '', 'g'))
               / GREATEST(len(toks), 1) AS mean_token_len,
             len(list_filter(toks, x -> list_contains(['the','and','of','is'], x))) AS score_en,
             len(list_filter(toks, x -> list_contains(['der','und','das','ist'], x))) AS score_de,
             len(list_filter(toks, x -> list_contains(['le','et','les','est'], x))) AS score_fr,
             len(list_filter(toks, x -> list_contains(['el','y','los','es'], x))) AS score_es
      FROM t
    ), q AS (
      SELECT doc_id, n_tokens,
             ROUND(0.4 * stop_ratio_raw + 0.3 * (1.0 - punct_ratio_raw)
                   + 0.3 * LEAST(mean_token_len / 10.0, 1.0), 6) AS quality_score,
             CASE
               WHEN GREATEST(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
               WHEN score_en = GREATEST(score_en, score_de, score_fr, score_es) THEN 'en'
               WHEN score_de = GREATEST(score_en, score_de, score_fr, score_es) THEN 'de'
               WHEN score_fr = GREATEST(score_en, score_de, score_fr, score_es) THEN 'fr'
               ELSE 'es'
             END AS predicted_lang
      FROM s
    ), keep AS (
      SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY md5(text)
    )
    SELECT q.doc_id, n_tokens, quality_score, predicted_lang
    FROM q JOIN keep USING (doc_id)
    WHERE quality_score >= 0.4 AND n_tokens >= 20
    """,
    doc="End-to-end corpus cleaning (the composed pipeline a training-data "
    "run actually executes): exact dedup keeps each content group's "
    "minimum id, joined with quality scoring and language ID, filtered on "
    "quality and length — three operators, one declarative plan, every "
    "stage shuffle-bounded.",
)
def c1_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 optimization (guide §2.4/§8): ONE corpus pass instead of two.
    # The old shape ran text_features and exact_dedup as separate
    # subtrees (two full corpus reads — Catalyst does not merge them)
    # joined by a semi join.  Here the dedup key md5(text) rides in the
    # SAME projection as the features, and the keep-minimum-id-per-hash
    # rule is a groupBy(md5) + min_by — one partial-agg exchange of
    # NARROW feature rows, no second scan, no join.  The quality/length
    # filter is pushed BEFORE the group min: duplicate texts share
    # identical feature values, so the filter keeps or drops whole hash
    # groups and the surviving groups' min doc_id is unchanged (result
    # equality proven by exceptAll at sf0.1 + the oracle at both SFs).
    corpus = _doubled_docs(spark, sf_dir)
    feats = T.text_features(corpus, extra_cols={"__h": F.md5("text")})
    return (
        feats.where(
            (F.col("quality_score") >= 0.4) & (F.col("n_tokens") >= 20)
        )
        .groupBy("__h")
        .agg(
            F.min_by(
                F.struct(
                    "doc_id", "n_tokens", "quality_score", "predicted_lang"
                ),
                F.col("doc_id"),
            ).alias("__r")
        )
        .select(
            "__r.doc_id",
            "__r.n_tokens",
            "__r.quality_score",
            "__r.predicted_lang",
        )
    )


@register(
    "c2_decontamination",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_TOKENS} AS toks FROM documents
    ), sh AS (
      SELECT doc_id,
             {_SHINGLES3} AS shingles
      FROM tk
    ), bench AS (
      SELECT DISTINCT md5(g) AS h FROM (
        SELECT unnest(shingles) AS g FROM sh WHERE doc_id % 97 = 0
      )
    ), corpus AS (
      SELECT DISTINCT doc_id, md5(g) AS h FROM (
        SELECT doc_id, unnest(shingles) AS g FROM sh WHERE doc_id % 97 <> 0
      )
    )
    SELECT c.doc_id, COUNT(*) AS n_shared_ngrams
    FROM corpus c JOIN bench b ON b.h = c.h
    GROUP BY c.doc_id
    """,
    doc="Benchmark decontamination (the check every LLM training-data "
    "pipeline runs before a corpus ships): flag corpus documents sharing "
    "any exact word 3-gram with the held-out benchmark set (docs with "
    "doc_id %% 97 == 0 stand in for an eval set).  Scale shape: the "
    "benchmark n-gram hash set is small (eval sets are) and broadcasts; "
    "the corpus side streams through one explode + semi-ish join + "
    "per-doc count — no all-pairs comparison anywhere.",
)
def c2_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # Gram rows via exploded_word_grams (explode-before-construction,
    # whole-stage codegen) instead of shingles_of + explode, whose
    # transform/array_distinct lambdas evaluate INTERPRETED per element
    # (guide §4.1) — the same swap d2's signature path made in r12.
    # Within-doc duplicate grams (which shingles_of's array_distinct
    # removed) are erased by the existing .distinct()/.dropDuplicates()
    # on both consumers, so the result set is IDENTICAL (verified: exact
    # equality at sf0.01 and sf0.1; interleaved A/B 1.24 -> 1.06 s).
    grams = D.exploded_word_grams(docs, k=3).select(
        "doc_id", F.md5("g").alias("h")
    )
    bench = grams.where(F.col("doc_id") % 97 == 0).select("h").distinct()
    corpus = grams.where(F.col("doc_id") % 97 != 0).dropDuplicates(
        ["doc_id", "h"]
    )
    return (
        corpus.join(F.broadcast(bench), on="h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


# -- similarity search ------------------------------------------------------


_S1_ORACLE = f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_qcos('q.embedding', 'c.embedding')} AS cos_raw
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 5
    ), ranked AS (
      SELECT query_id, neighbor_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, ROUND(cos_raw, 6) AS cos
    FROM ranked WHERE rank <= 10
"""


@register(
    "s1_cosine_topk",
    oracle=_S1_ORACLE,
    doc="Brute-force cosine top-k (correctness baseline for ANN): "
    "broadcast query set x one corpus scan + per-query window top-k; "
    "int64-quantized cosine keeps Spark and the oracle bit-identical.",
)
def s1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.brute_force_topk(
        load(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=10
    )


def _ivf_oracle(n_probe: int) -> str:
    """The IVF top-k oracle, parameterized by how many nearest cells each
    query probes (``crank <= n_probe``) — shared by s2 (single probe) and
    s5 (multi-probe recall comparison)."""
    return f"""
    WITH ex AS (
      SELECT label AS cell,
             unnest(range(1, len(embedding) + 1)) AS pos,
             unnest(embedding) AS v
      FROM embeddings
    ), cq AS (
      SELECT cell, pos,
             SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 10000000 + 0.5) AS BIGINT))
               AS qsum,
             COUNT(*) AS n
      FROM ex GROUP BY cell, pos
    ), cent AS (
      SELECT cell,
             list(CAST(qsum AS DOUBLE) / (CAST(n AS DOUBLE) * 10000000.0)
                  ORDER BY pos) AS centroid
      FROM cq GROUP BY cell
    ), q AS (
      SELECT vec_id AS query_id, embedding AS q_emb
      FROM embeddings WHERE vec_id < 5
    ), routed AS (
      SELECT query_id, q_emb, cell, {_qcos('q_emb', 'centroid')} AS cdist
      FROM q CROSS JOIN cent
    ), probe AS (
      SELECT query_id, q_emb, cell FROM (
        SELECT query_id, q_emb, cell,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cdist DESC, cell) AS crank
        FROM routed
      ) WHERE crank <= {n_probe}
    ), scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             {_qcos('p.q_emb', 'c.embedding')} AS cos_raw
      FROM probe p
      JOIN embeddings c ON c.label = p.cell AND c.vec_id <> p.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, ROUND(cos_raw, 6) AS cos
    FROM ranked WHERE rank <= 10
"""


_S2_ORACLE = _ivf_oracle(1)


@register(
    "s2_ivf_topk",
    oracle=_S2_ORACLE,
    doc="IVF approximate top-k (the 100 TB scale path): per-cell centroids "
    "via distributed elementwise mean, queries probe nearest cell only. "
    "Centroid components are int64-quantized before summing (exact integer "
    "sums, one float division), so the oracle reproduces them bit-for-bit.",
)
def s2_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.ivf_topk(
        load(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=10
    )


@register(
    "s4_ivf_recall",
    oracle=f"""
    WITH exact_topk AS ({_S1_ORACLE}),
    approx_topk AS ({_S2_ORACLE})
    SELECT e.query_id,
           COUNT(a.neighbor_id) AS n_hits,
           CAST(COUNT(a.neighbor_id) AS DOUBLE) / 10 AS recall_at_10
    FROM exact_topk e
    LEFT JOIN approx_topk a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """,
    doc="ANN evaluation: recall@10 of the IVF index against the exact "
    "brute-force baseline, per query — the quality gate every ANN "
    "deployment runs before trusting the approximate path.",
)
def s4_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    exact = S.brute_force_topk(emb, query_ids=[0, 1, 2, 3, 4], k=10).select(
        "query_id", "neighbor_id"
    )
    approx = S.ivf_topk(emb, query_ids=[0, 1, 2, 3, 4], k=10).select(
        F.col("query_id").alias("a_query_id"),
        F.col("neighbor_id").alias("a_neighbor_id"),
    )
    joined = exact.join(
        approx,
        (F.col("query_id") == F.col("a_query_id"))
        & (F.col("neighbor_id") == F.col("a_neighbor_id")),
        how="left",
    )
    return joined.groupBy("query_id").agg(
        F.count("a_neighbor_id").alias("n_hits"),
        (F.count("a_neighbor_id").cast("double") / F.lit(10)).alias(
            "recall_at_10"
        ),
    )


@register(
    "s5_ivf_multiprobe",
    oracle=f"""
    WITH exact_topk AS ({_S1_ORACLE}),
    p1 AS ({_ivf_oracle(1)}),
    p3 AS ({_ivf_oracle(3)})
    SELECT e.query_id,
           CAST(COUNT(a1.neighbor_id) AS DOUBLE) / 10 AS recall_p1,
           CAST(COUNT(a3.neighbor_id) AS DOUBLE) / 10 AS recall_p3
    FROM exact_topk e
    LEFT JOIN p1 a1
      ON a1.query_id = e.query_id AND a1.neighbor_id = e.neighbor_id
    LEFT JOIN p3 a3
      ON a3.query_id = e.query_id AND a3.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """,
    doc="Multi-probe IVF evaluation: recall@10 when each query probes its "
    "1 vs 3 nearest cells, against the exact baseline.  Probing more "
    "cells recovers neighbors that fell across a cell boundary — the "
    "standard IVF recall/latency dial (candidate volume grows linearly "
    "with probes, stays |probes x cell| not |corpus|).",
)
def s5_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = S.brute_force_topk(emb, query_ids=qids, k=10).select(
        "query_id", "neighbor_id"
    )

    def hits(n_probe: int, tag: str) -> DataFrame:
        return S.ivf_topk(emb, query_ids=qids, k=10, n_probe_cells=n_probe).select(
            F.col("query_id").alias(f"{tag}_query_id"),
            F.col("neighbor_id").alias(f"{tag}_neighbor_id"),
        )

    a1, a3 = hits(1, "p1"), hits(3, "p3")
    joined = exact.join(
        a1,
        (F.col("query_id") == F.col("p1_query_id"))
        & (F.col("neighbor_id") == F.col("p1_neighbor_id")),
        how="left",
    ).join(
        a3,
        (F.col("query_id") == F.col("p3_query_id"))
        & (F.col("neighbor_id") == F.col("p3_neighbor_id")),
        how="left",
    )
    return joined.groupBy("query_id").agg(
        (F.count("p1_neighbor_id").cast("double") / F.lit(10)).alias("recall_p1"),
        (F.count("p3_neighbor_id").cast("double") / F.lit(10)).alias("recall_p3"),
    )


@register(
    "s3_kmeans_cells",
    oracle=f"""
    WITH cent0 AS (
      SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS centroid
      FROM embeddings WHERE vec_id < 8
    ), a0 AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_qcos('e.embedding', 'c.centroid')} DESC, c.cell
               ) AS rn
        FROM embeddings e CROSS JOIN cent0 c
      ) WHERE rn = 1
    ), ex1 AS (
      SELECT cell,
             unnest(range(1, len(embedding) + 1)) AS pos,
             unnest(embedding) AS v
      FROM a0
    ), cq1 AS (
      SELECT cell, pos,
             SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 10000000 + 0.5) AS BIGINT))
               AS qsum,
             COUNT(*) AS n
      FROM ex1 GROUP BY cell, pos
    ), cent1 AS (
      SELECT cell,
             list(CAST(qsum AS DOUBLE) / (CAST(n AS DOUBLE) * 10000000.0)
                  ORDER BY pos) AS centroid
      FROM cq1 GROUP BY cell
    ), a1 AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_qcos('e.embedding', 'c.centroid')} DESC, c.cell
               ) AS rn
        FROM embeddings e CROSS JOIN cent1 c
      ) WHERE rn = 1
    )
    SELECT vec_id, cell FROM a1
    """,
    doc="Learned IVF cells: two Lloyd's k-means assignment rounds by "
    "cosine with one centroid update between them — deterministic seeds "
    "(centroid j = vector j) and int64-quantized centroid means make the "
    "whole iteration bit-replayable in SQL. The scale path for similarity "
    "search when no labels exist.",
)
def s3_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.kmeans_assign(
        load(spark, sf_dir, "embeddings"), k=8, assignment_rounds=2
    )


# -- training-set assembly --------------------------------------------------


def _hex4(hexpr: str) -> str:
    """DuckDB fragment: integer value of the first 4 hex digits of the md5
    string expression ``hexpr`` (= Spark's conv(substring(md5,1,4),16,10))."""
    hexd = "'0123456789abcdef'"

    def digit(i: int) -> str:
        return f"(strpos({hexd}, substr({hexpr}, {i}, 1)) - 1)"

    return f"(4096*{digit(1)} + 256*{digit(2)} + 16*{digit(3)} + {digit(4)})"


_MD5_ID = "md5(CAST(doc_id AS VARCHAR))"
_MD5_STRAT = "md5('strat' || CAST(doc_id AS VARCHAR))"
_MD5_DOMCAP = "md5('domcap' || CAST(doc_id AS VARCHAR))"
_U_STRAT = f"({_hex4(_MD5_STRAT)} / 65536.0)"
_U_DOMCAP = f"({_hex4(_MD5_DOMCAP)} / 65536.0)"


@register(
    "c3_sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST({_hex4(_MD5_ID)} % 8 AS BIGINT) AS shard,
             CAST(len({_TOKENS}) AS INTEGER) AS n_tokens
      FROM documents
    ), p AS (
      SELECT doc_id, shard, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cum_before
      FROM t WHERE n_tokens > 0
    )
    SELECT doc_id, shard, n_tokens,
           cum_before // 512 AS seq_idx,
           cum_before % 512 AS seq_offset,
           (cum_before % 512) + n_tokens > 512 AS straddles
    FROM p
    """,
    doc="Concat-and-chunk sequence packing into 512-token training "
    "sequences, hash-sharded so every shard packs independently (one "
    "shuffle, per-shard window cumsum — no global sort).",
)
def c3_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ploverdb_spark.operators import packing as P

    return P.pack_sequences(load(spark, sf_dir, "documents"), seq_len=512)


@register(
    "c4_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {_U_STRAT} < CASE lang WHEN 'en' THEN 0.25
                                 WHEN 'de' THEN 0.5
                                 ELSE 1.0 END
    """,
    doc="Language rebalancing: deterministic per-stratum Bernoulli keep "
    "(md5 uniform vs per-lang rate) — a pure row-local filter, zero "
    "shuffles at any scale.",
)
def c4_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ploverdb_spark.operators import packing as P

    return P.stratified_sample(
        load(spark, sf_dir, "documents"),
        rates={"en": 0.25, "de": 0.5},
    ).select("doc_id", "lang", "source")


@register(
    "c5_domain_cap",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, source, {_U_DOMCAP} AS __u FROM documents
    ), n AS (
      SELECT source, count(*) AS __n FROM documents GROUP BY source
    ), g AS (
      SELECT u.doc_id, u.source, u.__u FROM u JOIN n USING (source)
      WHERE u.__u * n.__n < 40.0
    ), r AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY __u, doc_id)
               AS rn
      FROM g
    )
    SELECT doc_id, source FROM r WHERE rn <= 10
    """,
    doc="Per-domain contribution cap (10 docs/domain, deterministic md5 "
    "pick): two-phase — broadcast per-domain counts Bernoulli-pre-gate "
    "hot domains to O(cap) survivors before the rank window, so no task "
    "ever sorts a whole hot domain.",
)
def c5_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ploverdb_spark.operators import packing as P

    return P.cap_per_domain(
        load(spark, sf_dir, "documents").select("doc_id", "source"), cap=10
    ).select("doc_id", "source")


@register(
    "c6_embedding_quantization",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             CAST(len(embedding) AS INTEGER) AS n_dims,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
               AS am
      FROM embeddings
    ), g AS (
      SELECT vec_id, embedding, n_dims,
             CASE WHEN am > 0 THEN am ELSE 1.0 END AS sc
      FROM s
    ), q AS (
      SELECT vec_id, embedding, n_dims, sc,
             list_transform(
               embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) / sc * 127 + 0.5) AS INTEGER)
             ) AS q
      FROM g
    )
    SELECT vec_id, n_dims, round(sc, 6) AS scale,
           array_to_string(q, ',') AS q_csv,
           round(list_max(list_transform(
             range(1, n_dims + 1),
             i -> abs(CAST(embedding[i] AS DOUBLE)
                      - CAST(q[i] AS DOUBLE) * sc / 127)
           )), 9) AS max_abs_err
    FROM q
    """,
    doc="int8 embedding quantization (per-vector symmetric scale) with "
    "worst-case reconstruction error — pure column expressions, zero "
    "shuffles/UDFs; the storage-compression step before shipping vectors "
    "to training or ANN serving.  The catalog entry renders the quantized "
    "vector as a comma-joined string (q_csv) because the correctness "
    "driver's pandas canonicalizer cannot sort raw array columns; the "
    "operator API (quantize_embeddings) keeps the typed array<int>.",
)
def c6_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.quantize_embeddings(load(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "n_dims",
        "scale",
        F.array_join(F.col("q").cast("array<string>"), ",").alias("q_csv"),
        "max_abs_err",
    )


@register(
    "d7_edit_distance_verify",
    oracle=f"""
    WITH pairs AS ({_D2_ORACLE}),
    corpus AS ({_DOUBLED}),
    t AS (SELECT doc_id, substr(text, 1, 256) AS __t FROM corpus),
    j AS (
      SELECT p.doc_a, p.doc_b, ta.__t AS t_a, tb.__t AS t_b
      FROM pairs p
      JOIN t ta ON p.doc_a = ta.doc_id
      JOIN t tb ON p.doc_b = tb.doc_id
    )
    SELECT doc_a, doc_b,
           levenshtein(t_a, t_b) AS edit_distance,
           round(levenshtein(t_a, t_b)
                 / GREATEST(GREATEST(length(t_a), length(t_b)), 1), 6)
             AS rel_distance
    FROM j
    """,
    doc="Edit-distance verification of LSH candidate pairs (second-stage "
    "near-dup check: MinHash finds lookalikes, Levenshtein proves them). "
    "Never all-pairs; DP matrix capped at 256 chars per side; JVM "
    "levenshtein expression, no UDF.",
)
def d7_edit_distance_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _doubled_docs(spark, sf_dir)
    pairs = D.lsh_candidate_pairs(D.minhash_signatures(docs))
    return D.edit_distance_pairs(pairs, docs)



@register(
    "t6_repetition_scores",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id,
             text || repeat(chr(10) || 'same boilerplate line',
                            CAST(doc_id % 4 AS INTEGER)) AS text
      FROM documents
    ), t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\n'), x -> x <> '')
               AS lines,
             {_TOKENS} AS toks
      FROM corpus
    ), g AS (
      SELECT doc_id, lines,
             CASE WHEN len(toks) >= 2
                  THEN list_transform(range(1, len(toks)),
                       i -> array_to_string(toks[i:i+1], ' '))
                  ELSE CAST([] AS VARCHAR[]) END AS bigrams
      FROM t
    ), u AS (
      SELECT doc_id, unnest(bigrams) AS bg FROM g
    ), c AS (
      SELECT doc_id, bg, count(*) AS cnt FROM u GROUP BY doc_id, bg
    ), mx AS (
      SELECT doc_id, max(cnt) AS top_bigram_count FROM c GROUP BY doc_id
    )
    SELECT g.doc_id,
           len(lines) AS n_lines,
           round((len(lines) - len(list_distinct(lines)))
                 / GREATEST(len(lines), 1), 6) AS dup_line_frac,
           len(bigrams) AS n_bigrams,
           CAST(COALESCE(mx.top_bigram_count, 0) AS INTEGER)
             AS top_bigram_count,
           round(COALESCE(mx.top_bigram_count, 0)
                 / GREATEST(len(bigrams), 1), 6) AS top_bigram_frac
    FROM g LEFT JOIN mx ON g.doc_id = mx.doc_id
    """,
    doc="Gopher-style repetition quality signals: duplicate-line fraction "
    "and top-bigram fraction per document. Shuffle-free (sorted "
    "run-length fold over each doc's own bigram array, not explode + "
    "groupBy); deterministic boilerplate lines planted on 3/4 of docs so "
    "the metric provably fires. The oracle recomputes the max bigram "
    "multiplicity via unnest + group-by.",
)
def t6_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.expr("repeat('\\nsame boilerplate line', CAST(doc_id % 4 AS INT))"),
        ).alias("text"),
    )
    return T.repetition_scores(docs)


@register(
    "c7_training_mix",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, lang, source, {_TOKENS} AS toks FROM documents
    ), s AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             ROUND(0.4 * (len(list_filter(toks, x -> list_contains(
                       ['the','a','of','and','to','in','is','it'], x)))
                     / GREATEST(len(toks), 1))
                 + 0.3 * (1.0 - (length(text)
                     - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                     / GREATEST(length(text), 1))
                 + 0.3 * LEAST((length(regexp_replace(text, '\\s+', '', 'g'))
                     / GREATEST(len(toks), 1)) / 10.0, 1.0), 6)
               AS quality_score
      FROM t
    ), clean AS (
      SELECT t.doc_id, t.lang, t.source, t.toks, s.n_tokens
      FROM t JOIN s USING (doc_id)
      WHERE s.quality_score >= 0.4 AND s.n_tokens >= 20
    ), samp AS (
      SELECT * FROM clean
      WHERE {_U_STRAT} < CASE lang WHEN 'en' THEN 0.5 ELSE 1.0 END
    ), n AS (
      SELECT source, count(*) AS __n FROM samp GROUP BY source
    ), g AS (
      SELECT samp.*, {_U_DOMCAP} AS __u, n.__n
      FROM samp JOIN n USING (source)
      WHERE {_U_DOMCAP} * n.__n < 60.0
    ), r AS (
      SELECT g.*, row_number() OVER (
        PARTITION BY source ORDER BY __u, doc_id) AS rn
      FROM g
    ), capped AS (
      SELECT doc_id, toks, n_tokens FROM r WHERE rn <= 15
    ), bg AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 2
                  THEN list_transform(range(1, len(toks)),
                       i -> array_to_string(toks[i:i+1], ' '))
                  ELSE CAST([] AS VARCHAR[]) END AS bigrams
      FROM capped
    ), u AS (
      SELECT doc_id, unnest(bigrams) AS b2 FROM bg
    ), c AS (
      SELECT doc_id, b2, count(*) AS cnt FROM u GROUP BY doc_id, b2
    ), mx AS (
      SELECT doc_id, max(cnt) AS topc FROM c GROUP BY doc_id
    ), calm AS (
      SELECT capped.doc_id, capped.n_tokens
      FROM capped
      JOIN bg USING (doc_id)
      LEFT JOIN mx USING (doc_id)
      WHERE ROUND(COALESCE(mx.topc, 0)
                  / GREATEST(len(bg.bigrams), 1), 6) < 0.3
    ), p0 AS (
      SELECT doc_id,
             CAST({_hex4(_MD5_ID)} % 8 AS BIGINT) AS shard,
             CAST(n_tokens AS INTEGER) AS n_tokens
      FROM calm
    ), p AS (
      SELECT doc_id, shard, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cum
      FROM p0
    )
    SELECT doc_id, shard, n_tokens,
           cum // 256 AS seq_idx,
           cum % 256 AS seq_offset,
           (cum % 256) + n_tokens > 256 AS straddles
    FROM p
    """,
    doc="The flagship end-to-end training-mix pipeline in ONE declarative "
    "plan: quality/length filter -> deterministic language rebalance "
    "(en x0.5) -> per-domain cap (15, gated two-phase) -> repetition "
    "filter (top-bigram < 0.3) -> concat-and-chunk packing into 256-token "
    "sequences. Five operator families composing lazily; Catalyst sees "
    "the whole chain and every stage stays shuffle-bounded.",
)
def c7_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ploverdb_spark.operators import packing as P

    docs = load(spark, sf_dir, "documents")
    # Quality/length gate computed IN the scan's own projection (tokens
    # staged once) instead of the earlier docs JOIN text_features(docs)
    # self-join: the join attached a 1:1 projection of the same table
    # back onto itself on the unique doc_id — a second scan plus a join
    # for columns the first scan can compute (guide §2.4).  Same
    # expressions (_quality_cols' rounded score / token count), same
    # filter, same surviving rows; A/B at sf0.1: 0.76s -> 0.30s for this
    # stage in isolation.
    staged = docs.select(
        *docs.columns, T.ws_tokens(F.lower(F.col("text"))).alias("__toks")
    )
    qc = T._quality_cols(F.col("text"), F.col("__toks"))
    clean = (
        staged.select(
            *docs.columns,
            qc["quality_score"].alias("__q"),
            qc["n_tokens"].alias("__n_tokens"),
        )
        .where((F.col("__q") >= 0.4) & (F.col("__n_tokens") >= 20))
        .select(*docs.columns)
    )
    samp = P.stratified_sample(clean, {"en": 0.5})
    # The post-cap survivor set is O(domains x cap) BY CONSTRUCTION and
    # is consumed by three downstream branches (repetition keep-set, the
    # semi join's left side, packing) — Catalyst does not dedupe common
    # subplans, so without a materialization barrier the whole
    # scan->clean->sample->cap chain re-evaluates once per branch.  A
    # lazy localCheckpoint of the tiny survivor set truncates that:
    # one evaluation, at a cost bounded by cap x domains rows at ANY
    # corpus scale (guide §5: localCheckpoint as the cheap lineage cut).
    capped = P.cap_per_domain(samp, cap=15).localCheckpoint(eager=False)
    # The repetition filter goes through an aggregation BARRIER, never a
    # direct .where on the joined metric: predicate pushdown substitutes
    # a filtered alias through every staged projection, re-inlining the
    # interpreted higher-order fold (and its token-array inputs) into the
    # filter condition — measured 180 ms/doc inlined vs 2.2 ms/doc staged
    # (~80x) at corpusbench scale.  A Filter above an Aggregate on a
    # NON-grouping column cannot be pushed below it, so the fold
    # evaluates once, staged, on the aggregate's input; doc_id is unique,
    # making max() the identity.  The keep-set is ids only -> AQE
    # broadcasts the semi-join.
    rep = T.repetition_scores(capped)
    keep = (
        rep.groupBy("doc_id")
        .agg(F.max("top_bigram_frac").alias("__frac"))
        .where(F.col("__frac") < 0.3)
        .select("doc_id")
    )
    calm = capped.join(keep, "doc_id", "left_semi")
    return P.pack_sequences(calm, seq_len=256)


# -- corpus vocabulary + Bloom decontamination (round 5) ---------------------


@register(
    "t7_vocab_topk",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_TOKENS}) AS token FROM documents
    ), counts AS (
      SELECT token, COUNT(*) AS n_occurrences FROM toks GROUP BY token
    )
    SELECT token, n_occurrences
    FROM counts ORDER BY n_occurrences DESC, token LIMIT 50
    """,
    doc="Corpus vocabulary top-50 (tokenizer/BPE-training precursor): "
    "explode + hash-aggregate + TakeOrdered; the shuffle carries one row "
    "per distinct token per partition (map-side partial agg), never one "
    "per occurrence, and no global sort happens anywhere.",
)
def t7_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.vocab_topk(load(spark, sf_dir, "documents"), k=50)


# sized ~10x the benchmark gram count at sf0.1 so the filter is ~12%
# full (FP/gram ~0.2%) — an undersized filter saturates and flags half
# the corpus, which is a misconfiguration, not a property of the design
_BLOOM_BITS, _BLOOM_HASHES = 65536, 3


def _bloom_pos_sql(i: int) -> str:
    """DuckDB twin of dedup.bloom_bit_positions' i-th hash (same md5 salt,
    same first-8-hex-digits -> bigint -> mod n_bits)."""
    return (
        f"(('0x' || substr(md5('b{i}|' || g), 1, 8))::BIGINT"
        f" % {_BLOOM_BITS})"
    )


@register(
    "c8_bloom_decontamination",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_TOKENS} AS toks FROM documents
    ), sh AS (
      SELECT doc_id, {_SHINGLES3} AS shingles FROM tk
    ), bench AS (
      SELECT DISTINCT g FROM (
        SELECT unnest(shingles) AS g FROM sh WHERE doc_id % 97 = 0
      )
    ), bits AS (
      SELECT DISTINCT unnest([
        {_bloom_pos_sql(0)}, {_bloom_pos_sql(1)}, {_bloom_pos_sql(2)}
      ]) AS bit FROM bench
    ), corpus AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, unnest(shingles) AS g FROM sh WHERE doc_id % 97 <> 0
      )
    ), probe AS (
      SELECT doc_id, g, unnest([
        {_bloom_pos_sql(0)}, {_bloom_pos_sql(1)}, {_bloom_pos_sql(2)}
      ]) AS bit FROM corpus
    ), member AS (
      SELECT p.doc_id, p.g
      FROM probe p LEFT JOIN bits b ON b.bit = p.bit
      GROUP BY p.doc_id, p.g
      HAVING COUNT(*) = COUNT(b.bit)
    )
    SELECT doc_id, COUNT(*) AS n_flagged_grams FROM member GROUP BY doc_id
    """,
    doc="c2's decontamination through a Bloom filter: the filter is the "
    "distinct set-bit positions (<= n_bits rows no matter how many "
    "benchmark grams exist — broadcastable BY CONSTRUCTION, the piece "
    "that keeps multi-benchmark decontamination shippable at web "
    "scale); membership = one broadcast left-semi join per md5-salted "
    "hash, all map-side, one lazy plan.  Over-flags at the filter's "
    "deterministic false-positive rate, never under-flags; both engines "
    "compute the identical bit pattern, FPs included.",
)
def c8_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # Same codegen gram swap as c2 (guide §4.1): shingles_of's
    # interpreted per-element lambdas -> exploded_word_grams rows.
    # bloom_decontaminate's documented precondition (distinct
    # (doc_id, g)) is met by the dropDuplicates below, exactly as
    # before; within-doc duplicate grams the old array_distinct removed
    # die there instead (verified: exact equality at sf0.01 and sf0.1;
    # interleaved A/B 1.18 -> 0.95 s).
    grams = D.exploded_word_grams(docs, k=3)
    bench = grams.where(F.col("doc_id") % 97 == 0).select("g").distinct()
    corpus = grams.where(F.col("doc_id") % 97 != 0).dropDuplicates(
        ["doc_id", "g"]
    )
    return D.bloom_decontaminate(
        corpus, bench, n_bits=_BLOOM_BITS, n_hashes=_BLOOM_HASHES
    )


# -- quantile-calibrated quality filter + temperature mixture (round 5) -----

# raw (unrounded) quality score — the same left-associated IEEE chain as
# operators/text.py:_quality_raw, so the double is bit-identical between
# engines and safe to bucket with floor() (the ROUND(x, 6) used for
# display columns is NOT bit-stable across engines)
_SCORE_RAW = """
         0.4 * (len(list_filter(toks, x -> list_contains(
                  ['the','a','of','and','to','in','is','it'], x)))
                / GREATEST(len(toks), 1))
         + 0.3 * (1.0 - (length(text)
                         - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                        / GREATEST(length(text), 1))
         + 0.3 * LEAST((length(regexp_replace(text, '\\s+', '', 'g'))
                        / GREATEST(len(toks), 1)) / 10.0, 1.0)
"""


@register(
    "t8_quality_quantile",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, text, {_TOKENS} AS toks FROM documents
    ), b0 AS (
      SELECT doc_id, lang,
             ROUND({_SCORE_RAW}, 6) AS quality_score,
             CAST(floor(({_SCORE_RAW}) * 1000) AS BIGINT) AS bucket
      FROM t
    ), b AS (
      -- unscoreable (NULL-text) docs drop BEFORE the histogram, exactly
      -- like the engine: null ordering defaults differ between engines
      SELECT * FROM b0 WHERE bucket IS NOT NULL
    ), h AS (
      SELECT lang, bucket, COUNT(*) AS c FROM b GROUP BY lang, bucket
    ), cum AS (
      SELECT lang, bucket,
             SUM(c) OVER (PARTITION BY lang ORDER BY bucket
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(c) OVER (PARTITION BY lang) AS n
      FROM h
    ), thr AS (
      SELECT lang, MIN(bucket) AS thr_bucket FROM cum
      WHERE cum * 10 >= 9 * n GROUP BY lang
    )
    SELECT b.doc_id, b.lang, b.quality_score, b.bucket, thr.thr_bucket
    FROM b JOIN thr USING (lang)
    WHERE b.bucket >= thr.thr_bucket
    """,
    doc="Per-language top-decile quality filter with the threshold from "
    "an exact bucket histogram — the naive percent_rank window sorts "
    "every language's full row set; here the only aggregate is a tiny "
    "(lang, bucket) histogram, the threshold window runs over THAT, and "
    "the corpus side is one broadcast join + a row-local comparison.  "
    "Quantile math is pure integer (cum*10 >= 9*n), so engine and "
    "oracle cannot disagree at a boundary.",
)
def t8_quality_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.quality_quantile_filter(
        load(spark, sf_dir, "documents"), q_num=9, q_den=10, granularity=1000
    )


@register(
    "c9_temperature_mixture",
    oracle=f"""
    WITH n AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ), wt AS (
      SELECT lang, n,
             CAST(round(sqrt(CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS w
      FROM n
    ), tot AS (
      SELECT SUM(w) AS tw FROM wt
    ), r AS (
      SELECT lang,
             LEAST(CAST(1.0 AS DOUBLE),
                   400.0 * CAST(w AS DOUBLE) / CAST(tw AS DOUBLE)
                         / CAST(n AS DOUBLE)) AS rate
      FROM wt, tot
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN r USING (lang)
    WHERE ({_hex4("md5('mix' || CAST(doc_id AS VARCHAR))")} / 65536.0)
          < r.rate
    """,
    doc="Temperature-scaled mixture sampling (mT5/XLM-R alpha-sampling, "
    "alpha=0.5): keep rate per language proportional to sqrt(n_lang), "
    "normalized to a 400-doc expected budget, applied as a "
    "deterministic md5 Bernoulli.  alpha=0.5 because IEEE sqrt is "
    "correctly rounded (bit-identical across engines) where pow is "
    "not, and the normalizer sums 6-decimal DECIMAL weights so "
    "addition order cannot change it.  Rate table is "
    "stratum-cardinality-sized and broadcast; the corpus side is a "
    "row-local filter — zero data-sized shuffles at any scale.",
)
def c9_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.temperature_mixture_sample(
        load(spark, sf_dir, "documents"), budget=400
    ).select("doc_id", "lang", "source")


_C10_SIGS = f"""
    corpus AS ({_DOUBLED}),
    tk AS (
      SELECT doc_id, {_TOKENS} AS toks FROM corpus
    ), sh AS (
      SELECT doc_id, {_SHINGLES3} AS shingles FROM tk
    ), sigs AS (
      SELECT doc_id,
        list_min(list_transform(shingles, s -> md5('0|' || s))) AS m0,
        list_min(list_transform(shingles, s -> md5('1|' || s))) AS m1,
        list_min(list_transform(shingles, s -> md5('2|' || s))) AS m2,
        list_min(list_transform(shingles, s -> md5('3|' || s))) AS m3,
        list_min(list_transform(shingles, s -> md5('4|' || s))) AS m4,
        list_min(list_transform(shingles, s -> md5('5|' || s))) AS m5,
        list_min(list_transform(shingles, s -> md5('6|' || s))) AS m6,
        list_min(list_transform(shingles, s -> md5('7|' || s))) AS m7
      FROM sh
    ), bands AS (
      SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS band_key FROM sigs
      UNION ALL
      SELECT doc_id, 1 AS band, md5(m2 || '|' || m3) AS band_key FROM sigs
      UNION ALL
      SELECT doc_id, 2 AS band, md5(m4 || '|' || m5) AS band_key FROM sigs
      UNION ALL
      SELECT doc_id, 3 AS band, md5(m6 || '|' || m7) AS band_key FROM sigs
    )
"""


@register(
    "c10_lsh_decontamination",
    oracle=f"""
    WITH {_C10_SIGS}
    SELECT c.doc_id, COUNT(DISTINCT b.doc_id) AS n_bench_dups
    FROM bands c JOIN bands b
      ON c.band = b.band AND c.band_key = b.band_key
    WHERE c.doc_id % 97 <> 0 AND b.doc_id % 97 = 0
    GROUP BY c.doc_id
    """,
    doc="NEAR-duplicate benchmark decontamination: corpus docs sharing "
    "any MinHash-LSH band bucket with any benchmark doc (the paraphrase "
    "gap exact n-gram decontamination c2/c8 cannot see).  Band keys for "
    "both sides from the same single-projection shape as d2; the "
    "benchmark side is benchmark-sized so the bucket equi-join is a "
    "map-side broadcast; the only shuffle is the per-doc distinct-count "
    "aggregation.",
)
def c10_lsh_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 optimization (guide §8: decide with small rows): signatures are
    # computed ONCE over the full corpus and lazily localCheckpointed,
    # then split into corpus/bench sides.  The old shape ran TWO
    # independent minhash subtrees — each a full corpus read (the %97
    # filters don't prune parquet row groups) — so the text was scanned
    # twice for the same total gram work.  MinHash is per-document, so
    # filtering before or after signatures is identical (exceptAll 0 at
    # sf0.1 + oracle); the checkpointed frame is the NARROW signature
    # proxy (doc_id + 8 hashes), never the text.  Interleaved A/B:
    # 1.58 -> 1.24 s min-of-4.
    docs = _doubled_docs(spark, sf_dir)
    sigs = D.minhash_signatures(docs).localCheckpoint(eager=False)
    return D.lsh_cross_contamination(
        sigs.where(F.col("doc_id") % 97 != 0),
        sigs.where(F.col("doc_id") % 97 == 0),
    )


@register(
    "c12_token_window_decontamination",
    oracle=f"""
    WITH docs AS ({_DOUBLED}),
    tk AS (
      SELECT doc_id, {_TOKENS} AS toks FROM docs
    ), win AS (
      SELECT doc_id, unnest(range(1, len(toks) - 13 + 2)) AS pos, toks
      FROM tk WHERE len(toks) >= 13
    ), g AS (
      SELECT doc_id, pos,
             md5(array_to_string(toks[pos:(pos + 12)], ' ')) AS h
      FROM win
    ), bench AS (
      SELECT DISTINCT h FROM g WHERE doc_id % 97 = 0
    ), hits AS (
      SELECT doc_id, pos FROM g
      WHERE doc_id % 97 <> 0 AND h IN (SELECT h FROM bench)
    ), marked AS (
      SELECT doc_id, pos,
             CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                  <= 13 THEN 0 ELSE 1 END AS brk
      FROM hits
    ), grp AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
      FROM marked
    )
    SELECT doc_id,
           MIN(pos) AS span_start,
           MAX(pos) + 12 AS span_end,
           MAX(pos) + 13 - MIN(pos) AS span_len,
           COUNT(*) AS n_windows
    FROM grp GROUP BY doc_id, gid
    """,
    doc="Token-window exact-substring decontamination (VERDICT r10 item "
    "#5): the standard 'any N-consecutive-token overlap with a "
    "benchmark' check as a stride-1 sliding window (N=13 here; 50 in "
    "published pipelines), NOT set membership — c2/c8 flag docs sharing "
    "any small n-gram, this one finds the exact overlapping token SPANS "
    "(gaps-and-islands merge of matched window positions) so the "
    "remediation can excise the span instead of dropping the document.  "
    "Scale shape: benchmark windows broadcast (eval suites are tiny), "
    "corpus windows stream through one explode + broadcast semi join, "
    "and the only shuffles are the sparse hit-merge window and the "
    "span aggregation.",
)
def c12_token_window_decontamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _doubled_docs(spark, sf_dir)
    spans = D.token_window_decontaminate(docs, window=13)
    return spans.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("span_len").cast("long").alias("span_len"),
        F.col("n_windows").alias("n_windows"),
    )


@register(
    "c11_doc_chunking",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_TOKENS} AS toks FROM documents
    ), st AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(len(toks), 1), 24)) AS start
      FROM tk
    )
    SELECT doc_id,
           start // 24 AS chunk_idx,
           len(toks[(start + 1):(start + 32)]) AS n_chunk_tokens,
           md5(array_to_string(toks[(start + 1):(start + 32)], ' '))
             AS chunk_hash
    FROM st
    """,
    doc="Overlapping token-window chunking (32-token windows, stride 24): "
    "the context-window preparation step between cleaning and packing.  "
    "One explode, zero shuffles, zero UDFs; output bounded by "
    "ceil(tokens/stride) rows per document.",
)
def c11_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ploverdb_spark.operators.chunking import chunk_documents

    return chunk_documents(
        load(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    )


@register(
    "t9_tfidf_topk",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, count(*) AS doc_freq FROM tf GROUP BY term
    ), n AS (
      SELECT count(DISTINCT doc_id) AS n_docs FROM documents
    ), ranked AS (
      SELECT t.doc_id, t.term, t.tf, d.doc_freq,
             t.tf * ((n.n_docs * 1000000) // d.doc_freq) AS score_micro,
             row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY t.tf * ((n.n_docs * 1000000) // d.doc_freq) DESC,
                        t.term
             ) AS rn
      FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, doc_freq, score_micro
    FROM ranked WHERE rn <= 3
    """,
    doc="Per-document top-3 TF-IDF terms with integer micro-unit idf "
    "((n_docs*1e6) div doc_freq — order-isomorphic to ln(N/df) but "
    "bit-identical across engines).  Partial-agg explode, vocab-sized "
    "doc-freq join, term-string tie-break.",
)
def t9_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.tfidf_topk(load(spark, sf_dir, "documents"), k=3)


def _t10_oracle() -> str:
    from ploverdb_spark.operators.text import PII_PATTERNS, PII_REPLACEMENTS

    red = "text"
    counts = []
    for name, pat in PII_PATTERNS.items():
        sq = pat.replace("'", "''")
        red = f"regexp_replace({red}, '{sq}', '{PII_REPLACEMENTS[name]}', 'g')"
        counts.append(f"len(regexp_extract_all(text, '{sq}'))")
    return f"""
    SELECT doc_id,
           {' + '.join(counts)} AS n_redacted,
           length({red}) AS redacted_len,
           md5({red}) AS redacted_hash
    FROM documents
    """


@register(
    "t10_pii_redaction",
    oracle=_t10_oracle(),
    doc="PII redaction: chained regexp_replace of email/phone/SSN/IPv4 "
    "matches with typed placeholders, plus original-text match totals.  "
    "Zero UDFs, zero shuffles; output carries md5+length of the redacted "
    "text (the audit-table shape).",
)
def t10_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.pii_redact(load(spark, sf_dir, "documents"))


def _s6_oracle(n_bits: int = 16, dim: int = 64) -> str:
    from ploverdb_spark.operators.similarity import srp_weights

    weights = srp_weights(n_bits, dim)
    bit_terms = []
    for b, wrow in enumerate(weights):
        dot = "".join(
            f" {'+' if w > 0 else '-'} q[{d + 1}]" for d, w in enumerate(wrow)
        )
        bit_terms.append(
            f"(CASE WHEN (0{dot}) >= 0 THEN {1 << b} ELSE 0 END)"
        )
    sig = "\n        + ".join(bit_terms)
    return f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) * 10000000 + 0.5) AS BIGINT))
               AS q
      FROM embeddings
    ), sig AS (
      SELECT vec_id, {sig} AS srp_sig FROM q
    )
    SELECT vec_id, srp_sig,
           count(*) OVER (PARTITION BY srp_sig) AS n_bucket
    FROM sig
    """


@register(
    "s6_signed_projection",
    oracle=_s6_oracle(),
    doc="Signed random projection (cosine-LSH signatures, Charikar): "
    "16-bit sign signature from deterministic md5-seeded +-1 hyperplanes "
    "over int64-quantized components (integer dot products — "
    "bit-identical across engines), plus the signature-bucket size.  "
    "One narrow projection + one 65k-group window shuffle.",
)
def s6_signed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.signed_random_projection(
        load(spark, sf_dir, "embeddings"), n_bits=16, dim=64
    )
