"""Text-analysis operators for training-data pipelines.

All implementations are pure Column expressions (JVM-side, whole-stage
codegen) — no Python UDFs anywhere.  Each operator is deterministic so the
DuckDB oracle can recompute it exactly:

- token counting: whitespace tokens + a BPE-ish regex token count
- quality scoring: length / punctuation / stopword ratios
- language ID: marker-word scoring with a fixed precedence argmax
- fingerprinting: shingle-hash minimum (winnowing-style document
  fingerprint built from md5 k-gram hashes, which both engines share)

At 100 TB these are embarrassingly parallel scans — no shuffle at all;
Catalyst prunes to the ``text`` column only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

PUNCT_CLASS = r"[.,;:!?]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# language -> marker words (for the n-gram/marker heuristic; precedence =
# tuple order, first wins ties)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "und", "das", "ist"),
    "fr": ("le", "et", "les", "est"),
    "es": ("el", "y", "los", "es"),
}


def ws_tokens(text: Column) -> Column:
    """Non-empty whitespace-delimited tokens."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != F.lit(""))


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counts per document."""
    t = F.col(text_col)
    return df.select(
        "doc_id",
        F.size(ws_tokens(t)).alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(BPE_ISH_PATTERN)).alias("n_bpe_tokens"),
    )


def _quality_raw(
    t: Column, toks: Column
) -> tuple[Column, Column, Column, Column]:
    """Raw (unrounded) quality signals: (punct_ratio, stop_ratio,
    mean_token_len, score).  Every term is a fixed left-associated chain
    of exactly-rounded IEEE ops (divisions, multiplies, adds) on
    identical inputs, so the raw score is BIT-identical between Spark
    and the DuckDB oracle — which is what quantile bucketing needs
    (``round(x, 6)`` is NOT bit-stable across engines; it is only used
    for display columns compared at tolerance)."""
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    punct_ratio = n_punct / F.greatest(F.length(t), F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    mean_token_len = (
        F.length(F.regexp_replace(t, r"\s+", "")) / F.greatest(n_tokens, F.lit(1))
    )
    score = (
        F.lit(0.4) * stop_ratio
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.least(mean_token_len / F.lit(10.0), F.lit(1.0))
    )
    return punct_ratio, stop_ratio, mean_token_len, score


def _quality_cols(t: Column, toks: Column) -> dict[str, Column]:
    """Quality signal columns (shared by quality_scores/text_features).
    All ratios are single divisions (order-independent, oracle-exact)."""
    punct_ratio, stop_ratio, _mtl, score = _quality_raw(t, toks)
    n_tokens = F.size(toks)
    return {
        "n_chars_actual": F.length(t),
        "n_tokens": n_tokens,
        "punct_ratio": F.round(punct_ratio, 6),
        "stopword_ratio": F.round(stop_ratio, 6),
        "quality_score": F.round(score, 6),
    }


def _lang_cols(toks: Column) -> dict[str, Column]:
    """Language-ID columns (shared by language_id/text_features)."""

    def marker_hits(markers: tuple[str, ...]):
        arr = F.array(*[F.lit(m) for m in markers])
        # single-arg lambda: F.filter would treat a two-arg callable as the
        # (element, index) variant
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    scores = {lang: marker_hits(m) for lang, m in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[lang] for lang in langs])
    predicted = F.lit("und")
    for lang in reversed(langs):  # earlier langs overwrite -> win ties
        predicted = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(predicted)
    out = {f"score_{lang}": scores[lang] for lang in langs}
    out["predicted_lang"] = predicted
    return out


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword quality signals + a composite score."""
    t = F.col(text_col)
    cols = _quality_cols(t, ws_tokens(F.lower(t)))
    return df.select("doc_id", *[v.alias(k) for k, v in cols.items()])


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: count marker hits per language,
    argmax with fixed precedence (en > de > fr > es > und)."""
    cols = _lang_cols(ws_tokens(F.lower(F.col(text_col))))
    return df.select("doc_id", *[v.alias(k) for k, v in cols.items()])


def text_features(
    df: DataFrame,
    text_col: str = "text",
    extra_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Quality + language features in ONE projection — the composed form
    pipelines should use: Catalyst cannot merge two separate per-feature
    scan branches joined on doc_id, so asking for each feature separately
    re-reads the corpus once per feature at 100 TB.

    ``extra_cols`` rides additional named expressions in the SAME
    projection (e.g. ``{"__h": F.md5("text")}``) so a consumer that needs
    features PLUS a text-derived key gets both from one corpus read —
    without it, c1's dedup key needed a second full scan of the corpus.
    """
    t = F.col(text_col)
    toks = ws_tokens(F.lower(t))
    cols = {**_quality_cols(t, toks), **_lang_cols(toks)}
    if extra_cols:
        cols.update(extra_cols)
    return df.select("doc_id", *[v.alias(k) for k, v in cols.items()])


def fingerprints(
    df: DataFrame, text_col: str = "text", shingle_len: int = 4
) -> DataFrame:
    """Winnowing-style document fingerprint: md5 over word ``shingle_len``-
    grams, keep the minimum hash (reference had no equivalent; this is the
    rolling-hash fingerprint a dedup pipeline needs).

    Tokens are staged as a projection first — an inline token expression
    would be re-evaluated per shingle inside the lambda (quadratic/row).
    """
    staged = df.select(
        "doc_id", ws_tokens(F.lower(F.col(text_col))).alias("__toks")
    )
    toks = F.col("__toks")
    n = F.size(toks)
    shingles = F.when(
        n >= shingle_len,
        F.transform(
            F.sequence(F.lit(1), n - shingle_len + 1),
            lambda i: F.md5(F.array_join(F.slice(toks, i, shingle_len), " ")),
        ),
    ).otherwise(F.array(F.md5(F.array_join(toks, " "))))
    return staged.select(
        "doc_id",
        F.array_min(shingles).alias("fingerprint"),
        n.alias("n_tokens"),
    )


# PII patterns chosen to mean the same thing in Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround, explicit classes only.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}([-. ][0-9]{3,4})?",
    "ssn_like": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII-pattern scan (the redaction pre-pass every training corpus
    runs): per-document match counts for each pattern class plus a
    has_pii flag.  Pure column expressions over one scan — zero UDFs,
    zero shuffles; at 100 TB this is embarrassingly parallel map work.
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias(
            f"n_{name}"
        )
        for name, pat in PII_PATTERNS.items()
    ]
    out = df.select("doc_id", *counts)
    total = sum(F.col(f"n_{name}") for name in PII_PATTERNS)
    return out.withColumn("has_pii", (total > 0).cast("int"))


def repetition_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition signals (the Gopher-rules family of
    quality filters: heavily repetitive documents are boilerplate/spam
    and get dropped before training):

    - ``dup_line_frac``: fraction of non-empty lines that are repeats of
      an earlier line;
    - ``top_bigram_frac``: occurrences of the most frequent word bigram
      over all bigram slots.

    Shuffle-free by construction: the top-bigram multiplicity comes from
    a sort + run-length fold over the document's OWN bigram array
    (O(n log n) per row), not from an explode + groupBy — per-document
    metrics must never cost a corpus-wide shuffle.  Pure column
    expressions, zero UDFs.
    """
    t = F.col(text_col)
    staged = df.select(
        "doc_id",
        F.filter(F.split(t, r"\n"), lambda x: x != F.lit("")).alias("__lines"),
        ws_tokens(F.lower(t)).alias("__toks"),
    )
    n_tok = F.size("__toks")
    bigrams = F.when(
        n_tok >= 2,
        F.sort_array(
            F.transform(
                F.sequence(F.lit(1), n_tok - 1),
                lambda i: F.array_join(F.slice(F.col("__toks"), i, 2), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = staged.withColumn("__bigrams", bigrams)
    # run-length fold over the sorted bigram array -> max multiplicity
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc.best, run).alias("best"),
        )

    top_count = F.aggregate("__bigrams", acc0, step, lambda a: a.best)
    n_lines = F.size("__lines")
    n_uniq_lines = F.size(F.array_distinct("__lines"))
    n_big = F.size("__bigrams")
    return staged.select(
        "doc_id",
        n_lines.alias("n_lines"),
        F.round(
            (n_lines - n_uniq_lines) / F.greatest(n_lines, F.lit(1)), 6
        ).alias("dup_line_frac"),
        n_big.alias("n_bigrams"),
        top_count.alias("top_bigram_count"),
        F.round(top_count / F.greatest(n_big, F.lit(1)), 6).alias(
            "top_bigram_frac"
        ),
    )


def vocab_topk(df: DataFrame, k: int = 50, text_col: str = "text") -> DataFrame:
    """Corpus-level vocabulary top-k: the token histogram every tokenizer
    build / BPE training run starts from (and the reference has nothing
    like — pure training-pipeline surface).

    Shape: explode whitespace tokens -> groupBy(token) -> top-k with the
    token string as the deterministic tie-break.  At 100 TB the explode is
    a narrow map; hash partial aggregation means the single shuffle
    carries one row per distinct token PER PARTITION (|vocab| ~ 1e6-1e8),
    not one per token occurrence (~1e13) — the same plan a word-count on a
    1000-executor cluster wants.  The final top-k is a TakeOrdered over
    |vocab|, never a global sort of occurrences.
    """
    toks = df.select(
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("token")
    )
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    return counts.orderBy(F.desc("n_occurrences"), "token").limit(k)


def quality_quantile_filter(
    df: DataFrame,
    q_num: int = 9,
    q_den: int = 10,
    granularity: int = 1000,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each language's top quality slice — everything at or above
    that language's ``q_num/q_den`` quality quantile (top decile by
    default) — with the threshold derived from an exact bucket histogram
    instead of a per-language rank window.

    The naive formulation (``percent_rank() OVER (PARTITION BY lang ORDER
    BY score)``) sorts every language's full row set — at 100 TB that is
    a multi-billion-row sort per hot language.  The histogram shape
    bounds it: scores are bucketed to ``1/granularity`` resolution (a
    row-local ``floor``), the per-(lang, bucket) counts aggregate to a
    tiny table (|langs| x <= granularity+1 rows), the threshold bucket is
    a window over THAT table, and the corpus-side filter is one broadcast
    join + a row-local comparison.  Quantile math is pure integer
    (``cum * q_den >= q_num * n``) so engine and oracle can never
    disagree at a boundary.  The threshold bucket itself is kept
    inclusively: the result is "at least the top (1 - q) fraction",
    exact at bucket resolution.
    """
    from pyspark.sql import Window

    t = F.col(text_col)
    _p, _s, _m, score_raw = _quality_raw(t, ws_tokens(F.lower(t)))
    bucketed = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.round(score_raw, 6).alias("quality_score"),
        F.floor(score_raw * granularity).cast("long").alias("bucket"),
        # NULL-text docs are unscoreable: drop them BEFORE the histogram
        # — Spark's window default (NULLS FIRST) and DuckDB's (NULLS
        # LAST) would otherwise shift the cumulative counts differently
        # and the two engines would pick different threshold buckets
    ).where(F.col("bucket").isNotNull())
    # The scored frame feeds BOTH the histogram and the final filter;
    # Catalyst does not dedupe common subplans, so without a barrier the
    # regex/HOF scoring scan runs twice (once per branch).  A lazy
    # localCheckpoint materializes the NARROW (id, lang, score, bucket)
    # proxy once — guide §8's "decide with small rows" shape: at corpus
    # scale a second full text-scoring pass costs a whole corpus read,
    # while this checkpoint is O(rows x ~30 bytes), spilled to local
    # disk if needed.  (localCheckpoint, unlike a lazy persist, computes
    # every partition at its first action, so the partial-cache trap
    # documented for iterative plans does not apply.)  Interleaved A/B
    # at sf0.1: 1.41 -> 1.07 s, results identical.
    bucketed = bucketed.localCheckpoint(eager=False)
    hist = bucketed.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("lang")
    cum = hist.select(
        "lang",
        "bucket",
        F.sum("__c").over(w_cum).alias("__cum"),
        F.sum("__c").over(w_tot).alias("__n"),
    )
    thresholds = (
        cum.where(F.col("__cum") * q_den >= q_num * F.col("__n"))
        .groupBy("lang")
        .agg(F.min("bucket").alias("thr_bucket"))
    )
    return (
        bucketed.join(F.broadcast(thresholds), on="lang")
        .where(F.col("bucket") >= F.col("thr_bucket"))
        .select("doc_id", "lang", "quality_score", "bucket", "thr_bucket")
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k terms by TF-IDF — the classic relevance /
    keyword-extraction signal quality pipelines use for topic tagging
    and near-boilerplate detection (beyond-reference surface; the
    reference has no corpus statistics at all).

    The idf factor is *integer* micro-units — ``(n_docs * 1e6) div
    doc_freq`` — instead of the textbook ``ln(N/df)``: natural log is
    not exactly-rounded IEEE, so a float idf could rank differently
    between engines at ties; integer idf is bit-identical everywhere
    and order-isomorphic to N/df (log is monotone).

    Scale shape: explode -> hash-aggregate (partial agg means the
    shuffle carries |vocab|-per-partition rows, not occurrences); the
    doc-frequency table derives from the (doc,term) counts (vocab-sized
    — AQE picks broadcast vs shuffle join by its runtime size, the right
    call either way at 100 TB); the corpus doc count is a 1-row
    broadcast; final top-k is a per-document row_number window with the
    term string as the deterministic tie-break.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col),
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score_micro",
            F.col("tf") * F.expr("(n_docs * 1000000) div doc_freq"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score_micro"), "term")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(id_col, "term", "tf", "doc_freq", "score_micro")
    )


PII_REPLACEMENTS: dict[str, str] = {
    name: f"<{name.upper()}>" for name in PII_PATTERNS
}


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction — the transform stage behind :func:`pii_scan`'s
    report: every match of each pattern class is replaced by a typed
    placeholder (``<EMAIL>``, ``<PHONE>``, ...), chained in the fixed
    ``PII_PATTERNS`` order so the result is deterministic.

    ``n_redacted`` counts matches on the ORIGINAL text (the same totals
    pii_scan reports); a pattern whose match only forms after an earlier
    replacement is intentionally not re-counted.  Output carries the
    md5 + length of the redacted text rather than the text itself —
    what an audit table stores; the redacted column is one more
    ``.select`` away for the write path.

    Pure chained ``regexp_replace`` column expressions: zero UDFs, zero
    shuffles, embarrassingly parallel at 100 TB.
    """
    red = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, PII_REPLACEMENTS[name])
    n_redacted = sum(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        for pat in PII_PATTERNS.values()
    )
    return df.select(
        "doc_id",
        n_redacted.alias("n_redacted"),
        F.length(red).alias("redacted_len"),
        F.md5(red).alias("redacted_hash"),
    )
