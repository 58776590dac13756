"""Query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an
equivalent ANSI-SQL string that DuckDB runs on the same parquet tables.  The
driver compares the two (row count + schema + order-insensitive value hash),
so every computed column is aliased identically on both sides.

Determinism rules for oracle-matched queries:
- money/measure sums go through DECIMAL casts (exact, order-independent)
  and are cast back to DOUBLE only at the end;
- raw-double aggregation uses only order-independent exact ops
  (count/min/max);
- top-k queries always carry a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query under ``name`` with optional oracle SQL."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the driver-provided parquet tables.

    ``events.ts`` is normalized to session-local TimestampType no matter
    how the file's physical type reads back:

    - TIMESTAMP(isAdjustedToUTC=false) surfaces as TIMESTAMP_NTZ, on which
      numeric casts are illegal (Spark 4 ANSI); cast to TimestampType —
      with ``spark.sql.session.timeZone=UTC`` pinned (session.py) the
      instant is unchanged and ``cast(ts as long)`` equals DuckDB's
      ``floor(epoch(ts))`` on the same file.
    - TIMESTAMP(NANOS) under ``legacy.parquet.nanosAsLong`` surfaces as
      bigint nanos; integer-divide to micros (double division would round
      differently than DuckDB's truncation for ~1e18 nanos).
    """
    from ploverdb_spark.operators.common import ensure_worker_imports

    ensure_worker_imports(spark)
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# The correctness driver emits at most this many rows per round
# (observed empirically since r02: exactly-50 rows for any larger
# catalog).  tests/test_relational_queries.py asserts the pinned tail
# below is EXACTLY the overflow, so growing the catalog without growing
# _EMIT_LAST is a test failure, not a silent drop.
DRIVER_EMIT_CAP = 50

# Emitted first in queries()/oracle_sql() iteration order.  The driver
# emits at most 50 correctness rows while the catalog is 67 — so
# front-load the entries that most need a fresh row.  Round 5 rotation:
# the 12 relational entries dropped by the r04 cap come back first (two
# rounds stale otherwise), then c6 (its q column is now a scalar q_csv —
# the r04 red row must re-prove), then the entries whose implementing
# modules changed this round (similarity/dedup cosine guards, multimodal
# decode routing).  NOTE to driver maintainers: the emitter should assert
# emitted-row count == len(all_oracles()) instead of relying on this
# ordering.
_EMIT_FIRST = (
    "c11_doc_chunking",
    "t9_tfidf_topk",
    "t10_pii_redaction",
    "s6_signed_projection",
    "m4_audio_metadata",
    "c10_lsh_decontamination",
    "t8_quality_quantile",
    "c9_temperature_mixture",
    "t7_vocab_topk",
    "c8_bloom_decontamination",
    "a2_test_triples",
    "a1_pricing_summary",
    "j2_region_revenue",
    "j1_customers_without_orders",
    "a2_first_order_per_customer",
    "a3_segment_nations",
    "f5_top_orders",
    "a6_conditional_grouping",
    "set_ops_customers",
    "f1_event_type_stats",
    "j3_doubly_pinned",
    "j11_order_parts",
    "c6_embedding_quantization",
    "s1_cosine_topk",
    "s2_ivf_topk",
    "s3_kmeans_cells",
    "s4_ivf_recall",
    "s5_ivf_multiprobe",
    "d5_embedding_neardup",
    "d2_minhash_lsh_pairs",
    "d6_dup_groups",
    "m1_media_features",
    "m2_frame_samples",
)


# Emitted LAST: when the driver's 50-row cap truncates the catalog,
# these are the safest rows to lose (their last green row still
# describes the current code).  Entries exercising this round's changed
# modules must stay inside the emitted window.
_EMIT_LAST = (
    # exactly (catalog - 50) entries: 68-entry catalog minus the driver's 50-row
    # cap, so the drop set is EXPLICIT, not whatever registration order
    # leaves last.  Every entry here is green in CORRECTNESS_r04 and its
    # shipped behavior is diff-verified unchanged this round: the
    # implementing modules (queries/windows.py, build/meta_kg.py,
    # query/response.py, query/compiler.py, build/closure.py) have zero
    # round-5 commits; operators/packing.py and queries/pipeline.py DO
    # have round-5 commits, but every hunk is append-only new-operator
    # code (temperature_mixture_sample, c9-c11/t9/t10/s6 wrappers) —
    # the functions c3/c4/c5 execute are line-identical to r04.
    # t1-t4 moved OUT of the tail this round: operators/text.py gained
    # vocab_topk (append-only, but changed is changed), so they re-prove
    # in the r05 window.
    "w1_sessionize",
    "w2_rollup_orders",
    "w3_value_deltas",
    "j12_asof_last_order",
    "a3_meta_nodes",
    "a1_meta_kg",
    "c3_sequence_packing",
    "c4_stratified_sample",
    "c5_domain_cap",
    "j10_edges_between_pairs",
    "j11_batch_neighbors",
    "a6_result_groups",
    "g2_subclass_closure",
    "j8_qualified_lookup",
    # added when t8/c9/c10 grew the catalog to 67: all green in r04, all
    # implemented in modules with zero round-5 commits (sources/kgx.py,
    # build/ingest.py) and registered in the untouched
    # queries/semantics.py
    "p4_zip_roundtrip",
    "a4_normalize_merge",
    "p6_most_specific_categories",
    # added as c11/t9/t10/s6/m4 grew the catalog to 72: r04-green
    # entries whose implementing modules (query/compiler.py,
    # query/constraints.py, build/ingest.py) have zero round-5 commits;
    # their semantics stay exercised by the in-window TRAPI entries
    # (j2/j3/j8 share the same compiler path, a4_normalize_merge the
    # same ingest path)
    "j4_alias_lookup",
    "j5_subclass_expanded_lookup",
    "f4_symmetric_lookup",
    "p7_canonical_flip",
    "f3_constrained_lookup",
)


def _ordered() -> list[str]:
    head = [n for n in _EMIT_FIRST if n in _REGISTRY]
    tail = [n for n in _EMIT_LAST if n in _REGISTRY]
    pinned = set(head) | set(tail)
    return head + [n for n in _REGISTRY if n not in pinned] + tail


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: _REGISTRY[name].fn for name in _ordered()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: _REGISTRY[name].oracle
        for name in _ordered()
        if _REGISTRY[name].oracle is not None
    }


def get(name: str) -> QuerySpec:
    _ensure_loaded()
    return _REGISTRY[name]


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are for their registration side effects.
    from ploverdb_spark.queries import relational  # noqa: F401

    try:
        from ploverdb_spark.queries import graph  # noqa: F401
    except ImportError:
        pass
    try:
        from ploverdb_spark.queries import pipeline  # noqa: F401
    except ImportError:
        pass
    try:
        from ploverdb_spark.queries import semantics  # noqa: F401
    except ImportError:
        pass
    try:
        from ploverdb_spark.queries import windows  # noqa: F401
    except ImportError:
        pass
    _LOADED = True
