"""KG build pipeline: raw KGX DataFrames -> query-ready artifact set.

Reference pipeline reimplemented Spark-first (NOT ported): the reference
streams records into nested dict indexes and pickles them
(plover.py:725-1382).  Here every artifact is a DataFrame; the
"main index" (plover.py:85-112, 1246-1276 — node->category->predicate->
direction->neighbor nested maps) is replaced by ``edges_bidir``: the edge
set unioned with its reversed copy, carrying a direction flag and the
neighbor's (most-specific) categories denormalized in, so one-hop lookup
is a single broadcast-join + scan-filter with predicate/category pushdown.

At scale: ``edges_bidir`` is written partitioned/bucketed by ``node_id``
(the join key) so query-time joins co-locate; it's exactly 2x the edge
count, and per-query work is proportional to the matched slice, never the
whole table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ploverdb_spark.build.closure import (
    resolve_subclass_edge_set,
    transitive_closure,
)
from ploverdb_spark.ontology.biolink_lite import BiolinkLite, default_model
from ploverdb_spark.sources.kgx import (
    KgxConfig,
    build_id_synonyms,
    referential_integrity,
)

DIR_FORWARD = 1  # edge stored subject->object, node_id == subject
DIR_REVERSE = 0  # traversing object->subject, node_id == object


@dataclass
class KnowledgeGraph:
    """Query-ready artifact set (the Spark analog of the reference's
    pickled index directory, plover.py:1294-1345)."""

    nodes: DataFrame  # id, name, categories ARRAY, + attribute columns
    edges: DataFrame  # id, subject, object, predicate, + qualifiers/attrs
    edges_bidir: DataFrame  # node_id, neighbor_id, direction + edge cols
    subclass_closure: DataFrame  # ancestor, descendant
    id_synonyms: DataFrame  # alias_id, preferred_id
    model: BiolinkLite
    config: KgxConfig
    # True when the tables are laid out so a pushed id IN-list can
    # actually SKIP IO — bucketed (SelectedBucketsCount pruning) and/or
    # sorted+cached (min/max batch-stat pruning).  The query layer then
    # adds redundant pinned-id scan filters (pushdown_id_filter) on top of
    # its broadcast joins.  On an ad-hoc unsorted/unbucketed KG the filter
    # cannot skip anything the join doesn't already do, while carrying
    # thousands of literals costs real driver/analysis time per query —
    # so it defaults off and read_artifacts_bucketed (the serving path)
    # turns it on.
    pruned_id_scans: bool = False

    def persist(
        self, materialize: bool = True, parallel: bool = False
    ) -> KnowledgeGraph:
        """Cache the hot serving tables (analog of the reference's
        fully-in-memory serving stance, README.md:213).

        Materialization runs in DEPENDENCY ORDER (nodes -> edges -> the
        derived tables): edges_bidir and subclass_closure are built FROM
        nodes/edges, so counting the parents first means each derived
        table computes from cache instead of re-running the whole ingest
        pipeline once per artifact.  ``build_knowledge_graph`` already
        lays the tables out on their join keys; ``persist`` only marks +
        materializes, it never re-assigns (re-assignment would strand the
        derived plans' references to the pre-swap objects).

        ``parallel=True`` materializes the tables concurrently (each
        count in its own FAIR pool) — ONLY correct when the tables are
        independent scans, i.e. a KG loaded from artifacts
        (``read_artifacts_bucketed``), where no table derives from
        another; the small tables then cache inside the big table's
        wall-clock instead of after it.  Post-build KGs must keep the
        sequential dependency order.
        """
        ordered = (
            self.nodes,
            self.edges,
            self.edges_bidir,
            self.subclass_closure,
            self.id_synonyms,
        )
        for df in ordered:
            df.persist()  # no-op if already marked by the build
        if materialize and parallel:
            from concurrent.futures import ThreadPoolExecutor

            sc = self.nodes.sparkSession.sparkContext

            def mat(idx_df) -> None:
                i, df = idx_df
                sc.setLocalProperty("spark.scheduler.pool", f"persist-{i}")
                try:
                    df.count()
                finally:
                    sc.setLocalProperty("spark.scheduler.pool", None)

            with ThreadPoolExecutor(max_workers=len(ordered)) as pool:
                list(pool.map(mat, enumerate(ordered)))
        elif materialize:
            for df in ordered:
                df.count()
        return self


def category_ancestor_table(
    spark: SparkSession, model: BiolinkLite
) -> DataFrame:
    """(category, proper ancestor) pairs — tiny broadcast table."""
    rows = [
        (cat, anc)
        for cat in model.category_parents
        for anc in model.category_ancestors(cat, include_self=False)
    ]
    return spark.createDataFrame(rows or [("", "")], "category string, ancestor string").where(
        F.col("category") != ""
    )


def reduce_to_most_specific_categories(
    nodes: DataFrame, model: BiolinkLite, category_prop: str = "all_categories"
) -> DataFrame:
    """P6 (reference plover.py:835-877): per node, drop any category that is
    a proper Biolink ancestor of another of the node's categories.

    Distributed form: explode -> join against the broadcast ancestor table
    to find removable (node, category) pairs -> anti-join -> re-collect.
    No driver-side iteration; the ancestor table is model-sized (tiny).
    """
    spark = nodes.sparkSession
    anc = category_ancestor_table(spark, model)
    exploded = nodes.select(F.col("id").alias("__id"), F.explode(category_prop).alias("cat"))
    # (node, cat) is removable if cat is a proper ancestor of another cat
    # of the same node
    removable = (
        exploded.alias("a")
        .join(
            F.broadcast(anc).alias("h"),
            F.col("a.cat") == F.col("h.category"),
        )
        .select(F.col("a.__id").alias("__id"), F.col("h.ancestor").alias("cat"))
        .dropDuplicates(["__id", "cat"])
    )
    kept = (
        exploded.join(removable, on=["__id", "cat"], how="left_anti")
        .groupBy("__id")
        .agg(F.sort_array(F.collect_set("cat")).alias("__categories"))
    )
    return (
        nodes.join(kept, nodes.id == kept.__id, "left")
        .withColumn(
            "categories",
            F.coalesce(F.col("__categories"), F.array().cast("array<string>")),
        )
        .drop("__id", "__categories")
    )


def canonical_predicate_table(spark: SparkSession, model: BiolinkLite) -> DataFrame:
    """(predicate, canonical_predicate, needs_flip) — tiny broadcast table
    feeding P7 (reference plover.py:1059-1088)."""
    rows = [
        (p, model.canonical_form(p), not model.is_canonical(p))
        for p in model.predicates
    ]
    return spark.createDataFrame(
        rows, "predicate string, canonical string, needs_flip boolean"
    )


def flip_noncanonical_edges(edges: DataFrame, model: BiolinkLite) -> DataFrame:
    """P7: rewrite non-canonical predicates to canonical form and swap
    subject/object.  Unknown predicates pass through unchanged."""
    spark = edges.sparkSession
    canon = canonical_predicate_table(spark, model)
    joined = edges.join(F.broadcast(canon), on="predicate", how="left")
    flip = F.coalesce(F.col("needs_flip"), F.lit(False))
    out = (
        joined.withColumn("__new_subject", F.when(flip, F.col("object")).otherwise(F.col("subject")))
        .withColumn("__new_object", F.when(flip, F.col("subject")).otherwise(F.col("object")))
        .withColumn("predicate", F.coalesce(F.col("canonical"), F.col("predicate")))
        .drop("subject", "object", "canonical", "needs_flip")
        .withColumnRenamed("__new_subject", "subject")
        .withColumnRenamed("__new_object", "object")
    )
    if "qualified_predicate" in edges.columns:
        qcanon = canon.select(
            F.col("predicate").alias("qualified_predicate"),
            F.col("canonical").alias("__qcanon"),
        )
        out = (
            out.join(F.broadcast(qcanon), on="qualified_predicate", how="left")
            .withColumn(
                "qualified_predicate",
                F.coalesce(F.col("__qcanon"), F.col("qualified_predicate")),
            )
            .drop("__qcanon")
        )
    return out


def conglomerate_predicate_col() -> F.Column:
    """Edge's 'conglomerate' predicate string — parity with the reference's
    ``_get_conglomerate_predicate`` (plover.py:1469-1478): the qualified
    predicate (falling back to the plain predicate) joined with direction
    and aspect qualifiers, missing parts rendered as the string 'None'."""

    def none_str(c: str) -> F.Column:
        return F.coalesce(F.col(c).cast("string"), F.lit("None"))

    used = F.coalesce(F.col("qualified_predicate"), F.col("predicate"))
    return F.concat_ws(
        "--",
        used,
        none_str("object_direction_qualifier"),
        none_str("object_aspect_qualifier"),
    )


def normalize_and_merge_edges(
    edges: DataFrame, synonyms: DataFrame
) -> DataFrame:
    """P8 + A4 (reference plover.py:1092-1111): remap edge endpoints
    through the preferred-id map, re-key each edge as
    ``subject--predicate--object--primary_source``, and merge edges that
    collide on the new key: array properties become the sorted distinct
    union, scalar properties take the minimum.

    The reference keeps the *first-seen* scalar, which is input-stream-
    order-dependent; a distributed engine has no stream order, so min() is
    the deterministic stand-in (any stable choice is equally faithful).
    Join strategy is left to Catalyst/AQE — the synonym table is
    data-sized, not always broadcast-sized.
    """
    syn_s = synonyms.select(
        F.col("alias_id").alias("subject"), F.col("preferred_id").alias("__ps")
    )
    syn_o = synonyms.select(
        F.col("alias_id").alias("object"), F.col("preferred_id").alias("__po")
    )
    e = (
        edges.join(syn_s, on="subject", how="left")
        .join(syn_o, on="object", how="left")
        .withColumn("subject", F.coalesce("__ps", "subject"))
        .withColumn("object", F.coalesce("__po", "object"))
        .drop("__ps", "__po")
    )
    source = (
        F.coalesce(F.col("primary_knowledge_source"), F.lit(""))
        if "primary_knowledge_source" in e.columns
        else F.lit("")
    )
    e = e.withColumn(
        "id", F.concat_ws("--", F.col("subject"), F.col("predicate"), F.col("object"), source)
    )
    # supporting_studies dedupe by nctid BEFORE merging (reference
    # plover.py:1097-1100 builds {nctid: study} per edge — key order is
    # first occurrence, value is the last struct for that nctid)
    ss_type = dict(e.dtypes).get("supporting_studies", "")
    if ss_type.startswith("array<struct") and "nctid" in ss_type:
        e = e.withColumn(
            "supporting_studies",
            F.expr(
                "transform("
                "  array_distinct(transform(supporting_studies, y -> y.nctid)),"
                "  k -> element_at(filter(supporting_studies, y -> y.nctid = k), -1)"
                ")"
            ),
        )
    group_cols = ["id", "subject", "predicate", "object"]
    aggs = []
    for c, t in e.dtypes:
        if c in group_cols:
            continue
        if t.startswith("array"):
            aggs.append(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list(c)))
                ).alias(c)
            )
        else:
            aggs.append(F.min(c).alias(c))
    return e.groupBy(*group_cols).agg(*aggs)


def build_edges_bidir(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """The query-serving table: each edge twice (forward + reverse) with
    the traversal key first and the neighbor's categories denormalized in.

    Replaces the reference's nested main_index (plover.py:85-112) with a
    join-friendly layout: lookups are
    ``edges_bidir JOIN input_ids ON node_id`` + scan filters.
    """
    for c in ("qualified_predicate", "object_direction_qualifier", "object_aspect_qualifier"):
        if c not in edges.columns:
            edges = edges.withColumn(c, F.lit(None).cast("string"))
    edges = edges.withColumn("conglomerate_predicate", conglomerate_predicate_col())

    payload = [c for c in edges.columns if c not in ("subject", "object")]
    fwd = edges.select(
        F.col("subject").alias("node_id"),
        F.col("object").alias("neighbor_id"),
        F.lit(DIR_FORWARD).alias("direction"),
        *payload,
    )
    rev = edges.select(
        F.col("object").alias("node_id"),
        F.col("subject").alias("neighbor_id"),
        F.lit(DIR_REVERSE).alias("direction"),
        *payload,
    )
    bidir = fwd.unionByName(rev)
    ncat = nodes.select(
        F.col("id").alias("neighbor_id"),
        F.col("categories").alias("neighbor_categories"),
    )
    return bidir.join(ncat, on="neighbor_id", how="left")


def _fetch_subclass_fallback(
    spark: SparkSession, config: KgxConfig
) -> DataFrame | None:
    """Stage the config's subclass-edge file (S1 fetch for http(s) URLs,
    read-in-place for local paths) as a raw edge DataFrame; None when the
    config names no file (the normal case, plover.py:1534-1537)."""
    url = config.subclass_edges_url
    if not url:
        return None
    from ploverdb_spark.sources.kgx import read_kgx_auto

    path = url
    if url.startswith(("http://", "https://")):
        import tempfile

        from ploverdb_spark.sources.fetch import fetch_file

        suffix = url.rsplit("/", 1)[-1]
        path = fetch_file(url, f"{tempfile.gettempdir()}/{suffix}")
    return read_kgx_auto(
        spark, path, config, required=("subject", "predicate", "object")
    )


def build_knowledge_graph(
    nodes_raw: DataFrame,
    edges_raw: DataFrame,
    config: KgxConfig | None = None,
    model: BiolinkLite | None = None,
    category_prop: str | None = None,
    provenance_files: list[str] | None = None,
    resolver=None,
) -> KnowledgeGraph:
    """Full build pipeline (reference ``build_indexes``, plover.py:725-1382):
    categories -> synonyms -> canonical flip -> integrity -> bidir index ->
    subclass closure.

    ``provenance_files`` injects the synthetic build-provenance node (P9,
    plover.py:923-932) recording the input file list.

    ``resolver`` (a :data:`ploverdb_spark.sources.normalizer.Resolver`) is
    consulted for the preferred-id map when ``convert_input_ids`` is on
    and the graph itself ships no equivalent-id arrays — the reference's
    SRI NodeNormalizer path (plover.py:883-905).  Pass
    ``sri_resolver()`` for the real service; builds without network access
    simply omit it.
    """
    config = config or KgxConfig()
    if model is None:
        if config.biolink_model_path:
            from ploverdb_spark.ontology.biolink_yaml import load_biolink_model

            model = load_biolink_model(config.biolink_model_path)
        else:
            model = default_model()
    cat_prop = category_prop or config.node_category_property
    spark = nodes_raw.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    nodes = nodes_raw
    if provenance_files is not None:
        from ploverdb_spark.sources.kgx import provenance_node

        prov = provenance_node(spark, provenance_files)
        if cat_prop != "all_categories" and cat_prop not in prov.columns:
            prov = prov.withColumnRenamed("all_categories", cat_prop)
        nodes = nodes.unionByName(prov, allowMissingColumns=True)
    if cat_prop != "categories":
        if dict(nodes.dtypes).get(cat_prop, "").startswith("array"):
            pass
        else:  # scalar category property -> single-element array
            nodes = nodes.withColumn(cat_prop, F.array(F.col(cat_prop)))
        nodes = reduce_to_most_specific_categories(nodes, model, cat_prop)
    # Persist NOW, before any derived plan references nodes: edges
    # (integrity join), edges_bidir (category denormalization), and
    # synonyms all read it, and without a shared cache each artifact
    # re-runs the category-reduction pipeline from the source.
    nodes = nodes.repartition(n, "id").persist()

    if not config.convert_input_ids:
        synonyms = spark.createDataFrame([], "alias_id string, preferred_id string")
    elif (
        resolver is not None
        and not any(c in nodes.columns for c in config.equiv_id_properties)
    ):
        # no in-graph equivalent-id arrays -> batch-resolve via the
        # injected normalizer (reference plover.py:883-905)
        from ploverdb_spark.sources.normalizer import resolve_synonyms

        synonyms = resolve_synonyms(nodes, resolver)
    else:
        synonyms = build_id_synonyms(nodes, config)

    edges = flip_noncanonical_edges(edges_raw, model)
    if config.normalize:
        # P8 + A4 (plover.py:1092-1111, gated on the "normalize" config
        # key): remap endpoints through the preferred-id map and merge
        # duplicate subject--predicate--object--source edges BEFORE the
        # integrity check, so edges referencing alias curies resolve
        # instead of being dropped/raising.
        edges = normalize_and_merge_edges(edges, synonyms)
    edges = referential_integrity(edges, nodes, is_test=config.is_test)
    edges = edges.persist()  # feeds bidir, closure, and direct serving

    bidir = build_edges_bidir(edges, nodes).repartition(n, "node_id")

    fallback = _fetch_subclass_fallback(spark, config)
    pairs = resolve_subclass_edge_set(
        edges,
        nodes,
        synonyms,
        fallback_edges=fallback,
        subclass_sources=config.subclass_sources,
    )
    closure = transitive_closure(pairs).select("ancestor", "descendant")

    return KnowledgeGraph(
        nodes=nodes,
        edges=edges,
        edges_bidir=bidir,
        subclass_closure=closure,
        id_synonyms=synonyms,
        model=model,
        config=config,
    )


def write_artifacts(kg: KnowledgeGraph, out_dir: str, bidir_buckets: int = 0) -> None:
    """Persist the artifact set as Parquet (the reference pickles dicts,
    plover.py:1294-1345; Parquet gives us column pruning + pushdown).

    ``bidir_buckets`` > 0 writes edges_bidir bucketed by node_id via
    saveAsTable semantics when a catalog is available; otherwise falls back
    to repartition-by-key parquet, which still co-locates each node's edges
    in one file for join locality.
    """
    kg.nodes.write.mode("overwrite").parquet(f"{out_dir}/nodes.parquet")
    kg.edges.write.mode("overwrite").parquet(f"{out_dir}/edges.parquet")
    bidir = kg.edges_bidir
    if bidir_buckets:
        bidir = bidir.repartition(bidir_buckets, "node_id")
    bidir.write.mode("overwrite").parquet(f"{out_dir}/edges_bidir.parquet")
    kg.subclass_closure.write.mode("overwrite").parquet(
        f"{out_dir}/subclass_closure.parquet"
    )
    kg.id_synonyms.write.mode("overwrite").parquet(f"{out_dir}/id_synonyms.parquet")


def write_artifacts_bucketed(
    kg: KnowledgeGraph,
    out_dir: str,
    prefix: str = "plover",
    buckets: int = 64,
) -> dict[str, str]:
    """Persist the serving tables BUCKETED on their lookup keys via
    ``saveAsTable`` (external tables rooted at ``out_dir``).

    Why this matters at 100 TB: ``edges_bidir`` bucketed+sorted by
    ``node_id`` gives point lookups bucket pruning — a query pinned to k
    node ids scans k/``buckets`` of the index (the physical plan shows
    ``SelectedBucketsCount``), and any self-join or groupBy on the bucket
    key skips its shuffle entirely.  Plain parquet (``write_artifacts``)
    cannot carry bucket metadata.

    Serving deployments must set
    ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false``:
    Spark's planner otherwise falls back to a regular (non-bucketed) scan
    for filter-only queries, and bucket pruning only applies to bucketed
    scans.  The trade (scan tasks capped at ``buckets``) is right for
    point-lookup serving; size ``buckets`` to the cluster's cores.

    Returns {logical_name: table_name} for the tables written.
    """
    spark = kg.nodes.sparkSession
    tables = {}

    def save(df: DataFrame, name: str, bucket_col: str | None) -> None:
        table = f"{prefix}_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        writer = df.write.mode("overwrite").format("parquet").option(
            "path", f"{out_dir}/{table}"
        )
        if bucket_col is not None:
            writer = writer.bucketBy(buckets, bucket_col).sortBy(bucket_col)
        writer.saveAsTable(table)
        tables[name] = table

    save(kg.nodes, "nodes", "id")
    save(kg.edges, "edges", None)
    save(kg.edges_bidir, "edges_bidir", "node_id")
    save(kg.subclass_closure, "subclass_closure", "ancestor")
    save(kg.id_synonyms, "id_synonyms", "alias_id")
    return tables


def read_artifacts_bucketed(
    spark: SparkSession,
    prefix: str = "plover",
    config: KgxConfig | None = None,
    model: BiolinkLite | None = None,
) -> KnowledgeGraph:
    """Serve from bucketed artifact tables written by
    :func:`write_artifacts_bucketed` (bucket metadata only survives via
    the table catalog, so this reads ``spark.table``, not raw parquet)."""
    return KnowledgeGraph(
        nodes=spark.table(f"{prefix}_nodes"),
        edges=spark.table(f"{prefix}_edges"),
        edges_bidir=spark.table(f"{prefix}_edges_bidir"),
        subclass_closure=spark.table(f"{prefix}_subclass_closure"),
        id_synonyms=spark.table(f"{prefix}_id_synonyms"),
        model=model or default_model(),
        config=config or KgxConfig(),
        pruned_id_scans=True,  # bucketed+sorted: pushed id lists prune
    )


def read_artifacts(
    spark: SparkSession,
    out_dir: str,
    config: KgxConfig | None = None,
    model: BiolinkLite | None = None,
) -> KnowledgeGraph:
    """Load a previously-built artifact set (reference ``load_indexes``,
    plover.py:1384-1422)."""
    return KnowledgeGraph(
        nodes=spark.read.parquet(f"{out_dir}/nodes.parquet"),
        edges=spark.read.parquet(f"{out_dir}/edges.parquet"),
        edges_bidir=spark.read.parquet(f"{out_dir}/edges_bidir.parquet"),
        subclass_closure=spark.read.parquet(f"{out_dir}/subclass_closure.parquet"),
        id_synonyms=spark.read.parquet(f"{out_dir}/id_synonyms.parquet"),
        model=model or default_model(),
        config=config or KgxConfig(),
    )


def remove_input_files(paths: list[str]) -> list[str]:
    """Post-build source-file cleanup (reference plover.py:1370-1379,
    ``delete_local_kg_files`` config): remove staged local KGX inputs once
    the build artifacts exist.  Missing files are fine; other OS errors
    are logged and skipped (never fail a finished build over cleanup).
    Remote URLs (anything with a scheme) are left untouched.  Returns the
    paths actually removed."""
    import logging
    import os
    from urllib.parse import urlparse

    removed = []
    for p in paths:
        if not p or urlparse(p).scheme not in ("", "file"):
            continue
        local = urlparse(p).path if p.startswith("file:") else p
        try:
            os.remove(local)
            removed.append(p)
        except FileNotFoundError:
            pass
        except OSError as e:
            logging.warning("Failed to delete %s: %s", p, e)
    return removed
