"""KGX flat-file ingest (nodes + edges) as Spark reads.

Reference behavior reimplemented (NOT ported):
- TSV scan with header validation + per-value type coercion
  (plover.py:507-530, ``_load_value`` plover.py:458-482)
- JSONL scan (plover.py:532-546)
- gzip transparency (plover.py:484-505) — Spark reads ``.gz`` natively
  (single-split per file; at scale, prefer many gz shards or uncompressed)
- array columns split on a configurable delimiter (plover.py:668-672, 720)
- property drop / rename / zip / empty pruning (plover.py:796-810,
  996-1051)

Columnar adaptation of the reference's per-*value* dynamic typing: KGX TSV
carries strings; the reference coerces each value independently
(int/float/bool/none/str).  A DataFrame needs one type per column, so we
infer each column's type with a single aggregate pass (int if every
non-null value parses as int, else float, else bool, else string) and cast
the whole column.  Sentinels ``none``/``null``/empty are nulled first.
This is one extra scan at build time and keeps everything JVM-side —
no Python UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# reference plover.py:1003-1008 — legacy property fixups
LEGACY_EDGE_RENAMES = {
    "qualified_object_direction": "object_direction_qualifier",
    "qualified_object_aspect": "object_aspect_qualifier",
}

# reference plover.py:705-710 — clinical-trial phase enum
TRIAL_PHASES = {
    0.5: "early_phase_1",
    1.0: "phase_1",
    1.5: "phase_1_2",
    2.0: "phase_2",
    2.5: "phase_2_3",
    3.0: "phase_3",
    4.0: "phase_4",
}


@dataclass
class KgxConfig:
    """Per-KP ingest config (subset of the reference's config.json contract,
    README.md:333-357)."""

    node_category_property: str = "all_categories"  # labels.nodes
    edge_predicate_property: str = "predicate"  # labels.edges
    array_delimiter: str = ","
    array_properties: list[str] = field(default_factory=list)
    ignore_node_properties: list[str] = field(default_factory=list)
    ignore_edge_properties: list[str] = field(default_factory=list)
    zip_properties: dict[str, dict] = field(default_factory=dict)
    # zip_properties: new_prop -> {"properties": [col, ...], "leader": col}
    convert_input_ids: bool = True
    # Re-map edge endpoints to preferred ids and merge colliding
    # subject--predicate--object--source edges at build time (reference
    # "normalize" config key, plover.py:958-964, 1092-1111).  False when
    # the graph's edge CURIEs are already canonical.
    normalize: bool = False
    equiv_id_properties: tuple[str, ...] = (
        "equivalent_curies",
        "equivalent_identifiers",
        "equivalent_ids",
        "same_as",
    )
    is_test: bool = False
    num_edges_per_answer_cutoff: int = 1_000_000
    # Remote subclass-edge fallback (reference plover.py:1536-1618): when
    # the KG itself has no subclass edges, fetch this KGX file and use its
    # subclass triples (filtered to known ids, remapped to preferred ids).
    subclass_edges_url: str | None = None
    # Allowlist of primary_knowledge_source values for subclass edges
    # (reference kg_config["subclass_sources"], plover.py:1601-1608).
    subclass_sources: list[str] | None = None
    # Per-KP overrides of the default TRAPI attribute shells
    # (reference kg_config["trapi_attribute_map"], plover.py:1441-1445).
    trapi_attribute_map: dict[str, dict] = field(default_factory=dict)
    # Remove staged local KGX input files once the build is done
    # (reference kg_config["delete_local_kg_files"], plover.py:1370-1379).
    delete_local_kg_files: bool = False
    # Path to a biolink-model.yaml to load the full ontology from
    # (reference BiolinkHelper(biolink_version, ...) downloads the
    # versioned model; deployments here point at a staged copy).  None ->
    # the curated offline subset.
    biolink_model_path: str | None = None


_NULL_SENTINELS = ("", "none", "null")
_BOOL_TRUE = ("t", "true")
_BOOL_FALSE = ("f", "false")


def _nullify(col: Column) -> Column:
    v = F.trim(col)
    return F.when(F.lower(v).isin(*_NULL_SENTINELS), F.lit(None)).otherwise(v)


def _infer_scalar_types(df: DataFrame, cols: list[str]) -> dict[str, str]:
    """One aggregate pass deciding each string column's best scalar type."""
    aggs = []
    for c in cols:
        v = _nullify(F.col(c))
        lv = F.lower(v)
        nonnull = v.isNotNull()
        aggs.extend(
            [
                F.sum(F.when(nonnull, 1).otherwise(0)).alias(f"{c}__n"),
                F.sum(
                    F.when(nonnull & v.try_cast("long").isNull(), 1).otherwise(0)
                ).alias(f"{c}__notint"),
                F.sum(
                    F.when(nonnull & v.try_cast("double").isNull(), 1).otherwise(0)
                ).alias(f"{c}__notfloat"),
                F.sum(
                    F.when(
                        nonnull & ~lv.isin(*(_BOOL_TRUE + _BOOL_FALSE)), 1
                    ).otherwise(0)
                ).alias(f"{c}__notbool"),
            ]
        )
    row = df.agg(*aggs).collect()[0].asDict()
    out: dict[str, str] = {}
    for c in cols:
        if row[f"{c}__n"] == 0:
            out[c] = "string"
        elif row[f"{c}__notbool"] == 0:
            out[c] = "boolean"
        elif row[f"{c}__notint"] == 0:
            out[c] = "long"
        elif row[f"{c}__notfloat"] == 0:
            out[c] = "double"
        else:
            out[c] = "string"
    return out


def _coerce_scalar(col: Column, typ: str) -> Column:
    v = _nullify(col)
    if typ == "boolean":
        return F.lower(v).isin(*_BOOL_TRUE)
    if typ in ("long", "double"):
        return v.try_cast(typ)  # ANSI mode: plain cast throws on bad input
    return v


def read_kgx_tsv(
    spark: SparkSession,
    path: str,
    config: KgxConfig | None = None,
    required: tuple[str, ...] = (),
) -> DataFrame:
    """Read a KGX TSV (optionally .gz) with reference coercion semantics.

    Raises on duplicate header names and missing required columns
    (reference plover.py:516-527); column-count mismatches surface as
    FAILFAST parse errors.
    """
    config = config or KgxConfig()
    df = (
        spark.read.option("sep", "\t")
        .option("header", True)
        .option("mode", "FAILFAST")
        .csv(path)
    )
    cols = df.columns
    dupes = {c for c in cols if cols.count(c) > 1}
    if dupes:
        raise ValueError(f"duplicate TSV header columns: {sorted(dupes)}")
    missing = [c for c in required if c not in cols]
    if missing:
        raise ValueError(f"missing required columns: {missing}")

    array_cols = [c for c in config.array_properties if c in cols]
    scalar_cols = [c for c in cols if c not in array_cols]
    types = _infer_scalar_types(df, scalar_cols)

    exprs: list[Column] = []
    for c in cols:
        if c in array_cols:
            split_arr = F.split(_nullify(F.col(c)), config.array_delimiter)
            cleaned = F.filter(
                F.transform(split_arr, lambda x: _nullify(x)),
                lambda x: x.isNotNull(),
            )
            exprs.append(cleaned.alias(c))
        else:
            exprs.append(_coerce_scalar(F.col(c), types[c]).alias(c))
    return df.select(*exprs)


def read_kgx_jsonl(
    spark: SparkSession,
    path: str,
    required: tuple[str, ...] = (),
    sampling_ratio: float = 1.0,
) -> DataFrame:
    """Read a KGX JSON-Lines file (native types; reference plover.py:532-546).

    Corrupt (non-object) lines fail the read, matching the reference's
    hard error on malformed rows.

    ``sampling_ratio`` < 1 infers the schema from a sample instead of a
    full extra pass over the file — at 30M-edge scale full inference
    doubles the parse cost.  Safe when the file's rows are structurally
    homogeneous (a property appearing on < ~1/sample rows could be
    missed); the default stays exact.
    """
    reader = spark.read.option("mode", "FAILFAST")
    if sampling_ratio < 1.0:
        reader = reader.option("samplingRatio", sampling_ratio)
    df = reader.json(path)
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"missing required columns: {missing}")
    return df


def read_kgx_auto(
    spark: SparkSession,
    path: str,
    config: KgxConfig | None = None,
    required: tuple[str, ...] = (),
    sampling_ratio: float = 1.0,
) -> DataFrame:
    """Dispatch on extension: .jsonl/.json(.gz) -> JSONL reader, else TSV
    (gzip handled natively by both)."""
    name = path.removesuffix(".gz")
    if name.endswith((".jsonl", ".json")):
        return read_kgx_jsonl(
            spark, path, required=required, sampling_ratio=sampling_ratio
        )
    return read_kgx_tsv(spark, path, config, required=required)


def apply_edge_fixups(edges: DataFrame, config: KgxConfig) -> DataFrame:
    """P1 ignores, P3 renames, P4 zip, P5 trial-phase enum — all as
    column expressions (no UDFs)."""
    df = edges
    for old, new in LEGACY_EDGE_RENAMES.items():
        if old in df.columns and new not in df.columns:
            df = df.withColumnRenamed(old, new)
    drop = [c for c in config.ignore_edge_properties if c in df.columns]
    if drop:
        df = df.drop(*drop)
    df = zip_properties(df, config.zip_properties)
    return df


def zip_properties(df: DataFrame, zip_cfg: dict[str, dict]) -> DataFrame:
    """Zip N parallel array columns into one ARRAY<STRUCT> property
    (reference P4, plover.py:796-810, 1010-1046).

    The per-struct cleanup (drop structs whose fields are all null) and
    trial-phase enum conversion of a ``phase`` field are applied inline.
    """
    def phase_enum_of(field: Column) -> Column:
        """Numeric trial phase -> Biolink ResearchPhaseEnum string (P5)."""
        expr = None
        num_field = field.try_cast("double")
        for num, name in sorted(TRIAL_PHASES.items()):
            cond = num_field == F.lit(num)
            expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        return expr.otherwise(field.cast("string"))

    for new_prop, spec in zip_cfg.items():
        props = [p for p in spec.get("properties", []) if p in df.columns]
        if not props:
            continue
        zipped = F.arrays_zip(*[F.col(p) for p in props])
        if "phase" in props:
            zipped = F.transform(
                zipped,
                lambda x: F.struct(
                    *[
                        (
                            phase_enum_of(x["phase"]).alias("phase")
                            if p == "phase"
                            else x[p].alias(p)
                        )
                        for p in props
                    ]
                ),
            )
        nonempty = F.filter(
            zipped,
            lambda x: F.greatest(*[x[p].isNotNull() for p in props])
            if len(props) > 1
            else x[props[0]].isNotNull(),
        )
        df = df.withColumn(new_prop, nonempty).drop(*props)
    return df


def drop_ignored_node_properties(nodes: DataFrame, config: KgxConfig) -> DataFrame:
    drop = [c for c in config.ignore_node_properties if c in nodes.columns]
    return nodes.drop(*drop) if drop else nodes


def build_id_synonyms(nodes: DataFrame, config: KgxConfig) -> DataFrame:
    """(alias_id, preferred_id) from in-graph equivalent-id arrays
    (reference plover.py:80-83, 853-861)."""
    col = next(
        (c for c in config.equiv_id_properties if c in nodes.columns), None
    )
    if col is None:
        return nodes.sparkSession.createDataFrame(
            [], "alias_id string, preferred_id string"
        )
    return (
        nodes.select(F.col("id").alias("preferred_id"), F.explode(col).alias("alias_id"))
        .where(F.col("alias_id") != F.col("preferred_id"))
        .dropDuplicates(["alias_id"])
    )


def referential_integrity(
    edges: DataFrame, nodes: DataFrame, is_test: bool = False
) -> DataFrame:
    """J1 (reference plover.py:1113-1129): every edge endpoint must exist.

    ``is_test=True`` silently drops orphans (inner-join semantics);
    otherwise raise with the orphan count.
    """
    node_ids = nodes.select(F.col("id").alias("__nid"))
    ok = edges.join(
        node_ids, edges.subject == F.col("__nid"), "left_semi"
    ).join(node_ids, edges.object == F.col("__nid"), "left_semi")
    if not is_test:
        n_edges = edges.count()
        n_ok = ok.count()
        if n_ok != n_edges:
            raise ValueError(
                f"{n_edges - n_ok} edges reference nonexistent nodes"
            )
    return ok


def provenance_node(spark: SparkSession, input_files: list[str]) -> DataFrame:
    """P9 (reference plover.py:923-932): synthetic build-provenance node."""
    return spark.createDataFrame(
        [
            {
                "id": "ploverdb_spark:build",
                "name": "ploverdb_spark build metadata",
                "all_categories": ["biolink:InformationContentEntity"],
                "description": "input files: " + ", ".join(input_files),
            }
        ]
    )
