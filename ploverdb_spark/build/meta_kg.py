"""Meta knowledge graph + SRI test triples (build-time aggregations).

Reference behavior reimplemented (NOT ported):
- meta edges: the cross product of each edge's subject categories x object
  categories yields (subject_category, predicate, object_category) triples;
  per triple, collect the attribute (non-core property) names present and
  the qualifier value sets (plover.py:1103-1219, A1)
- SRI test triples: one example edge per meta-triple (plover.py:1156-1163,
  A2) — the reference keeps the first edge in stream order; we keep the
  minimum edge id for determinism (first-per-group via min_by)
- meta nodes: category -> set of CURIE id prefixes (plover.py:1221-1228, A3)

Spark shape: two explodes (subject/object category arrays) -> one groupBy
per output.  Partial aggregation keeps each output a single shuffle at any
scale; the results are ontology-sized (small) regardless of edge count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ploverdb_spark.build.ingest import KnowledgeGraph

QUALIFIER_COLS = (
    "qualified_predicate",
    "object_direction_qualifier",
    "object_aspect_qualifier",
)

# edge properties that do NOT become TRAPI attributes (plover.py:700-704)
CORE_EDGE_COLS = {
    "id",
    "subject",
    "object",
    "predicate",
    "conglomerate_predicate",
    *QUALIFIER_COLS,
}


def _edges_with_category_pairs(kg: KnowledgeGraph) -> DataFrame:
    """Each edge exploded to one row per (subject_category, object_category)
    combination — the reference's nested loop, vectorized."""
    cats = kg.nodes.select(F.col("id"), F.col("categories"))
    e = (
        kg.edges.join(
            cats.select(
                F.col("id").alias("subject"),
                F.col("categories").alias("__subj_cats"),
            ),
            on="subject",
        )
        .join(
            cats.select(
                F.col("id").alias("object"),
                F.col("categories").alias("__obj_cats"),
            ),
            on="object",
        )
    )
    return (
        e.withColumn("subject_category", F.explode("__subj_cats"))
        .withColumn("object_category", F.explode("__obj_cats"))
        .drop("__subj_cats", "__obj_cats")
    )


def meta_edges(kg: KnowledgeGraph) -> DataFrame:
    """(subject_category, predicate, object_category) + attribute names +
    per-qualifier applicable values."""
    pairs = _edges_with_category_pairs(kg)
    attr_cols = [c for c in kg.edges.columns if c not in CORE_EDGE_COLS]
    # attribute name present on a triple = column non-null for some edge
    attr_name_arr = F.array_compact(
        F.array(
            *[
                F.when(F.col(c).isNotNull(), F.lit(c)).otherwise(F.lit(None))
                for c in attr_cols
            ]
        )
    ) if attr_cols else F.array().cast("array<string>")
    qual_cols = [c for c in QUALIFIER_COLS if c in kg.edges.columns]
    aggs = [
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_set(attr_name_arr)))
        ).alias("attribute_names"),
        F.count(F.lit(1)).alias("n_edges"),
    ]
    for c in qual_cols:
        aggs.append(F.sort_array(F.collect_set(F.col(c))).alias(f"{c}_values"))
    return (
        pairs.groupBy("subject_category", "predicate", "object_category")
        .agg(*aggs)
    )


def test_triples(kg: KnowledgeGraph) -> DataFrame:
    """One deterministic example edge per meta triple (min edge id)."""
    pairs = _edges_with_category_pairs(kg)
    return (
        pairs.groupBy("subject_category", "predicate", "object_category")
        .agg(
            F.min_by(
                F.struct(
                    F.col("subject").alias("subject_id"),
                    F.col("object").alias("object_id"),
                ),
                F.col("id"),
            ).alias("example"),
        )
        .select(
            "subject_category",
            "predicate",
            "object_category",
            F.col("example.subject_id").alias("subject_id"),
            F.col("example.object_id").alias("object_id"),
        )
    )


def meta_nodes(kg: KnowledgeGraph) -> DataFrame:
    """category -> sorted set of CURIE prefixes of its nodes."""
    return (
        kg.nodes.select(
            F.explode("categories").alias("category"),
            F.split(F.col("id"), ":").getItem(0).alias("prefix"),
        )
        .groupBy("category")
        .agg(F.sort_array(F.collect_set("prefix")).alias("id_prefixes"))
    )


def build_meta_kg(kg: KnowledgeGraph) -> dict:
    """Driver-side assembly of the TRAPI /meta_knowledge_graph payload
    (ontology-sized, safe to collect)."""
    edges = [
        {
            "subject": r.subject_category,
            "predicate": r.predicate,
            "object": r.object_category,
            "attributes": [
                {"attribute_type_id": a if ":" in a else f"biolink:{a}",
                 "constraint_use": True,
                 "constraint_name": a.replace("_", " ")}
                for a in r.attribute_names
            ],
            "qualifiers": [
                {"qualifier_type_id": f"biolink:{c}",
                 "applicable_values": list(getattr(r, f"{c}_values"))}
                for c in QUALIFIER_COLS
                if hasattr(r, f"{c}_values") and getattr(r, f"{c}_values")
            ],
        }
        for r in meta_edges(kg).collect()
    ]
    nodes = {
        r.category: {"id_prefixes": list(r.id_prefixes)}
        for r in meta_nodes(kg).collect()
    }
    return {"nodes": nodes, "edges": edges}
