"""TRAPI semantic-operator coverage beyond the core lookups: build-time
transforms (P6/P7), constraint filtering (F3), qualifier/conglomerate
matching (J8/R3/G4), result grouping (A6), the edgeless fast path (R5),
and meta-node aggregation (A3) — each as an oracle-checked catalog query.

All queries run through the REAL engine/build functions (not re-derived
logic) so the oracle checks pin the production code paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ploverdb_spark.build.ingest import (
    flip_noncanonical_edges,
    reduce_to_most_specific_categories,
)
from ploverdb_spark.catalog import load, register
from ploverdb_spark.ontology.biolink_lite import default_model
from ploverdb_spark.queries.graph import _CLOSURE_SQL, graft_engine


@register(
    "r5_single_node_lookup",
    oracle=_CLOSURE_SQL
    + """
    SELECT 'R:1' AS query_id, 'R:1' AS node_id
    UNION ALL
    SELECT 'R:1' AS query_id, descendant AS node_id
    FROM closure WHERE ancestor = 'R:1'
    """,
    doc="Edgeless single-node fast path (SURVEY §2.6 R5, "
    "plover.py:2778-2817): pinned id + transitive subclass descendants "
    "joined against the node table; no edge pipeline involved.",
)
def r5_single_node_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = graft_engine(spark, sf_dir)
    qg = {"nodes": {"n00": {"ids": ["R:1"]}}}
    _, found = eng.single_node_lookup(qg)
    return found.select("query_id", "node_id")


@register(
    "p6_most_specific_categories",
    oracle="""
    SELECT 'X:' || CAST(c_custkey AS VARCHAR) AS id,
           CASE WHEN c_custkey % 2 = 0
                THEN ['biolink:Disease']
                ELSE ['graft:Customer'] END AS categories
    FROM customer
    """,
    doc="Most-specific-category reduction (SURVEY §2.2 P6, "
    "plover.py:835-877): explode -> broadcast ancestor-table join -> "
    "anti-join -> collect_set; proper Biolink ancestors of a sibling "
    "category are dropped per node.",
)
def p6_most_specific_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    nodes = customer.select(
        F.concat(F.lit("X:"), F.col("c_custkey").cast("string")).alias("id"),
        F.when(
            F.col("c_custkey") % 2 == 0,
            F.array(
                F.lit("biolink:Disease"),
                F.lit("biolink:DiseaseOrPhenotypicFeature"),
                F.lit("biolink:NamedThing"),
            ),
        )
        .otherwise(F.array(F.lit("graft:Customer"), F.lit("biolink:NamedThing")))
        .alias("all_categories"),
    )
    reduced = reduce_to_most_specific_categories(nodes, default_model())
    return reduced.select("id", "categories")


@register(
    "p7_canonical_flip",
    oracle="""
    SELECT 'epf:' || CAST(n_nationkey AS VARCHAR) AS id,
           CASE WHEN n_nationkey % 2 = 0
                THEN 'R:' || CAST(n_regionkey AS VARCHAR)
                ELSE 'N:' || CAST(n_nationkey AS VARCHAR) END AS subject,
           'biolink:has_part' AS predicate,
           CASE WHEN n_nationkey % 2 = 0
                THEN 'N:' || CAST(n_nationkey AS VARCHAR)
                ELSE 'R:' || CAST(n_regionkey AS VARCHAR) END AS object
    FROM nation
    """,
    doc="Canonical-predicate edge flip (SURVEY §2.2 P7, "
    "plover.py:1059-1088): non-canonical part_of edges are rewritten to "
    "the canonical has_part with subject/object swapped; already-canonical "
    "edges pass through unchanged.",
)
def p7_canonical_flip(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    edges = nation.select(
        F.concat(F.lit("epf:"), F.col("n_nationkey").cast("string")).alias("id"),
        F.concat(F.lit("N:"), F.col("n_nationkey").cast("string")).alias("subject"),
        F.concat(F.lit("R:"), F.col("n_regionkey").cast("string")).alias("object"),
        F.when(F.col("n_nationkey") % 2 == 0, F.lit("biolink:part_of"))
        .otherwise(F.lit("biolink:has_part"))
        .alias("predicate"),
    )
    flipped = flip_noncanonical_edges(edges, default_model())
    return flipped.select("id", "subject", "predicate", "object")


@register(
    "f3_constrained_lookup",
    oracle="""
    SELECT 'eop:' || CAST(o_orderkey AS VARCHAR) AS id,
           'C:' || CAST(o_custkey AS VARCHAR) AS input_id,
           'O:' || CAST(o_orderkey AS VARCHAR) AS output_id,
           o_orderstatus AS order_status
    FROM orders
    WHERE o_custkey BETWEEN 1 AND 20 AND o_orderstatus = 'F'
      AND o_totalprice > 50000
    """,
    doc="Attribute-constraint filtering (SURVEY §2.5 F3, "
    "plover.py:2418-2584): one-hop lookup whose answer edges are filtered "
    "by TRAPI attribute_constraints (== on a string property AND > on a "
    "numeric property), compiled to one boolean Column (no UDFs).",
)
def f3_constrained_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = graft_engine(spark, sf_dir)
    qg = {
        "nodes": {
            "n00": {"categories": ["graft:Order"]},
            "n01": {"ids": [f"C:{i}" for i in range(1, 21)]},
        },
        "edges": {
            "e00": {
                "subject": "n00",
                "object": "n01",
                "predicates": ["graft:placed_by"],
                "attribute_constraints": [
                    {"id": "order_status", "operator": "==", "value": "F"},
                    {"id": "totalprice", "operator": ">", "value": 50000},
                ],
            }
        },
    }
    _, answers = eng.lookup(qg, persist_answers=False)
    return answers.select("id", "input_id", "output_id", "order_status")


@register(
    "j8_qualified_lookup",
    oracle="""
    SELECT 'eop:' || CAST(o_orderkey AS VARCHAR) AS id,
           'C:' || CAST(o_custkey AS VARCHAR) AS input_id,
           'O:' || CAST(o_orderkey AS VARCHAR) AS output_id,
           'biolink:causes--increased--abundance' AS conglomerate_predicate
    FROM orders
    WHERE o_custkey BETWEEN 1 AND 50 AND o_orderstatus = 'O'
    """,
    doc="Qualifier ('conglomerate predicate') matching (SURVEY §2.3 J8 + "
    "§2.6 R3 + §2.7 G4; plover.py:1486-1519, 2704-2776): the query's "
    "qualifier constraint (affects / upregulated) expands via the "
    "conglomerate descendant index to the stored combo "
    "(causes / increased / abundance); qualified predicate overrides "
    "'predicates'.",
)
def j8_qualified_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = graft_engine(spark, sf_dir)
    qg = {
        "nodes": {
            "n00": {"categories": ["graft:Order"]},
            "n01": {"ids": [f"C:{i}" for i in range(1, 51)]},
        },
        "edges": {
            "e00": {
                "subject": "n00",
                "object": "n01",
                "predicates": ["graft:placed_by"],
                "qualifier_constraints": [
                    {
                        "qualifier_set": [
                            {
                                "qualifier_type_id": "biolink:qualified_predicate",
                                "qualifier_value": "biolink:affects",
                            },
                            {
                                "qualifier_type_id": "biolink:object_direction_qualifier",
                                "qualifier_value": "upregulated",
                            },
                        ]
                    }
                ],
            }
        },
    }
    _, answers = eng.lookup(qg, persist_answers=False)
    return answers.select("id", "input_id", "output_id", "conglomerate_predicate")


@register(
    "a6_result_groups",
    oracle="""
    SELECT 'N:' || CAST(c_nationkey AS VARCHAR) AS result_key,
           COUNT(*) AS n_edges,
           LIST_SORT(LIST('C:' || CAST(c_custkey AS VARCHAR))) AS output_ids
    FROM customer
    WHERE c_nationkey IN (0, 1, 2)
    GROUP BY c_nationkey
    """,
    doc="is_set result grouping (SURVEY §2.4 A6, plover.py:2330-2387): "
    "answer edges grouped into TRAPI results — output qnode is_set, so "
    "one result per input id with the output/edge sets collected.",
)
def a6_result_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = graft_engine(spark, sf_dir)
    qg = {
        "nodes": {
            "n00": {"categories": ["graft:Customer"], "is_set": True},
            "n01": {"ids": ["N:0", "N:1", "N:2"]},
        },
        "edges": {
            "e00": {
                "subject": "n00",
                "object": "n01",
                "predicates": ["graft:located_in"],
            }
        },
    }
    _, answers = eng.lookup(qg, persist_answers=False)
    # A6 key: per-qnode — id when is_set is False, '*' when True; here the
    # input side (pinned nations) keys the result, the is_set output side
    # collapses into collected sets.
    return (
        answers.groupBy(F.col("input_id").alias("result_key"))
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sort_array(F.collect_set("output_id")).alias("output_ids"),
        )
    )


@register(
    "a3_meta_nodes",
    oracle="""
    SELECT category, prefixes FROM (VALUES
        ('graft:Customer', ['C']),
        ('graft:Nation',   ['N']),
        ('graft:Order',    ['O']),
        ('graft:Region',   ['R']),
        ('graft:Supplier', ['S'])
    ) t(category, prefixes)
    """,
    doc="Meta-node aggregation (SURVEY §2.4 A3, plover.py:1221-1228): "
    "nodes grouped by category, CURIE prefixes collected per group.",
)
def a3_meta_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = graft_engine(spark, sf_dir)
    return (
        eng.kg.nodes.select(
            F.explode("categories").alias("category"),
            F.split(F.col("id"), ":").getItem(0).alias("prefix"),
        )
        .groupBy("category")
        .agg(F.sort_array(F.collect_set("prefix")).alias("prefixes"))
    )
