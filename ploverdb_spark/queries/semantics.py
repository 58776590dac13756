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
    normalize_and_merge_edges,
    reduce_to_most_specific_categories,
)
from ploverdb_spark.build.meta_kg import test_triples
from ploverdb_spark.catalog import load, register
from ploverdb_spark.ontology.biolink_lite import default_model
from ploverdb_spark.queries.graph import _CLOSURE_SQL, graft_engine
from ploverdb_spark.sources.kgx import zip_properties


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
                THEN 'biolink:Disease'
                ELSE 'graft:Customer' END AS categories
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
    return reduced.select(
        "id", F.array_join(F.sort_array("categories"), "|").alias("categories")
    )


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
           ARRAY_TO_STRING(LIST_SORT(LIST('C:' || CAST(c_custkey AS VARCHAR))), '|') AS output_ids
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
            F.array_join(F.sort_array(F.collect_set("output_id")), "|").alias("output_ids"),
        )
    )


@register(
    "j3_trapi_doubly_pinned",
    oracle="""
    SELECT 'ecl:' || CAST(c_custkey AS VARCHAR) AS id,
           'C:' || CAST(c_custkey AS VARCHAR) AS input_id,
           'N:' || CAST(c_nationkey AS VARCHAR) AS output_id
    FROM customer
    WHERE c_custkey BETWEEN 1 AND 100 AND c_nationkey <= 11
    """,
    doc="Doubly-pinned one-hop (SURVEY §2.3 J3, plover.py:2068-2095): "
    "BOTH qnodes carry ids, so the neighbor set intersects the pinned "
    "output ids via a second broadcast join instead of a category filter.",
)
def j3_trapi_doubly_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = graft_engine(spark, sf_dir)
    qg = {
        "nodes": {
            "n00": {"ids": [f"C:{i}" for i in range(1, 101)]},
            "n01": {"ids": [f"N:{i}" for i in range(12)]},
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
    return answers.select("id", "input_id", "output_id")


@register(
    "f4_symmetric_lookup",
    oracle="""
    SELECT 'ea:' || CAST(a.n_nationkey AS VARCHAR) AS id,
           'N:5' AS input_id,
           CASE WHEN a.n_nationkey = 5
                THEN 'N:' || CAST(b.n_nationkey AS VARCHAR)
                ELSE 'N:' || CAST(a.n_nationkey AS VARCHAR) END AS output_id
    FROM nation a JOIN nation b ON b.n_nationkey = a.n_nationkey + 1
    WHERE a.n_nationkey = 5 OR b.n_nationkey = 5
    """,
    doc="Symmetric-predicate direction semantics (SURVEY §2.5 F4, "
    "plover.py:2629-2652): graft:adjacent_to is symmetric, so a pinned "
    "node matches edges in BOTH directions (N:5 finds its ea:4 incoming "
    "and ea:5 outgoing neighbors).",
)
def f4_symmetric_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = graft_engine(spark, sf_dir)
    qg = {
        "nodes": {
            "n00": {"ids": ["N:5"]},
            "n01": {"categories": ["graft:Nation"]},
        },
        "edges": {
            "e00": {
                "subject": "n00",
                "object": "n01",
                "predicates": ["graft:adjacent_to"],
            }
        },
    }
    _, answers = eng.lookup(qg, persist_answers=False)
    return answers.select("id", "input_id", "output_id")


@register(
    "j4_alias_lookup",
    oracle="""
    SELECT 'ecl:' || CAST(c_custkey AS VARCHAR) AS id,
           'C:' || CAST(c_custkey AS VARCHAR) AS input_id,
           'N:' || CAST(c_nationkey AS VARCHAR) AS output_id
    FROM customer WHERE c_custkey IN (3, 7)
    """,
    doc="Equivalent-id rewrite (SURVEY §2.3 J4 / §2.6 R1, "
    "plover.py:1797-1804): the query uses CUSTX: alias CURIEs; the synonym "
    "map (built from equivalent_identifiers at ingest) canonicalizes them "
    "to the preferred C: ids before the lookup.",
)
def j4_alias_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = graft_engine(spark, sf_dir)
    qg = {
        "nodes": {
            "n00": {"ids": ["CUSTX:3", "CUSTX:7"]},
            "n01": {"categories": ["graft:Nation"]},
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
    return answers.select("id", "input_id", "output_id")


@register(
    "a4_normalize_merge",
    oracle="""
    SELECT 'C:' || CAST(c_custkey AS VARCHAR) || '--graft:located_in--N:'
             || CAST(c_nationkey AS VARCHAR) || '--infores:graft' AS id,
           'C:' || CAST(c_custkey AS VARCHAR) AS subject,
           'graft:located_in' AS predicate,
           'N:' || CAST(c_nationkey AS VARCHAR) AS object,
           'srcA|srcB' AS sources,
           'va' AS note
    FROM customer
    """,
    doc="Normalization edge merge (SURVEY §2.2 P8 + §2.4 A4, "
    "plover.py:1092-1111): duplicate edges (one via an alias subject) "
    "collapse onto the re-keyed id after the preferred-id rewrite; array "
    "props union, scalar props take the deterministic minimum.",
)
def a4_normalize_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")

    def variant(subj_prefix: str, src: str, note: str) -> DataFrame:
        return customer.select(
            F.concat(F.lit("e:"), F.col("c_custkey").cast("string"), F.lit(src)).alias("id"),
            F.concat(F.lit(subj_prefix), F.col("c_custkey").cast("string")).alias("subject"),
            F.concat(F.lit("N:"), F.col("c_nationkey").cast("string")).alias("object"),
            F.lit("graft:located_in").alias("predicate"),
            F.lit("infores:graft").alias("primary_knowledge_source"),
            F.array(F.lit(src)).alias("sources"),
            F.lit(note).alias("note"),
        )

    edges = variant("CUSTX:", "srcA", "vb").unionByName(variant("C:", "srcB", "va"))
    synonyms = customer.select(
        F.concat(F.lit("CUSTX:"), F.col("c_custkey").cast("string")).alias("alias_id"),
        F.concat(F.lit("C:"), F.col("c_custkey").cast("string")).alias("preferred_id"),
    )
    merged = normalize_and_merge_edges(edges, synonyms)
    return merged.select(
        "id",
        "subject",
        "predicate",
        "object",
        F.array_join(F.sort_array("sources"), "|").alias("sources"),
        "note",
    )


@register(
    "p4_zip_roundtrip",
    oracle="""
    SELECT l_orderkey, l_partkey AS partkey,
           CAST(l_quantity AS DOUBLE) AS quantity
    FROM lineitem WHERE l_orderkey <= 200
    """,
    doc="Zipped properties (SURVEY §2.2 P4, plover.py:796-810): parallel "
    "arrays (linenumber-ordered partkeys/quantities per order) zip into "
    "one ARRAY<STRUCT> property via the ingest operator, then explode "
    "back to scalars — the round trip proves the nested layout.",
)
def p4_zip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 200)
    # ONE sorted struct list feeds both arrays — two independently-sorted
    # lists would misalign under duplicate sort keys
    arrs = (
        li.groupBy("l_orderkey")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("l_linenumber", "l_partkey", "l_quantity")
                )
            ).alias("__rows")
        )
        .select(
            "l_orderkey",
            F.transform(F.col("__rows"), lambda x: x["l_partkey"]).alias("parts"),
            F.transform(F.col("__rows"), lambda x: x["l_quantity"]).alias("qtys"),
        )
    )
    zipped = zip_properties(
        arrs, {"items": {"properties": ["parts", "qtys"], "leader": "parts"}}
    )
    return zipped.select("l_orderkey", F.explode("items").alias("it")).select(
        "l_orderkey",
        F.col("it.parts").alias("partkey"),
        F.col("it.qtys").cast("double").alias("quantity"),
    )


@register(
    "a2_test_triples",
    oracle="""
    WITH e AS (
      SELECT 'ecl:' || CAST(c_custkey AS VARCHAR) AS id,
             'C:' || CAST(c_custkey AS VARCHAR) AS subject,
             'graft:located_in' AS predicate,
             'N:' || CAST(c_nationkey AS VARCHAR) AS object,
             'graft:Customer' AS sc, 'graft:Nation' AS oc
      FROM customer
      UNION ALL
      SELECT 'esl:' || CAST(s_suppkey AS VARCHAR),
             'S:' || CAST(s_suppkey AS VARCHAR), 'graft:located_in',
             'N:' || CAST(s_nationkey AS VARCHAR),
             'graft:Supplier', 'graft:Nation'
      FROM supplier
      UNION ALL
      SELECT 'enr:' || CAST(n_nationkey AS VARCHAR),
             'N:' || CAST(n_nationkey AS VARCHAR), 'graft:part_of_region',
             'R:' || CAST(n_regionkey AS VARCHAR),
             'graft:Nation', 'graft:Region'
      FROM nation
      UNION ALL
      SELECT 'eop:' || CAST(o_orderkey AS VARCHAR),
             'O:' || CAST(o_orderkey AS VARCHAR), 'graft:placed_by',
             'C:' || CAST(o_custkey AS VARCHAR),
             'graft:Order', 'graft:Customer'
      FROM orders
      UNION ALL
      SELECT 'esc:' || CAST(c_custkey AS VARCHAR),
             'C:' || CAST(c_custkey AS VARCHAR), 'biolink:subclass_of',
             'N:' || CAST(c_nationkey AS VARCHAR),
             'graft:Customer', 'graft:Nation'
      FROM customer
      UNION ALL
      SELECT 'esn:' || CAST(n_nationkey AS VARCHAR),
             'N:' || CAST(n_nationkey AS VARCHAR), 'biolink:subclass_of',
             'R:' || CAST(n_regionkey AS VARCHAR),
             'graft:Nation', 'graft:Region'
      FROM nation
      UNION ALL
      SELECT 'ea:' || CAST(a.n_nationkey AS VARCHAR),
             'N:' || CAST(a.n_nationkey AS VARCHAR), 'graft:adjacent_to',
             'N:' || CAST(b.n_nationkey AS VARCHAR),
             'graft:Nation', 'graft:Nation'
      FROM nation a JOIN nation b ON b.n_nationkey = a.n_nationkey + 1
    )
    SELECT sc AS subject_category, predicate, oc AS object_category,
           MIN_BY(subject, id) AS subject_id,
           MIN_BY(object, id) AS object_id
    FROM e
    GROUP BY sc, predicate, oc
    """,
    doc="SRI test triples (SURVEY §2.4 A2, plover.py:1156-1163): one "
    "deterministic example edge per meta-triple via min_by on edge id "
    "(the reference keeps stream-order-first; min is the distributed "
    "equivalent).",
)
def a2_test_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = graft_engine(spark, sf_dir)
    return test_triples(eng.kg)


@register(
    "a3_meta_nodes",
    oracle="""
    SELECT category, prefixes FROM (VALUES
        ('graft:Customer', 'C'),
        ('graft:Nation',   'N'),
        ('graft:Order',    'O'),
        ('graft:Region',   'R'),
        ('graft:Supplier', 'S')
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
        .agg(F.array_join(F.sort_array(F.collect_set("prefix")), "|").alias("prefixes"))
    )
