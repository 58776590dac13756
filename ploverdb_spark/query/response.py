"""TRAPI response assembly (O1-O3 + A6) and the query entry points.

Reference behavior reimplemented (NOT ported): plover.py:2121-2416.
The distributed part ends with two aggregations (result grouping and
knowledge-graph hydration); the final JSON envelope is assembled
driver-side from the collected, cutoff-bounded answer set — the same
boundary where the reference serializes via Flask.

Core vs attribute properties follow the reference's split
(plover.py:699-704): core node/edge properties become TRAPI structure;
everything else becomes an entry in ``attributes``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ploverdb_spark.build.ingest import DIR_FORWARD
from ploverdb_spark.functions.localdf import tiny_df
from ploverdb_spark.query.compiler import CompiledQEdge, TrapiEngine

CORE_NODE_PROPS = {"id", "name", "categories", "all_categories"}
CORE_EDGE_PROPS = {
    "id",
    "subject",
    "object",
    "predicate",
    "qualified_predicate",
    "object_direction_qualifier",
    "object_aspect_qualifier",
    "primary_knowledge_source",
}
INTERNAL_COLS = {
    "direction",
    "conglomerate_predicate",
    "neighbor_categories",
    "input_id",
    "output_id",
    "input_query_id",
    "output_query_id",
    "node_id",
    "neighbor_id",
}

QUALIFIER_PROPS = (
    "qualified_predicate",
    "object_direction_qualifier",
    "object_aspect_qualifier",
)


def _attribute_type_id(prop: str) -> str:
    return prop if ":" in prop else f"biolink:{prop}"


def _clean(value: Any) -> Any:
    """Drop structurally-empty values (reference ``_is_empty``,
    plover.py:305-314): None/''/[] are empty; 0/False are not."""
    if value is None:
        return None
    if isinstance(value, str) and value == "":
        return None
    if isinstance(value, (list, tuple)) and len(value) == 0:
        return None
    return value


def node_to_trapi(row: dict) -> dict:
    """O1 (plover.py:2188-2197, 2256-2269)."""
    out = {
        "name": row.get("name"),
        "categories": sorted(row.get("categories") or []),
        "attributes": [],
    }
    for prop, value in row.items():
        if prop in CORE_NODE_PROPS or prop in INTERNAL_COLS:
            continue
        value = _clean(value)
        if value is None:
            continue
        out["attributes"].append(
            {"attribute_type_id": _attribute_type_id(prop), "value": value}
        )
    return out


def edge_to_trapi(row: dict, kp_infores_curie: str) -> dict:
    """O2 (plover.py:2199-2254, 2271-2320): subject/object/predicate,
    sources chain, qualifiers, attributes (zipped props become nested
    attributes with sub-attributes)."""
    out: dict[str, Any] = {
        "subject": row["subject"],
        "object": row["object"],
        "predicate": row["predicate"],
        "attributes": [],
    }
    qualifiers = []
    for qp in QUALIFIER_PROPS:
        v = _clean(row.get(qp))
        if v is not None:
            qualifiers.append(
                {"qualifier_type_id": f"biolink:{qp}", "qualifier_value": v}
            )
    if qualifiers:
        out["qualifiers"] = qualifiers

    primary = row.get("primary_knowledge_source")
    sources = []
    if primary:
        entry = {
            "resource_id": primary,
            "resource_role": "primary_knowledge_source",
        }
        urls = _clean(row.get("source_record_urls"))
        if urls is not None:
            entry["source_record_urls"] = list(urls)
        sources.append(entry)
    sources.append(
        {
            "resource_id": kp_infores_curie,
            "resource_role": "aggregator_knowledge_source",
            "upstream_resource_ids": [primary] if primary else [],
        }
    )
    out["sources"] = sources

    for prop, value in row.items():
        if prop in CORE_EDGE_PROPS or prop in INTERNAL_COLS:
            continue
        if prop == "source_record_urls":
            continue  # attached to the source entry above
        value = _clean(value)
        if value is None:
            continue
        if isinstance(value, list) and value and isinstance(value[0], dict):
            # zipped property -> nested attributes with sub-attributes
            nested = []
            for struct in value:
                subs = [
                    {"attribute_type_id": _attribute_type_id(k), "value": _clean(v)}
                    for k, v in struct.items()
                    if _clean(v) is not None
                ]
                if subs:
                    nested.append(subs)
            out["attributes"].append(
                {
                    "attribute_type_id": _attribute_type_id(prop),
                    "value": [s[0]["value"] for s in nested if s],
                    "attributes": [s for sub in nested for s in sub],
                }
            )
        else:
            out["attributes"].append(
                {"attribute_type_id": _attribute_type_id(prop), "value": value}
            )
    return out


def _result_node_binding(node_id: str, query_id: str | None) -> dict:
    binding = {"id": node_id, "attributes": []}
    if query_id is not None and query_id != node_id:
        binding["query_id"] = query_id
    return binding


def assemble_results(
    answers: DataFrame, compiled: CompiledQEdge, qg: dict, kp_infores_curie: str
) -> list[dict]:
    """A6 + O3 (plover.py:2330-2406): group answer edges into results keyed
    by (input-or-*, output-or-*) depending on is_set; collect per-group
    edge/node sets distributed-side, assemble JSON driver-side."""
    qnodes = qg["nodes"]
    in_set = bool(qnodes[compiled.input_qnode_key].get("is_set"))
    out_set = bool(qnodes[compiled.output_qnode_key].get("is_set"))

    key_in = F.lit("*") if in_set else F.col("input_id")
    key_out = F.lit("*") if out_set else F.col("output_id")
    grouped = (
        answers.groupBy(
            key_in.alias("__kin"), key_out.alias("__kout")
        )
        .agg(
            F.collect_set("id").alias("edge_ids"),
            F.collect_set(F.struct("input_id", "input_query_id")).alias("inputs"),
            F.collect_set(F.struct("output_id", "output_query_id")).alias("outputs"),
        )
        .collect()
    )
    results = []
    for g in grouped:
        results.append(
            {
                "node_bindings": {
                    compiled.input_qnode_key: [
                        _result_node_binding(i.input_id, i.input_query_id)
                        for i in g.inputs
                    ],
                    compiled.output_qnode_key: [
                        _result_node_binding(o.output_id, o.output_query_id)
                        for o in g.outputs
                    ],
                },
                "analyses": [
                    {
                        "edge_bindings": {
                            compiled.qedge_key: [
                                {"id": e, "attributes": []} for e in g.edge_ids
                            ]
                        },
                        "resource_id": kp_infores_curie,
                    }
                ],
                "resource_id": kp_infores_curie,
            }
        )
    return results


def hydrate_knowledge_graph(
    engine: TrapiEngine, answers: DataFrame
) -> tuple[dict, dict]:
    """J9 (plover.py:2136-2173): answer ids -> full TRAPI nodes/edges."""
    # reconstruct subject/object from traversal direction
    edge_rows = (
        answers.withColumn(
            "subject",
            F.when(F.col("direction") == DIR_FORWARD, F.col("input_id")).otherwise(
                F.col("output_id")
            ),
        )
        .withColumn(
            "object",
            F.when(F.col("direction") == DIR_FORWARD, F.col("output_id")).otherwise(
                F.col("input_id")
            ),
        )
        .dropDuplicates(["id"])
        .collect()
    )
    edges = {
        str(r["id"]): edge_to_trapi(r.asDict(recursive=True), engine.kp_infores_curie)
        for r in edge_rows
    }
    node_ids = answers.select(
        F.col("input_id").alias("nid")
    ).unionByName(answers.select(F.col("output_id").alias("nid"))).distinct()
    node_rows = (
        engine.kg.nodes.join(
            F.broadcast(node_ids), engine.kg.nodes.id == node_ids.nid, "left_semi"
        )
        .collect()
    )
    nodes = {r["id"]: node_to_trapi(r.asDict(recursive=True)) for r in node_rows}
    return nodes, edges


def _log_entry(level: str, message: str) -> dict:
    """O4 (plover.py:2826-2843): TRAPI query-log entry."""
    from datetime import datetime, timezone

    return {
        "timestamp": datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
        "level": level,
        "message": message,
    }


def _slim_tuple_response(
    engine: TrapiEngine, compiled: CompiledQEdge, answers: DataFrame
) -> dict:
    """R6, include_metadata=True (plover.py:1878-1893, tuple format):
    nodes as (name, category, [query_ids]) tuples; edges as
    (subject, object, predicate, primary_source, qualifiers..., 'False')
    tuples — Pathfinder back-compat."""
    rows = answers.collect()
    in_nodes: dict[str, list] = {}
    out_nodes: dict[str, list] = {}
    edges: dict[str, list] = {}
    node_qids: dict[str, set] = {}
    for r in rows:
        d = r.asDict()
        subj = d["input_id"] if d["direction"] == DIR_FORWARD else d["output_id"]
        obj = d["output_id"] if d["direction"] == DIR_FORWARD else d["input_id"]
        edges[str(d["id"])] = [
            subj,
            obj,
            d["predicate"],
            d.get("primary_knowledge_source"),
            d.get("qualified_predicate") or "",
            d.get("object_direction_qualifier") or "",
            d.get("object_aspect_qualifier") or "",
            "False",
        ]
        for side, nid, qid in (
            ("in", d["input_id"], d.get("input_query_id")),
            ("out", d["output_id"], d.get("output_query_id")),
        ):
            if qid is not None and qid != nid:
                node_qids.setdefault(nid, set()).add(qid)
            (in_nodes if side == "in" else out_nodes).setdefault(nid, None)
    names = {
        r["id"]: (r["name"], (r["categories"] or [None])[0])
        for r in engine.kg.nodes.join(
            F.broadcast(
                tiny_df(
                    engine.spark,
                    [(n,) for n in {*in_nodes, *out_nodes}],
                    "nid string",
                )
            ),
            engine.kg.nodes.id == F.col("nid"),
            "left_semi",
        ).collect()
    }

    def node_tuple(nid: str) -> list:
        name, cat = names.get(nid, (None, None))
        return [name, cat, sorted(node_qids.get(nid, set()))]

    return {
        "nodes": {
            compiled.input_qnode_key: {n: node_tuple(n) for n in in_nodes},
            compiled.output_qnode_key: {n: node_tuple(n) for n in out_nodes},
        },
        "edges": {compiled.qedge_key: edges},
    }


def run_query(engine: TrapiEngine, query: dict) -> dict:
    """POST /query (plover.py:1788-1932 lifecycle): full TRAPI response,
    or the R6 legacy slim formats when the QG carries include_metadata."""
    logs = [_log_entry("INFO", "Received query")]
    qg = TrapiEngine.normalize_envelope(query)
    engine.validate(qg)
    if not qg.get("edges"):
        return _run_single_node_query(engine, qg)
    compiled, answers = engine.lookup(qg)  # returned persisted
    try:
        include_metadata = qg.get("include_metadata")
        if include_metadata:
            return _slim_tuple_response(engine, compiled, answers)
        if include_metadata is False:
            # ids-only format (plover.py:1894-1901)
            rows = answers.select("id", "input_id", "output_id").collect()
            return {
                "nodes": {
                    compiled.input_qnode_key: sorted({r.input_id for r in rows}),
                    compiled.output_qnode_key: sorted({r.output_id for r in rows}),
                },
                "edges": {compiled.qedge_key: sorted({str(r["id"]) for r in rows})},
            }
        nodes, edges = hydrate_knowledge_graph(engine, answers)
        results = assemble_results(answers, compiled, qg, engine.kp_infores_curie)
    finally:
        answers.unpersist()
    logs.append(
        _log_entry("INFO", f"Done with query, returning {len(results)} results")
    )
    return {
        "message": {
            "query_graph": qg,
            "knowledge_graph": {"nodes": nodes, "edges": edges},
            "results": results,
        },
        "logs": logs,
    }


def _run_single_node_query(engine: TrapiEngine, qg: dict) -> dict:
    qnode_key, found = engine.single_node_lookup(qg)
    rows = found.collect()
    hydrated = (
        engine.kg.nodes.join(
            F.broadcast(found.select(F.col("node_id").alias("nid"))),
            engine.kg.nodes.id == F.col("nid"),
            "left_semi",
        )
        .collect()
    )
    nodes = {r["id"]: node_to_trapi(r.asDict(recursive=True)) for r in hydrated}
    results = [
        {
            "node_bindings": {
                qnode_key: [
                    _result_node_binding(r.node_id, r.query_id) for r in rows
                ]
            },
            "analyses": [{"edge_bindings": {}, "attributes": []}],
            "resource_id": engine.kp_infores_curie,
        }
    ]
    return {
        "message": {
            "query_graph": qg,
            "knowledge_graph": {"nodes": nodes, "edges": {}},
            "results": results,
        }
    }


def get_edges(engine: TrapiEngine, pairs: list[list[str]]) -> dict:
    """POST /edges (J10, plover.py:1934-1980) — vectorized: one join for
    all pairs instead of the reference's per-pair loop.  No subclass
    reasoning, by design (plover.py:1936-1938)."""
    spark = engine.spark
    flat_ids = sorted({i for p in pairs for i in p})
    canon = engine.canonicalize_ids(flat_ids)
    pairs_df = tiny_df(
        spark,
        [(canon.get(a, a), canon.get(b, b), a, b) for a, b in pairs],
        "node_a string, node_b string, orig_a string, orig_b string",
    )
    e = engine.kg.edges
    fwd = e.join(
        F.broadcast(pairs_df),
        (e.subject == pairs_df.node_a) & (e.object == pairs_df.node_b),
    )
    rev = e.join(
        F.broadcast(pairs_df),
        (e.subject == pairs_df.node_b) & (e.object == pairs_df.node_a),
    )
    hits = fwd.unionByName(rev).select(
        "orig_a", "orig_b", *[c for c in e.columns]
    )
    rows = hits.collect()
    pairs_to_edge_ids: dict[str, list[str]] = {}
    kg_edges: dict[str, dict] = {}
    for r in rows:
        key = f"{r.orig_a}--{r.orig_b}"
        pairs_to_edge_ids.setdefault(key, []).append(str(r["id"]))
        d = r.asDict(recursive=True)
        d.pop("orig_a", None)
        d.pop("orig_b", None)
        kg_edges[str(r["id"])] = edge_to_trapi(d, engine.kp_infores_curie)
    for a, b in pairs:
        pairs_to_edge_ids.setdefault(f"{a}--{b}", [])
    node_ids = {e["subject"] for e in kg_edges.values()} | {
        e["object"] for e in kg_edges.values()
    }
    nodes = {}
    if node_ids:
        nid_df = tiny_df(spark, [(n,) for n in node_ids], "nid string")
        node_rows = engine.kg.nodes.join(
            F.broadcast(nid_df), engine.kg.nodes.id == F.col("nid"), "left_semi"
        ).collect()
        nodes = {r["id"]: node_to_trapi(r.asDict(recursive=True)) for r in node_rows}
    return {
        "pairs_to_edge_ids": pairs_to_edge_ids,
        "knowledge_graph": {"nodes": nodes, "edges": kg_edges},
    }


def get_neighbors(
    engine: TrapiEngine,
    node_ids: list[str],
    categories: list[str] | None = None,
    predicates: list[str] | None = None,
) -> dict[str, list[str]]:
    """POST /neighbors (J11, plover.py:1982-2009) — one join +
    collect_set replaces the reference's per-id loop.  Ids only, no
    subclass reasoning."""
    categories = categories or ["biolink:NamedThing"]
    predicates = predicates or ["biolink:related_to"]
    m = engine.model
    cat_exp = sorted(
        {d for c in m.replace_category_mixins(categories) for d in m.category_descendants(c)}
    )
    # same expansion + direction semantics as the one-hop path (the
    # reference routes /neighbors through _lookup_answers with the input
    # node as qedge subject)
    preds_raw = set(predicates)
    preds = preds_raw | set(m.replace_predicate_mixins(sorted(preds_raw)))
    pred_exp = {d for p in preds for d in m.predicate_descendants(p)}
    directed = sorted(
        p for p in pred_exp if not engine._consider_bidirectional(p, preds)
    )
    bidirectional = sorted(
        p for p in pred_exp if engine._consider_bidirectional(p, preds)
    )
    pred_filter = F.col("predicate").isin(bidirectional)
    if directed:
        pred_filter = pred_filter | (
            F.col("predicate").isin(directed)
            & (F.col("direction") == DIR_FORWARD)
        )

    canon = engine.canonicalize_ids(node_ids)
    ids_df = tiny_df(
        engine.spark,
        [(canon.get(i, i), i) for i in node_ids],
        "node_id string, orig_id string",
    )
    bidir = engine.kg.edges_bidir
    matched = (
        bidir.join(F.broadcast(ids_df), on="node_id")
        .where(pred_filter)
        .where(
            F.arrays_overlap(
                F.col("neighbor_categories"),
                F.lit(cat_exp).cast("array<string>"),
            )
        )
        .groupBy("orig_id")
        .agg(F.collect_set("neighbor_id").alias("neighbors"))
        .collect()
    )
    out = {r.orig_id: sorted(r.neighbors) for r in matched}
    for i in node_ids:
        out.setdefault(i, [])
    return out
