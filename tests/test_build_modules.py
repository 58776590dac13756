"""Tests for build-time modules: meta KG, closure edge cases, KGX readers,
streaming incremental updates."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ploverdb_spark.build.closure import transitive_closure
from ploverdb_spark.build import meta_kg as MK
from ploverdb_spark.build.meta_kg import build_meta_kg, meta_edges, meta_nodes
from ploverdb_spark.sources.kgx import (
    KgxConfig,
    read_kgx_jsonl,
    read_kgx_tsv,
    zip_properties,
)


@pytest.fixture(scope="module")
def fixture_engine(spark):
    from ploverdb_spark.build.ingest import build_knowledge_graph
    from tests.test_trapi_engine import EDGES, NODES

    nodes = spark.createDataFrame(
        NODES,
        "id string, name string, all_categories array<string>, "
        "equivalent_curies array<string>, publications array<string>",
    )
    edges = spark.createDataFrame(
        EDGES,
        "id string, subject string, object string, predicate string, "
        "qualified_predicate string, object_direction_qualifier string, "
        "object_aspect_qualifier string, primary_knowledge_source string, "
        "knowledge_level string, agent_type string, publications array<string>",
    )
    return build_knowledge_graph(nodes, edges, KgxConfig()).persist()


# -- meta KG (A1-A3) --------------------------------------------------------


def test_meta_edges(fixture_engine):
    rows = {
        (r.subject_category, r.predicate, r.object_category): r
        for r in meta_edges(fixture_engine).collect()
    }
    treats = rows[("biolink:SmallMolecule", "biolink:treats", "biolink:Disease")]
    assert treats.n_edges == 2
    assert "knowledge_level" in treats.attribute_names
    affects = rows[("biolink:SmallMolecule", "biolink:affects", "biolink:Gene")]
    assert affects.qualified_predicate_values == ["biolink:causes"]


def test_test_triples_deterministic(fixture_engine):
    rows = {
        (r.subject_category, r.predicate, r.object_category): r
        for r in MK.test_triples(fixture_engine).collect()
    }
    ex = rows[("biolink:SmallMolecule", "biolink:treats", "biolink:Disease")]
    assert ex.subject_id == "CHEM:1"  # min edge id e1
    assert ex.object_id == "DIS:parent"


def test_meta_nodes_prefixes(fixture_engine):
    rows = {r.category: r.id_prefixes for r in meta_nodes(fixture_engine).collect()}
    assert rows["biolink:Disease"] == ["DIS", "MIXED"]
    assert rows["biolink:Gene"] == ["GENE"]


def test_build_meta_kg_payload(fixture_engine):
    payload = build_meta_kg(fixture_engine)
    assert set(payload.keys()) == {"nodes", "edges"}
    assert any(
        e["subject"] == "biolink:SmallMolecule" and e["qualifiers"]
        for e in payload["edges"]
    )


# -- closure edge cases (G2) ------------------------------------------------


def test_closure_cycle_safety(spark):
    pc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "parent string, child string"
    )
    rows = {
        (r.ancestor, r.descendant)
        for r in transitive_closure(pc, prune_prefix=None).collect()
    }
    # full cycle: everyone reaches everyone else, no self pairs, terminates
    assert rows == {
        (a, d) for a in "abc" for d in "abc" if a != d
    }


def test_closure_descendant_prune(spark):
    pc = spark.createDataFrame(
        [("root", f"c{i}") for i in range(10)], "parent string, child string"
    )
    out = transitive_closure(pc, max_descendants=5, prune_prefix=None)
    assert out.count() == 0  # root exceeds the cap -> pruned entirely


def test_closure_prefix_prune(spark):
    pc = spark.createDataFrame(
        [("biolink:x", "y"), ("p", "q")], "parent string, child string"
    )
    rows = {(r.ancestor, r.descendant) for r in transitive_closure(pc).collect()}
    assert rows == {("p", "q")}


# -- KGX readers (S2-S4, P4) ------------------------------------------------


def test_read_kgx_tsv(spark, tmp_path):
    p = tmp_path / "nodes.tsv"
    p.write_text(
        "id\tname\tall_categories\tscore\tflag\tempty\n"
        "A:1\talpha\tbiolink:Gene,biolink:Protein\t7\ttrue\tnone\n"
        "A:2\tbeta\tbiolink:Gene\t9\tfalse\t\n"
    )
    df = read_kgx_tsv(
        spark,
        str(p),
        KgxConfig(array_properties=["all_categories"]),
        required=("id",),
    )
    rows = {r.id: r for r in df.collect()}
    assert rows["A:1"].all_categories == ["biolink:Gene", "biolink:Protein"]
    assert rows["A:1"].score == 7 and isinstance(rows["A:1"].score, int)
    assert rows["A:1"].flag is True
    assert rows["A:1"].empty is None
    assert rows["A:2"].flag is False


def test_read_kgx_tsv_missing_required(spark, tmp_path):
    p = tmp_path / "bad.tsv"
    p.write_text("name\tscore\nx\t1\n")
    with pytest.raises(ValueError, match="missing required"):
        read_kgx_tsv(spark, str(p), required=("id",))


def test_read_kgx_jsonl_and_gz(spark, tmp_path):
    import gzip

    rows = [
        {"id": "B:1", "subject": "A:1", "object": "A:2", "predicate": "biolink:treats"},
        {"id": "B:2", "subject": "A:2", "object": "A:1", "predicate": "biolink:affects"},
    ]
    p = tmp_path / "edges.jsonl.gz"
    with gzip.open(p, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    df = read_kgx_jsonl(spark, str(p), required=("id", "subject", "object", "predicate"))
    assert df.count() == 2


def test_zip_properties(spark):
    df = spark.createDataFrame(
        [
            ("e1", ["NCT1", "NCT2"], [2.0, 3.0], [True, False]),
            ("e2", None, None, None),
        ],
        "id string, nctid array<string>, phase array<double>, tested array<boolean>",
    )
    out = zip_properties(
        df,
        {"supporting_studies": {"properties": ["nctid", "phase", "tested"], "leader": "nctid"}},
    )
    rows = {r.id: r for r in out.collect()}
    studies = rows["e1"].supporting_studies
    assert studies[0].nctid == "NCT1"
    assert studies[0].phase == "phase_2"  # trial-phase enum encoding
    assert studies[1].phase == "phase_3"
    assert "nctid" not in out.columns


# -- streaming incremental updates ------------------------------------------


def test_stream_edge_deltas(spark, tmp_path):
    from ploverdb_spark.streaming.incremental import stream_edge_deltas

    nodes = spark.createDataFrame(
        [("A:1", ["biolink:Gene"]), ("A:2", ["biolink:Disease"])],
        "id string, categories array<string>",
    )
    drop = tmp_path / "drop"
    drop.mkdir()
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    schema = (
        spark.createDataFrame(
            [], "id string, subject string, object string, predicate string"
        ).schema
    )
    (drop / "batch1.jsonl").write_text(
        json.dumps(
            {"id": "e1", "subject": "A:1", "object": "A:2", "predicate": "biolink:treats"}
        )
        + "\n"
    )
    q = stream_edge_deltas(
        spark, str(drop), schema, str(out), nodes, checkpoint_dir=str(ckpt)
    )
    try:
        q.processAllAvailable()
        first = spark.read.parquet(f"{out}/edges_bidir.parquet")
        assert first.count() == 2  # one edge -> fwd + rev rows
        # second file: one duplicate id (skipped) + one new edge
        (drop / "batch2.jsonl").write_text(
            json.dumps({"id": "e1", "subject": "A:1", "object": "A:2", "predicate": "biolink:treats"})
            + "\n"
            + json.dumps({"id": "e2", "subject": "A:2", "object": "A:1", "predicate": "biolink:affects"})
            + "\n"
        )
        q.processAllAvailable()
        after = spark.read.parquet(f"{out}/edges_bidir.parquet")
        assert after.where(F.col("id") == "e1").count() == 2  # not duplicated
        assert after.where(F.col("id") == "e2").count() == 2
    finally:
        q.stop()
