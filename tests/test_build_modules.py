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
    from tests.test_trapi_engine import EDGE_SCHEMA, EDGES, NODES

    nodes = spark.createDataFrame(
        NODES,
        "id string, name string, all_categories array<string>, "
        "equivalent_curies array<string>, publications array<string>",
    )
    edges = spark.createDataFrame(EDGES, EDGE_SCHEMA)
    return build_knowledge_graph(nodes, edges, KgxConfig()).persist()


def test_build_normalize_remaps_and_merges(spark):
    """config.normalize=True (reference plover.py:958-964, 1092-1111):
    edge endpoints referencing alias curies are remapped to preferred ids
    at build time and duplicate subject--predicate--object--source edges
    merge into one re-keyed edge (array props unioned)."""
    from ploverdb_spark.build.ingest import build_knowledge_graph

    nodes = spark.createDataFrame(
        [
            ("CHEM:1", "chem one", ["biolink:SmallMolecule"], ["CHEM:alias1", "CHEM:1"], []),
            ("DIS:1", "disease one", ["biolink:Disease"], [], []),
        ],
        "id string, name string, all_categories array<string>, "
        "equivalent_curies array<string>, publications array<string>",
    )
    edges = spark.createDataFrame(
        [
            # same logical edge, once via the alias curie
            ("e1", "CHEM:1", "DIS:1", "biolink:treats", "infores:src1", ["PMID:1"]),
            ("e2", "CHEM:alias1", "DIS:1", "biolink:treats", "infores:src1", ["PMID:2"]),
        ],
        "id string, subject string, object string, predicate string, "
        "primary_knowledge_source string, publications array<string>",
    )
    kg = build_knowledge_graph(nodes, edges, KgxConfig(normalize=True))
    merged = kg.edges.collect()
    assert len(merged) == 1
    row = merged[0]
    assert row.subject == "CHEM:1" and row.object == "DIS:1"
    assert row.id == "CHEM:1--biolink:treats--DIS:1--infores:src1"
    assert sorted(row.publications) == ["PMID:1", "PMID:2"]

    # default (normalize=False): the alias endpoint violates referential
    # integrity — raises outside test mode, silently drops in test mode
    with pytest.raises(ValueError, match="nonexistent"):
        build_knowledge_graph(nodes, edges, KgxConfig())
    kg2 = build_knowledge_graph(nodes, edges, KgxConfig(is_test=True))
    ids = {r.id for r in kg2.edges.collect()}
    assert ids == {"e1"}


def test_subclass_fallback_from_remote_file(spark, tmp_path):
    """G1 remote fallback (reference plover.py:1536-1618): a KG with no
    subclass edges pulls them from the configured file — unknown-id edges
    drop, alias endpoints remap to preferred ids, and the
    subclass_sources allowlist filters by provenance."""
    from ploverdb_spark.build.ingest import build_knowledge_graph

    nodes = spark.createDataFrame(
        [
            ("DIS:parent", "parent", ["biolink:Disease"], ["ALIAS:parent", "DIS:parent"], []),
            ("DIS:child", "child", ["biolink:Disease"], [], []),
            ("CHEM:1", "chem", ["biolink:SmallMolecule"], [], []),
        ],
        "id string, name string, all_categories array<string>, "
        "equivalent_curies array<string>, publications array<string>",
    )
    edges = spark.createDataFrame(
        [("e1", "CHEM:1", "DIS:child", "biolink:treats", "infores:src1", [])],
        "id string, subject string, object string, predicate string, "
        "primary_knowledge_source string, publications array<string>",
    )
    sub_file = tmp_path / "subclass_edges.jsonl"
    sub_file.write_text(
        "\n".join(
            json.dumps(e)
            for e in [
                # alias object -> remapped to DIS:parent
                {"id": "s1", "subject": "DIS:child", "predicate": "biolink:subclass_of",
                 "object": "ALIAS:parent", "primary_knowledge_source": "infores:ontology"},
                # unknown subject -> dropped
                {"id": "s2", "subject": "UNKNOWN:x", "predicate": "biolink:subclass_of",
                 "object": "DIS:parent", "primary_knowledge_source": "infores:ontology"},
                # wrong source -> dropped by subclass_sources allowlist
                {"id": "s3", "subject": "CHEM:1", "predicate": "biolink:subclass_of",
                 "object": "DIS:parent", "primary_knowledge_source": "infores:other"},
                # non-subclass predicate -> ignored
                {"id": "s4", "subject": "DIS:child", "predicate": "biolink:treats",
                 "object": "DIS:parent", "primary_knowledge_source": "infores:ontology"},
            ]
        )
    )
    cfg = KgxConfig(
        subclass_edges_url=str(sub_file),
        subclass_sources=["infores:ontology"],
    )
    kg = build_knowledge_graph(nodes, edges, cfg)
    pairs = {(r.ancestor, r.descendant) for r in kg.subclass_closure.collect()}
    assert pairs == {("DIS:parent", "DIS:child")}

    # in-graph subclass edges win: same config, but the KG now carries its
    # own subclass edge -> the fallback file is not consulted
    edges2 = edges.unionByName(
        spark.createDataFrame(
            [("e_sub", "DIS:child", "DIS:parent", "biolink:subclass_of",
              "infores:ontology", [])],
            edges.schema,
        )
    )
    kg2 = build_knowledge_graph(nodes, edges2, cfg)
    pairs2 = {(r.ancestor, r.descendant) for r in kg2.subclass_closure.collect()}
    assert pairs2 == {("DIS:parent", "DIS:child")}


def test_build_with_biolink_model_path(spark, tmp_path):
    """config.biolink_model_path loads the full YAML model into the build
    (reference BiolinkHelper(biolink_version) semantics) instead of the
    curated offline subset."""
    from ploverdb_spark.build.ingest import build_knowledge_graph
    from ploverdb_spark.ontology.biolink_lite import default_model
    from tests.test_biolink_yaml import MODEL_SLICE

    p = tmp_path / "biolink-model.yaml"
    p.write_text(MODEL_SLICE)
    nodes = spark.createDataFrame(
        [("CHEM:1", "chem", ["biolink:SmallMolecule"]), ("DIS:1", "dis", ["biolink:Disease"])],
        "id string, name string, all_categories array<string>",
    )
    edges = spark.createDataFrame(
        [("e1", "CHEM:1", "DIS:1", "biolink:treats", "infores:s", [])],
        "id string, subject string, object string, predicate string, "
        "primary_knowledge_source string, publications array<string>",
    )
    kg = build_knowledge_graph(
        nodes, edges, KgxConfig(biolink_model_path=str(p))
    )
    assert kg.model is not default_model()
    assert kg.model.canonical_form("biolink:treated_by") == "biolink:treats"
    # qualifier enums came from the YAML slice, not the curated fallback
    # (the slice has no 'expression' aspect value; the curated table does)
    assert "increased" in kg.model.qualifier_value_parents
    assert "expression" not in kg.model.qualifier_value_parents


def test_normalize_dedupes_supporting_studies_by_nctid(spark):
    """Reference plover.py:1097-1100: under normalize, each edge's
    supporting_studies dedupe by nctid — first-occurrence key order, last
    struct per key (Python-dict semantics)."""
    from ploverdb_spark.build.ingest import normalize_and_merge_edges

    edges = spark.createDataFrame(
        [
            (
                "e1",
                "A:1",
                "B:1",
                "biolink:treats",
                "infores:s",
                [
                    {"nctid": "NCT1", "phase": "phase_1"},
                    {"nctid": "NCT2", "phase": "phase_2"},
                    {"nctid": "NCT1", "phase": "phase_3"},  # last NCT1 wins
                ],
            )
        ],
        "id string, subject string, object string, predicate string, "
        "primary_knowledge_source string, "
        "supporting_studies array<struct<nctid:string, phase:string>>",
    )
    syn = spark.createDataFrame([], "alias_id string, preferred_id string")
    out = normalize_and_merge_edges(edges, syn).collect()
    assert len(out) == 1
    studies = [s.asDict() for s in out[0].supporting_studies]
    assert studies == [
        {"nctid": "NCT1", "phase": "phase_3"},
        {"nctid": "NCT2", "phase": "phase_2"},
    ]


def test_resolve_synonyms_fake_resolver_batches_and_retries(spark, tmp_path):
    """Normalizer seam (reference plover.py:883-905): injected resolver is
    called in <=batch_size chunks inside executors, transient failures
    retry, and the output is the (alias -> preferred) map."""
    from ploverdb_spark.sources.normalizer import resolve_synonyms

    marker = tmp_path / "failed_once"

    def fake(curies):
        assert len(curies) <= 2, f"batch too large: {len(curies)}"
        if not marker.exists():  # one transient failure, then healthy
            marker.write_text("x")
            raise RuntimeError("transient")
        return {
            c: ([c.replace("ALIAS", "PREF"), c] if c.startswith("ALIAS") else [c])
            for c in curies
        }

    nodes = spark.createDataFrame(
        [("ALIAS:1",), ("ALIAS:2",), ("ALIAS:3",), ("X:1",), ("X:2",)],
        "id string",
    )
    syn = resolve_synonyms(
        nodes, fake, batch_size=2, max_retries=3, backoff_sec=0.01
    )
    rows = {(r.alias_id, r.preferred_id) for r in syn.collect()}
    assert rows == {
        ("ALIAS:1", "PREF:1"),
        ("ALIAS:2", "PREF:2"),
        ("ALIAS:3", "PREF:3"),
    }


def test_build_uses_resolver_when_no_equiv_arrays(spark):
    """convert_input_ids with no in-graph equivalent-id arrays routes
    through the injected resolver; the resulting synonyms serve J4 alias
    canonicalization."""
    from ploverdb_spark.build.ingest import build_knowledge_graph
    from ploverdb_spark.query.compiler import TrapiEngine

    def fake(curies):
        return {c: [c, f"OLD:{c.split(':')[1]}"] for c in curies}

    nodes = spark.createDataFrame(
        [
            ("CHEM:1", "chem", ["biolink:SmallMolecule"]),
            ("DIS:1", "dis", ["biolink:Disease"]),
        ],
        "id string, name string, all_categories array<string>",
    )
    edges = spark.createDataFrame(
        [("e1", "CHEM:1", "DIS:1", "biolink:treats", "infores:s", [])],
        "id string, subject string, object string, predicate string, "
        "primary_knowledge_source string, publications array<string>",
    )
    kg = build_knowledge_graph(nodes, edges, KgxConfig(), resolver=fake)
    syn = {(r.alias_id, r.preferred_id) for r in kg.id_synonyms.collect()}
    assert ("OLD:1", "CHEM:1") in syn
    eng = TrapiEngine(kg, kp_infores_curie="infores:test")
    assert eng.canonicalize_ids(["OLD:1"]) == {"OLD:1": "CHEM:1"}

    # over-guard fallback (synonym table too big for a driver map): a
    # pushed-down filter + collect, NEVER a per-request full-table join —
    # same mapping, ids missing from the table fall back to themselves
    eng_big = TrapiEngine(
        kg, kp_infores_curie="infores:test", driver_map_max_rows=0
    )
    assert eng_big.canonicalize_ids(["OLD:1", "NOPE:9"]) == {
        "OLD:1": "CHEM:1",
        "NOPE:9": "NOPE:9",
    }
    # and the >MAX_ISIN_PUSHDOWN shape (left-semi broadcast) agrees
    from ploverdb_spark.query import compiler as qc

    orig = qc.MAX_ISIN_PUSHDOWN
    qc.MAX_ISIN_PUSHDOWN = 1
    try:
        assert eng_big.canonicalize_ids(["OLD:1", "NOPE:9"]) == {
            "OLD:1": "CHEM:1",
            "NOPE:9": "NOPE:9",
        }
    finally:
        qc.MAX_ISIN_PUSHDOWN = orig


# -- meta KG (A1-A3) --------------------------------------------------------


def test_meta_edges(fixture_engine):
    rows = {
        (r.subject_category, r.predicate, r.object_category): r
        for r in meta_edges(fixture_engine).collect()
    }
    treats = rows[("biolink:SmallMolecule", "biolink:treats", "biolink:Disease")]
    assert treats.n_edges == 3  # e1, e2, e8
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


@pytest.mark.shard2
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

        # a batch carrying a subclass edge incrementally maintains the
        # closure artifact (extend_closure, no full rebuild)
        (drop / "batch3.jsonl").write_text(
            json.dumps(
                {"id": "e3", "subject": "A:1", "object": "A:2",
                 "predicate": "biolink:subclass_of"}
            )
            + "\n"
        )
        q.processAllAvailable()
        closure = spark.read.parquet(f"{out}/subclass_closure.parquet")
        pairs = {(r.ancestor, r.descendant) for r in closure.collect()}
        assert pairs == {("A:2", "A:1")}
        # the UNPRUNED depth-tracked closure is maintained alongside the
        # served (pruned) artifact, and the swap leaves no temp dirs
        full = spark.read.parquet(f"{out}/subclass_closure_full.parquet")
        assert {(r.ancestor, r.descendant, r.depth) for r in full.collect()} == {
            ("A:2", "A:1", 1)
        }
        assert not (out / "subclass_closure.parquet.tmp").exists()
        assert not (out / "subclass_closure.parquet.old").exists()

        # dedup state lives in the ids-only sidecar, not the artifact:
        # one row per distinct edge id, hash-partitioned by bucket
        seen = spark.read.parquet(f"{out}/edge_ids_seen.parquet")
        assert {r.id for r in seen.collect()} == {"e1", "e2", "e3"}
        assert "id_bucket" in seen.columns
    finally:
        q.stop()


@pytest.mark.shard2
def test_seen_ids_sidecar_partition_pruning(spark, tmp_path):
    """The per-batch dedup scan must be partition-pruned to the batch's
    hash buckets — O(batch neighborhood), never a full scan of the
    accumulated id set (VERDICT r2 'What's wrong' #1)."""
    from ploverdb_spark.streaming.incremental import (
        N_ID_BUCKETS,
        _with_bucket,
        seen_ids_reader,
    )

    import re

    from ploverdb_spark.plans.checks import formatted_plan

    path = str(tmp_path / "seen")
    ids = spark.range(5000).select(
        F.concat(F.lit("E:"), F.col("id")).alias("id")
    )
    _with_bucket(ids).write.partitionBy("id_bucket").parquet(path)
    buckets = [0, 1, 2]
    pruned = seen_ids_reader(spark, path, buckets)
    # the bucket restriction must land in the scan's PartitionFilters
    # (directory-level pruning), NOT as a post-scan data filter
    plan = formatted_plan(pruned)
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "id_bucket" in m.group(1), plan
    # and the executed scan actually reads only the requested partitions
    pruned.collect()
    scan_node = pruned._jdf.queryExecution().executedPlan().collectLeaves().head()
    metrics = scan_node.metrics()
    n_parts = metrics.apply("numPartitions").value()
    assert n_parts == len(buckets), f"scan read {n_parts} partitions"
    # and the pruned view still answers membership for its buckets
    got = {r.id for r in pruned.collect()}
    expected = {
        r.id
        for r in _with_bucket(ids)
        .where(F.col("id_bucket").isin(buckets))
        .collect()
    }
    assert got == expected
    assert 0 < len(got) < 5000  # genuinely a subset of the sidecar


def test_swappable_artifact_recovers_from_partial_swap(spark, tmp_path):
    """Crash-safety of the closure artifact swap: whichever rename the
    process died between, _read_swappable finds a complete copy."""
    from ploverdb_spark.streaming.incremental import (
        _atomic_swap_in,
        _read_swappable,
    )

    final = str(tmp_path / "art.parquet")
    df1 = spark.createDataFrame([("a", 1)], "k string, v int")
    df1.write.parquet(final + ".tmp")
    _atomic_swap_in(spark, final + ".tmp", final)
    assert [(r.k, r.v) for r in _read_swappable(spark, final).collect()] == [
        ("a", 1)
    ]
    # simulate dying right after final -> .old (final missing, old intact)
    import shutil

    shutil.move(final, final + ".old")
    recovered = _read_swappable(spark, final)
    assert [(r.k, r.v) for r in recovered.collect()] == [("a", 1)]
    # simulate dying after writing tmp but before any rename
    spark.createDataFrame([("b", 2)], "k string, v int").write.parquet(
        final + ".tmp"
    )
    shutil.rmtree(final)
    recovered = _read_swappable(spark, final)
    assert [(r.k, r.v) for r in recovered.collect()] == [("b", 2)]
    assert _read_swappable(spark, str(tmp_path / "missing.parquet")) is None


def test_swappable_ignores_truncated_tmp(spark, tmp_path):
    """A tmp dir without _SUCCESS (crash mid-first-write) must NOT be
    promoted — a truncated parquet dir served as the full closure is
    silently incomplete reasoning state (ADVICE r3)."""
    import os
    import shutil

    from ploverdb_spark.streaming.incremental import _read_swappable

    final = str(tmp_path / "clo.parquet")
    # truncated first write: parquet part files but no _SUCCESS marker
    spark.createDataFrame([("x", 9)], "k string, v int").write.parquet(
        final + ".tmp"
    )
    os.remove(final + ".tmp/_SUCCESS")
    assert _read_swappable(spark, final) is None  # not promoted
    assert not os.path.exists(final + ".tmp")  # partial dir cleaned up
    # with an .old alongside a truncated tmp, the pre-swap copy wins
    spark.createDataFrame([("ok", 1)], "k string, v int").write.parquet(
        final + ".old"
    )
    spark.createDataFrame([("x", 9)], "k string, v int").write.parquet(
        final + ".tmp"
    )
    os.remove(final + ".tmp/_SUCCESS")
    got = _read_swappable(spark, final)
    assert [(r.k, r.v) for r in got.collect()] == [("ok", 1)]
    shutil.rmtree(str(tmp_path / "clo.parquet"), ignore_errors=True)


@pytest.mark.shard2
def test_stream_replay_does_not_duplicate(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed batch whose artifact rows
    landed but whose sidecar append was lost (crash between the two
    writes) must not re-append rows (ADVICE r3 medium)."""
    import shutil

    from ploverdb_spark.streaming.incremental import (
        _with_bucket,
        stream_edge_deltas,
    )

    nodes = spark.createDataFrame(
        [("A:1", ["biolink:Gene"]), ("A:2", ["biolink:Disease"])],
        "id string, categories array<string>",
    )
    drop = tmp_path / "drop"
    drop.mkdir()
    out = tmp_path / "out"
    schema = spark.createDataFrame(
        [], "id string, subject string, object string, predicate string"
    ).schema
    edge = {
        "id": "e1",
        "subject": "A:1",
        "object": "A:2",
        "predicate": "biolink:treats",
    }
    (drop / "b1.jsonl").write_text(json.dumps(edge) + "\n")
    q = stream_edge_deltas(
        spark, str(drop), schema, str(out), nodes,
        checkpoint_dir=str(tmp_path / "ck1"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    artifact = f"{out}/edges_bidir.parquet"
    assert spark.read.parquet(artifact).count() == 2

    # simulate the crash: e1's rows are in the artifact but its sidecar
    # append was lost (sidecar exists — only the batch's ids are missing)
    shutil.rmtree(f"{out}/edge_ids_seen.parquet")
    _with_bucket(
        spark.createDataFrame([("stub:0",)], "id string")
    ).write.partitionBy("id_bucket").parquet(f"{out}/edge_ids_seen.parquet")

    # replay surrogate: the same edge arrives again (fresh checkpoint =
    # redelivery of the uncommitted epoch)
    (drop / "b2.jsonl").write_text(json.dumps(edge) + "\n")
    q2 = stream_edge_deltas(
        spark, str(drop), schema, str(out), nodes,
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    after = spark.read.parquet(artifact)
    assert after.where(F.col("id") == "e1").count() == 2  # still one edge
    # and the sidecar now records the replayed id
    seen = spark.read.parquet(f"{out}/edge_ids_seen.parquet")
    assert "e1" in {r.id for r in seen.collect()}


def test_fold_session_out_of_order():
    """An out-of-order event folding into the open session must not move
    the session end backwards (ADVICE r2): otherwise the next in-order
    event looks like a > gap jump and falsely splits the session."""
    from ploverdb_spark.streaming.incremental import fold_session_events

    # open session (100..130); late event 90 arrives, then 180 (within
    # gap of 130).  Buggy fold: end=90 -> 180-90 > 60 -> false split.
    closed, open_state = fold_session_events((100, 130, 2), [90, 180], 60)
    assert closed == []
    assert open_state == (90, 180, 4)
    # genuine gap still closes: 300 - 180 > 60
    closed, open_state = fold_session_events(open_state, [300], 60)
    assert closed == [(90, 180, 4)]
    assert open_state == (300, 300, 1)
    # empty batch (timeout-only trigger) is a no-op
    assert fold_session_events(None, [], 60) == ([], None)


def test_extend_closure_depth_cap(spark):
    """Reference parity (plover.py:1652): incrementally-added pairs past
    the depth cap are excluded, exactly like a from-scratch rebuild."""
    from ploverdb_spark.build.closure import extend_closure, transitive_closure

    chain = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "parent string, child string"
    )
    base = transitive_closure(chain, max_depth=2, prune_prefix=None)
    new = spark.createDataFrame([("d", "e")], "parent string, child string")
    got = {
        (r.ancestor, r.descendant, r.depth)
        for r in extend_closure(base, new, max_depth=2).collect()
    }
    expected = {
        (r.ancestor, r.descendant, r.depth)
        for r in transitive_closure(
            spark.createDataFrame(
                [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
                "parent string, child string",
            ),
            max_depth=2,
            prune_prefix=None,
        ).collect()
    }
    assert got == expected
    assert ("c", "e", 2) in got and not any(p[1] == "e" and p[0] in ("a", "b") for p in got)


def test_extend_closure_shortcut_revives_capped_pairs(spark):
    """A new shortcut edge can pull a previously over-depth pair under
    the cap — depth improvements must re-enter the delta."""
    from ploverdb_spark.build.closure import extend_closure, transitive_closure

    chain = spark.createDataFrame(
        [("x1", "x2"), ("x2", "x3"), ("x3", "x4")], "parent string, child string"
    )
    base = transitive_closure(chain, max_depth=3, prune_prefix=None)
    # x4->x5 makes (x1,x5) distance 4 > cap: excluded
    step1 = extend_closure(
        base,
        spark.createDataFrame([("x4", "x5")], "parent string, child string"),
        max_depth=3,
    )
    pairs1 = {(r.ancestor, r.descendant) for r in step1.collect()}
    assert ("x1", "x5") not in pairs1 and ("x2", "x5") in pairs1
    # shortcut x1->x3 drops dist(x1,x5) to 3: the pair must now appear
    step2 = extend_closure(
        step1,
        spark.createDataFrame([("x1", "x3")], "parent string, child string"),
        max_depth=3,
    )
    got = {(r.ancestor, r.descendant, r.depth) for r in step2.collect()}
    assert ("x1", "x5", 3) in got and ("x1", "x4", 2) in got
    expected = {
        (r.ancestor, r.descendant, r.depth)
        for r in transitive_closure(
            spark.createDataFrame(
                [("x1", "x2"), ("x2", "x3"), ("x3", "x4"), ("x4", "x5"),
                 ("x1", "x3")],
                "parent string, child string",
            ),
            max_depth=3,
            prune_prefix=None,
        ).collect()
    }
    assert got == expected


def test_apply_closure_prunes_parity(spark):
    """The shared prune helper drops prefix-matched ancestors first, then
    mega-fanout ancestors counted on the prefix-pruned set — the same
    filters transitive_closure applies (plover.py:1655-1661)."""
    from ploverdb_spark.build.closure import apply_closure_prunes

    closure = spark.createDataFrame(
        [
            ("biolink:Thing", "a", 1),
            ("P", "a", 1),
            ("P", "b", 1),
            ("P", "c", 2),
            ("Q", "a", 1),
        ],
        "ancestor string, descendant string, depth int",
    )
    got = {
        (r.ancestor, r.descendant)
        for r in apply_closure_prunes(
            closure, max_descendants=2, prune_prefix="biolink:"
        ).collect()
    }
    assert got == {("Q", "a")}  # biolink: pruned; P has 3 descendants > 2


@pytest.mark.shard2
def test_stream_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: a within-batch gap closes a
    session immediately (append-mode emission); the open session stays in
    bounded per-user state."""
    from ploverdb_spark.streaming.incremental import stream_sessionize

    drop = tmp_path / "events"
    drop.mkdir()
    rows = [
        # user 1: two sessions split by a > 60s gap, second still open
        {"user_id": 1, "ts_sec": 100},
        {"user_id": 1, "ts_sec": 130},
        {"user_id": 1, "ts_sec": 135},
        {"user_id": 1, "ts_sec": 300},
        # user 2: one (still open) session
        {"user_id": 2, "ts_sec": 110},
    ]
    (drop / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    schema = spark.createDataFrame([], "user_id long, ts_sec long").schema
    stream = spark.readStream.schema(schema).json(str(drop))
    out = stream_sessionize(stream, gap_sec=60)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )

    def rows_when(n_expected: int, deadline_sec: int = 90):
        # ProcessingTimeTimeout keeps scheduling state-cleanup batches, so
        # processAllAvailable never settles — poll the sink instead.
        import time

        deadline = time.time() + deadline_sec
        while time.time() < deadline:
            got = {
                (r.user_id, r.session_start, r.session_end, r.n_events)
                for r in spark.sql("SELECT * FROM sess_test").collect()
            }
            if len(got) >= n_expected:
                return got
            time.sleep(1)
        return got

    try:
        # only user 1's first session closes (gap 135 -> 300 > 60s)
        assert rows_when(1) == {(1, 100, 135, 3)}

        # a second batch for user 1 extends the OPEN session (ts 320,
        # within 60s of 300) and a far event closes it
        (drop / "b2.jsonl").write_text(
            json.dumps({"user_id": 1, "ts_sec": 320})
            + "\n"
            + json.dumps({"user_id": 1, "ts_sec": 1000})
        )
        assert rows_when(2) == {(1, 100, 135, 3), (1, 300, 320, 2)}
    finally:
        q.stop()


def test_extend_closure_interleaved_paths(spark):
    """Incremental closure: a path alternating new-base-new edges
    (p->c new, c->x base, x->y new) must surface (p, y) — the case a
    single-expansion delta formula misses."""
    from ploverdb_spark.build.closure import extend_closure, transitive_closure

    base_edges = spark.createDataFrame([("c", "x")], "parent string, child string")
    base = transitive_closure(base_edges, prune_prefix=None)
    new = spark.createDataFrame(
        [("p", "c"), ("x", "y")], "parent string, child string"
    )
    got = {(r.ancestor, r.descendant) for r in extend_closure(base, new).collect()}
    assert got == {
        ("c", "x"),
        ("p", "c"),
        ("x", "y"),
        ("p", "x"),
        ("c", "y"),
        ("p", "y"),
    }


def test_stream_document_deltas_exact_dedup(spark, tmp_path):
    """Streaming corpus ingest: within-batch and cross-batch exact dedup
    by content hash, smallest doc_id wins, O(batch) sidecar reads."""
    from ploverdb_spark.streaming.incremental import stream_document_deltas

    drop = tmp_path / "drop"
    drop.mkdir()
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    schema = spark.createDataFrame([], "doc_id long, text string").schema
    (drop / "b1.jsonl").write_text(
        json.dumps({"doc_id": 5, "text": "hello world"}) + "\n"
        + json.dumps({"doc_id": 2, "text": "hello world"}) + "\n"
        + json.dumps({"doc_id": 9, "text": "fresh prose"}) + "\n"
    )
    q = stream_document_deltas(
        spark, str(drop), schema, str(out), checkpoint_dir=str(ckpt)
    )
    try:
        q.processAllAvailable()
        corpus = spark.read.parquet(f"{out}/corpus.parquet")
        got = {(r.doc_id, r.text) for r in corpus.collect()}
        # within-batch: smallest id per content hash
        assert got == {(2, "hello world"), (9, "fresh prose")}
        # second batch: one cross-batch duplicate, one new doc
        (drop / "b2.jsonl").write_text(
            json.dumps({"doc_id": 1, "text": "hello world"}) + "\n"
            + json.dumps({"doc_id": 3, "text": "novel text"}) + "\n"
        )
        q.processAllAvailable()
        after = {(r.doc_id, r.text)
                 for r in spark.read.parquet(f"{out}/corpus.parquet").collect()}
        assert after == {(2, "hello world"), (9, "fresh prose"), (3, "novel text")}
        # the sidecar is hash-bucket partitioned (scale contract)
        import os
        assert any(
            d.startswith("hash_bucket=")
            for d in os.listdir(f"{out}/doc_hashes_seen.parquet")
        )
    finally:
        q.stop()


def test_stream_document_deltas_replay_idempotent(spark, tmp_path):
    """A replayed batch whose sidecar append was lost must not re-append
    corpus rows (the artifact self-check)."""
    from ploverdb_spark.streaming import incremental as inc

    drop = tmp_path / "drop"
    drop.mkdir()
    out = tmp_path / "out"
    schema = spark.createDataFrame([], "doc_id long, text string").schema
    (drop / "b1.jsonl").write_text(
        json.dumps({"doc_id": 1, "text": "alpha"}) + "\n"
    )
    # first delivery: full batch runs, then simulate losing the sidecar
    q = inc.stream_document_deltas(
        spark, str(drop), schema, str(out), checkpoint_dir=str(tmp_path / "c1")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    import shutil
    shutil.rmtree(f"{out}/doc_hashes_seen.parquet")
    # redelivery (fresh checkpoint replays the same file)
    q2 = inc.stream_document_deltas(
        spark, str(drop), schema, str(out), checkpoint_dir=str(tmp_path / "c2")
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    corpus = spark.read.parquet(f"{out}/corpus.parquet")
    assert corpus.count() == 1  # not duplicated despite lost sidecar


def test_stream_survives_first_append_crash_debris(spark, tmp_path):
    """A crash during the FIRST artifact append leaves a dir holding only
    the committer's _temporary scratch; the next batch must treat it as
    absent (read would throw), not poison the stream forever."""
    from ploverdb_spark.streaming.incremental import stream_document_deltas

    drop = tmp_path / "drop"
    drop.mkdir()
    out = tmp_path / "out"
    # simulate the debris BEFORE any batch runs
    debris = out / "corpus.parquet" / "_temporary" / "0"
    debris.mkdir(parents=True)
    (debris / "task_000").write_text("scratch")
    schema = spark.createDataFrame([], "doc_id long, text string").schema
    (drop / "b1.jsonl").write_text(
        json.dumps({"doc_id": 1, "text": "alpha"}) + "\n"
    )
    q = stream_document_deltas(
        spark, str(drop), schema, str(out), checkpoint_dir=str(tmp_path / "c")
    )
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()
    got = spark.read.parquet(f"{out}/corpus.parquet").where(
        "doc_id is not null"
    )
    assert got.count() == 1


def test_stream_edge_replay_restores_missing_direction_row(spark, tmp_path):
    """Partial job commit: the forward row of an edge landed, the reverse
    row did not.  Replay must append the MISSING direction row (anti-join
    keys on (id, direction), not id alone)."""
    from ploverdb_spark.streaming import incremental as inc

    nodes = spark.createDataFrame(
        [("A:1", ["biolink:Gene"]), ("A:2", ["biolink:Disease"])],
        "id string, categories array<string>",
    )
    drop = tmp_path / "drop"
    drop.mkdir()
    out = tmp_path / "out"
    schema = spark.createDataFrame(
        [], "id string, subject string, object string, predicate string"
    ).schema
    (drop / "b1.jsonl").write_text(
        json.dumps({"id": "e1", "subject": "A:1", "object": "A:2",
                    "predicate": "biolink:treats"}) + "\n"
    )
    q = inc.stream_edge_deltas(
        spark, str(drop), schema, str(out), nodes,
        checkpoint_dir=str(tmp_path / "c1"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    art = f"{out}/edges_bidir.parquet"
    full = spark.read.parquet(art)
    assert full.count() == 2
    # simulate the partial commit: rewrite with only ONE direction row,
    # and lose the sidecar append too
    one_dir = full.orderBy("direction").limit(1).collect()
    kept_direction = one_dir[0]["direction"]
    spark.createDataFrame(one_dir, full.schema).write.partitionBy(
        "id_bucket"
    ).mode("overwrite").parquet(f"{art}.tmp2")
    import shutil
    shutil.rmtree(art)
    shutil.move(f"{art}.tmp2", art)
    shutil.rmtree(f"{out}/edge_ids_seen.parquet")
    # redeliver the same file (fresh checkpoint)
    q2 = inc.stream_edge_deltas(
        spark, str(drop), schema, str(out), nodes,
        checkpoint_dir=str(tmp_path / "c2"),
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    after = spark.read.parquet(art)
    dirs = sorted(r["direction"] for r in after.select("direction").collect())
    assert len(dirs) == 2 and dirs[0] != dirs[1], (kept_direction, dirs)


@pytest.mark.shard2
def test_flag_contaminated_docs_stream_batch_parity(spark, tmp_path):
    """The Arrow-bitmap Bloom probe (flag_contaminated_docs) must flag
    exactly what the relational semi-join form (bloom_decontaminate)
    flags — same md5 hash family, same bits, FPs included — and being
    stateless it must produce identical counts on a file stream."""
    from ploverdb_spark.operators.dedup import (
        bloom_bitmap,
        bloom_decontaminate,
        flag_contaminated_docs,
        shingles_of,
    )
    from ploverdb_spark.operators.text import ws_tokens
    from tests.conftest import SF_ORACLE

    docs = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 200)
    )
    grams = docs.select(
        "doc_id",
        F.explode(
            shingles_of(ws_tokens(F.lower(F.col("text"))), k=3)
        ).alias("g"),
    )
    bench = grams.where(F.col("doc_id") % 7 == 0).select("g").distinct()
    corpus_docs = docs.where(F.col("doc_id") % 7 != 0)
    corpus_grams = grams.where(F.col("doc_id") % 7 != 0).dropDuplicates(
        ["doc_id", "g"]
    )

    relational = {
        r.doc_id: r.n_flagged_grams
        for r in bloom_decontaminate(corpus_grams, bench).collect()
    }
    # a NULL benchmark gram must set no bits (parity with the relational
    # build side, where a null never equi-joins) and must not crash
    bench_with_null = bench.unionByName(
        spark.createDataFrame([(None,)], "g string")
    )
    bitmap = bloom_bitmap(bench_with_null)
    assert bitmap.n_bits == 65536 and bitmap.n_hashes == 3
    assert (bitmap.packed == bloom_bitmap(bench).packed).all()
    flagged = flag_contaminated_docs(corpus_docs, bitmap)
    batch = {r.doc_id: r.n_flagged_grams for r in flagged.collect()}
    # the stateless form keeps zero-count docs; the aggregate form drops
    # them — equality on the positive support, zero elsewhere
    assert {d: n for d, n in batch.items() if n > 0} == relational
    assert set(batch) == {r.doc_id for r in corpus_docs.collect()}

    # NULL-text docs count 0 (shingles_of(null) yields null, and a null
    # gram must never probe as the string "None")
    null_doc = spark.createDataFrame(
        [(9999, None)], "doc_id long, text string"
    )
    got = flag_contaminated_docs(null_doc, bitmap).collect()
    assert [(r.doc_id, r.n_flagged_grams) for r in got] == [(9999, 0)]

    # identical counts when the same docs arrive as a file stream
    drop = tmp_path / "docs"
    drop.mkdir()
    rows = [
        {"doc_id": r.doc_id, "text": r.text} for r in corpus_docs.collect()
    ]
    (drop / "b1.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows), encoding="utf-8"
    )
    stream = spark.readStream.schema("doc_id long, text string").json(
        str(drop)
    )
    q = (
        flag_contaminated_docs(stream, bitmap)
        .select("doc_id", "n_flagged_grams")
        .writeStream.format("memory")
        .queryName("contam_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()  # stateless: settles once files drain
        streamed = {
            r.doc_id: r.n_flagged_grams
            for r in spark.sql("SELECT * FROM contam_test").collect()
        }
    finally:
        q.stop()
    assert streamed == batch
