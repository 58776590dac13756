"""Biolink YAML loader parity tests.

The fixture below is a hand-written slice of the public biolink-model.yaml
(LinkML schema) covering every structural feature the loader distills:
is_a chains, mixin classes/slots, symmetric flags, inverse pairs with the
canonical_predicate annotation, and qualifier enums with is_a values.
Assertions check the loaded model answers the same hierarchy questions the
curated offline table answers (the reference's BiolinkHelper semantics —
biolink_helper.py:20-33)."""

from __future__ import annotations

import pytest

yaml = pytest.importorskip("yaml")

from ploverdb_spark.ontology.biolink_yaml import (
    load_biolink_model,
    model_from_biolink_dict,
)

MODEL_SLICE = """
classes:
  named thing:
    description: a databased entity or concept/class
  biological entity:
    is_a: named thing
  disease or phenotypic feature:
    is_a: biological entity
    mixins:
      - disease or phenotypic feature or behavior
  disease:
    is_a: disease or phenotypic feature
  phenotypic feature:
    is_a: disease or phenotypic feature
  chemical entity:
    is_a: named thing
    mixins:
      - chemical or drug or treatment
  molecular entity:
    is_a: chemical entity
  small molecule:
    is_a: molecular entity
  drug:
    is_a: chemical entity
  gene:
    is_a: biological entity
    mixins:
      - gene or gene product
  polypeptide:
    is_a: biological entity
  protein:
    is_a: polypeptide
    mixins:
      - gene or gene product
  gene or gene product:
    mixin: true
  chemical or drug or treatment:
    mixin: true
  disease or phenotypic feature or behavior:
    mixin: true

slots:
  related to:
    symmetric: true
  related to at instance level:
    is_a: related to
    symmetric: true
  interacts with:
    is_a: related to at instance level
    symmetric: true
  physically interacts with:
    is_a: interacts with
    symmetric: true
  affects:
    is_a: related to at instance level
    annotations:
      canonical_predicate: true
    inverse: affected by
  affected by:
    is_a: related to at instance level
  causes:
    is_a: affects
    annotations:
      canonical_predicate: true
    inverse: caused by
  caused by:
    is_a: affected by
  treats or applied or studied to treat:
    is_a: related to at instance level
    annotations:
      canonical_predicate: true
  treats:
    is_a: treats or applied or studied to treat
    annotations:
      canonical_predicate: true
    inverse: treated by
  treated by:
    is_a: related to at instance level
  subclass of:
    is_a: related to at instance level
    annotations:
      canonical_predicate: true
    inverse: superclass of
  superclass of:
    is_a: related to at instance level
  # node property — must NOT become a predicate
  name:
    description: a human-readable label

enums:
  DirectionQualifierEnum:
    permissible_values:
      upregulated:
      increased:
        is_a: upregulated
      downregulated:
      decreased:
        is_a: downregulated
  GeneOrGeneProductOrChemicalEntityAspectEnum:
    permissible_values:
      activity_or_abundance:
      activity:
        is_a: activity_or_abundance
      abundance:
        is_a: activity_or_abundance
"""


@pytest.fixture(scope="module")
def model():
    return model_from_biolink_dict(yaml.safe_load(MODEL_SLICE))


def test_category_hierarchy(model):
    descendants = set(model.category_descendants("biolink:DiseaseOrPhenotypicFeature"))
    assert {"biolink:Disease", "biolink:PhenotypicFeature"} <= descendants
    assert model.category_ancestors("biolink:SmallMolecule") == [
        "biolink:SmallMolecule",
        "biolink:MolecularEntity",
        "biolink:ChemicalEntity",
        "biolink:NamedThing",
    ]


def test_category_mixin_replacement(model):
    assert model.replace_category_mixins(["biolink:GeneOrGeneProduct"]) == [
        "biolink:Gene",
        "biolink:Protein",
    ]
    # non-mixins pass through
    assert model.replace_category_mixins(["biolink:Drug"]) == ["biolink:Drug"]


def test_predicate_hierarchy_and_symmetry(model):
    assert "biolink:causes" in model.predicate_descendants("biolink:affects")
    assert "biolink:treats" in model.predicate_descendants(
        "biolink:treats_or_applied_or_studied_to_treat"
    )
    assert model.is_symmetric("biolink:interacts_with")
    assert not model.is_symmetric("biolink:affects")


def test_canonical_inverse_pairs(model):
    assert model.is_canonical("biolink:treats")
    assert not model.is_canonical("biolink:treated_by")
    assert model.canonical_form("biolink:treated_by") == "biolink:treats"
    assert model.canonical_form("biolink:caused_by") == "biolink:causes"
    assert model.inverse_of("biolink:affects") == "biolink:affected_by"
    # unpaired predicates are trivially canonical
    assert model.is_canonical("biolink:interacts_with")


def test_node_properties_are_not_predicates(model):
    assert "biolink:name" not in model.predicates


def test_qualifier_enum_hierarchy(model):
    assert set(model.qualifier_value_descendants("upregulated")) == {
        "upregulated",
        "increased",
    }
    assert set(model.qualifier_value_descendants("activity_or_abundance")) == {
        "activity_or_abundance",
        "activity",
        "abundance",
    }


def test_synthetic_kg_overlay(model):
    # graft:* entries from the curated table survive a full-model load so
    # the synthetic oracle KG keeps resolving
    assert "graft:Customer" in model.category_parents
    assert "graft:adjacent_to" in model.predicates
    assert model.is_symmetric("graft:adjacent_to")


def test_loader_fallback_without_file():
    m = load_biolink_model(None)
    assert m.is_symmetric("biolink:interacts_with")


def test_loader_fallback_on_bad_file(tmp_path):
    p = tmp_path / "broken.yaml"
    p.write_text(":::: not yaml ::::[")
    m = load_biolink_model(str(p))
    assert m.is_symmetric("biolink:interacts_with")


def test_loader_reads_file(tmp_path):
    p = tmp_path / "model.yaml"
    p.write_text(MODEL_SLICE)
    m = load_biolink_model(str(p))
    assert m.canonical_form("biolink:treated_by") == "biolink:treats"


def test_engine_parity_with_curated_model(model):
    """The YAML-loaded slice answers the same questions the curated
    offline model answers for the overlapping vocabulary (the engine's
    J6/J7 expansions call exactly these methods)."""
    from ploverdb_spark.ontology.biolink_lite import default_model

    curated = default_model()
    for pred in ("biolink:treats", "biolink:interacts_with", "biolink:causes"):
        assert model.is_symmetric(pred) == curated.is_symmetric(pred)
        assert model.canonical_form(pred) == curated.canonical_form(pred)
    for cat in ("biolink:Disease", "biolink:SmallMolecule"):
        assert set(curated.category_ancestors(cat)) <= set(
            model.category_ancestors(cat)
        ) | {"biolink:BiologicalEntity"}  # slice omits nothing the engine needs


def test_class_curie_preserves_acronyms():
    """LinkML class naming preserves existing uppercase: str.capitalize
    would turn 'RNA product' into biolink:RnaProduct and 'microRNA' into
    biolink:Microrna — CURIEs that match nothing in the real model."""
    from ploverdb_spark.ontology.biolink_yaml import class_curie

    assert class_curie("named thing") == "biolink:NamedThing"
    assert class_curie("RNA product") == "biolink:RNAProduct"
    assert class_curie("microRNA") == "biolink:MicroRNA"
    assert class_curie("siRNA") == "biolink:SiRNA"
    assert class_curie("gene") == "biolink:Gene"


def test_acronym_classes_resolve_in_hierarchy():
    doc = yaml.safe_load(
        """
classes:
  named thing: {}
  biological entity:
    is_a: named thing
  RNA product:
    is_a: biological entity
  microRNA:
    is_a: RNA product
slots: {}
enums: {}
"""
    )
    m = model_from_biolink_dict(doc)
    assert "biolink:RNAProduct" in m.category_ancestors("biolink:MicroRNA")
    assert "biolink:MicroRNA" in m.category_descendants("biolink:RNAProduct")
