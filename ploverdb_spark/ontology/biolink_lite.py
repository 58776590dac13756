"""Minimal, self-contained Biolink-model ontology.

The reference delegates ontology operations to the external
``biolink-helper-pkg`` (reference ``biolink_helper.py:20-32``): ancestor /
descendant walks over the category and predicate hierarchies, canonical
predicate resolution, symmetry flags, and mixin replacement.  That package
(and the Biolink model YAML it downloads) is not available here, so this
module embeds a hand-curated subset of the public Biolink model — enough to
express every semantic the reference's test suite exercises
(``test/test_kg2c.py``): hierarchy expansion, symmetric vs asymmetric
predicates, canonical vs non-canonical (inverse) predicates, mixins, and
qualifier ("conglomerate predicate") ancestors.

The model is data, not code: deployments with the real Biolink YAML can
load a full model through :func:`BiolinkLite.from_dict` without touching
the engine.  All structures are tiny (hundreds of entries), so ontology
operations are driver-side set algebra; only the *KG-derived* subclass
closure (millions of rows) lives in DataFrames (``build/closure.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

ROOT_CATEGORY = "biolink:NamedThing"
ROOT_PREDICATE = "biolink:related_to"

# category -> parent (None for root). Mixins are listed separately.
_CATEGORY_PARENTS: dict[str, str | None] = {
    "biolink:NamedThing": None,
    "biolink:BiologicalEntity": "biolink:NamedThing",
    "biolink:ChemicalEntity": "biolink:NamedThing",
    "biolink:InformationContentEntity": "biolink:NamedThing",
    "biolink:OrganismalEntity": "biolink:BiologicalEntity",
    "biolink:DiseaseOrPhenotypicFeature": "biolink:BiologicalEntity",
    "biolink:Disease": "biolink:DiseaseOrPhenotypicFeature",
    "biolink:PhenotypicFeature": "biolink:DiseaseOrPhenotypicFeature",
    "biolink:BiologicalProcessOrActivity": "biolink:BiologicalEntity",
    "biolink:BiologicalProcess": "biolink:BiologicalProcessOrActivity",
    "biolink:Pathway": "biolink:BiologicalProcess",
    "biolink:MolecularActivity": "biolink:BiologicalProcessOrActivity",
    "biolink:Gene": "biolink:BiologicalEntity",
    "biolink:Protein": "biolink:Polypeptide",
    "biolink:Polypeptide": "biolink:BiologicalEntity",
    "biolink:MolecularEntity": "biolink:ChemicalEntity",
    "biolink:SmallMolecule": "biolink:MolecularEntity",
    "biolink:NucleicAcidEntity": "biolink:MolecularEntity",
    "biolink:Drug": "biolink:ChemicalEntity",
    "biolink:OrganismTaxon": "biolink:NamedThing",
    "biolink:Cell": "biolink:OrganismalEntity",
    "biolink:AnatomicalEntity": "biolink:OrganismalEntity",
    "biolink:GrossAnatomicalStructure": "biolink:AnatomicalEntity",
    "biolink:Publication": "biolink:InformationContentEntity",
    # Synthetic-KG categories (TPC-H-derived graph used by the oracle
    # checks). Parented under NamedThing so root-default expansion works.
    "graft:Region": "biolink:NamedThing",
    "graft:Nation": "biolink:NamedThing",
    "graft:Customer": "biolink:NamedThing",
    "graft:Supplier": "biolink:NamedThing",
    "graft:Order": "biolink:NamedThing",
    "graft:Part": "biolink:NamedThing",
}

# mixin category -> direct (non-mixin) replacements
_CATEGORY_MIXINS: dict[str, list[str]] = {
    "biolink:ChemicalOrDrugOrTreatment": ["biolink:ChemicalEntity"],
    "biolink:GeneOrGeneProduct": ["biolink:Gene", "biolink:Protein"],
    "biolink:PhysicalEssence": ["biolink:NamedThing"],
}


@dataclass(frozen=True)
class PredicateInfo:
    parent: str | None
    symmetric: bool = False
    inverse: str | None = None  # inverse predicate name, if any
    canonical: bool = True  # False => the inverse is the canonical form
    mixin: bool = False


# predicate -> info. Inverse pairs: exactly one side is canonical
# (mirrors Biolink's canonical_predicate annotation).
_PREDICATES: dict[str, PredicateInfo] = {
    "biolink:related_to": PredicateInfo(None, symmetric=True),
    "biolink:related_to_at_instance_level": PredicateInfo(
        "biolink:related_to", symmetric=True
    ),
    "biolink:associated_with": PredicateInfo(
        "biolink:related_to_at_instance_level", symmetric=True
    ),
    "biolink:interacts_with": PredicateInfo(
        "biolink:related_to_at_instance_level", symmetric=True
    ),
    "biolink:physically_interacts_with": PredicateInfo(
        "biolink:interacts_with", symmetric=True
    ),
    "biolink:directly_physically_interacts_with": PredicateInfo(
        "biolink:physically_interacts_with", symmetric=True
    ),
    "biolink:genetically_interacts_with": PredicateInfo(
        "biolink:interacts_with", symmetric=True
    ),
    "biolink:affects": PredicateInfo("biolink:related_to_at_instance_level"),
    "biolink:affected_by": PredicateInfo(
        "biolink:related_to_at_instance_level",
        inverse="biolink:affects",
        canonical=False,
    ),
    "biolink:regulates": PredicateInfo("biolink:affects"),
    "biolink:regulated_by": PredicateInfo(
        "biolink:affected_by", inverse="biolink:regulates", canonical=False
    ),
    "biolink:treats_or_applied_or_studied_to_treat": PredicateInfo(
        "biolink:related_to_at_instance_level"
    ),
    "biolink:treats": PredicateInfo("biolink:treats_or_applied_or_studied_to_treat"),
    "biolink:treated_by": PredicateInfo(
        "biolink:related_to_at_instance_level",
        inverse="biolink:treats",
        canonical=False,
    ),
    "biolink:causes": PredicateInfo("biolink:affects"),
    "biolink:caused_by": PredicateInfo(
        "biolink:affected_by", inverse="biolink:causes", canonical=False
    ),
    "biolink:contributes_to": PredicateInfo("biolink:affects"),
    "biolink:has_part": PredicateInfo("biolink:related_to_at_instance_level"),
    "biolink:part_of": PredicateInfo(
        "biolink:related_to_at_instance_level",
        inverse="biolink:has_part",
        canonical=False,
    ),
    "biolink:subclass_of": PredicateInfo("biolink:related_to_at_instance_level"),
    "biolink:superclass_of": PredicateInfo(
        "biolink:related_to_at_instance_level",
        inverse="biolink:subclass_of",
        canonical=False,
    ),
    "biolink:close_match": PredicateInfo(
        "biolink:related_to_at_instance_level", symmetric=True
    ),
    "biolink:has_phenotype": PredicateInfo("biolink:related_to_at_instance_level"),
    "biolink:phenotype_of": PredicateInfo(
        "biolink:related_to_at_instance_level",
        inverse="biolink:has_phenotype",
        canonical=False,
    ),
    "biolink:gene_associated_with_condition": PredicateInfo(
        "biolink:associated_with"
    ),
    "biolink:condition_associated_with_gene": PredicateInfo(
        "biolink:associated_with",
        inverse="biolink:gene_associated_with_condition",
        canonical=False,
    ),
    # Synthetic-KG predicates (TPC-H-derived graph).
    "graft:adjacent_to": PredicateInfo(
        "biolink:related_to_at_instance_level", symmetric=True
    ),
    "graft:located_in": PredicateInfo("biolink:related_to_at_instance_level"),
    "graft:part_of_region": PredicateInfo("biolink:related_to_at_instance_level"),
    "graft:placed_by": PredicateInfo("biolink:related_to_at_instance_level"),
    "graft:contains_part": PredicateInfo("biolink:related_to_at_instance_level"),
    "graft:supplied_by": PredicateInfo("biolink:related_to_at_instance_level"),
}

_PREDICATE_MIXINS: dict[str, list[str]] = {
    "biolink:treats_or_applied_or_studied_to_treat_mixin": ["biolink:treats"],
}

# Qualifier enum hierarchies (for conglomerate-predicate ancestor walks,
# reference plover.py:1486-1519). value -> parent (None = root of its enum).
_QUALIFIER_VALUE_PARENTS: dict[str, str | None] = {
    # object_direction_qualifier (GeneOrGeneProductOrChemicalEntityAspectEnum)
    "increased": "upregulated",
    "decreased": "downregulated",
    "upregulated": None,
    "downregulated": None,
    # object_aspect_qualifier
    "activity": "activity_or_abundance",
    "abundance": "activity_or_abundance",
    "activity_or_abundance": None,
    "expression": None,
    "synthesis": None,
    "degradation": None,
}


@dataclass
class BiolinkLite:
    """Driver-side ontology with the operation surface the reference uses
    (reference call sites: plover.py:837, 1063, 2618-2642, 2704-2742)."""

    category_parents: dict[str, str | None] = field(
        default_factory=lambda: dict(_CATEGORY_PARENTS)
    )
    category_mixins: dict[str, list[str]] = field(
        default_factory=lambda: dict(_CATEGORY_MIXINS)
    )
    predicates: dict[str, PredicateInfo] = field(
        default_factory=lambda: dict(_PREDICATES)
    )
    predicate_mixins: dict[str, list[str]] = field(
        default_factory=lambda: dict(_PREDICATE_MIXINS)
    )
    qualifier_value_parents: dict[str, str | None] = field(
        default_factory=lambda: dict(_QUALIFIER_VALUE_PARENTS)
    )

    # -- hierarchy walks ---------------------------------------------------

    def category_ancestors(self, cat: str, include_self: bool = True) -> list[str]:
        return self._walk_up(cat, self.category_parents, include_self)

    def category_descendants(self, cat: str, include_self: bool = True) -> list[str]:
        return self._walk_down(cat, self.category_parents, include_self)

    def predicate_ancestors(self, pred: str, include_self: bool = True) -> list[str]:
        parents = {p: info.parent for p, info in self.predicates.items()}
        return self._walk_up(pred, parents, include_self)

    def predicate_descendants(self, pred: str, include_self: bool = True) -> list[str]:
        parents = {p: info.parent for p, info in self.predicates.items()}
        return self._walk_down(pred, parents, include_self)

    def qualifier_value_descendants(self, value: str) -> list[str]:
        return self._walk_down(value, self.qualifier_value_parents, include_self=True)

    @staticmethod
    def _walk_up(
        item: str, parents: dict[str, str | None], include_self: bool
    ) -> list[str]:
        out = [item] if include_self else []
        seen = {item}
        cur = parents.get(item)
        while cur is not None and cur not in seen:
            out.append(cur)
            seen.add(cur)
            cur = parents.get(cur)
        return out

    @staticmethod
    def _walk_down(
        item: str, parents: dict[str, str | None], include_self: bool
    ) -> list[str]:
        children: dict[str, list[str]] = {}
        for child, parent in parents.items():
            if parent is not None:
                children.setdefault(parent, []).append(child)
        out = [item] if include_self else []
        frontier = [item]
        seen = {item}
        while frontier:
            nxt = []
            for f in frontier:
                for c in children.get(f, []):
                    if c not in seen:
                        seen.add(c)
                        out.append(c)
                        nxt.append(c)
            frontier = nxt
        return out

    # -- canonical predicates / symmetry ----------------------------------

    def is_symmetric(self, pred: str) -> bool:
        info = self.predicates.get(pred)
        return bool(info and info.symmetric)

    def is_canonical(self, pred: str) -> bool:
        info = self.predicates.get(pred)
        return info.canonical if info else True

    def canonical_form(self, pred: str) -> str:
        """Canonical predicate for ``pred`` (itself if already canonical;
        its inverse if not — reference plover.py:1059-1088, 2662-2694)."""
        info = self.predicates.get(pred)
        if info is None or info.canonical:
            return pred
        return info.inverse or pred

    def inverse_of(self, pred: str) -> str | None:
        info = self.predicates.get(pred)
        if info is None:
            return None
        if info.inverse is not None:
            return info.inverse
        for other, oinfo in self.predicates.items():
            if oinfo.inverse == pred:
                return other
        return None

    # -- mixins ------------------------------------------------------------

    def replace_category_mixins(self, cats: list[str]) -> list[str]:
        out: list[str] = []
        for c in cats:
            out.extend(self.category_mixins.get(c, [c]))
        return list(dict.fromkeys(out))

    def replace_predicate_mixins(self, preds: list[str]) -> list[str]:
        out: list[str] = []
        for p in preds:
            out.extend(self.predicate_mixins.get(p, [p]))
        return list(dict.fromkeys(out))

    # -- most-specific reduction (reference plover.py:835-877) -------------

    def most_specific_categories(self, cats: list[str]) -> list[str]:
        """Remove any category that is a proper ancestor of another."""
        cat_set = set(cats)
        proper_ancestors: set[str] = set()
        for c in cat_set:
            proper_ancestors.update(self.category_ancestors(c, include_self=False))
        return sorted(cat_set - proper_ancestors)

    # -- serialization -----------------------------------------------------

    @classmethod
    def from_dict(cls, model: dict) -> BiolinkLite:
        """Load a full model (e.g. distilled from the official Biolink YAML)."""
        preds = {
            name: PredicateInfo(
                parent=v.get("parent"),
                symmetric=v.get("symmetric", False),
                inverse=v.get("inverse"),
                canonical=v.get("canonical", True),
                mixin=v.get("mixin", False),
            )
            for name, v in model.get("predicates", {}).items()
        }
        return cls(
            category_parents=model.get("category_parents", dict(_CATEGORY_PARENTS)),
            category_mixins=model.get("category_mixins", dict(_CATEGORY_MIXINS)),
            predicates=preds or dict(_PREDICATES),
            predicate_mixins=model.get(
                "predicate_mixins", dict(_PREDICATE_MIXINS)
            ),
            qualifier_value_parents=model.get(
                "qualifier_value_parents", dict(_QUALIFIER_VALUE_PARENTS)
            ),
        )


_DEFAULT: BiolinkLite | None = None


def default_model() -> BiolinkLite:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = BiolinkLite()
    return _DEFAULT
