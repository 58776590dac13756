"""Official Biolink model (LinkML YAML) -> :class:`BiolinkLite`.

The reference resolves ontology semantics through ``BiolinkHelper``, which
downloads the versioned public ``biolink-model.yaml`` and answers
ancestor/descendant/symmetry/canonical queries over it (reference
``biolink_helper.py:14,20-33``; call sites plover.py:837, 1063, 2618-2642).
This module is the equivalent loader for this engine: given the public
YAML (a file path or already-parsed dict), it distills the class/slot/enum
graphs into the small driver-side tables ``BiolinkLite`` operates on.

Semantics mirrored from the reference's helper:

- **classes** (categories): ``is_a`` parent chain; classes marked
  ``mixin: true`` are excluded from the parent tree and instead map to the
  non-mixin classes that mix them in (the reference's
  ``replace_mixins`` behavior).
- **slots** (predicates): only slots descending from ``related to`` are
  predicates; ``symmetric``, ``inverse`` (mirrored onto both partners) and
  the ``canonical_predicate`` annotation (exactly one side of an inverse
  pair carries it) are honored.
- **enums**: direction/aspect qualifier permissible values keep their
  ``is_a`` hierarchy for conglomerate-predicate expansion.

The hand-curated tables in :mod:`biolink_lite` remain the offline
fallback; synthetic-KG (``graft:``) entries are overlaid so the oracle
test graph keeps working against a full model.
"""

from __future__ import annotations

from typing import Any

from ploverdb_spark.ontology.biolink_lite import (
    _CATEGORY_MIXINS,
    _CATEGORY_PARENTS,
    _PREDICATE_MIXINS,
    _PREDICATES,
    _QUALIFIER_VALUE_PARENTS,
    BiolinkLite,
    PredicateInfo,
    default_model,
)

ROOT_SLOT = "related to"

# Enums feeding the conglomerate-predicate qualifier hierarchy
# (reference plover.py:1486-1519 expands qualifier values through these).
QUALIFIER_ENUMS = (
    "DirectionQualifierEnum",
    "GeneOrGeneProductOrChemicalEntityAspectEnum",
    "GeneOrGeneProductOrChemicalPartQualifierEnum",
)


def class_curie(name: str) -> str:
    """'named thing' -> 'biolink:NamedThing' (LinkML class naming).

    Existing uppercase is preserved (only the first letter of each word is
    raised): 'RNA product' -> 'biolink:RNAProduct', 'microRNA' ->
    'biolink:MicroRNA' — ``str.capitalize`` would lowercase the acronyms
    and produce CURIEs that match nothing in the real model.
    """
    return "biolink:" + "".join(
        (w[0].upper() + w[1:]) if w else w for w in name.split()
    )


def slot_curie(name: str) -> str:
    """'interacts with' -> 'biolink:interacts_with' (LinkML slot naming)."""
    return "biolink:" + name.replace(" ", "_")


def _is_truthy(v: Any) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).strip().lower() in ("true", "1", "yes")


def _has_canonical_annotation(slot: dict) -> bool:
    """LinkML annotations appear either as a mapping
    (``{canonical_predicate: true}`` / ``{canonical_predicate: {tag: ...,
    value: true}}``) or a list of ``{tag, value}`` entries."""
    ann = slot.get("annotations")
    if ann is None:
        return False
    if isinstance(ann, dict):
        v = ann.get("canonical_predicate")
        if isinstance(v, dict):
            v = v.get("value")
        return v is not None and _is_truthy(v)
    if isinstance(ann, list):
        return any(
            isinstance(e, dict)
            and e.get("tag") == "canonical_predicate"
            and _is_truthy(e.get("value"))
            for e in ann
        )
    return False


def _predicate_slots(slots: dict[str, dict]) -> set[str]:
    """Slots reachable from ``related to`` via is_a or mixin membership —
    the predicate subset of the slot graph (node/edge properties are
    slots too and must not become predicates)."""
    children: dict[str, set[str]] = {}
    for name, body in slots.items():
        for link in [body.get("is_a")] + list(body.get("mixins") or []):
            if link:
                children.setdefault(link, set()).add(name)
    out: set[str] = set()
    frontier = [ROOT_SLOT]
    if ROOT_SLOT in slots:
        out.add(ROOT_SLOT)
    while frontier:
        nxt = []
        for f in frontier:
            for c in children.get(f, ()):
                if c not in out:
                    out.add(c)
                    nxt.append(c)
        frontier = nxt
    return out


def model_from_biolink_dict(model: dict) -> BiolinkLite:
    """Distill a parsed biolink-model.yaml into a BiolinkLite."""
    classes: dict[str, dict] = {
        k: (v or {}) for k, v in (model.get("classes") or {}).items()
    }
    slots: dict[str, dict] = {
        k: (v or {}) for k, v in (model.get("slots") or {}).items()
    }
    enums: dict[str, dict] = {
        k: (v or {}) for k, v in (model.get("enums") or {}).items()
    }

    # -- categories --------------------------------------------------------
    category_parents: dict[str, str | None] = {}
    category_mixins: dict[str, list[str]] = {}
    mixin_classes = {k for k, v in classes.items() if _is_truthy(v.get("mixin"))}
    for name, body in classes.items():
        if name in mixin_classes:
            continue
        parent = body.get("is_a")
        # climb past mixin parents to the nearest concrete ancestor
        seen = set()
        while parent in mixin_classes and parent not in seen:
            seen.add(parent)
            parent = classes.get(parent, {}).get("is_a")
        category_parents[class_curie(name)] = (
            class_curie(parent) if parent else None
        )
    for m in mixin_classes:
        users = sorted(
            class_curie(name)
            for name, body in classes.items()
            if name not in mixin_classes and m in (body.get("mixins") or [])
        )
        if users:
            category_mixins[class_curie(m)] = users

    # -- predicates --------------------------------------------------------
    pred_names = _predicate_slots(slots)
    mixin_slots = {
        k for k in pred_names if _is_truthy(slots.get(k, {}).get("mixin"))
    }
    # mirror declared inverses onto both partners
    inverse_of: dict[str, str] = {}
    for name in pred_names:
        inv = slots[name].get("inverse")
        if inv:
            inverse_of[name] = inv
            inverse_of.setdefault(inv, name)
    canonical_marked = {
        name for name in pred_names if _has_canonical_annotation(slots[name])
    }

    predicates: dict[str, PredicateInfo] = {}
    predicate_mixins: dict[str, list[str]] = {}
    for name in pred_names:
        body = slots[name]
        if name in mixin_slots:
            users = sorted(
                slot_curie(n)
                for n in pred_names
                if n not in mixin_slots and name in (body_mixins(slots[n]))
            )
            if users:
                predicate_mixins[slot_curie(name)] = users
            continue
        parent = body.get("is_a")
        seen = set()
        while parent in mixin_slots and parent not in seen:
            seen.add(parent)
            parent = slots.get(parent, {}).get("is_a")
        inv = inverse_of.get(name)
        # exactly one side of an inverse pair is canonical; an unpaired
        # predicate is trivially canonical
        canonical = (
            name in canonical_marked
            or inv is None
            or inv not in canonical_marked
        )
        predicates[slot_curie(name)] = PredicateInfo(
            parent=slot_curie(parent) if parent and parent in pred_names else None,
            symmetric=_is_truthy(body.get("symmetric")),
            inverse=slot_curie(inv) if inv else None,
            canonical=canonical,
        )

    # -- qualifier enums ---------------------------------------------------
    qualifier_value_parents: dict[str, str | None] = {}
    for enum_name in QUALIFIER_ENUMS:
        enum = enums.get(enum_name) or {}
        for value, vbody in (enum.get("permissible_values") or {}).items():
            vbody = vbody or {}
            qualifier_value_parents[value] = vbody.get("is_a")

    # -- overlay synthetic-KG entries + curated fallbacks ------------------
    for k, v in _CATEGORY_PARENTS.items():
        category_parents.setdefault(k, v)
    for k, v in _PREDICATES.items():
        predicates.setdefault(k, v)
    for k, v in _CATEGORY_MIXINS.items():
        category_mixins.setdefault(k, v)
    for k, v in _PREDICATE_MIXINS.items():
        predicate_mixins.setdefault(k, v)
    if not qualifier_value_parents:
        qualifier_value_parents = dict(_QUALIFIER_VALUE_PARENTS)

    return BiolinkLite(
        category_parents=category_parents,
        category_mixins=category_mixins,
        predicates=predicates,
        predicate_mixins=predicate_mixins,
        qualifier_value_parents=qualifier_value_parents,
    )


def body_mixins(body: dict) -> list[str]:
    return list(body.get("mixins") or [])


def load_biolink_model(path: str | None = None) -> BiolinkLite:
    """Load the full model from a biolink-model.yaml file; fall back to
    the curated offline subset when no file is given or parsing fails."""
    if path is None:
        return default_model()
    try:
        import yaml

        with open(path) as f:
            parsed = yaml.safe_load(f)
        return model_from_biolink_dict(parsed)
    except Exception:
        return default_model()
