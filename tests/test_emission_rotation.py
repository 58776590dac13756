"""Transitive module-chain provenance for the emission-window rotation.

The correctness driver emits at most ``DRIVER_EMIT_CAP`` rows per round,
so the ``_EMIT_LAST`` tail entries ship WITHOUT a fresh driver
measurement — their claim to correctness is "the code they execute is
byte-identical to a state that measured green".  VERDICT r7 (What's
wrong #4) showed the per-module honor system is not enough: a shared
helper (functions/predicates.py) changed in round 5 underneath pinned
entries whose *registration* modules were untouched.

This test makes the provenance mechanical and TRANSITIVE: at rotation
time the full intra-package import chain of every tail entry is pinned
by content hash (``tests/rotation_provenance.json``).  Any later change
to any module in any tail entry's chain fails here loudly, with the list
of affected entries — the fixer must either move those entries into
``_EMIT_FIRST`` (so the next driver round re-measures them) or
consciously re-pin after verifying the change cannot alter their output:

    python tests/test_emission_rotation.py --pin

Chain semantics: BFS over ``import ploverdb_spark...`` statements in each
module's source (AST, so function-local imports count), starting from the
entry's registering module.  ``catalog.py``'s imports of
``ploverdb_spark.queries.*`` are excluded — those are the registry's
side-effect fan-out (every query module registers into catalog), not a
data dependency of any individual entry; following them would taint every
entry with every module and make the pin vacuous.
"""

from __future__ import annotations

import ast
import hashlib
import json
import os

PKG = "ploverdb_spark"
_HERE = os.path.dirname(os.path.abspath(__file__))
PIN_FILE = os.path.join(_HERE, "rotation_provenance.json")
_PKG_ROOT = os.path.join(os.path.dirname(_HERE), PKG)


def _mod_file(mod: str) -> str | None:
    rel = mod.split(".")[1:]
    p = os.path.join(_PKG_ROOT, *rel)
    if os.path.isfile(p + ".py"):
        return p + ".py"
    if os.path.isdir(p):
        init = os.path.join(p, "__init__.py")
        return init if os.path.isfile(init) else None
    return None


def _direct_imports(mod: str) -> set[str]:
    f = _mod_file(mod)
    if not f:
        return set()
    tree = ast.parse(open(f, encoding="utf-8").read())
    out: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(PKG):
                    out.add(a.name)
        elif isinstance(node, ast.ImportFrom):
            m = node.module
            if node.level:  # relative import -> resolve against mod
                base = mod.split(".")[: -node.level]
                m = ".".join(base + ([node.module] if node.module else []))
            if m and m.startswith(PKG):
                out.add(m)
                # "from pkg.operators import dedup" names a submodule
                for a in node.names:
                    sub = f"{m}.{a.name}"
                    if _mod_file(sub):
                        out.add(sub)
    out = {x for x in out if _mod_file(x)}
    if mod == f"{PKG}.catalog":
        # registry fan-out, not a data dependency (see module docstring)
        out = {x for x in out if not x.startswith(f"{PKG}.queries")}
    return out


def module_chain(mod: str) -> set[str]:
    seen: set[str] = set()
    todo = [mod]
    while todo:
        m = todo.pop()
        if m in seen:
            continue
        seen.add(m)
        todo.extend(_direct_imports(m) - seen)
    return seen


def _md5(path: str) -> str:
    return hashlib.md5(open(path, "rb").read()).hexdigest()


def tail_chains() -> dict[str, set[str]]:
    """name -> transitive module chain, for every _EMIT_LAST entry."""
    from ploverdb_spark import catalog
    from ploverdb_spark.catalog import _EMIT_LAST

    catalog._ensure_loaded()
    return {name: module_chain(catalog.get(name).fn.__module__) for name in _EMIT_LAST}


def current_state() -> dict:
    chains = tail_chains()
    modules = sorted(set().union(*chains.values())) if chains else []
    return {
        "comment": (
            "Pinned at emission-window rotation time. Regenerate ONLY as "
            "part of a conscious rotation decision: "
            "python tests/test_emission_rotation.py --pin"
        ),
        "entries": {n: sorted(c) for n, c in sorted(chains.items())},
        "hashes": {m: _md5(_mod_file(m)) for m in modules},
    }


def test_tail_chains_are_pinned_and_unchanged():
    assert os.path.isfile(PIN_FILE), (
        f"{PIN_FILE} missing — pin the rotation provenance with: "
        "python tests/test_emission_rotation.py --pin"
    )
    pinned = json.load(open(PIN_FILE))
    now = current_state()

    # 1. every tail entry's chain is exactly the pinned chain
    assert now["entries"].keys() == pinned["entries"].keys(), (
        "_EMIT_LAST changed without re-pinning provenance: "
        f"{sorted(set(now['entries']) ^ set(pinned['entries']))}"
    )
    changed_modules = {
        m
        for m, h in now["hashes"].items()
        if pinned["hashes"].get(m) != h
    } | {m for m in pinned["hashes"] if m not in now["hashes"]}
    for name, chain in now["entries"].items():
        assert chain == pinned["entries"][name], (
            f"import chain of tail entry {name} changed "
            f"(was {pinned['entries'][name]}, now {chain}) — move it into "
            "_EMIT_FIRST or re-pin consciously"
        )
    # 2. no module in any tail chain changed since the pin
    if changed_modules:
        affected = sorted(
            n for n, c in now["entries"].items() if set(c) & changed_modules
        )
        raise AssertionError(
            f"modules changed under pinned tail entries: {sorted(changed_modules)} "
            f"-> affected entries {affected}. Move them into _EMIT_FIRST so the "
            "next driver round re-measures them, or re-pin (python "
            "tests/test_emission_rotation.py --pin) after verifying the change "
            "cannot alter their output."
        )


def test_chain_includes_operator_modules_not_just_registration():
    """The r5 failure mode: a helper changes under a pinned entry whose
    registration module is untouched.  Guard the guard — chains must reach
    through the registration module into the operator modules."""
    chains = tail_chains()
    # t1_token_counts registers in queries/pipeline.py but executes
    # operators/text.py; d1_exact_dedup executes operators/dedup.py
    if "t1_token_counts" in chains:
        assert f"{PKG}.operators.text" in chains["t1_token_counts"]
    if "d1_exact_dedup" in chains:
        assert f"{PKG}.operators.dedup" in chains["d1_exact_dedup"]
    # and every chain reaches the shared loader
    for name, chain in chains.items():
        assert f"{PKG}.catalog" in chain, name


if __name__ == "__main__":
    import sys

    if "--pin" in sys.argv:
        state = current_state()
        json.dump(state, open(PIN_FILE, "w"), indent=1, sort_keys=True)
        print(
            f"pinned {len(state['entries'])} tail entries over "
            f"{len(state['hashes'])} modules -> {PIN_FILE}"
        )
    else:
        print(__doc__)
