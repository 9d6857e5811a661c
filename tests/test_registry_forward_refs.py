"""Forward-reference drift law for the split registry package
(ADVICE r7): the monolith's call-time cross-part references are
late-bound by a hand-maintained patch list at the end of
registry/__init__.py. A future edit that adds a NEW cross-part
reference (in either direction) without the matching import header
or patch line would only surface as a runtime NameError inside
whichever query first touches it. This law re-runs the splitter's
forward-reference scan over the CURRENT part files at test time and
fails at the patch list instead.

Rule checked, per part file: every Load-context name that is not a
builtin and not bound in the part's own namespace (its defs,
assignments, and generated import header — the same final-state
binding walk tools/split_registry.py uses) but IS bound by another
part must be late-bound in __init__'s patch list for that part.
Names bound by no part at all are function locals/params and are
ignored, exactly as the splitter ignored them."""

from __future__ import annotations

import ast
import builtins
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "aurora_cdc_demo_spark" / "registry"

sys.path.insert(0, str(REPO))

from tools.split_registry import bindings  # noqa: E402


def _parts():
    names = sorted(
        p.name for p in PKG.glob("p??_*.py") if p.name != "__init__.py"
    )
    assert len(names) == 8, names
    return names


def _patch_list():
    """(part_prefix, name) pairs from __init__'s late-binding
    assignments `_pNN.name = _pMM.name`."""
    tree = ast.parse((PKG / "__init__.py").read_text())
    patched = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            t = node.targets[0]
            if (
                isinstance(t, ast.Attribute)
                and isinstance(t.value, ast.Name)
                and t.value.id.startswith("_p")
            ):
                patched.add((t.value.id.lstrip("_").split("_")[0], t.attr))
    return patched


def test_forward_reference_scan_matches_patch_list():
    part_files = _parts()
    trees = {n: ast.parse((PKG / n).read_text()) for n in part_files}

    own: dict[str, set[str]] = {}
    for n, tree in trees.items():
        b: set[str] = set()
        bindings(tree.body, b)
        own[n] = b

    bound_by_other: dict[str, set[str]] = {
        n: set().union(*(own[m] for m in part_files if m != n))
        for n in part_files
    }

    bset = set(dir(builtins)) | {"__file__", "__name__", "__doc__"}
    patched = _patch_list()

    missing = []
    for n, tree in trees.items():
        refs = {
            nd.id
            for nd in ast.walk(tree)
            if isinstance(nd, ast.Name) and isinstance(nd.ctx, ast.Load)
        }
        unresolved = refs - bset - own[n]
        prefix = n.split("_")[0]
        for r in sorted(unresolved & bound_by_other[n]):
            if (prefix, r) not in patched:
                missing.append((n, r))

    assert not missing, (
        "cross-part references not covered by an import header or the "
        f"__init__ late-binding patch list: {missing}"
    )


def test_patch_list_is_not_stale():
    """Every patch line must still correspond to a real unresolved
    reference (a deleted reference should delete its patch line,
    keeping the list an exact record)."""
    part_files = _parts()
    trees = {n: ast.parse((PKG / n).read_text()) for n in part_files}
    own: dict[str, set[str]] = {}
    for n, tree in trees.items():
        b: set[str] = set()
        bindings(tree.body, b)
        own[n] = b
    bset = set(dir(builtins)) | {"__file__", "__name__", "__doc__"}

    needed = set()
    for n, tree in trees.items():
        refs = {
            nd.id
            for nd in ast.walk(tree)
            if isinstance(nd, ast.Name) and isinstance(nd.ctx, ast.Load)
        }
        unresolved = refs - bset - own[n]
        other = set().union(*(own[m] for m in part_files if m != n))
        for r in unresolved & other:
            needed.add((n.split("_")[0], r))

    stale = _patch_list() - needed
    assert not stale, f"patch lines with no matching reference: {stale}"
