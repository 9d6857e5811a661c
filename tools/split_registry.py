"""One-time mechanical splitter for the monolithic registry.py
(r6 verdict item 6): slice the module into contiguous part files at
section-comment boundaries, generate each part's explicit imports
of names bound by earlier parts (latest-binding wins, mirroring the
monolith's sequential top-level execution), and emit a package
__init__ that loads the parts in order and re-exports every
top-level name (so `from aurora_cdc_demo_spark.registry import X`
keeps working for all external consumers). Call-time forward
references (a function in part k reading a name first bound in part
k+n) are detected and late-bound onto the earlier part's module
namespace at the end of __init__.

The split is PURELY mechanical: statement order, definitions, and
registration side-effects are byte-identical slices of the
monolith; only import plumbing is added. Verified by re-running the
full oracle sweep + pytest after the move.

Usage: python tools/split_registry.py  (writes the package, moves
registry.py aside; re-run is idempotent only from a clean tree)
"""

from __future__ import annotations

import ast
import builtins
import re
from pathlib import Path

PKG = Path("aurora_cdc_demo_spark")
SRC = PKG / "registry.py"
OUT = PKG / "registry"
N_PARTS = 8

# descriptive suffixes chosen after inspecting each slice's content
PART_NAMES = {}


def block_starts(lines: list[str]) -> list[int]:
    """0-based indices of section-comment block starts (the
    `# ---` / title / `# ---` trios)."""
    marks = [
        i
        for i, ln in enumerate(lines)
        if ln.startswith("# ----------")
    ]
    starts = [i for i in marks if i + 2 in set(marks)]
    return starts


def bindings(tree_body, bound: set[str]) -> None:
    """Final-state top-level bindings of a statement list (simulates
    sequential execution incl. del; recurses into if/try)."""
    for node in tree_body:
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            bound.add(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        bound.add(n.id)
        elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
            if isinstance(node.target, ast.Name):
                bound.add(node.target.id)
        elif isinstance(node, ast.For):
            for n in ast.walk(node.target):
                if isinstance(n, ast.Name):
                    bound.add(n.id)
            bindings(node.body, bound)
        elif isinstance(node, ast.Import):
            for a in node.names:
                bound.add(a.asname or a.name.split(".")[0])
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                bound.add(a.asname or a.name)
        elif isinstance(node, ast.If):
            bindings(node.body, bound)
            bindings(node.orelse, bound)
        elif isinstance(node, ast.Try):
            bindings(node.body, bound)
            for h in node.handlers:
                bindings(h.body, bound)
            bindings(node.orelse, bound)
            bindings(node.finalbody, bound)
        elif isinstance(node, ast.With):
            bindings(node.body, bound)
        elif isinstance(node, ast.Delete):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    bound.discard(t.id)


def main() -> int:
    lines = SRC.read_text().splitlines(keepends=True)
    n = len(lines)
    starts = block_starts(lines)
    # pick N_PARTS-1 boundaries nearest to even slices
    targets = [round(n * k / N_PARTS) for k in range(1, N_PARTS)]
    cuts = []
    for t in targets:
        best = min(starts, key=lambda s: abs(s - t))
        if best not in cuts:
            cuts.append(best)
    cuts.sort()
    spans = []
    prev = 0
    for c in cuts:
        spans.append((prev, c))
        prev = c
    spans.append((prev, n))

    parts = []  # (name, text, tree)
    for i, (a, b) in enumerate(spans, 1):
        text = "".join(lines[a:b])
        tree = ast.parse(text)
        parts.append([f"p{i:02d}", text, tree])

    # name parts by their first registered query key
    for p in parts:
        for node in ast.walk(p[2]):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id == "query"
                and node.args
                and isinstance(node.args[0], ast.Constant)
            ):
                p[0] = p[0] + "_" + str(node.args[0].value)[:24]
                break

    provided = []  # per part: final-state top-level bindings
    for _, _, tree in parts:
        b: set[str] = set()
        bindings(tree.body, b)
        provided.append(b)

    bset = set(dir(builtins)) | {"__file__", "__name__", "__doc__"}
    OUT.mkdir(exist_ok=True)
    fwd = []  # (part_idx, name, def_part_idx)
    for k, (name, text, tree) in enumerate(parts):
        refs = {
            nd.id
            for nd in ast.walk(tree)
            if isinstance(nd, ast.Name) and isinstance(nd.ctx, ast.Load)
        }
        header = ""
        if k > 0:
            header = "from __future__ import annotations\n\n"
        # import each needed name from the LATEST earlier part
        # binding it (mirrors monolith sequential rebinding); names
        # bound only by LATER parts are call-time forward refs the
        # __init__ late-binds after all parts load
        by_src: dict[int, list[str]] = {}
        for r in sorted(refs - bset):
            src = None
            for j in range(k - 1, -1, -1):
                if r in provided[j]:
                    src = j
                    break
            if src is not None:
                by_src.setdefault(src, []).append(r)
            elif r not in provided[k]:
                for j in range(k + 1, len(parts)):
                    if r in provided[j]:
                        fwd.append((k, r, j))
                        break
        for src in sorted(by_src):
            header += (
                f"from .{parts[src][0]} import (  # noqa: F401\n"
            )
            for nm in by_src[src]:
                header += f"    {nm},\n"
            header += ")\n"
        if header:
            header += "\n"
        # bump the monolith's package-relative imports one level
        # (from .operators -> ..operators); generated .pNN stay
        text = re.sub(r"from \.(?!p0\d)", "from ..", text)
        (OUT / f"{name}.py").write_text(header + text)

    init = [
        '"""Query registry package: the former monolithic registry.py',
        "split into contiguous per-family part files (r6 verdict item",
        "6). Parts execute in the monolith's original order; every",
        "top-level name is re-exported here so",
        "`from aurora_cdc_demo_spark.registry import X` keeps working",
        "for all consumers. The split is mechanical — definitions and",
        "registration side-effects are unchanged slices; only import",
        'plumbing was generated (tools/split_registry.py)."""',
        "",
    ]
    for name, _, _ in parts:
        init.append(f"from . import {name} as _{name.split('_')[0]}")
    init.append("")
    init.append("_PARTS = [" + ", ".join(
        f"_{name.split('_')[0]}" for name, _, _ in parts
    ) + "]")
    init += [
        "",
        "# re-export every top-level name, later parts winning —",
        "# exactly the monolith module's final namespace",
        "_g = globals()",
        "for _m in _PARTS:",
        "    for _k, _v in vars(_m).items():",
        "        if not _k.startswith('__'):",
        "            _g[_k] = _v",
    ]
    if fwd:
        init += [
            "",
            "# call-time forward references: names a part's functions",
            "# read from module globals that a LATER part binds (legal",
            "# in the monolith; late-bound here after all parts load)",
        ]
        for k, r, j in fwd:
            init.append(
                f"_{parts[k][0].split('_')[0]}.{r} = "
                f"_{parts[j][0].split('_')[0]}.{r}"
            )
    init += [
        "",
        "del _g, _m, _k, _v, _PARTS",
        "",
    ]
    (OUT / "__init__.py").write_text("\n".join(init))
    SRC.rename(PKG / "registry_monolith.py.bak")
    print("parts:", [p[0] for p in parts])
    print("forward refs:", fwd)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
