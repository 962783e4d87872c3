"""Derive the driver sweep order from hard evidence instead of narration
(VERDICT r08 #5): the rotation that used to live as ~140 lines of
hand-maintained prose in `__spark_entry__.py` is generated from

  1. the CORRECTNESS_r*.json history -- each registered query's latest
     GREEN round (rows+schema+hash, no err), and
  2. the round's changed-code set -- `git diff` against the driver's
     round-boundary commit (latest commit titled "round N: ..."),
     resolved to queries at ENTITY granularity: every package module is
     parsed into top-level entities (defs/classes with decorator spans,
     assignments, imports); diff hunks touching an entity taint its name;
     taint then propagates through references -- within a module via the
     names an entity's body uses, and ACROSS modules via import bindings
     (`from M import f` taints the local `f` iff M's `f` is tainted;
     a module alias `import M as A` taints `A.attr` accesses iff M's
     `attr` is tainted) -- to a global fixpoint. A query is "changed"
     exactly when its plan function's name ends up tainted, so editing one
     kernel pulls the queries whose code can actually reach it, not every
     sibling in the module. Unattributable diffs (bare module-level
     statements, star imports of tainted modules) conservatively taint
     the whole module. Queries never seen in any CORRECTNESS file (new
     this round) join the changed set.

Order: changed-code queries first (the rotation invariant: changed code
ALWAYS jumps to the head), then everything else by evidence staleness
(oldest green round first); registry insertion order breaks ties so the
output is deterministic. The driver has a finite per-round budget
(~50 checks), so the head of this list is what actually gets re-hashed.

Output: rewrites `_sweep_order.py` at the repo root (checked in,
machine-produced -- rerun this tool after any code change, at minimum once
before round close). `__spark_entry__.py` imports SWEEP_PRIORITY from it.

Usage: python tools/gen_sweep.py [--base COMMIT] [--dry-run]
"""

from __future__ import annotations

import ast
import glob
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
PKG = "sqldataintegrationfunctiontriggerapp_spark"
OUT = os.path.join(REPO, "_sweep_order.py")


def git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def last_green_rounds() -> tuple[dict[str, int], set[str]]:
    """query -> latest round with rows+schema+hash all true and no err;
    plus the set of queries ever checked (green or not)."""
    green: dict[str, int] = {}
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            seen.add(name)
            if (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and not rec.get("err")
            ):
                green[name] = max(green.get(name, -1), rnd)
    return green, seen


def round_base_commit() -> str:
    out = git("log", "--grep", "^round [0-9]*:", "-1", "--format=%H").strip()
    if not out:
        out = git("rev-list", "--max-parents=0", "HEAD").strip().splitlines()[0]
    return out


def changed_package_files(base: str) -> list[str]:
    files = set(git("diff", "--name-only", base).splitlines())
    # diff against the worktree covers committed-since-base and uncommitted
    return sorted(f for f in files if f.startswith(PKG + "/") and f.endswith(".py"))


def new_side_lines(base: str, path: str) -> set[int]:
    """Line numbers (new side) touched by the diff for `path`."""
    out = git("diff", "-U0", base, "--", path)
    lines: set[int] = set()
    for m in re.finditer(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", out, re.M):
        start = int(m.group(1))
        count = int(m.group(2)) if m.group(2) is not None else 1
        if count == 0:
            # pure deletion: the new-side anchor is the line *before* the
            # removed span, so the removed code sat between `start` and
            # `start + 1`; taint both so a deletion inside entity A whose
            # anchor falls on A's last line (or between two entities)
            # attributes to the right neighbour in both directions
            lines.update({ln for ln in (start, start + 1) if ln >= 1})
        else:
            lines.update(range(start, start + count))
    return lines


def module_name(relpath: str) -> str:
    return relpath[: -len(".py")].replace("/", ".").removesuffix(".__init__")


class _ModInfo:
    """Parsed shape of one package module for the taint engine."""

    def __init__(self) -> None:
        self.entities: dict[str, tuple[int, int]] = {}
        # entity -> (plain names referenced, (root, attr) pairs referenced)
        self.refs: dict[str, tuple[set[str], set[tuple[str, str]]]] = {}
        # local name -> ("name", src_module, orig) | ("module", src_module)
        self.bindings: dict[str, tuple] = {}
        self.star_from: set[str] = set()
        self.src_lines: list[str] = []


def _names_in(node) -> tuple[set[str], set[tuple[str, str]]]:
    plain: set[str] = set()
    attrs: set[tuple[str, str]] = set()
    for n in ast.walk(node):
        if isinstance(n, ast.Name):
            plain.add(n.id)
        elif isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
            attrs.add((n.value.id, n.attr))
    return plain, attrs


def _parse_package() -> dict[str, _ModInfo]:
    mods: dict[str, _ModInfo] = {}
    paths: dict[str, str] = {}
    for path in glob.glob(os.path.join(REPO, PKG, "**", "*.py"), recursive=True):
        rel = os.path.relpath(path, REPO)
        paths[module_name(rel)] = path
    real = set(paths)
    for mod, path in paths.items():
        info = _ModInfo()
        info.src_lines = open(path).read().splitlines()
        tree = ast.parse("\n".join(info.src_lines))
        pkg_parts = mod.split(".")
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for a in node.names:
                    if not a.name.startswith(PKG):
                        continue
                    local = a.asname or a.name.split(".")[0]
                    target = a.name if a.asname else a.name.split(".")[0]
                    if target in real:
                        info.bindings[local] = ("module", target)
            elif isinstance(node, ast.ImportFrom):
                if node.level:
                    stem = ".".join(pkg_parts[: len(pkg_parts) - node.level])
                    if node.module:
                        stem += "." + node.module
                else:
                    stem = node.module or ""
                if not stem.startswith(PKG):
                    continue
                for a in node.names:
                    if a.name == "*":
                        info.star_from.add(stem)
                        continue
                    local = a.asname or a.name
                    sub = stem + "." + a.name
                    if sub in real:
                        info.bindings[local] = ("module", sub)
                    elif stem in real:
                        info.bindings[local] = ("name", stem, a.name)
        for node in tree.body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                start = min(
                    [node.lineno] + [d.lineno for d in node.decorator_list]
                )
                bound = [node.name]
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                start = node.lineno
                targets = (
                    node.targets if isinstance(node, ast.Assign) else [node.target]
                )
                bound = [t.id for t in targets if isinstance(t, ast.Name)]
            elif isinstance(node, (ast.Import, ast.ImportFrom)):
                start = node.lineno
                bound = []
                if isinstance(node, ast.Import):
                    bound = [(a.asname or a.name).split(".")[0] for a in node.names]
                else:
                    bound = [(a.asname or a.name) for a in node.names if a.name != "*"]
            else:
                start, bound = node.lineno, []
            if not bound:
                continue
            body = _names_in(node)
            for name in bound:
                info.entities[name] = (start, node.end_lineno)
                info.refs[name] = (body[0] - {name}, body[1])
        mods[mod] = info
    return mods


def _semantic_lines(info: _ModInfo, touched: set[int]) -> set[int]:
    """Drop blank and comment-only lines -- they live outside every AST
    span and are non-semantic, so they must not trigger the whole-module
    fallback."""
    out = set()
    for ln in touched:
        if ln <= len(info.src_lines):
            s = info.src_lines[ln - 1].strip()
            if s and not s.startswith("#"):
                out.add(ln)
    return out


def compute_tainted(
    mods: dict[str, _ModInfo], diff_touched: dict[str, set[int]]
) -> dict[str, set[str] | None]:
    """module -> tainted entity names (None = whole module tainted).
    Seeds from diff-touched entity spans, then propagates through
    references to a global fixpoint."""
    tainted: dict[str, set[str] | None] = {}
    for mod, touched in diff_touched.items():
        info = mods[mod]
        touched = _semantic_lines(info, touched)
        if not touched:
            continue
        covered = set()
        hit = set()
        for name, (a, b) in info.entities.items():
            span = {ln for ln in touched if a <= ln <= b}
            covered |= span
            if span:
                hit.add(name)
        if touched - covered:
            tainted[mod] = None  # bare module-level statement changed
        else:
            tainted[mod] = hit

    def is_tainted(mod: str, name: str) -> bool:
        t = tainted.get(mod, set())
        return t is None or name in t

    grew = True
    while grew:
        grew = False
        for mod, info in mods.items():
            if tainted.get(mod, set()) is None:
                continue
            if any(tainted.get(s, set()) != set() for s in info.star_from if
                   tainted.get(s) is not None) or any(
                tainted.get(s) is None for s in info.star_from
            ):
                tainted[mod] = None
                grew = True
                continue
            cur = set(tainted.get(mod) or set())
            # local names whose import source is tainted
            tloc = set()
            aliases: dict[str, str] = {}
            for local, bind in info.bindings.items():
                if bind[0] == "module":
                    aliases[local] = bind[1]
                    continue
                _, src, orig = bind
                if is_tainted(src, orig):
                    tloc.add(local)
            # seed import-binding entities themselves: a module that
            # re-exports a tainted name (e.g. a package __init__ doing
            # `from .x import foo`) has `foo` as an entity with no refs,
            # so the ref fixpoint alone never taints it and downstream
            # importers of the re-export would see is_tainted(..)=False
            new = set(cur) | (tloc & set(info.entities))
            stable = False
            while not stable:
                stable = True
                for name, (plain, attrs) in info.refs.items():
                    if name in new:
                        continue
                    if plain & (tloc | new):
                        new.add(name)
                        stable = False
                        continue
                    for root, attr in attrs:
                        if root in aliases and is_tainted(aliases[root], attr):
                            new.add(name)
                            stable = False
                            break
            if new != cur:
                tainted[mod] = new
                grew = True
    return tainted


_QUERY_FNS: dict[str, tuple[str, str]] | None = None


def _query_fns() -> dict[str, tuple[str, str]]:
    """registered query name -> (plan module, plan function __name__)."""
    global _QUERY_FNS
    if _QUERY_FNS is None:
        from sqldataintegrationfunctiontriggerapp_spark import plans

        _QUERY_FNS = {}
        for q, fn in plans.QUERIES.items():
            rel = os.path.relpath(inspect.getsourcefile(fn), REPO)
            _QUERY_FNS[q] = (module_name(rel), fn.__name__)
    return _QUERY_FNS


def changed_query_set(base: str) -> dict[str, str]:
    """query -> reason, for every registered query whose code changed vs
    `base` under the entity-level taint propagation (or that has never
    been driver-checked)."""
    _, seen = last_green_rounds()
    mods = _parse_package()
    diff_touched = {
        module_name(f): new_side_lines(base, f)
        for f in changed_package_files(base)
        if module_name(f) in mods
    }
    tainted = compute_tainted(mods, diff_touched)

    changed: dict[str, str] = {}
    for q, (mod, fn_name) in _query_fns().items():
        t = tainted.get(mod, set())
        if t is None:
            changed[q] = f"module-level diff taints all of {mod}"
        elif fn_name in t:
            src = "directly diffed" if mod in diff_touched else "via imports"
            changed[q] = f"taint reaches {fn_name} in {mod} ({src})"
    for q in _query_fns():
        if q not in seen:
            changed.setdefault(q, "never driver-checked (new)")
    return changed


def main() -> int:
    args = sys.argv[1:]
    base = None
    dry = "--dry-run" in args
    if "--base" in args:
        base = args[args.index("--base") + 1]
    if base is None:
        base = round_base_commit()

    from sqldataintegrationfunctiontriggerapp_spark import plans

    registry = list(plans.QUERIES)  # insertion order = tie-break
    green, _ = last_green_rounds()
    changed_queries = changed_query_set(base)

    def stale_key(q: str) -> tuple[int, int]:
        return (green.get(q, -1), registry.index(q))

    head = sorted(changed_queries, key=stale_key)
    tail = sorted((q for q in registry if q not in changed_queries), key=stale_key)
    order = head + tail

    by_round: dict[int, int] = {}
    for q in registry:
        by_round[green.get(q, -1)] = by_round.get(green.get(q, -1), 0) + 1
    summary = ", ".join(
        f"r{r:02d}: {n}" if r >= 0 else f"never: {n}"
        for r, n in sorted(by_round.items())
    )

    body = [
        '"""GENERATED by tools/gen_sweep.py -- do not edit by hand.',
        "",
        f"Derived from CORRECTNESS_r*.json + git diff vs {base[:12]}",
        f"({git('log', '-1', '--format=%s', base).strip()}).",
        f"Evidence staleness at generation: {summary}.",
        f"Changed-code head ({len(head)} queries):",
    ]
    for q in head:
        body.append(f"  {q}: {changed_queries[q]}")
    body.append('"""')
    body.append("")
    body.append("SWEEP_PRIORITY = [")
    for q in order:
        body.append(f"    {q!r},")
    body.append("]")
    text = "\n".join(body) + "\n"
    if dry:
        print(text)
    else:
        with open(OUT, "w") as f:
            f.write(text)
        print(f"wrote {OUT}: {len(order)} queries, head {len(head)} changed")
        print("first 50 (the likely driver budget):")
        for q in order[:50]:
            tag = "CHANGED" if q in changed_queries else f"r{green.get(q, -1):02d}"
            print(f"  {tag:>8}  {q}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
