"""Derive the driver sweep order from hard evidence instead of narration
(VERDICT r08 #5): the rotation that used to live as ~140 lines of
hand-maintained prose in `__spark_entry__.py` is generated from

  1. the CORRECTNESS_r*.json history -- each registered query's latest
     GREEN round (rows+schema+hash, no err), and
  2. the round's changed-code set -- `git diff` against the driver's
     round-boundary commit (latest commit titled "round N: ..."),
     resolved to queries two ways:
       * a changed PLAN module pulls the specific queries whose function
         spans intersect the diff hunks (a change outside every query
         function -- a shared helper -- conservatively pulls the whole
         module's queries);
       * a changed NON-plan package module (operators/, functions/,
         sources/, sinks/, streaming/, ...) pulls every query whose plan
         module transitively imports it (AST import graph).
     Queries never seen in any CORRECTNESS file (new this round) join the
     changed set.

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
    # include staged-but-uncommitted and committed-since-base alike (diff
    # against the worktree covers both)
    return sorted(f for f in files if f.startswith(PKG + "/") and f.endswith(".py"))


def new_side_lines(base: str, path: str) -> set[int]:
    """Line numbers (new side) touched by the diff for `path`."""
    out = git("diff", "-U0", base, "--", path)
    lines: set[int] = set()
    for m in re.finditer(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", out, re.M):
        start = int(m.group(1))
        count = int(m.group(2)) if m.group(2) is not None else 1
        # a pure deletion has count 0; mark the anchor line so a helper
        # removed from between two functions still registers as a change
        lines.update(range(start, start + max(count, 1)))
    return lines


def module_name(relpath: str) -> str:
    return relpath[: -len(".py")].replace("/", ".").removesuffix(".__init__")


def import_graph() -> dict[str, set[str]]:
    """module -> set of intra-package modules it imports (direct)."""
    graph: dict[str, set[str]] = {}
    packages: set[str] = set()
    for path in glob.glob(os.path.join(REPO, PKG, "**", "*.py"), recursive=True):
        rel = os.path.relpath(path, REPO)
        mod = module_name(rel)
        if rel.endswith("__init__.py"):
            packages.add(mod)
        deps: set[str] = set()
        tree = ast.parse(open(path).read())
        pkg_parts = mod.split(".")
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for a in node.names:
                    if a.name.startswith(PKG):
                        deps.add(a.name)
            elif isinstance(node, ast.ImportFrom):
                if node.level:  # relative import
                    basemod = ".".join(pkg_parts[: len(pkg_parts) - node.level])
                    stem = basemod + ("." + node.module if node.module else "")
                else:
                    stem = node.module or ""
                if not stem.startswith(PKG):
                    continue
                deps.add(stem)
                # `from X import y` may bind submodule X.y
                for a in node.names:
                    deps.add(stem + "." + a.name)
        graph[mod] = deps
    # keep only names that are real modules, and drop bare PACKAGE
    # (__init__) targets: a package re-exporting its submodules would make
    # `from . import x` look like a dependency on every sibling. The
    # explicit submodule binding (stem + "." + name) is already an edge,
    # so dropping the package node loses nothing real.
    real = set(graph)
    return {
        m: {d for d in deps if d in real and d not in packages}
        for m, deps in graph.items()
    }


def transitive_importers(graph: dict[str, set[str]], targets: set[str]) -> set[str]:
    """All modules that (transitively) import any target module."""
    hit = set(targets)
    changed = True
    while changed:
        changed = False
        for mod, deps in graph.items():
            if mod not in hit and deps & hit:
                hit.add(mod)
                changed = True
    return hit


def changed_query_set(base: str) -> dict[str, str]:
    """query -> reason, for every registered query whose code changed vs
    `base` (plan-function diff intersection, transitive import of a
    changed non-plan module, or never driver-checked)."""
    from sqldataintegrationfunctiontriggerapp_spark import plans

    _, seen = last_green_rounds()
    spans: dict[str, tuple[str, int, int]] = {}
    for name, fn in plans.QUERIES.items():
        src = os.path.relpath(inspect.getsourcefile(fn), REPO)
        lines, start = inspect.getsourcelines(fn)
        spans[name] = (src, start, start + len(lines) - 1)
    plan_files = {src for src, _, _ in spans.values()}

    changed_files = changed_package_files(base)
    graph = import_graph()

    changed_queries: dict[str, str] = {}
    nonplan_mods = set()
    for f in changed_files:
        if f in plan_files:
            touched = new_side_lines(base, f)
            file_spans = [
                (q, a, b) for q, (src, a, b) in spans.items() if src == f
            ]
            in_any = set()
            for q, a, b in file_spans:
                if any(a <= ln <= b for ln in touched):
                    changed_queries.setdefault(q, f"diff in {f}:{a}-{b}")
                    in_any.update(ln for ln in touched if a <= ln <= b)
            if touched - in_any:
                # change outside every query function: shared helper --
                # conservatively everything in the module is affected
                for q, _, _ in file_spans:
                    changed_queries.setdefault(q, f"shared-helper diff in {f}")
        else:
            nonplan_mods.add(module_name(f))
    if nonplan_mods:
        affected_mods = transitive_importers(graph, nonplan_mods)
        for q, (src, _, _) in spans.items():
            if module_name(src) in affected_mods:
                changed_queries.setdefault(
                    q, f"imports changed module(s) {sorted(nonplan_mods)}"
                )
    for q in plans.QUERIES:
        if q not in seen:
            changed_queries.setdefault(q, "never driver-checked (new)")
    return changed_queries


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
