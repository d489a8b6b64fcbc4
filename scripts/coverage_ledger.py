"""Driver-coverage ledger: every registry row -> last driver-green round,
the automem_spark modules on its execution path, whether any of those
changed since that green row, and the resulting staleness.

The driver's correctness gate covers only the FIRST 50 of the registry's
~110 entries, so worst-case staleness spans multiple rounds. The rotation
in __spark_entry__.py:queries() is hand-ordered from exactly this table:
rows with `NEVER` or `STALE-PATH` status belong at the window head; rows
with `FRESH` status are safe to rotate out. Run per round and commit the
output:

    python scripts/coverage_ledger.py > COVERAGE.md

Execution-path discovery is static: each q_* function's source is scanned
for `automem_spark.*` module references (the registry style puts operator
imports inside the function body, which makes this reliable), then expanded
transitively through each module's own imports. File->round attribution
uses the driver's `round N:` marker commits: a file's last-change round is
the number of markers preceding the last commit that touched it.
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MOD_RE = re.compile(r"automem_spark(?:\.[a-zA-Z_][\w.]*)?")


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def commit_rounds() -> dict[str, int]:
    """Map every commit sha -> the round it belongs to (number of driver
    `round N:` markers at or before it; work after the `round N` marker
    belongs to round N+1)."""
    log = _git("log", "--first-parent", "--reverse", "--format=%H %s")
    out: dict[str, int] = {}
    rnd = 1
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        out[sha] = rnd
        m = re.match(r"round (\d+):", subject)
        if m:
            rnd = int(m.group(1)) + 1
    return out


def file_last_round(path: str, rounds: dict[str, int]) -> int:
    # --first-parent: commit_rounds only indexes mainline commits, so a file
    # last touched on a merged side branch must resolve to the merge commit
    # (not map to round 0 and report FRESH) — r6 advice.
    sha = _git("log", "--first-parent", "-1", "--format=%H", "--", path).strip()
    return rounds.get(sha, 0) if sha else 0


def module_files(modname: str) -> str | None:
    rel = modname.replace(".", "/")
    for cand in (f"{rel}.py", f"{rel}/__init__.py"):
        if os.path.exists(os.path.join(REPO, cand)):
            return cand
    return None


def transitive_modules(seed: set[str]) -> set[str]:
    """Expand module set through intra-package imports (AST import scan —
    docstrings citing sibling modules must not create phantom edges)."""
    import ast

    seen: set[str] = set()
    frontier = set(seed)
    while frontier:
        mod = frontier.pop()
        if mod in seen:
            continue
        seen.add(mod)
        f = module_files(mod)
        if not f:
            continue
        try:
            tree = ast.parse(open(os.path.join(REPO, f)).read())
        except SyntaxError:
            continue
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom) and node.module:
                if node.module.startswith("automem_spark"):
                    frontier.add(node.module)
            elif isinstance(node, ast.Import):
                for alias in node.names:
                    if alias.name.startswith("automem_spark"):
                        frontier.add(alias.name)
    return {m for m in seen if module_files(m)}


def function_modules(fn, entrymod) -> set[str]:
    """automem_spark modules reachable from a registry function: scans its
    source for module references, resolves referenced entry-module globals
    (helpers like q_* delegates and operator functions imported at the top
    of the entry file), and recurses through entry-local helpers."""
    import ast
    import textwrap
    import types

    # Identifier collection is AST-based (ast.Name / import statements), NOT
    # a regex over raw source: docstring prose would otherwise resolve
    # against entry globals (any function whose docstring says "queries"
    # would transitively pull the whole registry).
    skip = {"queries", "oracle_sql", "entry", "main"}
    seen_fns: set = set()
    mods: set[str] = set()
    stack = [fn]
    while stack:
        f = stack.pop()
        if f in seen_fns:
            continue
        seen_fns.add(f)
        try:
            src = textwrap.dedent(inspect.getsource(f))
            tree = ast.parse(src)
        except (OSError, TypeError, SyntaxError):
            continue
        idents: set[str] = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Name):
                idents.add(node.id)
            elif isinstance(node, ast.ImportFrom) and node.module:
                if node.module.startswith("automem_spark"):
                    mods.add(node.module)
            elif isinstance(node, ast.Import):
                for alias in node.names:
                    if alias.name.startswith("automem_spark"):
                        mods.add(alias.name)
        for ident in idents - skip:
            obj = entrymod.__dict__.get(ident)
            if obj is None:
                continue
            if isinstance(obj, types.FunctionType):
                m = getattr(obj, "__module__", None)
                if m == entrymod.__name__:
                    stack.append(obj)
                elif m and m.startswith("automem_spark"):
                    mods.add(m)
            elif isinstance(obj, types.ModuleType) and obj.__name__.startswith(
                "automem_spark"
            ):
                mods.add(obj.__name__)
    return mods


def last_green_rounds() -> dict[str, int]:
    green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.load(open(path))
        for name, row in data.items():
            ok = (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            if ok:
                green[name] = max(green.get(name, 0), rnd)
    return green


def main() -> None:
    import __spark_entry__ as entry

    rounds = commit_rounds()
    cur_round = max(rounds.values())
    green = last_green_rounds()
    qs = entry.queries()

    # cache per-file last-change rounds
    fcache: dict[str, int] = {}

    def fround(f: str) -> int:
        if f not in fcache:
            fcache[f] = file_last_round(f, rounds)
        return fcache[f]

    rows = []
    for pos, (name, fn) in enumerate(qs.items(), start=1):
        mods = transitive_modules(function_modules(fn, entry))
        files = sorted({module_files(m) for m in mods if module_files(m)})
        lg = green.get(name, 0)
        path_round = max((fround(f) for f in files), default=0)
        changed = sorted(f for f in files if fround(f) > lg)
        if lg == 0:
            status = "NEVER"
        elif changed:
            status = "STALE-PATH"
        else:
            status = "FRESH"
        rows.append(
            {
                "pos": pos,
                "name": name,
                "last_green": lg,
                "path_changed": path_round,
                "status": status,
                "in_window": pos <= 50,
                "files": files,
                "changed": changed,
            }
        )

    # A stale row OUTSIDE the window is acceptable when every changed file
    # on its path is also on the path of an IN-WINDOW row (the sibling's
    # driver row exercises the changed code this round — the convention the
    # r4/r5 rotations used informally; this makes it checkable).
    window_files: set[str] = set()
    for r in rows:
        if r["in_window"]:
            window_files.update(r["files"])
    for r in rows:
        if r["status"] == "STALE-PATH" and not r["in_window"]:
            uncov = [f for f in r["changed"] if f not in window_files]
            if not uncov:
                r["status"] = "SIBLING-COVERED"
            r["uncovered"] = uncov

    never = [r for r in rows if r["status"] == "NEVER"]
    stale = [r for r in rows if r["status"] == "STALE-PATH"]
    covered = [r for r in rows if r["status"] == "SIBLING-COVERED"]
    debt = [r for r in (never + stale) if not r["in_window"]]

    print(f"# Driver-coverage ledger (generated round {cur_round})")
    print()
    print(f"Registry rows: {len(rows)}; driver window: first 50.")
    print(
        f"NEVER driver-green: {len(never)}; STALE-PATH (a changed file on"
        f" the row's path is NOT exercised by any in-window row):"
        f" {len(stale)}; SIBLING-COVERED (stale but every changed file is"
        f" on an in-window row's path): {len(covered)}."
    )
    if debt:
        print()
        print(
            "**Rotation debt** (NEVER or STALE-PATH outside the window —"
            " should lead the next window): "
            + ", ".join(f"{r['name']} ({', '.join(r.get('uncovered', []) or r['changed'])})" for r in debt)
        )
    else:
        print()
        print(
            "**No rotation debt**: every never-verified or stale row is in"
            " the window, and every out-of-window stale row's changed files"
            " are exercised by in-window siblings."
        )
    print()
    print("| # | row | last green | path changed | status | in window | path files |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        files = ", ".join(f.replace("automem_spark/", "") for f in r["files"])
        print(
            f"| {r['pos']} | {r['name']} | r{r['last_green']:02d} |"
            f" r{r['path_changed']:02d} | {r['status']} |"
            f" {'yes' if r['in_window'] else 'no'} | {files} |"
        )


if __name__ == "__main__":
    main()
