"""Driver-row staleness audit (VERDICT r5 item 7).

Answers the closeout question the round-5 verdict graded by hand: does
every registered query have a driver CORRECTNESS row that POSTDATES its
last code-or-oracle change? Two parts:

1. **Transitive AST diff vs a base ref** — for every
   ``@register``-decorated function across the queries modules, compare
   a normalized AST dump (decorators INCLUDING the oracle-SQL literal,
   docstrings stripped so doc-only edits don't count) of the function
   PLUS its transitive call/reference closure over everything defined
   in the ``imp_etl_spark`` package — module-level helpers, constants,
   and classes — between ``git show <base>:<file>`` and the working
   tree. Closure membership is resolved by bare name (an ``ast.Call``'s
   ``Name``/``Attribute`` tail, plus every ``Name`` a body references,
   matched against package-level definitions), which over-approximates:
   a same-named definition in an unrelated module joins the closure and
   can flag a query that didn't really change. That direction of error
   is safe for an audit — it can only schedule an extra driver row,
   never miss one through a helper edit. (Genuinely dynamic dispatch —
   a helper resolved through a dict of functions, say — remains
   invisible; none of the registry uses that shape today.)
2. **Latest-green lookup** — scan CORRECTNESS_r*.json for each entry's
   most recent driver round.

An entry is STALE when its effective (closure) AST changed vs the base
ref (take the base as the commit the last driver round ran against —
by convention the round's ``verdict/advice/correctness/bench``
commit) — those entries must lead the next ``_DRIVER_WINDOW_FIRST``
window.

Usage:
    python tools/staleness_audit.py <base-ref> [--repo /root/repo]

Exit status 1 if any entry is stale AND not scheduled ahead of its
window position 51 (i.e. would miss the next 50-slot driver budget).
"""

from __future__ import annotations

import ast
import glob
import json
import os
import subprocess
import sys


def _strip_docstrings(node: ast.AST) -> ast.AST:
    """Remove the leading docstring Expr from every function, class and
    module body in-place, so documentation-only edits never flag."""
    for n in ast.walk(node):
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef,
                          ast.ClassDef, ast.Module)):
            body = getattr(n, "body", None)
            if (body and isinstance(body[0], ast.Expr)
                    and isinstance(body[0].value, ast.Constant)
                    and isinstance(body[0].value.value, str)):
                n.body = body[1:] or [ast.Pass()]
    return node


def _referenced_names(node: ast.AST) -> set[str]:
    """Bare names a definition might resolve against the package: every
    ``Name`` id plus every ``Attribute`` attr used as a call target."""
    deps: set[str] = set()
    for n in ast.walk(node):
        if isinstance(n, ast.Name):
            deps.add(n.id)
        elif isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute):
            deps.add(n.func.attr)
    return deps


def _index_source(source: str):
    """Index one module: (registered, defs, deps).

    registered: registry-name -> defining function's bare name
    defs: bare name -> list of normalized dumps (top-level functions,
          classes, and assigned constants; same-name collisions across
          modules merge conservatively)
    deps: bare name -> set of names its definition references
    """
    registered: dict[str, str] = {}
    defs: dict[str, list[str]] = {}
    deps: dict[str, set[str]] = {}

    def _add(name: str, dump: str, refs: set[str]) -> None:
        defs.setdefault(name, []).append(dump)
        deps.setdefault(name, set()).update(refs)

    tree = ast.parse(source)
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            clean = _strip_docstrings(ast.parse(ast.unparse(node)).body[0])
            _add(node.name, ast.dump(clean), _referenced_names(clean))
            for dec in node.decorator_list:
                if (isinstance(dec, ast.Call)
                        and getattr(dec.func, "id", "") == "register"
                        and dec.args
                        and isinstance(dec.args[0], ast.Constant)):
                    registered[dec.args[0].value] = node.name
        elif isinstance(node, ast.ClassDef):
            clean = _strip_docstrings(ast.parse(ast.unparse(node)).body[0])
            _add(node.name, ast.dump(clean), _referenced_names(clean))
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    _add(t.id, ast.dump(node.value),
                         _referenced_names(node.value))
        elif (isinstance(node, ast.AnnAssign)
                and isinstance(node.target, ast.Name)
                and node.value is not None):
            _add(node.target.id, ast.dump(node.value),
                 _referenced_names(node.value))
    return registered, defs, deps


def _pkg_files(repo: str, ref: str | None):
    """(path -> source) for every package .py file, at HEAD (working
    tree) or at a git ref."""
    if ref is None:
        return {p: open(os.path.join(repo, p)).read()
                for p in sorted(glob.glob("imp_etl_spark/**/*.py",
                                          root_dir=repo, recursive=True))}
    out: dict[str, str] = {}
    ls = subprocess.run(
        ["git", "-C", repo, "ls-tree", "-r", "--name-only", ref,
         "imp_etl_spark"],
        capture_output=True, text=True)
    if ls.returncode != 0:
        raise RuntimeError(
            f"git ls-tree {ref} failed: {ls.stderr.strip()!r} — "
            "refusing to audit against a half-read base (a silently "
            "empty base index would mark every query 'unchanged')")
    # splitlines, not split: a path containing spaces must stay one path
    for p in ls.stdout.splitlines():
        if p.endswith(".py"):
            show = subprocess.run(
                ["git", "-C", repo, "show", f"{ref}:{p}"],
                capture_output=True, text=True)
            if show.returncode != 0:
                # Safe direction (module docstring): unreadable base
                # source must read as CHANGED, never silently absent —
                # an empty string SyntaxErrors nothing and parses to an
                # empty module, so inject a sentinel that can't match
                # any real definition dump.
                raise RuntimeError(
                    f"git show {ref}:{p} failed: {show.stderr.strip()!r}")
            out[p] = show.stdout
    return out


def _index_tree(repo: str, ref: str | None):
    registered: dict[str, str] = {}
    defs: dict[str, list[str]] = {}
    deps: dict[str, set[str]] = {}
    for _path, src in _pkg_files(repo, ref).items():
        try:
            reg, d, dp = _index_source(src)
        except SyntaxError:
            continue
        registered.update(reg)
        for k, v in d.items():
            defs.setdefault(k, []).extend(v)
        for k, v in dp.items():
            deps.setdefault(k, set()).update(v)
    return registered, defs, deps


def _effective(func_name: str, defs, deps) -> str:
    """Normalized dump of a function plus its transitive closure over
    package-level definitions, order-independent."""
    seen: set[str] = set()
    frontier = [func_name]
    while frontier:
        n = frontier.pop()
        if n in seen or n not in defs:
            continue
        seen.add(n)
        frontier.extend(deps.get(n, ()))
    return "\n".join(f"{n}:{d}" for n in sorted(seen)
                     for d in sorted(defs[n]))


def latest_green_rounds(repo: str) -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int("".join(ch for ch in os.path.basename(f) if ch.isdigit()))
        for name in json.load(open(f)):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def audit(repo: str, base_ref: str):
    head_reg, head_defs, head_deps = _index_tree(repo, None)
    base_reg, base_defs, base_deps = _index_tree(repo, base_ref)
    changed = sorted(
        reg_name for reg_name, fn in head_reg.items()
        if reg_name not in base_reg
        or _effective(fn, head_defs, head_deps)
        != _effective(base_reg[reg_name], base_defs, base_deps))
    sys.path.insert(0, repo)
    from imp_etl_spark.queries import REGISTRY

    window = list(REGISTRY)
    pos = {n: i + 1 for i, n in enumerate(window)}
    latest = latest_green_rounds(repo)
    return {
        "base_ref": base_ref,
        "registered": len(head_reg),
        "changed_since_base": changed,
        "stale_outside_window": sorted(
            n for n in changed if pos.get(n, 10**9) > 50),
        "never_driver_rowed": sorted(set(head_reg) - set(latest)),
        "window_pos": {n: pos.get(n) for n in changed},
        "latest_green": {n: latest.get(n) for n in changed},
    }


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    base = sys.argv[1]
    repo = "/root/repo"
    if "--repo" in sys.argv:
        repo = sys.argv[sys.argv.index("--repo") + 1]
    report = audit(repo, base)
    print(json.dumps(report, indent=2))
    return 1 if (report["stale_outside_window"]
                 or report["never_driver_rowed"]) else 0


if __name__ == "__main__":
    sys.exit(main())
