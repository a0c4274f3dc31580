"""Driver-row staleness audit (VERDICT r5 item 7).

Answers the closeout question the round-5 verdict graded by hand: does
every registered query have a driver CORRECTNESS row that POSTDATES its
last code-or-oracle change? Two parts:

1. **AST diff vs a base ref** — for every ``@register``-decorated
   function across the queries modules, compare a normalized AST dump
   (decorators INCLUDING the oracle-SQL literal, plus the function
   body with its docstring stripped, so doc-only edits don't count)
   between ``git show <base>:<file>`` and the working tree.
2. **Latest-green lookup** — scan CORRECTNESS_r*.json for each entry's
   most recent driver round.

An entry is STALE when its AST changed vs the base ref (take the base
as the commit the last driver round ran against — by convention the
round's ``verdict/advice/correctness/bench`` commit) — those entries
must lead the next ``_DRIVER_WINDOW_FIRST`` window. Helper-level edits
(a function the query calls, outside the decorated body) are NOT
caught, the same limitation the round-5 hand audit had; when a shared
helper changes semantics, add its consumers to the window by hand (see
the round-6 window's block 2 for the pattern).

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

QUERY_FILES = [
    "imp_etl_spark/queries.py",
    "imp_etl_spark/queries_analytics.py",
    "imp_etl_spark/queries_corpus.py",
    "imp_etl_spark/queries_llm.py",
    "imp_etl_spark/queries_scalar.py",
    "imp_etl_spark/queries_tpch.py",
]


def _registered_funcs(source: str) -> dict[str, str]:
    """name -> normalized AST dump of each @register-decorated function
    (docstring removed; decorator list — including the oracle SQL
    string literal — retained)."""
    out: dict[str, str] = {}
    tree = ast.parse(source)
    for node in ast.walk(tree):
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        for dec in node.decorator_list:
            if (isinstance(dec, ast.Call)
                    and getattr(dec.func, "id", "") == "register"
                    and dec.args
                    and isinstance(dec.args[0], ast.Constant)):
                name = dec.args[0].value
                body = list(node.body)
                if (body and isinstance(body[0], ast.Expr)
                        and isinstance(body[0].value, ast.Constant)
                        and isinstance(body[0].value.value, str)):
                    body = body[1:]  # drop the docstring
                clone = ast.FunctionDef(
                    name=node.name, args=node.args, body=body,
                    decorator_list=node.decorator_list, returns=None,
                    type_comment=None, type_params=[])
                out[name] = ast.dump(ast.fix_missing_locations(
                    ast.copy_location(clone, node)))
    return out


def _at_ref(repo: str, ref: str, path: str) -> str:
    try:
        return subprocess.run(
            ["git", "-C", repo, "show", f"{ref}:{path}"],
            capture_output=True, text=True, check=True).stdout
    except subprocess.CalledProcessError:
        return ""  # file did not exist at base -> everything is "new"


def latest_green_rounds(repo: str) -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int("".join(ch for ch in os.path.basename(f) if ch.isdigit()))
        for name in json.load(open(f)):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def audit(repo: str, base_ref: str):
    changed: list[str] = []
    head_names: set[str] = set()
    for path in QUERY_FILES:
        head_src = open(os.path.join(repo, path)).read()
        base_src = _at_ref(repo, base_ref, path)
        head = _registered_funcs(head_src)
        base = _registered_funcs(base_src) if base_src else {}
        head_names |= set(head)
        changed += [n for n, dump in head.items() if base.get(n) != dump]
    sys.path.insert(0, repo)
    from imp_etl_spark.queries import REGISTRY

    window = list(REGISTRY)
    pos = {n: i + 1 for i, n in enumerate(window)}
    latest = latest_green_rounds(repo)
    return {
        "base_ref": base_ref,
        "registered": len(head_names),
        "changed_since_base": sorted(changed),
        "stale_outside_window": sorted(
            n for n in changed if pos.get(n, 10**9) > 50),
        "never_driver_rowed": sorted(head_names - set(latest)),
        "window_pos": {n: pos.get(n) for n in sorted(changed)},
        "latest_green": {n: latest.get(n) for n in sorted(changed)},
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
