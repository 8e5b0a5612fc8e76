"""Structural guards for the 14k-line queries module.

The op registry has accreted across many sessions; a later session once
re-defined ``funnel_events`` / ``RANGE_JOIN_SQL`` unaware of the earlier
definitions, silently shadowing a registered op and pointing another op
at the WRONG SQL twin (the gate caught the schema mismatch, pytest the
shadowed function). These AST-level checks make that class of collision
a unit-test failure instead of an integration surprise.
"""

from __future__ import annotations

import ast
from collections import Counter
from pathlib import Path

QUERIES_PATH = Path(__file__).resolve().parents[1] / "pdf_toolkit_ray" / "queries.py"


def _module_ast() -> ast.Module:
    return ast.parse(QUERIES_PATH.read_text())


def test_no_duplicate_toplevel_definitions():
    tree = _module_ast()
    names: list[str] = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.append(node.name)
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    names.append(tgt.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names.append(node.target.id)
    dups = sorted(n for n, c in Counter(names).items() if c > 1)
    assert not dups, f"duplicate top-level definitions in queries.py: {dups}"


def test_no_duplicate_registry_keys():
    tree = _module_ast()
    for node in tree.body:
        if (
            isinstance(node, (ast.Assign, ast.AnnAssign))
            and isinstance(node.value, ast.Dict)
        ):
            tgt = node.targets[0] if isinstance(node, ast.Assign) else node.target
            if isinstance(tgt, ast.Name) and tgt.id == "REGISTRY":
                keys = [
                    k.value
                    for k in node.value.keys
                    if isinstance(k, ast.Constant)
                ]
                dups = sorted(k for k, c in Counter(keys).items() if c > 1)
                assert not dups, f"duplicate REGISTRY keys: {dups}"
                return
    raise AssertionError("REGISTRY dict literal not found in queries.py")


def test_registry_key_matches_function_name():
    # a key bound to a function with a different name is how shadowing
    # hides: the key keeps working while the intended op vanishes.
    # dedup_exact_online predates the rule and wraps a shared impl.
    from pdf_toolkit_ray.queries import REGISTRY

    allowed = {"dedup_exact_online"}
    bad = {
        k: fn.__name__
        for k, (fn, _) in REGISTRY.items()
        if k not in allowed and getattr(fn, "__name__", k) != k
    }
    assert not bad, f"registry keys bound to differently-named functions: {bad}"
