"""Sandboxed execution of user-supplied feature code.

Same contract as the reference (``transform/enrichment.py:31-93``): the
code receives ``g`` (the per-entity pandas DataFrame) plus ``np``,
``pd``, ``math``, ``random``, and must assign a pandas Series to
``series``. Security parity with the reference's RestrictedPython setup
(``transform/tests/test_custom_features.py:191-301``): imports, dunder
access, eval/exec/open/compile and introspection builtins are all
rejected — here via AST screening before exec with a whitelisted
builtins table (RestrictedPython is not vendored in this environment).
"""

from __future__ import annotations

import ast
import math
import random

_FORBIDDEN_CALLS = {
    "eval", "exec", "open", "compile", "__import__", "globals", "locals",
    "vars", "getattr", "setattr", "delattr", "input", "breakpoint", "exit",
    "quit", "memoryview", "classmethod", "staticmethod", "super", "type",
}

_SAFE_BUILTINS = {
    "abs": abs, "all": all, "any": any, "bool": bool, "dict": dict,
    "enumerate": enumerate, "filter": filter, "float": float, "int": int,
    "len": len, "list": list, "map": map, "max": max, "min": min,
    "pow": pow, "range": range, "round": round, "set": set, "sorted": sorted,
    "str": str, "sum": sum, "tuple": tuple, "zip": zip, "divmod": divmod,
    "isinstance": isinstance, "repr": repr, "reversed": reversed,
    "True": True, "False": False, "None": None,
}


class SandboxViolation(ValueError):
    pass


def check_code(code: str) -> None:
    """Raise SandboxViolation for any disallowed construct."""
    tree = ast.parse(code)
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            raise SandboxViolation("imports are not allowed in custom feature code")
        if isinstance(node, ast.Attribute) and node.attr.startswith("__"):
            raise SandboxViolation(f"dunder attribute access is not allowed: {node.attr}")
        if isinstance(node, ast.Name):
            if node.id.startswith("__"):
                raise SandboxViolation(f"dunder name is not allowed: {node.id}")
            if isinstance(node.ctx, ast.Load) and node.id in _FORBIDDEN_CALLS:
                raise SandboxViolation(f"use of '{node.id}' is not allowed")
        if isinstance(node, (ast.Global, ast.Nonlocal)):
            raise SandboxViolation("global/nonlocal are not allowed")


def run_sandboxed(code: str, g):
    """Execute custom feature code against group DataFrame ``g``; returns
    the ``series`` the code assigned."""
    import numpy as np
    import pandas as pd

    check_code(code)
    env = {
        "__builtins__": dict(_SAFE_BUILTINS),
        "g": g, "np": np, "pd": pd, "math": math, "random": random,
    }
    exec(compile(code, "<custom_feature>", "exec"), env)  # noqa: S102 — AST-screened above
    if "series" not in env:
        raise ValueError("custom feature code must assign a pandas Series to `series`")
    return env["series"]
