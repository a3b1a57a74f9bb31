"""Sandboxed execution of user-supplied feature code.

Same contract as the reference (``transform/enrichment.py:31-93``): the
code receives ``g`` (the per-entity pandas DataFrame) plus ``np``,
``pd``, ``math``, ``random``, and must assign a pandas Series to
``series``. The guards EXCEED the reference's RestrictedPython setup
(``transform/tests/test_custom_features.py:191-301``): imports, dunder
access, eval/exec/open/compile and introspection builtins are rejected
via AST screening; additionally the ``pd``/``np`` roots are proxied
behind attribute allowlists (the reference exposes the raw modules, so
``pd.io.common.os.system`` / ``pd.read_pickle`` style escapes work
there) and string-evaluating pandas entry points (``.eval``/``.query``/
pickle IO) are blocked by attribute name.

RESIDUAL RISK: objects returned by allowed calls (e.g. a real
``pd.Series``) are not proxied, so an attribute chain through their
non-dunder internals could still reach interpreter state. This sandbox
is meant for trusted-but-fallible analyst code, not adversarial input;
run genuinely untrusted code in an OS-level sandbox (separate
container/seccomp), not in-process.
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


# pandas/DataFrame entry points that evaluate strings or unpickle —
# arbitrary-code-execution vectors even through an allowlisted root
_FORBIDDEN_ATTRS = {
    "eval", "query", "read_pickle", "to_pickle", "read_clipboard", "io",
}

# attributes reachable on the proxied `pd` root
_PD_ALLOWED = {
    "DataFrame", "Series", "Index", "Categorical", "NamedAgg",
    "Timestamp", "Timedelta", "NaT", "NA",
    "concat", "merge", "pivot_table", "get_dummies",
    "to_numeric", "to_datetime", "isna", "notna", "isnull", "notnull",
    "date_range", "cut", "qcut", "unique", "factorize",
}

# attributes reachable on the proxied `np` root (array math only — no
# submodules; `random` is provided as the stdlib module separately)
_NP_ALLOWED = {
    "array", "arange", "linspace", "zeros", "ones", "full", "where",
    "select", "abs", "sign", "log", "log1p", "log2", "log10", "exp",
    "sqrt", "square", "power", "clip", "minimum", "maximum", "mean",
    "std", "var", "median", "percentile", "quantile", "sum", "prod",
    "cumsum", "cumprod", "diff", "gradient", "round", "floor", "ceil",
    "isnan", "isfinite", "isinf", "nan_to_num", "nanmean", "nanstd",
    "nansum", "nanmin", "nanmax", "nanmedian", "nan", "inf", "pi", "e",
    "float64", "int64", "bool_", "dot", "sort", "argsort", "argmin",
    "argmax", "searchsorted", "repeat", "tile", "concatenate",
}


class _SafeModule:
    """Attribute-allowlist proxy over a module root."""

    def __init__(self, mod, allowed: set[str]):
        object.__setattr__(self, "_mod", mod)
        object.__setattr__(self, "_allowed", allowed)

    def __getattr__(self, name: str):
        if name.startswith("_") or name not in self._allowed:
            raise SandboxViolation(
                f"attribute '{name}' is not allowed on {self._mod.__name__}")
        return getattr(self._mod, name)

    def __setattr__(self, name, value):
        raise SandboxViolation("module attributes are read-only in the sandbox")


def check_code(code: str) -> None:
    """Raise SandboxViolation for any disallowed construct."""
    tree = ast.parse(code)
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            raise SandboxViolation("imports are not allowed in custom feature code")
        if isinstance(node, ast.Attribute) and node.attr.startswith("__"):
            raise SandboxViolation(f"dunder attribute access is not allowed: {node.attr}")
        if isinstance(node, ast.Attribute) and node.attr in _FORBIDDEN_ATTRS:
            raise SandboxViolation(
                f"attribute '{node.attr}' is not allowed (string-eval/pickle vector)")
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
        "g": g,
        "np": _SafeModule(np, _NP_ALLOWED),
        "pd": _SafeModule(pd, _PD_ALLOWED),
        "math": math, "random": random,
    }
    exec(compile(code, "<custom_feature>", "exec"), env)  # noqa: S102 — AST-screened above
    if "series" not in env:
        raise ValueError("custom feature code must assign a pandas Series to `series`")
    return env["series"]
