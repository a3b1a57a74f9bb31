"""Sandbox security parity (reference transform/tests/test_custom_features.py:191-301):
file access, imports, eval/exec, introspection all blocked; legitimate
numeric code runs."""

from __future__ import annotations

import pandas as pd
import pytest

from dynamic_etl_pipeline_thesis_ii_spark.functions.sandbox import (
    SandboxViolation,
    run_sandboxed,
)

G = pd.DataFrame({"close": [1.0, 2.0, 3.0], "volume": [10.0, 20.0, 30.0]})


def test_functional_single_line():
    out = run_sandboxed("series = g['close'] * 2", G)
    assert list(out) == [2.0, 4.0, 6.0]


def test_functional_multiline():
    code = "tmp = g['close'] + g['volume']\nseries = tmp / 2"
    out = run_sandboxed(code, G)
    assert list(out) == [5.5, 11.0, 16.5]


def test_numpy_available():
    out = run_sandboxed("series = np.log(g['close'])", G)
    assert out.iloc[0] == 0.0


def test_must_assign_series():
    with pytest.raises(ValueError, match="series"):
        run_sandboxed("x = g['close']", G)


@pytest.mark.parametrize("code", [
    "import os\nseries = g['close']",
    "from os import path\nseries = g['close']",
    "series = eval('1+1') * g['close']",
    "exec('x=1')\nseries = g['close']",
    "series = open('/etc/passwd').read()",
    "series = __import__('os').listdir('.')",
    "series = g['close'].__class__.__mro__",
    "series = getattr(g, 'values')",
    "series = globals()",
    "series = type(g).mro()",
])
def test_blocked(code):
    with pytest.raises(SandboxViolation):
        run_sandboxed(code, G)

# --- attribute-allowlist hardening (pd/np proxied roots) --------------------

@pytest.mark.parametrize("code", [
    # module traversal to the OS through a non-dunder chain
    "series = pd.io.common.os.system('id') * g['close']",
    # pickle-based code execution
    "series = pd.read_pickle('/tmp/x.pkl')",
    "pd.to_pickle(g, '/tmp/x.pkl')\nseries = g['close']",
    # string-evaluating pandas entry points (bypass AST screening)
    "series = g.eval('close * 2')",
    "series = g.query('close > 1')['close']",
    # disallowed np attribute (submodule)
    "series = np.lib.utils * g['close']",
])
def test_blocked_attribute_vectors(code):
    with pytest.raises(SandboxViolation):
        run_sandboxed(code, G)


def test_allowed_pd_np_surface_still_works():
    out = run_sandboxed(
        "tmp = pd.concat([g['close'], g['volume']], axis=1)\n"
        "series = pd.Series(np.clip(np.array(tmp.sum(axis=1)), 0, 25))", G)
    assert list(out) == [11.0, 22.0, 25.0]
