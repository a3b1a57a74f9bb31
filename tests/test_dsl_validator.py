"""DSL validator semantics parity (reference transform/tests/test_dsl_validator.py)."""

from __future__ import annotations

import json

from dynamic_etl_pipeline_thesis_ii_spark.functions.dsl import validate_dsl
from dynamic_etl_pipeline_thesis_ii_spark.functions.registry import FEATURE_REGISTRY


def _v(features):
    return validate_dsl(json.dumps({"features": features}), FEATURE_REGISTRY)


def test_valid_with_defaults_filled():
    dsl, errors = _v([{"name": "rsi", "params": {}}])
    assert errors == []
    assert dsl["features"][0]["params"] == {"on": "close", "window": 14}


def test_macd_defaults():
    dsl, errors = _v([{"name": "macd", "params": {"on": "close"}}])
    assert errors == []
    p = dsl["features"][0]["params"]
    assert (p["fast_period"], p["slow_period"], p["signal_period"]) == (12, 26, 9)


def test_malformed_json():
    dsl, errors = validate_dsl("not json{", FEATURE_REGISTRY)
    assert dsl is None and len(errors) == 1


def test_missing_features_key():
    dsl, errors = validate_dsl(json.dumps({"recipes": []}), FEATURE_REGISTRY)
    assert dsl is None and "features" in errors[0]


def test_unknown_feature():
    dsl, errors = _v([{"name": "hyperwavelet", "params": {}}])
    assert dsl is None and "Not a supported feature" in errors[0]


def test_unknown_param():
    dsl, errors = _v([{"name": "sma", "params": {"on": "close", "window": 5, "bogus": 1}}])
    assert dsl is None and "'bogus'" in errors[0]


def test_missing_required_param():
    dsl, errors = _v([{"name": "sma", "params": {"on": "close"}}])
    assert dsl is None and "'window'" in errors[0]


def test_type_check_int():
    dsl, errors = _v([{"name": "sma", "params": {"on": "close", "window": "five"}}])
    assert dsl is None and "must be an integer" in errors[0]


def test_type_check_string():
    dsl, errors = _v([{"name": "sma", "params": {"on": 7, "window": 5}}])
    assert dsl is None and "must be a string" in errors[0]


def test_allowed_values():
    dsl, errors = _v([{"name": "sma", "params": {"on": "bid", "window": 5}}])
    assert dsl is None and "must be one of" in errors[0]


def test_custom_feature_requires_code_and_as():
    dsl, errors = _v([{"name": "custom_x", "params": {}}])
    assert dsl is None
    assert any("'code'" in e for e in errors) and any("'as'" in e for e in errors)


def test_custom_feature_syntax_check():
    dsl, errors = _v([{"name": "custom_x", "params": {"code": "series = (", "as": "x"}}])
    assert dsl is None and "Invalid Python syntax" in errors[0]


def test_custom_feature_valid():
    dsl, errors = _v([{"name": "custom_x",
                       "params": {"code": "series = g['close'] * 2", "as": "x"}}])
    assert errors == []
