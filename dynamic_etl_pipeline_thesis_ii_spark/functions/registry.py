"""Feature registry: names, parameter schemas, defaults and allowed values.

Mirrors the semantics of the reference's ``transform/registry.yaml:2-247``
(same feature names, params, defaults and allowed lists) so DSL recipes
written for the reference validate identically here. Kept as a Python
dict (the engine's source of truth); a YAML/JSON file with the same
shape can be loaded over it via :func:`load_registry`.
"""

from __future__ import annotations

import json
from typing import Any

_OHLCV = ["open", "high", "low", "close", "volume", "vwap"]
_OHLC_V = ["open", "high", "low", "close", "vwap"]


def _p(type_: str, required: bool = True, default: Any = None, allowed: list | None = None) -> dict:
    rule: dict[str, Any] = {"type": type_, "required": required}
    if default is not None:
        rule["default"] = default
    if allowed is not None:
        rule["allowed"] = allowed
    return rule


FEATURE_REGISTRY: dict[str, Any] = {
    "version": 1,
    "features": {
        # Trend
        "sma": {"params": {"on": _p("string", allowed=_OHLCV), "window": _p("int")}},
        "ema": {"params": {"on": _p("string", allowed=_OHLCV), "window": _p("int")}},
        "macd": {"params": {
            "on": _p("string", default="close", allowed=_OHLC_V),
            "fast_period": _p("int", required=False, default=12),
            "slow_period": _p("int", required=False, default=26),
            "signal_period": _p("int", required=False, default=9),
        }},
        # Momentum
        "rsi": {"params": {
            "on": _p("string", default="close", allowed=["close"]),
            "window": _p("int", required=False, default=14),
        }},
        "stoch": {"params": {
            "high": _p("string", default="high"),
            "low": _p("string", default="low"),
            "close": _p("string", default="close"),
            "k_window": _p("int", required=False, default=14),
            "d_window": _p("int", required=False, default=3),
        }},
        "willr": {"params": {
            "high": _p("string", default="high"),
            "low": _p("string", default="low"),
            "close": _p("string", default="close"),
            "window": _p("int", required=False, default=14),
        }},
        "cci": {"params": {
            "high": _p("string", default="high"),
            "low": _p("string", default="low"),
            "close": _p("string", default="close"),
            "window": _p("int", required=False, default=20),
        }},
        # Volatility
        "rolling_vol": {"params": {
            "on": _p("string", allowed=_OHLC_V + ["ret"]), "window": _p("int")}},
        "atr": {"params": {
            "high": _p("string", default="high"),
            "low": _p("string", default="low"),
            "close": _p("string", default="close"),
            "window": _p("int", required=False, default=14),
        }},
        "bbands": {"params": {
            "on": _p("string", default="close", allowed=_OHLC_V),
            "window": _p("int", required=False, default=20),
            "std_dev": _p("int", required=False, default=2),
        }},
        # Volume
        "obv": {"params": {
            "close": _p("string", default="close"),
            "volume": _p("string", default="volume"),
        }},
        # Basic transforms
        "ret": {"params": {
            "on": _p("string", allowed=_OHLC_V),
            "periods": _p("int", required=False, default=1),
            "method": _p("string", required=False, default="log", allowed=["log", "simple"]),
        }},
        "lag": {"params": {"on": _p("string"), "periods": _p("int")}},
        "diff": {"params": {"on": _p("string"), "periods": _p("int", required=False, default=1)}},
        "rolling_max": {"params": {"on": _p("string", allowed=_OHLC_V), "window": _p("int")}},
        "rolling_min": {"params": {"on": _p("string", allowed=_OHLC_V), "window": _p("int")}},
        "zscore": {"params": {"on": _p("string", allowed=_OHLC_V + ["volume"]), "window": _p("int")}},
        # Calendar
        "session_flags": {"params": {}},
        # Generic helpers
        "yoy_growth": {"params": {"on": _p("string"), "periods": _p("int", required=False, default=4)}},
        "qoq_growth": {"params": {"on": _p("string")}},
        "rolling_avg": {"params": {"on": _p("string"), "window": _p("int")}},
        "pct_change": {"params": {"on": _p("string"), "periods": _p("int")}},
        # Balance sheet ratios
        "current_ratio": {"params": {}},
        "quick_ratio": {"params": {}},
        "debt_to_equity": {"params": {}},
        "debt_to_assets": {"params": {}},
        "working_capital": {"params": {}},
        "equity_ratio": {"params": {}},
        # Cash flow ratios
        "free_cash_flow": {"params": {}},
        "operating_cash_margin": {"params": {}},
        "capex_intensity": {"params": {}},
        "dividend_payout_ratio": {"params": {}},
        "cash_conversion_ratio": {"params": {}},
        # Earnings
        "earnings_beat": {"params": {}},
        "avg_surprise": {"params": {"window": _p("int")}},
        "earnings_momentum": {"params": {"window": _p("int")}},
        "forecast_accuracy": {"params": {}},
        # Income statement ratios
        "gross_margin": {"params": {}},
        "operating_margin": {"params": {}},
        "net_margin": {"params": {}},
        "ebitda_margin": {"params": {}},
        "rd_intensity": {"params": {}},
        "interest_coverage": {"params": {}},
    },
}


def load_registry(path: str) -> dict:
    """Load a registry from JSON (or YAML when pyyaml is available) with
    the same shape as FEATURE_REGISTRY."""
    with open(path) as f:
        text = f.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        try:
            import yaml  # optional dependency
        except ImportError as e:
            raise ValueError(f"{path} is not JSON and pyyaml is unavailable") from e
        return yaml.safe_load(text)
