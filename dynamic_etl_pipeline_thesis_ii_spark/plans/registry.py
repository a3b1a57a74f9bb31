"""Typed endpoint registry (reference ``LLM_Ingestor/api_registry.py``).

The registry is the engine's *query surface contract*: every routable
endpoint declares its parameter schemas (type, aliases, valid values,
defaults, format, range), a data category, and the features its frames
carry. The planner routes against the compact manifest; the parameter
validator enforces the schemas; the reverse index answers
"which endpoints produce feature X".

The census mirrors the reference's two providers COMPLETELY: all 12
Polygon endpoints (``api_registry.py:65-560``) and all 30 Alpha Vantage
endpoints (``api_registry.py:567-1338``), with matching
required-parameter sets, enum domains and alias vocabularies
(``tests/test_plans.py`` pins the full census against a snapshot of the
reference's specs). The engine canonicalizes the instrument parameter
to ``ticker`` with ``symbol``/``stock`` aliases on both providers (the
reference names it ``symbol`` on Alpha Vantage with a ``ticker``
alias — same acceptance set either way).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Optional


class ParameterType(str, Enum):
    STRING = "string"
    INTEGER = "integer"
    FLOAT = "float"
    DATE = "date"
    ENUM = "enum"
    BOOLEAN = "boolean"


@dataclass
class ParameterSchema:
    name: str
    type: ParameterType
    required: bool = False
    aliases: list[str] = field(default_factory=list)
    valid_values: Optional[list[str]] = None
    default_value: Any = None
    format: Optional[str] = None
    min_value: Optional[float] = None
    max_value: Optional[float] = None
    description: str = ""


@dataclass
class EndpointSpec:
    name: str
    description: str
    data_category: str  # stock_bars | snapshot | economic_indicator | fundamental | earnings
    parameters: list[ParameterSchema] = field(default_factory=list)
    provides: list[str] = field(default_factory=list)  # canonical feature names


@dataclass
class APISpec:
    name: str
    endpoints: dict[str, EndpointSpec] = field(default_factory=dict)

    def add(self, ep: EndpointSpec) -> None:
        self.endpoints[ep.name] = ep


def _ticker(required: bool = True) -> ParameterSchema:
    return ParameterSchema("ticker", ParameterType.STRING, required=required,
                           aliases=["symbol", "stock"],
                           description="instrument symbol")


def _date_param(name: str, required: bool = False,
                aliases: Optional[list[str]] = None) -> ParameterSchema:
    return ParameterSchema(name, ParameterType.DATE, required=required,
                           aliases=aliases or [], format="YYYY-MM-DD")


def _datatype() -> ParameterSchema:
    return ParameterSchema("datatype", ParameterType.ENUM,
                           default_value="json",
                           valid_values=["json", "csv"])


def _outputsize(default: str = "compact") -> ParameterSchema:
    return ParameterSchema("outputsize", ParameterType.ENUM,
                           default_value=default,
                           valid_values=["compact", "full"])


def _period() -> ParameterSchema:
    return ParameterSchema("period", ParameterType.ENUM,
                           default_value="quarterly",
                           valid_values=["quarterly", "annual"])


OHLCV = ["open", "high", "low", "close", "volume"]


def _build_polygon() -> APISpec:
    api = APISpec("polygon")
    api.add(EndpointSpec(
        "get_aggs", "aggregate OHLCV bars for a ticker over a date range",
        "stock_bars",
        [_ticker(),
         ParameterSchema("multiplier", ParameterType.INTEGER,
                         default_value=1, min_value=1, max_value=1000),
         ParameterSchema("timespan", ParameterType.ENUM,
                         default_value="day",
                         aliases=["interval", "frequency"],
                         valid_values=["minute", "hour", "day", "week",
                                       "month", "quarter", "year"]),
         _date_param("from", aliases=["start_date", "from_date"]),
         _date_param("to", aliases=["end_date", "to_date"]),
         # engine extra (the live endpoint accepts it; the reference
         # spec omits it)
         ParameterSchema("limit", ParameterType.INTEGER, min_value=1,
                         max_value=50000)],
        OHLCV + ["vwap", "transactions"]))
    api.add(EndpointSpec(
        "get_previous_close_agg", "previous trading day OHLCV for a ticker",
        "stock_bars", [_ticker()], OHLCV + ["vwap"]))
    api.add(EndpointSpec(
        "get_grouped_daily_aggs", "one day of OHLCV for every ticker",
        "stock_bars",
        [_date_param("date", required=True, aliases=["from"])], OHLCV))
    api.add(EndpointSpec(
        "get_daily_open_close_agg", "open/close for one ticker on one day",
        "stock_bars", [_ticker(), _date_param("date", required=True)],
        OHLCV + ["afterHours", "preMarket"]))
    api.add(EndpointSpec(
        "SHORT_INTEREST", "reported short interest per ticker",
        "short_data",
        [_ticker(required=False), _date_param("settlement_date"),
         ParameterSchema("days_to_cover", ParameterType.FLOAT),
         ParameterSchema("avg_daily_volume", ParameterType.INTEGER),
         ParameterSchema("limit", ParameterType.INTEGER, default_value=10),
         ParameterSchema("sort", ParameterType.STRING)],
        ["short_interest", "days_to_cover", "avg_daily_volume"]))
    api.add(EndpointSpec(
        "SHORT_VOLUME", "daily short volume per ticker", "short_data",
        [_ticker(required=False), _date_param("date", aliases=["on"]),
         ParameterSchema("short_volume_ratio", ParameterType.FLOAT),
         ParameterSchema("total_volume", ParameterType.INTEGER),
         ParameterSchema("limit", ParameterType.INTEGER, default_value=10),
         ParameterSchema("sort", ParameterType.STRING)],
        ["short_volume", "short_volume_ratio", "total_volume"]))
    api.add(EndpointSpec(
        "UNIFIED_SNAPSHOT", "unified snapshot across asset classes",
        "snapshot",
        [_ticker(required=False),
         ParameterSchema("type", ParameterType.ENUM, default_value="stocks",
                         valid_values=["stocks", "options", "indices",
                                       "crypto", "fx", "commodities"]),
         ParameterSchema("order", ParameterType.ENUM, default_value="desc",
                         valid_values=["asc", "desc"]),
         ParameterSchema("limit", ParameterType.INTEGER, default_value=10),
         ParameterSchema("sort", ParameterType.STRING)],
        OHLCV + ["last_trade", "last_quote"]))
    api.add(EndpointSpec(
        "TOP_MARKET_MOVERS", "top gainers or losers of the day", "snapshot",
        [ParameterSchema("direction", ParameterType.ENUM, required=True,
                         default_value="gainers",
                         valid_values=["gainers", "losers"]),
         ParameterSchema("include_otc", ParameterType.BOOLEAN,
                         default_value=False)],
        OHLCV + ["todaysChangePerc"]))
    api.add(EndpointSpec(
        "SNAPSHOT_TICKER", "latest day snapshot for one ticker",
        "snapshot", [_ticker()], OHLCV + ["vwap", "prev_close"]))
    api.add(EndpointSpec(
        "FULL_MARKET_SNAPSHOT", "latest snapshot for all tickers",
        "snapshot",
        [ParameterSchema("tickers", ParameterType.STRING,
                         aliases=["symbols", "ticker_list"]),
         ParameterSchema("include_otc", ParameterType.BOOLEAN,
                         default_value=False)],
        OHLCV + ["vwap", "prev_close"]))
    api.add(EndpointSpec(
        "TREASURY_YIELD", "US treasury yield curve time series",
        "economic_indicator",
        [_date_param("date", aliases=["on"]),
         ParameterSchema("limit", ParameterType.INTEGER, default_value=100,
                         min_value=1, max_value=50000),
         ParameterSchema("sort", ParameterType.STRING)],
        ["value"]))
    api.add(EndpointSpec(
        "INFLATION", "US inflation rate time series", "economic_indicator",
        [_date_param("date", aliases=["on"]),
         ParameterSchema("limit", ParameterType.INTEGER, default_value=100,
                         min_value=1, max_value=50000),
         ParameterSchema("sort", ParameterType.STRING)],
        ["value"]))
    return api


def _build_alpha_vantage() -> APISpec:
    api = APISpec("alpha_vantage")
    api.add(EndpointSpec(
        "TIME_SERIES_DAILY", "daily OHLCV time series", "stock_bars",
        [_ticker(), _outputsize()], OHLCV))
    api.add(EndpointSpec(
        "TIME_SERIES_DAILY_ADJUSTED", "daily adjusted OHLCV", "stock_bars",
        [_ticker(), _outputsize()],
        OHLCV + ["adjusted_close", "dividend_amount", "split_coefficient"]))
    api.add(EndpointSpec(
        "TIME_SERIES_INTRADAY", "intraday OHLCV bars", "stock_bars",
        [_ticker(),
         # the reference names this parameter 'timespan' with an
         # 'interval' alias (api_registry.py:591); the engine keeps the
         # vendor's own name with the reference's as alias — the
         # acceptance set is identical
         ParameterSchema("interval", ParameterType.ENUM, default_value="5min",
                         aliases=["timespan"],
                         valid_values=["1min", "5min", "15min", "30min", "60min"]),
         _outputsize()],
        OHLCV))
    api.add(EndpointSpec(
        "TIME_SERIES_WEEKLY", "weekly OHLCV time series", "stock_bars",
        [_ticker(), _outputsize(default="full")], OHLCV))
    api.add(EndpointSpec(
        "TIME_SERIES_WEEKLY_ADJUSTED", "weekly adjusted OHLCV", "stock_bars",
        [_ticker()], OHLCV + ["adjusted_close", "dividend_amount"]))
    api.add(EndpointSpec(
        "TIME_SERIES_MONTHLY", "monthly OHLCV time series", "stock_bars",
        [_ticker(), _outputsize(default="full")], OHLCV))
    api.add(EndpointSpec(
        "TIME_SERIES_MONTHLY_ADJUSTED", "monthly adjusted OHLCV",
        "stock_bars", [_ticker()],
        OHLCV + ["adjusted_close", "dividend_amount"]))
    for name, desc in [("INCOME_STATEMENT", "annual and quarterly income statements"),
                       ("BALANCE_SHEET", "annual and quarterly balance sheets"),
                       ("CASH_FLOW", "annual and quarterly cash flow statements")]:
        api.add(EndpointSpec(name, desc, "fundamental",
                             [_ticker(), _period()],
                             [name.lower() + "_*"]))
    api.add(EndpointSpec(
        "EARNINGS", "quarterly and annual EPS history with surprises",
        "earnings", [_ticker(), _period()],
        ["earnings_reportedEPS", "earnings_estimatedEPS", "earnings_surprise",
         "earnings_surprisePercentage"]))
    api.add(EndpointSpec(
        "EARNINGS_ESTIMATES", "analyst EPS estimates by period", "earnings",
        [_ticker()], ["estimatedEPS", "numberOfAnalysts"]))
    api.add(EndpointSpec(
        "OVERVIEW", "company profile and key ratios", "fundamental",
        [_ticker()], ["MarketCapitalization", "PERatio", "EPS"]))
    api.add(EndpointSpec(
        "ETF_PROFILE", "ETF holdings and profile", "fundamental",
        [_ticker()], ["net_assets", "net_expense_ratio"]))
    for name, desc, fields in [
            ("DIVIDENDS", "dividend history for a symbol",
             ["ex_dividend_date", "amount"]),
            ("SPLITS", "split history for a symbol",
             ["effective_date", "split_factor"]),
            ("SHARES_OUTSTANDING", "shares outstanding history",
             ["shares_outstanding"])]:
        api.add(EndpointSpec(name, desc, "fundamental",
                             [_ticker(), _datatype()], fields))
    api.add(EndpointSpec(
        "LISTING_STATUS", "active/delisted listings CSV", "calendar",
        [_date_param("date", aliases=["as_of_date", "on_date"]),
         ParameterSchema("state", ParameterType.ENUM, default_value="active",
                         valid_values=["active", "delisted"])],
        ["symbol", "name", "exchange", "assetType", "status"]))
    api.add(EndpointSpec(
        "EARNINGS_CALENDAR", "upcoming earnings CSV", "calendar",
        [_ticker(required=False),
         ParameterSchema("horizon", ParameterType.ENUM,
                         default_value="3month",
                         valid_values=["3month", "6month", "12month"])],
        ["symbol", "reportDate", "estimate"]))
    api.add(EndpointSpec(
        "IPO_CALENDAR", "upcoming IPOs CSV", "calendar", [],
        ["symbol", "ipoDate", "priceRangeLow", "priceRangeHigh"]))
    api.add(EndpointSpec(
        "REAL_GDP", "real US GDP series", "economic_indicator",
        [ParameterSchema("interval", ParameterType.ENUM,
                         default_value="quarterly",
                         valid_values=["quarterly", "annual"]),
         _datatype()],
        ["value"]))
    api.add(EndpointSpec(
        "CPI", "consumer price index series", "economic_indicator",
        [ParameterSchema("interval", ParameterType.ENUM, default_value="monthly",
                         valid_values=["monthly", "semiannual"]),
         _datatype()],
        ["value"]))
    api.add(EndpointSpec(
        "FEDERAL_FUNDS_RATE", "federal funds rate series", "economic_indicator",
        [ParameterSchema("interval", ParameterType.ENUM, default_value="monthly",
                         valid_values=["daily", "weekly", "monthly"]),
         _datatype()],
        ["value"]))
    api.add(EndpointSpec(
        "REAL_GDP_PER_CAPITA", "real GDP per capita series",
        "economic_indicator", [_datatype()], ["value"]))
    api.add(EndpointSpec(
        "TREASURY_YIELD", "treasury yield series", "economic_indicator",
        [ParameterSchema("interval", ParameterType.ENUM,
                         default_value="daily",
                         valid_values=["daily", "weekly", "monthly"]),
         ParameterSchema("maturity", ParameterType.ENUM,
                         default_value="10year",
                         valid_values=["3month", "2year", "5year", "7year",
                                       "10year", "30year"]),
         _datatype()],
        ["value"]))
    for name, desc in [("INFLATION", "annual inflation rate series"),
                       ("RETAIL_SALES", "monthly retail sales series"),
                       ("DURABLES", "durable goods orders series"),
                       ("UNEMPLOYMENT", "monthly unemployment rate series"),
                       ("NONFARM_PAYROLL", "monthly nonfarm payroll series")]:
        api.add(EndpointSpec(name, desc, "economic_indicator", [_datatype()],
                             ["value"]))
    return api


class EndpointRegistry:
    """Lookup + manifest + reverse feature index
    (``api_registry.py:1345-1449``)."""

    def __init__(self) -> None:
        self.apis: dict[str, APISpec] = {
            a.name: a for a in (_build_polygon(), _build_alpha_vantage())}
        self._feature_index: dict[str, list[tuple[str, str]]] = {}
        for api in self.apis.values():
            for ep in api.endpoints.values():
                for feat in ep.provides:
                    self._feature_index.setdefault(feat, []).append((api.name, ep.name))

    def get_endpoint_spec(self, api_name: str, endpoint_name: str
                          ) -> Optional[EndpointSpec]:
        api = self.apis.get(api_name)
        return api.endpoints.get(endpoint_name) if api else None

    def endpoints_for_feature(self, feature: str) -> list[tuple[str, str]]:
        return list(self._feature_index.get(feature, []))

    def by_category(self, category: str) -> list[tuple[str, str]]:
        return [(a.name, e.name) for a in self.apis.values()
                for e in a.endpoints.values() if e.data_category == category]

    def manifest(self) -> list[dict]:
        """Compact description for a planner prompt (LLM or rule-based)."""
        return [{
            "api": a.name, "endpoint": e.name, "category": e.data_category,
            "description": e.description,
            "parameters": [{
                "name": p.name, "type": p.type.value, "required": p.required,
                **({"values": p.valid_values} if p.valid_values else {}),
                **({"default": p.default_value} if p.default_value is not None else {}),
            } for p in e.parameters],
        } for a in self.apis.values() for e in a.endpoints.values()]


registry = EndpointRegistry()
