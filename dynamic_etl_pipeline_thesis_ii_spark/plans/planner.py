"""Deterministic rule-based planner (reference Q1,
``LLM_Ingestor/query_analyzer.py``).

The reference routes natural-language queries with an LLM whose prompt
encodes deterministic routing rules (both-APIs-for-stock, quarterly
default for fundamentals, 30-day default window, economic-keyword
routing). This planner implements those RULES directly, so the engine is
fully testable offline; an LLM planner can be plugged in behind the same
``Planner`` protocol and must emit the same ``PlannerResponse`` contract.

Also here: Q3's semantic plan validation — the reference scores
cosine(MiniLM(query keywords), MiniLM(endpoint description)) with a 0.7
threshold, emitting non-blocking WARNINGs (``endpoint_validator.py``).
Our default scorer is a deterministic token-overlap similarity with a
pluggable embedding hook.
"""

from __future__ import annotations

import re
from typing import Callable, Optional, Protocol

from dynamic_etl_pipeline_thesis_ii_spark.plans.contracts import (
    APIRequest,
    ExecutionPlan,
    FeatureSpec,
    PlannedRequest,
    PlannerResponse,
)
from dynamic_etl_pipeline_thesis_ii_spark.plans.registry import registry

# common English words that look like tickers
_NOT_TICKERS = {
    "A", "I", "THE", "AND", "OR", "FOR", "WITH", "LAST", "DAYS", "DAY",
    "GET", "SHOW", "ME", "OF", "TO", "FROM", "IN", "ON", "VS", "US",
    "GDP", "CPI", "EPS", "PE", "ETF", "IPO", "OHLCV", "SMA", "EMA",
    "RSI", "MACD", "ATR", "OBV", "API", "YOY", "QOQ",
}

_TICKER_RE = re.compile(r"\$?\b([A-Z]{1,5})\b")
_DATE_RE = re.compile(r"\b(\d{4}-\d{2}-\d{2})\b")

# enrichment keyword -> feature-registry name (transform/registry.yaml names)
ENRICHMENT_KEYWORDS = {
    "sma": "sma", "moving average": "sma", "ema": "ema", "macd": "macd",
    "rsi": "rsi", "stochastic": "stoch", "volatility": "rolling_vol",
    "atr": "atr", "bollinger": "bbands", "obv": "obv", "return": "ret",
    "returns": "ret", "lag": "lag", "z-score": "zscore", "zscore": "zscore",
    "momentum": "earnings_momentum", "yoy": "yoy_growth",
    "qoq": "qoq_growth", "margin": "net_margin",
    "current ratio": "current_ratio", "free cash flow": "free_cash_flow",
}

_ECONOMIC = [
    (("treasury", "yield curve"), ("polygon", "TREASURY_YIELD")),
    (("inflation",), ("polygon", "INFLATION")),
    (("cpi", "consumer price"), ("alpha_vantage", "CPI")),
    (("gdp per capita",), ("alpha_vantage", "REAL_GDP_PER_CAPITA")),
    (("gdp",), ("alpha_vantage", "REAL_GDP")),
    (("fed funds", "federal funds"), ("alpha_vantage", "FEDERAL_FUNDS_RATE")),
    (("unemployment",), ("alpha_vantage", "UNEMPLOYMENT")),
    (("retail sales",), ("alpha_vantage", "RETAIL_SALES")),
    (("durable goods", "durables"), ("alpha_vantage", "DURABLES")),
    (("nonfarm", "payroll"), ("alpha_vantage", "NONFARM_PAYROLL")),
]

# ticker-optional market-data routes (short_data / snapshot / calendar
# categories — reference api_registry.py:224-481, :1270-1338)
_MARKET_DATA = [
    (("short interest",), ("polygon", "SHORT_INTEREST")),
    (("short volume",), ("polygon", "SHORT_VOLUME")),
    (("top gainers", "top losers", "market movers", "biggest movers"),
     ("polygon", "TOP_MARKET_MOVERS")),
    (("ipo calendar", "upcoming ipo", "upcoming ipos"),
     ("alpha_vantage", "IPO_CALENDAR")),
    (("earnings calendar", "upcoming earnings"),
     ("alpha_vantage", "EARNINGS_CALENDAR")),
    (("listing status", "delisted"), ("alpha_vantage", "LISTING_STATUS")),
    (("dividend history", "dividends"), ("alpha_vantage", "DIVIDENDS")),
    (("split history", "stock splits"), ("alpha_vantage", "SPLITS")),
    (("shares outstanding",), ("alpha_vantage", "SHARES_OUTSTANDING")),
]

_FUNDAMENTAL = [
    (("income statement", "revenue", "net income"), "INCOME_STATEMENT"),
    (("balance sheet", "assets", "liabilities"), "BALANCE_SHEET"),
    (("cash flow",), "CASH_FLOW"),
    (("earnings", "eps", "surprise"), "EARNINGS"),
]

_FINANCE_HINTS = (
    "stock", "price", "bar", "ohlc", "ticker", "share", "market",
    "trading", "volume", "close", "open",
)

# company-name inference (reference query_analyzer.py:144-145 prompt
# rule: "Microsoft" -> MSFT, "Apple" -> AAPL, ...)
_COMPANY_TICKERS = {
    "apple": "AAPL", "microsoft": "MSFT", "amazon": "AMZN",
    "google": "GOOGL", "alphabet": "GOOGL", "meta": "META",
    "facebook": "META", "tesla": "TSLA", "netflix": "NFLX",
    "uber": "UBER", "nvidia": "NVDA", "ibm": "IBM",
}

# default baskets when the query names no instrument (reference
# query_analyzer.py:184-185 and :248 prompt rules)
_DEFAULT_BARS_BASKET = ["AAPL", "AMZN", "GOOGL", "MSFT", "META",
                        "TSLA", "NFLX", "UBER"]
_DEFAULT_FUNDAMENTALS_BASKET = ["AAPL", "IBM", "AMZN"]


class Planner(Protocol):
    def analyze(self, query: str) -> PlannerResponse: ...


class RulePlanner:
    """Deterministic keyword/regex router."""

    def __init__(self, reg=registry):
        self.registry = reg

    def analyze(self, query: str) -> PlannerResponse:
        q = query.strip()
        ql = q.lower()
        tickers = [t for t in _TICKER_RE.findall(q) if t not in _NOT_TICKERS]
        # whole-word matching only: 'metals' must not infer META
        tickers += [t for name, t in _COMPANY_TICKERS.items()
                    if re.search(rf"\b{name}\b", ql)]
        tickers = list(dict.fromkeys(tickers))
        dates = _DATE_RE.findall(q)

        enrichment = [feat for kw, feat in ENRICHMENT_KEYWORDS.items()
                      if kw in ql]
        enrichment = list(dict.fromkeys(enrichment))

        # market-data routes resolve FIRST (most-specific keywords):
        # 'earnings calendar' must win over the fundamental 'earnings'
        # match, 'gdp per capita' over 'gdp', and a movers/snapshot
        # query must not drag in the default bars basket
        md_hits: list[tuple[str, str, str]] = []  # (keyword, api, ep)
        for kws, (api, ep) in _MARKET_DATA:
            hit = next((k for k in kws if k in ql), None)
            if hit is not None:
                md_hits.append((hit, api, ep))
        if "snapshot" in ql:
            md_hits.append(("snapshot", "polygon",
                            "SNAPSHOT_TICKER" if tickers
                            else "FULL_MARKET_SNAPSHOT"))

        # default baskets (reference prompt rules, query_analyzer.py:184,
        # :248): a stock/fundamentals query naming no instrument still
        # routes — over the documented default basket
        if not tickers and not md_hits:
            if any(any(k in ql for k in kws) for kws, _ in _FUNDAMENTAL):
                tickers = list(_DEFAULT_FUNDAMENTALS_BASKET)
            elif any(h in ql for h in _FINANCE_HINTS):
                tickers = list(_DEFAULT_BARS_BASKET)

        requests: list[PlannedRequest] = []
        keywords: list[str] = []

        # economic indicators (no ticker needed); a keyword contained in
        # an already-matched longer keyword is suppressed ('gdp' inside
        # 'gdp per capita')
        matched_kws: list[str] = [h for h, _, _ in md_hits]
        for kws, (api, ep) in _ECONOMIC:
            hit = next((k for k in kws if k in ql), None)
            if hit is None or any(hit != m and hit in m for m in matched_kws):
                continue
            matched_kws.append(hit)
            requests.append(PlannedRequest(
                api, ep, {}, reasoning=f"economic keyword {hit!r}"))
            keywords.append(hit)

        # short_data / snapshot / calendar / corporate-actions routes
        for hit, api, ep in md_hits:
            params: dict = {}
            if ep == "TOP_MARKET_MOVERS":
                params["direction"] = ("losers" if "losers" in ql
                                       else "gainers")
            # routes whose registry spec REQUIRES a ticker fall back to
            # the default basket when the query names none — otherwise
            # the plan would fail parameter validation unconditionally
            # (the optional-ticker routes just go un-filtered)
            route_tickers = tickers
            if not route_tickers and ep in ("DIVIDENDS", "SPLITS",
                                            "SHARES_OUTSTANDING"):
                route_tickers = list(_DEFAULT_BARS_BASKET)
            if route_tickers and ep in ("SHORT_INTEREST", "SHORT_VOLUME",
                                        "EARNINGS_CALENDAR",
                                        "SNAPSHOT_TICKER",
                                        "DIVIDENDS", "SPLITS",
                                        "SHARES_OUTSTANDING"):
                for ticker in route_tickers:
                    requests.append(PlannedRequest(
                        api, ep, {"ticker": ticker, **params},
                        reasoning=f"market-data keyword {hit!r}"))
            else:
                requests.append(PlannedRequest(
                    api, ep, params,
                    reasoning=f"market-data keyword {hit!r}"))
            keywords.append(hit)

        # fundamentals / earnings per ticker; quarterly is the default
        # period unless the query says annual (reference routing rules)
        fundamental_eps = [ep for kws, ep in _FUNDAMENTAL
                           if any(k in ql and not any(
                               k != m and k in m for m in matched_kws)
                               for k in kws)]
        period = "annual" if ("annual" in ql or "yearly" in ql) else "quarterly"
        for ticker in tickers:
            for ep in fundamental_eps:
                requests.append(PlannedRequest(
                    "alpha_vantage", ep, {"ticker": ticker, "period": period},
                    reasoning="fundamental keyword"))
        if fundamental_eps:
            keywords.extend(ep.lower() for ep in fundamental_eps)

        # stock bars: the reference's both-APIs rule — every bar request
        # is routed to polygon AND alpha_vantage so the integration
        # stage can reconcile the two (query_analyzer.py routing rules)
        wants_bars = bool(tickers) and (
            not (fundamental_eps or md_hits)
            or any(h in ql for h in _FINANCE_HINTS))
        if wants_bars:
            params: dict = {}
            if len(dates) >= 1:
                params["from"] = dates[0]
            if len(dates) >= 2:
                params["to"] = dates[1]
            timespan = ("week" if "weekly" in ql else
                        "month" if "monthly" in ql else
                        "minute" if "intraday" in ql else "day")
            av_ep = ("TIME_SERIES_WEEKLY" if timespan == "week" else
                     "TIME_SERIES_MONTHLY" if timespan == "month" else
                     "TIME_SERIES_INTRADAY" if timespan == "minute" else
                     "TIME_SERIES_DAILY")
            for ticker in tickers:
                requests.append(PlannedRequest(
                    "polygon", "get_aggs",
                    {"ticker": ticker, "timespan": timespan, **params},
                    reasoning="stock bars (polygon side)"))
                requests.append(PlannedRequest(
                    "alpha_vantage", av_ep, {"ticker": ticker, **params},
                    reasoning="stock bars (alpha_vantage side)"))
            keywords.append("stock bars")

        proceed = bool(requests)
        return PlannerResponse(
            proceed=proceed,
            features=FeatureSpec(
                native=(["open", "high", "low", "close", "volume"]
                        if wants_bars else
                        ["value"] if any(r.api_name for r in requests) else []),
                enrichment=enrichment),
            semantic_keywords=keywords or ([ql] if proceed else []),
            api_requests=requests,
            tickers=tickers)


def to_execution_plan(resp: PlannerResponse) -> ExecutionPlan:
    """PlannerResponse -> ExecutionPlan (``ingestor.py:174-184``)."""
    return ExecutionPlan(ranked_requests=[
        APIRequest(api_name=r.api_name, endpoint_name=r.endpoint_name,
                   parameters=dict(r.parameters))
        for r in resp.api_requests])


def token_similarity(a: str, b: str) -> float:
    """Deterministic stand-in for embedding cosine: Jaccard over word
    sets (pluggable — swap for a real encoder via SemanticValidator)."""
    ta, tb = set(re.findall(r"[a-z]+", a.lower())), set(re.findall(r"[a-z]+", b.lower()))
    if not ta or not tb:
        return 0.0
    return len(ta & tb) / len(ta | tb)


class SemanticValidator:
    """Q3: score keywords vs endpoint description; below-threshold =>
    non-blocking WARNING (``endpoint_validator.py:34-88``)."""

    def __init__(self, reg=registry, threshold: float = 0.2,
                 scorer: Optional[Callable[[str, str], float]] = None):
        self.registry = reg
        self.threshold = threshold
        self.scorer = scorer or token_similarity

    def validate_plan(self, plan: ExecutionPlan, keywords: list[str]
                      ) -> ExecutionPlan:
        text = " ".join(keywords)
        for req in plan.ranked_requests:
            spec = self.registry.get_endpoint_spec(req.api_name, req.endpoint_name)
            if spec is None:
                continue
            score = self.scorer(text, spec.description)
            req.semantic_score = round(score, 4)
            if score < self.threshold:
                req.validation_warnings.append(
                    f"semantic score {score:.2f} below {self.threshold}")
                if req.validation_status == "PENDING":
                    req.validation_status = "WARNING"
        return plan
