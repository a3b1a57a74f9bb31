"""Live HTTP source clients (S1/S2/S6, SURVEY.md §2.1).

The reference fetches from Polygon and Alpha Vantage inside its API
clients (``LLM_Ingestor/polygon_client.py:36-74`` — route dispatch +
retry x3 with backoff; ``alpha_vantage_client.py:83-239`` — 4-route
dispatch with rate-limit sniffing). Here the HTTP layer is a thin
driver-side fetch that lands the (rate-limit-bounded, therefore small)
response payload into a LAZY Spark DataFrame; every normalization is
one of the existing adapter transforms (:mod:`.adapters`), so a frame
fetched over HTTP goes through the exact same lazy plan as one read
from parquet or a test fixture. At scale the parallel axis is the
request fan-out (many tickers/endpoints -> many small frames unioned by
the integration engine), not the single response body.

Design notes:

- ``Transport`` is injectable; the default :class:`RetryingTransport`
  wraps ``requests`` with the reference's 3-attempt retry
  (``polygon_client.py:61-74``) upgraded to exponential backoff. Unit
  tests inject a canned-fixture transport — no live network anywhere in
  the suite.
- Clients implement the orchestrator's ``Fetcher`` protocol
  (``plans/orchestrator.py``): ``fetch(request) -> DataFrame`` where
  ``request`` is a ``plans.contracts.APIRequest``.
- ``requests`` is imported lazily so the module (and everything that
  only uses fixture transports) works without it.
"""

from __future__ import annotations

import datetime
import json
import time
import warnings
from io import StringIO
from typing import Any, Callable, Mapping, Optional, Protocol

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.sources import adapters as A

POLYGON_BASE_URL = "https://api.polygon.io"
# economic indicators live on a dedicated host in the reference client
# (``polygon_client.py:33``: fed_base_url = "https://api.massive.com/fed/v1")
POLYGON_FED_BASE_URL = "https://api.massive.com/fed/v1"
ALPHA_VANTAGE_BASE_URL = "https://www.alphavantage.co/query"

# reference ``polygon_client.py:232-247`` (_resolve_indicator_slug)
POLYGON_INDICATOR_SLUGS = {
    "INFLATION": "inflation",
    "TREASURY_YIELD": "treasury-yields",
    "CPI": "inflation/cpi",
    "FEDERAL_FUNDS_RATE": "federal-funds-rate",
    "RETAIL_SALES": "retail-sales",
}

# reference ``alpha_vantage_client.py:40-81`` endpoint families
AV_ECONOMIC_ENDPOINTS = {
    "REAL_GDP", "REAL_GDP_PER_CAPITA", "TREASURY_YIELD",
    "FEDERAL_FUNDS_RATE", "CPI", "INFLATION", "RETAIL_SALES",
    "DURABLES", "UNEMPLOYMENT", "NONFARM_PAYROLL",
}
AV_FUNDAMENTAL_CSV_ENDPOINTS = {
    "LISTING_STATUS", "EARNINGS_CALENDAR", "IPO_CALENDAR",
}
AV_FUNDAMENTAL_JSON_ENDPOINTS = {
    "INCOME_STATEMENT", "BALANCE_SHEET", "CASH_FLOW", "EARNINGS",
    "EARNINGS_ESTIMATES", "OVERVIEW", "ETF_PROFILE", "DIVIDENDS",
    "SPLITS", "SHARES_OUTSTANDING",
}
# reference ``alpha_vantage_client.py:205-224`` timespan fallback
AV_TIMESPAN_FUNCTIONS = {
    "day": "TIME_SERIES_DAILY", "daily": "TIME_SERIES_DAILY",
    "week": "TIME_SERIES_WEEKLY", "weekly": "TIME_SERIES_WEEKLY",
    "month": "TIME_SERIES_MONTHLY", "monthly": "TIME_SERIES_MONTHLY",
    "1min": "TIME_SERIES_INTRADAY", "5min": "TIME_SERIES_INTRADAY",
    "15min": "TIME_SERIES_INTRADAY", "30min": "TIME_SERIES_INTRADAY",
    "60min": "TIME_SERIES_INTRADAY",
}

_AV_BAR_NUMERICS = ("open", "high", "low", "close", "volume",
                    "adjusted_close", "dividend_amount", "split_coefficient")


class HttpError(RuntimeError):
    """A request failed after all retry attempts."""


class Transport(Protocol):
    def get(self, url: str, params: Mapping[str, Any]) -> str:
        """GET ``url`` and return the response body text (raise on error)."""
        ...


class RetryingTransport:
    """``requests``-backed GET with retry + exponential backoff.

    Mirrors the reference's 3-attempt loop
    (``polygon_client.py:61-74``: ``max_attempts = 3; delay = 2``) with
    the fixed delay upgraded to ``base_delay * 2**attempt``. ``sleep``
    is injectable so tests assert the schedule without waiting.
    """

    def __init__(self, max_attempts: int = 3, base_delay: float = 2.0,
                 timeout: float = 30.0,
                 sleep: Callable[[float], None] = time.sleep):
        self.max_attempts = max_attempts
        self.base_delay = base_delay
        self.timeout = timeout
        self.sleep = sleep

    def get(self, url: str, params: Mapping[str, Any]) -> str:
        import requests  # lazy: fixture transports need no HTTP stack

        last: Exception | None = None
        for attempt in range(self.max_attempts):
            try:
                resp = requests.get(url, params=dict(params),
                                    timeout=self.timeout)
                resp.raise_for_status()
                return resp.text
            except Exception as e:  # noqa: BLE001 — retry any transport error
                last = e
                if attempt + 1 < self.max_attempts:
                    self.sleep(self.base_delay * (2 ** attempt))
        raise HttpError(
            f"GET {url} failed after {self.max_attempts} attempts: {last}"
        ) from last


def _json_frame(spark: SparkSession, records: list[Any]) -> DataFrame:
    """List of (possibly nested) JSON objects -> DataFrame with proper
    struct columns. Goes through Spark's JSON reader so nested objects
    become StructType (dot-path addressable), not Python-inferred maps."""
    if not records:
        return spark.range(0).drop("id")
    rdd = spark.sparkContext.parallelize([json.dumps(r) for r in records])
    return spark.read.json(rdd)


class PolygonHttpClient:
    """Polygon REST client (S1/S2 — reference ``polygon_client.py``).

    Route dispatch mirrors ``fetch_data``'s endpoint mapping
    (``polygon_client.py:44-58``); each parsed response goes through the
    matching :mod:`.adapters` transform (S3/S4/S5).
    """

    def __init__(self, spark: SparkSession, api_key: str,
                 transport: Optional[Transport] = None,
                 base_url: str = POLYGON_BASE_URL,
                 fed_base_url: str = POLYGON_FED_BASE_URL,
                 max_pages: int = 10):
        self.spark = spark
        self.api_key = api_key
        self.transport = transport or RetryingTransport()
        self.base_url = base_url.rstrip("/")
        self.fed_base_url = fed_base_url.rstrip("/")
        self.max_pages = max_pages

    def _get_json(self, path: str, params: Mapping[str, Any],
                  base: Optional[str] = None) -> dict:
        merged = {k: v for k, v in params.items() if v is not None}
        merged["apiKey"] = self.api_key
        return json.loads(
            self.transport.get((base or self.base_url) + path, merged))

    @staticmethod
    def _bar_records(payload: Mapping[str, Any]) -> list[dict]:
        """Polygon agg rows, with the short 'T' (ticker) key renamed
        BEFORE the frame exists — 'T' and 't' collide under Spark's
        case-insensitive column resolution (prev-close and grouped-daily
        rows carry both)."""
        return [{("ticker" if k == "T" else k): v for k, v in r.items()}
                for r in payload.get("results", [])]

    def _get_paged(self, path: str, params: Mapping[str, Any]) -> list[dict]:
        """GET + follow ``next_url`` cursors, concatenating page records.

        Responses over the per-request limit (50k bars for aggregates)
        arrive paged; the reference client never paginates, silently
        truncating long requests. Cursor URLs are absolute — re-request
        them verbatim (plus the api key) up to ``max_pages``, so a
        runaway cursor chain is bounded, not followed forever.

        Note Polygon's ``limit`` parameter is a PER-PAGE size, not a
        total-result cap (vendor semantics): a request with limit=100
        over a long range returns up to ``max_pages * 100`` records.
        Callers wanting a hard total cap should slice the result."""
        payload = self._get_json(path, params)
        records = self._bar_records(payload)
        pages = 1
        while payload.get("next_url") and pages < self.max_pages:
            payload = json.loads(self.transport.get(
                payload["next_url"], {"apiKey": self.api_key}))
            records += self._bar_records(payload)
            pages += 1
        return records

    def fetch(self, request) -> DataFrame:
        name = request.endpoint_name
        p = dict(request.parameters)
        ticker = p.get("ticker") or p.get("symbol")
        if name == "get_aggs":
            # the planner only sets from/to when the query names dates;
            # default to the reference's 30-day window ending today
            end = p.get("to") or datetime.date.today().isoformat()
            start = p.get("from") or (
                datetime.date.fromisoformat(end)
                - datetime.timedelta(days=30)).isoformat()
            records = self._get_paged(
                f"/v2/aggs/ticker/{ticker}/range/{p.get('multiplier', 1)}"
                f"/{p.get('timespan', 'day')}/{start}/{end}",
                {"limit": p.get("limit")})
            return A.parse_bars(_json_frame(self.spark, records),
                                ticker=ticker)
        if name == "get_previous_close_agg":
            payload = self._get_json(f"/v2/aggs/ticker/{ticker}/prev", {})
            return A.parse_bars(
                _json_frame(self.spark, self._bar_records(payload)),
                ticker=ticker)
        if name == "get_daily_open_close_agg":
            # one flat object, long names already (open/high/low/close/...)
            payload = self._get_json(f"/v1/open-close/{ticker}/{p['date']}",
                                     {})
            return A.simple_json_row(
                self.spark, {k: v for k, v in payload.items()
                             if not isinstance(v, (dict, list))})
        if name == "get_grouped_daily_aggs":
            payload = self._get_json(
                f"/v2/aggs/grouped/locale/us/market/stocks/{p['date']}", {})
            return A.parse_bars(_json_frame(self.spark,
                                            self._bar_records(payload)))
        if name in ("SNAPSHOT_TICKER", "FULL_MARKET_SNAPSHOT"):
            path = "/v2/snapshot/locale/us/markets/stocks/tickers"
            if name == "SNAPSHOT_TICKER":
                path += f"/{ticker}"
            payload = self._get_json(path, {})
            # full snapshot returns a 'tickers' list; the single-ticker
            # endpoint returns one singular 'ticker' object
            rows = payload.get("tickers")
            if rows is None:
                one = payload.get("ticker")
                rows = [one] if one else []
            return A.flatten_snapshot(_json_frame(self.spark, rows))
        if name in POLYGON_INDICATOR_SLUGS:
            slug = POLYGON_INDICATOR_SLUGS[name]
            payload = self._get_json(
                f"/{slug}",
                {k: v for k, v in p.items()
                 if k not in ("endpoint_type", "indicator")},
                base=self.fed_base_url)
            records = payload.get("results") or payload.get("data") or []
            return A.normalize_indicator(_json_frame(self.spark, records))
        # registry-only endpoints (SHORT_INTEREST, SHORT_VOLUME,
        # UNIFIED_SNAPSHOT, TOP_MARKET_MOVERS) mirror the reference,
        # whose client's endpoint_mapping also cannot serve them
        # (polygon_client.py:44-58) — the plan validates but fetch
        # degrades per-request.
        raise ValueError(
            f"polygon endpoint {name!r} has no live fetch route "
            "(registry-only, matching the reference client's coverage)")


class AlphaVantageHttpClient:
    """Alpha Vantage client (S6 — reference ``alpha_vantage_client.py``).

    Four-route dispatch (``alpha_vantage_client.py:83-239``): economic
    indicators, fundamental CSV, fundamental JSON, stock time series
    with the timespan->function fallback. JSON errors and rate-limit
    notes are sniffed exactly like the reference (``Error Message`` ->
    raise, ``Note``+frequency -> warn).
    """

    def __init__(self, spark: SparkSession, api_key: str,
                 transport: Optional[Transport] = None,
                 base_url: str = ALPHA_VANTAGE_BASE_URL):
        self.spark = spark
        self.api_key = api_key
        self.transport = transport or RetryingTransport()
        self.base_url = base_url

    # -- request side -----------------------------------------------------
    def _get(self, params: Mapping[str, Any]) -> str:
        merged = {k: v for k, v in params.items() if v is not None}
        merged["apikey"] = self.api_key
        return self.transport.get(self.base_url, merged)

    def _get_json(self, params: Mapping[str, Any]) -> dict:
        data = json.loads(self._get(params))
        if not data:
            raise ValueError("Alpha Vantage API returned an empty response.")
        if "Error Message" in data:
            raise ValueError(
                f"Alpha Vantage API Error: {data['Error Message']}")
        # rate-limit messages arrive as HTTP-200 bodies keyed 'Note'
        # (legacy) or 'Information' (newer tiers) — sniff both so a
        # throttled burst surfaces as a warning, not a parse failure
        note = data.get("Note", "") + data.get("Information", "")
        if "API call frequency" in note or "rate limit" in note.lower():
            warnings.warn(f"Alpha Vantage rate limit hit: {note}",
                          stacklevel=3)
        return data

    @staticmethod
    def _route_function(p: Mapping[str, Any]) -> str:
        fn = (p.get("function") or "").strip()
        if fn:
            return fn
        timespan = str(p.get("timespan") or p.get("interval") or "day").lower()
        try:
            return AV_TIMESPAN_FUNCTIONS[timespan]
        except KeyError:
            raise ValueError(f"Unsupported timespan: {timespan}") from None

    def fetch(self, request) -> DataFrame:
        p = dict(request.parameters)
        p.setdefault("function", request.endpoint_name)
        fn = self._route_function(p)
        ticker = p.get("ticker") or p.get("symbol")

        if fn in AV_ECONOMIC_ENDPOINTS:
            data = self._get_json({
                "function": fn, "datatype": "json",
                "interval": p.get("interval"), "maturity": p.get("maturity")})
            return self._parse_economic(data, p)
        if fn in AV_FUNDAMENTAL_CSV_ENDPOINTS:
            text = self._get({
                "function": fn, "datatype": p.get("datatype", "csv"),
                "symbol": ticker, "date": p.get("date"),
                "state": p.get("state"), "horizon": p.get("horizon")})
            return self._parse_csv(text, p)
        if fn in AV_FUNDAMENTAL_JSON_ENDPOINTS:
            data = self._get_json({
                "function": fn, "datatype": p.get("datatype", "json"),
                "symbol": ticker, "date": p.get("date"),
                "state": p.get("state"), "horizon": p.get("horizon")})
            if fn in ("INCOME_STATEMENT", "BALANCE_SHEET", "CASH_FLOW"):
                return self._parse_statement(data, fn, p)
            if fn == "EARNINGS":
                return self._parse_earnings(data, p)
            if fn == "EARNINGS_ESTIMATES":
                return self._parse_earnings_estimates(data, p)
            return A.simple_json_row(
                self.spark, {k: v for k, v in data.items()
                             if not isinstance(v, (dict, list))})
        return self._parse_time_series(self._fetch_time_series(fn, p), p,
                                       fn=fn)

    def _fetch_time_series(self, fn: str, p: Mapping[str, Any]) -> dict:
        params: dict[str, Any] = {
            "function": fn, "symbol": p.get("ticker") or p.get("symbol"),
            "datatype": p.get("datatype", "json")}
        if params["symbol"] is None:
            raise ValueError("Missing required parameter: 'ticker' or 'symbol'")
        if fn == "TIME_SERIES_INTRADAY":
            params["interval"] = (p.get("interval")
                                  or p.get("timespan") or "5min")
            params["outputsize"] = p.get("outputsize", "compact")
            if "month" in p:
                params["month"] = p["month"]
                params["outputsize"] = p.get("outputsize", "full")
        elif fn in ("TIME_SERIES_DAILY", "TIME_SERIES_DAILY_ADJUSTED"):
            params["outputsize"] = p.get("outputsize", "full")
        return self._get_json(params)

    # -- parse side (S7/S9/S10 via adapters) ------------------------------
    def _parse_time_series(self, data: Mapping[str, Any],
                           p: Mapping[str, Any],
                           fn: str = "") -> DataFrame:
        """``'Time Series (...)': {date: {'1. open': ...}}`` -> bars frame
        through ``clean_av_headers`` (``alpha_vantage_client.py:301-353``).

        Daily/weekly/monthly series truncate to dates (mirroring the
        reference's ``.dt.date``); intraday keeps full timestamp
        precision — date truncation would collapse every bar of a day
        onto one value and break ordering."""
        ts_key = next((k for k in data if "Time Series" in k), None)
        if ts_key is None:
            if data.get("Meta Data"):
                return self.spark.range(0).drop("id")
            raise ValueError(
                f"Could not find time series data key: {list(data)}")
        rows = [{"timestamp": ts, **vals} for ts, vals in data[ts_key].items()]
        df = A.clean_av_headers(_json_frame(self.spark, rows))
        intraday = (fn == "TIME_SERIES_INTRADAY"
                    or "Intraday" in ts_key or "min)" in ts_key)
        df = df.withColumn("timestamp",
                           F.to_timestamp("timestamp") if intraday
                           else F.to_date("timestamp"))
        df = df.withColumns({c: F.col(c).try_cast("double")
                             for c in _AV_BAR_NUMERICS if c in df.columns})
        ticker = p.get("ticker") or p.get("symbol")
        if ticker:
            df = df.select(F.lit(ticker).alias("ticker"), *df.columns)
        return A.trim_requested_window(df, p).orderBy("timestamp")

    def _parse_statement(self, data: Mapping[str, Any], fn: str,
                         p: Mapping[str, Any]) -> DataFrame:
        """annual/quarterly reports -> prefixed metric columns through
        ``prefix_statement`` (``alpha_vantage_client.py:435-489``)."""
        period = str(p.get("period", "quarterly")).lower()
        key = "annualReports" if period == "annual" else "quarterlyReports"
        reports = data.get(key) or []
        df = _json_frame(self.spark, reports)
        if not reports:
            return df
        df = df.withColumnRenamed("fiscalDateEnding", "timestamp")
        df = df.withColumn("timestamp", F.to_date("timestamp"))
        ticker = data.get("symbol") or p.get("ticker") or p.get("symbol")
        if ticker:
            df = df.select(F.lit(ticker).alias("ticker"), *df.columns)
        return (A.prefix_statement(df, fn, period=period)
                .orderBy("timestamp"))

    def _parse_earnings(self, data: Mapping[str, Any],
                        p: Mapping[str, Any]) -> DataFrame:
        """quarterly/annual EPS history -> ``earnings_``-prefixed frame
        (``alpha_vantage_client.py:501-556``)."""
        period = str(p.get("period", "quarterly")).lower()
        key = "annualEarnings" if period == "annual" else "quarterlyEarnings"
        items = data.get(key) or []
        df = _json_frame(self.spark, items)
        if not items:
            return df
        df = df.withColumnRenamed("fiscalDateEnding", "timestamp")
        df = df.withColumn("timestamp", F.to_date("timestamp"))
        if "reportedDate" in df.columns:
            df = df.withColumn("reportedDate", F.to_date("reportedDate"))
        ticker = data.get("symbol") or p.get("ticker") or p.get("symbol")
        if ticker:
            df = df.select(F.lit(ticker).alias("ticker"), *df.columns)
        return A.parse_earnings(df, period=period).orderBy("timestamp")

    def _parse_earnings_estimates(self, data: Mapping[str, Any],
                                  p: Mapping[str, Any]) -> DataFrame:
        """Estimates come as several period-keyed lists; each becomes a
        period-tagged frame, unioned by name with missing columns nulled
        (``alpha_vantage_client.py:558-593``)."""
        ticker = data.get("symbol") or p.get("ticker") or p.get("symbol")
        frames = []
        for key, value in data.items():
            if not (isinstance(value, list) and value):
                continue
            lk = key.lower()
            period = ("annual" if "annual" in lk
                      else "quarterly" if "quarter" in lk else key)
            df = _json_frame(self.spark, value)
            for date_col in ("fiscalDateEnding", "fiscalDate"):
                if date_col in df.columns:
                    df = (df.withColumnRenamed(date_col, "timestamp")
                          .withColumn("timestamp", F.to_date("timestamp")))
                    break
            df = df.withColumns(
                {c: F.col(c).try_cast("double") for c in df.columns
                 if c not in ("timestamp", "period")})
            frames.append(df.withColumn("period", F.lit(period)))
        if not frames:
            return self.spark.range(0).drop("id")
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        if ticker:
            out = out.select(F.lit(ticker).alias("ticker"), *out.columns)
        return out.orderBy("timestamp", "period")

    def _parse_economic(self, data: Mapping[str, Any],
                        p: Mapping[str, Any]) -> DataFrame:
        """``{'data': [{date, value}]}`` -> normalized indicator series
        (``alpha_vantage_client.py:272-299``)."""
        if "data" not in data:
            raise ValueError(
                f"Could not find 'data' key in economic response: {list(data)}")
        df = A.normalize_indicator(_json_frame(self.spark, data["data"]))
        return A.trim_requested_window(df, p)

    def _parse_csv(self, text: str, p: Mapping[str, Any]) -> DataFrame:
        """Calendar/listing CSV passthrough (``alpha_vantage_client.py:422-433``).

        Alpha Vantage serves error and rate-limit responses as JSON
        bodies even on CSV endpoints — sniff those before parsing so a
        bad key raises instead of flowing downstream as a one-column
        garbage frame."""
        body = text.lstrip()
        if body.startswith("{"):
            data = json.loads(body)
            if "Error Message" in data:
                raise ValueError(
                    f"Alpha Vantage API Error: {data['Error Message']}")
            note = data.get("Note", "") + data.get("Information", "")
            raise ValueError(
                f"Alpha Vantage returned JSON for a CSV endpoint: {note!r}")
        pdf = pd.read_csv(StringIO(text))
        if pdf.empty:  # header-only CSV (e.g. a quiet IPO calendar)
            return self.spark.createDataFrame(
                [], ", ".join(f"`{c}` string" for c in pdf.columns)
                or "value string")
        df = self.spark.createDataFrame(pdf)
        ticker = p.get("ticker") or p.get("symbol")
        if ticker and "symbol" not in df.columns and "ticker" not in df.columns:
            df = df.select(F.lit(ticker).alias("ticker"), *df.columns)
        return df


class HttpFetcher:
    """Live implementation of the orchestrator's ``Fetcher`` protocol:
    dispatches each ``APIRequest`` to the client named by
    ``request.api_name``. Drop-in replacement for ``FixtureFetcher``.

    Advertises ``max_concurrency = 1`` so the orchestrator runs live
    requests sequentially by default — free-tier rate limits (Alpha
    Vantage: 5 req/min) turn concurrent bursts into HTTP-200 throttle
    notes. Callers with paid keys can raise it per-instance."""

    max_concurrency = 1

    def __init__(self, spark: SparkSession,
                 polygon_api_key: str = "", alpha_vantage_api_key: str = "",
                 transport: Optional[Transport] = None):
        self.clients = {
            "polygon": PolygonHttpClient(spark, polygon_api_key, transport),
            "alpha_vantage": AlphaVantageHttpClient(
                spark, alpha_vantage_api_key, transport),
        }

    def fetch(self, request) -> DataFrame:
        client = self.clients.get(request.api_name)
        if client is None:
            raise ValueError(f"Unknown api_name: {request.api_name}")
        return client.fetch(request)
