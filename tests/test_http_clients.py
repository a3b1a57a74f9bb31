"""HTTP source clients (S1/S2/S6) against canned JSON/CSV fixtures.

No live network anywhere: a recording FakeTransport returns fixture
bodies shaped like the real Polygon / Alpha Vantage responses (see
reference ``LLM_Ingestor/polygon_client.py`` /
``alpha_vantage_client.py`` and ``transform/tests/dataframes/*.csv``
for the shapes). The tests drive the full client path — route dispatch,
retry/backoff, error/rate-limit sniffing — through the shared adapters
(``parse_bars`` / ``flatten_snapshot`` / ``clean_av_headers`` /
``prefix_statement`` / ``parse_earnings``), i.e. the same lazy plans
the fixture-fed suite already verifies against DuckDB.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest

from dynamic_etl_pipeline_thesis_ii_spark.plans.contracts import APIRequest
from dynamic_etl_pipeline_thesis_ii_spark.sources.http_clients import (
    AlphaVantageHttpClient,
    HttpError,
    HttpFetcher,
    PolygonHttpClient,
    RetryingTransport,
)


class FakeTransport:
    """Returns canned bodies in order; records every (url, params)."""

    def __init__(self, *bodies):
        self.bodies = list(bodies)
        self.calls: list[tuple[str, dict]] = []

    def get(self, url, params):
        self.calls.append((url, dict(params)))
        body = self.bodies.pop(0)
        if isinstance(body, Exception):
            raise body
        return body if isinstance(body, str) else json.dumps(body)


def _req(api, endpoint, **params):
    return APIRequest(api_name=api, endpoint_name=endpoint, parameters=params)


# ---------------------------------------------------------------------------
# retry / backoff


def test_retrying_transport_retries_then_succeeds(monkeypatch):
    attempts, sleeps = [], []

    class Resp:
        text = "ok"
        def raise_for_status(self):
            pass

    def fake_get(url, params=None, timeout=None):
        attempts.append(url)
        if len(attempts) < 3:
            raise ConnectionError("boom")
        return Resp()

    import requests
    monkeypatch.setattr(requests, "get", fake_get)
    t = RetryingTransport(base_delay=2.0, sleep=sleeps.append)
    assert t.get("http://x", {}) == "ok"
    assert len(attempts) == 3
    assert sleeps == [2.0, 4.0]  # exponential backoff schedule


def test_retrying_transport_raises_after_max_attempts(monkeypatch):
    sleeps = []

    def fake_get(url, params=None, timeout=None):
        raise ConnectionError("down")

    import requests
    monkeypatch.setattr(requests, "get", fake_get)
    t = RetryingTransport(base_delay=1.0, sleep=sleeps.append)
    with pytest.raises(HttpError, match="after 3 attempts"):
        t.get("http://x", {})
    assert sleeps == [1.0, 2.0]  # no sleep after the final failure


# ---------------------------------------------------------------------------
# Polygon routes


POLYGON_AGGS = {
    "ticker": "AAPL", "status": "OK",
    "results": [
        {"t": 1704153600000, "o": 187.15, "h": 188.44, "l": 183.89,
         "c": 185.64, "v": 82488700.0, "vw": 185.9465, "n": 1008871},
        {"t": 1704240000000, "o": 184.22, "h": 185.88, "l": 183.43,
         "c": 184.25, "v": 58414460.0, "vw": 184.3226, "n": 656853},
    ],
}


def test_polygon_get_aggs_parses_bars(spark):
    t = FakeTransport(POLYGON_AGGS)
    client = PolygonHttpClient(spark, "test-key", transport=t)
    df = client.fetch(_req("polygon", "get_aggs", ticker="AAPL",
                           multiplier=1, timespan="day",
                           **{"from": "2024-01-01", "to": "2024-01-03"}))
    url, params = t.calls[0]
    assert url.endswith("/v2/aggs/ticker/AAPL/range/1/day/2024-01-01/2024-01-03")
    assert params["apiKey"] == "test-key"
    rows = df.orderBy("timestamp").collect()
    assert df.columns[0] == "ticker" and "timestamp" in df.columns
    assert [r["ticker"] for r in rows] == ["AAPL", "AAPL"]
    assert rows[0]["timestamp"] == dt.date(2024, 1, 2)  # epoch-ms -> date
    assert rows[0]["open"] == 187.15 and rows[0]["transactions"] == 1008871


def test_polygon_grouped_daily_keeps_per_row_tickers(spark):
    body = {"results": [
        {"T": "AAPL", "t": 1704240000000, "o": 1.0, "h": 2.0, "l": 0.5,
         "c": 1.5, "v": 10.0},
        {"T": "MSFT", "t": 1704240000000, "o": 3.0, "h": 4.0, "l": 2.5,
         "c": 3.5, "v": 20.0},
    ]}
    t = FakeTransport(body)
    client = PolygonHttpClient(spark, "k", transport=t)
    df = client.fetch(_req("polygon", "get_grouped_daily_aggs",
                           date="2024-01-03"))
    assert t.calls[0][0].endswith("/v2/aggs/grouped/locale/us/market/stocks/2024-01-03")
    assert sorted(r["ticker"] for r in df.collect()) == ["AAPL", "MSFT"]


def test_polygon_snapshot_flattens(spark):
    body = {"tickers": [{
        "ticker": "AAPL", "updated": 1704240000000,
        "day": {"o": 184.22, "h": 185.88, "l": 183.43, "c": 184.25,
                "v": 58414460.0, "vw": 184.3226},
        "prevDay": {"c": 185.64},
    }]}
    t = FakeTransport(body)
    client = PolygonHttpClient(spark, "k", transport=t)
    df = client.fetch(_req("polygon", "SNAPSHOT_TICKER", ticker="AAPL"))
    assert t.calls[0][0].endswith("/tickers/AAPL")
    row = df.collect()[0]
    assert row["open"] == 184.22 and row["prev_close"] == 185.64
    assert row["timestamp"] == dt.date(2024, 1, 3)


def test_polygon_economic_indicator(spark):
    body = {"results": [
        {"date": "2024-02-01", "value": 3.1},
        {"date": "2024-01-01", "value": 3.4},
    ]}
    t = FakeTransport(body)
    client = PolygonHttpClient(spark, "k", transport=t)
    df = client.fetch(_req("polygon", "INFLATION"))
    assert t.calls[0][0].endswith("/fed/v1/inflation")
    vals = [r["value"] for r in df.collect()]
    assert vals == [3.4, 3.1]  # ascending timestamp sort


def test_polygon_unknown_endpoint_raises(spark):
    client = PolygonHttpClient(spark, "k", transport=FakeTransport())
    with pytest.raises(ValueError, match="no live fetch route"):
        client.fetch(_req("polygon", "nope"))


# ---------------------------------------------------------------------------
# Alpha Vantage routes


AV_DAILY = {
    "Meta Data": {"1. Information": "Daily Prices", "2. Symbol": "IBM"},
    "Time Series (Daily)": {
        "2024-01-03": {"1. open": "160.10", "2. high": "161.10",
                       "3. low": "159.25", "4. close": "160.10",
                       "5. volume": "3742000"},
        "2024-01-02": {"1. open": "162.83", "2. high": "163.31",
                       "3. low": "160.39", "4. close": "160.85",
                       "5. volume": "3955993"},
    },
}


def test_av_daily_time_series_route_and_parse(spark):
    t = FakeTransport(AV_DAILY)
    client = AlphaVantageHttpClient(spark, "av-key", transport=t)
    df = client.fetch(_req("alpha_vantage", "TIME_SERIES_DAILY",
                           ticker="IBM", outputsize="full"))
    _, params = t.calls[0]
    assert params["function"] == "TIME_SERIES_DAILY"
    assert params["symbol"] == "IBM" and params["outputsize"] == "full"
    assert params["apikey"] == "av-key"
    rows = df.collect()
    # '1. open' -> 'open' via clean_av_headers; strings -> double
    assert rows[0]["timestamp"] == dt.date(2024, 1, 2)
    assert rows[0]["open"] == 162.83 and rows[0]["volume"] == 3955993.0
    assert rows[0]["ticker"] == "IBM"


def test_av_timespan_fallback_routes_intraday(spark):
    body = {"Meta Data": {}, "Time Series (5min)": {
        "2024-01-02 10:00:00": {"1. open": "1.0", "2. high": "2.0",
                                "3. low": "0.5", "4. close": "1.5",
                                "5. volume": "100"}}}
    t = FakeTransport(body)
    client = AlphaVantageHttpClient(spark, "k", transport=t)
    df = client.fetch(APIRequest(
        api_name="alpha_vantage", endpoint_name="stock_bars",
        parameters={"ticker": "IBM", "timespan": "5min", "function": ""}))
    _, params = t.calls[0]
    assert params["function"] == "TIME_SERIES_INTRADAY"
    assert params["interval"] == "5min"
    assert params["outputsize"] == "compact"
    assert df.count() == 1


def test_av_unsupported_timespan_raises(spark):
    client = AlphaVantageHttpClient(spark, "k", transport=FakeTransport())
    with pytest.raises(ValueError, match="Unsupported timespan"):
        client.fetch(APIRequest(api_name="alpha_vantage",
                                endpoint_name="stock_bars",
                                parameters={"ticker": "IBM",
                                            "timespan": "fortnight",
                                            "function": ""}))


AV_BALANCE_SHEET = {
    "symbol": "AMZN",
    "quarterlyReports": [
        {"fiscalDateEnding": "2024-03-31", "reportedCurrency": "USD",
         "totalAssets": "530977000000", "totalLiabilities": "310119000000",
         "totalShareholderEquity": "220858000000"},
        {"fiscalDateEnding": "2023-12-31", "reportedCurrency": "USD",
         "totalAssets": "527854000000", "totalLiabilities": "325979000000",
         "totalShareholderEquity": "201875000000"},
    ],
}


def test_av_balance_sheet_prefixes_metrics(spark):
    t = FakeTransport(AV_BALANCE_SHEET)
    client = AlphaVantageHttpClient(spark, "k", transport=t)
    df = client.fetch(_req("alpha_vantage", "BALANCE_SHEET", ticker="AMZN"))
    assert t.calls[0][1]["function"] == "BALANCE_SHEET"
    rows = df.collect()
    assert "balance_sheet_totalAssets" in df.columns
    assert rows[0]["ticker"] == "AMZN" and rows[0]["period"] == "quarterly"
    assert rows[0]["timestamp"] == dt.date(2023, 12, 31)
    assert rows[0]["balance_sheet_totalAssets"] == 527854000000.0
    assert rows[0]["reportedCurrency"] == "USD"  # identity column unprefixed


def test_av_earnings_prefix_and_reported_date(spark):
    body = {"symbol": "AMZN", "quarterlyEarnings": [
        {"fiscalDateEnding": "2024-03-31", "reportedDate": "2024-04-30",
         "reportedEPS": "0.98", "estimatedEPS": "0.83",
         "surprise": "0.15", "surprisePercentage": "18.07"}]}
    t = FakeTransport(body)
    client = AlphaVantageHttpClient(spark, "k", transport=t)
    df = client.fetch(_req("alpha_vantage", "EARNINGS", ticker="AMZN"))
    row = df.collect()[0]
    assert row["earnings_reportedEPS"] == 0.98
    assert row["earnings_surprisePercentage"] == 18.07
    assert row["reportedDate"] == dt.date(2024, 4, 30)


def test_av_economic_series(spark):
    body = {"name": "CPI", "data": [
        {"date": "2024-02-01", "value": "310.326"},
        {"date": "2024-01-01", "value": "309.685"}]}
    t = FakeTransport(body)
    client = AlphaVantageHttpClient(spark, "k", transport=t)
    df = client.fetch(_req("alpha_vantage", "CPI", interval="monthly"))
    assert t.calls[0][1]["interval"] == "monthly"
    vals = [r["value"] for r in df.collect()]
    assert vals == [309.685, 310.326]


def test_av_csv_calendar_route(spark):
    csv_text = ("symbol,name,reportDate,fiscalDateEnding,estimate,currency\n"
                "AMZN,Amazon.com Inc,2024-04-30,2024-03-31,0.83,USD\n"
                "IBM,IBM Corp,2024-04-24,2024-03-31,1.59,USD\n")
    t = FakeTransport(csv_text)
    client = AlphaVantageHttpClient(spark, "k", transport=t)
    df = client.fetch(_req("alpha_vantage", "EARNINGS_CALENDAR",
                           horizon="3month"))
    assert t.calls[0][1]["datatype"] == "csv"
    assert t.calls[0][1]["horizon"] == "3month"
    assert df.count() == 2 and "estimate" in df.columns


def test_av_overview_single_row(spark):
    body = {"Symbol": "IBM", "MarketCapitalization": "170000000000",
            "PERatio": "22.5", "EPS": "8.15"}
    t = FakeTransport(body)
    client = AlphaVantageHttpClient(spark, "k", transport=t)
    df = client.fetch(_req("alpha_vantage", "OVERVIEW", ticker="IBM"))
    row = df.collect()[0]
    assert row["PERatio"] == 22.5 and df.count() == 1


def test_av_error_message_raises(spark):
    t = FakeTransport({"Error Message": "Invalid API call."})
    client = AlphaVantageHttpClient(spark, "k", transport=t)
    with pytest.raises(ValueError, match="Alpha Vantage API Error"):
        client.fetch(_req("alpha_vantage", "TIME_SERIES_DAILY", ticker="IBM"))


def test_av_rate_limit_note_warns(spark):
    body = dict(AV_DAILY)
    body["Note"] = ("Thank you for using Alpha Vantage! Our standard API "
                    "call frequency is 25 requests per day.")
    t = FakeTransport(body)
    client = AlphaVantageHttpClient(spark, "k", transport=t)
    with pytest.warns(UserWarning, match="rate limit"):
        df = client.fetch(_req("alpha_vantage", "TIME_SERIES_DAILY",
                               ticker="IBM"))
    assert df.count() == 2


# ---------------------------------------------------------------------------
# fetcher dispatch + orchestrator plumbing


def test_http_fetcher_dispatches_by_api_name(spark):
    fetcher = HttpFetcher(spark, transport=FakeTransport(POLYGON_AGGS))
    df = fetcher.fetch(_req("polygon", "get_aggs", ticker="AAPL",
                            multiplier=1, timespan="day",
                            **{"from": "2024-01-01", "to": "2024-01-03"}))
    assert df.count() == 2
    with pytest.raises(ValueError, match="Unknown api_name"):
        fetcher.fetch(_req("nope", "x"))


# ---------------------------------------------------------------------------
# full pipeline over HTTP (canned transport): NL query -> plan -> fetch
# -> parse -> integrate -> clean -> enrich


class RoutingFakeTransport:
    """Dispatches by URL instead of call order: polygon agg routes get a
    Polygon-shaped body, the Alpha Vantage base URL gets an AV-shaped
    daily series. 40 days of bars on both sides, slightly offset."""

    def __init__(self):
        import datetime as dt
        self.calls = []
        self.days = [dt.date(2024, 1, 1) + dt.timedelta(days=i)
                     for i in range(40)]

    def get(self, url, params):
        self.calls.append((url, dict(params)))
        if "/v2/aggs/" in url:
            epoch = dt.date(1970, 1, 1)
            return json.dumps({"results": [
                {"t": (d - epoch).days * 86_400_000,
                 "o": 100.0 + i, "h": 101.0 + i, "l": 99.0 + i,
                 "c": 100.5 + i, "v": 1000.0 + i, "vw": 100.2 + i, "n": 10}
                for i, d in enumerate(self.days)]})
        series = {d.isoformat(): {"1. open": str(100.01 + i),
                                  "2. high": str(101.01 + i),
                                  "3. low": str(99.01 + i),
                                  "4. close": str(100.51 + i),
                                  "5. volume": str(1001 + i)}
                  for i, d in enumerate(self.days)}
        return json.dumps({"Meta Data": {"2. Symbol": "AAPL"},
                           "Time Series (Daily)": series})


def test_pipeline_end_to_end_over_http(spark):
    """The FixtureFetcher e2e test, with the fetch stage swapped for the
    live-HTTP client path (canned transport): proves a user with real
    API keys gets the same plan->integrate->transform lifecycle."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import Pipeline

    transport = RoutingFakeTransport()
    fetcher = HttpFetcher(spark, polygon_api_key="pk",
                          alpha_vantage_api_key="ak", transport=transport)
    events = []
    pipe = Pipeline(spark, fetcher,
                    progress=lambda stage, info: events.append(stage))
    result = pipe.run("Get AAPL daily stock prices from 2024-01-01 to "
                      "2024-02-09 with 20-day SMA")
    assert result["status"] == "complete"
    assert result["reports"]["execution"]["overall"] == "COMPLETE"
    # both API sides were actually fetched over the transport
    assert any("/v2/aggs/" in u for u, _ in transport.calls)
    assert any(p.get("function") == "TIME_SERIES_DAILY"
               for _, p in transport.calls)
    assert "integrate" in events and "transform" in events
    outputs = result["outputs"]
    assert outputs and "sma_close_20" in outputs[0].columns
    rows = outputs[0].orderBy("timestamp").collect()
    assert len(rows) >= 40
    assert rows[-1]["sma_close_20"] is not None


def test_polygon_daily_open_close(spark):
    body = {"status": "OK", "from": "2024-01-03", "symbol": "AAPL",
            "open": 184.22, "high": 185.88, "low": 183.43, "close": 184.25,
            "volume": 58414460, "afterHours": 184.6, "preMarket": 184.0}
    t = FakeTransport(body)
    client = PolygonHttpClient(spark, "k", transport=t)
    df = client.fetch(_req("polygon", "get_daily_open_close_agg",
                           ticker="AAPL", date="2024-01-03"))
    assert t.calls[0][0].endswith("/v1/open-close/AAPL/2024-01-03")
    row = df.collect()[0]
    assert row["open"] == 184.22 and row["afterHours"] == 184.6
    assert df.count() == 1


def test_av_earnings_estimates_multi_list(spark):
    body = {
        "symbol": "IBM",
        "annualEarningsEstimates": [
            {"fiscalDateEnding": "2024-12-31", "estimatedEPS": "9.5",
             "numberOfAnalysts": "12"}],
        "quarterlyEarningsEstimates": [
            {"fiscalDateEnding": "2024-03-31", "estimatedEPS": "1.6",
             "numberOfAnalysts": "10"},
            {"fiscalDateEnding": "2024-06-30", "estimatedEPS": "2.1"}],
    }
    t = FakeTransport(body)
    client = AlphaVantageHttpClient(spark, "k", transport=t)
    df = client.fetch(_req("alpha_vantage", "EARNINGS_ESTIMATES",
                           ticker="IBM"))
    rows = df.orderBy("timestamp", "period").collect()
    assert [r["period"] for r in rows] == ["quarterly", "quarterly", "annual"]
    assert rows[0]["estimatedEPS"] == 1.6
    assert rows[0]["ticker"] == "IBM"
    # second quarterly row lacks numberOfAnalysts -> null via unionByName
    assert rows[1]["numberOfAnalysts"] is None


# ---------------------------------------------------------------------------
# live-API response-shape regressions (review findings): shapes the
# earlier fixtures got wrong vs the real services


def test_polygon_get_aggs_defaults_window_when_dateless(spark):
    """Planner omits from/to for dateless queries; the client must
    default to a 30-day window instead of KeyError'ing."""
    t = FakeTransport(POLYGON_AGGS)
    client = PolygonHttpClient(spark, "k", transport=t)
    df = client.fetch(_req("polygon", "get_aggs", ticker="AAPL",
                           multiplier=1, timespan="day"))
    url, _ = t.calls[0]
    parts = url.rsplit("/", 2)
    start, end = dt.date.fromisoformat(parts[1]), dt.date.fromisoformat(parts[2])
    assert (end - start).days == 30
    assert df.count() == 2


def test_polygon_prev_close_with_T_key(spark):
    """/prev rows carry both 'T' (ticker) and 't' (epoch) — must not
    collide under case-insensitive resolution."""
    body = {"results": [{"T": "AAPL", "t": 1704240000000, "o": 1.0,
                         "h": 2.0, "l": 0.5, "c": 1.5, "v": 10.0}]}
    client = PolygonHttpClient(spark, "k", transport=FakeTransport(body))
    row = client.fetch(_req("polygon", "get_previous_close_agg",
                            ticker="AAPL")).collect()[0]
    assert row["ticker"] == "AAPL" and row["close"] == 1.5


def test_polygon_single_ticker_snapshot_singular_key(spark):
    """The single-ticker snapshot returns {'ticker': {...}}, not a
    'tickers' list."""
    body = {"status": "OK", "ticker": {
        "ticker": "AAPL", "updated": 1704240000000,
        "day": {"o": 1.0, "h": 2.0, "l": 0.5, "c": 1.5, "v": 10.0,
                "vw": 1.2},
        "prevDay": {"c": 1.4}}}
    client = PolygonHttpClient(spark, "k", transport=FakeTransport(body))
    row = client.fetch(_req("polygon", "SNAPSHOT_TICKER",
                            ticker="AAPL")).collect()[0]
    assert row["prev_close"] == 1.4


def test_polygon_registry_only_endpoint_clear_error(spark):
    client = PolygonHttpClient(spark, "k", transport=FakeTransport())
    with pytest.raises(ValueError, match="registry-only"):
        client.fetch(_req("polygon", "TOP_MARKET_MOVERS"))


def test_av_csv_route_sniffs_json_error_bodies(spark):
    client = AlphaVantageHttpClient(
        spark, "k", transport=FakeTransport({"Error Message": "bad key"}))
    with pytest.raises(ValueError, match="Alpha Vantage API Error"):
        client.fetch(_req("alpha_vantage", "LISTING_STATUS"))

    client2 = AlphaVantageHttpClient(
        spark, "k", transport=FakeTransport(
            {"Information": "rate limited, slow down"}))
    with pytest.raises(ValueError, match="JSON for a CSV endpoint"):
        client2.fetch(_req("alpha_vantage", "IPO_CALENDAR"))


def test_av_csv_header_only_returns_empty_frame(spark):
    client = AlphaVantageHttpClient(
        spark, "k",
        transport=FakeTransport("symbol,ipoDate,priceRangeLow\n"))
    df = client.fetch(_req("alpha_vantage", "IPO_CALENDAR"))
    assert df.count() == 0 and "symbol" in df.columns


# ---------------------------------------------------------------------------
# round-5 advice fixes: fed host, intraday precision, Information sniff,
# live-fetcher concurrency


def test_polygon_fed_indicators_use_dedicated_host(spark):
    """Economic indicators live on the reference's dedicated fed host
    (polygon_client.py:33), not the aggregates base URL."""
    body = {"results": [{"date": "2024-01-01", "value": 3.4}]}
    t = FakeTransport(body)
    client = PolygonHttpClient(spark, "k", transport=t)
    client.fetch(_req("polygon", "CPI"))
    url, _ = t.calls[0]
    assert url == "https://api.massive.com/fed/v1/inflation/cpi"
    # aggregates still hit the main host
    t2 = FakeTransport(POLYGON_AGGS)
    client2 = PolygonHttpClient(spark, "k", transport=t2)
    client2.fetch(_req("polygon", "get_previous_close_agg", ticker="AAPL"))
    assert t2.calls[0][0].startswith("https://api.polygon.io/")


def test_av_intraday_keeps_timestamp_precision(spark):
    """Intraday series must not collapse to dates — each bar of the day
    keeps its own timestamp and sorts deterministically."""
    body = {"Meta Data": {}, "Time Series (5min)": {
        "2024-01-02 10:05:00": {"1. open": "2.0", "2. high": "2.5",
                                "3. low": "1.5", "4. close": "2.2",
                                "5. volume": "200"},
        "2024-01-02 10:00:00": {"1. open": "1.0", "2. high": "2.0",
                                "3. low": "0.5", "4. close": "1.5",
                                "5. volume": "100"}}}
    client = AlphaVantageHttpClient(spark, "k", transport=FakeTransport(body))
    rows = client.fetch(_req("alpha_vantage", "TIME_SERIES_INTRADAY",
                             ticker="IBM", interval="5min")).collect()
    stamps = [r["timestamp"] for r in rows]
    assert stamps == sorted(stamps) and len(set(stamps)) == 2
    assert stamps[0] == dt.datetime(2024, 1, 2, 10, 0, 0)
    assert rows[0]["close"] == 1.5 and rows[1]["close"] == 2.2
    # daily series still truncate to dates (reference .dt.date parity)
    daily = AlphaVantageHttpClient(
        spark, "k", transport=FakeTransport(AV_DAILY))
    drow = daily.fetch(_req("alpha_vantage", "TIME_SERIES_DAILY",
                            ticker="IBM")).collect()[0]
    assert drow["timestamp"] == dt.date(2024, 1, 2)


def test_av_information_key_rate_limit_warns(spark):
    """Newer AV tiers send throttle messages under 'Information', not
    'Note' — both must surface as a warning, not a parse failure."""
    body = dict(AV_DAILY)
    body["Information"] = ("You have reached the rate limit for your "
                           "free API key.")
    client = AlphaVantageHttpClient(spark, "k", transport=FakeTransport(body))
    with pytest.warns(UserWarning, match="rate limit"):
        df = client.fetch(_req("alpha_vantage", "TIME_SERIES_DAILY",
                               ticker="IBM"))
    assert df.count() == 2


def test_polygon_get_aggs_follows_next_url_pagination(spark):
    """>50k-bar responses arrive paged via next_url cursors; the client
    unions all pages (bounded by max_pages) instead of silently
    truncating to page one."""
    def page(i, with_next):
        body = {"ticker": "AAPL", "results": [
            {"t": 1704153600000 + i * 86_400_000, "o": 1.0 + i,
             "h": 2.0 + i, "l": 0.5 + i, "c": 1.5 + i, "v": 10.0}]}
        if with_next:
            body["next_url"] = (
                f"https://api.polygon.io/v2/aggs/cursor/page{i + 1}")
        return body

    t = FakeTransport(page(0, True), page(1, True), page(2, False))
    client = PolygonHttpClient(spark, "k", transport=t)
    df = client.fetch(_req("polygon", "get_aggs", ticker="AAPL",
                           **{"from": "2024-01-01", "to": "2024-06-01"}))
    rows = df.orderBy("timestamp").collect()
    assert [r["close"] for r in rows] == [1.5, 2.5, 3.5]  # all 3 pages
    # cursor URLs re-requested verbatim, with the api key attached
    assert t.calls[1][0] == "https://api.polygon.io/v2/aggs/cursor/page1"
    assert t.calls[1][1] == {"apiKey": "k"}
    assert len(t.calls) == 3

    # runaway cursor chains are bounded by max_pages
    t2 = FakeTransport(*[page(i, True) for i in range(5)])
    capped = PolygonHttpClient(spark, "k", transport=t2, max_pages=2)
    df2 = capped.fetch(_req("polygon", "get_aggs", ticker="AAPL",
                            **{"from": "2024-01-01", "to": "2024-06-01"}))
    assert df2.count() == 2 and len(t2.calls) == 2


def test_http_fetcher_advertises_sequential_concurrency(spark):
    """Live fetchers default the orchestrator to sequential execution
    (free-tier rate limits); fixture fetchers keep the 4-way fan-out."""
    fetcher = HttpFetcher(spark, transport=FakeTransport())
    assert fetcher.max_concurrency == 1
