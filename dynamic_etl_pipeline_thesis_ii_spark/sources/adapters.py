"""Source-side normalization adapters (reference S3–S11, SURVEY.md §2.1).

The reference parses REST API responses into canonical frames inside its
API clients (``LLM_Ingestor/polygon_client.py``,
``alpha_vantage_client.py``). Our adapters express the same
normalizations as lazy DataFrame transforms, so they compose with any
Spark source (parquet/CSV/JSON/stream) and Catalyst pushes filters
through them:

- ``parse_bars``           — S3: short→long column renames, epoch-ms →
                             UTC date, inject ticker literal
- ``flatten_snapshot``     — S4: nested day/prevDay structs → flat row
- ``normalize_indicator``  — S5: date→timestamp, first present value
                             column, numeric coercion, sort asc
- ``clean_av_headers``     — F4: '1. open' → 'open'
- ``trim_requested_window``— S8: from/to filter, else tail(limit), else
                             frequency window, else last-30-days
- ``prefix_statement``     — S9: metric-column prefixing + period tag
- ``parse_earnings``       — S10: earnings_ prefixing (same mechanism)
- ``simple_json_row``      — S11: one flat dict → 1-row DataFrame

All are column-level renames/casts/filters — zero-shuffle narrow ops at
any scale except the tail-N trim (a global top-N: Spark runs it as a
per-partition limit + single-reduce merge, no full sort).
"""

from __future__ import annotations

import re
from typing import Any, Mapping, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# reference polygon_client.py:14-23
POLYGON_COLUMN_MAP = {
    "o": "open", "h": "high", "l": "low", "c": "close",
    "v": "volume", "t": "timestamp", "vw": "vwap", "n": "transactions",
}

# reference alpha_vantage_client.py:22-39
FREQUENCY_WINDOW_MAP = {
    "intraday": 100, "1min": 100, "5min": 100, "15min": 100,
    "30min": 100, "60min": 100,
    "daily": 30, "day": 30, "weekly": 26, "week": 26,
    "monthly": 12, "month": 12, "quarterly": 20, "quarter": 20,
    "annual": 10, "year": 10,
}

DEFAULT_WINDOW_DAYS = 30

# reference alpha_vantage_client.py:491-499
STATEMENT_PREFIXES = {
    "INCOME_STATEMENT": "income_statement_",
    "BALANCE_SHEET": "balance_sheet_",
    "CASH_FLOW": "cash_flow_",
    "EARNINGS": "earnings_",
}


def parse_bars(df: DataFrame, ticker: Optional[str] = None,
               column_map: Optional[Mapping[str, str]] = None,
               epoch_col: str = "t") -> DataFrame:
    """Polygon aggregate normalization (``polygon_client.py:76-119``):
    rename short columns to long names, convert the epoch-ms column to a
    UTC date, inject the ticker literal, sort by timestamp."""
    cmap = dict(column_map or POLYGON_COLUMN_MAP)
    out = df.withColumnsRenamed({k: v for k, v in cmap.items() if k in df.columns})
    ts_col = cmap.get(epoch_col, "timestamp")
    if ts_col in out.columns:
        out = out.withColumn(ts_col, F.to_date(F.timestamp_millis(F.col(ts_col))))
    if ticker is not None and "ticker" not in out.columns:
        out = out.select(F.lit(ticker).alias("ticker"), *out.columns)
    order = [c for c in ("ticker", "timestamp") if c in out.columns]
    return out.orderBy(*order) if order else out


def flatten_snapshot(df: DataFrame) -> DataFrame:
    """Snapshot flatten (``polygon_client.py:121-173``): nested
    ``{ticker, day{o,h,l,c,v,vw}, prevDay{c}, updated}`` → one flat row
    per ticker. Works on any struct-typed frame with those fields."""
    return df.select(
        F.col("ticker"),
        F.col("day.o").alias("open"),
        F.col("day.h").alias("high"),
        F.col("day.l").alias("low"),
        F.col("day.c").alias("close"),
        F.col("day.v").alias("volume"),
        F.col("day.vw").alias("vwap"),
        F.col("prevDay.c").alias("prev_close"),
        F.to_date(F.timestamp_millis(F.col("updated"))).alias("timestamp"),
    )


def normalize_indicator(df: DataFrame,
                        value_candidates: tuple[str, ...] = ("value", "v", "measure"),
                        date_col: str = "date") -> DataFrame:
    """Economic-indicator normalization (``polygon_client.py:193-231``):
    ``date`` → ``timestamp``, first present candidate column → ``value``
    (numeric-coerced; invalid → null), ascending sort."""
    out = df
    if date_col in out.columns:
        out = out.withColumnRenamed(date_col, "timestamp")
    present = [c for c in value_candidates if c in out.columns]
    if present:
        out = out.withColumn("value", F.col(present[0]).cast("double"))
        out = out.drop(*[c for c in present if c != "value"])
    return out.orderBy("timestamp")


_AV_HEADER = re.compile(r"^\d+\.\s*")


def clean_av_headers(df: DataFrame) -> DataFrame:
    """Alpha Vantage header cleanup (``alpha_vantage_client.py:323-329``):
    ``'1. open'`` → ``'open'`` on every column."""
    return df.withColumnsRenamed(
        {c: _AV_HEADER.sub("", c).strip().replace(" ", "_")
         for c in df.columns if _AV_HEADER.match(c) or " " in c})


def trim_requested_window(df: DataFrame, features: Mapping[str, Any],
                          ts_col: str = "timestamp") -> DataFrame:
    """Requested-window trim (``alpha_vantage_client.py:355-417``):

    1. explicit from/to (or single ``date``) → inclusive range filter,
       missing start defaults to end − 30 days;
    2. else ``limit`` → most-recent-N;
    3. else frequency → most-recent-N from FREQUENCY_WINDOW_MAP;
    4. else last-30-days from the frame's max timestamp.

    Tail-N is ``orderBy(desc).limit(N)`` + re-sort — a top-N, not a full
    sort. The last-30-days path needs one tiny agg action for max(ts).
    """
    if ts_col not in df.columns:
        return df
    start = features.get("from") or features.get("start_date") or features.get("date")
    end = features.get("to") or features.get("end_date") or features.get("date")

    if start or end:
        if end is None:
            out = df.filter(F.col(ts_col) >= F.lit(start).cast("date"))
        elif start is None:
            out = df.filter(
                (F.col(ts_col) <= F.lit(end).cast("date"))
                & (F.col(ts_col) >= F.date_sub(F.lit(end).cast("date"),
                                               DEFAULT_WINDOW_DAYS)))
        else:
            out = df.filter(F.col(ts_col).between(F.lit(start).cast("date"),
                                                  F.lit(end).cast("date")))
        return out.orderBy(ts_col)

    limit = features.get("limit")
    n = None
    if limit is not None:
        try:
            n = int(limit)
        except (TypeError, ValueError):
            n = None
    if n is None:
        freq = str(features.get("frequency", features.get("interval", ""))).lower()
        n = FREQUENCY_WINDOW_MAP.get(freq)
    if n is not None:
        return df.orderBy(F.col(ts_col).desc()).limit(n).orderBy(ts_col)

    max_ts = df.agg(F.max(ts_col)).first()[0]
    if max_ts is None:
        return df
    return (df.filter(F.col(ts_col) >= F.date_sub(F.lit(max_ts), DEFAULT_WINDOW_DAYS))
            .orderBy(ts_col))


def prefix_statement(df: DataFrame, statement_type: str,
                     period: Optional[str] = None,
                     keep: tuple[str, ...] = ("ticker", "timestamp", "period",
                                              "reportedCurrency"),
                     ) -> DataFrame:
    """Financial-statement normalization (``alpha_vantage_client.py:435-499``):
    every metric column gains the statement prefix; identity columns
    stay; optional ``period`` tag column; metrics numeric-coerced."""
    prefix = STATEMENT_PREFIXES.get(statement_type.upper(), statement_type.lower() + "_")
    out = df
    if period is not None:
        out = out.withColumn("period", F.lit(period))
    metric_cols = [c for c in out.columns if c not in keep]
    out = out.withColumnsRenamed({c: prefix + c for c in metric_cols})
    return out.withColumns(
        {prefix + c: F.col(prefix + c).cast("double") for c in metric_cols})


def parse_earnings(df: DataFrame, period: Optional[str] = None) -> DataFrame:
    """Earnings normalization (``alpha_vantage_client.py:501-556``)."""
    return prefix_statement(df, "EARNINGS", period=period,
                            keep=("ticker", "timestamp", "period", "reportedDate"))


def simple_json_row(spark: SparkSession, obj: Mapping[str, Any]) -> DataFrame:
    """One flat JSON object → 1-row frame with numeric coercion where
    possible (``alpha_vantage_client.py:595-615``)."""
    def coerce(v):
        if isinstance(v, (int, float, bool)) or v is None:
            return v
        try:
            return float(v)
        except (TypeError, ValueError):
            return str(v)
    row = {k: coerce(v) for k, v in obj.items()}
    return spark.createDataFrame([row])


def read_csv_lenient(spark: SparkSession, path: str, **options) -> DataFrame:
    """CSV scan with the reference's lenient semantics
    (``data_cleaning.py:582-598``): skip malformed lines, trim leading
    whitespace, infer schema."""
    opts = {"header": "true", "inferSchema": "true",
            "mode": "DROPMALFORMED", "ignoreLeadingWhiteSpace": "true"}
    opts.update({k: str(v) for k, v in options.items()})
    reader = spark.read
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.csv(path)
