"""Source-adapter suite (S3–S11): the API-response normalizations as
oracle-checked DataFrame transforms over API-shaped fixtures derived
from the ``events`` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.sources import adapters as A
from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import Catalog


def _raw_polygon_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon-aggregate-shaped raw frame: short column names, epoch-ms
    timestamps — what ``parse_response`` receives."""
    ev = Catalog(spark, sf_dir).events.filter(F.col("event_type") == "click")
    return ev.select(
        F.unix_millis("ts").alias("t"),
        F.col("value").alias("o"),
        (F.col("value") * 1.01).alias("h"),
        (F.col("value") * 0.99).alias("l"),
        (F.col("value") * 1.001).alias("c"),
        F.col("user_id").alias("v"),
        (F.col("value") / 2).alias("vw"),
        F.lit(5).alias("n"))


def q_src_parse_bars(spark, sf_dir):
    return A.parse_bars(_raw_polygon_frame(spark, sf_dir), ticker="AAPL")


ORACLE_SRC_PARSE_BARS = """
SELECT 'AAPL' AS ticker, ts::DATE AS timestamp,
       value AS open, value * 1.01 AS high, value * 0.99 AS low,
       value * 1.001 AS close, user_id AS volume, value / 2 AS vwap,
       5 AS transactions
FROM events WHERE event_type = 'click'
"""


def q_src_snapshot_flatten(spark, sf_dir):
    """Nested snapshot struct -> flat row per ticker (S4)."""
    ev = Catalog(spark, sf_dir).events
    snap = (ev.groupBy(F.col("event_type").alias("ticker"))
            .agg(F.min("value").alias("o"), F.max("value").alias("h"),
                 F.round(F.sum("value"), 4).alias("v"),
                 F.round(F.avg("value"), 4).alias("vw"),
                 F.max("ts").alias("max_ts"))
            .select("ticker",
                    F.struct(F.col("o"), F.col("h"),
                             F.col("o").alias("l"), F.col("h").alias("c"),
                             F.col("v"), F.col("vw")).alias("day"),
                    F.struct(F.col("o").alias("c")).alias("prevDay"),
                    F.unix_millis("max_ts").alias("updated")))
    return A.flatten_snapshot(snap)


ORACLE_SRC_SNAPSHOT_FLATTEN = """
SELECT event_type AS ticker,
       min(value) AS open, max(value) AS high, min(value) AS low,
       max(value) AS close, round(sum(value), 4) AS volume,
       round(avg(value), 4) AS vwap, min(value) AS prev_close,
       max(ts)::DATE AS timestamp
FROM events GROUP BY event_type
"""


def q_src_indicator_normalize(spark, sf_dir):
    """date->timestamp rename, value-candidate pick, coercion, sort (S5)."""
    ev = Catalog(spark, sf_dir).events.filter(F.col("event_type") == "view")
    raw = ev.select(F.col("ts").cast("date").alias("date"),
                    F.col("value").alias("v"),
                    F.lit("x").alias("measure"))
    return A.normalize_indicator(raw)


ORACLE_SRC_INDICATOR = """
SELECT ts::DATE AS timestamp, value AS value
FROM events WHERE event_type = 'view'
"""


def _daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per date — distinct timestamps so tail-N is deterministic."""
    ev = Catalog(spark, sf_dir).events
    return (ev.groupBy(F.col("ts").cast("date").alias("timestamp"))
            .agg(F.round(F.avg("value"), 4).alias("value")))


_SQL_DAILY_BARS = """
daily AS (
  SELECT ts::DATE AS timestamp, round(avg(value), 4) AS value
  FROM events GROUP BY ts::DATE
)
"""


def q_src_window_trim_range(spark, sf_dir):
    bars = _daily_bars(spark, sf_dir)
    return A.trim_requested_window(bars, {"from": "2024-01-10", "to": "2024-01-20"})


ORACLE_SRC_WINDOW_RANGE = f"""
WITH {_SQL_DAILY_BARS}
SELECT * FROM daily
WHERE timestamp BETWEEN DATE '2024-01-10' AND DATE '2024-01-20'
"""


def q_src_window_trim_tail(spark, sf_dir):
    bars = _daily_bars(spark, sf_dir)
    return A.trim_requested_window(bars, {"limit": 10})


ORACLE_SRC_WINDOW_TAIL = f"""
WITH {_SQL_DAILY_BARS}
SELECT * FROM (SELECT * FROM daily ORDER BY timestamp DESC LIMIT 10)
"""


def q_src_window_trim_freq(spark, sf_dir):
    bars = _daily_bars(spark, sf_dir)
    return A.trim_requested_window(bars, {"frequency": "monthly"})


ORACLE_SRC_WINDOW_FREQ = f"""
WITH {_SQL_DAILY_BARS}
SELECT * FROM (SELECT * FROM daily ORDER BY timestamp DESC LIMIT 12)
"""


def q_src_statement_prefix(spark, sf_dir):
    """Financial-statement metric prefixing + period tag (S9)."""
    cust = Catalog(spark, sf_dir).customer
    raw = cust.select(F.col("c_name").alias("ticker"),
                      F.col("c_acctbal").alias("totalRevenue"),
                      (F.col("c_acctbal") / 2).alias("netIncome"),
                      F.lit("USD").alias("reportedCurrency"))
    return A.prefix_statement(raw, "INCOME_STATEMENT", period="annual")


ORACLE_SRC_STATEMENT_PREFIX = """
SELECT c_name AS ticker,
       c_acctbal AS income_statement_totalRevenue,
       c_acctbal / 2 AS income_statement_netIncome,
       'USD' AS reportedCurrency,
       'annual' AS period
FROM customer
"""


def q_src_av_headers(spark, sf_dir):
    """'1. open' -> 'open' header cleanup (F4)."""
    ev = Catalog(spark, sf_dir).events.filter(F.col("event_type") == "signup")
    raw = ev.select(F.col("ts").cast("date").alias("timestamp"),
                    F.col("value").alias("1. open"),
                    (F.col("value") * 2).alias("2. adjusted close"),
                    F.col("user_id").alias("6. volume"))
    return A.clean_av_headers(raw)


ORACLE_SRC_AV_HEADERS = """
SELECT ts::DATE AS timestamp, value AS open,
       value * 2 AS adjusted_close, user_id AS volume
FROM events WHERE event_type = 'signup'
"""


# ---------------------------------------------------------------------------
# consolidated registry entries: the per-adapter transforms above are
# unioned (superset schema, `part`/`mode` tag) so the whole sources
# family fits the driver's correctness window in 3 entries while every
# adapter still contributes verified rows.
# ---------------------------------------------------------------------------

def q_src_parse_normalize(spark, sf_dir):
    """S3 (Polygon bar parse) + F4 (AV header clean) + S5 (indicator
    normalize) + S4 (snapshot flatten) + S9 (statement prefixing) +
    S8/P9/O3 (the three requested-window trim modes) — one result,
    tagged by `part`, schemas unioned by name. The former
    `src_flatten_prefix` and `src_window_trim` entries' parts were
    folded in here so the registry stays under the driver's 50-entry
    recording window (round 11 grew the registry to 54 and the driver
    silently dropped BOTH source entries — see
    ``queries/__init__.all_queries``)."""
    bars = q_src_parse_bars(spark, sf_dir).withColumn("part", F.lit("bars"))
    av = q_src_av_headers(spark, sf_dir).withColumn("part", F.lit("av"))
    ind = q_src_indicator_normalize(spark, sf_dir).withColumn("part", F.lit("indicator"))
    snap = q_src_snapshot_flatten(spark, sf_dir).withColumn("part", F.lit("snapshot"))
    stmt = q_src_statement_prefix(spark, sf_dir).withColumn("part", F.lit("statement"))
    trims = [fn(spark, sf_dir)
             .select(F.col("timestamp"), F.col("value"))
             .withColumn("part", F.lit(tag))
             for tag, fn in (("trim_range", q_src_window_trim_range),
                             ("trim_tail", q_src_window_trim_tail),
                             ("trim_freq", q_src_window_trim_freq))]
    out = bars
    for piece in (av, ind, snap, stmt, *trims):
        out = out.unionByName(piece, allowMissingColumns=True)
    return out


ORACLE_SRC_PARSE_NORMALIZE = f"""
SELECT part, ticker, timestamp, open, high, low, close, volume, vwap,
       transactions, adjusted_close, value, prev_close,
       income_statement_totalRevenue, income_statement_netIncome,
       reportedCurrency, period
FROM (
  SELECT 'bars' AS part, ticker, timestamp, open, high, low, close, volume,
         vwap, transactions, NULL AS adjusted_close, NULL AS value,
         NULL AS prev_close, NULL AS income_statement_totalRevenue,
         NULL AS income_statement_netIncome, NULL AS reportedCurrency,
         NULL AS period
  FROM ({ORACLE_SRC_PARSE_BARS})
  UNION ALL
  SELECT 'av', NULL, timestamp, open, NULL, NULL, NULL, volume,
         NULL, NULL, adjusted_close, NULL, NULL, NULL, NULL, NULL, NULL
  FROM ({ORACLE_SRC_AV_HEADERS})
  UNION ALL
  SELECT 'indicator', NULL, timestamp, NULL, NULL, NULL, NULL, NULL,
         NULL, NULL, NULL, value, NULL, NULL, NULL, NULL, NULL
  FROM ({ORACLE_SRC_INDICATOR})
  UNION ALL
  SELECT 'snapshot', ticker, timestamp, open, high, low, close, volume,
         vwap, NULL, NULL, NULL, prev_close, NULL, NULL, NULL, NULL
  FROM ({ORACLE_SRC_SNAPSHOT_FLATTEN})
  UNION ALL
  SELECT 'statement', ticker, NULL, NULL, NULL, NULL, NULL, NULL,
         NULL, NULL, NULL, NULL, NULL, income_statement_totalRevenue,
         income_statement_netIncome, reportedCurrency, period
  FROM ({ORACLE_SRC_STATEMENT_PREFIX})
  UNION ALL
  SELECT 'trim_range', NULL, timestamp, NULL, NULL, NULL, NULL, NULL,
         NULL, NULL, NULL, value, NULL, NULL, NULL, NULL, NULL
  FROM ({ORACLE_SRC_WINDOW_RANGE})
  UNION ALL
  SELECT 'trim_tail', NULL, timestamp, NULL, NULL, NULL, NULL, NULL,
         NULL, NULL, NULL, value, NULL, NULL, NULL, NULL, NULL
  FROM ({ORACLE_SRC_WINDOW_TAIL})
  UNION ALL
  SELECT 'trim_freq', NULL, timestamp, NULL, NULL, NULL, NULL, NULL,
         NULL, NULL, NULL, value, NULL, NULL, NULL, NULL, NULL
  FROM ({ORACLE_SRC_WINDOW_FREQ})
)
"""


SOURCES_QUERIES = {
    "src_parse_normalize": q_src_parse_normalize,
}

SOURCES_ORACLES = {
    "src_parse_normalize": ORACLE_SRC_PARSE_NORMALIZE,
}
