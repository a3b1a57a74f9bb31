"""Feature/DSL engine suite (SURVEY.md §2.5): every registry feature
exercised through the real DSL → validator → compiler path on the
``events`` table (value aliased into an OHLCV shape, entity=user_id).

Oracle strategy:
- row-wise expressions (lag/diff/ret/calendar) are bit-identical across
  engines → no rounding;
- rolling aggregates round to 4dp (summation-order float noise);
- the recursive EMA family is oracled with DuckDB ``list_reduce`` over a
  cumulative window list — the exact ewm(adjust=False) recursion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.functions.compiler import apply_features
from dynamic_etl_pipeline_thesis_ii_spark.functions.dsl import validate_dsl
from dynamic_etl_pipeline_thesis_ii_spark.functions.registry import FEATURE_REGISTRY
from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import Catalog

_KEYS = ["event_id", "user_id", "ts"]


def _fin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events reshaped to the reference's bar schema."""
    ev = Catalog(spark, sf_dir).events
    return ev.select(
        "event_id", "user_id", "ts",
        F.col("value").alias("close"),
        (F.col("value") * 1.05).alias("high"),
        (F.col("value") * 0.95).alias("low"),
        ((F.col("event_id") % 100) + 1).cast("double").alias("volume"),
    )


_SQL_FIN = """
fin AS (
  SELECT event_id, user_id, ts, value AS close,
         value * 1.05 AS high, value * 0.95 AS low,
         cast((event_id % 100) + 1 AS double) AS volume
  FROM events
)
"""

_W = "PARTITION BY user_id ORDER BY ts"


def _apply(spark, sf_dir, features, round4=(), exact=()):
    dsl, errors = validate_dsl({"features": features}, FEATURE_REGISTRY)
    if errors:
        raise ValueError(errors)
    df = apply_features(_fin(spark, sf_dir), dsl, entity_col="user_id", ts_col="ts")
    sel = [F.col(k) for k in _KEYS]
    # NaN→null (pandas-path features emit NaN for warmup rows; the SQL
    # oracle says NULL), round 4dp, then +0.0 to normalize -0.0.
    sel += [(F.round(F.when(F.isnan(c), None).otherwise(F.col(c)), 4) + F.lit(0.0)).alias(c)
            for c in round4]
    sel += [F.col(c) for c in exact]
    return df.select(*sel)


# --- rolling aggregates (W1, W6, W8, W13, W14, W17 in one pass) -------------

def q_feat_trend_bands(spark, sf_dir):
    return _apply(spark, sf_dir, [
        {"name": "sma", "params": {"on": "close", "window": 5}},
        {"name": "rolling_avg", "params": {"on": "close", "window": 3}},
        {"name": "rolling_max", "params": {"on": "close", "window": 5}},
        {"name": "rolling_min", "params": {"on": "close", "window": 5}},
        {"name": "rolling_vol", "params": {"on": "close", "window": 5}},
        {"name": "bbands", "params": {"on": "close", "window": 5, "std_dev": 2}},
        {"name": "zscore", "params": {"on": "close", "window": 5}},
    ], round4=["sma_close_5", "rolling_avg_close_3", "rolling_vol_close_5",
               "bbands_bband_upper", "bbands_bband_middle", "bbands_bband_lower",
               "zscore_close_5"],
       exact=["rolling_max_close_5", "rolling_min_close_5"])


ORACLE_FEAT_TREND = f"""
WITH {_SQL_FIN}
SELECT event_id, user_id, ts,
  round(CASE WHEN count(close) OVER w5 >= 5 THEN avg(close) OVER w5 END, 4) + 0.0 AS sma_close_5,
  round(avg(close) OVER w3, 4) + 0.0 AS rolling_avg_close_3,
  round(CASE WHEN count(close) OVER w5 >= 5 THEN stddev_samp(close) OVER w5 END, 4) + 0.0 AS rolling_vol_close_5,
  CASE WHEN count(close) OVER w5 >= 5 THEN max(close) OVER w5 END AS rolling_max_close_5,
  CASE WHEN count(close) OVER w5 >= 5 THEN min(close) OVER w5 END AS rolling_min_close_5
FROM fin
WINDOW w5 AS ({_W} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
       w3 AS ({_W} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


ORACLE_FEAT_BBANDS_ZSCORE = f"""
WITH {_SQL_FIN}, b AS (
  SELECT event_id, user_id, ts, close,
    CASE WHEN count(close) OVER w >= 5 THEN avg(close) OVER w END AS mid,
    CASE WHEN count(close) OVER w >= 5 THEN stddev_samp(close) OVER w END AS sd
  FROM fin
  WINDOW w AS ({_W} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts,
  round(mid + sd * 2, 4) + 0.0 AS bbands_bband_upper,
  round(mid, 4) + 0.0 AS bbands_bband_middle,
  round(mid - sd * 2, 4) + 0.0 AS bbands_bband_lower,
  round((close - mid) / nullif(sd, 0), 4) + 0.0 AS zscore_close_5
FROM b
"""


def q_feat_oscillators(spark, sf_dir):
    """W4 (RSI) + W5 (stochastic) + the willr/cci extensions in one
    pass (one registry entry; the driver gate caps at 50)."""
    return _apply(spark, sf_dir, [
        {"name": "rsi", "params": {"on": "close", "window": 14}},
        {"name": "stoch", "params": {"k_window": 5, "d_window": 3}},
        {"name": "willr", "params": {"window": 5}},
        {"name": "cci", "params": {"window": 5}},
    ], round4=["rsi_close_14", "stoch_stoch_k", "stoch_stoch_d",
               "willr_5", "cci_5"])


ORACLE_FEAT_RSI = f"""
WITH {_SQL_FIN}, d AS (
  SELECT event_id, user_id, ts,
         close - lag(close) OVER ({_W}) AS delta
  FROM fin
), gl AS (
  SELECT event_id, user_id, ts,
    CASE WHEN delta IS NOT NULL THEN greatest(delta, 0) END AS gain,
    CASE WHEN delta IS NOT NULL THEN greatest(-delta, 0) END AS loss
  FROM d
)
SELECT event_id, user_id, ts,
  round(100 - 100 / (1 + (CASE WHEN count(gain) OVER w >= 14 THEN avg(gain) OVER w END)
                         / nullif(CASE WHEN count(loss) OVER w >= 14 THEN avg(loss) OVER w END, 0)), 4) + 0.0 AS rsi_close_14
FROM gl
WINDOW w AS ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
"""


ORACLE_FEAT_STOCH = f"""
WITH {_SQL_FIN}, k AS (
  SELECT event_id, user_id, ts,
    100 * (close - (CASE WHEN count(low) OVER w >= 5 THEN min(low) OVER w END))
        / nullif((CASE WHEN count(high) OVER w >= 5 THEN max(high) OVER w END)
                 - (CASE WHEN count(low) OVER w >= 5 THEN min(low) OVER w END), 0) AS k_line
  FROM fin
  WINDOW w AS ({_W} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts,
  round(k_line, 4) + 0.0 AS stoch_stoch_k,
  round(CASE WHEN count(k_line) OVER w3 >= 3 THEN avg(k_line) OVER w3 END, 4) + 0.0 AS stoch_stoch_d
FROM k
WINDOW w3 AS ({_W} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# --- row-wise + cumulative + calendar ---------------------------------------

def q_feat_momentum_calendar(spark, sf_dir):
    """W10-W12, W16, W9 (OBV) + W15 (calendar flags) in one pass."""
    return _apply(spark, sf_dir, [
        {"name": "ret", "params": {"on": "close", "periods": 1, "method": "log"}},
        {"name": "pct_change", "params": {"on": "close", "periods": 3}},
        {"name": "lag", "params": {"on": "close", "periods": 2}},
        {"name": "diff", "params": {"on": "close", "periods": 1}},
        {"name": "obv", "params": {}},
        {"name": "session_flags", "params": {}},
    ], round4=["obv"],
       exact=["ret_close", "pct_change_close", "lag_close", "diff_close",
              "session_flags_dow", "session_flags_month", "session_flags_week",
              "session_flags_hour", "session_flags_is_month_start",
              "session_flags_is_month_end"])


ORACLE_FEAT_MOMENTUM = f"""
WITH {_SQL_FIN}, s AS (
  SELECT event_id, user_id, ts, close, volume,
    lag(close, 1) OVER ({_W}) AS prev1,
    lag(close, 2) OVER ({_W}) AS prev2,
    lag(close, 3) OVER ({_W}) AS prev3,
    volume * coalesce(sign(close - lag(close, 1) OVER ({_W})), 0) AS signed_vol
  FROM fin
)
SELECT event_id, user_id, ts,
  CASE WHEN close > 0 AND prev1 > 0 THEN ln(close / prev1) END AS ret_close,
  close / nullif(prev3, 0) - 1 AS pct_change_close,
  prev2 AS lag_close,
  close - prev1 AS diff_close,
  round(CASE WHEN signed_vol IS NOT NULL
             THEN sum(signed_vol) OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) END, 4) + 0.0 AS obv
FROM s
"""


ORACLE_FEAT_SESSION_FLAGS = """
SELECT event_id, user_id, ts,
  cast(isodow(ts) - 1 AS integer) AS session_flags_dow,
  cast(month(ts) AS integer) AS session_flags_month,
  cast(weekofyear(ts) AS integer) AS session_flags_week,
  cast(hour(ts) AS integer) AS session_flags_hour,
  cast(CASE WHEN day(ts) = 1 THEN 1 ELSE 0 END AS integer) AS session_flags_is_month_start,
  cast(CASE WHEN ts::date = last_day(ts::date) THEN 1 ELSE 0 END AS integer) AS session_flags_is_month_end
FROM events
"""


# --- recursive EMA family (W2, W3, W7 — one applyInPandas pass) -------------

def q_feat_ema_family(spark, sf_dir):
    return _apply(spark, sf_dir, [
        {"name": "ema", "params": {"on": "close", "window": 5}},
        {"name": "macd", "params": {"on": "close", "fast_period": 6,
                                    "slow_period": 13, "signal_period": 4}},
        {"name": "atr", "params": {"window": 5}},
    ], round4=["ema_close_5", "macd_macd", "macd_signal", "macd_hist", "atr__5"])


ORACLE_FEAT_EMA = f"""
WITH {_SQL_FIN}, l AS (
  SELECT event_id, user_id, ts,
    list(close) OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hist
  FROM fin
)
SELECT event_id, user_id, ts,
  round(CASE WHEN len(hist) >= 5
        THEN list_reduce(hist, (acc, x) -> (2.0/6.0) * x + (1 - 2.0/6.0) * acc) END, 4) + 0.0 AS ema_close_5
FROM l
"""


ORACLE_FEAT_MACD_ATR = f"""
WITH {_SQL_FIN}, base AS (
  SELECT event_id, user_id, ts, high, low, close,
    list(close) OVER wc AS hist,
    greatest(high - low,
             coalesce(abs(high - lag(close) OVER ({_W})), high - low),
             coalesce(abs(low  - lag(close) OVER ({_W})), high - low)) AS tr
  FROM fin
  WINDOW wc AS ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), m AS (
  SELECT event_id, user_id, ts, tr,
    list_reduce(hist, (acc, x) -> (2.0/7.0) * x + (1 - 2.0/7.0) * acc)
      - list_reduce(hist, (acc, x) -> (2.0/14.0) * x + (1 - 2.0/14.0) * acc) AS macd_line
  FROM base
), sig AS (
  SELECT event_id, user_id, ts, tr, macd_line,
    list(macd_line) OVER wc AS macd_hist_list,
    list(tr) OVER wc AS tr_list
  FROM m
  WINDOW wc AS ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts,
  round(macd_line, 4) + 0.0 AS macd_macd,
  round(list_reduce(macd_hist_list, (acc, x) -> (2.0/5.0) * x + (1 - 2.0/5.0) * acc), 4) + 0.0 AS macd_signal,
  round(macd_line - list_reduce(macd_hist_list, (acc, x) -> (2.0/5.0) * x + (1 - 2.0/5.0) * acc), 4) + 0.0 AS macd_hist,
  round(list_reduce(tr_list, (acc, x) -> (2.0/6.0) * x + (1 - 2.0/6.0) * acc), 4) + 0.0 AS atr__5
FROM sig
"""


# --- sandboxed custom feature ----------------------------------------------

def q_feat_custom(spark, sf_dir):
    code = "series = (g['close'] * 2 + g['volume'] / 10).rolling(3, min_periods=1).mean()"
    return _apply(spark, sf_dir, [
        {"name": "custom_blend", "params": {"code": code, "as": "blend"}},
    ], round4=["blend"])


ORACLE_FEAT_CUSTOM = f"""
WITH {_SQL_FIN}
SELECT event_id, user_id, ts,
  round(avg(close * 2 + volume / 10) OVER ({_W} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) + 0.0 AS blend
FROM fin
"""


def _stmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Financial-statement-shaped frame (balance_sheet_* / cash_flow_* /
    income_statement_* columns) derived from customer balances — the
    input shape of the R1-R4 ratio features."""
    b = F.col("c_acctbal")
    k = F.col("c_custkey")
    cust = Catalog(spark, sf_dir).customer
    return cust.select(
        k.alias("ckey"),
        (b * 10).alias("balance_sheet_totalCurrentAssets"),
        (b * 4).alias("balance_sheet_totalCurrentLiabilities"),
        (b * 2).alias("balance_sheet_inventory"),
        F.when(k % 3 == 0, None).otherwise(b).alias("balance_sheet_longTermDebt"),
        (b / 2).alias("balance_sheet_shortTermDebt"),
        (b * 6).alias("balance_sheet_totalShareholderEquity"),
        (b * 12).alias("balance_sheet_totalAssets"),
        (b * 3).alias("cash_flow_operatingCashflow"),
        F.when(k % 5 == 0, None).otherwise(b).alias("cash_flow_capitalExpenditures"),
        (b / 4).alias("cash_flow_dividendPayout"),
        (b * 2).alias("cash_flow_netIncome"),
        (b * 5).alias("income_statement_grossProfit"),
        (b * 9).alias("income_statement_totalRevenue"),
        (b * 4).alias("income_statement_operatingIncome"),
        (b * 2).alias("income_statement_netIncome"),
        (b * 4.5).alias("income_statement_ebitda"),
        (b / 2).alias("income_statement_researchAndDevelopment"),
        (b * 4).alias("income_statement_ebit"),
        (b / 8).alias("income_statement_interestExpense"),
    )


_SQL_STMT = """
stmt AS (
  SELECT c_custkey AS ckey,
    c_acctbal * 10 AS bs_tca, c_acctbal * 4 AS bs_tcl,
    c_acctbal * 2 AS bs_inv,
    CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_acctbal END AS bs_ltd,
    c_acctbal / 2 AS bs_std, c_acctbal * 6 AS bs_tse,
    c_acctbal * 12 AS bs_ta,
    c_acctbal * 3 AS cf_ocf,
    CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END AS cf_capex,
    c_acctbal / 4 AS cf_div, c_acctbal * 2 AS cf_ni,
    c_acctbal * 5 AS is_gp, c_acctbal * 9 AS is_rev,
    c_acctbal * 4 AS is_oi, c_acctbal * 2 AS is_ni,
    c_acctbal * 4.5 AS is_ebitda, c_acctbal / 2 AS is_rd,
    c_acctbal * 4 AS is_ebit, c_acctbal / 8 AS is_int
  FROM customer
)
"""

_RATIO_FEATURES = [
    "current_ratio", "quick_ratio", "debt_to_equity", "debt_to_assets",
    "working_capital", "equity_ratio", "free_cash_flow",
    "operating_cash_margin", "capex_intensity", "dividend_payout_ratio",
    "cash_conversion_ratio", "gross_margin", "operating_margin",
    "net_margin", "ebitda_margin", "rd_intensity", "interest_coverage",
]


def q_feat_fundamental_ratios(spark, sf_dir):
    """R1/R2/R4 row-wise fundamental ratios through the DSL path."""
    dsl, errors = validate_dsl(
        {"features": [{"name": n, "params": {}} for n in _RATIO_FEATURES]},
        FEATURE_REGISTRY)
    assert not errors, errors
    df = apply_features(_stmt(spark, sf_dir), dsl, entity_col=None, ts_col="ckey")
    return df.select("ckey", *[
        # + 0.0 normalizes -0.0 (negative ratios can round to zero at
        # larger SFs; DuckDB and Spark disagree on the sign bit)
        (F.round(F.col(n), 6) + F.lit(0.0)).alias(n)
        for n in _RATIO_FEATURES])


ORACLE_FEAT_RATIOS = f"""
WITH {_SQL_STMT}
SELECT ckey,
  round(bs_tca / nullif(bs_tcl, 0), 6) + 0.0 AS current_ratio,
  round((bs_tca - bs_inv) / nullif(bs_tcl, 0), 6) + 0.0 AS quick_ratio,
  round((coalesce(bs_ltd, 0) + coalesce(bs_std, 0)) / nullif(bs_tse, 0), 6) + 0.0 AS debt_to_equity,
  round((coalesce(bs_ltd, 0) + coalesce(bs_std, 0)) / nullif(bs_ta, 0), 6) + 0.0 AS debt_to_assets,
  round(bs_tca - bs_tcl, 6) + 0.0 AS working_capital,
  round(bs_tse / nullif(bs_ta, 0), 6) + 0.0 AS equity_ratio,
  round(cf_ocf - coalesce(cf_capex, 0), 6) + 0.0 AS free_cash_flow,
  round(cf_ocf / nullif(cf_ni, 0), 6) + 0.0 AS operating_cash_margin,
  round(cf_capex / nullif(cf_ocf, 0), 6) + 0.0 AS capex_intensity,
  round(cf_div / nullif(cf_ocf, 0), 6) + 0.0 AS dividend_payout_ratio,
  round(cf_ocf / nullif(cf_ni, 0), 6) + 0.0 AS cash_conversion_ratio,
  round(is_gp / nullif(is_rev, 0), 6) + 0.0 AS gross_margin,
  round(is_oi / nullif(is_rev, 0), 6) + 0.0 AS operating_margin,
  round(is_ni / nullif(is_rev, 0), 6) + 0.0 AS net_margin,
  round(is_ebitda / nullif(is_rev, 0), 6) + 0.0 AS ebitda_margin,
  round(is_rd / nullif(is_rev, 0), 6) + 0.0 AS rd_intensity,
  round(is_ebit / nullif(is_int, 0), 6) + 0.0 AS interest_coverage
FROM stmt
"""


def q_feat_earnings(spark, sf_dir):
    """R3 + W18: earnings beat/accuracy and rolling surprise features."""
    ev = Catalog(spark, sf_dir).events
    earn = ev.select(
        "event_id", "user_id", "ts",
        (F.col("value") / 10).alias("earnings_reportedEPS"),
        (F.col("value") / 10 + F.when(F.col("event_id") % 2 == 0, 0.5)
         .otherwise(-0.5)).alias("earnings_estimatedEPS"),
        (F.col("value") - 50).alias("earnings_surprise"),
        (F.col("value") / 5 - 10).alias("earnings_surprisePercentage"))
    dsl, errors = validate_dsl({"features": [
        {"name": "earnings_beat", "params": {}},
        {"name": "forecast_accuracy", "params": {}},
        {"name": "avg_surprise", "params": {"window": 4}},
        {"name": "earnings_momentum", "params": {"window": 4}},
    ]}, FEATURE_REGISTRY)
    assert not errors, errors
    df = apply_features(earn, dsl, entity_col="user_id", ts_col="ts")
    return df.select(
        "event_id", "user_id", "ts",
        F.col("earnings_beat"),
        (F.round("forecast_accuracy", 6) + F.lit(0.0)).alias("forecast_accuracy"),
        (F.round("avg_surprise__4", 6) + F.lit(0.0)).alias("avg_surprise_4"),
        (F.round("earnings_momentum__4", 6) + F.lit(0.0)).alias("earnings_momentum_4"))


ORACLE_FEAT_EARNINGS = """
WITH earn AS (
  SELECT event_id, user_id, ts,
    value / 10 AS rep,
    value / 10 + CASE WHEN event_id % 2 = 0 THEN 0.5 ELSE -0.5 END AS est,
    value - 50 AS surprise,
    value / 5 - 10 AS surprise_pct
  FROM events
)
SELECT event_id, user_id, ts,
  CASE WHEN rep > est THEN 1 ELSE 0 END AS earnings_beat,
  round(abs(est - rep), 6) + 0.0 AS forecast_accuracy,
  round(avg(surprise_pct) OVER (PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) + 0.0 AS avg_surprise_4,
  round(avg(surprise) OVER (PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) + 0.0 AS earnings_momentum_4
FROM earn
"""


def _join_oracles(left_sql: str, right_sql: str, right_cols: list[str]) -> str:
    """Join two per-(event_id) oracle fragments into one result — the
    merged Spark query computes both feature families in a single pass,
    so the oracle composes the already-verified per-family SQL."""
    sel = ", ".join(f"b.{c}" for c in right_cols)
    return (f"SELECT a.*, {sel} FROM ({left_sql}) a "
            f"JOIN ({right_sql}) b ON a.event_id = b.event_id")


ORACLE_FEAT_TREND_BANDS = _join_oracles(
    ORACLE_FEAT_TREND, ORACLE_FEAT_BBANDS_ZSCORE,
    ["bbands_bband_upper", "bbands_bband_middle", "bbands_bband_lower",
     "zscore_close_5"])

# --- W-extensions: Williams %R + CCI (beyond the reference's registry) ------

ORACLE_FEAT_EXTRA_OSC = f"""
WITH {_SQL_FIN}, hl AS (
  SELECT event_id, user_id, ts, close,
    CASE WHEN count(high) OVER w >= 5 THEN max(high) OVER w END AS high_5,
    CASE WHEN count(low) OVER w >= 5 THEN min(low) OVER w END AS low_5,
    (high + low + close) / 3.0 AS tp
  FROM fin
  WINDOW w AS ({_W} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
), sm AS (
  SELECT *, CASE WHEN count(tp) OVER w >= 5 THEN avg(tp) OVER w END AS sma_tp
  FROM hl
  WINDOW w AS ({_W} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
), dv AS (
  SELECT *, abs(tp - sma_tp) AS dev FROM sm
), md AS (
  SELECT *, CASE WHEN count(dev) OVER w >= 5 THEN avg(dev) OVER w END AS mdev
  FROM dv
  WINDOW w AS ({_W} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts,
  round(-100.0 * (high_5 - close) / nullif(high_5 - low_5, 0), 4) + 0.0 AS willr_5,
  round((tp - sma_tp) / nullif(0.015 * mdev, 0), 4) + 0.0 AS cci_5
FROM md
"""


ORACLE_FEAT_OSCILLATORS = _join_oracles(
    _join_oracles(ORACLE_FEAT_RSI, ORACLE_FEAT_STOCH,
                  ["stoch_stoch_k", "stoch_stoch_d"]),
    ORACLE_FEAT_EXTRA_OSC, ["willr_5", "cci_5"])



ORACLE_FEAT_MOMENTUM_CALENDAR = _join_oracles(
    ORACLE_FEAT_MOMENTUM, ORACLE_FEAT_SESSION_FLAGS,
    ["session_flags_dow", "session_flags_month", "session_flags_week",
     "session_flags_hour", "session_flags_is_month_start",
     "session_flags_is_month_end"])

ORACLE_FEAT_EMA_FAMILY = _join_oracles(
    ORACLE_FEAT_EMA, ORACLE_FEAT_MACD_ATR,
    ["macd_macd", "macd_signal", "macd_hist", "atr__5"])


FEATURE_QUERIES = {
    "feat_fundamental_ratios": q_feat_fundamental_ratios,
    "feat_earnings": q_feat_earnings,
    "feat_trend_bands": q_feat_trend_bands,
    "feat_oscillators": q_feat_oscillators,
    "feat_momentum_calendar": q_feat_momentum_calendar,
    "feat_ema_family": q_feat_ema_family,
    "feat_custom": q_feat_custom,
}

FEATURE_ORACLES = {
    "feat_fundamental_ratios": ORACLE_FEAT_RATIOS,
    "feat_earnings": ORACLE_FEAT_EARNINGS,
    "feat_trend_bands": ORACLE_FEAT_TREND_BANDS,
    "feat_oscillators": ORACLE_FEAT_OSCILLATORS,
    "feat_momentum_calendar": ORACLE_FEAT_MOMENTUM_CALENDAR,
    "feat_ema_family": ORACLE_FEAT_EMA_FAMILY,
    "feat_custom": ORACLE_FEAT_CUSTOM,
}
