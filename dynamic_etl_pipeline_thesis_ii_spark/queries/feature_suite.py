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


# --- rolling aggregates -----------------------------------------------------

def q_feat_trend(spark, sf_dir):
    return _apply(spark, sf_dir, [
        {"name": "sma", "params": {"on": "close", "window": 5}},
        {"name": "rolling_avg", "params": {"on": "close", "window": 3}},
        {"name": "rolling_max", "params": {"on": "close", "window": 5}},
        {"name": "rolling_min", "params": {"on": "close", "window": 5}},
        {"name": "rolling_vol", "params": {"on": "close", "window": 5}},
    ], round4=["sma_close_5", "rolling_avg_close_3", "rolling_vol_close_5"],
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


def q_feat_bbands_zscore(spark, sf_dir):
    return _apply(spark, sf_dir, [
        {"name": "bbands", "params": {"on": "close", "window": 5, "std_dev": 2}},
        {"name": "zscore", "params": {"on": "close", "window": 5}},
    ], round4=["bbands_bband_upper", "bbands_bband_middle", "bbands_bband_lower",
               "zscore_close_5"])


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


def q_feat_rsi(spark, sf_dir):
    return _apply(spark, sf_dir, [
        {"name": "rsi", "params": {"on": "close", "window": 14}},
    ], round4=["rsi_close_14"])


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


def q_feat_stoch(spark, sf_dir):
    return _apply(spark, sf_dir, [
        {"name": "stoch", "params": {"k_window": 5, "d_window": 3}},
    ], round4=["stoch_stoch_k", "stoch_stoch_d"])


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


# --- row-wise + cumulative --------------------------------------------------

def q_feat_momentum(spark, sf_dir):
    return _apply(spark, sf_dir, [
        {"name": "ret", "params": {"on": "close", "periods": 1, "method": "log"}},
        {"name": "pct_change", "params": {"on": "close", "periods": 3}},
        {"name": "lag", "params": {"on": "close", "periods": 2}},
        {"name": "diff", "params": {"on": "close", "periods": 1}},
        {"name": "obv", "params": {}},
    ], round4=["obv"], exact=["ret_close", "pct_change_close", "lag_close", "diff_close"])


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
  ln(close / prev1) AS ret_close,
  close / nullif(prev3, 0) - 1 AS pct_change_close,
  prev2 AS lag_close,
  close - prev1 AS diff_close,
  round(CASE WHEN signed_vol IS NOT NULL
             THEN sum(signed_vol) OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) END, 4) + 0.0 AS obv
FROM s
"""


def q_feat_session_flags(spark, sf_dir):
    return _apply(spark, sf_dir, [
        {"name": "session_flags", "params": {}},
    ], exact=["session_flags_dow", "session_flags_month", "session_flags_week",
              "session_flags_hour", "session_flags_is_month_start",
              "session_flags_is_month_end"])


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


# --- recursive EMA family ---------------------------------------------------

def q_feat_ema(spark, sf_dir):
    return _apply(spark, sf_dir, [
        {"name": "ema", "params": {"on": "close", "window": 5}},
    ], round4=["ema_close_5"])


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


def q_feat_macd_atr(spark, sf_dir):
    return _apply(spark, sf_dir, [
        {"name": "macd", "params": {"on": "close", "fast_period": 6,
                                    "slow_period": 13, "signal_period": 4}},
        {"name": "atr", "params": {"window": 5}},
    ], round4=["macd_macd", "macd_signal", "macd_hist", "atr__5"])


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


FEATURE_QUERIES = {
    "feat_trend": q_feat_trend,
    "feat_bbands_zscore": q_feat_bbands_zscore,
    "feat_rsi": q_feat_rsi,
    "feat_stoch": q_feat_stoch,
    "feat_momentum": q_feat_momentum,
    "feat_session_flags": q_feat_session_flags,
    "feat_ema": q_feat_ema,
    "feat_macd_atr": q_feat_macd_atr,
    "feat_custom": q_feat_custom,
}

FEATURE_ORACLES = {
    "feat_trend": ORACLE_FEAT_TREND,
    "feat_bbands_zscore": ORACLE_FEAT_BBANDS_ZSCORE,
    "feat_rsi": ORACLE_FEAT_RSI,
    "feat_stoch": ORACLE_FEAT_STOCH,
    "feat_momentum": ORACLE_FEAT_MOMENTUM,
    "feat_session_flags": ORACLE_FEAT_SESSION_FLAGS,
    "feat_ema": ORACLE_FEAT_EMA,
    "feat_macd_atr": ORACLE_FEAT_MACD_ATR,
    "feat_custom": ORACLE_FEAT_CUSTOM,
}
