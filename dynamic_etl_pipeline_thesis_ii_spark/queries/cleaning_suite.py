"""Cleaning engine suite (SURVEY.md §2.2 P2-P5, §2.8 F7-F10, §2.4 A1/A5):
a deterministically-dirtied events table is pushed through the real
config-driven cleaner and compared against a SQL oracle that replays the
same steps — dedup, constant imputation, positive / non-negative /
no-future-dates row filters, null-ratio column deletion, int rounding.

Normal-distribution imputation is oracle-backed too: the cleaner's
``impute_key_col`` mode draws hash-based Box–Muller deviates (no RNG
state), so the SQL twin reproduces the exact imputed values — stronger
than the reference's own distributional-only test strategy
(test_data_cleaning.py:337-357).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators.cleaning import clean_dataframe
from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import Catalog

# Deterministic defects over events: negatives, nulls, a 2/3-null column,
# future dates, duplicated rows.
def _dirty(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    base = ev.select(
        "event_id", "user_id",
        F.when(F.col("event_id") % 23 == 0,
               F.col("ts") + F.expr("INTERVAL 36500 DAYS")).otherwise(F.col("ts")).alias("ts"),
        F.when(F.col("event_id") % 17 == 0, -F.col("value")).otherwise(F.col("value")).alias("close"),
        F.when(F.col("event_id") % 13 == 0, None).otherwise(F.col("props")).alias("props"),
        F.when(F.col("event_id") % 3 != 2, None).otherwise(F.col("value")).alias("sparse"),
        (F.col("value") * 10).alias("volume"),
    )
    return base.unionAll(base.filter(F.col("event_id") % 50 == 0))


_SQL_DIRTY = """
dirty AS (
  SELECT event_id, user_id,
    CASE WHEN event_id % 23 = 0 THEN ts + INTERVAL 36500 DAY ELSE ts END AS ts,
    CASE WHEN event_id % 17 = 0 THEN -value ELSE value END AS close,
    CASE WHEN event_id % 13 = 0 THEN NULL ELSE props END AS props,
    CASE WHEN event_id % 3 != 2 THEN NULL ELSE value END AS sparse,
    value * 10 AS volume
  FROM events
),
dup AS (SELECT * FROM dirty UNION ALL SELECT * FROM dirty WHERE event_id % 50 = 0)
"""

_CLEAN_CONFIG = {
    "version": 1,
    "global_settings": {
        "default_null_threshold": 0.5,
        "default_allow_column_deletion": True,
        "default_imputation_strategy": "auto",
        "remove_duplicates": True,
    },
    "column_rules": [
        {"pattern": "^ts$", "dtype": "datetime", "allow_column_deletion": False,
         "imputation_strategy": "unix_epoch", "validations": ["no_future_dates"]},
        {"pattern": "^close$", "dtype": "float", "validations": ["positive"],
         "imputation_strategy": "none"},
        {"pattern": "^props$", "dtype": "string", "allow_column_deletion": False,
         "imputation_strategy": "constant", "imputation_value": "Unknown"},
        {"pattern": "^volume$", "dtype": "int", "validations": ["non_negative"],
         "imputation_strategy": "none"},
        {"pattern": ".*", "dtype": "auto", "imputation_strategy": "auto",
         "validations": []},
    ],
    "relationship_validations": [],
}


def q_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    cleaned, _report = clean_dataframe(_dirty(spark, sf_dir), _CLEAN_CONFIG)
    return cleaned


ORACLE_CLEAN_PIPELINE = f"""
WITH {_SQL_DIRTY},
dd AS (SELECT DISTINCT * FROM dup)
SELECT event_id, user_id, ts, close,
       coalesce(props, 'Unknown') AS props,
       cast(round(volume) AS bigint) AS volume
FROM dd
WHERE close > 0 AND volume >= 0 AND ts <= now()
"""


def q_clean_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-column null-count/ratio profile as a single row."""
    d = _dirty(spark, sf_dir)
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("props").isNull().cast("long")).alias("props_nulls"),
        F.sum(F.col("sparse").isNull().cast("long")).alias("sparse_nulls"),
        F.round(F.avg(F.col("sparse").isNull().cast("double")), 6).alias("sparse_null_ratio"),
    )


ORACLE_CLEAN_NULL_PROFILE = f"""
WITH {_SQL_DIRTY}
SELECT count(*) AS n_rows,
       cast(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) as bigint) AS props_nulls,
       cast(sum(CASE WHEN sparse IS NULL THEN 1 ELSE 0 END) as bigint) AS sparse_nulls,
       round(avg(CASE WHEN sparse IS NULL THEN 1.0 ELSE 0.0 END), 6) AS sparse_null_ratio
FROM dup
"""


def q_clean_impute_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normal-distribution imputation with hash-based Box–Muller draws
    (``impute_key_col``): the imputed *values* are deterministic per row
    key, partition-invariant, and exactly reproduced by the SQL oracle —
    not just distributionally plausible."""
    config = {
        "version": 1,
        "global_settings": {"default_null_threshold": 0.9,
                            "default_allow_column_deletion": False,
                            "default_imputation_strategy": "auto",
                            "remove_duplicates": False},
        "column_rules": [
            {"pattern": "^sparse$", "dtype": "float",
             "imputation_strategy": "normal_distribution"},
            {"pattern": ".*", "dtype": "auto", "imputation_strategy": "none"},
        ],
        "relationship_validations": [],
    }
    cleaned, _ = clean_dataframe(_dirty(spark, sf_dir), config, seed=42,
                                 impute_key_col="event_id")
    return cleaned.select("event_id", "sparse")


def _sql_clean_impute_normal() -> str:
    from dynamic_etl_pipeline_thesis_ii_spark.operators.cleaning import SQL_NORMAL
    z = SQL_NORMAL("event_id", "sparse", 42)
    return f"""
WITH {_SQL_DIRTY},
stats AS (SELECT avg(sparse) AS mu, stddev_samp(sparse) AS sd FROM dup)
SELECT event_id,
       CASE WHEN sparse IS NULL
            THEN round({z} * sd + mu, 6)
            ELSE sparse END AS sparse
FROM dup, stats
"""


CLEANING_QUERIES = {
    "clean_pipeline": q_clean_pipeline,
    "clean_null_profile": q_clean_null_profile,
    "clean_impute_normal": q_clean_impute_normal,
}

CLEANING_ORACLES = {
    "clean_pipeline": ORACLE_CLEAN_PIPELINE,
    "clean_null_profile": ORACLE_CLEAN_NULL_PROFILE,
    "clean_impute_normal": _sql_clean_impute_normal(),
}
