"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``dynamic_etl_pipeline_thesis_ii_spark/queries/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dynamic_etl_pipeline_thesis_ii_spark.queries import all_oracles, all_queries

_SMOKE_SF = "/root/testdata/sf0.001"


def _quiet_df_debugging(spark: SparkSession) -> None:
    """Disable PySpark 4's per-method call-site capture (2 py4j round
    trips + a Python stack walk on EVERY DataFrame/Column call — ~2.5 s
    of pure plan-construction overhead across the headline set at
    sf0.1). ``spark.python.sql.dataFrameDebugging.enabled`` is a STATIC
    conf, unsettable on the live session the driver hands us, but the
    flag is only consulted through a module-level cache on the Python
    side — prime that instead (guarded: if the private name moves in a
    future PySpark, behavior just reverts to the default capture)."""
    try:
        from pyspark.errors import utils as _eu
        _eu._enable_debugging_cache = False
    except Exception:
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _quiet_df_debugging(spark)
    from dynamic_etl_pipeline_thesis_ii_spark.queries.relational_suite import q_pricing_summary
    return q_pricing_summary(spark, _SMOKE_SF)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    base = all_queries()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver may hand us a vanilla session; the synthetic
            # parquet needs nanos-as-long to be readable, and the
            # default 200 shuffle partitions schedule 400-task stages
            # over kilobyte inputs (painful for iterative operators).
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            # tz-naive parquet timestamps load as session-UTC TIMESTAMP,
            # not TIMESTAMP_NTZ (the Catalog also normalizes, but raw
            # spark.read paths should agree).
            spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled",
                           "false")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            _quiet_df_debugging(spark)
            return fn(spark, sf_dir)
        return run

    return {name: _wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per queries() key (keys without an
    oracle get the driver's weaker rows-only check)."""
    return all_oracles()
