"""Relational operator suite (SURVEY.md §2.3/§2.4/§2.6/§2.7 + the classic
surface the reference lacks): aggregations, equi/semi/anti joins,
rollup/cube, distinct aggregates, set ops, ranking windows, as-of join,
range join, top-k per group.

Every query is paired with an ANSI-SQL oracle (DuckDB dialect overlap)
over the same parquet tables. Aggregated doubles route through
DECIMAL(18,4) so both engines produce bit-identical results regardless
of partitioning / summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from dynamic_etl_pipeline_thesis_ii_spark.operators.relational import (
    asof_join,
    range_join,
    top_k_per_group,
)
from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import Catalog


def _dec(c):
    """Exact, order-independent accumulation for double columns."""
    return F.col(c).cast(DecimalType(18, 4))


def _dsum(c, alias):
    return F.sum(_dec(c)).cast("double").alias(alias)


# SQL fragment mirroring _dsum
def _sql_dsum(c, alias):
    return f"cast(sum(cast({c} as decimal(18,4))) as double) as {alias}"


# ---------------------------------------------------------------------------
# q_pricing_summary — flagship; TPC-H Q1 shape on lineitem.
# Single shuffle on low-cardinality keys; partial aggregation map-side.
# ---------------------------------------------------------------------------

def _disc_price():
    """price * (1-disc) with NO intermediate rounding: (12,4)*(8,4) →
    decimal(21,8), exact in both engines. Re-rounding the product would
    diverge (Spark rounds HALF_UP, DuckDB half-even)."""
    return (F.col("l_extendedprice").cast(DecimalType(12, 4))
            * (F.lit(1.0) - F.col("l_discount")).cast(DecimalType(8, 4)))


_SQL_DISC_PRICE = ("cast(l_extendedprice as decimal(12,4)) * "
                   "cast(1.0 - l_discount as decimal(8,4))")


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    disc_price = _disc_price()
    # (21,8)*(8,4) → decimal(30,12), still exact.
    charge = disc_price * (F.lit(1.0) + F.col("l_tax")).cast(DecimalType(8, 4))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            # money sums round at 2dp: the exact-decimal -> double
            # conversion differs by 1 ulp between engines at 1e9-plus
            # magnitudes (16 significant digits exceeds double), which
            # flips the 6dp driver hash at sf0.1
            F.round(F.sum(disc_price).cast("double"), 2).alias("sum_disc_price"),
            F.round(F.sum(charge).cast("double"), 2).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.round(F.col("sum_qty") / F.col("count_order"), 6))
        .withColumn("avg_price", F.round(F.col("sum_base_price") / F.col("count_order"), 6))
    )


ORACLE_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       {_sql_dsum('l_quantity', 'sum_qty')},
       {_sql_dsum('l_extendedprice', 'sum_base_price')},
       round(cast(sum({_SQL_DISC_PRICE}) as double), 2) AS sum_disc_price,
       round(cast(sum({_SQL_DISC_PRICE} * cast(1.0 + l_tax as decimal(8,4))) as double), 2) AS sum_charge,
       count(*) AS count_order,
       round(cast(sum(cast(l_quantity as decimal(18,4))) as double) / count(*), 6) AS avg_qty,
       round(cast(sum(cast(l_extendedprice as decimal(18,4))) as double) / count(*), 6) AS avg_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q_top_revenue_orders — 3-way equi-join + agg + top-k. Orders/customer
# join broadcasts nothing at 100 TB, but AQE picks SMJ/shuffled-hash;
# the final top-10 is a TakeOrdered, not a full sort.
# ---------------------------------------------------------------------------

def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 (guide §2.3 "aggregate before you shuffle" / §3.3): aggregate
    # lineitem by l_orderkey BEFORE the joins — o_orderkey is the
    # orders PK, so grouping on it commutes with the dimension joins
    # (join-then-group == group-then-join row-for-row; the sf0.01
    # oracle re-proves it every round). The partial aggregate then
    # hashes one long key instead of (long, string, timestamp), the
    # broadcast probes touch |orders| rows instead of |lineitem|, and
    # the one exchange carries ~4x fewer, narrower rows.
    #
    # The revenue sum runs on SCALED LONGS (unscaled decimal(12,4) x
    # decimal(8,4) products, scale 1e8) and converts back through an
    # exact decimal division, so the emitted double is bit-identical
    # to the decimal-sum formulation (verified group-for-group at
    # sf0.1) while the aggregate runs integer adds instead of decimal
    # adds (measured -30% on the agg stage). Overflow bound: each
    # product is <= ~1.1e13 scaled; a single order needs > 8e5
    # lineitems to overflow the long accumulator — two orders of
    # magnitude past any TPC-H-shaped order at any SF (per-order line
    # counts are bounded, not corpus-proportional).
    c = Catalog(spark, sf_dir)
    dp8 = (F.expr("cast(cast(l_extendedprice as decimal(12,4)) * 10000 "
                  "as bigint)")
           * F.expr("cast(cast(1.0 - l_discount as decimal(8,4)) * 10000 "
                    "as bigint)"))
    rev = (c.lineitem.select("l_orderkey", dp8.alias("dp8"))
           .groupBy("l_orderkey")
           .agg((F.sum("dp8").cast(DecimalType(38, 8)) / F.lit(100000000))
                .cast(DecimalType(30, 8)).cast("double").alias("revenue")))
    return (
        rev.join(c.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_name", "o_orderdate", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


ORACLE_TOP_REVENUE_ORDERS = """
SELECT o_orderkey, c_name, o_orderdate,
       cast(sum(cast(l_extendedprice as decimal(12,4)) * cast(1.0 - l_discount as decimal(8,4))) as double) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY o_orderkey, c_name, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q_regional_revenue — snowflake join across all dims; region/nation are
# broadcast (dimension tables), fact side shuffles once.
# ---------------------------------------------------------------------------

def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    revenue = _disc_price()
    return (
        c.lineitem
        .join(c.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )


ORACLE_REGIONAL_REVENUE = """
SELECT r_name, n_name,
       cast(sum(cast(l_extendedprice as decimal(12,4)) * cast(1.0 - l_discount as decimal(8,4))) as double) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# q_rollup_segment_nation / q_cube_priority_status — grouping-set
# aggregates (absent from the reference; SURVEY.md §2.4 "Absent").
# ---------------------------------------------------------------------------

def q_rollup_segment_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    return (
        c.customer.join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("c_mktsegment", "n_name")
        .agg(_dsum("c_acctbal", "sum_acctbal"), F.count(F.lit(1)).alias("n_cust"))
    )


ORACLE_ROLLUP_SEGMENT_NATION = f"""
SELECT c_mktsegment, n_name,
       {_sql_dsum('c_acctbal', 'sum_acctbal')},
       count(*) AS n_cust
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (c_mktsegment, n_name)
"""


def q_cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(_dsum("o_totalprice", "sum_price"), F.count(F.lit(1)).alias("n_orders"))
    )


ORACLE_CUBE_PRIORITY_STATUS = f"""
SELECT o_orderpriority, o_orderstatus,
       {_sql_dsum('o_totalprice', 'sum_price')},
       count(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


# ---------------------------------------------------------------------------
# q_distinct_agg — exact distinct aggregate per group.
# ---------------------------------------------------------------------------

def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    return (
        c.orders.join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_buyers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


ORACLE_DISTINCT_AGG = """
SELECT c_mktsegment,
       count(DISTINCT o_custkey) AS n_buyers,
       count(DISTINCT o_orderpriority) AS n_priorities,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# q_semi_join / q_anti_join — existence joins, planned as broadcast/
# shuffled hash semi-joins (no row multiplication, unlike IN-subquery
# rewrites done by hand).
# ---------------------------------------------------------------------------

def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    big = c.orders.filter(F.col("o_totalprice") > 100000.0)
    return (
        c.customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


ORACLE_SEMI_JOIN = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    return (
        c.customer.join(c.orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )


ORACLE_ANTI_JOIN = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# ---------------------------------------------------------------------------
# q_set_ops — INTERSECT/EXCEPT set ops (SURVEY.md §2.7 "Absent").
# ---------------------------------------------------------------------------

def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT in one result, tagged by `op`."""
    c = Catalog(spark, sf_dir)
    cust_nations = c.customer.select(F.col("c_nationkey").alias("nationkey"))
    supp_nations = c.supplier.select(F.col("s_nationkey").alias("nationkey"))
    inter = cust_nations.intersect(supp_nations).withColumn("op", F.lit("intersect"))
    exc = cust_nations.subtract(supp_nations).withColumn("op", F.lit("except"))
    return inter.unionByName(exc)


ORACLE_SET_OPS = """
SELECT 'intersect' AS op, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT s_nationkey AS nationkey FROM supplier
)
UNION ALL
SELECT 'except', nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT
  SELECT s_nationkey AS nationkey FROM supplier
)
"""


# ---------------------------------------------------------------------------
# q_rank_orders — ranking window + per-group top-k (WindowGroupLimit
# pushes the k-filter into the sort, so groups aren't fully sorted).
# ---------------------------------------------------------------------------

def q_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return top_k_per_group(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 3
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rn")


ORACLE_RANK_ORDERS = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking/navigation windows absent from the reference (SURVEY
    §2.5 'Absent: ranking window functions ... lead'): rank, dense_rank,
    ntile, lead, first_value over one per-customer window."""
    from pyspark.sql import Window
    o = Catalog(spark, sf_dir).orders.filter(F.col("o_custkey") < 300)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return o.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        (F.round(F.percent_rank().over(w), 6) + F.lit(0.0)).alias("pct_rnk"),
        (F.round(F.cume_dist().over(w), 6) + F.lit(0.0)).alias("cume"),
        F.lead("o_orderkey", 1).over(w).alias("next_orderkey"),
        F.lag("o_orderkey", 1).over(w).alias("prev_orderkey"),
        F.first("o_orderkey").over(w).alias("top_orderkey"))


ORACLE_WINDOW_RANK = """
SELECT o_custkey, o_orderkey, o_totalprice,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) + 0.0 AS pct_rnk,
       round(cume_dist() OVER w, 6) + 0.0 AS cume,
       lead(o_orderkey, 1) OVER w AS next_orderkey,
       lag(o_orderkey, 1) OVER w AS prev_orderkey,
       first_value(o_orderkey) OVER w AS top_orderkey
FROM orders
WHERE o_custkey < 300
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC)
"""


def q_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS through the engine's SQL surface — the
    catalog registers every table as a temp view and the query runs via
    spark.sql, proving the declarative surface end to end."""
    Catalog(spark, sf_dir).register_views()
    return spark.sql(f"""
        SELECT o_orderpriority, o_orderstatus,
               {_sql_dsum('o_totalprice', 'sum_price')},
               count(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """)


ORACLE_GROUPING_SETS = f"""
SELECT o_orderpriority, o_orderstatus,
       {_sql_dsum('o_totalprice', 'sum_price')},
       count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
"""


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization of the event stream: 30-minute inactivity
    gap per user, then per-session aggregates."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.relational import sessionize
    ev = Catalog(spark, sf_dir).events
    s = sessionize(ev, key="user_id", ts_col="ts", gap_seconds=1800)
    return (s.groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 _dsum("value", "total_value")))


ORACLE_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts, value,
    cast(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       cast(sum(cast(value as decimal(18,4))) as double) AS total_value
FROM sess GROUP BY user_id, session_id
"""


def q_pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide reshape): daily value sums per event type as columns.
    Explicit pivot values keep the schema deterministic (no extra
    distinct-scan job, stable column order)."""
    ev = Catalog(spark, sf_dir).events
    types = ["click", "error", "purchase", "signup", "view"]
    return (ev.groupBy(F.col("ts").cast("date").alias("day"))
            .pivot("event_type", types)
            .agg(F.sum(_dec("value")).cast("double"))
            .select("day", *[F.round(F.col(t), 6).alias(f"sum_{t}")
                             for t in types]))


ORACLE_PIVOT_EVENT_VALUES = """
SELECT ts::DATE AS day,
  round(cast(sum(CASE WHEN event_type = 'click' THEN cast(value as decimal(18,4)) END) as double), 6) AS sum_click,
  round(cast(sum(CASE WHEN event_type = 'error' THEN cast(value as decimal(18,4)) END) as double), 6) AS sum_error,
  round(cast(sum(CASE WHEN event_type = 'purchase' THEN cast(value as decimal(18,4)) END) as double), 6) AS sum_purchase,
  round(cast(sum(CASE WHEN event_type = 'signup' THEN cast(value as decimal(18,4)) END) as double), 6) AS sum_signup,
  round(cast(sum(CASE WHEN event_type = 'view' THEN cast(value as decimal(18,4)) END) as double), 6) AS sum_view
FROM events GROUP BY ts::DATE
"""


def q_unpivot_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (long reshape, inverse of pivot): wide OHLC-ish columns
    melt into (key, metric, value) rows via the native unpivot operator
    (a Generate node — no shuffle, no union-of-selects)."""
    ev = Catalog(spark, sf_dir).events.filter(F.col("event_type") == "click")
    wide = ev.select("event_id",
                     F.col("value").alias("open"),
                     (F.col("value") * 1.01).alias("high"),
                     (F.col("value") * 0.99).alias("low"))
    return wide.unpivot("event_id", ["open", "high", "low"],
                        "metric", "metric_value")


ORACLE_UNPIVOT_OHLC = """
SELECT event_id, metric, metric_value FROM (
  SELECT event_id, 'open' AS metric, value AS metric_value
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT event_id, 'high', value * 1.01 FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT event_id, 'low', value * 0.99 FROM events WHERE event_type = 'click'
)
"""


def q_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the JSON props column with a
    declared schema (from_json — no inference scan) and aggregate on
    the extracted field."""
    ev = Catalog(spark, sf_dir).events
    parsed = ev.withColumn(
        "k", F.from_json("props", "struct<k:bigint>").getField("k"))
    return (parsed.groupBy("event_type")
            .agg(F.sum("k").alias("sum_k"),
                 F.count(F.when(F.col("k").isNull(), 1)).alias("null_props")))


ORACLE_JSON_EXTRACTION = """
SELECT event_type,
       cast(sum(cast(json_extract(props, '$.k') as bigint)) as bigint) AS sum_k,
       count(CASE WHEN json_extract(props, '$.k') IS NULL THEN 1 END) AS null_props
FROM events GROUP BY event_type
"""


def q_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (continuous interpolation) — the
    distribution-summary aggregate family."""
    ev = Catalog(spark, sf_dir).events
    return (ev.groupBy("event_type")
            .agg(F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
                 F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
                 F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
                 F.round(F.min("value"), 6).alias("vmin"),
                 F.round(F.max("value"), 6).alias("vmax")))


ORACLE_GROUP_PERCENTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99,
       round(min(value), 6) AS vmin,
       round(max(value), 6) AS vmax
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q_asof_join — for each event, the customer's most recent order-day at
# or before the event time. Implemented as union + one window pass (one
# shuffle, no pair explosion) — see operators/relational.py.
# ---------------------------------------------------------------------------

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    day_orders = (
        c.orders.groupBy("o_custkey", "o_orderdate")
        .agg(_dsum("o_totalprice", "day_spend"),
             F.max("o_orderkey").alias("last_orderkey"))
    )
    ev = c.events.select("event_id", "user_id", "ts", "event_type")
    out = asof_join(ev, day_orders, on=["user_id"], right_on=["o_custkey"],
                    left_time="ts", right_time="o_orderdate",
                    right_values=["day_spend", "last_orderkey"])
    return out.select("event_id", "user_id", "ts", "event_type", "day_spend", "last_orderkey")


ORACLE_ASOF_JOIN = """
WITH day_orders AS (
  SELECT o_custkey, o_orderdate,
         cast(sum(cast(o_totalprice as decimal(18,4))) as double) AS day_spend,
         max(o_orderkey) AS last_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, e.ts, e.event_type, d.day_spend, d.last_orderkey
FROM events e
ASOF LEFT JOIN day_orders d
  ON e.user_id = d.o_custkey AND e.ts >= d.o_orderdate
"""


# ---------------------------------------------------------------------------
# q_range_join — interval/band join of events against a generated band
# table; band side broadcast.
# ---------------------------------------------------------------------------

def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    bands = (spark.range(0, 20)
             .select(F.col("id").alias("band_id"),
                     (F.col("id") * 10.0).alias("lo"),
                     ((F.col("id") + 1) * 10.0).alias("hi")))
    joined = range_join(ev, bands, "value", "lo", "hi")
    return (joined.groupBy("band_id")
            .agg(F.count(F.lit(1)).alias("n_events"), _dsum("value", "sum_value")))


ORACLE_RANGE_JOIN = """
WITH bands AS (
  SELECT i AS band_id, i * 10.0 AS lo, (i + 1) * 10.0 AS hi
  FROM range(0, 20) t(i)
)
SELECT band_id, count(*) AS n_events,
       cast(sum(cast(value as decimal(18,4))) as double) AS sum_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band_id
"""


RELATIONAL_QUERIES = {
    "pricing_summary": q_pricing_summary,
    "top_revenue_orders": q_top_revenue_orders,
    "regional_revenue": q_regional_revenue,
    "rollup_segment_nation": q_rollup_segment_nation,
    "cube_priority_status": q_cube_priority_status,
    "distinct_agg": q_distinct_agg,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "set_ops": q_set_ops,
    "rank_orders": q_rank_orders,
    "window_rank_functions": q_window_rank_functions,
    "sessionize_events": q_sessionize_events,
    "grouping_sets_sql": q_grouping_sets_sql,
    "group_percentiles": q_group_percentiles,
    "pivot_event_values": q_pivot_event_values,
    "unpivot_ohlc": q_unpivot_ohlc,
    "json_extraction": q_json_extraction,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
}

RELATIONAL_ORACLES = {
    "pricing_summary": ORACLE_PRICING_SUMMARY,
    "top_revenue_orders": ORACLE_TOP_REVENUE_ORDERS,
    "regional_revenue": ORACLE_REGIONAL_REVENUE,
    "rollup_segment_nation": ORACLE_ROLLUP_SEGMENT_NATION,
    "cube_priority_status": ORACLE_CUBE_PRIORITY_STATUS,
    "distinct_agg": ORACLE_DISTINCT_AGG,
    "semi_join": ORACLE_SEMI_JOIN,
    "anti_join": ORACLE_ANTI_JOIN,
    "set_ops": ORACLE_SET_OPS,
    "rank_orders": ORACLE_RANK_ORDERS,
    "window_rank_functions": ORACLE_WINDOW_RANK,
    "sessionize_events": ORACLE_SESSIONIZE,
    "grouping_sets_sql": ORACLE_GROUPING_SETS,
    "group_percentiles": ORACLE_GROUP_PERCENTILES,
    "pivot_event_values": ORACLE_PIVOT_EVENT_VALUES,
    "unpivot_ohlc": ORACLE_UNPIVOT_OHLC,
    "json_extraction": ORACLE_JSON_EXTRACTION,
    "asof_join": ORACLE_ASOF_JOIN,
    "range_join": ORACLE_RANGE_JOIN,
}
