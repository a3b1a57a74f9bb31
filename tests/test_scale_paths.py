"""Scale-path checks: bucketed co-located joins (no shuffle), approximate
aggregates (sketch within tolerance), broadcast threshold behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import Catalog
from dynamic_etl_pipeline_thesis_ii_spark.sources.sinks import write_bucketed


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key must sort-merge join without
    an Exchange — the co-location contract that kills the dominant
    shuffle at 100 TB."""
    cat = Catalog(spark, sf_dir)
    orders = cat.orders.select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = cat.lineitem.select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], n_buckets=8)
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_approx_count_distinct_tolerance(spark, sf_dir):
    """HLL sketch within 5% of exact — the approximate-aggregate surface
    (SURVEY §2.4 'absent from reference; expose')."""
    orders = Catalog(spark, sf_dir).orders
    row = orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        F.countDistinct("o_custkey").alias("exact")).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_approx_percentile_vs_exact(spark, sf_dir):
    orders = Catalog(spark, sf_dir).orders
    approx, = orders.agg(F.percentile_approx(
        "o_totalprice", [0.5], 10000).alias("p")).first()["p"],
    exact = orders.selectExpr(
        "percentile(o_totalprice, 0.5) AS p").first()["p"]
    assert abs(approx[0] - exact) / exact < 0.02


def test_small_dim_join_broadcasts(spark, sf_dir):
    """Dimension tables under the threshold must broadcast, not shuffle."""
    cat = Catalog(spark, sf_dir)
    joined = cat.customer.join(cat.nation,
                               cat.customer.c_nationkey == cat.nation.n_nationkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
