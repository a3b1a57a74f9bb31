"""Stage-level transform API tests (reference transform/transform.py
surface: clean -> enrich -> report, graceful degradation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import Catalog
from dynamic_etl_pipeline_thesis_ii_spark.transform import (
    transform_pipeline,
    transform_single,
)


def _bars(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    return ev.select(
        F.col("event_type").alias("ticker"),
        F.col("ts").alias("timestamp"),
        F.col("value").alias("close"),
        (F.col("value") * 1.01).alias("high"),
        (F.col("value") * 0.99).alias("low"),
        F.col("value").alias("open"),
        F.col("user_id").cast("double").alias("volume"))


def test_transform_single_enriches(spark, sf_dir):
    out, result = transform_single(_bars(spark, sf_dir), ["sma", "rsi"])
    assert result["status"] == "success"
    assert result["enrichment"]["applied"] == ["sma", "rsi"]
    assert "sma_close_20" in out.columns and "rsi_close_14" in out.columns
    assert out.count() > 0


def test_transform_pipeline_multiple(spark, sf_dir):
    dfs = [_bars(spark, sf_dir), _bars(spark, sf_dir).limit(100)]
    outs, meta = transform_pipeline(dfs, ["ret"])
    assert meta["overall_status"] == "success"
    assert meta["dataframes_processed"] == 2
    assert all("ret_close" in o.columns for o in outs)


def test_transform_degrades_gracefully(spark):
    # a frame with none of the feature's source columns: enrichment
    # fails inside apply_features -> original (cleaned) frame passes
    # through with the error recorded, no exception escapes
    bad = spark.createDataFrame([(1, "x")], ["k", "v"])
    outs, meta = transform_pipeline([bad], ["sma"])
    assert len(outs) == 1
    assert meta["overall_status"] == "partial"
    assert meta["total_errors"] >= 1
    assert outs[0].count() == 1  # data survives


def test_transform_empty_input(spark):
    outs, meta = transform_pipeline([], ["sma"])
    assert outs == [] and meta["status"] == "no_data"


def test_transform_unknown_keyword_skipped(spark, sf_dir):
    out, result = transform_single(_bars(spark, sf_dir), ["not_a_feature"])
    # deterministic translator drops unknown keywords -> empty DSL
    assert result["status"] == "success"
    assert result["enrichment"]["applied"] == []
