"""Stage-level transform API (reference ``transform/transform.py:29-289``
— SURVEY.md §3.3 entry point C).

``transform_pipeline(dfs, keywords)`` / ``transform_single(df, keywords)``
run clean → keyword->DSL enrichment → post-clean on caller-provided
frames, with per-frame status metadata and graceful degradation: any
frame whose transform fails passes through UNCHANGED with the error
recorded (``transform.py:187-198`` semantics) — a batch pipeline never
hard-fails on one bad table.

Spark-first: both cleaning and enrichment are lazy column transforms, so
each output frame is ONE Catalyst plan; the only eager work is the
cleaning stats action (null profile / imputation means).
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame

from dynamic_etl_pipeline_thesis_ii_spark.functions.compiler import apply_features
from dynamic_etl_pipeline_thesis_ii_spark.functions.dsl import validate_dsl
from dynamic_etl_pipeline_thesis_ii_spark.functions.registry import FEATURE_REGISTRY
from dynamic_etl_pipeline_thesis_ii_spark.operators.cleaning import clean_dataframe
from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import translate_keywords


def transform_single(df: DataFrame, keywords: list[str],
                     cleaning_config: Optional[dict | str] = None,
                     column_delete_threshold: Optional[float] = None,
                     entity_col: str = "ticker", ts_col: str = "timestamp",
                     translator=None,
                     ) -> tuple[DataFrame, dict[str, Any]]:
    """Clean → enrich → report for one frame (``transform.py:249-289``).
    Returns (transformed_df, result_metadata); on failure the ORIGINAL
    frame is returned with status='error'."""
    result: dict[str, Any] = {"keywords": list(keywords), "status": "success",
                              "cleaning": {}, "enrichment": {}, "errors": []}
    try:
        cleaned, clean_report = clean_dataframe(
            df, config=cleaning_config,
            global_threshold_override=column_delete_threshold)
        result["cleaning"] = clean_report.get("clean", clean_report)

        if translator is not None:
            dsl = translator.translate(keywords)
        else:
            dsl = translate_keywords(keywords)
        dsl, errors = validate_dsl(dsl, FEATURE_REGISTRY)
        if errors:
            result["errors"].extend(errors)
            result["enrichment"] = {"applied": [], "dsl_errors": errors}
            result["status"] = "partial"
            return cleaned, result

        if dsl and dsl["features"]:
            cleaned = apply_features(cleaned, dsl, entity_col=entity_col,
                                     ts_col=ts_col)
        result["enrichment"] = {
            "applied": [f["name"] for f in (dsl or {}).get("features", [])]}
        return cleaned, result
    except Exception as exc:  # noqa: BLE001 — degrade per frame, never raise
        result["status"] = "error"
        result["errors"].append(str(exc))
        return df, result


def transform_pipeline(dataframes: list[DataFrame], keywords: list[str],
                       cleaning_config: Optional[dict | str] = None,
                       column_delete_threshold: float = 0.5,
                       entity_col: str = "ticker", ts_col: str = "timestamp",
                       translator=None,
                       ) -> tuple[list[DataFrame], dict[str, Any]]:
    """Clean + enrich every frame with the same keyword set
    (``transform.py:29-217``)."""
    if not dataframes:
        return [], {"status": "no_data", "dataframes_processed": 0}

    outputs: list[DataFrame] = []
    meta: dict[str, Any] = {"dataframes_processed": len(dataframes),
                            "results": [], "overall_status": "success",
                            "total_errors": 0}
    for idx, df in enumerate(dataframes):
        out, result = transform_single(
            df, keywords, cleaning_config=cleaning_config,
            column_delete_threshold=column_delete_threshold,
            entity_col=entity_col, ts_col=ts_col, translator=translator)
        result["index"] = idx
        meta["results"].append(result)
        meta["total_errors"] += len(result["errors"])
        if result["status"] != "success":
            meta["overall_status"] = "partial"
        outputs.append(out)
    return outputs, meta
