from dynamic_etl_pipeline_thesis_ii_spark.functions.registry import FEATURE_REGISTRY
from dynamic_etl_pipeline_thesis_ii_spark.functions.dsl import validate_dsl
from dynamic_etl_pipeline_thesis_ii_spark.functions.compiler import apply_features

__all__ = ["FEATURE_REGISTRY", "validate_dsl", "apply_features"]
