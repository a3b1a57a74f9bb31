from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import Catalog, TABLES

__all__ = ["Catalog", "TABLES"]
