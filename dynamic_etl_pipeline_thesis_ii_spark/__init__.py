"""dynamic_etl_pipeline_thesis_ii_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference ``Hussein-Heggi/Dynamic-ETL-Pipeline_Thesis_II``
(see SURVEY.md): config-driven cleaning, a registry-validated feature DSL
compiled to native window expressions, schema-matching union, a blocked
similarity join, classic relational operators, plus large-scale
training-data-pipeline extensions (dedup, ANN similarity search, text
analysis, multimodal plumbing) and a Structured Streaming surface.

Everything is lazy DataFrame composition — Catalyst owns the physical plan.
"""

from dynamic_etl_pipeline_thesis_ii_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
