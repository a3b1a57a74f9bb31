from dynamic_etl_pipeline_thesis_ii_spark.sources.http_clients import (
    AlphaVantageHttpClient,
    HttpFetcher,
    PolygonHttpClient,
    RetryingTransport,
)
from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import Catalog, TABLES

__all__ = ["Catalog", "TABLES", "HttpFetcher", "PolygonHttpClient",
           "AlphaVantageHttpClient", "RetryingTransport"]
