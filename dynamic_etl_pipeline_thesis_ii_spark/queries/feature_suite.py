"""feature_suite — filled in as operators land."""

FEATURE_QUERIES = {}
FEATURE_ORACLES = {}
