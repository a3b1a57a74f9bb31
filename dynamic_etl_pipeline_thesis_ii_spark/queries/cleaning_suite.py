"""cleaning_suite — filled in as operators land."""

CLEANING_QUERIES = {}
CLEANING_ORACLES = {}
