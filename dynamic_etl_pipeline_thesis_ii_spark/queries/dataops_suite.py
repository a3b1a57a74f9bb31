"""dataops_suite — filled in as operators land."""

DATAOPS_QUERIES = {}
DATAOPS_ORACLES = {}
