"""integration_suite — filled in as operators land."""

INTEGRATION_QUERIES = {}
INTEGRATION_ORACLES = {}
