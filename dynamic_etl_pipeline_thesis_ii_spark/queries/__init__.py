"""Query suite: every implemented operator exposed as a (spark_fn, oracle_sql)
pair, keyed by a stable name. The driver contract (``__spark_entry__.py``)
re-exports these.

Float determinism strategy (cross-engine hash parity with DuckDB):
- sums of doubles go through ``DECIMAL(18,4)`` casts so aggregation is
  exact and order-independent in both engines;
- averages are ``exact_decimal_sum / count`` evaluated in double — one
  deterministic division;
- window/stat outputs are rounded to a precision far above the engines'
  accumulated float error.
"""

from dynamic_etl_pipeline_thesis_ii_spark.queries.relational_suite import (
    RELATIONAL_ORACLES,
    RELATIONAL_QUERIES,
)
from dynamic_etl_pipeline_thesis_ii_spark.queries.feature_suite import (
    FEATURE_ORACLES,
    FEATURE_QUERIES,
)
from dynamic_etl_pipeline_thesis_ii_spark.queries.cleaning_suite import (
    CLEANING_ORACLES,
    CLEANING_QUERIES,
)
from dynamic_etl_pipeline_thesis_ii_spark.queries.dataops_suite import (
    DATAOPS_ORACLES,
    DATAOPS_QUERIES,
)
from dynamic_etl_pipeline_thesis_ii_spark.queries.integration_suite import (
    INTEGRATION_ORACLES,
    INTEGRATION_QUERIES,
)
from dynamic_etl_pipeline_thesis_ii_spark.queries.sources_suite import (
    SOURCES_ORACLES,
    SOURCES_QUERIES,
)


MAX_REGISTRY = 49


def all_queries():
    """Registry order matters: the driver's correctness gate records only
    the FIRST 50 entries, so oracle-backed queries are listed before the
    (few) rows-only ones, and the total registry is kept at <= 49 to leave
    headroom (round 6 briefly hit 51 and `integrate_pipeline` silently
    dropped out of CORRECTNESS_r06; round 11 hit 54 and the driver dropped
    both source entries — the budget is now ENFORCED by the RuntimeError
    below, so an overflow fails loudly at import instead of silently
    shrinking the driver record). When adding an operator, prefer a
    branch-tagged
    arm on an existing family union (`dedup_neardup_pairs`, `dedup_spans`,
    `text_pii_scrub`, `text_corpus_stats`, `sample_deterministic`,
    `src_parse_normalize`, `union_schema_match`) over
    a new entry. Current headroom: 49/49 — ZERO free slots (a r13
    semi+anti fold was reverted: optimization rounds must keep the
    declared set identical, a disappeared query is a REGRESSION); any
    addition must bring a fold with it. The
    bench-side twin of this budget lives in bench.py: the driver also
    records only the last ~2,000 chars of stdout, so bench's FINAL
    printed line must stay small (round 7 lost every per-query timing
    to an inlined scale_probe; round 8 lost most probe series the same
    way). Since round 9 each probe series prints as its OWN compact
    '# probe <name> sec/candidates...' line — newest series last so
    they always survive truncation — and the complete record lands in
    SCALE_PROBE.json."""
    out = {}
    out.update(RELATIONAL_QUERIES)
    out.update(FEATURE_QUERIES)
    out.update(CLEANING_QUERIES)
    out.update(DATAOPS_QUERIES)
    out.update(INTEGRATION_QUERIES)
    out.update(SOURCES_QUERIES)
    oracles = all_oracles()
    ordered = {k: v for k, v in out.items() if k in oracles}
    ordered.update({k: v for k, v in out.items() if k not in oracles})
    if len(ordered) > MAX_REGISTRY:
        # a raise, not an assert: asserts vanish under python -O and
        # the overflow would go back to silently truncating the
        # driver record
        raise RuntimeError(
            f"query registry has {len(ordered)} entries — the driver "
            f"records only the first 50, so keep <= {MAX_REGISTRY}. "
            f"Fold the new query into an existing branch-tagged "
            f"family union instead (see this docstring).")
    return ordered


def all_oracles():
    out = {}
    out.update(RELATIONAL_ORACLES)
    out.update(FEATURE_ORACLES)
    out.update(CLEANING_ORACLES)
    out.update(DATAOPS_ORACLES)
    out.update(INTEGRATION_ORACLES)
    out.update(SOURCES_ORACLES)
    return out
