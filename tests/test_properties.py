"""Property-based tests (hypothesis) for the driver-side engine logic —
invariants rather than examples: assignment caps, coverage bounds,
validator partitioning, date clamping. (Spark-side operators get their
invariants from the DuckDB differential oracle instead — a property
runner per Spark action would cost ~0.5s/example.)"""

from __future__ import annotations

from datetime import date

from hypothesis import given, settings
from hypothesis import strategies as st

from dynamic_etl_pipeline_thesis_ii_spark.config import EngineConfig
from dynamic_etl_pipeline_thesis_ii_spark.operators import union_engine as U
from dynamic_etl_pipeline_thesis_ii_spark.plans.contracts import APIRequest
from dynamic_etl_pipeline_thesis_ii_spark.plans.validators import (
    OutputValidator,
    ParameterValidator,
)

CFG = EngineConfig()


def _greedy(cands, max_matches):
    """Reference greedy (same as SJ.assign_greedy's core, list input)."""
    out, c1, c2 = [], {}, {}
    for i, j, p in sorted(cands, key=lambda t: (-t[2], t[0], t[1])):
        if max_matches == 0 or (c1.get(i, 0) < max_matches
                                and c2.get(j, 0) < max_matches):
            out.append((i, j, p))
            c1[i] = c1.get(i, 0) + 1
            c2[j] = c2.get(j, 0) + 1
    return out


pairs_st = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 20),
              st.floats(0, 1, allow_nan=False)),
    max_size=120)


@given(pairs_st, st.integers(1, 4))
@settings(max_examples=200, deadline=None)
def test_greedy_caps_respected(cands, k):
    out = _greedy(cands, k)
    c1: dict = {}
    c2: dict = {}
    for i, j, _ in out:
        c1[i] = c1.get(i, 0) + 1
        c2[j] = c2.get(j, 0) + 1
    assert all(v <= k for v in c1.values())
    assert all(v <= k for v in c2.values())
    assert set(out) <= set(cands)
    # greedy with cap 0 keeps everything
    assert len(_greedy(cands, 0)) == len(cands)


@given(st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=8,
                unique=True),
       st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=8,
                unique=True))
@settings(max_examples=200, deadline=None)
def test_coverage_bounds(cols_a, cols_b):
    mapping, avg = U.find_column_mapping(cols_a, cols_b, CFG)
    cov = U.coverage(mapping, cols_a, cols_b)
    assert 0.0 <= cov <= 1.0
    assert set(mapping.keys()) <= set(cols_b)
    assert set(mapping.values()) <= set(cols_a)
    if mapping:
        assert avg >= CFG.union_threshold


@given(st.lists(st.text(alphabet="abcdefg_ ", min_size=1, max_size=12),
                min_size=1, max_size=10, unique=True),
       st.lists(st.text(alphabet="abcdefg_ ", min_size=1, max_size=12),
                min_size=0, max_size=10, unique=True))
@settings(max_examples=200, deadline=None)
def test_output_validator_partitions(features, columns):
    rep = OutputValidator().validate_columns(columns, features, "api", "ep")
    fuzzy_feats = [f["feature"] for f in rep.fuzzy_matched_features]
    all_out = rep.found_features + fuzzy_feats + rep.missing_features
    assert sorted(all_out) == sorted(features)
    assert rep.validation_passed == (not rep.missing_features)


@given(st.dates(min_value=date(2000, 1, 1), max_value=date(2099, 12, 31)))
@settings(max_examples=100, deadline=None)
def test_future_dates_always_clamped(d):
    today = date(2024, 6, 1)
    v = ParameterValidator(today=today)
    req = v.validate_request(APIRequest(
        "polygon", "get_aggs",
        {"ticker": "AAPL", "from": d.strftime("%Y-%m-%d")}))
    parsed = req.parameters["from"]
    assert parsed <= today.strftime("%Y-%m-%d")
