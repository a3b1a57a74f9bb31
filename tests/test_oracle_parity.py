"""Self-check mirroring the driver's correctness gate: every queries()
entry that has an oracle_sql() entry must match DuckDB on the smoke SF."""

from __future__ import annotations

import pytest

from dynamic_etl_pipeline_thesis_ii_spark.queries import all_oracles, all_queries
from tests.oracle import compare, duck_connect

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_parity(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    compare(df, duck, ORACLES[name], name=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
