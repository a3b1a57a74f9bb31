"""License / compliance detection (T19): marker flags, the
most-restrictive class fold, DuckDB pattern parity, and the NL
audit/drop target."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators.text import (
    SQL_LICENSE_SCAN,
    license_scan,
)

DOCS = [
    (1, "normal prose with no markers at all"),
    (2, "code released under the MIT License for everyone"),
    (3, "this program is free software under the GNU General "
        "Public License v3"),
    (4, "licensed under a Creative Commons CC-BY-NC license"),
    (5, "Copyright 2019 Acme Inc. All rights reserved."),
    (6, "SPDX-License-Identifier: Apache-2.0"),
    # both a permissive grant AND a copyleft notice -> copyleft wins
    (7, "MIT License applies, except module x under GPL-3"),
    (8, None),
    (9, "copyright (c) 2023 someone"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_flags_and_most_restrictive_class(spark):
    out = {r["id"]: r.asDict() for r in
           license_scan(_docs(spark)).collect()}
    assert out[1]["license_class"] == "unmarked"
    assert out[2]["license_class"] == "permissive"
    assert out[2]["has_permissive"] and not out[2]["has_copyleft"]
    assert out[3]["license_class"] == "copyleft"
    assert out[4]["license_class"] == "cc" and out[4]["has_cc"]
    assert out[5]["license_class"] == "restricted"
    assert out[5]["has_rights_reserved"] and out[5]["has_copyright"]
    assert out[6]["license_class"] == "permissive"  # SPDX + apache
    assert out[7]["license_class"] == "copyleft"    # conservative
    assert out[8]["license_class"] == "unmarked"    # null text safe
    assert out[9]["license_class"] == "restricted"
    assert out[9]["has_copyright"]


def test_duckdb_pattern_parity(spark):
    """Spark rlike and DuckDB regexp_matches run the identical
    patterns — row-for-row equal flags and classes."""
    docs = _docs(spark)
    got = sorted(tuple(r) for r in license_scan(docs).collect())
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = sorted(tuple(r) for r in
                  con.execute(SQL_LICENSE_SCAN()).fetchall())
    assert got == want


def test_nl_license_target(spark, tmp_path):
    """'license audit the corpus' reports + writes flags; 'dropping
    copyleft and restricted' writes the kept docs instead."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    assert parse_dataops_query("license audit the corpus") \
        == {"target": "license_scan", "drop": []}
    p = parse_dataops_query(
        "scan the corpus for licenses, dropping copyleft and "
        "restricted documents")
    assert p == {"target": "license_scan",
                 "drop": ["copyleft", "restricted"]}

    src = str(tmp_path / "src")
    _docs(spark).write.parquet(src + "/documents.parquet")
    pipe = Pipeline(spark, FixtureFetcher(spark, src))
    out = str(tmp_path / "flags")
    res = pipe.run_dataops("license audit the corpus", src, out)
    assert res["status"] == "complete"
    counts = res["reports"]["class_counts"]
    assert counts == {"unmarked": 2, "permissive": 2, "copyleft": 2,
                      "cc": 1, "restricted": 2}
    assert res["reports"]["rows_out"] == 9
    # drop variant: copyleft (3, 7) and restricted (5, 9) removed
    out2 = str(tmp_path / "kept")
    res2 = pipe.run_dataops(
        "scan the corpus for licenses, dropping copyleft and "
        "restricted documents", src, out2)
    assert res2["status"] == "complete"
    kept = {r["doc_id"] for r in spark.read.parquet(out2).collect()}
    assert kept == {1, 2, 4, 6, 8}
    assert res2["reports"]["dropped_classes"] == ["copyleft",
                                                 "restricted"]
