"""Cross-document exact-substring dedup (D18, Lee et al. 2022
ExactSubstr): span recovery, canonical-first semantics, island
merging, the corpus-rewrite face, and the NL target."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import (
    SQL_SUBSTRING_SPANS,
    exact_substring_dedup,
    substring_duplicate_spans,
)

BOILER = ("this license text is repeated verbatim in many documents "
          "exactly")                                   # 10 tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_cross_doc_span_canonical_first(spark):
    """A passage shared by two docs flags ONLY in the later (id, pos)
    occurrence; the maximal span reassembles from overlapping
    windows (span length 10 from w=5 windows)."""
    docs = _docs(spark, [
        (1, "alpha beta gamma delta " + BOILER + " epsilon zeta"),
        (2, "one two three four five " + BOILER + " six seven"),
        (3, "entirely unrelated content with no duplication today"),
    ])
    spans = substring_duplicate_spans(docs, w=5).collect()
    assert len(spans) == 1
    (r,) = spans
    # doc 2's copy: tokens 5..15 (the 10 boiler tokens), 6 windows
    assert (r["id"], r["span_start"], r["span_end"], r["n_windows"]) \
        == (2, 5, 15, 6)


def test_within_doc_repetition_and_short_docs(spark):
    """Internal repetition flags the second occurrence; docs shorter
    than w never flag; null text is safe."""
    docs = _docs(spark, [
        (1, BOILER + " " + BOILER),
        (2, "tiny doc"),
        (3, None),
    ])
    spans = {(r["id"]): (r["span_start"], r["span_end"])
             for r in substring_duplicate_spans(docs, w=5).collect()}
    # the second BOILER's windows all duplicate the first's; the
    # overlap windows bridging the repeat join them into one span
    assert 1 in spans and len(spans) == 1
    start, end = spans[1]
    assert end == 20 and start <= 10


def test_duckdb_differential(spark):
    """Spark spans == the SQL twin row for row on a mixed corpus
    (cross-doc dup, internal repeat, clean doc, short doc, null)."""
    import duckdb

    docs = _docs(spark, [
        (1, "alpha beta gamma delta " + BOILER + " epsilon zeta"),
        (2, "one two three four five " + BOILER + " six seven"),
        (3, "unique content here with no duplication at all today"),
        (4, BOILER + " " + BOILER),
        (5, "short doc"),
        (6, None),
    ])
    got = sorted(tuple(r) for r in
                 substring_duplicate_spans(docs, w=5).collect())
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = sorted(tuple(r) for r in
                  con.execute(SQL_SUBSTRING_SPANS(5)).fetchall())
    assert got == want and len(got) >= 2


def test_rewrite_face_token_accounting(spark):
    """exact_substring_dedup cuts exactly the flagged span tokens:
    canonical doc keeps the passage, later docs lose it, n_removed
    matches the span table, untouched docs pass through with
    n_removed = 0."""
    docs = _docs(spark, [
        (1, "alpha beta gamma delta " + BOILER + " epsilon zeta"),
        (2, "one two three four five " + BOILER + " six seven"),
        (3, "unique content here with no duplication at all today"),
    ])
    spans = substring_duplicate_spans(docs, w=5).collect()
    removed_by_doc = {}
    for r in spans:
        removed_by_doc[r["id"]] = removed_by_doc.get(r["id"], 0) \
            + (r["span_end"] - r["span_start"])
    out = {r["id"]: (r["text"], r["n_removed"])
           for r in exact_substring_dedup(docs, w=5).collect()}
    assert BOILER in out[1][0] and BOILER not in out[2][0]
    assert out[2][0] == "one two three four five six seven"
    for i in (1, 2, 3):
        assert out[i][1] == removed_by_doc.get(i, 0)


def test_nl_substring_dedup_target(spark, sf_dir, tmp_path):
    """'remove duplicated passages' routes, rewrites, and reports;
    'flag ...' reports the span table only; window tuning parses."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    p = parse_dataops_query(
        "remove duplicated passages across the corpus, "
        "windows of 6 tokens")
    assert p == {"target": "substring_dedup", "window": 6,
                 "flag_only": False}
    assert parse_dataops_query(
        "flag repeated substrings in the corpus") \
        == {"target": "substring_dedup", "window": 50,
            "flag_only": True}
    assert parse_dataops_query(
        "exact substring dedup the corpus")["target"] \
        == "substring_dedup"

    # seed a corpus with a planted duplicated passage
    src = str(tmp_path / "src")
    docs = _docs(spark, [
        (1, "alpha beta gamma delta " + BOILER + " epsilon zeta"),
        (2, "one two three four five " + BOILER + " six seven"),
        (3, "unique content here with no duplication at all today"),
    ])
    docs.withColumn("lang", F.lit("en")) \
        .withColumn("source", F.lit("s")) \
        .write.parquet(src + "/documents.parquet")
    pipe = Pipeline(spark, FixtureFetcher(spark, src))
    out = str(tmp_path / "clean")
    res = pipe.run_dataops(
        "remove duplicated passages across the corpus, "
        "windows of 5 tokens", src, out)
    assert res["status"] == "complete"
    rep = res["reports"]
    assert rep["docs_out"] == 3 and rep["docs_affected"] == 1
    assert rep["tokens_removed"] == 10
    back = {r["id"]: r["text"]
            for r in spark.read.parquet(out).collect()}
    assert BOILER not in back[2] and BOILER in back[1]
    # flag-only face: the span table itself
    out2 = str(tmp_path / "spans")
    res2 = pipe.run_dataops(
        "find duplicated passages in the corpus, windows of 5 tokens",
        src, out2)
    assert res2["status"] == "complete"
    assert res2["reports"]["spans_flagged"] == 1
    assert res2["reports"]["docs_affected"] == 1
