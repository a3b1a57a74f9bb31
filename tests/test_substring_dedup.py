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


def test_incremental_equals_full_on_batch_ids(spark, tmp_path):
    """Probing a batch against snapshot(corpus) reproduces EXACTLY
    the full-corpus span computation restricted to batch ids (batch
    ids sort after corpus ids, so every shared window's canonical
    occurrence lives in the corpus) — the incremental face is the
    batch-cost path to the same answer."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import (
        incremental_substring_spans,
        save_window_snapshot,
    )

    corpus = _docs(spark, [
        (1, "alpha beta gamma delta " + BOILER + " epsilon zeta"),
        (2, "unrelated corpus content with nothing shared at all"),
    ])
    batch = _docs(spark, [
        (100, "one two three four five " + BOILER + " six seven"),
        (101, BOILER + " " + BOILER),          # snapshot + internal
        (102, "clean new document without any duplicated passage"),
        (103, "tiny"),
    ])
    snap = str(tmp_path / "snap")
    rep = save_window_snapshot(corpus, snap, w=5)
    assert rep["w"] == 5 and rep["n_windows"] > 0
    spans, fresh = incremental_substring_spans(batch, spark, snap)
    got = sorted(tuple(r) for r in spans.collect())
    want = sorted(
        tuple(r) for r in
        substring_duplicate_spans(corpus.unionByName(batch), w=5)
        .filter("id >= 100").collect())
    assert got == want and len(got) >= 2
    # fresh hashes are exactly the batch windows the store lacks:
    # appending them then re-probing the SAME batch flags everything
    n_fresh = fresh.count()
    assert n_fresh > 0
    fresh.write.mode("append").parquet(snap)
    spans2, fresh2 = incremental_substring_spans(batch, spark, snap)
    assert fresh2.count() == 0
    # doc 102's windows are now all "seen" (its own from epoch 1)
    flagged_docs = {r["id"] for r in spans2.collect()}
    assert 102 in flagged_docs


def test_nl_passage_snapshot_lifecycle(spark, tmp_path):
    """'build a passage snapshot' then 'flag duplicated passages
    against the passage snapshot at /p and update the snapshot':
    routing, probe parity with the direct operator, the grow step,
    and rejections."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    assert parse_dataops_query(
        "build a passage snapshot of the corpus, windows of 5 tokens") \
        == {"target": "passage_snapshot", "window": 5}
    p = parse_dataops_query(
        "flag duplicated passages against the passage snapshot at "
        "/s and update the snapshot")
    assert p == {"target": "passage_probe", "snapshot_path": "/s",
                 "update": True}
    # no snapshot mention stays on the batch span report
    assert parse_dataops_query(
        "flag duplicated passages in the corpus")["target"] \
        == "substring_dedup"

    corpus_dir = str(tmp_path / "corpus")
    _docs(spark, [
        (1, "alpha beta gamma delta " + BOILER + " epsilon zeta"),
        (2, "unrelated corpus content with nothing shared at all"),
    ]).write.parquet(corpus_dir + "/documents.parquet")
    batch_dir = str(tmp_path / "batch")
    _docs(spark, [
        (100, "one two three four five " + BOILER + " six seven"),
        (102, "clean new document without any duplicated passage"),
    ]).write.parquet(batch_dir + "/documents.parquet")

    pipe = Pipeline(spark, FixtureFetcher(spark, corpus_dir))
    snap = str(tmp_path / "snap")
    res = pipe.run_dataops(
        "build a passage snapshot of the corpus, windows of 5 tokens",
        corpus_dir, snap)
    assert res["status"] == "complete" and res["reports"]["w"] == 5
    out = str(tmp_path / "spans")
    res2 = pipe.run_dataops(
        f"flag duplicated passages against the passage snapshot at "
        f"{snap} and update the snapshot", batch_dir, out)
    assert res2["status"] == "complete"
    rep = res2["reports"]
    assert rep["spans_flagged"] == 1 and rep["docs_affected"] == 1
    assert rep["snapshot_updated"] and rep["fresh_windows"] > 0
    (r,) = spark.read.parquet(out).collect()
    assert (r["id"], r["span_start"], r["span_end"]) == (100, 5, 15)
    # grow happened: re-probing the same batch now flags doc 102 too
    out2 = str(tmp_path / "spans2")
    res3 = pipe.run_dataops(
        f"flag duplicated passages against the passage snapshot at "
        f"{snap}", batch_dir, out2)
    assert res3["status"] == "complete"
    assert res3["reports"]["fresh_windows"] == 0
    ids = {r["id"] for r in spark.read.parquet(out2).collect()}
    assert ids == {100, 102}
    # rejections
    r1 = pipe.run_dataops(
        "flag duplicated passages against the passage snapshot",
        batch_dir, str(tmp_path / "o1"))
    assert r1["status"] == "rejected" and "snapshot path" in r1["reason"]
    r2 = pipe.run_dataops(
        f"flag duplicated passages against the passage snapshot at "
        f"{tmp_path}/nope", batch_dir, str(tmp_path / "o2"))
    assert r2["status"] == "rejected" \
        and "no passage snapshot" in r2["reason"]


def test_nl_compact_store_on_grown_passage_snapshot(spark, tmp_path):
    """'compact the snapshot at /p': an epoch-grown passage snapshot
    compacts into fewer whash-sorted files and probe answers are
    unchanged; key-column inference and rejections."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import (
        incremental_substring_spans,
        save_window_snapshot,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    assert parse_dataops_query("compact the snapshot at /s") \
        == {"target": "compact_store", "store_path": "/s"}
    assert parse_dataops_query("compact the corpus store at /s")[
        "store_path"] == "/s"

    corpus = _docs(spark, [
        (1, "alpha beta gamma delta " + BOILER + " epsilon zeta")])
    snap = str(tmp_path / "snap")
    save_window_snapshot(corpus, snap, w=5, n_files=4)
    # grow twice so the store holds several small file batches
    for i, extra in enumerate(["fresh words one epoch grow now ok",
                               "another epoch of new window text"]):
        batch = _docs(spark, [(100 + i, extra + " " + BOILER)])
        _spans, fresh = incremental_substring_spans(
            batch, spark, snap)
        fresh.write.mode("append").parquet(snap)
    files_before = len(spark.read.parquet(snap).inputFiles())

    src = str(tmp_path / "src")
    _docs(spark, [(1, "x")]).write.parquet(src + "/documents.parquet")
    pipe = Pipeline(spark, FixtureFetcher(spark, src))
    dest = str(tmp_path / "compacted")
    res = pipe.run_dataops(f"compact the snapshot at {snap}", src,
                           dest)
    assert res["status"] == "complete"
    rep = res["reports"]
    assert rep["key_cols"] == ["whash"]
    assert rep["files_before"] == files_before
    assert rep["files_after"] < files_before
    # same distinct hash set -> same probe answers; pair the meta
    import shutil
    shutil.copytree(snap + "_meta", dest + "_meta")
    probe = _docs(spark, [(500, "one two " + BOILER + " tail here")])
    spans_old, _ = incremental_substring_spans(probe, spark, snap)
    spans_new, _ = incremental_substring_spans(probe, spark, dest)
    assert sorted(map(tuple, spans_old.collect())) \
        == sorted(map(tuple, spans_new.collect()))
    # rejections
    r1 = pipe.run_dataops("compact the snapshot", src,
                          str(tmp_path / "o1"))
    assert r1["status"] == "rejected" and "store path" in r1["reason"]
    r2 = pipe.run_dataops(
        f"compact the snapshot at {tmp_path}/nope", src,
        str(tmp_path / "o2"))
    assert r2["status"] == "rejected" and "no store" in r2["reason"]


def test_benchmark_span_flags_and_rewrite(spark):
    """D19: a corpus doc quoting a benchmark passage flags exactly
    that span; the rewrite cuts the quote and keeps the document;
    clean docs untouched; DuckDB twin matches."""
    import duckdb

    from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import (
        SQL_BENCH_SPANS,
        benchmark_span_flags,
        remove_benchmark_spans,
    )

    bench = _docs(spark, [(900, BOILER)])
    corpus = _docs(spark, [
        (1, "alpha beta gamma delta " + BOILER + " epsilon zeta"),
        (2, "clean document with entirely original content today"),
        (3, BOILER),                             # pure leak
    ])
    spans = sorted(tuple(r) for r in
                   benchmark_span_flags(corpus, bench, w=5).collect())
    assert spans == [(1, 4, 14, 6), (3, 0, 10, 6)]
    con = duckdb.connect()
    con.register("documents", corpus.toPandas())
    con.register("bench", bench.toPandas())
    want = sorted(tuple(r) for r in con.execute(
        SQL_BENCH_SPANS(5, corpus_table="documents",
                        bench_table="bench")).fetchall())
    assert spans == want
    out = {r["id"]: (r["text"], r["n_removed"])
           for r in remove_benchmark_spans(corpus, bench,
                                           w=5).collect()}
    assert BOILER not in out[1][0] and out[1][1] == 10
    assert out[1][0] == "alpha beta gamma delta epsilon zeta"
    assert out[2][1] == 0
    assert out[3] == ("", 10)


def test_nl_decontaminate_spans_target(spark, tmp_path):
    """'remove benchmark passages ... against the benchmark at /p':
    routing (doc-level decontamination keeps its route), rewrite +
    flag faces, rejections."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    p = parse_dataops_query(
        "remove benchmark passages from the corpus against the "
        "benchmark at /b, windows of 5 tokens")
    assert p == {"target": "decontaminate_spans",
                 "benchmark_path": "/b", "window": 5,
                 "flag_only": False}
    assert parse_dataops_query(
        "decontaminate the corpus against the benchmark at /b, at "
        "the passage level")["target"] == "decontaminate_spans"
    # doc-level stays on D7
    assert parse_dataops_query(
        "decontaminate the corpus against the benchmark at /b")[
        "target"] == "decontaminate"

    bench_dir = str(tmp_path / "bench")
    _docs(spark, [(900, BOILER)]).write.parquet(bench_dir)
    src = str(tmp_path / "src")
    _docs(spark, [
        (1, "alpha beta gamma delta " + BOILER + " epsilon zeta"),
        (2, "clean document with entirely original content today"),
    ]).write.parquet(src + "/documents.parquet")
    pipe = Pipeline(spark, FixtureFetcher(spark, src))
    out = str(tmp_path / "clean")
    res = pipe.run_dataops(
        f"remove benchmark passages from the corpus against the "
        f"benchmark at {bench_dir}, windows of 5 tokens", src, out)
    assert res["status"] == "complete"
    rep = res["reports"]
    assert rep["docs_out"] == 2 and rep["docs_affected"] == 1
    assert rep["tokens_removed"] == 10
    back = {r["id"]: r["text"]
            for r in spark.read.parquet(out).collect()}
    assert BOILER not in back[1] and "alpha beta" in back[1]
    # flag face
    out2 = str(tmp_path / "spans")
    res2 = pipe.run_dataops(
        f"flag benchmark passages in the corpus against the "
        f"benchmark at {bench_dir}, windows of 5 tokens", src, out2)
    assert res2["status"] == "complete"
    assert res2["reports"]["spans_flagged"] == 1
    # rejections
    r1 = pipe.run_dataops(
        "remove benchmark passages from the corpus", src,
        str(tmp_path / "o1"))
    assert r1["status"] == "rejected" and "benchmark path" in r1["reason"]
    r2 = pipe.run_dataops(
        f"remove benchmark passages from the corpus against the "
        f"benchmark at {tmp_path}/nope", src, str(tmp_path / "o2"))
    assert r2["status"] == "rejected" and "no benchmark" in r2["reason"]
