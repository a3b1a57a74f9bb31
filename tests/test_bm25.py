"""BM25 retrieval (T17): scoring semantics, length normalization,
ranking determinism, degenerate inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators.text import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id bigint, query_text string")


def test_tf_monotone_at_equal_length(spark):
    """More occurrences of the query term at the same doc length must
    score higher (the tf saturation curve is increasing)."""
    docs = _docs(spark, [
        (1, "apple pear plum fig"),
        (2, "apple apple plum fig"),
        (3, "pear pear plum fig"),
    ])
    out = bm25_topk(docs, _queries(spark, [(1, "apple")]), k=10).collect()
    ids = [r["id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ids == [2, 1]                      # doc 3 never matches
    by_id = {r["id"]: r["bm25"] for r in out}
    assert by_id[2] > by_id[1] > 0


def test_length_normalization(spark):
    """Same tf, longer doc → lower score when b > 0; b=0 turns the
    doc-length penalty off and the scores tie."""
    docs = _docs(spark, [
        (1, "apple fig"),
        (2, "apple fig fig fig fig fig fig fig"),
    ])
    q = _queries(spark, [(1, "apple")])
    scored = {r["id"]: r["bm25"] for r in bm25_topk(docs, q).collect()}
    assert scored[1] > scored[2]
    flat = {r["id"]: r["bm25"] for r in bm25_topk(docs, q, b=0.0).collect()}
    assert flat[1] == flat[2]


def test_multi_term_sum_and_qtf_once(spark):
    """Score sums over distinct query terms; a term repeated in the
    query counts once (qtf=1 BM25)."""
    docs = _docs(spark, [(1, "apple pear"), (2, "apple plum")])
    q1 = _queries(spark, [(1, "apple pear")])
    q2 = _queries(spark, [(1, "apple apple pear")])
    once = {(r["id"]): (r["bm25"], r["n_terms"])
            for r in bm25_topk(docs, q1).collect()}
    twice = {(r["id"]): (r["bm25"], r["n_terms"])
             for r in bm25_topk(docs, q2).collect()}
    assert once == twice
    assert once[1][1] == 2 and once[2][1] == 1   # terms matched per doc
    assert once[1][0] > once[2][0]


def test_topk_cap_and_id_tiebreak(spark):
    """rank <= k, and equal scores order by ascending id."""
    docs = _docs(spark, [(i, "apple fig") for i in range(10)])
    out = (bm25_topk(docs, _queries(spark, [(1, "apple")]), k=4)
           .orderBy("rank").collect())
    assert [r["id"] for r in out] == [0, 1, 2, 3]
    assert max(r["rank"] for r in out) == 4
    assert len({r["bm25"] for r in out}) == 1


def test_degenerate_inputs(spark):
    docs = _docs(spark, [(1, "apple pear"), (2, None), (3, "")])
    # query with no corpus hits → no rows; empty query text → no rows
    assert bm25_topk(docs, _queries(spark, [(1, "zebra")])).count() == 0
    assert bm25_topk(docs, _queries(spark, [(1, "   ")])).count() == 0
    # null/empty docs never appear, and don't crash the stats scalar
    out = bm25_topk(docs, _queries(spark, [(1, "apple")])).collect()
    assert [r["id"] for r in out] == [1]
    # empty corpus → empty result
    empty = _docs(spark, []).filter(F.lit(False))
    assert bm25_topk(empty, _queries(spark, [(1, "apple")])).count() == 0


def test_index_store_parity_and_pruning(spark, tmp_path):
    """search_bm25_index == bm25_topk row for row, and the tok-sorted
    postings layout confines a term lookup to the files whose min/max
    range covers it."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.text import (
        save_bm25_index,
        search_bm25_index,
    )

    import random
    rng = random.Random(3)
    vocab = ["apple", "banana", "cherry", "date", "elder", "fig",
             "grape", "kiwi", "lemon", "mango", "olive", "peach"]
    docs = _docs(spark, [
        (i, " ".join(rng.choices(vocab, k=12))) for i in range(400)])
    store = str(tmp_path / "bm25idx")
    rep = save_bm25_index(docs, store, n_files=8)
    assert rep["n_docs"] == 400 and rep["n_terms"] <= len(vocab)
    q = _queries(spark, [(1, "apple fig"), (2, "mango")])
    key = lambda r: (r["query_id"], r["rank"], r["id"], r["bm25"],
                     r["n_terms"])
    from dynamic_etl_pipeline_thesis_ii_spark.operators.text import bm25_topk
    want = sorted(key(r) for r in bm25_topk(docs, q, k=7).collect())
    got = sorted(key(r) for r in
                 search_bm25_index(spark, store, q, k=7).collect())
    assert got == want and len(got) > 0
    # pruning: a single-term read touches a strict subset of tf files
    from pyspark.sql import functions as F
    tf = spark.read.parquet(store + "/tf")
    all_files = len(tf.inputFiles())
    touched = (tf.filter(F.col("tok") == "apple")
               .select(F.input_file_name().alias("f"))
               .distinct().count())
    assert all_files == 8 and touched <= 2


def test_nl_bm25_index_lifecycle(spark, tmp_path):
    """'build a retrieval index' then 'search the index at /p for
    ...': NL build/probe parity with the direct operators, plus the
    unreadable-store rejection."""
    import os

    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF",
                            "/root/testdata/sf0.001")
    assert parse_dataops_query(
        "build a retrieval index over the corpus") \
        == {"target": "bm25_index_build"}
    assert parse_dataops_query(
        "create a bm25 index")["target"] == "bm25_index_build"
    # dense phrasing stays on the ANN build
    assert parse_dataops_query(
        "build an ann index over the embeddings")["target"] \
        == "ann_index_build"
    p = parse_dataops_query(
        'search the index at /idx for "spark window", top 3')
    assert p["target"] == "retrieve" and p["index_path"] == "/idx"
    assert p["queries"] == ["spark window"] and p["k"] == 3

    pipe = Pipeline(spark, FixtureFetcher(spark, sf_dir))
    store = str(tmp_path / "store")
    res = pipe.run_dataops("build a retrieval index over the corpus",
                           sf_dir, store)
    assert res["status"] == "complete"
    assert res["reports"]["n_docs"] > 0
    out = str(tmp_path / "hits")
    res2 = pipe.run_dataops(
        f'search the index at {store} for "spark window agg", top 4',
        sf_dir, out)
    assert res2["status"] == "complete"
    got = spark.read.parquet(out)
    # index probe == corpus-scan retrieval, row for row
    out2 = str(tmp_path / "hits_scan")
    res3 = pipe.run_dataops(
        'search the corpus for "spark window agg", top 4', sf_dir, out2)
    assert res3["status"] == "complete"
    key = lambda r: (r["query_text"], r["rank"], r["id"], r["bm25"])
    assert sorted(key(r) for r in got.collect()) \
        == sorted(key(r) for r in spark.read.parquet(out2).collect())

    r = pipe.run_dataops(
        'search the index at /nowhere for "x"', sf_dir, out)
    assert r["status"] == "rejected" and "index" in r["reason"]


def test_append_equals_rebuild_and_skips_existing(spark, tmp_path):
    """append_bm25_index grows the store at batch cost and a search
    afterwards equals a full rebuild EXACTLY (merged df/avgdl move
    old docs' scores too — corpus-level statistics); a re-append of
    the same batch is a no-op counted as skipped."""
    import random

    from dynamic_etl_pipeline_thesis_ii_spark.operators.text import (
        append_bm25_index,
        bm25_topk,
        save_bm25_index,
        search_bm25_index,
    )

    rng = random.Random(7)
    vocab = ["apple", "banana", "cherry", "date", "elder", "fig",
             "grape", "kiwi", "lemon", "mango"]
    epoch0 = _docs(spark, [
        (i, " ".join(rng.choices(vocab[:6], k=10))) for i in range(120)])
    epoch1 = _docs(spark, [
        (1000 + i, " ".join(rng.choices(vocab, k=14)))
        for i in range(40)])
    store = str(tmp_path / "idx")
    save_bm25_index(epoch0, store, n_files=4)
    rep = append_bm25_index(spark, store, epoch1, n_files=2)
    assert rep == {"n_batch": 40, "n_skipped_existing": 0,
                   "n_new_docs": 40,
                   "n_new_postings": rep["n_new_postings"]}
    assert rep["n_new_postings"] > 0
    q = _queries(spark, [(1, "apple fig"), (2, "mango kiwi")])
    key = lambda r: (r["query_id"], r["rank"], r["id"], r["bm25"],
                     r["n_terms"])
    want = sorted(key(r) for r in
                  bm25_topk(epoch0.unionByName(epoch1), q, k=9).collect())
    got = sorted(key(r) for r in
                 search_bm25_index(spark, store, q, k=9).collect())
    assert got == want and len(got) > 0
    # all-dup re-append: skipped, no stats row, scores unchanged
    rep2 = append_bm25_index(spark, store, epoch1)
    assert rep2["n_new_docs"] == 0 and rep2["n_skipped_existing"] == 40
    again = sorted(key(r) for r in
                   search_bm25_index(spark, store, q, k=9).collect())
    assert again == want


def test_nl_bm25_index_append(spark, tmp_path):
    """'add the new documents to the retrieval index at /p': NL
    epoch-grow parity with a fresh build over the same corpus, plus
    the missing-path and unreadable-store rejections; 'add ... to
    the index' (no lexical qualifier) stays on the ANN append."""
    import os

    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    p = parse_dataops_query(
        "add the new documents to the retrieval index at /idx")
    assert p == {"target": "bm25_index_append", "index_path": "/idx"}
    assert parse_dataops_query(
        "append the batch to the bm25 index at /x")["target"] \
        == "bm25_index_append"
    assert parse_dataops_query(
        "append the new vectors to the index at /x")["target"] \
        == "ann_index_append"

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF",
                            "/root/testdata/sf0.001")
    pipe = Pipeline(spark, FixtureFetcher(spark, sf_dir))
    # seed the store with HALF the corpus via the direct operator
    from dynamic_etl_pipeline_thesis_ii_spark.operators.text import (
        save_bm25_index,
        search_bm25_index,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import (
        Catalog,
    )
    from pyspark.sql import functions as F

    docs = Catalog(spark, sf_dir).documents
    store = str(tmp_path / "store")
    save_bm25_index(docs.filter(F.col("doc_id") % 2 == 0), store,
                    n_files=4)
    # NL append of the FULL corpus: odd ids are fresh, even skipped
    res = pipe.run_dataops(
        f"add the new documents to the retrieval index at {store}",
        sf_dir, str(tmp_path / "out"))
    assert res["status"] == "complete"
    rep = res["reports"]
    assert rep["n_skipped_existing"] > 0 and rep["n_new_docs"] > 0
    assert rep["docs_after"] == rep["n_skipped_existing"] \
        + rep["n_new_docs"]
    # grown store == fresh full build, row for row
    full = str(tmp_path / "full")
    save_bm25_index(docs, full, n_files=4)
    q = _queries(spark, [(1, "spark window agg"), (2, "hash join")])
    key = lambda r: (r["query_id"], r["rank"], r["id"], r["bm25"])
    assert sorted(key(r) for r in
                  search_bm25_index(spark, store, q, k=6).collect()) \
        == sorted(key(r) for r in
                  search_bm25_index(spark, full, q, k=6).collect())
    # rejections: no path; unreadable path
    r1 = pipe.run_dataops(
        "add the new documents to the retrieval index", sf_dir,
        str(tmp_path / "o1"))
    assert r1["status"] == "rejected" and "path" in r1["reason"]
    r2 = pipe.run_dataops(
        f"add the new documents to the retrieval index at "
        f"{tmp_path}/nope", sf_dir, str(tmp_path / "o2"))
    assert r2["status"] == "rejected" and "no retrieval index" in r2["reason"]
