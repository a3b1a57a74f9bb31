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
