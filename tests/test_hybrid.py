"""Hybrid retrieval (T18): reciprocal-rank fusion semantics, the
two-tower composition, and the NL more-like-this target."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators.similarity import (
    hybrid_topk,
    rrf_fuse,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _ranked(spark, rows):
    return spark.createDataFrame(
        rows, "query_id bigint, id bigint, rank int")


def test_rrf_fusion_math_and_both_arms_bonus(spark):
    """1/(60+rank) per arm, summed and rounded; an item ranked
    mid-list by BOTH arms outranks an item ranked first by one."""
    lex = _ranked(spark, [(1, 10, 1), (1, 20, 2), (1, 30, 3)])
    den = _ranked(spark, [(1, 20, 1), (1, 30, 2), (1, 40, 3)])
    out = {r["id"]: (r["rank"], r["rrf"], r["n_arms"])
           for r in rrf_fuse([lex, den], k=10).collect()}
    # 20: 1/62 + 1/61 ≈ 0.032525 beats 10's 1/61 ≈ 0.016393
    assert out[20][0] == 1 and out[20][2] == 2
    assert out[30][0] == 2 and out[30][2] == 2
    assert round(1 / 62 + 1 / 61, 6) == out[20][1]
    assert out[10][2] == 1 and out[40][2] == 1
    # equal-rrf ties break on ascending id: 10 (lex rank 1) vs 40
    # (den rank 3) -> 1/61 vs 1/63, distinct; check ordering holds
    assert out[10][0] < out[40][0]


def test_rrf_k_cap_and_multi_query_isolation(spark):
    """Ranks are per query; k caps each query independently."""
    lex = _ranked(spark, [(1, 10, 1), (1, 20, 2),
                          (2, 99, 1), (2, 98, 2)])
    den = _ranked(spark, [(1, 30, 1), (2, 99, 2)])
    out = rrf_fuse([lex, den], k=2).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert sorted(per_q[1]) == [1, 2] and sorted(per_q[2]) == [1, 2]
    top2 = {r["id"] for r in out if r["query_id"] == 2}
    assert 99 in top2            # in both arms -> must survive the cap


def test_hybrid_topk_two_towers(spark):
    """Lexical-only and dense-only hits both surface; an id strong in
    both towers wins. Embeddings are constructed so doc 1 is the
    dense match and doc 2 the lexical match for the query."""
    docs = spark.createDataFrame(
        [(1, "totally unrelated words here"),
         (2, "spark window aggregate functions guide"),
         (3, "spark window"),
         (4, "nothing shared")],
        "doc_id bigint, text string")
    cands = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]),
         (3, [0.9, 0.1]), (4, [-1.0, 0.0])],
        "c_id bigint, c_vec array<double>")
    queries = spark.createDataFrame(
        [(7, "spark window", [1.0, 0.05])],
        "query_id bigint, query_text string, query_vec array<double>")
    out = {r["id"]: (r["rank"], r["n_arms"])
           for r in hybrid_topk(docs, cands, queries,
                                k=4, k_pool=4).collect()}
    # doc 3 matches BOTH towers (text hit + cos≈1) -> rank 1
    assert out[3] == (1, 2)
    assert 2 in out and out[2][1] >= 1      # lexical tower hit
    assert 1 in out and out[1][1] >= 1      # dense tower hit
    assert 4 not in out or out[4][1] == 1   # cos=-1, lex miss


def test_nl_hybrid_search_target(spark, sf_dir, tmp_path):
    """'find documents like doc 42 using both keywords and
    embeddings': routing, NL == direct-operator parity (minus the
    dropped self-hit), and the missing-id / no-id rejections."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import (
        Catalog,
    )

    p = parse_dataops_query(
        "find documents like doc 42 using both keywords and "
        "embeddings, top 5")
    assert p == {"target": "hybrid_search", "k": 5, "doc_ids": [42],
                 "index_path": None, "n_probe": None}
    assert parse_dataops_query(
        "hybrid search for documents like docs 3 and 7")["doc_ids"] \
        == [3, 7]
    # plain dense phrasing must stay on the ANN family
    assert parse_dataops_query(
        "find the 10 nearest neighbors for each document")["target"] \
        == "ann_search"

    pipe = Pipeline(spark, FixtureFetcher(spark, sf_dir))
    out = str(tmp_path / "hits")
    res = pipe.run_dataops(
        "find documents like doc 42 using both keywords and "
        "embeddings, top 5", sf_dir, out)
    assert res["status"] == "complete"
    rep = res["reports"]
    assert rep["hits_per_query"] and 42 in rep["hits_per_query"]
    back = spark.read.parquet(out)
    assert back.filter(F.col("id") == 42).count() == 0   # self dropped
    # parity with the direct operator (self-hit filtered identically)
    cat = Catalog(spark, sf_dir)
    docs = cat.documents.select("doc_id", "text")
    emb = cat.embeddings
    queries = (docs.filter(F.col("doc_id") == 42)
               .select(F.col("doc_id").alias("query_id"),
                       F.col("text").alias("query_text"))
               .join(emb.filter(F.col("vec_id") == 42)
                     .select(F.col("vec_id").alias("query_id"),
                             F.col("embedding").alias("query_vec")),
                     "query_id"))
    cands = emb.select(F.col("vec_id").alias("c_id"),
                       F.col("embedding").alias("c_vec"))
    want = sorted(
        (r["query_id"], r["rank"], r["id"], r["rrf"], r["n_arms"])
        for r in hybrid_topk(docs, cands, queries, k=6, k_pool=15)
        .filter(F.col("id") != F.col("query_id")).collect())
    got = sorted(
        (r["query_id"], r["rank"], r["id"], r["rrf"], r["n_arms"])
        for r in back.collect())
    assert got == want and len(got) > 0
    # rejections
    r1 = pipe.run_dataops(
        "hybrid search the corpus with keywords and embeddings",
        sf_dir, str(tmp_path / "o1"))
    assert r1["status"] == "rejected" and "doc" in r1["reason"]
    r2 = pipe.run_dataops(
        "find documents like doc 999999 using both keywords and "
        "embeddings", sf_dir, str(tmp_path / "o2"))
    assert r2["status"] == "rejected" and "999999" in r2["reason"]


def test_hybrid_dense_index_full_probe_equals_brute(spark):
    """Store-backed dense tower at full probe width + exact rerank
    reproduces the brute arm's fused ranking on L2-NORMALIZED
    vectors (squared-L2 rerank order == cosine order there), so the
    IVF swap is a pure scale substitution, not a semantics change."""
    import math

    from dynamic_etl_pipeline_thesis_ii_spark.operators.similarity import (
        ivfpq_build,
    )

    rows = []
    for i in range(60):
        v = [math.cos(0.37 * i + d) for d in range(8)]
        n = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / n for x in v]))
    cands = spark.createDataFrame(rows, "c_id bigint, c_vec array<double>")
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 5} filler") for i in range(60)],
        "doc_id bigint, text string")
    queries = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3}", rows[i][1]) for i in (0, 11, 23)],
        "query_id bigint, query_text string, query_vec array<double>")
    idx = ivfpq_build(cands, n_clusters=4, m=4, k=8)
    brute = sorted(
        (r["query_id"], r["rank"], r["id"])
        for r in hybrid_topk(docs, cands, queries, k=8,
                             k_pool=12).collect())
    ivf = sorted(
        (r["query_id"], r["rank"], r["id"])
        for r in hybrid_topk(docs, cands, queries, k=8, k_pool=12,
                             dense_index=(*idx, None),
                             n_probe=4).collect())
    assert ivf == brute and len(ivf) > 0


def test_nl_hybrid_search_with_store(spark, sf_dir, tmp_path):
    """'find documents like doc 42 ... using the ann index at /path':
    the dense tower rides the persisted store — n_probe resolution
    (explicit > tuned > default) named in the report, unloadable
    store rejects actionably, fused output still drops the self-hit."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    p = parse_dataops_query(
        "find documents like doc 42 using both keywords and "
        "embeddings, top 5, using the ann index at /idx, "
        "probing 3 lists")
    assert p["index_path"] == "/idx" and p["n_probe"] == 3

    pipe = Pipeline(spark, FixtureFetcher(spark, sf_dir))
    idx = str(tmp_path / "idx")
    built = pipe.run_dataops(
        "build an ann index over the embeddings, 4 lists",
        sf_dir, idx)
    assert built["status"] == "complete"
    out = str(tmp_path / "hits")
    res = pipe.run_dataops(
        f"find documents like doc 42 using both keywords and "
        f"embeddings, top 5, using the ann index at {idx}",
        sf_dir, out)
    assert res["status"] == "complete"
    rep = res["reports"]
    assert rep["dense_arm"] == "ivf"
    assert rep["n_probe_source"] == "default" and rep["n_probe"] == 2
    back = spark.read.parquet(out)
    assert back.count() > 0
    assert back.filter(F.col("id") == 42).count() == 0   # self dropped
    # explicit probe width wins
    res2 = pipe.run_dataops(
        f"find documents like doc 42 using both keywords and "
        f"embeddings, top 5, using the ann index at {idx}, "
        f"probing 4 lists", sf_dir, str(tmp_path / "h2"))
    assert res2["reports"]["n_probe"] == 4
    assert res2["reports"]["n_probe_source"] == "query"
    # brute path still reports its arm
    res3 = pipe.run_dataops(
        "find documents like doc 42 using both keywords and "
        "embeddings, top 5", sf_dir, str(tmp_path / "h3"))
    assert res3["reports"]["dense_arm"] == "brute"
    assert "n_probe" not in res3["reports"]
    # unloadable store
    bad = pipe.run_dataops(
        f"find documents like doc 42 using both keywords and "
        f"embeddings using the ann index at {tmp_path / 'nope'}",
        sf_dir, str(tmp_path / "h4"))
    assert bad["status"] == "rejected" and "index store" in bad["reason"]
