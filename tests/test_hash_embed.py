"""Built-in document embedding (N12, hashed random projection):
determinism, geometry sanity, and the embed -> dense-tier NL chain."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators.similarity import (
    brute_force_topk,
    hash_embed,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    da = math.sqrt(sum(x * x for x in a))
    db = math.sqrt(sum(x * x for x in b))
    return num / (da * db) if da and db else 0.0


def test_determinism_and_unit_norm(spark):
    """Same text -> bit-identical vector on any partitioning; vectors
    are unit-norm; empty/null text embeds as the zero vector."""
    docs = _docs(spark, [(i, f"alpha beta tok{i % 5} gamma")
                         for i in range(40)] + [(100, ""), (101, None)])
    a = {r["id"]: tuple(r["embedding"])
         for r in hash_embed(docs.repartition(1), dim=32).collect()}
    b = {r["id"]: tuple(r["embedding"])
         for r in hash_embed(docs.repartition(7), dim=32).collect()}
    assert a == b and len(a) == 42
    for i, v in a.items():
        n = sum(x * x for x in v)
        if i in (100, 101):
            assert n == 0.0
        else:
            assert abs(n - 1.0) < 1e-5
    # same token multiset -> same vector regardless of id
    docs2 = _docs(spark, [(1, "x y z"), (2, "z y x")])
    e = {r["id"]: tuple(r["embedding"])
         for r in hash_embed(docs2, dim=32).collect()}
    assert e[1] == e[2]


def test_geometry_token_overlap(spark):
    """JL sanity: high-overlap documents land close, disjoint-vocab
    documents land near orthogonal, and brute-force top-1 retrieves
    the overlapping neighbor."""
    docs = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different words about spark shuffles here"),
    ])
    e = {r["id"]: list(r["embedding"])
         for r in hash_embed(docs, dim=128).collect()}
    assert _cos(e[1], e[2]) > 0.7
    assert abs(_cos(e[1], e[3])) < 0.4
    emb = hash_embed(docs, dim=128)
    q = emb.filter("id = 1").select(F.col("id").alias("q_id"),
                                    F.col("embedding").alias("q_vec"))
    c = (emb.filter("id != 1")
         .select(F.col("id").alias("c_id"),
                 F.col("embedding").alias("c_vec")))
    top = brute_force_topk(q, c, k=1).first()
    assert top["c_id"] == 2


def test_nl_embed_then_dense_chain(spark, sf_dir, tmp_path):
    """'embed the documents' writes an embeddings-shaped table; a
    follow-up dense target (ann index build) chains off the output
    dir with no external encoder."""
    import os

    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    assert parse_dataops_query("embed the documents, 32 dimensions") \
        == {"target": "embed_documents", "dim": 32}
    assert parse_dataops_query("embed the corpus")["dim"] == 64

    pipe = Pipeline(spark, FixtureFetcher(spark, sf_dir))
    out_dir = str(tmp_path / "densified")
    os.makedirs(out_dir)
    res = pipe.run_dataops(
        "embed the documents, 32 dimensions", sf_dir,
        out_dir + "/embeddings.parquet")
    assert res["status"] == "complete"
    assert res["reports"]["dim"] == 32
    assert 0.9 <= res["reports"]["mean_sq_norm"] <= 1.0
    back = spark.read.parquet(out_dir + "/embeddings.parquet")
    assert set(back.columns) == {"vec_id", "embedding"}
    # chain: the documents table must ride along for Catalog reads
    from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import (
        Catalog,
    )
    Catalog(spark, sf_dir).documents.write.parquet(
        out_dir + "/documents.parquet")
    idx = str(tmp_path / "idx")
    res2 = pipe.run_dataops(
        "build an ann index over the embeddings, 16 lists",
        out_dir, idx)
    assert res2["status"] == "complete"
    assert res2["reports"]["codes_written"] == res["reports"]["n_vectors"]
