"""Empty/degenerate-input robustness for the data operators — a 100 TB
pipeline hits empty partitions, empty tables and single-row groups
constantly; none of them may throw."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

from dynamic_etl_pipeline_thesis_ii_spark.config import EngineConfig
from dynamic_etl_pipeline_thesis_ii_spark.operators import dedup as D
from dynamic_etl_pipeline_thesis_ii_spark.operators import similarity as SIM
from dynamic_etl_pipeline_thesis_ii_spark.operators import similarity_join as SJ
from dynamic_etl_pipeline_thesis_ii_spark.operators import text as T

CFG = EngineConfig()

DOC_SCHEMA = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])
EMB_SCHEMA = StructType([StructField("vec_id", LongType()),
                         StructField("embedding", ArrayType(DoubleType()))])


@pytest.fixture()
def empty_docs(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


def test_dedup_ops_on_empty(spark, empty_docs):
    assert D.dedup_exact(empty_docs).count() == 0
    assert D.minhash_lsh_pairs(empty_docs).count() == 0
    assert D.simhash_pairs(empty_docs).count() == 0
    assert D.jaccard_pairs(empty_docs).count() == 0


def test_dedup_single_and_whitespace_doc(spark):
    docs = spark.createDataFrame(
        [(1, "hello world foo"), (2, "   "), (3, "")], DOC_SCHEMA)
    # "" and "   " normalize to the same empty string -> one survives
    assert D.dedup_exact(docs).count() == 2
    kept = {r["doc_id"] for r in D.dedup_exact(docs).collect()}
    assert kept == {1, 2}  # lowest id per group wins
    # shingle-based ops drop shingle-less docs without error
    assert D.minhash_lsh_pairs(docs, k=3).count() == 0
    assert D.jaccard_pairs(docs, k=3).count() == 0


def test_similarity_on_empty(spark):
    q = spark.createDataFrame([], StructType([
        StructField("q_id", LongType()),
        StructField("q_vec", ArrayType(DoubleType()))]))
    c = spark.createDataFrame([], StructType([
        StructField("c_id", LongType()),
        StructField("c_vec", ArrayType(DoubleType()))]))
    assert SIM.brute_force_topk(q, c, k=3).count() == 0


def test_simjoin_empty_side(spark):
    a = spark.createDataFrame([], StructType([
        StructField("ida", LongType()), StructField("x", DoubleType())]))
    b = spark.createDataFrame([(1, 2.0)], ["idb", "x"])
    joined, report = SJ.similarity_join(a, b, "ida", "idb", CFG)
    assert joined is None
    assert report["status"] in ("no_matches", "no_numeric_columns")


def test_text_features_on_degenerate(spark):
    docs = spark.createDataFrame([(1, ""), (2, "a"), (3, "x y z")], DOC_SCHEMA)
    feats = T.quality_features(F.col("text"))
    out = docs.select("doc_id", *[v.alias(k) for k, v in feats.items()]).collect()
    assert len(out) == 3  # no division-by-zero crashes


def test_min_label_components_chain_and_star(spark):
    """A 4-chain, a 3-star and a singleton edge resolve to min-id
    components (propagation must cross multiple hops)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),        # chain 1-2-3-4
         (10, 11), (10, 12),            # star around 10
         (20, 21)],                     # single edge
        ["id_a", "id_b"])
    # both execution paths must agree: driver union-find (default) and
    # the distributed min-label loop (forced via driver_threshold=0)
    for thr in (5_000_000, 0):
        comp = {r["id"]: r["comp"]
                for r in D.min_label_components(
                    pairs, driver_threshold=thr).collect()}
        assert all(comp[i] == 1 for i in (1, 2, 3, 4)), thr
        assert all(comp[i] == 10 for i in (10, 11, 12)), thr
        assert comp[20] == comp[21] == 20, thr


def test_dedup_by_components_keeps_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 10, 11, 99)],
        ["doc_id", "text"])
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)],
                                  ["id_a", "id_b"])
    kept = {r["doc_id"]
            for r in D.dedup_by_components(docs, pairs).collect()}
    assert kept == {1, 10, 99}  # one per cluster + untouched doc


def test_dedup_by_components_quality_keep(spark):
    """score= flips the canonical from lowest-id to highest-score
    (ties -> lowest id; docs missing from score rank last)."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 10, 11, 20, 21, 99)],
        ["doc_id", "text"])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], ["id_a", "id_b"])
    # cluster {1,2,3}: 3 wins on score; {10,11}: tie -> 10 wins;
    # {20,21}: 20 unscored ranks last -> 21 wins; 99 untouched.
    score = spark.createDataFrame(
        [(1, 0.2), (2, 0.5), (3, 0.9), (10, 0.7), (11, 0.7), (21, 0.1)],
        ["id", "score"])
    kept = {r["doc_id"] for r in
            D.dedup_by_components(docs, pairs, score=score).collect()}
    assert kept == {3, 10, 21, 99}


def test_dedup_by_components_score_fanout_safe(spark):
    """Duplicate ids in the score frame (a fanned-out join upstream)
    must not rank an id against itself and drop the cluster winner."""
    docs = spark.createDataFrame([(i, f"doc {i}") for i in (1, 2)],
                                 ["doc_id", "text"])
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    score = spark.createDataFrame(
        [(1, 0.9), (1, 0.9), (2, 0.5)], ["id", "score"])
    kept = {r["doc_id"] for r in
            D.dedup_by_components(docs, pairs, score=score).collect()}
    assert kept == {1}


def test_dedup_by_components_empty_pairs(spark):
    """Zero near-dup candidates (a clean corpus) passes everything
    through instead of crashing on an un-inferable empty frame."""
    docs = spark.createDataFrame([(i, f"doc {i}") for i in (1, 2, 3)],
                                 ["doc_id", "text"])
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    for score in (None, docs.selectExpr("doc_id AS id", "1.0 AS score")):
        kept = {r["doc_id"] for r in
                D.dedup_by_components(docs, pairs, score=score).collect()}
        assert kept == {1, 2, 3}


def test_null_text_produces_zero_shingles_not_a_crash(spark):
    """A 100 TB corpus has null text rows; every shingle-based operator
    must treat them as zero-shingle docs, not fail the job (the JVM
    NGram UDF throws on null arrays without the coalesce guard)."""
    docs = spark.createDataFrame([(1, "a b c d e"), (2, None)], DOC_SCHEMA)
    assert D.shingle_rows(docs, "text", "doc_id", 2) \
        .filter(F.col("id") == 2).count() == 0
    assert D.minhash_lsh_pairs(docs, k=2).count() == 0
    assert D.contamination_pairs(docs, docs.limit(1), k=2).count() >= 1
    assert D.jaccard_pairs(docs, k=2, threshold=0.1).count() == 0


def test_k1_null_docs_do_not_pair(spark):
    docs = spark.createDataFrame([(1, None), (2, None), (3, "x y")],
                                 DOC_SCHEMA)
    # at k=1 a null doc must yield zero shingles, not one '' shingle
    assert D.shingle_rows(docs, "text", "doc_id", 1) \
        .filter(F.col("id").isin(1, 2)).count() == 0
    assert D.jaccard_pairs(docs, k=1, threshold=0.1).count() == 0
