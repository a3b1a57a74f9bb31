"""Incremental dedup: a new ingest batch checked against a persisted
corpus snapshot (content-hash keys for exact, LSH band table for
near-dup) — cost scales with the batch, never the corpus."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dynamic_etl_pipeline_thesis_ii_spark.operators import dedup as D

DOC_SCHEMA = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame([
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "one two three four five six seven"),
        (3, "totally different historical document text"),
    ], DOC_SCHEMA)


def test_incremental_exact_drops_seen_and_batch_dups(spark, corpus):
    seen = D.content_keys(corpus)
    batch = spark.createDataFrame([
        (10, "Alpha  beta GAMMA delta epsilon zeta"),   # dup of seen 1
        (11, "a genuinely new document"),
        (12, "a  genuinely NEW document"),               # dup of 11 in-batch
        (13, "another new one"),
    ], DOC_SCHEMA)
    kept = {r["doc_id"] for r in D.incremental_exact(batch, seen).collect()}
    assert kept == {11, 13}


def test_incremental_exact_empty_snapshot(spark, corpus):
    empty_seen = D.content_keys(corpus).limit(0)
    kept = {r["doc_id"]
            for r in D.incremental_exact(corpus, empty_seen).collect()}
    assert kept == {1, 2, 3}


def test_incremental_neardup_probe_finds_snapshot_neighbor(spark, corpus):
    bands = D.minhash_band_keys(corpus, k=2)
    batch = spark.createDataFrame([
        # same shingles as seen doc 1 plus a tail → shares band buckets
        (20, "alpha beta gamma delta epsilon zeta eta theta"),
        (21, "completely unrelated fresh content here"),
    ], DOC_SCHEMA)
    pairs = {(r["id_new"], r["id_seen"])
             for r in D.incremental_neardup_pairs(batch, bands,
                                                  k=2).collect()}
    assert (20, 1) in pairs
    assert all(idn != 21 for idn, _ in pairs)


def test_incremental_neardup_no_corpus_self_join(spark, corpus):
    bands = D.minhash_band_keys(corpus, k=2)
    batch = corpus.limit(1)
    plan = D.incremental_neardup_pairs(batch, bands, k=2)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_lsh_pairs_unchanged_by_band_key_refactor(spark, corpus):
    # minhash_lsh_pairs now builds on minhash_band_keys; the classic
    # within-corpus pair semantics must be intact
    docs = corpus.union(spark.createDataFrame(
        [(4, "alpha beta gamma delta epsilon zeta")], DOC_SCHEMA))
    pairs = {(r["id_a"], r["id_b"])
             for r in D.minhash_lsh_pairs(docs, k=2).collect()}
    assert (1, 4) in pairs


def test_snapshot_roundtrip_through_parquet(spark, corpus, tmp_path):
    """The operational loop: persist the content-key and band-table
    snapshots to parquet after an ingest run, read them back in the
    next run, and dedup the new batch against them."""
    keys_path = str(tmp_path / "seen_keys")
    bands_path = str(tmp_path / "seen_bands")
    D.content_keys(corpus).write.parquet(keys_path)
    D.minhash_band_keys(corpus, k=2).write.parquet(bands_path)

    seen = spark.read.parquet(keys_path)
    bands = spark.read.parquet(bands_path)
    batch = spark.createDataFrame([
        (30, "alpha beta gamma delta epsilon zeta"),   # exact dup of 1
        (31, "a wholly new document body"),
    ], DOC_SCHEMA)
    kept = {r["doc_id"] for r in D.incremental_exact(batch, seen).collect()}
    assert kept == {31}
    pairs = {(r["id_new"], r["id_seen"])
             for r in D.incremental_neardup_pairs(batch, bands,
                                                  k=2).collect()}
    assert (30, 1) in pairs
