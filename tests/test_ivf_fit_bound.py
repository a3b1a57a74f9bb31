"""Sample-bounded coarse-quantizer fit (the r11 scale carve-out).

``ivf_build`` consumers hold cluster SIZE constant (k ∝ n), so a
full-corpus Lloyd fit is O(n²·d) — quadratic in the corpus. The fit
now trains on a deterministic content-hash sample of
``min(n, max_fit_per_cluster·k, max_fit_vectors)`` vectors and assigns
the FULL corpus through the one-pass broadcast-GEMM kernel. These
tests pin the output CONTRACT (schema, k centers, total assignment),
the determinism of the sample draw, clustering QUALITY parity against
the unbounded fit, and that small corpora keep the exact pre-r12
pyspark-KMeans behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators import similarity as SIM

K = 4
N = 1200  # > cap = 64 * K = 256 -> the bounded path activates


@pytest.fixture(scope="module")
def blob_corpus(spark):
    """N vectors in K well-separated 8-d blobs with deterministic
    per-id jitter — ground truth = id % K."""
    ids = spark.range(N).select(F.col("id").alias("c_id"))
    blob = F.col("c_id") % K
    jit = [(F.pmod(F.hash(F.col("c_id"), F.lit(j)), F.lit(100))
            .cast("double") / 1000.0) for j in range(8)]
    vec = F.array(*[
        (F.when(blob == j % K, F.lit(10.0)).otherwise(F.lit(0.0))
         + jit[j]).cast("double")
        for j in range(8)])
    return ids.withColumn("c_vec", vec).persist()


def _purity(bucketed) -> float:
    """Fraction of vectors whose cluster agrees with the majority
    ground-truth blob of that cluster."""
    agg = (bucketed.withColumn("blob", F.col("c_id") % K)
           .groupBy("__cluster", "blob").count())
    top = (agg.groupBy("__cluster")
           .agg(F.max("count").alias("top"), F.sum("count").alias("n")))
    row = top.agg(F.sum("top").alias("t"), F.sum("n").alias("n")).first()
    return row["t"] / row["n"]


def test_bounded_fit_activates_and_keeps_contract(blob_corpus):
    centers, bucketed = SIM.ivf_build(blob_corpus, n_clusters=K)
    crows = centers.collect()
    assert len(crows) == K
    assert sorted(r["__cluster"] for r in crows) == list(range(K))
    assert all(len(r["__center"]) == 8 for r in crows)
    assert set(bucketed.columns) == {"c_id", "c_vec", "__cluster", "__cn"}
    # every vector assigned, to a real cluster id
    assert bucketed.count() == N
    assigned = {r["__cluster"] for r in
                bucketed.select("__cluster").distinct().collect()}
    assert assigned <= set(range(K))


def test_bounded_fit_is_deterministic(blob_corpus):
    # same seed -> identical centers AND identical assignments, even
    # across a different partitioning of the same content
    c1, b1 = SIM.ivf_build(blob_corpus, n_clusters=K, seed=7)
    c2, b2 = SIM.ivf_build(blob_corpus.repartition(13), n_clusters=K,
                           seed=7)
    assert sorted(map(tuple, c1.collect())) == \
        sorted(map(tuple, c2.collect()))
    a1 = sorted((r["c_id"], r["__cluster"]) for r in b1.collect())
    a2 = sorted((r["c_id"], r["__cluster"]) for r in b2.collect())
    assert a1 == a2


def test_bounded_fit_quality_matches_full_fit(blob_corpus):
    """On separable data the sampled fit recovers the same structure
    as the unbounded pyspark-KMeans fit: both should be ~pure."""
    _, b_sample = SIM.ivf_build(blob_corpus, n_clusters=K)
    _, b_full = SIM.ivf_build(blob_corpus, n_clusters=K,
                              max_fit_per_cluster=0)
    assert _purity(b_sample) >= 0.99
    assert _purity(b_full) >= 0.99


def test_small_corpus_keeps_full_pyspark_fit(blob_corpus):
    """n <= cap -> the exact pre-r12 path (distributed KMeans on every
    vector): centers must be bit-identical to a forced full fit."""
    small = blob_corpus.filter(F.col("c_id") < 200)  # 200 < 64*K
    c_default, _ = SIM.ivf_build(small, n_clusters=K)
    c_forced, _ = SIM.ivf_build(small, n_clusters=K,
                                max_fit_per_cluster=0)
    assert sorted(map(tuple, c_default.collect())) == \
        sorted(map(tuple, c_forced.collect()))


def test_seed_varies_the_sample_draw(blob_corpus):
    """Different seeds draw independent samples; centers may differ
    but quality holds (the contract is the map, not the bits)."""
    _, b7 = SIM.ivf_build(blob_corpus, n_clusters=K, seed=7)
    _, b9 = SIM.ivf_build(blob_corpus, n_clusters=K, seed=9)
    assert _purity(b7) >= 0.99
    assert _purity(b9) >= 0.99


def test_downstream_cluster_embeddings_rides_the_bound(blob_corpus):
    """cluster_embeddings (N11) inherits the bounded fit: full output
    contract at n > cap."""
    emb = blob_corpus.select(F.col("c_id").alias("vec_id"),
                             F.col("c_vec").alias("embedding"))
    assign, centers = SIM.cluster_embeddings(emb, n_clusters=K)
    assert assign.count() == N
    assert centers.count() == K
    assert assign.columns == ["vec_id", "cluster", "center_cos"]
    # coherence: separable blobs -> near-unit center cosine
    lo = assign.agg(F.min("center_cos").alias("m")).first()["m"]
    assert lo > 0.95
