"""Recall@k telemetry for the persisted IVF-PQ store: the exact-L2
ground-truth scan, the estimate's math, and the NL drift-monitor face
('estimate the recall of the ann index at /path')."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators import similarity as SIM

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import Catalog
    return Catalog(spark, SF).embeddings.persist()


def test_exact_l2_topk_matches_numpy(spark, emb):
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")))
    cands = emb.select(F.col("vec_id").alias("c_id"),
                       F.col("embedding").alias("c_vec"))
    got = {(r["q_id"], r["rank"]): r["c_id"]
           for r in SIM.exact_l2_topk(queries, cands, k=3).collect()}
    rows = emb.orderBy("vec_id").collect()
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    ids = [r["vec_id"] for r in rows]
    for qi in range(5):
        d = np.round(((X - X[qi]) ** 2).sum(axis=1), 6)
        order = sorted(range(len(ids)), key=lambda j: (d[j], ids[j]))
        for rank, j in enumerate(order[:3], start=1):
            assert got[(qi, rank)] == ids[j], (qi, rank)


def test_recall_estimate_bounds_and_probe_monotonicity(spark, emb):
    """The estimate grades the SERVED pipeline (ADC pre-rank + exact
    rerank tier): with every list probed the search is exhaustive and
    the rerank makes the top-k exact — recall 1.0; recall must never
    DROP as n_probe grows, and the arithmetic must be consistent.
    rerank=0 grades raw ADC, which can only be <= the served
    number."""
    cands = emb.select(F.col("vec_id").alias("c_id"),
                       F.col("embedding").alias("c_vec"))
    centers, books, coded = SIM.ivfpq_build(cands, n_clusters=8, m=8,
                                            k=16)
    queries = (emb.filter(F.col("vec_id") < 8)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")))
    reps = {p: SIM.ann_recall_estimate(centers, books, coded, queries,
                                       cands, k=5, n_probe=p)
            for p in (1, 8)}
    for p, r in reps.items():
        assert r["n_queries"] == 8 and r["n_probe"] == p
        assert r["rerank"] == 20                 # default 4k
        assert r["pairs_exact"] == 40            # 8 queries x k=5
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert r["recall_at_k"] == round(
            r["pairs_hit"] / r["pairs_exact"], 4)
    assert reps[8]["recall_at_k"] >= reps[1]["recall_at_k"]
    # raw ADC (rerank=0) can only be <= the served pipeline's number
    raw = SIM.ann_recall_estimate(centers, books, coded, queries,
                                  cands, k=5, n_probe=8, rerank=0)
    assert raw["rerank"] == 0
    assert raw["recall_at_k"] <= reps[8]["recall_at_k"]
    # exactness pin: every list probed AND a rerank pool covering the
    # whole corpus makes the search exhaustive-exact -> recall 1.0
    full = SIM.ann_recall_estimate(centers, books, coded, queries,
                                   cands, k=5, n_probe=8,
                                   rerank=cands.count())
    assert full["recall_at_k"] == 1.0


def test_nl_ann_recall_lifecycle(spark, tmp_path):
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    assert parse_dataops_query(
        "estimate the recall of the ann index at /idx, top 5, "
        "probing 4 lists, sampling 16 queries") \
        == {"target": "ann_recall", "k": 5, "n_probe": 4,
            "n_queries": 16, "index_path": "/idx"}
    # defaults: n_probe None = 'resolve from the store's tuned _meta
    # sidecar, else 2' (the handler decides; an explicit 'probing N
    # lists' pins it in the plan)
    p = parse_dataops_query("measure the ann index recall")
    assert p["target"] == "ann_recall" and p["k"] == 10 \
        and p["n_probe"] is None and p["n_queries"] == 32
    # the append target must not shadow it
    assert parse_dataops_query(
        "add the new vectors to the index at /idx")["target"] \
        == "ann_index_append"

    pipe = Pipeline(spark, FixtureFetcher(spark, SF))
    idx = str(tmp_path / "idx")
    res = pipe.run_dataops(
        "build an ann index over the embeddings, 8 lists", SF, idx)
    assert res["status"] == "complete"
    out = str(tmp_path / "out")
    res2 = pipe.run_dataops(
        f"estimate the recall of the ann index at {idx}, top 5, "
        f"probing 8 lists, sampling 16 queries", SF, out)
    assert res2["status"] == "complete"
    rep = res2["reports"]
    assert rep["n_queries"] == 16 and rep["pairs_exact"] == 80
    assert 0.0 < rep["recall_at_k"] <= 1.0
    assert rep["rerank"] == 20                   # served shape: 4k
    assert spark.read.parquet(out).count() == rep["rows_written"]
    # rejections: no path / not an index store
    r1 = pipe.run_dataops("estimate the recall of the ann index",
                          SF, str(tmp_path / "o1"))
    assert r1["status"] == "rejected" and "index path" in r1["reason"]
    r2 = pipe.run_dataops(
        f"estimate the recall of the ann index at {tmp_path}/nope",
        SF, str(tmp_path / "o2"))
    assert r2["status"] == "rejected" \
        and "no loadable index" in r2["reason"]


def test_nprobe_tuner_curve_and_stop(spark, emb):
    """The tuner doubles n_probe sharing ONE exact scan, stops at the
    first setting meeting the target, and reports honestly when even
    exhaustive probing cannot reach it."""
    cands = emb.select(F.col("vec_id").alias("c_id"),
                       F.col("embedding").alias("c_vec"))
    centers, books, coded = SIM.ivfpq_build(cands, n_clusters=8, m=8,
                                            k=16)
    queries = (emb.filter(F.col("vec_id") < 8)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")))
    # corpus-wide rerank -> exhaustive probing is exact, so a 1.0
    # target is reachable and the tuner must stop AT it
    rep = SIM.ann_nprobe_tune(centers, books, coded, queries, cands,
                              k=5, target_recall=1.0,
                              rerank=cands.count())
    assert rep["target_met"] and rep["achieved_recall"] == 1.0
    probes = [c["n_probe"] for c in rep["curve"]]
    assert probes == sorted(set(probes))          # strictly doubling
    assert rep["chosen_n_probe"] == probes[-1] <= 8
    recalls = [c["recall"] for c in rep["curve"]]
    assert all(b >= a - 1e-9 for a, b in zip(recalls, recalls[1:]))
    # tight default rerank: ADC caps recall below 1.0 -> honest miss
    miss = SIM.ann_nprobe_tune(centers, books, coded, queries, cands,
                               k=5, target_recall=1.0, rerank=0)
    assert not miss["target_met"]
    assert miss["chosen_n_probe"] == 8            # exhaustive setting
    assert miss["achieved_recall"] < 1.0


def test_nl_ann_tune_lifecycle(spark, tmp_path):
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    assert parse_dataops_query(
        "tune the ann index at /idx for recall 0.8, top 5, "
        "sampling 16 queries") \
        == {"target": "ann_tune", "k": 5, "target_recall": 0.8,
            "n_queries": 16, "index_path": "/idx"}
    p = parse_dataops_query("tune the vector index for recall 0.95")
    assert p["target"] == "ann_tune" and p["target_recall"] == 0.95
    # the recall-ESTIMATE face still routes when no tune verb appears
    assert parse_dataops_query(
        "estimate the recall of the ann index at /idx")["target"] \
        == "ann_recall"

    pipe = Pipeline(spark, FixtureFetcher(spark, SF))
    idx = str(tmp_path / "idx")
    assert pipe.run_dataops(
        "build an ann index over the embeddings, 8 lists",
        SF, idx)["status"] == "complete"
    out = str(tmp_path / "curve")
    res = pipe.run_dataops(
        f"tune the ann index at {idx} for recall 0.5, top 5, "
        f"sampling 16 queries", SF, out)
    assert res["status"] == "complete"
    rep = res["reports"]
    assert rep["target_recall"] == 0.5
    assert rep["curve"][-1]["recall"] == rep["achieved_recall"]
    back = {r["n_probe"]: r["recall"]
            for r in spark.read.parquet(out).collect()}
    assert back == {c["n_probe"]: c["recall"] for c in rep["curve"]}
    r1 = pipe.run_dataops("tune the ann index for recall 0.9", SF,
                          str(tmp_path / "o1"))
    assert r1["status"] == "rejected" and "index path" in r1["reason"]

    # the tuned n_probe persists into the store's _meta sidecar and a
    # later recall run (no explicit 'probing N') defaults to it —
    # the tuner's loop stays closed across runs
    assert rep["meta_saved"]
    meta = SIM.load_index_tuning(spark, idx)
    assert meta["tuned_n_probe"] == rep["chosen_n_probe"]
    assert meta["target_recall"] == 0.5
    assert meta["target_met"] == rep["target_met"]
    res_t = pipe.run_dataops(
        f"estimate the recall of the ann index at {idx}, top 5, "
        f"sampling 16 queries", SF, str(tmp_path / "rt"))
    assert res_t["status"] == "complete"
    assert res_t["reports"]["n_probe"] == rep["chosen_n_probe"]
    assert res_t["reports"]["n_probe_source"] == "tuned"
    # an explicit 'probing N lists' always wins over the sidecar
    res_q = pipe.run_dataops(
        f"estimate the recall of the ann index at {idx}, top 5, "
        f"probing 8 lists, sampling 16 queries", SF,
        str(tmp_path / "rq"))
    assert res_q["reports"]["n_probe"] == 8
    assert res_q["reports"]["n_probe_source"] == "query"


def test_nl_ann_search_from_store(spark, tmp_path):
    """'find the k nearest neighbors ... using the ann index at
    /path' (r13): the serve face — searches the PERSISTED store
    instead of rebuilding, defaults n_probe to the tuned _meta
    sidecar once a tune run has landed one, and reports ADC ranking
    (codes-only store, no exact tier)."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    p = parse_dataops_query(
        "find the 5 nearest neighbors for each document using the "
        "ann index at /idx")
    assert p == {"target": "ann_search", "k": 5, "opq": False,
                 "index_path": "/idx", "n_probe": None}
    assert parse_dataops_query(
        "find the 5 nearest neighbors for each document using the "
        "ann index at /idx, probing 4 lists")["n_probe"] == 4

    pipe = Pipeline(spark, FixtureFetcher(spark, SF))
    idx = str(tmp_path / "idx")
    assert pipe.run_dataops(
        "build an ann index over the embeddings, 8 lists",
        SF, idx)["status"] == "complete"
    n = spark.read.parquet(SF + "/embeddings.parquet").count()
    # untuned store: static default, and the report says so
    out1 = str(tmp_path / "s1")
    r1 = pipe.run_dataops(
        f"find the 5 nearest neighbors for each document using the "
        f"ann index at {idx}", SF, out1)
    assert r1["status"] == "complete"
    assert r1["reports"]["n_probe_source"] == "default"
    assert r1["reports"]["n_probe"] == 2
    assert r1["reports"]["ranking"] == "adc"
    assert r1["reports"]["rows_written"] == 5 * n
    back = spark.read.parquet(out1)
    assert back.filter("q_id = c_id").count() == 0    # no self matches
    # after a tune run, search defaults to the tuned n_probe
    rt = pipe.run_dataops(
        f"tune the ann index at {idx} for recall 0.5, top 5, "
        f"sampling 16 queries", SF, str(tmp_path / "curve"))
    assert rt["status"] == "complete"
    r2 = pipe.run_dataops(
        f"find the 5 nearest neighbors for each document using the "
        f"ann index at {idx}", SF, str(tmp_path / "s2"))
    assert r2["reports"]["n_probe_source"] == "tuned"
    assert r2["reports"]["n_probe"] == rt["reports"]["chosen_n_probe"]
    # an explicit 'probing N lists' beats the sidecar
    r3 = pipe.run_dataops(
        f"find the 5 nearest neighbors for each document using the "
        f"ann index at {idx}, probing 8 lists", SF,
        str(tmp_path / "s4"))
    assert r3["reports"]["n_probe"] == 8
    assert r3["reports"]["n_probe_source"] == "query"
    # unreadable store rejects actionably
    rb = pipe.run_dataops(
        f"find the 5 nearest neighbors for each document using the "
        f"ann index at {tmp_path}/nope", SF, str(tmp_path / "s3"))
    assert rb["status"] == "rejected" \
        and "no loadable index" in rb["reason"]


def test_recall_default_on_untuned_store(spark, tmp_path):
    """A store that has never been tuned has no _meta sidecar: the
    recall run falls back to the static default and SAYS so."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
    )

    pipe = Pipeline(spark, FixtureFetcher(spark, SF))
    idx = str(tmp_path / "idx")
    assert pipe.run_dataops(
        "build an ann index over the embeddings, 8 lists",
        SF, idx)["status"] == "complete"
    assert SIM.load_index_tuning(spark, idx) is None
    res = pipe.run_dataops(
        f"estimate the recall of the ann index at {idx}, top 5, "
        f"sampling 16 queries", SF, str(tmp_path / "out"))
    assert res["status"] == "complete"
    assert res["reports"]["n_probe"] == 2
    assert res["reports"]["n_probe_source"] == "default"
