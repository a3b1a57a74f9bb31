"""Interleaved A/B of AQE partition-coalescing settings (guide §2.2):
parallelismFirst=true (Spark default: coalesce only down to
defaultParallelism, i.e. 32 on local[32]) vs parallelismFirst=false
(Spark's documented recommendation: respect advisoryPartitionSizeInBytes,
so post-shuffle partition count derives from DATA SIZE, not core count).

Runs each headline query alternating A/B/A/B within one session —
the confs are runtime-settable so both variants share JIT/caches.
Usage: python tools/ab_aqe.py [query ...]
"""
from __future__ import annotations

import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))

QUERIES = sys.argv[1:] or [
    "sample_deterministic", "dedup_neardup_pairs", "corpus_curation",
    "text_corpus_stats", "retrieval_hybrid", "simjoin_matches_topk",
    "ann_topk", "feat_ema_family", "rank_orders", "clean_pipeline",
]


def main():
    from dynamic_etl_pipeline_thesis_ii_spark.queries import all_queries
    from dynamic_etl_pipeline_thesis_ii_spark.queries.dataops_suite import (
        release_shared_caches,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.session import get_spark

    spark = get_spark(app_name="ab_aqe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    from dynamic_etl_pipeline_thesis_ii_spark.queries.integration_suite import (
        q_greedy_tail,
        q_pipeline_e2e,
    )
    qs.setdefault("pipeline_e2e", q_pipeline_e2e)
    qs.setdefault("greedy_tail", q_greedy_tail)

    region = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    region.count()
    region.groupBy("r_regionkey").applyInPandas(
        lambda pdf: pdf, schema=region.schema).count()

    key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    for name in QUERIES:
        if name not in qs:
            print(f"{name}: not found", flush=True)
            continue
        res = {"A": [], "B": []}
        for _ in range(ROUNDS):
            for variant, val in (("A", "true"), ("B", "false")):
                spark.conf.set(key, val)
                t0 = time.perf_counter()
                qs[name](spark, SF_DIR).count()
                res[variant].append(time.perf_counter() - t0)
                release_shared_caches()
        spark.conf.set(key, "true")
        a, b = min(res["A"]), min(res["B"])
        print(f"{name:25s} A(parFirst=true) {a:6.3f}  "
              f"B(false) {b:6.3f}  delta {100 * (b - a) / a:+6.1f}%  "
              f"A={[round(t, 2) for t in res['A']]} "
              f"B={[round(t, 2) for t in res['B']]}", flush=True)


if __name__ == "__main__":
    main()
