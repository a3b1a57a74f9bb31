"""Interleaved A/B of the single-job group_counts change (r14):
A = sequential g.count() per group (r13 behavior, monkeypatched),
B = one union-of-aggregates job (HEAD).
Usage: python tools/ab_greedy.py
"""
from __future__ import annotations

import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))


def main():
    from dynamic_etl_pipeline_thesis_ii_spark.operators import (
        integration as I,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.queries import (
        integration_suite as IS,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.queries.dataops_suite import (
        release_shared_caches,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.session import get_spark

    spark = get_spark(app_name="ab_greedy")
    spark.sparkContext.setLogLevel("ERROR")
    region = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    region.count()
    region.groupBy("r_regionkey").applyInPandas(
        lambda pdf: pdf, schema=region.schema).count()

    new_gc = I.group_counts
    old_gc = lambda groups: [g.count() for g in groups]  # noqa: E731

    for qname, fn in (("greedy_tail", IS.q_greedy_tail),
                      ("pipeline_e2e", IS.q_pipeline_e2e)):
        res = {"A": [], "B": []}
        rows = {}
        for _ in range(ROUNDS):
            for variant, gc in (("A", old_gc), ("B", new_gc)):
                I.group_counts = gc
                t0 = time.perf_counter()
                rows[variant] = fn(spark, SF_DIR).count()
                res[variant].append(time.perf_counter() - t0)
                release_shared_caches()
        I.group_counts = new_gc
        a, b = min(res["A"]), min(res["B"])
        assert rows["A"] == rows["B"], rows
        print(f"{qname:15s} A(seq counts) {a:6.3f}  B(one job) {b:6.3f}  "
              f"delta {100 * (b - a) / a:+6.1f}%  rows={rows['B']}  "
              f"A={[round(t, 2) for t in res['A']]} "
              f"B={[round(t, 2) for t in res['B']]}", flush=True)


if __name__ == "__main__":
    main()
