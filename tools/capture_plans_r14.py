"""Capture .explain("formatted") plans for OPTIMIZATION_r14 evidence
into plans/r14/.

- greedy_tail_pair_eval_after.txt: VERDICT r13 item 6 — the r13 persist
  of integrate()'s unioned group frames is only visible in the
  INTERMEDIATE pair-evaluation actions (the final collected-greedy
  frame consumes a driver RDD), so capture the stage-1 candidate
  pipeline of the first pair: it must show InMemoryTableScan /
  InMemoryRelation over the persisted groups.
- <query>_{before,after}.txt for queries touched this round, driven by
  argv: ``python tools/capture_plans_r14.py <query> <suffix>``.

Not part of the bench contract — an evidence tool.
"""
from __future__ import annotations

import io
import os
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r14")


def _dump(df, path: str) -> None:
    buf = io.StringIO()
    stdout = sys.stdout
    sys.stdout = buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = stdout
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, path), "w") as fh:
        fh.write(buf.getvalue())
    print(f"wrote plans/r14/{path} ({len(buf.getvalue())} chars)")


def capture_pair_eval(spark) -> None:
    """Rebuild integrate()'s setup for the greedy_tail fixture up to the
    first stage-1 pair evaluation and dump the CANDIDATE pipeline's
    plan — the frame whose eager actions r13's persist was added for."""
    from pyspark.sql import functions as F

    from dynamic_etl_pipeline_thesis_ii_spark.config import EngineConfig
    from dynamic_etl_pipeline_thesis_ii_spark.operators import (
        integration as I,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.operators import (
        similarity_join as SJ,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.operators import (
        union_engine as U,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.queries import (
        integration_suite as IS,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import Catalog

    cfg = IS.CFG
    a, b = IS._union_fixture(spark, SF_DIR)
    orders = (Catalog(spark, SF_DIR).orders
              .filter(F.col("o_orderkey") < 200)
              .select("o_orderkey", "o_custkey", "o_totalprice"))
    dfs = [a.filter(F.col("c_custkey") < 200),
           b.filter(F.col("custkey") < 500200), orders]
    groups, _ops = U.sequential_union(dfs, cfg)
    for g in groups:
        I._SHARED_CACHES.append(g.persist())
    # first stage-1 pair: the similarity path's candidate pipeline
    gi, gj = groups[0], groups[1]
    ai = I.with_row_id(gi, "__ida")
    bj = I.with_row_id(gj, "__idb")
    al, bl, cols = SJ.align_numeric(ai, bj, keep1=["__ida"],
                                    keep2=["__idb"])
    pairs = SJ.candidate_pairs(al.withColumnRenamed("__ida", "id_a"),
                               bl.withColumnRenamed("__idb", "id_b"), cols)
    cands = SJ.score_pairs(SJ.pair_features(pairs, cols, cfg), cols, cfg) \
        .filter(F.col("prob") >= cfg.join_row_threshold)
    _dump(cands, "greedy_tail_pair_eval_after.txt")
    I.release_shared_caches()


def main() -> None:
    from dynamic_etl_pipeline_thesis_ii_spark.queries import all_queries
    from dynamic_etl_pipeline_thesis_ii_spark.session import get_spark

    spark = get_spark(app_name="capture_plans_r14")
    spark.sparkContext.setLogLevel("ERROR")
    args = sys.argv[1:]
    if not args or args[0] == "pair_eval":
        capture_pair_eval(spark)
        args = args[1:]
    qs = all_queries()
    from dynamic_etl_pipeline_thesis_ii_spark.queries.integration_suite import (
        q_greedy_tail,
        q_pipeline_e2e,
    )
    qs.setdefault("pipeline_e2e", q_pipeline_e2e)
    qs.setdefault("greedy_tail", q_greedy_tail)
    for i in range(0, len(args), 2):
        name, suffix = args[i], args[i + 1]
        _dump(qs[name](spark, SF_DIR), f"{name}_{suffix}.txt")


if __name__ == "__main__":
    main()
