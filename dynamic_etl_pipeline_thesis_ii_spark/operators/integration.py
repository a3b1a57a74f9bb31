"""Two-stage integration orchestrator (reference ``validator/validator.py:199-444``).

``integrate(dfs)`` reproduces the reference's Validator.process control
flow on Spark DataFrames:

1. UNION stage: greedy schema-matched grouping
   (``union.py:266-367`` — see :mod:`union_engine`).
2. Early termination when everything folded into one group
   (``validator.py:274-310``).
3. JOIN stage 1 — best-partner: for each group i evaluate every j > i
   with the similarity join; keep the partner with the best retention;
   untouched groups pass through (``join.py:886-983``).
4. JOIN stage 2 — join-the-joined: pairwise over stage-1 outputs,
   first compatible wins, each output used at most once; skipped
   entirely when stage 1 made no joins (``join.py:985-1053``,
   ``validator.py:353-391``).
5. Version split of any ``_x``/``_y`` outputs
   (``validator.py:107-197``).

The driver-side loops iterate over <= max_dataframes groups (10), i.e.
O(100) pair evaluations of LAZY plans — each evaluation triggers the
similarity join's blocked pair scoring, which is where the data-scale
work happens (and where blocking keeps 100 TB inputs from going
quadratic). Row ids for the pair scoring are synthesized per group,
when the caller does not name an id column, as a 64-bit ``xxhash64``
content hash plus a ``row_number`` within each hash-collision group —
distributed (no single-partition window) and stable across
repartitioning.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.config import EngineConfig
from dynamic_etl_pipeline_thesis_ii_spark.operators import similarity_join as SJ
from dynamic_etl_pipeline_thesis_ii_spark.operators import union_engine as U

_ROW_ID = "__row_id"

# column names that identify rows of an entity-keyed time series
_KEY_HINTS = ("ticker", "symbol", "ts", "timestamp", "date", "id", "key")


def detect_join_keys(df1: DataFrame, df2: DataFrame) -> list[str]:
    """Shared key-like columns (SURVEY §2.3: the reference's similarity
    join solves what is really an equi-join problem — same-ticker
    same-date rows from two APIs; when both sides carry key-named
    columns, a hash/broadcast equi-join is the right physical plan)."""
    shared = set(df1.columns) & set(df2.columns)
    return sorted(c for c in shared
                  if any(h == c.lower() or c.lower().endswith("_" + h)
                         or c.lower().endswith(h) and h in ("key", "id")
                         for h in _KEY_HINTS))


def key_equijoin(df1: DataFrame, df2: DataFrame, keys: list[str]) -> DataFrame:
    """Equi-join on detected keys with _x/_y suffixing of the non-key
    shared columns — same output contract as the similarity join's
    materialization, but a native hash/broadcast join (Catalyst picks)."""
    shared = (set(df1.columns) & set(df2.columns)) - set(keys)
    a = df1.select(*keys, *[F.col(c).alias(f"{c}_x" if c in shared else c)
                            for c in df1.columns if c not in keys])
    b = df2.select(*keys, *[F.col(c).alias(f"{c}_y" if c in shared else c)
                            for c in df2.columns if c not in keys])
    return a.join(b, on=keys, how="inner")


def with_row_id(df: DataFrame, id_col: str = _ROW_ID) -> DataFrame:
    """Deterministic synthetic row id, fully distributed: a 64-bit
    content hash over all columns plus a ``row_number`` *within* the
    (tiny) hash-collision group to disambiguate duplicates. The window
    partitions by the hash, so the plan contains no single-partition
    exchange — identical ids on both evaluation passes (candidate
    scoring and materialization) without caching. (The reference uses
    positional indices of the pandas frames — positions are not stable
    in a distributed setting, so we define identity by content;
    ``validator/join.py`` relies on ``reset_index`` positions.)"""
    cols = [F.col(c) for c in sorted(df.columns)]
    h = F.xxhash64(*cols)
    w = Window.partitionBy(h).orderBy(*cols)
    return df.withColumn(
        id_col, F.format_string("%d#%d", h, F.row_number().over(w)))


def _join_pair(gi: DataFrame, gj: DataFrame, cfg: EngineConfig,
               ) -> tuple[Optional[DataFrame], dict]:
    """Join two groups: equi-join fast path on detected keys (retention-
    gated like the similarity path), else the 26-feature similarity
    join. Returns (joined | None, report)."""
    keys = detect_join_keys(gi, gj)
    if keys:
        joined = key_equijoin(gi, gj, keys)
        n_matched = joined.count()
        ret = SJ.retention(n_matched, gi.count(), gj.count())
        if ret >= cfg.join_retention_threshold:
            return joined, {"status": "joined", "method": "equi",
                            "keys": keys, "retention": ret}
        # keys exist but don't line up — fall through to similarity
    a = with_row_id(gi, "__ida")
    b = with_row_id(gj, "__idb")
    joined, rep = SJ.similarity_join(a, b, "__ida", "__idb", cfg)
    if joined is not None:
        joined = joined.drop("__ida_x", "__idb_y", "__ida", "__idb")
        rep = {**rep, "method": "similarity"}
    return joined, rep


def _best_partner_join(groups: list[DataFrame], cfg: EngineConfig,
                       reports: list[dict]) -> tuple[list[DataFrame], bool]:
    """Stage 1: each unused group i seeks its best-retention partner
    j > i (``join.py:886-983``)."""
    used = [False] * len(groups)
    out: list[DataFrame] = []
    any_joined = False
    for i in range(len(groups)):
        if used[i]:
            continue
        best_j, best_ret, best_df, best_rep = None, -1.0, None, None
        for j in range(i + 1, len(groups)):
            if used[j]:
                continue
            joined, rep = _join_pair(groups[i], groups[j], cfg)
            if joined is not None and rep["retention"] > best_ret:
                best_j, best_ret, best_df, best_rep = j, rep["retention"], joined, rep
        if best_j is not None:
            used[i] = used[best_j] = True
            out.append(best_df)
            reports.append({"operation": "join_stage1", "left": i,
                            "right": best_j, "retention": best_ret,
                            "method": best_rep.get("method")})
            any_joined = True
        else:
            used[i] = True
            out.append(groups[i])
    return out, any_joined


def _join_the_joined(frames: list[DataFrame], cfg: EngineConfig,
                     reports: list[dict]) -> list[DataFrame]:
    """Stage 2: pairwise over stage-1 outputs, first compatible wins,
    each used at most once (``join.py:985-1053``)."""
    used = [False] * len(frames)
    out: list[DataFrame] = []
    for i in range(len(frames)):
        if used[i]:
            continue
        used[i] = True
        merged = None
        for j in range(i + 1, len(frames)):
            if used[j]:
                continue
            joined, rep = _join_pair(frames[i], frames[j], cfg)
            if joined is not None:
                used[j] = True
                merged = joined
                reports.append({"operation": "join_stage2", "left": i,
                                "right": j, "retention": rep["retention"],
                                "method": rep.get("method")})
                break
        out.append(merged if merged is not None else frames[i])
    return out


def integrate(dfs: list[DataFrame], cfg: Optional[EngineConfig] = None,
              ) -> tuple[list[DataFrame], list[dict]]:
    """Full union → join(stage1) → join(stage2) → version-split flow.
    Returns (output frames, operation reports)."""
    cfg = cfg or EngineConfig()
    if not dfs:
        return [], []
    if len(dfs) > cfg.max_dataframes:
        raise ValueError(f"too many DataFrames: {len(dfs)} > {cfg.max_dataframes}")

    reports: list[dict] = []
    groups, union_ops = U.sequential_union(dfs, cfg)
    reports.extend(union_ops)

    if len(groups) == 1:
        reports.append({"operation": "early_termination",
                        "reason": "all inputs unioned into one group"})
        return groups, reports

    stage1, any_joined = _best_partner_join(groups, cfg, reports)
    if any_joined and len(stage1) > 1:
        stage2 = _join_the_joined(stage1, cfg, reports)
    else:
        if not any_joined:
            reports.append({"operation": "skip_stage2",
                            "reason": "no stage-1 join succeeded"})
        stage2 = stage1

    outputs: list[DataFrame] = []
    for frame in stage2:
        outputs.extend(U.version_split(frame))
    return outputs, reports
