"""Schema-matching union engine (reference ``validator/union.py``).

Heterogeneous DataFrames are folded into groups by column-name
similarity: a hybrid score per name pair (U1), a best-match mapping with
a minimum score (U2), a harmonic-mean coverage gate (U3), rename +
null-padded vertical concat (U4), and a greedy sequential grouping loop
(U5). ``version_split`` (U6) is the inverse of join suffixing.

Design split vs the reference:
- All NAME-level work (scoring, mapping, coverage) is metadata-scale —
  tens of strings — and runs driver-side in plain Python, exactly like
  the reference (``union.py:70-167``). No Spark job is launched until
  the union itself executes.
- The DATA-level work (rename, pad, concat, dedup) is lazy Spark:
  ``unionByName(allowMissingColumns=True)`` + ``dropDuplicates``. At
  100 TB a union is a zero-shuffle narrow op; the only shuffle is the
  final dedup, which hashes on all columns and is unavoidable for
  exact-duplicate semantics.
- The reference's semantic-name component is an XGBoost head over
  FinBERT embeddings (``union.py:82-104``) with a 0.5 fallback when the
  model is absent; our default scorer is that same neutral 0.5 (so the
  hybrid score is 0.85·string_ratio + 0.075), with a pluggable
  ``semantic_scorer`` hook for any embedding model.
"""

from __future__ import annotations

from difflib import SequenceMatcher
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.config import EngineConfig

SemanticScorer = Callable[[str, str], float]


def name_similarity(a: str, b: str) -> float:
    """SequenceMatcher ratio on normalized names (``union.py:71-82``)."""
    return SequenceMatcher(None, a.lower().strip(), b.lower().strip()).ratio()


def trigram_scorer(a: str, b: str) -> float:
    """Deterministic semantic-scorer implementation: Jaccard over
    padded character trigrams — a dependency-free stand-in for the
    reference's FinBERT+XGBoost head (``union.py:82-104``). Plug any
    embedding model in through the same SemanticScorer signature."""
    def grams(s: str) -> set[str]:
        s = s.lower().strip()
        if not s:
            return set()
        s = f"  {s} "
        return {s[i:i + 3] for i in range(len(s) - 2)}
    ga, gb = grams(a), grams(b)
    return len(ga & gb) / len(ga | gb) if ga and gb else 0.0


def hybrid_score(a: str, b: str, cfg: EngineConfig,
                 semantic_scorer: Optional[SemanticScorer] = None) -> float:
    """0.85·string + 0.15·semantic (``union.py:86-112``); semantic
    defaults to the reference's no-model fallback probability 0.5."""
    sem = semantic_scorer(a, b) if semantic_scorer is not None else 0.5
    return cfg.union_name_weight * name_similarity(a, b) + cfg.union_model_weight * sem


def find_column_mapping(cols_a: list[str], cols_b: list[str], cfg: EngineConfig,
                        semantic_scorer: Optional[SemanticScorer] = None,
                        ) -> tuple[dict[str, str], float]:
    """For each column of B, the best column of A with score >= threshold.
    Returns ({col_b: col_a}, mean matched score) (``union.py:115-148``).

    The mapping is made INJECTIVE: when several B columns tie to the same
    A column (e.g. 'price' and 'prices'), only the best-scoring B column
    keeps the mapping — pandas tolerates the duplicate labels a
    many-to-one rename produces, but Spark's rename would yield ambiguous
    column references, so the weaker candidates stay unmapped instead."""
    best_for_b: dict[str, tuple[str, float]] = {}
    for col_b in cols_b:
        best, best_score = None, 0.0
        for col_a in cols_a:
            s = hybrid_score(col_a, col_b, cfg, semantic_scorer)
            if s > best_score and s >= cfg.union_threshold:
                best, best_score = col_a, s
        if best is not None:
            best_for_b[col_b] = (best, best_score)
    # injective resolution: one winning col_b per target col_a
    winner: dict[str, tuple[str, float]] = {}
    for col_b, (col_a, score) in best_for_b.items():
        if col_a not in winner or score > winner[col_a][1]:
            winner[col_a] = (col_b, score)
    mapping = {col_b: col_a for col_a, (col_b, _) in winner.items()}
    scores = [s for _, (_, s) in winner.items()]
    return mapping, (sum(scores) / len(scores) if scores else 0.0)


def coverage(mapping: dict[str, str], cols_a: list[str], cols_b: list[str]) -> float:
    """Harmonic mean of the two match ratios (``union.py:150-167``)."""
    if not mapping or not cols_a or not cols_b:
        return 0.0
    ca = len(mapping) / len(cols_a)
    cb = len(mapping) / len(cols_b)
    return 2 * ca * cb / (ca + cb) if ca + cb else 0.0


def check_compatibility(df1: DataFrame, df2: DataFrame, cfg: EngineConfig,
                        semantic_scorer: Optional[SemanticScorer] = None,
                        ) -> tuple[bool, float, dict[str, str]]:
    mapping, _ = find_column_mapping(df1.columns, df2.columns, cfg, semantic_scorer)
    cov = coverage(mapping, df1.columns, df2.columns)
    return cov >= cfg.union_compatibility_threshold, cov, mapping


def execute_union(df1: DataFrame, df2: DataFrame,
                  mapping: dict[str, str]) -> DataFrame:
    """Rename df2 per mapping, pad missing columns with null on both
    sides, vertical concat with df1's column order first
    (``union.py:219-264``). Narrow op — no shuffle.

    Renames that would collide with an existing (unrenamed) df2 column
    are skipped — the source column then unions as its own padded
    column rather than producing an ambiguous reference."""
    renamed_away = set(mapping)
    safe = {src: dst for src, dst in mapping.items()
            if src == dst or dst not in set(df2.columns) - renamed_away}
    df2 = df2.withColumnsRenamed(safe)
    out_cols = list(df1.columns) + [c for c in df2.columns if c not in df1.columns]
    a = df1.select(*[F.col(c) if c in df1.columns else F.lit(None).alias(c)
                     for c in out_cols])
    b = df2.select(*[F.col(c) if c in df2.columns else F.lit(None).alias(c)
                     for c in out_cols])
    return a.unionByName(b, allowMissingColumns=False)


def sequential_union(dfs: list[DataFrame], cfg: Optional[EngineConfig] = None,
                     semantic_scorer: Optional[SemanticScorer] = None,
                     dedup: bool = True,
                     ) -> tuple[list[DataFrame], list[dict]]:
    """Greedy grouping (``union.py:266-367``): seed a group with the
    first remaining frame, fold in every compatible frame, repeat;
    exact-dedup each group at the end. The loop is driver-side over
    <= max_dataframes frames; each accepted fold is a lazy narrow op, so
    the whole stage stays one logical plan per output group."""
    cfg = cfg or EngineConfig()
    if len(dfs) > cfg.max_dataframes:
        raise ValueError(f"too many DataFrames: {len(dfs)} > {cfg.max_dataframes}")
    if len(dfs) <= 1:
        return list(dfs), []

    operations: list[dict] = []
    remaining = list(dfs)
    groups: list[DataFrame] = []
    while remaining:
        current = remaining.pop(0)
        gname = f"Group{len(groups)}"
        i = 0
        while i < len(remaining):
            ok, cov, mapping = check_compatibility(current, remaining[i], cfg,
                                                   semantic_scorer)
            if ok:
                current = execute_union(current, remaining.pop(i), mapping)
                operations.append({"operation": "union", "group": gname,
                                   "score": cov, "mapping": mapping})
            else:
                i += 1
        groups.append(current)

    if dedup:
        groups = [g.dropDuplicates() for g in groups]
    return groups, operations


def version_split(df: DataFrame, suffix_x: str = "_x", suffix_y: str = "_y",
                  ) -> list[DataFrame]:
    """Inverse of join suffixing (``validator/validator.py:107-197``):
    any frame carrying paired ``_x``/``_y`` columns splits into two —
    one keeping the ``_x`` version renamed to the base name, one the
    ``_y`` version. Frames without pairs pass through unchanged."""
    bases = sorted({c[: -len(suffix_x)] for c in df.columns if c.endswith(suffix_x)}
                   & {c[: -len(suffix_y)] for c in df.columns if c.endswith(suffix_y)})
    if not bases:
        return [df]
    shared = [c for c in df.columns
              if not c.endswith(suffix_x) and not c.endswith(suffix_y)]
    out = []
    for sfx in (suffix_x, suffix_y):
        cols = [F.col(c) for c in shared] + \
               [F.col(b + sfx).alias(b) for b in bases]
        out.append(df.select(*cols))
    return out
