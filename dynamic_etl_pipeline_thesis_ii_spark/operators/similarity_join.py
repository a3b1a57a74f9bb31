"""ML-scored similarity join (reference ``validator/join.py``).

The reference's only integration mechanism: score every (rowA, rowB)
pair of two tables with 26 statistical features
(``join.py:96-197``), keep pairs above a probability threshold, cap
matches per row, gate on retention, and materialize matched pairs with
``_x``/``_y`` suffixes. The reference computes this over the FULL cross
product (80M pairs in its logged run, ``validator/output2.txt:16-22``)
with joblib/CuPy chunking.

Spark-first design:
- **Blocking before pairing.** ``candidate_pairs`` equi-joins on a
  caller-supplied blocking key (quantile bucket of a shared numeric
  column by default) so pairs only materialize within buckets. Exact
  parity mode (``block=None``) does the cross join — only sane for
  small inputs, exactly like the reference.
- **Features as native expressions, not UDFs.** The 26 features are
  closed-form statistics over the aligned numeric columns — a LITERAL
  column list known at plan time — so each feature compiles to one
  arithmetic expression inside whole-stage codegen. No Python, no
  Arrow, no per-row interpreter: the reference's "85% of join cost is
  feature extraction" hot spot becomes JVM codegen.
- **Dialect-shared formula text.** Each feature is generated as SQL
  text in two dialects (Spark SQL / DuckDB) from one template, so the
  differential oracle runs the numerically identical formula.
- **Scoring** defaults to a deterministic calibrated logistic over the
  feature vector (the reference scores with an XGBoost booster,
  ``join.py:670-709``; plug one in via ``score_expr``).
- **Assignment**: exact greedy (prob-desc sequential scan with per-row
  caps, ``join.py:724-767``) runs driver-side over the thresholded
  candidates — small after the 0.44 cut, same shape as the reference.
  ``assign_topk`` is the scalable approximation: two-sided
  ``row_number`` windows, no driver materialization.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.config import EngineConfig

EPS = "1e-10"

# Feature order must match the reference model's expectation
# (``validator/config.py:97-116``).
FEATURE_NAMES = [
    "absdiff_mean", "absdiff_median", "absdiff_max", "absdiff_min", "absdiff_std",
    "reldiff_mean", "reldiff_median",
    "zdiff_mean", "zdiff_max",
    "pcdiff_mean", "pcdiff_sq_mean",
    "L1_raw", "L2_raw", "L1_z", "L2_z", "L1_pct", "L2_pct",
    "correlation",
    "ratio_mean", "ratio_median", "ratio_std",
    "sign_agreement", "n_features", "n_both_zero", "n_close", "n_very_close",
]


class _Gen:
    """Emits one formula text per feature in a given SQL dialect."""

    def __init__(self, dialect: str):
        assert dialect in ("spark", "duckdb")
        self.dialect = dialect

    # -- n-ary helpers over literal term lists ---------------------------
    def mean(self, terms: list[str]) -> str:
        return f"(({' + '.join(terms)}) / {len(terms)})"

    def _sum(self, terms: list[str]) -> str:
        return f"({' + '.join(terms)})"

    def std(self, terms: list[str]) -> str:
        # population std: sqrt(E[x^2] - E[x]^2); clamp negative float noise
        sq = [f"(({t}) * ({t}))" for t in terms]
        return (f"sqrt(greatest({self.mean(sq)} - "
                f"({self.mean(terms)} * {self.mean(terms)}), 0.0))")

    def median(self, terms: list[str]) -> str:
        n = len(terms)
        if self.dialect == "spark":
            arr = f"array_sort(array({', '.join(terms)}))"
            pick = lambda k: f"element_at({arr}, {k})"
        else:
            arr = f"list_sort([{', '.join(terms)}])"
            pick = lambda k: f"({arr})[{k}]"
        if n % 2 == 1:
            return pick(n // 2 + 1)
        return f"(({pick(n // 2)} + {pick(n // 2 + 1)}) / 2)"

    def greatest(self, terms: list[str]) -> str:
        return terms[0] if len(terms) == 1 else f"greatest({', '.join(terms)})"

    def least(self, terms: list[str]) -> str:
        return terms[0] if len(terms) == 1 else f"least({', '.join(terms)})"


def feature_sql(cols: Sequence[str], dialect: str,
                a_prefix: str = "a_", b_prefix: str = "b_",
                cfg: Optional[EngineConfig] = None) -> dict[str, str]:
    """The 26 pair features as formula text over columns
    ``{a_prefix}{col}`` / ``{b_prefix}{col}`` — one string per feature,
    identical math in both dialects (``join.py:96-197`` semantics:
    population std, epsilon-guarded divisions, corrcoef NaN -> 0)."""
    cfg = cfg or EngineConfig()
    g = _Gen(dialect)
    n = len(cols)
    a = [f"{a_prefix}{c}" for c in cols]
    b = [f"{b_prefix}{c}" for c in cols]

    diff = [f"({x} - {y})" for x, y in zip(a, b)]
    absd = [f"abs{d}" for d in diff]
    ratio = [f"({x} / ({y} + {EPS}))" for x, y in zip(a, b)]
    reld = [f"({d} / (abs({y}) + {EPS}))" for d, y in zip(diff, b)]
    pct = [f"({d} / ({x} + {EPS}))" for d, x in zip(diff, a)]

    mean_a, mean_b = g.mean(a), g.mean(b)
    std_a = f"({g.std(a)} + {EPS})"
    std_b = f"({g.std(b)} + {EPS})"
    z_a = [f"(({x} - {mean_a}) / {std_a})" for x in a]
    z_b = [f"(({y} - {mean_b}) / {std_b})" for y in b]
    zdiff = [f"({za} - {zb})" for za, zb in zip(z_a, z_b)]
    abs_zd = [f"abs{zd}" for zd in zdiff]

    ab = [f"({x} * {y})" for x, y in zip(a, b)]
    cov = f"({g.mean(ab)} - ({mean_a} * {mean_b}))"
    denom = f"({g.std(a)} * {g.std(b)})"
    corr = (f"(CASE WHEN {denom} = 0 OR {n} <= 1 THEN 0.0 "
            f"ELSE {cov} / {denom} END)")

    both_zero = [f"(CASE WHEN {x} = 0 AND {y} = 0 THEN 1 ELSE 0 END)"
                 for x, y in zip(a, b)]
    close = [f"(CASE WHEN {d} <= {cfg.close_tolerance} THEN 1 ELSE 0 END)"
             for d in absd]
    vclose = [f"(CASE WHEN {d} <= {cfg.very_close_tolerance} THEN 1 ELSE 0 END)"
              for d in absd]
    sign_eq = [f"(CASE WHEN sign({x}) = sign({y}) THEN 1 ELSE 0 END)"
               for x, y in zip(a, b)]
    sq = lambda ts: [f"(({t}) * ({t}))" for t in ts]

    return {
        "absdiff_mean": g.mean(absd),
        "absdiff_median": g.median(absd),
        "absdiff_max": g.greatest(absd),
        "absdiff_min": g.least(absd),
        "absdiff_std": g.std(absd),
        "reldiff_mean": g.mean(reld),
        "reldiff_median": g.median(reld),
        "zdiff_mean": g.mean(zdiff),
        "zdiff_max": g.greatest(abs_zd),
        "pcdiff_mean": g.mean(pct),
        "pcdiff_sq_mean": g.mean(sq(pct)),
        "L1_raw": g._sum(absd),
        "L2_raw": f"sqrt({g._sum(sq(diff))})",
        "L1_z": g._sum(abs_zd),
        "L2_z": f"sqrt({g._sum(sq(zdiff))})",
        "L1_pct": g._sum([f"abs{p}" for p in pct]),
        "L2_pct": f"sqrt({g._sum(sq(pct))})",
        "correlation": corr,
        "ratio_mean": g.mean(ratio),
        "ratio_median": g.median(ratio),
        "ratio_std": g.std(ratio),
        "sign_agreement": g.mean(sign_eq),
        "n_features": f"cast({n} as double)",
        "n_both_zero": f"cast({g._sum(both_zero)} as double)",
        "n_close": f"cast({g._sum(close)} as double)",
        "n_very_close": f"cast({g._sum(vclose)} as double)",
    }


def score_sql(cols: Sequence[str], cfg: Optional[EngineConfig] = None) -> str:
    """Deterministic calibrated logistic over the feature vector —
    the pluggable stand-in for the reference's XGBoost booster. High
    when per-column values are close / correlated, low otherwise:

        p = sigmoid(6·close_frac + 2·vclose_frac + corr
                    − ln(1 + absdiff_mean) − 3)
    """
    cfg = cfg or EngineConfig()
    n = len(cols)
    return (f"(1.0 / (1.0 + exp(-("
            f"6.0 * (n_close / {n}) + 2.0 * (n_very_close / {n}) "
            f"+ correlation - ln(1.0 + absdiff_mean) - 3.0))))")


# ---------------------------------------------------------------------------
# DataFrame operators
# ---------------------------------------------------------------------------

_NUMERIC_TYPES = ("tinyint", "smallint", "int", "bigint", "float", "double",
                  "decimal", "long", "short", "byte")


def numeric_columns(df: DataFrame) -> list[str]:
    return [c for c, t in df.dtypes
            if t.split("(")[0] in _NUMERIC_TYPES]


def align_numeric(df1: DataFrame, df2: DataFrame,
                  keep1: Sequence[str] = (), keep2: Sequence[str] = (),
                  ) -> tuple[DataFrame, DataFrame, list[str]]:
    """Union of numeric column sets; each side's missing columns padded
    with the scalar grand mean of its existing numeric columns
    (``join.py:47-94``). One agg action per side needing padding.
    ``keep1``/``keep2`` carry non-feature columns (ids) through."""
    n1 = [c for c in numeric_columns(df1) if c not in keep1]
    n2 = [c for c in numeric_columns(df2) if c not in keep2]
    if not n1 or not n2:
        return df1.limit(0), df2.limit(0), []
    all_cols = sorted(set(n1) | set(n2))

    def pad(df: DataFrame, have: list[str], keep: Sequence[str]) -> DataFrame:
        missing = [c for c in all_cols if c not in have]
        out = df.select(*keep, *[F.col(c).cast("double").alias(c) for c in have])
        if missing:
            means = out.select(*[F.avg(c).alias(c) for c in have]).first()
            present = [v for v in means if v is not None]
            # pandas mean().mean() skips all-null columns in the outer
            # mean — divide by the non-null count, not len(have)
            grand = (sum(present) / len(present)) if present else 0.0
            out = out.withColumns({c: F.lit(grand) for c in missing})
        return out.select(*keep, *all_cols)

    return pad(df1, n1, keep1), pad(df2, n2, keep2), all_cols


def quantile_block(df1: DataFrame, df2: DataFrame, col: str,
                   n_buckets: int = 32) -> tuple[Column, Column, list[float]]:
    """Blocking-key builder: bucket a shared numeric column by df1's
    approximate quantiles, so candidate pairs only form between rows in
    the same value region. Returns (block1, block2, cut_points). One
    approxQuantile action on df1 (sampled sketch); the bucket expression
    itself is a literal binary-search CASE — whole-stage codegen.

    Rows whose true match drifted across a bucket edge are missed —
    the standard recall/cost trade; widen with overlapping probes if
    needed. At the reference's logged shape (987k x 81 -> 80M pairs),
    32 buckets cuts candidates ~32x for near-uniform keys."""
    cuts = df1.approxQuantile(col, [i / n_buckets for i in range(1, n_buckets)],
                              0.001)
    cuts = sorted(set(cuts))
    expr = F.lit(0)
    for i, c in enumerate(cuts):
        expr = F.when(F.col(col) > F.lit(c), i + 1).otherwise(expr)
    return expr, expr, cuts


def candidate_pairs(df1: DataFrame, df2: DataFrame, cols: Sequence[str],
                    id1: str = "id_a", id2: str = "id_b",
                    block1: Optional[Column] = None,
                    block2: Optional[Column] = None) -> DataFrame:
    """(id_a, id_b, a_*, b_*) candidate pairs. With blocking columns the
    pairing is an equi-join on the block key (shuffle on key, pairs only
    within buckets); without, a full cross join — parity mode only."""
    a = df1.select(F.col(id1),
                   *[F.col(c).alias(f"a_{c}") for c in cols],
                   *([block1.alias("__blk")] if block1 is not None else []))
    b = df2.select(F.col(id2),
                   *[F.col(c).alias(f"b_{c}") for c in cols],
                   *([block2.alias("__blk")] if block2 is not None else []))
    if block1 is not None:
        # Pin the join width: the inputs are small in bytes (AQE would
        # coalesce them to a couple of partitions) but the join OUTPUT
        # explodes within buckets — feature scoring downstream needs the
        # parallelism. Explicit repartition is exempt from AQE
        # coalescing; measured 24x on a 22M-pair workload.
        width = df1.sparkSession.sparkContext.defaultParallelism
        a = a.repartition(width, F.col("__blk"))
        b = b.repartition(width, F.col("__blk"))
        return a.join(b, on="__blk").drop("__blk")
    return a.crossJoin(b)


def pair_features(pairs: DataFrame, cols: Sequence[str],
                  cfg: Optional[EngineConfig] = None,
                  round_dp: int = 6) -> DataFrame:
    """Append the 26 feature columns (native expressions, codegen).

    ``+ 0.0`` after the round normalizes IEEE ``-0.0`` to ``0.0`` so the
    bitwise driver hash matches the oracle (same discipline as
    ``queries/feature_suite.py``); the oracle template mirrors it."""
    sqls = feature_sql(cols, "spark", cfg=cfg)
    return pairs.withColumns({
        name: F.round(F.expr(sql), round_dp) + F.lit(0.0)
        for name, sql in sqls.items()
    })


def score_pairs(feats: DataFrame, cols: Sequence[str],
                cfg: Optional[EngineConfig] = None,
                score_expr: Optional[Column] = None,
                round_dp: int = 6) -> DataFrame:
    cfg = cfg or EngineConfig()
    prob = score_expr if score_expr is not None else F.expr(score_sql(cols, cfg))
    return feats.withColumn("prob", F.round(prob, round_dp) + F.lit(0.0))


def drop_nan_features(feats: DataFrame,
                      feature_names: Sequence[str] = tuple(FEATURE_NAMES),
                      ) -> DataFrame:
    """P8 (``join.py:406-409``): drop candidate pairs whose feature
    vector contains NaN/null — one filter, pushed into the scan."""
    cond = None
    for name in feature_names:
        c = F.col(name).isNotNull() & ~F.isnan(F.col(name))
        cond = c if cond is None else (cond & c)
    return feats.filter(cond)


def score_pairs_with_model(feats: DataFrame, predict_proba,
                           feature_names: Sequence[str] = tuple(FEATURE_NAMES),
                           round_dp: int = 6) -> DataFrame:
    """X4: an ML model as the pair scorer. ``predict_proba`` is any
    picklable callable mapping an (n, 26) float ndarray to (n,) match
    probabilities (XGBoost booster, sklearn classifier, hand-rolled
    logistic — the reference broadcasts an XGBoost booster,
    ``join.py:670-709``). The model travels in the UDF closure
    (cloudpickle — handles arbitrary callables; Spark ships the closure
    once per executor) and scores whole Arrow batches — one model call
    per batch, never per row."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _score_batch(*cols):
        import numpy as np
        X = np.column_stack([c.to_numpy(dtype=float) for c in cols])
        return pd.Series(np.asarray(predict_proba(X), dtype=float))

    score_batch = pandas_udf(_score_batch, "double")

    prob = score_batch(*[F.col(c) for c in feature_names])
    return feats.withColumn("prob", F.round(prob, round_dp))


def assign_topk(cands: DataFrame, max_matches: int,
                id1: str = "id_a", id2: str = "id_b") -> DataFrame:
    """Scalable limited many-to-many: keep a pair iff it ranks within
    the per-row cap on BOTH sides (prob desc, id tie-break). Two window
    shuffles, no driver state. max_matches=0 → unlimited."""
    from pyspark.sql import Window
    if max_matches == 0:
        return cands
    wa = Window.partitionBy(id1).orderBy(F.col("prob").desc(), F.col(id2))
    wb = Window.partitionBy(id2).orderBy(F.col("prob").desc(), F.col(id1))
    return (cands.withColumn("__ra", F.row_number().over(wa))
            .withColumn("__rb", F.row_number().over(wb))
            .filter((F.col("__ra") <= max_matches) & (F.col("__rb") <= max_matches))
            .drop("__ra", "__rb"))


def assign_greedy(cands: DataFrame, max_matches: int,
                  id1: str = "id_a", id2: str = "id_b") -> list[tuple]:
    """Exact reference semantics (``join.py:724-767``): sort by prob
    desc (id asc tie-break for determinism — the reference relies on
    Python sort stability), scan sequentially, accept while both rows
    are under the cap. Driver-side over the thresholded candidate set.

    The sort happens on the DRIVER after an unsorted collect: a Spark
    ``orderBy(...).collect()`` range-partitions first, and the range
    partitioner's sampling job re-executes the entire upstream
    candidate pipeline (scan -> pair join -> 26 features -> score ->
    threshold) a second time just to pick split points (r13, measured
    ~2x on this path). The candidate set is driver-sized by
    construction (it feeds a sequential Python scan either way), and
    the sort keys are total and engine-independent (prob is NaN-free
    post-threshold; ids are ints or ASCII strings on every call site),
    so the ordering is identical."""
    rows = cands.select(id1, id2, "prob").collect()
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    if max_matches == 0:
        return [(r[0], r[1], r[2]) for r in rows]
    out, c1, c2 = [], {}, {}
    for r in rows:
        i, j, p = r[0], r[1], r[2]
        if c1.get(i, 0) < max_matches and c2.get(j, 0) < max_matches:
            out.append((i, j, p))
            c1[i] = c1.get(i, 0) + 1
            c2[j] = c2.get(j, 0) + 1
    return out


def retention(n_matched: int, *group_rowcounts: int) -> float:
    """matched pairs / smallest input group (``join.py:777-830``)."""
    denom = min(group_rowcounts) if group_rowcounts else 0
    return n_matched / denom if denom else 0.0


def materialize(df1: DataFrame, df2: DataFrame, matches: DataFrame,
                id1: str, id2: str) -> DataFrame:
    """Equi-join both sides onto the match list; shared column names get
    ``_x``/``_y`` suffixes (``join.py:832-884``). With a broadcastable
    match list both joins avoid shuffling the big sides."""
    shared = set(df1.columns) & set(df2.columns)
    a = df1.select(*[F.col(c).alias(f"{c}_x" if c in shared else c)
                     for c in df1.columns])
    b = df2.select(*[F.col(c).alias(f"{c}_y" if c in shared else c)
                     for c in df2.columns])
    key1 = f"{id1}_x" if id1 in shared else id1
    key2 = f"{id2}_y" if id2 in shared else id2
    m = matches.select(F.col("id_a").alias("__ia"), F.col("id_b").alias("__ib"))
    return (m.join(a, m["__ia"] == a[key1])
            .join(b, m["__ib"] == b[key2])
            .drop("__ia", "__ib"))


def similarity_join(df1: DataFrame, df2: DataFrame,
                    id1: str, id2: str,
                    cfg: Optional[EngineConfig] = None,
                    block1: Optional[Column] = None,
                    block2: Optional[Column] = None,
                    exact_greedy: bool = True,
                    denominator: Optional[int] = None,
                    ) -> tuple[Optional[DataFrame], dict]:
    """One J1–J6 pass: align → pair → featurize → score → threshold →
    assign → retention gate → materialize. Returns (joined_df | None,
    report).

    ``denominator`` overrides the retention denominator: the reference
    fixes it GLOBALLY at ``min rows over all unioned groups``
    (``validator.py:323-325``) for every stage-1/2 pair, which the
    orchestrator passes through; standalone two-frame calls default to
    ``min(n1, n2)`` (``join.py:789``)."""
    cfg = cfg or EngineConfig()
    a, b, cols = align_numeric(df1, df2, keep1=[id1], keep2=[id2])
    if not cols:
        return None, {"status": "no_numeric_columns"}
    pairs = candidate_pairs(a.withColumnRenamed(id1, "id_a"),
                            b.withColumnRenamed(id2, "id_b"),
                            cols, block1=block1, block2=block2)
    feats = pair_features(pairs, cols, cfg)
    scored = score_pairs(feats, cols, cfg)
    cands = scored.filter(F.col("prob") >= cfg.join_row_threshold)

    if exact_greedy:
        matched = assign_greedy(cands, cfg.max_matches_per_row)
        n_matched = len(matched)
        if n_matched == 0:
            return None, {"status": "no_matches"}
        spark = df1.sparkSession
        matches = spark.createDataFrame(matched, ["id_a", "id_b", "prob"])
    else:
        matches = assign_topk(cands, cfg.max_matches_per_row)
        n_matched = matches.count()
        if n_matched == 0:
            return None, {"status": "no_matches"}
        matches = matches.select("id_a", "id_b", "prob")

    if denominator is None:
        denominator = min(df1.count(), df2.count())
    ret = retention(n_matched, denominator)
    if ret < cfg.join_retention_threshold:
        return None, {"status": "retention_below_threshold", "retention": ret}
    joined = materialize(df1, df2, matches, id1, id2)
    return joined, {"status": "joined", "retention": ret, "n_matched": n_matched}
