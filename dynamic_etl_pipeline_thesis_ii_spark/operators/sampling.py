"""Deterministic sampling for training-data curation: hash sampling,
stratified rates, and target-mixture rebalancing.

Large-corpus pipelines need *reproducible* sampling — re-running a job
(or running it on another engine) must keep exactly the same rows, and
the decision must be makeable per-row with no RNG state, no global
sort, and no shuffle. The standard trick: hash a stable row key and
keep the row when ``hash % mod`` falls under a rate threshold. One
narrow scan at any scale; the only non-scan work is the tiny per-stratum
count aggregate the rebalancer needs (collected to the driver — the
stratum cardinality is small — and folded back in as literals, so the
filter pass stays shuffle-free).

All decisions use the md5-based :func:`~.dedup.hash32` primitive shared
with the DuckDB oracles, so every operator here is exactly
oracle-checkable (same rows, not just same counts).
"""

from __future__ import annotations

import math
from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import SQL_HASH32, hash32

DEFAULT_MOD = 1_000_000


def _bucket(key: Column, salt: str, mod: int) -> Column:
    return hash32(F.concat(key.cast("string"), F.lit(salt))) % mod


def SQL_BUCKET(x: str, salt: str, mod: int = DEFAULT_MOD) -> str:
    """DuckDB twin of :func:`_bucket` (same md5 hash, same mixing)."""
    h = SQL_HASH32.format(x=f"({x})::VARCHAR || '{salt}'")
    return f"({h} % {mod})"


def hash_sample(df: DataFrame, rate: float, key_col: str,
                salt: str = "", mod: int = DEFAULT_MOD) -> DataFrame:
    """Keep ~``rate`` of rows, decided by content hash — reproducible
    across runs, engines and partitionings; different ``salt`` values
    draw independent samples from the same corpus."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(_bucket(F.col(key_col), salt, mod)
                     < int(math.floor(rate * mod)))


def stratified_hash_sample(df: DataFrame, strata_col: str,
                           rates: Mapping[str, float], key_col: str,
                           default_rate: float = 0.0, salt: str = "",
                           mod: int = DEFAULT_MOD) -> DataFrame:
    """Per-stratum hash sampling: each stratum value gets its own keep
    rate (absent strata fall back to ``default_rate``). The rate table
    compiles to a CASE expression — still a single narrow scan."""
    thresh: Column = F.lit(int(math.floor(default_rate * mod)))
    for value, rate in sorted(rates.items()):
        thresh = F.when(F.col(strata_col) == value,
                        F.lit(int(math.floor(rate * mod)))).otherwise(thresh)
    return df.filter(_bucket(F.col(key_col), salt, mod) < thresh)


def rebalance_mix(df: DataFrame, strata_col: str,
                  target_shares: Mapping[str, float], key_col: str,
                  salt: str = "", mod: int = DEFAULT_MOD,
                  counts: Optional[Mapping[str, int]] = None) -> DataFrame:
    """Downsample strata toward a target mixture (the domain-mix step of
    corpus curation): find the largest total T with
    ``share_g * T <= n_g`` for every stratum g — ``T* = min_g(n_g /
    share_g)`` — then keep each stratum at rate ``share_g * T* / n_g``
    via the deterministic hash. Strata outside ``target_shares`` drop.

    One tiny count aggregate (or pass ``counts`` precomputed), then one
    shuffle-free filter scan. Thresholds are floored integer bucket
    bounds computed with the exact formula the SQL oracle uses, so the
    kept row set is engine-exact, not just approximately sized.

    Target strata with zero input rows are *excluded* from the ``t*``
    minimum (they can never be filled, so they don't force the whole
    output empty) — the same semantics as the SQL twin, whose
    ``counts JOIN shares`` simply drops absent strata."""
    if counts is None:
        rows = (df.filter(F.col(strata_col).isin(list(target_shares)))
                .groupBy(strata_col).count().collect())
        counts = {r[strata_col]: r["count"] for r in rows}
    t_star = min((counts[g] / share
                  for g, share in target_shares.items()
                  if share > 0 and counts.get(g)),
                 default=0.0)
    rates = {g: (share * t_star / counts[g]) if counts.get(g) else 0.0
             for g, share in target_shares.items()}
    return stratified_hash_sample(df, strata_col, rates, key_col,
                                  default_rate=0.0, salt=salt, mod=mod)
