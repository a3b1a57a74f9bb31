"""Classic relational operators the reference lacks but a complete engine
must expose (SURVEY.md §2.3 "Notably absent" / §7.3 step 7).

The reference's only integration mechanism is an O(n·m) ML similarity
join (``validator/join.py`` in the reference); real equi/semi/anti joins,
as-of joins, range joins and per-group top-k are provided here as native
DataFrame compositions so Catalyst picks broadcast/SMJ/hash strategies
and AQE handles skew.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str | Sequence[str],
              left_time: str, right_time: str,
              right_values: Sequence[str], suffix: str = "",
              right_on: str | Sequence[str] | None = None) -> DataFrame:
    """As-of join: for each left row, attach the right row with the
    greatest ``right_time`` <= ``left_time`` within the same key group.

    Scale-first implementation: instead of an inequality join (which
    Spark plans as a broadcast-nested-loop or explodes candidates), the
    two sides are unioned with a side marker and a single window pass
    carries the most recent right-side values forward. One shuffle on
    the key, O(n log n), no pair materialization — survives 100 TB where
    a theta-join would not.

    ``right_time`` values must be unique per key (pre-aggregate the right
    side if not) so the result is deterministic.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rkeys = keys if right_on is None else ([right_on] if isinstance(right_on, str) else list(right_on))

    left_cols = left.columns
    lhs = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}") for v in right_values],
    )
    # Key columns carry real values on both sides; all other left columns
    # are null-padded on the right.
    key_map = dict(zip(keys, rkeys))
    rhs = right.select(
        *[(F.col(key_map[c]).alias(c) if c in key_map
           else F.lit(None).cast(left.schema[c].dataType).alias(c))
          for c in left_cols],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__r_{v}") for v in right_values],
    )

    merged = lhs.unionByName(rhs)
    # Right rows (__side=0) sort before left rows at the same timestamp,
    # so an exactly-equal right_time is visible to the left row (<= semantics).
    w = (Window.partitionBy(*keys).orderBy(F.col("__t").asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for v in right_values:
        merged = merged.withColumn(f"__r_{v}", F.last(f"__r_{v}", ignorenulls=True).over(w))

    out = merged.filter(F.col("__side") == 1).drop("__t", "__side")
    for v in right_values:
        out = out.withColumnRenamed(f"__r_{v}", f"{v}{suffix}")
    return out


def range_join(fact: DataFrame, bands: DataFrame, value_col: str,
               lo_col: str, hi_col: str) -> DataFrame:
    """Band/range join: match fact rows to ``[lo, hi)`` intervals.

    The band table is expected to be small (broadcast) — Spark plans a
    BroadcastNestedLoopJoin which is fine for a dimension-sized interval
    table; for huge interval tables, bucket both sides first.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(bands), cond, "inner")


def top_k_per_group(df: DataFrame, partition_cols: Sequence[str],
                    order_by: Sequence[Column], k: int,
                    rank_col: str = "rn") -> DataFrame:
    """Per-group top-k via a ranking window — map-side partial top-k is
    handled by Spark's WindowGroupLimit pushdown (rank filter pushdown),
    so this does not sort whole groups at scale."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_by)
    return (df.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= k))


def salted_join(left: DataFrame, right: DataFrame, on: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join: the (skewed) left side gets a random
    salt in [0, n_salts); the right side is replicated n_salts times
    with every salt value, and the join runs on (key, salt). A hot key's
    rows spread over n_salts tasks instead of one straggler.

    AQE's skew-join split handles most cases automatically; explicit
    salting remains necessary when a single KEY VALUE (not partition)
    dominates — AQE can split partitions, not keys, for joins that must
    co-group all rows of a key (e.g. followed by a groupBy on the key).
    """
    salted_l = left.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    salted_r = right.withColumn("__salt", salts)
    out = salted_l.join(salted_r, [on, "__salt"], how)
    return out.drop("__salt")


def salted_agg(df: DataFrame, key: str, agg_exprs: dict[str, str],
               n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial aggregate on
    (key, salt), then final aggregate on key. Only decomposable
    aggregates (sum/count/min/max) qualify — avg must be expressed as
    sum/count by the caller. Spark's hash aggregate already does
    map-side partial aggregation; explicit salting additionally splits
    the REDUCE side when one key owns most rows."""
    decomposable = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for fn in agg_exprs.values():
        if fn not in decomposable:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    salted = df.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(*[
        (F.count(F.lit(1)) if fn == "count" else decomposable[fn](c))
        .alias(f"__p_{c}") for c, fn in agg_exprs.items()])
    final = partial.groupBy(key).agg(*[
        decomposable[fn](f"__p_{c}").alias(f"{fn}_{c}")
        for c, fn in agg_exprs.items()])
    return final


def sessionize(df: DataFrame, key: str, ts_col: str,
               gap_seconds: int = 1800) -> DataFrame:
    """Batch sessionization (SURVEY §2.5 'sessionization absent;
    expose'): a session breaks after ``gap_seconds`` of inactivity per
    key. One window pass: flag gap-breaks with lag(), running-sum the
    flags into a per-key session index. Single shuffle on the key —
    no self-join, no explode; the streaming twin is
    streaming/ops.session_windows."""
    w = Window.partitionBy(key).orderBy(ts_col)
    # cast through "timestamp" first: NTZ -> BIGINT is not a valid cast,
    # while NTZ -> TIMESTAMP -> BIGINT (epoch seconds) is, and the double
    # cast is an identity for columns that are already TimestampType or
    # epoch-seconds numerics.
    secs = F.col(ts_col).cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return (df.withColumn("__new", new_session)
            .withColumn("session_id",
                        F.sum("__new").over(
                            w.rowsBetween(Window.unboundedPreceding, 0)))
            .drop("__new"))
