"""Config-driven cleaning engine (reference ``transform/data_cleaning.py``).

Same configuration contract as the reference's ``cleaning_config.json``
(regex column rules, first-match-wins with catch-all, global defaults,
relationship validations) and the same operator set — SURVEY.md §2.2/§2.8:

- dtype conversion per rule (string/float/int/datetime/auto) with
  lenient coercion (invalid → null, like ``pd.to_numeric(errors=coerce)``),
- null-ratio column pruning (ratio > threshold and deletion allowed),
- imputation: normal_distribution (seeded ``randn`` — the reference is
  unseeded; we choose reproducibility), constant, unix_epoch, none,
- value-domain row validations: positive / non_negative / no_future_dates,
- relationship validations: high/low OHLC check (drop rows), vwap
  bounds (set null),
- int rounding to long, exact dedup, stable (ticker, ts) sort.

Scale notes vs the reference's sequential per-column pass: all column
statistics (null counts, mean, std) come from ONE aggregate over the
input — not one pass per column — and all row validations collapse into
one filter. This means stats are computed on the pre-validation data
(the reference interleaves drops between columns); for well-formed
configs the difference is nil and the engine stays two-pass (one stats
action + one lazy transform) regardless of column count.
"""

from __future__ import annotations

import json
import re
import zlib
from typing import Any, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import SQL_HASH32, hash32

_TWO_PI = 6.283185307179586  # double(2*pi), written identically in SQL


def deterministic_normal(key: Column, tag: str, seed: int) -> Column:
    """Standard-normal deviate from a *hash*, not an RNG: Box–Muller over
    two uniforms derived from md5 of (row key, column tag, seed). No RNG
    state, no partition sensitivity — the same row draws the same value
    on any engine, so imputed values are exactly oracle-checkable
    (:func:`SQL_NORMAL` is the DuckDB twin). The md5 primitive is the
    one already shared with the sampling/dedup oracles."""
    def u(salt: str) -> Column:
        h = hash32(F.concat(key.cast("string"),
                            F.lit(f"|{tag}|{seed}|{salt}")))
        # +0.5 keeps u strictly inside (0, 1) — ln(0) is the only hazard
        return (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    return (F.sqrt(F.lit(-2.0) * F.log(u("u1")))
            * F.cos(F.lit(_TWO_PI) * u("u2")))


def SQL_NORMAL(key: str, tag: str, seed: int) -> str:
    """DuckDB twin of :func:`deterministic_normal` (same hash, same
    Box–Muller arithmetic, same literal 2*pi)."""
    def u(salt: str) -> str:
        h = SQL_HASH32.format(
            x=f"({key})::VARCHAR || '|{tag}|{seed}|{salt}'")
        return f"(({h})::DOUBLE + 0.5) / 4294967296.0"
    return (f"(sqrt(-2.0 * ln({u('u1')})) * "
            f"cos({_TWO_PI!r} * {u('u2')}))")

DEFAULT_CONFIG: dict[str, Any] = {
    "version": 1,
    "global_settings": {
        "default_null_threshold": 0.5,
        "default_allow_column_deletion": True,
        "default_imputation_strategy": "auto",
        "remove_duplicates": False,
    },
    "column_rules": [
        {"pattern": "^ticker$", "dtype": "string", "allow_column_deletion": False,
         "imputation_strategy": "constant", "imputation_value": "UNKNOWN"},
        {"pattern": "^(ts|timestamp)$", "dtype": "datetime", "allow_column_deletion": False,
         "imputation_strategy": "unix_epoch", "validations": ["no_future_dates"]},
        {"pattern": "^(open|high|low|close)$", "dtype": "float",
         "validations": ["positive"], "imputation_strategy": "normal_distribution"},
        {"pattern": "^volume$", "dtype": "int", "validations": ["non_negative"],
         "imputation_strategy": "normal_distribution"},
        {"pattern": "^vwap$", "dtype": "float", "validations": [],
         "imputation_strategy": "normal_distribution"},
        {"pattern": "^transactions$", "dtype": "int", "validations": ["non_negative"],
         "imputation_strategy": "normal_distribution"},
        {"pattern": "^(balance_sheet|cash_flow|income_statement|earnings)_.*",
         "dtype": "auto", "imputation_strategy": "auto", "validations": []},
        {"pattern": ".*", "dtype": "auto", "imputation_strategy": "auto",
         "allow_column_deletion": True, "validations": []},
    ],
    "relationship_validations": [
        {"name": "stock_high_low_check", "required_columns": ["high", "low", "open", "close"],
         "check_type": "high_low_relationship", "action_on_failure": "drop_rows"},
        {"name": "vwap_bounds_check", "required_columns": ["vwap", "low", "high"],
         "check_type": "vwap_in_range", "action_on_failure": "set_null"},
    ],
}


def load_cleaning_config(path: str | None = None) -> dict:
    if path is None:
        return json.loads(json.dumps(DEFAULT_CONFIG))
    with open(path) as f:
        return json.load(f)


def match_column_rule(column_name: str, config: dict) -> dict:
    """First regex rule matching the column, merged with global defaults."""
    gs = config.get("global_settings", {})
    defaults = {
        "dtype": "auto",
        "null_threshold": gs.get("default_null_threshold", 0.5),
        "allow_column_deletion": gs.get("default_allow_column_deletion", True),
        "imputation_strategy": gs.get("default_imputation_strategy", "auto"),
        "imputation_value": None,
        "validations": [],
    }
    for rule in config.get("column_rules", []):
        pattern = rule.get("pattern", "")
        if re.match(pattern, column_name):
            merged = {"pattern": pattern}
            for k, v in defaults.items():
                merged[k] = rule.get(k, v)
            return merged
    return {"pattern": "default", **defaults}


def _cast_for_rule(col: Column, dtype: str) -> Column:
    # try_cast: invalid input → null, matching pd.to_numeric(errors="coerce")
    # (plain cast raises under Spark 4 ANSI mode).
    if dtype == "string":
        return col.try_cast("string")
    if dtype in ("float", "int"):
        # int stays double until final rounding (nullable Int64 parity)
        return col.try_cast("double")
    if dtype == "datetime":
        return col.try_cast("timestamp")
    return col  # auto


def _is_numeric(spark_type: str) -> bool:
    return spark_type in ("tinyint", "smallint", "int", "bigint", "float", "double") \
        or spark_type.startswith("decimal")


def clean_dataframe(df: DataFrame, config: dict | str | None = None,
                    global_threshold_override: float | None = None,
                    seed: int = 42,
                    sort: bool | str = True,
                    impute_key_col: Optional[str] = None) -> tuple[DataFrame, dict]:
    """Clean ``df`` per config; returns (cleaned lazy DataFrame, report).

    The report carries rule matches, dtype targets, null profiles and
    the deletion/imputation decisions (row counts are left to the caller
    — counting forces an extra action).

    ``impute_key_col`` names a stable row-key column: when given,
    normal-distribution imputation draws its deviates with the
    hash-based :func:`deterministic_normal` (engine-exact, DuckDB-
    reproducible, partition-invariant) instead of seeded ``randn``
    (reproducible across runs but engine- and partitioning-specific).

    ``sort`` controls the final (ticker, ts) ordering: ``True`` (default)
    is a global ``orderBy`` for reference parity (pandas stable sort,
    ``transform/transform.py``); ``"within"`` is ``sortWithinPartitions``
    for when only per-entity order matters downstream (windows re-shuffle
    by entity anyway); ``False`` skips it entirely — pass this when the
    consumer is a partitioned sink or any re-shuffling operator, so a
    100 TB table does not pay a full Exchange+Sort for an ordering the
    next stage destroys.
    """
    if config is None or isinstance(config, str):
        config = load_cleaning_config(config)
    gs = config.get("global_settings", {})
    if global_threshold_override is not None:
        gs = {**gs, "default_null_threshold": global_threshold_override}
        config = {**config, "global_settings": gs}

    report: dict[str, Any] = {"clean": {
        "config_version": config.get("version", 1),
        "column_processing": {},
        "null_handling": {"columns_deleted": [], "columns_imputed": {}},
        "validations_applied": {},
    }}

    d = df
    if gs.get("remove_duplicates", False):
        d = d.dropDuplicates()
        report["clean"]["exact_duplicates_dropped"] = True

    rules = {c: match_column_rule(c, config) for c in d.columns}

    # 1. dtype conversion — one projection.
    d = d.withColumns({c: _cast_for_rule(F.col(c), r["dtype"]) for c, r in rules.items()
                       if r["dtype"] != "auto"})
    dtypes = dict(d.dtypes)

    # 2. ONE stats pass: null count + mean/std for numeric columns.
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in d.columns:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        if _is_numeric(dtypes[c]):
            aggs.append(F.avg(c).alias(f"mean_{c}"))
            aggs.append(F.stddev_samp(c).alias(f"std_{c}"))
    stats = d.agg(*aggs).collect()[0].asDict()
    total = stats["__n"]

    # 3. deletion / imputation decisions.
    to_delete: list[str] = []
    impute_exprs: dict[str, Column] = {}
    for c in d.columns:
        r = rules[c]
        null_count = total - stats[f"nn_{c}"]
        null_ratio = (null_count / total) if total else 0.0
        colrep = {"matched_pattern": r["pattern"], "target_dtype": r["dtype"],
                  "null_count": int(null_count), "null_ratio": float(null_ratio)}
        if null_ratio > r["null_threshold"] and r["allow_column_deletion"]:
            to_delete.append(c)
            colrep["action"] = "deleted"
            report["clean"]["null_handling"]["columns_deleted"].append(
                {"column": c, "null_ratio": null_ratio, "threshold": r["null_threshold"]})
        elif null_count > 0:
            strategy = r["imputation_strategy"]
            if strategy == "auto":
                if dtypes[c] == "timestamp":
                    strategy = "unix_epoch"
                elif _is_numeric(dtypes[c]):
                    strategy = "normal_distribution"
                else:
                    strategy = "constant"
            col = F.col(c)
            if strategy == "normal_distribution" and _is_numeric(dtypes[c]):
                mean = stats.get(f"mean_{c}")
                std = stats.get(f"std_{c}")
                if mean is not None:
                    if std in (None, 0.0):
                        fill = F.lit(mean)
                    elif impute_key_col is not None:
                        # hash-based draw keyed on (row key, column):
                        # engine-exact, so the fill is oracle-checkable;
                        # 6dp round absorbs libm ulp differences
                        fill = F.round(
                            deterministic_normal(F.col(impute_key_col), c, seed)
                            * F.lit(std) + F.lit(mean), 6)
                    else:
                        # distinct deterministic seed per column —
                        # identical seeds would draw the same z-sequence
                        # for every imputed column (perfectly correlated
                        # fills; the reference's np.random draws are
                        # independent)
                        col_seed = seed + (zlib.crc32(c.encode()) % 100003)
                        fill = F.randn(col_seed) * F.lit(std) + F.lit(mean)
                    impute_exprs[c] = F.when(col.isNull(), fill).otherwise(col)
            elif strategy == "unix_epoch" and dtypes[c] == "timestamp":
                impute_exprs[c] = F.coalesce(col, F.lit("1970-01-01 00:00:00").cast("timestamp"))
            elif strategy == "constant":
                value = r.get("imputation_value")
                impute_exprs[c] = F.coalesce(col, F.lit("Unknown" if value is None else value))
            colrep["action"] = f"imputed:{strategy}" if c in impute_exprs else "skipped"
            if c in impute_exprs:
                report["clean"]["null_handling"]["columns_imputed"][c] = {
                    "method": strategy, "null_count": int(null_count)}
        else:
            colrep["action"] = "none_needed"
        report["clean"]["column_processing"][c] = colrep

    if to_delete:
        d = d.drop(*to_delete)
    if impute_exprs:
        d = d.withColumns({c: e for c, e in impute_exprs.items() if c not in to_delete})

    # 4. value-domain validations — ONE combined filter.
    predicates: list[Column] = []
    for c in d.columns:
        for v in rules[c]["validations"]:
            if v == "positive":
                predicates.append(F.col(c) > 0)
            elif v == "non_negative":
                predicates.append(F.col(c) >= 0)
            elif v == "no_future_dates" and dict(d.dtypes).get(c) == "timestamp":
                predicates.append(F.col(c) <= F.current_timestamp())
            if v in ("positive", "non_negative", "no_future_dates"):
                report["clean"]["validations_applied"].setdefault(c, []).append(v)
    if predicates:
        keep = predicates[0]
        for p in predicates[1:]:
            keep = keep & p
        d = d.filter(keep)

    # 5. int rounding (nullable Int64 parity).
    int_casts = {c: F.round(F.col(c)).cast("long")
                 for c in d.columns if rules[c]["dtype"] == "int"}
    if int_casts:
        d = d.withColumns(int_casts)

    # 6. relationship validations.
    cols = set(d.columns)
    for rel in config.get("relationship_validations", []):
        if not set(rel.get("required_columns", [])) <= cols:
            continue
        check = rel.get("check_type")
        if check == "high_low_relationship":
            d = d.filter((F.col("high") >= F.greatest("open", "close"))
                         & (F.col("low") <= F.least("open", "close")))
            report["clean"]["validations_applied"]["__rel__"] = \
                report["clean"]["validations_applied"].get("__rel__", []) + [rel.get("name")]
        elif check == "vwap_in_range":
            d = d.withColumn("vwap", F.when(
                (F.col("vwap") < F.col("low")) | (F.col("vwap") > F.col("high")),
                None).otherwise(F.col("vwap")))
            report["clean"]["validations_applied"]["__rel__"] = \
                report["clean"]["validations_applied"].get("__rel__", []) + [rel.get("name")]

    # 7. stable sort on (ticker, ts) when present (see ``sort`` above).
    if sort not in (True, False, "within"):
        raise ValueError(
            f"sort must be True, False or 'within', got {sort!r}")
    sort_cols = [c for c in ("ticker", "ts") if c in d.columns]
    if sort_cols and sort:
        d = (d.sortWithinPartitions(*sort_cols) if sort == "within"
             else d.orderBy(*sort_cols))

    report["clean"]["final_columns"] = list(d.columns)
    return d, report
