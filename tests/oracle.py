"""Differential oracle harness: run a Spark query and its DuckDB oracle SQL
on the same parquet tables, compare row count, column names and values
(order-insensitive) — mirroring the driver's CORRECTNESS gate."""

from __future__ import annotations

import math
import os

import duckdb

from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import TABLES

ABS_TOL = 1e-6
REL_TOL = 1e-9


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def _sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return [cols[i] for i in idx], out


def _values_close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if a == "NaN" or b == "NaN":
            return a == b
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        return math.isclose(fa, fb, rel_tol=REL_TOL, abs_tol=ABS_TOL)
    return a == b


# Spark dtype (base name) -> acceptable Arrow type prefixes for the DuckDB
# side. Catches the HUGEINT class of driver hash-fails locally: DuckDB's
# integer sum() is HUGEINT (arrow decimal128(38,0)) while Spark emits BIGINT —
# values compare equal via fetchall() but the driver's value-hash differs.
_TYPE_COMPAT = {
    "tinyint": ("int", "uint"),
    "smallint": ("int", "uint"),
    "int": ("int", "uint"),
    "bigint": ("int", "uint"),
    "float": ("float", "halffloat"),
    "double": ("double",),
    "string": ("string", "large_string"),
    "date": ("date",),
    "timestamp": ("timestamp",),
    "boolean": ("bool",),
    "decimal": ("decimal",),
}


def _check_types(spark_df, con, sql: str, name: str) -> None:
    try:
        schema = con.execute(
            f"SELECT * FROM ({sql}) oracle_t LIMIT 0").arrow().schema
    except Exception:
        return  # some dialect constructs don't nest; value compare still runs
    arrow_types = {f.name: str(f.type) for f in schema}
    bad = []
    for col, dtype in spark_df.dtypes:
        base = dtype.split("(")[0]
        allowed = _TYPE_COMPAT.get(base)
        atype = arrow_types.get(col)
        if allowed is None or atype is None:
            continue  # arrays/maps/structs or column-name mismatch (checked later)
        if not atype.startswith(allowed):
            bad.append(f"{col}: spark={dtype} oracle_arrow={atype}")
    assert not bad, (
        f"[{name}] result-type mismatch (driver hash would differ): " + "; ".join(bad))


def compare(spark_df, con, sql: str, name: str = "?") -> None:
    _check_types(spark_df, con, sql, name)
    # collect() preserves null vs NaN (toPandas() would fold both to NaN)
    collected = spark_df.collect()
    s_cols = spark_df.columns
    s_rows = [tuple(row) for row in collected]

    res = con.execute(sql)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()

    assert sorted(s_cols) == sorted(o_cols), (
        f"[{name}] column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    assert len(s_rows) == len(o_rows), (
        f"[{name}] row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}")

    _, s_sorted = _sorted_rows(s_cols, s_rows)
    _, o_sorted = _sorted_rows(o_cols, o_rows)
    mismatches = 0
    first = None
    for i, (sr, orow) in enumerate(zip(s_sorted, o_sorted)):
        for sv, ov in zip(sr, orow):
            if not _values_close(sv, ov):
                mismatches += 1
                if first is None:
                    first = (i, sr, orow)
                break
    assert mismatches == 0, (
        f"[{name}] {mismatches}/{len(s_sorted)} rows differ; first at {first[0]}:\n"
        f"  spark : {first[1]}\n  oracle: {first[2]}")
