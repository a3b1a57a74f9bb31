"""DSL → Spark compiler.

Compiles a validated feature DSL (see ``dsl.py``) into native Spark
window/column expressions wherever a closed form exists, mirroring the
per-group pandas semantics of the reference's feature library
(``transform/enrichment.py:95-438``):

- rolling features guard with ``count(col) OVER frame >= min_periods``
  to reproduce pandas ``min_periods`` null behavior exactly;
- the EMA family (``ema``/``macd``/``atr``) is recursive with no Spark
  window equivalent — computed in ONE ``applyInPandas`` pass per entity
  group (single shuffle for any number of such features), numerically
  identical to pandas ``ewm(adjust=False)``;
- ``custom_*`` features execute sandboxed user Python inside the same
  pass (see ``sandbox.py``).

All features are computed over the ORIGINAL input columns (reference
concatenates new columns only at the end — features never see each
other's outputs), so native and pandas paths can run independently.

Scale notes: one projection for all native features (Catalyst collapses
the temp columns), one shuffle on the entity key shared by every window
expression, one optional applyInPandas shuffle on the same key. Entity
groups are time series per instrument — bounded state, Arrow-batched.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

from dynamic_etl_pipeline_thesis_ii_spark.functions.sandbox import run_sandboxed

_PANDAS_FEATURES = {"ema", "macd", "atr"}


def _single_output_name(name: str, params: dict, req: dict) -> str:
    # Naming parity with reference enrichment.py:519-534:
    # {name}_{on}_{window} with trailing underscores stripped.
    return req.get("as", f"{name}_{params.get('on', '')}_{params.get('window', '')}".rstrip("_"))


class _Ctx:
    """Accumulates output + temp columns for the native path."""

    def __init__(self, w: WindowSpec, wcum: WindowSpec,
                 wrows: Callable[[int], WindowSpec]):
        self.w = w
        self.wcum = wcum
        self.wrows = wrows
        self.temps: dict[str, Column] = {}
        self.outputs: dict[str, Column] = {}
        self._n = 0

    def temp(self, expr: Column) -> Column:
        """Materialize an intermediate so window fns can nest over it."""
        name = f"__ft{self._n}"
        self._n += 1
        self.temps[name] = expr
        return F.col(name)

    def rolling(self, agg: Callable[[Column], Column], col: Column, n: int,
                min_periods: int | None = None) -> Column:
        """pandas ``col.rolling(n, min_periods=mp)`` parity: aggregate over
        the trailing-n frame, null when non-null count < min_periods."""
        mp = n if min_periods is None else min_periods
        frame = self.wrows(n)
        value = agg(col).over(frame)
        if mp <= 1:
            return value
        return F.when(F.count(col).over(frame) >= mp, value)


def _nullif0(c: Column) -> Column:
    # pandas .replace(0, np.nan) divide-guard
    return F.when(c != 0, c)


def _compile_native(name: str, params: dict, req: dict, ctx: _Ctx,
                    ts_col: str) -> dict[str, Column]:
    p = params
    on = p.get("on")
    col = F.col(on) if on else None
    single = lambda expr: {_single_output_name(name, p, req): expr}

    if name == "sma":
        return single(ctx.rolling(F.avg, col, p["window"]))
    if name == "rolling_vol":
        return single(ctx.rolling(F.stddev_samp, col, p["window"]))
    if name == "rolling_max":
        return single(ctx.rolling(F.max, col, p["window"]))
    if name == "rolling_min":
        return single(ctx.rolling(F.min, col, p["window"]))
    if name == "rolling_avg":
        return single(ctx.rolling(F.avg, col, p["window"], min_periods=1))
    if name == "zscore":
        n = p["window"]
        mean = ctx.rolling(F.avg, col, n)
        std = ctx.rolling(F.stddev_samp, col, n)
        return single((col - mean) / _nullif0(std))
    if name == "bbands":
        n, k = p["window"], p["std_dev"]
        mid = ctx.temp(ctx.rolling(F.avg, col, n))
        std = ctx.temp(ctx.rolling(F.stddev_samp, col, n))
        return {
            f"{name}_bband_upper": mid + std * k,
            f"{name}_bband_middle": mid,
            f"{name}_bband_lower": mid - std * k,
        }
    if name == "rsi":
        n = p["window"]
        delta = ctx.temp(col - F.lag(col, 1).over(ctx.w))
        gain = ctx.temp(F.when(delta.isNotNull(), F.greatest(delta, F.lit(0.0))))
        loss = ctx.temp(F.when(delta.isNotNull(), F.greatest(-delta, F.lit(0.0))))
        avg_gain = ctx.rolling(F.avg, gain, n)
        avg_loss = ctx.rolling(F.avg, loss, n)
        rs = avg_gain / _nullif0(avg_loss)
        return single(F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + rs))
    if name == "stoch":
        hi, lo, cl = F.col(p["high"]), F.col(p["low"]), F.col(p["close"])
        kw, dw = p["k_window"], p["d_window"]
        low_k = ctx.rolling(F.min, lo, kw)
        high_k = ctx.rolling(F.max, hi, kw)
        k_line = ctx.temp(F.lit(100.0) * (cl - low_k) / _nullif0(high_k - low_k))
        d_line = ctx.rolling(F.avg, k_line, dw)
        return {f"{name}_stoch_k": k_line, f"{name}_stoch_d": d_line}
    if name == "willr":
        hi, lo, cl = F.col(p["high"]), F.col(p["low"]), F.col(p["close"])
        n = p["window"]
        high_n = ctx.temp(ctx.rolling(F.max, hi, n))
        low_n = ctx.rolling(F.min, lo, n)
        return {f"willr_{n}":
                F.lit(-100.0) * (high_n - cl) / _nullif0(high_n - low_n)}
    if name == "cci":
        # CCI with the per-row-SMA mean-deviation simplification (the
        # textbook deviation-from-current-window-SMA needs a nested
        # window no SQL engine expresses); contract mirrored exactly in
        # the DuckDB oracle.
        hi, lo, cl = F.col(p["high"]), F.col(p["low"]), F.col(p["close"])
        n = p["window"]
        tp = ctx.temp((hi + lo + cl) / F.lit(3.0))
        sma_tp = ctx.temp(ctx.rolling(F.avg, tp, n))
        dev = ctx.temp(F.abs(tp - sma_tp))
        md = ctx.rolling(F.avg, dev, n)
        return {f"cci_{n}":
                (tp - sma_tp) / _nullif0(F.lit(0.015) * md)}
    if name == "obv":
        cl, vol = F.col(p["close"]), F.col(p["volume"])
        signed = ctx.temp(
            vol * F.coalesce(F.signum(cl - F.lag(cl, 1).over(ctx.w)), F.lit(0.0)))
        running = F.sum(signed).over(ctx.wcum)
        return single(F.when(signed.isNotNull(), running))
    if name == "ret":
        prev = F.lag(col, p["periods"]).over(ctx.w)
        if p["method"] == "log":
            # guard both operands: prev=0 is an ANSI divide-by-zero and
            # ln of a non-positive ratio is undefined — null instead
            # (mirrored in the SQL oracle)
            return single(F.when((col > 0) & (prev > 0),
                                 F.log(col / prev)))
        return single(col / _nullif0(prev) - 1)
    if name == "lag":
        return single(F.lag(col, p["periods"]).over(ctx.w))
    if name == "diff":
        return single(col - F.lag(col, p["periods"]).over(ctx.w))
    if name in ("yoy_growth", "qoq_growth", "pct_change"):
        periods = p.get("periods", 1)
        prev = F.lag(col, periods).over(ctx.w)
        return single(col / _nullif0(prev) - 1)
    if name == "session_flags":
        ts = F.col(ts_col)
        return {
            f"{name}_dow": ((F.dayofweek(ts) + 5) % 7).cast("int"),
            f"{name}_month": F.month(ts),
            f"{name}_week": F.weekofyear(ts),
            f"{name}_hour": F.hour(ts),
            f"{name}_is_month_start": (F.dayofmonth(ts) == 1).cast("int"),
            f"{name}_is_month_end": (F.to_date(ts) == F.last_day(ts)).cast("int"),
        }
    if name == "avg_surprise":
        src = F.col("earnings_surprisePercentage")
        return single(ctx.rolling(F.avg, src, p["window"], min_periods=1))
    if name == "earnings_momentum":
        src = F.col("earnings_surprise")
        return single(ctx.rolling(F.avg, src, p["window"], min_periods=1))

    # Row-wise ratio features (reference enrichment.py:244-385); fixed
    # source columns, divide-by-zero → null, selective fillna(0).
    bs, cf, ist = "balance_sheet_", "cash_flow_", "income_statement_"
    c = F.col
    ratio_exprs = {
        "current_ratio": lambda: c(bs + "totalCurrentAssets") / _nullif0(c(bs + "totalCurrentLiabilities")),
        "quick_ratio": lambda: (c(bs + "totalCurrentAssets") - c(bs + "inventory")) / _nullif0(c(bs + "totalCurrentLiabilities")),
        "debt_to_equity": lambda: (F.coalesce(c(bs + "longTermDebt"), F.lit(0.0)) + F.coalesce(c(bs + "shortTermDebt"), F.lit(0.0))) / _nullif0(c(bs + "totalShareholderEquity")),
        "debt_to_assets": lambda: (F.coalesce(c(bs + "longTermDebt"), F.lit(0.0)) + F.coalesce(c(bs + "shortTermDebt"), F.lit(0.0))) / _nullif0(c(bs + "totalAssets")),
        "working_capital": lambda: c(bs + "totalCurrentAssets") - c(bs + "totalCurrentLiabilities"),
        "equity_ratio": lambda: c(bs + "totalShareholderEquity") / _nullif0(c(bs + "totalAssets")),
        "free_cash_flow": lambda: c(cf + "operatingCashflow") - F.coalesce(c(cf + "capitalExpenditures"), F.lit(0.0)),
        "operating_cash_margin": lambda: c(cf + "operatingCashflow") / _nullif0(c(cf + "netIncome")),
        "capex_intensity": lambda: c(cf + "capitalExpenditures") / _nullif0(c(cf + "operatingCashflow")),
        "dividend_payout_ratio": lambda: c(cf + "dividendPayout") / _nullif0(c(cf + "operatingCashflow")),
        "cash_conversion_ratio": lambda: c(cf + "operatingCashflow") / _nullif0(c(cf + "netIncome")),
        "earnings_beat": lambda: F.when(c("earnings_reportedEPS") > c("earnings_estimatedEPS"), 1).otherwise(0),
        "forecast_accuracy": lambda: F.abs(c("earnings_estimatedEPS") - c("earnings_reportedEPS")),
        "gross_margin": lambda: c(ist + "grossProfit") / _nullif0(c(ist + "totalRevenue")),
        "operating_margin": lambda: c(ist + "operatingIncome") / _nullif0(c(ist + "totalRevenue")),
        "net_margin": lambda: c(ist + "netIncome") / _nullif0(c(ist + "totalRevenue")),
        "ebitda_margin": lambda: c(ist + "ebitda") / _nullif0(c(ist + "totalRevenue")),
        "rd_intensity": lambda: c(ist + "researchAndDevelopment") / _nullif0(c(ist + "totalRevenue")),
        "interest_coverage": lambda: c(ist + "ebit") / _nullif0(c(ist + "interestExpense")),
    }
    if name in ratio_exprs:
        return single(ratio_exprs[name]())

    raise ValueError(f"Unknown feature: {name}")


def _pandas_outputs(name: str, params: dict, req: dict) -> list[str]:
    if name == "macd":
        return ["macd_macd", "macd_signal", "macd_hist"]
    if name.startswith("custom_"):
        return [params["as"]]
    return [_single_output_name(name, params, req)]


def _make_pandas_fn(features: list[dict], entity_col: str | None,
                    order_cols: list[str], schema: StructType):
    """Build the applyInPandas kernel computing all recursive/custom
    features for one entity group (sorted by the order columns)."""
    col_order = [f.name for f in schema.fields]

    def fn(pdf):
        import numpy as np  # noqa: F401 (available to custom code)
        import pandas as pd

        g = pdf.sort_values(order_cols, kind="stable") if order_cols else pdf
        for req in features:
            name, p = req["name"], req["params"]
            if name == "ema":
                out = g[p["on"]].ewm(span=p["window"], adjust=False,
                                     min_periods=p["window"]).mean()
                g[_single_output_name(name, p, req)] = out
            elif name == "macd":
                fast = g[p["on"]].ewm(span=p["fast_period"], adjust=False).mean()
                slow = g[p["on"]].ewm(span=p["slow_period"], adjust=False).mean()
                line = fast - slow
                signal = line.ewm(span=p["signal_period"], adjust=False).mean()
                g["macd_macd"], g["macd_signal"], g["macd_hist"] = line, signal, line - signal
            elif name == "atr":
                hi, lo, cl = g[p["high"]], g[p["low"]], g[p["close"]]
                prev = cl.shift(1)
                tr = pd.concat([hi - lo, (hi - prev).abs(), (lo - prev).abs()], axis=1).max(axis=1)
                g[_single_output_name(name, p, req)] = tr.ewm(span=p["window"], adjust=False).mean()
            elif name.startswith("custom_"):
                # Output schema declares double — coerce whatever the
                # user code produced.
                g[p["as"]] = pd.to_numeric(
                    pd.Series(run_sandboxed(p["code"], g), index=g.index),
                    errors="coerce").astype("float64")
            else:  # pragma: no cover — split in apply_features
                raise ValueError(name)
        return g[col_order]

    return fn


def _make_bucketed_pandas_fn(features: list[dict], entity_col: str,
                             order_cols: list[str], schema: StructType):
    """Vectorized many-entities-per-call kernel for the BUILTIN
    recursive features (ema/macd/atr): one pandas frame carries a hash
    BUCKET of entities and the per-entity recursions run through
    pandas' C-vectorized ``groupby().ewm()`` / ``groupby().shift()``
    (guide §4.2: hand whole batches to vectorized native code). One
    entity per applyInPandas group costs ~1 ms of Arrow/pandas framing
    PER GROUP — at 1k entities that per-group overhead dominated the
    stage (measured 1.2 s -> 0.7 s at sf0.1, output bit-identical).
    Custom-code features never route here: their sandbox contract is
    "g is one entity's frame" (see :func:`apply_features`)."""
    col_order = [f.name for f in schema.fields]

    def fn(pdf):
        import pandas as pd

        g = pdf.sort_values([entity_col] + order_cols, kind="stable") \
            if order_cols else pdf.sort_values([entity_col], kind="stable")
        key = g[entity_col].values

        def gewm(s, span, min_periods=0):
            # dropna=False: a null entity still forms a group, exactly
            # like Spark's groupBy(entity) null group on the per-entity
            # path
            return (s.groupby(key, sort=False, dropna=False)
                    .ewm(span=span, adjust=False, min_periods=min_periods)
                    .mean().reset_index(level=0, drop=True))

        for req in features:
            name, p = req["name"], req["params"]
            if name == "ema":
                g[_single_output_name(name, p, req)] = gewm(
                    g[p["on"]], p["window"], p["window"])
            elif name == "macd":
                fast = gewm(g[p["on"]], p["fast_period"])
                slow = gewm(g[p["on"]], p["slow_period"])
                line = fast - slow
                signal = gewm(line, p["signal_period"])
                g["macd_macd"], g["macd_signal"], g["macd_hist"] = \
                    line, signal, line - signal
            elif name == "atr":
                hi, lo, cl = g[p["high"]], g[p["low"]], g[p["close"]]
                prev = cl.groupby(key, sort=False, dropna=False).shift(1)
                tr = pd.concat([hi - lo, (hi - prev).abs(),
                                (lo - prev).abs()], axis=1).max(axis=1)
                g[_single_output_name(name, p, req)] = gewm(tr, p["window"])
            else:  # pragma: no cover — routing guarded in apply_features
                raise ValueError(name)
        return g[col_order]

    return fn


def apply_features(df: DataFrame, dsl: dict, entity_col: str | None = "ticker",
                   ts_col: str = "ts", order_cols: list[str] | None = None) -> DataFrame:
    """Apply a validated DSL recipe; returns df + one column per feature
    output, names matching the reference's enrichment engine."""
    cols = set(df.columns)
    entity = entity_col if entity_col in cols else None
    orders = order_cols or ([ts_col] if ts_col in cols else [])

    part = Window.partitionBy(entity) if entity else Window.partitionBy()
    w = part.orderBy(*[F.col(c).asc() for c in orders]) if orders else part.orderBy(F.lit(1))
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wrows = lambda n: w.rowsBetween(-(n - 1), Window.currentRow)

    native: list[dict] = []
    via_pandas: list[dict] = []
    for req in dsl.get("features", []):
        target = via_pandas if (req["name"] in _PANDAS_FEATURES
                                or req["name"].startswith("custom_")) else native
        target.append(req)

    ctx = _Ctx(w, wcum, wrows)
    for req in native:
        ctx.outputs.update(_compile_native(req["name"], req["params"], req, ctx, ts_col))

    out = df
    # temps apply sequentially, not in one withColumns batch: a WINDOW
    # over an earlier temp (e.g. cci's rolling avg over the typical
    # price) is an unsupported lateral-alias reference when batched;
    # Catalyst collapses the chained Projects either way.
    for tname, texpr in ctx.temps.items():
        out = out.withColumn(tname, texpr)
    if ctx.outputs:
        out = out.withColumns(ctx.outputs)
    if ctx.temps:
        out = out.drop(*ctx.temps.keys())

    if via_pandas:
        fields = list(out.schema.fields)
        for req in via_pandas:
            for oname in _pandas_outputs(req["name"], req["params"], req):
                fields.append(StructField(oname, DoubleType(), True))
        schema = StructType(fields)
        any_custom = any(r["name"].startswith("custom_") for r in via_pandas)
        if entity and not any_custom:
            # Builtin recursive features over many entities: group by a
            # HASH BUCKET of entities, not per entity — one pandas call
            # then handles ~|entities|/buckets groups through vectorized
            # groupby kernels instead of paying Arrow/pandas framing per
            # entity (guide §4.2; bit-identical, measured -40% on the
            # stage at sf0.1 with 1k entities). Width pinned the same
            # way as below; 4 buckets per slot keeps the per-task group
            # mix balanced without making buckets too small.
            width = out.sparkSession.sparkContext.defaultParallelism
            fn = _make_bucketed_pandas_fn(via_pandas, entity, orders, schema)
            if "__b" in out.columns:
                # withColumn would silently REPLACE a user column named
                # __b, and the output schema above was captured before
                # the bucket column — the kernel would return bucket
                # hashes in place of the user's data. Fail loudly.
                raise ValueError(
                    "input column name '__b' collides with the feature "
                    "compiler's internal bucket column — rename it")
            out = out.withColumn(
                "__b", F.pmod(F.xxhash64(F.col(entity)), F.lit(width * 4)))
            out = out.repartition(width, F.col("__b"))
            out = out.groupBy("__b").applyInPandas(fn, schema=schema)
            return out
        fn = _make_pandas_fn(via_pandas, entity, orders, schema)
        if entity:
            # Pin the shuffle width before the Python stage: AQE
            # coalesces small-byte shuffles to a couple of partitions,
            # which serializes the (per-row-expensive) pandas kernels.
            # An explicit user repartition is exempt from coalescing.
            width = out.sparkSession.sparkContext.defaultParallelism
            out = out.repartition(width, F.col(entity))
            grouped = out.groupBy(entity)
        else:
            grouped = out.groupBy(F.lit(1).alias("__g"))
        out = grouped.applyInPandas(fn, schema=schema)

    return out
