"""Plan-side validators (reference ``parameter_validator.py`` /
``output_validator.py`` — SURVEY.md Q4/Q5).

Parameter validation enforces the registry schemas (required defaults,
date format + future-date clamp, enum membership) and applies the
provider-specific rewrites (endpoint_type codes, ``function=``,
``symbol=ticker``, sort normalization). Output validation checks
requested features against a frame's columns — schema-only, so it never
triggers a Spark job."""

from __future__ import annotations

from dataclasses import replace
from datetime import date, datetime
from difflib import SequenceMatcher
from typing import Any, Optional

from dynamic_etl_pipeline_thesis_ii_spark.plans.contracts import (
    APIRequest,
    ExecutionPlan,
    ValidationReport,
)
from dynamic_etl_pipeline_thesis_ii_spark.plans.registry import (
    EndpointSpec,
    ParameterSchema,
    ParameterType,
    registry,
)


class ParameterValidator:
    """Q4: required-param defaulting, type checks, API-specific rewrites
    (``parameter_validator.py:24-154``)."""

    def __init__(self, reg=registry, today: Optional[date] = None):
        self.registry = reg
        self.today = today or datetime.now().date()

    def validate_plan(self, plan: ExecutionPlan) -> ExecutionPlan:
        plan.ranked_requests = [self.validate_request(r)
                                for r in plan.ranked_requests]
        return plan

    def validate_request(self, request: APIRequest) -> APIRequest:
        spec = self.registry.get_endpoint_spec(request.api_name,
                                               request.endpoint_name)
        if spec is None:
            request.validation_status = "ERROR"
            request.validation_errors.append(
                f"Endpoint {request.endpoint_name} not found")
            return request

        errors: list[str] = []
        warnings: list[str] = []
        params = dict(request.parameters)

        for ps in spec.parameters:
            if ps.required:
                present = ps.name in params or any(a in params for a in ps.aliases)
                if not present:
                    if ps.default_value is not None:
                        params[ps.name] = ps.default_value
                        warnings.append(
                            f"Using default for {ps.name}: {ps.default_value}")
                    else:
                        errors.append(f"Missing required: {ps.name}")

        for name, value in list(params.items()):
            ps = self._schema_for(spec, name)
            if ps is None:
                continue
            value, errs, warns = self._check(name, value, ps)
            params[name] = value
            errors.extend(errs)
            warnings.extend(warns)

        params = self._enrich(params, request.api_name, request.endpoint_name, spec)

        request.parameters = params
        request.validation_errors.extend(errors)
        request.validation_warnings.extend(warnings)
        if errors:
            request.validation_status = "ERROR"
        elif warnings:
            request.validation_status = "WARNING"
        elif request.validation_status == "PENDING":
            request.validation_status = "VALID"
        return request

    def _schema_for(self, spec: EndpointSpec, name: str
                    ) -> Optional[ParameterSchema]:
        for ps in spec.parameters:
            if ps.name == name or name in ps.aliases:
                return ps
        return None

    def _check(self, name: str, value: Any, ps: ParameterSchema
               ) -> tuple[Any, list[str], list[str]]:
        errors, warnings = [], []
        if ps.type == ParameterType.DATE and ps.format == "YYYY-MM-DD":
            try:
                d = datetime.strptime(str(value), "%Y-%m-%d").date()
                if d > self.today:
                    warnings.append(f"{name} is in future")
                    value = self.today.strftime("%Y-%m-%d")
            except ValueError:
                errors.append(f"{name} must be YYYY-MM-DD")
        elif ps.type == ParameterType.ENUM:
            if ps.valid_values and value not in ps.valid_values:
                errors.append(f"{name} must be one of {ps.valid_values}")
        elif ps.type == ParameterType.INTEGER:
            try:
                iv = int(value)
                if ps.min_value is not None and iv < ps.min_value:
                    errors.append(f"{name} below minimum {ps.min_value}")
                if ps.max_value is not None and iv > ps.max_value:
                    errors.append(f"{name} above maximum {ps.max_value}")
                value = iv
            except (TypeError, ValueError):
                errors.append(f"{name} must be an integer")
        return value, errors, warnings

    def _enrich(self, params: dict, api_name: str, endpoint_name: str,
                spec: EndpointSpec) -> dict:
        out = dict(params)
        if api_name == "polygon":
            type_map = {"get_aggs": 0, "get_grouped_daily_aggs": 1,
                        "get_daily_open_close_agg": 2,
                        "get_previous_close_agg": 3, "FULL_MARKET_SNAPSHOT": 4}
            if endpoint_name in type_map:
                out["endpoint_type"] = type_map[endpoint_name]
            elif spec.data_category == "economic_indicator":
                out["endpoint_type"] = "economic_indicator"
                out.setdefault("indicator", endpoint_name)
                if out.get("limit") is None:
                    out["limit"] = 30
                sort = out.get("sort")
                out["sort"] = (f"date.{sort}" if sort and "." not in sort
                               else sort or "date.desc")
            if "date" in out and "from" not in out:
                out["from"] = out["date"]
        elif api_name == "alpha_vantage":
            out["function"] = endpoint_name
            if "ticker" in out:
                out["symbol"] = out["ticker"]
            if endpoint_name == "TIME_SERIES_INTRADAY":
                out["interval"] = out.get("timespan", out.get("interval", "5min"))
            elif endpoint_name == "TIME_SERIES_DAILY_ADJUSTED":
                out.setdefault("outputsize", "full")
        return out


class OutputValidator:
    """Q5: requested features vs actual columns — exact (normalized) /
    alias / fuzzy(0.8) / missing (``output_validator.py:22-81``)."""

    ALIASES = {
        "open": ["open", "openprice", "o"],
        "high": ["high", "highprice", "h"],
        "low": ["low", "lowprice", "l"],
        "close": ["close", "closeprice", "c"],
        "volume": ["volume", "vol", "v"],
        "value": ["value", "val"],
    }

    def __init__(self, fuzzy_threshold: float = 0.8):
        self.fuzzy_threshold = fuzzy_threshold

    @staticmethod
    def _normalize(text: str) -> str:
        return text.lower().replace(" ", "").replace("_", "").replace("-", "")

    def validate_columns(self, columns: list[str], native_features: list[str],
                         api_name: str, endpoint_name: str,
                         ticker: Optional[str] = None) -> ValidationReport:
        if not columns:
            return ValidationReport(api_name=api_name, endpoint_name=endpoint_name,
                                    ticker=ticker, missing_features=list(native_features),
                                    validation_passed=False)
        normed = {self._normalize(c): c for c in columns}
        found, fuzzy, missing = [], [], []
        for feat in native_features:
            nf = self._normalize(feat)
            if nf in normed:
                found.append(feat)
            elif any(self._normalize(a) in normed
                     for a in self.ALIASES.get(nf, [])):
                found.append(feat)
            else:
                best, best_score = None, 0.0
                for nc, orig in normed.items():
                    s = SequenceMatcher(None, nf, nc).ratio()
                    if s > best_score:
                        best, best_score = orig, s
                if best_score >= self.fuzzy_threshold:
                    fuzzy.append({"feature": feat, "matched_column": best,
                                  "similarity_score": round(best_score, 4)})
                else:
                    missing.append(feat)
        return ValidationReport(
            api_name=api_name, endpoint_name=endpoint_name, ticker=ticker,
            found_features=found, fuzzy_matched_features=fuzzy,
            missing_features=missing, actual_columns=list(columns),
            validation_passed=not missing)

    def validate_dataset(self, df, native_features: list[str], api_name: str,
                         endpoint_name: str, ticker: Optional[str] = None
                         ) -> ValidationReport:
        return self.validate_columns(list(df.columns), native_features,
                                     api_name, endpoint_name, ticker)
