"""Typed plan/result contracts (reference ``LLM_Ingestor/contracts.py``).

Same shapes, dataclass-based (no runtime dependency on pydantic): the
planner emits an ``LLMResponse``-shaped object, validation turns it into
an ``ExecutionPlan`` of ``APIRequest``s, execution produces
``ExecutionResults`` of ``APIResult``s whose payloads are LAZY Spark
DataFrames (the reference carries eager pandas frames)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Literal, Optional

ValidationStatus = Literal["PENDING", "VALID", "WARNING", "ERROR"]
ResultStatus = Literal["SUCCESS", "FAILED"]
OverallStatus = Literal["COMPLETE", "PARTIAL", "FAILED"]


@dataclass
class FeatureSpec:
    native: list[str] = field(default_factory=list)
    enrichment: list[str] = field(default_factory=list)


@dataclass
class PlannedRequest:
    """One routed API call as emitted by the planner (LLMAPIRequest)."""
    api_name: str
    endpoint_name: str
    parameters: dict[str, Any] = field(default_factory=dict)
    reasoning: Optional[str] = None


@dataclass
class PlannerResponse:
    """Planner output (LLMResponse): routing + requested features."""
    proceed: bool = True
    features: FeatureSpec = field(default_factory=FeatureSpec)
    semantic_keywords: list[str] = field(default_factory=list)
    api_requests: list[PlannedRequest] = field(default_factory=list)
    tickers: list[str] = field(default_factory=list)


@dataclass
class APIRequest:
    """A planned request carrying validation state."""
    api_name: str
    endpoint_name: str
    parameters: dict[str, Any] = field(default_factory=dict)
    semantic_score: Optional[float] = None
    validation_status: ValidationStatus = "PENDING"
    validation_errors: list[str] = field(default_factory=list)
    validation_warnings: list[str] = field(default_factory=list)


@dataclass
class ExecutionPlan:
    ranked_requests: list[APIRequest] = field(default_factory=list)


@dataclass
class ValidationReport:
    """Requested-vs-actual feature check result (output validation)."""
    api_name: str
    endpoint_name: str
    ticker: Optional[str] = None
    found_features: list[str] = field(default_factory=list)
    fuzzy_matched_features: list[dict[str, Any]] = field(default_factory=list)
    missing_features: list[str] = field(default_factory=list)
    actual_columns: list[str] = field(default_factory=list)
    validation_passed: bool = True


@dataclass
class APIResult:
    api_name: str
    endpoint_name: str
    status: ResultStatus
    data: Any = None  # pyspark.sql.DataFrame on success
    metadata: dict[str, Any] = field(default_factory=dict)
    used_parameters: dict[str, Any] = field(default_factory=dict)
    error_message: Optional[str] = None


@dataclass
class ExecutionResults:
    results: list[APIResult] = field(default_factory=list)
    failed_requests: list[APIRequest] = field(default_factory=list)
    overall_status: OverallStatus = "COMPLETE"
    execution_time_ms: int = 0
