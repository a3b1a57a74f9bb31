"""LLM planner/translator rim (reference Q1 ``query_analyzer.py`` and
X2 ``llm_translator.py``) — provider-agnostic and offline-safe.

The reference calls OpenAI chat completions with (a) a routing prompt
encoding the endpoint manifest + routing rules, expecting a JSON object
(its ``LLMResponse``), and (b) a keyword->DSL prompt encoding the
feature registry, expecting a JSON ``{"features": [...]}``. This module
reproduces those CONTRACTS:

- ``build_planner_prompt`` / ``build_translator_prompt`` render the
  same information (compact manifest, routing rules, registry) for any
  chat-completion provider;
- ``parse_planner_response`` / ``parse_translator_response`` strictly
  parse the model output back into typed objects;
- ``LLMPlanner`` / ``LLMTranslator`` wrap a caller-supplied
  ``complete(system, user) -> str`` callable (OpenAI, Anthropic, local
  — anything), degrading to the deterministic rule planner / keyword
  translator on any error, so the pipeline never hard-fails on the LLM
  path (the reference degrades the same way,
  ``transform/transform.py:187-198``).

No network code lives here — the ``complete`` callable is injected, so
tests drive the full prompt->parse cycle with canned responses.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Optional

from dynamic_etl_pipeline_thesis_ii_spark.functions.dsl import validate_dsl
from dynamic_etl_pipeline_thesis_ii_spark.functions.registry import FEATURE_REGISTRY
from dynamic_etl_pipeline_thesis_ii_spark.plans.contracts import (
    FeatureSpec,
    PlannedRequest,
    PlannerResponse,
)
from dynamic_etl_pipeline_thesis_ii_spark.plans.planner import RulePlanner
from dynamic_etl_pipeline_thesis_ii_spark.plans.registry import registry

CompleteFn = Callable[[str, str], str]  # (system, user) -> assistant text


def build_planner_prompt(reg=registry) -> str:
    """System prompt: manifest + the reference's routing rules."""
    manifest = json.dumps(reg.manifest(), indent=None)
    return (
        "You are a financial data query planner. Given a user query, "
        "emit ONLY a JSON object with keys: proceed (bool), features "
        "{native: [..], enrichment: [..]}, semantic_keywords [..], "
        "tickers [..], api_requests [{api_name, endpoint_name, "
        "parameters, reasoning}].\n"
        "Routing rules:\n"
        "- stock bar requests go to BOTH polygon get_aggs and the "
        "matching alpha_vantage TIME_SERIES_* endpoint;\n"
        "- fundamentals (income statement / balance sheet / cash flow / "
        "earnings) go to alpha_vantage, one request per ticker;\n"
        "- economic indicators need no ticker;\n"
        "- default window is the last 30 days when no dates are given;\n"
        "- quarterly period is the default for fundamentals;\n"
        "- set proceed=false for non-finance queries.\n"
        f"Available endpoints: {manifest}"
    )


def parse_planner_response(text: str) -> PlannerResponse:
    """Strict parse of the model JSON into the typed contract."""
    obj = json.loads(text)
    feats = obj.get("features") or {}
    return PlannerResponse(
        proceed=bool(obj.get("proceed", True)),
        features=FeatureSpec(native=list(feats.get("native", [])),
                             enrichment=list(feats.get("enrichment", []))),
        semantic_keywords=list(obj.get("semantic_keywords", [])),
        api_requests=[
            PlannedRequest(api_name=r["api_name"],
                           endpoint_name=r["endpoint_name"],
                           parameters=dict(r.get("parameters", {})),
                           reasoning=r.get("reasoning"))
            for r in obj.get("api_requests", [])
        ],
        tickers=list(obj.get("tickers", [])))


class LLMPlanner:
    """Planner backed by any chat-completion callable, with the rule
    planner as deterministic fallback (parse error, missing fields,
    provider exception)."""

    def __init__(self, complete: CompleteFn, reg=registry,
                 fallback: Optional[RulePlanner] = None):
        self.complete = complete
        self.system = build_planner_prompt(reg)
        self.fallback = fallback or RulePlanner(reg)

    def analyze(self, query: str) -> PlannerResponse:
        try:
            return parse_planner_response(self.complete(self.system, query))
        except Exception:  # noqa: BLE001 — degrade, never fail the pipeline
            return self.fallback.analyze(query)


# ---------------------------------------------------------------------------
# keyword -> DSL translation (X2)
# ---------------------------------------------------------------------------

def build_translator_prompt(feature_registry: dict = FEATURE_REGISTRY,
                            available_columns: Optional[list[str]] = None) -> str:
    reg = json.dumps(feature_registry["features"], default=str)
    cols = json.dumps(available_columns or [])
    return (
        "Translate the user's feature keywords into ONLY a JSON object "
        '{"features": [{"name": <registry name>, "params": {..}}]}. '
        "Use only features from the registry and only columns from the "
        "available list; omit unknown requests; fill sensible defaults.\n"
        f"Registry: {reg}\nAvailable columns: {cols}"
    )


def parse_translator_response(text: str,
                              feature_registry: dict = FEATURE_REGISTRY,
                              ) -> tuple[Optional[dict], list[str]]:
    """Model text -> validated DSL (validator enforces the registry —
    unknown features/params/types are hard errors, like the reference's
    ``dsl_validator``)."""
    return validate_dsl(text, feature_registry)


class LLMTranslator:
    def __init__(self, complete: CompleteFn,
                 feature_registry: dict = FEATURE_REGISTRY):
        self.complete = complete
        self.feature_registry = feature_registry

    def translate(self, keywords: list[str],
                  available_columns: Optional[list[str]] = None) -> dict:
        from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
            translate_keywords,
        )
        try:
            system = build_translator_prompt(self.feature_registry,
                                             available_columns)
            dsl, errors = parse_translator_response(
                self.complete(system, ", ".join(keywords)),
                self.feature_registry)
            if dsl is not None and not errors:
                return dsl
        except Exception:  # noqa: BLE001
            pass
        return translate_keywords(keywords)
