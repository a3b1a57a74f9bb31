"""Feature-DSL validator.

Same contract as the reference's ``transform/dsl_validator.py:5-125``:
take a JSON recipe ``{"features": [{"name": ..., "params": {...}}]}``,
validate against the registry, fill defaults in place, and return
``(enriched_dsl, errors)`` — ``(None, [..])`` on any error. ``custom_*``
features carry sandboxed Python (``code`` + ``as``) and are
syntax-checked with ``ast.parse``.
"""

from __future__ import annotations

import ast
import json
from typing import Any


def validate_dsl(dsl: str | dict, registry: dict) -> tuple[dict | None, list[str]]:
    errors: list[str] = []

    if isinstance(dsl, str):
        try:
            dsl = json.loads(dsl)
        except json.JSONDecodeError:
            return None, ["Validation Error: DSL was not valid JSON."]

    if not isinstance(dsl, dict) or "features" not in dsl or not isinstance(dsl["features"], list):
        return None, ["Validation Error: JSON must have a top-level 'features' key."]

    reg_features = registry.get("features", {})

    for i, req in enumerate(dsl["features"]):
        name = req.get("name")
        params: dict[str, Any] = req.get("params", {})

        if name and name.startswith("custom_"):
            if "code" not in params:
                errors.append(f"Feature {i} ('{name}'): Missing required 'code' parameter for custom feature.")
            else:
                try:
                    ast.parse(params["code"])
                except SyntaxError as e:
                    errors.append(f"Feature {i} ('{name}'): Invalid Python syntax in code: {e}")
            if "as" not in params:
                errors.append(f"Feature {i} ('{name}'): Missing required 'as' parameter for output column name.")
            continue

        if name not in reg_features:
            errors.append(f"Feature {i} ('{name}'): Not a supported feature.")
            continue

        rules = reg_features[name].get("params", {})

        for pname, prule in rules.items():
            required = prule.get("required", False)
            has_default = "default" in prule
            if required and pname not in params and not has_default:
                errors.append(
                    f"Feature {i} ('{name}'): Required parameter '{pname}' is missing and has no default value.")
                continue
            if pname not in params and has_default:
                params[pname] = prule["default"]

        for pname, pval in params.items():
            if pname not in rules:
                errors.append(f"Feature {i} ('{name}'): Parameter '{pname}' is not supported for this feature.")
                continue
            expected = rules[pname].get("type")
            if expected == "string" and not isinstance(pval, str):
                errors.append(
                    f"Feature {i} ('{name}'): Parameter '{pname}' must be a string, but got {type(pval).__name__}.")
                continue
            if expected == "int" and (not isinstance(pval, int) or isinstance(pval, bool)):
                errors.append(
                    f"Feature {i} ('{name}'): Parameter '{pname}' must be an integer, but got {type(pval).__name__}.")
                continue
            if "allowed" in rules[pname] and pval not in rules[pname]["allowed"]:
                errors.append(
                    f"Feature {i} ('{name}'): Parameter '{pname}' has value '{pval}', "
                    f"but must be one of {rules[pname]['allowed']}.")

        req["params"] = params

    if errors:
        return None, errors
    return dsl, []
