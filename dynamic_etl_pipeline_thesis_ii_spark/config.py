"""Engine configuration: quality profiles and integration thresholds.

Same knob semantics as the reference's ``validator/config.py:12-64`` —
three quality profiles move the union-coverage, join-retention,
matches-per-row and column-delete thresholds together; the scalar
constants (union column-pair threshold, hybrid weights, row-probability
threshold, closeness tolerances, epsilon) are profile-independent.
"""

from __future__ import annotations

from dataclasses import dataclass, field

QUALITY_PROFILES: dict[str, dict[str, float]] = {
    "high_quality": {
        "union_compatibility_threshold": 0.7,
        "join_retention_threshold": 0.65,
        "max_matches_per_row": 2,
        "column_delete_threshold": 0.3,
    },
    "balanced": {
        "union_compatibility_threshold": 0.6,
        "join_retention_threshold": 0.5,
        "max_matches_per_row": 5,
        "column_delete_threshold": 0.5,
    },
    "high_volume": {
        "union_compatibility_threshold": 0.4,
        "join_retention_threshold": 0.35,
        "max_matches_per_row": 0,  # 0 = unlimited
        "column_delete_threshold": 0.7,
    },
}

DEFAULT_PROFILE = "balanced"


@dataclass
class EngineConfig:
    """Integration-stage thresholds (reference ``validator/config.py``)."""

    quality_profile: str = DEFAULT_PROFILE

    # union (profile-independent)
    union_threshold: float = 0.72
    union_name_weight: float = 0.85
    union_model_weight: float = 0.15

    # join (profile-independent)
    join_row_threshold: float = 0.44
    close_tolerance: float = 0.1
    very_close_tolerance: float = 0.01
    epsilon: float = 1e-10

    # input caps
    max_dataframes: int = 10

    # profile-driven (filled in __post_init__)
    union_compatibility_threshold: float = field(init=False)
    join_retention_threshold: float = field(init=False)
    max_matches_per_row: int = field(init=False)
    column_delete_threshold: float = field(init=False)

    def __post_init__(self) -> None:
        preset = QUALITY_PROFILES.get(self.quality_profile)
        if preset is None:
            self.quality_profile = DEFAULT_PROFILE
            preset = QUALITY_PROFILES[DEFAULT_PROFILE]
        self.union_compatibility_threshold = preset["union_compatibility_threshold"]
        self.join_retention_threshold = preset["join_retention_threshold"]
        self.max_matches_per_row = int(preset["max_matches_per_row"])
        self.column_delete_threshold = preset["column_delete_threshold"]
