from lane_tracker_tpu.tracker.config import (
    TrackerConfig,
    FilterConfig,
    SearchConfig,
    ValidityConfig,
    PRESETS,
    SECOND_ATTEMPT,
)

__all__ = [
    "TrackerConfig",
    "FilterConfig",
    "SearchConfig",
    "ValidityConfig",
    "PRESETS",
    "SECOND_ATTEMPT",
]
