"""Stateful LaneTracker wrapper (reference-compatible API).

Placeholder while the functional core lands; replaced by the full
implementation in this same module.
"""

from __future__ import annotations


class LaneTracker:  # pragma: no cover - replaced by full implementation
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("LaneTracker lands with tracker/step.py")
