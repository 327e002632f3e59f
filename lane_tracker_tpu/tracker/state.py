"""Tracker state as an explicit, fixed-shape pytree.

The reference holds ~20 mutable attributes on a LaneTracker object
(lane_tracker.py:139-176): rolling coefficient lists with empty-array
failure sentinels, a radii list with -1 sentinels, counters, and cached
smoothed graph points.  Here all of it becomes one immutable NamedTuple of
arrays, threaded through a pure ``step`` function — scannable over the time
axis, vmappable over streams, and trivially snapshot/restorable.

Ring buffers with validity masks replace the growing/popping Python lists:
an entry that was never pushed (or was a failure sentinel) simply has
``hist_valid=False`` and is excluded from averages, which reproduces the
reference's append/pop/filter semantics exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class TrackerState(NamedTuple):
    # Detection state machine (lane_tracker.py:140-142)
    last_detection: jnp.ndarray  # () i32; init n_reset+1 forces sliding window
    # Rolling fit history (lane_tracker.py:144-148, 1145-1153, 1180-1187)
    hist_left: jnp.ndarray  # (n_average, 3) f32
    hist_right: jnp.ndarray  # (n_average, 3) f32
    hist_valid: jnp.ndarray  # (n_average,) bool
    last_left: jnp.ndarray  # (3,) f32 — latest successful fit
    last_right: jnp.ndarray  # (3,) f32
    # Smoothed (averaged) fit + cached render geometry
    # (lane_tracker.py:150-156, 1194-1199)
    avg_left: jnp.ndarray  # (3,) f32
    avg_right: jnp.ndarray  # (3,) f32
    has_avg: jnp.ndarray  # () bool — left_avg_y.size != 0 equivalent
    rfitx_left: jnp.ndarray  # (n_samples,) f32 — avg graph x at ploty samples
    rfitx_right: jnp.ndarray  # (n_samples,) f32
    rn_left: jnp.ndarray  # () i32 — surviving sample count
    rn_right: jnp.ndarray  # () i32
    rfirst_left: jnp.ndarray  # () i32 — first surviving index
    rfirst_right: jnp.ndarray  # () i32
    # Curve radius rolling state (lane_tracker.py:169-173, 543-549)
    radii: jnp.ndarray  # (n_average,) f32 with -1 failure sentinels
    avg_radius: jnp.ndarray  # () f32 (integer-valued)
    ecc: jnp.ndarray  # () f32
    # Frame accounting (lane_tracker.py:175-176)
    counter: jnp.ndarray  # () i32
    success: jnp.ndarray  # () i32


def init_state(n_reset: int, n_average: int, n_samples: int) -> TrackerState:
    """Fresh state; ``n_samples`` = len(ploty grid) = int(H * partial)."""
    f32 = jnp.float32
    return TrackerState(
        last_detection=jnp.int32(n_reset + 1),
        hist_left=jnp.zeros((n_average, 3), f32),
        hist_right=jnp.zeros((n_average, 3), f32),
        hist_valid=jnp.zeros((n_average,), jnp.bool_),
        last_left=jnp.zeros((3,), f32),
        last_right=jnp.zeros((3,), f32),
        avg_left=jnp.zeros((3,), f32),
        avg_right=jnp.zeros((3,), f32),
        has_avg=jnp.bool_(False),
        rfitx_left=jnp.zeros((n_samples,), f32),
        rfitx_right=jnp.zeros((n_samples,), f32),
        rn_left=jnp.int32(0),
        rn_right=jnp.int32(0),
        rfirst_left=jnp.int32(0),
        rfirst_right=jnp.int32(0),
        radii=jnp.full((n_average,), -1.0, f32),
        avg_radius=jnp.float32(0.0),
        ecc=jnp.float32(0.0),
        counter=jnp.int32(0),
        success=jnp.int32(0),
    )


def state_to_npz(state: TrackerState, path):
    """Snapshot the tracker state (checkpoint/resume support)."""
    np.savez(path, **{k: np.asarray(v) for k, v in state._asdict().items()})


def state_from_npz(path) -> TrackerState:
    with np.load(path) as z:
        return TrackerState(**{k: jnp.asarray(z[k]) for k in TrackerState._fields})
