"""Row prefix sums: the bridge between batched filtering and the tiny
sequential tracker state machine.

Both lane-pixel searches ultimately select, per image row, an x-interval
(the sliding window's span or the band around the previous fit), and the
polynomial fit only consumes per-row pixel counts and x-sums
(ops/polyfit.py reduces over rows first).  So the per-frame sequential work
collapses from O(H*W) mask arithmetic to O(H) interval lookups against
prefix sums that are precomputed *batched* for a whole chunk:

    P0[y, x] = #nonzero binary pixels in row y with column < x
    P1[y, x] = sum of their column indices

Interval [lo, hi) then yields count = P0[y,hi]-P0[y,lo] and x-sum =
P1[y,hi]-P1[y,lo] — exactly the moments of the pixel set the reference
gathers with np.nonzero (lane_tracker.py:300, 469), with no data-dependent
shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RowPrefixes(NamedTuple):
    p0: jnp.ndarray  # (H, W+1) int32 — prefix pixel counts per row
    p1: jnp.ndarray  # (H, W+1) int32 — prefix x-sums per row


def build_row_prefixes(binary: jnp.ndarray) -> RowPrefixes:
    """Prefix count/x-sum per row of a binary (H, W) uint8 image."""
    H, W = binary.shape
    nz = (binary > 0).astype(jnp.int32)
    xs = jnp.arange(W, dtype=jnp.int32)[None, :]
    z = jnp.zeros((H, 1), jnp.int32)
    p0 = jnp.concatenate([z, jnp.cumsum(nz, axis=1)], axis=1)
    p1 = jnp.concatenate([z, jnp.cumsum(nz * xs, axis=1)], axis=1)
    return RowPrefixes(p0=p0, p1=p1)


def interval_moments(pref: RowPrefixes, x_lo, x_hi, row_valid):
    """Per-row (count, x-sum) of nonzero pixels with x in [x_lo, x_hi).

    x_lo/x_hi: (H,) int32 (clipped internally); row_valid: (H,) bool.
    """
    H, Wp1 = pref.p0.shape
    lo = jnp.clip(x_lo, 0, Wp1 - 1)
    hi = jnp.clip(x_hi, 0, Wp1 - 1)
    hi = jnp.maximum(hi, lo)
    n = jnp.take_along_axis(pref.p0, hi[:, None], axis=1)[:, 0] - jnp.take_along_axis(
        pref.p0, lo[:, None], axis=1
    )[:, 0]
    sx = jnp.take_along_axis(pref.p1, hi[:, None], axis=1)[:, 0] - jnp.take_along_axis(
        pref.p1, lo[:, None], axis=1
    )[:, 0]
    valid = row_valid.astype(jnp.int32)
    return n * valid, sx * valid
