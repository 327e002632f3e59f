"""On-device lane overlay rendering.

TPU-native equivalent of ``LaneTracker.draw_lane`` (lane_tracker.py:629-662):
the reference fillPolys the region between the two smoothed lane graphs on a
bird's-eye canvas, unwarps it with Minv, and alpha-blends onto the frame.
Here the polygon between two single-valued graphs is rasterized directly as
a per-row interval mask (closed form, no polygon scan conversion), unwarped
through the shared gather kernel, and blended with saturating uint8 math
matching ``cv2.addWeighted(img, 1, lane, 0.3, 0)``.

Text annotation stays on the host (render/text.py) — it never feeds back
into tracking and would only serialize the hot path.
"""

from __future__ import annotations

import jax.numpy as jnp

from lane_tracker_tpu.kernels.resample import ResampleGrid, bilinear_gather


def lane_region_mask(
    warped_size,
    fitx_left,
    fitx_right,
    n_left,
    n_right,
    first_left,
    first_right,
) -> jnp.ndarray:
    """(H, W) uint8 mask (0/255) of the lane region between the two graphs.

    Inputs are poly_points_meta-style re-anchored graphs: row y of the lane
    region (y >= H - n) takes boundary x = fitx[first + y - (H - n)].
    Rows where either side lacks samples are left empty (the reference's
    closing polygon edge covers those rows only in rare partial-visibility
    frames; tracking is unaffected either way).
    """
    W, H = int(warped_size[0]), int(warped_size[1])
    ys = jnp.arange(H)

    def boundary(fitx, n, first):
        idx = first + ys - (H - n)
        has = ys >= (H - n)
        m = fitx.shape[0]
        return jnp.take(fitx, jnp.clip(idx, 0, m - 1)), has

    lx, lhas = boundary(fitx_left, n_left, first_left)
    rx, rhas = boundary(fitx_right, n_right, first_right)
    # The reference casts graph points to int before fillPoly
    # (lane_tracker.py:528, 647).
    lxi = jnp.trunc(lx)
    rxi = jnp.trunc(rx)
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    row_ok = (lhas & rhas)[:, None]
    inside = row_ok & (xs >= lxi[:, None]) & (xs <= rxi[:, None])
    return jnp.where(inside, jnp.uint8(255), jnp.uint8(0))


def lane_overlay(
    frame: jnp.ndarray,
    lane_mask: jnp.ndarray,
    unwarp_grid: ResampleGrid,
    enable,
) -> jnp.ndarray:
    """Blend the unwarped green lane region onto the camera frame.

    frame: (Hc, Wc, 3) uint8.  lane_mask: (H, W) uint8 bird's-eye mask.
    enable: () bool — when False the frame passes through unchanged (the
    reference's failure path without a previous lane, lane_tracker.py:1167).
    """
    green = bilinear_gather(lane_mask, unwarp_grid)  # (Hc, Wc) uint8
    # addWeighted(img, 1, lane, 0.3, 0): only the G channel of the lane
    # image is nonzero.
    add = jnp.rint(green.astype(jnp.float32) * jnp.float32(0.3)).astype(jnp.int32)
    add = jnp.where(enable, add, 0)
    g = jnp.minimum(frame[..., 1].astype(jnp.int32) + add, 255).astype(jnp.uint8)
    return jnp.stack([frame[..., 0], g, frame[..., 2]], axis=-1)
