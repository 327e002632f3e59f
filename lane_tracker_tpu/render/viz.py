"""Search-process visualization (debug path).

Equivalents of ``visualize_sliding_window_search`` and
``visualize_band_search`` (lane_tracker.py:688-771): the binary image with
search windows / band highlighted in green, detected lane pixels in red and
blue, and the fitted polynomial graph in yellow.  This path recomputes the
search on demand from the pre-step state — it is for debugging only and
never touches the hot loop.
"""

from __future__ import annotations

import numpy as np

from lane_tracker_tpu.kernels.resample import bilinear_gather
from lane_tracker_tpu.ops.color import rgb2lab_b_u8
from lane_tracker_tpu.ops.filters import filter_lane_points_channels
from lane_tracker_tpu.ops.polyfit import ploty_grid, poly_points_meta
from lane_tracker_tpu.ops.search import band_search, sliding_window_search
from lane_tracker_tpu.tracker.config import SECOND_ATTEMPT


def _warped_channels(params, frame):
    if params.pipeline == "compat":
        und = bilinear_gather(frame, params.grid_und)
        warped = bilinear_gather(und, params.grid_warp)
        return np.asarray(warped[..., 0]), np.asarray(rgb2lab_b_u8(warped))
    if params.pipeline == "turbo":
        # Mirror the turbo channel chain exactly (incl. ROI grids).
        import jax.numpy as jnp

        from lane_tracker_tpu.tracker.step import _warp_channels

        r, b = _warp_channels(jnp.asarray(frame), params)
        return np.asarray(r), np.asarray(b)
    # 'fast': mirror tracker/step.py exactly — two-stage warp of all three
    # channels, arithmetic LAB on the warped frame.
    from lane_tracker_tpu.ops.color import rgb2lab_b_fast

    warped = bilinear_gather(
        bilinear_gather(frame, params.grid_und), params.grid_warp)
    return np.asarray(warped[..., 0]), np.asarray(rgb2lab_b_fast(warped))


def _poly_graph_points(coeffs, warped_size, partial=1.0):
    ploty = np.asarray(ploty_grid(warped_size, partial))
    meta = poly_points_meta(np.asarray(coeffs, np.float32), ploty, warped_size)
    n = int(meta.n)
    first = int(meta.first)
    H = int(warped_size[1])
    fitx = np.asarray(meta.fitx)
    ys = np.arange(H - n, H)
    xs = fitx[first : first + n].astype(int)
    return ys, xs


def search_visualization(tracker, frame, config, out):
    """Rebuild the search picture for the frame just processed."""
    params = tracker.params
    state = tracker._prev_state if tracker._prev_state is not None else tracker._state
    W, H = params.warped_size
    # Reproduce the binary input of the attempt that produced the result.
    cfg = config if int(out.n_attempts) == 1 else SECOND_ATTEMPT
    fcfg = cfg.filter if int(out.n_attempts) == 1 else SECOND_ATTEMPT.filter
    scfg = cfg.search if int(out.n_attempts) == 1 else SECOND_ATTEMPT.search
    r, b = _warped_channels(params, frame)
    binary = np.asarray(
        filter_lane_points_channels(
            r,
            b,
            filter_type=fcfg.filter_type,
            ksize_r=fcfg.ksize_r,
            C_r=fcfg.C_r,
            ksize_b=fcfg.ksize_b,
            C_b=fcfg.C_b,
            mask_noise=fcfg.mask_noise,
            ksize_noise=fcfg.ksize_noise,
            C_noise=fcfg.C_noise,
            noise_thresh=fcfg.noise_thresh,
        )
    )
    output = np.repeat(binary[..., None], 3, axis=2)

    if not bool(out.detected):
        # No lane pixels anywhere: the reference visualizes the bare binary
        # image of the last attempt instead of a search overlay
        # (lane_tracker.py:1130-1137; returned 3-channel here because every
        # viz output of this module is RGB).
        return output

    if int(out.search_mode) == 0:  # sliding window
        res = sliding_window_search(binary, scfg)
        wh, ww = scfg.window_height, scfg.window_width
        img_height = H - scfg.ignore_bottom
        windows = np.zeros((H, W), bool)
        for side in ("left", "right"):
            cents = np.asarray(getattr(res, f"{side}_centroids"))
            n_c = int(getattr(res, f"{side}_n_centroids"))
            for level in range(max(n_c, 0)):
                c = int(cents[level])
                y0 = max(img_height - (level + 1) * wh, 0)
                y1 = img_height - level * wh
                x0 = max(c - ww // 2, 0)
                x1 = min(c + ww // 2, W)
                if x1 > x0:
                    windows[y0:y1, x0:x1] = True
        # Green half-intensity windows over the binary (addWeighted 0.5).
        output[windows, 1] = np.minimum(output[windows, 1].astype(int) + 127, 255)
    else:  # band search around the previous fit
        res = band_search(
            binary, state.last_left, state.last_right, scfg
        )
        bw = scfg.bandwidth
        for coeffs in (np.asarray(state.last_left), np.asarray(state.last_right)):
            ys, xs = _poly_graph_points(coeffs, params.warped_size, scfg.partial)
            for dx in range(-bw, bw + 1):
                xs_b = np.clip(xs + dx, 0, W - 1)
                output[ys, xs_b, 1] = np.minimum(
                    output[ys, xs_b, 1].astype(int) + 76, 255
                )

    lm = np.asarray(res.left_mask)
    rm = np.asarray(res.right_mask)
    output[lm] = [255, 0, 0]
    output[rm] = [0, 0, 255]

    if bool(out.detected):
        for coeffs in (np.asarray(out.left_coeffs), np.asarray(out.right_coeffs)):
            ys, xs = _poly_graph_points(coeffs, params.warped_size)
            output[ys, np.clip(xs, 0, W - 1)] = [255, 235, 0]
    return output
