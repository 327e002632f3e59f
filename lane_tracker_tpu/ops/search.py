"""Lane-pixel search: sliding-window (blind) and band (warm-start) searches.

TPU-native re-design of the reference's two search strategies:

* :func:`sliding_window_search` — lane_tracker.py:242-447.  The reference
  runs a Python loop over ~26 vertical levels, each doing a column-sum, a
  full-mode convolution, a plateau-midpoint argmax restricted to a momentum-
  adjusted search range, and `nonzero` pixel collection.  Here all per-level
  column sums and convolutions are precomputed in one vectorized pass
  (cumsum difference), and a `lax.scan` carries only the tiny scalar state
  (centroids, momentum ranges, miss counters).  Pixel "collection" becomes a
  fixed-shape mask built after the scan from the per-level window decisions
  — mathematically the same pixel multiset, no data-dependent shapes.

* :func:`band_search` — lane_tracker.py:449-500.  A pure masked reduction
  around the previous frame's polynomials.

Both return per-side boolean pixel masks plus bookkeeping, which downstream
fitting consumes as weights (ops/polyfit.py).

Quirk parity notes (verified against the reference's semantics):
  - Window ROI slicing `img[:, c-w:c+w]` uses Python slice semantics: a
    negative start wraps and yields an EMPTY slice, so windows whose left
    edge is negative collect no pixels (lane_tracker.py:299, 371, 409).
  - Level 0 plateau midpoint uses floor ((a+b)//2, lane_tracker.py:296);
    levels >= 1 use ceil (lane_tracker.py:363, 402).
  - The left side is updated before the right within a level; the right
    side's drift-on-miss reads the left side's CURRENT-level state while
    the left side's reads the right's PREVIOUS-level state
    (lane_tracker.py:385, 423).
  - `int(mu * diff)` truncates toward zero (Python int()).
  - After `no_success_limit` consecutive misses a side stops searching for
    the remainder of the frame (lane_tracker.py:354, 395) and its trailing
    `no_success_limit` centroids are dropped from the visualization list
    (lane_tracker.py:391-392, 429-430).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lane_tracker_tpu.tracker.config import SearchConfig


class SearchResult(NamedTuple):
    left_mask: jnp.ndarray  # (H, W) bool — selected left lane pixels
    right_mask: jnp.ndarray  # (H, W) bool
    detected: jnp.ndarray  # () bool — both sides collected >= 1 pixel
    # Visualization bookkeeping (sliding-window only; zeros for band):
    left_centroids: jnp.ndarray  # (nlevels,) i32 (padded with -1)
    right_centroids: jnp.ndarray  # (nlevels,) i32
    left_n_centroids: jnp.ndarray  # () i32 — list length after trailing drops
    right_n_centroids: jnp.ndarray  # () i32


def _plateau_mid(vals, ceil_mode):
    """Midpoint of the argmax plateau of ``vals`` (int32, >=0; masked
    entries must be < 0).

    Mirrors the reference's argpartition trick (lane_tracker.py:294-296):
    first and last indices attaining the max, midpoint with floor (level 0)
    or ceil (levels >= 1).
    """
    n = vals.shape[0]
    m = jnp.max(vals)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    is_max = vals == m
    first = jnp.min(jnp.where(is_max, idx, n))
    last = jnp.max(jnp.where(is_max, idx, -1))
    if ceil_mode:
        return (first + last + 1) // 2
    return (first + last) // 2


def _full_conv_ones(sm, window_width):
    """np.convolve(ones(window_width), sm) for a batch of rows.

    sm: (L, W) int32. Returns (L, W + window_width - 1) int32:
    conv[i] = sum(sm[i-ww+1 : i+1] clipped to valid range).
    """
    L, W = sm.shape
    ww = window_width
    cs = jnp.cumsum(sm, axis=1)
    # S(t) with S(-1)=0 and S(t>=W)=S(W-1); conv[i] = S(i) - S(i-ww)
    total = W + ww - 1
    idx_hi = jnp.clip(jnp.arange(total), 0, W - 1)
    idx_lo = jnp.arange(total) - ww
    hi = jnp.take(cs, idx_hi, axis=1)
    lo = jnp.where(
        idx_lo < 0,
        jnp.zeros((L, total), cs.dtype),
        jnp.take(cs, jnp.clip(idx_lo, 0, W - 1), axis=1),
    )
    return hi - lo


def _initial_centroid(conv, any_input, offset, fallback, window_width):
    """Level-0 centroid from a half-image convolution (floor plateau mid)."""
    found = any_input
    mid = _plateau_mid(jnp.where(found, conv, -1), ceil_mode=False)
    centroid = mid - window_width // 2 + offset
    return jnp.where(found, centroid, fallback).astype(jnp.int32), found


def sliding_window_search(
    binary: jnp.ndarray, cfg: SearchConfig
) -> SearchResult:
    """Blind sliding-window lane-pixel search (fixed shapes, jittable).

    Args:
        binary: (H, W) uint8 binary image from the filter stage.
        cfg: static search knobs.

    Returns:
        SearchResult with per-side pixel masks and centroid traces.
    """
    H, W = binary.shape
    ww = int(cfg.window_width)
    wh = int(cfg.window_height)
    w2 = ww // 2
    ignore_bottom = int(cfg.ignore_bottom)
    ignore_sides = int(cfg.ignore_sides)
    img_height = H - ignore_bottom
    img_center = W // 2
    y_start = int((1 - cfg.start_slice) * img_height)
    nlevels = int((cfg.partial * img_height) / wh)
    limit = int(cfg.no_success_limit)
    mu = float(cfg.mu)
    sr = int(cfg.search_range)

    img = (binary > 0).astype(jnp.int32)

    # ---- Level 0: initial centroids from the bottom start slice ----
    col_sum = jnp.sum(img[y_start:img_height, :], axis=0)
    left_sum = jnp.where(
        (jnp.arange(W) >= ignore_sides) & (jnp.arange(W) < img_center), col_sum, 0
    )
    right_sum = jnp.where(
        (jnp.arange(W) >= img_center) & (jnp.arange(W) < W - ignore_sides), col_sum, 0
    )
    # The reference convolves the *sliced* arrays; emulate by slicing here
    # (static bounds), so conv indices match its coordinate frame.  When
    # ignore_sides reaches the center (tiny geometries) the slice is empty
    # and the reference's np.any() falls through to the fallback centroid.
    if img_center - ignore_sides > 0:
        lslice = left_sum[ignore_sides:img_center]
        conv_l0 = _full_conv_ones(lslice[None, :], ww)[0]
        left_c0, left_found0 = _initial_centroid(
            conv_l0, jnp.any(lslice > 0), ignore_sides, int(W * 0.4), ww
        )
    else:
        left_c0 = jnp.int32(int(W * 0.4))
        left_found0 = jnp.bool_(False)
    if (W - ignore_sides) - img_center > 0:
        rslice = right_sum[img_center : W - ignore_sides]
        conv_r0 = _full_conv_ones(rslice[None, :], ww)[0]
        right_c0, right_found0 = _initial_centroid(
            conv_r0, jnp.any(rslice > 0), img_center, int(W * 0.6), ww
        )
    else:
        right_c0 = jnp.int32(int(W * 0.6))
        right_found0 = jnp.bool_(False)

    # ---- Per-level band sums + convolutions, precomputed for all levels ----
    # Level l covers rows [img_height-(1+l)*wh, img_height-l*wh).
    flipped = img[:img_height][::-1]  # row 0 = bottom
    usable = nlevels * wh
    bands = flipped[:usable].reshape(nlevels, wh, W).sum(axis=1)
    conv_all = _full_conv_ones(bands, ww)  # (nlevels, W+ww-1)
    conv_len = W + ww - 1
    conv_idx = jnp.arange(conv_len)

    class Carry(NamedTuple):
        lc: jnp.ndarray
        rc: jnp.ndarray
        lns: jnp.ndarray  # left no-success count
        rns: jnp.ndarray
        lrmin: jnp.ndarray  # momentum-adjusted search ranges
        lrmax: jnp.ndarray
        rrmin: jnp.ndarray
        rrmax: jnp.ndarray
        ldiff: jnp.ndarray  # last successful centroid delta
        rdiff: jnp.ndarray
        lhas_diff: jnp.ndarray
        rhas_diff: jnp.ndarray

    def side_update(conv, c, ns, rmin, rmax, diff, has_diff, other_diff,
                    other_has_diff, other_ns):
        """One side's per-level update. Returns the new scalar state plus
        (success, centroid) for mask construction."""
        active = ns < limit
        min_index = jnp.maximum(c + rmin + w2, 0)
        max_index = jnp.minimum(c + rmax + w2, W)
        # Python-slice quirk (lane_tracker.py:358, 398): a negative stop in
        # conv[min_index:max_index] wraps to len(conv)+max_index, so heavy
        # negative momentum makes the reference search almost the full
        # width. Preserved for parity.
        max_index = jnp.where(max_index < 0, conv_len + max_index, max_index)
        in_range = (conv_idx >= min_index) & (conv_idx < max_index)
        vals = jnp.where(in_range, conv, 0)
        found = active & jnp.any(vals > 0)
        # Plateau midpoint within the slice coordinate frame (ceil mode).
        rel = jnp.where(in_range, conv, -1)
        m = jnp.max(rel)
        is_max = (rel == m) & in_range
        first = jnp.min(jnp.where(is_max, conv_idx, conv_len)) - min_index
        last = jnp.max(jnp.where(is_max, conv_idx, -1)) - min_index
        mid = (first + last + 1) // 2
        new_c_found = mid + min_index - w2
        step = jnp.trunc(mu * (new_c_found - c).astype(jnp.float32)).astype(jnp.int32)
        # Miss: drift with the other side's last step if it succeeded at its
        # most recent level (other_ns == 0) and has ever moved.
        drift = jnp.where(
            active & other_has_diff & (other_ns == 0), other_diff, 0
        )
        new_c = jnp.where(found, new_c_found, c + jnp.where(found, 0, drift))
        new_ns = jnp.where(found, 0, jnp.where(active, ns + 1, ns))
        new_rmin = jnp.where(found, rmin + step, rmin)
        new_rmax = jnp.where(found, rmax + step, rmax)
        new_diff = jnp.where(found, new_c_found - c, diff)
        new_has = has_diff | found
        return new_c, new_ns, new_rmin, new_rmax, new_diff, new_has, found, active

    def body(carry: Carry, conv):
        (lc, lns, lrmin, lrmax, ldiff, lhas, lfound, lactive) = side_update(
            conv, carry.lc, carry.lns, carry.lrmin, carry.lrmax, carry.ldiff,
            carry.lhas_diff, carry.rdiff, carry.rhas_diff, carry.rns,
        )
        # Right side sees the left side's CURRENT-level state.
        (rc, rns, rrmin, rrmax, rdiff, rhas, rfound, ractive) = side_update(
            conv, carry.rc, carry.rns, carry.rrmin, carry.rrmax, carry.rdiff,
            carry.rhas_diff, ldiff, lhas, lns,
        )
        new = Carry(lc, rc, lns, rns, lrmin, lrmax, rrmin, rrmax,
                    ldiff, rdiff, lhas, rhas)
        return new, (lfound, lc, lactive, rfound, rc, ractive)

    init = Carry(
        lc=left_c0,
        rc=right_c0,
        lns=jnp.int32(0),
        rns=jnp.int32(0),
        lrmin=jnp.int32(-sr),
        lrmax=jnp.int32(sr),
        rrmin=jnp.int32(-sr),
        rrmax=jnp.int32(sr),
        ldiff=jnp.int32(0),
        rdiff=jnp.int32(0),
        lhas_diff=jnp.bool_(False),
        rhas_diff=jnp.bool_(False),
    )
    if nlevels > 1:
        _, (lfound, lcent, lactive, rfound, rcent, ractive) = jax.lax.scan(
            body, init, conv_all[1:]
        )
        # Prepend level 0.
        lfound = jnp.concatenate([left_found0[None], lfound])
        lcent = jnp.concatenate([left_c0[None], lcent])
        lactive = jnp.concatenate([jnp.ones((1,), jnp.bool_), lactive])
        rfound = jnp.concatenate([right_found0[None], rfound])
        rcent = jnp.concatenate([right_c0[None], rcent])
        ractive = jnp.concatenate([jnp.ones((1,), jnp.bool_), ractive])
    else:
        lfound = left_found0[None]
        lcent = left_c0[None]
        lactive = jnp.ones((1,), jnp.bool_)
        rfound = right_found0[None]
        rcent = right_c0[None]
        ractive = jnp.ones((1,), jnp.bool_)

    # ---- Pixel masks from per-level window decisions ----
    ys = jnp.arange(H)
    n_mask_levels = max(nlevels, 1)  # level 0 (initial window) always exists
    level_of_row = (img_height - 1 - ys) // wh
    row_valid = (
        (ys < img_height) & (level_of_row >= 0) & (level_of_row < n_mask_levels)
    )
    lvl = jnp.clip(level_of_row, 0, n_mask_levels - 1)

    def side_mask(found, cent):
        c_r = jnp.take(cent, lvl)  # (H,)
        f_r = jnp.take(found, lvl) & row_valid
        x_lo = c_r - w2
        x_hi = jnp.minimum(c_r + w2, W)
        # Python-slice-wrap quirk: negative window start -> empty window.
        f_r = f_r & (x_lo >= 0)
        xs = jnp.arange(W)[None, :]
        return (
            (img > 0)
            & f_r[:, None]
            & (xs >= x_lo[:, None])
            & (xs < x_hi[:, None])
        )

    left_mask = side_mask(lfound, lcent)
    right_mask = side_mask(rfound, rcent)
    detected = jnp.any(left_mask) & jnp.any(right_mask)

    # Centroid list lengths for visualization: the reference appends one
    # centroid per level while a side is active, then deletes the trailing
    # `limit` on abort (lane_tracker.py:391-392).
    def n_centroids(found, active):
        appended = jnp.sum(active.astype(jnp.int32))
        aborted = jnp.any(~active)
        return jnp.where(aborted, appended - limit, appended)

    return SearchResult(
        left_mask=left_mask,
        right_mask=right_mask,
        detected=detected,
        left_centroids=lcent,
        right_centroids=rcent,
        left_n_centroids=n_centroids(lfound, lactive),
        right_n_centroids=n_centroids(rfound, ractive),
    )


def band_search(
    binary: jnp.ndarray,
    left_coeffs: jnp.ndarray,
    right_coeffs: jnp.ndarray,
    cfg: SearchConfig,
) -> SearchResult:
    """Warm-start band search around the previous fit (lane_tracker.py:449-500).

    Keeps every nonzero pixel strictly within ``bandwidth`` of the previous
    frame's polynomial per side; requires both sides non-empty.
    """
    H, W = binary.shape
    bw = float(cfg.bandwidth)
    ignore_bottom = int(cfg.ignore_bottom)
    # 2017-NumPy truncation semantics for the partial crop
    # (lane_tracker.py:465-466): rows < int(H*(1-partial)) are zeroed.
    top_cut = int(H * (1 - cfg.partial))

    ys = jnp.arange(H, dtype=jnp.float32)
    row_ok = (jnp.arange(H) >= top_cut) & (jnp.arange(H) < H - ignore_bottom)

    def poly(coeffs):
        return coeffs[0] * ys * ys + coeffs[1] * ys + coeffs[2]

    lx = poly(left_coeffs.astype(jnp.float32))
    rx = poly(right_coeffs.astype(jnp.float32))
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    nz = (binary > 0) & row_ok[:, None]
    left_mask = nz & (xs > (lx - bw)[:, None]) & (xs < (lx + bw)[:, None])
    right_mask = nz & (xs > (rx - bw)[:, None]) & (xs < (rx + bw)[:, None])
    detected = jnp.any(left_mask) & jnp.any(right_mask)
    nlevels = max(int((cfg.partial * (H - ignore_bottom)) / cfg.window_height), 1)
    zeros = jnp.zeros((nlevels,), jnp.int32)
    return SearchResult(
        left_mask=left_mask,
        right_mask=right_mask,
        detected=detected,
        left_centroids=zeros,
        right_centroids=zeros,
        left_n_centroids=jnp.int32(0),
        right_n_centroids=jnp.int32(0),
    )
