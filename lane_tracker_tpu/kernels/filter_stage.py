"""Pallas TPU megakernel for the lane-pixel filter stage.

The filter stage (reference: lane_tracker.py:183-240) is the pipeline's
dominant cost: elliptical tophats (29x29, 55x55), bilateral cross
thresholds, the noise mask, and a 5x5 open — ~100 elementwise passes over a
1.2 MP image.  Under plain XLA each fusion boundary can round-trip HBM;
this kernel runs the whole chain over VMEM-resident row blocks, so HBM
traffic collapses to reading the two input channels (with halo overlap)
and writing the binary output.

Kernel structure:
  * Grid over output row blocks.  Each program DMAs its block plus a
    +-HALO row halo from HBM (start clamped at the image edges), computes
    entirely in VMEM, and writes its BLOCK rows.  HALO covers the chain's
    total vertical support (27+27 tophat55 + 65 threshold + 2+2 open = 123).
  * All compute is int32 — Mosaic's vector rotate (the shift primitive)
    is 32-bit only.  Shifts are circular ``pltpu.roll`` + an array-bounds
    mask substituting the stage's neutral element.
  * Columns carry static margins (>= 66 each side, lane-aligned) so pow2
    window aggregates are never read at out-of-array positions; each
    stage first overwrites out-of-image positions with its neutral
    (255 for erode, 0 for dilate/sums), which reproduces OpenCV border
    semantics exactly and confines roll wraparound to the margins.
  * Morphology streams the pow2 min/max pyramid level by level; the cross
    threshold's directional sums use binary decomposition of ``ksize``
    over a shared doubling aggregate.

Semantics are identical to the XLA ops (ops/filters.py 'bilateral' path),
which are themselves bit-exact against OpenCV; parity is pinned by tests
in interpret mode and on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lane_tracker_tpu.ops.morphology import ellipse_runs

BLOCK = 128  # output rows per grid program
HALO = 128  # input halo rows each side (>= 123 = total vertical support)
IN_ROWS = BLOCK + 2 * HALO
ROW_MARGIN = HALO  # top padding so pow2 aggregates never index above row 0
COL_MARGIN = 128  # left column margin (>= 66 = max single-stage col reach)
_MAX_COL_REACH = 66


def _round_up(x, m):
    return -(-x // m) * m


def _shift_fill(x, axis, d, fill):
    """out(i) = x(i + d) along ``axis``; out-of-array positions = fill."""
    if d == 0:
        return x
    n = x.shape[axis]
    rolled = pltpu.roll(x, (-d) % n, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    mask = idx < n - d if d > 0 else idx >= -d
    return jnp.where(mask, rolled, jnp.int32(fill))


def _segments(dys):
    segs = []
    start = prev = dys[0]
    for d in dys[1:]:
        if d == prev + 1:
            prev = d
        else:
            segs.append((start, prev))
            start = prev = d
    segs.append((start, prev))
    return segs


def _grow(g, glen, target, axis, op, fill):
    while glen * 2 <= target:
        g = op(g, _shift_fill(g, axis, glen, fill))
        glen *= 2
    return g, glen


def _window(g, axis, lo, hi, p, op, fill):
    """op over offsets [lo, hi] from the pow2 aggregate of length p."""
    a = _shift_fill(g, axis, lo, fill)
    if p == hi - lo + 1:
        return a
    return op(a, _shift_fill(g, axis, hi - p + 1, fill))


def _morph_ellipse(x, ksize, op, neutral, in_image):
    """Erosion/dilation by OpenCV's elliptical SE (int32, streamed)."""
    x = jnp.where(in_image, x, jnp.int32(neutral))
    by_extent = {}
    for dy, ext in ellipse_runs(ksize):
        by_extent.setdefault(ext, []).append(dy)
    g, glen = x, 1
    out = None
    for ext in sorted(by_extent, key=lambda e: e[1] - e[0]):
        lo, hi = ext
        p = 1 << ((hi - lo + 1).bit_length() - 1)
        g, glen = _grow(g, glen, p, 1, op, neutral)
        h = _window(g, 1, lo, hi, p, op, neutral)
        vg, vglen = h, 1
        for slo, shi in sorted(_segments(sorted(by_extent[ext])),
                               key=lambda s: s[1] - s[0]):
            pv = 1 << ((shi - slo + 1).bit_length() - 1)
            vg, vglen = _grow(vg, vglen, pv, 0, op, neutral)
            seg = _window(vg, 0, slo, shi, pv, op, neutral)
            out = seg if out is None else op(out, seg)
    return out


def _tophat(x, ksize, in_image):
    eroded = _morph_ellipse(x, ksize, jnp.minimum, 255, in_image)
    opened = _morph_ellipse(eroded, ksize, jnp.maximum, 0, in_image)
    return x - opened


def _two_arm_sums(x, axis, k):
    """(before, after) sums of the k elements strictly below/above each
    position along ``axis``; out-of-array contributes 0."""
    g, glen = x, 1
    left = right = None
    l_off, r_off = -k, 1
    rem = k
    while rem:
        if rem & 1:
            la = _shift_fill(g, axis, l_off, 0)
            ra = _shift_fill(g, axis, r_off, 0)
            left = la if left is None else left + la
            right = ra if right is None else right + ra
            l_off += glen
            r_off += glen
        rem >>= 1
        if rem:
            g = g + _shift_fill(g, axis, glen, 0)
            glen *= 2
    return left, right


def _cross_threshold(feat, k, C, in_image):
    """Boolean bilateral cross-threshold (mode='floor'), int32 exact."""
    x = jnp.where(in_image, feat, 0)
    thresh = k * x - jnp.int32(C * k)  # pass iff arm sum < this
    lsum, rsum = _two_arm_sums(x, 1, k)
    usum, dsum = _two_arm_sums(x, 0, k)
    return ((lsum < thresh) & (rsum < thresh)) | ((usum < thresh) & (dsum < thresh))


def _filter_kernel(
    r_hbm,
    b_hbm,
    out_ref,
    scr_r,
    scr_b,
    sem_r,
    sem_b,
    *,
    h_img,
    w_img,
    h_pad,
    ksize_r,
    C_r,
    ksize_b,
    C_b,
    mask_noise,
    ksize_noise,
    C_noise,
    noise_thresh,
):
    i = pl.program_id(0)
    # The padded array carries ROW_MARGIN rows above the image and HALO
    # below (h_pad = (grid+2)*BLOCK), so the window for output block i
    # starts exactly at padded row i*BLOCK — no clamping, and pow2
    # aggregates are never read at negative positions.
    s = i * BLOCK
    cp_r = pltpu.make_async_copy(r_hbm.at[pl.ds(s, IN_ROWS), :], scr_r, sem_r)
    cp_b = pltpu.make_async_copy(b_hbm.at[pl.ds(s, IN_ROWS), :], scr_b, sem_b)
    cp_r.start()
    cp_b.start()
    cp_r.wait()
    cp_b.wait()

    w_pad = scr_r.shape[1]
    grow = jax.lax.broadcasted_iota(jnp.int32, (IN_ROWS, w_pad), 0) + s - ROW_MARGIN
    cols = jax.lax.broadcasted_iota(jnp.int32, (IN_ROWS, w_pad), 1)
    in_image = (
        (grow >= 0)
        & (grow < h_img)
        & (cols >= COL_MARGIN)
        & (cols < COL_MARGIN + w_img)
    )

    r = scr_r[:].astype(jnp.int32)
    b = scr_b[:].astype(jnp.int32)

    r_th = _cross_threshold(_tophat(r, 29, in_image), ksize_r, C_r, in_image)
    b_th = _cross_threshold(_tophat(b, 55, in_image), ksize_b, C_b, in_image)
    merged = r_th | b_th
    if mask_noise:
        is_noise = jnp.where(in_image, b, 0) >= noise_thresh
        keep = (~is_noise) | _cross_threshold(b, ksize_noise, C_noise, in_image)
        merged = merged & keep
    merged_i = jnp.where(merged & in_image, jnp.int32(255), jnp.int32(0))
    eroded = _morph_ellipse(merged_i, 5, jnp.minimum, 255, in_image)
    opened = _morph_ellipse(eroded, 5, jnp.maximum, 0, in_image)

    # Output rows sit at a fixed offset in the window: [ROW_MARGIN, +BLOCK).
    out_ref[:] = opened[ROW_MARGIN : ROW_MARGIN + BLOCK, :].astype(jnp.uint8)


def filter_stage_pallas(
    rgb_r: jnp.ndarray,
    lab_b: jnp.ndarray,
    ksize_r: int = 25,
    C_r: int = 8,
    ksize_b: int = 35,
    C_b: int = 5,
    mask_noise: bool = False,
    ksize_noise: int = 65,
    C_noise: int = 10,
    noise_thresh: int = 135,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bilateral-mode filter stage as a fused row-blocked VMEM kernel.

    Same contract as ops.filters.filter_lane_points_channels with
    filter_type='bilateral'.
    """
    H, W = rgb_r.shape
    grid = -(-H // BLOCK)
    h_pad = ROW_MARGIN + grid * BLOCK + HALO  # = (grid + 2) * BLOCK
    w_pad = _round_up(COL_MARGIN + W + _MAX_COL_REACH, 128)

    def pad(x):
        out = jnp.zeros((h_pad, w_pad), jnp.uint8)
        return jax.lax.dynamic_update_slice(out, x, (ROW_MARGIN, COL_MARGIN))

    kernel = functools.partial(
        _filter_kernel,
        h_img=int(H),
        w_img=int(W),
        h_pad=int(h_pad),
        ksize_r=int(ksize_r),
        C_r=int(C_r),
        ksize_b=int(ksize_b),
        C_b=int(C_b),
        mask_noise=bool(mask_noise),
        ksize_noise=int(ksize_noise),
        C_noise=int(C_noise),
        noise_thresh=int(noise_thresh),
    )
    out_pad = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((grid * BLOCK, w_pad), jnp.uint8),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK, w_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((IN_ROWS, w_pad), jnp.uint8),
            pltpu.VMEM((IN_ROWS, w_pad), jnp.uint8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(pad(rgb_r), pad(lab_b))
    return out_pad[:H, COL_MARGIN : COL_MARGIN + W]
