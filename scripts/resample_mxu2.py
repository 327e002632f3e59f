"""Banded MXU matmul warp, v2 — DEMOTED to scripts/ (round-3 post-mortem).

The banded matmul warp was the round-2 'mxu' pipeline option.  It is a
correct, memory-cheap (~25 MB) MXU formulation of the fused
undistort+perspective resample, but it lost on BOTH axes that would have
justified keeping it in the product:

* Speed: 685.7 fps end-to-end vs 759.2 for the packed-gather warp — the
  128-aligned (T, 640) t1 band DMAs per output row bound pass 2, and
  feeding pass 2 from VMEM would require t1 tiles an order of magnitude
  larger than VMEM allows at production T.
* Fidelity: it implements the ONE-PASS fused resampling map, and round-3
  corpus testing showed any fused shortcut breaks reference parity (the
  fused gather flipped 2-25% of filter white pixels; curve RMSE up to
  147 px on marginal frames).  The benched 'fast' pipeline now uses the
  reference's exact two-stage chain, which this design cannot express
  without giving up its banded structure.

Kept here as a runnable artifact of the design space (still imports and
interprets on CPU; the __main__ probe checks it against the gather path).

--- original docstring ---

Replaces the round-1 dense MxuWarp, which stored the two-pass
interpolation tensors in full — ~4.8 GB of bf16 weights in HBM and
minutes of host build for a 2-tap-sparse operator — for a ~5% end-to-end
win.  This version keeps the same curved two-pass decomposition of the
fused undistort+perspective warp (generalized Catmull/Smith; reference
call sites lane_tracker.py:832-834) but stores only the BAND STRUCTURE:

  pass 1 (vertical): t1[z, xs] = lerp of source column xs at the row
      where output-row-z's preimage curve crosses it.  Executed as ONE
      packed gather: the vertical 2-tap pair of BOTH channels rides in a
      single uint32 word per source pixel (same trick as
      kernels/resample.py's horizontal pair gather).  Grid: y0/weights,
      (Ho, Ws) each.
  pass 2 (horizontal): out[z, w] = lerp of t1[z] at the fused grid's
      sx(z, w).  Executed as a Pallas MXU kernel: grid over (z, 128-wide
      output tiles); each program DMAs the t1 band both channels need,
      materializes the (BAND, 128) 2-tap weight tile IN KERNEL from
      x0/fx, and runs two (T, BAND) @ (BAND, 128) matmuls.  Weights
      resident: x0 + 2 weight planes, (Ho, Wo) each — ~15 MB total.

Quality: identical sample points to the dense version; t1 and the matmul
run in f32, within +-2 intensity units of the gather path at full
geometry (tests/test_resample.py, tests/test_tracker.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lane_tracker_tpu.calib.undistort import distort_points, fused_undistort_warp_coords

LANE = 128


def _curve_y_at_cols(cam_matrix, dist_coeffs, M, src_size, dst_size,
                     oversample=2, margin=2200):
    """ys(z, xs): where output row z's preimage curve crosses each integer
    source column (NaN outside the monotone field-of-view segment).

    The curve is parameterized by continuous output x', trimmed to its
    maximal monotone segment (distortion fold-back appears beyond the
    field of view), and interpolated at integer columns; float64 host math.
    """
    Ws = int(src_size[0])
    Wo, Ho = int(dst_size[0]), int(dst_size[1])
    xs_par = np.arange(-margin, Wo + margin, 1.0 / oversample, dtype=np.float64)
    Minv = np.linalg.inv(np.asarray(M, dtype=np.float64))
    X, Y = np.meshgrid(xs_par, np.arange(Ho, dtype=np.float64))
    w = Minv[2, 0] * X + Minv[2, 1] * Y + Minv[2, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_w = np.where(np.abs(w) > 1e-9, 1.0 / w, np.nan)
    ux = (Minv[0, 0] * X + Minv[0, 1] * Y + Minv[0, 2]) * inv_w
    uy = (Minv[1, 0] * X + Minv[1, 1] * Y + Minv[1, 2]) * inv_w
    csx, csy = distort_points(cam_matrix, dist_coeffs, ux, uy)

    cols = np.arange(Ws, dtype=np.float64)
    n_samples = csx.shape[1]
    center = n_samples // 2
    ys = np.full((Ho, Ws), np.nan)
    for z in range(Ho):
        rx, ry = csx[z], csy[z]
        finite = np.isfinite(rx) & np.isfinite(ry)
        d = np.diff(rx)
        good = finite[:-1] & finite[1:] & (d > 0)
        bad_left = np.flatnonzero(~good[:center])
        lo = int(bad_left[-1]) + 1 if bad_left.size else 0
        bad_right = np.flatnonzero(~good[center:])
        hi = center + int(bad_right[0]) if bad_right.size else n_samples - 1
        rx, ry = rx[lo:hi + 1], ry[lo:hi + 1]
        if rx.size < 2:
            continue
        ys[z] = np.interp(cols, rx, ry, left=np.nan, right=np.nan)
    return ys


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MxuWarp2:
    """Device-resident banded matmul warp."""

    v_base: jnp.ndarray  # (Ho, Ws) i32 — flat y0*Ws + xs (clipped)
    v_w0: jnp.ndarray  # (Ho, Ws) f32 — 1-fy (0 where out of range)
    v_w1: jnp.ndarray  # (Ho, Ws) f32 — fy
    wpack: jnp.ndarray  # (Ho, n_tiles, 4, LANE) f32 — per-tile [x0, w0, w1, 0]
    tile_base: jnp.ndarray  # (Ho * n_tiles,) i32 — per-tile band start
    geom: tuple  # (Ws, Hs, Wo, Ho, band) static

    def tree_flatten(self):
        return (
            (self.v_base, self.v_w0, self.v_w1, self.wpack, self.tile_base),
            self.geom,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, geom=aux)

    @classmethod
    def build(cls, cam_matrix, dist_coeffs, M, src_size, dst_size,
              band: int = 640) -> "MxuWarp2":
        Ws, Hs = int(src_size[0]), int(src_size[1])
        Wo, Ho = int(dst_size[0]), int(dst_size[1])
        # Pass-2 DMA slices are lane-dimension slices of the t1 planes, so
        # both the band length and every tile_base must be LANE-aligned;
        # __call__ pads the t1 planes to Ws_pad columns so base + band
        # stays in bounds even when Ws is not a multiple of LANE.
        Ws_pad = -(-Ws // LANE) * LANE
        band = min(-(-int(band) // LANE) * LANE, Ws_pad)
        Wo_pad = -(-Wo // LANE) * LANE
        n_tiles = Wo_pad // LANE

        # ---- pass 1: vertical taps along the preimage curves ----
        ys = _curve_y_at_cols(cam_matrix, dist_coeffs, M, src_size, dst_size)
        valid = np.isfinite(ys)
        ys_safe = np.where(valid, ys, 0.0)
        y0 = np.floor(ys_safe)
        fy = (ys_safe - y0).astype(np.float32)
        # Per-tap validity, then remap onto the CLIPPED 2-slot window (an
        # edge pair keeps its in-bounds tap in the matching slot —
        # kernels/resample.py does the same for its 2x2 windows).
        w_tap0 = np.where(valid & (y0 >= 0) & (y0 <= Hs - 1), 1.0 - fy, 0.0)
        w_tap1 = np.where(valid & (y0 + 1 >= 0) & (y0 + 1 <= Hs - 1), fy, 0.0)
        w0 = np.where(y0 < 0, w_tap1, np.where(y0 > Hs - 2, 0.0, w_tap0))
        w1 = np.where(y0 < 0, 0.0, np.where(y0 > Hs - 2, w_tap0, w_tap1))
        y0c = np.clip(y0, 0, Hs - 2).astype(np.int64)
        xs = np.arange(Ws)[None, :]
        v_base = (y0c * Ws + xs).astype(np.int32)

        # ---- pass 2: horizontal taps from the exact fused grid ----
        gsx, _ = fused_undistort_warp_coords(
            cam_matrix, dist_coeffs, M, src_size, dst_size)
        # Pad columns edge-replicate the coordinate (keeps each tile's tap
        # band tight) but never carry weight.
        sx = np.concatenate(
            [gsx, np.repeat(gsx[:, -1:], Wo_pad - Wo, axis=1)], axis=1)
        finx = np.isfinite(sx)
        finx[:, Wo:] = False
        sx_safe = np.where(np.isfinite(sx), sx, 0.0)
        x0 = np.floor(sx_safe)
        fx = (sx_safe - x0).astype(np.float32)
        h_tap0 = np.where(finx & (x0 >= 0) & (x0 <= Ws - 1), 1.0 - fx, 0.0)
        h_tap1 = np.where(finx & (x0 + 1 >= 0) & (x0 + 1 <= Ws - 1), fx, 0.0)
        hw0 = np.where(x0 < 0, h_tap1, np.where(x0 > Ws - 2, 0.0, h_tap0))
        hw1 = np.where(x0 < 0, 0.0, np.where(x0 > Ws - 2, h_tap0, h_tap1))
        x0c = np.clip(x0, 0, Ws - 2).astype(np.int64)

        # Per-(z, tile) band start, 128-aligned (Mosaic DMA slices on the
        # lane dimension must be tile-aligned); assert coverage.
        tile_base = np.zeros((Ho, n_tiles), np.int64)
        for j in range(n_tiles):
            seg = x0c[:, j * LANE:(j + 1) * LANE]
            lo = (seg.min(axis=1) // LANE) * LANE
            hi = seg.max(axis=1) + 1
            assert int((hi - lo).max()) + 1 <= band, (
                f"band {band} too small: needs {(hi - lo).max() + 1}")
            # lo is already LANE-aligned; the upper clip bound is too
            # (Ws_pad and band are both LANE multiples), so the
            # pl.multiple_of(base, LANE) hint in _pass2_kernel holds for
            # every source width.
            tile_base[:, j] = np.clip(lo, 0, max(Ws_pad - band, 0))

        # Pack the pass-2 tile data [x0 (as f32, exact <= Ws), w0, w1, 0]
        # into one DMA-able plane: Mosaic's block mappings reject (1, 128)
        # VMEM blocks, so the kernel copies each tile's (4, 128) slab via
        # an explicit DMA instead.
        wpack = np.zeros((Ho, n_tiles, 4, LANE), np.float32)
        wpack[:, :, 0, :] = x0c.reshape(Ho, n_tiles, LANE)
        wpack[:, :, 1, :] = hw0.reshape(Ho, n_tiles, LANE)
        wpack[:, :, 2, :] = hw1.reshape(Ho, n_tiles, LANE)
        return cls(
            v_base=jnp.asarray(v_base),
            v_w0=jnp.asarray(w0.astype(np.float32)),
            v_w1=jnp.asarray(w1.astype(np.float32)),
            wpack=jnp.asarray(wpack),
            tile_base=jnp.asarray(tile_base.reshape(-1).astype(np.int32)),
            geom=(Ws, Hs, Wo, Ho, int(band)),
        )

    # ---- pass 1: packed vertical pair gather (both channels) ----

    def _pass1(self, r: jnp.ndarray, b: jnp.ndarray):
        Ws, Hs, Wo, Ho, band = self.geom
        rw = r.astype(jnp.uint32)
        bw = b.astype(jnp.uint32)
        r_dn = jnp.concatenate([rw[1:], jnp.zeros((1, Ws), jnp.uint32)], axis=0)
        b_dn = jnp.concatenate([bw[1:], jnp.zeros((1, Ws), jnp.uint32)], axis=0)
        packed = (rw | (r_dn << 8) | (bw << 16) | (b_dn << 24)).reshape(-1)
        taps = jnp.take(packed, self.v_base, axis=0)

        def lerp(t0, t1):
            return (t0.astype(jnp.float32) * self.v_w0
                    + t1.astype(jnp.float32) * self.v_w1)

        t1r = lerp(taps & 0xFF, (taps >> 8) & 0xFF)
        t1b = lerp((taps >> 16) & 0xFF, (taps >> 24) & 0xFF)
        return t1r, t1b

    def __call__(self, imgs: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
        """Warp a (2, H_src, W_src) uint8 channel pair or a (T, 2, H, W)
        batch to (..., 2, H_out, W_out) uint8.

        NOT vmappable (the pass-2 Pallas grid batches natively over T);
        the chunk pipeline calls it on whole batches."""
        if interpret is None:
            # Mosaic only exists on TPU backends; CPU runs interpreted.
            interpret = jax.devices()[0].platform == "cpu"
        if imgs.ndim == 3:
            out = self(imgs[None], interpret=interpret)
            return out[0]
        Ws, Hs, Wo, Ho, band = self.geom
        t1r, t1b = jax.vmap(lambda fr: self._pass1(fr[0], fr[1]))(imgs)
        # (T, Ho, Ws) -> (Ho, T, Ws): pass-2 DMAs a (T, band) slab per
        # output row, which must be the (full, lane-aligned) last two dims.
        t1r = jnp.transpose(t1r, (1, 0, 2))
        t1b = jnp.transpose(t1b, (1, 0, 2))
        Ws_pad = -(-Ws // LANE) * LANE
        if Ws_pad != Ws:
            # Zero columns never carry weight (hw0/hw1 are 0 there), they
            # only keep every tile_base + band DMA read in bounds.
            pad = ((0, 0), (0, 0), (0, Ws_pad - Ws))
            t1r = jnp.pad(t1r, pad)
            t1b = jnp.pad(t1b, pad)
        out = _pass2_call(
            t1r, t1b, self.wpack, self.tile_base, self.geom, interpret,
        )
        return out[..., :Wo]


def _pass2_kernel(base_ref, t1r_hbm, t1b_hbm, wpack_hbm,
                  out_ref, sr, sb, sw, sem, *, band, T, n_tiles):
    z = pl.program_id(0)
    j = pl.program_id(1)
    base = pl.multiple_of(base_ref[z * n_tiles + j], LANE)

    cpr = pltpu.make_async_copy(
        t1r_hbm.at[z, :, pl.ds(base, band)], sr, sem.at[0])
    cpb = pltpu.make_async_copy(
        t1b_hbm.at[z, :, pl.ds(base, band)], sb, sem.at[1])
    cpw = pltpu.make_async_copy(wpack_hbm.at[z, j], sw, sem.at[2])
    cpr.start()
    cpb.start()
    cpw.start()

    cpw.wait()
    # Materialize the (band, LANE) two-tap weight tile from x0/fx.
    xs_ids = jax.lax.broadcasted_iota(jnp.int32, (band, LANE), 0) + base
    x0 = sw[0, :].astype(jnp.int32)  # (LANE,) exact: values <= Ws < 2^24
    w0 = sw[1, :]
    w1 = sw[2, :]
    wt = jnp.where(xs_ids == x0[None, :], w0[None, :], 0.0) + jnp.where(
        xs_ids == x0[None, :] + 1, w1[None, :], 0.0)

    cpr.wait()
    cpb.wait()

    def emit(scr, out_slot):
        acc = jnp.dot(scr[:, :], wt, preferred_element_type=jnp.float32)
        # Mosaic cannot cast f32->u8 directly; round through i32.
        out_ref[out_slot, 0, :, :] = jnp.clip(
            jnp.rint(acc), 0, 255).astype(jnp.int32).astype(jnp.uint8)

    emit(sr, 0)
    emit(sb, 1)


def _pass2_call(t1r, t1b, wpack, tile_base, geom, interpret=False):
    Ws, Hs, Wo, Ho, band = geom
    T = t1r.shape[1]  # layout (Ho, T, Ws)
    n_tiles = wpack.shape[1]
    Wo_pad = n_tiles * LANE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Ho, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        # Output laid out (2, Ho, T, Wo_pad) so the block's LAST TWO dims
        # are (T, LANE) — Mosaic requires those divisible by (8, 128) or
        # full; the (T, 2, Ho, Wo) consumer order is a cheap transpose.
        out_specs=pl.BlockSpec(
            (2, 1, T, LANE), lambda z, j, b: (0, z, 0, j)),
        scratch_shapes=[
            pltpu.VMEM((T, band), jnp.float32),
            pltpu.VMEM((T, band), jnp.float32),
            pltpu.VMEM((4, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    kernel = functools.partial(
        _pass2_kernel, band=int(band), T=int(T), n_tiles=int(n_tiles))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, Ho, T, Wo_pad), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(tile_base, t1r, t1b, wpack)
    # (2, Ho, T, Wo_pad) -> (T, 2, Ho, Wo_pad)
    return jnp.transpose(out, (2, 0, 1, 3))
