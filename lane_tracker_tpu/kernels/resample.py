"""Bilinear gather resampling on device.

This is the TPU-native replacement for every per-frame OpenCV resampling in
the reference: ``cv2.undistort`` (lane_tracker.py:832), the bird's-eye
``cv2.warpPerspective`` (lane_tracker.py:834, 1035) and the overlay unwarp
(lane_tracker.py:650).  The host precomputes a fixed-point sampling grid once
(lane_tracker_tpu.calib); at runtime a frame costs exactly one 4-tap gather.

Arithmetic matches OpenCV's fixed-point bilinear scheme (1/32-px coordinate
quantization, 2^15 weight scale, round-to-nearest descale), so outputs are
bit-identical to the reference's resamplers on in-range pixels and reproduce
BORDER_CONSTANT(0) at the edges.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

COEF_BITS = 15
_ROUND = 1 << (COEF_BITS - 1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ResampleGrid:
    """Device-resident fixed-point sampling grid.

    Layout (all (H, W) of the *destination* image):
        flat00: int32 flattened source index of the top-left tap (clamped)
        flat01/flat10/flat11: the other three taps
        w00..w11: int32 bilinear weights (already zeroed for out-of-bounds
                  taps, which implements BORDER_CONSTANT(0))
    """

    flat00: jnp.ndarray
    flat01: jnp.ndarray
    flat10: jnp.ndarray
    flat11: jnp.ndarray
    w00: jnp.ndarray
    w01: jnp.ndarray
    w10: jnp.ndarray
    w11: jnp.ndarray
    src_size: tuple  # (W, H) static

    def tree_flatten(self):
        children = (
            self.flat00,
            self.flat01,
            self.flat10,
            self.flat11,
            self.w00,
            self.w01,
            self.w10,
            self.w11,
        )
        return children, self.src_size

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, src_size=aux)

    @classmethod
    def from_quantized(cls, grid: dict) -> "ResampleGrid":
        """Build from the host-side dict produced by calib.quantize_grid."""
        src_w, src_h = grid["src_size"]
        ix = grid["ix"].astype(np.int64)
        iy = grid["iy"].astype(np.int64)

        def tap(dy, dx, w):
            tx = ix + dx
            ty = iy + dy
            inb = (tx >= 0) & (tx < src_w) & (ty >= 0) & (ty < src_h)
            flat = np.clip(ty, 0, src_h - 1) * src_w + np.clip(tx, 0, src_w - 1)
            weight = np.where(inb, grid[w], 0).astype(grid[w].dtype)
            return flat.astype(np.int32), weight

        f00, w00 = tap(0, 0, "w00")
        f01, w01 = tap(0, 1, "w01")
        f10, w10 = tap(1, 0, "w10")
        f11, w11 = tap(1, 1, "w11")
        return cls(
            jnp.asarray(f00),
            jnp.asarray(f01),
            jnp.asarray(f10),
            jnp.asarray(f11),
            jnp.asarray(w00),
            jnp.asarray(w01),
            jnp.asarray(w10),
            jnp.asarray(w11),
            src_size=(int(src_w), int(src_h)),
        )

    @property
    def dst_shape(self):
        return self.flat00.shape


def bilinear_gather(img: jnp.ndarray, grid: ResampleGrid) -> jnp.ndarray:
    """Resample ``img`` through a precomputed grid.

    Args:
        img: (H, W) or (H, W, C) uint8 source image. H*W must match
            ``grid.src_size``.
        grid: precomputed ResampleGrid.

    Returns:
        uint8 image of shape grid.dst_shape (+ channel dim if present).
    """
    if img.ndim == 3:
        out = [bilinear_gather(img[..., c], grid) for c in range(img.shape[2])]
        return jnp.stack(out, axis=-1)

    if grid.w00.dtype == jnp.float32:
        # Float path (OpenCV >= 5 semantics): f32 weights, round-half-even.
        flat = img.reshape(-1).astype(jnp.float32)
        acc = (
            jnp.take(flat, grid.flat00, axis=0) * grid.w00
            + jnp.take(flat, grid.flat01, axis=0) * grid.w01
            + jnp.take(flat, grid.flat10, axis=0) * grid.w10
            + jnp.take(flat, grid.flat11, axis=0) * grid.w11
        )
        return jnp.clip(jnp.rint(acc), 0, 255).astype(jnp.uint8)

    # Fixed-point path (classic OpenCV remap): 2^15 weights, round-half-up.
    flat = img.reshape(-1).astype(jnp.int32)
    acc = (
        jnp.take(flat, grid.flat00, axis=0) * grid.w00
        + jnp.take(flat, grid.flat01, axis=0) * grid.w01
        + jnp.take(flat, grid.flat10, axis=0) * grid.w10
        + jnp.take(flat, grid.flat11, axis=0) * grid.w11
    )
    out = (acc + _ROUND) >> COEF_BITS
    return jnp.clip(out, 0, 255).astype(jnp.uint8)
