"""Adaptive thresholding ops for lane-pixel isolation.

TPU-native equivalents of the reference's thresholding stage:

* :func:`bilateral_adaptive_threshold` — the cross-kernel threshold the
  reference builds from four ``cv2.filter2D`` passes (lane_tracker.py:14-83).
  A pixel passes iff it is brighter (mode='floor') than the mean of BOTH the
  left and right arms, or BOTH the up and down arms, of a 1-px-thick cross of
  radius ``ksize``, by margin ``C``.  Here each directional sum comes from a
  prefix-sum difference (exact int32), so the whole op is a couple of cumsums
  plus elementwise logic — no convolutions at all.

* :func:`adaptive_mean_threshold` — ``cv2.adaptiveThreshold`` with
  ADAPTIVE_THRESH_MEAN_C / THRESH_BINARY (lane_tracker.py:217-218),
  including OpenCV's replicate-border box mean and its exact uint8 rounding.

* :func:`in_range` — ``cv2.inRange`` for the noise mask
  (lane_tracker.py:223).
"""

from __future__ import annotations

import jax.numpy as jnp


def _directional_sums(img_i32: jnp.ndarray, k: int):
    """Sums of the k pixels strictly left/right/up/down of each pixel.

    Out-of-image pixels contribute 0 (the reference's BORDER_CONSTANT
    zero-padding in its filter2D calls, lane_tracker.py:73-76).
    """
    H, W = img_i32.shape
    zeros_h = jnp.zeros((H, k + 1), jnp.int32)
    zeros_v = jnp.zeros((k + 1, W), jnp.int32)

    cs_x = jnp.cumsum(img_i32, axis=1)
    P = jnp.concatenate([zeros_h, cs_x], axis=1)  # P[:, t+k+1] = S(t), S(<0)=0
    left = P[:, k : k + W] - P[:, 0:W]
    Q = jnp.concatenate([cs_x, jnp.repeat(cs_x[:, -1:], k, axis=1)], axis=1)
    right = Q[:, k : k + W] - cs_x

    cs_y = jnp.cumsum(img_i32, axis=0)
    Pv = jnp.concatenate([zeros_v, cs_y], axis=0)
    up = Pv[k : k + H, :] - Pv[0:H, :]
    Qv = jnp.concatenate([cs_y, jnp.repeat(cs_y[-1:, :], k, axis=0)], axis=0)
    down = Qv[k : k + H, :] - cs_y

    return left, right, up, down


def bilateral_adaptive_threshold(
    img: jnp.ndarray,
    ksize: int = 30,
    C: int = 0,
    mode: str = "floor",
    true_value: int = 255,
    false_value: int = 0,
) -> jnp.ndarray:
    """Cross-kernel adaptive threshold on a single-channel uint8 image.

    Pass condition (mode='floor'): ``sum_left - k*p + C*k < 0`` AND the same
    for the right arm, OR both vertical arms — i.e. the pixel beats the mean
    of both opposing arms by more than C.  Integer-exact parity with the
    reference's int16 filter2D formulation.
    """
    if mode not in ("floor", "ceil"):
        raise ValueError("mode must be 'floor' or 'ceil'")
    k = int(ksize)
    p = img.astype(jnp.int32)
    left, right, up, down = _directional_sums(p, k)
    delta = C * k if mode == "floor" else -C * k
    kp = k * p
    tl = left - kp + delta
    tr = right - kp + delta
    tu = up - kp + delta
    td = down - kp + delta
    if mode == "floor":
        hit = ((tl < 0) & (tr < 0)) | ((tu < 0) & (td < 0))
    else:
        hit = ((tl > 0) & (tr > 0)) | ((tu > 0) & (td > 0))
    return jnp.where(hit, jnp.uint8(true_value), jnp.uint8(false_value))


def _box_mean_replicate_u8(img: jnp.ndarray, k: int) -> jnp.ndarray:
    """Normalized k x k box mean with replicate border, OpenCV-exact rounding.

    Rounds half-to-even like cvRound, implemented in pure integer math.
    """
    r = (k - 1) // 2
    H, W = img.shape
    padded = jnp.pad(img.astype(jnp.int32), ((r, r), (r, r)), mode="edge")
    cs = jnp.cumsum(jnp.cumsum(padded, axis=0), axis=1)
    # Integral image with a zero row/col prepended.
    I = jnp.pad(cs, ((1, 0), (1, 0)))
    s = I[k : k + H, k : k + W] - I[0:H, k : k + W] - I[k : k + H, 0:W] + I[0:H, 0:W]
    area = k * k
    q = s // area
    rem = s - q * area
    twice = 2 * rem
    roundup = (twice > area) | ((twice == area) & (q % 2 == 1))
    return (q + roundup.astype(jnp.int32)).astype(jnp.int32)


def adaptive_mean_threshold(
    img: jnp.ndarray,
    ksize: int,
    C: int,
    max_value: int = 255,
) -> jnp.ndarray:
    """``cv2.adaptiveThreshold(img, max_value, MEAN_C, BINARY, ksize, C)``.

    Threshold: dst = max_value where ``src - mean > -ceil(C)`` else 0.
    The reference calls this with C negated (lane_tracker.py:217-218), i.e.
    pixel must beat the block mean by more than C_r.
    """
    mean = _box_mean_replicate_u8(img, int(ksize))
    # OpenCV: idelta = ceil(C) for THRESH_BINARY; all call sites pass ints.
    idelta = int(C)
    hit = img.astype(jnp.int32) - mean > -idelta
    return jnp.where(hit, jnp.uint8(max_value), jnp.uint8(0))


def in_range(img: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    """``cv2.inRange`` for scalars: 255 where lo <= img <= hi else 0."""
    hit = (img >= jnp.uint8(lo)) & (img <= jnp.uint8(hi))
    return jnp.where(hit, jnp.uint8(255), jnp.uint8(0))
