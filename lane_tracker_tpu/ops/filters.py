"""The lane-pixel isolation filter stage.

TPU-native re-design of ``LaneTracker.filter_lane_points``
(lane_tracker.py:183-240): channel extraction (RGB R + LAB B), elliptical
tophat morphology, bilateral-cross or block-mean adaptive thresholding, an
optional greenery noise mask, channel merge, and a 5x5 open.  Everything is
fixed-shape uint8/int32 math so the whole stage fuses under jit and batches
with vmap.

All structuring-element sizes match the reference's hardcoded constants
(lane_tracker.py:203-205): 29x29 for the R channel tophat, 55x55 for the
LAB-B tophat, 5x5 for the final open.
"""

from __future__ import annotations

import jax.numpy as jnp

from lane_tracker_tpu.ops.color import rgb2lab_b_u8
from lane_tracker_tpu.ops.morphology import open_ellipse, tophat_ellipse
from lane_tracker_tpu.ops.threshold import (
    adaptive_mean_threshold,
    bilateral_adaptive_threshold,
    in_range,
)

STREL_LAB_B = 55
STREL_RGB_R = 29
STREL_OPEN = 5

FILTER_BACKENDS = ("auto", "xla", "pallas2")


def resolve_filter_backend(backend: str) -> str:
    """Resolve the filter-stage backend name to 'xla' or 'pallas2'.

    The single source of truth for backend selection (ops and
    tracker/step.py both call this, so the policy cannot diverge).
    'auto' selects the v2 Mosaic stage kernels only on a real TPU
    platform — they are bit-exact and 2x the XLA chain there, but
    Mosaic does not exist on CPU and is untested on GPU backends.
    Unknown names raise (a silent XLA fallback would be an unannounced
    backend change for the caller).
    """
    if backend not in FILTER_BACKENDS:
        raise ValueError(
            f"backend must be one of {FILTER_BACKENDS}, got {backend!r}"
        )
    if backend != "auto":
        return backend
    try:
        import jax

        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - backend init failure
        platform = "cpu"
    # The tunneled TPU plugin reports platform 'tpu'; anything else
    # (cpu, gpu, ...) takes the portable XLA chain.
    return "pallas2" if platform == "tpu" else "xla"


def filter_lane_points_channels(
    rgb_r: jnp.ndarray,
    lab_b: jnp.ndarray,
    filter_type: str = "bilateral",
    ksize_r: int = 25,
    C_r: int = 8,
    ksize_b: int = 35,
    C_b: int = 5,
    mask_noise: bool = False,
    ksize_noise: int = 65,
    C_noise: int = 10,
    noise_thresh: int = 135,
    backend: str = "auto",
    tophat_r: int = STREL_RGB_R,
    tophat_b: int = STREL_LAB_B,
    open_k: int = STREL_OPEN,
) -> jnp.ndarray:
    """Filter stage operating on pre-extracted channels.

    Args:
        rgb_r: (H, W) uint8 R channel of the warped frame.
        lab_b: (H, W) uint8 LAB B channel of the warped frame.
        backend: 'auto' | 'xla' | 'pallas2'. The v2 stage kernels
            (kernels/filter_stage2.py) run the chain VMEM-resident on
            TPU; 'auto' selects them on accelerator platforms.
        (remaining args as documented on LaneTracker.process)

    Returns:
        (H, W) uint8 binary image, 255 = lane candidate.
    """
    # The v2 stage kernels are bit-exact and 1.5-3.4x the XLA chain on
    # TPU hardware (tophats 0.19/0.33 ms, thresholds 0.07-0.12 ms vs
    # 1.68 ms total for XLA) but cannot run off-TPU or under vmap —
    # contexts that vmap the per-frame filter pass 'xla' explicitly.
    backend = resolve_filter_backend(backend)
    if filter_type == "neighborhood" and backend == "pallas2" and not mask_noise:
        # The hardcoded second attempt's configuration (lane_tracker.py:
        # 1081-1099).  With mask_noise the reference's noise logic applies
        # on top; that (rare) combination stays on the XLA chain below.
        from lane_tracker_tpu.kernels.filter_stage2 import neighborhood_stage_v2

        return neighborhood_stage_v2(
            rgb_r, lab_b, ksize_r=ksize_r, C_r=C_r,
            ksize_b=ksize_b, C_b=C_b, open_k=open_k,
        )
    if filter_type == "bilateral" and backend == "pallas2":
        # v2 stage kernels (kernels/filter_stage2.py): VMEM-resident i32,
        # slice shifts, native (T, H, W) batching.  NOT vmappable — the
        # chunk pipeline calls it on whole batches (tracker/step.py
        # front_artifacts_batch); per-frame jit use is fine.
        from lane_tracker_tpu.kernels.filter_stage2 import filter_stage_v2

        return filter_stage_v2(
            rgb_r,
            lab_b,
            ksize_r=ksize_r,
            C_r=C_r,
            ksize_b=ksize_b,
            C_b=C_b,
            mask_noise=mask_noise,
            ksize_noise=ksize_noise,
            C_noise=C_noise,
            noise_thresh=noise_thresh,
            tophat_r=tophat_r,
            tophat_b=tophat_b,
            open_k=open_k,
        )
    if filter_type == "bilateral":
        # Tophat feeds only the bilateral branch (the reference thresholds
        # the *raw* channels in 'neighborhood' mode, lane_tracker.py:216-218).
        r_feat = tophat_ellipse(rgb_r, tophat_r)
        b_feat = tophat_ellipse(lab_b, tophat_b)
        r_thresh = bilateral_adaptive_threshold(r_feat, ksize=ksize_r, C=C_r)
        b_thresh = bilateral_adaptive_threshold(b_feat, ksize=ksize_b, C=C_b)
    elif filter_type == "neighborhood":
        r_thresh = adaptive_mean_threshold(rgb_r, ksize_r, -C_r)
        b_thresh = adaptive_mean_threshold(lab_b, ksize_b, -C_b)
    else:
        raise ValueError("filter_type must be 'bilateral' or 'neighborhood'")

    merged = (r_thresh > 0) | (b_thresh > 0)

    if mask_noise:
        # Greenery suppression: high LAB-B intensity marks noise, but the
        # bilateral pass re-admits the yellow line (lane_tracker.py:221-231).
        noise_part1 = in_range(lab_b, noise_thresh, 255)
        noise_part2 = bilateral_adaptive_threshold(lab_b, ksize=ksize_noise, C=C_noise)
        keep = (~(noise_part1 > 0)) | (noise_part2 > 0)
        merged = merged & keep

    merged_u8 = jnp.where(merged, jnp.uint8(255), jnp.uint8(0))
    return open_ellipse(merged_u8, open_k)


def filter_lane_points(
    warped_rgb: jnp.ndarray,
    filter_type: str = "bilateral",
    ksize_r: int = 25,
    C_r: int = 8,
    ksize_b: int = 35,
    C_b: int = 5,
    mask_noise: bool = False,
    ksize_noise: int = 65,
    C_noise: int = 10,
    noise_thresh: int = 135,
) -> jnp.ndarray:
    """Full-parity filter stage on a warped (H, W, 3) uint8 RGB frame."""
    return filter_lane_points_channels(
        warped_rgb[..., 0],
        rgb2lab_b_u8(warped_rgb),
        filter_type=filter_type,
        ksize_r=ksize_r,
        C_r=C_r,
        ksize_b=ksize_b,
        C_b=C_b,
        mask_noise=mask_noise,
        ksize_noise=ksize_noise,
        C_noise=C_noise,
        noise_thresh=noise_thresh,
    )
