import numpy as np
import pytest

import jax

from lane_tracker_tpu.kernels.filter_stage import filter_stage_pallas
from lane_tracker_tpu.ops.filters import filter_lane_points_channels


def _channels(rng, H, W):
    r = rng.integers(0, 256, (H, W), dtype=np.uint8)
    b = rng.integers(0, 256, (H, W), dtype=np.uint8)
    # Add lane-like bright stripes so thresholds actually fire.
    r[:, W // 3 - 2 : W // 3 + 2] = 250
    b[:, 2 * W // 3 - 2 : 2 * W // 3 + 2] = 250
    return r, b


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(ksize_r=25, C_r=8, ksize_b=35, C_b=5, mask_noise=False),
        dict(ksize_r=15, C_r=8, ksize_b=35, C_b=5, mask_noise=True,
             ksize_noise=65, C_noise=10, noise_thresh=140),
    ],
    ids=["plain", "noise_mask"],
)
def test_pallas_filter_matches_xla(kwargs):
    rng = np.random.default_rng(5)
    r, b = _channels(rng, 256, 384)
    expected = np.asarray(
        filter_lane_points_channels(r, b, filter_type="bilateral", **kwargs)
    )
    got = np.asarray(filter_stage_pallas(r, b, interpret=True, **kwargs))
    np.testing.assert_array_equal(expected, got)


def test_pallas_filter_real_frame_size_sample():
    """Full warped geometry through the kernel (interpret mode, cropped to
    keep runtime sane on CPU; the TPU-compiled path is exercised by
    bench/profiling runs)."""
    rng = np.random.default_rng(11)
    r, b = _channels(rng, 300, 1080)
    expected = np.asarray(
        filter_lane_points_channels(
            r, b, filter_type="bilateral", ksize_r=15, C_r=8, ksize_b=35, C_b=5
        )
    )
    got = np.asarray(
        filter_stage_pallas(r, b, ksize_r=15, C_r=8, ksize_b=35, C_b=5,
                            interpret=True)
    )
    np.testing.assert_array_equal(expected, got)
