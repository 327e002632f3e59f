import numpy as np
import pytest

from tests.conftest import requires_cv2

from lane_tracker_tpu.calib.homography import perspective_grid
from lane_tracker_tpu.calib.undistort import undistort_grid
from lane_tracker_tpu.kernels.resample import ResampleGrid, bilinear_gather
from lane_tracker_tpu.ops.filters import filter_lane_points


@pytest.fixture(scope="module")
def warped_frame(calib, test_frame):
    """test4.jpg undistorted + warped to bird's-eye via the compat chain."""
    cam, warp = calib
    g1 = ResampleGrid.from_quantized(
        undistort_grid(cam.cam_matrix, cam.dist_coeffs, warp.image_width_height)
    )
    g2 = ResampleGrid.from_quantized(
        perspective_grid(warp.M, warp.image_width_height, warp.warped_width_height)
    )
    return np.asarray(bilinear_gather(bilinear_gather(test_frame, g1), g2))


def _cv2_filter_oracle(
    warped,
    filter_type="bilateral",
    ksize_r=25,
    C_r=8,
    ksize_b=35,
    C_b=5,
    mask_noise=False,
    ksize_noise=65,
    C_noise=10,
    noise_thresh=135,
):
    """Oracle for the filter stage built from cv2 primitives + a direct
    numpy cross-threshold (structured independently of the reference)."""
    import cv2

    from tests.test_threshold import _cross_oracle

    r_chan = warped[:, :, 0]
    b_chan = cv2.cvtColor(warped, cv2.COLOR_RGB2LAB)[:, :, 2]
    if filter_type == "bilateral":
        se_r = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (29, 29))
        se_b = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (55, 55))
        r_feat = cv2.morphologyEx(r_chan, cv2.MORPH_TOPHAT, se_r)
        b_feat = cv2.morphologyEx(b_chan, cv2.MORPH_TOPHAT, se_b)
        r_th = _cross_oracle(r_feat, ksize_r, C_r, "floor")
        b_th = _cross_oracle(b_feat, ksize_b, C_b, "floor")
    else:
        r_th = cv2.adaptiveThreshold(
            r_chan, 255, cv2.ADAPTIVE_THRESH_MEAN_C, cv2.THRESH_BINARY, ksize_r, -C_r
        )
        b_th = cv2.adaptiveThreshold(
            b_chan, 255, cv2.ADAPTIVE_THRESH_MEAN_C, cv2.THRESH_BINARY, ksize_b, -C_b
        )
    merged = (r_th > 0) | (b_th > 0)
    if mask_noise:
        part1 = cv2.inRange(b_chan, noise_thresh, 255)
        part2 = _cross_oracle(b_chan, ksize_noise, C_noise, "floor")
        merged = merged & ((part1 == 0) | (part2 > 0))
    merged_u8 = np.where(merged, 255, 0).astype(np.uint8)
    se_open = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    return cv2.morphologyEx(merged_u8, cv2.MORPH_OPEN, se_open)


@requires_cv2
@pytest.mark.parametrize(
    "kwargs",
    [
        dict(filter_type="bilateral", mask_noise=False),
        dict(filter_type="bilateral", mask_noise=True),
        dict(filter_type="neighborhood", ksize_r=15, C_r=5),
    ],
    ids=["bilateral", "bilateral_noise", "neighborhood"],
)
def test_filter_stage_bit_exact_vs_cv2_oracle(warped_frame, kwargs):
    expected = _cv2_filter_oracle(warped_frame, **kwargs)
    mine = np.asarray(filter_lane_points(warped_frame, **kwargs))
    np.testing.assert_array_equal(expected, mine)


@requires_cv2
def test_filter_stage_white_pixel_plausibility(warped_frame):
    """The binary output must isolate a plausible fraction of lane pixels
    (sanity band around the measured reference behavior on test4.jpg)."""
    out = np.asarray(filter_lane_points(warped_frame, filter_type="bilateral"))
    n_white = int((out > 0).sum())
    total = out.size
    assert 0.01 < n_white / total < 0.25
