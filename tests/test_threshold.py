import numpy as np
import pytest

from tests.conftest import requires_cv2

from lane_tracker_tpu.ops.threshold import (
    adaptive_mean_threshold,
    bilateral_adaptive_threshold,
    in_range,
)


def _cross_oracle(img, k, C, mode):
    """Independent numpy oracle for the cross threshold: direct padded sums."""
    H, W = img.shape
    p = img.astype(np.int64)
    z = np.zeros_like(p)
    padded_h = np.concatenate([np.zeros((H, k)), p, np.zeros((H, k))], axis=1)
    padded_v = np.concatenate([np.zeros((k, W)), p, np.zeros((k, W))], axis=0)
    left = sum(padded_h[:, k - i : k - i + W] for i in range(1, k + 1))
    right = sum(padded_h[:, k + i : k + i + W] for i in range(1, k + 1))
    up = sum(padded_v[k - i : k - i + H, :] for i in range(1, k + 1))
    down = sum(padded_v[k + i : k + i + H, :] for i in range(1, k + 1))
    if mode == "floor":
        hit = ((left < k * (p - C)) & (right < k * (p - C))) | (
            (up < k * (p - C)) & (down < k * (p - C))
        )
    else:
        hit = ((left > k * (p + C)) & (right > k * (p + C))) | (
            (up > k * (p + C)) & (down > k * (p + C))
        )
    return np.where(hit, 255, 0).astype(np.uint8)


@pytest.mark.parametrize("k,C,mode", [(5, 0, "floor"), (25, 8, "floor"), (35, 5, "floor"), (65, 10, "floor"), (7, 3, "ceil")])
def test_bilateral_threshold_vs_numpy_oracle(rng, k, C, mode):
    img = rng.integers(0, 256, (80, 90), dtype=np.uint8)
    mine = np.asarray(bilateral_adaptive_threshold(img, ksize=k, C=C, mode=mode))
    np.testing.assert_array_equal(_cross_oracle(img, k, C, mode), mine)


@requires_cv2
@pytest.mark.parametrize("k,C", [(5, 0), (25, 8), (35, 5), (65, 10)])
def test_bilateral_threshold_vs_cv2_filter2d(rng, k, C):
    """Cross-check against the cv2.filter2D formulation the reference uses."""
    import cv2

    img = rng.integers(0, 256, (64, 77), dtype=np.uint8)
    karr = np.ones((1, k + 1), dtype=np.int16)
    karr[0, -1] = -k
    lt = cv2.filter2D(img, cv2.CV_16S, karr, anchor=(k, 0), delta=C * k,
                      borderType=cv2.BORDER_CONSTANT)
    karr2 = np.ones((1, k + 1), dtype=np.int16)
    karr2[0, 0] = -k
    rt = cv2.filter2D(img, cv2.CV_16S, karr2, anchor=(0, 0), delta=C * k,
                      borderType=cv2.BORDER_CONSTANT)
    ut = cv2.filter2D(img, cv2.CV_16S, karr.T, anchor=(0, k), delta=C * k,
                      borderType=cv2.BORDER_CONSTANT)
    dt = cv2.filter2D(img, cv2.CV_16S, karr2.T, anchor=(0, 0), delta=C * k,
                      borderType=cv2.BORDER_CONSTANT)
    expected = np.where(((lt < 0) & (rt < 0)) | ((ut < 0) & (dt < 0)), 255, 0)
    mine = np.asarray(bilateral_adaptive_threshold(img, ksize=k, C=C))
    np.testing.assert_array_equal(expected.astype(np.uint8), mine)


@requires_cv2
@pytest.mark.parametrize("k,C", [(15, -5), (15, -8), (35, -5), (11, 3)])
def test_adaptive_mean_threshold_matches_cv2(rng, k, C):
    import cv2

    img = rng.integers(0, 256, (100, 140), dtype=np.uint8)
    ref = cv2.adaptiveThreshold(
        img, 255, cv2.ADAPTIVE_THRESH_MEAN_C, cv2.THRESH_BINARY, k, C
    )
    mine = np.asarray(adaptive_mean_threshold(img, k, C))
    np.testing.assert_array_equal(ref, mine)


@requires_cv2
def test_adaptive_mean_threshold_real_frame(test_frame):
    import cv2

    r = test_frame[:, :, 0]
    ref = cv2.adaptiveThreshold(
        r, 255, cv2.ADAPTIVE_THRESH_MEAN_C, cv2.THRESH_BINARY, 15, -5
    )
    mine = np.asarray(adaptive_mean_threshold(r, 15, -5))
    np.testing.assert_array_equal(ref, mine)


@requires_cv2
def test_in_range_matches_cv2(rng):
    import cv2

    img = rng.integers(0, 256, (50, 60), dtype=np.uint8)
    np.testing.assert_array_equal(
        cv2.inRange(img, 135, 255), np.asarray(in_range(img, 135, 255))
    )
