import numpy as np
import pytest

from tests.conftest import requires_cv2

from lane_tracker_tpu.ops.morphology import (
    dilate_ellipse,
    ellipse_runs,
    erode_ellipse,
    open_ellipse,
    tophat_ellipse,
)


@requires_cv2
@pytest.mark.parametrize("ksize", [3, 5, 7, 15, 29, 55])
def test_ellipse_footprint_matches_cv2(ksize):
    import cv2

    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize))
    mine = np.zeros((ksize, ksize), dtype=np.uint8)
    c = ksize // 2
    for dy, (lo, hi) in ellipse_runs(ksize):
        mine[dy + c, lo + c : hi + c + 1] = 1
    np.testing.assert_array_equal(se, mine)


@requires_cv2
@pytest.mark.parametrize("ksize", [5, 29, 55])
def test_erode_dilate_match_cv2(rng, ksize):
    import cv2

    img = rng.integers(0, 256, (97, 131), dtype=np.uint8)
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize))
    np.testing.assert_array_equal(
        cv2.erode(img, se), np.asarray(erode_ellipse(img, ksize))
    )
    np.testing.assert_array_equal(
        cv2.dilate(img, se), np.asarray(dilate_ellipse(img, ksize))
    )


@requires_cv2
@pytest.mark.parametrize("ksize", [5, 29, 55])
def test_open_tophat_match_cv2(rng, ksize):
    import cv2

    img = rng.integers(0, 256, (120, 160), dtype=np.uint8)
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize))
    np.testing.assert_array_equal(
        cv2.morphologyEx(img, cv2.MORPH_OPEN, se), np.asarray(open_ellipse(img, ksize))
    )
    np.testing.assert_array_equal(
        cv2.morphologyEx(img, cv2.MORPH_TOPHAT, se),
        np.asarray(tophat_ellipse(img, ksize)),
    )


@requires_cv2
def test_tophat_on_real_frame(test_frame):
    import cv2

    r = test_frame[:, :, 0]
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (29, 29))
    np.testing.assert_array_equal(
        cv2.morphologyEx(r, cv2.MORPH_TOPHAT, se), np.asarray(tophat_ellipse(r, 29))
    )
