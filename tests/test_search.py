import importlib.util
import pathlib
import sys

import numpy as np
import pytest

from lane_tracker_tpu.ops.search import band_search, sliding_window_search
from lane_tracker_tpu.tracker.config import SearchConfig

REF = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def ref_module():
    """Import the reference implementation as a black-box oracle."""
    if not (REF / "lane_tracker.py").exists():
        pytest.skip("reference checkout not available")
    sys.path.insert(0, str(REF))
    spec = importlib.util.spec_from_file_location(
        "ref_lane_tracker", REF / "lane_tracker.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def ref_tracker(ref_module, calib):
    cam, warp = calib
    return ref_module.LaneTracker(
        warp.image_width_height,
        warp.warped_width_height,
        cam.cam_matrix,
        cam.dist_coeffs,
        (warp.M, warp.Minv),
        (warp.mppv, warp.mpph),
    )


def _synthetic_binary(rng, H=1100, W=1080, curve=0.0, dash=None, noise=0.001,
                      lx0=460.0, rx0=680.0):
    """Two quadratic lane stripes + sparse noise, optionally dashed."""
    img = np.zeros((H, W), np.uint8)
    ys = np.arange(H)
    for x0 in (lx0, rx0):
        xc = (x0 + curve * (ys - H) ** 2 / H).astype(int)
        for dx in range(-3, 4):
            xs = np.clip(xc + dx, 0, W - 1)
            img[ys, xs] = 255
    if dash is not None:
        period, duty = dash
        keep = (ys // period) % duty == 0
        img[~keep] = 0
    mask = rng.random((H, W)) < noise
    img[mask] = 255
    return img


def _coords_from_mask(mask):
    yy, xx = np.nonzero(np.asarray(mask))
    return set(zip(yy.tolist(), xx.tolist()))


def _coords_from_ref(y, x):
    return set(zip(np.asarray(y).tolist(), np.asarray(x).tolist()))


SWS_CASES = [
    dict(),  # defaults
    dict(no_success_limit=50),
    dict(partial=0.5),
    dict(mu=0.5, search_range=35),
    dict(window_width=50, window_height=25),
    dict(start_slice=0.5, ignore_sides=100, ignore_bottom=0),
]


@pytest.mark.parametrize("overrides", SWS_CASES)
@pytest.mark.parametrize("scene", ["solid", "dashed", "curved", "noise_only", "empty", "left_empty"])
def test_sliding_window_matches_reference(ref_tracker, overrides, scene):
    import zlib

    rng = np.random.default_rng(
        zlib.crc32(repr((scene, sorted(overrides.items()))).encode())
    )
    if scene == "solid":
        img = _synthetic_binary(rng)
    elif scene == "dashed":
        img = _synthetic_binary(rng, dash=(40, 3), noise=0.0005)
    elif scene == "curved":
        img = _synthetic_binary(rng, curve=150.0, dash=(60, 2))
    elif scene == "noise_only":
        img = _synthetic_binary(rng, noise=0.003)
        img[:, :] = np.where(rng.random(img.shape) < 0.002, 255, 0).astype(np.uint8)
    elif scene == "empty":
        img = np.zeros((1100, 1080), np.uint8)
    else:  # left_empty: nothing left of center
        img = _synthetic_binary(rng, noise=0.0)
        img[:, :540] = 0

    cfg = SearchConfig(**overrides)
    kwargs = dict(
        window_width=cfg.window_width,
        window_height=cfg.window_height,
        search_range=cfg.search_range,
        mu=cfg.mu,
        no_success_limit=cfg.no_success_limit,
        start_slice=cfg.start_slice,
        ignore_sides=cfg.ignore_sides,
        ignore_bottom=cfg.ignore_bottom,
        partial=cfg.partial,
    )
    ref_tracker.detected_pixels = False
    ref_tracker.sliding_window_search(np.copy(img), **kwargs)
    res = sliding_window_search(img, cfg)

    assert bool(res.detected) == bool(ref_tracker.detected_pixels)
    if ref_tracker.detected_pixels:
        assert _coords_from_mask(res.left_mask) == _coords_from_ref(
            ref_tracker.left_y, ref_tracker.left_x
        )
        assert _coords_from_mask(res.right_mask) == _coords_from_ref(
            ref_tracker.right_y, ref_tracker.right_x
        )
        n_l = int(res.left_n_centroids)
        n_r = int(res.right_n_centroids)
        assert n_l == len(ref_tracker.left_window_centroids)
        assert n_r == len(ref_tracker.right_window_centroids)
        np.testing.assert_array_equal(
            np.asarray(res.left_centroids)[:n_l], ref_tracker.left_window_centroids
        )
        np.testing.assert_array_equal(
            np.asarray(res.right_centroids)[:n_r], ref_tracker.right_window_centroids
        )


def test_sliding_window_on_real_filter_output(ref_tracker, calib, test_frame):
    """End-to-end front half: real frame through the compat warp + filter,
    then search parity against the reference."""
    from lane_tracker_tpu.calib.homography import perspective_grid
    from lane_tracker_tpu.calib.undistort import undistort_grid
    from lane_tracker_tpu.kernels.resample import ResampleGrid, bilinear_gather
    from lane_tracker_tpu.ops.filters import filter_lane_points

    cam, warp = calib
    g1 = ResampleGrid.from_quantized(
        undistort_grid(cam.cam_matrix, cam.dist_coeffs, warp.image_width_height)
    )
    g2 = ResampleGrid.from_quantized(
        perspective_grid(warp.M, warp.image_width_height, warp.warped_width_height)
    )
    binary = np.asarray(
        filter_lane_points(
            np.asarray(bilinear_gather(bilinear_gather(test_frame, g1), g2)),
            mask_noise=True,
            noise_thresh=140,
            ksize_r=15,
        )
    )
    cfg = SearchConfig(no_success_limit=50)
    ref_tracker.sliding_window_search(
        np.copy(binary),
        window_width=30,
        window_height=40,
        search_range=20,
        mu=0.1,
        no_success_limit=50,
    )
    res = sliding_window_search(binary, cfg)
    assert bool(res.detected) == bool(ref_tracker.detected_pixels)
    assert _coords_from_mask(res.left_mask) == _coords_from_ref(
        ref_tracker.left_y, ref_tracker.left_x
    )
    assert _coords_from_mask(res.right_mask) == _coords_from_ref(
        ref_tracker.right_y, ref_tracker.right_x
    )


def _band_oracle(img, lc, rc, bandwidth, ignore_bottom, partial):
    """Direct numpy oracle for band search (2017 truncation semantics)."""
    H, W = img.shape
    work = img.copy()
    work[H - ignore_bottom :, :] = 0
    work[: int(H * (1 - partial)), :] = 0
    yy, xx = np.nonzero(work)
    def side(c):
        px = c[0] * yy.astype(np.float64) ** 2 + c[1] * yy + c[2]
        keep = (xx > px - bandwidth) & (xx < px + bandwidth)
        return set(zip(yy[keep].tolist(), xx[keep].tolist()))
    return side(lc), side(rc)


@pytest.mark.parametrize("partial", [1.0, 0.5])
def test_band_search_matches_oracle(rng, partial):
    img = _synthetic_binary(rng, curve=80.0, dash=(50, 2), noise=0.002)
    H = img.shape[0]
    lc = np.array([8e-5, -0.13, 470.0])
    rc = np.array([1.6e-4, -0.24, 700.0])
    cfg = SearchConfig(bandwidth=25, partial=partial)
    res = band_search(img, lc, rc, cfg)
    oleft, oright = _band_oracle(img, lc, rc, 25, cfg.ignore_bottom, partial)
    assert _coords_from_mask(res.left_mask) == oleft
    assert _coords_from_mask(res.right_mask) == oright
    assert bool(res.detected) == (len(oleft) > 0 and len(oright) > 0)
