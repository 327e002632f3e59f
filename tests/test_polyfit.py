import numpy as np
import pytest

from lane_tracker_tpu.ops.polyfit import (
    check_validity,
    curve_radius_m,
    eccentricity_m,
    fit_poly_mask,
    metric_coeffs,
    ploty_grid,
    poly_points_meta,
)
from lane_tracker_tpu.tracker.config import ValidityConfig

WARPED = (1080, 1100)


def _mask_from_coords(ys, xs, H=1100, W=1080):
    m = np.zeros((H, W), bool)
    m[ys, xs] = True
    return m


def _lane_pixels(rng, coeffs, H=1100, W=1080, n=4000, jitter=3.0):
    ys = rng.integers(0, H, n)
    xs = coeffs[0] * ys.astype(float) ** 2 + coeffs[1] * ys + coeffs[2]
    xs = np.clip(np.round(xs + rng.normal(0, jitter, n)), 0, W - 1).astype(int)
    return ys, xs


@pytest.mark.parametrize(
    "true_coeffs",
    [
        np.array([-7.98e-6, -1.874e-2, 472.61]),
        np.array([5.454e-5, -1.410e-1, 737.23]),
        np.array([3e-4, -0.4, 600.0]),
    ],
)
def test_fit_matches_np_polyfit(rng, true_coeffs):
    ys, xs = _lane_pixels(rng, true_coeffs)
    # Deduplicate: a mask weights each pixel once, so compare against
    # polyfit on the unique pixel set.
    uniq = np.unique(np.stack([ys, xs], 1), axis=0)
    ys_u, xs_u = uniq[:, 0], uniq[:, 1]
    expected = np.polyfit(ys_u, xs_u, 2)
    got = np.asarray(fit_poly_mask(_mask_from_coords(ys_u, xs_u)))
    # Compare as curves over the full image height (the meaningful metric).
    yy = np.arange(1100, dtype=float)
    ref_curve = np.polyval(expected, yy)
    my_curve = np.polyval(got.astype(float), yy)
    assert np.max(np.abs(ref_curve - my_curve)) < 0.05


def test_fit_concentrated_rows(rng):
    """Pixels concentrated in a narrow y-band must still fit stably."""
    coeffs = np.array([1e-4, -0.2, 500.0])
    ys = rng.integers(900, 1050, 3000)
    xs = np.clip(
        np.round(np.polyval(coeffs, ys.astype(float)) + rng.normal(0, 2, ys.size)),
        0,
        1079,
    ).astype(int)
    uniq = np.unique(np.stack([ys, xs], 1), axis=0)
    expected = np.polyfit(uniq[:, 0], uniq[:, 1], 2)
    got = np.asarray(fit_poly_mask(_mask_from_coords(uniq[:, 0], uniq[:, 1])))
    yy = np.arange(900, 1100, dtype=float)
    assert np.max(np.abs(np.polyval(expected, yy) - np.polyval(got.astype(float), yy))) < 0.1


def test_metric_coeffs_equal_metric_polyfit(rng):
    mppv, mpph = 0.03048, 0.0146304
    coeffs = np.array([5.454e-5, -1.410e-1, 737.23])
    ys, xs = _lane_pixels(rng, coeffs)
    uniq = np.unique(np.stack([ys, xs], 1), axis=0)
    ys_u, xs_u = uniq[:, 0].astype(float), uniq[:, 1].astype(float)
    pixel_fit = np.polyfit(ys_u, xs_u, 2)
    metric_fit = np.polyfit(ys_u * mppv, xs_u * mpph, 2)
    transformed = np.asarray(metric_coeffs(pixel_fit.astype(np.float32), mppv, mpph))
    np.testing.assert_allclose(transformed, metric_fit, rtol=2e-4)


def _poly_points_oracle(coeffs, warped_size, partial=1.0):
    """Direct numpy oracle for get_poly_points under 2017 truncation."""
    W, H = warped_size
    num = int(H * partial)
    ploty = np.linspace(H * (1 - partial), H - 1, num)
    fitx = np.polyval(coeffs, ploty)
    keep = (fitx <= W - 1) & (fitx >= 0)
    fit_x = fitx[keep]
    fit_y = np.linspace(H - len(fit_x), H - 1, len(fit_x))
    return fit_y.astype(np.int64), fit_x.astype(np.int64)


@pytest.mark.parametrize("partial", [1.0, 0.5])
@pytest.mark.parametrize(
    "coeffs",
    [
        np.array([-7.98e-6, -1.874e-2, 472.61]),  # fully in-bounds
        np.array([8e-4, -0.9, 300.0]),  # exits the left edge near the top
        np.array([1e-3, -0.2, 900.0]),  # exits the right edge
    ],
)
def test_poly_points_meta_matches_oracle(coeffs, partial):
    oy, ox = _poly_points_oracle(coeffs, WARPED, partial)
    ploty = np.asarray(ploty_grid(WARPED, partial))
    meta = poly_points_meta(coeffs.astype(np.float32), ploty, WARPED)
    n = int(meta.n)
    # float32 evaluation can flip int-truncation at exact integer
    # boundaries; allow +-1 on the count and on <=1% of samples.
    assert abs(n - len(ox)) <= 1
    if n and n == len(ox):
        fitx = np.asarray(meta.fitx)
        first = int(meta.first)
        # Survivors must be contiguous for the re-anchor mapping to hold.
        inb = np.asarray(meta.inb)
        run = inb[first : first + n]
        assert run.all()
        got_x = fitx[first : first + n].astype(np.int64)
        diff = np.abs(got_x - ox)
        assert diff.max() <= 1
        assert (diff != 0).mean() <= 0.01
        np.testing.assert_array_equal(
            np.arange(WARPED[1] - n, WARPED[1], dtype=np.int64), oy
        )


def _validity_oracle(lc, rc, n_l, n_r, warped_size, v):
    W, H = warped_size
    y1 = W - 1
    y2 = W - int(min(n_l, n_r) * 0.35)
    y3 = W - int(min(n_l, n_r) * 0.75)
    x = lambda c, y: c[0] * y * y + c[1] * y + c[2]
    d = lambda c, y: 2 * c[0] * y + c[1]
    x1, x2, x3 = (abs(x(lc, y) - x(rc, y)) for y in (y1, y2, y3))
    if not (v.min_dist_y1 <= x1 <= v.max_dist_y1):
        return False
    if not (v.min_dist_y2 <= x2 <= v.max_dist_y2):
        return False
    if not (v.min_dist_y3 <= x3 <= v.max_dist_y3):
        return False
    n1 = abs(d(lc, y1) - d(rc, y1))
    n2 = abs(d(lc, y3) - d(rc, y3))
    return n1 < v.tangent_thresh and n2 < v.tangent_thresh


def test_check_validity_cases():
    v = ValidityConfig()
    # SURVEY-verified frame911 coefficients: valid under demo1 thresholds,
    # and x3_diff ~ 223 > 200 rejects under committed (demo2) thresholds.
    lc = np.array([-7.98e-6, -1.874e-2, 472.61], np.float32)
    rc = np.array([5.454e-5, -1.410e-1, 737.23], np.float32)
    for n_l, n_r in [(1100, 1100), (800, 900), (400, 1100)]:
        got = bool(
            check_validity(lc, rc, np.int32(n_l), np.int32(n_r), WARPED, v)
        )
        assert got == _validity_oracle(lc, rc, n_l, n_r, WARPED, v)
    # Parallel straight lanes, plausible width: valid.
    lc2 = np.array([0.0, 0.0, 470.0], np.float32)
    rc2 = np.array([0.0, 0.0, 650.0], np.float32)
    assert bool(check_validity(lc2, rc2, np.int32(1100), np.int32(1100), WARPED, v))
    # Crossing lanes: tangent criterion rejects.
    rc3 = np.array([0.0, 0.5, 650.0], np.float32)
    assert not bool(
        check_validity(lc2, rc3, np.int32(1100), np.int32(1100), WARPED, v)
    )


def test_radius_and_eccentricity_survey_goldens(rng):
    """The SURVEY-verified frame911 run: radius 2280 m, ecc -0.073 m."""
    mppv, mpph = 0.03048, 0.0146304
    lc = np.array([-7.98e-6, -1.874e-2, 472.61], np.float32)
    rc = np.array([5.454e-5, -1.410e-1, 737.23], np.float32)
    rl = float(curve_radius_m(lc, WARPED, mppv, mpph))
    rr = float(curve_radius_m(rc, WARPED, mppv, mpph))
    avg = int(0.5 * (int(rl) + int(rr)))
    assert abs(avg - 2280) <= 3  # float32 vs float64 truncation slack
    # Eccentricity from the bottom graph points of each side.
    lx = np.polyval(lc.astype(float), 1099.0)
    rx = np.polyval(rc.astype(float), 1099.0)
    ecc = float(
        eccentricity_m(np.float32(int(lx)), np.float32(int(rx)), WARPED, mpph)
    )
    assert abs(ecc - (-0.073)) < 0.01
