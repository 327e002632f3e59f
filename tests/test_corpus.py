"""Corpus-wide process() parity against the live reference.

Runs the full 11-frame reference corpus (/root/reference/test_images) as a
sequence through both the reference's ``LaneTracker.process`` (with the
in-memory 2017-NumPy shims) and this package's compat tracker, under all
four presets.  The probed reference behavior (scripts/corpus_probe.py)
covers every state-machine path:

  * blind sliding-window search (frame 1 of each sequence),
  * warm-start band search (subsequent frames),
  * success via the hardcoded SECOND attempt (demo3: test4, frame971 —
    lane_tracker.py:1081-1128),
  * detected-but-invalid rejection, both with n_tries=2 (committed: all 11
    frames) and n_tries=1 (demo2: 10 of 11 frames),
  * validity-threshold variation across all three demo threshold sets.

Also pins SURVEY §4's golden white-pixel counts for the filter stage on
test4.jpg (verified against the live reference's filter_lane_points).
"""

import types

import numpy as np
import pytest
from PIL import Image

from tests.conftest import ASSETS_DIR, REFERENCE_DIR, requires_cv2
from tests.test_tracker import (
    _band_patch,
    _make_ref_tracker,
    _make_tpu_tracker,
    _numpy_2017_shims,
    ref_process_module,  # noqa: F401  (fixture re-export)
)

from lane_tracker_tpu.tracker.config import PRESETS

CORPUS = [
    "straight_lines1.jpg", "straight_lines2.jpg",
    "test1.jpg", "test2.jpg", "test3.jpg", "test4.jpg", "test5.jpg",
    "test6.jpg", "test7.jpg", "frame911.jpg", "frame971.jpg",
]

# process() keyword sets per preset (tracker_settings.md:1-111; 'committed'
# = the process() defaults).
PRESET_KW = {
    "committed": dict(n_tries=2),
    "demo1": dict(ksize_r=15, C_r=8, mask_noise=True, noise_thresh=140,
                  no_success_limit=50, bandwidth=30, n_tries=2),
    "demo2": dict(ksize_r=20, C_r=5, mask_noise=False,
                  no_success_limit=50, bandwidth=30, n_tries=1),
    "demo3": dict(ksize_r=15, C_r=8, mask_noise=True, noise_thresh=140,
                  no_success_limit=50, bandwidth=30, partial=0.5, n_tries=2),
}

# Presets whose validity thresholds differ from the committed constants
# need the independent validity oracle patched into the reference (its
# thresholds are hardcoded, lane_tracker.py:588-593).
NEEDS_VALIDITY_PATCH = {"demo1", "demo3"}


def _patch_validity(ref_lt, validity):
    from tests.test_polyfit import _validity_oracle

    def check_validity(self, lc, rc, diagnostics=False):
        ly, lx, ry, rx = self.get_poly_points(lc, rc)
        self.valid_lane_lines = _validity_oracle(
            lc, rc, len(ly), len(ry), (1080, 1100), validity)

    ref_lt.check_validity = types.MethodType(check_validity, ref_lt)


def _count_attempts(ref_lt):
    orig = ref_lt.find_lane_points
    ref_lt._attempts = 0

    def counted(self, img, **kw):
        self._attempts += 1
        return orig(img, **kw)

    ref_lt.find_lane_points = types.MethodType(counted, ref_lt)


# The reference's per-frame corpus traces are identical for every repo
# pipeline under test, so they are computed once per preset and reused
# across the pipeline axis (the live-reference run is the slow part).
_REF_TRACE_CACHE = {}


def _ref_corpus_trace(ref_process_module, calib, preset):
    if preset in _REF_TRACE_CACHE:
        return _REF_TRACE_CACHE[preset]
    kw = PRESET_KW[preset]
    cfg = PRESETS[preset]
    ref_lt = _make_ref_tracker(ref_process_module, calib)
    _band_patch(ref_lt)
    if preset in NEEDS_VALIDITY_PATCH:
        _patch_validity(ref_lt, cfg.validity)
    _count_attempts(ref_lt)
    trace = []
    for name in CORPUS:
        frame = np.asarray(Image.open(ASSETS_DIR / name).convert("RGB"))
        ref_lt._attempts = 0
        with _numpy_2017_shims():
            ref_lt.process(np.copy(frame), **kw)
        valid = bool(ref_lt.valid_lane_lines)
        trace.append(dict(
            detected=bool(ref_lt.detected_pixels),
            valid=valid,
            attempts=int(ref_lt._attempts),
            left=np.array(ref_lt.last_left_coeffs, float) if valid else None,
            right=np.array(ref_lt.last_right_coeffs, float) if valid else None,
            radius=float(ref_lt.average_curve_radius) if valid else 0.0,
            ecc=float(ref_lt.eccentricity) if valid else 0.0,
        ))
    result = (trace, tuple(ref_lt.get_success_ratio()[1:]))
    _REF_TRACE_CACHE[preset] = result
    return result


@pytest.mark.slow
@pytest.mark.parametrize("pipeline", ["compat", "fast"])
@pytest.mark.parametrize("preset", ["committed", "demo1", "demo2", "demo3"])
def test_corpus_sequence_parity(ref_process_module, calib, preset, pipeline):  # noqa: F811
    """11-frame sequence: per-frame detection/validity/attempt-count parity
    with the live reference plus <0.5 px coefficient-curve RMSE, radius and
    eccentricity agreement on valid frames, and final success-ratio match.

    Runs for BOTH the bit-exact 'compat' pipeline and the benched 'fast'
    pipeline (fused single-gather undistort∘warp, raw-frame LAB): the
    round-2 verdict flagged that the headline fps and the <0.5 px claim
    are measured on 'fast' while parity was only proven for 'compat'."""
    kw = PRESET_KW[preset]
    cfg = PRESETS[preset]
    ref_trace, ref_ratio = _ref_corpus_trace(ref_process_module, calib, preset)

    tpu_lt = _make_tpu_tracker(calib, validity=cfg.validity, pipeline=pipeline)

    yy = np.arange(1100, dtype=float)
    saw_second_attempt_success = False
    for name, ref in zip(CORPUS, ref_trace):
        frame = np.asarray(Image.open(ASSETS_DIR / name).convert("RGB"))
        tpu_lt.process(frame, **kw)
        out = tpu_lt.last_output

        tag = f"{preset}/{pipeline}/{name}"
        assert bool(out.detected) == ref["detected"], tag
        assert bool(out.valid) == ref["valid"], tag
        assert int(out.n_attempts) == ref["attempts"], tag
        if bool(out.valid):
            if ref["attempts"] == 2:
                saw_second_attempt_success = True
            for mine, theirs in (
                (np.asarray(out.left_coeffs, float), ref["left"]),
                (np.asarray(out.right_coeffs, float), ref["right"]),
            ):
                rmse = np.sqrt(
                    np.mean((np.polyval(mine, yy) - np.polyval(theirs, yy)) ** 2))
                assert rmse < 0.5, f"{tag}: curve RMSE {rmse}"
            if pipeline == "compat":
                assert abs(int(out.radius) - ref["radius"]) <= max(
                    3, 0.01 * ref["radius"]), tag
            else:
                # Radius is 1/|2A|-shaped: for near-straight lanes the
                # quadratic coefficient is ~1e-6/px, so a <0.5 px curve
                # difference (asserted above) legitimately moves a ~10 km
                # radius by km.  Compare in curvature, where the 0.5 px
                # bound translates to ~3e-5 1/m.
                kap_d = abs(1.0 / float(out.radius) - 1.0 / ref["radius"])
                assert kap_d < 2.5e-5, f"{tag}: curvature diff {kap_d}"
            assert abs(float(out.ecc) - ref["ecc"]) < 0.02, tag

    assert tpu_lt.get_success_ratio()[1:] == ref_ratio
    if preset == "demo3":
        # The probe pinned test4/frame971 as second-attempt successes in
        # this sequence; the corpus must keep exercising that path.
        assert saw_second_attempt_success


@requires_cv2
def test_golden_white_pixel_counts(calib):
    """SURVEY §4 golden counts on test4.jpg (verified against the live
    reference's filter_lane_points over the cv2 undistort+warp chain):
    bilateral 74,537 / bilateral+noise 42,372 / neighborhood 119,426 white
    pixels of 1,188,000."""
    import cv2

    from lane_tracker_tpu.ops.filters import filter_lane_points

    cam, warp = calib
    img = np.asarray(Image.open(ASSETS_DIR / "test4.jpg").convert("RGB"))
    und = cv2.undistort(img, cam.cam_matrix, cam.dist_coeffs)
    warped = cv2.warpPerspective(
        und, warp.M, tuple(int(v) for v in warp.warped_width_height),
        flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT)

    golden = {
        ("bilateral", False): 74_537,
        ("bilateral", True): 42_372,
        ("neighborhood", False): 119_426,
    }
    for (ftype, noise), count in golden.items():
        out = np.asarray(filter_lane_points(
            warped, filter_type=ftype, ksize_r=25, C_r=8, ksize_b=35, C_b=5,
            mask_noise=noise, ksize_noise=65, C_noise=10, noise_thresh=135))
        assert int((out > 0).sum()) == count, (ftype, noise)
        assert out.size == 1_188_000
