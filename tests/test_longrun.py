"""Long-sequence end-to-end parity with the live reference.

VERDICT item 4: the reference's quality bar is full demo videos judged by
the success-ratio metric (process_video.py:47-49).  This test runs a
300-frame sequence — assembled from the 11-frame corpus plus black frames,
deliberately exercising every state-machine transition: blind sliding
window, warm-start band search, failure within the n_fail grace period,
recovery without reset (last_detection <= n_reset), and full
band->reset->sliding re-acquisition (lane_tracker.py:851, 1142-1173) —
through both the shimmed live reference and this package, and asserts the
per-frame detected/valid traces match exactly, plus the final success
ratio, radius, and eccentricity.

Runtime design (the suite must stay minutes, not hours):

* Repo side: ``front_artifacts`` is a pure function of (frame, params,
  config), so it runs once per *unique* frame (compat pipeline, bit-exact
  with the reference's cv2 chain) and the stateful ``back_half`` — where
  every sequence-dependent decision lives — scans all 300 frames with the
  second attempt hoisted (bit-exactness of hoisted-vs-cond is pinned by
  test_parallel.py::test_hoisted_second_attempt_equals_cond).
* Reference side: its ``filter_lane_points`` (the ~150 ms/frame stage) is
  memoized by input bytes — a pure function there too (lane_tracker.py:
  183-240); undistort/warp/search/fit run live for all 300 frames.
"""

import types

import numpy as np
import pytest
from PIL import Image

from tests.conftest import ASSETS_DIR
from tests.test_corpus import PRESET_KW, _patch_validity
from tests.test_tracker import (
    _band_patch,
    _make_ref_tracker,
    _numpy_2017_shims,
    ref_process_module,  # noqa: F401  (fixture re-export)
)

from lane_tracker_tpu.tracker.config import PRESETS

# ~300-frame sequence: (frame name | 'black', repeat count).  Transitions:
#   frame 0: blind sliding-window; 1-39: band warm start;
#   40-44: black failures crossing n_reset=4 (still inside n_fail=8 grace);
#   45: sliding-window re-acquisition; 75-76: short dropout that recovers
#   via band search without reset; then mixed corpus segments with dropouts.
SEQUENCE = [
    ("frame911.jpg", 20), ("frame971.jpg", 20),
    ("black", 5),
    ("test4.jpg", 30),
    ("black", 2),
    ("frame911.jpg", 23),
    ("straight_lines1.jpg", 25),
    ("black", 10),
    ("straight_lines2.jpg", 25),
    ("test1.jpg", 15), ("test2.jpg", 15), ("test3.jpg", 15),
    ("black", 5),
    ("test5.jpg", 15), ("test6.jpg", 15), ("test7.jpg", 15),
    ("frame971.jpg", 20),
    ("frame911.jpg", 25),
]


def _frames():
    unique = {}
    seq = []
    for name, n in SEQUENCE:
        if name not in unique:
            if name == "black":
                unique[name] = np.zeros((720, 1280, 3), np.uint8)
            else:
                unique[name] = np.asarray(
                    Image.open(ASSETS_DIR / name).convert("RGB"))
        seq.extend([name] * n)
    return unique, seq


def _cache_ref_filter(ref_lt):
    """Memoize the reference's pure filter stage by (input bytes, params)."""
    orig = ref_lt.filter_lane_points
    cache = {}

    def cached(self, img, **kw):
        key = (hash(img.tobytes()), tuple(sorted(kw.items())))
        if key not in cache:
            cache[key] = orig(img, **kw)
        return np.copy(cache[key])

    ref_lt.filter_lane_points = types.MethodType(cached, ref_lt)


# The reference trace is pipeline-independent; compute it once and share
# it across the pipeline parametrization (the live run is the slow part).
_REF_LONGRUN_CACHE = {}


def _ref_longrun_trace(ref_process_module, calib, preset, kw, config, unique,
                       seq):
    if preset in _REF_LONGRUN_CACHE:
        return _REF_LONGRUN_CACHE[preset]
    ref_lt = _make_ref_tracker(ref_process_module, calib)
    _band_patch(ref_lt)
    _patch_validity(ref_lt, config.validity)
    _cache_ref_filter(ref_lt)
    ref_valid, ref_detected = [], []
    with _numpy_2017_shims():
        for name in seq:
            ref_lt.process(np.copy(unique[name]), **kw)
            ref_valid.append(bool(ref_lt.valid_lane_lines))
            ref_detected.append(bool(ref_lt.detected_pixels))
    result = (
        ref_valid,
        ref_detected,
        tuple(ref_lt.get_success_ratio()[1:]),
        float(ref_lt.average_curve_radius),
        float(ref_lt.eccentricity),
    )
    _REF_LONGRUN_CACHE[preset] = result
    return result


@pytest.mark.slow
@pytest.mark.parametrize("pipeline", ["compat", "fast"])
def test_long_sequence_success_ratio_parity(ref_process_module, calib, pipeline):  # noqa: F811
    import jax

    from lane_tracker_tpu.tracker.step import (
        TrackerParams,
        back_half,
        front_artifacts,
        make_initial_state,
    )

    preset = "demo1"
    kw = PRESET_KW[preset]
    config = PRESETS[preset]
    cam, warp = calib

    unique, seq = _frames()
    assert len(seq) >= 300

    # ---- reference side (cached across the pipeline axis) ----
    ref_valid, ref_detected, ref_ratio, ref_radius, ref_ecc = (
        _ref_longrun_trace(
            ref_process_module, calib, preset, kw, config, unique, seq))

    # ---- repo side: per-unique-frame front halves + scanned back half ----
    params = TrackerParams.build(
        cam.cam_matrix, cam.dist_coeffs, warp.M, warp.Minv,
        warp.image_width_height, warp.warped_width_height,
        warp.mppv, warp.mpph, pipeline=pipeline,
    )
    front = jax.jit(
        lambda f, p: front_artifacts(f, p, config, hoist_second_attempt=True)
    )
    arts = {name: jax.block_until_ready(front(img, params))
            for name, img in unique.items()}
    step = jax.jit(lambda s, a, p: back_half(s, a, p, config)[:2])
    state = make_initial_state(config, params.warped_size)
    my_valid, my_detected, last_out = [], [], None
    for name in seq:
        state, out = step(state, arts[name], params)
        last_out = out
        my_valid.append(bool(out.valid))
        my_detected.append(bool(out.detected))

    # ---- exact per-frame traces + final metrics ----
    mismatches = [i for i, (a, b) in enumerate(zip(my_valid, ref_valid)) if a != b]
    assert not mismatches, f"valid-trace mismatch at frames {mismatches[:10]}"
    mismatches = [
        i for i, (a, b) in enumerate(zip(my_detected, ref_detected)) if a != b
    ]
    assert not mismatches, f"detected-trace mismatch at frames {mismatches[:10]}"

    n_success = int(state.success)
    n_total = int(state.counter)
    assert (n_success, n_total) == ref_ratio
    assert sum(ref_valid) == n_success

    # The sequence must actually exercise the transitions it claims to.
    assert my_valid[0] and my_valid[1]           # sliding acquire + band run
    assert not any(my_valid[40:45])              # dropout past n_reset
    assert my_valid[45]                          # sliding re-acquisition
    assert my_valid.count(False) >= 20
    assert 0 < n_success < n_total

    # Final smoothed metrics agree (valid final frame by construction).
    assert my_valid[-1] and ref_valid[-1]
    if pipeline == "compat":
        assert abs(int(last_out.radius) - ref_radius) <= max(
            3, 0.01 * abs(ref_radius))
    else:
        # Curvature-space comparison — see test_corpus.py for the
        # conditioning argument (radius is 1/|2A|-shaped).
        assert abs(1.0 / float(last_out.radius) - 1.0 / ref_radius) < 2.5e-5
    assert abs(float(last_out.ecc) - ref_ecc) < 0.02


@pytest.mark.slow
@pytest.mark.parametrize("generator", ["motion", "curve"])
def test_motion_segment_parity(ref_process_module, calib, generator):  # noqa: F811
    """Continuous-MOTION parity (round-2 verdict #7; evolving curvature
    round-4 item 6): a 60-frame segment (every frame unique, so band
    search tracks real movement) through both the live reference and the
    chunked fast pipeline; per-frame traces must match exactly.  The
    'curve' generator additionally sweeps apparent lane curvature with a
    time-varying quadratic shear, so the fitted polynomial DRIFTS across
    the warm frames — the momentum/bandwidth regime rigid jitter cannot
    reach.  Full 1,200-frame versions: scripts/motion_longrun.py
    [--curve] (results recorded in docs/PERFORMANCE.md)."""
    import importlib.util
    import pathlib

    from tests.test_tracker import DEMO1_KW, _make_ref_tracker, _make_tpu_tracker

    spec = importlib.util.spec_from_file_location(
        "motion_longrun",
        pathlib.Path(__file__).parent.parent / "scripts" / "motion_longrun.py")
    motion = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(motion)
    sequence = (motion.curve_sequence if generator == "curve"
                else motion.motion_sequence)

    n = 60
    ref_lt = _make_ref_tracker(ref_process_module, calib)
    _band_patch(ref_lt)
    _patch_validity(ref_lt, PRESETS["demo1"].validity)
    ref_valid, ref_detected, ref_quad = [], [], []
    with _numpy_2017_shims():
        for _, frame in sequence(n):
            ref_lt.process(np.copy(frame), **DEMO1_KW)
            ref_valid.append(bool(ref_lt.valid_lane_lines))
            ref_detected.append(bool(ref_lt.detected_pixels))
            if ref_valid[-1]:
                ref_quad.append(float(ref_lt.last_left_coeffs[0]))

    tpu = _make_tpu_tracker(calib, validity=PRESETS["demo1"].validity,
                            pipeline="fast")
    frames = np.stack([f for _, f in sequence(n)])
    outs = tpu.process_chunk(frames, with_overlay=False, **DEMO1_KW)
    my_valid = [bool(v) for v in np.asarray(outs.valid)]
    my_detected = [bool(v) for v in np.asarray(outs.detected)]

    assert my_valid == ref_valid
    assert my_detected == ref_detected
    assert tuple(int(v) for v in tpu.get_success_ratio()[1:]) == tuple(
        ref_lt.get_success_ratio()[1:])
    # The segment must actually run warm (band search on moving content).
    assert sum(ref_valid[1:]) >= n // 2
    if generator == "curve":
        # The whole point: the fitted quadratic must drift substantially
        # within the segment while every decision still matches.
        drift = max(ref_quad) - min(ref_quad)
        assert drift > 0.5 * abs(np.median(ref_quad) or 1e-4), drift
