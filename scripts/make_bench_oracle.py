"""Generate assets/bench_oracle*.npz: the live reference's per-frame lane
coefficients over bench.py's exact frame sequences.

bench.py cycles 4 corpus frames through a T-frame chunk under the demo1
parameter set; the north star couples throughput with <0.5 px coefficient
RMSE vs the OpenCV reference (BASELINE.json), so the bench artifact must
measure both.  This runs the reference LaneTracker (with the same shims /
patches the oracle tests use: tests/test_tracker.py) over the identical
sequence and stores the per-frame raw fit coefficients + validity flags.

Three bench variants, each with its own oracle (round-4 verdict item 4):
  default             -> assets/bench_oracle.npz       (stills cycle)
  --fail-every K      -> assets/bench_oracle_failK.npz (every K-th frame
                         blacked, the BENCH_FAIL_EVERY=K sequence)
  --motion            -> assets/bench_oracle_motion.npz (the continuous-
                         motion generator's first T frames, the
                         BENCH_MOTION=1 sequence)

Usage: python scripts/make_bench_oracle.py [T] [--fail-every K] [--motion]
(default T=512)
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from PIL import Image  # noqa: E402

from tests.test_corpus import _patch_validity  # noqa: E402
from tests.test_longrun import _cache_ref_filter  # noqa: E402
from tests.test_tracker import (  # noqa: E402
    DEMO1_KW,
    _band_patch,
    _make_ref_tracker,
    _numpy_2017_shims,
)

NAMES = ["frame911.jpg", "frame971.jpg", "test4.jpg", "straight_lines1.jpg"]


def bench_frames(T, fail_every=0, motion=False):
    """The exact frame sequence bench.py runs for each variant."""
    if motion:
        from scripts.motion_longrun import motion_sequence

        return [frame for _, frame in motion_sequence(T)]
    imgs = [np.asarray(Image.open(f"assets/{n}").convert("RGB"))
            for n in NAMES]
    chunk = [np.copy(imgs[t % len(imgs)]) for t in range(T)]
    if fail_every:
        for t in range(0, T, fail_every):
            chunk[t] = np.zeros_like(chunk[t])
    return chunk


def main(T=512, fail_every=0, motion=False):
    import importlib.util

    from lane_tracker_tpu.calib.io import load_calibration_npz
    from lane_tracker_tpu.tracker.config import PRESETS

    spec = importlib.util.spec_from_file_location(
        "ref_lane_tracker_oracle", "/root/reference/lane_tracker.py")
    sys.path.insert(0, "/root/reference")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    class M:
        LaneTracker = mod.LaneTracker

    calib = load_calibration_npz("assets/calibration.npz")
    ref = _make_ref_tracker(M, calib)
    _band_patch(ref)
    _patch_validity(ref, PRESETS["demo1"].validity)
    _cache_ref_filter(ref)

    frames = bench_frames(T, fail_every=fail_every, motion=motion)
    left = np.zeros((T, 3))
    right = np.zeros((T, 3))
    valid = np.zeros(T, bool)
    with _numpy_2017_shims():
        for t, frame in enumerate(frames):
            ref.process(np.copy(frame), **DEMO1_KW)
            valid[t] = bool(ref.valid_lane_lines)
            if valid[t]:
                left[t] = np.asarray(ref.last_left_coeffs, float)
                right[t] = np.asarray(ref.last_right_coeffs, float)
    name = ("assets/bench_oracle_motion.npz" if motion
            else f"assets/bench_oracle_fail{fail_every}.npz" if fail_every
            else "assets/bench_oracle.npz")
    np.savez_compressed(
        name, left=left, right=right, valid=valid,
        names=np.asarray(NAMES), preset=np.asarray("demo1"),
    )
    print(f"wrote {name}: T={T}, valid={int(valid.sum())}/{T}")


if __name__ == "__main__":
    args = sys.argv[1:]
    T, fail_every, motion = 512, 0, False
    while args:
        a = args.pop(0)
        if a == "--fail-every":
            fail_every = int(args.pop(0))
        elif a == "--motion":
            motion = True
        else:
            T = int(a)
    main(T, fail_every=fail_every, motion=motion)
