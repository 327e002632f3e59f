"""Generate assets/bench_oracle.npz: the live reference's per-frame lane
coefficients over bench.py's exact frame sequence.

bench.py cycles 4 corpus frames through a T-frame chunk under the demo1
parameter set; the north star couples throughput with <0.5 px coefficient
RMSE vs the OpenCV reference (BASELINE.json), so the bench artifact must
measure both.  This runs the reference LaneTracker (with the same shims /
patches the oracle tests use: tests/test_tracker.py) over the identical
sequence and stores the per-frame raw fit coefficients + validity flags.

Usage: python scripts/make_bench_oracle.py [T]   (default 256)
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


def main(T=256):
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

    imgs = [np.asarray(Image.open(f"assets/{n}").convert("RGB"))
            for n in NAMES]
    left = np.zeros((T, 3))
    right = np.zeros((T, 3))
    valid = np.zeros(T, bool)
    with _numpy_2017_shims():
        for t in range(T):
            ref.process(np.copy(imgs[t % len(imgs)]), **DEMO1_KW)
            valid[t] = bool(ref.valid_lane_lines)
            if valid[t]:
                left[t] = np.asarray(ref.last_left_coeffs, float)
                right[t] = np.asarray(ref.last_right_coeffs, float)
    np.savez_compressed(
        "assets/bench_oracle.npz",
        left=left, right=right, valid=valid,
        names=np.asarray(NAMES), preset=np.asarray("demo1"),
    )
    print(f"wrote assets/bench_oracle.npz: T={T}, "
          f"valid={int(valid.sum())}/{T}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
