"""Regenerate assets/goldens/*.png — the pixel-exact render regression
fixtures of tests/test_render.py::test_golden_rendered_outputs.

Run on the CPU backend (the suite's backend) after any INTENDED change to
the rendering or pipeline output, then eyeball the images before
committing: the test asserts byte equality against these.
"""
import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from PIL import Image  # noqa: E402

from lane_tracker_tpu.calib.io import load_calibration_npz  # noqa: E402
from lane_tracker_tpu.tracker.config import PRESETS  # noqa: E402
from lane_tracker_tpu.tracker.tracker import LaneTracker  # noqa: E402


def main():
    cam, warp = load_calibration_npz("assets/calibration.npz")
    tr = LaneTracker(
        warp.image_width_height, warp.warped_width_height,
        cam.cam_matrix, cam.dist_coeffs, (warp.M, warp.Minv),
        (warp.mppv, warp.mpph), validity=PRESETS["demo1"].validity,
    )
    kw = dict(mask_noise=True, noise_thresh=140, no_success_limit=50,
              bandwidth=30, ksize_r=15)
    f911 = np.asarray(Image.open("assets/frame911.jpg").convert("RGB"))
    f971 = np.asarray(Image.open("assets/frame971.jpg").convert("RGB"))
    ov911 = tr.process(f911, **kw)
    split971 = tr.process(f971, split_view=True, **kw)
    black = np.zeros_like(f911)
    for _ in range(9):
        fail = tr.process(black, **kw)
    for img, name in ((ov911, "frame911_overlay_demo1.png"),
                      (split971, "frame971_split_demo1.png"),
                      (fail, "failure_text.png")):
        Image.fromarray(np.asarray(img)).save(f"assets/goldens/{name}")
        print("wrote", name)


if __name__ == "__main__":
    main()
