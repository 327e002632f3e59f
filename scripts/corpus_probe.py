"""Probe the live reference over all 11 test frames x 4 presets.

Records, per (preset, frame): detected, valid, attempts used, coeffs,
radius, ecc — both for fresh-tracker (blind sliding-window) runs and for
the 11-frame sequence (warm-start band-search transitions).  Used to choose
corpus parity assertions (tests/test_corpus.py); the tests recompute the
reference live, this is exploration only.
"""

import json
import pathlib
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, ".")
from tests.test_tracker import (  # noqa: E402
    _band_patch,
    _numpy_2017_shims,
)

REF = pathlib.Path("/root/reference")
FRAMES = [
    "straight_lines1.jpg", "straight_lines2.jpg",
    "test1.jpg", "test2.jpg", "test3.jpg", "test4.jpg", "test5.jpg",
    "test6.jpg", "test7.jpg", "frame911.jpg", "frame971.jpg",
]

PRESET_KW = {
    "committed": dict(n_tries=2),
    "demo1": dict(ksize_r=15, C_r=8, mask_noise=True, noise_thresh=140,
                  no_success_limit=50, bandwidth=30, n_tries=2),
    "demo2": dict(ksize_r=20, C_r=5, mask_noise=False,
                  no_success_limit=50, bandwidth=30, n_tries=1),
    "demo3": dict(ksize_r=15, C_r=8, mask_noise=True, noise_thresh=140,
                  no_success_limit=50, bandwidth=30, partial=0.5, n_tries=2),
}

VALIDITY = {
    "demo1": dict(min_dist_y1=150, max_dist_y1=245, min_dist_y2=150,
                  max_dist_y2=255, min_dist_y3=150, max_dist_y3=255,
                  tangent_thresh=0.25),
    "demo3": dict(min_dist_y1=150, max_dist_y1=245, min_dist_y2=140,
                  max_dist_y2=265, min_dist_y3=125, max_dist_y3=290,
                  tangent_thresh=0.46),
}


def make_ref():
    import importlib.util

    sys.path.insert(0, str(REF))
    spec = importlib.util.spec_from_file_location(
        "ref_lt_probe", REF / "lane_tracker.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sys.path.insert(0, str(REF))
    import utils as ref_utils  # noqa

    cam_matrix, dist = ref_utils.load_camera_calib(str(REF / "cam_calib.p"))
    M, Minv, img_wh, warped_wh, mppv, mpph = ref_utils.load_warp_params(
        str(REF / "warp_params.p"))
    return mod, (img_wh, warped_wh, cam_matrix, dist, (M, Minv), (mppv, mpph))


def patch_validity(lt, vkw):
    import types

    sys.path.insert(0, "/root/repo")
    from tests.test_polyfit import _validity_oracle
    from lane_tracker_tpu.tracker.config import ValidityConfig

    v = ValidityConfig(**vkw)

    def check_validity(self, lc, rc, diagnostics=False):
        ly, lx, ry, rx = self.get_poly_points(lc, rc)
        self.valid_lane_lines = _validity_oracle(
            lc, rc, len(ly), len(ry), (1080, 1100), v)

    lt.check_validity = types.MethodType(check_validity, lt)


def run(mod, ctor, preset, frames, fresh):
    import types

    results = []
    lt = None
    for name in frames:
        if fresh or lt is None:
            lt = mod.LaneTracker(*ctor)
            _band_patch(lt)
            if preset in VALIDITY:
                patch_validity(lt, VALIDITY[preset])
            lt._attempts = 0
            orig = lt.find_lane_points

            def find_counted(self, img, **kw):
                self._attempts += 1
                return orig(img, **kw)

            lt.find_lane_points = types.MethodType(find_counted, lt)
        lt._attempts = 0
        img = np.asarray(Image.open(REF / "test_images" / name).convert("RGB"))
        with _numpy_2017_shims():
            lt.process(np.copy(img), **PRESET_KW[preset])
        rec = {
            "frame": name,
            "detected": bool(lt.detected_pixels),
            "valid": bool(lt.valid_lane_lines),
            "attempts": lt._attempts,
        }
        if lt.valid_lane_lines:
            rec["left"] = [float(v) for v in lt.last_left_coeffs]
            rec["right"] = [float(v) for v in lt.last_right_coeffs]
            rec["radius"] = float(lt.average_curve_radius)
            rec["ecc"] = float(lt.eccentricity)
        results.append(rec)
    return results


def main():
    mod, ctor_args = make_ref()
    ctor = (ctor_args[0], ctor_args[1], ctor_args[2], ctor_args[3],
            ctor_args[4], ctor_args[5])
    out = {}
    for preset in PRESET_KW:
        out[preset] = {
            "fresh": run(mod, ctor, preset, FRAMES, fresh=True),
            "seq": run(mod, ctor, preset, FRAMES, fresh=False),
        }
        n2 = [r["frame"] for r in out[preset]["fresh"] if r["attempts"] == 2]
        print(f"# {preset}: fresh 2-attempt frames: {n2}", flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
