"""Decompose the sequential back-half scan's per-step cost on the TPU.

The back half runs ~1.3 us/step (0.16 ms/frame at T=128).  This times
stripped-down scan bodies to attribute the cost: interval lookup+moments,
fit+validity, render meta, state updates, and the lax.cond pair.

Usage: nohup python scripts/backhalf_bench.py > /tmp/backhalf.log &
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

T = 128


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from lane_tracker_tpu.calib.io import load_calibration_npz
    from lane_tracker_tpu.ops.integrals import interval_moments
    from lane_tracker_tpu.ops.polyfit import (
        check_validity,
        fit_poly_rows,
        ploty_grid,
        poly_points_meta,
    )
    from lane_tracker_tpu.ops.search import band_intervals, sliding_window_intervals
    from lane_tracker_tpu.tracker.config import PRESETS
    from lane_tracker_tpu.tracker.step import (
        TrackerParams,
        back_half,
        front_artifacts_batch,
        make_initial_state,
    )
    from lane_tracker_tpu.utils.timing import device_time_per_iter

    cam, warp = load_calibration_npz("assets/calibration.npz")
    params = TrackerParams.build(
        cam.cam_matrix, cam.dist_coeffs, warp.M, warp.Minv,
        warp.image_width_height, warp.warped_width_height,
        warp.mppv, warp.mpph, pipeline="fast",
    )
    config = PRESETS["demo1"]
    scfg = config.search
    W, H = params.warped_size

    names = ["frame911.jpg", "frame971.jpg", "test4.jpg", "straight_lines1.jpg"]
    imgs = [np.asarray(Image.open(f"assets/{n}").convert("RGB")) for n in names]
    chunk = jax.device_put(np.stack([imgs[i % len(imgs)] for i in range(T)]))

    arts = jax.jit(
        lambda fr, p: front_artifacts_batch(fr, p, config)
    )(chunk, params)
    arts = jax.block_until_ready(arts)
    state0 = make_initial_state(config, params.warped_size)
    ploty_validity = ploty_grid(params.warped_size, 1.0)

    def timed(name, scan_body, init):
        try:
            def run(c, invariant):
                st, xs = c
                st2, ys = jax.lax.scan(lambda s, a: scan_body(s, a, invariant),
                                       st, xs)
                return (st2, xs)
            per_iter, _ = device_time_per_iter(
                lambda: (init, arts), run, n_iters=16, repeats=3,
                invariant=params)
            print(json.dumps({"variant": name,
                              "us_per_step": round(per_iter / T * 1e6, 3)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {str(e)[:160]}"}),
                  flush=True)

    # Full back half (reference point).
    def full(s, a, p):
        s2, out, meta = back_half(s, a, p, config)
        return s2, out.valid
    timed("full_back_half", full, state0)

    # Carry a fake scalar state; isolate stages.  Dummy carries force the
    # sequential dependency through a cheap add.
    def dep(x):
        return jnp.sum(x.astype(jnp.float32))

    z = jnp.float32(0)

    def band_only(s, a, p):
        iv = band_intervals(jnp.asarray([0., 0., 480.], jnp.float32) ,
                            jnp.asarray([1e-4, -0.1, 730.], jnp.float32),
                            scfg, H, W)
        return s + dep(iv.left_lo), None
    timed("band_intervals", band_only, z)

    def sws_only(s, a, p):
        return s + dep(a.iv_sws.left_lo), None
    timed("hoisted_sws_intervals_read", sws_only, z)

    def moments_only(s, a, p):
        iv = band_intervals(jnp.asarray([0., 0., 480.], jnp.float32),
                            jnp.asarray([1e-4, -0.1, 730.], jnp.float32),
                            scfg, H, W)
        ln, lsx = interval_moments(a.pref, iv.left_lo, iv.left_hi, iv.left_valid)
        rn, rsx = interval_moments(a.pref, iv.right_lo, iv.right_hi, iv.right_valid)
        return s + dep(ln) + dep(rsx) + dep(rn) + dep(lsx), None
    timed("band_plus_moments", moments_only, z)

    def fit_only(s, a, p):
        ln = jnp.full((H,), 3, jnp.int32)
        lsx = jnp.full((H,), 1200, jnp.int32)
        lc = fit_poly_rows(ln + (s != 0), lsx, W)
        return s + dep(lc), None
    timed("fit_poly_rows", fit_only, z)

    def meta_only(s, a, p):
        lc = jnp.asarray([1e-5, -0.1, 480.0 ], jnp.float32)
        ml = poly_points_meta(lc + s, ploty_validity, params.warped_size)
        return s + dep(ml.fitx) + ml.n.astype(jnp.float32), None
    timed("poly_points_meta_x1", meta_only, z)

    def validity_only(s, a, p):
        lc = jnp.asarray([1e-5, -0.1, 480.0], jnp.float32) + s
        rc = jnp.asarray([1e-5, -0.15, 700.0], jnp.float32)
        v = check_validity(lc, rc, jnp.int32(1100), jnp.int32(1100),
                           params.warped_size, config.validity)
        return s + v.astype(jnp.float32), None
    timed("check_validity", validity_only, z)


if __name__ == "__main__":
    main()
