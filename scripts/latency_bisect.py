"""Bisect the single-frame (T=1) chunk program's 45.9 ms (round-4 verdict
item 3: LATENCY_BENCH.json shows chunk=1 at 45.9 ms/frame — BELOW a 30 fps
camera's real-time bar — while a whole 4-frame chunk computes in 27.5 ms,
so something in the T=1 program is pathological, not just unamortized).

Times each pipeline stage separately at small T with the honest
device-time protocol (utils/timing.py), so the regression localizes to
warp / filter / prefixes+sws / scan / render instead of being guessed at.

Usage: nohup python scripts/latency_bisect.py [T ...] > /tmp/bisect.log &
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main(argv):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from lane_tracker_tpu.calib.io import load_calibration_npz
    from lane_tracker_tpu.parallel.pipeline import chunk_process, scan_back_half
    from lane_tracker_tpu.tracker.config import PRESETS
    from lane_tracker_tpu.tracker.step import (
        TrackerParams,
        _warp_channels,
        front_artifacts_batch,
        make_initial_state,
        render_frame,
    )
    from lane_tracker_tpu.utils.timing import device_time_per_iter

    cam, warp = load_calibration_npz("assets/calibration.npz")
    params = TrackerParams.build(
        cam.cam_matrix, cam.dist_coeffs, warp.M, warp.Minv,
        warp.image_width_height, warp.warped_width_height,
        warp.mppv, warp.mpph, pipeline="fast",
    )
    config = PRESETS["demo1"]

    names = ["frame911.jpg", "frame971.jpg", "test4.jpg",
             "straight_lines1.jpg"]
    imgs = [np.asarray(Image.open(f"assets/{n}").convert("RGB"))
            for n in names]

    sizes = [int(a) for a in argv] or [1, 2, 4]
    for T in sizes:
        chunk = jax.device_put(
            np.stack([imgs[i % len(imgs)] for i in range(T)]))
        state = make_initial_state(config, params.warped_size)
        n_iters = int(min(256, max(32, 1024 // T)))
        row = {"chunk": T}

        # -- full program (the LATENCY_BENCH row) and no-overlay variant --
        for label, with_ov in (("full_ms", True), ("no_overlay_ms", False)):
            def body(c, p, _ov=with_ov):
                st, ch = c
                st, outs = chunk_process(st, ch, p, config, _ov,
                                         second_attempt="two_phase")
                src = outs.overlay if _ov else outs.left_coeffs
                dep = (jnp.max(src).astype(jnp.int32) & 1).astype(jnp.uint8)
                return (st, ch ^ dep)

            per, _ = device_time_per_iter(lambda: (state, chunk), body,
                                          n_iters=n_iters, invariant=params)
            row[label] = round(per * 1e3, 3)

        # -- warp+LAB only --
        def body_warp(ch, p):
            r, b = jax.vmap(lambda f: _warp_channels(f, p))(ch)
            dep = ((jnp.max(r).astype(jnp.int32)
                    ^ jnp.max(b).astype(jnp.int32)) & 1).astype(jnp.uint8)
            return ch ^ dep

        per, _ = device_time_per_iter(lambda: chunk, body_warp,
                                      n_iters=n_iters, invariant=params)
        row["warp_lab_ms"] = round(per * 1e3, 3)

        # -- front half total (warp+LAB+filter+prefixes+sws) --
        def body_front(ch, p):
            arts = front_artifacts_batch(ch, p, config,
                                         hoist_second_attempt=False)
            dep = (jnp.max(arts.pref.packed) & 1).astype(jnp.uint8)
            return ch ^ dep

        per, _ = device_time_per_iter(lambda: chunk, body_front,
                                      n_iters=n_iters, invariant=params)
        row["front_ms"] = round(per * 1e3, 3)

        # -- back-half scan over fixed artifacts --
        arts = jax.jit(
            lambda ch, p: front_artifacts_batch(
                ch, p, config, hoist_second_attempt=False),
            static_argnames=(),
        )(chunk, params)
        arts = jax.block_until_ready(arts)

        def body_scan(st, inv):
            # The carried state itself is the data dependency: each
            # iteration's scan starts from the previous one's final state.
            a, p = inv
            st2, _ = scan_back_half(st, a, p, config)
            return st2

        per, _ = device_time_per_iter(lambda: state, body_scan,
                                      n_iters=n_iters,
                                      invariant=(arts, params))
        row["scan_ms"] = round(per * 1e3, 3)

        # -- render only (fixed metas from a real run) --
        _, (_outs_nf, metas) = jax.jit(
            lambda st, inv: scan_back_half(st, inv[0], inv[1], config)
        )(state, (arts, params))
        metas = jax.block_until_ready(metas)

        def body_render(ch, inv):
            m, p = inv
            ov = jax.vmap(lambda f, mm: render_frame(f, mm, p, config))(ch, m)
            dep = (jnp.max(ov).astype(jnp.int32) & 1).astype(jnp.uint8)
            return ch ^ dep

        per, _ = device_time_per_iter(lambda: chunk, body_render,
                                      n_iters=n_iters,
                                      invariant=(metas, params))
        row["render_ms"] = round(per * 1e3, 3)

        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
