"""Fleet-mode throughput on one chip: 8 concurrent streams, hoisted
second attempt (VERDICT r1 item 2).

Round 1 measured 148 fps aggregate (vs 380 single-stream) because the
scanned second-attempt lax.cond became an executed-both-sides O(H*W)
re-filter under vmap.  With the hoist, the scan body is O(H) and the
batched front half absorbs both attempts' filters.

Usage: nohup python scripts/fleet_bench.py [S T ...] > /tmp/fleet.log &
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
    from lane_tracker_tpu.tracker.config import PRESETS
    from lane_tracker_tpu.tracker.step import TrackerParams, make_initial_state
    from lane_tracker_tpu.utils.timing import device_time_per_iter

    cam, warp = load_calibration_npz("assets/calibration.npz")
    params = TrackerParams.build(
        cam.cam_matrix, cam.dist_coeffs, warp.M, warp.Minv,
        warp.image_width_height, warp.warped_width_height,
        warp.mppv, warp.mpph, pipeline="fast",
    )
    config = PRESETS["demo1"]

    names = ["frame911.jpg", "frame971.jpg", "test4.jpg", "straight_lines1.jpg"]
    imgs = [np.asarray(Image.open(f"assets/{n}").convert("RGB")) for n in names]

    configs = [(8, 16), (8, 32), (4, 32)]
    if argv:
        configs = [(int(argv[i]), int(argv[i + 1]))
                   for i in range(0, len(argv), 2)]

    from jax.sharding import Mesh

    from lane_tracker_tpu.parallel.streams import build_fleet_processor

    mesh = Mesh(np.asarray(jax.devices()[:1]), axis_names=("stream",))

    for S, T in configs:
        frames = np.stack([
            np.stack([imgs[(s + i) % len(imgs)] for i in range(T)])
            for s in range(S)
        ])
        frames_d = jax.device_put(frames)
        single = make_initial_state(config, params.warped_size)
        states0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (S, *x.shape)), single)
        fleet = build_fleet_processor(config, mesh, with_overlay=True)

        def body(c, p):
            states, fr = c
            states, outs, metrics = fleet(states, fr, p)
            d = (outs.overlay.max() & 1).astype(jnp.uint8)
            return (states, fr ^ d)

        per_iter, _ = device_time_per_iter(
            lambda: (states0, frames_d), body, n_iters=8, repeats=3,
            invariant=params)
        frames_per_call = S * T
        fps = frames_per_call / per_iter
        print(json.dumps({
            "streams": S, "chunk": T,
            "aggregate_fps": round(fps, 1),
            "ms_per_frame": round(per_iter / frames_per_call * 1e3, 3),
        }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
