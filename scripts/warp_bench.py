"""Micro-bench of the exact-chain warp stages (round 3).

The exact two-stage 3-channel chain measured 0.714 ms/frame as one blob;
this breaks it into: raw packing+und gathers, und packing+warp gathers,
and LAB on the warped frame, to target optimization.

Usage: nohup python scripts/warp_bench.py > /tmp/warp_bench.log &
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
    from lane_tracker_tpu.kernels.resample import (
        bilinear_gather,
        bilinear_gather_pair,
    )
    from lane_tracker_tpu.ops.color import rgb2lab_b_fast
    from lane_tracker_tpu.tracker.step import TrackerParams
    from lane_tracker_tpu.utils.timing import device_time_per_iter

    cam, warp = load_calibration_npz("assets/calibration.npz")
    params = TrackerParams.build(
        cam.cam_matrix, cam.dist_coeffs, warp.M, warp.Minv,
        warp.image_width_height, warp.warped_width_height,
        warp.mppv, warp.mpph, pipeline="fast",
    )
    names = ["frame911.jpg", "frame971.jpg", "test4.jpg", "straight_lines1.jpg"]
    imgs = [np.asarray(Image.open(f"assets/{n}").convert("RGB")) for n in names]
    chunk = jax.device_put(np.stack([imgs[i % 4] for i in range(T)]))

    def dep(x):
        return (jnp.max(x) & 1).astype(jnp.uint8)

    @jax.jit
    def mk_und(frames, p):
        def one(f):
            r_u, g_u = bilinear_gather_pair(f[..., 0], f[..., 1], p.grid_und)
            b_u = bilinear_gather(f[..., 2], p.grid_und)
            return jnp.stack([r_u, g_u, b_u], -1)
        return jax.vmap(one)(frames)

    und = jax.block_until_ready(mk_und(chunk, params))

    @jax.jit
    def mk_warped(u, p):
        def one(f):
            r_w, g_w = bilinear_gather_pair(f[..., 0], f[..., 1], p.grid_warp)
            b_w = bilinear_gather(f[..., 2], p.grid_warp)
            return jnp.stack([r_w, g_w, b_w], -1)
        return jax.vmap(one)(u)

    warped = jax.block_until_ready(mk_warped(und, params))

    stages = {
        "und3": (lambda: chunk, lambda c, p: c ^ dep(mk_und(c, p))),
        "warp3": (lambda: und, lambda c, p: c ^ dep(mk_warped(c, p))),
        "lab_warped": (lambda: warped,
                       lambda c, p: c ^ dep(jax.vmap(rgb2lab_b_fast)(c))[..., None]),
    }
    # pair vs single split for the warp stage
    def warp_pair_only(c, p):
        def one(f):
            r_w, g_w = bilinear_gather_pair(f[..., 0], f[..., 1], p.grid_warp)
            return r_w ^ g_w
        return c ^ dep(jax.vmap(one)(c))[..., None]
    stages["warp_pair_only"] = (lambda: und, warp_pair_only)

    def warp_single_only(c, p):
        def one(f):
            return bilinear_gather(f[..., 2], p.grid_warp)
        return c ^ dep(jax.vmap(one)(c))[..., None]
    stages["warp_single_only"] = (lambda: und, warp_single_only)

    for name, (mk, body) in stages.items():
        per_iter, rtt = device_time_per_iter(
            mk, body, n_iters=8, repeats=3, invariant=params)
        print(json.dumps({
            "stage": name,
            "ms_per_frame": round(per_iter / T * 1e3, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
