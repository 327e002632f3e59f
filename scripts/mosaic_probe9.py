"""Probe 9: tophat + RIDER thresholds (independent inputs, MXU under VPU).

Probe7's fused channel kernels lost to halo redundancy (the tophat must
be recomputed over the threshold's read reach).  The rider design avoids
that entirely: thr25(T_R) and thr65noise(B) read independent
already-materialized inputs, so fusing them into the tophat55(B) kernel
adds only their staging casts and compares to the VPU while their band
matmuls ride the otherwise-idle MXU (probe6 measured near-perfect
overlap).  Expected: K2_fused ~= tophat55 alone + ~0.02, vs
tophat55 + thr25 + thr65 = ~0.37 unfused.

Usage: nohup python scripts/mosaic_probe9.py > /tmp/probe9.log &
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

T = 128


def main():
    import jax

    from lane_tracker_tpu.calib.io import load_calibration_npz
    from lane_tracker_tpu.calib.undistort import fused_undistort_warp_grid
    from lane_tracker_tpu.kernels.filter_stage2 import (
        bilateral_threshold_pallas2,
        tophat_pallas2,
        tophat_riders_pallas2,
    )
    from lane_tracker_tpu.kernels.resample import (
        ResampleGrid,
        bilinear_gather_pair,
    )
    from lane_tracker_tpu.ops.color import rgb2lab_b_fast
    from lane_tracker_tpu.utils.timing import device_time_per_iter
    from PIL import Image

    cam, warp = load_calibration_npz("assets/calibration.npz")
    grid = ResampleGrid.from_quantized(
        fused_undistort_warp_grid(
            cam.cam_matrix, cam.dist_coeffs, warp.M,
            warp.image_width_height, warp.warped_width_height,
        )
    )
    names = ["frame911.jpg", "frame971.jpg", "test4.jpg",
             "straight_lines1.jpg"]
    imgs = [np.asarray(Image.open(f"assets/{n}").convert("RGB"))
            for n in names]
    chunk = jax.device_put(np.stack([imgs[i % len(imgs)] for i in range(T)]))

    @jax.jit
    def warp_channels(frames):
        def one(f):
            return bilinear_gather_pair(f[..., 0], rgb2lab_b_fast(f), grid)
        return jax.vmap(one)(frames)

    r_chan, b_chan = jax.block_until_ready(warp_channels(chunk))
    t_r = jax.block_until_ready(jax.jit(
        lambda x: tophat_pallas2(x, 29))(r_chan))

    import jax.numpy as jnp

    def dep_u8(xs):
        if not isinstance(xs, tuple):
            xs = (xs,)
        d = jnp.uint8(0)
        for x in xs:
            d = d ^ (jnp.max(x) & 1).astype(jnp.uint8)
        return d

    def timeit(name, fn):
        def body(c):
            b, tr = c
            return b ^ dep_u8(fn(b, tr)), tr

        try:
            per_iter, _ = device_time_per_iter(
                lambda: (b_chan, t_r), body, n_iters=8, repeats=3)
            print(json.dumps({
                "probe": name,
                "ms_per_frame": round(per_iter / T * 1e3, 4),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            err = f"{type(e).__name__}: " + " | ".join(
                ln for ln in str(e).split("\n")[:6] if ln.strip())[:400]
            print(json.dumps({"probe": name, "error": err}), flush=True)

    # Unfused pieces for the baseline sum.
    timeit("tophat55", lambda b, tr: tophat_pallas2(b, 55))
    timeit("thr25", lambda b, tr: bilateral_threshold_pallas2(tr, 25, 8))
    timeit("thr65n",
           lambda b, tr: bilateral_threshold_pallas2(b, 65, 10,
                                                     noise_thresh=135))

    # Rider variants.
    timeit("riders_thr25",
           lambda b, tr: tophat_riders_pallas2(b, 55, [(tr, 25, 8, -1)]))
    timeit("riders_thr25_thr65",
           lambda b, tr: tophat_riders_pallas2(
               b, 55, [(tr, 25, 8, -1), (b, 65, 10, 135)]))
    # Block sensitivity: H/3 (smaller V-dot redundancy trade).
    H = int(b_chan.shape[1])
    blk3 = ((-(-H // 3)) + 7) // 8 * 8
    timeit("riders_both_Hdiv3",
           lambda b, tr: tophat_riders_pallas2(
               b, 55, [(tr, 25, 8, -1), (b, 65, 10, 135)], block=blk3))

    # Exactness on hardware (one frame).
    got = tophat_riders_pallas2(
        b_chan[:1], 55, [(t_r[:1], 25, 8, -1), (b_chan[:1], 65, 10, 135)])
    w0 = tophat_pallas2(b_chan[:1], 55)
    w1 = bilateral_threshold_pallas2(t_r[:1], 25, 8)
    w2 = bilateral_threshold_pallas2(b_chan[:1], 65, 10, noise_thresh=135)
    ok = all(bool((np.asarray(g) == np.asarray(w)).all())
             for g, w in zip(got, (w0, w1, w2)))
    print(json.dumps({"probe": "hw_exact", "ok": ok}), flush=True)


if __name__ == "__main__":
    main()
