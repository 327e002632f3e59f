"""Probe 8: UNFUSED tophat kernel block-size study.

Probe 7 showed the fused channel kernels lose at every block size — at
full height because the vertical band matmul's dense K dimension makes
its work grow quadratically with block rows.  The unfused tophats are
pure VPU sweeps (linear in rows), so killing the halo redundancy
(2*2r extra rows per block, ~30% at k=55 with H/3 blocks) with bigger
blocks should be a straight win.  This probe measures it.

Usage: nohup python scripts/mosaic_probe8.py > /tmp/probe8.log &
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
    )
    from scripts.channel_fused_postmortem import channel_stage_pyr_pallas2
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

    r_ch, b_ch = jax.block_until_ready(warp_channels(chunk))
    H = r_ch.shape[1]

    def dep_u8(x):
        import jax.numpy as jnp
        return (jnp.max(x) & 1).astype(jnp.uint8)

    def time_it(name, fn, src, ref=None):
        try:
            if ref is not None:
                got = np.asarray(fn(src[:1]))[0]
                exact = bool(np.array_equal(got, ref))
            else:
                exact = None

            def body(c):
                return c ^ dep_u8(fn(c))

            per_iter, _ = device_time_per_iter(
                lambda: src, body, n_iters=8, repeats=3)
            print(json.dumps({
                "probe": name, "exact": exact,
                "ms_per_frame": round(per_iter / T * 1e3, 4),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            err = f"{type(e).__name__}: " + " | ".join(
                ln for ln in str(e).split("\n")[:6] if ln.strip())[:400]
            print(json.dumps({"probe": name, "error": err}), flush=True)

    ref29 = np.asarray(jax.jit(
        lambda x: tophat_pallas2(x, 29))(r_ch[:1]))[0]
    ref55 = np.asarray(jax.jit(
        lambda x: tophat_pallas2(x, 55))(b_ch[:1]))[0]

    for frac, tag in ((3, "H/3"), (2, "H/2"), (1, "H")):
        blk = -(-H // frac)
        blk = ((blk + 7) // 8) * 8
        time_it(f"tophat29_{tag}",
                lambda x, b=blk: tophat_pallas2(x, 29, block=b), r_ch, ref29)
        time_it(f"tophat55_{tag}",
                lambda x, b=blk: tophat_pallas2(x, 55, block=b), b_ch, ref55)

    # Fused pyramid-sum channel kernels at the BENCH's demo1 parameters
    # (R: kt=29 kb=15 C=8; B: kt=55 kb=35 C=5), vs the unfused chains.
    refc_r = np.asarray(jax.jit(lambda x: bilateral_threshold_pallas2(
        tophat_pallas2(x, 29), 15, 8))(r_ch[:1]))[0]
    refc_b = np.asarray(jax.jit(lambda x: bilateral_threshold_pallas2(
        tophat_pallas2(x, 55), 35, 5))(b_ch[:1]))[0]
    time_it("R15_unfused", lambda x: bilateral_threshold_pallas2(
        tophat_pallas2(x, 29), 15, 8), r_ch)
    time_it("B35_unfused", lambda x: bilateral_threshold_pallas2(
        tophat_pallas2(x, 55), 35, 5), b_ch)
    for frac, tag in ((1, "H"), (2, "H/2"), (3, "H/3")):
        blk = -(-H // frac)
        blk = ((blk + 7) // 8) * 8
        time_it(f"R15_pyrfused_{tag}",
                lambda x, b=blk: channel_stage_pyr_pallas2(
                    x, 29, 15, 8, block=b), r_ch, refc_r)
        time_it(f"B35_pyrfused_{tag}",
                lambda x, b=blk: channel_stage_pyr_pallas2(
                    x, 55, 35, 5, block=b), b_ch, refc_b)


if __name__ == "__main__":
    main()
