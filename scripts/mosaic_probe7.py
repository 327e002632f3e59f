"""Probe 7: fused channel-kernel block-size study.

The fused tophat+threshold kernel (channel_stage_pallas2) measured a net
LOSS at the default 3-block split (filter_full 0.648 vs 0.633 unfused):
the tophat must be computed over the threshold's full read reach
(block + 2*kb + 1 extra rows per block), so splitting the frame into 3
blocks pays that halo 3x.  This probe times each channel kernel at
block = H/3 (default), H/2, and H (grid=1, no halo redundancy at all),
plus the unfused chains, to pick the winner.

Usage: nohup python scripts/mosaic_probe7.py > /tmp/probe7.log &
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
    from scripts.channel_fused_postmortem import channel_stage_pallas2
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
                got = fn(src[:1])
                got = got[0] if not isinstance(got, tuple) else got[0][0]
                exact = bool(np.array_equal(np.asarray(got), ref))
            else:
                exact = None

            def body(c):
                out = fn(c)
                if isinstance(out, tuple):
                    out = out[0]
                return c ^ dep_u8(out)

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

    # reference outputs (unfused, already proven exact on hw)
    ref_r = np.asarray(jax.jit(lambda x: bilateral_threshold_pallas2(
        tophat_pallas2(x, 29), 25, 8))(r_ch[:1]))[0]
    ref_b = np.asarray(jax.jit(lambda x: bilateral_threshold_pallas2(
        tophat_pallas2(x, 55), 35, 5))(b_ch[:1]))[0]

    # unfused chains (for an apples-to-apples chained timing)
    time_it("R_unfused", lambda x: bilateral_threshold_pallas2(
        tophat_pallas2(x, 29), 25, 8), r_ch)
    time_it("B_unfused_noise", lambda x: (
        bilateral_threshold_pallas2(tophat_pallas2(x, 55), 35, 5),
        bilateral_threshold_pallas2(x, 65, 10, noise_thresh=135)), b_ch)

    for frac, tag in ((3, "H/3"), (2, "H/2"), (1, "H")):
        blk = -(-H // frac)
        blk = ((blk + 7) // 8) * 8
        time_it(f"R_fused_{tag}", lambda x, b=blk: channel_stage_pallas2(
            x, 29, 25, 8, block=b), r_ch, ref_r)
        time_it(f"B_fused_noise_{tag}",
                lambda x, b=blk: channel_stage_pallas2(
                    x, 55, 35, 5, noise=(65, 10, 135), block=b),
                b_ch, ref_b)


if __name__ == "__main__":
    main()
