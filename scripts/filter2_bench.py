"""Hardware validation + timing of the v2 Pallas filter stage kernels.

For each stage kernel: compile on the real TPU, check bit-exactness
against the XLA op chain (computed on device too), then time it with the
chained-iteration protocol vmapped over a T-frame chunk.  Prints one JSON
line per stage; failures are caught per-stage so one flaky remote compile
does not kill the run.

Usage: nohup python scripts/filter2_bench.py > /tmp/filter2_bench.log &
"""

import json
import sys
import traceback

import numpy as np

sys.path.insert(0, ".")

T = 128


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from lane_tracker_tpu.calib.io import load_calibration_npz
    from lane_tracker_tpu.calib.undistort import fused_undistort_warp_grid
    from lane_tracker_tpu.kernels.filter_stage2 import (
        bilateral_threshold_pallas2,
        filter_stage_v2,
        tophat_pallas2,
    )
    from lane_tracker_tpu.kernels.resample import ResampleGrid, bilinear_gather_pair
    from lane_tracker_tpu.ops.color import rgb2lab_b_fast
    from lane_tracker_tpu.ops.filters import filter_lane_points_channels
    from lane_tracker_tpu.ops.morphology import tophat_ellipse
    from lane_tracker_tpu.ops.threshold import bilateral_adaptive_threshold, in_range
    from lane_tracker_tpu.utils.timing import device_time_per_iter

    cam, warp = load_calibration_npz("assets/calibration.npz")
    grid = ResampleGrid.from_quantized(
        fused_undistort_warp_grid(
            cam.cam_matrix, cam.dist_coeffs, warp.M,
            warp.image_width_height, warp.warped_width_height,
        )
    )
    names = ["frame911.jpg", "frame971.jpg", "test4.jpg", "straight_lines1.jpg"]
    imgs = [np.asarray(Image.open(f"assets/{n}").convert("RGB")) for n in names]
    chunk = jax.device_put(np.stack([imgs[i % len(imgs)] for i in range(T)]))

    @jax.jit
    def warp_channels(frames):
        def one(f):
            return bilinear_gather_pair(f[..., 0], rgb2lab_b_fast(f), grid)
        return jax.vmap(one)(frames)

    r_ch, b_ch = jax.block_until_ready(warp_channels(chunk))
    r0, b0 = r_ch[2], b_ch[2]  # test4

    def dep_u8(x):
        return (jnp.max(x) & 1).astype(jnp.uint8)

    def check(name, fn_pallas, fn_xla, x0):
        """Bit-exactness on device, then chunk timing.

        fn_pallas handles (H, W) or (T, H, W) natively (grid batching);
        fn_xla is per-image and vmapped for reference.
        """
        try:
            got = np.asarray(jax.jit(fn_pallas)(x0))
            want = np.asarray(jax.jit(fn_xla)(x0))
            exact = bool(np.array_equal(got, want))

            def body(c):
                out = fn_pallas(c)  # batched natively
                return c ^ dep_u8(out)

            src = r_ch if x0 is r0 else b_ch
            per_iter, _ = device_time_per_iter(
                lambda: src, body, n_iters=8, repeats=3)
            print(json.dumps({
                "stage": name, "exact": exact,
                "ms_per_frame": round(per_iter / T * 1e3, 4),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            err = f"{type(e).__name__}: " + " | ".join(
                ln for ln in str(e).split("\n")[:8] if ln.strip()
            )[:600]
            print(json.dumps({"stage": name, "error": err}), flush=True)

    check("tophat29_r", lambda x: tophat_pallas2(x, 29),
          lambda x: tophat_ellipse(x, 29), r0)
    check("tophat55_b", lambda x: tophat_pallas2(x, 55),
          lambda x: tophat_ellipse(x, 55), b0)
    check("thr25", lambda x: bilateral_threshold_pallas2(x, 25, 8),
          lambda x: bilateral_adaptive_threshold(x, ksize=25, C=8), r0)
    check("thr35", lambda x: bilateral_threshold_pallas2(x, 35, 5),
          lambda x: bilateral_adaptive_threshold(x, ksize=35, C=5), b0)

    def keep_xla(x):
        noise = in_range(x, 135, 255)
        bil = bilateral_adaptive_threshold(x, ksize=65, C=10)
        return jnp.where((noise == 0) | (bil > 0), jnp.uint8(255), jnp.uint8(0))

    check("thr65_noise",
          lambda x: bilateral_threshold_pallas2(x, 65, 10, noise_thresh=135),
          keep_xla, b0)

    # ---- full stage (demo1 params, mask_noise=True) ----
    def v2(r, b):
        return filter_stage_v2(r, b, ksize_r=15, C_r=8, ksize_b=35, C_b=5,
                               mask_noise=True, ksize_noise=65, C_noise=10,
                               noise_thresh=140)

    def xla(r, b):
        return filter_lane_points_channels(
            r, b, filter_type="bilateral", ksize_r=15, C_r=8, ksize_b=35,
            C_b=5, mask_noise=True, ksize_noise=65, C_noise=10,
            noise_thresh=140, backend="xla")

    try:
        got = np.asarray(jax.jit(v2)(r0, b0))
        want = np.asarray(jax.jit(xla)(r0, b0))
        exact = bool(np.array_equal(got, want))

        def body(c):
            r, b = c
            out = v2(r, b)  # batched natively
            d = dep_u8(out)
            return (r ^ d, b ^ d)

        per_iter, _ = device_time_per_iter(
            lambda: (r_ch, b_ch), body, n_iters=8, repeats=3)
        print(json.dumps({
            "stage": "filter_full_v2", "exact": exact,
            "ms_per_frame": round(per_iter / T * 1e3, 4),
        }), flush=True)
    except Exception:  # noqa: BLE001
        err = traceback.format_exc().strip().split("\n")[-1][:200]
        print(json.dumps({"stage": "filter_full_v2", "error": err}), flush=True)


if __name__ == "__main__":
    main()
