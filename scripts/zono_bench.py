"""Hardware check + timing of the zonotope (Minkowski) morphology vs the
row-run scheme, for the production tophat kernels.

Round-4 verdict item 1: the roofline said "cutting further means a
different SE decomposition"; zono_schedule is that decomposition (see
scripts/se_decomp_search.py).  This measures it on the real chip.

Usage: nohup python scripts/zono_bench.py > /tmp/zono_bench.log 2>&1 &
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
    from lane_tracker_tpu.calib.undistort import fused_undistort_warp_grid
    from lane_tracker_tpu.kernels.filter_stage2 import (
        tophat_pallas2,
        tophat_riders_pallas2,
    )
    from lane_tracker_tpu.kernels.resample import ResampleGrid, bilinear_gather_pair
    from lane_tracker_tpu.ops.color import rgb2lab_b_fast
    from lane_tracker_tpu.ops.morphology import tophat_ellipse
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
    r0, b0 = r_ch[2], b_ch[2]

    def dep_u8(x):
        return (jnp.max(x) & 1).astype(jnp.uint8)

    def check(name, fn_pallas, fn_xla, x0, src):
        try:
            got = np.asarray(jax.jit(fn_pallas)(x0))
            want = np.asarray(jax.jit(fn_xla)(x0))
            exact = bool(np.array_equal(got, want))

            def body(c):
                out = fn_pallas(c)
                return c ^ dep_u8(out)

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

    for impl in ("rowrun", "zono"):
        check(f"tophat29_{impl}",
              lambda x, i=impl: tophat_pallas2(x, 29, morph_impl=i),
              lambda x: tophat_ellipse(x, 29), r0, r_ch)
        check(f"tophat55_{impl}",
              lambda x, i=impl: tophat_pallas2(x, 55, morph_impl=i),
              lambda x: tophat_ellipse(x, 55), b0, b_ch)

    # Production rider configuration: tophat55(B) carrying thr25(tophat29_R)
    # and thr65+noise(B); exactness of the tophat output only is asserted
    # here (rider outputs are checked bit-exact by the suite).
    r_feat = jax.block_until_ready(
        jax.jit(lambda x: tophat_pallas2(x, 29, morph_impl="rowrun"))(r_ch))

    for impl in ("rowrun", "zono"):
        def riders_fn(b, i=impl, rf=r_feat):
            rsrc = rf[2] if b.ndim == 2 else rf
            return tophat_riders_pallas2(
                b, 55, [(rsrc, 25, 8, -1), (b, 65, 10, 135)], morph_impl=i)[0]

        check(f"tophat55_riders_{impl}", riders_fn,
              lambda x: tophat_ellipse(x, 55), b0, b_ch)


if __name__ == "__main__":
    main()
