"""Probe the tile-structured (rowmm) resampler against the per-pixel
gather across chunk sizes, warp-stage-only and end-to-end.

The rowmm path (kernels/resample_rowmm.py) was built for the unbatched
single-frame program where the scalar gather's per-index cost is the
measured latency cliff (45.9 ms at T=1, 44 of it the warp).  Batched, the
per-pixel gather amortizes its index cost across the 128-lane frame axis
— this probe measures WHERE the crossover sits and whether the one-hot
contraction (whose tensors are read once per frame) can also beat the
gather at throughput batches (a potential T=512 headline lever: warp+LAB
is 0.349 of the 0.9315 ms/frame full-width budget).

Usage: nohup python scripts/rowmm_probe.py [T ...] > /tmp/rowmm.log &
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
    from lane_tracker_tpu.tracker.step import (
        TrackerParams,
        _warp_channels,
    )
    from lane_tracker_tpu.utils.timing import device_time_per_iter

    cam, warp = load_calibration_npz("assets/calibration.npz")
    frame = np.asarray(Image.open("assets/test4.jpg").convert("RGB"))

    # Sub-stage breakdown at T=1: the slab fetch (vmapped dynamic_slice)
    # and the one-hot contraction separately, so a rowmm regression
    # localizes to data movement vs the batched-tiny-matmul shape.
    if "substages" in argv:
        from lane_tracker_tpu.kernels.resample_rowmm import _taps_rowmm

        params = TrackerParams.build(
            cam.cam_matrix, cam.dist_coeffs, warp.M, warp.Minv,
            warp.image_width_height, warp.warped_width_height,
            warp.mppv, warp.mpph, pipeline="corridor",
        ).with_rowmm()
        mm = params.mm_warp
        R, omega, tile, nT, Wp = mm.meta
        Wd, Hd = mm.dst_size
        Ws, Hs = mm.src_size
        planes = jax.device_put(
            np.random.default_rng(0).integers(
                0, 256, (2, Hs, Ws), dtype=np.uint8))

        def slab_only(carry, mmg):
            x = jnp.pad(carry, ((0, 0), (0, 1), (0, Wp - carry.shape[2])))

            def slab(iy, s):
                return jax.lax.dynamic_slice(
                    x, (0, iy, s), (2, R + 1, omega))

            win = jax.vmap(jax.vmap(slab))(mmg.iy0, mmg.starts)
            dep = (jnp.max(win) & 1).astype(jnp.uint8)
            return carry ^ dep

        def taps_full(carry, mmg):
            taps = _taps_rowmm(carry, mmg)
            dep = (jnp.max(taps[0]).astype(jnp.int32) & 1).astype(jnp.uint8)
            return carry ^ dep

        for label, fn in (("slab_only", slab_only), ("taps_full", taps_full)):
            per_call, _ = device_time_per_iter(
                lambda: planes, fn, n_iters=64, repeats=3, invariant=mm)
            print(json.dumps({"substage": label,
                              "ms": round(per_call * 1e3, 3)}), flush=True)
        return

    sizes = [int(a) for a in argv] or [1, 4, 32, 512]
    for pipeline in ("corridor", "fast"):
        params = TrackerParams.build(
            cam.cam_matrix, cam.dist_coeffs, warp.M, warp.Minv,
            warp.image_width_height, warp.warped_width_height,
            warp.mppv, warp.mpph, pipeline=pipeline,
        )
        params_mm = params.with_rowmm()
        for T in sizes:
            chunk = jax.device_put(np.broadcast_to(frame, (T, *frame.shape))
                                   .copy())

            for label, p in (("gather", params), ("rowmm", params_mm)):
                if T == 1:
                    def stage(fr, pp):
                        r, b = _warp_channels(fr[0], pp)
                        return r[None], b[None]
                else:
                    def stage(fr, pp):
                        return jax.vmap(
                            lambda f: _warp_channels(f, pp))(fr)

                def body(carry, pp):
                    ch = carry
                    r, b = stage(ch, pp)
                    dep = ((jnp.max(r) ^ jnp.max(b)) & 1).astype(jnp.uint8)
                    return ch ^ dep

                n_iters = int(min(256, max(16, 1024 // T)))
                per_call, _ = device_time_per_iter(
                    lambda: chunk, body, n_iters=n_iters, repeats=3,
                    invariant=p)
                print(json.dumps({
                    "pipeline": pipeline, "T": T, "resampler": label,
                    "warp_ms_per_frame": round(per_call / T * 1e3, 3),
                    "warp_ms_per_chunk": round(per_call * 1e3, 3),
                }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
