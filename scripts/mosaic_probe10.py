"""Probe 10: does FUSING the two independent tophats (k=29 on R, k=55 on
LAB-B) into ONE kernel hide the zono chains' dependence latency?

Round-4 roofline: the zonotope kernels are partially dependence-latency
bound (~26 chained statements; measured 31% gain where pure sweep count
predicted ~50%).  The two production tophats are INDEPENDENT chains on
different inputs, so one kernel containing both gives the scheduler two
interleavable chains — and would additionally save the r_feat HBM round
trip once riders move in.  This probe measures the plain dual tophat
(no riders) against the two separate kernels at identical geometry.

Usage: nohup python scripts/mosaic_probe10.py > /tmp/probe10.log 2>&1 &
"""

import functools
import json
import sys

import numpy as np

sys.path.insert(0, ".")

T = 128


def build_dual(H, W, ka, kb, block, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lane_tracker_tpu.kernels.filter_stage2 import (
        LANE,
        _morph_zono,
        _read_of,
        _round_up,
    )

    mx = 64
    cols = _round_up(W + 2 * mx, LANE)
    dtype = jnp.bfloat16

    geo = {}
    for tag, k in (("a", ka), ("b", kb)):
        halo = 2 * (k // 2)
        in_rows = _round_up(block + 2 * halo, 8)
        mv = _round_up(k // 2 + 1, 8)
        geo[tag] = dict(k=k, halo=halo, in_rows=in_rows, mv=mv,
                        rows=in_rows + 2 * mv)
    grid = -(-H // block)

    def kernel(a_hbm, b_hbm, oa_ref, ob_ref,
               sa, wa0, wa1, aa, da, sb, wb0, wb1, ab, db, sem2):
        t = pl.program_id(0)
        i = pl.program_id(1)

        ctxs = {"a": (a_hbm, sa, wa0, wa1, aa, da, oa_ref),
                "b": (b_hbm, sb, wb0, wb1, ab, db, ob_ref)}
        cps = []
        for j, tag in enumerate(("a", "b")):
            hbm, st = ctxs[tag][0], ctxs[tag][1]
            g = geo[tag]
            cp = pltpu.make_async_copy(
                hbm.at[t, pl.ds(i * block, g["in_rows"]), :],
                st.at[g["mv"]:g["mv"] + g["in_rows"], :],
                sem2.at[j],
            )
            cp.start()
            cps.append(cp)
            st[0:g["mv"], :] = jnp.full((g["mv"], cols), 255, jnp.uint8)
            st[g["mv"] + g["in_rows"]:, :] = jnp.full(
                (g["mv"], cols), 255, jnp.uint8)
        for cp in cps:
            cp.wait()

        def phases(tag):
            _, st, w0, w1, acc, dacc, out = ctxs[tag]
            g = geo[tag]
            k, halo, mv, in_rows = g["k"], g["halo"], g["mv"], g["in_rows"]
            r = k // 2
            e_lo, e_n = mv + r, block + 2 * r

            def base_read(rs, cs):
                return st[rs, cs].astype(jnp.int32).astype(dtype)

            def erode():
                _morph_zono(base_read, w0, w1, acc, k, jnp.minimum, 255,
                            mx, W, e_lo, e_n, mv, in_rows)

            def mask():
                shape = (e_n, st.shape[1])
                rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
                grow = rows_i + e_lo - mv + i * block - halo
                in_img = ((grow >= 0) & (grow < H)
                          & (cols_i >= mx) & (cols_i < mx + W))
                acc[e_lo:e_lo + e_n, :] = jnp.where(
                    in_img, acc[e_lo:e_lo + e_n, :], jnp.asarray(0, dtype))

            def dilate():
                _morph_zono(_read_of(acc), w0, w1, dacc, k, jnp.maximum, 0,
                            mx, W, mv + 2 * r, block, e_lo, e_n)

            def subtract():
                s = mv + halo
                diff = (
                    st[s:s + block, mx:mx + W].astype(jnp.int32).astype(dtype)
                    - dacc[s:s + block, mx:mx + W])
                out[0, :, mx:mx + W] = diff.astype(jnp.int32).astype(
                    jnp.uint8)

            return erode, mask, dilate, subtract

        ea, ma, dila, suba = phases("a")
        eb, mb, dilb, subb = phases("b")
        # Phase-coarse order; the scheduler sees both independent chains
        # in one straight-line block and is free to interleave.
        ea(); eb(); ma(); mb(); dila(); dilb(); suba(); subb()

    def run(a_img, b_img):
        n = a_img.shape[0]

        def pad(img, tag):
            g = geo[tag]
            buf = jnp.full(
                (n, grid * block + (g["in_rows"] - block), cols), 255,
                jnp.uint8)
            return jax.lax.dynamic_update_slice(
                buf, img, (0, g["halo"], mx))

        outs = pl.pallas_call(
            kernel,
            grid=(n, grid),
            out_shape=(
                jax.ShapeDtypeStruct((n, grid * block, cols), jnp.uint8),
                jax.ShapeDtypeStruct((n, grid * block, cols), jnp.uint8),
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=(
                pl.BlockSpec((1, block, cols), lambda t, i: (t, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block, cols), lambda t, i: (t, i, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((geo["a"]["rows"], cols), jnp.uint8),
                pltpu.VMEM((geo["a"]["rows"], cols), dtype),
                pltpu.VMEM((geo["a"]["rows"], cols), dtype),
                pltpu.VMEM((geo["a"]["rows"], cols), dtype),
                pltpu.VMEM((geo["a"]["rows"], cols), dtype),
                pltpu.VMEM((geo["b"]["rows"], cols), jnp.uint8),
                pltpu.VMEM((geo["b"]["rows"], cols), dtype),
                pltpu.VMEM((geo["b"]["rows"], cols), dtype),
                pltpu.VMEM((geo["b"]["rows"], cols), dtype),
                pltpu.VMEM((geo["b"]["rows"], cols), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(pad(a_img, "a"), pad(b_img, "b"))
        return outs[0][:, :H, mx:mx + W], outs[1][:, :H, mx:mx + W]

    return run


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from lane_tracker_tpu.calib.io import load_calibration_npz
    from lane_tracker_tpu.calib.undistort import fused_undistort_warp_grid
    from lane_tracker_tpu.kernels.filter_stage2 import (
        _round_up,
        tophat_pallas2,
    )
    from lane_tracker_tpu.kernels.resample import (
        ResampleGrid,
        bilinear_gather_pair,
    )
    from lane_tracker_tpu.ops.color import rgb2lab_b_fast
    from lane_tracker_tpu.utils.timing import device_time_per_iter

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
    H, W = r_ch.shape[1:]

    def dep(x):
        return (jnp.max(x) & 1).astype(jnp.uint8)

    # Baseline: the two separate kernels chained (production defaults).
    def sep(c):
        ra = tophat_pallas2(c[0], 29)
        rb = tophat_pallas2(c[1], 55)
        return ra, rb

    want_a = np.asarray(jax.jit(lambda c: sep(c)[0])((r_ch, b_ch)))
    want_b = np.asarray(jax.jit(lambda c: sep(c)[1])((r_ch, b_ch)))

    def body_sep(c):
        ra, rb = sep(c)
        return c[0] ^ dep(ra) ^ dep(rb), c[1]

    per_iter, _ = device_time_per_iter(
        lambda: (r_ch, b_ch), body_sep, n_iters=8, repeats=3)
    print(json.dumps({"stage": "separate_29_55",
                      "ms_per_frame": round(per_iter / T * 1e3, 4)}),
          flush=True)

    for den in (2, 3):
        block = _round_up(-(-H // den), 8)
        try:
            dual = build_dual(H, W, 29, 55, block)
            got_a, got_b = jax.jit(lambda c: dual(c[0], c[1]))((r_ch, b_ch))
            exact = (np.array_equal(np.asarray(got_a), want_a)
                     and np.array_equal(np.asarray(got_b), want_b))

            def body(c, dual=dual):
                ra, rb = dual(c[0], c[1])
                return c[0] ^ dep(ra) ^ dep(rb), c[1]

            per_iter, _ = device_time_per_iter(
                lambda: (r_ch, b_ch), body, n_iters=8, repeats=3)
            print(json.dumps({
                "stage": f"dual_H/{den}", "exact": bool(exact),
                "ms_per_frame": round(per_iter / T * 1e3, 4),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            err = f"{type(e).__name__}: " + " | ".join(
                ln for ln in str(e).split("\n")[:8] if ln.strip())[:600]
            print(json.dumps({"stage": f"dual_H/{den}", "error": err}),
                  flush=True)


if __name__ == "__main__":
    main()
