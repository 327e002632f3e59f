"""Mosaic probe, round 5: a bf16 clone of the PRODUCTION tophat kernel.

probe4's synthetic ping-pong harness turned out to be unreliable — its
i32 sublane-min variant fails remote compile even though the production
tophat kernel uses exactly that pattern successfully.  So this probes the
real question directly: take _tophat_kernel verbatim, switch the compute
scratch buffers to bfloat16 (values 0..255 are exact in bf16, so min/max
and the final subtract are bit-exact), and compile/validate/time it on
hardware against the i32 version.  If it works, VMEM sweep traffic (the
measured cost driver) halves on the filter's dominant stage.

Usage: nohup python scripts/mosaic_probe5.py > /tmp/mosaic_probe5.log &
"""

import functools
import json
import sys
import traceback

import numpy as np

sys.path.insert(0, ".")

T = 32


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lane_tracker_tpu.kernels.filter_stage2 import (
        LANE,
        _morph,
        _read_of,
        _round_up,
    )
    from lane_tracker_tpu.ops.morphology import tophat_ellipse
    from lane_tracker_tpu.utils.timing import device_time_per_iter

    def _tophat_kernel_bf16(
        in_hbm, out_ref, stage, w0, w1, acc, dacc, sem,
        *, ksize, block, halo, mv, mx, h_img, w_img, cols, dtype,
    ):
        t = pl.program_id(0)
        i = pl.program_id(1)
        in_rows = stage.shape[0] - 2 * mv
        h, w = in_rows, w_img

        cp = pltpu.make_async_copy(
            in_hbm.at[t, pl.ds(i * block, in_rows), :],
            stage.at[mv:mv + in_rows, :],
            sem,
        )
        cp.start()
        stage[0:mv, :] = jnp.full((mv, cols), 255, jnp.uint8)
        stage[mv + in_rows:, :] = jnp.full((mv, cols), 255, jnp.uint8)
        cp.wait()

        def base_read(rs, cs):
            return stage[rs, cs].astype(jnp.int32).astype(dtype)

        r = ksize // 2
        e_lo, e_n = mv + r, block + 2 * r

        _morph(base_read, w0, w1, acc, ksize, jnp.minimum, 255,
               mx, w, e_lo, e_n, mv, in_rows)

        shape = (e_n, stage.shape[1])
        rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        grow = rows_i + e_lo - mv + i * block - halo
        in_img = (
            (grow >= 0) & (grow < h_img)
            & (cols_i >= mx) & (cols_i < mx + w_img)
        )
        acc[e_lo:e_lo + e_n, :] = jnp.where(
            in_img, acc[e_lo:e_lo + e_n, :], jnp.asarray(0, dtype))

        _morph(_read_of(acc), w0, w1, dacc, ksize, jnp.maximum, 0,
               mx, w, mv + 2 * r, block, e_lo, e_n)

        s = mv + halo
        diff = (
            stage[s:s + block, mx:mx + w].astype(jnp.int32).astype(dtype)
            - dacc[s:s + block, mx:mx + w]
        )
        out_ref[0, :, mx:mx + w] = diff.astype(jnp.int32).astype(jnp.uint8)

    def tophat_bf16(img, ksize, dtype, block=None):
        T_, H, W = img.shape
        halo = 2 * (ksize // 2)
        if block is None:
            block = _round_up(-(-H // 3), 8)
        grid = -(-H // block)
        mv = _round_up(ksize // 2 + 1, 8)
        mx = 64
        cols = _round_up(W + 2 * mx, LANE)
        in_rows = _round_up(block + 2 * halo, 8)
        rows = in_rows + 2 * mv

        hbuf = jnp.full((T_, grid * block + (in_rows - block), cols), 255,
                        jnp.uint8)
        hbuf = jax.lax.dynamic_update_slice(hbuf, img, (0, halo, mx))

        kernel = functools.partial(
            _tophat_kernel_bf16,
            ksize=int(ksize), block=int(block), halo=int(halo),
            mv=int(mv), mx=int(mx), h_img=int(H), w_img=int(W),
            cols=int(cols), dtype=dtype,
        )
        out = pl.pallas_call(
            kernel,
            grid=(T_, grid),
            out_shape=jax.ShapeDtypeStruct((T_, grid * block, cols),
                                           jnp.uint8),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, block, cols), lambda t, i: (t, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((rows, cols), jnp.uint8),
                pltpu.VMEM((rows, cols), dtype),
                pltpu.VMEM((rows, cols), dtype),
                pltpu.VMEM((rows, cols), dtype),
                pltpu.VMEM((rows, cols), dtype),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )(hbuf)
        return out[:, :H, mx:mx + W]

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.integers(0, 256, (T, 1100, 1080), np.uint8))
    want = np.asarray(jax.jit(jax.vmap(
        lambda x: tophat_ellipse(x, 29)))(img[:2]))
    want55 = np.asarray(jax.jit(jax.vmap(
        lambda x: tophat_ellipse(x, 55)))(img[:2]))

    for name, k, dtype, oracle in (
        ("tophat29_bf16", 29, jnp.bfloat16, want),
        ("tophat55_bf16", 55, jnp.bfloat16, want55),
        ("tophat29_f32", 29, jnp.float32, want),
    ):
        for attempt in range(3):
            try:
                fn = jax.jit(lambda x, kk=k, dt=dtype: tophat_bf16(x, kk, dt))
                got = np.asarray(jax.block_until_ready(fn(img)))
                exact = bool(np.array_equal(got[:2], oracle))
                per_iter, _ = device_time_per_iter(
                    lambda: img,
                    lambda c, fn=fn: c ^ (jnp.max(fn(c)) & 1).astype(jnp.uint8),
                    n_iters=8, repeats=3)
                print(json.dumps({
                    "variant": name, "attempt": attempt, "exact": exact,
                    "ms_per_frame": round(per_iter / T * 1e3, 4)}), flush=True)
                break
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "variant": name, "attempt": attempt,
                    "error": str(e).split("\n")[0][:140]}), flush=True)


if __name__ == "__main__":
    main()
