"""Mosaic probe, round 6: does the MXU overlap with VPU sweeps in-kernel?

If a jnp.dot issued inside a Pallas kernel executes concurrently with the
kernel's VPU statement sweeps, the row-prefix matmuls (0.094 ms/frame of
otherwise-idle MXU) can ride inside the VPU-bound merge+open kernel for
~free.  This times: (a) a sweep-only kernel shaped like merge+open's VPU
load, (b) the same plus three (368, 1152) @ (1152, 1152) bf16 dots
(exactly the per-block prefix matmuls), and (c) dots only.

Usage: nohup python scripts/mosaic_probe6.py > /tmp/mosaic_probe6.log &
"""

import functools
import json
import sys

import numpy as np

sys.path.insert(0, ".")

T = 32
ROWS, COLS = 600, 1280
BLOCK, KP, NP = 368, 1152, 1152
SWEEPS = 30


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lane_tracker_tpu.utils.timing import device_time_per_iter

    def make(kind):
        def kernel(x_hbm, tri_ref, out_ref, scr, acc, sem):
            t = pl.program_id(0)
            cp = pltpu.make_async_copy(x_hbm.at[t], scr, sem)
            cp.start()
            cp.wait()
            if kind in ("sweeps", "both"):
                for i in range(SWEEPS):
                    d = (i % 7) + 1
                    acc[0:ROWS - 8, :] = jnp.minimum(
                        scr[0:ROWS - 8, :], scr[d:d + ROWS - 8, :])
                    scr[0:ROWS - 8, :] = acc[0:ROWS - 8, :] + jnp.asarray(
                        1.0, jnp.bfloat16)
            if kind in ("dots", "both"):
                s = jnp.zeros((1, 1), jnp.float32)
                for j in range(3):
                    a = scr[8 * j:8 * j + BLOCK, 64:64 + KP]
                    p = jnp.dot(a, tri_ref[...],
                                preferred_element_type=jnp.float32)
                    s = s + jnp.sum(p, axis=(0, 1), keepdims=True)
                out_ref[0] = s + jnp.sum(
                    scr[0:8, 0:128].astype(jnp.float32), axis=(0, 1),
                    keepdims=True)
                return
            out_ref[0] = jnp.sum(
                scr[0:8, 0:128].astype(jnp.float32), axis=(0, 1),
                keepdims=True)

        return pl.pallas_call(
            kernel,
            grid=(T,),
            out_shape=jax.ShapeDtypeStruct((T, 1, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((KP, NP), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((ROWS, COLS), jnp.bfloat16),
                pltpu.VMEM((ROWS, COLS), jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((T, ROWS, COLS)).astype(np.float32)).astype(
        jnp.bfloat16)
    tri = jnp.asarray(
        np.tril(np.ones((KP, NP), np.float32), -1)).astype(jnp.bfloat16)

    for kind in ("sweeps", "dots", "both"):
        for attempt in range(2):
            try:
                call = make(kind)
                fn = jax.jit(lambda c, tr: call(c, tr))
                jax.block_until_ready(fn(x, tri))
                per, _ = device_time_per_iter(
                    lambda: x,
                    lambda c, tr: c + fn(c, tr).astype(jnp.bfloat16)[:, :1, :1],
                    n_iters=8, repeats=3, invariant=tri)
                print(json.dumps({
                    "kind": kind,
                    "ms_per_frame": round(per / T * 1e3, 4)}), flush=True)
                break
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"kind": kind, "attempt": attempt,
                                  "error": str(e).split("\n")[0][:130]}),
                      flush=True)


if __name__ == "__main__":
    main()
