"""Mosaic probe, round 2: bf16 morphology candidates + failure isolation.

Round 1 found: pltpu.roll compiles only for 32-bit dtypes here; i16 add
works but i16/u8 minimum kernels failed remote compile; timings below ~1 us
per pass need more chained iterations for signal.  This round isolates
which ops fail, checks bf16 (min/max-exact for 0..255) as the morphology
dtype, and re-times the viable variants accurately.

Usage: nohup python scripts/mosaic_probe2.py > /tmp/mosaic_probe2.log &
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

H, W = 1104, 1280
K = 64


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lane_tracker_tpu.utils.timing import device_time_per_iter

    def run(name, dtype, kernel, n_iters=64, shape=(H, W), init="int"):
        try:
            call = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(shape, dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            vals = np.random.default_rng(0).integers(0, 100, shape)
            x0 = jnp.asarray(vals.astype(np.float32 if init == "f" else np.int32)).astype(dtype)
            per_iter, _ = device_time_per_iter(
                lambda: x0, lambda c: call(c), n_iters=n_iters, repeats=3)
            print(json.dumps({"variant": name,
                              "us_per_pass": round(per_iter / K * 1e6, 3)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:150]
            print(json.dumps({"variant": name, "error": msg}), flush=True)

    # ---- bf16: min + roll (the morphology candidate) ----
    def bf16_roll_min(axis, shift):
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            for _ in range(K):
                x = jnp.minimum(x, pltpu.roll(x, shift, axis))
            o_ref[:] = x
        return kernel

    run("bf16_lane_roll_min_s17", jnp.bfloat16, bf16_roll_min(1, 17), init="f")
    run("bf16_sublane_roll_min_s17", jnp.bfloat16, bf16_roll_min(0, 17), init="f")
    run("bf16_lane_roll_min_s1", jnp.bfloat16, bf16_roll_min(1, 1), init="f")

    def bf16_roll_max(axis, shift):
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            for _ in range(K):
                x = jnp.maximum(x, pltpu.roll(x, shift, axis))
            o_ref[:] = x
        return kernel

    run("bf16_lane_roll_max_s17", jnp.bfloat16, bf16_roll_max(1, 17), init="f")

    # ---- isolate the i16/u8 minimum failure ----
    def min_self_shift(dtype):
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            c = jnp.asarray(1, dtype)
            for _ in range(K):
                x = jnp.minimum(x + c, x)
            o_ref[:] = x
        return kernel

    run("i16_min_plain", jnp.int16, min_self_shift(jnp.int16))
    run("u8_min_plain_1088", jnp.uint8, min_self_shift(jnp.uint8),
        shape=(1088, 1280))

    def where_kernel(dtype):
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            c = jnp.asarray(3, dtype)
            for _ in range(K):
                x = jnp.where(x > c, x, x + c)
            o_ref[:] = x
        return kernel

    run("i16_where_add", jnp.int16, where_kernel(jnp.int16))

    # ---- accurate re-times of viable 32-bit variants ----
    def roll_add(axis, shift):
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            for _ in range(K):
                x = x + pltpu.roll(x, shift, axis)
            o_ref[:] = x
        return kernel

    run("i32_lane_roll_add_s17_fine", jnp.int32, roll_add(1, 17))
    run("i32_lane_roll_add_s128_fine", jnp.int32, roll_add(1, 128))
    run("i32_sublane_roll_add_s8_fine", jnp.int32, roll_add(0, 8))

    def add_only(x_ref, o_ref):
        x = x_ref[:]
        c = jnp.asarray(1, x.dtype)
        for _ in range(K):
            x = x + (x >> 1) + c
        o_ref[:] = x
    run("i32_addshift_only_fine", jnp.int32, add_only)

    def f32_roll_min(axis, shift):
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            for _ in range(K):
                x = jnp.minimum(x, pltpu.roll(x, shift, axis))
            o_ref[:] = x
        return kernel

    run("f32_lane_roll_min_s17", jnp.float32, f32_roll_min(1, 17), init="f")
    run("f32_sublane_roll_min_s17", jnp.float32, f32_roll_min(0, 17), init="f")

    # ---- packed u16-pairs-in-i32 shifted sums (threshold candidate) ----
    def packed_shift_add(x_ref, o_ref):
        x = x_ref[:]
        for _ in range(K // 2):
            r8 = pltpu.roll(x, 8, 1)
            r9 = pltpu.roll(x, 9, 1)
            odd = (x >> 16) | (r9 << 16)
            x = x + odd + r8
        o_ref[:] = x
    # K//2 outer iters = K logical packed ops-ish; report per outer pass.
    run("i32_packed_oddshift_add", jnp.int32, packed_shift_add)

    # ---- slice-shift variants (no roll): scratch ref + offset windows ----
    def slice_op(op_name, dtype, axis, shift, init):
        op = {"add": (lambda a, b: a + b),
              "min": jnp.minimum}[op_name]

        def kernel(x_ref, o_ref, scr):
            scr[:, :] = jnp.zeros(scr.shape, scr.dtype)
            scr[0:H, 0:W] = x_ref[:]
            x = x_ref[:]
            for _ in range(K):
                if axis == 0:
                    x = op(x, scr[shift:shift + H, 0:W])
                else:
                    x = op(x, scr[0:H, shift:shift + W])
                scr[0:H, 0:W] = x
            o_ref[:] = x

        try:
            call = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((H, W), dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((H + 32, W + 128), dtype)],
            )
            vals = np.random.default_rng(0).integers(0, 100, (H, W))
            x0 = jnp.asarray(vals.astype(np.float32 if init == "f" else np.int32)).astype(dtype)
            per_iter, _ = device_time_per_iter(
                lambda: x0, lambda c: call(c), n_iters=64, repeats=3)
            print(json.dumps({
                "variant": f"{np.dtype(dtype).name}_{'sub' if axis == 0 else 'lane'}_slice_{op_name}_s{shift}",
                "us_per_pass": round(per_iter / K * 1e6, 3)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({
                "variant": f"{np.dtype(dtype).name}_{'sub' if axis == 0 else 'lane'}_slice_{op_name}_s{shift}",
                "error": str(e).split("\n")[0][:150]}), flush=True)

    slice_op("min", jnp.uint8, 1, 17, "int")
    slice_op("min", jnp.uint8, 0, 17, "int")
    slice_op("add", jnp.uint8, 1, 17, "int")
    slice_op("min", jnp.bfloat16, 1, 17, "f")
    slice_op("min", jnp.bfloat16, 0, 17, "f")
    slice_op("min", jnp.int16, 1, 17, "int")
    slice_op("min", jnp.int16, 0, 17, "int")
    slice_op("add", jnp.int16, 0, 17, "int")
    slice_op("min", jnp.float32, 1, 17, "f")

    # ---- bf16 full morphology mini-chain (roll+min+max mix) ----
    def bf16_chain(x_ref, o_ref):
        x = x_ref[:]
        for _ in range(K // 4):
            e = jnp.minimum(x, pltpu.roll(x, 3, 1))
            e = jnp.minimum(e, pltpu.roll(e, 6, 1))
            d = jnp.maximum(e, pltpu.roll(e, 3, 0))
            x = x - jnp.maximum(d, pltpu.roll(d, 6, 0))
        o_ref[:] = x
    run("bf16_morph_chain8", jnp.bfloat16, bf16_chain, init="f")


if __name__ == "__main__":
    main()
