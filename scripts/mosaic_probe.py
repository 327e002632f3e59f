"""Empirical probe of Mosaic/TPU per-pass costs for the filter megakernel.

Measures, inside a Pallas kernel on the real TPU, the per-pass cost of the
primitive the filter stage is made of — a shifted elementwise combine — in
different dtypes and shift implementations.  Each variant runs K chained
passes over an (1104, 1280) VMEM-resident block; per-pass time decides the
megakernel's arithmetic strategy (i32 vs i16 vs u8; roll vs slice).

Usage: nohup python scripts/mosaic_probe.py > /tmp/mosaic_probe.log &
"""

import functools
import json
import sys

import numpy as np

sys.path.insert(0, ".")

H, W = 1104, 1280
K = 64  # chained passes per kernel invocation


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lane_tracker_tpu.utils.timing import device_time_per_iter

    def run_variant(name, dtype, build_kernel, extra_scratch=None):
        try:
            kernel = build_kernel(jnp)

            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((H, W), dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=extra_scratch or [],
            )

            def body(c):
                return out(c)

            x0 = jnp.asarray(
                (np.random.default_rng(0).integers(0, 100, (H, W))).astype(dtype)
            )
            per_iter, _ = device_time_per_iter(
                lambda: x0, body, n_iters=16, repeats=3
            )
            us_per_pass = per_iter / K * 1e6
            print(json.dumps({"variant": name, "us_per_pass": round(us_per_pass, 3),
                              "ms_k_passes": round(per_iter * 1e3, 3)}), flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(json.dumps({"variant": name, "error": msg}), flush=True)

    def roll_add(axis, shift):
        def build(jnp_):
            def kernel(x_ref, o_ref):
                x = x_ref[:]
                for _ in range(K):
                    x = x + pltpu.roll(x, shift, axis)
                o_ref[:] = x
            return kernel
        return build

    def roll_min(axis, shift):
        def build(jnp_):
            def kernel(x_ref, o_ref):
                x = x_ref[:]
                for _ in range(K):
                    x = jnp.minimum(x, pltpu.roll(x, shift, axis))
                o_ref[:] = x
            return kernel
        return build

    def slice_add(axis, shift, dtype):
        # Shift via a re-read of a scratch ref at a static offset. Each pass
        # writes the scratch then reads two overlapping windows.
        def build(jnp_):
            def kernel(x_ref, o_ref, scr):
                scr[:, :] = jnp.zeros(scr.shape, scr.dtype)
                scr[0:H, 0:W] = x_ref[:]
                x = x_ref[:]
                for _ in range(K):
                    if axis == 0:
                        x = x + scr[shift:shift + H, 0:W]
                    else:
                        x = x + scr[0:H, shift:shift + W]
                    scr[0:H, 0:W] = x
                o_ref[:] = x
            return kernel
        return build, [pltpu.VMEM((H + 8, W + 128), dtype)]

    # i32 baselines (round-1 kernel style)
    run_variant("i32_lane_roll_add_s1", jnp.int32, roll_add(1, 1))
    run_variant("i32_lane_roll_add_s17", jnp.int32, roll_add(1, 17))
    run_variant("i32_sublane_roll_add_s1", jnp.int32, roll_add(0, 1))
    run_variant("i32_sublane_roll_add_s17", jnp.int32, roll_add(0, 17))

    # 16-bit
    run_variant("i16_lane_roll_add_s1", jnp.int16, roll_add(1, 1))
    run_variant("i16_lane_roll_add_s17", jnp.int16, roll_add(1, 17))
    run_variant("i16_sublane_roll_add_s17", jnp.int16, roll_add(0, 17))
    run_variant("i16_lane_roll_min_s17", jnp.int16, roll_min(1, 17))

    # 8-bit morphology
    run_variant("u8_lane_roll_min_s17", jnp.uint8, roll_min(1, 17))
    run_variant("i8_lane_roll_min_s17", jnp.int8, roll_min(1, 17))
    run_variant("u8_sublane_roll_min_s17", jnp.uint8, roll_min(0, 17))

    # pure elementwise (no shift) for reference
    def add_only(jnp_):
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            for _ in range(K):
                x = x + x
            o_ref[:] = x
        return kernel
    run_variant("i32_add_only", jnp.int32, add_only)
    run_variant("i16_add_only", jnp.int16, add_only)

    def min_only(jnp_):
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            for _ in range(K):
                x = jnp.minimum(x + 1, x)
            o_ref[:] = x
        return kernel
    run_variant("u8_minadd_only", jnp.uint8, min_only)
    run_variant("i16_minadd_only", jnp.int16, min_only)

    # slice-based shifts
    b, scr = slice_add(1, 17, jnp.int16)
    run_variant("i16_lane_slice_add_s17", jnp.int16, b, scr)
    b, scr = slice_add(0, 17, jnp.int16)
    run_variant("i16_sublane_slice_add_s17", jnp.int16, b, scr)
    b, scr = slice_add(1, 17, jnp.int32)
    run_variant("i32_lane_slice_add_s17", jnp.int32, b, scr)

    # packed-pair trick: i16 horizontal shift via i32 roll + halfword fixup
    def packed_shift_add(jnp_):
        def kernel(x_ref, o_ref):
            x = x_ref[:]  # i32, each lane = two packed u16
            for _ in range(K):
                r8 = pltpu.roll(x, 8, 1)   # shift by 16 u16 elements
                r9 = pltpu.roll(x, 9, 1)
                odd = (x >> 16) | (r9 << 16)  # shift by 17 u16 elements
                x = x + odd + r8
            o_ref[:] = x
        return kernel
    run_variant("i32_packed_u16_shift_add_s17", jnp.int32, packed_shift_add)


if __name__ == "__main__":
    main()
