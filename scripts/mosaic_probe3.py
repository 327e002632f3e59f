"""Mosaic probe, round 3: ping-pong margin-scratch slice passes.

Rounds 1-2 established: i32/f32 roll+min/add compile (~0.5-2.2 us/pass);
i16/u8 minimum fails consistently (real gap); bf16 lane-slice min compiled
once but timed 0.0 (suspect); many other failures look flaky (HTTP 500).

This round times the actual construct the filter megakernel will use: two
margin-ed VMEM scratches, each pass writing op(sliceA, sliceB) of one
scratch into the other's interior — ONE fused VPU pass per pyramid level,
no roll, no mask.  Also re-checks bf16 correctness and the failed variants
once more for flake-vs-real classification.

Usage: nohup python scripts/mosaic_probe3.py > /tmp/mosaic_probe3.log &
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

H, W = 1104, 1280
MY, MX = 64, 128  # sublane / lane margins each side
PH, PW = H + 2 * MY, W + 2 * MX
K = 64


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lane_tracker_tpu.utils.timing import device_time_per_iter

    def pingpong(name, dtype, op_name, axis, shift, n_iters=16, check=None):
        """K passes: b.interior = op(a[sl0], a[sl_shift]); swap(a, b)."""
        op = {"add": (lambda p, q: p + q), "min": jnp.minimum,
              "max": jnp.maximum}[op_name]

        def kernel(x_ref, o_ref, sa, sb):
            fill = jnp.asarray(255 if op_name == "min" else 0, dtype)
            sa[:, :] = jnp.full(sa.shape, fill, dtype)
            sb[:, :] = jnp.full(sb.shape, fill, dtype)
            sa[MY:MY + H, MX:MX + W] = x_ref[:]
            bufs = [sa, sb]
            for it in range(K):
                src, dst = bufs[it % 2], bufs[(it + 1) % 2]
                if axis == 0:
                    shifted = src[MY + shift:MY + shift + H, MX:MX + W]
                else:
                    shifted = src[MY:MY + H, MX + shift:MX + shift + W]
                dst[MY:MY + H, MX:MX + W] = op(
                    src[MY:MY + H, MX:MX + W], shifted)
            o_ref[:] = bufs[K % 2][MY:MY + H, MX:MX + W]

        try:
            call = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((H, W), dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((PH, PW), dtype),
                                pltpu.VMEM((PH, PW), dtype)],
            )
            vals = np.random.default_rng(0).integers(0, 100, (H, W))
            npdt = np.dtype(dtype) if dtype != jnp.bfloat16 else np.float32
            x0 = jnp.asarray(vals.astype(npdt)).astype(dtype)
            if check is not None:
                got = np.asarray(jax.jit(call)(x0)).astype(np.float64)
                want = check(vals.astype(np.float64))
                ok = bool(np.array_equal(got, want))
            else:
                ok = None
            per_iter, _ = device_time_per_iter(
                lambda: x0, lambda c: call(c), n_iters=n_iters, repeats=3)
            print(json.dumps({"variant": name, "ok": ok,
                              "us_per_pass": round(per_iter / K * 1e6, 3)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:150]
            print(json.dumps({"variant": name, "error": msg}), flush=True)

    def ref_chain(vals, op, axis, shift, k=K):
        """NumPy oracle for the ping-pong chain with margin fill."""
        fill = 255.0 if op is np.minimum else 0.0
        a = np.full((PH, PW), fill)
        a[MY:MY + H, MX:MX + W] = vals
        for _ in range(k):
            if axis == 0:
                sh = a[MY + shift:MY + shift + H, MX:MX + W]
            else:
                sh = a[MY:MY + H, MX + shift:MX + shift + W]
            cur = op(a[MY:MY + H, MX:MX + W], sh)
            a = np.full((PH, PW), fill)
            a[MY:MY + H, MX:MX + W] = cur
        return a[MY:MY + H, MX:MX + W]

    # The workhorse: i32 / f32 lane + sublane slice min (with correctness).
    pingpong("i32_pp_lane_min_s17", jnp.int32, "min", 1, 17,
             check=lambda v: ref_chain(v, np.minimum, 1, 17))
    pingpong("i32_pp_sub_min_s17", jnp.int32, "min", 0, 17)
    pingpong("i32_pp_lane_add_s17", jnp.int32, "add", 1, 17)
    pingpong("i32_pp_sub_add_s17", jnp.int32, "add", 0, 17)
    pingpong("i32_pp_lane_min_s1", jnp.int32, "min", 1, 1)
    pingpong("f32_pp_lane_min_s17", jnp.float32, "min", 1, 17)
    pingpong("f32_pp_sub_min_s17", jnp.float32, "min", 0, 17)

    # bf16: correctness + honest timing (min/max exact on 0..255).
    pingpong("bf16_pp_lane_min_s17", jnp.bfloat16, "min", 1, 17,
             check=lambda v: ref_chain(v, np.minimum, 1, 17))
    pingpong("bf16_pp_sub_min_s17", jnp.bfloat16, "min", 0, 17,
             check=lambda v: ref_chain(v, np.minimum, 0, 17))
    pingpong("bf16_pp_lane_max_s3", jnp.bfloat16, "max", 1, 3,
             check=lambda v: ref_chain(v, np.maximum, 1, 3))
    pingpong("bf16_pp_lane_add_s17", jnp.bfloat16, "add", 1, 17)

    # Flake re-checks from round 2.
    def plain(name, dtype, body, init="int"):
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            for _ in range(K):
                x = body(x)
            o_ref[:] = x
        try:
            call = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((H, W), dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            vals = np.random.default_rng(0).integers(0, 100, (H, W))
            x0 = jnp.asarray(vals.astype(
                np.float32 if init == "f" else np.int32)).astype(dtype)
            per_iter, _ = device_time_per_iter(
                lambda: x0, lambda c: call(c), n_iters=16, repeats=3)
            print(json.dumps({"variant": name,
                              "us_per_pass": round(per_iter / K * 1e6, 3)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name,
                              "error": str(e).split("\n")[0][:150]}),
                  flush=True)

    import jax.numpy as jnp  # noqa: F811  (resolve in closure scope)
    plain("retry_i16_min", jnp.int16, lambda x: jnp.minimum(x + 1, x))
    plain("retry_bf16_roll_min", jnp.bfloat16,
          lambda x: jnp.minimum(x, pltpu.roll(x, 17, 1)), init="f")
    plain("retry_i16_cmp_select", jnp.int16,
          lambda x: jnp.where(x > 3, x, x + 3))

    # bf16 compare -> select (needed if thresholds move to bf16 storage).
    plain("bf16_cmp_select", jnp.bfloat16,
          lambda x: jnp.where(x > 3.0, x, x + 1.0), init="f")

    # Mixed morphology candidate: bf16 storage, minimum, full erode-ish mix.
    def bf16_mix(x):
        import jax
        a = jnp.minimum(x, pltpu.roll(x, 3, 0))
        return jnp.maximum(a, x * jnp.bfloat16(0.999))
    plain("bf16_roll_sub_minmax", jnp.bfloat16, bf16_mix, init="f")


if __name__ == "__main__":
    main()
