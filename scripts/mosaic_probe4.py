"""Mosaic probe, round 4: can the tophats go bf16, and do full-height
blocks beat H/3 blocks?

Round-3 context: the threshold kernels moved to pow2 vertical pyramids
(bit-exact, ~2x), leaving the tophats (0.19 + 0.33 ms/frame) as the
filter's dominant cost.  They are sweep-bound in i32; bf16 storage would
halve VMEM traffic IF sublane-offset bf16 min compiles (probe3 saw one
HTTP-500 on it, ambiguous flake).  Bigger blocks cut the per-block halo
redundancy (rows swept / rows produced).

Usage: nohup python scripts/mosaic_probe4.py > /tmp/mosaic_probe4.log &
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

H, W = 1104, 1280
MY, MX = 64, 128
PH, PW = H + 2 * MY, W + 2 * MX
K = 64
T = 32


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lane_tracker_tpu.utils.timing import device_time_per_iter

    def pingpong(name, dtype, op_name, axis, shift, tries=3, check=None):
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

        for attempt in range(tries):
            try:
                call = pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((H, W), dtype),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    scratch_shapes=[pltpu.VMEM((PH, PW), dtype),
                                    pltpu.VMEM((PH, PW), dtype)],
                )
                vals = np.random.default_rng(0).integers(0, 256, (H, W))
                x0 = jnp.asarray(vals.astype(np.float32)).astype(dtype)
                ok = None
                if check is not None:
                    got = np.asarray(jax.jit(call)(x0)).astype(np.float64)
                    ok = bool(np.array_equal(got, check(vals.astype(np.float64))))
                per_iter, _ = device_time_per_iter(
                    lambda: x0, lambda c: call(c), n_iters=16, repeats=3)
                print(json.dumps({
                    "variant": name, "attempt": attempt, "ok": ok,
                    "us_per_pass": round(per_iter / K * 1e6, 3)}), flush=True)
                return
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "variant": name, "attempt": attempt,
                    "error": str(e).split("\n")[0][:140]}), flush=True)

    def ref_chain(vals, op, axis, shift, k=K):
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

    # THE gating question: bf16 sublane-offset min (values 0..255 are
    # exact in bf16, so correctness check is meaningful).
    pingpong("bf16_sub_min_s3", jnp.bfloat16, "min", 0, 3,
             check=lambda v: ref_chain(v, np.minimum, 0, 3))
    pingpong("bf16_sub_min_s17", jnp.bfloat16, "min", 0, 17,
             check=lambda v: ref_chain(v, np.minimum, 0, 17))
    pingpong("bf16_sub_max_s3", jnp.bfloat16, "max", 0, 3,
             check=lambda v: ref_chain(v, np.maximum, 0, 3))
    pingpong("bf16_lane_min_s17", jnp.bfloat16, "min", 1, 17,
             check=lambda v: ref_chain(v, np.minimum, 1, 17))
    # i32 baselines on the same pattern for a fair per-pass ratio.
    pingpong("i32_sub_min_s3", jnp.int32, "min", 0, 3,
             check=lambda v: ref_chain(v, np.minimum, 0, 3))
    pingpong("i32_sub_min_s17", jnp.int32, "min", 0, 17)

    # Full-height vs H/3 tophat blocks (i32 path, existing kernel).
    from lane_tracker_tpu.kernels.filter_stage2 import tophat_pallas2
    from lane_tracker_tpu.ops.morphology import tophat_ellipse

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.integers(0, 256, (T, 1100, 1080), np.uint8))
    want29 = None
    for name, k, block in (
        ("tophat29_b368", 29, None), ("tophat29_full", 29, 1104),
        ("tophat55_b368", 55, None), ("tophat55_full", 55, 1104),
        ("tophat55_half", 55, 552),
    ):
        try:
            fn = jax.jit(lambda x, blk=block, kk=k: tophat_pallas2(
                x, kk, block=blk))
            got = np.asarray(jax.block_until_ready(fn(img)))
            want = np.asarray(jax.jit(jax.vmap(
                lambda x, kk=k: tophat_ellipse(x, kk)))(img[:2]))
            exact = bool(np.array_equal(got[:2], want))
            per_iter, _ = device_time_per_iter(
                lambda: img,
                lambda c, fn=fn: c ^ (jnp.max(fn(c)) & 1).astype(jnp.uint8),
                n_iters=8, repeats=3)
            print(json.dumps({
                "variant": name, "exact": exact,
                "ms_per_frame": round(per_iter / T * 1e3, 4)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name,
                              "error": str(e).split("\n")[0][:140]}),
                  flush=True)


if __name__ == "__main__":
    main()
