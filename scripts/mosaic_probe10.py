"""Probe 10: dynamic gathers inside Mosaic TPU kernels.

The exact warp chain is at the XLA-take floor (3 packed 4-byte gathers
per stage); beating it needs a Pallas kernel that exploits the warp's
2D locality — banded source DMA + in-register lane gathers.  This probe
establishes which gather forms Mosaic can lower at all, then times the
promising ones:

  P1  jnp.take_along_axis(src, idx, axis=1) on (128, 1280) i32 —
      per-sublane-row lane gather (tpu.dynamic_gather).
  P2  same but idx constant per row (broadcasted column map).
  P3  composite 2D gather: out[m,n] = src[ridx[m,n], cidx[m,n]] via
      per-band-row lane gather + select (band of 8/16/32 rows).
  P4  u8 source staged as i32 (the warp's real dtype path).

Usage: nohup python scripts/mosaic_probe10.py > /tmp/probe10.log &
"""

import json
import sys
import traceback

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lane_tracker_tpu.utils.timing import device_time_per_iter

    H, W = 128, 1280
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 256, (H, W), np.int32))
    idx = jnp.asarray(rng.integers(0, W, (H, W), np.int32))

    def report(name, fn, *args, expect=None):
        try:
            out = jax.block_until_ready(jax.jit(fn)(*args))
            ok = True if expect is None else bool(
                np.array_equal(np.asarray(out), expect))
            print(json.dumps({"probe": name, "compiles": True, "exact": ok}),
                  flush=True)
            return True
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(json.dumps({"probe": name, "compiles": False, "err": msg}),
                  flush=True)
            return False

    # ---- P1: take_along_axis on lanes ----
    def k1(s_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(s_ref[...], i_ref[...], axis=1)

    def p1(s, i):
        return pl.pallas_call(
            k1,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        )(s, i)

    exp1 = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
    ok1 = report("P1_take_along_lanes", p1, src, idx, expect=exp1)

    # ---- P2: row-constant column map (idx same for all rows) ----
    colmap = jnp.asarray(rng.integers(0, W, (1, W), np.int32))
    cm_full = jnp.broadcast_to(colmap, (H, W))

    def p2(s, i):
        return pl.pallas_call(
            k1,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        )(s, i)

    exp2 = np.take_along_axis(np.asarray(src), np.asarray(cm_full), axis=1)
    report("P2_rowconst_colmap", p2, src, cm_full, expect=exp2)

    # ---- P3: composite 2D gather over a band ----
    if ok1:
        for band in (8, 16, 32):
            ridx = jnp.asarray(rng.integers(0, band, (H, W), np.int32))

            def k3(s_ref, r_ref, c_ref, o_ref, band=band):
                cols = jnp.take_along_axis(
                    s_ref[0:1, :], c_ref[...], axis=1)  # warm shape
                acc = jnp.zeros((H, W), jnp.int32)
                r = r_ref[...]
                c = c_ref[...]
                for b in range(band):
                    g = jnp.take_along_axis(
                        jnp.broadcast_to(s_ref[b:b + 1, :], (H, W)), c,
                        axis=1)
                    acc = jnp.where(r == b, g, acc)
                o_ref[...] = acc + cols * 0

            def p3(s, r, c, band=band, k=k3):
                return pl.pallas_call(
                    k,
                    out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
                )(s, r, c)

            sn, rn, cn = np.asarray(src), np.asarray(ridx), np.asarray(idx)
            exp3 = sn[rn, cn]
            if not report(f"P3_band{band}_2dgather", p3, src, ridx, idx,
                          expect=exp3):
                break

    # ---- timing: P1 and P3 vs XLA take ----
    def dep(x):
        return (jnp.max(x) & 1).astype(jnp.int32)

    if ok1:
        def body1(c, i):
            return c ^ dep(p1(c + 0, i)), i

        per, _ = device_time_per_iter(
            lambda: (src, idx), lambda c: body1(*c), n_iters=50, repeats=3)
        print(json.dumps({"probe": "P1_time_us_per_call",
                          "us": round(per * 1e6, 2)}), flush=True)

    def xla_take(s, i):
        return jnp.take(s.reshape(-1), i.reshape(-1), axis=0).reshape(H, W)

    def bodyx(c, i):
        return c ^ dep(xla_take(c + 0, i)), i

    per, _ = device_time_per_iter(
        lambda: (src, idx), lambda c: bodyx(*c), n_iters=50, repeats=3)
    print(json.dumps({"probe": "XLA_take_time_us_per_call",
                      "us": round(per * 1e6, 2)}), flush=True)


if __name__ == "__main__":
    main()
