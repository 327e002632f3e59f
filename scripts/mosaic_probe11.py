"""Probe 11: tpu.dynamic_gather throughput + dynamic lane slices.

Probe 10 established that take_along_axis lowers iff the gather dim fits
one vreg (128 lanes / 8 sublanes).  A Pallas warp kernel is viable only
if the gather itself is ~VPU-statement cheap and the per-window slicing
of a VMEM-resident source row band is cheap.  Measured here on shapes
matching the real warp (dst 1100x1080, src band in VMEM):

  G1  lane gather, idx < 128: cost per (8,128)-vreg gather statement.
  G2  sublane gather (axis 0), idx < 8.
  G3  the composed 2D gather (axis-1 then axis-0) of the warp design.
  S1  128-aligned dynamic lane slice of a VMEM buffer.
  S2  dynamic sublane slice (pl.ds) of a VMEM buffer.

Each variant runs a kernel that repeats the operation R times over a
(128, 1280) i32 buffer (10 lane windows), so the per-statement cost is
(t(R2) - t(R1)) / (R2 - R1) / windows.

Usage: timeout 900 python scripts/mosaic_probe11.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

H, W = 128, 1280  # 16 sublane groups x 10 lane windows


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from lane_tracker_tpu.utils.timing import device_time_per_iter

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 2**20, (H, W), np.int32))
    li = jnp.asarray(rng.integers(0, 128, (H, W), np.int32))
    si = jnp.asarray(rng.integers(0, 8, (H, W), np.int32))

    def timed(name, make_kernel, reps_pair=(16, 64)):
        times = []
        for reps in reps_pair:
            k = make_kernel(reps)

            def call(s, i, j):
                return pl.pallas_call(
                    k, out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
                )(s, i, j)

            def body(c, i, j):
                s = c
                o = call(s, i, j)
                dep = (jnp.max(o) & 1).astype(jnp.int32)
                return s ^ dep, i, j

            try:
                per, _ = device_time_per_iter(
                    lambda: (src, li, si), lambda c: body(*c),
                    n_iters=200, repeats=3)
                times.append(per)
            except Exception as e:
                print(json.dumps({"probe": name, "reps": reps,
                                  "err": str(e).split("\n")[0][:160]}),
                      flush=True)
                return
        d = (times[1] - times[0]) / (reps_pair[1] - reps_pair[0])
        # statements per rep = 16 sublane groups x 10 windows
        per_vreg_ns = d / (16 * 10) * 1e9
        print(json.dumps({"probe": name,
                          "ns_per_vreg_stmt": round(per_vreg_ns, 2),
                          "t_lo_us": round(times[0] * 1e6, 1),
                          "t_hi_us": round(times[1] * 1e6, 1)}), flush=True)


    def _mk(op):
        def build(reps):
            def k(s_ref, li_ref, si_ref, o_ref):
                prev = jnp.zeros((H, W), jnp.int32)
                for r in range(reps):
                    rows = []
                    for g in range(16):
                        cols = []
                        for w in range(10):
                            sl = slice(g * 8, g * 8 + 8)
                            cw = slice(w * 128, w * 128 + 128)
                            # prev chains reps so none can be DCE'd
                            cols.append(op(s_ref[sl, cw] + prev[sl, cw],
                                           li_ref[sl, cw], si_ref[sl, cw]))
                        rows.append(jnp.concatenate(cols, axis=1))
                    prev = jnp.concatenate(rows, axis=0) & 0x7F
                o_ref[...] = prev
            return k
        return build

    mk_b0 = _mk(lambda s, li, si: s)
    mk_g1 = _mk(lambda s, li, si: jnp.take_along_axis(s, li, axis=1))
    mk_g2 = _mk(lambda s, li, si: jnp.take_along_axis(s, si, axis=0))
    mk_g3 = _mk(lambda s, li, si: jnp.take_along_axis(
        jnp.take_along_axis(s, li, axis=1), si, axis=0))

    timed("B0_plain_add", mk_b0)
    timed("G1_lane_gather", mk_g1)
    timed("G2_sublane_gather", mk_g2)
    timed("G3_2d_gather", mk_g3)


if __name__ == "__main__":
    main()
