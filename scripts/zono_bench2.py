"""Hardware timing of the zonotope morphology for the 5x5 open inside the
merge kernels (merge_open_pallas2 / thr_merge_open_pallas2), rowrun vs
zono — the follow-up to scripts/zono_bench.py's tophat win.

zono_schedule(5) is 4 chained segment statements + 6 residual reads vs
the row-run scheme's ~9 wider statements, so the expected delta is small
either way; this measures it instead of guessing.  Exactness on hardware
is asserted zono == rowrun for every variant (interpret-mode equality vs
the XLA open is covered by tests/test_filter_stage2.py).

Usage: nohup python scripts/zono_bench2.py > /tmp/zono2.log 2>&1 &
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

T = 128


def main():
    import jax
    import jax.numpy as jnp

    from lane_tracker_tpu.calib.io import load_calibration_npz
    from lane_tracker_tpu.kernels.filter_stage2 import (
        merge_open_pallas2,
        thr_merge_open_pallas2,
    )
    from lane_tracker_tpu.tracker.config import PRESETS
    from lane_tracker_tpu.utils.timing import device_time_per_iter

    cam, warp = load_calibration_npz("assets/calibration.npz")
    W, H = (int(x) for x in warp.warped_width_height)
    config = PRESETS["demo1"]
    kb, Cb = int(config.filter.ksize_b), int(config.filter.C_b)

    rng = np.random.default_rng(11)
    r_th = ((rng.random((T, H, W)) < 0.03) * 255).astype(np.uint8)
    keep = ((rng.random((T, H, W)) < 0.95) * 255).astype(np.uint8)
    b_th = ((rng.random((T, H, W)) < 0.02) * 255).astype(np.uint8)
    b_feat = rng.integers(0, 60, (T, H, W), dtype=np.uint8)
    r_d, k_d, bt_d, bf_d = (jax.device_put(x)
                            for x in (r_th, keep, b_th, b_feat))

    def dep(x):
        return (jnp.max(x) & 1).astype(jnp.uint8)

    def run(name, fn, src):
        outs = {}
        for impl in ("rowrun", "zono"):
            got = jax.block_until_ready(
                jax.jit(lambda s, i=impl: fn(s, i))(src))
            outs[impl] = np.asarray(got)

            def body(c, i=impl):
                return (c[0] ^ dep(fn(c, i)),) + tuple(c[1:])

            per_iter, _ = device_time_per_iter(
                lambda: src, lambda c: body(c), n_iters=8, repeats=3)
            print(json.dumps({
                "stage": f"{name}_{impl}",
                "ms_per_frame": round(per_iter / T * 1e3, 4),
            }), flush=True)
        print(json.dumps({
            "stage": name,
            "zono_equals_rowrun": bool(
                np.array_equal(outs["rowrun"], outs["zono"])),
        }), flush=True)

    run("merge_open",
        lambda s, i: merge_open_pallas2(s[0], s[1], morph_impl=i),
        (r_d, bt_d))
    run("merge_open_keep_pref",
        lambda s, i: merge_open_pallas2(
            s[0], s[1], s[2], emit_prefixes=True, morph_impl=i)[0],
        (r_d, bt_d, k_d))
    run(f"thr{kb}_merge_open_keep_pref",
        lambda s, i: thr_merge_open_pallas2(
            s[0], s[1], kb, Cb, s[2], emit_prefixes=True, morph_impl=i)[0],
        (r_d, bf_d, k_d))


if __name__ == "__main__":
    main()
