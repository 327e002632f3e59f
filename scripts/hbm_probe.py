"""HBM pricing probe for the single-chunk program (round-4 verdict item 4).

Compiles the T-frame chunk program AOT on the TPU backend and prints
XLA's memory analysis; optionally executes it on device-resident zeros so
a RESOURCE_EXHAUSTED failure dumps the largest-allocations table with HLO
op names + source attributions (the way the round-4 wall was diagnosed).

Usage: nohup python scripts/hbm_probe.py [T] [--exec] > /tmp/hbm.log &
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main(argv):
    import jax
    import jax.numpy as jnp

    from lane_tracker_tpu.calib.io import load_calibration_npz
    from lane_tracker_tpu.parallel.pipeline import chunk_process
    from lane_tracker_tpu.tracker.config import PRESETS
    from lane_tracker_tpu.tracker.step import TrackerParams, make_initial_state

    T = int(argv[0]) if argv else 768
    do_exec = "--exec" in argv

    cam, warp = load_calibration_npz("assets/calibration.npz")
    params = TrackerParams.build(
        cam.cam_matrix, cam.dist_coeffs, warp.M, warp.Minv,
        warp.image_width_height, warp.warped_width_height,
        warp.mppv, warp.mpph, pipeline="fast",
    )
    config = PRESETS["demo1"]
    state = make_initial_state(config, params.warped_size)

    fn = jax.jit(lambda st, fr, p: chunk_process(
        st, fr, p, config, True, second_attempt="two_phase"))
    fr_spec = jax.ShapeDtypeStruct((T, 720, 1280, 3), jnp.uint8)
    print(f"lowering T={T} ...", flush=True)
    lowered = fn.lower(state, fr_spec, params)
    print("compiling ...", flush=True)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gb = 1 / 2**30
    print(f"T={T}: temp={ma.temp_size_in_bytes * gb:.2f} GB  "
          f"args={ma.argument_size_in_bytes * gb:.2f} GB  "
          f"out={ma.output_size_in_bytes * gb:.2f} GB  "
          f"total={(ma.temp_size_in_bytes + ma.argument_size_in_bytes + ma.output_size_in_bytes) * gb:.2f} GB",
          flush=True)

    if do_exec:
        frames = jnp.zeros((T, 720, 1280, 3), jnp.uint8)
        try:
            st, outs = compiled(state, frames, params)
            print("executed ok; valid:", np.asarray(outs.valid).sum(),
                  flush=True)
        except Exception as e:
            msg = str(e)
            print("EXEC FAILED:", type(e).__name__, flush=True)
            print("\n".join(msg.splitlines()[:120]), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
