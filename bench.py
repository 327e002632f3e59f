"""Headline benchmark: end-to-end process() frames/sec/chip.

Measures the chunked single-stream pipeline (vmapped front half + scanned
tracker + vmapped overlay rendering) on real 1280x720 dashcam frames with
the full demo1 parameter set — the same work the reference's
``LaneTracker.process`` does per frame (undistort, warp, LAB, tophat,
bilateral threshold, noise mask, search, fit, validity, smoothing, radius,
eccentricity, overlay), measured steady-state with frames resident in HBM.

Baseline: the reference measures 153.8 ms/frame (6.5 fps) on CPU
(BASELINE.md); the north-star target is 2,000 fps/chip on TPU v5e.
Prints ONE JSON line.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

REFERENCE_FPS = 6.5  # measured reference steady state (BASELINE.md)
TARGET_FPS = 2000.0  # north-star (BASELINE.json)


def main():
    import jax

    from PIL import Image

    from lane_tracker_tpu.calib.io import load_calibration_npz
    from lane_tracker_tpu.parallel.pipeline import build_chunk_processor
    from lane_tracker_tpu.tracker.config import PRESETS
    from lane_tracker_tpu.tracker.step import TrackerParams, make_initial_state

    cam, warp = load_calibration_npz("assets/calibration.npz")
    params = TrackerParams.build(
        cam.cam_matrix,
        cam.dist_coeffs,
        warp.M,
        warp.Minv,
        warp.image_width_height,
        warp.warped_width_height,
        warp.mppv,
        warp.mpph,
        pipeline=__import__("os").environ.get("BENCH_PIPELINE", "fast"),
    )
    config = PRESETS["demo1"]

    T = int(__import__("os").environ.get("BENCH_T", "256"))  # frames per chunk (throughput mode; latency-sensitive
    # serving would use smaller chunks at some fps cost)
    names = ["frame911.jpg", "frame971.jpg", "test4.jpg", "straight_lines1.jpg"]
    imgs = [np.asarray(Image.open(f"assets/{n}").convert("RGB")) for n in names]
    chunk = np.stack([imgs[i % len(imgs)] for i in range(T)])
    chunk_d = jax.device_put(chunk)

    step = build_chunk_processor(config, with_overlay=True)
    state = make_initial_state(config, params.warped_size)

    # Correctness/sanity pass (also compiles the single-chunk program).
    state, outs = step(state, chunk_d, params)
    _ = np.asarray(outs.valid)

    # Honest device throughput: chain chunks inside ONE jitted program with
    # a data dependency (remote/tunneled backends make per-call host timing
    # meaningless: block_until_ready can return early and scalar fetches
    # pay the full tunnel round-trip). See utils/timing.py.
    from lane_tracker_tpu.utils.timing import device_time_per_iter

    def make_carry():
        return (state, chunk_d)

    def body(carry, p):
        st, ch = carry
        st, outs = step_fn(st, ch, p)
        dep = (jnp.max(outs.overlay) & 1).astype(jnp.uint8)
        return (st, ch ^ dep)

    import jax.numpy as jnp

    from lane_tracker_tpu.parallel.pipeline import chunk_process

    def step_fn(st, ch, p):
        return chunk_process(st, ch, p, config, True)

    per_chunk, _rtt = device_time_per_iter(
        make_carry, body, n_iters=16, invariant=params)
    fps = T / per_chunk

    # Sanity: the tracker must actually be tracking on these frames.
    valid_frac = float(np.asarray(outs.valid).mean())

    dev = jax.devices()[0]
    print(
        json.dumps(
            {
                "metric": "1280x720 frames/sec/chip end-to-end process()",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / REFERENCE_FPS, 1),
                "vs_target_2000fps": round(fps / TARGET_FPS, 3),
                "chunk_size": T,
                "valid_fraction": round(valid_frac, 3),
                "device": str(dev),
            }
        )
    )


if __name__ == "__main__":
    main()
