"""Attribute the composition gap: stage sums vs end-to-end chunk time.

Round-3 stage benches sum to ~0.995 ms/frame (filter 0.551 + warp 0.286 +
LAB 0.076 + sws-pre 0.005 + back scan 0.056 + render 0.021) while bench.py
measures 1.077 — an ~0.08 ms/frame gap that no stage owns.  This times the
REAL chunk program at successive composition depths with the identical
chaining protocol, so consecutive differences attribute the gap:

  warp_lab        vmap(_warp_channels) alone
  front           + filter + prefixes + sws intervals (front_artifacts_batch)
  front_scan      + two-phase back-half scan
  full            + overlay render vmap          (= what bench.py times)
  full_dep_cheap  full, but the inter-chunk data dependency fans a scalar
                  into the next chunk via a 1-element dynamic_update_slice
                  instead of XOR-rewriting the whole 707 MB chunk — bounds
                  how much of the gap is the timing harness's own dep trick.
  front_scan1     front + plain attempt-1-only scan (no chunk-level cond) —
                  front_scan minus this = the two_phase cond's cost.
  scan_mat1       attempt-1-only scan over PRE-materialized artifacts (the
                  backhalf_bench protocol, but at this T) — front_scan1
                  minus front minus this = what composing the scan with the
                  front costs beyond either alone.

Pass variant names as argv to run a subset, e.g.
  nohup python scripts/compose_bench.py warp_lab scan_mat1 > /tmp/compose.log &
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

T = 256


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from lane_tracker_tpu.calib.io import load_calibration_npz
    from lane_tracker_tpu.parallel.pipeline import chunk_process, two_phase_scan
    from lane_tracker_tpu.tracker.config import PRESETS
    from lane_tracker_tpu.tracker.step import (
        TrackerParams,
        front_artifacts_batch,
        make_initial_state,
    )
    from lane_tracker_tpu.tracker.step import _warp_channels
    from lane_tracker_tpu.utils.timing import device_time_per_iter

    cam, warp = load_calibration_npz("assets/calibration.npz")
    params = TrackerParams.build(
        cam.cam_matrix, cam.dist_coeffs, warp.M, warp.Minv,
        warp.image_width_height, warp.warped_width_height,
        warp.mppv, warp.mpph, pipeline="fast",
    )
    config = PRESETS["demo1"]

    names = ["frame911.jpg", "frame971.jpg", "test4.jpg", "straight_lines1.jpg"]
    imgs = [np.asarray(Image.open(f"assets/{n}").convert("RGB")) for n in names]
    chunk = jax.device_put(np.stack([imgs[i % len(imgs)] for i in range(T)]))
    state0 = make_initial_state(config, params.warped_size)

    only = set(sys.argv[1:])

    def timed(name, body, make_carry):
        if only and name not in only:
            return
        try:
            per_iter, _ = device_time_per_iter(
                make_carry, body, n_iters=16, repeats=3, invariant=params)
            print(json.dumps({"variant": name,
                              "ms_per_frame": round(per_iter / T * 1e3, 4),
                              "fps": round(T / per_iter, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                  flush=True)

    def xor_dep(ch, scalar_u8):
        return ch ^ scalar_u8

    # 1. warp + LAB only.
    def body_warp(carry, p):
        ch = carry
        r, b = jax.vmap(lambda f: _warp_channels(f, p))(ch)
        # Depend on BOTH outputs or XLA dead-code-eliminates the LAB-B arm.
        dep = ((jnp.max(r) + jnp.max(b)).astype(jnp.int32) & 1).astype(jnp.uint8)
        return xor_dep(ch, dep)
    timed("warp_lab", body_warp, lambda: chunk)

    # 2. full front half (warp+LAB+filter+prefixes+sws intervals).
    def body_front(carry, p):
        ch = carry
        arts = front_artifacts_batch(ch, p, config)
        dep = (jnp.max(arts.pref.packed) & 1).astype(jnp.uint8)
        return xor_dep(ch, dep)
    timed("front", body_front, lambda: chunk)

    # 3. front + two-phase scan (no render).
    def body_scan(carry, p):
        st, ch = carry
        arts = front_artifacts_batch(ch, p, config)
        st, (outs, metas) = two_phase_scan(st, arts, p, config)
        dep = (jnp.max(metas.fitx_left).astype(jnp.int32) & 1).astype(jnp.uint8)
        return (st, xor_dep(ch, dep))
    timed("front_scan", body_scan, lambda: (state0, chunk))

    # 4. the full pipeline exactly as bench.py times it.
    def body_full(carry, p):
        st, ch = carry
        st, outs = chunk_process(st, ch, p, config, True,
                                 second_attempt="two_phase")
        dep = (jnp.max(outs.overlay) & 1).astype(jnp.uint8)
        return (st, xor_dep(ch, dep))
    timed("full", body_full, lambda: (state0, chunk))

    # 5. full, cheap dep: still forces the overlay (max-reduce) but feeds
    # the dependency into ONE element of the next chunk instead of
    # XOR-rewriting all 707 MB.
    def body_full_cheap(carry, p):
        st, ch = carry
        st, outs = chunk_process(st, ch, p, config, True,
                                 second_attempt="two_phase")
        dep = (jnp.max(outs.overlay) & 1).astype(jnp.uint8)
        patch = (ch[:1, :1, :1, :1] ^ dep)
        ch = jax.lax.dynamic_update_slice(ch, patch, (0, 0, 0, 0))
        return (st, ch)
    timed("full_dep_cheap", body_full_cheap, lambda: (state0, chunk))

    # 6. front + attempt-1-only scan, NO chunk-level cond: front_scan minus
    # this isolates what the two_phase keep/fallback cond itself costs.
    import dataclasses

    from lane_tracker_tpu.parallel.pipeline import scan_back_half

    cfg1 = dataclasses.replace(config, n_tries=1)

    def body_scan1(carry, p):
        st, ch = carry
        arts = front_artifacts_batch(ch, p, config)
        st, (outs, metas) = scan_back_half(st, arts, p, cfg1)
        dep = (jnp.max(metas.fitx_left).astype(jnp.int32) & 1).astype(jnp.uint8)
        return (st, xor_dep(ch, dep))
    timed("front_scan1", body_scan1, lambda: (state0, chunk))

    # 7. the same attempt-1-only scan over PRE-materialized artifacts
    # (the backhalf_bench protocol at this T), outputs forced: isolates
    # the scan alone so (front_scan1 - front - scan_mat1) = composition
    # overhead that belongs to neither stage in isolation.
    arts_mat = None
    if not only or "scan_mat1" in only:
        arts_mat = jax.block_until_ready(jax.jit(
            lambda fr, p: front_artifacts_batch(fr, p, config)
        )(chunk, params))

    def body_mat1(carry, p):
        st, xs = carry
        st, (outs, metas) = scan_back_half(st, xs, p, cfg1)
        dep = (jnp.max(metas.fitx_left).astype(jnp.int32) & 1).astype(jnp.uint8)
        patch = xs.r_chan[:1, :1, :1] ^ dep
        xs = xs._replace(r_chan=jax.lax.dynamic_update_slice(
            xs.r_chan, patch, (0, 0, 0)))
        return (st, xs)
    timed("scan_mat1", body_mat1, lambda: (state0, arts_mat))


if __name__ == "__main__":
    main()
