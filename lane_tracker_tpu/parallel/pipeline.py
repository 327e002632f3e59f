"""Chunked video pipeline: batched front half + scanned back half.

The reference processes frames strictly one at a time through MoviePy
(process_video.py:43), leaving every stage latency-bound.  The tracker's
only *true* sequential dependency is the tiny per-frame state (coefficient
history, counters) feeding the next frame's band search; everything else is
stateless.  So the TPU pipeline splits each chunk of T frames into:

  1. ``vmap(front_half)``   — undistort+warp gathers, LAB, tophat,
                              thresholds for all T frames at once (the bulk
                              of the arithmetic, batched onto the VPU/MXU),
  2. ``lax.scan(back_half)`` — search/fit/validate/state-update per frame
                              (cheap, carries the state),
  3. ``vmap(render_frame)`` — overlay rendering for all T frames at once.

One jit covers all three, so XLA overlaps and fuses across stages.  This is
the single-stream building block; parallel/streams.py shards many of these
across chips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lane_tracker_tpu.tracker.config import TrackerConfig
from lane_tracker_tpu.tracker.step import (
    RenderMeta,
    StepOutput,
    TrackerParams,
    back_half,
    front_artifacts_batch,
    render_frame,
)
from lane_tracker_tpu.tracker.state import TrackerState


def chunk_process(
    state: TrackerState,
    frames: jnp.ndarray,
    params: TrackerParams,
    config: TrackerConfig,
    with_overlay: bool = True,
    hoist_second_attempt: bool = False,
):
    """Process a (T, Hc, Wc, 3) uint8 chunk. Returns (state, outputs).

    outputs is a StepOutput pytree with a leading T axis; ``overlay`` is
    (T, Hc, Wc, 3) when ``with_overlay`` else None.

    ``hoist_second_attempt`` moves the fallback attempt's O(H*W) filter
    into the batched front half (always executed).  Keep it False for
    single-stream serving (the scanned ``lax.cond`` only pays for the
    re-filter on invalid frames); set it True when this chunk pipeline is
    itself vmapped over streams, where the cond would otherwise become an
    executed-both-sides select *in the sequential scan*.
    """
    # Batched front half (the filter runs once on the whole chunk so
    # grid-batched Pallas backends work; identical to per-frame vmap).
    arts = front_artifacts_batch(frames, params, config, hoist_second_attempt)

    def body(st, art):
        st, out, meta = back_half(st, art, params, config)
        return st, (out, meta)

    state, (outs, metas) = jax.lax.scan(body, state, arts)
    if with_overlay:
        overlays = jax.vmap(
            lambda f, m: render_frame(f, m, params, config)
        )(frames, metas)
        outs = outs._replace(overlay=overlays)
    return state, outs


@functools.lru_cache(maxsize=16)
def build_chunk_processor(
    config: TrackerConfig,
    with_overlay: bool = True,
    hoist_second_attempt: bool = False,
):
    """jit-compiled chunk processor for a static config."""

    @jax.jit
    def fn(state, frames, params):
        return chunk_process(
            state, frames, params, config, with_overlay, hoist_second_attempt
        )

    return fn
