"""Multi-stream fleet serving: data-parallel streams sharded over ICI.

The reference is a single stateful object processing one video
(process_video.py:28-44).  Production serving runs many dashcam streams at
once; here each stream carries its own TrackerState and the whole fleet
steps in lockstep chunks:

    states:  pytree with leading (S,) axis, sharded over the 'stream' mesh axis
    frames:  (S, T, Hc, Wc, 3) uint8, sharded on S

Streams are independent, so the jitted fleet step induces zero cross-chip
traffic except the final metrics reduction (a psum over the mesh).  With S
a multiple of the device count, each chip runs S/n_devices streams' chunk
pipelines locally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from lane_tracker_tpu.parallel.mesh import replicate, stream_mesh
from lane_tracker_tpu.parallel.pipeline import chunk_process
from lane_tracker_tpu.tracker.config import TrackerConfig
from lane_tracker_tpu.tracker.step import TrackerParams, make_initial_state
from lane_tracker_tpu.tracker.state import TrackerState


@functools.lru_cache(maxsize=16)
def build_fleet_processor(config: TrackerConfig, with_overlay: bool = False):
    """jit fn: (states(S,...), frames(S,T,...), params) -> (states, outs, metrics).

    metrics is a dict of fleet-aggregated scalars (summed across every
    stream on every chip — under sharding this lowers to an ICI psum).
    """

    def fleet(states, frames, params):
        # hoist_second_attempt: under vmap the scanned second-attempt
        # lax.cond would execute both sides per frame *inside the scan*;
        # hoisting moves that filter into the batched front half instead.
        states, outs = jax.vmap(
            lambda st, fr: chunk_process(
                st, fr, params, config, with_overlay, hoist_second_attempt=True
            )
        )(states, frames)
        metrics = {
            "frames": jnp.asarray(outs.valid.size, jnp.int32),
            "valid_frames": outs.valid.sum().astype(jnp.int32),
            "detected_frames": outs.detected.sum().astype(jnp.int32),
            "second_attempts": (outs.n_attempts > 1).sum().astype(jnp.int32),
        }
        return states, outs, metrics

    return jax.jit(fleet)


class StreamFleet:
    """Convenience driver for S concurrent streams on a device mesh."""

    def __init__(
        self,
        params: TrackerParams,
        config: TrackerConfig,
        n_streams: int,
        mesh=None,
        with_overlay: bool = False,
    ):
        import dataclasses

        if params.filter_backend in ("pallas2", "auto"):
            # The fleet vmaps chunk_process over streams and grid-batched
            # Pallas calls cannot vmap ('auto' resolves to pallas2 on
            # TPU); force the XLA filter here (streams-per-chip is the
            # sharded configuration anyway).
            params = dataclasses.replace(params, filter_backend="xla")
        self.params = params
        self.config = config
        self.n_streams = int(n_streams)
        self.mesh = mesh if mesh is not None else stream_mesh()
        self.with_overlay = with_overlay
        self._fn = build_fleet_processor(config, with_overlay)

        single = make_initial_state(config, params.warped_size)
        states = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (self.n_streams, *x.shape)), single
        )
        self.states = jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, NamedSharding(self.mesh, P("stream", *([None] * (x.ndim - 1))))
            ),
            states,
        )
        self.params_device = replicate(params, self.mesh)

    def frame_sharding(self):
        return NamedSharding(self.mesh, P("stream", None, None, None, None))

    def step(self, frames):
        """frames: (S, T, Hc, Wc, 3) uint8 (host or device)."""
        frames = jax.device_put(np.asarray(frames), self.frame_sharding())
        self.states, outs, metrics = self._fn(
            self.states, frames, self.params_device
        )
        return outs, metrics
