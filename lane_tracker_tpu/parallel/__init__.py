from lane_tracker_tpu.parallel.pipeline import build_chunk_processor
from lane_tracker_tpu.parallel.streams import StreamFleet, build_fleet_processor
from lane_tracker_tpu.parallel.mesh import stream_mesh, shard_streams

__all__ = [
    "build_chunk_processor",
    "StreamFleet",
    "build_fleet_processor",
    "stream_mesh",
    "shard_streams",
]
