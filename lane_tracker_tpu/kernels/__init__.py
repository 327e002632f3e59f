from lane_tracker_tpu.kernels.resample import (
    ResampleGrid,
    bilinear_gather,
    bilinear_gather_pair,
)
from lane_tracker_tpu.kernels.resample_mxu import MxuWarp
from lane_tracker_tpu.kernels.filter_stage import filter_stage_pallas

__all__ = [
    "ResampleGrid",
    "bilinear_gather",
    "bilinear_gather_pair",
    "MxuWarp",
    "filter_stage_pallas",
]
