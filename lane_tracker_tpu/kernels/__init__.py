from lane_tracker_tpu.kernels.resample import (
    ResampleGrid,
    bilinear_gather,
    bilinear_gather_pair,
)
from lane_tracker_tpu.kernels.resample_mxu2 import MxuWarp2
from lane_tracker_tpu.kernels.filter_stage2 import filter_stage_v2

__all__ = [
    "ResampleGrid",
    "bilinear_gather",
    "bilinear_gather_pair",
    "MxuWarp2",
    "filter_stage_v2",
]
