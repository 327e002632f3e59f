from lane_tracker_tpu.ops.color import rgb2lab_u8, rgb2lab_b_u8
from lane_tracker_tpu.ops.threshold import (
    bilateral_adaptive_threshold,
    adaptive_mean_threshold,
    in_range,
)
from lane_tracker_tpu.ops.morphology import (
    erode_ellipse,
    dilate_ellipse,
    open_ellipse,
    tophat_ellipse,
    ellipse_runs,
)
from lane_tracker_tpu.ops.filters import filter_lane_points

__all__ = [
    "rgb2lab_u8",
    "rgb2lab_b_u8",
    "bilateral_adaptive_threshold",
    "adaptive_mean_threshold",
    "in_range",
    "erode_ellipse",
    "dilate_ellipse",
    "open_ellipse",
    "tophat_ellipse",
    "ellipse_runs",
    "filter_lane_points",
]
