from lane_tracker_tpu.calib.io import (
    load_camera_calib,
    load_warp_params,
    load_calibration_npz,
    save_calibration_npz,
    CameraParams,
    WarpParams,
)
from lane_tracker_tpu.calib.homography import (
    get_perspective_transform,
    project_points,
    perspective_grid,
)
from lane_tracker_tpu.calib.undistort import undistort_grid

__all__ = [
    "load_camera_calib",
    "load_warp_params",
    "load_calibration_npz",
    "save_calibration_npz",
    "CameraParams",
    "WarpParams",
    "get_perspective_transform",
    "project_points",
    "perspective_grid",
    "undistort_grid",
]
