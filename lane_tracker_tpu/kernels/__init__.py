from lane_tracker_tpu.kernels.resample import ResampleGrid, bilinear_gather

__all__ = ["ResampleGrid", "bilinear_gather"]
