from lane_tracker_tpu.utils.profiling import FpsMeter, maybe_profile, trace_annotation

__all__ = ["FpsMeter", "maybe_profile", "trace_annotation"]
