from lane_tracker_tpu.render.lane import lane_overlay, lane_region_mask
from lane_tracker_tpu.render.text import draw_text

__all__ = ["lane_overlay", "lane_region_mask", "draw_text"]
