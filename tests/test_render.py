import numpy as np
import pytest

from lane_tracker_tpu.render.lane import lane_overlay, lane_region_mask
from lane_tracker_tpu.render.split import create_split_view, triple_split_view
from lane_tracker_tpu.render.text import draw_text


def test_lane_region_mask_between_boundaries():
    import jax.numpy as jnp

    H, W = 40, 60
    fitx_l = jnp.full((H,), 10.0)
    fitx_r = jnp.full((H,), 50.0)
    mask = np.asarray(
        lane_region_mask(
            (W, H), fitx_l, fitx_r,
            jnp.int32(H), jnp.int32(H), jnp.int32(0), jnp.int32(0),
        )
    )
    assert mask.shape == (H, W)
    assert (mask[:, 10:51] == 255).all()
    assert (mask[:, :10] == 0).all() and (mask[:, 51:] == 0).all()


def test_lane_region_mask_partial_rows():
    import jax.numpy as jnp

    H, W = 40, 60
    fitx = jnp.arange(H, dtype=jnp.float32)
    # Only the bottom 10 rows have samples (n=10, first=30).
    mask = np.asarray(
        lane_region_mask(
            (W, H), fitx, fitx + 5.0,
            jnp.int32(10), jnp.int32(10), jnp.int32(30), jnp.int32(30),
        )
    )
    assert (mask[: H - 10] == 0).all()
    # Row y >= 30 uses sample index 30 + (y - 30).
    assert mask[35, 35] == 255 and mask[35, 41] == 0


def test_draw_text_blits_pixels():
    img = np.zeros((80, 300, 3), np.uint8)
    draw_text(img, "Curve Radius: 2280 m", (10, 40))
    assert (img > 0).any()
    # Text is white-ish where fully opaque.
    assert img.max() == 255


def test_split_view_layout():
    top = np.full((720, 1280, 3), 10, np.uint8)
    a = np.full((1100, 1080, 3), 20, np.uint8)
    b = np.full((1100, 1080), 30, np.uint8)  # grayscale input allowed
    view = triple_split_view([top, a, b])
    assert view.shape[1] == 1280
    assert (view[:720, :1280] == 10).all()
    assert (view[720:, :640] == 20).all()
    assert (view[720:, 640:1280] == 30).all()


def test_create_split_view_caption():
    canvas = create_split_view(
        (200, 100),
        [np.full((50, 80, 3), 7, np.uint8)],
        [(0, 0)],
        [(80, 50)],
        captions=["hello"],
    )
    assert canvas.shape == (100, 200, 3)
    assert (canvas[:50, :80] >= 7).all()


def test_visualize_search_paths(calib):
    """process(visualize_search=True) returns a plausible viz image for
    both search modes."""
    from PIL import Image

    from tests.conftest import ASSETS_DIR
    from lane_tracker_tpu.tracker.config import PRESETS
    from lane_tracker_tpu.tracker.tracker import LaneTracker

    cam, warp = calib
    lt = LaneTracker(
        warp.image_width_height,
        warp.warped_width_height,
        cam.cam_matrix,
        cam.dist_coeffs,
        (warp.M, warp.Minv),
        (warp.mppv, warp.mpph),
        validity=PRESETS["demo1"].validity,
    )
    frame = np.asarray(Image.open(ASSETS_DIR / "frame911.jpg").convert("RGB"))
    kw = dict(mask_noise=True, no_success_limit=50, bandwidth=30)
    annotated, viz = lt.process(frame, visualize_search=True, **kw)
    assert int(lt.last_output.search_mode) == 0  # sliding window
    assert viz.shape == (1100, 1080, 3)
    assert (viz[..., 0] == 255).any()  # red left-lane pixels
    assert (viz[..., 2] == 255).any()  # blue right-lane pixels

    annotated, viz = lt.process(frame, visualize_search=True, **kw)
    assert int(lt.last_output.search_mode) == 1  # warm start -> band
    assert viz.shape == (1100, 1080, 3)


def test_visualize_search_bare_binary_when_nothing_detected(calib):
    """With no lane pixels anywhere the viz is the bare binary image, not a
    search overlay (lane_tracker.py:1130-1137)."""
    from lane_tracker_tpu.tracker.config import PRESETS
    from lane_tracker_tpu.tracker.tracker import LaneTracker

    cam, warp = calib
    lt = LaneTracker(
        warp.image_width_height,
        warp.warped_width_height,
        cam.cam_matrix,
        cam.dist_coeffs,
        (warp.M, warp.Minv),
        (warp.mppv, warp.mpph),
        validity=PRESETS["demo1"].validity,
    )
    frame = np.zeros((720, 1280, 3), np.uint8)  # black: zero detections
    annotated, viz = lt.process(frame, visualize_search=True)
    assert not bool(lt.last_output.detected)
    assert viz.shape == (1100, 1080, 3)
    # Bare binary: all three channels identical, no green window/band tint.
    assert (viz[..., 0] == viz[..., 1]).all() and (viz[..., 1] == viz[..., 2]).all()
