import numpy as np
import pytest


def test_fps_meter():
    from lane_tracker_tpu.utils.profiling import FpsMeter

    m = FpsMeter()
    m.add(10)
    assert m.fps() > 0
    m.reset()
    assert m.frames == 0


def test_debug_mode_restores_config():
    import jax

    from lane_tracker_tpu.utils.debug import debug_mode

    before = jax.config.jax_debug_nans
    with debug_mode():
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_assert_states_equal(calib):
    from lane_tracker_tpu.tracker.config import PRESETS
    from lane_tracker_tpu.tracker.step import make_initial_state
    from lane_tracker_tpu.utils.debug import assert_states_equal

    s1 = make_initial_state(PRESETS["committed"], (1080, 1100))
    s2 = make_initial_state(PRESETS["committed"], (1080, 1100))
    assert_states_equal(s1, s2)
    s3 = s2._replace(counter=s2.counter + 1)
    with pytest.raises(AssertionError):
        assert_states_equal(s1, s3)


def test_device_timer_on_cpu():
    import jax.numpy as jnp

    from lane_tracker_tpu.utils.timing import device_time_per_iter

    def make():
        return (jnp.ones((128, 128), jnp.float32),)

    def body(c):
        (x,) = c
        return (x @ x / jnp.maximum(jnp.max(x), 1.0),)

    t, rtt = device_time_per_iter(make, body, n_iters=10, repeats=2)
    assert t >= 0 and rtt > 0


def test_config_switch_mid_stream(calib):
    """Changing process() kwargs (incl. partial) between frames must not
    break state carry (render buffers are padded to full height)."""
    from PIL import Image

    from tests.conftest import ASSETS_DIR
    from lane_tracker_tpu.tracker.config import PRESETS
    from lane_tracker_tpu.tracker.tracker import LaneTracker

    cam, warp = calib
    lt = LaneTracker(
        warp.image_width_height, warp.warped_width_height,
        cam.cam_matrix, cam.dist_coeffs, (warp.M, warp.Minv),
        (warp.mppv, warp.mpph), validity=PRESETS["demo1"].validity,
    )
    f = np.asarray(Image.open(ASSETS_DIR / "frame911.jpg").convert("RGB"))
    lt.process(f, mask_noise=True, no_success_limit=50, bandwidth=30)
    out = lt.process(f, mask_noise=True, no_success_limit=50, bandwidth=30,
                     partial=0.5)  # demo3-style horizon change
    assert out.shape == f.shape
    assert lt.counter == 2
