import os

# Force the CPU backend with 8 virtual devices so sharding/mesh tests run
# fast and without TPU hardware. XLA_FLAGS must be set before the CPU
# backend initializes; the platform choice must be applied via jax.config
# because environment plugins (e.g. axon) override jax_platforms at
# interpreter startup.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")
ASSETS_DIR = pathlib.Path(__file__).resolve().parent.parent / "assets"


def _load_image(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def calib():
    """(CameraParams, WarpParams) from the repo's native npz artifact."""
    from lane_tracker_tpu.calib.io import load_calibration_npz

    return load_calibration_npz(ASSETS_DIR / "calibration.npz")


@pytest.fixture(scope="session")
def test_frame():
    """A real 1280x720 dashcam frame (RGB uint8)."""
    return _load_image(ASSETS_DIR / "test4.jpg")


@pytest.fixture(scope="session")
def frame_pair():
    """The consecutive-frame pair used for warm-start integration tests."""
    return (
        _load_image(ASSETS_DIR / "frame911.jpg"),
        _load_image(ASSETS_DIR / "frame971.jpg"),
    )


def has_cv2():
    try:
        import cv2  # noqa: F401

        return True
    except ImportError:
        return False


requires_cv2 = pytest.mark.skipif(not has_cv2(), reason="cv2 not installed")
