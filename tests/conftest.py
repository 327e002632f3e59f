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

import pathlib

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache (round-4 verdict item 8): the suite is
# compile-dominated on the CPU backend (test_parallel's tiny-geometry
# chunk_process variants alone cost ~15 min of XLA time), and the traced
# programs are identical run to run, so repeat suite runs hit the disk
# cache and skip compilation entirely. Keyed by HLO hash — a code change
# that alters the traced program misses the cache and recompiles, so this
# is correctness-neutral. Set LT_JAX_CACHE_DIR=off to disable.
# The cache directory is COMMITTED (round-5 verdict item 7): ~12 MB buys
# fresh checkouts the warm-cache run (~6 min vs ~13 cold on the 1-core
# host). After changing compile-heavy code, run the suite and commit the
# new entries alongside.
_CACHE_DIR = os.environ.get(
    "LT_JAX_CACHE_DIR",
    str(pathlib.Path(__file__).resolve().parent / ".jax_cache"),
)
if _CACHE_DIR != "off":
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

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
