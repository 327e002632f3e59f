"""Parity tests for the v2 Pallas stage kernels (interpret mode on CPU).

Each kernel is checked bit-exact against the XLA ops it replaces
(ops/morphology.py, ops/threshold.py, ops/filters.py), which are
themselves pinned against OpenCV; hardware runs are validated separately
by scripts/filter2_bench.py.
"""

import numpy as np
import pytest
from PIL import Image

from tests.conftest import ASSETS_DIR

from lane_tracker_tpu.kernels.filter_stage2 import (
    bilateral_threshold_pallas2,
    extent_groups,
    filter_stage_v2,
    tophat_pallas2,
)
from lane_tracker_tpu.ops.filters import filter_lane_points_channels
from lane_tracker_tpu.ops.morphology import ellipse_runs, tophat_ellipse
from lane_tracker_tpu.ops.threshold import bilateral_adaptive_threshold, in_range


@pytest.fixture(scope="module")
def channels():
    from lane_tracker_tpu.calib.io import load_calibration_npz
    from lane_tracker_tpu.calib.undistort import fused_undistort_warp_grid
    from lane_tracker_tpu.kernels.resample import ResampleGrid, bilinear_gather
    from lane_tracker_tpu.ops.color import rgb2lab_b_u8

    cam, warp = load_calibration_npz("assets/calibration.npz")
    img = np.asarray(Image.open(ASSETS_DIR / "test4.jpg").convert("RGB"))
    grid = ResampleGrid.from_quantized(
        fused_undistort_warp_grid(
            cam.cam_matrix, cam.dist_coeffs, warp.M,
            warp.image_width_height, warp.warped_width_height,
        )
    )
    r = np.asarray(bilinear_gather(img[..., 0], grid))
    b = np.asarray(bilinear_gather(np.asarray(rgb2lab_b_u8(img)), grid))
    return r, b


def test_extent_groups_cover_ellipse():
    """The extent grouping reproduces the SE row set exactly."""
    for ksize in (5, 29, 55):
        runs = dict(ellipse_runs(ksize))
        covered = {}
        for (lo, hi), segs in extent_groups(ksize):
            for slo, shi in segs:
                for dy in range(slo, shi + 1):
                    assert dy not in covered
                    covered[dy] = (lo, hi)
        assert covered == runs


@pytest.mark.parametrize("ksize", [5, 29, 55])
def test_tophat_kernel_bit_exact(channels, ksize):
    r, b = channels
    img = b if ksize == 55 else r
    want = np.asarray(tophat_ellipse(img, ksize))
    got = np.asarray(tophat_pallas2(img, ksize, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_tophat_kernel_small_geometry():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (200, 300), np.uint8)
    want = np.asarray(tophat_ellipse(img, 29))
    got = np.asarray(tophat_pallas2(img, 29, block=64, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ksize,C", [(25, 8), (35, 5), (65, 10)])
def test_threshold_kernel_bit_exact(channels, ksize, C):
    r, b = channels
    feat = np.asarray(tophat_ellipse(b if ksize >= 35 else r, 29))
    want = np.asarray(bilateral_adaptive_threshold(feat, ksize=ksize, C=C))
    got = np.asarray(
        bilateral_threshold_pallas2(feat, ksize, C, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_threshold_kernel_noise_keep(channels):
    _, b = channels
    want_bil = np.asarray(bilateral_adaptive_threshold(b, ksize=65, C=10))
    want_noise = np.asarray(in_range(b, 135, 255))
    want = np.where((want_noise == 0) | (want_bil > 0), 255, 0).astype(np.uint8)
    got = np.asarray(bilateral_threshold_pallas2(
        b, 65, 10, noise_thresh=135, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mask_noise", [False, True])
def test_filter_stage_v2_bit_exact(channels, mask_noise):
    r, b = channels
    want = np.asarray(filter_lane_points_channels(
        r, b, filter_type="bilateral", ksize_r=25, C_r=8, ksize_b=35, C_b=5,
        mask_noise=mask_noise, ksize_noise=65, C_noise=10, noise_thresh=135,
        backend="xla"))
    got = np.asarray(filter_stage_v2(
        r, b, ksize_r=25, C_r=8, ksize_b=35, C_b=5, mask_noise=mask_noise,
        ksize_noise=65, C_noise=10, noise_thresh=135, interpret=True))
    np.testing.assert_array_equal(got, want)
    # Sanity: a plausible lane-candidate fraction on a real frame (the
    # SURVEY §4 golden counts apply to the compat cv2 warp chain and are
    # pinned in test_corpus.py; this fixture warps with the fused grid).
    frac = float((got > 0).mean())
    assert 0.02 < frac < 0.12, frac


def test_batched_matches_per_frame(channels):
    """Native (T, H, W) grid batching equals per-frame calls."""
    import jax.numpy as jnp

    r, b = channels
    batch = np.stack([r[:200], b[:200, :r.shape[1]], r[100:300]])
    got = np.asarray(tophat_pallas2(batch, 29, block=64, interpret=True))
    for t in range(3):
        want = np.asarray(tophat_pallas2(batch[t], 29, block=64, interpret=True))
        np.testing.assert_array_equal(got[t], want)
    got = np.asarray(bilateral_threshold_pallas2(batch, 25, 8, interpret=True))
    for t in range(3):
        want = np.asarray(
            bilateral_threshold_pallas2(batch[t], 25, 8, interpret=True))
        np.testing.assert_array_equal(got[t], want)


def test_merge_open_kernel_bit_exact(channels):
    from lane_tracker_tpu.kernels.filter_stage2 import merge_open_pallas2
    from lane_tracker_tpu.ops.morphology import open_ellipse

    r, b = channels
    r_th = np.asarray(bilateral_adaptive_threshold(
        np.asarray(tophat_ellipse(r, 29)), ksize=25, C=8))
    b_th = np.asarray(bilateral_adaptive_threshold(
        np.asarray(tophat_ellipse(b, 55)), ksize=35, C=5))
    keep = np.asarray(bilateral_threshold_pallas2(
        b, 65, 10, noise_thresh=135, interpret=True))

    merged = np.where((r_th > 0) | (b_th > 0), 255, 0).astype(np.uint8)
    want = np.asarray(open_ellipse(merged, 5))
    got = np.asarray(merge_open_pallas2(r_th, b_th, interpret=True))
    np.testing.assert_array_equal(got, want)

    merged2 = np.where(((r_th > 0) | (b_th > 0)) & (keep > 0), 255, 0).astype(np.uint8)
    want2 = np.asarray(open_ellipse(merged2, 5))
    got2 = np.asarray(merge_open_pallas2(r_th, b_th, keep, interpret=True))
    np.testing.assert_array_equal(got2, want2)

    # morph_impl='zono' is a measured dead end at k=5 (scripts/
    # zono_bench2.py: the 4-statement chain's serial latency loses to the
    # row-run tree) but stays available and must stay exact.
    got3 = np.asarray(merge_open_pallas2(r_th, b_th, keep, interpret=True,
                                         morph_impl="zono"))
    np.testing.assert_array_equal(got3, want2)


def test_adaptive_mean_kernel_bit_exact(channels):
    from lane_tracker_tpu.kernels.filter_stage2 import (
        adaptive_mean_pallas2,
        neighborhood_stage_v2,
    )
    from lane_tracker_tpu.ops.filters import filter_lane_points_channels
    from lane_tracker_tpu.ops.threshold import adaptive_mean_threshold

    r, b = channels
    for img, k, C in ((r, 15, -5), (b, 35, -5), (r, 35, 8)):
        want = np.asarray(adaptive_mean_threshold(img, k, C))
        got = np.asarray(adaptive_mean_pallas2(img, k, C, interpret=True))
        np.testing.assert_array_equal(got, want, err_msg=f"k={k} C={C}")

    # Full 'neighborhood' stage (the hardcoded second attempt).
    want = np.asarray(filter_lane_points_channels(
        r, b, filter_type="neighborhood", ksize_r=15, C_r=5, ksize_b=35,
        C_b=5, backend="xla"))
    got = np.asarray(neighborhood_stage_v2(
        r, b, ksize_r=15, C_r=5, ksize_b=35, C_b=5, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_merge_open_emitted_prefixes_bit_exact(channels):
    """emit_prefixes: the packed row prefixes computed by the in-kernel
    MXU dots must equal ops.integrals.build_row_prefixes of the binary."""
    from lane_tracker_tpu.kernels.filter_stage2 import (
        filter_stage_v2,
        merge_open_pallas2,
    )
    from lane_tracker_tpu.ops.integrals import build_row_prefixes
    from lane_tracker_tpu.ops.threshold import bilateral_adaptive_threshold

    r, b = channels
    r_th = np.asarray(bilateral_adaptive_threshold(r, ksize=25, C=8))
    b_th = np.asarray(bilateral_adaptive_threshold(b, ksize=35, C=5))
    binary, pref = merge_open_pallas2(r_th, b_th, emit_prefixes=True,
                                      interpret=True)
    want = np.asarray(build_row_prefixes(binary).packed)
    np.testing.assert_array_equal(np.asarray(pref.packed), want)

    # And through the full stage entry point on a (T, H, W) batch.
    batch_r = np.stack([r, r])
    batch_b = np.stack([b, b])
    bin2, pref2 = filter_stage_v2(batch_r, batch_b, mask_noise=True,
                                  emit_prefixes=True, interpret=True)
    want2 = np.asarray(build_row_prefixes(bin2[0]).packed)
    np.testing.assert_array_equal(np.asarray(pref2.packed[0]), want2)
    np.testing.assert_array_equal(np.asarray(pref2.packed[1]), want2)


def test_zono_schedule_structure():
    """The Minkowski decomposition must be tiny and verified-exact at
    build time for the production SE sizes (zono_schedule raises on any
    coverage failure; see scripts/se_decomp_search.py)."""
    from lane_tracker_tpu.kernels.filter_stage2 import zono_schedule

    for k, max_steps in ((29, 20), (55, 30)):
        steps, runs, r = zono_schedule(k)
        assert r == k // 2
        assert len(steps) <= max_steps, (k, len(steps))
        # All residual runs sit inside the SE's reach.
        for dy, lo, hi in runs:
            assert abs(dy) <= r and -r <= lo <= hi <= r


def test_tophat_zono_bit_exact(channels):
    """The zonotope morphology (morph_impl='zono', the round-4 default)
    must equal the XLA ops exactly — same contract as the row-run
    scheme it replaced on the hot path."""
    r, b = channels
    from lane_tracker_tpu.ops.morphology import tophat_ellipse

    for img, k in ((r, 29), (b, 55)):
        want = np.asarray(tophat_ellipse(img, k))
        for impl in ("rowrun", "zono"):
            got = np.asarray(
                tophat_pallas2(img, k, interpret=True, morph_impl=impl))
            np.testing.assert_array_equal(got, want, err_msg=f"{k}/{impl}")

    # Batched (T, H, W) form, multi-block grid.
    batch = np.stack([b, b[::-1]])
    want2 = np.stack([np.asarray(tophat_ellipse(x, 55)) for x in batch])
    got2 = np.asarray(tophat_pallas2(batch, 55, interpret=True,
                                     morph_impl="zono"))
    np.testing.assert_array_equal(got2, want2)


def test_tophat_riders_bit_exact(channels):
    """tophat_riders_pallas2 must equal the standalone kernels: the
    tophat of its primary input plus one bilateral threshold per rider
    (each reading an independent already-materialized image)."""
    from lane_tracker_tpu.kernels.filter_stage2 import tophat_riders_pallas2

    r, b = channels
    r_feat = np.asarray(tophat_pallas2(r, 29, interpret=True))
    want_th = np.asarray(tophat_pallas2(b, 55, interpret=True))
    want_r25 = np.asarray(
        bilateral_threshold_pallas2(r_feat, 25, 8, interpret=True))
    want_keep = np.asarray(bilateral_threshold_pallas2(
        b, 65, 10, noise_thresh=135, interpret=True))
    got = tophat_riders_pallas2(
        b, 55, [(r_feat, 25, 8, -1), (b, 65, 10, 135)], interpret=True)
    np.testing.assert_array_equal(np.asarray(got[0]), want_th)
    np.testing.assert_array_equal(np.asarray(got[1]), want_r25)
    np.testing.assert_array_equal(np.asarray(got[2]), want_keep)

    # Batched (T, H, W) form with a single rider.
    batch = np.stack([b, b[::-1]])
    rb = np.stack([r_feat, r_feat])
    got2 = tophat_riders_pallas2(batch, 55, [(rb, 25, 8, -1)],
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(got2[0])[0], want_th)
    np.testing.assert_array_equal(np.asarray(got2[1])[0], want_r25)


def test_thr_merge_open_bit_exact(channels):
    """thr_merge_open_pallas2 == bilateral_threshold + merge_open, with
    and without keep mask / emitted prefixes."""
    from lane_tracker_tpu.kernels.filter_stage2 import (
        merge_open_pallas2,
        thr_merge_open_pallas2,
    )

    r, b = channels
    r_th = np.asarray(bilateral_threshold_pallas2(
        np.asarray(tophat_pallas2(r, 29, interpret=True)), 25, 8,
        interpret=True))
    b_feat = np.asarray(tophat_pallas2(b, 55, interpret=True))
    b_th = np.asarray(
        bilateral_threshold_pallas2(b_feat, 35, 5, interpret=True))
    keep = np.asarray(bilateral_threshold_pallas2(
        b, 65, 10, noise_thresh=135, interpret=True))

    want = np.asarray(merge_open_pallas2(r_th, b_th, keep, interpret=True))
    got = np.asarray(thr_merge_open_pallas2(
        r_th, b_feat, 35, 5, keep, interpret=True))
    np.testing.assert_array_equal(got, want)

    want_nk = np.asarray(merge_open_pallas2(r_th, b_th, interpret=True))
    got_nk = np.asarray(
        thr_merge_open_pallas2(r_th, b_feat, 35, 5, interpret=True))
    np.testing.assert_array_equal(got_nk, want_nk)

    want_bin, want_pref = merge_open_pallas2(
        r_th, b_th, keep, emit_prefixes=True, interpret=True)
    got_bin, got_pref = thr_merge_open_pallas2(
        r_th, b_feat, 35, 5, keep, emit_prefixes=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_bin), np.asarray(want_bin))
    np.testing.assert_array_equal(np.asarray(got_pref), np.asarray(want_pref))
