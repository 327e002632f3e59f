import numpy as np
import pytest

from lane_tracker_tpu.io.video import (
    ImageDirSink,
    ImageDirSource,
    NpzSink,
    NpzSource,
    open_sink,
    open_source,
)


def _frames(n, H=32, W=48, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, H, W, 3), dtype=np.uint8)


def test_npz_roundtrip_and_padding(tmp_path):
    frames = _frames(10)
    sink = NpzSink(tmp_path / "in.npz")
    sink.write(frames)
    sink.close()

    src = NpzSource(tmp_path / "in.npz")
    assert src.size == (48, 32)
    chunks = list(src.chunks(4))
    assert [n for _, n in chunks] == [4, 4, 2]
    # Padded tail keeps static shape.
    assert chunks[-1][0].shape == (4, 32, 48, 3)
    got = np.concatenate([c[:n] for c, n in chunks])
    np.testing.assert_array_equal(got, frames)


def test_image_dir_roundtrip(tmp_path):
    frames = _frames(5)
    sink = ImageDirSink(tmp_path / "imgs")
    sink.write(frames)
    sink.close()
    src = ImageDirSource(tmp_path / "imgs")
    chunks = list(src.chunks(3))
    got = np.concatenate([c[:n] for c, n in chunks])
    np.testing.assert_array_equal(got, frames)  # png is lossless


def test_open_source_sink_dispatch(tmp_path):
    frames = _frames(3)
    s = open_sink(tmp_path / "x.npz", (48, 32))
    s.write(frames)
    s.close()
    src = open_source(tmp_path / "x.npz")
    assert isinstance(src, NpzSource)


def test_cli_end_to_end(tmp_path):
    """The process_video CLI over a tiny synthetic stream."""
    from lane_tracker_tpu.calib.io import save_calibration_npz
    from lane_tracker_tpu.calib.synthetic import make_synthetic_calibration
    from lane_tracker_tpu.process_video import run

    cam, warp = make_synthetic_calibration(img_size=(128, 96), warped_size=(96, 128))
    save_calibration_npz(tmp_path / "calib.npz", cam, warp)
    frames = _frames(6, H=96, W=128, seed=1)
    sink = NpzSink(tmp_path / "in.npz")
    sink.write(frames)
    sink.close()

    rc = run(
        [
            str(tmp_path / "in.npz"),
            str(tmp_path / "out.npz"),
            "--calibration",
            str(tmp_path / "calib.npz"),
            "--preset",
            "committed",
            "--chunk",
            "4",
            "--metrics-json",
            str(tmp_path / "metrics.json"),
        ]
    )
    assert rc == 0
    with np.load(tmp_path / "out.npz") as z:
        out = z["frames"]
    assert out.shape == (6, 96, 128, 3)
    import json

    metrics = json.loads((tmp_path / "metrics.json").read_text())
    assert metrics["frames"] == 6


def test_cli_second_attempt_schedules_identical(tmp_path):
    """--second-attempt plumbs through and every schedule is bit-identical.

    The schedule equivalence itself is pinned at the chunk_process level
    (test_parallel.py); this pins the CLI wiring: the flag reaches
    build_chunk_processor and output frames/metrics do not depend on it.
    """
    import json

    from lane_tracker_tpu.calib.io import save_calibration_npz
    from lane_tracker_tpu.calib.synthetic import make_synthetic_calibration
    from lane_tracker_tpu.process_video import run

    cam, warp = make_synthetic_calibration(img_size=(128, 96), warped_size=(96, 128))
    save_calibration_npz(tmp_path / "calib.npz", cam, warp)
    frames = _frames(4, H=96, W=128, seed=3)
    frames[2] = 0  # one dead frame so the second attempt actually fires
    sink = NpzSink(tmp_path / "in.npz")
    sink.write(frames)
    sink.close()

    outs, mets = {}, {}
    for sched in ("two_phase", "cond", "hoist"):
        rc = run(
            [
                str(tmp_path / "in.npz"),
                str(tmp_path / f"out_{sched}.npz"),
                "--calibration", str(tmp_path / "calib.npz"),
                "--preset", "committed",
                "--chunk", "4",
                "--second-attempt", sched,
                "--metrics-json", str(tmp_path / f"m_{sched}.json"),
            ]
        )
        assert rc == 0
        with np.load(tmp_path / f"out_{sched}.npz") as z:
            outs[sched] = z["frames"]
        mets[sched] = json.loads((tmp_path / f"m_{sched}.json").read_text())
    # Compare only the deterministic metrics — 'fps' is wall-clock and
    # only happened to agree while every run fit one (meter-excluded)
    # chunk (round-4 advisor).
    det = lambda m: {k: v for k, v in m.items() if k != "fps"}
    for sched in ("cond", "hoist"):
        np.testing.assert_array_equal(outs["two_phase"], outs[sched])
        assert det(mets["two_phase"]) == det(mets[sched])


def test_cli_rejects_mismatched_calibration(tmp_path):
    from lane_tracker_tpu.calib.io import save_calibration_npz
    from lane_tracker_tpu.calib.synthetic import make_synthetic_calibration
    from lane_tracker_tpu.process_video import run

    cam, warp = make_synthetic_calibration(img_size=(64, 48), warped_size=(48, 64))
    save_calibration_npz(tmp_path / "calib.npz", cam, warp)
    sink = NpzSink(tmp_path / "in.npz")
    sink.write(_frames(2, H=96, W=128))
    sink.close()
    with pytest.raises(ValueError, match="calibration expects"):
        run(
            [
                str(tmp_path / "in.npz"),
                str(tmp_path / "out.npz"),
                "--calibration",
                str(tmp_path / "calib.npz"),
            ]
        )


def test_native_rgb24_roundtrip(tmp_path):
    from lane_tracker_tpu.io.native_loader import (
        RawRGB24Sink,
        RawRGB24Source,
        build_native,
        write_rgb24,
    )

    frames = _frames(11, H=40, W=56, seed=2)
    write_rgb24(tmp_path / "s.rgb24", frames, fps=30.0)

    src = RawRGB24Source(tmp_path / "s.rgb24")
    assert src.size == (56, 40) and src.fps == 30.0
    chunks = list(src.chunks(4))
    assert [n for _, n in chunks] == [4, 4, 3]
    assert all(c.shape == (4, 40, 56, 3) for c, _ in chunks)
    got = np.concatenate([c[:n] for c, n in chunks])
    np.testing.assert_array_equal(got, frames)
    # Tail padding repeats the last frame (static chunk shape).
    np.testing.assert_array_equal(chunks[-1][0][3], frames[-1])

    # Sink side + open_source/open_sink dispatch.
    from lane_tracker_tpu.io.video import open_sink, open_source

    sink = open_sink(tmp_path / "o.rgb24", (56, 40), fps=30.0)
    sink.write(frames[:5])
    sink.close()
    src2 = open_source(tmp_path / "o.rgb24")
    got2 = np.concatenate([c[:n] for c, n in src2.chunks(8)])
    np.testing.assert_array_equal(got2, frames[:5])


def test_native_rgb24_fallback_matches_native(tmp_path):
    from lane_tracker_tpu.io.native_loader import RawRGB24Source, write_rgb24

    frames = _frames(7, H=24, W=32, seed=3)
    write_rgb24(tmp_path / "s.rgb24", frames)
    native = RawRGB24Source(tmp_path / "s.rgb24", prefer_native=True)
    fallback = RawRGB24Source(tmp_path / "s.rgb24", prefer_native=False)
    for (a, na), (b, nb) in zip(native.chunks(3), fallback.chunks(3)):
        assert na == nb
        np.testing.assert_array_equal(a, b)


def test_cli_per_frame_log(tmp_path):
    from lane_tracker_tpu.calib.io import save_calibration_npz
    from lane_tracker_tpu.calib.synthetic import make_synthetic_calibration
    from lane_tracker_tpu.process_video import run
    import json

    cam, warp = make_synthetic_calibration(img_size=(128, 96), warped_size=(96, 128))
    save_calibration_npz(tmp_path / "calib.npz", cam, warp)
    sink = NpzSink(tmp_path / "in.npz")
    sink.write(_frames(3, H=96, W=128))
    sink.close()
    run(
        [
            str(tmp_path / "in.npz"), str(tmp_path / "out.npz"),
            "--calibration", str(tmp_path / "calib.npz"),
            "--preset", "committed", "--chunk", "3",
            "--per-frame-log", str(tmp_path / "frames.jsonl"),
        ]
    )
    lines = [json.loads(l) for l in (tmp_path / "frames.jsonl").read_text().splitlines()]
    assert len(lines) == 3
    assert {"frame", "valid", "search_mode", "radius_m"} <= set(lines[0])
