"""ctypes bindings for the native C++ frame loader (native/frame_loader.cpp).

Raw RGB24 stream format: ``<name>.rgb24`` holds back-to-back H*W*3 uint8
frames; geometry + fps live in a ``<name>.rgb24.json`` sidecar.  The C++
loader prefetches chunks on a background thread into a buffer ring so disk
I/O overlaps device compute — the native replacement for the reference's
synchronous MoviePy pipe (process_video.py:42-44).

Falls back to a numpy memmap reader when the shared library cannot be
built (no compiler); the chunk iterator contract is identical.
"""

from __future__ import annotations

import ctypes
import json
import pathlib
import subprocess

import numpy as np

from lane_tracker_tpu.io.video import FrameSink, FrameSource, _pad_chunk

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"
_SO = _NATIVE_DIR / "liblt_frameloader.so"


def build_native(force: bool = False) -> bool:
    """Compile the loader if needed. Returns True when the .so is usable."""
    if _SO.exists() and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError):
        return False
    return _SO.exists()


def _load_lib():
    lib = ctypes.CDLL(str(_SO))
    lib.lt_loader_open.restype = ctypes.c_void_p
    lib.lt_loader_open.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.lt_loader_acquire.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.lt_loader_acquire.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
    lib.lt_loader_close.argtypes = [ctypes.c_void_p]
    return lib


def write_rgb24(path, frames: np.ndarray, fps: float = 25.0):
    """Write a (N, H, W, 3) uint8 stack as a raw .rgb24 stream + sidecar."""
    path = pathlib.Path(path)
    frames = np.ascontiguousarray(frames, np.uint8)
    with open(path, "wb") as f:
        f.write(frames.tobytes())
    sidecar = {
        "width": int(frames.shape[2]),
        "height": int(frames.shape[1]),
        "fps": float(fps),
    }
    path.with_suffix(path.suffix + ".json").write_text(json.dumps(sidecar))


class RawRGB24Source(FrameSource):
    """Chunked reader for .rgb24 streams; native-prefetched when possible."""

    def __init__(self, path, prefer_native: bool = True):
        self.path = pathlib.Path(path)
        meta = json.loads(
            self.path.with_suffix(self.path.suffix + ".json").read_text()
        )
        self.size = (int(meta["width"]), int(meta["height"]))
        self.fps = float(meta.get("fps", 25.0))
        self.native = prefer_native and build_native()
        self._handle = None
        self._lib = None

    def chunks(self, chunk_size: int):
        W, H = self.size
        if self.native:
            lib = _load_lib()
            handle = lib.lt_loader_open(
                str(self.path).encode(), W, H, chunk_size, 3
            )
            if not handle:
                raise OSError(f"native loader failed to open {self.path}")
            self._handle, self._lib = handle, lib
            n_valid = ctypes.c_int(0)
            nbytes = chunk_size * H * W * 3
            try:
                while True:
                    ptr = lib.lt_loader_acquire(handle, ctypes.byref(n_valid))
                    if not ptr or n_valid.value == 0:
                        break
                    chunk = np.ctypeslib.as_array(ptr, shape=(nbytes,)).reshape(
                        chunk_size, H, W, 3
                    )
                    # Hand out a copy: the ring slot is recycled on the next
                    # acquire, while the consumer may still hold this chunk.
                    yield chunk.copy(), int(n_valid.value)
            finally:
                lib.lt_loader_close(handle)
                self._handle = None
            return
        # Fallback: memmap reader (same chunk contract).
        frame_bytes = H * W * 3
        mm = np.memmap(self.path, dtype=np.uint8, mode="r")
        n_frames = mm.size // frame_bytes
        arr = mm[: n_frames * frame_bytes].reshape(n_frames, H, W, 3)
        for i in range(0, n_frames, chunk_size):
            part = [np.array(f) for f in arr[i : i + chunk_size]]
            yield _pad_chunk(part, chunk_size)


class RawRGB24Sink(FrameSink):
    def __init__(self, path, size, fps=25.0):
        self.path = pathlib.Path(path)
        self._f = open(self.path, "wb")
        self.size = tuple(size)
        self.fps = float(fps)

    def write(self, frames, n_valid=None):
        n = len(frames) if n_valid is None else n_valid
        self._f.write(np.ascontiguousarray(frames[:n], np.uint8).tobytes())

    def close(self):
        self._f.close()
        sidecar = {
            "width": int(self.size[0]),
            "height": int(self.size[1]),
            "fps": self.fps,
        }
        self.path.with_suffix(self.path.suffix + ".json").write_text(
            json.dumps(sidecar)
        )
