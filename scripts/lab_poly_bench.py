"""Hardware check + timing of the polynomial-gamma LAB fast path.

(a) Exhaustive rint-exactness of _gamma_poly_f32 vs the integer gamma
    LUT on the real TPU (FMA contraction differs from CPU backends —
    the LP margin certifies it, this measures it).
(b) ms/frame of rgb2lab_b_fast on the warped-frame geometry, to update
    the 0.076 ms stage budget line (3x pow(2.4) -> Horner polys).

Usage: nohup python scripts/lab_poly_bench.py > /tmp/lab_poly.log 2>&1 &
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

T = 128


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from lane_tracker_tpu.ops.color import _gamma_poly_f32, _tables, rgb2lab_b_fast
    from lane_tracker_tpu.utils.timing import device_time_per_iter

    gamma_tab, _, _ = _tables()
    i = jnp.arange(256, dtype=jnp.float32)
    got = np.asarray(jax.jit(_gamma_poly_f32)(i)).astype(np.int64)
    exact = bool(np.array_equal(got, gamma_tab))
    print(json.dumps({"stage": "gamma_poly_exhaustive_tpu", "exact": exact}),
          flush=True)

    # Time LAB on warped-shape frames (1100 x 1080 x 3 after the warp).
    img = np.asarray(Image.open("assets/test4.jpg").convert("RGB"))
    Hw, Ww = 1100, 1080
    tile = np.stack([np.ascontiguousarray(
        img[:Hw % 720 or 720, :Ww, :]) for _ in range(T)])
    # just use raw-frame geometry cropped/padded to the warped size
    frame = np.zeros((T, Hw, Ww, 3), np.uint8)
    frame[:, :720, :, :] = np.stack([img[:, :Ww, :]] * T)
    chunk = jax.device_put(frame)

    def body(c):
        out = jax.vmap(rgb2lab_b_fast)(c)
        return c ^ (jnp.max(out) & 1).astype(jnp.uint8)[..., None]

    per_iter, _ = device_time_per_iter(lambda: chunk, body,
                                       n_iters=8, repeats=3)
    print(json.dumps({"stage": "lab_b_fast_poly_gamma",
                      "ms_per_frame": round(per_iter / T * 1e3, 4)}),
          flush=True)


if __name__ == "__main__":
    main()
