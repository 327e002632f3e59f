"""Fused tophat+threshold channel kernels — measured dead end (round 3/4 post-mortem).

These kernels fuse a channel's tophat with its bilateral threshold(s) in
one VMEM residency (`channel_stage_pallas2`: band-matmul window sums;
`channel_stage_pyr_pallas2`: pyramid window sums, full-height blocks).
Both are bit-exact with the unfused chain, and both LOST to it on
hardware (scripts/mosaic_probe7/8.py, TPU v5e):

  - The tophat must be recomputed over the threshold's read reach, so
    every block pays a (2*kb+1+kt-1)-row halo of redundant morphology.
  - At the best block size the R channel ties the unfused pair
    (0.1922 vs 0.1936 ms/frame) and B+noise loses (0.3687 vs 0.320).
  - The probe8 block-size study was the one durable result: the k=55
    tophat wants H/2 blocks, k=29 stays at H/3 — now the ksize-driven
    default in `tophat_pallas2`.

What ultimately shipped instead is RIDER fusion
(`tophat_riders_pallas2`): a rider threshold reads an INDEPENDENT
already-materialized input, so there is no halo recomputation and its
MXU band dots drain under the host kernel's VPU sweeps.

Kept here (out of the product module, verdict r3 weak #4) so the probes
and the measured numbers in docs/PERFORMANCE.md stay reproducible:
`python scripts/mosaic_probe7.py` / `mosaic_probe8.py` import from this
file.  Parity can be re-checked any time in interpret mode; see git
history (tests/test_filter_stage2.py before round 4) for the original
bit-exactness tests.
"""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from lane_tracker_tpu.kernels.filter_stage2 import (  # noqa: E402
    LANE,
    _after_sums_h,
    _after_sums_v,
    _h_after_band_np,
    _morph,
    _read_of,
    _round_up,
    _v_after_band_np,
)

def _channel_body(
    stage, w0, w1, acc, dacc, fH, fV, uh, vb, out_th,
    *, kt, kb, C, block, halo, mv, mx, h_img, w_img, cols, vm, vk, i,
    sbf0=None, fHn=None, fVn=None, uhn=None, vbn=None, out_keep=None,
    kn=0, Cn=0, nthr=0, vmn=0, vkn=0,
):
    """Shared body: bf16 tophat -> MXU band-matmul bilateral threshold,
    plus (optionally) the noise keep-mask threshold on the RAW channel.

    The channel's raw block is staged ONCE; the tophat runs VPU-bound
    while every window sum rides the otherwise-idle MXU (probe6), and no
    intermediate ever round-trips HBM.  T (the tophat image) is
    materialized over the threshold's full read reach with zeros outside
    the image (the reference's BORDER_CONSTANT 0), so the band matmuls
    are exact.
    """
    in_rows = stage.shape[0] - 2 * mv
    w = w_img
    rt = kt // 2
    O = mv + halo  # first output row in buffer coordinates
    dtype = jnp.bfloat16

    def base_read(rs, cs):
        return stage[rs, cs].astype(jnp.int32).astype(dtype)

    # ---- tophat over the threshold's read reach ----
    dl_lo = O - kb - 1
    dl_n = block + 2 * kb + 1
    e_lo, e_n = dl_lo - rt, dl_n + 2 * rt
    _morph(base_read, w0, w1, acc, kt, jnp.minimum, 255,
           mx, w, e_lo, e_n, mv, in_rows)

    shape = (e_n, cols)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    grow = rows_i + e_lo - mv + i * block - halo
    in_img = (
        (grow >= 0) & (grow < h_img) & (cols_i >= mx) & (cols_i < mx + w_img)
    )
    acc[e_lo:e_lo + e_n, :] = jnp.where(
        in_img, acc[e_lo:e_lo + e_n, :], jnp.asarray(0, dtype))

    _morph(_read_of(acc), w0, w1, dacc, kt, jnp.maximum, 0,
           mx, w, dl_lo, dl_n, e_lo, e_n)

    # T := tophat = x - opened, 0 outside the image, over the dilate range
    # at FULL width (the h-band matmul sweeps every column); the erode
    # values in acc are dead, so acc becomes T.
    shape2 = (dl_n, cols)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, shape2, 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, shape2, 1)
    grow2 = rows2 + dl_lo - mv + i * block - halo
    in_img2 = (
        (grow2 >= 0) & (grow2 < h_img)
        & (cols2 >= mx) & (cols2 < mx + w_img)
    )
    acc[dl_lo:dl_lo + dl_n, :] = jnp.where(
        in_img2,
        base_read(slice(dl_lo, dl_lo + dl_n), slice(0, cols))
        - dacc[dl_lo:dl_lo + dl_n, :],
        jnp.asarray(0, dtype),
    )
    if vk > dl_n:
        # Keep the vertical dot's padded K reads finite (band columns
        # there are zero, but 0 * garbage could be NaN).
        acc[dl_lo + dl_n:dl_lo + vk, :] = jnp.zeros(
            (vk - dl_n, cols), dtype)

    # ---- bilateral threshold of T: two band matmuls + compares ----
    fH[:, :] = jnp.dot(acc[O:O + block, :], uh,
                       preferred_element_type=jnp.float32)
    fV[:, :] = jnp.dot(vb, acc[dl_lo:dl_lo + vk, :],
                       preferred_element_type=jnp.float32)
    x = acc[O:O + block, mx:mx + w].astype(jnp.float32)
    tt = jnp.float32(kb) * x - jnp.float32(C * kb)
    hit = (
        ((fH[:, mx - kb - 1:mx - kb - 1 + w] < tt) & (fH[:, mx:mx + w] < tt))
        | ((fV[0:block, mx:mx + w] < tt)
           & (fV[kb + 1:kb + 1 + block, mx:mx + w] < tt))
    )
    out_th[0, :, mx:mx + w] = jnp.where(
        hit, jnp.int32(255), jnp.int32(0)).astype(jnp.uint8)

    if out_keep is None:
        return

    # ---- noise keep-mask: bilateral threshold of the RAW channel with
    # zero borders + the inRange fold (lane_tracker.py:221-231) ----
    shape3 = (stage.shape[0], cols)
    rows3 = jax.lax.broadcasted_iota(jnp.int32, shape3, 0)
    cols3 = jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
    grow3 = rows3 - mv + i * block - halo
    in_img3 = (
        (grow3 >= 0) & (grow3 < h_img)
        & (cols3 >= mx) & (cols3 < mx + w_img)
    )
    sbf0[:, :] = jnp.where(
        in_img3, stage[:, :].astype(jnp.int32).astype(dtype),
        jnp.asarray(0, dtype))
    a_lo_n = O - kn - 1
    fHn[:, :] = jnp.dot(sbf0[O:O + block, :], uhn,
                        preferred_element_type=jnp.float32)
    fVn[:, :] = jnp.dot(vbn, sbf0[a_lo_n:a_lo_n + vkn, :],
                        preferred_element_type=jnp.float32)
    xr = sbf0[O:O + block, mx:mx + w].astype(jnp.float32)
    ttn = jnp.float32(kn) * xr - jnp.float32(Cn * kn)
    hitn = (
        ((fHn[:, mx - kn - 1:mx - kn - 1 + w] < ttn)
         & (fHn[:, mx:mx + w] < ttn))
        | ((fVn[0:block, mx:mx + w] < ttn)
           & (fVn[kn + 1:kn + 1 + block, mx:mx + w] < ttn))
    )
    keep = (xr < jnp.float32(nthr)) | hitn
    out_keep[0, :, mx:mx + w] = jnp.where(
        keep, jnp.int32(255), jnp.int32(0)).astype(jnp.uint8)


def _channel_body_pyr(
    stage, w0, w1, acc, dacc, iw0, iw1, accH, accV, out_th,
    *, kt, kb, C, block, halo, mv, mx, h_img, w_img, cols, i,
):
    """Pyramid-sum variant of _channel_body: bf16 tophat -> i32 pow2
    after-sum pyramids (_after_sums_h/_after_sums_v) -> compares.

    Unlike the band-matmul variant, every statement is LINEAR in block
    rows — no dense K dimension growing with the block — so this is the
    variant that can run at FULL frame height (grid=1), where the
    tophat's halo redundancy vanishes entirely.
    """
    in_rows = stage.shape[0] - 2 * mv
    w = w_img
    rt = kt // 2
    O = mv + halo  # first output row in buffer coordinates
    dtype = jnp.bfloat16

    def base_read(rs, cs):
        return stage[rs, cs].astype(jnp.int32).astype(dtype)

    # ---- tophat over the threshold's read reach ----
    dl_lo = O - kb - 1
    dl_n = block + 2 * kb + 1
    e_lo, e_n = dl_lo - rt, dl_n + 2 * rt
    _morph(base_read, w0, w1, acc, kt, jnp.minimum, 255,
           mx, w, e_lo, e_n, mv, in_rows)

    shape = (e_n, cols)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    grow = rows_i + e_lo - mv + i * block - halo
    in_img = (
        (grow >= 0) & (grow < h_img) & (cols_i >= mx) & (cols_i < mx + w_img)
    )
    acc[e_lo:e_lo + e_n, :] = jnp.where(
        in_img, acc[e_lo:e_lo + e_n, :], jnp.asarray(0, dtype))

    _morph(_read_of(acc), w0, w1, dacc, kt, jnp.maximum, 0,
           mx, w, dl_lo, dl_n, e_lo, e_n)

    # acc := tophat = x - opened, 0 outside the image (BORDER_CONSTANT 0
    # semantics of the reference's filter2D, lane_tracker.py:73-76), at
    # full expanded width so the horizontal sums' margin reads are 0.
    shape2 = (dl_n, cols)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, shape2, 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, shape2, 1)
    grow2 = rows2 + dl_lo - mv + i * block - halo
    in_img2 = (
        (grow2 >= 0) & (grow2 < h_img)
        & (cols2 >= mx) & (cols2 < mx + w_img)
    )
    acc[dl_lo:dl_lo + dl_n, :] = jnp.where(
        in_img2,
        base_read(slice(dl_lo, dl_lo + dl_n), slice(0, cols))
        - dacc[dl_lo:dl_lo + dl_n, :],
        jnp.asarray(0, dtype),
    )

    # ---- bilateral threshold of T via i32 after-sum pyramids ----
    # (window sums reach kb*255 > bf16's exact integer range, so sums run
    # i32; tophat values are 0..255 integers, exact through the cast)
    def tread(rs, cs):
        return acc[rs, cs].astype(jnp.int32)

    _after_sums_h(tread, iw0, iw1, accH, kb, mx, w, O, block, cols)
    _after_sums_v(tread, iw0, iw1, accV, kb, mx, w, dl_lo, block + kb + 1)

    x = acc[O:O + block, mx:mx + w].astype(jnp.int32)
    tt = kb * x - C * kb
    hit = (
        ((accH[O:O + block, mx - kb - 1:mx - kb - 1 + w] < tt)
         & (accH[O:O + block, mx:mx + w] < tt))
        | ((accV[dl_lo:dl_lo + block, mx:mx + w] < tt)
           & (accV[O:O + block, mx:mx + w] < tt))
    )
    out_th[0, :, mx:mx + w] = jnp.where(
        hit, jnp.int32(255), jnp.int32(0)).astype(jnp.uint8)


def _channel_pyr_kernel(in_hbm, out_th, stage, w0, w1, acc, dacc,
                        iw0, iw1, accH, accV, sem, *, mv, block, cols, **kw):
    t = pl.program_id(0)
    i = pl.program_id(1)
    in_rows = stage.shape[0] - 2 * mv
    cp = pltpu.make_async_copy(
        in_hbm.at[t, pl.ds(i * block, in_rows), :],
        stage.at[mv:mv + in_rows, :], sem)
    cp.start()
    stage[0:mv, :] = jnp.full((mv, cols), 255, jnp.uint8)
    stage[mv + in_rows:, :] = jnp.full((mv, cols), 255, jnp.uint8)
    cp.wait()
    _channel_body_pyr(stage, w0, w1, acc, dacc, iw0, iw1, accH, accV,
                      out_th, mv=mv, block=block, cols=cols, i=i, **kw)


def channel_stage_pyr_pallas2(
    img: jnp.ndarray,
    kt: int,
    kb: int,
    C: int,
    *,
    block: int | None = None,
    interpret: bool = False,
):
    """Fused per-channel stage, pyramid-sum variant: tophat(kt) ->
    bilateral threshold(kb, C) in one kernel, with the window sums as i32
    pow2 pyramids instead of band matmuls.  Defaults to FULL-HEIGHT
    blocks (grid=1 per frame): all statements are linear in block rows,
    so the biggest block minimizes total sweep work (no halo redundancy).
    Bit-exact with tophat_pallas2 -> bilateral_threshold_pallas2.

    Perf verdict (scripts/mosaic_probe7.py): NOT wired — at full height
    the R channel measured 0.2383 ms/frame vs 0.1936 unfused (the 9
    live full-width VMEM buffers blow past what fits without spilling),
    and smaller blocks reduce to channel_stage_pallas2's halo trade,
    which also does not win.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    T, H, W = img.shape
    kt, kb = int(kt), int(kb)
    rt = kt // 2
    halo = kb + 1 + 2 * rt
    if block is None:
        block = _round_up(H, 8)
    grid = -(-H // block)
    mx = _round_up(kb + 1, 64)
    cols = _round_up(W + 2 * mx, LANE)
    mv = 8
    in_rows = _round_up(block + 2 * halo, 8)
    rows = in_rows + 2 * mv
    assert mx - rt - 1 >= 1 << max((2 * rt + 1).bit_length() - 2, 0)
    eg_b = 1 << max(kb.bit_length() - 2, 0)
    assert mx - kb - 1 >= eg_b - 1, (kb, mx)

    hbuf = jnp.full((T, grid * block + (in_rows - block), cols), 255,
                    jnp.uint8)
    hbuf = jax.lax.dynamic_update_slice(hbuf, img, (0, halo, mx))

    dtype = jnp.bfloat16
    kernel = functools.partial(
        _channel_pyr_kernel,
        kt=kt, kb=kb, C=int(C), block=int(block), halo=int(halo),
        mv=int(mv), mx=int(mx), h_img=int(H), w_img=int(W), cols=int(cols),
    )
    out = pl.pallas_call(
        kernel,
        grid=(T, grid),
        out_shape=jax.ShapeDtypeStruct((T, grid * block, cols), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, block, cols), lambda t, i: (t, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, cols), jnp.uint8),   # stage
            pltpu.VMEM((rows, cols), dtype),       # w0
            pltpu.VMEM((rows, cols), dtype),       # w1
            pltpu.VMEM((rows, cols), dtype),       # acc (erode -> T)
            pltpu.VMEM((rows, cols), dtype),       # dacc (opened)
            pltpu.VMEM((rows, cols), jnp.int32),   # iw0
            pltpu.VMEM((rows, cols), jnp.int32),   # iw1
            pltpu.VMEM((rows, cols), jnp.int32),   # accH
            pltpu.VMEM((rows, cols), jnp.int32),   # accV
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(hbuf)
    out = out[:, :H, mx:mx + W]
    return out[0] if squeeze else out


def _channel_kernel(in_hbm, uh_ref, vb_ref, out_th, stage, w0, w1, acc,
                    dacc, fH, fV, sem, *, mv, block, cols, **kw):
    t = pl.program_id(0)
    i = pl.program_id(1)
    in_rows = stage.shape[0] - 2 * mv
    cp = pltpu.make_async_copy(
        in_hbm.at[t, pl.ds(i * block, in_rows), :],
        stage.at[mv:mv + in_rows, :], sem)
    cp.start()
    stage[0:mv, :] = jnp.full((mv, cols), 255, jnp.uint8)
    stage[mv + in_rows:, :] = jnp.full((mv, cols), 255, jnp.uint8)
    cp.wait()
    _channel_body(stage, w0, w1, acc, dacc, fH, fV, uh_ref[...], vb_ref[...],
                  out_th, mv=mv, block=block, cols=cols, i=i, **kw)


def _channel_noise_kernel(in_hbm, uh_ref, vb_ref, uhn_ref, vbn_ref,
                          out_th, out_keep, stage, sbf0, w0, w1, acc, dacc,
                          fH, fV, fHn, fVn, sem, *, mv, block, cols, **kw):
    t = pl.program_id(0)
    i = pl.program_id(1)
    in_rows = stage.shape[0] - 2 * mv
    cp = pltpu.make_async_copy(
        in_hbm.at[t, pl.ds(i * block, in_rows), :],
        stage.at[mv:mv + in_rows, :], sem)
    cp.start()
    stage[0:mv, :] = jnp.full((mv, cols), 255, jnp.uint8)
    stage[mv + in_rows:, :] = jnp.full((mv, cols), 255, jnp.uint8)
    cp.wait()
    _channel_body(stage, w0, w1, acc, dacc, fH, fV, uh_ref[...], vb_ref[...],
                  out_th, mv=mv, block=block, cols=cols, i=i,
                  sbf0=sbf0, fHn=fHn, fVn=fVn, uhn=uhn_ref[...],
                  vbn=vbn_ref[...], out_keep=out_keep, **kw)


def channel_stage_pallas2(
    img: jnp.ndarray,
    kt: int,
    kb: int,
    C: int,
    *,
    noise: tuple | None = None,
    block: int | None = None,
    interpret: bool = False,
):
    """Fused per-channel stage: tophat(kt) -> bilateral threshold(kb, C),
    plus with ``noise=(kn, Cn, nthr)`` the noise keep-mask threshold of
    the RAW channel — one kernel, one staging, intermediates never leave
    VMEM.  Bit-exact with the unfused chain (tophat_pallas2 ->
    bilateral_threshold_pallas2).  Accepts (H, W) or (T, H, W).

    Returns th, or (th, keep) when noise is requested.

    Perf verdict (scripts/mosaic_probe7.py, TPU v5 lite, T=128): NOT
    wired into the pipeline.  The tophat must cover the threshold's full
    read reach, so each block pays a (2*kb+1 + 2*kt//2)-row halo of
    redundant tophat work; at the best block size (H/2) the R channel
    ties the unfused chain (0.1922 vs 0.1936 ms/frame) and the B+noise
    channel loses (0.3687 vs 0.320).  The u8 HBM staging round trips the
    fusion removes cost less than the halo redundancy it adds.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    T, H, W = img.shape
    kt, kb = int(kt), int(kb)
    rt = kt // 2
    kn = int(noise[0]) if noise else 0
    halo = max(kb + 1 + 2 * rt, (kn + 1) if noise else 0)
    if block is None:
        block = _round_up(-(-H // 3), 8)
    grid = -(-H // block)
    mx = _round_up(max(kb, kn) + 1, 64)
    cols = _round_up(W + 2 * mx, LANE)
    vm = _round_up(block + kb + 1, 8)
    vk = _round_up(vm + kb, LANE)
    mv_need = vk - block - halo - kb - 1
    vmn = vkn = 0
    if noise:
        vmn = _round_up(block + kn + 1, 8)
        vkn = _round_up(vmn + kn, LANE)
        mv_need = max(mv_need, vkn - block - halo - kn - 1)
    mv = _round_up(max(8, mv_need), 8)
    in_rows = _round_up(block + 2 * halo, 8)
    rows = in_rows + 2 * mv
    assert mx - rt - 1 >= 1 << max((2 * rt + 1).bit_length() - 2, 0)

    hbuf = jnp.full((T, grid * block + (in_rows - block), cols), 255,
                    jnp.uint8)
    hbuf = jax.lax.dynamic_update_slice(hbuf, img, (0, halo, mx))

    uh = jnp.asarray(_h_after_band_np(cols, kb), jnp.bfloat16)
    vb = jnp.asarray(_v_after_band_np(vm, vk, kb), jnp.bfloat16)
    dtype = jnp.bfloat16
    static = dict(
        kt=kt, kb=kb, C=int(C), block=int(block), halo=int(halo),
        mv=int(mv), mx=int(mx), h_img=int(H), w_img=int(W), cols=int(cols),
        vm=int(vm), vk=int(vk),
    )
    const_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda t, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    base_scratch = [
        pltpu.VMEM((rows, cols), jnp.uint8),   # stage
        pltpu.VMEM((rows, cols), dtype),       # w0
        pltpu.VMEM((rows, cols), dtype),       # w1
        pltpu.VMEM((rows, cols), dtype),       # acc (erode -> T)
        pltpu.VMEM((rows, cols), dtype),       # dacc (opened)
        pltpu.VMEM((block, cols), jnp.float32),  # fH
        pltpu.VMEM((vm, cols), jnp.float32),     # fV
    ]
    params = pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024,
        dimension_semantics=("arbitrary", "arbitrary"),
    )
    out_sh = jax.ShapeDtypeStruct((T, grid * block, cols), jnp.uint8)
    out_spec = pl.BlockSpec((1, block, cols), lambda t, i: (t, i, 0),
                            memory_space=pltpu.VMEM)
    if not noise:
        out = pl.pallas_call(
            functools.partial(_channel_kernel, **static),
            grid=(T, grid),
            out_shape=out_sh,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      const_spec((cols, cols)), const_spec((vm, vk))],
            out_specs=out_spec,
            scratch_shapes=base_scratch + [pltpu.SemaphoreType.DMA],
            compiler_params=params,
            interpret=interpret,
        )(hbuf, uh, vb)
        out = out[:, :H, mx:mx + W]
        return out[0] if squeeze else out

    kn, Cn, nthr = (int(v) for v in noise)
    uhn = jnp.asarray(_h_after_band_np(cols, kn), jnp.bfloat16)
    vbn = jnp.asarray(_v_after_band_np(vmn, vkn, kn), jnp.bfloat16)
    th, keep = pl.pallas_call(
        functools.partial(_channel_noise_kernel, **static,
                          kn=kn, Cn=Cn, nthr=nthr, vmn=int(vmn),
                          vkn=int(vkn)),
        grid=(T, grid),
        out_shape=(out_sh, out_sh),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  const_spec((cols, cols)), const_spec((vm, vk)),
                  const_spec((cols, cols)), const_spec((vmn, vkn))],
        out_specs=(out_spec, out_spec),
        scratch_shapes=base_scratch[:1] + [
            pltpu.VMEM((rows, cols), dtype),       # sbf0 (zero-border raw)
        ] + base_scratch[1:] + [
            pltpu.VMEM((block, cols), jnp.float32),  # fHn
            pltpu.VMEM((vmn, cols), jnp.float32),    # fVn
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=params,
        interpret=interpret,
    )(hbuf, uh, vb, uhn, vbn)
    th = th[:, :H, mx:mx + W]
    keep = keep[:, :H, mx:mx + W]
    if squeeze:
        return th[0], keep[0]
    return th, keep
