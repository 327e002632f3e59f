"""Pallas TPU stage kernels for the lane-pixel filter chain, v2.

The filter stage (reference: lane_tracker.py:183-240) dominates the frame
budget: measured 1.68 ms of the 2.52 ms end-to-end on v5e (tophats 0.83,
bilateral thresholds 0.82, open 0.07) because every XLA elementwise op
round-trips HBM.  These kernels run each stage VMEM-resident instead.

Design notes (probe-driven, scripts/mosaic_probe*.py):

* Mosaic here supports i32/f32 vector ops only — u8/i16 minimum and
  bf16 rolls fail to compile.  All compute is i32; u8 staging in/out.
* Shifted reads are STATIC SLICES of margin-padded VMEM scratch buffers,
  not ``pltpu.roll``: rolls pay 2-4 ops for wrap masking; slices with
  sublane (row) offsets are nearly free and lane (column) offsets pay one
  in-register rotate.  Neutral values live in the margins, so no
  per-shift masking anywhere.
* Each SE extent group folds into ONE fused statement combining its
  horizontal window (two lane-offset slices of the pow2 aggregate) and
  its vertical dy span (sublane offsets) — Mosaic fuses the whole
  min-tree into a single VMEM sweep.
* Row-blocked grid (a whole i32 frame plus temporaries exceeds VMEM):
  each program DMAs BLOCK + 2*halo input rows, computes in VMEM, writes
  BLOCK rows.  Liveness stays at 4 i32 buffers by restarting the pow2
  ping-pong per phase and accumulating in place.

Semantics are identical to the XLA ops in ops/morphology.py /
ops/threshold.py (themselves bit-exact vs OpenCV); parity is pinned in
interpret mode and on hardware by tests/test_filter_stage2.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lane_tracker_tpu.ops.morphology import ellipse_runs

LANE = 128


def _round_up(x, m):
    return -(-x // m) * m


def _segments(dys):
    segs = []
    start = prev = dys[0]
    for d in dys[1:]:
        if d == prev + 1:
            prev = d
        else:
            segs.append((start, prev))
            start = prev = d
    segs.append((start, prev))
    return segs


@functools.lru_cache(maxsize=None)
def extent_groups(ksize: int):
    """OpenCV-ellipse SE rows grouped by horizontal extent.

    Returns ((lo, hi), dy_segments) pairs ordered by increasing run
    length, so the pow2 aggregate can grow monotonically while extents
    are consumed.
    """
    by_extent = {}
    for dy, ext in ellipse_runs(ksize):
        by_extent.setdefault(ext, []).append(dy)
    groups = []
    for ext in sorted(by_extent, key=lambda e: e[1] - e[0]):
        groups.append((ext, tuple(_segments(sorted(by_extent[ext])))))
    return tuple(groups)


def _read_of(buf):
    def read(rs, cs):
        return buf[rs, cs]

    return read


@functools.lru_cache(maxsize=None)
def zono_schedule(ksize: int):
    """Minkowski (zonotope) decomposition of OpenCV's elliptical SE.

    Round-4 finding (scripts/se_decomp_search.py): the digital ellipse
    EQUALS the lattice fill of its convex hull, the hull is centrally
    symmetric, and the Minkowski sum of one segment per antipodal
    hull-edge pair covers all but a handful of cells (12 for k=55, 8 for
    k=29) while never overshooting.  Erosion/dilation by a Minkowski sum
    is a CHAIN of segment erosions, each O(log n) pow2-doubling
    statements — ~29 binary-op sweeps for k=55 where the per-row-run
    scheme (extent_groups/_morph) pays ~110 — and the missing cells are
    a union of short row-runs, each a 1-2-read window off a shared pow2
    aggregate.  Exact by construction; this builder verifies the
    cell-for-cell equality and raises if a ksize ever fails it.

    Returns (steps, runs, r):
      steps: tuple of (g_dy, g_dx) — chained binary ops
             out(y, x) = op(in(y, x), in(y + g_dy, x + g_dx)), with all
             g_dy >= 0 (directions normalized; the chain result is the
             SE anchored at its top row, i.e. erosion output at y reads
             the final chain buffer at y - r).
      runs:  tuple of (dy, lo, hi) residual row-runs of E \\ zonotope
             (offsets from the SE center).
    """
    import numpy as np

    r = ksize // 2
    E = np.zeros((ksize, ksize), bool)
    for dy, (lo, hi) in ellipse_runs(ksize):
        E[dy + r, lo + r:hi + r + 1] = True

    # Convex hull of the SE cells (monotone chain).
    pts = sorted(map(tuple, np.argwhere(E)))

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]

    # Primitive edge vectors; keep one per antipodal pair (the hull of a
    # centrally symmetric set is centrally symmetric).
    from math import gcd

    counts = {}
    n = len(hull)
    for i in range(n):
        a, b = hull[i], hull[(i + 1) % n]
        dy, dx = b[0] - a[0], b[1] - a[1]
        g = gcd(abs(dy), abs(dx))
        d = (dy // g, dx // g)
        if d[0] < 0 or (d[0] == 0 and d[1] < 0):
            d = (-d[0], -d[1])
        counts[d] = counts.get(d, 0) + g
    factors = []
    for (dy, dx), c in counts.items():
        if c % 2:
            raise ValueError(f"asymmetric hull for ksize={ksize}")
        factors.append((dy, dx, c // 2))

    # Verify: Minkowski sum of the factor segments == hull fill == E,
    # up to the residual runs (subset always; record what's missing).
    C = 4 * ksize + 1
    c0 = 2 * ksize
    S = np.zeros((C, C), bool)
    S[c0, c0] = True
    toty = totx = 0
    for dy, dx, cnt in factors:
        nxt = np.zeros_like(S)
        for i in range(cnt + 1):
            nxt |= np.roll(S, (i * dy, i * dx), axis=(0, 1))
        S = nxt
        toty += dy * cnt
        totx += dx * cnt
    if toty != 2 * r or totx != 0:
        raise ValueError(f"unexpected displacement for ksize={ksize}")
    S = np.roll(S, (-r, 0), axis=(0, 1))
    Sc = S[c0 - r:c0 + r + 1, c0 - r:c0 + r + 1].copy()
    S[c0 - r:c0 + r + 1, c0 - r:c0 + r + 1] = False
    if S.any() or (Sc & ~E).any():
        raise ValueError(f"zonotope not a subset of the SE for {ksize}")

    # Residual row-runs.
    runs = []
    for y in range(ksize):
        row = np.where(E[y] & ~Sc[y])[0]
        if not len(row):
            continue
        s = p = int(row[0])
        for x in row[1:]:
            if x == p + 1:
                p = int(x)
            else:
                runs.append((y - r, s - r, p - r))
                s = p = int(x)
        runs.append((y - r, s - r, p - r))

    # Statement schedule: factors ordered by descending vertical reach
    # (large n*dy first) so later statements touch fewer rows — the
    # backward range pass in _morph_zono turns that into real savings.
    factors.sort(key=lambda f: -(f[0] * f[2]))
    steps = []
    for dy, dx, cnt in factors:
        L = cnt + 1
        p = 1
        while 2 * p <= L:
            steps.append((p * dy, p * dx))
            p *= 2
        if p < L:
            # Overlapping final window — safe for idempotent min/max.
            steps.append(((L - p) * dy, (L - p) * dx))
    return tuple(steps), tuple(runs), r


def _morph_zono(base_read, work0, work1, acc, ksize, op, neutral,
                mx, w, row_lo, row_n, grow_lo, grow_n):
    """Drop-in for _morph using the Minkowski/zonotope decomposition.

    Same contract: base_read(rows, cols) must be valid over rows
    [row_lo - r, row_lo + row_n + r) (within [grow_lo, grow_lo+grow_n))
    and columns expanded by r, with margins carrying the op's neutral;
    acc receives the result over [row_lo, row_lo+row_n) x [mx, mx+w).

    Two phases: (1) the residual row-runs combine into acc off a shared
    pow2 pair-aggregate of the base (one growth statement, 1-2 reads per
    run); (2) the segment-erosion chain runs through the work ping-pong
    with exact backward-computed row/column ranges, and its recentered
    final window folds into acc.
    """
    R, C = work0.shape
    steps, runs, r = zono_schedule(ksize)
    assert row_lo - r >= grow_lo, (row_lo, r, grow_lo)
    assert row_lo + row_n + r <= grow_lo + grow_n, (row_lo, row_n, r)

    # ---- phase 1: residual runs into acc ----
    acc_started = False
    if runs:
        pair_runs = [rn for rn in runs if rn[2] - rn[1] + 1 >= 2]
        pair = None
        if pair_runs:
            # g2(y, x) = op(base(y, x), base(y, x+1)) over the union of
            # the PAIR reads' reach: length-1 runs read base directly,
            # and pair reads stop at x = hi - 1, so the pair's last
            # column is mx + w + hi - 2 and its base reads stay within
            # the contract's r-expanded columns even when hi == r
            # (round-4 advisor: the former full-run range read one
            # column past the contract at hi == r).
            dys = [dy for dy, _, _ in pair_runs]
            p_lo = row_lo + min(dys)
            p_n = row_n + max(dys) - min(dys)
            cl = mx + min(lo for _, lo, _ in pair_runs)
            cr = mx + w + max(hi for _, _, hi in pair_runs) - 1
            assert p_lo >= grow_lo and p_lo + p_n <= grow_lo + grow_n
            assert cl >= 1 and cr <= C - 1, (cl, cr, C)
            work0[p_lo:p_lo + p_n, cl:cr] = op(
                base_read(slice(p_lo, p_lo + p_n), slice(cl, cr)),
                base_read(slice(p_lo, p_lo + p_n), slice(cl + 1, cr + 1)))
            pair = work0
        terms = []
        for dy, lo, hi in runs:
            rs = slice(row_lo + dy, row_lo + dy + row_n)
            L = hi - lo + 1
            if L == 1:
                terms.append(base_read(rs, slice(mx + lo, mx + lo + w)))
            else:
                # Window [lo, hi] as overlapping pair reads: pairs at
                # lo, lo+2, ... and a final pair at hi-1 (idempotent op).
                x = lo
                while x + 1 <= hi:
                    terms.append(pair[rs, mx + x:mx + x + w])
                    x += 2
                if x == hi:
                    terms.append(pair[rs, mx + hi - 1:mx + hi - 1 + w])
        expr = terms[0]
        for t in terms[1:]:
            expr = op(expr, t)
        acc[row_lo:row_lo + row_n, mx:mx + w] = expr
        acc_started = True

    # ---- phase 2: the segment-erosion chain ----
    # Backward pass: needed output range of each step.
    ranges = [None] * len(steps)
    lo_i, n_i, cl_i, cw_i = row_lo - r, row_n, mx, w
    for i in range(len(steps) - 1, -1, -1):
        ranges[i] = (lo_i, n_i, cl_i, cw_i)
        gdy, gdx = steps[i]
        n_i += gdy
        cl_i += min(0, gdx)
        cw_i += abs(gdx)
    assert lo_i >= grow_lo and lo_i + n_i <= grow_lo + grow_n, (
        lo_i, n_i, grow_lo, grow_n)
    assert cl_i >= 0 and cl_i + cw_i <= C, (cl_i, cw_i, C)

    reads = base_read
    ping = [work1, work0]  # work0 (residual pair) is dead after phase 1
    pidx = 0
    for (gdy, gdx), (lo, n, cl, cw) in zip(steps, ranges):
        dst = ping[pidx]
        dst[lo:lo + n, cl:cl + cw] = op(
            reads(slice(lo, lo + n), slice(cl, cl + cw)),
            reads(slice(lo + gdy, lo + gdy + n),
                  slice(cl + gdx, cl + gdx + cw)))
        reads = _read_of(dst)
        pidx ^= 1
    final = reads(slice(row_lo - r, row_lo - r + row_n), slice(mx, mx + w))
    if acc_started:
        acc[row_lo:row_lo + row_n, mx:mx + w] = op(
            acc[row_lo:row_lo + row_n, mx:mx + w], final)
    else:
        acc[row_lo:row_lo + row_n, mx:mx + w] = final


def _morph(base_read, work0, work1, acc, ksize, op, neutral,
           mx, w, row_lo, row_n, grow_lo, grow_n):
    """Erode/dilate by OpenCV's elliptical SE into ``acc``.

    base_read(rows, cols) reads the margin-padded source, valid over at
    least rows [mv - r, mv + h + r) and the expanded column range (source
    margins carry the op's neutral).  work0/work1 ping-pong the horizontal
    pow2 aggregate g_p(y, x) = op over x..x+p-1; extents are consumed in
    increasing-length order so only the current level is live.  acc
    receives the result over rows [row_lo, row_lo + row_n), columns
    [mx, mx + w) — callers pass the TIGHT range the next consumer needs
    (e.g. the opening's dilate only needs the output block rows).

    Cost structure (measured on v5e): lane-offset slices pay an
    in-register rotate per statement while sublane-offset slices are
    near-free.  So each extent does its two lane-offset window reads ONCE
    into a temp (the stale ping buffer), and the vertical dy span combines
    via sublane-only reads of that temp.

    Aggregates carry REAL values at margin columns (a window anchored
    left of the image still covers image columns), so growth writes an
    EXPANDED column range [ex, C - ex) with the inset ex sized so the
    largest growth shift stays in bounds; window reads at |dx| <= r then
    always land on computed values since mx - r - 1 >= ex.
    """
    R, C = work0.shape
    r = ksize // 2
    max_shift = 1 << max((2 * r + 1).bit_length() - 2, 0)
    ex = mx - r - 1
    assert ex >= max_shift, (ksize, mx)
    t_lo, t_n = row_lo - r, row_n + 2 * r  # temp covers acc rows +- r
    assert t_lo >= grow_lo and t_lo + t_n <= grow_lo + grow_n, (
        row_lo, row_n, grow_lo, grow_n)
    we = C - 2 * ex  # expanded width

    def sle(read, dx):
        return read(slice(grow_lo, grow_lo + grow_n),
                    slice(ex + dx, ex + dx + we))

    def slt(read, dx):
        return read(slice(t_lo, t_lo + t_n), slice(mx + dx, mx + dx + w))

    p = 1
    reads = base_read
    ping = [work0, work1]
    pidx = 0
    acc_started = False
    for (lo, hi), segs in extent_groups(ksize):
        length = hi - lo + 1
        target = 1 << (length.bit_length() - 1)
        while p < target:
            dst = ping[pidx]
            dst[grow_lo:grow_lo + grow_n, ex:ex + we] = op(
                sle(reads, 0), sle(reads, p))
            reads = _read_of(dst)
            pidx ^= 1
            p *= 2
        # Lane-offset work once: t = window over [lo, hi] (2 rotates).
        tbuf = ping[pidx]  # the stale ping buffer; dead until next growth
        if p != length:
            tw = op(slt(reads, lo), slt(reads, hi - p + 1))
        else:
            tw = slt(reads, lo)
        tbuf[t_lo:t_lo + t_n, mx:mx + w] = tw
        # Vertical dy span: sublane-only fused reads of the temp.
        terms = []
        for slo, shi in segs:
            for dy in range(slo, shi + 1):
                terms.append(
                    tbuf[row_lo + dy:row_lo + dy + row_n, mx:mx + w])
        expr = terms[0]
        for t in terms[1:]:
            expr = op(expr, t)
        if acc_started:
            acc[row_lo:row_lo + row_n, mx:mx + w] = op(
                acc[row_lo:row_lo + row_n, mx:mx + w], expr)
        else:
            acc[row_lo:row_lo + row_n, mx:mx + w] = expr
            acc_started = True


def _tophat_kernel(
    in_hbm, out_ref, stage, w0, w1, acc, dacc, sem,
    *, ksize, block, halo, mv, mx, h_img, w_img, cols, dtype,
    morph=_morph,
):
    t = pl.program_id(0)  # frame within the batch
    i = pl.program_id(1)  # row block within the frame
    in_rows = stage.shape[0] - 2 * mv
    h, w = in_rows, w_img

    cp = pltpu.make_async_copy(
        in_hbm.at[t, pl.ds(i * block, in_rows), :],
        stage.at[mv:mv + in_rows, :],
        sem,
    )
    cp.start()
    # Staging row margins: erode neutral (host pads columns and
    # out-of-image rows with 255 already).
    stage[0:mv, :] = jnp.full((mv, cols), 255, jnp.uint8)
    stage[mv + in_rows:, :] = jnp.full((mv, cols), 255, jnp.uint8)
    cp.wait()

    def base_read(rs, cs):
        # Two-step cast: Mosaic rejects direct u8 -> float casts.  bf16 is
        # the default compute type — all values are 0..255 integers (exact
        # in bf16) and morphology is min/max only, so results stay
        # bit-exact while VMEM sweep traffic (the measured cost driver)
        # halves vs i32: tophat29 0.191 -> 0.141 ms/frame measured.
        return stage[rs, cs].astype(jnp.int32).astype(dtype)

    # Tight per-phase row extents: the final subtract needs only this
    # block's rows [mv+2r, mv+2r+block); the dilate producing them reads
    # the eroded image +-r; the erode's window reads its source +-r more.
    r = ksize // 2
    e_lo, e_n = mv + r, block + 2 * r

    # ---- erode (aggregates over all data rows) ----
    morph(base_read, w0, w1, acc, ksize, jnp.minimum, 255,
          mx, w, e_lo, e_n, mv, in_rows)

    # The opening's dilate reads the eroded image with BORDER_CONSTANT 0
    # (dilate neutral) outside the image — zero acc's out-of-image and
    # column-margin positions over its valid rows in one masked sweep.
    shape = (e_n, stage.shape[1])
    rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    grow = rows_i + e_lo - mv + i * block - halo
    in_img = (
        (grow >= 0) & (grow < h_img) & (cols_i >= mx) & (cols_i < mx + w_img)
    )
    acc[e_lo:e_lo + e_n, :] = jnp.where(
        in_img, acc[e_lo:e_lo + e_n, :], jnp.asarray(0, dtype))

    # ---- dilate of the eroded image (aggregates over the eroded rows) ----
    morph(_read_of(acc), w0, w1, dacc, ksize, jnp.maximum, 0,
          mx, w, mv + 2 * r, block, e_lo, e_n)

    # ---- tophat = x - opened; emit this block's output rows ----
    # (differences of 0..255 integers are exact in bf16)
    s = mv + halo
    diff = (
        stage[s:s + block, mx:mx + w].astype(jnp.int32).astype(dtype)
        - dacc[s:s + block, mx:mx + w]
    )
    out_ref[0, :, mx:mx + w] = diff.astype(jnp.int32).astype(jnp.uint8)


def _morph_of(morph_impl: str):
    """Resolve a morph_impl name, rejecting typos (round-4 advisor: an
    unknown string used to silently select the row-run fallback, quietly
    losing the benched zonotope speedup).  Canonical names: 'zono' (the
    Minkowski-chain decomposition) and 'rowrun' (the per-run fallback)."""
    impls = {"zono": _morph_zono, "rowrun": _morph}
    if morph_impl not in impls:
        raise ValueError(
            f"unknown morph_impl {morph_impl!r}; expected one of "
            f"{sorted(impls)}")
    return impls[morph_impl]


def tophat_pallas2(img: jnp.ndarray, ksize: int, *, block: int | None = None,
                   interpret: bool = False,
                   morph_impl: str = "zono") -> jnp.ndarray:
    """White tophat with OpenCV's ksize x ksize elliptical SE.

    Bit-exact with ops.morphology.tophat_ellipse (uint8 in/out), computed
    VMEM-resident per row block.  Accepts (H, W) or a (T, H, W) batch —
    batching is a native grid dimension (Pallas ANY-space inputs do not
    vmap), so the chunk pipeline calls this on whole chunks.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    T, H, W = img.shape
    halo = 2 * (ksize // 2)
    if block is None:
        # Block-size study (scripts/mosaic_probe8.py, TPU v5 lite): the
        # kernel is a VPU sweep, linear in rows, so the only block-size
        # effect is halo redundancy (2*halo extra rows per block) vs VMEM
        # pressure.  k=29 measured best at H/3 (0.1457 ms vs 0.150 at H);
        # k=55's larger halo flips the trade to H/2 (0.2609 vs 0.2682).
        den = 2 if ksize >= 40 else 3
        block = _round_up(-(-H // den), 8)
    grid = -(-H // block)
    mv = _round_up(ksize // 2 + 1, 8)
    mx = 64
    cols = _round_up(W + 2 * mx, LANE)
    in_rows = _round_up(block + 2 * halo, 8)
    rows = in_rows + 2 * mv

    # Host-side pad: 255 (erode neutral) everywhere outside the image.
    hbuf = jnp.full((T, grid * block + (in_rows - block), cols), 255,
                    jnp.uint8)
    hbuf = jax.lax.dynamic_update_slice(hbuf, img, (0, halo, mx))

    dtype = jnp.bfloat16
    kernel = functools.partial(
        _tophat_kernel,
        ksize=int(ksize), block=int(block), halo=int(halo),
        mv=int(mv), mx=int(mx), h_img=int(H), w_img=int(W), cols=int(cols),
        dtype=dtype, morph=_morph_of(morph_impl),
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
            pltpu.VMEM((rows, cols), dtype),       # acc (eroded)
            pltpu.VMEM((rows, cols), dtype),       # dacc (opened)
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(hbuf)
    out = out[:, :H, mx:mx + W]
    return out[0] if squeeze else out


# ---------------------------------------------------------------------------
# Bilateral cross threshold
# ---------------------------------------------------------------------------


def _after_sums_h(base_read, work0, work1, acc, k, mx, w, row_lo, row_n, C):
    """Horizontal AFTER-sums: acc(y, x) = sum of the k elements strictly
    right of x, valid over rows [row_lo, row_lo + row_n) and the expanded
    column range [acl, acr).

    Uses the pow2 ping-pong aggregate with binary decomposition of k.
    The BEFORE-sum never needs computing: before(x) = after(x - k - 1),
    read later as a shifted slice of acc (base margins are 0, matching
    the reference's BORDER_CONSTANT zero padding, lane_tracker.py:73-76).
    """
    eg = 1 << max(k.bit_length() - 2, 0)  # largest growth shift
    acl = mx - k - 1
    assert acl >= eg - 1, (k, mx)
    # Simulate the decomposition to bound the largest read offset.
    max_off, off, g = 1, 1, 1
    rem_sim = k
    while rem_sim:
        if rem_sim & 1:
            max_off = max(max_off, off)
            off += g
        rem_sim >>= 1
        g *= 2
    acr = C - eg - max_off
    aw = acr - acl
    we = C - 2 * eg

    def sle(read, dx):
        return read(slice(row_lo, row_lo + row_n),
                    slice(eg + dx, eg + dx + we))

    def sla(read, dx):
        return read(slice(row_lo, row_lo + row_n),
                    slice(acl + dx, acl + dx + aw))

    reads = base_read
    ping = [work0, work1]
    pidx = 0
    glen = 1
    a_off = 1
    rem = k
    started = False
    while rem:
        if rem & 1:
            assert acl + a_off >= eg and acr + a_off <= C - eg
            term = sla(reads, a_off)
            rows = slice(row_lo, row_lo + row_n)
            if started:
                acc[rows, acl:acr] = acc[rows, acl:acr] + term
            else:
                acc[rows, acl:acr] = term
                started = True
            a_off += glen
        rem >>= 1
        if rem:
            dst = ping[pidx]
            dst[row_lo:row_lo + row_n, eg:eg + we] = (
                sle(reads, 0) + sle(reads, glen))
            reads = _read_of(dst)
            pidx ^= 1
            glen *= 2


@functools.lru_cache(maxsize=None)
def _v_after_schedule(k: int):
    """Static statement schedule for vertical AFTER-sums by pow2 doubling.

    Returns (levels, combines): ``levels`` is a list of (g, hi) growth
    statements building S_2g(y) = S_g(y) + S_g(y+g) over rows
    [row_lo, row_lo + row_n + hi); ``combines`` is a list of (g, a_off)
    terms with acc(y) += S_g(y + a_off) — the binary decomposition of
    sum_{d=1..k} x(y+d).  ``hi`` extents are computed backwards so every
    read lands on rows the producing level actually wrote (the largest
    base row touched is y + k, exactly the direct method's reach).
    """
    combines = []  # (g, a_off)
    grows = []  # g values grown (S_g -> S_2g)
    a_off, g, rem = 1, 1, k
    while rem:
        if rem & 1:
            combines.append((g, a_off))
            a_off += g
        rem >>= 1
        if rem:
            grows.append(g)
            g *= 2
    # Rows needed beyond row_lo for each aggregate level (exclusive).
    need = {}
    for g, off in combines:
        need[g] = max(need.get(g, 0), off)  # + row_n added by the kernel
    for g in reversed(grows):
        hi = need.get(2 * g, None)
        if hi is not None:
            need[g] = max(need.get(g, 0), hi + g)
    levels = [(g, need[2 * g]) for g in grows]
    return tuple(levels), tuple(combines)


def _after_sums_v(base_read, work0, work1, acc, k, cx, cw, row_lo, row_n):
    """Vertical AFTER-sums: acc(y, x) = sum of the k elements strictly
    below y (rows y+1..y+k), written over rows [row_lo, row_lo + row_n)
    and columns [cx, cx + cw).

    Sublane-axis mirror of _after_sums_h: pow2 ping-pong doubling plus
    binary decomposition of k — ~2*log2(k) statements instead of the k
    direct sublane reads of the naive accumulation (the VPU here is
    sweep-bound, so statement count IS the cost).  base_read must be
    valid (carrying the zero padding of the sum) over rows
    [row_lo + 1, row_lo + row_n + k) — the same reach as the direct
    method, guaranteed by the stage margins (mv >= k + 1).
    """
    levels, combines = _v_after_schedule(k)
    level_hi = dict(levels)
    comb_at = dict(combines)

    def rd(read, n, dy):
        return read(slice(row_lo + dy, row_lo + dy + n), slice(cx, cx + cw))

    # Interleave combines with growth (the ping-pong reuses buffers, so
    # only the CURRENT level is ever live — same discipline as the
    # horizontal version).
    reads = base_read
    ping = [work0, work1]
    pidx = 0
    g = 1
    started = False
    while True:
        if g in comb_at:
            term = rd(reads, row_n, comb_at[g])
            if started:
                acc[row_lo:row_lo + row_n, cx:cx + cw] = (
                    acc[row_lo:row_lo + row_n, cx:cx + cw] + term)
            else:
                acc[row_lo:row_lo + row_n, cx:cx + cw] = term
                started = True
        if g not in level_hi:
            break
        dst = ping[pidx]
        n = row_n + level_hi[g]
        dst[row_lo:row_lo + n, cx:cx + cw] = rd(reads, n, 0) + rd(reads, n, g)
        reads = _read_of(dst)
        pidx ^= 1
        g *= 2


@functools.lru_cache(maxsize=None)
def _h_after_band_np(cols: int, k: int):
    """(cols, cols) 0/1 band: column x of S @ B = sum of the k elements
    strictly right of x (the horizontal AFTER-sum, zero-padded borders
    via the staged margins)."""
    import numpy as np

    c = np.arange(cols)[:, None]
    x = np.arange(cols)[None, :]
    return ((c >= x + 1) & (c <= x + k)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _v_after_band_np(vm: int, vk: int, k: int):
    """(vm, vk) 0/1 band: row i of B @ S = sum of source rows i+1..i+k
    (the vertical AFTER-sum)."""
    import numpy as np

    i = np.arange(vm)[:, None]
    j = np.arange(vk)[None, :]
    return ((j - i >= 1) & (j - i <= k)).astype(np.float32)


def _threshold_kernel(
    in_hbm, uh_ref, vb_ref, out_ref, stage, sbf, fH, fV, sem,
    *, k, C, block, halo, mv, mx, w_img, cols, noise_thresh, vm, vk,
):
    """Bilateral cross threshold (mode='floor'); optionally the noise-mask
    'keep' output when noise_thresh >= 0 (lane_tracker.py:221-231).

    Both window-sum arms are MXU band matmuls against static 0/1 band
    matrices — probe6 measured in-kernel dots overlapping the VPU
    near-perfectly, and even standalone they beat the VPU pyramids (the
    VPU here is sweep-bound).  Exactness: operands are 0..255 integers
    (exact in bf16), band entries are 0/1, and f32 accumulation of <= k
    such terms is exact; the strict-< compares then run on exact f32
    integers.  before(y|x) = after(y-k-1 | x-k-1) as always.
    """
    tf = pl.program_id(0)  # frame within the batch
    i = pl.program_id(1)  # row block within the frame
    R = stage.shape[0]
    in_rows = R - 2 * mv
    w = w_img
    o_lo = mv + halo  # first output row in buffer coordinates
    a_lo = o_lo - k - 1  # first vertical-sum row (the before-read)

    cp = pltpu.make_async_copy(
        in_hbm.at[tf, pl.ds(i * block, in_rows), :],
        stage.at[mv:mv + in_rows, :],
        sem,
    )
    cp.start()
    stage[0:mv, :] = jnp.zeros((mv, cols), jnp.uint8)
    stage[mv + in_rows:, :] = jnp.zeros((mv, cols), jnp.uint8)
    cp.wait()

    # One bf16 staging sweep feeds both dot operands.
    sbf[:, :] = stage[:, :].astype(jnp.int32).astype(jnp.bfloat16)

    # Horizontal after-sums for the output rows: (block, cols) @ (cols,
    # cols); vertical after-sums for rows [a_lo, a_lo + vm): (vm, vk) @
    # (vk, cols).  Rows beyond the data are zeroed margins and the band
    # matrices are zero outside their reach, so padding contributes 0.
    fH[:, :] = jnp.dot(sbf[o_lo:o_lo + block, :], uh_ref[...],
                       preferred_element_type=jnp.float32)
    fV[:, :] = jnp.dot(vb_ref[...], sbf[a_lo:a_lo + vk, :],
                       preferred_element_type=jnp.float32)

    x = sbf[o_lo:o_lo + block, mx:mx + w].astype(jnp.float32)
    tt = jnp.float32(k) * x - jnp.float32(C * k)
    h_after = fH[:, mx:mx + w]
    h_before = fH[:, mx - k - 1:mx - k - 1 + w]
    v_after = fV[k + 1:k + 1 + block, mx:mx + w]
    v_before = fV[0:block, mx:mx + w]
    hit = (
        ((h_before < tt) & (h_after < tt))
        | ((v_before < tt) & (v_after < tt))
    )
    if noise_thresh >= 0:
        # keep = NOT inRange(x, noise_thresh, 255) OR bilateral hit.
        hit = (x < jnp.float32(noise_thresh)) | hit
    # Select in i32 then cast: Mosaic rejects u8 vector selects here.
    out_ref[0, :, mx:mx + w] = jnp.where(
        hit, jnp.int32(255), jnp.int32(0)).astype(jnp.uint8)


def bilateral_threshold_pallas2(
    img: jnp.ndarray,
    ksize: int,
    C: int,
    *,
    noise_thresh: int = -1,
    block: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bilateral cross threshold (mode='floor'), VMEM-resident per block.

    With ``noise_thresh >= 0`` returns the noise-mask 'keep' image instead:
    255 where the pixel is below noise_thresh OR passes the threshold
    (lane_tracker.py:221-231 with the inRange/logical_not folded in).
    Bit-exact with ops.threshold.bilateral_adaptive_threshold.
    Accepts (H, W) or a (T, H, W) batch (native grid batching).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    T, H, W = img.shape
    k = int(ksize)
    halo = k
    if block is None:
        block = _round_up(-(-H // 3), 8)
    grid = -(-H // block)
    mx = _round_up(k + 1, 64)
    cols = _round_up(W + 2 * mx, LANE)
    vm = _round_up(block + k + 1, 8)
    vk = _round_up(vm + k, LANE)
    # Margins: k+1 rows of zeros for the sums' zero padding, and enough
    # bottom slack that the vertical dot's (vk)-row operand read stays in
    # bounds: a_lo + vk <= rows  <=>  vk <= block + 2k + mv + 1.
    mv = _round_up(max(k + 1, vk - block - 2 * k - 1), 8)
    in_rows = _round_up(block + 2 * halo, 8)
    rows = in_rows + 2 * mv

    hbuf = jnp.zeros((T, grid * block + (in_rows - block), cols), jnp.uint8)
    hbuf = jax.lax.dynamic_update_slice(hbuf, img, (0, halo, mx))
    uh = jnp.asarray(_h_after_band_np(cols, k), jnp.bfloat16)
    vb = jnp.asarray(_v_after_band_np(vm, vk, k), jnp.bfloat16)

    kernel = functools.partial(
        _threshold_kernel,
        k=k, C=int(C), block=int(block), halo=int(halo),
        mv=int(mv), mx=int(mx), w_img=int(W), cols=int(cols),
        noise_thresh=int(noise_thresh), vm=int(vm), vk=int(vk),
    )
    out = pl.pallas_call(
        kernel,
        grid=(T, grid),
        out_shape=jax.ShapeDtypeStruct((T, grid * block, cols), jnp.uint8),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((cols, cols), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vm, vk), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, cols), lambda t, i: (t, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, cols), jnp.uint8),     # stage
            pltpu.VMEM((rows, cols), jnp.bfloat16),  # sbf (dot operand)
            pltpu.VMEM((block, cols), jnp.float32),  # fH (h after-sums)
            pltpu.VMEM((vm, cols), jnp.float32),     # fV (v after-sums)
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(hbuf, uh, vb)
    out = out[:, :H, mx:mx + W]
    return out[0] if squeeze else out


# ---------------------------------------------------------------------------
# Tophat with rider thresholds: independent-input MXU dots hidden under
# the VPU-bound morphology sweeps
# ---------------------------------------------------------------------------


def _tophat_riders_kernel(*refs, ksize, block, halo, mv, mx, h_img, w_img,
                          cols, dtype, riders, morph=_morph):
    """Tophat(ksize) of the primary input + one bilateral cross threshold
    per rider, in one kernel.

    Unlike the fused channel kernels (which recompute the tophat over the
    threshold's read reach and lose to halo redundancy — probe7), each
    rider reads an INDEPENDENT already-materialized input, so there is no
    recomputation: the rider's band-matmul window sums are issued before
    the tophat's VPU sweeps and the MXU works through them underneath
    (probe6: sweeps 0.052 + dots 0.025 -> 0.054 ms combined), leaving
    only the riders' staging casts and compares as added VPU work.
    """
    nr = len(riders)
    pos = 0
    in_hbm = refs[pos]
    pos += 1
    rider_ins = [refs[pos + 3 * j:pos + 3 * j + 3] for j in range(nr)]
    pos += 3 * nr
    out_t = refs[pos]
    pos += 1
    rider_outs = list(refs[pos:pos + nr])
    pos += nr
    stage, w0, w1, acc, dacc = refs[pos:pos + 5]
    pos += 5
    rider_scr = [refs[pos + 4 * j:pos + 4 * j + 4] for j in range(nr)]
    pos += 4 * nr
    sems = refs[pos]

    t = pl.program_id(0)
    i = pl.program_id(1)

    # ---- DMAs: primary (255 margins) + riders (zero margins) ----
    in_rows = stage.shape[0] - 2 * mv
    cps = []
    cp = pltpu.make_async_copy(
        in_hbm.at[t, pl.ds(i * block, in_rows), :],
        stage.at[mv:mv + in_rows, :], sems.at[0])
    cp.start()
    cps.append(cp)
    stage[0:mv, :] = jnp.full((mv, cols), 255, jnp.uint8)
    stage[mv + in_rows:, :] = jnp.full((mv, cols), 255, jnp.uint8)
    for j in range(nr):
        m = riders[j]
        r_stage = rider_scr[j][0]
        rin = r_stage.shape[0] - 2 * m["mv"]
        cp = pltpu.make_async_copy(
            rider_ins[j][0].at[t, pl.ds(i * block, rin), :],
            r_stage.at[m["mv"]:m["mv"] + rin, :], sems.at[j + 1])
        cp.start()
        cps.append(cp)
        r_stage[0:m["mv"], :] = jnp.zeros((m["mv"], m["cols"]), jnp.uint8)
        r_stage[m["mv"] + rin:, :] = jnp.zeros((m["mv"], m["cols"]),
                                               jnp.uint8)
    for cp in cps:
        cp.wait()

    # ---- rider staging casts + MXU band dots (issued FIRST so they
    # overlap the tophat sweeps below; see _threshold_kernel for the
    # window-sum semantics and the bf16/f32 exactness argument) ----
    for j in range(nr):
        m = riders[j]
        _, uh_ref, vb_ref = rider_ins[j]
        r_stage, sbf, fH, fV = rider_scr[j]
        sbf[:, :] = r_stage[:, :].astype(jnp.int32).astype(jnp.bfloat16)
        o_lo = m["mv"] + m["halo"]
        a_lo = o_lo - m["k"] - 1
        fH[:, :] = jnp.dot(sbf[o_lo:o_lo + block, :], uh_ref[...],
                           preferred_element_type=jnp.float32)
        fV[:, :] = jnp.dot(vb_ref[...], sbf[a_lo:a_lo + m["vk"], :],
                           preferred_element_type=jnp.float32)

    # ---- tophat of the primary input (identical to _tophat_kernel) ----
    w = w_img

    def base_read(rs, cs):
        return stage[rs, cs].astype(jnp.int32).astype(dtype)

    r = ksize // 2
    e_lo, e_n = mv + r, block + 2 * r
    morph(base_read, w0, w1, acc, ksize, jnp.minimum, 255,
          mx, w, e_lo, e_n, mv, in_rows)
    shape = (e_n, stage.shape[1])
    rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    grow = rows_i + e_lo - mv + i * block - halo
    in_img = (
        (grow >= 0) & (grow < h_img) & (cols_i >= mx) & (cols_i < mx + w_img)
    )
    acc[e_lo:e_lo + e_n, :] = jnp.where(
        in_img, acc[e_lo:e_lo + e_n, :], jnp.asarray(0, dtype))
    morph(_read_of(acc), w0, w1, dacc, ksize, jnp.maximum, 0,
          mx, w, mv + 2 * r, block, e_lo, e_n)
    s = mv + halo
    diff = (
        stage[s:s + block, mx:mx + w].astype(jnp.int32).astype(dtype)
        - dacc[s:s + block, mx:mx + w]
    )
    out_t[0, :, mx:mx + w] = diff.astype(jnp.int32).astype(jnp.uint8)

    # ---- rider compares (the dots have long since drained) ----
    for j in range(nr):
        m = riders[j]
        _, sbf, fH, fV = rider_scr[j]
        k, mxj = m["k"], m["mx"]
        o_lo = m["mv"] + m["halo"]
        x = sbf[o_lo:o_lo + block, mxj:mxj + w_img].astype(jnp.float32)
        tt = jnp.float32(k) * x - jnp.float32(m["C"] * k)
        hit = (
            ((fH[:, mxj - k - 1:mxj - k - 1 + w_img] < tt)
             & (fH[:, mxj:mxj + w_img] < tt))
            | ((fV[0:block, mxj:mxj + w_img] < tt)
               & (fV[k + 1:k + 1 + block, mxj:mxj + w_img] < tt))
        )
        if m["noise_thresh"] >= 0:
            hit = (x < jnp.float32(m["noise_thresh"])) | hit
        rider_outs[j][0, :, mxj:mxj + w_img] = jnp.where(
            hit, jnp.int32(255), jnp.int32(0)).astype(jnp.uint8)


def tophat_riders_pallas2(img, ksize, riders, *, block: int | None = None,
                          interpret: bool = False, morph_impl: str = "zono"):
    """White tophat(ksize) of ``img`` plus one bilateral cross threshold
    per rider, fused so the riders' MXU work hides under the tophat's
    VPU sweeps.

    ``riders`` is a sequence of ``(src, k, C, noise_thresh)``: each
    computes ``bilateral_threshold_pallas2(src, k, C, noise_thresh=...)``
    on an independent, already-materialized image of the same shape
    (noise_thresh=-1 for the plain threshold).  Returns
    ``(tophat(img), thr(src_0), ..., thr(src_{n-1}))`` — each bit-exact
    with the corresponding standalone kernel.  Accepts (H, W) or
    (T, H, W).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
        riders = [(s[None], k, C, nt) for (s, k, C, nt) in riders]
    T, H, W = img.shape
    ksize = int(ksize)
    halo = 2 * (ksize // 2)
    if block is None:
        den = 2 if ksize >= 40 else 3
        block = _round_up(-(-H // den), 8)
    grid = -(-H // block)
    mv = _round_up(ksize // 2 + 1, 8)
    mx = 64
    cols = _round_up(W + 2 * mx, LANE)
    in_rows = _round_up(block + 2 * halo, 8)
    rows = in_rows + 2 * mv

    hbuf = jnp.full((T, grid * block + (in_rows - block), cols), 255,
                    jnp.uint8)
    hbuf = jax.lax.dynamic_update_slice(hbuf, img, (0, halo, mx))

    dtype = jnp.bfloat16
    ins = [hbuf]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    scratch = [
        pltpu.VMEM((rows, cols), jnp.uint8),   # stage
        pltpu.VMEM((rows, cols), dtype),       # w0
        pltpu.VMEM((rows, cols), dtype),       # w1
        pltpu.VMEM((rows, cols), dtype),       # acc
        pltpu.VMEM((rows, cols), dtype),       # dacc
    ]
    rider_scratch = []
    riders_meta = []
    out_shape = [jax.ShapeDtypeStruct((T, grid * block, cols), jnp.uint8)]
    out_specs = [pl.BlockSpec((1, block, cols), lambda t, i: (t, i, 0),
                              memory_space=pltpu.VMEM)]
    for (src, k, C, nthr) in riders:
        k = int(k)
        halo_j = k
        mx_j = _round_up(k + 1, 64)
        cols_j = _round_up(W + 2 * mx_j, LANE)
        vm_j = _round_up(block + k + 1, 8)
        vk_j = _round_up(vm_j + k, LANE)
        mv_j = _round_up(max(k + 1, vk_j - block - 2 * k - 1), 8)
        in_rows_j = _round_up(block + 2 * halo_j, 8)
        rows_j = in_rows_j + 2 * mv_j
        hb = jnp.zeros((T, grid * block + (in_rows_j - block), cols_j),
                       jnp.uint8)
        hb = jax.lax.dynamic_update_slice(hb, src, (0, halo_j, mx_j))
        uh = jnp.asarray(_h_after_band_np(cols_j, k), jnp.bfloat16)
        vb = jnp.asarray(_v_after_band_np(vm_j, vk_j, k), jnp.bfloat16)
        ins += [hb, uh, vb]
        cj, vmj, vkj = int(cols_j), int(vm_j), int(vk_j)
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((cj, cj), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vmj, vkj), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        riders_meta.append(dict(
            k=k, C=int(C), noise_thresh=int(nthr), halo=int(halo_j),
            mx=int(mx_j), cols=cj, vm=vmj, vk=vkj, mv=int(mv_j),
        ))
        rider_scratch += [
            pltpu.VMEM((rows_j, cols_j), jnp.uint8),     # r_stage
            pltpu.VMEM((rows_j, cols_j), jnp.bfloat16),  # sbf
            pltpu.VMEM((block, cols_j), jnp.float32),    # fH
            pltpu.VMEM((vm_j, cols_j), jnp.float32),     # fV
        ]
        out_shape.append(
            jax.ShapeDtypeStruct((T, grid * block, cols_j), jnp.uint8))
        out_specs.append(
            pl.BlockSpec((1, block, cj), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _tophat_riders_kernel,
        ksize=ksize, block=int(block), halo=int(halo), mv=int(mv),
        mx=int(mx), h_img=int(H), w_img=int(W), cols=int(cols),
        dtype=dtype, riders=tuple(riders_meta),
        morph=_morph_of(morph_impl),
    )
    outs = pl.pallas_call(
        kernel,
        grid=(T, grid),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch + rider_scratch + [
            pltpu.SemaphoreType.DMA((1 + len(riders_meta),)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*ins)
    res = [outs[0][:, :H, mx:mx + W]]
    for m, o in zip(riders_meta, outs[1:]):
        res.append(o[:, :H, m["mx"]:m["mx"] + W])
    if squeeze:
        res = [o[0] for o in res]
    return tuple(res)


# ---------------------------------------------------------------------------
# Full bilateral filter stage assembled from the stage kernels
# ---------------------------------------------------------------------------


def filter_stage_v2(
    rgb_r: jnp.ndarray,
    lab_b: jnp.ndarray,
    ksize_r: int = 25,
    C_r: int = 8,
    ksize_b: int = 35,
    C_b: int = 5,
    mask_noise: bool = False,
    ksize_noise: int = 65,
    C_noise: int = 10,
    noise_thresh: int = 135,
    emit_prefixes: bool = False,
    interpret: bool = False,
    tophat_r: int = 29,
    tophat_b: int = 55,
    open_k: int = 5,
):
    """Bilateral-mode filter stage via the fused channel kernels.

    Same contract as ops.filters.filter_lane_points_channels with
    filter_type='bilateral' (lane_tracker.py:183-240): tophats, cross
    thresholds, optional noise mask, then the fused merge + 5x5 open
    (which with ``emit_prefixes`` also returns the packed row prefixes).

    Stage granularity is probe-driven (scripts/mosaic_probe7/8.py): the
    fused tophat+threshold channel kernels (channel_stage_pallas2 /
    channel_stage_pyr_pallas2) measured at or below parity with this
    unfused chain at every block size — the matmul variant because its
    vertical band matmul's dense K grows with the block, the full-height
    variants because bigger blocks trade away cross-grid DMA overlap —
    so the unfused stage kernels remain the production path.
    """
    r_feat = tophat_pallas2(rgb_r, tophat_r, interpret=interpret)
    # The R threshold (and the noise keep-mask) ride inside the
    # VPU-bound tophat55 kernel: their inputs are already materialized,
    # so their MXU band dots hide under the morphology sweeps (probe9:
    # 0.3227 ms fused vs 0.372 unfused at T=128, bit-exact on hardware).
    riders = [(r_feat, ksize_r, C_r, -1)]
    if mask_noise:
        riders.append((lab_b, ksize_noise, C_noise, noise_thresh))
    outs = tophat_riders_pallas2(lab_b, tophat_b, riders,
                                 interpret=interpret)
    b_feat, r_th = outs[0], outs[1]
    keep = outs[2] if mask_noise else None
    if ksize_b + 1 <= 64:
        # The B threshold fuses into the merge+open kernel (its band
        # dots overlap the r&keep pre-merge; no th_b HBM round trip).
        return thr_merge_open_pallas2(r_th, b_feat, ksize_b, C_b, keep,
                                      emit_prefixes=emit_prefixes,
                                      interpret=interpret, open_k=open_k)
    b_th = bilateral_threshold_pallas2(
        b_feat, ksize_b, C_b, interpret=interpret)
    return merge_open_pallas2(r_th, b_th, keep,
                              emit_prefixes=emit_prefixes,
                              interpret=interpret, open_k=open_k)


def _merge_open_kernel(
    r_hbm, b_hbm, k_hbm, out_ref, sr, sb, sk, w0, w1, acc, dacc, sem3,
    *, block, halo, mv, mx, h_img, w_img, cols, has_keep, dtype,
    morph=None, tri_ref=None, pref_ref=None, kp=0, shift=0, open_k=5,
):
    morph = morph or _morph
    tf = pl.program_id(0)
    i = pl.program_id(1)
    in_rows = sr.shape[0] - 2 * mv
    w = w_img

    cps = []
    stages = [(r_hbm, sr), (b_hbm, sb)] + ([(k_hbm, sk)] if has_keep else [])
    for j, (hbm, scr) in enumerate(stages):
        cp = pltpu.make_async_copy(
            hbm.at[tf, pl.ds(i * block, in_rows), :],
            scr.at[mv:mv + in_rows, :],
            sem3.at[j],
        )
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    # Merge: (r | b) & keep — on {0, 255} binaries these are max and min,
    # which bf16 evaluates exactly (no bitwise ops on floats).
    # Out-of-image positions are 255 from the host pad (erode neutral).
    rows = slice(0, sr.shape[0])
    rv = sr[rows, :].astype(jnp.int32).astype(dtype)
    bv = sb[rows, :].astype(jnp.int32).astype(dtype)
    m = jnp.maximum(rv, bv)
    if has_keep:
        m = jnp.minimum(m, sk[rows, :].astype(jnp.int32).astype(dtype))
    dacc[rows, :] = m  # dacc temporarily holds the merged binary

    r = open_k // 2  # opening-SE radius (5x5 in the reference)
    e_lo, e_n = mv + r, block + 2 * r
    morph(_read_of(dacc), w0, w1, acc, open_k, jnp.minimum, 255,
          mx, w, e_lo, e_n, mv, in_rows)

    shape = (e_n, sr.shape[1])
    rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    grow = rows_i + e_lo - mv + i * block - halo
    in_img = (
        (grow >= 0) & (grow < h_img) & (cols_i >= mx) & (cols_i < mx + w_img)
    )
    acc[e_lo:e_lo + e_n, :] = jnp.where(
        in_img, acc[e_lo:e_lo + e_n, :], jnp.asarray(0, dtype))

    morph(_read_of(acc), w0, w1, dacc, open_k, jnp.maximum, 0,
          mx, w, mv + 2 * r, block, e_lo, e_n)

    s = mv + 2 * r
    out_ref[0, :, mx:mx + w] = (
        dacc[s:s + block, mx:mx + w].astype(jnp.int32).astype(jnp.uint8))

    if pref_ref is not None:
        # Packed row prefixes (ops/integrals.py layout) as three MXU dots
        # against a zero-padded triangular matrix.  probe6 measured the
        # MXU overlapping VPU sweeps in-kernel (sweeps 0.052 + dots 0.025
        # -> 0.054 ms combined), so these ride the VPU-bound open for
        # ~free where the standalone XLA matmul pass cost 0.094 ms/frame.
        # Columns beyond the image hold finite merged values (never
        # dilate-written garbage) and tri's rows >= w_img are zero, so
        # they contribute exactly 0.
        binb = jnp.minimum(dacc[s:s + block, mx:mx + kp],
                           jnp.asarray(1, dtype))
        xs = jax.lax.broadcasted_iota(jnp.int32, (block, kp), 1)
        hi = (xs >> 8).astype(dtype)
        lo = (xs & 0xFF).astype(dtype)
        tri = tri_ref[...]
        p0 = jnp.dot(binb, tri, preferred_element_type=jnp.float32)
        ph = jnp.dot(binb * hi, tri, preferred_element_type=jnp.float32)
        plo = jnp.dot(binb * lo, tri, preferred_element_type=jnp.float32)
        packed = (
            ((ph.astype(jnp.int32) << 8) + plo.astype(jnp.int32)) << shift
        ) | p0.astype(jnp.int32)
        pref_ref[0, :, :] = packed


def _merge_open_pref_kernel(r_hbm, b_hbm, k_hbm, tri_ref, out_ref, pref_ref,
                            sr, sb, sk, w0, w1, acc, dacc, sem3, **kw):
    _merge_open_kernel(
        r_hbm, b_hbm, k_hbm, out_ref, sr, sb, sk, w0, w1, acc, dacc, sem3,
        tri_ref=tri_ref, pref_ref=pref_ref, **kw)


@functools.lru_cache(maxsize=4)
def _tri_pad_np(w_img: int, kp: int):
    """Zero-padded strictly-lower-triangular ones (kp, kp): rows >= w_img
    and columns > w_img are zero (the prefix is only defined at the
    image's W+1 boundary positions)."""
    import numpy as np

    xs = np.arange(kp)[:, None]
    Xs = np.arange(kp)[None, :]
    t = (xs < Xs) & (xs < w_img) & (Xs <= w_img)
    return t.astype(np.float32)


def merge_open_pallas2(r_th, b_th, keep=None, *, block: int | None = None,
                       emit_prefixes: bool = False,
                       interpret: bool = False,
                       morph_impl: str = "rowrun",
                       open_k: int = 5):
    """Channel merge (+ optional noise keep-mask AND) followed by the 5x5
    elliptical open (lane_tracker.py:234-238), fused in one kernel.

    Accepts (H, W) or (T, H, W); bit-exact with
    ``open_ellipse((r|b)&keep, 5)``.  With ``emit_prefixes`` also returns
    the packed row prefixes of the result (ops/integrals.py layout, (...,
    H, W+1) int32) computed by in-kernel MXU dots that overlap the
    VPU-bound open (probe6) — replacing the 0.094 ms standalone matmul.
    """
    from lane_tracker_tpu.ops.integrals import RowPrefixes, _count_shift

    squeeze = r_th.ndim == 2
    if squeeze:
        r_th = r_th[None]
        b_th = b_th[None]
        keep = keep[None] if keep is not None else None
    T, H, W = r_th.shape
    halo = 2 * (open_k // 2)
    if block is None:
        block = _round_up(-(-H // 3), 8)
    grid = -(-H // block)
    mv = 16
    mx = 64
    cols = _round_up(W + 2 * mx, LANE)
    in_rows = _round_up(block + 2 * halo, 8)
    rows = in_rows + 2 * mv
    has_keep = keep is not None
    kp = _round_up(W + 1, LANE)
    if emit_prefixes and mx + kp > cols:
        # The dot operand is read from dacc at [mx, mx + kp); widen the
        # column padding when the image is too narrow to cover it.
        cols = _round_up(mx + kp, LANE)

    def pad(x, fill):
        buf = jnp.full((T, grid * block + (in_rows - block), cols), fill,
                       jnp.uint8)
        return jax.lax.dynamic_update_slice(buf, x, (0, halo, mx))

    # Out-of-image merge must read 255 (erode neutral): pad r and keep
    # with 255 so (r | b) & keep = 255 there.
    ins = [pad(r_th, 255), pad(b_th, 0),
           pad(keep, 255) if has_keep else pad(r_th, 0)]

    dtype = jnp.bfloat16
    static = dict(
        block=int(block), halo=int(halo), mv=int(mv), mx=int(mx),
        h_img=int(H), w_img=int(W), cols=int(cols), has_keep=has_keep,
        dtype=dtype, morph=_morph_of(morph_impl), open_k=int(open_k),
    )
    scratch = [
        pltpu.VMEM((rows, cols), jnp.uint8),   # sr
        pltpu.VMEM((rows, cols), jnp.uint8),   # sb
        pltpu.VMEM((rows, cols), jnp.uint8),   # sk
        pltpu.VMEM((rows, cols), dtype),       # w0
        pltpu.VMEM((rows, cols), dtype),       # w1
        pltpu.VMEM((rows, cols), dtype),       # acc
        pltpu.VMEM((rows, cols), dtype),       # dacc
        pltpu.SemaphoreType.DMA((3,)),
    ]
    params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024,
        dimension_semantics=("arbitrary", "arbitrary"),
    )
    if not emit_prefixes:
        out = pl.pallas_call(
            functools.partial(_merge_open_kernel, **static),
            grid=(T, grid),
            out_shape=jax.ShapeDtypeStruct((T, grid * block, cols),
                                           jnp.uint8),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=pl.BlockSpec((1, block, cols), lambda t, i: (t, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
        )(*ins)
        out = out[:, :H, mx:mx + W]
        return out[0] if squeeze else out

    shift = _count_shift(W)
    tri = jnp.asarray(_tri_pad_np(W, kp), jnp.bfloat16)
    out, pref = pl.pallas_call(
        functools.partial(_merge_open_pref_kernel, **static,
                          kp=int(kp), shift=int(shift)),
        grid=(T, grid),
        out_shape=(
            jax.ShapeDtypeStruct((T, grid * block, cols), jnp.uint8),
            jax.ShapeDtypeStruct((T, grid * block, kp), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3 + [
            pl.BlockSpec((kp, kp), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block, cols), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, kp), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(*ins, tri)
    out = out[:, :H, mx:mx + W]
    prefixes = RowPrefixes(packed=pref[:, :H, :W + 1])
    if squeeze:
        return out[0], RowPrefixes(packed=prefixes.packed[0])
    return out, prefixes


def _thr_merge_open_kernel(
    r_hbm, b_hbm, k_hbm, uh_ref, vb_ref, out_ref, sr, sk, bst, sbf, fH, fV,
    w0, w1, acc, dacc, sem3,
    *, block, halo, mv, mx, h_img, w_img, cols, has_keep, dtype,
    kb, Cb, n_out, mv_j, vk_j,
    morph=None, tri_ref=None, pref_ref=None, kp=0, shift=0, open_k=5,
):
    morph = morph or _morph
    """Merge+open with the B threshold computed IN-kernel from the tophat
    image: thr(kb, Cb) of b_hbm -> merged with r/keep -> 5x5 open
    [-> packed prefixes].

    The threshold's band dots are issued first and the r&keep pre-merge
    sweeps run underneath them (min distributes over max on the {0,255}
    lattice: (r|b)&k == (r&k)|(b&k)), so the serial cost of the fused
    threshold is just its compare.  Saves the standalone thr kernel's
    DMA + staging + launch and the th_b HBM round trip.
    """
    tf = pl.program_id(0)
    i = pl.program_id(1)
    in_rows = sr.shape[0] - 2 * mv
    w = w_img

    # ---- DMAs: r/keep at merge geometry, b tophat at thr geometry ----
    cps = []
    cp = pltpu.make_async_copy(
        r_hbm.at[tf, pl.ds(i * block, in_rows), :],
        sr.at[mv:mv + in_rows, :], sem3.at[0])
    cp.start()
    cps.append(cp)
    in_rows_j = bst.shape[0] - 2 * mv_j
    cp = pltpu.make_async_copy(
        b_hbm.at[tf, pl.ds(i * block, in_rows_j), :],
        bst.at[mv_j:mv_j + in_rows_j, :], sem3.at[1])
    cp.start()
    cps.append(cp)
    if has_keep:
        cp = pltpu.make_async_copy(
            k_hbm.at[tf, pl.ds(i * block, in_rows), :],
            sk.at[mv:mv + in_rows, :], sem3.at[2])
        cp.start()
        cps.append(cp)
    bst[0:mv_j, :] = jnp.zeros((mv_j, cols), jnp.uint8)
    bst[mv_j + in_rows_j:, :] = jnp.zeros((mv_j, cols), jnp.uint8)
    for cp in cps:
        cp.wait()

    # ---- B threshold staging + MXU band dots (issued first) ----
    sbf[:, :] = bst[:, :].astype(jnp.int32).astype(jnp.bfloat16)
    o_lo_j = mv_j + kb  # first output row (= global i*block - halo)
    a_lo_j = mv_j - 1
    fH[:, :] = jnp.dot(sbf[o_lo_j:o_lo_j + n_out, :], uh_ref[...],
                       preferred_element_type=jnp.float32)
    fV[:, :] = jnp.dot(vb_ref[...], sbf[a_lo_j:a_lo_j + vk_j, :],
                       preferred_element_type=jnp.float32)

    # ---- r & keep pre-merge (VPU, overlaps the dots) ----
    rows = slice(mv, mv + in_rows)
    rk = sr[rows, :].astype(jnp.int32).astype(dtype)
    if has_keep:
        rk = jnp.minimum(rk, sk[rows, :].astype(jnp.int32).astype(dtype))
    dacc[rows, :] = rk

    # ---- B compare + final merge over the image columns ----
    x = sbf[o_lo_j:o_lo_j + n_out, mx:mx + w].astype(jnp.float32)
    tt = jnp.float32(kb) * x - jnp.float32(Cb * kb)
    hit = (
        ((fH[:, mx - kb - 1:mx - kb - 1 + w] < tt) & (fH[:, mx:mx + w] < tt))
        | ((fV[0:n_out, mx:mx + w] < tt)
           & (fV[kb + 1:kb + 1 + n_out, mx:mx + w] < tt))
    )
    # Select in i32 (mask layout (8,128)) and cast after: a bf16 select
    # target forces an i1 relayout to (16,128) that Mosaic rejects
    # ("Invalid relayout ... replicated in destination but not source").
    bv = jnp.where(hit, jnp.int32(255), jnp.int32(0)).astype(dtype)
    if has_keep:
        bv = jnp.minimum(
            bv, sk[mv:mv + n_out, mx:mx + w].astype(jnp.int32).astype(dtype))
    dacc[mv:mv + n_out, mx:mx + w] = jnp.maximum(
        dacc[mv:mv + n_out, mx:mx + w], bv)

    # ---- elliptical open of the merged binary (as merge_open) ----
    r = open_k // 2
    e_lo, e_n = mv + r, block + 2 * r
    morph(_read_of(dacc), w0, w1, acc, open_k, jnp.minimum, 255,
          mx, w, e_lo, e_n, mv, in_rows)
    shape = (e_n, sr.shape[1])
    rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    grow = rows_i + e_lo - mv + i * block - halo
    in_img = (
        (grow >= 0) & (grow < h_img) & (cols_i >= mx) & (cols_i < mx + w_img)
    )
    acc[e_lo:e_lo + e_n, :] = jnp.where(
        in_img, acc[e_lo:e_lo + e_n, :], jnp.asarray(0, dtype))
    morph(_read_of(acc), w0, w1, dacc, open_k, jnp.maximum, 0,
          mx, w, mv + 2 * r, block, e_lo, e_n)
    s = mv + 2 * r
    out_ref[0, :, mx:mx + w] = (
        dacc[s:s + block, mx:mx + w].astype(jnp.int32).astype(jnp.uint8))

    if pref_ref is not None:
        binb = jnp.minimum(dacc[s:s + block, mx:mx + kp],
                           jnp.asarray(1, dtype))
        xs = jax.lax.broadcasted_iota(jnp.int32, (block, kp), 1)
        hi = (xs >> 8).astype(dtype)
        lo = (xs & 0xFF).astype(dtype)
        tri = tri_ref[...]
        p0 = jnp.dot(binb, tri, preferred_element_type=jnp.float32)
        ph = jnp.dot(binb * hi, tri, preferred_element_type=jnp.float32)
        plo = jnp.dot(binb * lo, tri, preferred_element_type=jnp.float32)
        packed = (
            ((ph.astype(jnp.int32) << 8) + plo.astype(jnp.int32)) << shift
        ) | p0.astype(jnp.int32)
        pref_ref[0, :, :] = packed


def _thr_merge_open_pref_kernel(r_hbm, b_hbm, k_hbm, uh_ref, vb_ref, tri_ref,
                                out_ref, pref_ref, *scratch, **kw):
    _thr_merge_open_kernel(
        r_hbm, b_hbm, k_hbm, uh_ref, vb_ref, out_ref, *scratch,
        tri_ref=tri_ref, pref_ref=pref_ref, **kw)


def thr_merge_open_pallas2(r_th, b_feat, kb, Cb, keep=None, *,
                           block: int | None = None,
                           emit_prefixes: bool = False,
                           interpret: bool = False,
                           morph_impl: str = "rowrun",
                           open_k: int = 5):
    """merge_open_pallas2 with the B threshold fused in: takes the B
    TOPHAT image and computes ``bilateral_threshold_pallas2(b_feat, kb,
    Cb)`` in-kernel before the merge — bit-exact with the unfused pair,
    one fewer kernel and no th_b HBM round trip.  Requires kb + 1 <= 64
    (the merge's column margin); callers fall back to the unfused chain
    otherwise.
    """
    from lane_tracker_tpu.ops.integrals import RowPrefixes, _count_shift

    kb = int(kb)
    assert kb + 1 <= 64, kb
    squeeze = r_th.ndim == 2
    if squeeze:
        r_th = r_th[None]
        b_feat = b_feat[None]
        keep = keep[None] if keep is not None else None
    T, H, W = r_th.shape
    halo = 2 * (open_k // 2)
    if block is None:
        block = _round_up(-(-H // 3), 8)
    grid = -(-H // block)
    mv = 16
    mx = 64
    cols = _round_up(W + 2 * mx, LANE)
    in_rows = _round_up(block + 2 * halo, 8)
    has_keep = keep is not None
    kp = _round_up(W + 1, LANE)
    if emit_prefixes and mx + kp > cols:
        cols = _round_up(mx + kp, LANE)
    rows = in_rows + 2 * mv

    # Threshold sub-geometry: output extended by ext=halo rows each side
    # so the merged binary covers the open's full read reach (out-of-image
    # threshold rows evaluate to 0 on the zero-padded tophat, exactly the
    # pad(b_th, 0) of the unfused kernel).
    n_out = in_rows  # == block + 2*halo (block is 8-aligned)
    halo_j = kb + halo
    in_rows_j = _round_up(n_out + 2 * kb, 8)
    vm_j = _round_up(n_out + kb + 1, 8)
    vk_j = _round_up(vm_j + kb, LANE)
    mv_j = _round_up(max(kb + 1, vk_j - n_out - 2 * kb - 1), 8)
    rows_j = in_rows_j + 2 * mv_j

    def pad(x, fill):
        buf = jnp.full((T, grid * block + (in_rows - block), cols), fill,
                       jnp.uint8)
        return jax.lax.dynamic_update_slice(buf, x, (0, halo, mx))

    bbuf = jnp.zeros((T, grid * block + (in_rows_j - block), cols),
                     jnp.uint8)
    bbuf = jax.lax.dynamic_update_slice(bbuf, b_feat, (0, halo_j, mx))
    ins = [pad(r_th, 255), bbuf,
           pad(keep, 255) if has_keep else pad(r_th, 0)]
    uh = jnp.asarray(_h_after_band_np(cols, kb), jnp.bfloat16)
    vb = jnp.asarray(_v_after_band_np(vm_j, vk_j, kb), jnp.bfloat16)

    dtype = jnp.bfloat16
    static = dict(
        block=int(block), halo=int(halo), mv=int(mv), mx=int(mx),
        h_img=int(H), w_img=int(W), cols=int(cols), has_keep=has_keep,
        dtype=dtype, kb=kb, Cb=int(Cb), n_out=int(n_out), mv_j=int(mv_j),
        vk_j=int(vk_j),
        morph=_morph_of(morph_impl), open_k=int(open_k),
    )
    scratch = [
        pltpu.VMEM((rows, cols), jnp.uint8),     # sr
        pltpu.VMEM((rows, cols), jnp.uint8),     # sk
        pltpu.VMEM((rows_j, cols), jnp.uint8),   # bst (tophat staging)
        pltpu.VMEM((rows_j, cols), jnp.bfloat16),  # sbf
        pltpu.VMEM((n_out, cols), jnp.float32),  # fH
        pltpu.VMEM((vm_j, cols), jnp.float32),   # fV
        pltpu.VMEM((rows, cols), dtype),         # w0
        pltpu.VMEM((rows, cols), dtype),         # w1
        pltpu.VMEM((rows, cols), dtype),         # acc
        pltpu.VMEM((rows, cols), dtype),         # dacc
        pltpu.SemaphoreType.DMA((3,)),
    ]
    params = pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024,
        dimension_semantics=("arbitrary", "arbitrary"),
    )
    band_specs = [
        pl.BlockSpec((cols, cols), lambda t, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((vm_j, vk_j), lambda t, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if not emit_prefixes:
        out = pl.pallas_call(
            functools.partial(_thr_merge_open_kernel, **static),
            grid=(T, grid),
            out_shape=jax.ShapeDtypeStruct((T, grid * block, cols),
                                           jnp.uint8),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3 + band_specs,
            out_specs=pl.BlockSpec((1, block, cols), lambda t, i: (t, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
        )(*ins, uh, vb)
        out = out[:, :H, mx:mx + W]
        return out[0] if squeeze else out

    shift = _count_shift(W)
    tri = jnp.asarray(_tri_pad_np(W, kp), jnp.bfloat16)
    out, pref = pl.pallas_call(
        functools.partial(_thr_merge_open_pref_kernel, **static,
                          kp=int(kp), shift=int(shift)),
        grid=(T, grid),
        out_shape=(
            jax.ShapeDtypeStruct((T, grid * block, cols), jnp.uint8),
            jax.ShapeDtypeStruct((T, grid * block, kp), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3 + band_specs + [
            pl.BlockSpec((kp, kp), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block, cols), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, kp), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(*ins, uh, vb, tri)
    out = out[:, :H, mx:mx + W]
    prefixes = RowPrefixes(packed=pref[:, :H, :W + 1])
    if squeeze:
        return out[0], RowPrefixes(packed=prefixes.packed[0])
    return out, prefixes


@functools.lru_cache(maxsize=None)
def _h_box_band_np(cols: int, k: int):
    """(cols, cols) 0/1 band: centered k-window column sums."""
    import numpy as np

    r = k // 2
    c = np.arange(cols)[:, None]
    x = np.arange(cols)[None, :]
    return (np.abs(c - x) <= r).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _v_box_band_np(vm: int, hk: int, k: int):
    """(vm, hk) 0/1 band: row t sums source rows t..t+2r (the centered
    vertical window over an h-sum plane whose row 0 is output row -r)."""
    import numpy as np

    r = k // 2
    t = np.arange(vm)[:, None]
    j = np.arange(hk)[None, :]
    return ((j >= t) & (j <= t + 2 * r)).astype(np.float32)


def _adaptive_mean_kernel(
    in_hbm, uc_ref, vc_ref, out_ref, stage, sbf, fH, sem,
    *, k, idelta, block, halo, mv, mx, w_img, cols, hm, hk,
):
    """cv2.adaptiveThreshold MEAN_C/BINARY (ops/threshold.py semantics).

    k is odd, so the window area k*k is odd and OpenCV's round-half-even
    box mean equals round-half-up — the threshold compare then needs no
    division: mean < img + idelta  <=>  2*boxsum + A < 2*A*(img + idelta).
    Both separable box passes are MXU band matmuls (see _threshold_kernel
    for the exactness argument); border is REPLICATE via the host-side
    edge pad.
    """
    tf = pl.program_id(0)
    i = pl.program_id(1)
    R = stage.shape[0]
    in_rows = R - 2 * mv
    w = w_img
    r = k // 2
    o_lo = mv + halo          # first output row (buffer coords)

    cp = pltpu.make_async_copy(
        in_hbm.at[tf, pl.ds(i * block, in_rows), :],
        stage.at[mv:mv + in_rows, :],
        sem,
    )
    cp.start()
    stage[0:mv, :] = jnp.zeros((mv, cols), jnp.uint8)
    stage[mv + in_rows:, :] = jnp.zeros((mv, cols), jnp.uint8)
    cp.wait()

    sbf[:, :] = stage[:, :].astype(jnp.int32).astype(jnp.bfloat16)

    # Horizontal centered window sums for rows [o_lo - r, o_lo - r + hm);
    # zero the [hm, hk) tail so the vertical dot's padded K reads stay
    # finite (vc's columns there are zero, but 0 * NaN would poison f32).
    fH[0:hm, :] = jnp.dot(sbf[o_lo - r:o_lo - r + hm, :], uc_ref[...],
                          preferred_element_type=jnp.float32)
    if hk > hm:
        fH[hm:, :] = jnp.zeros((hk - hm, cols), jnp.float32)
    # bf16 cast of the h sums: values <= 35*255 = 8925 exceed bf16's
    # exact-integer range, so the vertical pass must dot f32 h-sums...
    # which Mosaic's MXU cannot take as bf16xbf16.  Instead feed the
    # ORIGINAL columns through the vertical band first?  No: box sums are
    # separable in either order — do the vertical pass on sbf directly,
    # then the horizontal band on that result would need the same f32
    # issue.  Resolution: split the h-sums into high/low bytes, two bf16
    # dots, recombined after the vertical pass (exact: both planes'
    # vertical sums are < 2^24).
    hi = jnp.floor(fH[:, :] * jnp.float32(1.0 / 256.0))
    lo = fH[:, :] - hi * jnp.float32(256.0)
    vhi = jnp.dot(vc_ref[...], hi.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    vlo = jnp.dot(vc_ref[...], lo.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    box = vhi * jnp.float32(256.0) + vlo

    area = k * k
    x = sbf[o_lo:o_lo + block, mx:mx + w].astype(jnp.float32)
    s2 = 2.0 * box[:, mx:mx + w] + jnp.float32(area)
    hit = s2 < jnp.float32(2 * area) * (x + jnp.float32(idelta))
    out_ref[0, :, mx:mx + w] = jnp.where(
        hit, jnp.int32(255), jnp.int32(0)).astype(jnp.uint8)


def adaptive_mean_pallas2(
    img: jnp.ndarray,
    ksize: int,
    C: int,
    *,
    block: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """``cv2.adaptiveThreshold(img, 255, MEAN_C, BINARY, ksize, C)`` —
    bit-exact with ops.threshold.adaptive_mean_threshold, VMEM-resident.

    Accepts (H, W) or a (T, H, W) batch.  ksize must be odd (every
    OpenCV/reference call site uses odd block sizes).
    """
    k = int(ksize)
    assert k % 2 == 1, "adaptive mean threshold needs an odd ksize"
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    T, Hh, W = img.shape
    halo = k  # r rows of box support + r rows of h-sum support
    if block is None:
        block = _round_up(-(-Hh // 3), 8)
    grid = -(-Hh // block)
    mv = _round_up(k + 1, 8)
    mx = _round_up(k + 1, 64)
    cols = _round_up(W + 2 * mx, LANE)
    in_rows = _round_up(block + 2 * halo, 8)
    rows = in_rows + 2 * mv
    r = k // 2
    hm = _round_up(block + 2 * r, 8)
    hk = _round_up(hm, LANE)

    # REPLICATE border: edge-pad rows and columns on the host (the bottom
    # pad also covers the grid*block overhang).
    hbuf = jnp.pad(
        img,
        ((0, 0), (halo, grid * block + (in_rows - block) - halo - Hh),
         (mx, cols - mx - W)),
        mode="edge",
    )
    uc = jnp.asarray(_h_box_band_np(cols, k), jnp.bfloat16)
    vc = jnp.asarray(_v_box_band_np(block, hk, k), jnp.bfloat16)

    kernel = functools.partial(
        _adaptive_mean_kernel,
        k=k, idelta=int(C), block=int(block), halo=int(halo),
        mv=int(mv), mx=int(mx), w_img=int(W), cols=int(cols),
        hm=int(hm), hk=int(hk),
    )
    out = pl.pallas_call(
        kernel,
        grid=(T, grid),
        out_shape=jax.ShapeDtypeStruct((T, grid * block, cols), jnp.uint8),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((cols, cols), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, hk), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, cols), lambda t, i: (t, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, cols), jnp.uint8),     # stage
            pltpu.VMEM((rows, cols), jnp.bfloat16),  # sbf (dot operand)
            pltpu.VMEM((hk, cols), jnp.float32),     # fH (h box sums)
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(hbuf, uc, vc)
    out = out[:, :Hh, mx:mx + W]
    return out[0] if squeeze else out


def neighborhood_stage_v2(
    rgb_r: jnp.ndarray,
    lab_b: jnp.ndarray,
    ksize_r: int = 15,
    C_r: int = 5,
    ksize_b: int = 35,
    C_b: int = 5,
    emit_prefixes: bool = False,
    interpret: bool = False,
    open_k: int = 5,
):
    """'neighborhood' filter mode (the hardcoded second attempt,
    lane_tracker.py:1081-1099): adaptive mean thresholds on the RAW
    channels + merge + open, all as stage kernels."""
    r_th = adaptive_mean_pallas2(rgb_r, ksize_r, -C_r, interpret=interpret)
    b_th = adaptive_mean_pallas2(lab_b, ksize_b, -C_b, interpret=interpret)
    return merge_open_pallas2(r_th, b_th, None,
                              emit_prefixes=emit_prefixes,
                              interpret=interpret, open_k=open_k)
