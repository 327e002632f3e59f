"""Search for a cheaper EXACT decomposition of OpenCV's elliptical SE.

Round-3's roofline (docs/PERFORMANCE.md) priced the erode/dilate core of
the tophats under the per-row-run decomposition (~0.40 ms of pure VPU
sweeps for k=29 + k=55) and said "cutting further means a different SE
decomposition, not better scheduling".  This script searches for that
decomposition offline.

Idea: erosion by a Minkowski sum is a CHAIN of erosions, and erosion by
a digital line segment in direction d costs O(log n) sweeps via pow2
doubling (reads with both sublane+lane offsets pay the same one rotate
as a lane-only offset, so diagonal/knight directions are as cheap as
horizontal ones).  So decompose

    E  =  (H_a (+) V_b (+) Seg(d1,n1) (+) ... )  UNION  residual-runs

with the zonotope S = H (+) V (+) segs required to be a subset of E and
the residual E \\ S handled as per-row runs reading the shared pow2
horizontal aggregates (2 rotate reads per run).  Erosion by a union is
the min of erosions, so the result is EXACT by construction; this script
verifies cell-for-cell equality and prices each candidate in the
measured v5e cost model (sweep-bound VPU: cost ~ #binary-op sweeps, with
a surcharge for lane-offset (rotate) reads).

Output: the best decomposition per ksize, as data the kernel can consume.
"""

from __future__ import annotations

import itertools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from lane_tracker_tpu.ops.morphology import ellipse_runs  # noqa: E402


def se_mask(k):
    r = k // 2
    m = np.zeros((k, k), bool)
    for dy, (lo, hi) in ellipse_runs(k):
        m[dy + r, lo + r : hi + r + 1] = True
    return m


def mink_segments(k, segs):
    """Minkowski sum of segments inside a (2k+1)^2 canvas, centered.

    Each seg is (dy, dx, n): points {i*(dy,dx) for i in 0..n}, then the
    whole sum is re-centered (all segments come in symmetric direction
    use, so the sum of endpoint offsets is even; we center by shifting
    by half the total displacement).
    """
    C = 2 * k + 1
    c = k
    cur = np.zeros((C, C), bool)
    cur[c, c] = True
    tot_dy = tot_dx = 0
    for dy, dx, n in segs:
        if n == 0:
            continue
        nxt = np.zeros_like(cur)
        for i in range(n + 1):
            sy, sx = i * dy, i * dx
            nxt[max(sy, 0) or None : None if sy >= 0 else sy,
                max(sx, 0) or None : None if sx >= 0 else sx] |= cur[
                max(-sy, 0) or None : None if sy <= 0 else -sy,
                max(-sx, 0) or None : None if sx <= 0 else -sx]
        cur = nxt
        tot_dy += dy * n
        tot_dx += dx * n
    if tot_dy % 2 or tot_dx % 2:
        return None  # cannot center on the lattice
    cur = np.roll(cur, (-tot_dy // 2, -tot_dx // 2), axis=(0, 1))
    return cur


def residual_runs(E, S, k):
    """Per-row runs of E \\ S (offsets from center)."""
    r = k // 2
    R = E & ~S
    runs = []
    for y in range(E.shape[0]):
        row = np.where(R[y])[0]
        if not len(row):
            continue
        # split into contiguous runs
        s = p = row[0]
        for x in row[1:]:
            if x == p + 1:
                p = x
            else:
                runs.append((y - r, s - r, p - r))
                s = p = x
        runs.append((y - r, s - r, p - r))
    return runs


ROT = 0.6  # measured-ish surcharge of a lane-offset (rotate) read, in sweeps


def seg_cost(n, diagonal):
    """Erosion by an (n+1)-point segment via pow2 doubling: each growth
    level is one binary-op sweep; the final window is 1 op if n+1 is a
    power of two else 1 extra overlap op.  Diagonal/lane directions pay
    the rotate surcharge per read; vertical pays none."""
    if n == 0:
        return 0.0
    L = n + 1
    lev = L.bit_length() - 1
    ops = lev + (0 if L == (1 << lev) else 1)
    reads = 2 * ops  # each binary op reads two operands
    rot = reads if diagonal else 0  # one operand of each op is offset... both may rotate
    # refine: the unshifted operand costs no rotate
    rot = ops if diagonal else 0
    return ops + ROT * rot + ops * 0.0  # writes folded into op cost


def decomp_cost(factors, n_runs):
    """factors: list of (dy,dx,n). Returns sweep-unit cost of one erosion."""
    cost = 0.0
    n_mat = 0  # intermediate materializations
    for dy, dx, n in factors:
        if n == 0:
            continue
        diagonal = dx != 0  # any lane offset pays the rotate
        cost += seg_cost(n, diagonal)
        n_mat += 1
    # residual runs: 2 rotate reads each off the shared horizontal
    # aggregates (which cost ~5 lane growth sweeps, shared with H factor
    # if present; count them once when any residual or H windowing needs
    # them — approximate: add 5*(1+ROT) if runs exist)
    if n_runs:
        cost += 5 * (1 + ROT) + n_runs * 2 * (1 + ROT) + n_runs  # + min-combine
    return cost


def current_cost(k):
    """Cost of the shipping row-run scheme, same units, for comparison."""
    groups = {}
    for dy, ext in ellipse_runs(k):
        groups.setdefault(ext, []).append(dy)
    # growth: 5 levels of lane reads; per group 2 lane window reads + |dys|
    # sublane reads + 1 acc combine
    g = 0.0
    maxlen = max(hi - lo + 1 for lo, hi in groups)
    g += (maxlen.bit_length() - 1) * (1 + ROT)
    for ext, dys in groups.items():
        g += 2 * (1 + ROT) + len(dys) + 1
    return g


def search(k, verbose=True):
    E = se_mask(k)
    r = k // 2
    best = None
    # candidate symmetric factor sets: H run a, V run b, diag c (both
    # diagonals same length by symmetry), knight lengths e,f
    DIRS = [
        ("H", (0, 1)),
        ("V", (1, 0)),
        ("D", (1, 1)),
        ("A", (1, -1)),
        ("K1", (1, 2)),
        ("K2", (2, 1)),
        ("K3", (1, -2)),
        ("K4", (2, -1)),
    ]
    # symmetric ellipse => use D/A with equal lengths, K1/K3 equal, K2/K4 equal
    amax = k - 1
    cmax = r
    kmax = r // 2 + 1
    tried = 0
    for a in range(0, amax + 1, 2):
        for b in range(0, amax + 1, 2):
            for c in range(0, cmax + 1):
                for e in range(0, kmax + 1):
                    for f in range(0, kmax + 1):
                        factors = [
                            (0, 1, a),
                            (1, 0, b),
                            (1, 1, c),
                            (1, -1, c),
                            (1, 2, e),
                            (1, -2, e),
                            (2, 1, f),
                            (2, -1, f),
                        ]
                        # quick bound: max extents
                        wid = a + 2 * c + 4 * e + 2 * f
                        hei = b + 2 * c + 2 * e + 4 * f
                        if wid > k - 1 or hei > k - 1:
                            continue
                        tried += 1
                        S = mink_segments(k, factors)
                        if S is None:
                            continue
                        Sc = S[r + 1 - 1 : r + 1 - 1 + k, r : r + k] if S.shape[0] != k else S
                        # center-crop the (2k+1) canvas to (k,k)
                        C = S.shape[0]
                        lo = (C - k) // 2
                        Sc = S[lo : lo + k, lo : lo + k]
                        if S[:lo].any() or S[lo + k :].any() or S[:, :lo].any() or S[:, lo + k :].any():
                            continue
                        if not (Sc & ~E).sum() == 0:
                            continue
                        runs = residual_runs(E, Sc, k)
                        cost = decomp_cost(factors, len(runs))
                        if best is None or cost < best[0]:
                            best = (cost, factors, len(runs), runs, Sc)
                            if verbose:
                                cov = Sc.sum() / E.sum()
                                print(
                                    f"k={k}: cost {cost:.1f} a={a} b={b} c={c} "
                                    f"e={e} f={f} runs={len(runs)} cover={cov:.3f}"
                                )
    print(f"k={k}: tried {tried}, current-scheme cost {current_cost(k):.1f}, "
          f"best new {best[0]:.1f}")
    if best:
        cost, factors, n_runs, runs, Sc = best
        print("  factors:", [(d, n) for (dy, dx, n), d in
                             zip(factors, ["H", "V", "D", "A", "K1", "K3", "K2", "K4"]) if n])
        print("  residual runs:", runs)
    return best


if __name__ == "__main__":
    for k in (29, 55, 5):
        search(k)
        print()
