"""Fused mu-sweep thermo as a Pallas TPU kernel in double-single arithmetic.

The headline pipeline (reweight -> segment -> per-phase integrate;
reference call stack gc_hist.pyx:268/317-415/451-554) runs entirely in
(hi, lo) f32-pair arithmetic (`core.ds`, ~49 mantissa bits) inside one
Pallas kernel: TPU hardware has no f64, XLA emulates it op-by-op at ~42 ms
per 2M-point normalization stage alone, and Pallas rejects f64 I/O outright.

Layout: the order-parameter axis N lives on SUBLANES (padded to the next
power of two, pad rows duplicating the last real bin so the clip-mode
stencil needs no index algebra), state points live on LANES (`block`
lanes per grid step).  Every op is then a dense [NPAD, block] f32 VPU op;
per-phase quantities are [1, block] rows combined with static-row python
loops — no gathers, no dynamic shapes, no transposes.

Range discipline (PERFORMANCE.md §3): pairs keep only the f32 exponent
range, so exponentials use PER-PHASE max shifts — exp(x - max_of_own_phase)
<= 1 always, and phases whose mass sits far below the global maximum keep
full relative precision (a single global shift would clamp them into the
ds_exp underflow floor).  Free energies read fe_p = x[0] - m_p - log(sum_p)
which is exactly the reference's -logsumexp(lnpi[seg] - lnpi[0])
(gc_hist.pyx:523-526) because the global normalization cancels.

Segmentation decisions are exact lexicographic pair compares; they can
differ from the f64 path only within ~2^-49 relative ties (same risk class
as the ~48-bit XLA f64 emulation the non-Pallas pipeline already accepts).
Integer-plateau surfaces compare bit-identically (integers split exactly).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ds
from .segment import key_row_addresses
from .state import Hist, HistMeta

# np.int32, not a python int: weak int literals trace as i64 scalars
# under x64 and Mosaic's int64->int32 conversion helper recurses forever
BIG = np.int32(jnp.iinfo(jnp.int32).max)
F32 = np.float32  # numpy scalar ctor: Pallas closures may not capture device arrays
I32 = jnp.int32

__all__ = ["mu_sweep_thermo_ds", "sweep_block_lanes", "thermo_lanes", "default_block"]


def _npad(n: int) -> int:
    p = 8
    while p < n:
        p *= 2
    return p


# ----------------------------------------------------------------------
# [rows, lanes] building blocks (pure jnp: trace in Pallas AND plain XLA)
# ----------------------------------------------------------------------


def _shift_down_zero(v, k):
    """Rows shifted down by k (row i reads old row i-k), zero-filled."""
    return jnp.concatenate([jnp.zeros((k,) + v.shape[1:], v.dtype), v[:-k]], axis=0)


def _val_up(v, k):
    """Row i reads row i+k, clipped at the bottom (pad rows already
    duplicate the last real bin, so the tail repeat IS clip mode)."""
    return jnp.concatenate([v[k:], jnp.broadcast_to(v[-1:], (k,) + v.shape[1:])], axis=0)


def _val_dn(v, k):
    """Row i reads row i-k, clipped at row 0."""
    return jnp.concatenate([jnp.broadcast_to(v[:1], (k,) + v.shape[1:]), v[:-k]], axis=0)


def _cumsum_rows(v):
    """Inclusive cumsum over the sublane axis via log2(NPAD) shift-adds
    (no lax.cumsum dependence inside Mosaic)."""
    k = 1
    while k < v.shape[0]:
        v = v + _shift_down_zero(v, k)
        k *= 2
    return v


def _compress_rows(flags, rows, size):
    """segment._compress_indices in lanes layout: indices (row numbers)
    where flags is True, ascending, padded with BIG.  Returns (stacked
    [size, L] i32, count [1, L])."""
    pos = _cumsum_rows(flags.astype(I32)) - 1
    # dtype pinned: under x64, jnp.sum(int32) accumulates int64, which the
    # Mosaic lowering rejects outright
    count = jnp.sum(flags.astype(I32), axis=0, keepdims=True, dtype=I32)
    out = []
    for s in range(size):
        sel = flags & (pos == s)
        idx = jnp.sum(jnp.where(sel, rows, np.int32(0)), axis=0, keepdims=True, dtype=I32)
        out.append(jnp.where(s < count, idx, BIG))
    return jnp.concatenate(out, axis=0), count


def _row_select(stk, i, clip=True):
    """stk[i] for a per-lane dynamic scalar index i ([1,L]) over a stacked
    [R, L] array: one-hot row sum (parity with segment._take_small, incl.
    clipping).  Full-sublane [R, L] ops instead of R [1, L] selects."""
    n = stk.shape[0]
    if clip:
        i = jnp.clip(i, np.int32(0), np.int32(n - 1))
    ri = lax.broadcasted_iota(I32, stk.shape, 0)
    return jnp.sum(jnp.where(ri == i, stk, np.int32(0)), axis=0, keepdims=True, dtype=I32)


def _masked_pair_max(xh, xl, m, neg_inf):
    """Lexicographic pair max of x over rows where m (ds.ds_max_reduce
    with a mask).  Returns [1,L] pair."""
    mh = jnp.max(jnp.where(m, xh, neg_inf), axis=0, keepdims=True)
    ml = jnp.max(jnp.where(m & (xh == mh), xl, neg_inf), axis=0, keepdims=True)
    return mh, ml


def _pair_max2(ah, al, bh, bl):
    """Lexicographic max of two (hi, lo) pairs, elementwise."""
    h = jnp.maximum(ah, bh)
    neg_inf = F32(-jnp.inf)
    la = jnp.where(ah == h, al, neg_inf)
    lb = jnp.where(bh == h, bl, neg_inf)
    return h, jnp.maximum(la, lb)


def _relextrema_lanes(xh, xl, rows, N, smooth, P):
    """segment.relextrema (gc_hist.pyx:317-415 parity) in lanes layout.

    Returns dict with stacked maxima [P, L], minima [P+1, L], n_max,
    n_min, valid ([1, L]), plus the global pair max (reused as the
    default integration shift).  All repair/alternation logic runs on
    the stacked rows — one [P, L] op instead of P [1, L] ops (the
    unrolled row lists ran at 1/8 sublane utilization and dominated
    both VPU time and Mosaic compile latency).
    """
    last = np.int32(N - 1)
    real = rows < N
    neg_inf = F32(-jnp.inf)
    pos_inf = F32(jnp.inf)

    is_max = jnp.ones(xh.shape, dtype=bool)
    is_min = jnp.ones(xh.shape, dtype=bool)
    for k in range(1, smooth + 1):
        uh, ul = _val_up(xh, k), _val_up(xl, k)
        dh, dl = _val_dn(xh, k), _val_dn(xl, k)
        is_max = is_max & ds.ds_gt(xh, xl, uh, ul) & ds.ds_gt(xh, xl, dh, dl)
        is_min = is_min & ds.ds_lt(xh, xl, uh, ul) & ds.ds_lt(xh, xl, dh, dl)
    # pad rows duplicate the last real bin -> strict compares are False
    # there by construction; the fallback flags below need the mask
    # (i32-sum "any": jnp.any's reduce_or lowers through an f64 max
    # reduction in Mosaic under x64, which it then rejects)
    has_max = jnp.sum(is_max.astype(I32), axis=0, keepdims=True, dtype=I32) > 0
    has_min = jnp.sum(is_min.astype(I32), axis=0, keepdims=True, dtype=I32) > 0
    any_ext = has_max | has_min

    gmax_h, gmax_l = _masked_pair_max(xh, xl, real, neg_inf)
    gmin_h = jnp.min(jnp.where(real, xh, pos_inf), axis=0, keepdims=True)
    gmin_l = jnp.min(jnp.where(real & (xh == gmin_h), xl, pos_inf), axis=0, keepdims=True)

    # straight-line fallback folded into the flags (gc_hist.pyx:382-386);
    # boolean algebra, not jnp.where: Mosaic cannot select on i1 vectors
    # (lowers to an unsupported i8->i1 trunci)
    fmax = (any_ext & is_max) | (~any_ext & real & (xh == gmax_h) & (xl == gmax_l))
    fmin = (any_ext & is_min) | (~any_ext & real & (xh == gmin_h) & (xl == gmin_l))

    maxima0, n_max0 = _compress_rows(fmax, rows, P)  # [P, L]
    minima0, n_min0 = _compress_rows(fmin, rows, P + 1)  # [P+1, L]
    L = xh.shape[-1]
    riP = lax.broadcasted_iota(I32, (P, L), 0)
    riP1 = lax.broadcasted_iota(I32, (P + 1, L), 0)

    max_only = has_max & ~has_min
    min_only = has_min & ~has_max
    none_case = ~any_ext

    # --- both-found endpoint rules (gc_hist.pyx:333-351) ---
    zero_in = (maxima0[:1] == 0) | (minima0[:1] == 0)
    pre_min = (~zero_in) & (maxima0[:1] < minima0[:1])
    pre_max = (~zero_in) & (maxima0[:1] > minima0[:1])
    validB = zero_in | pre_min | pre_max
    # prepend-0 = rows shifted down one with a zero row in front
    minimaB = jnp.where(pre_min, jnp.concatenate([jnp.zeros_like(minima0[:1]), minima0[:-1]], axis=0), minima0)
    n_minB = n_min0 + pre_min.astype(I32)
    maximaB = jnp.where(pre_max, jnp.concatenate([jnp.zeros_like(maxima0[:1]), maxima0[:-1]], axis=0), maxima0)
    n_maxB = n_max0 + pre_max.astype(I32)

    last_mx = _row_select(maximaB, n_maxB - 1)
    last_mn = _row_select(minimaB, n_minB - 1)
    last_in = (last_mx == last) | (last_mn == last)
    app_max = (~last_in) & (last_mx < last_mn)
    app_min = (~last_in) & (last_mx > last_mn)
    validB = validB & (last_in | app_max | app_min)
    maximaB = jnp.where(app_max & (riP == n_maxB), last, maximaB)
    n_maxB = n_maxB + app_max.astype(I32)
    minimaB = jnp.where(app_min & (riP1 == n_minB), last, minimaB)
    n_minB = n_minB + app_min.astype(I32)

    # --- merged over-smoothing repair (gc_hist.pyx:352-381) ---
    anchor = jnp.where(max_only, jnp.concatenate([maxima0, jnp.full_like(maxima0[:1], BIG)], axis=0), minima0)
    n_anchor = jnp.where(max_only, n_max0, n_min0)
    vh = jnp.where(max_only, xh, -xh)
    vl = jnp.where(max_only, xl, -xl)
    gaps = []
    for g in range(P - 1):
        in_gap = (rows >= anchor[g : g + 1]) & (rows < anchor[g + 1 : g + 2])
        gh = jnp.where(in_gap, vh, pos_inf)
        gl = jnp.where(in_gap, vl, pos_inf)
        mh = jnp.min(gh, axis=0, keepdims=True)
        ml = jnp.min(jnp.where(gh == mh, gl, pos_inf), axis=0, keepdims=True)
        first = jnp.min(jnp.where((gh == mh) & (gl == ml), rows, BIG), axis=0, keepdims=True)
        gaps.append(first.astype(I32))
    # filled rows: s=0 -> 0; s in 1..P -> gaps[min(s-1, P-2)] where
    # s <= n_anchor-1 else BIG; then row n_anchor overwritten with last.
    # full_like, not jnp.where(py_int, py_int): two weak scalars make an
    # int64 under x64, which Mosaic cannot cast back (infinite
    # _convert_helper recursion on int64->int32)
    # riP + 1 stands in for riP1[1:]: offset-slicing a broadcasted_iota
    # along sublanes SIGABRTs Mosaic's apply-vector-layout pass (measured
    # 2026-08-17, vector_extract_strided_slice_rule check failure); an
    # iota of the target shape plus a constant lowers fine
    zero_row = jnp.zeros_like(maxima0[:1])
    if P >= 2:
        gap_rows = jnp.concatenate(gaps + [gaps[-1]], axis=0)  # [P, L]
        body = jnp.where(riP + 1 <= n_anchor - 1, gap_rows, jnp.full_like(gap_rows, BIG))
    else:
        body = jnp.full_like(riP, BIG)
    filled = jnp.concatenate([zero_row, body], axis=0)  # [P+1, L]
    filled = jnp.where(riP1 == n_anchor, last, filled)

    # --- exclusive case selects ---
    raw_max = max_only | none_case
    raw_min = min_only | none_case
    maxima = jnp.where(min_only, filled[:P], jnp.where(raw_max, maxima0, maximaB))
    n_max = jnp.where(min_only, n_anchor + 1, jnp.where(raw_max, n_max0, n_maxB))
    minima = jnp.where(max_only, filled, jnp.where(raw_min, minima0, minimaB))
    n_min = jnp.where(max_only, n_anchor + 1, jnp.where(raw_min, n_min0, n_minB))
    valid = (max_only | min_only | none_case) | validB

    # --- alternation + ordering checks (gc_hist.pyx:402-415) ---
    valid = valid & (jnp.abs(n_max - n_min) <= 1)
    valid = valid & (n_max <= P) & (n_min <= P + 1) & (n_max >= 1)
    max_first = maxima[:1] < minima[:1]
    total = n_max + n_min
    # the alternating sequence seq[2i] / seq[2i+1] = (max_first ?
    # (mx_e[i], minima[i]) : (minima[i], mx_e[i])) with mx_e = maxima
    # clip-extended one row; ordering holds iff every within-pair and
    # cross-pair adjacent compare with t+1 < total is nondecreasing
    mx_e = jnp.concatenate([maxima, maxima[P - 1 : P]], axis=0)  # [P+1, L]
    even_v = jnp.where(max_first, mx_e, minima)
    odd_v = jnp.where(max_first, minima, mx_e)
    gate_w = (np.int32(2) * riP1 + np.int32(1)) < total
    gate_c = (np.int32(2) * (riP + np.int32(1))) < total  # riP1[1:] sans iota slice
    bad_w = jnp.sum((gate_w & (odd_v < even_v)).astype(I32), axis=0, keepdims=True, dtype=I32)
    bad_c = jnp.sum((gate_c & (even_v[1:] < odd_v[:-1])).astype(I32), axis=0, keepdims=True, dtype=I32)
    valid = valid & ((bad_w + bad_c) == 0)

    return {
        "maxima": maxima,
        "n_max": n_max,
        "minima": minima,
        "n_min": n_min,
        "valid": valid,
        "gmax": (gmax_h, gmax_l),
    }


def _janus_lanes(ext, P):
    """segment.janus_collect_extrema (collect.py:32-80 parity) in lanes
    layout: merge all peaks but the last into one macrophase.

    The merged-peak index is round(mean(maxima[:-1])): an f32 divide is
    exact enough here — the quotient is a rational with denominator
    n_max-1 <= P, so its distance from any .5 rounding boundary is at
    least 1/(2P), far above f32 eps at index magnitudes.
    """
    maxima, minima = ext["maxima"], ext["minima"]  # [P, L], [P+1, L]
    n_max, n_min = ext["n_max"], ext["n_min"]
    L = maxima.shape[-1]
    riP = lax.broadcasted_iota(I32, (P, L), 0)
    riP1 = lax.broadcasted_iota(I32, (P + 1, L), 0)
    nm1 = n_max - 1
    msum = jnp.sum(jnp.where(riP < nm1, maxima, np.int32(0)), axis=0, keepdims=True, dtype=I32)
    mean = jnp.round(msum.astype(F32) / jnp.maximum(nm1, 1).astype(F32)).astype(I32)
    mx_last = _row_select(maxima, nm1)
    new_max = jnp.where(riP == 0, mean, jnp.where(riP == 1, mx_last, BIG))

    lead = minima[:1] == 0
    last_mn = _row_select(minima, n_min - 1)
    prev_mn = _row_select(minima, n_min - 2)
    mid = (mean < last_mn) & (last_mn < mx_last)
    tail = last_mn > mx_last

    big = jnp.full_like(mean, BIG)
    s0 = jnp.where(lead, np.int32(0), jnp.where(mid, last_mn, jnp.where(tail, prev_mn, big)))
    s1 = jnp.where(lead & mid, last_mn, jnp.where(lead & tail, prev_mn, jnp.where((~lead) & tail, last_mn, big)))
    s2 = jnp.where(lead & tail, last_mn, big)
    new_min = jnp.where(riP1 == 0, s0, jnp.where(riP1 == 1, s1, jnp.where(riP1 == 2, s2, BIG)))
    cnt = lead.astype(I32) + mid.astype(I32) + np.int32(2) * tail.astype(I32)

    apply = n_max > 2
    valid = ext["valid"] & (~apply | ~tail | (n_min > 1))
    out = dict(ext)
    out["maxima"] = jnp.where(apply, new_max, maxima)
    out["n_max"] = jnp.where(apply, np.int32(2), n_max)
    out["minima"] = jnp.where(apply, new_min, minima)
    out["n_min"] = jnp.where(apply, cnt, n_min)
    out["valid"] = valid
    return out


def _phase_bounds_lanes(ext, N, P):
    """segment.phase_bounds (gc_hist.pyx:498-520 min_ctr walk) in lanes
    layout: stacked [P, L] lefts/rights/mask."""
    mn = ext["minima"]  # [P+1, L]
    mx = ext["maxima"]  # [P, L]
    L = mx.shape[-1]
    s = mx[:1] == 0
    riP = lax.broadcasted_iota(I32, (P, L), 0)
    left_v = jnp.where(s, jnp.concatenate([mn[:1], mn[: P - 1]], axis=0), mn[:P])
    right_v = jnp.where(s, mn[:P], mn[1 : P + 1])
    left = jnp.where(mx > 0, left_v, np.int32(0))
    right = jnp.where(mx < N - 1, right_v, np.int32(N))
    right = jnp.where(right == N - 1, np.int32(N), right)
    mask = riP < ext["n_max"]
    return left.astype(I32), right.astype(I32), mask


def _integrate_chunked(xh, xl, keys, lefts, rights, mask, N, P, props, TN, brk):
    """The integration stages (per-phase maxima, shifted exp, key-row
    products, per-phase pair sums) as a static loop over [TN, L] chunks
    of the N axis, with [P, L] accumulators.

    Identical math to the full-length section of thermo_lanes, but the
    exp/product/tree-sum intermediates only ever exist one chunk at a
    time — the VMEM lever that lifts the sweep kernel past NPAD=1024
    (those stages hold ~18-20 live [NPAD, L] f32 arrays, the measured
    16 MB scoped-VMEM OOM; segmentation's ~10 fit at NPAD=2048 with the
    128-lane block).  Chunk sums accumulate pairwise, so values can
    differ from the unchunked kernel at the ~2^-49 reassociation level;
    segmentation and the per-phase maxima are exact and unchanged.

    keys entries may be ([NPAD,*] , [NPAD,*]) pairs OR callables
    f(r0, rN) -> ([rN-r0, L], [rN-r0, L]) producing the rows on the fly —
    the extrapolating kernels use callables so their extrapolated key
    rows are never materialized full-length (the mb kernel measured
    20.33 MB scoped VMEM at NPAD=2048 with materialized keys, 4.33 MB
    over the 16 MB limit; the rows are rank-1 outer products of
    [NPAD,1] const rows with [1,L] lane scalars, so per-chunk recompute
    is a handful of elementwise double-single ops).

    Returns (m_stk, sums) exactly as the unchunked section builds them.
    """
    NPAD, L = xh.shape
    assert NPAD % TN == 0, (NPAD, TN)
    nt = NPAD // TN
    neg_inf = F32(-jnp.inf)

    def chunk_rows(t):
        # fresh iota + constant offset: offset-slicing a broadcasted_iota
        # along sublanes SIGABRTs Mosaic (PERFORMANCE.md §8 note 8)
        return lax.broadcasted_iota(I32, (TN, L), 0) + np.int32(t * TN)

    def chunk_masks(rws):
        real_t = rws < N
        return [
            (rws >= lefts[p : p + 1]) & (rws < rights[p : p + 1]) & mask[p : p + 1] & real_t
            for p in range(P)
        ]

    # pass A: per-phase lexicographic pair maxima
    mh_acc = [jnp.full((1, L), -jnp.inf, xh.dtype) for _ in range(P)]
    ml_acc = [jnp.full((1, L), -jnp.inf, xh.dtype) for _ in range(P)]
    for t in range(nt):
        r0 = t * TN
        xh_t, xl_t = xh[r0 : r0 + TN], xl[r0 : r0 + TN]
        for p, ip in enumerate(chunk_masks(chunk_rows(t))):
            ch, cl = _masked_pair_max(xh_t, xl_t, ip, neg_inf)
            mh_acc[p], ml_acc[p] = _pair_max2(mh_acc[p], ml_acc[p], ch, cl)
    m_stk = brk((jnp.concatenate(mh_acc, axis=0), jnp.concatenate(ml_acc, axis=0)))

    # bin N-1 exact per-phase correction (endpoint-inclusion overlap —
    # same rule as the unchunked section)
    xe_h, xe_l = xh[N - 1 : N], xl[N - 1 : N]
    in_last = (lefts <= np.int32(N - 1)) & (np.int32(N - 1) < rights) & mask  # [P, L]
    t0h, t0l = ds.ds_exp_shifted(
        *ds.ds_sub(xe_h + jnp.zeros_like(m_stk[0]), xe_l + jnp.zeros_like(m_stk[1]), m_stk[0], m_stk[1])
    )
    lt_h = jnp.where(in_last, t0h, F32(0.0))
    lt_l = jnp.where(in_last, t0l, F32(0.0))
    key_last = [(jnp.ones_like(xe_h), jnp.zeros_like(xe_l))]
    if props:
        for key in keys:
            if callable(key):
                kh_l, kl_l = key(N - 1, N)  # already [1, L]
                key_last.append((kh_l + jnp.zeros_like(xe_h), kl_l + jnp.zeros_like(xe_l)))
            else:
                kh, kl = key
                key_last.append((kh[N - 1 : N] + jnp.zeros_like(xe_h), kl[N - 1 : N] + jnp.zeros_like(xe_l)))

    # pass B: shifted exp + products + per-phase sums, chunk by chunk
    K1 = 1 + (len(keys) if props else 0)
    zero = jnp.zeros((1, L), xh.dtype)
    acc = [[(zero, zero) for _ in range(P)] for _ in range(K1)]
    for t in range(nt):
        r0 = t * TN
        xh_t, xl_t = xh[r0 : r0 + TN], xl[r0 : r0 + TN]
        rws = chunk_rows(t)
        ips = chunk_masks(rws)
        # per-bin shift: the bin's last covering phase wins; bins outside
        # every phase shift by themselves (exp -> 1, excluded from every
        # sum by the phase masks)
        sh_h, sh_l = xh_t, xl_t
        for p in range(P):
            sh_h = jnp.where(ips[p], m_stk[0][p : p + 1] + jnp.zeros_like(xh_t), sh_h)
            sh_l = jnp.where(ips[p], m_stk[1][p : p + 1] + jnp.zeros_like(xl_t), sh_l)
        th, tl = ds.ds_sub(xh_t, xl_t, sh_h, sh_l)
        eh, el = ds.ds_exp_shifted(th, tl)
        not_last = rws != np.int32(N - 1)
        pks_t = [(eh, el)]
        if props:
            for key in keys:
                if callable(key):
                    kh_t, kl_t = key(r0, r0 + TN)
                    kh_t = kh_t + jnp.zeros_like(eh)
                    kl_t = kl_t + jnp.zeros_like(el)
                else:
                    kh, kl = key
                    kh_t = kh[r0 : r0 + TN] + jnp.zeros_like(eh)
                    kl_t = kl[r0 : r0 + TN] + jnp.zeros_like(el)
                pks_t.append(ds.ds_mul(eh, el, kh_t, kl_t))
        for q, (qh, ql) in enumerate(pks_t):
            for p in range(P):
                sel = ips[p] & not_last
                csh, csl = ds.ds_sum_pairs(
                    jnp.where(sel, qh, F32(0.0)), jnp.where(sel, ql, F32(0.0)), axis=0
                )
                acc[q][p] = ds.ds_add(*acc[q][p], csh, csl)
    sums = []
    for q in range(K1):
        s_h = jnp.concatenate([acc[q][p][0] for p in range(P)], axis=0)
        s_l = jnp.concatenate([acc[q][p][1] for p in range(P)], axis=0)
        term = ds.ds_mul(lt_h, lt_l, key_last[q][0] + jnp.zeros_like(lt_h), key_last[q][1] + jnp.zeros_like(lt_l))
        sums.append(ds.ds_add(s_h, s_l, *term))
    return m_stk, brk(sums)


def sweep_block_lanes(ah, al, lnpi_h, lnpi_l, op, keys, vol_pair, N, smooth, P, props, barriers=False, collect=None, sum_chunk=None):
    """One block of the fused sweep in lanes layout.  Pure jnp on f32/i32:
    runs identically inside the Pallas kernel and under plain XLA (the
    CPU parity tests call it directly).

    ah, al     : [1, L] pair, per-point reweight coefficient beta*(mu-mu0)
    lnpi_h/l   : [NPAD, 1] pair (pad rows duplicate the last real bin)
    op         : [NPAD, 1] f32 (exact: integer order-parameter values)
    keys       : list of (S+1) ([NPAD,1], [NPAD,1]) pairs — <N_i> rows then
                 <U> (segment.key_row_addresses order)
    vol_pair   : ([1,1], [1,1]) volume pair
    barriers   : insert lax.optimization_barrier between pipeline stages.
                 REQUIRED in plain-XLA mode: without it XLA:CPU's elemental
                 fusion re-evaluates the whole masked upstream graph (exp +
                 segmentation) inside every tree-sum level — measured as a
                 >10-minute "hang" on a 32-point block.  Unnecessary inside
                 Pallas (Mosaic materializes values in VMEM as written).
    Returns dict of stacked [P,L] arrays / [1,L] scalars (see _pack_rows).
    """
    NPAD = lnpi_h.shape[0]
    L = ah.shape[-1]
    rows = lax.broadcasted_iota(I32, (NPAD, L), 0)

    # x = lnpi + a*op  (reweight, gc_hist.pyx:71-78 without normalization:
    # fe/props are shift-invariant, pipeline._point_thermo parity)
    ph, pe = ds.two_prod(ah, op)  # broadcast [NPAD,1]*[1,L] -> [NPAD,L]
    pe = pe + al * op
    aoh, aol = ds.quick_two_sum(ph, pe)
    xh, xl = ds.ds_add(lnpi_h, lnpi_l + jnp.zeros_like(aol), aoh, aol)

    return thermo_lanes(xh, xl, rows, keys, vol_pair, N, smooth, P, props, barriers, collect, sum_chunk=sum_chunk)


def thermo_lanes(xh, xl, rows, keys, vol_pair, N, smooth, P, props, barriers=False, collect=None, sum_chunk=None):
    """Segment + integrate a [NPAD, L] pair surface in lanes layout: the
    post-reweight 4/5 of sweep_block_lanes, shared with the extrapolating
    kernels (pallas_mb.py) which build their own x and key rows first.
    keys entries may be [NPAD, 1] (broadcast) or full [NPAD, L] pairs.
    collect: None or "janus" (the lanes analog of COLLECT_TRANSFORMS)."""
    brk = lax.optimization_barrier if barriers else (lambda t: t)
    neg_inf = F32(-jnp.inf)
    NPAD, L = xh.shape

    ext = _relextrema_lanes(xh, xl, rows, N, smooth, P)
    if collect == "janus":
        ext = _janus_lanes(ext, P)
    elif collect is not None:
        raise NotImplementedError("lanes collect transforms: only 'janus'")
    real = rows < N
    lefts, rights, mask = _phase_bounds_lanes(ext, N, P)  # [P, L]

    if sum_chunk is not None:
        m_stk, sums = _integrate_chunked(xh, xl, keys, lefts, rights, mask, N, P, props, sum_chunk, brk)
        return _finalize_lanes(ext, lefts, rights, mask, xh, xl, sums, m_stk, keys, vol_pair, P, props, brk)

    # per-phase max shifts; bins outside every phase fall back to the
    # global max (still <= 0 after the shift, contribute to no sum)
    gh, gl = ext["gmax"]
    sh_h = jnp.broadcast_to(gh, (NPAD, L))
    sh_l = jnp.broadcast_to(gl, (NPAD, L))
    in_p = []
    mx_rows_h, mx_rows_l = [], []
    for p in range(P):
        # real-row mask matters only for degenerate bounds (right == BIG
        # on invalid structures): without it the pad rows — duplicates of
        # the last real bin — would double-count into that phase's sum,
        # diverging from the XLA path's masked output on exactly the
        # points nobody checks (they are valid=False, but parity is
        # bitwise everywhere by contract)
        ip = (rows >= lefts[p : p + 1]) & (rows < rights[p : p + 1]) & mask[p : p + 1] & real
        mh, ml = _masked_pair_max(xh, xl, ip, neg_inf)
        sh_h = jnp.where(ip, mh, sh_h)
        sh_l = jnp.where(ip, ml, sh_l)
        in_p.append(ip)
        mx_rows_h.append(mh)
        mx_rows_l.append(ml)
    m_stk = (jnp.concatenate(mx_rows_h, axis=0), jnp.concatenate(mx_rows_l, axis=0))  # [P, L]

    in_p, m_stk, sh_h, sh_l = brk((in_p, m_stk, sh_h, sh_l))
    th, tl = ds.ds_sub(xh, xl, sh_h, sh_l)
    eh, el = brk(ds.ds_exp_shifted(th, tl))

    # Bin N-1 is handled separately: the endpoint-inclusion rule
    # (right == N-1 -> N, gc_hist.pyx:516-518) is the ONE way adjacent
    # phases overlap, and the shared per-bin shift above is only
    # consistent for a bin's last covering phase.  Exclude the bin from
    # the shared-e tree sums and add exp(x[N-1] - m_p) per phase exactly
    # (one stacked [P, L] ds_exp — ~P/NPAD of one full exp).
    not_last = rows != np.int32(N - 1)
    xe_h, xe_l = xh[N - 1 : N], xl[N - 1 : N]
    in_last = (lefts <= np.int32(N - 1)) & (np.int32(N - 1) < rights) & mask  # [P, L]
    t0h, t0l = ds.ds_exp_shifted(
        *ds.ds_sub(xe_h + jnp.zeros_like(m_stk[0]), xe_l + jnp.zeros_like(m_stk[1]), m_stk[0], m_stk[1])
    )
    lt_h = jnp.where(in_last, t0h, F32(0.0))
    lt_l = jnp.where(in_last, t0l, F32(0.0))

    # prob * key rows once; per-phase masked pair tree sums, stacked to
    # [P, L] per quantity (the last-bin correction applies stacked)
    pks = [(eh, el)]
    key_last = [(jnp.ones_like(xe_h), jnp.zeros_like(xe_l))]
    if props:
        for kh, kl in keys:
            pks.append(ds.ds_mul(eh, el, kh + jnp.zeros_like(eh), kl + jnp.zeros_like(el)))
            key_last.append((kh[N - 1 : N] + jnp.zeros_like(xe_h), kl[N - 1 : N] + jnp.zeros_like(xe_l)))
    pks = brk(pks)
    sums = []  # [K+1] of ([P,L],[P,L])
    for q, (qh, ql) in enumerate(pks):
        rs_h, rs_l = [], []
        for p in range(P):
            sel = in_p[p] & not_last
            wh = jnp.where(sel, qh, F32(0.0))
            wl = jnp.where(sel, ql, F32(0.0))
            sh, sl = ds.ds_sum_pairs(wh, wl, axis=0)
            rs_h.append(sh)
            rs_l.append(sl)
        s_h = jnp.concatenate(rs_h, axis=0)
        s_l = jnp.concatenate(rs_l, axis=0)
        term = ds.ds_mul(lt_h, lt_l, key_last[q][0] + jnp.zeros_like(lt_h), key_last[q][1] + jnp.zeros_like(lt_l))
        sums.append(ds.ds_add(s_h, s_l, *term))
    sums = brk(sums)
    return _finalize_lanes(ext, lefts, rights, mask, xh, xl, sums, m_stk, keys, vol_pair, P, props, brk)


def _finalize_lanes(ext, lefts, rights, mask, xh, xl, sums, m_stk, keys, vol_pair, P, props, brk):
    """fe + property joins from the per-phase pair sums — shared tail of
    the unchunked and sum-chunked integration paths."""
    L = xh.shape[-1]
    # fe_p = x[0] - m_p - log(wsum_p)  == -logsumexp(lnpi[seg]-lnpi[0])
    # (gc_hist.pyx:523-526; the global normalization cancels)
    x0h, x0l = xh[:1], xl[:1]
    wh, wl = sums[0]
    wpos = wh > 0
    lh, ll = ds.ds_log(jnp.where(wpos, wh, F32(1.0)), jnp.where(wpos, wl, F32(0.0)))
    fh, fl = ds.ds_sub(x0h + jnp.zeros_like(wh), x0l + jnp.zeros_like(wl), m_stk[0], m_stk[1])
    fh, fl = ds.ds_sub(fh, fl, lh, ll)
    fh = jnp.where(mask & wpos, fh, jnp.where(mask, F32(jnp.inf), F32(0.0)))
    fl = jnp.where(mask & wpos, fl, F32(0.0))
    fe, wpos = brk(((fh, fl), wpos))

    out = {
        "fe": fe,
        "left": lefts,
        "right": rights,
        "mask": mask,
        "n_phases": ext["n_max"],
        "valid": ext["valid"],
        # per-phase pair maxima: iso cells read the last phase's maximum
        # for the is_safe tail check (not packed by the sweep outputs)
        "phase_max": m_stk,
    }
    if props:
        S = len(keys) - 1
        vh, vl = vol_pair
        gwh = jnp.where(wpos, wh, F32(1.0))
        gwl = jnp.where(wpos, wl, F32(0.0))
        n_i = [ds.ds_div(*sums[1 + i], gwh, gwl) for i in range(S)]
        u = ds.ds_div(*sums[1 + S], gwh, gwl)
        nth, ntl = n_i[0]
        for i in range(1, S):
            nth, ntl = ds.ds_add(nth, ntl, *n_i[i])
        nz = nth != 0
        gnh = jnp.where(nz, nth, F32(1.0))
        gnl = jnp.where(nz, ntl, F32(0.0))
        x_i = [ds.ds_div(*n_i[i], gnh, gnl) for i in range(S)]
        # volume is a [1,1] scalar pair: broadcast lanes first, then
        # sublanes — Mosaic cannot do both in one vector.broadcast
        vrh = (vh + jnp.zeros((1, L), vh.dtype)) + jnp.zeros_like(nth)
        vrl = (vl + jnp.zeros((1, L), vl.dtype)) + jnp.zeros_like(ntl)
        density = ds.ds_div(nth, ntl, vrh, vrl)
        out.update({"n_i": n_i, "x_i": x_i, "ntot": (nth, ntl), "u": u, "density": density})
    return out


# ----------------------------------------------------------------------
# output packing: everything is [1, L] rows -> two dense 2-D blocks
# ----------------------------------------------------------------------


def _f_quantities(S, props):
    if not props:
        return ["fe"]
    return ["fe"] + [f"n_i{i}" for i in range(S)] + ["ntot", "u"] + [f"x_i{i}" for i in range(S)] + ["density"]


def _pack_rows(out, P, S, props):
    """Flatten the sweep output dict to (f32 [NRF, L], i32 [NRI, L]).
    Every per-phase quantity is a stacked ([P, L], [P, L]) pair; the row
    layout (P hi rows then P lo rows per quantity) matches _unpack."""
    frows = []
    for q in _f_quantities(S, props):
        if q.startswith("n_i"):
            h, l = out["n_i"][int(q[3:])]
        elif q.startswith("x_i"):
            h, l = out["x_i"][int(q[3:])]
        else:
            h, l = out[q]
        frows += [h, l]
    irows = [out["left"], out["right"], out["mask"].astype(I32), out["n_phases"], out["valid"].astype(I32)]
    return jnp.concatenate(frows, axis=0), jnp.concatenate(irows, axis=0)


def _unpack(out_f, out_i, B, P, S, props):
    """Inverse of _pack_rows on [NR, B] host-side arrays -> f64 dict."""
    res = {}
    at = 0
    for q in _f_quantities(S, props):
        h, l = out_f[at : at + P], out_f[at + P : at + 2 * P]
        res[q] = ds.join_f64(h, l).T  # [B, P]
        at += 2 * P
    res["left"] = out_i[:P].T
    res["right"] = out_i[P : 2 * P].T
    res["mask"] = out_i[2 * P : 3 * P].T.astype(bool)
    res["n_phases"] = out_i[3 * P]
    res["valid"] = out_i[3 * P + 1].astype(bool)
    if props:
        res["n_i"] = jnp.stack([res.pop(f"n_i{i}") for i in range(S)], axis=-1)  # [B,P,S]
        res["x_i"] = jnp.stack([res.pop(f"x_i{i}") for i in range(S)], axis=-1)
    return res


# ----------------------------------------------------------------------
# pallas_call shell
# ----------------------------------------------------------------------


def _kernel(ah_ref, al_ref, cst_ref, out_f_ref, out_i_ref, *, N, NPAD, smooth, P, S, props, collect, sum_chunk=None):
    lnpi_h, lnpi_l, op, keys, vol_pair = _unpack_cst(cst_ref[:], NPAD, S)
    out = sweep_block_lanes(
        ah_ref[0], al_ref[0], lnpi_h, lnpi_l, op, keys, vol_pair, N, smooth, P, props, collect=collect, sum_chunk=sum_chunk
    )
    f, i = _pack_rows(out, P, S, props)
    out_f_ref[0] = f
    out_i_ref[0] = i


def _const_block(h: Hist, meta: HistMeta, NPAD: int):
    """Pack lnpi/op/key-row pairs + volume into one [(5+2S)*NPAD+..., 1]
    f32 array (pad rows duplicate the last real bin: clip-mode stencil)."""
    N = h.lnpi.shape[-1]

    def pad(v):
        return jnp.concatenate([v, jnp.broadcast_to(v[-1:], (NPAD - N,))]) if NPAD > N else v

    segs = []
    lh, ll = ds.split_f64(pad(h.lnpi))
    oph = pad(h.op).astype(F32)  # exact: integer order-parameter values
    segs += [lh, ll, oph]
    mom2d = h.mom.reshape(meta.n_addr, N)
    for a in key_row_addresses(meta):
        kh, kl = ds.split_f64(pad(mom2d[a]))
        segs += [kh, kl]
    vh, vl = ds.split_f64(h.volume.reshape(1))
    segs += [vh, vl]
    return jnp.concatenate(segs)[:, None]


def _prep(h: Hist, meta: HistMeta, mu_grid, block: int):
    B = mu_grid.shape[0]
    N = h.lnpi.shape[-1]
    NPAD = _npad(N)
    a = (mu_grid - h.curr_mu[0]) * h.curr_beta  # f64, exact split below
    nb = -(-B // block)
    apad = jnp.concatenate([a, jnp.broadcast_to(a[-1:], (nb * block - B,))]) if nb * block != B else a
    # 3-D (nb, 1, block): Mosaic requires the last two block-shape dims to
    # equal the array dims (or be 8/128-divisible); (1, block) rows qualify
    ah, al = ds.split_f64(apad.reshape(nb, 1, block))
    return ah, al, _const_block(h, meta, NPAD), N, NPAD, nb


def _unpack_cst(cst, NPAD, S):
    lnpi_h = cst[0:NPAD]
    lnpi_l = cst[NPAD : 2 * NPAD]
    op = cst[2 * NPAD : 3 * NPAD]
    keys = [
        (cst[(3 + 2 * k) * NPAD : (4 + 2 * k) * NPAD], cst[(4 + 2 * k) * NPAD : (5 + 2 * k) * NPAD])
        for k in range(S + 1)
    ]
    vbase = (3 + 2 * (S + 1)) * NPAD
    return lnpi_h, lnpi_l, op, keys, (cst[vbase : vbase + 1], cst[vbase + 1 : vbase + 2])


def _sweep_ds_xla(h: Hist, meta: HistMeta, mu_grid, props: bool, collect=None, sum_chunk=None):
    """EAGER reference path (CPU tests): the same lanes body op-by-op.

    Deliberately NOT jitted: XLA:CPU's fusion passes blow up on this DAG
    shape (huge element-wise graph with diamond sharing at every level) —
    a 32-point block never finished compiling in >10 minutes even with
    optimization_barrier fences, while eager execution is linear and takes
    seconds.  Mosaic (the real TPU path) compiles the same body as written.
    """
    B = mu_grid.shape[0]
    P, S = meta.max_phases, meta.nspec
    ah, al, cst, N, NPAD, _ = _prep(h, meta, mu_grid, block=B)
    lnpi_h, lnpi_l, op, keys, vol = _unpack_cst(cst, NPAD, S)
    out = sweep_block_lanes(ah[0], al[0], lnpi_h, lnpi_l, op, keys, vol, N, meta.smooth, P, props, barriers=True, collect=collect, sum_chunk=sum_chunk)
    f, i = _pack_rows(out, P, S, props)
    return _unpack(f, i, B, P, S, props)


@partial(jax.jit, static_argnames=("meta", "props", "block", "interpret", "collect", "sum_chunk"))
def _sweep_ds_pallas(h: Hist, meta: HistMeta, mu_grid, props: bool, block: int, interpret: bool, collect=None, sum_chunk=None):
    B = mu_grid.shape[0]
    P, S = meta.max_phases, meta.nspec
    ah, al, cst, N, NPAD, nb = _prep(h, meta, mu_grid, block)
    NRF = 2 * P * len(_f_quantities(S, props))
    NRI = 3 * P + 2
    # the pallas tracer adds several Python frames per traced op; this
    # kernel's ~3k-op body blows the default 1000-frame recursion limit
    import sys

    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    # index maps return np.int32 zeros: weak python 0 traces as an i64
    # constant under x64, and Mosaic rejects i64 in the index-map return
    Z = np.int32(0)
    out_f, out_i = pl.pallas_call(
        partial(_kernel, N=N, NPAD=NPAD, smooth=meta.smooth, P=P, S=S, props=props, collect=collect, sum_chunk=sum_chunk),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, block), lambda i: (i, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (i, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec(cst.shape, lambda i: (Z, Z), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, NRF, block), lambda i: (i, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NRI, block), lambda i: (i, Z, Z), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, NRF, block), F32),
            jax.ShapeDtypeStruct((nb, NRI, block), I32),
        ],
        interpret=interpret,
    )(ah, al, cst)
    # [nb, NR, block] -> [NR, B]
    out_f = jnp.moveaxis(out_f, 1, 0).reshape(NRF, nb * block)[:, :B]
    out_i = jnp.moveaxis(out_i, 1, 0).reshape(NRI, nb * block)[:, :B]
    return _unpack(out_f, out_i, B, P, S, props)


# Largest padded bin count the UNCHUNKED double-single bodies support:
# the lane block cannot shrink below the 128-lane TPU tile, and at block
# 128 the ~18-20 live [NPAD, 128] f32 arrays pass the 16 MB scoped-VMEM
# budget once NPAD reaches 2048 (NPAD=1024 measured 9.3 MB and compiles;
# doubling it mirrors the measured 18.66 MB OOM at NPAD=1024/block=256).
KERNEL_MAX_NPAD = 1024
# The mu-sweep kernel goes one doubling further via sum-chunked
# integration (_integrate_chunked): only segmentation's ~10 live
# [NPAD, 128] arrays remain full-length, which fit at NPAD=2048.
SWEEP_MAX_NPAD = 2048
# The order-1 (mu, beta, dMu) kernel shares that ceiling (VERDICT r4
# item 5): its extrapolation stage adds x' plus S+1 extrapolated key-row
# pairs full-length (~8 extra [NPAD, 128] f32 at nspec=2), which still
# fits next to segmentation's ~10 once the integration is sum-chunked.
# Order 2 keeps the Hessian rows (h00/h01/h11 + db2/dbdd/dd2 pairs)
# live through the x' build and stays at the unchunked limit.
MB_MAX_NPAD = 2048
# The isopleth cell kernel runs TWO extrapolated sources (bracket
# sides) back to back; each side's x'+keys working set is transient —
# only the winning side's x/keys survive into integration — so the
# order-1 cell kernel lifts with the same chunked integration.
ISO_MAX_NPAD = 2048


def kernel_supported(n_bins: int, kernel: str = "generic", order: int = 1) -> bool:
    """True when the double-single kernels can hold this composite's
    working set in scoped VMEM; auto-engine dispatch uses this so an
    oversized composite routes to the XLA engine without burning a
    Mosaic compile or tripping the process-wide kernel-failure memo.

    kernel="sweep" applies the mu-sweep kernel's sum-chunked ceiling
    (VERDICT r3 item 4); "mb"/"iso" apply the extrapolating kernels'
    order-1 sum-chunked ceilings (VERDICT r4 item 5 — order 2 keeps the
    unchunked limit, see MB_MAX_NPAD)."""
    npad = _npad(n_bins)
    if kernel == "sweep":
        return npad <= SWEEP_MAX_NPAD
    if kernel == "mb":
        return npad <= (MB_MAX_NPAD if order == 1 else KERNEL_MAX_NPAD)
    if kernel == "iso":
        return npad <= (ISO_MAX_NPAD if order == 1 else KERNEL_MAX_NPAD)
    return npad <= KERNEL_MAX_NPAD


def default_block(n_bins: int, max_npad: int = KERNEL_MAX_NPAD) -> int:
    """Lane-block size: 256 lanes, dropping to 128 once the [NPAD, block]
    working set passes ~0.5 MB (the kernels keep ~18-20 such arrays live;
    v5e scoped VMEM is 16 MB — the N=573/NPAD=1024 production composite
    measured 18.66 MB at block 256 and compiles at 128).  Measured
    same-run on v5e at B=2M, N=31 (2026-08-17): 256 runs FASTEST (28.2M
    pts/s vs 26.7M at 512, 22.4M at the old 2048 default) AND
    Mosaic-compiles 40-60% faster (~10 s vs 17-30 s live-tunnel; 4096
    VMEM-OOMs outright) — smaller blocks mean fewer vregs per op for the
    same total work, and the per-block fixed cost is negligible.

    Raises for composites past max_npad (KERNEL_MAX_NPAD, or
    SWEEP_MAX_NPAD for the sum-chunked sweep) instead of returning a
    block that would VMEM-OOM at Mosaic compile time (the lane tile
    cannot shrink below 128)."""
    npad = _npad(n_bins)
    if npad > max_npad:
        raise ValueError(
            "composite too large for the pallas kernels: %d bins pads to "
            "NPAD=%d > %d, whose [NPAD, 128] working set exceeds scoped "
            "VMEM; use engine='xla' (auto dispatch does this itself)"
            % (n_bins, npad, max_npad)
        )
    return max(128, min(256, (1 << 17) // npad))


def mu_sweep_thermo_ds(h: Hist, meta: HistMeta, mu_grid, props: bool = True, block: int | None = None, mode: str | None = None, collect=None, sum_chunk=None):
    """Drop-in for pipeline.mu_sweep_thermo running the fused point
    pipeline as one double-single Pallas kernel (see module docstring).

    mode: "pallas" (compiled kernel, TPU), "xla" (EAGER reference path —
    CPU tests; see _sweep_ds_xla for why it is not jitted), or
    "interpret" (pallas interpreter, smoke tests only; minutes-slow to
    lower).  None auto-selects pallas on TPU, xla elsewhere.  Output dict
    matches mu_sweep_thermo plus the per-phase property arrays (n_i
    [B,P,S], ntot/u/density [B,P], x_i [B,P,S]) since the key-row
    contraction is fused in.
    """
    if mode is None:
        mode = "pallas" if jax.default_backend() == "tpu" else "xla"
    npad = _npad(h.lnpi.shape[-1])
    if sum_chunk is None and npad > KERNEL_MAX_NPAD:
        # sum-chunked integration: the only mode whose VMEM working set
        # fits past NPAD=1024 (chunk 512 keeps the per-chunk arrays at
        # 512x128 f32 = 256 KB each)
        sum_chunk = 512
    if block is None:
        block = default_block(h.lnpi.shape[-1], max_npad=SWEEP_MAX_NPAD)
    mu_grid = jnp.asarray(mu_grid, dtype=jnp.float64)
    if mode == "xla":
        return _sweep_ds_xla(h, meta, mu_grid, props, collect, sum_chunk)
    return _sweep_ds_pallas(h, meta, mu_grid, props, block, mode == "interpret", collect, sum_chunk)
