"""Fused isopleth cell evaluation as a Pallas double-single kernel.

One lane = one (mu_1, dMu_2) grid cell of the binary isopleth surface
(gc_binary.pyx:355-476): select the two bracketing source histograms,
reweight + jointly Taylor-extrapolate each (the shared
pallas_mb.extrap_source_lanes body, orders 1-2), inverse-distance mix,
then segment/integrate via the shared thermo_lanes stage, apply the
edge-effect and is_safe guards, and emit the most-stable phase's
(x_1, density, F.E./kT).

Source selection is a one-hot combine over the W sources' constant rows
(W is small — 2-8 histograms per isopleth); every per-source constant
(lnpi, key rows, semigrand derivative rows, mu_ref, dMu_2) lives in the
kernel's VMEM const block.  Per-lane cost is ~2x the mu-beta kernel (two
bracket sides) plus the W-way selects and the mix.

This engine is OPT-IN (isopleth.make_grid(engine="pallas")): its Mosaic
compile is the largest of the three kernels, so the default stays the
batched XLA path; use it for production-size grids where the compile
amortizes.
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
from .pallas_mb import _bcast_scalar, _const_block_mb, _unpack_cst_mb, extrap_source_lanes
from .pallas_sweep import F32, I32, ISO_MAX_NPAD, KERNEL_MAX_NPAD, _npad, default_block, thermo_lanes
from .state import Hist

__all__ = ["iso_grid_ds"]


def _real_mask(rows, N):
    return rows < N


def _sel_pair(pairs, idx):
    """One-hot combine of W constant pair rows on a per-lane index."""
    hh = jnp.zeros(jnp.broadcast_shapes(pairs[0][0].shape, idx.shape), F32)
    ll = jnp.zeros_like(hh)
    for j, (ph, pl_) in enumerate(pairs):
        on = idx == j
        hh = hh + jnp.where(on, ph, F32(0.0))
        ll = ll + jnp.where(on, pl_, F32(0.0))
    return hh, ll


def _sel_src(srcs, idx):
    """One-hot combine a whole per-source dict (pallas_mb src layout)."""
    out = {"lnpi": _sel_pair([s["lnpi"] for s in srcs], idx)}
    K = len(srcs[0]["keys"])
    out["keys"] = [_sel_pair([s["keys"][k] for s in srcs], idx) for k in range(K)]
    out["dkeydB"] = [_sel_pair([s["dkeydB"][k] for s in srcs], idx) for k in range(K)]
    S1 = len(srcs[0]["dkeydMU"])
    out["dkeydMU"] = [
        [_sel_pair([s["dkeydMU"][q][k] for s in srcs], idx) for k in range(K)] for q in range(S1)
    ]
    out["dmuref"] = [_sel_pair([s["dmuref"][q] for s in srcs], idx) for q in range(S1)]
    if srcs[0].get("o2") is not None:
        f11 = _sel_pair([s["o2"][0] for s in srcs], idx)
        sgB2 = [_sel_pair([s["o2"][1][k] for s in srcs], idx) for k in range(K)]
        sgX = [_sel_pair([s["o2"][2][k] for s in srcs], idx) for k in range(K)]
        sgM2 = [_sel_pair([s["o2"][3][k] for s in srcs], idx) for k in range(K)]
        prows = [_sel_pair([s["o2"][4 + i] for s in srcs], idx) for i in range(3)]
        out["o2"] = (f11, sgB2, sgX, sgM2, *prows)
    else:
        out["o2"] = None
    return out


def iso_block_lanes(lane_f, lane_i, cst_list, shared, N, smooth, P, S, order, cutoff, barriers=False, collect=None, sum_chunk=None):
    """One block of isopleth cells in lanes layout (pure jnp).

    lane_f: [8, L] f32 — pairs (mu1, dmu2_t, w0, w1)
    lane_i: [2, L] i32 — left/right source indices
    cst_list: per-source dicts (pallas_mb src layout + mu_ref/dmu2 pairs)
    shared: dict(op [NPAD,1], beta_ref pair, dB pair, vol pair)
    sum_chunk: chunked integration (pallas_sweep._integrate_chunked) —
    lifts the order-1 cell kernel past NPAD=1024 (VERDICT r4 item 5).
    """
    if sum_chunk is not None:
        if order != 1:
            raise NotImplementedError("sum-chunked iso cell body is order-1 only (MB_MAX_NPAD note)")
        return _iso_chunked_lanes(lane_f, lane_i, cst_list, shared, N, smooth, P, S, cutoff, barriers, collect, sum_chunk)
    op = shared["op"]
    NPAD = op.shape[0]
    L = lane_f.shape[-1]
    rows = lax.broadcasted_iota(I32, (NPAD, L), 0)
    real = _real_mask(rows, N)

    def fpair(i):
        return lane_f[2 * i : 2 * i + 1], lane_f[2 * i + 1 : 2 * i + 2]

    mu1 = fpair(0)
    dmu2t = fpair(1)
    w0 = fpair(2)
    w1 = fpair(3)
    idxL = lane_i[0:1]
    idxR = lane_i[1:2]

    brh, brl = shared["beta_ref"]
    br_row = (brh + jnp.zeros_like(mu1[0]), brl + jnp.zeros_like(mu1[1]))
    db_row = (shared["dB"][0] + jnp.zeros_like(mu1[0]), shared["dB"][1] + jnp.zeros_like(mu1[1]))
    last = np.int32(N - 1)

    def side(idx):
        src = _sel_src(cst_list, idx)
        mu_ref = _sel_pair([s["mu_ref"] for s in cst_list], idx)
        dmu2_j = _sel_pair([s["dmu2"] for s in cst_list], idx)
        a = ds.ds_mul(*br_row, *ds.ds_sub(*mu1, *mu_ref))
        dd = ds.ds_sub(*dmu2t, *dmu2_j)
        lanes = {"a": a, "mu": mu1, "db": db_row, "dds": [dd]}
        xh, xl, keys2, (mh, ml) = extrap_source_lanes(
            op, real, src, lanes, (brh, brl), S, order, False, True
        )
        # edge guard on the REWEIGHTED surface (isopleth.py stage 1):
        # (max - cutoff) > lnpi_rw[N-1]; x_rw[N-1] = lnpi[N-1] + a*op[N-1]
        ln_l = (src["lnpi"][0][last : last + 1], src["lnpi"][1][last : last + 1])
        op_l = op[last : last + 1] + jnp.zeros_like(a[0])  # [1,L]
        tail = ds.ds_add(*ln_l, *ds.ds_mul(*a, op_l, jnp.zeros_like(op_l)))
        mc = ds.ds_add_f32(mh, ml, F32(-cutoff))
        edge = ds.ds_gt(*mc, *tail)
        return xh, xl, keys2, edge

    xLh, xLl, keysL, edgeL = side(idxL)
    xRh, xRl, keysR, edgeR = side(idxR)

    # inverse-distance mix (gc_binary.pyx:457-460): (L w0 + R w1)/(w0+w1)
    wsum = ds.ds_add(*w0, *w1)

    def mix(ah, al, bh, bl):
        t0 = ds.ds_mul(ah, al, *_bcast_scalar2(w0, ah))
        t1 = ds.ds_mul(bh, bl, *_bcast_scalar2(w1, bh))
        num = ds.ds_add(*t0, *t1)
        return ds.ds_div(*num, *_bcast_scalar2(wsum, num[0]))

    ln_m = mix(xLh, xLl, xRh, xRl)
    keys_m = [mix(keysL[k][0], keysL[k][1], keysR[k][0], keysR[k][1]) for k in range(S + 1)]

    pt = thermo_lanes(ln_m[0], ln_m[1], rows, keys_m, shared["vol"], N, smooth, P, True, barriers, collect, sum_chunk=sum_chunk)
    return _iso_finish(pt, ln_m, edgeL, edgeR, N, P, cutoff)


def _iso_finish(pt, ln_m, edgeL, edgeR, N, P, cutoff):
    """Guards + most-stable-phase pick + output packing — shared tail of
    the materialized and sum-chunked cell bodies."""
    last = np.int32(N - 1)
    # is_safe (gc_hist.pyx:556-596): value at the LAST maximum minus the
    # tail must reach cutoff; the last phase's pair max IS that value
    n_max = pt["n_phases"]
    pm_h, pm_l = pt["phase_max"]  # stacked [P, L]
    riP = lax.broadcasted_iota(I32, pm_h.shape, 0)
    on_last = riP == (n_max - np.int32(1))
    lmh = jnp.sum(jnp.where(on_last, pm_h, F32(0.0)), axis=0, keepdims=True)
    lml = jnp.sum(jnp.where(on_last, pm_l, F32(0.0)), axis=0, keepdims=True)
    tail_m = (ln_m[0][last : last + 1], ln_m[1][last : last + 1])
    diff = ds.ds_sub(lmh, lml, *tail_m)
    safe = ~ds.ds_lt(*diff, F32(cutoff), F32(0.0))
    guard = safe & edgeL & edgeR
    ok = pt["valid"] & guard
    # per-cell failure reason, matching binary.isopleth FAIL_* codes
    # (0 ok / 1 edge-unsafe / 2 segmentation-invalid / 3 phase overflow);
    # np.int32 constants: weak python ints trace as i64 under x64 and
    # Mosaic rejects them
    overflow = n_max > np.int32(P)
    code = jnp.where(
        pt["valid"],
        jnp.where(guard, np.int32(0), np.int32(1)),
        jnp.where(overflow, np.int32(3), np.int32(2)),
    )

    # most stable phase: masked lexicographic argmin of the stacked pair
    # free energies; ties keep the lowest slot (the serial loop's rule)
    fe_h, fe_l = pt["fe"]
    cand_h = jnp.where(pt["mask"], fe_h, F32(jnp.inf))
    cand_l = jnp.where(pt["mask"], fe_l, F32(jnp.inf))
    best_h = jnp.min(cand_h, axis=0, keepdims=True)
    best_l = jnp.min(jnp.where(cand_h == best_h, cand_l, F32(jnp.inf)), axis=0, keepdims=True)
    tie = (cand_h == best_h) & (cand_l == best_l)
    stable = jnp.min(jnp.where(tie, riP, np.int32(jnp.iinfo(jnp.int32).max)), axis=0, keepdims=True)

    def pick(stk):
        on = riP == stable
        hh = jnp.sum(jnp.where(on, stk[0], F32(0.0)), axis=0, keepdims=True)
        ll = jnp.sum(jnp.where(on, stk[1], F32(0.0)), axis=0, keepdims=True)
        return hh, ll

    z = pick(pt["x_i"][0])
    rho = pick(pt["density"])
    fe = pick(pt["fe"])

    def gate(pair):
        return (jnp.where(ok, pair[0], F32(0.0)), jnp.where(ok, pair[1], F32(0.0)))

    z, rho, fe = gate(z), gate(rho), gate(fe)
    out_i = jnp.concatenate([ok.astype(I32), code], axis=0)
    return jnp.concatenate([z[0], z[1], rho[0], rho[1], fe[0], fe[1]], axis=0), out_i


def _bcast_scalar2(pair, like_h):
    """[1,L] pair against a possibly-[NPAD,L] array (sublane broadcast)."""
    return pair[0] + jnp.zeros_like(like_h), pair[1] + jnp.zeros_like(like_h)


def _sel_pair_rows(pairs, idx, r0, rN, z):
    """_sel_pair on a row slice: one-hot combine of the W sources'
    [NPAD, 1] const rows over rows [r0, rN), broadcast to the chunk
    shape z ([TN, L]).  Evaluated per chunk so the selected rows never
    materialize full-length (the iso kernel measured 46.12 MB scoped
    VMEM at NPAD=2048 with full-length selection — ~20 selected
    [NPAD, L] arrays per bracket side)."""
    hh = jnp.zeros_like(z)
    ll = jnp.zeros_like(z)
    for j, (ph, pl_) in enumerate(pairs):
        on = idx == j
        hh = hh + jnp.where(on, ph[r0:rN] + z, F32(0.0))
        ll = ll + jnp.where(on, pl_[r0:rN] + z, F32(0.0))
    return hh, ll


def _iso_chunked_lanes(lane_f, lane_i, cst_list, shared, N, smooth, P, S, cutoff, barriers, collect, TN):
    """Order-1 cell body with EVERY per-side full-length intermediate
    chunked (VERDICT r4 item 5): source selection, reweight, the GC
    averages (two chunked passes: lexicographic max, then shifted-exp
    sums), the extrapolated x' build and the bracket mix all run one
    [TN, L] chunk at a time; only the MIXED surface (segmentation input)
    is materialized, and the mixed key rows reach the chunked
    integration as callables.  Chunk sums reassociate the GC averages at
    the ~2^-49 level (same contract as _integrate_chunked), so x' — and
    in principle a segmentation decision at an exact float tie — can
    differ from the materialized body at pair precision; the CPU parity
    tests at N=1400 hold to 1e-9 vs the XLA engine.
    """
    from .pallas_sweep import _masked_pair_max, _pair_max2

    op = shared["op"]
    NPAD = op.shape[0]
    assert NPAD % TN == 0, (NPAD, TN)
    nt = NPAD // TN
    L = lane_f.shape[-1]
    brk = lax.optimization_barrier if barriers else (lambda t: t)
    neg_inf = F32(-jnp.inf)
    S1 = S - 1
    last = np.int32(N - 1)

    def fpair(i):
        return lane_f[2 * i : 2 * i + 1], lane_f[2 * i + 1 : 2 * i + 2]

    mu1 = fpair(0)
    dmu2t = fpair(1)
    w0 = fpair(2)
    w1 = fpair(3)
    idxL = lane_i[0:1]
    idxR = lane_i[1:2]

    brh, brl = shared["beta_ref"]
    br_row = (brh + jnp.zeros_like(mu1[0]), brl + jnp.zeros_like(mu1[1]))
    db_row = (shared["dB"][0] + jnp.zeros_like(mu1[0]), shared["dB"][1] + jnp.zeros_like(mu1[1]))

    lnpi_rows = [s["lnpi"] for s in cst_list]
    key_rows = [[s["keys"][k] for s in cst_list] for k in range(S + 1)]
    dkB_rows = [[s["dkeydB"][k] for s in cst_list] for k in range(S + 1)]
    dkM_rows = [[[s["dkeydMU"][q][k] for s in cst_list] for k in range(S + 1)] for q in range(S1)]

    def chunk_real(t):
        # fresh iota + constant offset per chunk (PERFORMANCE.md §8:
        # offset-slicing a broadcasted iota along sublanes SIGABRTs)
        return (lax.broadcasted_iota(I32, (TN, L), 0) + np.int32(t * TN)) < N

    def side(idx):
        """Per-side scalars from two chunked passes + the lane rows the
        chunk callbacks close over."""
        mu_ref = _sel_pair([s["mu_ref"] for s in cst_list], idx)
        dmu2_j = _sel_pair([s["dmu2"] for s in cst_list], idx)
        dmuref = [_sel_pair([s["dmuref"][q] for s in cst_list], idx) for q in range(S1)]
        a = ds.ds_mul(*br_row, *ds.ds_sub(*mu1, *mu_ref))
        dd = ds.ds_sub(*dmu2t, *dmu2_j)
        sd = {"idx": idx, "a": a, "dd": dd, "dmuref": dmuref}

        def x_rw(t, z):
            # reweight x = lnpi + a*op on rows [t*TN, (t+1)*TN)
            r0, rN = t * TN, (t + 1) * TN
            lh, ll = _sel_pair_rows(lnpi_rows, idx, r0, rN, z)
            op_t = op[r0:rN]
            ph, pe = ds.two_prod(a[0], op_t)
            pe = pe + a[1] * op_t
            aoh, aol = ds.quick_two_sum(ph, pe)
            return ds.ds_add(lh, ll + jnp.zeros_like(aol), aoh, aol)

        # pass A: lexicographic pair max of the reweighted surface
        mh = jnp.full((1, L), -jnp.inf, F32)
        ml = jnp.full((1, L), -jnp.inf, F32)
        for t in range(nt):
            z = jnp.zeros((TN, L), F32)
            xh_t, xl_t = x_rw(t, z)
            ch, cl = _masked_pair_max(xh_t, xl_t, chunk_real(t), neg_inf)
            mh, ml = _pair_max2(mh, ml, ch, cl)
        sd["m"] = brk((mh, ml))

        # pass B: shifted-exp sums -> s0 and the S+1 key averages
        zero = jnp.zeros((1, L), F32)
        s0 = (zero, zero)
        ksums = [(zero, zero) for _ in range(S + 1)]
        for t in range(nt):
            z = jnp.zeros((TN, L), F32)
            r0, rN = t * TN, (t + 1) * TN
            xh_t, xl_t = x_rw(t, z)
            th, tl = ds.ds_sub(xh_t, xl_t, mh, ml)
            eh, el = ds.ds_exp_shifted(th, tl)
            real_t = chunk_real(t)
            eh = jnp.where(real_t, eh, F32(0.0))
            el = jnp.where(real_t, el, F32(0.0))
            s0 = ds.ds_add(*s0, *ds.ds_sum_pairs(eh, el, axis=0))
            for k in range(S + 1):
                kh, kl = _sel_pair_rows(key_rows[k], idx, r0, rN, z)
                qh, ql = ds.ds_mul(eh, el, kh, kl)
                ksums[k] = ds.ds_add(*ksums[k], *ds.ds_sum_pairs(qh, ql, axis=0))
        av = brk([ds.ds_div(*ksums[k], *s0) for k in range(S + 1)])
        sd["av_ni"], sd["avu"] = av[:S], av[S]
        nth, ntl = sd["av_ni"][0]
        for i in range(1, S):
            nth, ntl = ds.ds_add(nth, ntl, *sd["av_ni"][i])
        sd["ntot"] = (nth, ntl)

        def x_chunk(t, z):
            # x' = x + dB*dlnPI/dB + sum_q dDmu_q beta_ref (N_{q+1}-<N_{q+1}>)
            # (extrap_source_lanes order-1 body on a row chunk)
            r0, rN = t * TN, (t + 1) * TN
            xh, xl = x_rw(t, z)
            d1b_h = jnp.zeros_like(xh)
            d1b_l = jnp.zeros_like(xl)
            keys_t = [_sel_pair_rows(key_rows[k], idx, r0, rN, z) for k in range(S + 1)]
            for i in range(1, S):
                fh, fl = ds.ds_sub(*keys_t[i], *sd["av_ni"][i])
                gh, gl = ds.ds_mul(fh, fl, *_bcast_scalar(sd["dmuref"][i - 1][0], sd["dmuref"][i - 1][1], fh))
                d1b_h, d1b_l = ds.ds_add(d1b_h, d1b_l, gh, gl)
            op_t = op[r0:rN]
            oph, opl = ds.ds_sub(op_t + z, jnp.zeros_like(z), *sd["ntot"])
            gh, gl = ds.ds_mul(mu1[0] + jnp.zeros_like(oph), mu1[1] + jnp.zeros_like(opl), oph, opl)
            d1b_h, d1b_l = ds.ds_add(d1b_h, d1b_l, gh, gl)
            fh, fl = ds.ds_sub(*keys_t[S], *sd["avu"])
            d1b_h, d1b_l = ds.ds_sub(d1b_h, d1b_l, fh, fl)
            gh, gl = ds.ds_mul(db_row[0] + jnp.zeros_like(d1b_h), db_row[1] + jnp.zeros_like(d1b_l), d1b_h, d1b_l)
            xh, xl = ds.ds_add(xh, xl, gh, gl)
            for q in range(S1):
                fh, fl = ds.ds_sub(*keys_t[q + 1], *sd["av_ni"][q + 1])
                fh, fl = ds.ds_mul(fh, fl, *_bcast_scalar(brh, brl, fh))
                gh, gl = ds.ds_mul(sd["dd"][0] + jnp.zeros_like(fh), sd["dd"][1] + jnp.zeros_like(fl), fh, fl)
                xh, xl = ds.ds_add(xh, xl, gh, gl)
            return xh, xl

        def key_chunk(k, r0, rN, z):
            # keys2[k] = key + dB*dkeydB + sum_q dDmu_q*dkeydMU_q
            kh, kl = _sel_pair_rows(key_rows[k], idx, r0, rN, z)
            bh, bl = _sel_pair_rows(dkB_rows[k], idx, r0, rN, z)
            gh, gl = ds.ds_mul(db_row[0] + z, db_row[1] + z, bh, bl)
            kh, kl = ds.ds_add(kh, kl, gh, gl)
            for q in range(S1):
                qh_, ql_ = _sel_pair_rows(dkM_rows[q][k], idx, r0, rN, z)
                gh, gl = ds.ds_mul(sd["dd"][0] + z, sd["dd"][1] + z, qh_, ql_)
                kh, kl = ds.ds_add(kh, kl, gh, gl)
            return kh, kl

        sd["x_chunk"] = x_chunk
        sd["key_chunk"] = key_chunk

        # edge guard on the REWEIGHTED surface: (max - cutoff) > x_rw[N-1]
        ln_l = _sel_pair([(sp["lnpi"][0][last : last + 1], sp["lnpi"][1][last : last + 1]) for sp in cst_list], idx)
        op_l = op[last : last + 1] + jnp.zeros_like(a[0])
        tail = ds.ds_add(*ln_l, *ds.ds_mul(*a, op_l, jnp.zeros_like(op_l)))
        mc = ds.ds_add_f32(mh, ml, F32(-cutoff))
        sd["edge"] = ds.ds_gt(*mc, *tail)
        return sd

    sdL = side(idxL)
    sdR = side(idxR)

    # inverse-distance mix (gc_binary.pyx:457-460), chunk by chunk; only
    # the mixed surface materializes (segmentation needs it full-length)
    wsum = ds.ds_add(*w0, *w1)

    def mix(ah, al, bh, bl):
        t0 = ds.ds_mul(ah, al, *_bcast_scalar2(w0, ah))
        t1 = ds.ds_mul(bh, bl, *_bcast_scalar2(w1, bh))
        num = ds.ds_add(*t0, *t1)
        return ds.ds_div(*num, *_bcast_scalar2(wsum, num[0]))

    mixed = []
    for t in range(nt):
        z = jnp.zeros((TN, L), F32)
        mixed.append(brk(mix(*sdL["x_chunk"](t, z), *sdR["x_chunk"](t, z))))
    ln_m = (
        jnp.concatenate([mh_ for mh_, _ in mixed], axis=0),
        jnp.concatenate([ml_ for _, ml_ in mixed], axis=0),
    )

    def make_mixed_key(k):
        def f(r0, rN):
            z = jnp.zeros((rN - r0, L), F32)
            return mix(*sdL["key_chunk"](k, r0, rN, z), *sdR["key_chunk"](k, r0, rN, z))

        return f

    keys_m = [make_mixed_key(k) for k in range(S + 1)]

    rows = lax.broadcasted_iota(I32, (NPAD, L), 0)
    pt = thermo_lanes(ln_m[0], ln_m[1], rows, keys_m, shared["vol"], N, smooth, P, True, barriers, collect, sum_chunk=TN)
    return _iso_finish(pt, ln_m, sdL["edge"], sdR["edge"], N, P, cutoff)



# ----------------------------------------------------------------------
# const packing: per-source mb blocks + per-source scalars + shared rows
# ----------------------------------------------------------------------


def _iso_const(sources, metas, NPAD, order, beta_target):
    """Concatenate per-source _const_block_mb blocks, their (mu_ref,
    dmu2) scalar pairs, and the shared (dB,) scalar pair."""
    segs = [_const_block_mb(h, m, NPAD, order).reshape(-1) for h, m in zip(sources, metas)]
    scal = []
    for h in sources:
        scal.append(h.curr_mu[0].reshape(1))
        scal.append((h.curr_mu[1] - h.curr_mu[0]).reshape(1))
    scal.append((jnp.asarray(beta_target, dtype=jnp.float64) - sources[0].curr_beta).reshape(1))
    sh, sl = ds.split_f64(jnp.concatenate(scal))
    return jnp.concatenate(segs + [sh, sl])[:, None]


def _iso_unpack(cst, N, S, order, W):
    NPAD = _npad(N)
    per = _mb_len(N, S, order)
    srcs = []
    at = 0
    for j in range(W):
        lnpi, op, keys, dkeydB, dkeydMU, vol, beta_ref, dmuref, o2 = _unpack_cst_mb(
            cst[at : at + per], N, S, order
        )
        srcs.append(
            {
                "lnpi": lnpi,
                "keys": keys,
                "dkeydB": dkeydB,
                "dkeydMU": dkeydMU,
                "dmuref": dmuref,
                "o2": o2,
                "op": op,
                "vol": vol,
                "beta_ref": beta_ref,
            }
        )
        at += per
    nsc = 2 * W + 1
    sh = cst[at : at + nsc]
    sl = cst[at + nsc : at + 2 * nsc]
    for j in range(W):
        srcs[j]["mu_ref"] = (sh[2 * j : 2 * j + 1], sl[2 * j : 2 * j + 1])
        srcs[j]["dmu2"] = (sh[2 * j + 1 : 2 * j + 2], sl[2 * j + 1 : 2 * j + 2])
    shared = {
        "op": srcs[0]["op"],
        "vol": srcs[0]["vol"],
        "beta_ref": srcs[0]["beta_ref"],
        "dB": (sh[2 * W : 2 * W + 1], sl[2 * W : 2 * W + 1]),
    }
    return srcs, shared


def _mb_len(N, S, order):
    """Row count of one _const_block_mb block (lnpi pair + op, keys and
    dkeydB pairs, dkeydMU pairs, scalar rows; order-2 extras)."""
    NPAD = _npad(N)
    K = S + 1
    n = 3 * NPAD + 4 * K * NPAD + 2 * (S - 1) * K * NPAD + 2 * (2 + (S - 1))
    if order >= 2:
        n += 8 * NPAD + 6 * K * NPAD
    return n


# ----------------------------------------------------------------------
# pallas_call shell + eager XLA reference
# ----------------------------------------------------------------------


def _kernel(lf_ref, li_ref, cst_ref, out_f_ref, out_i_ref, *, N, smooth, P, S, order, cutoff, W, collect, sum_chunk=None):
    srcs, shared = _iso_unpack(cst_ref[:], N, S, order, W)
    f, i = iso_block_lanes(lf_ref[0], li_ref[0], srcs, shared, N, smooth, P, S, order, cutoff, collect=collect, sum_chunk=sum_chunk)
    out_f_ref[0] = f
    out_i_ref[0] = i


def _lanes(mu1_v, dmu2_v, lr, wts, block, nb):
    """Flatten the (dmu2, mu1) cell product to padded [nb, rows, block]
    lane arrays.  Pure jnp so it traces into the end-to-end jit of
    _iso_ds_pallas (one device launch) and runs eagerly for the XLA
    reference path; nb is the static block count -(-NY*NX // block)."""
    mu1_v = jnp.asarray(mu1_v)
    dmu2_v = jnp.asarray(dmu2_v)
    lr = jnp.asarray(lr)
    wts = jnp.asarray(wts)
    NY, NX = dmu2_v.shape[0], mu1_v.shape[0]
    B = NY * NX
    mu1 = jnp.broadcast_to(mu1_v[None, :], (NY, NX)).reshape(-1)
    dmu2 = jnp.broadcast_to(dmu2_v[:, None], (NY, NX)).reshape(-1)
    w0 = jnp.broadcast_to(wts[:, 0:1], (NY, NX)).reshape(-1)
    w1 = jnp.broadcast_to(wts[:, 1:2], (NY, NX)).reshape(-1)
    iL = jnp.broadcast_to(lr[:, 0:1], (NY, NX)).reshape(-1).astype(jnp.int32)
    iR = jnp.broadcast_to(lr[:, 1:2], (NY, NX)).reshape(-1).astype(jnp.int32)

    def prep(v):
        if nb * block != B:
            v = jnp.concatenate([v, jnp.broadcast_to(v[-1:], (nb * block - B,))])
        return v.reshape(nb, 1, block)

    frows = []
    for v in (mu1, dmu2, w0, w1):
        vh, vl = ds.split_f64(prep(v))
        frows += [vh, vl]
    lf = jnp.concatenate(frows, axis=1)
    li = jnp.concatenate([prep(iL), prep(iR)], axis=1).astype(jnp.int32)
    return lf, li


def _launch(lf, li, cst, N, smooth, P, S, order, cutoff, W, block, nb, interpret, collect=None, sum_chunk=None):
    NRF, NRI = 6, 2
    import sys

    if sys.getrecursionlimit() < 40000:
        sys.setrecursionlimit(40000)
    Z = np.int32(0)
    out_f, out_i = pl.pallas_call(
        partial(_kernel, N=N, smooth=smooth, P=P, S=S, order=order, cutoff=cutoff, W=W, collect=collect, sum_chunk=sum_chunk),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 8, block), lambda i: (i, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, block), lambda i: (i, Z, Z), memory_space=pltpu.VMEM),
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
    )(lf, li, cst)
    out_f = jnp.moveaxis(out_f, 1, 0).reshape(NRF, nb * block)
    out_i = jnp.moveaxis(out_i, 1, 0).reshape(NRI, nb * block)
    return out_f, out_i


@partial(jax.jit, static_argnames=("metas", "order", "cutoff", "block", "nb", "interpret", "collect", "sum_chunk"))
def _iso_ds_pallas(sources, metas, mu1_v, dmu2_v, lr, wts, beta_target, order, cutoff, block, nb, interpret, collect=None, sum_chunk=None):
    """End-to-end jitted kernel path: const packing (DerivEngine key/sg
    rows), lane prep, the pallas_call, and the f64 joins all trace into
    ONE device launch — mirroring pallas_mb._mb_ds_pallas.  The pre-jit
    version ran _iso_const/_lanes eagerly, and their hundreds of small
    ops cost a flat ~1.1 s/call through the TPU tunnel (the 2026-08-18
    crossover curve: kernel warm time was launch-bound and flat from
    5.9k to 252k cells)."""
    meta = metas[0]
    P, S = meta.max_phases, meta.nspec
    N = sources[0].lnpi.shape[-1]
    NPAD = _npad(N)
    W = len(sources)
    NY, NX = dmu2_v.shape[0], mu1_v.shape[0]
    B = NY * NX
    lf, li = _lanes(mu1_v, dmu2_v, lr, wts, block, nb)
    cst = _iso_const(sources, metas, NPAD, order, beta_target)
    out_f, out_i = _launch(lf, li, cst, N, meta.smooth, P, S, order, cutoff, W, block, nb, interpret, collect, sum_chunk)
    out_f = out_f[:, :B]
    out_i = out_i[:, :B]
    z = ds.join_f64(out_f[0], out_f[1]).reshape(NY, NX)
    rho = ds.join_f64(out_f[2], out_f[3]).reshape(NY, NX)
    fe = ds.join_f64(out_f[4], out_f[5]).reshape(NY, NX)
    ok = out_i[0].reshape(NY, NX).astype(bool)
    code = out_i[1].reshape(NY, NX)
    return z, rho, fe, ok, code


def _iso_ds_xla(sources, metas, mu1_v, dmu2_v, lr, wts, beta_target, order, cutoff, collect=None, sum_chunk=None):
    """EAGER reference path (CPU tests); same body, one block."""
    meta = metas[0]
    P, S = meta.max_phases, meta.nspec
    N = sources[0].lnpi.shape[-1]
    NPAD = _npad(N)
    W = len(sources)
    NY, NX = len(dmu2_v), len(mu1_v)
    B = NY * NX
    lf, li = _lanes(mu1_v, dmu2_v, lr, wts, block=B, nb=1)
    cst = _iso_const(sources, metas, NPAD, order, beta_target)
    srcs, shared = _iso_unpack(cst, N, S, order, W)
    f, i = iso_block_lanes(lf[0], li[0], srcs, shared, N, meta.smooth, P, S, order, cutoff, barriers=True, collect=collect, sum_chunk=sum_chunk)
    z = ds.join_f64(f[0], f[1]).reshape(NY, NX)
    rho = ds.join_f64(f[2], f[3]).reshape(NY, NX)
    fe = ds.join_f64(f[4], f[5]).reshape(NY, NX)
    ok = i[0].reshape(NY, NX).astype(bool)
    code = i[1].reshape(NY, NX)
    return z, rho, fe, ok, code


def iso_grid_ds(sources, metas, mu1_v, dmu2_v, lr, wts, beta_target, order, cutoff, block=None, mode=None, collect=None, device=None, sum_chunk=None):
    """Evaluate an isopleth grid block with the fused cell kernel.

    sources: list of Hist; lr/wts: host bracket indices/weights per dmu2
    row.  Returns (Z, density, fe, ok, fail_code) as [NY, NX]
    f64/bool/i32 arrays, matching isopleth._grid_eval's outputs
    (fail_code uses the binary.isopleth FAIL_* encoding).

    device: optional jax.Device — pin the whole block (input placement +
    kernel launch) to one device.  Cells are independent, so a mesh
    caller can split the mu_1 axis into per-device blocks and dispatch
    this kernel once per chip (isopleth._grid_block_kernel); dispatch is
    async, so the chips run concurrently.

    The isopleth constructor validates nspec and beta_ref only, so the
    kernel's shared-row assumptions are checked HERE: all sources must
    share the op grid and volume (the kernel packs source[0]'s rows once).
    """
    if device is not None:
        with jax.default_device(device):
            return iso_grid_ds(
                sources, metas, mu1_v, dmu2_v, lr, wts, beta_target, order, cutoff,
                block=block, mode=mode, collect=collect, sum_chunk=sum_chunk,
            )
    srcs_np = [np.asarray(h.op) for h in sources]
    for j, o in enumerate(srcs_np[1:], 1):
        if o.shape != srcs_np[0].shape or not np.array_equal(o, srcs_np[0]):
            raise ValueError("isopleth kernel requires identical order-parameter grids; source %d differs" % j)
        if float(sources[j].volume) != float(sources[0].volume):
            raise ValueError("isopleth kernel requires identical volumes; source %d differs" % j)
    if mode is None:
        mode = "pallas" if jax.default_backend() == "tpu" else "xla"
    npad = _npad(sources[0].lnpi.shape[-1])
    if sum_chunk is None and npad > KERNEL_MAX_NPAD:
        if order >= 2:
            raise NotImplementedError("order-2 iso kernel supports NPAD<=1024; use engine='xla'")
        sum_chunk = 512  # chunked integration (VERDICT r4 item 5, rule 15)
    if block is None:
        block = default_block(sources[0].lnpi.shape[-1], max_npad=ISO_MAX_NPAD if order == 1 else KERNEL_MAX_NPAD)
    sources = tuple(sources)
    metas = tuple(metas)
    if order == 2 and metas[0].nspec != 2:
        raise NotImplementedError("order-2 kernel is nspec==2 only")
    if collect not in (None, "janus"):
        raise NotImplementedError("lanes collect transforms: only 'janus'")
    if mode == "xla":
        return _iso_ds_xla(sources, metas, mu1_v, dmu2_v, np.asarray(lr), np.asarray(wts), beta_target, order, cutoff, collect, sum_chunk)
    nb = -(-(len(mu1_v) * len(dmu2_v)) // block)
    return _iso_ds_pallas(
        sources, metas, jnp.asarray(mu1_v), jnp.asarray(dmu2_v),
        jnp.asarray(np.asarray(lr), dtype=jnp.int32), jnp.asarray(np.asarray(wts), dtype=jnp.float64),
        jnp.asarray(float(beta_target), dtype=jnp.float64), order, float(cutoff), block, nb,
        mode == "interpret", collect, sum_chunk,
    )
