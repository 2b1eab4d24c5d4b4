"""Fused (mu, beta, dMu)-extrapolating sweep as a Pallas double-single kernel.

The XLA path (pipeline.mu_beta_sweep_thermo) evaluates reweight -> joint
order-1 Taylor extrapolation (temp_dmu_extrap_key) -> thermo per (mu,
target) point; its per-point cost is dominated by TPU-emulated f64
element-wise work — the same profile the plain sweep had before the
double-single kernel (core/pallas_sweep.py) made it 2.1x faster.

The enabling observation: at order 1 the SEMIGRAND derivative rows of the
key moments (sg_dX_dB / sg_dX_dMU, gc_hist.pyx:1660-1775) are per-N
fluctuations of the mom tensor only — independent of the reweight mu — so
they are precomputed ONCE on the host side of the launch.  Only the
GRAND-CANONICAL averages <N_i>, <U> in dlnPI/dB and dlnPI/dDmu
(gc_hist.pyx:2146-2149, 2368-2370) depend on the per-lane mu, and those
are S+2 masked pair tree-sums per lane — cheap next to the segmentation +
integration stages the kernel already runs.

Kernel stages per lane (one (mu, beta_t, dmu_t) state point):
  x  = lnpi + beta_ref (mu - mu_ref) op                  (reweight)
  e  = ds_exp(x - max)   -> S0, S_{N_i}, S_U             (GC averages)
  d1B = sum_i dmuref_i (N_i - <N_i>) + mu (op - <N_tot>) - (U - <U>)
  d1M_q = beta_ref (N_{q+1} - <N_{q+1}>)
  x' = x + dB d1B + sum_q dDmu_q d1M_q                   (Taylor apply)
  key'_k = key_k + dB dkeydB_k + sum_q dDmu_q dkeydMU_qk (precomputed rows)
  thermo_lanes(x', key')                                 (shared stage)

Everything is (hi, lo) f32-pair arithmetic: d1B magnitudes reach
|mu|*op ~ 150, so plain f32 would inject ~1e-5 * dB ~ 1e-6 into x' — far
outside the 1e-8 bar; pairs keep it at ~2^-49 relative.

Order 2 (nspec == 2, the reference's own mom_prod limit) adds the joint
Hessian: the semigrand second-derivative rows (sg_d2X_dB2 / sg_d2X_dMU2 /
the beta-dMu cross, gc_hist.pyx:1776-1868, 2534-2561) are again
mu-independent and precomputed; the per-lane pieces are the gc_dX_dB
chains (gc_hist.pyx:1382-1418), which reduce to seven more pair tree-sums
(<op>, <op^2>, <op N_2>, <op U>, <N_2 N_2>, <N_2 U>, <U^2>) and scalar
fluctuation algebra on [1, L] rows.
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
from .derivs import DerivEngine
from .pallas_sweep import (
    F32,
    I32,
    KERNEL_MAX_NPAD,
    MB_MAX_NPAD,
    _f_quantities,
    _npad,
    _pack_rows,
    _unpack,
    default_block,
    thermo_lanes,
)
from .state import Hist, HistMeta

__all__ = ["mu_beta_sweep_thermo_ds"]


def _key_addrs(meta: HistMeta):
    """Tuple addresses of the key rows in segment.key_row_addresses order:
    <N_i> per species then <U> (gc_hist.pyx:543-552)."""
    return [(i, 1, 0, 0, 0) for i in range(meta.nspec)] + [(0, 0, 0, 0, 1)]


def _real_mask(rows, N):
    return rows < N


def _bcast_scalar(vh, vl, like_h):
    """[1,1] scalar pair -> full-tile pair in two steps: Mosaic cannot
    broadcast sublanes and lanes in one vector.broadcast."""
    row_h = vh + jnp.zeros((1, like_h.shape[1]), vh.dtype)
    row_l = vl + jnp.zeros((1, like_h.shape[1]), vl.dtype)
    return row_h + jnp.zeros_like(like_h), row_l + jnp.zeros_like(like_h)


def extrap_source_lanes(op, real, src, lanes, beta_ref, S, order, first_order_mom, props, chunk_keys=False):
    """Reweight + joint Taylor extrapolation of ONE source in lanes layout.

    Shared between the mu-beta sweep kernel and the isopleth cell kernel
    (pallas_iso.py), which runs it once per bracket side.

    src: dict with the per-source pair rows — lnpi, keys [K], dkeydB [K],
    dkeydMU [S1][K], dmuref [S1] scalar pairs, and (order 2) the o2 tuple.
    lanes: dict with the per-lane [1, L] pair rows — a (reweight coeff),
    mu (target mu_1), db (beta distance), dds [S1] (dMu distances).
    Returns (xh, xl, keys2, (mh, ml)) with (mh, ml) the pair max of the
    REWEIGHTED surface (edge-effect checks read it).

    chunk_keys (order-1 + props only): return keys2 as CALLABLES
    f(r0, rN) -> ([rN-r0, L] pair) instead of materialized [NPAD, L]
    pairs — the sum-chunked integration (_integrate_chunked) evaluates
    them per chunk, keeping the extrapolated key rows out of the
    full-length VMEM working set (the NPAD=2048 lever, VERDICT r4
    item 5).  The per-chunk math is the identical elementwise ds ops on
    row slices, so results are bitwise equal to the materialized path.
    """
    S1 = S - 1
    lnpi_h, lnpi_l = src["lnpi"]
    keys = src["keys"]
    dkeydB = src["dkeydB"]
    dmuref = src["dmuref"]
    o2 = src.get("o2")
    ah, al = lanes["a"]
    muh, mul = lanes["mu"]
    dbh, dbl = lanes["db"]
    dds = lanes["dds"]

    # ---- reweight: x = lnpi + a*op (pallas_sweep parity) ----
    ph, pe = ds.two_prod(ah, op)
    pe = pe + al * op
    aoh, aol = ds.quick_two_sum(ph, pe)
    xh, xl = ds.ds_add(lnpi_h, lnpi_l + jnp.zeros_like(aol), aoh, aol)

    # ---- GC averages under P ~ exp(x) (max-shifted; pad rows masked) ----
    mh = jnp.max(jnp.where(real, xh, F32(-jnp.inf)), axis=0, keepdims=True)
    ml = jnp.max(jnp.where(real & (xh == mh), xl, F32(-jnp.inf)), axis=0, keepdims=True)
    th, tl = ds.ds_sub(xh, xl, mh, ml)
    eh, el = ds.ds_exp_shifted(th, tl)
    eh = jnp.where(real, eh, F32(0.0))
    el = jnp.where(real, el, F32(0.0))

    s0 = ds.ds_sum_pairs(eh, el, axis=0)
    av = []  # <N_0..S-1>, <U> pairs [1,L]
    for kh, kl in keys:
        qh, ql = ds.ds_mul(eh, el, kh + jnp.zeros_like(eh), kl + jnp.zeros_like(el))
        sh, sl = ds.ds_sum_pairs(qh, ql, axis=0)
        av.append(ds.ds_div(sh, sl, *s0))
    av_ni, (avu_h, avu_l) = av[:S], av[S]
    nth, ntl = av_ni[0]
    for i in range(1, S):
        nth, ntl = ds.ds_add(nth, ntl, *av_ni[i])  # <N_tot> = sum <N_i> (dB loop order)

    # ---- dlnPI/dB (gc_hist.pyx:2146-2149; i=0 term vanishes: dmuref_0=0) ----
    d1b_h = jnp.zeros_like(xh)
    d1b_l = jnp.zeros_like(xl)
    for i in range(1, S):
        nh, nl = keys[i]
        fh, fl = ds.ds_sub(nh + jnp.zeros_like(xh), nl + jnp.zeros_like(xl), *av_ni[i])
        gh, gl = ds.ds_mul(fh, fl, *_bcast_scalar(dmuref[i - 1][0], dmuref[i - 1][1], fh))
        d1b_h, d1b_l = ds.ds_add(d1b_h, d1b_l, gh, gl)
    oph, opl = ds.ds_sub(op, jnp.zeros_like(op), nth, ntl)  # op exact -> (op, 0) pair
    gh, gl = ds.ds_mul(muh + jnp.zeros_like(oph), mul + jnp.zeros_like(opl), oph, opl)
    d1b_h, d1b_l = ds.ds_add(d1b_h, d1b_l, gh, gl)
    uh, ul = keys[S]
    fh, fl = ds.ds_sub(uh + jnp.zeros_like(xh), ul + jnp.zeros_like(xl), avu_h, avu_l)
    d1b_h, d1b_l = ds.ds_sub(d1b_h, d1b_l, fh, fl)

    # ---- x' = x + dB*d1B + sum_q dDmu_q * beta_ref (N_{q+1} - <N_{q+1}>) ----
    gh, gl = ds.ds_mul(dbh + jnp.zeros_like(d1b_h), dbl + jnp.zeros_like(d1b_l), d1b_h, d1b_l)
    xh, xl = ds.ds_add(xh, xl, gh, gl)
    for q in range(S1):
        nh, nl = keys[q + 1]
        fh, fl = ds.ds_sub(nh + jnp.zeros_like(xh), nl + jnp.zeros_like(xl), *av_ni[q + 1])
        fh, fl = ds.ds_mul(fh, fl, *_bcast_scalar(beta_ref[0], beta_ref[1], fh))
        ddh, ddl = dds[q]
        gh, gl = ds.ds_mul(ddh + jnp.zeros_like(fh), ddl + jnp.zeros_like(fl), fh, fl)
        xh, xl = ds.ds_add(xh, xl, gh, gl)

    # ---- order-2 Hessian (S == 2; gc_hist.pyx:2484-2563) ----
    if order >= 2:
        f11row, sgB2, sgX, sgM2 = o2[0], o2[1], o2[2], o2[3]
        ddh, ddl = dds[0]
        brh, brl = beta_ref

        def tsum(qh, ql):
            wh = jnp.where(real, qh, F32(0.0))
            wl = jnp.where(real, ql, F32(0.0))
            return ds.ds_sum_pairs(wh, wl, axis=0)

        def av_of(sh, sl):
            return ds.ds_div(sh, sl, *s0)

        # op-product averages (op exact f32; e carries the real-row mask)
        def op_row(vh, vl):
            ph_, pe_ = ds.two_prod(op, vh)
            pe_ = pe_ + op * vl
            return ds.quick_two_sum(ph_, pe_)

        eo_h, eo_l = op_row(eh, el)  # e*op
        av_op = av_of(*ds.ds_sum_pairs(eo_h, eo_l, axis=0))
        av_op2 = av_of(*ds.ds_sum_pairs(*op_row(eo_h, eo_l), axis=0))
        n2h, n2l = keys[1]
        uh_, ul_ = keys[S]
        e_n2 = ds.ds_mul(eh, el, n2h + jnp.zeros_like(eh), n2l + jnp.zeros_like(el))
        e_u = ds.ds_mul(eh, el, uh_ + jnp.zeros_like(eh), ul_ + jnp.zeros_like(el))
        av_opn2 = av_of(*ds.ds_sum_pairs(*op_row(*e_n2), axis=0))
        av_opu = av_of(*ds.ds_sum_pairs(*op_row(*e_u), axis=0))
        av_rows = {}
        for name, (rh, rl) in (("n2n2", o2[4]), ("n2u", o2[5]), ("uu", o2[6])):
            qh, ql = ds.ds_mul(eh, el, rh + jnp.zeros_like(eh), rl + jnp.zeros_like(el))
            av_rows[name] = av_of(*tsum(qh, ql))

        av_n2 = av_ni[1]
        av_u = (avu_h, avu_l)

        def fluct(av_ab, av_a, av_b):
            prod = ds.ds_mul(*av_a, *av_b)
            return ds.ds_sub(*av_ab, *prod)

        # f(X, Y) scalar pairs per lane
        f_n2_op = fluct(av_opn2, av_n2, av_op)
        f_n2_u = fluct(av_rows["n2u"], av_n2, av_u)
        f_n2_n2 = fluct(av_rows["n2n2"], av_n2, av_n2)
        f_op_op = fluct(av_op2, av_op, av_op)
        f_op_u = fluct(av_opu, av_op, av_u)
        f_u_u = fluct(av_rows["uu"], av_u, av_u)

        dmu1 = dmuref[0]

        def gcdb(f_op, f_u, f_n2):
            # gc_dX_dB, KE-free (gc_hist.pyx:1382-1410): mu0 f(X,op) -
            # f(X,U) + dmuref f(X,N2)
            t1 = ds.ds_mul(muh, mul, *f_op)
            t2 = ds.ds_sub(*t1, *f_u)
            t3 = ds.ds_mul(dmu1[0] + jnp.zeros_like(f_n2[0]), dmu1[1] + jnp.zeros_like(f_n2[1]), *f_n2)
            return ds.ds_add(*t2, *t3)

        gcdb_n2 = gcdb(f_n2_op, f_n2_u, f_n2_n2)
        gcdb_op = gcdb(f_op_op, f_op_u, f_n2_op)  # f(op,N2) == f(N2,op)
        gcdb_u = gcdb(f_op_u, f_u_u, f_n2_u)

        def full(sc):
            return _bcast_scalar(sc[0], sc[1], xh)

        # H00 = dmuref (sgB_N2 - gc_N2) + mu (-gc_op) - (sgB_U - gc_U)
        t_n2 = ds.ds_sub(dkeydB[1][0] + jnp.zeros_like(xh), dkeydB[1][1] + jnp.zeros_like(xl), *full(gcdb_n2))
        h00 = ds.ds_mul(*t_n2, *full(dmu1))
        mu_full = (muh + jnp.zeros_like(xh), mul + jnp.zeros_like(xl))
        h00 = ds.ds_sub(*h00, *ds.ds_mul(*mu_full, *full(gcdb_op)))
        t_u = ds.ds_sub(dkeydB[S][0] + jnp.zeros_like(xh), dkeydB[S][1] + jnp.zeros_like(xl), *full(gcdb_u))
        h00 = ds.ds_sub(*h00, *t_u)

        # H11 = beta^2 (f11row - gc_fluct(N2,N2))
        b2 = ds.ds_mul(brh, brl, brh, brl)
        h11 = ds.ds_sub(f11row[0] + jnp.zeros_like(xh), f11row[1] + jnp.zeros_like(xl), *full(f_n2_n2))
        h11 = ds.ds_mul(*h11, *full(b2))

        # H01 = (N2 - <N2>) + beta (sgB_N2 - gc_N2)
        h01 = ds.ds_sub(n2h + jnp.zeros_like(xh), n2l + jnp.zeros_like(xl), *full(av_n2))
        h01 = ds.ds_add(*h01, *ds.ds_mul(*t_n2, *full((brh, brl))))

        # x' += 0.5 (dB^2 H00 + 2 dB dd H01 + dd^2 H11)
        db_full = (dbh + jnp.zeros_like(xh), dbl + jnp.zeros_like(xl))
        dd_full = (ddh + jnp.zeros_like(xh), ddl + jnp.zeros_like(xl))
        db2 = ds.ds_mul(*db_full, *db_full)
        dbdd = ds.ds_mul(*db_full, *dd_full)
        dd2 = ds.ds_mul(*dd_full, *dd_full)
        acc = ds.ds_mul(*db2, *h00)
        acc = ds.ds_add(*acc, *ds.ds_mul(*ds.ds_mul_f32(*dbdd, F32(2.0)), *h01))
        acc = ds.ds_add(*acc, *ds.ds_mul(*dd2, *h11))
        xh, xl = ds.ds_add(xh, xl, *ds.ds_mul_f32(*acc, F32(0.5)))

    # ---- key rows extrapolated with the precomputed semigrand rows ----
    if props and chunk_keys:
        if order >= 2 and not first_order_mom:
            raise NotImplementedError("chunk_keys is an order-1 lever (order-2 key rows add the o2 terms)")
        L = xh.shape[-1]

        def make_key(k):
            kh0, kl0 = keys[k]
            bh0, bl0 = dkeydB[k]
            qrows = [src["dkeydMU"][q][k] for q in range(S1)]

            def f(r0, rN):
                z = jnp.zeros((rN - r0, L), xh.dtype)
                kh = kh0[r0:rN] + z
                kl = kl0[r0:rN] + z
                gh, gl = ds.ds_mul(dbh + z, dbl + z, bh0[r0:rN] + z, bl0[r0:rN] + z)
                kh, kl = ds.ds_add(kh, kl, gh, gl)
                for q in range(S1):
                    qh_, ql_ = qrows[q]
                    ddh_, ddl_ = dds[q]
                    gh, gl = ds.ds_mul(ddh_ + z, ddl_ + z, qh_[r0:rN] + z, ql_[r0:rN] + z)
                    kh, kl = ds.ds_add(kh, kl, gh, gl)
                return kh, kl

            return f

        keys2 = [make_key(k) for k in range(S + 1)]
    elif props:
        keys2 = []
        for k in range(S + 1):
            kh, kl = keys[k]
            kh = kh + jnp.zeros_like(xh)
            kl = kl + jnp.zeros_like(xl)
            bh, bl = dkeydB[k]
            gh, gl = ds.ds_mul(dbh + jnp.zeros_like(xh), dbl + jnp.zeros_like(xl), bh + jnp.zeros_like(xh), bl + jnp.zeros_like(xl))
            kh, kl = ds.ds_add(kh, kl, gh, gl)
            for q in range(S1):
                qh_, ql_ = src["dkeydMU"][q][k]
                ddh_, ddl_ = dds[q]
                gh, gl = ds.ds_mul(ddh_ + jnp.zeros_like(xh), ddl_ + jnp.zeros_like(xl), qh_ + jnp.zeros_like(xh), ql_ + jnp.zeros_like(xl))
                kh, kl = ds.ds_add(kh, kl, gh, gl)
            if order >= 2 and not first_order_mom:
                sgB2, sgX, sgM2 = o2[1], o2[2], o2[3]
                acc = ds.ds_mul(*db2, sgB2[k][0] + jnp.zeros_like(xh), sgB2[k][1] + jnp.zeros_like(xl))
                acc = ds.ds_add(*acc, *ds.ds_mul(*ds.ds_mul_f32(*dbdd, F32(2.0)), sgX[k][0] + jnp.zeros_like(xh), sgX[k][1] + jnp.zeros_like(xl)))
                acc = ds.ds_add(*acc, *ds.ds_mul(*dd2, sgM2[k][0] + jnp.zeros_like(xh), sgM2[k][1] + jnp.zeros_like(xl)))
                kh, kl = ds.ds_add(kh, kl, *ds.ds_mul_f32(*acc, F32(0.5)))
            keys2.append((kh, kl))
    else:
        keys2 = keys

    return xh, xl, keys2, (mh, ml)


def mb_block_lanes(lane_rows, cst, N, smooth, P, S, props, order=1, first_order_mom=False, barriers=False, collect=None, sum_chunk=None):
    """One block of the extrapolating sweep in lanes layout (pure jnp).

    lane_rows: [2*(3+S1), L] f32 — pair rows (a, mu, dB, dDmu_q...)
    cst unpacked by _unpack_cst_mb.
    collect: None or "janus" (thermo_lanes collect transform).
    sum_chunk: chunk the integration stage's [NPAD, L] intermediates
    (pallas_sweep._integrate_chunked) — the VMEM lever that lifts the
    order-1 kernel past NPAD=1024 (VERDICT r4 item 5); the extrapolated
    key rows stay materialized (order-1's working set fits: the chunked
    integration holds only segmentation + x' + keys2 full-length).
    """
    S1 = S - 1
    (lnpi, op, keys, dkeydB, dkeydMU, vol, beta_ref, dmuref, o2) = _unpack_cst_mb(cst, N, S, order)
    NPAD = lnpi[0].shape[0]
    L = lane_rows.shape[-1]
    rows = lax.broadcasted_iota(I32, (NPAD, L), 0)
    real = _real_mask(rows, N)

    def lane(i):
        return lane_rows[2 * i : 2 * i + 1], lane_rows[2 * i + 1 : 2 * i + 2]

    src = {"lnpi": lnpi, "keys": keys, "dkeydB": dkeydB, "dkeydMU": dkeydMU, "dmuref": dmuref, "o2": o2}
    lanes = {"a": lane(0), "mu": lane(1), "db": lane(2), "dds": [lane(3 + q) for q in range(S1)]}
    xh, xl, keys2, _ = extrap_source_lanes(
        op, real, src, lanes, beta_ref, S, order, first_order_mom, props,
        chunk_keys=(sum_chunk is not None and props and order == 1),
    )
    return thermo_lanes(xh, xl, rows, keys2, vol, N, smooth, P, props, barriers, collect, sum_chunk=sum_chunk)


# ----------------------------------------------------------------------
# const packing
# ----------------------------------------------------------------------


def _const_block_mb(h: Hist, meta: HistMeta, NPAD: int, order: int = 1):
    """[R, 1] f32 const: lnpi pair, op, key pairs, dkeydB pairs, dkeydMU
    pairs, scalars (vol, beta_ref, dmuref_q), then (order 2) the
    mu-independent Hessian rows: the dMu-block semigrand fluctuation
    (gc_hist.pyx:2509-2513), sg_d2X_dB2 / beta-dMu cross / sg_d2X_dMU2
    per key row (:1776-1868, 2534-2561), and the N2N2/N2U/UU product
    rows the per-lane gc averages contract against."""
    N = h.lnpi.shape[-1]
    S = meta.nspec
    lnpi = h.lnpi - jax.scipy.special.logsumexp(h.lnpi)  # engine parity: normalized base

    def pad(v):
        return jnp.concatenate([v, jnp.broadcast_to(v[-1:], (NPAD - N,))]) if NPAD > N else v

    eng = DerivEngine(h.replace(lnpi=lnpi), meta)
    addrs = _key_addrs(meta)

    segs = []
    lh, ll = ds.split_f64(pad(lnpi))
    segs += [lh, ll, pad(h.op).astype(F32)]
    for a in addrs:
        segs += list(ds.split_f64(pad(eng.m(a))))
    for a in addrs:
        segs += list(ds.split_f64(pad(eng.sg_dX_dB(a, 0))))
    for q in range(S - 1):
        for a in addrs:
            segs += list(ds.split_f64(pad(eng.sg_dX_dMU(q, a))))
    scal = jnp.concatenate(
        [h.volume.reshape(1), h.curr_beta.reshape(1), (h.curr_mu[1:] - h.curr_mu[0]).reshape(-1)]
    )
    segs += list(ds.split_f64(scal))

    if order >= 2:
        assert S == 2, "order-2 kernel is nspec==2 only (mom_prod limit)"
        nq = (1, 1, 0, 0, 0)
        f11 = eng.m((1, 1, 1, 1, 0)) - eng.m((1, 1, 1, 0, 0)) * eng.m((1, 0, 1, 1, 0))
        segs += list(ds.split_f64(pad(f11)))
        for a in addrs:
            segs += list(ds.split_f64(pad(eng.sg_d2X_dB2(a, 0))))
        for a in addrs:
            z = eng._prod(nq, a)
            f = eng.m(z) - eng.m(nq) * eng.m(a)
            segs += list(ds.split_f64(pad(eng.beta * eng.sg_df_dB((nq, 0), (a, 0)) + f)))
        for a in addrs:
            segs += list(ds.split_f64(pad(eng.sg_d2X_dMU2(0, 0, a))))
        for x, y in [(nq, nq), (nq, (0, 0, 0, 0, 1)), ((0, 0, 0, 0, 1), (0, 0, 0, 0, 1))]:
            segs += list(ds.split_f64(pad(eng.m(eng._prod(x, y)))))
    return jnp.concatenate([x.reshape(-1) for x in segs])[:, None]


def _unpack_cst_mb(cst, N, S, order=1):
    NPAD = _npad(N)
    K = S + 1
    at = 0

    def take(n):
        nonlocal at
        v = cst[at : at + n]
        at += n
        return v

    def pair():
        return (take(NPAD), take(NPAD))

    lnpi = pair()
    op = take(NPAD)
    keys = [pair() for _ in range(K)]
    dkeydB = [pair() for _ in range(K)]
    dkeydMU = [[pair() for _ in range(K)] for _ in range(S - 1)]
    nsc = 2 + (S - 1)
    sh = take(nsc)
    sl = take(nsc)
    vol = (sh[0:1], sl[0:1])
    beta_ref = (sh[1:2], sl[1:2])
    dmuref = [(sh[2 + q : 3 + q], sl[2 + q : 3 + q]) for q in range(S - 1)]
    o2 = None
    if order >= 2:
        f11 = pair()
        sgB2 = [pair() for _ in range(K)]
        sgX = [pair() for _ in range(K)]
        sgM2 = [pair() for _ in range(K)]
        n2n2, n2u, uu = pair(), pair(), pair()
        o2 = (f11, sgB2, sgX, sgM2, n2n2, n2u, uu)
    return lnpi, op, keys, dkeydB, dkeydMU, vol, beta_ref, dmuref, o2


def _lane_rows(h: Hist, mu_grid, beta_grid, dmu_grid, block):
    """Flatten the (mu, target) product to padded [nb, 2*(3+S1), block]."""
    M = mu_grid.shape[0]
    A = beta_grid.shape[0]
    S1 = dmu_grid.shape[1]
    dmu_ref = h.curr_mu[1:] - h.curr_mu[0]

    mu = jnp.broadcast_to(mu_grid[:, None], (M, A)).reshape(-1)
    a = (mu_grid[:, None] - h.curr_mu[0]) * h.curr_beta
    a = jnp.broadcast_to(a, (M, A)).reshape(-1)
    db = jnp.broadcast_to((beta_grid - h.curr_beta)[None, :], (M, A)).reshape(-1)
    dds = [jnp.broadcast_to((dmu_grid[:, q] - dmu_ref[q])[None, :], (M, A)).reshape(-1) for q in range(S1)]

    B = M * A
    nb = -(-B // block)

    def prep(v):
        if nb * block != B:
            v = jnp.concatenate([v, jnp.broadcast_to(v[-1:], (nb * block - B,))])
        return v.reshape(nb, 1, block)

    rows = []
    for v in [a, mu, db] + dds:
        vh, vl = ds.split_f64(prep(v))
        rows += [vh, vl]
    return jnp.concatenate(rows, axis=1), B, nb  # [nb, 2*(3+S1), block]


# ----------------------------------------------------------------------
# pallas_call shell + eager XLA reference
# ----------------------------------------------------------------------


def _kernel(lr_ref, cst_ref, out_f_ref, out_i_ref, *, N, smooth, P, S, props, order, first_order_mom, collect, sum_chunk=None):
    out = mb_block_lanes(lr_ref[0], cst_ref[:], N, smooth, P, S, props, order, first_order_mom, collect=collect, sum_chunk=sum_chunk)
    f, i = _pack_rows(out, P, S, props)
    out_f_ref[0] = f
    out_i_ref[0] = i


@partial(jax.jit, static_argnames=("meta", "props", "block", "interpret", "order", "first_order_mom", "collect", "sum_chunk"))
def _mb_ds_pallas(h: Hist, meta: HistMeta, mu_grid, beta_grid, dmu_grid, props: bool, block: int, interpret: bool, order: int = 1, first_order_mom: bool = False, collect=None, sum_chunk=None):
    P, S = meta.max_phases, meta.nspec
    N = h.lnpi.shape[-1]
    NPAD = _npad(N)
    lr, B, nb = _lane_rows(h, mu_grid, beta_grid, dmu_grid, block)
    cst = _const_block_mb(h, meta, NPAD, order)
    NRF = 2 * P * len(_f_quantities(S, props))
    NRI = 3 * P + 2
    NL = lr.shape[1]
    import sys

    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    Z = np.int32(0)
    out_f, out_i = pl.pallas_call(
        partial(_kernel, N=N, smooth=meta.smooth, P=P, S=S, props=props, order=order, first_order_mom=first_order_mom, collect=collect, sum_chunk=sum_chunk),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, NL, block), lambda i: (i, Z, Z), memory_space=pltpu.VMEM),
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
    )(lr, cst)
    out_f = jnp.moveaxis(out_f, 1, 0).reshape(NRF, nb * block)[:, :B]
    out_i = jnp.moveaxis(out_i, 1, 0).reshape(NRI, nb * block)[:, :B]
    return _unpack(out_f, out_i, B, P, S, props)


def _mb_ds_xla(h: Hist, meta: HistMeta, mu_grid, beta_grid, dmu_grid, props: bool, order: int = 1, first_order_mom: bool = False, collect=None, sum_chunk=None):
    """EAGER reference path (CPU tests) — see pallas_sweep._sweep_ds_xla
    for why it is not jitted (XLA:CPU fusion blowup on this DAG shape)."""
    P, S = meta.max_phases, meta.nspec
    N = h.lnpi.shape[-1]
    NPAD = _npad(N)
    B = mu_grid.shape[0] * beta_grid.shape[0]
    lr, B2, nb = _lane_rows(h, mu_grid, beta_grid, dmu_grid, block=B)
    assert B2 == B and nb == 1
    cst = _const_block_mb(h, meta, NPAD, order)
    out = mb_block_lanes(lr[0], cst, N, meta.smooth, P, S, props, order, first_order_mom, barriers=True, collect=collect, sum_chunk=sum_chunk)
    f, i = _pack_rows(out, P, S, props)
    return _unpack(f, i, B, P, S, props)


def mu_beta_sweep_thermo_ds(
    h: Hist,
    meta: HistMeta,
    mu_grid,
    beta_grid,
    dmu_grid,
    props: bool = True,
    block: int | None = None,
    mode: str | None = None,
    order: int = 1,
    first_order_mom: bool = False,
    collect=None,
    sum_chunk=None,
):
    """Drop-in for pipeline.mu_beta_sweep_thermo (orders 1-2) running the
    fused double-single Pallas kernel (see module docstring).  Output dict
    matches the XLA path's [M, A] leading axes (plus left/right bounds).

    mode: "pallas" (TPU), "xla" (eager CPU reference), None = auto.
    collect: None or "janus" (thermo_lanes transform, VERDICT r1 item 5).
    sum_chunk: chunked integration (auto-set past NPAD=1024 at order 1 —
    VERDICT r4 item 5; order 2's Hessian rows keep ~6 extra full-length
    arrays live through the x' build, so long order-2 composites stay on
    the XLA engine).
    """
    if order < 1 or order > 2:
        raise ValueError("kernel implements orders 1-2")
    if collect not in (None, "janus"):
        raise NotImplementedError("lanes collect transforms: only 'janus'")
    if order == 2 and meta.nspec != 2:
        raise NotImplementedError("order-2 kernel is nspec==2 only")
    if meta.used_ke and order >= 2:
        # the order-2 Hessian's gc_dX_dB lanes are the KE-free form
        # (gc_hist.pyx:1382-1410); KE data needs the corrected kernels
        # (gc_hist.pyx:1412-1416, 1449-1457) the XLA path computes.
        # Order 1 is exact for KE histograms: the lnPI beta-derivative
        # carries no KE term (gc_hist.pyx:2146-2149) and the key rows
        # extrapolate via sg_dX_dB rows PREcomputed with the engine's KE
        # corrections (tested vs the XLA path, test_pallas_mb.py).
        raise NotImplementedError("used_ke histograms: order-2 kernel lacks the KE gc_dX_dB corrections; use the XLA mu_beta path")
    if mode is None:
        mode = "pallas" if jax.default_backend() == "tpu" else "xla"
    npad = _npad(h.lnpi.shape[-1])
    if sum_chunk is None and npad > KERNEL_MAX_NPAD:
        if order >= 2:
            raise NotImplementedError("order-2 mb kernel supports NPAD<=1024; use the XLA mu_beta path")
        sum_chunk = 512  # same VMEM lever as the sweep kernel (rule 15)
    if block is None:
        block = default_block(h.lnpi.shape[-1], max_npad=MB_MAX_NPAD if order == 1 else KERNEL_MAX_NPAD)
    mu_grid = jnp.asarray(mu_grid, dtype=jnp.float64)
    beta_grid = jnp.atleast_1d(jnp.asarray(beta_grid, dtype=jnp.float64))
    dmu_grid = jnp.atleast_2d(jnp.asarray(dmu_grid, dtype=jnp.float64))
    if dmu_grid.shape[0] == 1:
        dmu_grid = jnp.broadcast_to(dmu_grid, (beta_grid.shape[0], dmu_grid.shape[1]))

    M, A = mu_grid.shape[0], beta_grid.shape[0]
    if mode == "xla":
        flat = _mb_ds_xla(h, meta, mu_grid, beta_grid, dmu_grid, props, order, first_order_mom, collect, sum_chunk)
    else:
        flat = _mb_ds_pallas(h, meta, mu_grid, beta_grid, dmu_grid, props, block, mode == "interpret", order, first_order_mom, collect, sum_chunk)
    return jax.tree_util.tree_map(lambda v: v.reshape((M, A) + v.shape[1:]), flat)
