"""Taylor extrapolation of lnPI and the moments tensor in (beta, dMu).

Single-target drivers mirror the reference's _temp_extrap_{1,2,3},
_dmu_extrap_{1,2} and _temp_dmu_extrap_{1,2} (ntot/gc_hist.pyx:1995-2340,
1045-1239).  The grid driver replaces the clone-per-target serial loops of
temp_dmu_extrap_multi (gc_hist.pyx:813-887, 968-1180) with one einsum
broadcast over the whole (beta, dMu) target grid: derivatives are computed
once from the current state, then applied to every target in a single
fused launch — this is the core batching win of the TPU rebuild.

All functions are pure (Hist -> Hist), jittable with static
(meta, order, skip_mom, first_order_mom).
"""

from __future__ import annotations

import jax.numpy as jnp

from .derivs import DerivEngine, DerivEngineN1
from .numerics import normalize_lnpi
from .state import Hist, HistMeta

__all__ = [
    "temp_extrap",
    "dmu_extrap",
    "temp_dmu_extrap",
    "temp_dmu_extrap_grid",
    "temp_mu_extrap",
    "temp_mu_extrap_grid",
]


def _dmu_of(h: Hist):
    return h.curr_mu[1:] - h.curr_mu[0]


def temp_extrap(
    h: Hist, meta: HistMeta, target_beta, order: int = 1, skip_mom: bool = False, engine_cls=DerivEngine
) -> Hist:
    """Extrapolate in temperature only (orders 1-3).

    Parity: histogram.temp_extrap driver sequence (gc_hist.pyx:670-740):
    normalize, accumulate Taylor series, set curr_beta, renormalize.
    """
    h = h.replace(lnpi=normalize_lnpi(h.lnpi))
    eng = engine_cls(h, meta)
    target_beta = jnp.asarray(target_beta, dtype=h.lnpi.dtype)
    dB = target_beta - h.curr_beta

    d1, m1 = eng.dB(skip_mom)
    lnpi = h.lnpi + dB * d1
    mom = h.mom + dB * m1
    if order >= 2:
        d2, m2 = eng.dB2(skip_mom)
        lnpi = lnpi + 0.5 * dB * dB * d2
        mom = mom + 0.5 * dB * dB * m2
    if order >= 3:
        d3, m3 = eng.dB3(skip_mom)
        lnpi = lnpi + (1.0 / 6.0) * dB * dB * dB * d3
        mom = mom + (1.0 / 6.0) * dB * dB * dB * m3
    if order > 3 or order < 1:
        raise ValueError("No implementation for temperature extrapolation of order %d" % order)

    return h.replace(lnpi=normalize_lnpi(lnpi), mom=mom, curr_beta=target_beta)


def dmu_extrap(h: Hist, meta: HistMeta, target_dmu, order: int = 1, skip_mom: bool = False) -> Hist:
    """Extrapolate in dMu = mu_{2..S} - mu_1 (orders 1-2).

    Parity: histogram.dmu_extrap (gc_hist.pyx:742-811, 2254-2340).
    """
    h = h.replace(lnpi=normalize_lnpi(h.lnpi))
    eng = DerivEngine(h, meta)
    target_dmu = jnp.asarray(target_dmu, dtype=h.lnpi.dtype)
    dDmu = target_dmu - _dmu_of(h)  # [S-1]

    d1, m1 = eng.dMU(skip_mom)  # [S-1,N], [S-1,...]
    lnpi = h.lnpi + jnp.tensordot(dDmu, d1, axes=1)
    mom = h.mom + jnp.tensordot(dDmu, m1, axes=1)
    if order >= 2:
        H, Hm = eng.dMU2(skip_mom)  # [S-1,S-1,N], [S-1,S-1,...]
        lnpi = lnpi + 0.5 * jnp.einsum("r,rqn,q->n", dDmu, H, dDmu)
        mom = mom + 0.5 * jnp.einsum("r,rq...,q->...", dDmu, Hm, dDmu)
    if order > 2 or order < 1:
        raise ValueError("No implementation for dMu extrapolation of order %d" % order)

    new_mu = h.curr_mu.at[1:].set(h.curr_mu[0] + target_dmu)
    return h.replace(lnpi=normalize_lnpi(lnpi), mom=mom, curr_mu=new_mu)


def temp_dmu_extrap(
    h: Hist,
    meta: HistMeta,
    target_beta,
    target_dmu,
    order: int = 1,
    skip_mom: bool = False,
    first_order_mom: bool = False,
    sg_memo: dict | None = None,
) -> Hist:
    """Joint (beta, dMu) extrapolation (orders 1-2).

    Parity: histogram.temp_dmu_extrap (gc_hist.pyx:889-966, 1045-1092,
    1182-1239).  xi = [dB, dDmu_2, ..., dDmu_S].

    sg_memo: optional derivs.warm_sg_memo(...) dict — batched callers
    that vmap over the reweight mu share the mu-independent semigrand
    rows instead of recomputing them per lane.
    """
    h = h.replace(lnpi=normalize_lnpi(h.lnpi))
    eng = DerivEngine(h, meta)
    if sg_memo:
        eng._memo.update(sg_memo)
    target_beta = jnp.asarray(target_beta, dtype=h.lnpi.dtype)
    target_dmu = jnp.asarray(target_dmu, dtype=h.lnpi.dtype)
    dB = target_beta - h.curr_beta
    dDmu = target_dmu - _dmu_of(h)
    xi = jnp.concatenate([dB[None], dDmu])  # [S]

    d1, m1 = eng.dBMU(skip_mom)  # [S,N], [S,...]
    lnpi = h.lnpi + jnp.tensordot(xi, d1, axes=1)
    mom = h.mom + jnp.tensordot(xi, m1, axes=1)
    if order >= 2:
        H, Hm = eng.dBMU2(skip_mom)
        lnpi = lnpi + 0.5 * jnp.einsum("r,rqn,q->n", xi, H, xi)
        if not first_order_mom:
            mom = mom + 0.5 * jnp.einsum("r,rq...,q->...", xi, Hm, xi)
    if order > 2 or order < 1:
        raise ValueError("No implementation for temperature + dMu extrapolation of order %d" % order)

    new_mu = h.curr_mu.at[1:].set(h.curr_mu[0] + target_dmu)
    return h.replace(lnpi=normalize_lnpi(lnpi), mom=mom, curr_beta=target_beta, curr_mu=new_mu)


def temp_dmu_extrap_key(
    h: Hist,
    meta: HistMeta,
    target_beta,
    target_dmu,
    order: int = 1,
    first_order_mom: bool = False,
    sg_memo: dict | None = None,
):
    """Joint (beta, dMu) extrapolation of lnPI plus ONLY the key moment
    rows (<N_i>, <U> — segment.key_row_addresses).

    Same Taylor series as temp_dmu_extrap, but the moment apply touches
    nspec+1 of the nspec^2*(mo+1)^3 rows: batched sweep pipelines that
    only consume phase properties skip ~97% of the extrapolated moment
    tensor (and the engine's full derivative tensors hoist out of the
    per-target vmap since they depend only on the source state).

    Returns (lnpi, key_rows) with lnpi UNNORMALIZED — consumers integrate
    via the shift convention (segment.thermo_key_core).
    """
    from .segment import key_row_addresses

    h = h.replace(lnpi=normalize_lnpi(h.lnpi))
    eng = DerivEngine(h, meta)
    if sg_memo:
        eng._memo.update(sg_memo)
    target_beta = jnp.asarray(target_beta, dtype=h.lnpi.dtype)
    target_dmu = jnp.asarray(target_dmu, dtype=h.lnpi.dtype)
    dB = target_beta - h.curr_beta
    dDmu = target_dmu - _dmu_of(h)
    xi = jnp.concatenate([dB[None], dDmu])  # [S]

    N = h.lnpi.shape[-1]
    kra = jnp.array(key_row_addresses(meta), dtype=jnp.int32)
    S = xi.shape[0]

    d1, m1 = eng.dBMU(False)
    m1k = m1.reshape((S, meta.n_addr, N))[:, kra, :]  # [S,K,N]
    lnpi = h.lnpi + jnp.tensordot(xi, d1, axes=1)
    key = h.mom.reshape(meta.n_addr, N)[kra, :] + jnp.einsum("s,skn->kn", xi, m1k)
    if order >= 2:
        H, Hm = eng.dBMU2(False)
        Hmk = Hm.reshape((S, S, meta.n_addr, N))[:, :, kra, :]
        lnpi = lnpi + 0.5 * jnp.einsum("r,rqn,q->n", xi, H, xi)
        if not first_order_mom:
            key = key + 0.5 * jnp.einsum("r,rqkn,q->kn", xi, Hmk, xi)
    if order > 2 or order < 1:
        raise ValueError("No implementation for temperature + dMu extrapolation of order %d" % order)

    return lnpi, key


def temp_dmu_extrap_grid(
    h: Hist,
    meta: HistMeta,
    target_betas,
    target_dmus,
    order: int = 1,
    skip_mom: bool = False,
    first_order_mom: bool = False,
) -> Hist:
    """Batched joint extrapolation over the full (beta, dMu) target grid.

    Replaces temp_dmu_extrap_multi (gc_hist.pyx:813-887): derivatives are
    computed ONCE, the application is a broadcasted einsum over targets.
    Returns a Hist whose arrays carry leading axes [n_beta, n_dmu].
    """
    h = h.replace(lnpi=normalize_lnpi(h.lnpi))
    eng = DerivEngine(h, meta)
    target_betas = jnp.atleast_1d(jnp.asarray(target_betas, dtype=h.lnpi.dtype))  # [A]
    target_dmus = jnp.atleast_2d(jnp.asarray(target_dmus, dtype=h.lnpi.dtype))  # [B,S-1]
    A, B = target_betas.shape[0], target_dmus.shape[0]

    dB = target_betas - h.curr_beta  # [A]
    dDmu = target_dmus - _dmu_of(h)  # [B,S-1]
    # xi[a,b,s]: s=0 is beta, s>=1 are dMu components
    xi = jnp.concatenate(
        [jnp.broadcast_to(dB[:, None, None], (A, B, 1)), jnp.broadcast_to(dDmu[None, :, :], (A, B, dDmu.shape[1]))],
        axis=-1,
    )

    d1, m1 = eng.dBMU(skip_mom)
    lnpi = h.lnpi[None, None, :] + jnp.einsum("abs,sn->abn", xi, d1)
    mom = h.mom[None, None] + jnp.einsum("abs,s...->ab...", xi, m1)
    if order >= 2:
        H, Hm = eng.dBMU2(skip_mom)
        lnpi = lnpi + 0.5 * jnp.einsum("abr,rqn,abq->abn", xi, H, xi)
        if not first_order_mom:
            mom = mom + 0.5 * jnp.einsum("abr,rq...,abq->ab...", xi, Hm, xi)
    if order > 2 or order < 1:
        raise ValueError("No implementation for temperature + dMu extrapolation of order %d" % order)

    curr_beta = jnp.broadcast_to(target_betas[:, None], (A, B))
    mu1 = h.curr_mu[0]
    curr_mu = jnp.concatenate(
        [jnp.full((A, B, 1), mu1, dtype=h.lnpi.dtype), mu1 + jnp.broadcast_to(target_dmus[None], (A, B, dDmu.shape[1]))],
        axis=-1,
    )
    return Hist(
        lnpi=normalize_lnpi(lnpi),
        mom=mom,
        op=jnp.broadcast_to(h.op, (A, B) + h.op.shape),
        curr_mu=curr_mu,
        curr_beta=curr_beta,
        volume=jnp.broadcast_to(h.volume, (A, B)),
    )


def temp_mu_extrap(
    h: Hist,
    meta: HistMeta,
    target_beta,
    target_mus,
    order: int = 1,
    skip_mom: bool = False,
) -> Hist:
    """Joint (beta, absolute mu_2..mu_S) extrapolation for the N_1 engine.

    Parity: n1 histogram.temp_mu_extrap (n1/gc_hist.pyx:566-1043).
    xi = [dB, mu' - mu_curr] with absolute chemical potentials; note
    the n1 second-order moment apply has no first_order_mom switch.
    """
    h = h.replace(lnpi=normalize_lnpi(h.lnpi))
    eng = DerivEngineN1(h, meta)
    target_beta = jnp.asarray(target_beta, dtype=h.lnpi.dtype)
    target_mus = jnp.asarray(target_mus, dtype=h.lnpi.dtype)
    dB = target_beta - h.curr_beta
    dmu = target_mus - h.curr_mu[1:]
    xi = jnp.concatenate([dB[None], dmu])  # [S]

    d1, m1 = eng.dBMU(skip_mom)
    lnpi = h.lnpi + jnp.tensordot(xi, d1, axes=1)
    mom = h.mom + jnp.tensordot(xi, m1, axes=1)
    if order >= 2:
        H, Hm = eng.dBMU2(skip_mom)
        lnpi = lnpi + 0.5 * jnp.einsum("r,rqn,q->n", xi, H, xi)
        mom = mom + 0.5 * jnp.einsum("r,rq...,q->...", xi, Hm, xi)
    if order > 2 or order < 1:
        raise ValueError("No implementation for temperature + mu extrapolation of order %d" % order)

    new_mu = h.curr_mu.at[1:].set(target_mus)
    return h.replace(lnpi=normalize_lnpi(lnpi), mom=mom, curr_beta=target_beta, curr_mu=new_mu)


def temp_mu_extrap_grid(
    h: Hist,
    meta: HistMeta,
    target_betas,
    target_mus,
    order: int = 1,
    skip_mom: bool = False,
) -> Hist:
    """Batched (beta, absolute mu) grid extrapolation for the N_1 engine.

    Replaces temp_mu_extrap_multi (n1/gc_hist.pyx:1497-1733) with one
    einsum broadcast; returns a Hist with leading axes [n_beta, n_mu].
    """
    h = h.replace(lnpi=normalize_lnpi(h.lnpi))
    eng = DerivEngineN1(h, meta)
    target_betas = jnp.atleast_1d(jnp.asarray(target_betas, dtype=h.lnpi.dtype))
    target_mus = jnp.atleast_2d(jnp.asarray(target_mus, dtype=h.lnpi.dtype))  # [B,S-1]
    A, B = target_betas.shape[0], target_mus.shape[0]

    dB = target_betas - h.curr_beta
    dmu = target_mus - h.curr_mu[1:]
    xi = jnp.concatenate(
        [jnp.broadcast_to(dB[:, None, None], (A, B, 1)), jnp.broadcast_to(dmu[None, :, :], (A, B, dmu.shape[1]))],
        axis=-1,
    )

    d1, m1 = eng.dBMU(skip_mom)
    lnpi = h.lnpi[None, None, :] + jnp.einsum("abs,sn->abn", xi, d1)
    mom = h.mom[None, None] + jnp.einsum("abs,s...->ab...", xi, m1)
    if order >= 2:
        H, Hm = eng.dBMU2(skip_mom)
        lnpi = lnpi + 0.5 * jnp.einsum("abr,rqn,abq->abn", xi, H, xi)
        mom = mom + 0.5 * jnp.einsum("abr,rq...,abq->ab...", xi, Hm, xi)
    if order > 2 or order < 1:
        raise ValueError("No implementation for temperature + mu extrapolation of order %d" % order)

    curr_beta = jnp.broadcast_to(target_betas[:, None], (A, B))
    curr_mu = jnp.concatenate(
        [
            jnp.full((A, B, 1), h.curr_mu[0], dtype=h.lnpi.dtype),
            jnp.broadcast_to(target_mus[None], (A, B, dmu.shape[1])),
        ],
        axis=-1,
    )
    return Hist(
        lnpi=normalize_lnpi(lnpi),
        mom=mom,
        op=jnp.broadcast_to(h.op, (A, B) + h.op.shape),
        curr_mu=curr_mu,
        curr_beta=curr_beta,
        volume=jnp.broadcast_to(h.volume, (A, B)),
    )
