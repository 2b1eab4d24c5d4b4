"""Phase-equilibrium solvers.

``phase_eq_error`` reproduces the reference objective (gc_hist.pyx:
2570-2630): reweight -> (optional) joint extrapolation -> segmentation ->
min-over-phase-pairs squared free-energy difference, width-filtered.

``find_phase_eq`` drives it with a 1-D Nelder-Mead identical in update
rules to scipy.optimize.fmin (the reference's driver, gc_hist.pyx:653),
but expressed as a jittable lax.while_loop — the whole solve runs on
device with zero host round-trips, and is vmappable over (beta, dMu)
targets, replacing the reference's one-solve-at-a-time scipy loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .extrap import temp_dmu_extrap
from .ops import reweight
from .segment import thermo
from .state import Hist, HistMeta

__all__ = ["phase_eq_error", "nelder_mead_1d", "find_phase_eq_state", "trace_coexistence"]

DEFAULT_ERR2 = 100.0  # reference default when <2 phases qualify (gc_hist.pyx:2614)


def phase_eq_error(
    mu_guess,
    h: Hist,
    meta: HistMeta,
    beta=None,
    dmu=None,
    order: int = 1,
    min_width: int = 0,
    extrapolate: bool = False,
    collect=None,
):
    """Squared F.E./kT gap between the two closest phases at mu_1 = mu_guess.

    Parity: phase_eq_error (gc_hist.pyx:2570-2630, incl. its collect
    pass-through at :2612).  `extrapolate` is the static analog of the
    reference's beta/dMu-changed runtime check; with it False, beta/dmu
    are ignored.
    """
    hh = reweight(h, mu_guess)
    if extrapolate:
        hh = temp_dmu_extrap(hh, meta, beta, dmu, order=order, skip_mom=True)
    _, pt = thermo(hh, meta, props=False, collect=collect)

    P = meta.max_phases
    width_ok = ((pt.right - pt.left) >= min_width) & pt.mask
    fe = pt.fe
    diff2 = (fe[:, None] - fe[None, :]) ** 2
    iu = jnp.triu_indices(P, k=1)
    pair_ok = (width_ok[:, None] & width_ok[None, :])[iu]
    errs = jnp.where(pair_ok, diff2[iu], DEFAULT_ERR2)
    err2 = jnp.min(errs)
    # invalid segmentation (the reference raises there, gc_hist.pyx:403-415)
    # reads as "no usable coexistence information" for the masked solver
    return jnp.where((pt.n_phases <= 1) | ~pt.valid, DEFAULT_ERR2, err2)


def nelder_mead_1d(f, x0, xtol: float = 1e-4, ftol: float = 1e-4, maxiter: int = 100000):
    """1-D Nelder-Mead with scipy.optimize.fmin's update rules.

    rho=1, chi=2, psi=0.5, sigma=0.5; initial simplex [x0, 1.05*x0] (or
    0.00025 if x0 == 0); converged when the simplex spread passes both
    xtol and ftol.  Runs as a lax.while_loop — jit/vmap friendly.

    Returns (x_best, f_best, n_iter, converged).
    """
    x0 = jnp.asarray(x0, dtype=jnp.float64)
    x1 = jnp.where(x0 != 0.0, 1.05 * x0, 0.00025)
    f0, f1 = f(x0), f(x1)
    # order so that (a, fa) is best
    a = jnp.where(f0 <= f1, x0, x1)
    b = jnp.where(f0 <= f1, x1, x0)
    fa = jnp.minimum(f0, f1)
    fb = jnp.maximum(f0, f1)

    def cond(state):
        a, fa, b, fb, it = state
        spread_x = jnp.abs(b - a)
        spread_f = jnp.abs(fb - fa)
        return (it < maxiter) & ~((spread_x <= xtol) & (spread_f <= ftol))

    def body(state):
        a, fa, b, fb, it = state
        # reflect worst (b) through best (a)
        xr = 2.0 * a - b
        fr = f(xr)

        xe = 3.0 * a - 2.0 * b
        xc = 1.5 * a - 0.5 * b  # outside contraction
        xcc = 0.5 * a + 0.5 * b  # inside contraction

        def expand(_):
            fe_ = f(xe)
            return jnp.where(fe_ < fr, xe, xr), jnp.where(fe_ < fr, fe_, fr)

        def contract(_):
            def outside(_):
                fc = f(xc)
                # if fc <= fr accept, else shrink
                nx = jnp.where(fc <= fr, xc, a + 0.5 * (b - a))
                nf = jnp.where(fc <= fr, fc, f(a + 0.5 * (b - a)))
                return nx, nf

            def inside(_):
                fcc = f(xcc)
                nx = jnp.where(fcc < fb, xcc, a + 0.5 * (b - a))
                nf = jnp.where(fcc < fb, fcc, f(a + 0.5 * (b - a)))
                return nx, nf

            return lax.cond(fr < fb, outside, inside, None)

        nb, nfb = lax.cond(fr < fa, expand, contract, None)

        # re-sort simplex
        na = jnp.where(nfb < fa, nb, a)
        nfa = jnp.where(nfb < fa, nfb, fa)
        nb2 = jnp.where(nfb < fa, a, nb)
        nfb2 = jnp.where(nfb < fa, fa, nfb)
        return na, nfa, nb2, nfb2, it + 1

    a, fa, b, fb, it = lax.while_loop(cond, body, (a, fa, b, fb, jnp.array(0, dtype=jnp.int32)))
    converged = (jnp.abs(b - a) <= xtol) & (jnp.abs(fb - fa) <= ftol)
    return a, fa, it, converged


@partial(jax.jit, static_argnames=("meta", "order", "min_width", "extrapolate", "full_mom", "collect"))
def find_phase_eq_state(
    h: Hist,
    meta: HistMeta,
    lnZ_tol: float,
    mu_guess,
    beta=None,
    dmu=None,
    order: int = 1,
    min_width: int = 0,
    extrapolate: bool = False,
    full_mom: bool = True,
    collect=None,
):
    """Locate mu_1 at phase coexistence; return the coexistence state.

    Parity flow: find_phase_eq (gc_hist.pyx:598-668) — minimize
    phase_eq_error over mu_1, then reweight (+extrapolate with full
    moments) at the solution.

    Returns (Hist at coexistence, mu_star, err, converged).
    """
    if beta is None:
        beta = h.curr_beta
    if dmu is None:
        dmu = h.curr_mu[1:] - h.curr_mu[0]

    def obj(mu):
        return phase_eq_error(
            mu, h, meta, beta=beta, dmu=dmu, order=order, min_width=min_width,
            extrapolate=extrapolate, collect=collect,
        )

    # The objective is (dFE)^2, so meeting |dFE| <= lnZ_tol (the BASELINE
    # coexistence bar, stronger than scipy-fmin's ftol-on-err^2 semantics)
    # needs the squared tolerance.
    mu_star, err, _, converged = nelder_mead_1d(obj, mu_guess, xtol=1e-10, ftol=lnZ_tol**2)

    out = reweight(h, mu_star)
    if extrapolate:
        out = temp_dmu_extrap(out, meta, beta, dmu, order=order, skip_mom=not full_mom)
    return out, mu_star, err, converged


@partial(jax.jit, static_argnames=("meta", "order", "min_width"))
def trace_coexistence(
    h: Hist,
    meta: HistMeta,
    betas,
    mu_guess,
    lnZ_tol: float = 1.0e-5,
    dmu=None,
    order: int = 1,
    min_width: int = 0,
):
    """Vapor-liquid coexistence curve over a whole temperature array in
    one vmapped launch — the phase-diagram workflow of the reference
    notebooks (one serial scipy solve per beta) as a single device call.

    Returns dict with per-beta mu_star, per-phase padded free energies,
    densities, x_i, masks and convergence flags.
    """
    if dmu is None:
        dmu = h.curr_mu[1:] - h.curr_mu[0]
    betas = jnp.atleast_1d(jnp.asarray(betas, dtype=h.lnpi.dtype))

    def solve_at(beta):
        out, mu_star, err, conv = find_phase_eq_state(
            h, meta, lnZ_tol, mu_guess, beta=beta, dmu=dmu, order=order,
            min_width=min_width, extrapolate=True, full_mom=True,
        )
        from .segment import thermo_props

        out, pt, props = thermo_props(out, meta)
        return {
            "mu_star": mu_star,
            "fe": pt.fe,
            "mask": pt.mask,
            "density": props["density"],
            "x_i": props["x_i"],
            "ntot": props["ntot"],
            "u": props["u"],
            "err": err,
            "converged": conv,
        }

    return jax.vmap(solve_at)(betas)
