"""Device phase-equilibrium solver tests (core.solve).

The class-path find_phase_eq (scipy Nelder-Mead) is covered in
test_gc_ntot; here the fully on-device solver is checked against it and
against the BASELINE bar (dFE <= lnZ_tol at coexistence), including
vmapped multi-target solves.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import fhmcanalysis_tpu.histogram.ntot as oneDH
from fhmcanalysis_tpu.core import segment as S
from fhmcanalysis_tpu.core import solve as SV

LNPI = np.array(
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0, 1, 2, 3, 4, 5, 4, 3, 2, 1, 0],
    dtype=np.float64,
)


@pytest.fixture
def state(test_nc):
    h = oneDH.histogram(test_nc, 1.0, [5.0, 0.0], 1)
    h.data["ln(PI)"] = LNPI.copy()
    return h._hist(), h._meta(), h


def test_phase_eq_error_matches_host(state, test_nc):
    hh, meta, h = state
    from fhmcanalysis_tpu.histogram.ntot import phase_eq_error as host_err

    for mu in [4.8, 5.0, 5.2, 5.5]:
        dev = float(SV.phase_eq_error(mu, hh, meta, min_width=2))
        want = host_err(mu, h, h.data["curr_beta"], np.array([-5.0]), 1, 10.0, True, 2, None)
        assert abs(dev - want) < 1e-8, (mu, dev, want)


def test_device_solver_meets_lnz_tol(state):
    hh, meta, _ = state
    out, mu_star, err, converged = SV.find_phase_eq_state(hh, meta, 1.0e-5, 5.0, min_width=2)
    assert bool(converged)
    _, pt = S.thermo(out, meta, props=False)
    fe = np.asarray(pt.fe)[np.asarray(pt.mask)]
    assert len(fe) == 2
    # BASELINE.md: dFE/kT <= lnZ_tol at coexistence
    assert abs(fe[0] - fe[1]) <= 1.0e-5


def test_device_matches_class_solver(state):
    hh, meta, h = state
    _, mu_star, _, _ = SV.find_phase_eq_state(hh, meta, 1.0e-8, 5.0, min_width=2)
    eq = h.find_phase_eq(1.0e-8, 5.0)
    assert abs(float(mu_star) - eq.data["curr_mu"][0]) < 1e-3


def test_vmapped_solves(state):
    """Many coexistence solves in one launch — the TPU-native replacement
    for the reference's serial per-beta scipy loops."""
    hh, meta, _ = state

    def solve_at(beta):
        out, mu_star, err, conv = SV.find_phase_eq_state(
            hh, meta, 1.0e-6, 5.0, beta=beta, dmu=hh.curr_mu[1:] - hh.curr_mu[0],
            order=1, min_width=2, extrapolate=True,
        )
        _, pt = S.thermo(out, meta, props=False)
        fe = jnp.where(pt.mask, pt.fe, 0.0)
        return mu_star, fe, conv

    betas = jnp.array([0.99, 1.0, 1.01])
    mus, fes, convs = jax.vmap(solve_at)(betas)
    assert np.all(np.asarray(convs))
    fes = np.asarray(fes)
    for i in range(3):
        nz = fes[i][np.abs(fes[i]) > 0]
        assert abs(nz[0] - nz[1]) < 1e-4


def test_nelder_mead_1d_quadratic():
    f = lambda x: (x - 2.5) ** 2 + 1.0  # noqa: E731
    x, fx, it, conv = SV.nelder_mead_1d(f, 0.0, xtol=1e-8, ftol=1e-12)
    assert bool(conv)
    assert abs(float(x) - 2.5) < 1e-6


def test_trace_coexistence(state):
    """Phase-diagram-in-one-call API over a beta array."""
    hh, meta, _ = state
    out = SV.trace_coexistence(hh, meta, jnp.array([0.99, 1.0, 1.01]), 5.0, lnZ_tol=1e-6, min_width=2)
    assert np.all(np.asarray(out["converged"]))
    masks = np.asarray(out["mask"])
    fes = np.asarray(out["fe"])
    rhos = np.asarray(out["density"])
    for i in range(3):
        fe = fes[i][masks[i]]
        assert len(fe) == 2 and abs(fe[0] - fe[1]) < 1e-4
        rho = rhos[i][masks[i]]
        assert rho[0] != rho[1]  # distinct vapor/liquid densities
    # mu_star moves monotonically with beta on this surface
    mus = np.asarray(out["mu_star"])
    assert (np.all(np.diff(mus) < 0)) or (np.all(np.diff(mus) > 0))


def test_sharded_trace_matches_single_device(state):
    """sharded_trace_coexistence over the 8-device virtual mesh must agree
    with the single-device vmapped trace (replicated hist, beta-sharded)."""
    from fhmcanalysis_tpu.parallel import grid_mesh, sharded_trace_coexistence

    hh, meta, _ = state
    betas = np.linspace(0.97, 1.03, 8)
    want = SV.trace_coexistence(hh, meta, betas, 5.0, lnZ_tol=1e-6, min_width=2)
    mesh = grid_mesh(8)
    got = sharded_trace_coexistence(mesh, hh, meta, betas, 5.0, lnZ_tol=1e-6, min_width=2)
    assert np.asarray(got["converged"]).all()
    assert np.allclose(np.asarray(got["mu_star"]), np.asarray(want["mu_star"]), rtol=0, atol=1e-9)
    assert np.allclose(np.asarray(got["density"]), np.asarray(want["density"]), rtol=0, atol=1e-9)


def test_sharded_trace_rejects_indivisible(state):
    from fhmcanalysis_tpu.parallel import grid_mesh, sharded_trace_coexistence

    hh, meta, _ = state
    with pytest.raises(ValueError, match="not divisible"):
        sharded_trace_coexistence(grid_mesh(8), hh, meta, np.linspace(0.97, 1.03, 7), 5.0)
