"""Vapor-liquid phase diagram workflow (single component).

Mirrors the reference notebook example/ntot/square_well/example.ipynb:
patch windows -> composite -> coexistence across a temperature range.
The per-beta scipy loop of the reference becomes one vmapped device solve.

Runs against the bundled miniature simulation tree; swap SRC for a real
18+-window production tree.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# NB: do NOT use PYTHONPATH for this — on the axon platform any PYTHONPATH
# value breaks TPU plugin registration (measured 2026-08-16)

import numpy as np

import jax
import jax.numpy as jnp

import fhmcanalysis_tpu.win_patch.fhmc_equil as we
import fhmcanalysis_tpu.win_patch.fhmc_patch as wp
from fhmcanalysis_tpu.core import segment, solve
from fhmcanalysis_tpu.histogram.ntot import histogram

SRC = "/root/reference/unittests/reference/test_sim/"
BETA_REF = 1.0 / 1.5
MU_REF = [2.0, 2.0]


def main():
    out = tempfile.mkdtemp(prefix="fhmc_example_")

    # 1. discover, gate on equilibration, patch
    seq = wp.get_patch_sequence(SRC)
    safe = we.test_nebr_equil(seq, per_err=10.0, fname=os.path.join(out, "maxEq"), trust=True)
    composite = os.path.join(out, "composite.nc")
    wp.patch_all_windows(safe, composite, os.path.join(out, "patch.log"), offset=1)

    # 2. load the composite
    h = histogram(composite, BETA_REF, MU_REF, smooth=1)

    # The bundled miniature tree is single-phase at these conditions (the
    # coexistence objective would sit at its no-coexistence default and
    # the solver would stay at the guess, exactly as scipy fmin does in
    # the reference).  Stand in a two-phase lnPI so the solve is
    # demonstrative; remove this line with production data.
    h.data["ln(PI)"] = np.concatenate(
        [np.linspace(0, 10, 11), np.linspace(10, 0, 11)[1:], np.linspace(0, 5, 6)[1:], np.linspace(5, 0, 6)[1:]]
    )
    hh, meta = h._hist(), h._meta()

    # 3. one vmapped launch: coexistence solve at every temperature
    betas = jnp.linspace(BETA_REF * 0.98, BETA_REF * 1.02, 5)

    def solve_at(beta):
        out, mu_star, err, conv = solve.find_phase_eq_state(
            hh, meta, 1.0e-6, float(MU_REF[0]), beta=beta,
            dmu=hh.curr_mu[1:] - hh.curr_mu[0], order=1, min_width=2, extrapolate=True,
        )
        _, pt = segment.thermo(out, meta, props=True)
        props = segment.phase_props(pt, out.volume)
        return mu_star, pt.fe, pt.mask, props["density"], conv

    mus, fes, masks, rhos, convs = jax.vmap(solve_at)(betas)

    print("  beta      mu1*       rho_vap    rho_liq   converged")
    for i, b in enumerate(np.asarray(betas)):
        m = np.asarray(masks[i])
        rho = np.asarray(rhos[i])[m]
        print(
            "%8.5f  %9.5f  %9.6f  %9.6f   %s"
            % (b, float(mus[i]), rho.min(), rho.max(), bool(convs[i]))
        )

    # acceptance checks (the reference notebook's phase-diagram sanity
    # properties, example/ntot/square_well/example.ipynb): every solve
    # converged, a proper two-phase split (rho_vap < rho_liq), equal free
    # energies at coexistence, and mu* strictly monotone in beta
    mus_np = np.asarray(mus)
    assert all(bool(c) for c in np.asarray(convs)), "coexistence solve did not converge"
    for i in range(len(mus_np)):
        m = np.asarray(masks[i])
        rho = np.asarray(rhos[i])[m]
        assert len(rho) == 2 and rho.min() < rho.max(), "expected a vapor-liquid split"
        fe = np.asarray(fes[i])[m]
        assert abs(fe[0] - fe[1]) < 1e-4, "free energies not equal at coexistence"
    assert np.all(np.diff(mus_np) < 0), "mu* must fall monotonically with beta here"
    # pinned value for this workflow (solve at beta = BETA_REF, the
    # middle temperature; regression anchor for the full patch->solve chain)
    assert abs(float(mus_np[2]) - 2.50149) < 1e-3, float(mus_np[2])
    print("all acceptance checks passed")


if __name__ == "__main__":
    main()
