"""Combining simulations at different dMu_2 into one isopleth surface.

Mirrors the reference notebook example/ntot/binary_square_well/
combining_simulations.ipynb: several grand-canonical simulations run at
the same temperature but different dMu_2 are combined — each grid point
brackets its two nearest sources, Taylor-extrapolates both to the target
(beta, dMu_2), and blends them with inverse-distance^m weights
(gc_binary.pyx:355-476) — then the whole surface is checked for
thermodynamic consistency via the Gibbs-Duhem equation.

The notebook's square-well data is not shipped with the reference; this
script runs the identical workflow on its binary IDEAL GAS example data
(example/ntot/binary_ideal_gas), which is better for an asserted example:
the exact answers are known in closed form,

    x_1 = 1 / (1 + exp(beta * dMu_2))        (composition)
    P   = (z_1 + z_2) / beta,  z_i = exp(beta * mu_i)   (pressure)

so every claim the notebook makes visually is asserted numerically here.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# NB: avoid PYTHONPATH — it breaks axon TPU plugin registration

import numpy as np

from fhmcanalysis_tpu.binary import check_gibbs_duhem, isopleth
from fhmcanalysis_tpu.histogram.ntot import histogram

DATA = "/root/reference/example/ntot/binary_ideal_gas/T_1.20"
VOLUME = 512.0  # simulation cell of the provided data


def mixing_weights(dl, dr, m):
    """The inverse-distance^m blend the grid uses for its two bracketing
    sources (gc_binary.pyx:457-460); the notebook plots this family over
    m to motivate the default m = 2.5."""
    return dr**m / (dl**m + dr**m)


def main():
    # --- the notebook's conceptual weight-function cells, asserted ---
    d = np.linspace(1e-3, np.pi - 1e-3, 1000)
    for m in [1, 5, 100]:
        w = mixing_weights(d, np.max(d) - d, m)
        assert abs(w[0] - 1.0) < 1e-2 and abs(w[-1]) < 1e-2  # nearer wins
        assert abs(mixing_weights(np.pi / 2, np.pi / 2, m) - 0.5) < 1e-12
    assert np.all(np.diff(mixing_weights(d, np.max(d) - d, 5)) <= 1e-12)

    # --- collect the per-dMu2 composites measured at T = 1.20 ---
    beta_ref = 1.0 / 1.20
    smooth = 10
    histograms = []
    for dd in sorted(x for x in os.listdir(DATA) if "dMu2" in x):
        dmu2 = float(dd.split("_")[1])
        histograms.append(histogram(os.path.join(DATA, dd, "composite.nc"), beta_ref, [0.0, dmu2], smooth))
    print("sources: %d simulations at dMu2 = %s" % (
        len(histograms), [round(float(h.data["curr_mu"][1]), 2) for h in histograms]))

    # --- build the surface at a DIFFERENT temperature (T = 1.10) ---
    target_beta = 1.0 / 1.10
    iso = isopleth(histograms, beta_target=target_beta, order=2)
    Z, (X, Y) = iso.make_grid((-6.0, -4.0), (-2.5, 2.5), (0.25, 0.25), m=2.5)
    valid = np.asarray(iso.data["valid"]).astype(bool)
    print("grid %s: %d/%d valid cells" % (Z.shape, valid.sum(), Z.size))
    assert valid.sum() > 0.7 * Z.size

    # --- composition vs the exact ideal-gas answer ---
    x1_exact = 1.0 / (1.0 + np.exp(target_beta * Y))
    x1_err = np.abs(Z - x1_exact)[valid]
    print("x1 error vs analytic: max %.2e mean %.2e" % (x1_err.max(), x1_err.mean()))
    assert x1_err.max() < 0.02

    # --- pressure surface vs the exact ideal-gas answer ---
    P = -iso.data["F.E./kT"] / VOLUME / target_beta
    z1 = np.exp(target_beta * X)
    z2 = np.exp(target_beta * (X + Y))
    p_rel = np.abs(P / ((z1 + z2) / target_beta) - 1.0)[valid]
    print("P relative error vs analytic: max %.2e" % p_rel.max())
    assert p_rel.max() < 0.02

    # --- Gibbs-Duhem consistency along an isobar inside the valid region ---
    results = check_gibbs_duhem(np.array([0.02]), Z, P, X, Y)
    for p_, psi, x1_, pts, q_beta in results:
        assert psi is not None, "isobar escaped the grid"
        worst = np.max(np.abs(psi[1:]))  # first entry trimmed, as the notebook does
        print("isobar P=%.3f: %d points, max |x1 dmu1/dx1 + (1-x1) dmu2/dx1| = %.3f" % (p_, len(x1_), worst))
        assert worst < 0.5

    print("OK combining_simulations")


if __name__ == "__main__":
    main()
