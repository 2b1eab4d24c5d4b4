"""Mutual-diffusion workflow: thermodynamic factor along an iso-composition path.

Mirrors the reference notebook example/ntot/mutual_diffusion/
mutual_diffusion.ipynb: build an isopleth surface at a target temperature,
trace the iso-x1 contour, parameterize pressure vs packing fraction along
it, and extract Q_1 = x1 dmu1/dx1 (the Gibbs-Duhem lhs spline by-product,
gc_binary.pyx:566-635) at the target composition — the thermodynamic
factor needed for Maxwell-Stefan/Fick mutual-diffusion conversions.

The notebook's size-asymmetric square-well data is not shipped; the same
pipeline runs here on the binary ideal-gas example data with the
notebook's size asymmetry applied in the packing-fraction definition
(sig22 = 1.5), so the closed-form answers

    x_1 = 0.5 contour  <=>  dMu_2 = 0
    P(phi) = phi / (pi/6 (sig11^3 x1 + sig22^3 (1-x1))) / beta

assert the workflow end to end.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# NB: avoid PYTHONPATH — it breaks axon TPU plugin registration

import numpy as np
from scipy.interpolate import interp1d

from fhmcanalysis_tpu.binary import check_gibbs_duhem, get_iso, isopleth, parameterize_mesh
from fhmcanalysis_tpu.histogram.ntot import histogram

DATA = "/root/reference/example/ntot/binary_ideal_gas/T_1.20"
VOLUME = 512.0
SIG11, SIG22 = 1.00, 1.50  # notebook's fluid asymmetry (mutual_diffusion.ipynb cell 3)


def main():
    beta_ref = 1.0 / 1.20
    histograms = []
    for d in sorted(x for x in os.listdir(DATA) if "dMu2" in x):
        dmu2 = float(d.split("_")[1])
        histograms.append(histogram(os.path.join(DATA, d, "composite.nc"), beta_ref, [0.0, dmu2], smooth=10))

    target_beta = 1.0 / 1.10
    iso = isopleth(histograms, beta_target=target_beta, order=2)
    Z, (X, Y) = iso.make_grid((-6.0, -4.0), (-2.0, 2.0), (0.2, 0.2), m=2.5)

    # --- iso-composition path: for the ideal gas x1 = 0.5 <=> dMu2 = 0 ---
    x1 = 0.5
    mu_vals = get_iso(x1, Z, X, Y)
    dmu2_along = np.array([q[1] for q in mu_vals])
    print("iso x1=%.2f: %d points, |dMu2| <= %.3f" % (x1, len(mu_vals), np.abs(dmu2_along).max()))
    assert len(mu_vals) >= 5
    assert np.abs(dmu2_along).max() < 0.05

    # --- pressure vs packing fraction along the path ---
    p = -iso.data["F.E./kT"] / VOLUME / target_beta
    rho = iso.data["density"]
    phi = np.pi / 6.0 * ((SIG11**3) * x1 * rho + (SIG22**3) * (1.0 - x1) * rho)
    xy = parameterize_mesh(X, Y, phi, p, mu_vals)
    phi_v = np.array([q[0] for q in xy])
    p_v = np.array([q[1] for q in xy])
    srt = np.argsort(phi_v)
    f = interp1d(phi_v[srt], p_v[srt], kind="cubic")

    packing_frac = 0.02
    assert phi_v.min() < packing_frac < phi_v.max()
    p_at = float(f(packing_frac))
    p_exact = packing_frac / (np.pi / 6.0 * ((SIG11**3) * x1 + (SIG22**3) * (1 - x1))) / target_beta
    print("P(phi=%.2f) = %.6f  (exact %.6f, rel err %.1e)" % (packing_frac, p_at, p_exact, abs(p_at / p_exact - 1)))
    assert abs(p_at / p_exact - 1) < 5e-3

    # --- Q_1 = x1 dmu1/dx1 at the target composition from the GD splines ---
    for p_, psi, x1_, pts, q_beta in check_gibbs_duhem(np.array([p_at]), Z, p, X, Y, k=5, s=0.001):
        assert psi is not None, "isobar escaped the grid"
        psi = np.asarray(psi)
        x1_ = np.asarray(x1_)
        q_beta = np.asarray(q_beta)
        worst = np.max(np.abs(psi[1:]))
        f2 = interp1d(x1_, q_beta, kind="cubic" if len(x1_) > 3 else "linear")
        assert x1_.min() < x1 < x1_.max()
        q1 = float(f2(x1)) * target_beta
        print("P = %.5f  T = %.3f  max|psi| = %.3f  Q_1 = %.4f" % (p_, 1.0 / target_beta, worst, q1))
        # ideal mixture: mu_1 = ln(x1 P beta)/beta + const  =>  Q_1 = 1/beta
        assert abs(q1 * target_beta - 1.0) < 0.2

    print("OK mutual_diffusion")


if __name__ == "__main__":
    main()
