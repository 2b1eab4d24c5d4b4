"""Binary-mixture isopleth surface and iso-composition tracing.

Mirrors the reference notebook example/ntot/binary_square_well/
phase_behavior.ipynb: build an isopleth object from histograms at
different dMu_2, compute the (mu_1, dMu_2) surface in one batched device
launch, trace an iso-x1 contour, and check Gibbs-Duhem consistency.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# NB: avoid PYTHONPATH — it breaks axon TPU plugin registration

import numpy as np

from fhmcanalysis_tpu.binary import check_gibbs_duhem, get_iso, isopleth
from fhmcanalysis_tpu.histogram.ntot import histogram

FIXTURE = "/root/reference/unittests/reference/test.nc"


def main():
    # sources measured at different dMu_2 (here: the fixture re-tagged; use
    # real per-dMu2 composites in production)
    sources = [
        histogram(FIXTURE, 1.0, [5.0, 0.0], smooth=1),  # dMu2 = -5
        histogram(FIXTURE, 1.0, [5.0, 1.0], smooth=1),  # dMu2 = -4
    ]

    # fixture stores max_order=2, which supports order-1 moment
    # extrapolation (order 2 needs max_order >= 3 and raises upfront)
    iso = isopleth(sources, beta_target=1.02, order=1)
    Z, (X, Y) = iso.make_grid((-9.0, -6.0), (-4.9, -4.1), (0.15, 0.08))
    valid = Z > 0
    print("grid %s: %d/%d valid, x1 in [%.4f, %.4f]" % (Z.shape, valid.sum(), Z.size, Z[valid].min(), Z[valid].max()))

    # trace the median iso-composition line
    target = float(np.median(Z[valid]))
    pts = get_iso(target, Z, X, Y)
    print("x1 = %.4f isopleth: %d points, mu_1 range [%.2f, %.2f]" % (
        target, len(pts), min(p[0] for p in pts), max(p[0] for p in pts)))

    # persist + resample
    import os
    import tempfile

    iso.dump(os.path.join(tempfile.mkdtemp(prefix="fhmc_example_"), "isopleth.json"))
    zz, (zx, zy), rho, fe = iso.zoom(2.0, order=1)
    print("zoomed surface:", zz.shape)

    # acceptance checks (the reference notebook's consistency properties,
    # example/ntot/binary_square_well/phase_behavior.ipynb)
    assert valid.sum() > 0.9 * Z.size, "most cells must evaluate cleanly"
    assert 0.0 < Z[valid].min() and Z[valid].max() < 1.0, "x1 must be a mole fraction"
    assert (iso.data["fail_code"][~valid] != 0).all() and (iso.data["fail_code"][valid] == 0).all()
    assert len(pts) > 3, "iso-composition trace must produce a contour"
    assert zz.shape[0] > Z.shape[0] and zz.shape[1] > Z.shape[1], "zoom must refine the lattice"

    # Gibbs-Duhem consistency along an isobar: x1 dmu1/dx1 + x2 dmu2/dx1
    # must vanish.  beta*P*V = -F.E./kT on this surface, and any monotone
    # transform of P traces the same isobars, so -F.E./kT serves as the
    # pressure grid directly (gc_binary.pyx:566-635 workflow).
    p_grid = np.where(valid, -np.asarray(iso.data["F.E./kT"]), np.nan)
    p_iso = float(np.nanmedian(p_grid))
    res = check_gibbs_duhem(np.array([p_iso]), Z, p_grid, X, Y)
    _, errs, x1s, _, _ = res[0]
    errs = np.asarray(errs)
    assert errs.size > 3, "isobar trace too short for a Gibbs-Duhem check"
    resid = float(np.median(np.abs(errs)))
    print("Gibbs-Duhem median |residual| along P*V*beta=%.3f: %.2e" % (p_iso, resid))
    assert resid < 0.05, resid
    print("all acceptance checks passed")


if __name__ == "__main__":
    main()
