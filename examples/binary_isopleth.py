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

from fhmcanalysis_tpu.binary import get_iso, isopleth
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


if __name__ == "__main__":
    main()
