"""Basic multivariable (beta, dMu_2) Taylor extrapolation of lnPI.

Mirrors the reference notebook example/ntot/binary_square_well/
basic_multivariable_extrapolation.ipynb: take ONE simulation (at
beta_ref, dMu_2 = 0), jointly Taylor-extrapolate its lnPI surface to
other (beta, dMu_2) state points (temp_dmu_extrap, gc_hist.pyx:889), and
compare against INDEPENDENT simulations actually run at those state
points — the notebook plots the curves; this script asserts the numbers
it reads off them:

  * extrapolating to the source state point reproduces it exactly;
  * errors grow with the extrapolation distance |dMu_2|;
  * second order beats first order by an order of magnitude at the far
    sources (the notebook's headline message).

Runs on the reference's binary ideal-gas example data (two temperatures,
five dMu_2 values each — the square-well notebook data is not shipped).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# NB: avoid PYTHONPATH — it breaks axon TPU plugin registration

import numpy as np

from fhmcanalysis_tpu.histogram.ntot import histogram

DATA = "/root/reference/example/ntot/binary_ideal_gas"
MU1 = -5.0  # arbitrary comparison chemical potential, as the notebook picks -5.1


def load(T):
    head = os.path.join(DATA, "T_%.2f" % T)
    out = {}
    for d in sorted(x for x in os.listdir(head) if "dMu2" in x):
        dmu2 = float(d.split("_")[1])
        out[dmu2] = histogram(os.path.join(head, d, "composite.nc"), 1.0 / T, [0.0, dmu2], smooth=10)
    return out


def peak_errors(base, sims, target_beta, order):
    """Extrapolate base to (target_beta, dmu2) for every simulated dmu2;
    return {dmu2: (lnPI error at the simulated peak, peak-location shift)}
    — the notebook's max_err / max_err_n dictionaries."""
    out = {}
    for dmu2, sim in sorted(sims.items()):
        sim.reweight(MU1)
        clone = base.temp_dmu_extrap(target_beta, np.array([dmu2]), order)
        ms = min(len(sim.data["ln(PI)"]), len(clone.data["ln(PI)"]))
        a = np.asarray(sim.data["ln(PI)"][:ms])
        b = np.asarray(clone.data["ln(PI)"][:ms])
        loc = int(np.argmax(a))
        out[dmu2] = (float(a[loc] - b[loc]), loc - int(np.argmax(b)))
    return out


def main():
    h120 = load(1.20)
    h100 = load(1.00)
    base = h120[0.0]
    base.reweight(MU1)

    print("extrapolating from (T=1.20, dMu2=0) at mu1 = %.1f" % MU1)
    results = {}
    for order in (1, 2):
        for T, sims in ((1.20, h120), (1.00, h100)):
            errs = peak_errors(base, sims, 1.0 / T, order)
            results[(order, T)] = errs
            row = "  order %d -> T=%.2f:" % (order, T)
            for dmu2, (e, dn) in sorted(errs.items()):
                row += "  %+0.2f:%+.3f(%+d)" % (dmu2, e, dn)
            print(row)

    # extrapolating to the source state point is the identity
    for order in (1, 2):
        e0, dn0 = results[(order, 1.20)][0.0]
        assert abs(e0) < 1e-10 and dn0 == 0, (order, e0, dn0)

    # pure-beta extrapolation (dMu2 = 0, dB = 1/1.0 - 1/1.2) is accurate
    for order in (1, 2):
        e0, _ = results[(order, 1.00)][0.0]
        assert abs(e0) < 0.05, (order, e0)

    # errors grow with |dMu2|, and order 2 crushes order 1 at the far
    # sources (the notebook's central claim)
    for T in (1.20, 1.00):
        for far in (-2.94, 2.94):
            e1 = abs(results[(1, T)][far][0])
            e2 = abs(results[(2, T)][far][0])
            near = abs(results[(2, T)][far / 2.94 * 1.10][0])
            assert e2 < e1, (T, far, e1, e2)
            assert near <= e2 + 1e-9 or near < 0.05, (T, far, near, e2)
    assert abs(results[(2, 1.20)][2.94][0]) < 0.5   # vs 16.3 at order 1
    assert abs(results[(1, 1.20)][2.94][0]) > 5.0

    print("OK multivariable_extrapolation")


if __name__ == "__main__":
    main()
