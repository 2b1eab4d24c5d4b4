"""Third-order temperature extrapolation (untested upstream, acknowledged
at gc_ntot test :1096).  test2.nc has max_order=4, so order 3 with full
moment extrapolation is exercisable."""

import numpy as np
import pytest

import fhmcanalysis_tpu.histogram.ntot as oneDH


@pytest.fixture
def hist(test2_nc):
    return oneDH.histogram(test2_nc, 1.0, [5.0, 0.0], 1)


def test_order3_assembly(hist):
    """Driver wiring: order-3 result == lnpi + dB d1 + dB^2/2 d2 + dB^3/6 d3
    with the kernel-level coefficient arrays (gc_hist.pyx:2106-2112)."""
    beta = 1.02
    dB = beta - 1.0

    hist.normalize()
    d1, m1 = hist._dB()
    d2, m2 = hist._dB2()
    d3, m3 = hist._dB3()
    lnpi0 = hist.data["ln(PI)"].copy()
    mom0 = hist.data["mom"].copy()

    new = hist.temp_extrap(beta, 3, 10.0, True, True, False)

    want = lnpi0 + dB * d1 + 0.5 * dB**2 * d2 + (dB**3 / 6.0) * d3
    want -= np.max(want)
    want -= np.log(np.sum(np.exp(want)))
    got = new.data["ln(PI)"] - np.max(new.data["ln(PI)"])
    got -= np.log(np.sum(np.exp(got)))
    assert np.allclose(got, want, atol=1e-10)

    want_mom = mom0 + dB * m1 + 0.5 * dB**2 * m2 + (dB**3 / 6.0) * m3
    assert np.allclose(new.data["mom"], want_mom, rtol=1e-12, atol=1e-12)


def test_order3_improves_convergence(hist):
    """Taylor sanity: for small dB, higher order changes less between
    consecutive orders (the series is converging)."""
    beta = 1.005
    h1 = hist.temp_extrap(beta, 1, 10.0, True, True, True)
    h2 = hist.temp_extrap(beta, 2, 10.0, True, True, True)
    h3 = hist.temp_extrap(beta, 3, 10.0, True, True, True)
    d12 = np.max(np.abs(h1.data["ln(PI)"] - h2.data["ln(PI)"]))
    d23 = np.max(np.abs(h2.data["ln(PI)"] - h3.data["ln(PI)"]))
    assert d23 < d12


def test_order3_rejects_ke(test2_nc):
    h = oneDH.histogram(test2_nc, 1.0, [5.0, 0.0], 1, True)
    with pytest.raises(Exception):
        h.temp_extrap(1.02, 3, 10.0, True, True, True)


def test_order3_needs_max_order(test_nc):
    h = oneDH.histogram(test_nc, 1.0, [5.0, 0.0], 1)  # max_order = 2
    with pytest.raises(Exception):
        h.temp_extrap(1.02, 3, 10.0, True, True, False)  # needs 4
