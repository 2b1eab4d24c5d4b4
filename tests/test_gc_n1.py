"""Parity suite for the N_1 histogram engine (reference n1/gc_hist.pyx).

The reference ships NO tests for the n1 variant (acknowledged in SURVEY
§4); every expectation here is derived directly from the n1 formulas:
reweight by N_1 with non-rigid mu update (:70-78, 259-282), first/second
order (beta, absolute-mu) Taylor coefficients (:691-1032), coexistence
with min_width = smooth (:1435-1496).
"""

import copy

import numpy as np
import pytest

import fhmcanalysis_tpu.histogram.n1 as oneDH
from fhmcanalysis_tpu.io import write_composite

BETA_REF = 1.0
MU_REF = [1.2, -0.4]


def make_n1_fixture(path, n=31, nspec=2, max_order=3):
    """Synthesize a consistent N_1 composite: N_1 deterministic per bin,
    N_2 and U smooth profiles with inflated higher moments so semigrand
    fluctuations are nonzero."""
    rng = np.random.default_rng(7)
    n1 = np.arange(n, dtype=float)
    n2 = 0.7 * n1 + 1.0 + 0.05 * np.sin(n1 / 3.0)
    u = -0.3 * n1 - 0.01 * n1**2

    lnpi = np.concatenate(
        [np.linspace(0, 10, 11), np.linspace(10, 0, 10)[1:], np.linspace(0, 5, 6)[1:], np.linspace(5, 0, 7)[1:]]
    )
    assert len(lnpi) == n

    mo1 = max_order + 1
    # unique physical values per (a, b, p): start from the deterministic
    # products and inflate higher powers to create fluctuations
    vals = {}
    for a in range(2 * max_order + 1):
        for b in range(2 * max_order + 1):
            for p in range(mo1):
                infl = 1.0 + 0.02 * (a * (a - 1) + b * (b - 1) + p * (p - 1)) + 0.001 * (a * b + b * p)
                vals[(a, b, p)] = (n1**a) * (n2**b) * (u**p) * infl

    mom = np.zeros((nspec, mo1, nspec, mo1, mo1, n))
    for i in range(nspec):
        for j in range(mo1):
            for k in range(nspec):
                for m in range(mo1):
                    for p in range(mo1):
                        a = (j if i == 0 else 0) + (m if k == 0 else 0)
                        b = (j if i == 1 else 0) + (m if k == 1 else 0)
                        mom[i, j, k, m, p] = vals[(a, b, p)]

    bins = 4
    pk = {
        "hist": np.full((nspec, n, bins), 0.25),
        "lb": np.zeros((nspec, n)),
        "ub": np.full((nspec, n), 3.0),
        "bw": np.ones((nspec, n)),
    }
    eh = {
        "hist": np.full((n, bins), 0.25),
        "lb": np.zeros(n),
        "ub": np.full(n, 3.0),
        "bw": np.ones(n),
    }
    write_composite(
        str(path), lnpi, n1.astype(int), mom, volume=512.0, nspec=nspec, max_order=max_order,
        op_name="N_{1}", pk_hist=pk, e_hist=eh,
    )
    return lnpi, mom, n1


@pytest.fixture(scope="module")
def fixture_nc(tmp_path_factory):
    p = tmp_path_factory.mktemp("n1") / "n1_composite.nc"
    lnpi, mom, n1 = make_n1_fixture(p)
    return str(p), lnpi, mom, n1


def test_load(fixture_nc):
    fn, lnpi, mom, n1 = fixture_nc
    h = oneDH.histogram(fn, BETA_REF, MU_REF, 1)
    assert np.all(h.data["n1"] == np.arange(31))
    assert h.data["mom"].shape == (2, 4, 2, 4, 4, 31)
    assert h.data["max_order"] == 3
    assert np.allclose(h.data["ln(PI)"], lnpi)
    assert "hist" in h.data["pk_hist"] and "hist" in h.data["e_hist"]


def test_reweight_by_n1_nonrigid_mu(fixture_nc):
    fn, lnpi, mom, n1 = fixture_nc
    h = oneDH.histogram(fn, BETA_REF, MU_REF, 1)
    h.reweight(0.5)
    x = lnpi + (0.5 - MU_REF[0]) * BETA_REF * n1
    x -= np.log(np.sum(np.exp(x)))
    assert np.all(np.abs(h.data["ln(PI)"] - x) < 1.0e-12)
    # only mu_1 changes
    assert h.data["curr_mu"][0] == 0.5
    assert h.data["curr_mu"][1] == MU_REF[1]


def test_sg_kernels_vs_formulas(fixture_nc):
    fn, _, _, _ = fixture_nc
    h = oneDH.histogram(fn, BETA_REF, MU_REF, 1)
    mom = h.data["mom"]
    mu = h.data["curr_mu"]

    def sg_dB_np(x):
        i, j, k, m, p = x
        f_XU = mom[i, j, k, m, p + 1] - mom[i, j, k, m, p] * mom[0, 0, 0, 0, 1]
        der = -f_XU
        # species 2 only (absolute mu conjugate), XNi cascade
        if k == 1 and m + 1 <= 3:
            XNi = mom[i, j, k, m + 1, p]
        elif j == 0:
            XNi = mom[1, 1, k, m, p]
        elif m == 0:
            XNi = mom[i, j, 1, 1, p]
        else:
            raise ValueError
        der += mu[1] * (XNi - mom[i, j, k, m, p] * mom[1, 1, 0, 0, 0])
        return der

    for idx in [(0, 1, 0, 0, 0), (0, 0, 0, 0, 1), (0, 1, 1, 1, 0), (1, 1, 0, 0, 1)]:
        got = h._sg_dX_dB(list(idx))
        want = sg_dB_np(idx)
        assert np.allclose(got, want, rtol=1e-12, atol=1e-12), idx

    # dMu kernel: beta * (XN2 - mom*N2)
    got = h._sg_dX_dMU(0, [0, 1, 0, 0, 0])
    want = BETA_REF * (mom[0, 1, 1, 1, 0] - mom[0, 1, 0, 0, 0] * mom[1, 1, 0, 0, 0])
    assert np.allclose(got, want, rtol=1e-12, atol=1e-12)


def test_temp_mu_extrap_1(fixture_nc):
    fn, _, _, _ = fixture_nc
    h = oneDH.histogram(fn, BETA_REF, MU_REF, 1)
    target_beta = 1.15
    target_mus = np.array([-0.2])

    newh = h.temp_mu_extrap(target_beta, target_mus, 1, 10.0, True, True, True)
    assert newh.data["curr_beta"] == target_beta
    assert newh.data["curr_mu"][1] == -0.2
    assert newh.data["curr_mu"][0] == MU_REF[0]
    newh.normalize()

    lnpi = h.data["ln(PI)"]
    mom = h.data["mom"]
    n1 = h.data["n1"]
    mu = h.data["curr_mu"]
    prob = np.exp(lnpi - np.max(lnpi))
    prob /= np.sum(prob)

    ave_n1 = np.sum(prob * mom[0, 1, 0, 0, 0])
    ave_n2 = np.sum(prob * mom[1, 1, 0, 0, 0])
    ave_u = np.sum(prob * mom[0, 0, 0, 0, 1])

    # n1 dlnPI/dB = sum_i mu_i (N_i - <N_i>) - (U - <U>)   (n1 _dB)
    dlnpi_dB = mu[0] * (mom[0, 1, 0, 0, 0] - ave_n1) + mu[1] * (mom[1, 1, 0, 0, 0] - ave_n2) - (
        mom[0, 0, 0, 0, 1] - ave_u
    )
    dlnpi_dmu2 = BETA_REF * (mom[1, 1, 0, 0, 0] - ave_n2)

    check = lnpi + (target_beta - BETA_REF) * dlnpi_dB + (target_mus[0] - MU_REF[1]) * dlnpi_dmu2
    check -= np.max(check)
    check -= np.log(np.sum(np.exp(check)))
    got = newh.data["ln(PI)"] - np.max(newh.data["ln(PI)"])
    got -= np.log(np.sum(np.exp(got)))
    assert np.all(np.abs(got - check) < 1.0e-11)


def test_temp_mu_extrap_2_hessian(fixture_nc):
    fn, _, _, _ = fixture_nc
    h = oneDH.histogram(fn, BETA_REF, MU_REF, 1)
    target_beta = 1.1
    target_mus = np.array([-0.3])

    newh = h.temp_mu_extrap(target_beta, target_mus, 2, 10.0, True, True, True)
    newh.normalize()

    lnpi = h.data["ln(PI)"]
    mom = h.data["mom"]
    mu = h.data["curr_mu"]
    prob = np.exp(lnpi - np.max(lnpi))
    prob /= np.sum(prob)
    ave_n1 = np.sum(prob * mom[0, 1, 0, 0, 0])
    ave_n2 = np.sum(prob * mom[1, 1, 0, 0, 0])
    ave_u = np.sum(prob * mom[0, 0, 0, 0, 1])

    d1_B = mu[0] * (mom[0, 1, 0, 0, 0] - ave_n1) + mu[1] * (mom[1, 1, 0, 0, 0] - ave_n2) - (
        mom[0, 0, 0, 0, 1] - ave_u
    )
    d1_m = BETA_REF * (mom[1, 1, 0, 0, 0] - ave_n2)

    # Hessian from the engine kernels (assembly mirrors n1 _dBMU2)
    H = np.zeros((2, 2, 31))
    H[0, 0] = (
        mu[1] * (h._sg_dX_dB([1, 1, 0, 0, 0]) - h._gc_dX_dB([1, 1, 0, 0, 0]))
        + mu[0] * (-h._gc_dX_dB([0, 1, 0, 0, 0]))
        - (h._sg_dX_dB([0, 0, 0, 0, 1]) - h._gc_dX_dB([0, 0, 0, 0, 1]))
    )
    H[0, 1] = (mom[1, 1, 0, 0, 0] - ave_n2) + BETA_REF * (
        h._sg_dX_dB([1, 1, 0, 0, 0]) - h._gc_dX_dB([1, 1, 0, 0, 0])
    )
    H[1, 0] = H[0, 1]
    f = mom[1, 1, 1, 1, 0] - mom[1, 1, 1, 0, 0] * mom[1, 0, 1, 1, 0]
    H[1, 1] = BETA_REF**2 * (f - h._gc_fluct_ii([1, 1, 0, 0, 0], [1, 1, 0, 0, 0]))

    xi = np.array([target_beta - BETA_REF, target_mus[0] - MU_REF[1]])
    check = lnpi + xi[0] * d1_B + xi[1] * d1_m
    for i in range(31):
        check[i] += 0.5 * xi @ H[:, :, i] @ xi
    check -= np.max(check)
    check -= np.log(np.sum(np.exp(check)))
    got = newh.data["ln(PI)"] - np.max(newh.data["ln(PI)"])
    got -= np.log(np.sum(np.exp(got)))
    assert np.all(np.abs(got - check) < 1.0e-10)


def test_temp_mu_extrap_multi(fixture_nc):
    fn, _, _, _ = fixture_nc
    h = oneDH.histogram(fn, BETA_REF, MU_REF, 1)
    betas = np.array([1.1, 0.9])
    mus = np.array([[-0.3], [-0.5]])
    grid = h.temp_mu_extrap_multi(betas, mus, 2, 10.0, True, True)
    assert len(grid) == 2 and len(grid[0]) == 2
    for a in range(2):
        for b in range(2):
            hc = copy.deepcopy(h)
            hn = hc.temp_mu_extrap(betas[a], mus[b], 2, 10.0, True, True, True)
            assert np.all(np.abs(hn.data["ln(PI)"] - grid[a][b].data["ln(PI)"]) < 1.0e-9)
            assert grid[a][b].data["curr_beta"] == betas[a]
            assert grid[a][b].data["curr_mu"][1] == mus[b][0]


def test_thermo_and_phase_eq(fixture_nc):
    fn, lnpi, _, _ = fixture_nc
    h = oneDH.histogram(fn, BETA_REF, MU_REF, 1)
    h.thermo()
    assert len(h.data["thermo"]) == 2  # double-well fixture

    eq = h.find_phase_eq(0.001, MU_REF[0])
    fe = [eq.data["thermo"][p]["F.E./kT"] for p in eq.data["thermo"]]
    assert abs(fe[0] - fe[1]) < 0.001
    # only mu_1 moved
    assert eq.data["curr_mu"][1] == MU_REF[1]


def test_dmu_paths_rejected(fixture_nc):
    fn, _, _, _ = fixture_nc
    h = oneDH.histogram(fn, BETA_REF, MU_REF, 1)
    with pytest.raises(AttributeError):
        h.temp_dmu_extrap(1.1, np.array([-0.3]))
    with pytest.raises(AttributeError):
        h.dmu_extrap(np.array([-0.3]))
