"""Parity suite for the N_tot histogram engine.

Mirrors /root/reference/unittests/moments_histogram_one_dim_gc_ntot.py:
every expectation is an independent NumPy re-derivation (oracle-free), with
the reference's tolerances (1e-12 lnPI elementwise, 1e-6 scalars, 1e-9
multi-grid).
"""

import copy

import numpy as np
import pytest

import fhmcanalysis_tpu.histogram.ntot as oneDH

BETA_REF = 1.0
MU_REF = [5.0, 0.0]
SMOOTH = 1


@pytest.fixture
def hist(test_nc):
    return oneDH.histogram(test_nc, BETA_REF, MU_REF, SMOOTH)


def synth_hist(hist):
    """The synthetic double-peak state used throughout the reference tests."""
    hist.data["mom"] = np.ones((2, 3, 2, 3, 3, 31), dtype=np.float64)
    hist.data["ln(PI)"] = np.array(
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0, 1, 2, 3, 4, 5, 4, 3, 2, 1, 0],
        dtype=np.float64,
    )
    hist.data["mom"][0, 1, 0, 0, :] = np.arange(0, 31)
    hist.data["mom"][1, 1, 0, 0, :] = np.arange(0, 31) * 2
    return hist


class TestInitLoad:
    def test_init(self, test_nc):
        h = oneDH.histogram(test_nc, BETA_REF, MU_REF, SMOOTH)
        assert h.metadata["beta_ref"] == BETA_REF
        assert np.all(h.metadata["mu_ref"] == MU_REF)
        assert h.metadata["smooth"] == SMOOTH
        assert h.metadata["fname"] == test_nc

    def test_load(self, hist):
        assert hist.data["ln(PI)"].shape == (31,)
        assert hist.data["max_order"] == 2
        assert hist.data["volume"] == 729
        assert np.all(hist.data["ntot"] == np.arange(0, 31))
        assert hist.data["lb"] == hist.data["ntot"][0]
        assert hist.data["ub"] == hist.data["ntot"][30]
        assert hist.data["pk_hist"]["hist"].shape == (2, 31, 122)
        assert hist.data["pk_hist"]["lb"].shape == (2, 31)
        assert hist.data["pk_hist"]["ub"].shape == (2, 31)
        assert hist.data["pk_hist"]["bw"].shape == (2, 31)
        assert hist.data["e_hist"]["hist"].shape == (31, 122)
        assert hist.data["e_hist"]["lb"].shape == (31,)
        assert hist.data["mom"].shape == (2, 3, 2, 3, 3, 31)

    def test_clear(self, hist):
        hist.clear()
        assert len(hist.data) == 0
        assert len(hist.metadata) != 0


class TestNormReweight:
    def test_norm(self, hist):
        assert np.abs(np.sum(np.exp(hist.data["ln(PI)"])) - 1.0) > 1.0e-6
        hist.normalize()
        assert np.abs(np.sum(np.exp(hist.data["ln(PI)"])) - 1.0) < 1.0e-6

    def test_rew(self, hist):
        lnpi_1 = copy.copy(hist.data["ln(PI)"])
        hist.reweight(0.0)
        lnpi_2 = copy.copy(hist.data["ln(PI)"])
        x = lnpi_1 + np.arange(0, 31) * BETA_REF * (0.0 - MU_REF[0])
        x -= np.log(np.sum(np.exp(x)))
        assert np.all(np.abs(lnpi_2 - x) < 1.0e-12)

        hist.reweight(-5.0)
        lnpi_3 = copy.copy(hist.data["ln(PI)"])
        x = lnpi_1 + np.arange(0, 31) * BETA_REF * (-5.0 - MU_REF[0])
        x -= np.log(np.sum(np.exp(x)))
        assert np.all(np.abs(lnpi_3 - x) < 1.0e-12)

        hist.clear()
        hist.reload()
        assert np.all(np.abs(hist.data["ln(PI)"] - lnpi_1) < 1.0e-12)
        hist.reweight(-5.0)
        assert np.all(np.abs(hist.data["ln(PI)"] - lnpi_3) < 1.0e-12)


class TestRelextrema:
    def test_shapes(self, hist):
        hist.data["ln(PI)"] = np.array([1, 2, 3, 2, 1, 2, 3, 4, 5])
        hist.relextrema()
        assert np.all(hist.data["ln(PI)_maxima_idx"] == [2, 8])
        assert np.all(hist.data["ln(PI)_minima_idx"] == [0, 4])

        hist.data["ln(PI)"] = np.array([1, 2, 3, 2, 1, 2])
        hist.relextrema()
        assert np.all(hist.data["ln(PI)_maxima_idx"] == [2, 5])
        assert np.all(hist.data["ln(PI)_minima_idx"] == [0, 4])

        hist.data["ln(PI)"] = np.array([1, 2, 3, 2, 1])
        hist.relextrema()
        assert np.all(hist.data["ln(PI)_maxima_idx"] == [2])
        assert np.all(hist.data["ln(PI)_minima_idx"] == [0, 4])

        hist.data["ln(PI)"] = np.array([2, 1, 2, 3, 2, 1])
        hist.relextrema()
        assert np.all(hist.data["ln(PI)_maxima_idx"] == [0, 3])
        assert np.all(hist.data["ln(PI)_minima_idx"] == [1, 5])


class TestThermo:
    def test_thermo(self, hist):
        hist = synth_hist(hist)
        hist.thermo()
        lnpi = hist.data["ln(PI)"]
        assert len(hist.data["thermo"]) == 2
        assert np.all(hist.data["ln(PI)_maxima_idx"] == [10, 25])
        fe0 = -np.log(np.sum(np.exp(lnpi[:20] - lnpi[0])))
        fe1 = -np.log(np.sum(np.exp(lnpi[20:] - lnpi[0])))
        assert np.abs(hist.data["thermo"][0]["F.E./kT"] - fe0) < 1.0e-6
        assert np.abs(hist.data["thermo"][1]["F.E./kT"] - fe1) < 1.0e-6

        w0 = np.exp(lnpi[:20])
        assert np.abs(np.sum(w0 * np.arange(0, 20)) / np.sum(w0) - hist.data["thermo"][0]["n1"]) < 1.0e-6
        assert np.abs(np.sum(w0 * np.arange(0, 20) * 2) / np.sum(w0) - hist.data["thermo"][0]["n2"]) < 1.0e-6
        assert np.abs(hist.data["thermo"][0]["n1"] - 9.99979018961) < 1.0e-6
        assert np.abs(hist.data["thermo"][0]["n2"] - 19.9995803792) < 1.0e-6
        assert np.abs(hist.data["thermo"][0]["ntot"] - 29.9993705688) < 1.0e-6
        assert np.abs(hist.data["thermo"][0]["x1"] - 9.99979018961 / 29.9993705688) < 1.0e-6
        assert np.abs(hist.data["thermo"][0]["x2"] - 19.9995803792 / 29.9993705688) < 1.0e-6
        assert np.abs(hist.data["thermo"][1]["n1"] - 25.0) < 1.0e-6
        assert np.abs(hist.data["thermo"][1]["n2"] - 50.0) < 1.0e-6
        assert np.abs(hist.data["thermo"][1]["ntot"] - 75.0) < 1.0e-6
        assert np.abs(hist.data["thermo"][1]["x1"] - 25.0 / 75.0) < 1.0e-6
        assert np.abs(hist.data["thermo"][1]["x2"] - 50.0 / 75.0) < 1.0e-6

    def test_thermo_complete(self, hist):
        hist = synth_hist(hist)
        hist.thermo(True, True)
        lnpi = hist.data["ln(PI)"]
        assert len(hist.data["thermo"]) == 1
        fe = -np.log(np.sum(np.exp(lnpi - lnpi[0])))
        assert np.abs(hist.data["thermo"][0]["F.E./kT"] - fe) < 1.0e-6
        assert np.abs(hist.data["thermo"][0]["n1"] - 10.0998274444) < 1.0e-6
        assert np.abs(hist.data["thermo"][0]["n2"] - 20.1996548887) < 1.0e-6
        assert np.abs(hist.data["thermo"][0]["ntot"] - 30.2994823331) < 1.0e-6

    def test_is_safe(self, hist):
        hist = synth_hist(hist)
        hist.thermo()
        assert not hist.is_safe(10.0)
        assert hist.is_safe(5.0)
        assert hist.is_safe(10.0, True)
        assert not hist.is_safe(10.1, True)


class TestPhaseEq:
    def test_phase_eq(self, hist):
        hist.data["ln(PI)"] = np.array(
            [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0, 1, 2, 3, 4, 5, 4, 3, 2, 1, 0],
            dtype=np.float64,
        )
        eq_hist = hist.find_phase_eq(0.001, MU_REF[0])
        fe = [eq_hist.data["thermo"][p]["F.E./kT"] for p in range(2)]
        assert np.abs(fe[0] - fe[1]) < 0.001


class TestExtrap:
    def _rich_mom(self, hist):
        hist.data["mom"] = np.ones((2, 3, 2, 3, 3, 31), dtype=np.float64)
        hist.data["ln(PI)"] = np.array(
            [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0, 1, 2, 3, 4, 5, 4, 3, 2, 1, 0],
            dtype=np.float64,
        )
        hist.data["mom"][0, 1, 0, 0, :] = np.arange(0, 31)
        hist.data["mom"][0, 1, 1, 0, :] = np.arange(0, 31)
        hist.data["mom"][0, 0, 0, 1, :] = np.arange(0, 31)
        hist.data["mom"][1, 0, 0, 1, :] = np.arange(0, 31)
        hist.data["mom"][1, 1, 0, 0, :] = np.arange(0, 31) * 2
        hist.data["mom"][1, 1, 1, 0, :] = np.arange(0, 31) * 2
        hist.data["mom"][0, 0, 1, 1, :] = np.arange(0, 31) * 2
        hist.data["mom"][1, 0, 1, 1, :] = np.arange(0, 31) * 2
        hist.data["mom"][:, 1, :, 1, :] = 1.234 * np.ones(31, dtype=np.float64)
        return hist

    def test_temp_extrap_1(self, hist):
        hist = self._rich_mom(hist)
        beta = 2.0 * hist.data["curr_beta"]
        hist.normalize()
        lnpi_orig = copy.copy(hist.data["ln(PI)"])

        ave_n2 = 20.1996548887
        ave_ntot = 30.2994823331
        ave_u = 1.0
        mu = hist.data["curr_mu"]
        dlnpi = (
            mu[0] * (np.arange(0, 31) - ave_ntot)
            + (mu[1] - mu[0]) * (np.arange(0, 31) * 2 - ave_n2)
            - (np.ones(31) - ave_u)
        )
        ans = lnpi_orig + dlnpi * (beta - hist.data["curr_beta"])
        ans -= np.log(np.sum(np.exp(ans)))
        new_hist = hist.temp_extrap(beta, 1, 10.0, True, True, True)
        assert np.all(np.abs(ans - new_hist.data["ln(PI)"]) < 1.0e-12)
        assert np.abs(beta - new_hist.data["curr_beta"]) < 1.0e-12
        # original untouched
        assert hist.data["curr_beta"] == BETA_REF

    def test_temp_extrap_2_fails_low_order(self, hist):
        with pytest.raises(Exception):
            hist.temp_extrap(2.0 * BETA_REF, 2, 10.0, True, True)

    def test_dmu2_extrap_1(self, hist):
        target_dmu = np.array([-4.0])
        newh = hist.dmu_extrap(target_dmu, 1, 10.0, True, True, False)
        assert np.all(newh.data["curr_mu"] == [5.0, 1.0])
        assert newh.data["curr_beta"] == BETA_REF

        lnpi = hist.data["ln(PI)"]
        mom = hist.data["mom"]
        ave_n2 = np.sum(np.exp(lnpi) * mom[1, 1, 0, 0, 0]) / np.sum(np.exp(lnpi))
        check = lnpi + (hist.data["curr_beta"] * (mom[1, 1, 0, 0, 0] - ave_n2) * 1.0)
        check = np.log(np.exp(check) / np.sum(np.exp(check)))
        newh.normalize()
        assert np.all(np.abs(newh.data["ln(PI)"] - check) < 1.0e-12)

    def test_dmu2_extrap_2(self, hist):
        target_dmu = np.array([-4.0])
        newh = hist.dmu_extrap(target_dmu, 2, 10.0, True, True, True)
        assert np.all(newh.data["curr_mu"] == [5.0, 1.0])
        newh.normalize()

        lnpi = hist.data["ln(PI)"]
        mom = hist.data["mom"]
        prob = np.exp(lnpi)
        sp = np.sum(prob)
        ave_n2 = np.sum(prob * mom[1, 1, 0, 0, 0]) / sp
        f_tilde = BETA_REF**2 * (mom[1, 2, 0, 0, 0] - mom[1, 1, 0, 0, 0] * mom[1, 1, 0, 0, 0])
        f_hat = BETA_REF**2 * (
            np.sum(prob * mom[1, 2, 0, 0, 0]) / sp - (np.sum(prob * mom[1, 1, 0, 0, 0]) / sp) ** 2
        )
        check = lnpi + (hist.data["curr_beta"] * (mom[1, 1, 0, 0, 0] - ave_n2) * 1.0)
        check += 0.5 * 1.0 * 1.0 * (f_tilde - f_hat)
        check = np.log(np.exp(check) / np.sum(np.exp(check)))
        assert np.all(np.abs(newh.data["ln(PI)"] - check) < 1.0e-12)

    def test_temp_dmu2_extrap_1(self, hist):
        target_dmu = np.array([-4.0])
        target_beta = 2.0 * hist.data["curr_beta"]
        newh = hist.temp_dmu_extrap(target_beta, target_dmu, 1, 10.0, True, True, True)
        assert np.all(newh.data["curr_mu"] == [5.0, 1.0])
        assert newh.data["curr_beta"] == target_beta
        newh.normalize()

        lnpi = hist.data["ln(PI)"]
        mom = hist.data["mom"]
        ntot = hist.data["ntot"]
        prob = np.exp(lnpi)
        sp = np.sum(prob)
        ave_n2 = np.sum(prob * mom[1, 1, 0, 0, 0]) / sp
        ave_ntot = np.sum(prob * ntot) / sp
        ave_u = np.sum(prob * mom[0, 0, 0, 0, 1]) / sp
        mu = hist.data["curr_mu"]

        check = lnpi + (hist.data["curr_beta"] * (mom[1, 1, 0, 0, 0] - ave_n2) * 1.0)
        dlnpi = (
            mu[0] * (ntot - ave_ntot) + (mu[1] - mu[0]) * (mom[1, 1, 0, 0, 0] - ave_n2) - (mom[0, 0, 0, 0, 1] - ave_u)
        )
        check += dlnpi * (target_beta - hist.data["curr_beta"])
        check -= np.log(np.sum(np.exp(check)))
        assert np.all(np.abs(newh.data["ln(PI)"] - check) < 1.0e-12)

    @pytest.mark.parametrize("ke", [False, True])
    def test_temp_dmu2_extrap_2(self, test_nc, ke):
        hist = oneDH.histogram(test_nc, BETA_REF, MU_REF, SMOOTH, ke)
        target_dmu = np.array([-4.0])
        target_beta = 2.0 * hist.data["curr_beta"]
        newh = hist.temp_dmu_extrap(target_beta, target_dmu, 2, 10.0, True, True, True)
        assert np.all(newh.data["curr_mu"] == [5.0, 1.0])
        assert newh.data["curr_beta"] == target_beta
        newh.normalize()

        lnpi = hist.data["ln(PI)"]
        mom = hist.data["mom"]
        ntot = hist.data["ntot"]
        prob = np.exp(lnpi)
        sp = np.sum(prob)
        ave_n2 = np.sum(prob * mom[1, 1, 0, 0, 0]) / sp
        ave_ntot = np.sum(prob * ntot) / sp
        ave_u = np.sum(prob * mom[0, 0, 0, 0, 1]) / sp
        mu = hist.data["curr_mu"]

        check = lnpi + (hist.data["curr_beta"] * (mom[1, 1, 0, 0, 0] - ave_n2) * 1.0)
        dlnpi = (
            mu[0] * (ntot - ave_ntot) + (mu[1] - mu[0]) * (mom[1, 1, 0, 0, 0] - ave_n2) - (mom[0, 0, 0, 0, 1] - ave_u)
        )
        check += dlnpi * (target_beta - hist.data["curr_beta"])

        H = np.zeros((2, 2, len(ntot)))
        xi = np.array([target_beta - hist.data["curr_beta"], 1.0])
        H[0, 0] = (
            -mu[0] * hist._gc_dX_dB([0, 0, 0, 0, 0], 1)
            + (mu[1] - mu[0]) * (hist._sg_dX_dB([1, 1, 0, 0, 0], 0) - hist._gc_dX_dB([1, 1, 0, 0, 0], 0))
            - (hist._sg_dX_dB([0, 0, 0, 0, 1], 0) - hist._gc_dX_dB([0, 0, 0, 0, 1], 0))
        )
        H[0, 1] = (mom[1, 1, 0, 0, 0] - ave_n2) + hist.data["curr_beta"] * (
            hist._sg_dX_dB([1, 1, 0, 0, 0], 0) - hist._gc_dX_dB([1, 1, 0, 0, 0], 0)
        )
        H[1, 0] = copy.copy(H[0][1])
        f_t = mom[1, 2, 0, 0, 0] - mom[1, 1, 0, 0, 0] ** 2
        f_h = hist._gc_fluct_ii([1, 1, 0, 0, 0], [1, 1, 0, 0, 0])
        H[1, 1] = hist.data["curr_beta"] ** 2 * (f_t - f_h)

        for i in range(len(ntot)):
            h2 = H[:, :, i]
            check[i] += 0.5 * np.sum(np.dot(xi, h2) * xi)
        check -= np.max(check)
        check -= np.log(np.sum(np.exp(check)))
        assert np.all(np.abs(newh.data["ln(PI)"] - check) < 1.0e-12)


class TestKE:
    """KE-correction identity tests (reference :524-879)."""

    def _pair(self, test_nc):
        ke = oneDH.histogram(test_nc, BETA_REF, MU_REF, SMOOTH, True)
        pe = oneDH.histogram(test_nc, BETA_REF, MU_REF, SMOOTH, False)
        return ke, pe

    def test_dlnpi_1_ke(self, test_nc):
        ke, pe = self._pair(test_nc)
        d_ke, _ = ke._dB()
        d_pe, _ = pe._dB()
        assert np.all(np.abs(d_ke - d_pe) < 1.0e-12)

    def test_dlnpi_2_ke(self, test_nc):
        ke, pe = self._pair(test_nc)
        d_ke, _ = ke._dB2()
        d_pe, _ = pe._dB2()
        lnpi = pe.data["ln(PI)"]
        ntot = pe.data["ntot"]
        ave_ntot = np.sum(np.exp(lnpi) * ntot) / np.sum(np.exp(lnpi))
        assert np.all(np.abs((d_ke - d_pe) - (1.5 / BETA_REF**2 * (ntot - ave_ntot))) < 1.0e-12)

    def test_sg_dx_ke(self, test_nc):
        ke, pe = self._pair(test_nc)
        ntot = pe.data["ntot"]
        mom = pe.data["mom"]

        for idx, x in [
            ([0, 0, 0, 0, 1], 1.5 / BETA_REF**2 * ntot),
            ([0, 1, 0, 0, 1], 1.5 / BETA_REF**2 * ntot * mom[0, 1, 0, 0, 0]),
            ([0, 1, 0, 1, 1], 1.5 / BETA_REF**2 * ntot * mom[0, 1, 0, 1, 0]),
            ([1, 1, 0, 1, 1], 1.5 / BETA_REF**2 * ntot * mom[1, 1, 0, 1, 0]),
        ]:
            d_ke = ke._sg_dX_dB(idx, 0)
            d_pe = pe._sg_dX_dB(idx, 0)
            assert np.allclose(d_pe - d_ke, x, rtol=1.0e-12, atol=1.0e-12)

        d_ke = ke._sg_dX_dB([1, 1, 0, 1, 1], 1)
        d_pe = pe._sg_dX_dB([1, 1, 0, 1, 1], 1)
        x = 1.5 / BETA_REF**2 * ntot * ntot * mom[1, 1, 0, 1, 0]
        assert np.allclose(d_pe - d_ke, x, rtol=1.0e-12, atol=1.0e-12)

        for idx in [[0, 1, 0, 0, 0], [0, 1, 0, 1, 0], [0, 1, 1, 1, 0]]:
            assert np.allclose(ke._sg_dX_dB(idx, 0), pe._sg_dX_dB(idx, 0), rtol=1.0e-12, atol=1.0e-12)

    def test_gc_dx_ke(self, test_nc):
        ke, pe = self._pair(test_nc)
        lnpi = pe.data["ln(PI)"]
        ntot = pe.data["ntot"]
        mom = pe.data["mom"]
        prob = np.exp(lnpi)
        sp = np.sum(prob)

        for idx, n in [([0, 0, 0, 0, 1], 0), ([0, 1, 0, 0, 1], 0), ([0, 1, 0, 1, 1], 0), ([1, 1, 0, 1, 1], 0), ([1, 1, 0, 1, 1], 1)]:
            d_ke = ke._gc_dX_dB(idx, n)
            d_pe = pe._gc_dX_dB(idx, n)
            ave = np.sum(prob * mom[idx[0], idx[1], idx[2], idx[3], idx[4] - 1] * ntot ** (n + 1)) / sp
            x = 1.5 / BETA_REF**2 * ave
            assert np.isclose(d_pe - d_ke, x, rtol=1.0e-12, atol=1.0e-12)

        for idx, n in [([0, 1, 0, 0, 0], 0), ([0, 1, 0, 1, 0], 0), ([0, 1, 1, 1, 0], 0), ([0, 1, 1, 1, 0], 1)]:
            assert np.isclose(ke._gc_dX_dB(idx, n), pe._gc_dX_dB(idx, n), rtol=1.0e-12, atol=1.0e-12)

    def test_sg_d2x_vs_oracle(self, test2_nc):
        """Second-order semigrand kernels vs an independent NumPy oracle.

        The reference's own test here (gc_ntot test:781-831) asserts
        ``np.all(np.abs(diff)) < tol`` — a misplaced parenthesis that makes
        it vacuous — and its "expected" formula ignores KE propagation
        through the fluctuation chains.  We instead check the kernels
        against a from-scratch NumPy implementation of the reference
        formulas (tests/oracles.py), for both ke=True/False.
        """
        from oracles import NpKernels

        for ke_flag in (False, True):
            h = oneDH.histogram(test2_nc, BETA_REF, MU_REF, SMOOTH, ke_flag)
            orc = NpKernels(
                h.data["ln(PI)"], h.data["mom"], h.data["ntot"], h.data["curr_mu"],
                h.data["curr_beta"], ke_flag, h.data["max_order"],
            )
            for idx in [[0, 0, 0, 0, 1], [0, 1, 0, 0, 1], [0, 1, 0, 1, 1], [1, 1, 0, 1, 1],
                        [0, 1, 0, 0, 0], [0, 1, 0, 1, 0], [0, 1, 1, 1, 0]]:
                for n in (0, 1):
                    got = h._sg_d2X_dB2(idx, n)
                    want = orc.sg_d2X_dB2(idx, n)
                    assert np.allclose(got, want, rtol=1e-12, atol=1e-12), (idx, n, ke_flag)
                got = h._sg_dX_dB(idx, 0)
                want = orc.sg_dX_dB(idx, 0)
                assert np.allclose(got, want, rtol=1e-12, atol=1e-12)
                got = h._sg_dX_dMU(0, idx)
                want = orc.sg_dX_dMU(0, idx)
                assert np.allclose(got, want, rtol=1e-12, atol=1e-12)
                got = h._sg_d2X_dMU2(0, 0, idx)
                want = orc.sg_d2X_dMU2(0, 0, idx)
                assert np.allclose(got, want, rtol=1e-12, atol=1e-12)
                got = h._gc_dX_dB(idx, 0)
                want = orc.gc_dX_dB(idx, 0)
                assert np.isclose(got, want, rtol=1e-12, atol=1e-12)

    def test_gc_d2x_ke(self, test_nc):
        ke, pe = self._pair(test_nc)

        def compare(idx, n):
            idx_s = list(idx)
            idx_s[4] -= 1
            d_ke = ke._gc_d2X_dB2(idx, n)
            d_pe = pe._gc_d2X_dB2(idx, n)
            lnpi = ke.data["ln(PI)"]
            mom = ke.data["mom"]
            ntot = ke.data["ntot"]
            prob = np.exp(lnpi)
            ave = np.sum(prob * mom[idx[0], idx[1], idx[2], idx[3], idx[4] - 1] * ntot ** (n + 1)) / np.sum(prob)
            a = -2.0 / BETA_REF * ave
            b = ke._gc_dX_dB(idx_s, n + 1)
            x = 1.5 / BETA_REF**2 * (a + b)
            d1 = (ke._gc_df_dB_ii((idx, n), ([1, 1, 0, 0, 0], 0)) - pe._gc_df_dB_ii((idx, n), ([1, 1, 0, 0, 0], 0))) * (
                MU_REF[1] - MU_REF[0]
            )
            d2 = ke._gc_df_dB_ii((idx, n), ([0, 0, 0, 0, 1], 0)) - pe._gc_df_dB_ii((idx, n), ([0, 0, 0, 0, 1], 0))
            d3 = MU_REF[0] * (ke._gc_df_dB_in((idx, n), 1) - pe._gc_df_dB_in((idx, n), 1))
            return d_pe, d_ke, x, d1, d2, d3

        for idx, n in [([0, 0, 0, 0, 1], 0), ([0, 1, 0, 0, 1], 0), ([0, 1, 0, 1, 1], 0), ([1, 1, 0, 1, 1], 0), ([1, 1, 0, 1, 1], 1)]:
            d_pe, d_ke, x, d1, d2, d3 = compare(idx, n)
            assert np.isclose(d_pe - d_ke, x - (d1 - d2 + d3), rtol=1.0e-12, atol=1.0e-10)

        for idx, n in [([0, 1, 0, 0, 0], 0), ([0, 1, 0, 1, 0], 0), ([0, 1, 1, 1, 0], 0), ([0, 1, 1, 1, 0], 1)]:
            d_pe, d_ke, x, d1, d2, d3 = compare(idx, n)
            assert np.isclose(d_pe - d_ke, 0.0 - (d1 - d2 + d3), rtol=1.0e-12, atol=1.0e-10)


class TestMix:
    def test_mix_symmetric(self, test_nc):
        tol = 1.0e-9
        lnpi = np.array(
            [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0, 1, 2, 3, 4, 5, 4, 3, 2, 1, 0],
            dtype=float,
        )
        h1 = oneDH.histogram(test_nc, BETA_REF, MU_REF, SMOOTH)
        h1.data["mom"] = np.ones((2, 3, 2, 3, 3, 31), dtype=np.float64)
        h1.data["ln(PI)"] = lnpi.copy()
        h2 = oneDH.histogram(test_nc, BETA_REF, MU_REF, SMOOTH)
        h2.data["mom"] = h1.data["mom"] * 2
        h2.data["ln(PI)"] = h1.data["ln(PI)"] * 2

        for w in [1.0, 0.1234]:
            mixed = h1.mix(h2, [1.0, w])
            assert np.all(np.abs(mixed.data["ln(PI)"] - (lnpi + 2.0 * lnpi * w) / (1.0 + w)) < tol)
            assert np.all(
                np.abs(mixed.data["mom"] - (h1.data["mom"] + h2.data["mom"] * w) / (1.0 + w)) < tol
            )

    def test_mix_asymmetric(self, test_nc):
        tol = 1.0e-9
        lnpi = np.array(
            [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0, 1, 2, 3, 4, 5, 4, 3, 2, 1, 0],
            dtype=float,
        )
        h1 = oneDH.histogram(test_nc, BETA_REF, MU_REF, SMOOTH)
        h1.data["mom"] = np.ones((2, 3, 2, 3, 3, 31), dtype=np.float64)
        h1.data["ln(PI)"] = lnpi.copy()
        h2 = oneDH.histogram(test_nc, BETA_REF, MU_REF, SMOOTH)
        h2.data["mom"] = (h1.data["mom"] * 2)[..., :29].copy()
        h2.data["ln(PI)"] = (h1.data["ln(PI)"] * 2)[:29].copy()
        h2.data["ntot"] = h2.data["ntot"][:29].copy()
        h2.data["ub"] = 28

        for w in [1.0, 0.1234]:
            mixed = h1.mix(h2, [1.0, w])
            assert len(mixed.data["ln(PI)"]) == 31
            assert np.all(np.abs(mixed.data["ln(PI)"][:29] - (1.0 + 2.0 * w) / (1.0 + w) * lnpi[:29]) < tol)
            assert np.all(np.abs(mixed.data["ln(PI)"][29:] - lnpi[29:]) < tol)
            assert np.all(
                np.abs(
                    mixed.data["mom"][..., :29]
                    - (h1.data["mom"][..., :29] + h2.data["mom"][..., :29] * w) / (1.0 + w)
                )
                < tol
            )
            assert np.all(np.abs(mixed.data["mom"][..., 29:] - h1.data["mom"][..., 29:]) < tol)


class TestMulti:
    def test_temp_dmu2_extrap_multi(self, hist):
        target_dmus = np.array([[-4.0], [-6.0]])
        target_betas = np.array([2.0 * hist.data["curr_beta"], 0.5 * hist.data["curr_beta"]])

        hists = hist.temp_dmu_extrap_multi(target_betas, target_dmus, 2, 10.0, True, True)
        assert len(hists) == 2 and len(hists[0]) == 2 and len(hists[1]) == 2

        for row in hists:
            for h in row:
                assert h.data["curr_mu"][0] == 5.0
        assert hists[0][0].data["curr_mu"][1] == 5.0 + target_dmus[0][0]
        assert hists[0][0].data["curr_beta"] == target_betas[0]
        assert hists[1][1].data["curr_mu"][1] == 5.0 + target_dmus[1][0]
        assert hists[1][1].data["curr_beta"] == target_betas[1]

        # original untouched
        assert hist.data["curr_mu"][0] == MU_REF[0]
        assert hist.data["curr_mu"][1] == MU_REF[1]
        assert hist.data["curr_beta"] == BETA_REF

        # grid results match individual extrapolations
        for a in range(2):
            for b in range(2):
                hc = copy.deepcopy(hist)
                hcn = hc.temp_dmu_extrap(target_betas[a], target_dmus[b], 2, 10.0, True, True, True)
                assert np.all(np.abs(hcn.data["ln(PI)"] - hists[a][b].data["ln(PI)"]) < 1.0e-9)
