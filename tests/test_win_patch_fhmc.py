"""Parity suite for fhmc window patching & equilibration.

Mirrors /root/reference/unittests/moments_win_patch_fhmc.py and
moments_win_patch_fhmc_equil.py (fixture-driven, exact expected values).
"""

import os

import numpy as np
import pytest

import fhmcanalysis_tpu.win_patch.fhmc_equil as wE
import fhmcanalysis_tpu.win_patch.fhmc_patch as wP

REF = "/root/reference/unittests/reference"
SRC = REF + "/test_sim/"


class TestLocalNHist:
    fname = REF + "/test_pk_hist.dat"
    fname2 = REF + "/test_pk_hist2.dat"
    fname3 = REF + "/test_pk_hist3.dat"

    def test_load_clear(self):
        lh = wP.local_hist(self.fname)
        lh.clear()
        assert len(lh.lb) == 0 and len(lh.ub) == 0 and len(lh.bw) == 0
        assert len(lh.h) == 0 and lh.win_start == 0 and lh.win_end == 0

    def test_merge_ov_lower(self):
        lh1 = wP.local_hist(self.fname)
        lh2 = wP.local_hist(self.fname2)
        lh2.merge(lh1, 0.0)
        for i in range(0, 19):
            assert len(lh2.h[i]) == len(lh1.h[i])
            assert np.all(lh2.h[i] == lh1.h[i])
        assert np.all(lh2.h[19] == [0.91, 0.08, 0.005, 0.005])
        assert np.all(lh2.h[20] == [0.9, 0.09, 0.005, 0.005, 0.0])
        assert np.all(lh2.h[21] == [0.4, 0.3, 0.2, 0.1])
        assert np.all(lh2.h[22] == [0.05, 0.05, 0.2, 0.3, 0.4])

    def test_merge_ov_upper(self):
        lh1 = wP.local_hist(self.fname)
        lh2 = wP.local_hist(self.fname2)
        lh2.merge(lh1, 1.0)
        for i in range(0, 21):
            assert len(lh2.h[i]) == len(lh1.h[i])
            assert np.all(lh2.h[i] == lh1.h[i])
        assert np.all(lh2.h[21] == [0.4, 0.3, 0.2, 0.1])
        assert np.all(lh2.h[22] == [0.05, 0.05, 0.2, 0.3, 0.4])

    def test_merge_ave(self):
        lh1 = wP.local_hist(self.fname)
        lh2 = wP.local_hist(self.fname2)
        lh2.merge(lh1, 0.5)
        for i in range(0, 19):
            assert np.all(lh2.h[i] == lh1.h[i])
        assert np.all(np.abs(lh2.h[19] - [0.89158012, 0.09900905, 0.006652, 0.00275883]) < 1.0e-6)
        assert np.all(
            np.abs(lh2.h[20] - [8.90009879e-01, 1.01615354e-01, 5.73284601e-03, 2.63270520e-03, 9.21563857e-06])
            < 1.0e-6
        )
        assert np.all(lh2.h[21] == [0.4, 0.3, 0.2, 0.1])
        assert np.all(lh2.h[22] == [0.05, 0.05, 0.2, 0.3, 0.4])

    def test_merge_ave2(self):
        lh1 = wP.local_hist(self.fname)
        lh2 = wP.local_hist(self.fname3)
        lh2.merge(lh1, 0.5)
        for i in range(0, 19):
            assert np.all(lh2.h[i] == lh1.h[i])
        assert np.all(np.abs(lh2.h[19] - [0.89158012, 0.09900905, 0.006652, 0.00275883]) < 1.0e-6)
        assert np.all(np.abs(lh2.h[20] - [0.44000988, 0.50661535, 0.04823285, 0.00263271, 0.00250922]) < 1.0e-6)
        assert np.all(lh2.h[21] == [0.4, 0.3, 0.2, 0.1])
        assert np.all(lh2.h[22] == [0.05, 0.05, 0.2, 0.3, 0.4])

    def test_normalize(self):
        lh2 = wP.local_hist(self.fname2)
        lh2.h = [np.asarray(r) * 2 for r in lh2.h]
        lh2.normalize()
        for row in lh2.h:
            assert abs(np.sum(row) - 1.0) < 1.0e-8


class TestLocalEHist:
    fname = REF + "/test_e_hist.dat"
    fname2 = REF + "/test_e_hist2.dat"

    def test_merge_ov_lower(self):
        lh1 = wP.local_hist(self.fname)
        lh2 = wP.local_hist(self.fname2)
        lh2.merge(lh1, 0.0)
        for i in range(0, 20):
            assert np.all(lh2.h[i] == lh1.h[i])
        assert lh2.h[20][1] == 1
        assert np.all(np.abs([lh2.h[20][x] for x in range(len(lh2.h[20])) if x != 1]) < 1.0e-8)
        assert np.all(lh2.h[21] == [0.1, 0.1, 0.1, 0.4, 0.3])

    def test_merge_ave(self):
        lh1 = wP.local_hist(self.fname)
        lh2 = wP.local_hist(self.fname2)
        lh2.merge(lh1, 0.5)
        for i in range(0, 20):
            assert np.all(lh2.h[i] == lh1.h[i])
        assert np.abs(lh2.h[20][1] - (1 + 0.00105795530783919) / 2.0) < 1.0e-8
        a = np.array([lh2.h[20][x] for x in range(len(lh2.h[20])) if x != 1])
        b = np.array([lh1.h[20][x] for x in range(len(lh1.h[20])) if x != 1]) / 2.0
        assert np.all(np.abs(a - b) < 1.0e-8)
        assert np.all(lh2.h[21] == [0.1, 0.1, 0.1, 0.4, 0.3])


class TestWindow:
    def test_get_seq(self):
        seq = wP.get_patch_sequence(SRC)
        assert len(seq) == 2  # window 3 lacks final data and only cp 1

    def test_init_repr_clear(self):
        seq = wP.get_patch_sequence(SRC)
        wh = wP.window(seq[0][0], seq[0][1], seq[0][2], seq[0][3], 2, False)
        a = seq[0][0] + "::" + seq[0][1] + "::" + seq[0][2] + "::" + seq[0][3] + "-[0,20]"
        assert a == str(wh)
        assert len(wh.lnPI) != 0 and wh.nspec != 0
        wh.clear()
        assert len(wh.lnPI) == 0 and wh.nspec == 0

    def test_load_info(self):
        seq = wP.get_patch_sequence(SRC)
        wh = wP.window(seq[0][0], seq[0][1], seq[0][2], seq[0][3], 2, False)
        a = np.array(
            [0.0, 11.5792872, 22.55514816, 33.16632265, 43.53878289, 53.80927566, 63.94826804,
             73.97895064, 83.96576198, 93.94840544, 103.8773032, 113.77306514, 123.71227577,
             133.68404802, 143.69837309, 153.86625598, 164.18813354, 174.70527468, 185.3787788,
             196.24217909, 207.27150728]
        )
        assert len(wh.lnPI) == 21
        assert np.all(np.abs(a - wh.lnPI) < 1.0e-6)
        assert wh.mom.shape == (36 * 3, 21)

        # moment storage symmetry (reference test :355-373)
        for i in range(2):
            for j in range(3):
                for k in range(2):
                    for m in range(3):
                        for p in range(3):
                            a1 = p + 3 * m + 9 * k + 18 * j + 54 * i
                            a2 = p + 3 * j + 9 * i + 18 * m + 54 * k
                            assert np.all(wh.mom[a1] == wh.mom[a2])
                            if j == m == 0 and p == 0:
                                assert np.all(np.abs(wh.mom[a1] - 1.0) < 1.0e-8)
                            if i == k and m + j < 3:
                                for kk in range(2):
                                    a2 = p + 9 * kk + 18 * (j + m) + 54 * i
                                    assert np.all(wh.mom[a1] == wh.mom[a2])

        assert np.all(wh.e_hist.lb == [0, 0, -1, -3, -6, -10, -11, -15, -20, -26, -32, -41, -43, -49, -55, -67, -73, -82, -88, -94, -102])
        assert np.all(wh.e_hist.ub == [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, -1, -1, -3, -4, -7, -11])
        assert np.all(wh.e_hist.bw == np.ones(21))
        for i in range(len(wh.e_hist.h)):
            assert len(wh.e_hist.h[i]) == wh.e_hist.ub[i] - wh.e_hist.lb[i] + 1
        assert np.all(
            np.abs(wh.e_hist.h[3] - np.array([0.00907625393757033, 0.0185828627062264, 0.248847389827399, 0.723493493528804])) < 1.0e-8
        )
        assert len(wh.pk_hist) == 2

    def test_merge_no_smooth(self):
        seq = wP.get_patch_sequence(SRC)
        wh1 = wP.window(seq[0][0], seq[0][1], seq[0][2], seq[0][3], 1, False)
        wh2 = wP.window(seq[1][0], seq[1][1], seq[1][2], seq[1][3], 1, False)
        ref_lnpi = wh2.lnPI.copy()
        ref_mom = wh2.mom.copy()

        shift, e2 = wh2.merge(wh1)
        assert np.all(np.abs(wh2.lnPI[:17] - wh1.lnPI[:17]) < 1.0e-6)
        assert np.all(np.abs(wh2.lnPI[17:20] - wh1.lnPI[17:20]) < 1.0e-6)
        assert np.all(np.abs(wh2.lnPI[20:] - (ref_lnpi[4:] + shift)) < 1.0e-6)

        assert wh2.mom.shape == (36 * 3, 31)
        assert np.all(np.abs(wh2.mom[:, :17] - wh1.mom[:, :17]) < 1.0e-6)
        assert np.all(np.abs(wh2.mom[:, 17:20] - wh1.mom[:, 17:20]) < 1.0e-6)
        assert np.all(np.abs(wh2.mom[:, 20:] - ref_mom[:, 4:]) < 1.0e-6)

    def test_merge_with_smooth(self):
        seq = wP.get_patch_sequence(SRC)
        wh1 = wP.window(seq[0][0], seq[0][1], seq[0][2], seq[0][3], 1, True)
        wh2 = wP.window(seq[1][0], seq[1][1], seq[1][2], seq[1][3], 1, True)
        ref_lnpi = wh2.lnPI.copy()
        ref_mom = wh2.mom.copy()

        shift, e2 = wh2.merge(wh1)
        assert np.all(np.abs(wh2.lnPI[:17] - wh1.lnPI[:17]) < 1.0e-6)
        assert np.all(
            np.abs((wh2.lnPI[17:20] - wh1.lnPI[17:20]) / (0.5 * (wh2.lnPI[17:20] + wh1.lnPI[17:20]))) < 1.0e-3
        )
        assert np.all(np.abs(wh2.lnPI[20:] - (ref_lnpi[4:] + shift)) < 1.0e-6)

        assert np.all(np.abs(wh2.mom[:, :17] - wh1.mom[:, :17]) < 1.0e-6)
        assert (
            np.average(np.abs(wh2.mom[:, 17:20] - wh1.mom[:, 17:20]) / (0.5 * (wh2.mom[:, 17:20] + wh1.mom[:, 17:20])))
            < 0.02
        )
        assert np.all(np.abs(wh2.mom[:, 20:] - ref_mom[:, 4:]) < 1.0e-6)

    def test_patch_shift_is_quadratic_minimum(self):
        """The closed-form shift must beat any nearby shift (the reference
        fmins the same objective to ftol=1e-6)."""
        seq = wP.get_patch_sequence(SRC)
        wh1 = wP.window(seq[0][0], seq[0][1], seq[0][2], seq[0][3], 1, False)
        wh2 = wP.window(seq[1][0], seq[1][1], seq[1][2], seq[1][3], 1, False)
        shift, err2 = wP.patch_window_pair(wh2, wh1)
        index = wh1.ub - wh2.lb + 1
        s1 = wh2.lnPI[1 : index - 1]
        s2 = wh1.lnPI[len(wh1.lnPI) - index + 1 : len(wh1.lnPI) - 1]
        base = wP.window_patch_error(shift, s1, s2)
        for d in (-1e-4, 1e-4, -1e-2, 1e-2):
            assert wP.window_patch_error(shift + d, s1, s2) >= base

    def test_to_nc_roundtrip(self, tmp_path):
        seq = wP.get_patch_sequence(SRC)
        wh1 = wP.window(seq[0][0], seq[0][1], seq[0][2], seq[0][3], 1, True)
        wh2 = wP.window(seq[1][0], seq[1][1], seq[1][2], seq[1][3], 1, True)
        wh2.merge(wh1)
        out = str(tmp_path / "test.nc")
        wh2.to_nc(out)
        assert os.path.exists(out)

        from fhmcanalysis_tpu.io import read_composite

        rt = read_composite(out)
        assert np.allclose(rt["lnpi"], wh2.lnPI)
        assert rt["nspec"] == 2 and rt["max_order"] == 2
        assert rt["mom"].shape == (2, 3, 2, 3, 3, 31)
        # moments tensor written in (i,j,k,m,p) address order
        assert np.allclose(rt["mom"].reshape(108, -1), wh2.mom)

    def test_patch_all(self, tmp_path):
        seq = wP.get_patch_sequence(SRC)
        out = str(tmp_path / "composite.nc")
        log = str(tmp_path / "patch.log")
        name, err = wP.patch_all_windows(seq, out, log, 1, False)
        assert os.path.exists(out)
        assert os.path.exists(log)
        # composite must load as a histogram and have normalized PI
        from fhmcanalysis_tpu.histogram.ntot import histogram

        h = histogram(out, 1.0, [5.0, 0.0], 1)
        assert abs(np.sum(np.exp(h.data["ln(PI)"])) - 1.0) < 1.0e-10
        assert len(h.data["ln(PI)"]) == 31


class TestEquil:
    def test_find_windows(self):
        windows, nebr = wE.find_windows(SRC)
        assert np.all(windows == [1, 2])
        assert nebr == [(1, 2)]

    def test_nebr_match_values(self):
        seq = wP.get_patch_sequence(SRC)
        ipass, uerr, nerr = wE.test_nebr_match(seq[0], seq[1], 1.0)
        assert not ipass
        assert abs(uerr - 4.31410893236) < 1.0e-6
        assert abs(nerr - 8.04638999443) < 1.0e-6

    def test_window_match(self):
        ipass, uerr, nerr = wE.test_window_match(SRC + "1", SRC + "2", 1.0)
        assert not ipass
        assert abs(uerr - 4.31410893236) < 1.0e-6
        assert abs(nerr - 8.04638999443) < 1.0e-6
        ipass, _, _ = wE.test_window_match(SRC + "1", SRC + "2", 10.0)
        assert ipass

    def test_nebr_equil(self, tmp_path):
        seq = wP.get_patch_sequence(SRC)
        # tolerant bound: both windows converge
        f1 = str(tmp_path / "maxEq1")
        safe = wE.test_nebr_equil(seq, 10.0, f1, trust=False)
        assert len(safe) == 1 and safe[0] == seq[0]
        safe = wE.test_nebr_equil(seq, 10.0, str(tmp_path / "maxEq2"), trust=True)
        assert len(safe) == 2
        # tight bound: nothing converges -> raises
        with pytest.raises(Exception):
            wE.test_nebr_equil(seq, 1.0, str(tmp_path / "maxEq3"), trust=False)
