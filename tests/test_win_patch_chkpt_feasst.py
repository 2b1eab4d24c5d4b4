"""chkpt and feasst front-end suites.

Both are untested upstream (SURVEY §4); fixtures are synthesized here
with analytically known patched results.
"""

import json
import os

import numpy as np
import pytest

import fhmcanalysis_tpu.win_patch.chkpt_equil as cE
import fhmcanalysis_tpu.win_patch.chkpt_patch as cP
import fhmcanalysis_tpu.win_patch.feasst_equil as fE
import fhmcanalysis_tpu.win_patch.feasst_patch as fP
from fhmcanalysis_tpu.io import read_composite

NSPEC, MO = 2, 2
A = NSPEC * (MO + 1) * NSPEC * (MO + 1) * (MO + 1)  # 108


def _mom_profile(n):
    """Deterministic per-N moment values for address order (i,j,k,m,p)
    with p fastest (fhmc/chkpt column order)."""
    rows = []
    for i in range(NSPEC):
        for j in range(MO + 1):
            for k in range(NSPEC):
                for m in range(MO + 1):
                    for p in range(MO + 1):
                        n1 = (j if i == 0 else 0) + (m if k == 0 else 0)
                        n2 = (j if i == 1 else 0) + (m if k == 1 else 0)
                        rows.append((0.6 * n + 1.0) ** n1 * (0.4 * n + 0.5) ** n2 * (-0.3 * n - 0.1) ** p)
    return np.array(rows)  # [A]


def _write_chkpt_window(d, lb, ub, lnpi, counts):
    os.makedirs(os.path.join(d, "checkpt"), exist_ok=True)
    cp = os.path.join(d, "checkpt")
    with open(os.path.join(cp, "state.json"), "w") as f:
        json.dump({"crossoverDone": True}, f)

    # lnPI header: description, ub, lb (positional parse in equil)
    lnpi_hdr = (
        "# lnPI matrix\n"
        "# species_total_upper_bound: %d\n"
        "# species_total_lower_bound: %d\n"
        "# volume: 729\n"
        "# number_of_species: %d\n"
        "# max_order: %d\n" % (ub, lb, NSPEC, MO)
    )
    # moments header: description, nspec, max_order (positional parse)
    mom_hdr = (
        "# <N_i^j*N_k^m*U^p> as a function of N_tot.\n"
        "# number_of_species: %d\n"
        "# max_order: %d\n"
        "# species_total_upper_bound: %d\n"
        "# species_total_lower_bound: %d\n"
        "# volume: 729\n" % (NSPEC, MO, ub, lb)
    )
    with open(os.path.join(cp, "tmmc_lnPI.dat"), "w") as f:
        f.write(lnpi_hdr)
        for v in lnpi:
            f.write("%.12f\n" % v)

    with open(os.path.join(cp, "extMom.dat"), "w") as f:
        f.write(mom_hdr)
        for idx, n in enumerate(range(lb, ub + 1)):
            mom = _mom_profile(n) * counts[idx]
            f.write(str(n) + "\t" + "\t".join("%.10g" % v for v in mom) + "\n")

    # minimal aligned sub-histograms (uniform, normalized on load)
    nn = ub - lb + 1
    subhdr = (
        "# hist\n"
        "# species_total_upper_bound: %d\n"
        "# species_total_lower_bound: %d\n" % (ub, lb)
    )
    body = (
        "# Bin widths for each\n" + "\t".join(["1.0"] * nn) + "\n"
        "# Bin lower bound for each\n" + "\t".join(["0.0"] * nn) + "\n"
        "# Bin upper bound for each\n" + "\t".join(["3.0"] * nn) + "\n"
        "# Unnormalized histogram for each\n" + "".join("1\t2\t3\t4\n" for _ in range(nn))
    )
    for name in ("eHist.dat", "pkHist_1.dat", "pkHist_2.dat"):
        with open(os.path.join(cp, name), "w") as f:
            f.write(subhdr + body)


@pytest.fixture
def chkpt_tree(tmp_path):
    lnpi1 = 0.3 * np.arange(0, 16) ** 1.1
    lnpi2 = 0.3 * np.arange(10, 26) ** 1.1 + 7.0  # offset; overlap N=10..15
    _write_chkpt_window(str(tmp_path / "1"), 0, 15, lnpi1, 10 + np.arange(16))
    _write_chkpt_window(str(tmp_path / "2"), 10, 25, lnpi2, 20 + np.arange(16))
    # window 3 with crossover not done -> excluded
    _write_chkpt_window(str(tmp_path / "3"), 20, 35, lnpi1, 10 + np.arange(16))
    with open(str(tmp_path / "3" / "checkpt" / "state.json"), "w") as f:
        json.dump({"crossoverDone": False}, f)
    return str(tmp_path), lnpi1, lnpi2


class TestChkpt:
    def test_sequence(self, chkpt_tree):
        root, _, _ = chkpt_tree
        seq = cP.get_patch_sequence(root)
        assert len(seq) == 2
        assert all("checkpt" in s[0] for s in seq)

    def test_window_load_normalizes_moments(self, chkpt_tree):
        root, lnpi1, _ = chkpt_tree
        seq = cP.get_patch_sequence(root)
        w = cP.window(seq[0][0], seq[0][1], seq[0][2], seq[0][3], 2, False)
        assert np.allclose(w.lnPI, lnpi1)
        # count normalization: row 0 of mom (the counter) becomes exactly 1
        assert np.allclose(w.mom[0], 1.0)
        # and a sample physical row matches the synthetic profile
        want = np.array([_mom_profile(n) for n in range(0, 16)]).T
        assert np.allclose(w.mom, want, rtol=1e-9)
        # sub-histograms were normalized on load
        assert np.allclose(w.e_hist.h[0], np.array([1, 2, 3, 4]) / 10.0)

    def test_patch_and_reload(self, chkpt_tree, tmp_path):
        root, lnpi1, lnpi2 = chkpt_tree
        seq = cP.get_patch_sequence(root)
        out = str(tmp_path / "composite.nc")
        log = str(tmp_path / "patch.log")
        name, err = cP.patch_all_windows(seq, out_fname=out, log_fname=log, offset=2, smooth=False)
        assert err < 1e-12  # windows differ by a constant shift -> perfect patch

        rt = read_composite(out)
        assert len(rt["lnpi"]) == 26
        assert abs(np.exp(rt["lnpi"]).sum() - 1.0) < 1e-10
        # shape matches analytic composite: lnpi1 continues into shifted lnpi2
        full = np.concatenate([lnpi1[:10], lnpi2 - 7.0])
        full -= np.log(np.sum(np.exp(full - full.max()))) + full.max()
        assert np.allclose(rt["lnpi"], full, atol=1e-9)

    def test_equil(self, chkpt_tree, tmp_path):
        root, _, _ = chkpt_tree
        seq = cP.get_patch_sequence(root)
        ipass, uerr, nerr = cE.test_nebr_match_(seq[0], seq[1], 1.0)
        # same deterministic profiles -> zero percent error everywhere
        assert ipass and abs(uerr) < 1e-9 and abs(nerr) < 1e-9
        safe = cE.test_nebr_equil(seq, 1.0, str(tmp_path / "maxEq"), trust=True)
        assert len(safe) == 2


def _write_feasst_window(d, lb, ub, lnpi):
    os.makedirs(d, exist_ok=True)
    n = ub - lb + 1
    with open(os.path.join(d, "colMat"), "w") as f:
        f.write("# colMat\n")
        for i, v in enumerate(lnpi):
            f.write("%d %.12f 0 0 0\n" % (lb + i, v))

    hdr = (
        "# FEASST extMom\n"
        "# maxOrder %d\n"
        "# nSpec %d\n"
        "# orderParam nmol\n"
        "# volume 512\n"
        "# nBin %d\n"
        "# mMax %.1f\n"
        "# mMin %.1f\n" % (MO, NSPEC, n, ub + 0.5, lb - 0.5)
    )
    with open(os.path.join(d, "extMom_pr"), "w") as f:
        f.write(hdr)
        for opIdx in range(n):
            nval = 100.0 + opIdx
            # i fastest address order (feasst_patch.pyx:339-343)
            for p in range(MO + 1):
                for m in range(MO + 1):
                    for k in range(NSPEC):
                        for j in range(MO + 1):
                            for i in range(NSPEC):
                                nn = lb + opIdx
                                n1 = (j if i == 0 else 0) + (m if k == 0 else 0)
                                n2 = (j if i == 1 else 0) + (m if k == 1 else 0)
                                val = (0.6 * nn + 1.0) ** n1 * (0.4 * nn + 0.5) ** n2 * (-0.3 * nn - 0.1) ** p
                                f.write(
                                    "%d %g %.12g %.12g %d %d %d %d %d\n"
                                    % (opIdx, nval, val * nval, val**2 * nval, i, j, k, m, p)
                                )


@pytest.fixture
def feasst_tree(tmp_path):
    lnpi1 = 0.25 * np.arange(0, 16) ** 1.2
    lnpi2 = 0.25 * np.arange(10, 26) ** 1.2 - 3.0
    _write_feasst_window(str(tmp_path / "1"), 0, 15, lnpi1)
    _write_feasst_window(str(tmp_path / "2"), 10, 25, lnpi2)
    return str(tmp_path), lnpi1, lnpi2


class TestFeasst:
    def test_sequence_and_load(self, feasst_tree):
        root, lnpi1, _ = feasst_tree
        seq = fP.get_patch_sequence(root)
        assert len(seq) == 2
        w = fP.window(colMat_fname=seq[0][0], extMom_fname=seq[0][1], offset=2)
        assert w.lb == 0 and w.ub == 15 and w.op_name == "N_{tot}"
        assert np.allclose(w.lnPI, lnpi1)
        # first address row is the zeroth moment = 1
        assert np.allclose(w.mom[0], 1.0)
        # exponent table starts with i-fastest order
        assert list(w.mom_exp[0]) == [0, 0, 0, 0, 0]
        assert list(w.mom_exp[1]) == [1, 0, 0, 0, 0]

    def test_patch_to_composite(self, feasst_tree, tmp_path):
        root, lnpi1, lnpi2 = feasst_tree
        seq = fP.get_patch_sequence(root)
        out = str(tmp_path / "fe_composite.nc")
        name, err = fP.patch_all_windows(seq, out_fname=out, log_fname=str(tmp_path / "p.log"), offset=2)
        assert err < 1e-12

        rt = read_composite(out)
        assert rt["mom"].shape == (2, 3, 2, 3, 3, 26)
        assert abs(np.exp(rt["lnpi"]).sum() - 1.0) < 1e-10
        # tensor scatter correctness: mom[1,0,0,0,0] row == N2^0...*N1^0 = 1? no:
        # address (1,0,0,0,0) holds N_2^0 * N_1^0 * U^0 = 1
        assert np.allclose(rt["mom"][1, 0, 0, 0, 0], 1.0)
        # N1 row matches profile
        want = np.array([0.6 * n + 1.0 for n in range(0, 26)])
        assert np.allclose(rt["mom"][0, 1, 0, 0, 0], want, rtol=1e-9)

        # composite loads in the parity histogram class
        from fhmcanalysis_tpu.histogram.ntot import histogram

        h = histogram(out, 1.0, [0.0, 0.0], 1)
        assert len(h.data["ln(PI)"]) == 26

    def test_equil_default_3pct(self, feasst_tree, tmp_path):
        root, _, _ = feasst_tree
        seq = fP.get_patch_sequence(root)
        ipass, uerr, nerr = fE.test_nebr_match_(seq[0], seq[1])
        assert ipass and abs(uerr) < 1e-9 and abs(nerr) < 1e-9
        safe = fE.test_nebr_equil(seq, fname=str(tmp_path / "maxEq"))
        assert len(safe) == 1

    def test_multicore_discovery(self, tmp_path):
        d = str(tmp_path / "mc")
        os.makedirs(d)
        for p in range(3):
            open(os.path.join(d, "colMatp%d" % p), "w").write("x\n")
            open(os.path.join(d, "extMom_pr_p%d" % p), "w").write("x\n")
        seq = fP.get_patch_sequence_multicore(d)
        # reference keeps procs [0, max_safe_proc) with max_safe_proc = min-1
        assert len(seq) == 2
        assert seq[0][0].endswith("colMatp0")

    def test_rejects_non_nmol(self, tmp_path):
        d = str(tmp_path / "bad")
        os.makedirs(d)
        open(os.path.join(d, "colMat"), "w").write("0 1.0\n")
        with open(os.path.join(d, "extMom_pr"), "w") as f:
            f.write("# maxOrder 2\n# nSpec 2\n# orderParam pairs\n# volume 1\n# nBin 1\n# mMax 0.5\n# mMin -0.5\n")
        with pytest.raises(AssertionError):
            fP.window(colMat_fname=os.path.join(d, "colMat"), extMom_fname=os.path.join(d, "extMom_pr"))
