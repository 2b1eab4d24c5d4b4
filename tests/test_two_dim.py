"""two_dim suite: joint_hist parity (mirrors the reference test file) plus
pore_hist/imaging/organize coverage the reference never had.
"""

import numpy as np
import pytest

from fhmcanalysis_tpu.two_dim import free_energy_profile, imaging, joint_hist, organize, pore_hist

REF_JSON = "/root/reference/unittests/reference/joint_test.json"


class TestEntry:
    def test_set_and_validate(self):
        e = joint_hist.entry()
        lnpi = np.array([1.0, 2.0, 3.0])
        ntot = np.array([0, 1, 2])
        e.set_lnpi(lnpi, ntot)
        e.set_prop("U", np.array([-1.0, -2.0, -3.0]))
        assert np.all(e.data["ln(PI)"] == lnpi)

        with pytest.raises(AssertionError):
            e.set_prop("bad", np.array([1.0, 2.0]))
        with pytest.raises(AssertionError):
            e.set_lnpi(np.array([1.0, 2.0]), np.array([0, 1, 2]))
        with pytest.raises(AssertionError):
            e.set_lnpi(np.array([1.0, 2.0, 3.0]), np.array([2, 1, 0]))  # unsorted ops


class TestJoint:
    def _props(self, n):
        return {"U": np.arange(n, dtype=float), "N1": np.arange(n, dtype=float) * 2}

    def test_single_make(self):
        h = joint_hist()
        h.enter(1, np.array([1.0, 2, 3]), np.array([0, 1, 2]), self._props(3))
        h.make()
        assert np.all(h.data["ln(PI)"] == [[1, 2, 3]])

    def test_double_make(self):
        h = joint_hist()
        lnpi = np.array([1.0, 2, 3])
        h.enter(2, lnpi, np.array([0, 1, 2]), self._props(3))
        h.enter(1, lnpi * 2, np.array([0, 1, 2]), self._props(3))
        h.make()
        assert np.all(h.data["ln(PI)"] == [[2, 4, 6], [1, 2, 3]])

    def test_make_ragged(self):
        h = joint_hist()
        h.enter(1, np.array([1.0, 2, 3]), np.array([0, 1, 2]), self._props(3))
        h.enter(2, np.array([1.0, 2, 3, 4]), np.array([0, 1, 2, 3]), self._props(4))
        h.make()
        assert np.all(h.data["ln(PI)"] == [[1, 2, 3, -np.inf], [1, 2, 3, 4]])

    def test_make_ragged_offset(self):
        h = joint_hist()
        h.enter(1, np.array([1.0, 2, 3]), np.array([1, 2, 3]), self._props(3))
        h.enter(2, np.array([0.0, 1, 2, 3, 4]), np.array([0, 1, 2, 3, 4]), self._props(5))
        h.make()
        assert np.all(h.data["ln(PI)"] == [[-np.inf, 1, 2, 3, -np.inf], [0, 1, 2, 3, 4]])
        assert np.all(h.data["op_1"] == [1, 2])
        assert np.all(h.data["op_2"] == [0, 1, 2, 3, 4])
        assert np.all(h.data["bounds_idx"] == [[1, 3], [0, 4]])

    def test_json_roundtrip(self, tmp_path):
        h = joint_hist()
        h.enter(1, np.array([1.0, 2, 3]), np.array([1, 2, 3]), self._props(3))
        h.enter(2, np.array([0.0, 1, 2, 3, 4]), np.array([0, 1, 2, 3, 4]), self._props(5))
        h.make()
        fn = str(tmp_path / "jh.json")
        h.to_json(fn)
        h2 = joint_hist()
        h2.from_json(fn)
        assert np.all(h2.data["ln(PI)"] == h.data["ln(PI)"])
        assert np.all(h2.data["bounds_idx"] == h.data["bounds_idx"])

    def test_from_reference_fixture(self):
        h = joint_hist()
        h.from_json(REF_JSON)
        assert np.all(h.data["ln(PI)"] == [[-np.inf, 1, 2, 3, -np.inf], [0, 1, 2, 3, 4]])
        assert np.all(h.data["op_1"] == [1, 2])
        assert np.all(h.data["op_2"] == [0, 1, 2, 3, 4])
        assert np.all(h.data["bounds_idx"] == [[1, 3], [0, 4]])


class TestImaging:
    def test_peak_local_max(self):
        img = np.zeros((9, 9))
        img[2, 2] = 5.0
        img[6, 7] = 3.0
        img[6, 6] = 1.0
        pk = imaging.peak_local_max(img, footprint=np.ones((3, 3)), num_peaks=10)
        assert [tuple(p) for p in pk[:2]] == [(2, 2), (6, 7)]

    def test_watershed_two_basins(self):
        x = np.zeros((5, 9))
        x[:, 2] = -5.0
        x[:, 6] = -4.0
        x[:, 4] = 3.0  # ridge
        markers = np.zeros((5, 9), dtype=int)
        markers[2, 2] = 1
        markers[2, 6] = 2
        lab = imaging.watershed(x, markers)
        assert np.all(lab[:, :4] == 1)
        assert np.all(lab[:, 5:] == 2)

    def test_find_boundaries(self):
        lab = np.zeros((4, 6), dtype=int)
        lab[:, :3] = 1
        lab[:, 3:] = 2
        b = imaging.find_boundaries(lab)
        assert np.all(b[:, 2]) and np.all(b[:, 3])
        assert not np.any(b[:, 0]) and not np.any(b[:, 5])

    def test_profile_line(self):
        img = np.arange(25, dtype=float).reshape(5, 5)
        p = imaging.profile_line(img, (0, 0), (4, 4))
        assert p[0] == 0.0 and p[-1] == 24.0


def _make_pore(two_peaks=True):
    """Synthetic lnPI(h, N) with genuine 2-D hills at row/col (3, 5) and
    (9, 15), ragged upper N edge growing with h.

    Rows are pinned to lnPI(h, 0) = 0 so pore_hist's per-row anchoring
    (shift by -lnPI[h,0], pore_hist.pyx:131-135) leaves the designed
    surface intact.
    """
    H, N = 13, 21
    jh = joint_hist()
    g1_0 = np.exp(-25.0 / 12.0)
    g2_0 = np.exp(-225.0 / 12.0)
    for i in range(H):
        nmax = min(12 + (i // 2) * 2, N - 1)
        n = np.arange(0, nmax + 1, dtype=float)
        G1 = np.exp(-((n - 5.0) ** 2) / 12.0) - g1_0
        G2 = np.exp(-((n - 15.0) ** 2) / 12.0) - g2_0
        A1 = 40.0 * np.exp(-((i - 3.0) ** 2) / 8.0)
        A2 = 55.0 * np.exp(-((i - 9.0) ** 2) / 8.0) if two_peaks else 0.0
        lnpi = A1 * G1 + A2 * G2
        props = {"N_tot": n, "U": -0.5 * n}
        jh.enter(float(i + 1), lnpi, n.astype(int), props)
    return jh


class TestPoreHist:
    def test_build_normalize(self):
        jh = _make_pore()
        fh = free_energy_profile.polynomial([0.0])  # F(h) = 0
        ph = pore_hist(jh, fh.free_energy, 0.0, 1.0, 1.0)
        # probability over valid region sums to 1
        lnpi = ph.data["ln(PI)"]
        tot = 0.0
        for i in range(len(lnpi)):
            tot += np.sum(np.exp(lnpi[i, : ph.data["edge_idx"][i] + 1]))
        assert abs(tot - 1.0) < 1e-10

    def test_phase_average_two_phases(self):
        jh = _make_pore()
        fh = free_energy_profile.polynomial([0.0])
        ph = pore_hist(jh, fh.free_energy, 0.0, 1.0, 1.0)
        props = ph.phase_average(nnebr=1, max_peaks=4)
        phase_keys = [k for k in props if isinstance(k, int)]
        assert len(phase_keys) == 2
        ntots = sorted(props[k]["N_tot"] for k in phase_keys)
        assert abs(ntots[0] - 5.0) < 1.0
        assert abs(ntots[1] - 15.0) < 1.0
        # activation barriers are positive and symmetric
        act = props["activation_kT"]
        assert act.shape == (2, 2)
        assert act[0, 1] == act[1, 0]
        assert act[0, 1] > 0

    def test_width_phase_average(self):
        jh = _make_pore()
        fh = free_energy_profile.polynomial([0.0])
        ph = pore_hist(jh, fh.free_energy, 0.0, 1.0, 1.0)
        out = ph.width_phase_average(np.array([6.0, 100.0]), nnebr=1, max_peaks=4)
        assert set(k for k in out if isinstance(k, int)) == {0, 1}
        assert abs(out[0]["N_tot"] - 5.0) < 1.0
        assert abs(out[1]["N_tot"] - 15.0) < 1.0


class TestFreeEnergyProfile:
    def test_polynomial(self):
        p = free_energy_profile.polynomial([2.0, -3.0, 1.0])  # 2h^2 - 3h + 1
        assert p.free_energy(0.0) == 1.0
        assert p.free_energy(2.0) == 8.0 - 6.0 + 1.0

    def test_interp_clamps(self, tmp_path):
        fn = tmp_path / "fh.dat"
        fn.write_text("# h F\n1.0 0.5\n2.0 1.5\n3.0 0.75\n")
        f = free_energy_profile.interp(str(fn))
        assert abs(f.free_energy(1.5) - 1.0) < 1e-12
        assert f.free_energy(10.0) == 1.5  # clamps to max F outside range


class TestOrganizer:
    def test_tracking(self, tmp_path):
        org = organize.phase_organizer(axes_ratio=0.5, nPix=3, max_phases=3)
        x = np.array([0.3, 0.7])
        act = np.array([[0.0, 1.5], [1.5, 0.0]])
        info = (1.0, 0.1, [5.0, 15.0], [x, x], [-2.0, -6.0], [1.0, 2.0], [[3, 5], [9, 15]], [3.0, 9.0], act, act)
        org.add(info)
        # same peaks, slightly moved: must map to same phases
        info2 = (1.2, 0.2, [5.5, 15.5], [x, x], [-2.2, -6.2], [1.1, 2.1], [[4, 6], [10, 16]], [3.5, 9.5], act, act)
        org.add(info2)
        assert len(org.last_pt) == 2
        assert len(org.phase_data[0]) == 2
        assert len(org.phase_data[1]) == 2
        # far-away peak: new phase
        info3 = (1.4, 0.3, [25.0], [x], [-9.0], [3.0], [[1, 20]], [1.0], np.zeros((1, 1)), np.zeros((1, 1)))
        org.add(info3)
        assert len(org.last_pt) == 3

        org.print_org(str(tmp_path / "org"))
        import json

        rep = json.load(open(str(tmp_path / "org.json")))
        assert rep["0"]["mu_1"] == [1.0, 1.2]
        assert rep["1"]["N_tot"] == [15.0, 15.5]
        assert rep["2"]["mu_1"] == [1.4]
