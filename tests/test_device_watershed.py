"""Device watershed (fixed-shape steepest-ascent) vs the host flood.

The host arm (imaging.peak_local_max + priority-flood watershed, the
reference's pore_hist.pyx:414-423 pair) is the oracle: on surfaces
without exact elevation ties and without peak-slot saturation the device
engine must reproduce its labels, peak ranking, and coordinates EXACTLY
(see the equivalence argument in core/segment2d.py).  Saturated states
(more footprint maxima than slots, fail_code 3) are the documented
divergence: the flood spills into un-markered basins, the device engine
leaves them background.
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from fhmcanalysis_tpu.core import segment2d as s2d
from fhmcanalysis_tpu.two_dim import joint_hist, joint_state_sweep, pore_state_sweep, free_energy_profile
from fhmcanalysis_tpu.two_dim.imaging import peak_local_max, watershed
from fhmcanalysis_tpu.two_dim.pore_pipeline import _footprint

from test_joint_pipeline import _two_basin_joint, BETA, MU_REF
from test_pore_pipeline import _two_hill_joint


def _rand_surface(rng, H, N, nb):
    y, x = np.mgrid[0:H, 0:N]
    z = np.zeros((H, N))
    for _ in range(nb):
        cy, cx = rng.rand() * H, rng.rand() * N
        amp = 5 + 30 * rng.rand()
        sy, sx = 2 + 4 * rng.rand(), 3 + 8 * rng.rand()
        z += amp * np.exp(-((y - cy) ** 2 / (2 * sy**2) + (x - cx) ** 2 / (2 * sx**2)))
    # deterministic tilt: makes every value distinct without adding maxima
    z += 1e-7 * (y * 1.3 + x * 0.7)
    return z


def _host_arm(lnpi, valid, fp, nnebr, P):
    x = np.where(valid, lnpi - np.min(np.where(valid, lnpi, np.inf)), 0.0)
    lm = peak_local_max(x, min_distance=nnebr, exclude_border=0, num_peaks=P + 1, footprint=fp)
    sat = len(lm) > P
    lm = lm[:P]
    markers = np.zeros(lnpi.shape, int)
    for i, (r, c) in enumerate(lm):
        markers[r, c] = i + 1
    return watershed(-x, markers=markers, mask=valid, connectivity=fp), lm, sat


def test_randomized_parity_with_host_flood():
    rng = np.random.RandomState(7)
    checked = 0
    for _ in range(40):
        H, N = rng.randint(8, 60), rng.randint(8, 120)
        lnpi = _rand_surface(rng, H, N, rng.randint(1, 6))
        edge = np.clip(rng.randint(N // 2, N, size=H), 1, N - 1)
        valid = np.arange(N)[None, :] <= edge[:, None]
        nnebr = int(rng.choice([1, 2]))
        fp = _footprint(H, N, nnebr)
        P = 8
        lab_host, lm, sat = _host_arm(lnpi, valid, fp, nnebr, P)
        if sat:
            continue  # saturated: documented divergence, covered below
        out = jax.jit(lambda l: s2d.hillclimb_segment(l, jnp.asarray(valid), tuple(fp.shape), P))(jnp.asarray(lnpi))
        np.testing.assert_array_equal(np.asarray(out["labels"]), lab_host)
        assert int(out["n_labels"]) == len(lm)
        assert not bool(out["peak_sat"])
        np.testing.assert_array_equal(np.asarray(out["peak_rc"])[: len(lm)], lm)
        np.testing.assert_allclose(
            np.asarray(out["peak_lnpi"])[: len(lm)], lnpi[lm[:, 0], lm[:, 1]], rtol=0, atol=0
        )
        checked += 1
    assert checked >= 20, "too many saturated draws — fixture drifted"


def test_saturation_flagged():
    """More maxima than slots: the device engine must raise peak_sat (the
    sweep's fail_code 3) and keep the top-P ranking; labels for basins of
    trimmed peaks are background by design."""
    rng = np.random.RandomState(3)
    H, N = 40, 80
    lnpi = _rand_surface(rng, H, N, 5) + 0.5 * rng.randn(H, N)  # noisy: many maxima
    valid = np.ones((H, N), bool)
    fp = _footprint(H, N, 1)
    P = 3
    lab_host, lm, sat = _host_arm(lnpi, valid, fp, 1, P)
    assert sat
    out = s2d.hillclimb_segment(jnp.asarray(lnpi), jnp.asarray(valid), tuple(fp.shape), P)
    assert bool(out["peak_sat"])
    assert int(out["n_labels"]) == P
    np.testing.assert_array_equal(np.asarray(out["peak_rc"])[:P], lm)
    lab_dev = np.asarray(out["labels"])
    # every device-labeled cell agrees with the flood for the kept peaks'
    # own cells; cells draining to trimmed maxima are 0 here, flooded there
    for i in range(1, P + 1):
        assert lab_dev[lm[i - 1][0], lm[i - 1][1]] == i


def test_no_peaks_surface():
    """A constant surface has no cell above the minimum: no peaks, all
    background (the sweeps' fail_code 2 input)."""
    lnpi = np.zeros((10, 12))
    valid = np.ones((10, 12), bool)
    out = s2d.hillclimb_segment(jnp.asarray(lnpi), jnp.asarray(valid), tuple(_footprint(10, 12, 1).shape), 4)
    assert int(out["n_labels"]) == 0
    assert not bool(out["peak_sat"])
    assert (np.asarray(out["labels"]) == 0).all()


class TestElevTieDetector:
    """hillclimb_segment's exact-elevation-tie flag (VERDICT r4 item 1):
    the ONE regime where the device engine and the reference flood
    legally diverge must be detectable, never silent."""

    def _base(self):
        rng = np.random.RandomState(19)
        H, N = 20, 30
        lnpi = _rand_surface(rng, H, N, 3)  # tilt makes every value distinct
        valid = np.ones((H, N), bool)
        fp = _footprint(H, N, 1)  # (5, 3): ry=2, rx=1
        return lnpi, valid, fp

    def _tie(self, lnpi, valid, fp_shape, P=4):
        out = s2d.hillclimb_segment(jnp.asarray(lnpi), jnp.asarray(valid), fp_shape, P)
        return bool(out["elev_tie"])

    def test_distinct_surface_not_flagged(self):
        lnpi, valid, fp = self._base()
        assert not self._tie(lnpi, valid, tuple(fp.shape))

    def test_adjacent_duplicate_flagged(self):
        lnpi, valid, fp = self._base()
        l2 = lnpi.copy()
        l2[5, 6] = l2[5, 5]  # horizontal neighbor, dj=1 <= rx
        assert self._tie(l2, valid, tuple(fp.shape))

    def test_footprint_interior_duplicate_flagged(self):
        lnpi, valid, fp = self._base()
        l2 = lnpi.copy()
        # fp is (3, 5): ry=1, rx=2 — take di=1, dj=-2 (negative-dj half)
        l2[6, 3] = l2[5, 5]
        assert self._tie(l2, valid, tuple(fp.shape))

    def test_far_duplicate_not_flagged(self):
        # equal values farther apart than the footprint never meet in a
        # neighborhood comparison: no divergence, no flag
        lnpi, valid, fp = self._base()
        l2 = lnpi.copy()
        l2[15, 25] = l2[2, 2]
        assert not self._tie(l2, valid, tuple(fp.shape))

    def test_invalid_cells_excluded(self):
        lnpi, valid, fp = self._base()
        l2 = lnpi.copy()
        l2[5, 6] = l2[5, 5]
        v2 = valid.copy()
        v2[5, 6] = False  # the tied neighbor is outside the mask
        assert not self._tie(l2, v2, tuple(fp.shape))
        # two -inf cells inside the mask are not an elevation tie either
        l3 = lnpi.copy()
        l3[3, 3] = l3[3, 4] = -np.inf
        assert not self._tie(l3, valid, tuple(fp.shape))

    def test_sort_fallback_superset(self):
        # footprints past the unroll budget use the global duplicate scan:
        # a strict superset (far-apart duplicates flag too), never silent
        lnpi, valid, _ = self._base()
        assert not self._tie(lnpi, valid, (23, 23))
        l2 = lnpi.copy()
        l2[15, 25] = l2[2, 2]
        assert self._tie(l2, valid, (23, 23))


def _tied_pore_joint():
    """_two_hill_joint with an exact within-row plateau pair: the pore
    build's shift is constant along a row, so the raw tie survives every
    (p, beta) state."""
    jh = _two_hill_joint()
    jh.make()
    ln = np.asarray(jh.data["ln(PI)"], dtype=float)
    ln[6, 8] = ln[6, 7]
    jh.data["ln(PI)"] = ln
    return jh


class TestTieGuard:
    """fail_code 4 + tie_fallback on both 2-D sweeps (VERDICT r4 item 1):
    an engineered plateau surface must be flagged, and the opt-in
    fallback must splice in the reference-exact host-flood answer."""

    EXACT = ("labels", "n_phases", "phase_ok", "ridge_ok")
    CLOSE = ("lnpi", "fe", "ave", "act_kT", "act_kT_diff")

    def test_pore_tie_flag_and_fallback(self):
        jh = _tied_pore_joint()
        fh = free_energy_profile.polynomial([0.1, 0.0])
        p_vals = np.array([0.0, 0.05, 0.1])
        beta_vals = np.array([1.0, 1.0, 0.9])
        host = pore_state_sweep(jh, fh.free_energy, p_vals, beta_vals, A=1.0,
                                nnebr=1, max_peaks=4, segment_engine="host")
        assert not host["elev_tie"].any()  # host flood IS the reference
        assert (host["fail_code"] != 4).all()

        dev = pore_state_sweep(jh, fh.free_energy, p_vals, beta_vals, A=1.0,
                               nnebr=1, max_peaks=4, segment_engine="device")
        assert dev["elev_tie"].all(), "within-row plateau must flag every state"
        assert (dev["fail_code"][host["fail_code"] == 0] == 4).all(), \
            "otherwise-clean tied states must report code 4"

        fb = pore_state_sweep(jh, fh.free_energy, p_vals, beta_vals, A=1.0,
                              nnebr=1, max_peaks=4, segment_engine="device",
                              tie_fallback=True)
        assert fb["elev_tie"].all()  # informational flag survives
        assert (fb["fail_code"] != 4).all()
        np.testing.assert_array_equal(fb["fail_code"], host["fail_code"])
        for k in self.EXACT:
            np.testing.assert_array_equal(np.asarray(fb[k]), np.asarray(host[k]), err_msg=k)
        for k in self.CLOSE:
            np.testing.assert_allclose(np.asarray(fb[k]), np.asarray(host[k]), rtol=0, atol=1e-12, err_msg=k)
        for s in range(len(p_vals)):
            np.testing.assert_array_equal(fb["local_maxima"][s], host["local_maxima"][s])

    def test_joint_tie_flag_and_fallback(self):
        jh = _two_basin_joint()
        jh.make()
        ln = np.asarray(jh.data["ln(PI)"], dtype=float)
        ln[6, 10] = ln[6, 9]  # within-row plateau pair
        jh.data["ln(PI)"] = ln
        # dmu2 = 0 keeps the within-row reweight constant: tie survives
        targets = np.array([[MU_REF[0] + 0.2, MU_REF[1]], [MU_REF[0] - 0.1, MU_REF[1]]])
        host = joint_state_sweep(jh, BETA, MU_REF, targets, nnebr=1, max_peaks=4,
                                 segment_engine="host")
        assert not host["elev_tie"].any()
        dev = joint_state_sweep(jh, BETA, MU_REF, targets, nnebr=1, max_peaks=4,
                                segment_engine="device")
        assert dev["elev_tie"].all()
        assert (dev["fail_code"][host["fail_code"] == 0] == 4).all()
        fb = joint_state_sweep(jh, BETA, MU_REF, targets, nnebr=1, max_peaks=4,
                               segment_engine="device", tie_fallback=True)
        assert (fb["fail_code"] != 4).all()
        np.testing.assert_array_equal(fb["fail_code"], host["fail_code"])
        for k in self.EXACT:
            np.testing.assert_array_equal(np.asarray(fb[k]), np.asarray(host[k]), err_msg=k)
        for k in self.CLOSE:
            np.testing.assert_allclose(np.asarray(fb[k]), np.asarray(host[k]), rtol=0, atol=1e-12, err_msg=k)

    def test_return_surfaces_false_fallback_splices_device_labels(self):
        # the fallback must splice host labels into the on-device label
        # array too (functional .at[].set path)
        jh = _tied_pore_joint()
        fh = free_energy_profile.polynomial([0.1, 0.0])
        p_vals, beta_vals = np.array([0.0, 0.05]), np.array([1.0, 1.0])
        host = pore_state_sweep(jh, fh.free_energy, p_vals, beta_vals, A=1.0,
                                nnebr=1, max_peaks=4, segment_engine="host")
        fb = pore_state_sweep(jh, fh.free_energy, p_vals, beta_vals, A=1.0,
                              nnebr=1, max_peaks=4, segment_engine="device",
                              tie_fallback=True, return_surfaces=False)
        assert isinstance(fb["labels"], jax.Array)
        np.testing.assert_array_equal(np.asarray(fb["labels"]), np.asarray(host["labels"]))


class TestSweepEngines:
    def test_joint_sweep_device_matches_host(self):
        targets = np.array([[0.2, -0.3], [0.5, -0.1], [-0.2, 0.4], [0.7, 0.2]])
        a = joint_state_sweep(_two_basin_joint(), BETA, MU_REF, targets, nnebr=1, max_peaks=4,
                              segment_engine="host")
        b = joint_state_sweep(_two_basin_joint(), BETA, MU_REF, targets, nnebr=1, max_peaks=4,
                              segment_engine="device")
        for k in ("labels", "n_phases", "fail_code", "phase_ok", "ridge_ok"):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)
        for k in ("lnpi", "fe", "ave", "act_kT", "act_kT_diff", "ts"):
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]), rtol=0, atol=1e-12, err_msg=k)
        for s in range(len(targets)):
            np.testing.assert_array_equal(a["local_maxima"][s], b["local_maxima"][s])

    def test_pore_sweep_device_matches_host(self):
        jh = _two_hill_joint()
        fh = free_energy_profile.polynomial([0.1, 0.0])
        p_vals = np.array([0.0, 0.05, 0.1, 0.0, 0.02])
        beta_vals = np.array([1.0, 1.0, 1.0, 0.9, 1.1])
        a = pore_state_sweep(jh, fh.free_energy, p_vals, beta_vals, A=1.0, nnebr=1, max_peaks=4,
                             segment_engine="host")
        b = pore_state_sweep(jh, fh.free_energy, p_vals, beta_vals, A=1.0, nnebr=1, max_peaks=4,
                             segment_engine="device")
        for k in ("labels", "n_phases", "fail_code", "phase_ok", "ridge_ok"):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)
        for k in ("lnpi", "fe", "ave", "act_kT", "act_kT_diff"):
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]), rtol=0, atol=1e-12, err_msg=k)

    def test_host_surface_rebuild_matches_device_builders(self):
        """The device engine's returned lnpi is rebuilt host-side from the
        closed form (only int8 labels are downloaded); the numpy mirrors
        must match the device surface builders to f64 rounding."""
        from fhmcanalysis_tpu.two_dim.joint_pipeline import _joint_surface_host
        from fhmcanalysis_tpu.two_dim.pore_pipeline import _pore_surface_host

        rng = np.random.RandomState(11)
        H, N = 9, 17
        lnpi_raw = rng.randn(H, N) * 3.0
        valid = np.arange(N)[None, :] <= np.clip(rng.randint(N // 2, N, size=H), 1, N - 1)[:, None]
        lnpi_raw[~valid] = -np.inf
        op1 = np.arange(H, dtype=float)
        op2 = np.arange(N, dtype=float) + 0.0
        dmu1, dmu2 = rng.randn(5), rng.randn(5)
        dev = np.asarray(s2d.joint_surface_batch(lnpi_raw, op1, op2, 1.1, dmu1, dmu2, jnp.asarray(valid))[0])
        host = _joint_surface_host(lnpi_raw, op1, op2, 1.1, dmu1, dmu2, valid)
        np.testing.assert_allclose(host[:, valid], dev[:, valid], rtol=0, atol=1e-12)
        assert (host[:, ~valid] == -np.inf).all()

        fh_vals = 0.3 * op1**2
        p_b, beta_b = rng.rand(5), 0.8 + 0.4 * rng.rand(5)
        dev_p = np.asarray(
            s2d.pore_surface_batch(lnpi_raw, op1, fh_vals, p_b, 1.0, beta_b, jnp.asarray(valid))[0]
        )
        host_p = _pore_surface_host(lnpi_raw, op1, fh_vals, p_b, 1.0, beta_b, valid)
        np.testing.assert_allclose(host_p[:, valid], dev_p[:, valid], rtol=0, atol=1e-12)

    def test_return_surfaces_lazy(self):
        targets = np.array([[0.2, -0.3]])
        c = joint_state_sweep(_two_basin_joint(), BETA, MU_REF, targets, nnebr=1, max_peaks=4,
                              segment_engine="device", return_surfaces=False)
        assert isinstance(c["lnpi"], jax.Array) and isinstance(c["labels"], jax.Array)
        d = joint_state_sweep(_two_basin_joint(), BETA, MU_REF, targets, nnebr=1, max_peaks=4,
                              segment_engine="device", return_surfaces=True)
        np.testing.assert_array_equal(np.asarray(c["labels"]), d["labels"])

    def test_sharded_device_engine_matches(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from fhmcanalysis_tpu.parallel import grid_mesh, sharded_joint_state_sweep

        targets = np.array([[0.2, -0.3], [0.5, -0.1], [-0.2, 0.4], [0.45, -0.2], [0.3, 0.0]])
        a = joint_state_sweep(_two_basin_joint(), BETA, MU_REF, targets, nnebr=1, max_peaks=4,
                              segment_engine="device")
        b = sharded_joint_state_sweep(grid_mesh(8), _two_basin_joint(), BETA, MU_REF, targets,
                                      nnebr=1, max_peaks=4, segment_engine="device")
        for k in ("ave", "fe", "n_phases", "phase_ok", "ridge_ok", "fail_code", "lnpi", "labels"):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)
