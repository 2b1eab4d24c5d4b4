"""Isopleth module tests.

Covers the reference isopleth test (grid combiner,
moments_histogram_one_dim_gc_ntot_isopleth.py) plus the coverage the
reference never had (SURVEY §4 untested list): the isopleth class itself
— batched make_grid vs a scalar host-loop replication of the reference
per-pixel semantics — the marching-squares get_iso vs matplotlib, and
surface dump/load/zoom.
"""

import numpy as np
import pytest

import fhmcanalysis_tpu.binary as gcB
from fhmcanalysis_tpu.binary.isopleth import _find_left_right, _get_most_stable_phase
gcB._find_left_right = _find_left_right
gcB._get_most_stable_phase = _get_most_stable_phase
import fhmcanalysis_tpu.histogram.ntot as oneDH

TOL = 1.0e-9


class TestCombine:
    def test_fail_misaligned(self):
        mu1 = np.linspace(-15, -10, 10)
        dmu2 = np.linspace(-5, -3, 5)
        x1, y1 = np.meshgrid(mu1, dmu2)
        z1 = x1**2 + y1**2

        mu1 = np.linspace(-10, -5, 10)
        dmu2 = np.linspace(-5, -4, 5)
        x2, y2 = np.meshgrid(mu1, dmu2)
        z2 = x2**2 + y2**2

        with pytest.raises(Exception):
            gcB.combine_isopleth_grids([x2, x1], [y2, y1], [z2, z1])

        mu1 = np.linspace(-10, -5, 10)
        dmu2 = np.linspace(-5, -3, 6)
        x2, y2 = np.meshgrid(mu1, dmu2)
        z2 = x2**2 + y2**2
        with pytest.raises(Exception):
            gcB.combine_isopleth_grids([x2, x1], [y2, y1], [z2, z1])

    def test_pass(self):
        mu1 = np.linspace(-15, -10, 10)
        dmu2 = np.linspace(-5, -3, 5)
        x1, y1 = np.meshgrid(mu1, dmu2)
        z1 = x1**2 + y1**2

        mu1 = np.linspace(-10, -5, 10)
        x2, y2 = np.meshgrid(mu1, dmu2)
        z2 = x2**2 + y2**2

        mu1 = np.concatenate((np.linspace(-15, -10, 10), np.linspace(-10, -5, 10)[1:]), axis=0)
        x3, y3 = np.meshgrid(mu1, dmu2)
        z3 = x3**2 + y3**2

        Z, (X, Y) = gcB.combine_isopleth_grids([x2, x1], [y2, y1], [z2, z1])
        assert np.all(np.abs(X - x3) < TOL)
        assert np.all(np.abs(Y - y3) < TOL)
        assert np.all(np.abs(Z - z3) < TOL)


class TestFindLeftRight:
    def test_brackets(self):
        arr = np.array([-5.0, -4.0, -2.0])
        assert gcB._find_left_right(arr, -6.0, False) == (-1, -1)
        assert gcB._find_left_right(arr, -6.0, True) == (0, 0)
        assert gcB._find_left_right(arr, -1.0, False) == (3, 3)
        assert gcB._find_left_right(arr, -1.0, True) == (2, 2)
        assert gcB._find_left_right(arr, -4.0, False) == (1, 1)
        assert gcB._find_left_right(arr, -3.0, False) == (1, 2)


def _sources(test_nc):
    """Two sources at different dmu2 built from the fixture data."""
    h1 = oneDH.histogram(test_nc, 1.0, [5.0, 0.0], 1)  # dmu2 = -5
    h2 = oneDH.histogram(test_nc, 1.0, [5.0, 1.0], 1)  # dmu2 = -4
    return [h1, h2]


class TestIsoplethGrid:
    def test_make_grid_matches_host_loop(self, test_nc):
        beta_t = 1.02
        iso = gcB.isopleth(_sources(test_nc), beta_t, order=1)
        mu1_b = (-9.0, -6.0)
        dmu2_b = (-4.9, -4.1)
        delta = (1.5, 0.4)
        Z, (X, Y) = iso.make_grid(mu1_b, dmu2_b, delta, m=2.5)
        assert np.count_nonzero(Z) > 0, "grid entirely failed; parity comparison would be vacuous"

        # host-loop replication of the reference per-pixel semantics
        # (gc_binary.pyx:406-476) using the parity histogram class
        m = 2.5
        for i in range(X.shape[0]):
            for j in range(X.shape[1]):
                mu1 = X[i, j]
                dmu2 = Y[i, j]
                left, right = gcB._find_left_right(iso.data["dmu2"], dmu2, True)
                hs = _sources(test_nc)
                try:
                    h_l = hs[left]
                    h_l.reweight(mu1)
                    h_l = h_l.temp_dmu_extrap(beta_t, np.array([dmu2]), 1, 10.0, False, True, False)
                    h_r = hs[right]
                    h_r.reweight(mu1)
                    h_r = h_r.temp_dmu_extrap(beta_t, np.array([dmu2]), 1, 10.0, False, True, False)
                    dl = abs(iso.data["dmu2"][left] - dmu2) ** m
                    dr = abs(iso.data["dmu2"][right] - dmu2) ** m
                    if dl + dr < 1e-9:
                        w = [1.0, 1.0]
                    else:
                        w = [dr / (dr + dl), dl / (dr + dl)]
                    h_m = h_l.mix(h_r, w)
                    h_m.thermo()
                    if not h_m.is_safe():
                        raise Exception("unsafe")
                    p = gcB._get_most_stable_phase(h_m)
                    want_z = h_m.data["thermo"][p]["x1"]
                    want_rho = h_m.data["thermo"][p]["density"]
                    want_fe = h_m.data["thermo"][p]["F.E./kT"]
                except Exception:
                    want_z = want_rho = want_fe = 0.0

                assert abs(Z[i, j] - want_z) < 1e-8, (i, j, Z[i, j], want_z)
                assert abs(iso.data["density"][i, j] - want_rho) < 1e-8
                assert abs(iso.data["F.E./kT"][i, j] - want_fe) < 1e-6

    def test_get_hist(self, test_nc):
        iso = gcB.isopleth(_sources(test_nc), 1.02, order=1)
        h = iso.get_hist(-8.0, -4.5)
        assert abs(h.data["curr_beta"] - 1.02) < 1e-12
        assert abs((h.data["curr_mu"][1] - h.data["curr_mu"][0]) - (-4.5)) < 1e-9

    def test_dump_load_zoom(self, test_nc, tmp_path):
        iso = gcB.isopleth(_sources(test_nc), 1.02, order=1)
        iso.make_grid((-9.0, -6.0), (-4.9, -4.1), (1.5, 0.4))
        fn = str(tmp_path / "surf.json")
        iso.dump(fn)

        iso2 = gcB.isopleth(_sources(test_nc), 1.02, order=1)
        iso2.load(fn)
        assert np.allclose(iso2.data["Z"], iso.data["Z"])
        assert np.allclose(iso2.data["X"], iso.data["X"])

        zz, (zx, zy), rho, fe = iso2.zoom(2.0, order=1)
        assert zz.shape[0] == iso.data["Z"].shape[0] * 2


class TestGetIso:
    def test_marching_squares_vs_matplotlib(self):
        x = np.linspace(-2, 2, 41)
        y = np.linspace(-2, 2, 41)
        X, Y = np.meshgrid(x, y)
        Z = X**2 + Y**2
        level = 1.0

        pts = np.array(gcB.get_iso(level, Z, X, Y))
        # every traced point lies on the unit circle (after linear interp)
        r = np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2)
        assert np.all(np.abs(r - 1.0) < 0.01)
        # full circle coverage
        ang = np.arctan2(pts[:, 1], pts[:, 0])
        assert ang.max() - ang.min() > 5.5

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        cs = plt.contour(X, Y, Z, [level])
        v = None
        for item in cs.allsegs[0]:
            if v is None or len(item) > len(v):
                v = item
        # same curve: compare radii statistics
        rm = np.sqrt(v[:, 0] ** 2 + v[:, 1] ** 2)
        assert abs(np.mean(r) - np.mean(rm)) < 5e-3

    def test_parameterize_mesh(self):
        x = np.linspace(0, 1, 11)
        y = np.linspace(0, 1, 11)
        X, Y = np.meshgrid(x, y)
        A = X + Y
        B = X - Y
        pts = [(0.5, 0.5), (0.25, 0.75)]
        out = gcB.parameterize_mesh(X, Y, A, B, pts)
        assert np.allclose(out[0], (1.0, 0.0))
        assert np.allclose(out[1], (1.0, -0.5))


class TestGibbsDuhem:
    def test_ideal_surface(self):
        """On a surface generated from an exact thermodynamic model the
        Gibbs-Duhem residual must vanish.

        Model: ideal binary mixture, P*v = (z1 + z2), z_i = exp(beta mu_i);
        x1 = z1/(z1+z2); then x1 dmu1/dx1 + (1-x1) dmu2/dx1 = 0 identically
        along isobars.
        """
        beta = 1.0
        mu1 = np.linspace(-3.0, -1.0, 41)
        dmu2 = np.linspace(-1.0, 1.0, 41)
        MU1, DMU2 = np.meshgrid(mu1, dmu2)
        Z1 = np.exp(beta * MU1)
        Z2 = np.exp(beta * (MU1 + DMU2))
        P = Z1 + Z2
        X1 = Z1 / (Z1 + Z2)

        res = gcB.check_gibbs_duhem(np.array([0.3]), X1, P, MU1, DMU2)
        p, errs, x1s, mus, q1s = res[0]
        errs = np.asarray(errs)
        assert len(errs) > 10
        # spline endpoint derivatives are noisy; interior residual must vanish
        assert np.median(np.abs(errs)) < 1e-2
        assert np.max(np.abs(errs)) < 1e-1


def test_make_grid_rejects_insufficient_max_order(test_nc):
    """order=2 moment extrapolation needs max_order >= 3; the reference
    hits this per pixel inside temp_dmu_extrap (skip_mom=False at
    gc_binary.pyx:450-452) and leaves every cell invalid — we fail fast."""
    iso = gcB.isopleth(_sources(test_nc), 1.02, order=2)
    with pytest.raises(Exception, match="Maximum order"):
        iso.make_grid((-9.0, -6.0), (-4.9, -4.1), (1.5, 0.4))


class TestShardedGrid:
    def test_sharded_make_grid_matches_single_device(self, test_nc):
        """VERDICT r1 item 4: mu_1-sharded isopleth surface over the
        virtual 8-device mesh must equal the single-device surface.
        The grid has 7 mu_1 columns so the device-count padding path
        (pad to 8, trim back) is exercised too."""
        from fhmcanalysis_tpu.parallel import grid_mesh, sharded_make_grid

        beta_t = 1.02
        mu1_b, dmu2_b, delta = (-9.0, -6.0), (-4.9, -4.1), (0.5, 0.4)

        iso_ref = gcB.isopleth(_sources(test_nc), beta_t, order=1)
        Z_ref, (X_ref, Y_ref) = iso_ref.make_grid(mu1_b, dmu2_b, delta)
        assert X_ref.shape[1] % 8 != 0  # padding path must be exercised

        iso_sh = gcB.isopleth(_sources(test_nc), beta_t, order=1)
        mesh = grid_mesh(8)
        Z_sh, (X_sh, Y_sh) = sharded_make_grid(mesh, iso_sh, mu1_b, dmu2_b, delta)

        assert np.array_equal(X_sh, X_ref) and np.array_equal(Y_sh, Y_ref)
        assert np.count_nonzero(Z_ref) > 0
        for k in ("Z", "density", "F.E./kT", "valid"):
            assert np.allclose(
                iso_sh.data[k], iso_ref.data[k], rtol=0, atol=1e-12, equal_nan=True
            ), k

    def test_sharded_make_grid_chunked(self, test_nc):
        """mu1_chunk smaller than the device count still pads per block."""
        from fhmcanalysis_tpu.parallel import grid_mesh, sharded_make_grid

        iso_ref = gcB.isopleth(_sources(test_nc), 1.02, order=1)
        iso_ref.make_grid((-9.0, -6.0), (-4.9, -4.1), (0.5, 0.4))

        iso_sh = gcB.isopleth(_sources(test_nc), 1.02, order=1)
        sharded_make_grid(grid_mesh(8), iso_sh, (-9.0, -6.0), (-4.9, -4.1), (0.5, 0.4), mu1_chunk=3)
        for k in ("Z", "density", "F.E./kT", "valid"):
            assert np.allclose(iso_sh.data[k], iso_ref.data[k], rtol=0, atol=1e-12), k
