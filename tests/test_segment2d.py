"""Randomized host==device equivalence for the 2-D pore engine.

The numpy engine of two_dim.pore_hist is the oracle (itself covered by
test_two_dim.py); the device engine (core/segment2d.py) must match it at
1e-12 on CPU across randomized ragged surfaces, hill layouts, and state
parameters (VERDICT r1 item 1).
"""

import numpy as np
import pytest

from fhmcanalysis_tpu.core import segment2d
from fhmcanalysis_tpu.two_dim import free_energy_profile, joint_hist, pore_hist

ATOL = 1e-12


def _random_joint(rng, H=None, N=None, n_hills=None):
    """Random ragged lnPI(h, N) joint histogram with genuine 2-D hills."""
    H = H or int(rng.integers(6, 14))
    N = N or int(rng.integers(14, 30))
    n_hills = n_hills or int(rng.integers(1, 4))
    centers = [(rng.uniform(1, H - 2), rng.uniform(2, N - 3)) for _ in range(n_hills)]
    amps = rng.uniform(20.0, 60.0, size=n_hills)
    widths = rng.uniform(4.0, 12.0, size=(n_hills, 2))

    jh = joint_hist()
    base_edge = int(rng.integers(max(4, N // 2), N))
    for i in range(H):
        nmax = min(base_edge + int(rng.integers(0, 3)) * (i // 2), N - 1)
        n = np.arange(0, nmax + 1, dtype=float)
        lnpi = np.zeros_like(n)
        for (ch, cn), a, (wh, wn) in zip(centers, amps, widths):
            lnpi += a * np.exp(-((i - ch) ** 2) / wh - ((n - cn) ** 2) / wn)
        lnpi += rng.normal(0.0, 0.05, size=len(n))
        props = {"N_tot": n, "U": -0.5 * n + rng.normal(0, 0.01, len(n))}
        jh.enter(float(i + 1), lnpi, n.astype(int), props)
    return jh


def _pair(rng, **kw):
    jh = _random_joint(rng, **kw)
    coeffs = rng.uniform(-0.5, 0.5, size=2).tolist()
    fh = free_energy_profile.polynomial(coeffs)
    p = float(rng.uniform(0.0, 0.3))
    A = float(rng.uniform(0.5, 2.0))
    beta = float(rng.uniform(0.5, 2.0))
    dev = pore_hist(jh, fh.free_energy, p, A, beta, engine="device")
    host = pore_hist(jh, fh.free_energy, p, A, beta, engine="numpy")
    return dev, host


class TestBuildNormalize:
    def test_randomized_surfaces(self, rng):
        for _ in range(10):
            dev, host = _pair(rng)
            d, h = dev.data["ln(PI)"], host.data["ln(PI)"]
            assert d.shape == h.shape
            both = np.isfinite(d) & np.isfinite(h)
            assert np.array_equal(np.isfinite(d), np.isfinite(h))
            np.testing.assert_allclose(d[both], h[both], rtol=0, atol=ATOL)


class TestThermo:
    def test_random_masks(self, rng):
        dev, host = _pair(rng)
        valid = dev._valid()
        for _ in range(5):
            mask = (rng.random(valid.shape) < 0.4) & valid
            if not mask.any():
                continue
            a = dev.thermo(mask)
            b = host.thermo(mask)
            for k in ("N_tot", "U"):
                np.testing.assert_allclose(a[k], b[k], rtol=0, atol=ATOL)
            assert np.array_equal(a["peak_idx"][0], b["peak_idx"][0])
            assert np.array_equal(a["peak_idx"][1], b["peak_idx"][1])


class TestBoundaryIntegrals:
    def test_vs_host_pixel_loop(self, rng):
        """Device segment-reduction == the reference's sequential
        boundary logaddexp loop on random label fields."""
        from fhmcanalysis_tpu.two_dim.imaging import find_boundaries

        for _ in range(8):
            H, N = int(rng.integers(6, 16)), int(rng.integers(8, 24))
            P = int(rng.integers(2, 5))
            labels = rng.integers(0, P + 1, size=(H, N))
            sd = rng.normal(0, 10, size=(H, N))

            d_min, d_max = segment2d.boundary_pair_integrals(sd, labels.astype(np.int32), P)
            d_min, d_max = np.asarray(d_min), np.asarray(d_max)

            BIGNEG = -1.7976931348623157e308
            h_min = np.full((P + 1, P + 1), BIGNEG)
            h_max = np.full((P + 1, P + 1), BIGNEG)
            edges = find_boundaries(labels, connectivity=1, mode="inner", background=0)
            nebr = [[1, 1], [1, 0], [1, -1], [0, -1], [-1, -1], [-1, 0], [-1, 1], [0, 1]]
            for i, j in zip(*np.where(edges)):
                tp = labels[i, j]
                for k, m in nebr:
                    if 0 <= i + k < H and 0 <= j + m < N:
                        nph = labels[i + k, j + m]
                        if nph != tp and nph > 0 and tp > 0:
                            v = np.logaddexp(sd[i, j] - np.log(2.0), sd[i + k, j + m] - np.log(2.0))
                            h_min[tp, nph] = np.logaddexp(h_min[tp, nph], v)
                            h_min[nph, tp] = h_min[tp, nph]
                            h_max[tp, nph] = max(h_max[tp, nph], v)
                            h_max[nph, tp] = h_max[tp, nph]

            live = h_min > BIGNEG
            assert np.array_equal(d_min > BIGNEG, live)
            np.testing.assert_allclose(d_min[live], h_min[live], rtol=0, atol=1e-10)
            np.testing.assert_allclose(d_max[live], h_max[live], rtol=0, atol=ATOL)


def _compare_phase_props(a, b):
    keys_a = sorted(k for k in a if isinstance(k, int))
    keys_b = sorted(k for k in b if isinstance(k, int))
    assert keys_a == keys_b
    for k in keys_a:
        for prop in ("N_tot", "U", "F.E./kT"):
            np.testing.assert_allclose(a[k][prop], b[k][prop], rtol=0, atol=1e-10)
    for mat in ("activation_kT", "activation_kT_diff"):
        if mat in a or mat in b:
            np.testing.assert_allclose(a[mat], b[mat], rtol=0, atol=1e-10)


class TestPhaseAverage:
    def test_randomized(self, rng):
        n_ok = 0
        for _ in range(12):
            dev, host = _pair(rng)
            try:
                b = host.phase_average(nnebr=1, max_peaks=6)
            except Exception as e:
                with pytest.raises(Exception):
                    dev.phase_average(nnebr=1, max_peaks=6)
                assert "ridgeline" in str(e) or "segment" in str(e)
                continue
            a = dev.phase_average(nnebr=1, max_peaks=6)
            _compare_phase_props(a, b)
            # transition states written back into seg must also agree
            np.testing.assert_allclose(
                dev.data["seg"]["transition_state_kT"],
                host.data["seg"]["transition_state_kT"],
                rtol=0,
                atol=1e-10,
            )
            n_ok += 1
        assert n_ok >= 3  # the generator must produce mostly analyzable surfaces

    def test_width_randomized(self, rng):
        n_ok = 0
        for _ in range(8):
            dev, host = _pair(rng)
            H = dev.data["ln(PI)"].shape[0]
            div = [float(rng.uniform(2, H - 1)), 1000.0]
            try:
                b = host.width_phase_average(div, nnebr=1, max_peaks=6)
            except Exception:
                with pytest.raises(Exception):
                    dev.width_phase_average(div, nnebr=1, max_peaks=6)
                continue
            a = dev.width_phase_average(div, nnebr=1, max_peaks=6)
            keys = sorted(k for k in b if isinstance(k, int))
            assert sorted(k for k in a if isinstance(k, int)) == keys
            for k in keys:
                for prop in ("N_tot", "U", "F.E./kT"):
                    np.testing.assert_allclose(a[k][prop], b[k][prop], rtol=0, atol=1e-10)
            n_ok += 1
        # random ragged surfaces legitimately raise ridgeline errors in
        # BOTH engines often; require at least one fully-compared case
        assert n_ok >= 1


def test_boundary_engines_agree():
    """The scatter-free one-hot reduction must match the segment-op
    engine on real watershed label maps (same shifted terms; only the
    summation order differs)."""
    import numpy as np

    import jax.numpy as jnp

    from fhmcanalysis_tpu.core import segment2d as s2d

    rng = np.random.default_rng(11)
    H, N = 17, 29
    lnpi = jnp.asarray(np.cumsum(rng.standard_normal((H, N)), axis=1))
    labels = np.zeros((H, N), dtype=np.int32)
    labels[:, : N // 3] = 1
    labels[:, N // 3 : 2 * N // 3] = 2
    labels[: H // 2, 2 * N // 3 :] = 3
    labels[H // 2 :, 2 * N // 3 :] = 0  # background region keeps pairs sparse
    labels = jnp.asarray(labels)
    default = s2d.BOUNDARY_SEGMENT_ENGINE
    try:
        s2d.BOUNDARY_SEGMENT_ENGINE = "segment"
        a_df, a_mx = s2d.boundary_pair_integrals(lnpi, labels, max_labels=5)
        s2d.BOUNDARY_SEGMENT_ENGINE = "onehot"
        b_df, b_mx = s2d.boundary_pair_integrals(lnpi, labels, max_labels=5)
    finally:
        s2d.BOUNDARY_SEGMENT_ENGINE = default
    np.testing.assert_array_equal(np.asarray(a_mx), np.asarray(b_mx))
    np.testing.assert_allclose(np.asarray(a_df), np.asarray(b_df), rtol=0, atol=1e-12)
    live = np.asarray(a_df) > s2d._BIGNEG
    assert live.any(), "test labels produced no shared boundaries"
