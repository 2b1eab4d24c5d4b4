"""Batched pore-state pipeline vs the per-state class oracle.

pore_state_sweep (two device launches for S states) must reproduce the
numpy-engine pore_hist.phase_average per state at 1e-10, and flag
ridgeline states via ridge_ok instead of raising (VERDICT r1 item 1).
"""

import numpy as np
import pytest

from fhmcanalysis_tpu.two_dim import free_energy_profile, joint_hist, pore_hist, pore_state_sweep

from test_segment2d import _random_joint


def _two_hill_joint():
    H, N = 13, 21
    jh = joint_hist()
    g1_0 = np.exp(-25.0 / 12.0)
    g2_0 = np.exp(-225.0 / 12.0)
    for i in range(H):
        nmax = min(12 + (i // 2) * 2, N - 1)
        n = np.arange(0, nmax + 1, dtype=float)
        G1 = np.exp(-((n - 5.0) ** 2) / 12.0) - g1_0
        G2 = np.exp(-((n - 15.0) ** 2) / 12.0) - g2_0
        lnpi = 40.0 * np.exp(-((i - 3.0) ** 2) / 8.0) * G1 + 55.0 * np.exp(-((i - 9.0) ** 2) / 8.0) * G2
        jh.enter(float(i + 1), lnpi, n.astype(int), {"N_tot": n, "U": -0.5 * n})
    return jh


class TestPoreStateSweep:
    def test_matches_class_oracle_per_state(self):
        jh = _two_hill_joint()
        fh = free_energy_profile.polynomial([0.1, 0.0])
        p_vals = np.array([0.0, 0.05, 0.1, 0.0, 0.02])
        beta_vals = np.array([1.0, 1.0, 1.0, 0.9, 1.1])
        out = pore_state_sweep(jh, fh.free_energy, p_vals, beta_vals, A=1.0, nnebr=1, max_peaks=4)

        names = out["prop_names"]
        for s in range(len(p_vals)):
            ph = pore_hist(jh, fh.free_energy, float(p_vals[s]), 1.0, float(beta_vals[s]), engine="numpy")
            try:
                props = ph.phase_average(nnebr=1, max_peaks=4)
            except Exception:
                assert not out["ridge_ok"][s]
                continue
            assert out["ridge_ok"][s]
            keys = sorted(k for k in props if isinstance(k, int))
            assert out["n_phases"][s] == len(keys)
            # the class orders phases by label; the sweep slots are labels-1
            for k in keys:
                for j, name in enumerate(names):
                    np.testing.assert_allclose(out["ave"][s, k, j], props[k][name], rtol=0, atol=1e-10)
                np.testing.assert_allclose(out["fe"][s, k], props[k]["F.E./kT"], rtol=0, atol=1e-10)
            n = len(keys)
            np.testing.assert_allclose(out["act_kT"][s, :n, :n], props["activation_kT"], rtol=0, atol=1e-10)
            np.testing.assert_allclose(
                out["act_kT_diff"][s, :n, :n], props["activation_kT_diff"], rtol=0, atol=1e-10
            )
            # normalized surface parity with the class path
            np.testing.assert_allclose(
                np.where(np.isfinite(out["lnpi"][s]), out["lnpi"][s], 0.0),
                np.where(np.isfinite(ph.data["ln(PI)"]), ph.data["ln(PI)"], 0.0),
                rtol=0,
                atol=1e-10,
            )
            np.testing.assert_array_equal(out["labels"][s], ph.data["seg"]["phase_labels"])

    def test_randomized_states(self, rng):
        for _ in range(4):
            jh = _random_joint(rng)
            fh = free_energy_profile.polynomial(rng.uniform(-0.3, 0.3, size=2).tolist())
            S = int(rng.integers(2, 5))
            p_vals = rng.uniform(0.0, 0.2, size=S)
            beta_vals = rng.uniform(0.8, 1.2, size=S)
            out = pore_state_sweep(jh, fh.free_energy, p_vals, beta_vals, A=1.0, nnebr=1, max_peaks=5)
            for s in range(S):
                ph = pore_hist(jh, fh.free_energy, float(p_vals[s]), 1.0, float(beta_vals[s]), engine="numpy")
                try:
                    props = ph.phase_average(nnebr=1, max_peaks=5)
                except Exception:
                    assert not out["ridge_ok"][s]
                    continue
                keys = sorted(k for k in props if isinstance(k, int))
                assert out["n_phases"][s] == len(keys)
                for k in keys:
                    np.testing.assert_allclose(out["fe"][s, k], props[k]["F.E./kT"], rtol=0, atol=1e-10)

    def test_shape_mismatch_raises(self):
        jh = _two_hill_joint()
        fh = free_energy_profile.polynomial([0.0])
        with pytest.raises(AssertionError):
            pore_state_sweep(jh, fh.free_energy, np.zeros(3), np.zeros(2), A=1.0)


class TestShardedPoreSweep:
    def test_sharded_matches_single_device(self):
        """mesh= shards both device stages over the virtual 8-CPU mesh;
        states are independent so outputs must match the single-device
        sweep bitwise (S=5 also exercises the pad-to-device-count path)."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from fhmcanalysis_tpu.parallel import grid_mesh, sharded_pore_state_sweep

        jh = _two_hill_joint()
        fh = free_energy_profile.polynomial([0.1, 0.0])
        p_vals = np.array([0.0, 0.05, 0.1, 0.0, 0.02])
        beta_vals = np.array([1.0, 1.0, 1.0, 0.9, 1.1])
        want = pore_state_sweep(jh, fh.free_energy, p_vals, beta_vals, A=1.0, nnebr=1, max_peaks=4)
        got = sharded_pore_state_sweep(grid_mesh(8), jh, fh.free_energy, p_vals, beta_vals, A=1.0, nnebr=1, max_peaks=4)
        for k in ("ave", "fe", "act_kT", "act_kT_diff", "ridge_diff", "ts"):
            np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]), err_msg=k)
        for k in ("n_phases", "phase_ok", "ridge_ok", "labels", "lnpi"):
            np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]), err_msg=k)
