"""joint (N_1, N_tot) device sweep vs independent numpy oracles.

No reference analog exists (joint_hist.pyx is assembly+JSON only), so the
oracles here are first-principles numpy reimplementations: stage 1
(reweight + normalize) recomputed directly, stage 2 (per-phase averages,
free energies) recomputed from the returned labels with plain numpy.
"""

import numpy as np

from fhmcanalysis_tpu.two_dim import joint_hist, joint_state_sweep

BETA = 1.1
MU_REF = (0.2, -0.3)


def _two_basin_joint():
    """lnPI(N_1, N_tot): two Gaussian bumps, one vapor-like (low N_tot,
    low N_1) and one liquid-like; ragged rows N_tot >= N_1."""
    H, N = 12, 25
    jh = joint_hist()
    for i in range(H):
        nt = np.arange(i, N, dtype=float)  # N_tot >= N_1
        b1 = 30.0 * np.exp(-((i - 2.0) ** 2) / 6.0) * np.exp(-((nt - 4.0) ** 2) / 8.0)
        b2 = 33.0 * np.exp(-((i - 8.0) ** 2) / 6.0) * np.exp(-((nt - 18.0) ** 2) / 8.0)
        lnpi = b1 + b2 - 0.05 * nt
        jh.enter(float(i), lnpi, nt.astype(int), {"N_tot": nt, "N_1": np.full(nt.shape, float(i)), "U": -0.4 * nt})
    return jh


def _oracle_surface(jh, beta, mu_ref, mu_t):
    hd = jh.data
    lnpi = np.asarray(hd["ln(PI)"], dtype=float)
    valid = np.isfinite(lnpi)
    n1 = np.asarray(hd["op_1"])[:, None]
    n2 = np.asarray(hd["op_2"])[None, :] - n1
    x = np.where(valid, lnpi + beta * ((mu_t[0] - mu_ref[0]) * n1 + (mu_t[1] - mu_ref[1]) * n2), -np.inf)
    m = x[valid].max()
    return x - (m + np.log(np.sum(np.exp(x[valid] - m)))), valid


def test_stage1_reweight_normalize_matches_numpy():
    jh = _two_basin_joint()
    jh.make()
    targets = np.array([[0.2, -0.3], [0.5, -0.1], [-0.2, 0.4]])
    out = joint_state_sweep(jh, BETA, MU_REF, targets, nnebr=1, max_peaks=4)
    for s, mu_t in enumerate(targets):
        want, valid = _oracle_surface(jh, BETA, MU_REF, mu_t)
        got = out["lnpi"][s]
        np.testing.assert_allclose(got[valid], want[valid], rtol=0, atol=1e-11)


def test_stage2_phase_integrals_match_numpy():
    jh = _two_basin_joint()
    jh.make()
    targets = np.array([[0.2, -0.3], [0.45, -0.2]])
    out = joint_state_sweep(jh, BETA, MU_REF, targets, nnebr=1, max_peaks=4)
    assert (out["fail_code"] == 0).all(), out["fail_code"]
    names = out["prop_names"]
    for s in range(len(targets)):
        lnpi = out["lnpi"][s]
        labels = out["labels"][s]
        n_ph = int(out["n_phases"][s])
        assert n_ph == 2, n_ph
        # ln_f: empty-system reference = logsumexp of the op_2[0] column
        col0 = lnpi[:, 0]
        fin = np.isfinite(col0)
        m0 = col0[fin].max()
        lnf = m0 + np.log(np.sum(np.exp(col0[fin] - m0)))
        for p in range(n_ph):
            region = labels == (p + 1)
            vals = lnpi[region]
            m = vals.max()
            lse = m + np.log(np.sum(np.exp(vals - m)))
            np.testing.assert_allclose(out["fe"][s, p], lnf - lse, rtol=0, atol=1e-11)
            prob = np.exp(vals - m)
            prob /= prob.sum()
            for j, nm in enumerate(names):
                surf = np.asarray(jh.data["props"][nm])
                np.testing.assert_allclose(
                    out["ave"][s, p, j], np.sum(prob * surf[region]), rtol=0, atol=1e-11, err_msg=nm
                )


def test_zero_delta_is_identity():
    """Targets equal to mu_ref reproduce the raw normalized surface."""
    jh = _two_basin_joint()
    jh.make()
    out = joint_state_sweep(jh, BETA, MU_REF, np.array([list(MU_REF)]), nnebr=1, max_peaks=4)
    lnpi = np.asarray(jh.data["ln(PI)"])
    valid = np.isfinite(lnpi)
    m = lnpi[valid].max()
    want = lnpi - (m + np.log(np.sum(np.exp(lnpi[valid] - m))))
    np.testing.assert_allclose(out["lnpi"][0][valid], want[valid], rtol=0, atol=1e-11)


def test_interior_holes_excluded():
    """Non-contiguous op_2 entries leave -inf holes inside rows; the
    data-driven valid mask must exclude them from normalization, the
    watershed domain, and the per-phase integrals."""
    jh = _two_basin_joint()
    # punch a hole: rebuild row N_1=5 without N_tot in [10, 12]
    e = jh.data["entries"][5.0]
    keep = ~np.isin(e.data["op_vals"], [10.0, 11.0, 12.0])
    nt = e.data["op_vals"][keep]
    jh.enter(
        5.0,
        e.data["ln(PI)"][keep],
        nt.astype(int),
        {k: v[keep] for k, v in e.data["props"].items()},
    )
    jh.make()
    assert not np.isfinite(jh.data["ln(PI)"][5, 10:13]).any()
    out = joint_state_sweep(jh, BETA, MU_REF, np.array([[0.2, -0.3]]), nnebr=1, max_peaks=4)
    assert int(out["n_phases"][0]) == 2
    assert (out["labels"][0][5, 10:13] == 0).all(), "hole cells must stay background"
    # oracle re-check on the holed surface
    want, valid = _oracle_surface(jh, BETA, MU_REF, (0.2, -0.3))
    np.testing.assert_allclose(out["lnpi"][0][valid], want[valid], rtol=0, atol=1e-11)


def test_sharded_matches_single_device():
    """sharded_joint_state_sweep on the virtual 8-CPU mesh is bitwise
    equal to the single-device sweep (S=5 exercises the pad+trim path)."""
    import jax

    from fhmcanalysis_tpu.parallel import grid_mesh, sharded_joint_state_sweep

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    jh = _two_basin_joint()
    targets = np.array([[0.2, -0.3], [0.5, -0.1], [-0.2, 0.4], [0.45, -0.2], [0.3, 0.0]])
    a = joint_state_sweep(jh, BETA, MU_REF, targets, nnebr=1, max_peaks=4)
    b = sharded_joint_state_sweep(grid_mesh(8), jh, BETA, MU_REF, targets, nnebr=1, max_peaks=4)
    for k in ("ave", "fe", "n_phases", "phase_ok", "ridge_ok", "fail_code", "lnpi", "labels"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


def test_bench_oracle_agrees_with_pipeline():
    """bench.py's independent numpy reference path (_joint_numpy_state)
    must track the device pipeline on the bench's own production surface
    — this is the parity gate the driver bench applies on chip."""
    import bench

    jh = bench._joint_prod(24, 97)
    jt = bench._joint_states(4)
    out = joint_state_sweep(jh, bench.JOINT_BETA, bench.JOINT_MU_REF, jt, nnebr=1, max_peaks=4)
    assert (out["fail_code"] == 0).all()
    jh.make()
    names = out["prop_names"]
    for s in range(4):
        r = bench._joint_numpy_state(jh, bench.JOINT_BETA, bench.JOINT_MU_REF, jt[s], 1, 4)
        n_ph = r["n_phases"]
        assert int(out["n_phases"][s]) == n_ph
        assert bool(out["ridge_ok"][s]) == r["ridge_ok"]
        for ph in range(n_ph):
            assert abs(float(out["fe"][s, ph]) - r["fe"][ph]) < 1e-11, (s, ph)
            for kk, name in enumerate(names):
                assert abs(float(out["ave"][s, ph, kk]) - r["ave"][name][ph]) < 1e-11, (s, ph, name)
            for ph2 in range(n_ph):
                assert abs(float(out["act_kT"][s, ph, ph2]) - r["act_kT"][ph][ph2]) < 1e-11, (s, ph, ph2)
                assert abs(float(out["act_kT_diff"][s, ph, ph2]) - r["act_kT_diff"][ph][ph2]) < 1e-11, (s, ph, ph2)


def test_mu_shift_moves_stability():
    """Raising mu_1 + mu_2 must stabilize the liquid-like basin: the
    high-N_tot phase's F.E. falls relative to the vapor's."""
    jh = _two_basin_joint()
    jh.make()
    targets = np.array([[0.2, -0.3], [0.7, 0.2]])
    out = joint_state_sweep(jh, BETA, MU_REF, targets, nnebr=1, max_peaks=4)
    names = out["prop_names"]
    jnt = names.index("N_tot")
    for s in range(2):
        order = np.argsort(out["ave"][s, : int(out["n_phases"][s]), jnt])
        assert len(order) == 2
    def gap(s):
        nt = out["ave"][s, : 2, jnt]
        fe = out["fe"][s, : 2]
        lo, hi = np.argsort(nt)
        return fe[hi] - fe[lo]
    assert gap(1) < gap(0)


def test_made_input_not_mutated_and_matches_unmade():
    """The sweep skips the deepcopy for an already-made hist (it is used
    read-only); caller data must be untouched and results must match the
    unmade-input path exactly."""
    import copy

    targets = np.array([[0.2, -0.3], [0.5, -0.1]])
    jh_made = _two_basin_joint()
    jh_made.make()
    snap = copy.deepcopy(jh_made.data)
    out_made = joint_state_sweep(jh_made, BETA, MU_REF, targets, nnebr=1, max_peaks=4)
    def _check(a, b):
        if isinstance(getattr(a, "data", None), dict):  # entry objects: compare their payloads
            _check_dict(a.data, b.data)
            return
        if isinstance(a, dict) or isinstance(b, dict):
            _check_dict(a, b)
            return
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def _check_dict(a, b):
        assert set(a) == set(b)
        for kk in a:
            _check(a[kk], b[kk])

    _check_dict(jh_made.data, snap)

    jh_raw = _two_basin_joint()  # unmade: sweep deepcopies + makes privately
    out_raw = joint_state_sweep(jh_raw, BETA, MU_REF, targets, nnebr=1, max_peaks=4)
    assert "ln(PI)" not in jh_raw.data  # caller's unmade hist untouched
    for k in ("fe", "ave", "n_phases", "fail_code", "lnpi"):
        np.testing.assert_array_equal(out_made[k], out_raw[k])


def test_add_after_make_invalidates_assembly():
    """A slice added after make() must drop the assembled surface, so the
    next sweep/make reflects the new entries instead of sweeping stale
    'ln(PI)' (the sweeps use that key as the already-made signal)."""
    jh = _two_basin_joint()
    jh.make()
    stale = np.array(jh.data["ln(PI)"], copy=True)
    nt = np.arange(12, 25, dtype=float)
    jh.enter(12.0, np.full(nt.shape, 5.0), nt.astype(int),
             {"N_tot": nt, "N_1": np.full(nt.shape, 12.0), "U": -0.4 * nt})
    assert "ln(PI)" not in jh.data and "bounds_idx" not in jh.data

    # a fresh make sees the new row; the sweep path re-makes internally
    jh.make()
    assert jh.data["ln(PI)"].shape[0] == stale.shape[0] + 1
    out = joint_state_sweep(jh, BETA, MU_REF, np.array([[0.2, -0.3]]), nnebr=1, max_peaks=4)
    assert out["lnpi"].shape[1] == stale.shape[0] + 1


def test_empty_state_batch():
    """S=0 target lists return empty, correctly shaped arrays through
    BOTH watershed engines (ADVICE r3: _segment_stream used to crash on
    np.concatenate([]))."""
    for eng in ("host", "device"):
        jh = _two_basin_joint()
        out = joint_state_sweep(jh, BETA, MU_REF, np.zeros((0, 2)), nnebr=1, max_peaks=4,
                                segment_engine=eng)
        assert out["fe"].shape == (0, 5), eng
        assert out["lnpi"].shape[0] == 0 and out["labels"].shape[0] == 0, eng
        assert out["fail_code"].shape == (0,) and out["local_maxima"] == [], eng
