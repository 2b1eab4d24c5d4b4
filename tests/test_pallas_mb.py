"""Double-single extrapolating-sweep kernel vs the XLA mu_beta pipeline
(CPU, eager lanes body).  Segmentation decisions must match exactly and
fe/props to pair precision — far inside the 1e-8 production bar."""

import numpy as np
import pytest

from fhmcanalysis_tpu.core import pipeline as P
from fhmcanalysis_tpu.core.pallas_mb import mu_beta_sweep_thermo_ds
from fhmcanalysis_tpu.histogram.ntot import histogram

FIXTURE = "/root/reference/unittests/reference/test.nc"


@pytest.fixture(scope="module")
def fixture_hist():
    h = histogram(FIXTURE, 1.0, [5.0, 0.0], smooth=1)
    return h._hist(), h._meta(max_phases=4)


def _compare(hh, meta, mus, betas, dmus, props=True, tol=1e-9):
    got = mu_beta_sweep_thermo_ds(hh, meta, mus, betas, dmus, props=props, mode="xla")
    want = P.mu_beta_sweep_thermo(hh, meta, mus, betas, dmus, order=1, props=props)
    np.testing.assert_array_equal(np.asarray(got["valid"]), np.asarray(want["valid"]))
    np.testing.assert_array_equal(np.asarray(got["mask"]), np.asarray(want["mask"]))
    np.testing.assert_array_equal(np.asarray(got["n_phases"]), np.asarray(want["n_phases"]))
    msk = np.asarray(want["mask"])
    worst = {}
    worst["fe"] = np.max(np.abs(np.where(msk, np.asarray(got["fe"]) - np.asarray(want["fe"]), 0.0)))
    if props:
        for k in ("ntot", "u", "density"):
            worst[k] = np.max(np.abs(np.where(msk, np.asarray(got[k]) - np.asarray(want[k]), 0.0)))
        for k in ("n_i", "x_i"):
            worst[k] = np.max(np.abs(np.where(msk[..., None], np.asarray(got[k]) - np.asarray(want[k]), 0.0)))
    for k, v in worst.items():
        assert v < tol, (k, v)


def test_mb_fixture_parity(fixture_hist):
    hh, meta = fixture_hist
    mus = np.linspace(-2.0, 7.0, 24)
    betas = np.linspace(0.92, 1.08, 4)
    dmus = np.linspace(-5.4, -4.6, 4)[:, None]
    _compare(hh, meta, mus, betas, dmus, props=True)


def test_mb_noprops(fixture_hist):
    hh, meta = fixture_hist
    _compare(hh, meta, np.linspace(-1.0, 6.0, 16), np.array([1.05]), np.array([[-5.2]]), props=False)


def test_mb_identity_targets(fixture_hist):
    """Zero extrapolation distance reduces to the plain sweep."""
    hh, meta = fixture_hist
    mus = np.linspace(-2.0, 7.0, 32)
    got = mu_beta_sweep_thermo_ds(hh, meta, mus, np.array([1.0]), np.array([[-5.0]]), props=True, mode="xla")
    want = P.mu_sweep_thermo(hh, meta, mus, props=True, engine="xla")
    msk = np.asarray(want["mask"])
    np.testing.assert_array_equal(np.asarray(got["mask"])[:, 0], msk)
    for k in ("fe", "ntot", "u"):
        d = np.max(np.abs(np.where(msk, np.asarray(got[k])[:, 0] - np.asarray(want[k]), 0.0)))
        assert d < 1e-10, (k, d)


@pytest.fixture(scope="module")
def fixture_hist_o3():
    """test2.nc trimmed to max_order=3 (order-2 moment extrapolation needs
    max_order >= 3), exactly as bench.py does."""
    h = histogram(FIXTURE.replace("test.nc", "test2.nc"), 1.0, [5.0, 0.0], smooth=1)
    h.data["max_order"] = 3
    h.data["mom"] = np.ascontiguousarray(np.asarray(h.data["mom"])[:, :4, :, :4, :4, :])
    return h._hist(), h._meta(max_phases=4)


def _compare_o2(hh, meta, mus, betas, dmus, props=True, first_order_mom=False, tol=1e-9):
    got = mu_beta_sweep_thermo_ds(
        hh, meta, mus, betas, dmus, props=props, mode="xla", order=2, first_order_mom=first_order_mom
    )
    want = P.mu_beta_sweep_thermo(
        hh, meta, mus, betas, dmus, order=2, props=props, first_order_mom=first_order_mom, engine="xla"
    )
    np.testing.assert_array_equal(np.asarray(got["valid"]), np.asarray(want["valid"]))
    np.testing.assert_array_equal(np.asarray(got["mask"]), np.asarray(want["mask"]))
    msk = np.asarray(want["mask"])
    worst = {"fe": np.max(np.abs(np.where(msk, np.asarray(got["fe"]) - np.asarray(want["fe"]), 0.0)))}
    if props:
        for k in ("ntot", "u", "density"):
            worst[k] = np.max(np.abs(np.where(msk, np.asarray(got[k]) - np.asarray(want[k]), 0.0)))
    for k, v in worst.items():
        assert v < tol, (k, v)


def test_mb_order2_parity(fixture_hist_o3):
    hh, meta = fixture_hist_o3
    mus = np.linspace(-2.0, 7.0, 16)
    betas = np.linspace(0.92, 1.08, 3)
    dmus = np.linspace(-5.4, -4.6, 3)[:, None]
    _compare_o2(hh, meta, mus, betas, dmus, props=True)


def test_mb_order2_first_order_mom(fixture_hist_o3):
    hh, meta = fixture_hist_o3
    _compare_o2(hh, meta, np.linspace(-1.0, 6.0, 8), np.array([1.05]), np.array([[-5.2]]), first_order_mom=True)


def test_mb_order2_identity(fixture_hist_o3):
    """Zero distance: order-2 terms vanish, reduces to the plain sweep."""
    hh, meta = fixture_hist_o3
    mus = np.linspace(-2.0, 7.0, 16)
    got = mu_beta_sweep_thermo_ds(hh, meta, mus, np.array([1.0]), np.array([[-5.0]]), props=True, mode="xla", order=2)
    want = P.mu_sweep_thermo(hh, meta, mus, props=True, engine="xla")
    msk = np.asarray(want["mask"])
    for k in ("fe", "ntot", "u"):
        d = np.max(np.abs(np.where(msk, np.asarray(got[k])[:, 0] - np.asarray(want[k]), 0.0)))
        assert d < 1e-10, (k, d)


def test_mb_janus_collect_parity(fixture_hist):
    """Lanes janus collect in the extrapolating kernel vs the XLA
    mu_beta pipeline collect path on multi-peak surfaces (VERDICT r1
    item 5: collect users must keep the kernel speedup)."""
    hh, meta = fixture_hist
    n = hh.lnpi.shape[-1]
    x = np.linspace(0.0, 1.0, n)
    surfaces = [
        5 * np.exp(-((x - 0.15) ** 2) / 0.004) + 4 * np.exp(-((x - 0.45) ** 2) / 0.003) + 12 * np.exp(-((x - 0.8) ** 2) / 0.006),
        sum(a * np.exp(-((x - c) ** 2) / w) for c, w, a in [(0.1, 0.002, 6), (0.35, 0.002, 5), (0.6, 0.002, 7), (0.85, 0.003, 14)]),
        8 * np.exp(-((x - 0.3) ** 2) / 0.005) + 9 * np.exp(-((x - 0.75) ** 2) / 0.005),  # 2 peaks: no-op
    ]
    mus = np.linspace(4.9, 5.1, 12)
    betas = np.linspace(0.96, 1.04, 3)
    dmus = np.linspace(-5.2, -4.8, 3)[:, None]
    for y in surfaces:
        h2 = hh.replace(lnpi=hh.lnpi * 0 + y)
        got = mu_beta_sweep_thermo_ds(h2, meta, mus, betas, dmus, props=True, mode="xla", collect="janus")
        want = P.mu_beta_sweep_thermo(h2, meta, mus, betas, dmus, order=1, props=True, collect="janus", engine="xla")
        for k in ("valid", "mask", "n_phases", "left", "right"):
            np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]), err_msg=k)
        msk = np.asarray(want["mask"])
        for k in ("fe", "ntot"):
            d = np.max(np.abs(np.where(msk, np.asarray(got[k]) - np.asarray(want[k]), 0.0)))
            assert d < 1e-9, (k, d)


def test_mb_collect_rejects_unknown():
    with pytest.raises(NotImplementedError):
        mu_beta_sweep_thermo_ds(None, None, np.zeros(1), np.zeros(1), np.zeros((1, 1)), collect="nope")


def test_mb_kernel_mesh_matches_single_device():
    """sharded_mu_beta_sweep(engine="pallas") is ONE shard_map SPMD
    program (kernel per shard + on-device lax.pmin min-FE, VERDICT r4
    item 2); outputs must be BITWISE equal to one single-device kernel
    call.  Off-TPU the program runs under EAGER shard_map (the lanes DAG
    is un-compilable on XLA:CPU — see mesh._mb_spmd_pallas), which costs
    ~10 s per traced-op-count unit; props=False keeps this test's op
    count (and wall time) bounded while covering the full fe/mask/bounds
    path and the pmin collective."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp

    from fhmcanalysis_tpu.core import pipeline as P
    from fhmcanalysis_tpu.parallel import grid_mesh, sharded_mu_beta_sweep

    h = histogram(FIXTURE.replace("test.nc", "test2.nc"), 1.0, [5.0, 0.0], smooth=1)
    hh, meta = h._hist(), h._meta(max_phases=4)
    # M=10 with 8 devices also exercises the pad-to-device-count + trim path
    mus = np.linspace(-9.0, -6.0, 10)
    betas = np.linspace(0.95, 1.05, 2)
    dmus = np.linspace(-5.3, -4.7, 2)[:, None]
    ref = P.mu_beta_sweep_thermo(
        hh, meta, jnp.asarray(mus), jnp.asarray(betas), jnp.asarray(dmus), order=1, props=False, engine="pallas"
    )
    out, femin = sharded_mu_beta_sweep(grid_mesh(8), hh, meta, mus, betas, dmus, order=1, props=False, engine="pallas")
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(out[k]), err_msg=k)
    want = np.min(np.where(np.asarray(ref["mask"]), np.asarray(ref["fe"]), np.inf))
    assert float(femin) == float(want)


def test_mb_chunked_equals_unchunked_small(fixture_hist):
    """sum_chunk reassociates only the pair sums (same contract as the
    sweep kernel, test_pallas_sweep.py::test_chunked_equals_unchunked)."""
    hh, meta = fixture_hist
    mus = np.linspace(-2.0, 7.0, 12)
    betas = np.linspace(0.95, 1.05, 2)
    dmus = np.linspace(-5.2, -4.8, 2)[:, None]
    a = mu_beta_sweep_thermo_ds(hh, meta, mus, betas, dmus, props=True, mode="xla")
    b = mu_beta_sweep_thermo_ds(hh, meta, mus, betas, dmus, props=True, mode="xla", sum_chunk=16)
    for k in ("left", "right", "mask", "n_phases", "valid"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)
    for k in ("fe", "ntot", "u", "density"):
        d = np.where(np.asarray(a["mask"]), np.asarray(a[k]) - np.asarray(b[k]), 0.0)
        assert np.abs(d).max() < 1e-11, (k, np.abs(d).max())


def test_mb_big_composite_parity_npad2048(fixture_hist):
    """NPAD=2048 composite through the sum-chunked order-1 kernel body vs
    the f64 XLA mu-beta pipeline (VERDICT r4 item 5 done-criterion:
    mb-kernel parity at N ~ 1400; the on-chip throughput point lives in
    tests_tpu)."""
    from test_pallas_sweep import _big_hist

    h_big, meta = _big_hist(fixture_hist, 1400)
    # _big_hist leaves mom flat [n_addr, N]; the mb DerivEngine indexes
    # the canonical 6-D layout
    h_big = h_big.replace(mom=h_big.mom.reshape(meta.mom_shape(1400)))
    mus = np.linspace(4.99, 5.01, 6)
    betas = np.linspace(0.99, 1.01, 2)
    dmus = np.linspace(-5.05, -4.95, 2)[:, None]
    _compare(h_big, meta, mus, betas, dmus, props=True)


def test_mb_order2_big_composite_raises(fixture_hist_o3):
    """Order 2 keeps the unchunked NPAD=1024 ceiling: the Hessian rows
    stay live through the x' build (pallas_sweep.MB_MAX_NPAD note)."""
    from test_pallas_sweep import _big_hist

    hh, meta = fixture_hist_o3
    h_big, _ = _big_hist((hh, meta), 1400)
    with pytest.raises(NotImplementedError, match="order-2 mb kernel"):
        mu_beta_sweep_thermo_ds(
            h_big, meta, np.linspace(4.99, 5.01, 2), np.array([1.01]), np.array([[-5.0]]),
            props=True, mode="xla", order=2,
        )


def test_mb_iso_kernel_supported_ceilings():
    """kernel_supported: order-1 mb/iso share the sweep's sum-chunked
    NPAD=2048 ceiling; order 2 keeps 1024 (VERDICT r4 item 5)."""
    from fhmcanalysis_tpu.core.pallas_sweep import kernel_supported

    for k in ("mb", "iso"):
        assert kernel_supported(1024, kernel=k) and kernel_supported(2048, kernel=k)
        assert not kernel_supported(2049, kernel=k)
        assert kernel_supported(1024, kernel=k, order=2)
        assert not kernel_supported(1025, kernel=k, order=2)


def test_mb_used_ke_order1_parity():
    """Order-1 kernel on a used_ke histogram vs the KE-corrected XLA
    path (VERDICT r4 item 6): the order-1 lnPI beta-derivative carries no
    KE term (gc_hist.pyx:2146-2149) and the key rows extrapolate via
    sg_dX_dB rows PREcomputed with the engine's KE corrections
    (gc_hist.pyx:1412-1416), so KE data flows through the kernel exactly.
    Order 2 still raises (the Hessian's gc_dX_dB lanes are KE-free)."""
    h = histogram(FIXTURE, 1.0, [5.0, 0.0], smooth=1, ke=True)
    hh, meta = h._hist(), h._meta(max_phases=4)
    assert meta.used_ke
    mus = np.linspace(-2.0, 7.0, 24)
    betas = np.linspace(0.92, 1.08, 4)
    dmus = np.linspace(-5.4, -4.6, 4)[:, None]
    _compare(hh, meta, mus, betas, dmus, props=True)
    with pytest.raises(NotImplementedError, match="order-2 kernel lacks the KE"):
        mu_beta_sweep_thermo_ds(hh, meta, mus, betas, dmus, order=2, mode="xla")
