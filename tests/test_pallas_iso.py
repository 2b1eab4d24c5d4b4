"""Fused isopleth cell kernel vs the batched XLA grid path (CPU eager)."""

import numpy as np
import pytest

from fhmcanalysis_tpu.binary import isopleth
from fhmcanalysis_tpu.histogram.ntot import histogram

FIXTURE = "/root/reference/unittests/reference/test.nc"
FIXTURE2 = "/root/reference/unittests/reference/test2.nc"


def _sources(fixture, dmu2s, trim=False):
    out = []
    for d in dmu2s:
        h = histogram(fixture, 1.0, [5.0, 5.0 + d], smooth=1)
        if trim:
            h.data["max_order"] = 3
            h.data["mom"] = np.ascontiguousarray(np.asarray(h.data["mom"])[:, :4, :, :4, :4, :])
        out.append(h)
    return out


def _compare(srcs, beta_t, order, mu1_b, dmu2_b, delta):
    a = isopleth(srcs, beta_t, order=order)
    Za, _ = a.make_grid(mu1_b, dmu2_b, delta)
    b = isopleth(srcs, beta_t, order=order)
    Zb, _ = b.make_grid(mu1_b, dmu2_b, delta, engine="pallas")
    np.testing.assert_array_equal(a.data["valid"], b.data["valid"])
    np.testing.assert_array_equal(a.data["fail_code"], b.data["fail_code"])
    np.testing.assert_array_equal(a.data["fail_code"] == 0, a.data["valid"].astype(bool))
    ok = a.data["valid"].astype(bool)
    assert ok.sum() > 0.3 * ok.size, "grid mostly invalid — comparison vacuous"
    for k in ("Z", "density", "F.E./kT"):
        d = np.max(np.abs(np.where(ok, a.data[k] - b.data[k], 0.0)))
        assert d < 1e-9, (k, d)


def test_iso_kernel_order1_parity():
    srcs = _sources(FIXTURE, [-10.0, -9.0])
    _compare(srcs, 1.02, 1, (-9.0, -6.0), (-9.9, -9.1), (0.25, 0.1))


def test_iso_kernel_order1_three_sources():
    srcs = _sources(FIXTURE, [-10.0, -9.4, -8.8])
    _compare(srcs, 1.02, 1, (-9.0, -6.5), (-9.9, -8.9), (0.25, 0.12))


def test_iso_kernel_order2_parity():
    srcs = _sources(FIXTURE2, [-10.0, -9.0], trim=True)
    _compare(srcs, 1.02, 2, (-9.0, -6.5), (-9.9, -9.1), (0.3, 0.12))


def test_iso_kernel_rejects_mismatched_op():
    """The kernel packs source[0]'s op/volume once; differing sources
    must raise instead of silently reweighting with the wrong grid."""
    from fhmcanalysis_tpu.core.pallas_iso import iso_grid_ds

    srcs = _sources(FIXTURE, [-10.0, -9.0])
    h0, h1 = srcs[0]._hist(), srcs[1]._hist()
    metas = (srcs[0]._meta(), srcs[1]._meta())
    h1_bad = h1.replace(op=h1.op + 1.0)
    with pytest.raises(ValueError, match="order-parameter grids"):
        iso_grid_ds(
            (h0, h1_bad), metas, np.linspace(-9, -7, 4), np.linspace(-9.9, -9.1, 3),
            np.array([[0, 1]] * 3), np.array([[0.5, 0.5]] * 3), 1.02, 1, 10.0, mode="xla",
        )


def _three_peak_sources(dmu2s):
    """Sources whose lnPI carries three peaks so the janus transform is
    active on most cells (it is a no-op below 3 maxima).  The first two
    peaks are individually weaker than the last but jointly stronger:
    merging them flips the most-stable phase, so the grid outputs must
    visibly change under collect="janus"."""
    srcs = _sources(FIXTURE, dmu2s)
    n = len(srcs[0].data["ln(PI)"])
    x = np.linspace(0.0, 1.0, n)
    y = (
        11.5 * np.exp(-((x - 0.15) ** 2) / 0.004)
        + 11.3 * np.exp(-((x - 0.45) ** 2) / 0.003)
        + 12 * np.exp(-((x - 0.8) ** 2) / 0.006)
    )
    for h in srcs:
        h.data["ln(PI)"] = np.array(y)
    return srcs


def test_iso_kernel_janus_collect_parity():
    """Cell-kernel janus vs the batched XLA grid janus (VERDICT r1
    item 5), and janus actually changes the surface vs collect=None."""
    srcs = _three_peak_sources([-10.0, -9.0])
    beta_t, mu1_b, dmu2_b, delta = 1.001, (4.9, 5.1), (-9.9, -9.1), (0.02, 0.1)

    a = isopleth(srcs, beta_t, order=1)
    Za, _ = a.make_grid(mu1_b, dmu2_b, delta, collect="janus")
    b = isopleth(srcs, beta_t, order=1)
    Zb, _ = b.make_grid(mu1_b, dmu2_b, delta, engine="pallas", collect="janus")
    np.testing.assert_array_equal(a.data["valid"], b.data["valid"])
    ok = a.data["valid"].astype(bool)
    assert ok.sum() > 0.3 * ok.size, "grid mostly invalid — comparison vacuous"
    for k in ("Z", "density", "F.E./kT"):
        d = np.max(np.abs(np.where(ok, a.data[k] - b.data[k], 0.0)))
        assert d < 1e-9, (k, d)

    c = isopleth(srcs, beta_t, order=1)
    c.make_grid(mu1_b, dmu2_b, delta)
    both = ok & c.data["valid"].astype(bool)
    assert np.max(np.abs(np.where(both, a.data["F.E./kT"] - c.data["F.E./kT"], 0.0))) > 1e-6, (
        "janus made no difference on a 3-peak surface — transform not applied?"
    )


def test_iso_collect_rejects_unknown():
    srcs = _sources(FIXTURE, [-10.0, -9.0])
    a = isopleth(srcs, 1.02, order=1)
    with pytest.raises(NotImplementedError):
        a.make_grid((-9.0, -8.0), (-9.9, -9.5), (0.5, 0.2), engine="pallas", collect="nope")


def test_iso_kernel_mesh_matches_single_device():
    """make_grid(mesh=..., engine="pallas") splits mu_1 into one block
    per mesh device and dispatches the same kernel per chip; per-cell
    results must be BITWISE identical to the single-device kernel
    (VERDICT r3 item 2 done-criterion)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fhmcanalysis_tpu.parallel import grid_mesh, sharded_make_grid

    mu1_b, dmu2_b, delta = (-9.0, -6.0), (-4.9, -4.1), (0.15, 0.08)
    a = isopleth(_sources(FIXTURE, [-5.0, -4.0]), 1.02, order=1)
    a.make_grid(mu1_b, dmu2_b, delta, engine="pallas")
    b = isopleth(_sources(FIXTURE, [-5.0, -4.0]), 1.02, order=1)
    sharded_make_grid(grid_mesh(8), b, mu1_b, dmu2_b, delta, engine="pallas")
    for k in ("Z", "density", "F.E./kT", "valid", "fail_code"):
        np.testing.assert_array_equal(np.asarray(a.data[k]), np.asarray(b.data[k]), err_msg=k)


def _stretch_sources(srcs, n_big):
    """Interpolate each source histogram onto an n_big-bin op grid with a
    synthetic two-basin lnPI (test_pallas_sweep._big_hist analog at the
    class layer; shapes/magnitudes realistic, physics not required)."""
    x = np.linspace(0.0, 1.0, n_big)
    lnpi = 120.0 * np.exp(-((x - 0.25) ** 2) / 0.01) + 150.0 * np.exp(-((x - 0.7) ** 2) / 0.02) - 30.0 * x
    for j, h in enumerate(srcs):
        n = len(h.data["ln(PI)"])
        xi = np.linspace(0.0, 1.0, n)
        mom = np.asarray(h.data["mom"], dtype=np.float64)[..., :n]
        flat = mom.reshape(-1, n)
        h.data["mom"] = np.stack([np.interp(x, xi, r) for r in flat]).reshape(mom.shape[:-1] + (n_big,))
        # tiny per-source tilt so the two sources differ (bracket mixing
        # has something to mix)
        h.data["ln(PI)"] = lnpi - 0.1 * j * x
        h.data[h._OP_KEY] = np.arange(n_big, dtype=np.float64)
    return srcs


def test_iso_kernel_order1_npad2048():
    """NPAD=2048 sources through the sum-chunked order-1 cell kernel body
    vs the XLA grid path (VERDICT r4 item 5 done-criterion: iso-kernel
    parity at N ~ 1400; the on-chip throughput point lives in tests_tpu)."""
    # beta_target == source beta: at 1400 bins the dB*mu*op lnPI tilt of
    # any real beta step (~140 log units at the tail) makes every cell
    # edge-unsafe; the dMu2 bracket mixing is what this test targets
    srcs = _stretch_sources(_sources(FIXTURE, [-10.0, -9.0]), 1400)
    _compare(srcs, 1.0, 1, (4.99, 5.01), (-9.95, -9.05), (0.01, 0.45))


def test_iso_kernel_order2_big_composite_raises():
    """Order 2 keeps the unchunked NPAD=1024 ceiling (MB_MAX_NPAD note)."""
    srcs = _stretch_sources(_sources(FIXTURE2, [-10.0, -9.0], trim=True), 1400)
    b = isopleth(srcs, 1.02, order=2)
    with pytest.raises(NotImplementedError, match="order-2 iso kernel"):
        b.make_grid((4.99, 5.01), (-9.95, -9.05), (0.01, 0.45), engine="pallas")
