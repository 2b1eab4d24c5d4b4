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
