"""Per-cell/state failure reason codes (VERDICT r2 item 6).

The reference prints each failed isopleth pixel's exception and continues
(gc_binary.pyx:441-442, 453-454, 465-468), and the pore class path raises
per state (pore_hist.py "Cannot segment"/"ridgeline effects").  The
batched rebuilds keep fixed shapes, so the reason rides alongside the
`valid`/`ridge_ok` masks as a small int grid; these tests engineer a
grid/state for each code.
"""

import numpy as np

from fhmcanalysis_tpu.binary.isopleth import (
    FAIL_EDGE_UNSAFE,
    FAIL_OK,
    FAIL_PHASE_OVERFLOW,
    FAIL_SEGMENTATION,
    isopleth,
)
from fhmcanalysis_tpu.histogram.ntot import histogram

FIXTURE = "/root/reference/unittests/reference/test.nc"

MU1_B, DMU2_B, DELTA = (4.9, 5.1), (-9.9, -9.1), (0.1, 0.4)


def _sources(dmu2s, y=None, smooth=1):
    out = []
    for d in dmu2s:
        h = histogram(FIXTURE, 1.0, [5.0, 5.0 + d], smooth=smooth)
        if y is not None:
            h.data["ln(PI)"] = np.array(y, dtype=float)
        out.append(h)
    return out


def _grid_codes(srcs, **kw):
    iso = isopleth(srcs, 1.001, order=1)
    iso.make_grid(MU1_B, DMU2_B, DELTA, **kw)
    return iso


def test_ok_cells_code_zero():
    # known-valid window for the real fixture (tests/test_pallas_iso.py)
    srcs = _sources([-10.0, -9.0])
    iso = isopleth(srcs, 1.02, order=1)
    iso.make_grid((-9.0, -6.0), (-9.9, -9.1), (0.25, 0.1))
    codes = iso.data["fail_code"]
    ok = iso.data["valid"].astype(bool)
    np.testing.assert_array_equal(codes == FAIL_OK, ok)
    assert ok.any()


def test_edge_unsafe_code():
    """A rising lnPI whose tail sits at the maximum trips the stage-1
    edge guard / is_safe cutoff on every cell."""
    n = 31
    y = 0.1 * np.arange(n, dtype=float)
    iso = _grid_codes(_sources([-10.0, -9.0], y))
    assert not iso.data["valid"].any()
    np.testing.assert_array_equal(iso.data["fail_code"], FAIL_EDGE_UNSAFE)


def test_phase_overflow_code():
    """~10 peaks exceed the max_phases=8 padding on every cell."""
    n = 31
    x = np.arange(n, dtype=float)
    y = 5.0 * np.sin(2 * np.pi * x / 3.1) - 0.01 * x
    y[-1] = y.min() - 50.0  # keep the edge guard out of the way
    iso = _grid_codes(_sources([-10.0, -9.0], y))
    assert not iso.data["valid"].any()
    assert (iso.data["fail_code"] == FAIL_PHASE_OVERFLOW).any(), np.unique(iso.data["fail_code"])


def test_segmentation_invalid_code():
    """A smoothed stencil on an oscillating surface yields non-alternating
    extrema the repairs cannot fix — relextrema valid=False without
    overflow."""
    n = 31
    x = np.arange(n, dtype=float)
    rng = np.random.default_rng(7)
    y = np.cumsum(rng.standard_normal(n)) * 2.0
    y[-1] = y.min() - 50.0
    iso = _grid_codes(_sources([-10.0, -9.0], y, smooth=4))
    assert (iso.data["fail_code"] == FAIL_SEGMENTATION).any(), np.unique(iso.data["fail_code"])


def test_pore_fail_codes():
    """Pore sweep: ridge-unsafe and peak-saturation states carry codes;
    clean states carry 0."""
    from fhmcanalysis_tpu.two_dim import free_energy_profile, joint_hist, pore_state_sweep

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
    fh = free_energy_profile.polynomial([0.1, 0.0])

    # clean states: code 0 wherever ridge_ok
    ps = np.linspace(0.0, 0.1, 4)
    betas = np.linspace(0.92, 1.08, 4)[::-1].copy()
    out = pore_state_sweep(jh, fh.free_energy, ps, betas, A=1.0, nnebr=1, max_peaks=4)
    np.testing.assert_array_equal(out["fail_code"] == 0, out["ridge_ok"])
    assert out["ridge_ok"].all()

    # ridge-unsafe: a huge pressure drives occupation to the pore-width
    # boundary, flattening the ridge below the cutoff
    out_bad = pore_state_sweep(jh, fh.free_energy, np.array([8.0]), np.array([1.0]), A=1.0, nnebr=1, max_peaks=4)
    if not out_bad["ridge_ok"][0]:
        assert out_bad["fail_code"][0] == 1

    # peak saturation: max_peaks=0 gives one slot for two basins
    out_sat = pore_state_sweep(jh, fh.free_energy, np.array([0.0]), np.array([1.0]), A=1.0, nnebr=1, max_peaks=0)
    assert out_sat["fail_code"][0] == 3
