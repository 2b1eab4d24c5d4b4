"""Order-parameter-axis sharding (parallel/surface.py) vs single-device,
on the virtual 8-CPU mesh: bitwise equality is the contract — the halo
exchange must reproduce clip-mode stencil semantics exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fhmcanalysis_tpu.core import segment as S
from fhmcanalysis_tpu.core.numerics import normalize_lnpi
from fhmcanalysis_tpu.parallel import (
    grid_mesh,
    sharded_normalize_2d,
    sharded_normalize_long,
    sharded_relextrema,
    sharded_stencil_flags,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return grid_mesh(8)


def _long_surface(rng, n):
    x = np.linspace(0, 1, n)
    y = sum(
        a * np.exp(-((x - c) ** 2) / w)
        for c, w, a in zip([0.15, 0.5, 0.82], [0.003, 0.01, 0.004], [40.0, 25.0, 55.0])
    )
    return y + rng.normal(size=n) * 0.2


def test_sharded_normalize_long_bitwise(mesh, rng):
    lnpi = jnp.asarray(_long_surface(rng, 1024))
    got = np.asarray(sharded_normalize_long(mesh, lnpi))
    want = np.asarray(normalize_lnpi(lnpi))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("smooth", [1, 5, 60, 200])
def test_sharded_stencil_flags_bitwise(mesh, rng, smooth):
    # 1024 bins over 8 devices = 128 per block; smooth=200 exercises the
    # gathered fallback (halo wider than the block)
    lnpi = jnp.asarray(_long_surface(rng, 1024))
    gm, gn = sharded_stencil_flags(mesh, lnpi, smooth)
    wm, wn = S.stencil_flags(lnpi, smooth)
    np.testing.assert_array_equal(np.asarray(gm), np.asarray(wm))
    np.testing.assert_array_equal(np.asarray(gn), np.asarray(wn))


@pytest.mark.parametrize("smooth", [3, 50])
def test_sharded_relextrema_bitwise(mesh, rng, smooth):
    lnpi = jnp.asarray(_long_surface(rng, 1024))
    got = sharded_relextrema(mesh, lnpi, smooth, max_phases=8)
    want = S.relextrema(lnpi, smooth, max_phases=8)
    for f in ("maxima", "n_max", "minima", "n_min", "valid"):
        np.testing.assert_array_equal(np.asarray(getattr(got, f)), np.asarray(getattr(want, f)))


def test_sharded_relextrema_endpoint_cases(mesh):
    # monotonic and endpoint-peaked surfaces hit the repair branches
    n = 256
    for lnpi in (
        jnp.linspace(5.0, -40.0, n),
        jnp.concatenate([jnp.linspace(-5.0, 10.0, n // 2), jnp.linspace(10.0, -30.0, n // 2)]),
    ):
        got = sharded_relextrema(mesh, lnpi, 3, max_phases=8)
        want = S.relextrema(lnpi, 3, max_phases=8)
        for f in ("maxima", "n_max", "minima", "n_min", "valid"):
            np.testing.assert_array_equal(np.asarray(getattr(got, f)), np.asarray(getattr(want, f)))


def test_sharded_normalize_2d_bitwise(mesh, rng):
    # ragged pore-style surface: 16 h-rows x 96 N-bins with per-row edges
    H, N = 16, 96
    lnpi = rng.normal(size=(H, N)) * 3.0
    edge = rng.integers(N // 2, N, size=H)
    mask = np.arange(N)[None, :] <= edge[:, None]
    lnpi_m = np.where(mask, lnpi, -np.inf)

    got = np.asarray(sharded_normalize_2d(mesh, lnpi_m, mask))

    vals = np.concatenate([lnpi[i, : edge[i] + 1] for i in range(H)])
    m = np.max(vals)
    shift = m + np.log(np.sum(np.exp(vals - m)))
    # the psum reduces 8 per-shard partials, numpy sums in row order: the
    # scalar shift differs by reduction-order rounding only
    np.testing.assert_allclose(got[mask], (lnpi_m - shift)[mask], rtol=0, atol=1e-13)
    # probabilities over the valid region sum to 1
    assert abs(np.sum(np.exp(got[mask])) - 1.0) < 1e-12
