"""Double-single (f32 pair) arithmetic vs native f64 oracles.

The pair carries ~49 mantissa bits; every op below must stay within a few
ulps of that (~1e-13 relative at unit magnitude), far inside the 1e-8
production parity bar the Pallas kernels must meet.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fhmcanalysis_tpu.core import ds

REL = 1e-12  # ~ 2^-40 safety bar; pair precision is ~2^-49


def _mk(rng, n, scale):
    x = (rng.random(n) * 2 - 1) * scale
    return jnp.asarray(x, dtype=jnp.float64)


def _pair(x):
    return ds.split_f64(x)


def _back(h, l):
    return np.asarray(ds.join_f64(h, l))


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_split_join_roundtrip(rng):
    x = _mk(rng, 4096, 300.0)
    h, l = _pair(x)
    # the pair must capture x to f32-pair precision (~2^-49 relative)
    assert np.max(np.abs(_back(h, l) - np.asarray(x))) <= np.max(np.abs(np.asarray(x))) * 2.0**-48


@pytest.mark.parametrize("scale", [1.0, 300.0, 1e-3])
def test_add_mul_div(rng, scale):
    x = _mk(rng, 4096, scale)
    y = _mk(rng, 4096, scale) + scale  # keep divisors away from 0
    xh, xl = _pair(x)
    yh, yl = _pair(y)
    # add/sub error bounds are relative to the INPUT magnitude (a pair sum
    # that cancels keeps only absolute accuracy ~ max|input| * 2^-47, like
    # any fixed-precision format); mul/div have no cancellation
    in_mag = np.maximum(np.abs(np.asarray(x)), np.abs(np.asarray(y)))
    for op, ref in [(ds.ds_add, np.asarray(x + y)), (ds.ds_sub, np.asarray(x - y))]:
        got = _back(*op(xh, xl, yh, yl))
        assert np.max(np.abs(got - ref) / in_mag) < REL, op.__name__
    for op, ref in [(ds.ds_mul, np.asarray(x * y)), (ds.ds_div, np.asarray(x / y))]:
        got = _back(*op(xh, xl, yh, yl))
        denom = np.maximum(np.abs(ref), 1e-30)
        assert np.max(np.abs(got - ref) / denom) < REL, op.__name__


def test_compares_resolve_below_f32(rng):
    # pairs differing only in the low part must compare correctly
    x = jnp.asarray(rng.random(512) * 300.0, dtype=jnp.float64)
    eps = jnp.asarray((rng.random(512) - 0.5) * 1e-10, dtype=jnp.float64)
    a, b = x, x + eps
    ah, al = _pair(a)
    bh, bl = _pair(b)
    lt = np.asarray(ds.ds_lt(ah, al, bh, bl))
    gt = np.asarray(ds.ds_gt(ah, al, bh, bl))
    want_lt = np.asarray(a) < np.asarray(b)
    want_gt = np.asarray(a) > np.asarray(b)
    assert np.array_equal(lt, want_lt)
    assert np.array_equal(gt, want_gt)


def test_max_min_reduce(rng):
    x = _mk(rng, (64, 33), 300.0)
    # inject hi-ties that only the lo part distinguishes
    x = x.at[5].set(x[3] + 1e-9)
    mh, ml = ds.ds_max_reduce(*_pair(x), axis=0)
    ref = np.max(np.asarray(x), axis=0)
    assert np.max(np.abs(_back(mh, ml)[0] - ref)) < 1e-9 * REL + 300 * 2.0**-48
    mh, ml = ds.ds_min_reduce(*_pair(x), axis=0)
    ref = np.min(np.asarray(x), axis=0)
    assert np.max(np.abs(_back(mh, ml)[0] - ref)) < 1e-9 * REL + 300 * 2.0**-48


def test_exp_shifted(rng):
    # the kernel regime: max-shifted arguments in [-45, 0]
    x = jnp.asarray(-rng.random(65536) * 45.0, dtype=jnp.float64)
    x = jnp.concatenate([x, jnp.asarray([0.0, -1e-14, -44.999, -45.0, -300.0])])
    got = _back(*ds.ds_exp_shifted(*_pair(x)))
    ref = np.exp(np.maximum(np.asarray(x), -45.0))
    rel = np.abs(got - ref) / ref
    assert np.max(rel) < REL


def test_sum_pairs_vs_f64(rng):
    # 32-row pairwise tree sum == f64 sum to pair precision
    x = _mk(rng, (32, 257), 1.0)
    sh, sl = ds.ds_sum_pairs(*_pair(x), axis=0)
    ref = np.sum(np.asarray(x, dtype=np.float64), axis=0, keepdims=True)
    assert np.max(np.abs(_back(sh, sl) - ref)) < 32 * 2.0**-48


def test_log(rng):
    # the kernel regime: phase probability sums in (exp(-45)*N, N]
    mag = rng.uniform(-44.0, 4.0, 65536)
    x = jnp.asarray(np.exp(mag) * (0.5 + rng.random(65536)), dtype=jnp.float64)
    x = jnp.concatenate([x, jnp.asarray([1.0, 1.0 + 1e-12, 32.0, 2.9e-20, 0.70710677, 0.70710679])])
    got = _back(*ds.ds_log(*_pair(x)))
    ref = np.log(np.asarray(x))
    # absolute bar: |ln x| <= ~101, ds_div limits t to ~2^-47 rel
    assert np.max(np.abs(got - ref)) < 1e-12


def test_log_exp_roundtrip(rng):
    # fe = x0 - m - log(wsum) consumes ds_log(ds sums of ds_exp); round-trip
    # error must stay ~1e-13 absolute in the log domain
    x = jnp.asarray(-rng.random(4096) * 40.0, dtype=jnp.float64)
    eh, el = ds.ds_exp_shifted(*_pair(x))
    got = _back(*ds.ds_log(eh, el))
    assert np.max(np.abs(got - np.asarray(x))) < 1e-12


def test_exp_range_rule_documented():
    # the f32 exponent range rule: a +100 argument must NOT be fed to
    # ds_exp_shifted; the clamp only guards the low side.  exp(0) == 1.
    h, l = ds.ds_exp_shifted(jnp.float32(0.0), jnp.float32(0.0))
    assert float(h) == 1.0 and abs(float(l)) < 1e-10
