"""Property-based parity for masked relextrema against a scipy oracle.

The oracle below is an independent numpy/scipy transcription of the
reference's repair logic (gc_hist.pyx:317-415) — argrelextrema with clip
mode plus endpoint inclusion, over-smoothing gap repairs, and the
alternation/order checks.  The device implementation must agree (both
indices and raise-vs-succeed) on randomized surfaces.
"""

import numpy as np
import pytest
import scipy.signal

from fhmcanalysis_tpu.core import segment as S


def oracle_relextrema(lnpi, smooth):
    """Returns (maxima, minima) or raises, mirroring gc_hist.pyx:317-415."""
    lnpi = np.asarray(lnpi, dtype=np.float64)
    last_idx = len(lnpi) - 1
    if last_idx <= 1:
        raise Exception("too short")

    maxima = scipy.signal.argrelextrema(lnpi, np.greater, 0, smooth, "clip")[0]
    minima = scipy.signal.argrelextrema(lnpi, np.less, 0, smooth, "clip")[0]

    if len(maxima) > 0 and len(minima) > 0:
        if 0 not in maxima and 0 not in minima:
            if maxima[0] < minima[0]:
                minima = np.append(0, minima)
            elif maxima[0] > minima[0]:
                maxima = np.append(0, maxima)
            else:
                raise Exception("bad")
        if last_idx not in maxima and last_idx not in minima:
            if maxima[-1] < minima[-1]:
                maxima = np.append(maxima, last_idx)
            elif maxima[-1] > minima[-1]:
                minima = np.append(minima, last_idx)
            else:
                raise Exception("bad")
    elif len(maxima) > 0 and len(minima) == 0:
        if len(maxima) > 1:
            added = [0]
            for i in range(len(maxima) - 1):
                l, r = maxima[i], maxima[i + 1]
                added.append(int(np.where(lnpi[l:r] == np.min(lnpi[l:r]))[0][0] + l))
            added.append(last_idx)
            minima = np.array(added)
        else:
            minima = np.array([0, last_idx])
    elif len(maxima) == 0 and len(minima) > 0:
        if len(minima) > 1:
            added = [0]
            for i in range(len(minima) - 1):
                l, r = minima[i], minima[i + 1]
                added.append(int(np.where(lnpi[l:r] == np.max(lnpi[l:r]))[0][0] + l))
            added.append(last_idx)
            maxima = np.array(added)
        else:
            maxima = np.array([0, last_idx])
    else:
        maxima = np.where(lnpi == np.max(lnpi))[0]
        minima = np.where(lnpi == np.min(lnpi))[0]

    if not abs(len(maxima) - len(minima)) <= 1:
        raise Exception("not alternating")
    order = np.zeros(len(maxima) + len(minima))
    if maxima[0] < minima[0]:
        order[::2] = maxima
        order[1::2] = minima
    else:
        order[::2] = minima
        order[1::2] = maxima
    if not np.all(order[:-1] <= order[1:]):
        raise Exception("not sorted")
    return maxima, minima


import functools
import jax as _jax


@functools.lru_cache(maxsize=None)
def _jitted_rex(smooth, max_phases):
    return _jax.jit(lambda x: S.relextrema(x, smooth, max_phases))


def masked_relextrema(lnpi, smooth, max_phases=16):
    ext = _jitted_rex(smooth, max_phases)(np.asarray(lnpi, dtype=np.float64))
    if not bool(ext.valid):
        raise Exception("invalid")
    n_max, n_min = int(ext.n_max), int(ext.n_min)
    return np.asarray(ext.maxima)[:n_max], np.asarray(ext.minima)[:n_min]


def _surfaces(rng, n_cases=120):
    sizes = [8, 16, 31]  # fixed so the jitted kernel cache is reused
    for i in range(n_cases):
        n = sizes[i % len(sizes)]
        kind = rng.integers(0, 4)
        if kind == 0:  # smooth multi-well
            x = np.linspace(0, 1, n)
            k = int(rng.integers(1, 4))
            y = np.zeros(n)
            for _ in range(k):
                c, w, a = rng.random(), 0.05 + 0.2 * rng.random(), 5 + 20 * rng.random()
                y += a * np.exp(-((x - c) ** 2) / w**2)
            yield y + 0.1 * rng.normal(size=n)
        elif kind == 1:  # monotonic
            yield np.sort(rng.normal(size=n)) * (1 if rng.random() < 0.5 else -1)
        elif kind == 2:  # rough noise
            yield rng.normal(size=n) * 5
        else:  # plateau-ish integers
            yield rng.integers(-3, 4, size=n).astype(float)


@pytest.mark.parametrize("smooth", [1, 2, 3])
def test_randomized_parity(smooth, rng):
    agree = 0
    for lnpi in _surfaces(rng):
        try:
            want = oracle_relextrema(lnpi, smooth)
            want_raised = False
        except Exception:
            want_raised = True
        try:
            got = masked_relextrema(lnpi, smooth)
            got_raised = False
        except Exception:
            got_raised = True

        assert want_raised == got_raised, (smooth, lnpi.tolist())
        if not want_raised:
            assert np.array_equal(got[0], want[0]), (smooth, lnpi.tolist(), got, want)
            assert np.array_equal(got[1], want[1]), (smooth, lnpi.tolist(), got, want)
            agree += 1
    assert agree > 30  # not vacuous: plenty of valid surfaces compared
