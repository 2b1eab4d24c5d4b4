"""Native fast-table parser: parity with np.loadtxt and loader integration."""

import numpy as np
import pytest

from fhmcanalysis_tpu.native import NATIVE_AVAILABLE, loadtxt_unpacked, read_table

REF = "/root/reference/unittests/reference"


def test_parity_on_real_window_files():
    for fn in [
        REF + "/test_sim/1/final_extMom.dat",
        REF + "/test_sim/1/final_lnPI.dat",
        REF + "/test_sim/2/final_extMom.dat",
    ]:
        a = read_table(fn)
        b = np.loadtxt(fn, ndmin=2)
        assert a.shape == b.shape
        assert np.array_equal(a, b), fn


def test_unpacked_matches_loadtxt_unpack():
    fn = REF + "/test_sim/1/final_extMom.dat"
    a = loadtxt_unpacked(fn)
    b = np.loadtxt(fn, unpack=True)
    assert np.array_equal(a, b)
    # single column -> 1-D, like numpy
    fn1 = REF + "/test_sim/1/final_lnPI.dat"
    a1 = loadtxt_unpacked(fn1)
    b1 = np.loadtxt(fn1, unpack=True)
    assert a1.ndim == b1.ndim == 1
    assert np.array_equal(a1, b1)


def test_scientific_and_negative(tmp_path):
    fn = str(tmp_path / "sci.dat")
    with open(fn, "w") as f:
        f.write("# header\n-1.5e-300\t2E+10\t0.0\n3 -4 7.25\n")
    out = read_table(fn)
    assert np.array_equal(out, [[-1.5e-300, 2e10, 0.0], [3.0, -4.0, 7.25]])


def test_ragged_rejected(tmp_path):
    fn = str(tmp_path / "ragged.dat")
    with open(fn, "w") as f:
        f.write("1 2 3\n4 5\n")
    if NATIVE_AVAILABLE:
        with pytest.raises(ValueError):
            read_table(fn)


def test_non_numeric_rejected(tmp_path):
    fn = str(tmp_path / "bad.dat")
    with open(fn, "w") as f:
        f.write("1 2\n3 abc\n")
    with pytest.raises(ValueError):
        read_table(fn)


def test_native_compiled():
    """The toolchain in this environment must produce the native path."""
    assert NATIVE_AVAILABLE
