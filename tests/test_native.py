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


class TestNativeWatershed:
    def test_matches_python_flood(self):
        """Native priority-flood must be bit-identical to the heapq path."""
        from fhmcanalysis_tpu.native import IMAGING_AVAILABLE, watershed_native
        from fhmcanalysis_tpu.two_dim import imaging

        assert IMAGING_AVAILABLE, "g++ is baked into this image; native imaging must build"
        rng = np.random.default_rng(7)
        for trial in range(5):
            img = rng.normal(size=(23, 31))
            markers = np.zeros(img.shape, dtype=np.int64)
            for lab, (i, j) in enumerate(rng.integers(0, 22, size=(4, 2)), start=1):
                markers[i, j] = lab
            mask = rng.random(img.shape) > 0.1
            mask[markers > 0] = True
            for conn in (1, 2):
                got = imaging.watershed(img, markers, mask=mask, connectivity=conn)
                # force the python fallback for comparison
                import fhmcanalysis_tpu.native as N

                saved = N._cache.get("_fhmc_imaging")
                N._cache["_fhmc_imaging"] = False
                try:
                    want = imaging.watershed(img, markers, mask=mask, connectivity=conn)
                finally:
                    N._cache["_fhmc_imaging"] = saved
                assert np.array_equal(got, want), (trial, conn)

    def test_pore_segmentation_path(self):
        """The pore-histogram segmentation flow runs through the native
        watershed unchanged (same peaks, same label count)."""
        from fhmcanalysis_tpu.two_dim import imaging

        y, x = np.mgrid[0:30, 0:40]
        img = np.exp(-((x - 10) ** 2 + (y - 15) ** 2) / 40.0) + np.exp(-((x - 30) ** 2 + (y - 15) ** 2) / 40.0)
        peaks = imaging.peak_local_max(img, min_distance=3)
        markers = np.zeros(img.shape, dtype=np.int64)
        for k, (i, j) in enumerate(peaks, start=1):
            markers[i, j] = k
        labels = imaging.watershed(-img, markers)
        assert set(np.unique(labels)) == {1, 2}
        assert labels[15, 10] != labels[15, 30]
