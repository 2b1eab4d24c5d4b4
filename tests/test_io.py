"""netCDF IO: round trips, netCDF-4 convention compliance, edge cases."""

import numpy as np
import pytest

import h5py

from fhmcanalysis_tpu.io import NCFile, read_composite, write_composite


def _sample(n=7, nspec=2, mo=2):
    rng = np.random.default_rng(3)
    return {
        "lnpi": rng.normal(size=n),
        "op": np.arange(n),
        "mom": rng.random((nspec, mo + 1, nspec, mo + 1, mo + 1, n)),
        "volume": 100.0,
        "nspec": nspec,
        "max_order": mo,
    }


def test_roundtrip_minimal(tmp_path):
    s = _sample()
    fn = str(tmp_path / "x.nc")
    write_composite(fn, s["lnpi"], s["op"], s["mom"], s["volume"], s["nspec"], s["max_order"])
    rt = read_composite(fn)
    assert np.array_equal(rt["lnpi"], s["lnpi"])
    assert np.array_equal(rt["mom"], s["mom"])
    assert rt["volume"] == 100.0 and rt["nspec"] == 2 and rt["max_order"] == 2
    assert "pk_hist" not in rt and "e_hist" not in rt


def test_netcdf4_dimension_scales(tmp_path):
    """Written files must carry netCDF-4 dimension-scale conventions so the
    real netCDF4 library can open them (fhmc_patch.pyx:562-633 schema)."""
    s = _sample()
    fn = str(tmp_path / "x.nc")
    write_composite(fn, s["lnpi"], s["op"], s["mom"], s["volume"], s["nspec"], s["max_order"])
    with h5py.File(fn, "r") as f:
        for dim in ["N_{tot}", "i", "j", "k", "m", "p"]:
            assert f[dim].attrs["CLASS"] == b"DIMENSION_SCALE"
        # data variables reference their dims
        assert len(f["ln(PI)"].dims[0]) == 1
        assert len(f["N_{i}^{j}*N_{k}^{m}*U^{p}"].dims) == 6


def test_n1_op_name(tmp_path):
    s = _sample()
    fn = str(tmp_path / "n1.nc")
    write_composite(fn, s["lnpi"], s["op"], s["mom"], s["volume"], s["nspec"], s["max_order"], op_name="N_{1}")
    rt = read_composite(fn, op_name="N_{1}")
    assert np.array_equal(rt["op"], s["op"])
    with pytest.raises(KeyError):
        read_composite(fn, op_name="N_{tot}")


def test_ncfile_attr_access():
    ds = NCFile("/root/reference/unittests/reference/test.nc")
    assert ds.nspec == 2
    assert ds.max_order == 2
    assert isinstance(ds.history, str)
    with pytest.raises(AttributeError):
        ds.not_an_attr
    ds.close()
