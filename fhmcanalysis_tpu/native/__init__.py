"""Native (C++) runtime components with transparent fallback.

The compute path of this framework is JAX/XLA; the host runtime around it
uses native code where the workload warrants it.  Currently: a fast
whitespace-table parser for the window-file loaders (``read_table``),
compiled on first use with g++ into a per-Python-version cached extension.
If no compiler is available the pure-numpy fallback is used silently —
``NATIVE_AVAILABLE`` reports which path is active.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

import numpy as np

__all__ = ["read_table", "loadtxt_unpacked", "watershed_native", "NATIVE_AVAILABLE", "IMAGING_AVAILABLE"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_HERE, "_build")
_TAG = "cp%d%d" % sys.version_info[:2]

_cache: dict = {}


def _compile(src_name: str, mod_name: str) -> str | None:
    os.makedirs(_BUILD, exist_ok=True)
    src = os.path.join(_HERE, src_name)
    so = os.path.join(_BUILD, "%s_%s.so" % (mod_name, _TAG))
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    include_py = sysconfig.get_path("include")
    include_np = np.get_include()
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-I", include_py, "-I", include_np,
        src, "-o", so,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return so


def _load(src_name: str, mod_name: str):
    if mod_name in _cache:
        return _cache[mod_name]
    so = _compile(src_name, mod_name)
    if so is None:
        _cache[mod_name] = False
        return False
    import importlib.util

    spec = importlib.util.spec_from_file_location(mod_name, so)
    try:
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except Exception:
        _cache[mod_name] = False
        return False
    _cache[mod_name] = mod
    return mod


def read_table(path: str, comment: str = "#") -> np.ndarray:
    """Parse a whitespace-delimited numeric table to f64 [rows, cols].

    Native when available, np.loadtxt otherwise; both reject ragged rows.
    """
    mod = _load("fast_table.cpp", "_fhmc_native")
    if mod:
        return mod.read_table(path, comment=comment)
    out = np.loadtxt(path, dtype=np.float64, comments=comment, ndmin=2)
    return out


def loadtxt_unpacked(path: str) -> np.ndarray:
    """np.loadtxt(path, unpack=True) equivalent on the fast path.

    Returns [cols, rows] like unpack=True; single-column files come back
    1-D to match numpy semantics (fhmc_patch.pyx:472 relies on this).
    """
    out = read_table(path).T
    if out.shape[0] == 1:
        return out[0]
    return out


def watershed_native(image, markers, mask, offsets):
    """Priority-flood watershed (imaging.cpp), or None when no compiler.

    Flood order matches two_dim.imaging.watershed's heapq implementation
    exactly — the two paths produce bit-identical label maps.  Elevations
    must be NaN-free (heap comparators have undefined NaN ordering);
    two_dim.imaging.watershed normalizes NaN to +inf before calling.
    """
    mod = _load("imaging.cpp", "_fhmc_imaging")
    if not mod:
        return None
    return mod.watershed(
        np.ascontiguousarray(image, dtype=np.float64),
        np.ascontiguousarray(markers, dtype=np.int64),
        np.ascontiguousarray(mask, dtype=bool),
        np.ascontiguousarray(offsets, dtype=np.int64),
    )


def __getattr__(name):
    # lazy: each extension compiles on first use, not at package import
    # (a cold g++ run can take seconds and read_table users never need
    # the watershed module, and vice versa)
    if name == "NATIVE_AVAILABLE":
        return bool(_load("fast_table.cpp", "_fhmc_native"))
    if name == "IMAGING_AVAILABLE":
        return bool(_load("imaging.cpp", "_fhmc_imaging"))
    raise AttributeError(name)
