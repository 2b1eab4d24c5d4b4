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

__all__ = ["read_table", "loadtxt_unpacked", "NATIVE_AVAILABLE"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_HERE, "_build")
_TAG = "cp%d%d" % sys.version_info[:2]
_SO = os.path.join(_BUILD, "_fhmc_native_%s.so" % _TAG)

_native = None


def _compile() -> str | None:
    os.makedirs(_BUILD, exist_ok=True)
    src = os.path.join(_HERE, "fast_table.cpp")
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(src):
        return _SO
    include_py = sysconfig.get_path("include")
    include_np = np.get_include()
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-I", include_py, "-I", include_np,
        src, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return _SO


def _load():
    global _native
    if _native is not None:
        return _native
    so = _compile()
    if so is None:
        _native = False
        return False
    import importlib.util

    spec = importlib.util.spec_from_file_location("_fhmc_native", so)
    try:
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except Exception:
        _native = False
        return False
    _native = mod
    return mod


def read_table(path: str, comment: str = "#") -> np.ndarray:
    """Parse a whitespace-delimited numeric table to f64 [rows, cols].

    Native when available, np.loadtxt otherwise; both reject ragged rows.
    """
    mod = _load()
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


NATIVE_AVAILABLE = bool(_load())
