"""FHMCAnalysis-TPU: TPU-native flat-histogram Monte Carlo post-processing.

A from-scratch JAX/XLA rebuild of the capabilities of jeetain/FHMCAnalysis
(reference: /root/reference): window patching, histogram reweighting,
moment-based thermodynamics, Taylor extrapolation in (beta, dMu), phase
equilibrium solves, binary-mixture isopleths, and 2-D joint/pore histograms.

Design: every histogram is an immutable pytree of arrays; every operation a
pure, jittable, vmappable function.  Scalar Cython loops in the reference
(gc_hist.pyx:35-78, fhmc_patch.pyx:640-709) become fused XLA array ops; the
reference's serial grid loops (gc_binary.pyx:173-476) become single vmapped
device launches, shardable over a `jax.sharding.Mesh`.

The whole domain runs in float64 (lnPI spans hundreds of log-units); x64 mode
is enabled at import.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from . import core, histogram, io, win_patch  # noqa: E402,F401
