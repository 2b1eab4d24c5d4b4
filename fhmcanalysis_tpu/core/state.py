"""Histogram state pytree and static metadata.

The reference's ``histogram`` object is a dict of numpy arrays mutated in
place (ntot/gc_hist.pyx:131-182).  Here it becomes an immutable pytree
(`Hist`) so every operation is a pure function ``Hist -> Hist`` — jittable,
vmappable over leading state-point axes, differentiable, shardable.  The
deepcopy-per-objective-eval of the reference solver (gc_hist.pyx:2607)
disappears for free.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["lnpi", "mom", "op", "curr_mu", "curr_beta", "volume"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Hist:
    """Device-resident histogram state.

    Fields mirror gc_hist.pyx data dict:
      lnpi      : f64[N]                    ln(PI) macrostate distribution
      mom       : f64[S, M, S, M, M, N]     N_i^j * N_k^m * U^p moments
      op        : f64[N]                    order parameter (N_tot or N_1)
      curr_mu   : f64[S]                    current chemical potentials
      curr_beta : f64[]                     current 1/kT
      volume    : f64[]                     box volume
    """

    lnpi: jax.Array
    mom: jax.Array
    op: jax.Array
    curr_mu: jax.Array
    curr_beta: jax.Array
    volume: jax.Array

    @property
    def nbins(self) -> int:
        return self.lnpi.shape[-1]

    def replace(self, **kw) -> "Hist":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class HistMeta:
    """Static (hashable) histogram configuration, passed as a jit-static arg.

    Mirrors the immutable metadata of the reference class
    (ntot/gc_hist.pyx:104-121) plus shape info needed for fixed-shape
    masked segmentation.
    """

    nspec: int
    max_order: int
    used_ke: bool = False
    smooth: int = 1
    max_phases: int = 8

    @property
    def mo1(self) -> int:
        return self.max_order + 1

    @property
    def n_addr(self) -> int:
        return self.nspec * self.mo1 * self.nspec * self.mo1 * self.mo1

    def mom_shape(self, nbins: int) -> tuple:
        return (self.nspec, self.mo1, self.nspec, self.mo1, self.mo1, nbins)


def make_hist(
    lnpi,
    mom,
    op,
    curr_mu,
    curr_beta,
    volume,
) -> Hist:
    """Build a Hist from host arrays/scalars (casts to f64 device arrays)."""
    return Hist(
        lnpi=jnp.asarray(lnpi, dtype=jnp.float64),
        mom=jnp.asarray(mom, dtype=jnp.float64),
        op=jnp.asarray(op, dtype=jnp.float64),
        curr_mu=jnp.asarray(curr_mu, dtype=jnp.float64),
        curr_beta=jnp.asarray(curr_beta, dtype=jnp.float64),
        volume=jnp.asarray(volume, dtype=jnp.float64),
    )


def to_host(h: Hist) -> dict:
    """Pull a Hist back to host numpy arrays."""
    return {
        "lnpi": np.asarray(h.lnpi),
        "mom": np.asarray(h.mom),
        "op": np.asarray(h.op),
        "curr_mu": np.asarray(h.curr_mu),
        "curr_beta": float(h.curr_beta),
        "volume": float(h.volume),
    }
