"""Order-parameter-axis sharding of dense surfaces (SURVEY §5 long-context analog).

The reference's "sequence" axis is the order parameter N (tens to ~10^3
bins) and nothing scales it; the rebuild's analogous scaling axes are very
long 1-D lnPI surfaces and dense 2-D lnPI(h, N) pore surfaces, which shard
along one order-parameter axis.  The ONLY halo communication in the whole
workload is the +-smooth strict-compare stencil of relextrema
(ntot/gc_hist.pyx:329-330) — everything else is element-wise (reweight,
exp) or a global reduction (normalize, integrate), which map to psum/pmax.

Design (honest about the tradeoff): the stencil — the O(N * smooth)
compare work that dominates long surfaces at production smooth values
(examples use smooth = 50-60, windows.py:85 workloads reach N ~ 800+ per
window and unbounded when patched) — runs fully distributed with
edge-strip halos (2 * smooth values exchanged per device instead of N).
The extrema EXTRACTION (endpoint repairs, alternation checks — O(N) cheap
selects, segment.extrema_from_flags) then runs replicated on an
all-gathered copy: its repair branches need arbitrary gap argmins over
lnpi, and gathering once costs the same one all-gather any global solve
already pays.  Memory stays sharded for every upstream step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as Psp

from ..core.numerics import logsumexp
from ..core.segment import Extrema, extrema_from_flags, stencil_flags

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

__all__ = [
    "sharded_normalize_long",
    "sharded_stencil_flags",
    "sharded_relextrema",
    "sharded_normalize_2d",
]


def _axes(mesh: Mesh):
    """All mesh axes flattened, as the collective axis tuple."""
    return tuple(mesh.axis_names)


def _ndev(mesh: Mesh) -> int:
    return int(np.prod([mesh.shape[a] for a in mesh.axis_names]))


def _check_len(n: int, d: int, what: str):
    if n % d:
        raise ValueError("%s length %d not divisible by %d devices" % (what, n, d))


def sharded_normalize_long(mesh: Mesh, lnpi):
    """normalize_lnpi for a 1-D lnPI sharded over the N axis.

    Parity: histogram.normalize (gc_hist.pyx:57-67) — the shifted
    logsumexp becomes a pmax + psum over the mesh; output stays sharded.
    """
    lnpi = jnp.asarray(lnpi)
    ax = _axes(mesh)
    _check_len(lnpi.shape[-1], _ndev(mesh), "lnpi")
    spec = Psp(ax)
    lnpi = jax.device_put(lnpi, NamedSharding(mesh, spec))

    def body(xl):
        m = lax.pmax(jnp.max(xl), ax)
        s = lax.psum(jnp.sum(jnp.exp(xl - m)), ax)
        return xl - (m + jnp.log(s))

    return jax.jit(shard_map(body, mesh=mesh, in_specs=spec, out_specs=spec))(lnpi)


def _local_flags(xl, smooth: int, ax):
    """Distributed strict-compare stencil over one device's block with
    clip-mode halos (edge strips when smooth <= block, gathered fallback
    otherwise).  Returns (is_max, is_min) for the local block."""
    L = xl.shape[0]
    j = lax.axis_index(ax)
    if smooth >= L:
        # degenerate regime (more halo than block): compute from the
        # gathered surface and slice the local part — still correct
        xg = lax.all_gather(xl, ax, tiled=True)
        fmax, fmin = stencil_flags(xg, smooth)
        return lax.dynamic_slice_in_dim(fmax, j * L, L), lax.dynamic_slice_in_dim(fmin, j * L, L)

    heads = lax.all_gather(xl[:smooth], ax)  # [D, smooth]
    tails = lax.all_gather(xl[-smooth:], ax)
    D = heads.shape[0]
    x_first = heads[0, 0]  # global lnpi[0] / lnpi[-1] for clip-mode fill
    x_last = tails[D - 1, -1]
    left = jnp.where(j > 0, jnp.take(tails, j - 1, axis=0, mode="clip"), jnp.full((smooth,), x_first, xl.dtype))
    right = jnp.where(j < D - 1, jnp.take(heads, j + 1, axis=0, mode="clip"), jnp.full((smooth,), x_last, xl.dtype))
    padded = jnp.concatenate([left, xl, right])  # [L + 2*smooth]

    is_max = jnp.ones(L, dtype=bool)
    is_min = jnp.ones(L, dtype=bool)
    for k in range(1, smooth + 1):
        up = lax.slice_in_dim(padded, smooth + k, smooth + k + L)
        dn = lax.slice_in_dim(padded, smooth - k, smooth - k + L)
        is_max = is_max & (xl > up) & (xl > dn)
        is_min = is_min & (xl < up) & (xl < dn)
    return is_max, is_min


def sharded_stencil_flags(mesh: Mesh, lnpi, smooth: int):
    """segment.stencil_flags with the N axis sharded over the mesh and
    +-smooth halo exchange via edge strips; flags come back sharded."""
    lnpi = jnp.asarray(lnpi)
    ax = _axes(mesh)
    _check_len(lnpi.shape[-1], _ndev(mesh), "lnpi")
    spec = Psp(ax)
    lnpi = jax.device_put(lnpi, NamedSharding(mesh, spec))

    body = partial(_local_flags, smooth=smooth, ax=ax)
    return jax.jit(shard_map(body, mesh=mesh, in_specs=spec, out_specs=(spec, spec)))(lnpi)


def sharded_relextrema(mesh: Mesh, lnpi, smooth: int, max_phases: int) -> Extrema:
    """segment.relextrema for a long sharded surface: distributed stencil
    (halo exchange), then replicated extraction on the gathered flags —
    bitwise identical to the single-device Extrema."""
    lnpi = jnp.asarray(lnpi)
    ax = _axes(mesh)
    _check_len(lnpi.shape[-1], _ndev(mesh), "lnpi")
    spec = Psp(ax)
    lnpi = jax.device_put(lnpi, NamedSharding(mesh, spec))

    def body(xl):
        fmax_l, fmin_l = _local_flags(xl, smooth, ax)
        xg = lax.all_gather(xl, ax, tiled=True)
        fmax = lax.all_gather(fmax_l, ax, tiled=True)
        fmin = lax.all_gather(fmin_l, ax, tiled=True)
        return extrema_from_flags(xg, fmax, fmin, max_phases)

    try:
        fn = shard_map(body, mesh=mesh, in_specs=spec, out_specs=Psp(), check_vma=False)
    except TypeError:  # pre-0.9 fallback import spells the kwarg check_rep
        fn = shard_map(body, mesh=mesh, in_specs=spec, out_specs=Psp(), check_rep=False)
    return jax.jit(fn)(lnpi)


def sharded_normalize_2d(mesh: Mesh, lnpi2d, valid_mask):
    """Masked 2-D pore normalization with the h axis sharded over the mesh.

    Parity: pore_hist normalize (pore_hist.pyx:57-80) — one masked
    logsumexp over the ragged valid region of lnPI(h, N), as a pmax +
    psum over row shards.  valid_mask marks the in-bounds (h, N) cells
    (rows' ragged edges); output stays sharded like the input.
    """
    lnpi2d = jnp.asarray(lnpi2d)
    mask = jnp.asarray(valid_mask, dtype=bool)
    ax = _axes(mesh)
    _check_len(lnpi2d.shape[0], _ndev(mesh), "lnpi2d rows")
    spec = Psp(ax, None)
    lnpi2d = jax.device_put(lnpi2d, NamedSharding(mesh, spec))
    mask = jax.device_put(mask, NamedSharding(mesh, spec))

    def body(xl, ml):
        neg = jnp.array(-jnp.inf, xl.dtype)
        m = lax.pmax(jnp.max(jnp.where(ml, xl, neg)), ax)
        s = lax.psum(jnp.sum(jnp.where(ml, jnp.exp(xl - m), 0.0)), ax)
        return xl - (m + jnp.log(s))

    return jax.jit(shard_map(body, mesh=mesh, in_specs=(spec, spec), out_specs=spec))(lnpi2d, mask)
