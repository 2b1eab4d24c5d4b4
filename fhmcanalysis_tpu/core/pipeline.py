"""Batched device pipelines over state-point grids.

These are the TPU-native replacements for the reference's serial workflows:
one jitted launch sweeps an entire (mu, beta, dMu) grid — reweight,
normalize, segment, integrate — where the reference loops pixel by pixel
with deepcopies and gc.collect() (gc_binary.pyx:243-290, 406-410).

All outputs are fixed-shape padded arrays + masks; failed state points
surface as mask=False / NaN rather than exceptions (SURVEY §5 rebuild
contract).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .extrap import temp_dmu_extrap, temp_dmu_extrap_key
from .ops import reweight
from .segment import thermo, thermo_core, thermo_core_props, thermo_key_core
from .state import Hist, HistMeta

__all__ = ["mu_sweep_thermo", "mu_sweep_body", "mu_beta_sweep_thermo", "mu_beta_sweep_body", "most_stable_phase"]


def _point_thermo(h: Hist, meta: HistMeta, mu1, props: bool, collect=None, seg_f32: bool = False):
    """Fused reweight+normalize+thermo for one state point.

    Normalization never happens: F.E. and the per-phase moment averages
    are invariant under lnpi -> lnpi + c (segmentation compares values,
    fe/props are ratios), so segmentation runs on the raw reweighted
    surface and integration uses PER-PHASE max-shifted weights computed
    inside segment._phase_weights — no normalization log, no [N]-wide
    e/s division (f64 division is emulated op-by-op on TPU), one [N] exp
    total.

    Per-phase (not global) shifts are mandatory, not just precision
    hygiene: TPU-emulated f64 keeps only the f32 EXPONENT range
    (exp(+-100) reads inf/0 on device, measured 2026-08-16), so a phase
    sitting more than ~88 log units below the dominant one underflows to
    fe=inf/props=0 under a single global shift — measured on the N=573
    production composite, while the reference's spec_exp (gc_hist.pyx:
    35-53) and the Pallas kernel keep it finite.  exp(x - m_p) <= 1
    always.
    """
    x = h.lnpi + (mu1 - h.curr_mu[..., 0]) * h.curr_beta * h.op
    if props:
        pt, pp = thermo_core_props(x, h.mom, meta, h.volume, collect=collect, seg_f32=seg_f32)
    else:
        pt, pp = thermo_core(x, h.mom, meta, props=False, collect=collect, seg_f32=seg_f32), None
    out = {
        "fe": pt.fe,
        "mask": pt.mask,
        "left": pt.left,
        "right": pt.right,
        "n_phases": pt.n_phases,
        "valid": pt.valid,
    }
    if props:
        out.update(pp)
    return out


def mu_sweep_body(h: Hist, meta: HistMeta, mu_grid, props: bool = True, collect=None, seg_f32: bool = False):
    """Unjitted body of mu_sweep_thermo; exposed for shard_map drivers."""
    return jax.vmap(lambda mu: _point_thermo(h, meta, mu, props, collect, seg_f32))(jnp.asarray(mu_grid))


@partial(jax.jit, static_argnames=("meta", "props", "collect", "seg_f32"))
def _mu_sweep_thermo_xla(h: Hist, meta: HistMeta, mu_grid, props: bool = True, collect=None, seg_f32: bool = False):
    return mu_sweep_body(h, meta, mu_grid, props, collect, seg_f32)


# Chunk XLA-engine launches once the [B, N] f64 intermediates would
# pressure HBM: the graph keeps ~10-15 such buffers live, and N=573 at
# B=262k (150M elements) measured a 25.4 GB compile-time OOM on the
# 16 GB chip while N=31 at B=2M (65M) runs comfortably.  Above the
# trigger, launches use power-of-two chunks sized to ~40M elements
# (uniform shapes -> at most two compiled specializations incl. the tail).
_XLA_CHUNK_TRIGGER = 96_000_000
_XLA_CHUNK_TARGET = 40_000_000


def _xla_sweep_maybe_chunked(h: Hist, meta: HistMeta, mu_grid, props, collect, seg_f32):
    B = int(mu_grid.shape[0])
    N = int(h.lnpi.shape[-1])
    if B * N <= _XLA_CHUNK_TRIGGER:
        return _mu_sweep_thermo_xla(h, meta, mu_grid, props, collect, seg_f32)
    per = 4096
    while per * 2 * N <= _XLA_CHUNK_TARGET:
        per *= 2
    outs = [
        _mu_sweep_thermo_xla(h, meta, mu_grid[i : i + per], props, collect, seg_f32)
        for i in range(0, B, per)
    ]
    return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)


_PALLAS_OK: dict = {}  # per-process memo: does the Mosaic kernel compile here?


def _pallas_failed(kernel: str, exc: Exception):
    """Record a kernel failure: warn visibly (a silent 2-10x slowdown is
    worse than a warning) and disable only THAT kernel for the process."""
    import warnings

    warnings.warn(
        "pallas %s kernel failed (%r); falling back to the XLA engine for "
        "the rest of the process" % (kernel, exc),
        RuntimeWarning,
        stacklevel=3,
    )
    _PALLAS_OK[kernel] = False


def mu_sweep_thermo(h: Hist, meta: HistMeta, mu_grid, props: bool = True, collect=None, seg_f32: bool = False, engine: str = "auto"):
    """Reweight + thermo over a 1-D grid of mu_1 values in one launch.

    Returns dict of arrays with leading axis len(mu_grid): per-phase padded
    free energies, bounds, masks and (optionally) phase properties.

    collect: optional segment.COLLECT_TRANSFORMS key ("janus") — the
    batched analog of thermo(collect=...) (gc_hist.pyx:484-486).
    seg_f32: opt-in f32 extrema decisions (see segment._segment_bounds —
    flips only f32-eps ties; fe/props integration stays f64).
    engine: "auto" (default) runs the fused double-single Pallas kernel on
    TPU — measured 2.1x the XLA-emulated-f64 path on v5e at identical
    1e-8 parity (segmentation decisions can differ only at ~2^-49 ties,
    the same class of tie the platform's own ~48-bit f64 already moves) —
    falling back to XLA off-TPU, for collect/seg_f32 (pallas does not
    implement them), or if the kernel fails to compile.  "xla"/"pallas"
    force a path.
    """
    use_pallas = engine == "pallas"
    if use_pallas and seg_f32:
        raise ValueError("seg_f32 is an XLA-engine option; the pallas kernel's pair compares are already exact")
    if engine == "auto" and collect in (None, "janus") and not seg_f32:
        if jax.default_backend() == "tpu" and _PALLAS_OK.get("sweep", True):
            from .pallas_sweep import kernel_supported

            # oversized composites route straight to XLA: attempting the
            # kernel would ValueError in default_block and poison the
            # process-wide failure memo for valid sizes.  The sweep
            # ceiling is NPAD=2048 (sum-chunked integration, VERDICT r3
            # item 4); the order-1 mb/iso kernels share it (r4 item 5),
            # order-2 stays at the unchunked 1024
            use_pallas = kernel_supported(h.lnpi.shape[-1], kernel="sweep")
    if use_pallas:
        from .pallas_sweep import mu_sweep_thermo_ds

        try:
            out = mu_sweep_thermo_ds(h, meta, jnp.asarray(mu_grid, dtype=jnp.float64), props=props, collect=collect)
            _PALLAS_OK["sweep"] = True
            return out
        except Exception as e:
            if engine == "pallas":
                raise
            _pallas_failed("sweep", e)
    return _xla_sweep_maybe_chunked(h, meta, mu_grid, props, collect, seg_f32)


def mu_beta_sweep_body(
    h: Hist,
    meta: HistMeta,
    mu_grid,
    beta_grid,
    dmu_grid,
    order: int = 1,
    props: bool = True,
    first_order_mom: bool = False,
    collect=None,
):
    """Unjitted body of the (mu_1, beta, dMu) product sweep; see
    mu_beta_sweep_thermo.  Exposed so sharded multi-chip drivers can embed
    it in their own jit with mesh in/out shardings."""
    mu_grid = jnp.asarray(mu_grid)
    beta_grid = jnp.atleast_1d(jnp.asarray(beta_grid))
    dmu_grid = jnp.atleast_2d(jnp.asarray(dmu_grid))
    if dmu_grid.shape[0] == 1:
        dmu_grid = jnp.broadcast_to(dmu_grid, (beta_grid.shape[0], dmu_grid.shape[1]))

    from .derivs import warm_sg_memo

    sg_memo = warm_sg_memo(h, meta, order)  # mu-independent rows, shared across the mu vmap

    def point(mu, beta, dmu):
        hh = reweight(h, mu)
        if props:
            # key-row moment extrapolation: the full-tensor apply was ~6x
            # the rest of the point cost, and thermo reads nspec+1 rows
            lnpi, key = temp_dmu_extrap_key(hh, meta, beta, dmu, order=order, first_order_mom=first_order_mom, sg_memo=sg_memo)
            pt, pp = thermo_key_core(lnpi, key, meta, hh.volume, collect=collect)
        else:
            hh = temp_dmu_extrap(hh, meta, beta, dmu, order=order, skip_mom=True, first_order_mom=first_order_mom, sg_memo=sg_memo)
            (hh, pt), pp = thermo(hh, meta, props=False, collect=collect), None
        # left/right included so the output pytree matches the pallas
        # engine's regardless of which path ran (engine="auto" must not
        # change the schema between backends)
        out = {"fe": pt.fe, "mask": pt.mask, "left": pt.left, "right": pt.right, "n_phases": pt.n_phases, "valid": pt.valid}
        if props:
            out.update(pp)
        return out

    inner = jax.vmap(point, in_axes=(None, 0, 0))  # over (beta, dmu)
    return jax.vmap(inner, in_axes=(0, None, None))(mu_grid, beta_grid, dmu_grid)


@partial(jax.jit, static_argnames=("meta", "order", "props", "first_order_mom", "collect"))
def _mu_beta_sweep_thermo_xla(
    h: Hist,
    meta: HistMeta,
    mu_grid,
    beta_grid,
    dmu_grid,
    order: int = 1,
    props: bool = True,
    first_order_mom: bool = False,
    collect=None,
):
    return mu_beta_sweep_body(h, meta, mu_grid, beta_grid, dmu_grid, order, props, first_order_mom, collect)


def _xla_mb_maybe_chunked(h, meta, mu_grid, beta_grid, dmu_grid, order, props, first_order_mom, collect):
    """Chunk the (mu x target) product over the mu axis when [M*A, N]
    f64 intermediates would pressure HBM — same guard as the plain sweep
    (_xla_sweep_maybe_chunked); the kernel engine needs none."""
    mu_grid = jnp.asarray(mu_grid)
    beta_grid = jnp.atleast_1d(jnp.asarray(beta_grid))
    M = int(mu_grid.shape[0])
    A = int(beta_grid.shape[0])
    N = int(h.lnpi.shape[-1])
    if M * A * N <= _XLA_CHUNK_TRIGGER:
        return _mu_beta_sweep_thermo_xla(h, meta, mu_grid, beta_grid, dmu_grid, order, props, first_order_mom, collect)
    per = 4096
    while per * 2 * A * N <= _XLA_CHUNK_TARGET:
        per *= 2
    outs = [
        _mu_beta_sweep_thermo_xla(h, meta, mu_grid[i : i + per], beta_grid, dmu_grid, order, props, first_order_mom, collect)
        for i in range(0, M, per)
    ]
    return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)


def mu_beta_sweep_thermo(
    h: Hist,
    meta: HistMeta,
    mu_grid,
    beta_grid,
    dmu_grid,
    order: int = 1,
    props: bool = True,
    first_order_mom: bool = False,
    collect=None,
    engine: str = "auto",
):
    """Full (mu_1, beta, dMu) product sweep: reweight -> joint Taylor
    extrapolation -> thermo, one launch.

    mu_grid: [M], beta_grid: [A], dmu_grid: [A or 1, S-1] paired with beta
    via broadcasting against the grid: every (mu, (beta, dmu)) pair is
    evaluated; returns leading axes [M, A].

    engine: "auto" (default) runs the fused double-single Pallas kernel
    on TPU at orders 1-2 (core/pallas_mb.py; measured 4-10x the XLA path
    at identical 1e-8 parity; order 2 requires nspec==2 — the reference's
    own mom_prod limit), falling back to XLA for non-janus collect
    transforms, used_ke histograms, off-TPU, or Mosaic failure.
    "xla"/"pallas" force a path.
    """
    use_pallas = engine == "pallas"
    if use_pallas and collect not in (None, "janus"):
        raise NotImplementedError("the pallas mu-beta kernel implements only the 'janus' collect; use engine='xla' or 'auto'")
    if (
        engine == "auto"
        and (order == 1 or (order == 2 and meta.nspec == 2))
        and collect in (None, "janus")
        # order 1 is exact for KE histograms (the kernel's key rows use
        # sg rows precomputed with the KE corrections and the order-1
        # lnPI derivative has no KE term, gc_hist.pyx:2146-2149 — tested
        # vs the XLA path); order 2's gc_dX_dB lanes are the KE-free form
        and (not meta.used_ke or order == 1)
        and jax.default_backend() == "tpu"
        and _PALLAS_OK.get("mb", True)
    ):
        from .pallas_sweep import kernel_supported

        # order-1 composites get the sum-chunked NPAD=2048 ceiling
        # (VERDICT r4 item 5); order 2 keeps the unchunked 1024
        use_pallas = kernel_supported(h.lnpi.shape[-1], kernel="mb", order=order)
    if use_pallas:
        from .pallas_mb import mu_beta_sweep_thermo_ds

        try:
            out = mu_beta_sweep_thermo_ds(
                h, meta, mu_grid, beta_grid, dmu_grid, props=props, order=order, first_order_mom=first_order_mom, collect=collect
            )
            _PALLAS_OK["mb"] = True
            return out
        except Exception as e:
            if engine == "pallas":
                raise
            _pallas_failed("mb", e)
    return _xla_mb_maybe_chunked(h, meta, mu_grid, beta_grid, dmu_grid, order, props, first_order_mom, collect)


def most_stable_phase(fe, mask):
    """Index of the minimum-free-energy phase among valid slots.

    Parity: _get_most_stable_phase (gc_binary.pyx:83-107).
    """
    return jnp.argmin(jnp.where(mask, fe, jnp.inf), axis=-1)
