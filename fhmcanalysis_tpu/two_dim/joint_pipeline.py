"""Batched device pipeline over a joint (N_1, N_tot) GC surface.

NEW capability beyond the reference: joint_hist.pyx (:22-301) only
assembles and persists the 2-D surface — it has no thermo.  This module
gives the assembled surface the same treatment the 1-D engines got
(core/pipeline.py) and the slit-pore surface got (pore_pipeline.py): one
device launch reweights + normalizes S (mu_1, mu_2) state points, a host
watershed segments each surface (data-dependent flood order), and a
second device launch integrates per-phase probability averages, free
energies, and ridge diagnostics for all S states at once.

Conventions (documented deviations, no upstream analog to mirror):
  - reweight rule: lnPI'(i,j) = lnPI(i,j) + beta*(dmu1*N1[i] + dmu2*N2)
    with N2 = op_2[j] - op_1[i] — the binary-system GC identity, the 2-D
    form of gc_hist.pyx:377-406.
  - F.E./kT per phase = ln_f - lse(lnPI | phase) with ln_f the logsumexp
    of column op_2[0] (for a joint hist starting at N_tot = 0 this is
    the empty-system reference, matching the 1-D lnPI[0] convention).
  - the valid region is data-driven (isfinite of the assembled surface),
    so interior holes from non-contiguous op_2 entries are excluded.
"""

from __future__ import annotations

import copy

import numpy as np

from ..core import segment2d as _s2d
from .pore_pipeline import _footprint, _segment_batch_host, _segment_stream, _tie_fallback

__all__ = ["joint_state_sweep"]


def _joint_surface_host(lnpi_raw, op1, op2, beta, dmu1, dmu2, valid):
    """Numpy mirror of segment2d.joint_surface_batch's lnpi output (same
    op order, true f64) — the joint-surface analog of
    pore_pipeline._pore_surface_host, letting the device engine return
    surfaces while downloading only the int8 labels.

    Matches the device values exactly on CPU and to magnitude*2^-48 of
    the TPU-emulated f64 the labels/fe/ave were computed from, so near
    exact-tie cells the returned surface and labels can be mutually
    inconsistent at the 2^-48 level — labels come from the device
    surface, not this rebuilt one (same caveat as _pore_surface_host)."""
    n1 = np.asarray(op1, dtype=np.float64)[:, None]
    n2 = np.asarray(op2, dtype=np.float64)[None, :] - n1
    dmu1 = np.asarray(dmu1, dtype=np.float64)[:, None, None]
    dmu2 = np.asarray(dmu2, dtype=np.float64)[:, None, None]
    ln = np.where(valid[None], lnpi_raw[None] + beta * (dmu1 * n1[None] + dmu2 * n2[None]), -np.inf)
    m = np.max(np.where(valid[None], ln, -np.inf), axis=(1, 2), keepdims=True)
    s = np.sum(np.exp(np.where(valid[None], ln, -np.inf) - m), axis=(1, 2), keepdims=True)
    return ln - (m + np.log(s))

_JIT = None


def _jits():
    global _JIT
    if _JIT is None:
        import jax

        _JIT = {
            # only lnPI leaves the device: the watershed elevation x is
            # DCE'd out of the launch and rebuilt host-side, halving the
            # [S, H, N] f64 download (~19 MB/state-batch at 64x96x385)
            "surface": jax.jit(lambda *a: _s2d.joint_surface_batch(*a)[0]),
            "phase": jax.jit(_s2d.pore_phase_batch, static_argnames=("max_phases", "boundary_engine")),
        }
    return _JIT


def joint_state_sweep(
    joint_hist, beta, mu_ref, mu_targets, nnebr=1, max_peaks=10, mesh=None,
    segment_engine="auto", return_surfaces=True, tie_fallback=False,
):
    """Phase analysis of lnPI(N_1, N_tot) over S chemical-potential targets.

    Parameters
    ----------
    joint_hist : two_dim.joint_hist (made or unmade), rows = N_1 values,
                 columns = N_tot values (op_2 must contain the N_1 range)
    beta       : inverse temperature the surface was sampled at
    mu_ref     : (mu_1, mu_2) of the sampled surface
    mu_targets : f64[S, 2] absolute (mu_1, mu_2) targets
    nnebr, max_peaks : segmentation knobs (pore_hist.phase_average
                 semantics; the footprint scales with the surface shape)
    mesh       : optional jax.sharding.Mesh — shards the S state axis for
                 both device stages exactly as pore_state_sweep does.
    segment_engine, return_surfaces, tie_fallback : watershed engine +
                 surface-fetch + exact-elevation-tie-fallback knobs,
                 pore_state_sweep semantics ("device" = the whole sweep
                 as one launch via the fixed-shape steepest-ascent
                 watershed; "host" = reference-exact priority flood;
                 "auto" = device on TPU; tie_fallback re-runs tie-flagged
                 states through the host flood instead of fail_code 4).

    Returns the pore_state_sweep dict schema (slot-padded, P =
    max_peaks + 1): prop_names, ave [S,P,K], fe [S,P], act_kT,
    act_kT_diff, n_phases, phase_ok, ridge_ok, fail_code (incl. code 4 =
    unresolved device-engine elevation tie), elev_tie, lnpi, labels,
    local_maxima.
    """
    # a made histogram (or from_json load) is used read-only; only an
    # unmade one needs the deepcopy that shields the caller from make()'s
    # in-place assembly (measured ~0.79 s/call of pure copy+make overhead
    # on the 96x385 bench surface)
    jh = joint_hist
    if "ln(PI)" not in jh.data:
        jh = copy.deepcopy(joint_hist)
        jh.make()
    hd = jh.data

    lnpi_raw = np.asarray(hd["ln(PI)"], dtype=np.float64)
    H, N = lnpi_raw.shape
    assert H > 1 and N > 1, (
        "joint surface must span at least 2 N_1 values and 2 N_tot bins (got %d x %d)" % (H, N)
    )
    op1 = np.asarray(hd["op_1"], dtype=np.float64)
    op2 = np.asarray(hd["op_2"], dtype=np.float64)
    valid = np.isfinite(lnpi_raw)
    edge_idx = np.array(hd["bounds_idx"][:, 1], dtype=int)

    mu_targets = np.asarray(mu_targets, dtype=np.float64)
    assert mu_targets.ndim == 2 and mu_targets.shape[1] == 2, "mu_targets must be [S, 2] (mu_1, mu_2)"
    S = mu_targets.shape[0]
    dmu1 = mu_targets[:, 0] - float(mu_ref[0])
    dmu2 = mu_targets[:, 1] - float(mu_ref[1])

    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        pad = (-S) % n_dev
        if pad:
            dmu1 = np.concatenate([dmu1, np.repeat(dmu1[-1:], pad)])
            dmu2 = np.concatenate([dmu2, np.repeat(dmu2[-1:], pad)])

    def _shard_states(*arrays):
        if mesh is None:
            return arrays
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as Psp

        out = []
        for a in arrays:
            spec = Psp(mesh.axis_names, *([None] * (np.ndim(a) - 1)))
            out.append(jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec)))
        return tuple(out)

    prop_names = list(hd["props"])
    props = np.stack([np.asarray(hd["props"][p], dtype=np.float64) for p in prop_names])

    P = max_peaks + 1
    fp = _footprint(H, N, nnebr)
    from .pore_pipeline import _jits as _pore_jits, _resolve_segment_engine

    engine = _resolve_segment_engine(segment_engine)
    d1_dev, d2_dev = _shard_states(dmu1, dmu2)

    if engine == "device":
        # the whole sweep is ONE launch: reweighted surfaces + fixed-shape
        # watershed + per-phase integration, sharded end-to-end on a mesh
        import jax

        lnpi_dev, seg, core = _pore_jits()["joint_fused"](
            lnpi_raw, op1, op2, float(beta), d1_dev, d2_dev, valid, edge_idx, props,
            fp_shape=tuple(fp.shape), max_phases=P,
            boundary_engine=_s2d.BOUNDARY_SEGMENT_ENGINE,
        )
        # ONE batched transfer for every host-needed output (each
        # separate np.asarray pays the ~26 ms tunnel RPC; measured 127
        # vs 317 st/s on the 96x385 S=64 sweep)
        fetch = [{k: seg[k] for k in ("n_labels", "peak_sat", "peak_rc", "elev_tie")}, core]
        if return_surfaces:
            # labels ride the wire as int8 (phase slots 0..P <= 127) and
            # lnpi is NOT downloaded at all — the closed-form surface is
            # rebuilt host-side (_joint_surface_host); see
            # pore_state_sweep's device path for the sizing
            lab = seg["labels"]
            fetch.append(lab.astype("int8") if P <= 127 else lab)
        got = jax.device_get(fetch)
        segh, core = got[0], got[1]
        n_labels = segh["n_labels"].astype(np.int64)
        peak_sat = segh["peak_sat"]
        peak_rc = segh["peak_rc"]
        elev_tie = np.asarray(segh["elev_tie"], dtype=bool)
        local_maxima = [peak_rc[s, : n_labels[s]].astype(np.int64) for s in range(S)]
        if return_surfaces:
            labels_b = got[2].astype(np.int32, copy=False)
            lnpi_b = _joint_surface_host(lnpi_raw, op1, op2, float(beta), dmu1[:S], dmu2[:S], valid)
        else:
            lnpi_b, labels_b = lnpi_dev, seg["labels"]
        flagged = np.flatnonzero(elev_tie[:S])
        if tie_fallback and flagged.size:
            # reference-exact host flood re-run + splice for tie-flagged
            # states (see pore_state_sweep's device path)
            lnpi_flag = _joint_surface_host(
                lnpi_raw, op1, op2, float(beta), dmu1[flagged], dmu2[flagged], valid
            )
            n_labels, peak_sat, labels_b = _tie_fallback(
                flagged, lnpi_flag, valid, edge_idx, props, fp, nnebr, P,
                core, n_labels, peak_sat, local_maxima, labels_b,
            )
            tie_unresolved = np.zeros(S, dtype=bool)
        else:
            tie_unresolved = elev_tie[:S]
    else:
        # stage 1: all S reweighted surfaces in one launch.  lnpi_dev
        # stays on device for stage 2 (no re-upload); the host download
        # feeds the watershed, with the elevation input x rebuilt in
        # numpy exactly as joint_surface_batch defines it.  Without a
        # mesh the download, floods, and label upload are chunk-pipelined
        # (_segment_stream).
        lnpi_dev = _jits()["surface"](lnpi_raw, op1, op2, float(beta), d1_dev, d2_dev, valid)
        if mesh is None:
            labels_b, n_labels, peak_lnpi, peak_sat, local_maxima, lnpi_b, labels_dev = _segment_stream(
                lnpi_dev, valid, fp, nnebr, P
            )
        else:
            lnpi_b = np.asarray(lnpi_dev)
            mn = np.min(np.where(valid, lnpi_b, np.inf), axis=(1, 2))
            x_b = np.where(valid, lnpi_b - mn[:, None, None], 0.0)
            labels_b, n_labels, peak_lnpi, peak_sat, local_maxima = _segment_batch_host(
                x_b, lnpi_b, valid, fp, nnebr, P
            )
            labels_dev = labels_b

        # stage 2: fused per-phase integration of all S states in one
        # launch (lnpi_dev is the stage-1 device array — already
        # resident/sharded)
        lnpi_dev, labels_dev, peak_dev, nlab_dev = _shard_states(lnpi_dev, labels_dev, peak_lnpi, n_labels)
        core = _jits()["phase"](
            lnpi_dev, labels_dev, valid, edge_idx, props, peak_dev, nlab_dev,
            max_phases=P, boundary_engine=_s2d.BOUNDARY_SEGMENT_ENGINE,
        )
        # host flood == reference semantics; no tie divergence possible
        elev_tie = np.zeros(len(dmu1), dtype=bool)
        tie_unresolved = np.zeros(S, dtype=bool)
    if core and not isinstance(next(iter(core.values())), np.ndarray):
        import jax

        core = jax.device_get(core)  # one batched transfer (see device path)
    out = {k: np.asarray(v)[:S] for k, v in core.items()}

    from .pore_pipeline import _PORE_CUTOFF

    ridge = np.where(out["phase_ok"], out["ridge_diff"], np.inf)
    out["ridge_ok"] = np.all(ridge >= _PORE_CUTOFF, axis=1)
    out["fail_code"] = np.select(
        [peak_sat[:S], n_labels[:S] == 0, tie_unresolved, ~out["ridge_ok"]],
        [np.int32(3), np.int32(2), np.int32(4), np.int32(1)],
        default=np.int32(0),
    ).astype(np.int32)
    out["elev_tie"] = np.asarray(elev_tie[:S], dtype=bool)
    out["prop_names"] = prop_names
    out["n_phases"] = n_labels[:S]
    out["lnpi"] = lnpi_b[:S]
    out["labels"] = labels_b[:S]
    out["local_maxima"] = local_maxima[:S]
    return out
