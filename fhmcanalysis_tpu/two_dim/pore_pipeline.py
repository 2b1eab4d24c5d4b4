"""Batched device pipeline over slit-pore state points (p, beta).

The 2-D analog of core/pipeline.mu_sweep_thermo (VERDICT r1 item 1):
the reference analyzes one pore state per pore_hist instance
(pore_hist.pyx:82-252, serial host loops); here a whole grid of
(p, beta) targets runs through TWO device launches with the only host
work being the data-dependent watershed floods:

  stage 1  [device, one launch]  row-shift build + masked normalize of
           all S surfaces, plus the watershed elevation input
           (segment2d.pore_surface_batch)
  host     peak finding + priority-flood watershed per state
           (imaging.py, native C++ flood — data-dependent flood order
           cannot be a fixed-shape XLA program)
  stage 2  [device, one launch]  fused per-phase averages, free
           energies, ridge diagnostics, transition states, and
           activation matrices for every state
           (segment2d.pore_phase_batch)

Failure handling follows the framework invariant: ridgeline effects and
empty states become per-state mask/validity flags, not exceptions
(the class path pore_hist.phase_average keeps the reference's raise
semantics).
"""

from __future__ import annotations

import copy
import os

import numpy as np

from ..core import segment2d as _s2d
from .imaging import peak_local_max, watershed

__all__ = ["pore_state_sweep"]

_PORE_CUTOFF = 10.0  # ridgeline bar (pore_hist.pyx:196)

_JIT = None


def _jits():
    global _JIT
    if _JIT is None:
        import jax

        _JIT = {
            # only lnPI leaves the device: the watershed elevation x is
            # DCE'd out of the launch and rebuilt host-side, halving the
            # [S, H, N] f64 download
            "surface": jax.jit(lambda *a: _s2d.pore_surface_batch(*a)[0]),
            "phase": jax.jit(_s2d.pore_phase_batch, static_argnames=("max_phases", "boundary_engine")),
            # the whole sweep as one launch (device watershed, no host stage)
            "pore_fused": jax.jit(
                _s2d.pore_sweep_fused, static_argnames=("fp_shape", "max_phases", "boundary_engine")
            ),
            "joint_fused": jax.jit(
                _s2d.joint_sweep_fused, static_argnames=("fp_shape", "max_phases", "boundary_engine")
            ),
        }
    return _JIT


def _resolve_segment_engine(segment_engine: str) -> str:
    """'auto' picks the device watershed on TPU (one fused launch, no
    download/flood/upload cycle) and the reference-exact host
    priority-flood elsewhere.  The two agree exactly on surfaces without
    exact elevation ties whenever the peak slots do not saturate
    (fail_code 3); the host arm stays selectable as the cross-check, the
    same dual-arm discipline as segment2d.BOUNDARY_SEGMENT_ENGINE."""
    if segment_engine == "auto":
        import jax

        return "device" if jax.default_backend() == "tpu" else "host"
    assert segment_engine in ("host", "device"), segment_engine
    return segment_engine


def _footprint(len_H: int, len_N: int, nnebr: int):
    """Scaled watershed footprint (pore_hist.pyx:396-409) — depends on
    the surface shape only, shared by every state in the batch."""
    assert len_H > 1 and len_N > 1, (
        "pore surface must span at least 2 h values and 2 N_tot bins "
        "(got %d x %d); a 1-row/1-column joint histogram cannot be "
        "segmented" % (len_H, len_N)
    )
    n_incrs = float(len_N - 1)
    h_incrs = float(len_H - 1)
    if h_incrs >= n_incrs:
        scale_h, scale_n = 1.0, h_incrs / n_incrs
    else:
        scale_h, scale_n = n_incrs / h_incrs, 1.0
    fp_x = int(np.round(scale_n * nnebr)) * 2 + 1
    fp_y = int(np.round(scale_h * nnebr)) * 2 + 1
    return np.ones((fp_x, fp_y))


def _pore_surface_host(lnpi_raw, h_vals, fh_vals, p_vals, A, beta_vals, valid):
    """Numpy mirror of segment2d.pore_surface_batch's lnpi output (same
    op order, true f64).  Lets the device engine honor
    ``return_surfaces=True`` without downloading the [S, H, N] f64
    buffer: only the int8 labels leave the device and the closed-form
    row shift + masked normalization is rebuilt host-side.  Matches the
    device values exactly on CPU and to magnitude*2^-48 of the
    TPU-emulated f64 the labels were computed from — far inside the
    1e-12 engine-parity bar."""
    p = np.asarray(p_vals, dtype=np.float64)[:, None]
    beta = np.asarray(beta_vals, dtype=np.float64)[:, None]
    shift = -beta * (fh_vals[None, :] + p * A * h_vals[None, :]) - lnpi_raw[None, :, 0]
    ln = lnpi_raw[None] + shift[:, :, None]
    m = np.max(np.where(valid[None], ln, -np.inf), axis=(1, 2), keepdims=True)
    s = np.sum(np.exp(np.where(valid[None], ln, -np.inf) - m), axis=(1, 2), keepdims=True)
    return ln - (m + np.log(s))


def _segment_batch_host(x_b, lnpi_b, valid, fp, nnebr, P):
    """Peak finding + watershed flood for a batch of independent states.

    Each state probes one extra peak: truncation is a stable sorted
    slice, so lm[:P] is exactly the num_peaks=P answer while len==P+1
    proves the padding saturated (fail_code 3).

    States are independent, so above a handful the loop runs on a small
    thread pool: scipy's maximum_filter and the native C++ flood
    (imaging.cpp) both release the GIL, so the floods genuinely overlap.
    Results are bit-identical to the serial loop — every write lands in
    a distinct [s] slot.
    """
    SP, H, N = x_b.shape
    labels_b = np.zeros((SP, H, N), dtype=np.int32)
    n_labels = np.zeros(SP, dtype=np.int64)
    peak_lnpi = np.zeros((SP, P), dtype=np.float64)
    peak_sat = np.zeros(SP, dtype=bool)
    local_maxima = [None] * SP

    def _one(s):
        lm = peak_local_max(x_b[s], min_distance=nnebr, exclude_border=0, num_peaks=P + 1, footprint=fp)
        peak_sat[s] = len(lm) > P
        lm = lm[:P]
        local_maxima[s] = lm
        n_max = len(lm)
        n_labels[s] = n_max
        markers = np.zeros((H, N), dtype=int)
        for i in range(n_max):
            markers[lm[i][0], lm[i][1]] = i + 1
        labels_b[s] = watershed(-x_b[s], markers=markers, mask=valid, connectivity=fp)
        if n_max:
            peak_lnpi[s, :n_max] = lnpi_b[s, lm[:, 0], lm[:, 1]]

    try:
        workers = len(os.sched_getaffinity(0))  # honours CPU pinning
    except AttributeError:  # non-Linux
        workers = os.cpu_count() or 1
    if SP >= 8 and workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(8, workers)) as ex:
            list(ex.map(_one, range(SP)))
    else:
        for s in range(SP):
            _one(s)
    return labels_b, n_labels, peak_lnpi, peak_sat, local_maxima


def _segment_stream(lnpi_dev, valid, fp, nnebr, P, chunk=16):
    """Chunk-pipelined stage-1 download + host segmentation + stage-2
    label upload.

    The tunnel transfer of the [S, H, N] f64 stage-1 surfaces is the
    second-largest fixed cost of a state sweep after the flood itself
    (~0.3 s for 64 96x385 states vs ~0.7 s of flooding, measured
    2026-08-18).  Both the device_get RPC wait and the native flood
    release the GIL, so a single download thread working chunk i+1
    while the main thread floods chunk i hides all but the first
    chunk's transfer — and label chunks are device_put as soon as they
    are flooded (dispatch is async), so the stage-2 upload is in
    flight before stage 2 is called.

    Returns (labels_b, n_labels, peak_lnpi, peak_sat, local_maxima,
    lnpi_b, labels_dev): the _segment_batch_host tuple plus the
    assembled host surfaces and the on-device labels for stage 2.
    """
    import jax
    import jax.numpy as jnp

    S = int(lnpi_dev.shape[0])
    if S == 0:  # empty state batch: nothing to download or flood
        H, N = int(lnpi_dev.shape[1]), int(lnpi_dev.shape[2])
        return (
            np.zeros((0, H, N), np.int32), np.zeros(0, np.int64),
            np.zeros((0, P), np.float64), np.zeros(0, bool), [],
            np.zeros((0, H, N), np.float64), jnp.zeros((0, H, N), np.int32),
        )
    bounds = [(a, min(a + chunk, S)) for a in range(0, S, chunk)]
    from concurrent.futures import ThreadPoolExecutor

    parts = []
    with ThreadPoolExecutor(1) as ex:
        futs = [ex.submit(np.asarray, lnpi_dev[a:b]) for a, b in bounds]
        for f in futs:
            lnpi_c = f.result()
            mn = np.min(np.where(valid, lnpi_c, np.inf), axis=(1, 2))
            x_c = np.where(valid, lnpi_c - mn[:, None, None], 0.0)
            seg = _segment_batch_host(x_c, lnpi_c, valid, fp, nnebr, P)
            parts.append((lnpi_c, seg, jax.device_put(seg[0])))
    labels_b = np.concatenate([p[1][0] for p in parts])
    n_labels = np.concatenate([p[1][1] for p in parts])
    peak_lnpi = np.concatenate([p[1][2] for p in parts])
    peak_sat = np.concatenate([p[1][3] for p in parts])
    local_maxima = [lm for p in parts for lm in p[1][4]]
    lnpi_b = np.concatenate([p[0] for p in parts])
    labels_dev = jnp.concatenate([p[2] for p in parts]) if len(parts) > 1 else parts[0][2]
    return labels_b, n_labels, peak_lnpi, peak_sat, local_maxima, lnpi_b, labels_dev


def _tie_fallback(flagged, lnpi_flag, valid, edge_idx, props, fp, nnebr, P, core, n_labels, peak_sat, local_maxima, labels_b):
    """Re-run tie-flagged states through the reference-exact host flood
    (imaging.py priority flood, pore_hist.pyx:414-423 semantics) + the
    stage-2 phase launch, splicing the results over the device-engine
    outputs in place.  Shared by the pore and joint sweeps; the caller
    supplies the host-rebuilt true-f64 surfaces for the flagged states.

    Returns (n_labels, peak_sat, labels_b) updated — numpy splices go
    through writable copies (device_get views are read-only), device
    label arrays through a functional .at[].set."""
    import jax

    def _splice(dst, src):
        dst = np.asarray(dst)
        if not dst.flags.writeable:
            dst = dst.copy()
        dst[flagged] = np.asarray(src)
        return dst

    mn = np.min(np.where(valid, lnpi_flag, np.inf), axis=(1, 2))
    x_f = np.where(valid, lnpi_flag - mn[:, None, None], 0.0)
    lab_f, nl_f, pk_f, sat_f, lm_f = _segment_batch_host(x_f, lnpi_flag, valid, fp, nnebr, P)
    core_f = jax.device_get(
        _jits()["phase"](
            lnpi_flag, lab_f, valid, edge_idx, props, pk_f, nl_f,
            max_phases=P, boundary_engine=_s2d.BOUNDARY_SEGMENT_ENGINE,
        )
    )
    for k in core:
        core[k] = _splice(core[k], core_f[k])
    n_labels = _splice(n_labels, nl_f)
    peak_sat = _splice(peak_sat, sat_f)
    for j, s in enumerate(flagged):
        local_maxima[s] = lm_f[j]
    if isinstance(labels_b, np.ndarray):
        labels_b = _splice(labels_b, lab_f)
    else:
        import jax.numpy as jnp

        labels_b = labels_b.at[jnp.asarray(np.asarray(flagged))].set(lab_f)
    return n_labels, peak_sat, labels_b


def pore_state_sweep(
    joint_hist, fh, p_vals, beta_vals, A, nnebr=1, max_peaks=10, mesh=None,
    segment_engine="auto", return_surfaces=True, tie_fallback=False,
):
    """Phase analysis of lnPI(h, N_tot) over S pore state points.

    Parameters
    ----------
    joint_hist : two_dim.joint_hist (made or unmade)
    fh         : F(h) callable (free_energy_profile.*)
    p_vals     : f64[S] total pressures
    beta_vals  : f64[S] inverse temperatures (paired with p_vals)
    A          : cross-sectional area
    nnebr, max_peaks : segmentation knobs (pore_hist.phase_average)
    mesh       : optional jax.sharding.Mesh — shards the state axis S over
                 every mesh device for both device stages (states are
                 embarrassingly parallel; the surface inputs replicate, S
                 is padded to the device count and trimmed on return).
                 With the host engine the watershed stage gathers stage-1
                 surfaces for the data-dependent flood; with the device
                 engine the whole sweep stays sharded on the mesh.
    segment_engine : "auto" | "device" | "host" — "device" runs the
                 whole sweep (surfaces + watershed + phase analysis) as
                 one launch via the fixed-shape steepest-ascent watershed
                 (segment2d.hillclimb_segment); "host" is the
                 reference-exact priority flood (imaging.py).  They agree
                 exactly on tie-free surfaces while the peak slots do not
                 saturate; "auto" = device on TPU, host elsewhere.
    return_surfaces : when False the [S, H, N] ``lnpi``/``labels`` values
                 of the device engine stay as device arrays instead of
                 being fetched to numpy — state sweeps consume the small
                 per-phase outputs only.  When True the device engine
                 downloads just the int8 labels and rebuilds the
                 closed-form lnpi surfaces host-side
                 (_pore_surface_host), so surfaces cost ~2.4 MB instead
                 of 28 MB at S=64.  (The host engine materializes them
                 anyway.)
    tie_fallback : device engine only — when True, states whose surface
                 has an exact elevation tie inside the footprint window
                 (elev_tie, the one regime where the device watershed and
                 the reference flood legally diverge) are transparently
                 re-run through the reference-exact host flood + a stage-2
                 re-launch and spliced over the device results; fail_code
                 4 is then never raised.  When False (default) flagged
                 states keep the device answer and report fail_code 4.

    Returns a dict of slot-padded host arrays (P = max_peaks + 1 slots):
      prop_names   list[K]
      ave          f64[S, P, K]   per-phase probability averages
      fe           f64[S, P]      F.E./kT per phase
      act_kT       f64[S, P, P]   activation free energies
      act_kT_diff  f64[S, P, P]
      n_phases     i64[S]         live watershed phases per state
      phase_ok     bool[S, P]     slot validity
      ridge_ok     bool[S]        no ridgeline effects in any live phase
      fail_code    i32[S]         per-state failure reason (the class
                                  path raises per state, pore_hist.py
                                  "Cannot segment"/"ridgeline effects";
                                  the batched sweep reports instead):
                                  0 ok / 1 ridge-unsafe / 2 no peaks
                                  found (segmentation empty) / 3 peak
                                  slots saturated (more maxima than the
                                  max_peaks+1 padding — raise max_peaks)
                                  / 4 exact elevation tie on the device
                                  engine without tie_fallback (labels may
                                  legally differ from the reference
                                  flood — re-run with tie_fallback=True
                                  or segment_engine="host")
      elev_tie     bool[S]        device engine's per-state tie detector
                                  (informational even when tie_fallback
                                  resolved it; always False on the host
                                  engine, whose flood IS the reference)
      lnpi         f64[S, H, N]   normalized surfaces
      labels       i32[S, H, N]   watershed labels
      local_maxima list[S] of i64[n_phases_s, 2] peak coordinates
    """
    # a made histogram (or from_json load) is used read-only; only an
    # unmade one needs the deepcopy that shields the caller from make()'s
    # in-place assembly
    jh = joint_hist
    if "ln(PI)" not in jh.data:
        jh = copy.deepcopy(joint_hist)
        jh.make()
    hd = jh.data
    assert np.all(hd["op_2"] == np.arange(len(hd["op_2"]))), "Must be 0 <= N <= N_max in a continuous fashion"
    assert np.all(hd["bounds_idx"][:, 0] == 0), "Lower bound for N must start from 0"
    edge_idx = np.array(hd["bounds_idx"][:, 1], dtype=int)

    p_vals = np.asarray(p_vals, dtype=np.float64)
    beta_vals = np.asarray(beta_vals, dtype=np.float64)
    assert p_vals.shape == beta_vals.shape and p_vals.ndim == 1, "p_vals/beta_vals must be matching 1-D state lists"
    S = len(p_vals)

    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        pad = (-S) % n_dev
        if pad:
            # repeat the last state: identical per-state math, trimmed below
            p_vals = np.concatenate([p_vals, np.repeat(p_vals[-1:], pad)])
            beta_vals = np.concatenate([beta_vals, np.repeat(beta_vals[-1:], pad)])

    def _shard_states(*arrays):
        """Place state-batched arrays sharded over the flattened mesh."""
        if mesh is None:
            return arrays
        from jax.sharding import NamedSharding, PartitionSpec as Psp

        import jax
        import jax.numpy as jnp

        out = []
        for a in arrays:
            spec = Psp(mesh.axis_names, *([None] * (np.ndim(a) - 1)))
            out.append(jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec)))
        return tuple(out)

    lnpi_raw = np.asarray(hd["ln(PI)"], dtype=np.float64)
    H, N = lnpi_raw.shape
    h_vals = np.asarray(hd["op_1"], dtype=np.float64)
    fh_vals = np.array([fh(h) for h in h_vals], dtype=np.float64)
    valid = np.asarray(_s2d.valid_mask_2d(edge_idx, N))
    prop_names = list(hd["props"])
    props = np.stack([np.asarray(hd["props"][p], dtype=np.float64) for p in prop_names])

    P = max_peaks + 1  # background slot convention of pore_hist.phase_average
    fp = _footprint(H, N, nnebr)
    engine = _resolve_segment_engine(segment_engine)
    p_dev, beta_dev = _shard_states(p_vals, beta_vals)

    if engine == "device":
        # the whole sweep is ONE launch: surfaces + fixed-shape watershed
        # + per-phase analysis, sharded end-to-end under a mesh
        import jax

        lnpi_dev, seg, core = _jits()["pore_fused"](
            lnpi_raw, h_vals, fh_vals, p_dev, float(A), beta_dev, valid, edge_idx, props,
            fp_shape=tuple(fp.shape), max_phases=P,
            boundary_engine=_s2d.BOUNDARY_SEGMENT_ENGINE,
        )
        # ONE batched transfer for every host-needed output: each
        # separate np.asarray pays the ~26 ms tunnel RPC, and the sweep
        # produces ~12 small arrays — fetched singly they cost more than
        # the whole on-device computation (measured 127 vs 317 st/s)
        fetch = [{k: seg[k] for k in ("n_labels", "peak_sat", "peak_rc", "elev_tie")}, core]
        if return_surfaces:
            # labels ride the wire as int8 (phase slots 0..P <= 127) and
            # lnpi is NOT downloaded at all — the closed-form surface is
            # rebuilt host-side (_pore_surface_host), shrinking the
            # +surfaces fetch ~12x (28 MB -> 2.4 MB at S=64 on the
            # 96x385 bench surface)
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
            lnpi_b = _pore_surface_host(
                lnpi_raw, h_vals, fh_vals, p_vals[:S], float(A), beta_vals[:S], valid
            )
        else:
            lnpi_b, labels_b = lnpi_dev, seg["labels"]
        flagged = np.flatnonzero(elev_tie[:S])
        if tie_fallback and flagged.size:
            # re-run the tie-flagged states through the reference-exact
            # host priority flood (flood insertion order is defined there,
            # pore_hist.pyx:414-423) and splice the results in place;
            # those states are now reference-exact, so fail_code 4 is not
            # raised for them (elev_tie stays True for observability)
            lnpi_flag = _pore_surface_host(
                lnpi_raw, h_vals, fh_vals, p_vals[flagged], float(A), beta_vals[flagged], valid
            )
            n_labels, peak_sat, labels_b = _tie_fallback(
                flagged, lnpi_flag, valid, edge_idx, props, fp, nnebr, P,
                core, n_labels, peak_sat, local_maxima, labels_b,
            )
            tie_unresolved = np.zeros(S, dtype=bool)
        else:
            tie_unresolved = elev_tie[:S]
    else:
        # stage 1: all S surfaces in one launch (sharded over S with a
        # mesh).  lnpi_dev stays on device for stage 2 (no re-upload);
        # the single host download feeds the watershed, with the
        # elevation input x rebuilt in numpy exactly as
        # pore_surface_batch defines it.
        lnpi_dev = _jits()["surface"](lnpi_raw, h_vals, fh_vals, p_dev, float(A), beta_dev, valid)

        # host: data-dependent flood per state (native imaging.cpp);
        # without a mesh the download, floods, and label upload are
        # chunk-pipelined
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

        # stage 2: fused per-phase analysis of all S states in one launch
        # (lnpi_dev is the stage-1 device array — already resident/sharded)
        lnpi_dev, labels_dev, peak_dev, nlab_dev = _shard_states(lnpi_dev, labels_dev, peak_lnpi, n_labels)
        core = _jits()["phase"](
            lnpi_dev, labels_dev, valid, edge_idx, props, peak_dev, nlab_dev,
            max_phases=P, boundary_engine=_s2d.BOUNDARY_SEGMENT_ENGINE,
        )
        # the host flood IS the reference semantics, tie or not: flood
        # insertion order is defined there, so nothing can diverge
        elev_tie = np.zeros(len(p_vals), dtype=bool)
        tie_unresolved = np.zeros(S, dtype=bool)

    if core and not isinstance(next(iter(core.values())), np.ndarray):
        import jax

        core = jax.device_get(core)  # one batched transfer (see device path)
    out = {k: np.asarray(v)[:S] for k, v in core.items()}

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
