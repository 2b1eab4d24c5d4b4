"""Phase segmentation and thermodynamic integration, fixed-shape & masked.

The reference finds local extrema with scipy.signal.argrelextrema plus a
4-branch repair scheme (ntot/gc_hist.pyx:317-415), then walks phases with a
running minima counter to set integration bounds (:498-520).  Both involve
data-dependent list lengths; here phase structure is represented with
``max_phases``-padded index arrays + counts + a validity flag, so the whole
pipeline is one fixed-shape jittable/vmappable computation.

Per-phase moment averaging (the 5-nested loop at gc_hist.pyx:534-541)
becomes a [P,N] x [N,A] matmul — MXU work when batched over state points.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .numerics import logsumexp, normalize_lnpi
from .state import Hist, HistMeta

BIG = jnp.iinfo(jnp.int32).max  # padding sentinel for index arrays


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["maxima", "n_max", "minima", "n_min", "valid"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Extrema:
    """Padded local-extrema structure of a lnPI surface."""

    maxima: jax.Array  # i32[P], padded with BIG
    n_max: jax.Array  # i32[]
    minima: jax.Array  # i32[P+1], padded with BIG
    n_min: jax.Array  # i32[]
    valid: jax.Array  # bool[] — alternation/order checks passed


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["fe", "left", "right", "mask", "mom_avg", "n_phases", "valid"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class PhaseThermo:
    """Per-phase thermodynamics, padded to max_phases.

    fe       : f64[P]   free energy / kT per phase (default pad value 0)
    left     : i32[P]   inclusive left bin of each phase
    right    : i32[P]   exclusive right bin
    mask     : bool[P]  which slots hold real phases
    mom_avg  : f64[P, S, M, S, M, M] probability-averaged moments
    n_phases : i32[]
    valid    : bool[]
    """

    fe: jax.Array
    left: jax.Array
    right: jax.Array
    mask: jax.Array
    mom_avg: jax.Array
    n_phases: jax.Array
    valid: jax.Array


def _compress_indices(flags: jax.Array, size: int) -> tuple[jax.Array, jax.Array]:
    """Indices where flags is True, ascending, padded with BIG.

    Sort-free: ranks from a cumsum + a [size, N] one-hot contraction —
    bitonic sorts under vmap were the dominant segmentation cost on TPU.
    """
    n = flags.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1  # rank of each flagged bin
    slots = jnp.arange(size, dtype=jnp.int32)
    onehot = flags[None, :] & (pos[None, :] == slots[:, None])  # [size, N]
    out = jnp.sum(jnp.where(onehot, idx[None, :], 0), axis=1).astype(jnp.int32)
    count = jnp.sum(flags).astype(jnp.int32)
    out = jnp.where(slots < count, out, BIG)
    return out, count


def _prepend(arr, cnt, val):
    return jnp.concatenate([jnp.array([val], dtype=arr.dtype), arr[:-1]]), cnt + 1


def _append_at(arr, cnt, val):
    slots = jnp.arange(arr.shape[0], dtype=jnp.int32)
    return jnp.where(slots == cnt, val, arr), cnt + 1


def _sel(c, a, b):
    """Select pytrees of same structure on scalar bool c."""
    return jax.tree_util.tree_map(lambda x, y: jnp.where(c, x, y), a, b)


def _take_small(arr, i):
    """arr[i] for a tiny 1-D array and a dynamic scalar index, clip mode.

    One-hot sum instead of jnp.take: batched dynamic-index gathers lower
    to TPU gather ops that dominate vmapped pipelines (see phase_bounds).
    """
    n = arr.shape[0]
    i = jnp.clip(i, 0, n - 1)
    return jnp.sum(jnp.where(jnp.arange(n) == i, arr, 0)).astype(arr.dtype)


def relextrema(lnpi: jax.Array, smooth: int, max_phases: int) -> Extrema:
    """Locate alternating local maxima/minima of lnPI.

    Reproduces argrelextrema(..., order=smooth, mode='clip') semantics plus
    the endpoint-inclusion and over-smoothing repair logic of
    gc_hist.pyx:317-415, as a fixed-shape masked computation.

    The reference's four cases are flattened into straight-line selects
    (under vmap a lax.switch evaluates EVERY branch for EVERY point, so
    branch bodies are always paid — make them shared and cheap):
      * the no-extrema "straight line" case (gc_hist.pyx:382-386) merges
        into the stencil flags as maxima = (lnpi == max), minima =
        (lnpi == min); the reference applies NO endpoint rules in this
        case (ties may sit anywhere, e.g. over-smoothed interior peaks),
        so the both-branch transforms are bypassed for it below;
      * the two over-smoothing repair branches (:352-381) differ only in
        anchor list and extremum sign, so one merged gap scan serves both.
    """
    is_max, is_min = stencil_flags(lnpi, smooth)
    return extrema_from_flags(lnpi, is_max, is_min, max_phases)


def stencil_flags(lnpi: jax.Array, smooth: int) -> tuple[jax.Array, jax.Array]:
    """The strict-compare extremum stencil of relextrema (argrelextrema
    clip-mode semantics) — split out so sharded long-surface drivers can
    compute it with halo exchange (parallel/surface.py)."""
    if smooth < 1:
        raise ValueError("smooth must be >= 1 to find relative extrema (scipy argrelextrema rejects order 0 too)")
    N = lnpi.shape[-1]
    idx = jnp.arange(N, dtype=jnp.int32)
    last = N - 1
    is_max = jnp.ones(N, dtype=bool)
    is_min = jnp.ones(N, dtype=bool)
    for k in range(1, smooth + 1):
        up = lnpi[jnp.clip(idx + k, 0, last)]
        dn = lnpi[jnp.clip(idx - k, 0, last)]
        is_max = is_max & (lnpi > up) & (lnpi > dn)
        is_min = is_min & (lnpi < up) & (lnpi < dn)
    return is_max, is_min


def extrema_from_flags(lnpi: jax.Array, is_max: jax.Array, is_min: jax.Array, max_phases: int) -> Extrema:
    """Endpoint/repair/alternation extraction given precomputed stencil
    flags (the non-stencil 4/5 of relextrema; see relextrema docstring)."""
    N = lnpi.shape[-1]
    P = max_phases
    idx = jnp.arange(N, dtype=jnp.int32)
    last = N - 1

    has_max = jnp.any(is_max)
    has_min = jnp.any(is_min)
    any_ext = has_max | has_min
    # straight-line fallback folded into the flags (gc_hist.pyx:382-386)
    fmax = jnp.where(any_ext, is_max, lnpi == jnp.max(lnpi))
    fmin = jnp.where(any_ext, is_min, lnpi == jnp.min(lnpi))

    maxima0, n_max0 = _compress_indices(fmax, P)
    minima0, n_min0 = _compress_indices(fmin, P + 1)

    max_only = has_max & ~has_min
    min_only = has_min & ~has_max
    none_case = ~any_ext

    # --- both-found endpoint rules (gc_hist.pyx:333-351) ---
    maxima, n_max, minima, n_min = maxima0, n_max0, minima0, n_min0
    validB = jnp.array(True)
    zero_in = (maxima[0] == 0) | (minima[0] == 0)
    pre_min = (~zero_in) & (maxima[0] < minima[0])
    pre_max = (~zero_in) & (maxima[0] > minima[0])
    validB = validB & (zero_in | pre_min | pre_max)
    minima, n_min = _sel(pre_min, _prepend(minima, n_min, 0), (minima, n_min))
    maxima, n_max = _sel(pre_max, _prepend(maxima, n_max, 0), (maxima, n_max))
    last_mx = _take_small(maxima, n_max - 1)
    last_mn = _take_small(minima, n_min - 1)
    last_in = (last_mx == last) | (last_mn == last)
    app_max = (~last_in) & (last_mx < last_mn)
    app_min = (~last_in) & (last_mx > last_mn)
    validB = validB & (last_in | app_max | app_min)
    maxima, n_max = _sel(app_max, _append_at(maxima, n_max, last), (maxima, n_max))
    minima, n_min = _sel(app_min, _append_at(minima, n_min, last), (minima, n_min))

    # --- merged over-smoothing repair (gc_hist.pyx:352-381): endpoints +
    # per-gap arg-extremum of the non-found kind between found anchors ---
    anchor = jnp.where(max_only, jnp.concatenate([maxima0, jnp.array([BIG], jnp.int32)]), minima0)
    n_anchor = jnp.where(max_only, n_max0, n_min0)
    sgn = jnp.where(max_only, lnpi.dtype.type(1.0), lnpi.dtype.type(-1.0))
    inf = jnp.array(jnp.inf, dtype=lnpi.dtype)
    gaps = []
    for g in range(P - 1):
        in_gap = (idx >= anchor[g]) & (idx < anchor[g + 1])
        vals = jnp.where(in_gap, sgn * lnpi, inf)
        gaps.append(jnp.argmin(vals).astype(jnp.int32))  # first occurrence, as np.where(...)[0]
    gaps = jnp.stack(gaps) if gaps else jnp.zeros(0, dtype=jnp.int32)
    slots = jnp.arange(P + 1, dtype=jnp.int32)
    filled = jnp.where(slots == 0, 0, BIG)
    if P - 1 > 0:
        gvals = jnp.take(gaps, jnp.clip(slots - 1, 0, P - 2))  # constant indices: no device gather
        filled = jnp.where((slots >= 1) & (slots <= n_anchor - 1), gvals, filled)
    filled = jnp.where(slots == n_anchor, last, filled)

    # --- select per case (exclusive) ---
    raw_max = max_only | none_case  # cases keeping the compressed maxima as-is
    raw_min = min_only | none_case
    ext = Extrema(
        maxima=jnp.where(min_only, filled[:P], jnp.where(raw_max, maxima0, maxima)),
        n_max=jnp.where(min_only, n_anchor + 1, jnp.where(raw_max, n_max0, n_max)),
        minima=jnp.where(max_only, filled, jnp.where(raw_min, minima0, minima)),
        n_min=jnp.where(max_only, n_anchor + 1, jnp.where(raw_min, n_min0, n_min)),
        valid=jnp.where(max_only | min_only | none_case, True, validB),
    )

    # --- alternation + ordering checks (gc_hist.pyx:402-415) ---
    valid = ext.valid & (jnp.abs(ext.n_max - ext.n_min) <= 1)
    valid = valid & (ext.n_max <= P) & (ext.n_min <= P + 1) & (ext.n_max >= 1)
    # interleaved order must be non-decreasing
    max_first = ext.maxima[0] < ext.minima[0]
    total = ext.n_max + ext.n_min
    slots = jnp.arange(2 * (P + 1), dtype=jnp.int32)
    seq_max = jnp.take(ext.maxima, slots // 2, mode="clip")
    seq_min = jnp.take(ext.minima, slots // 2, mode="clip")
    # even slots from whichever list starts first, odd slots from the other
    seq = jnp.where((slots % 2) == 0, jnp.where(max_first, seq_max, seq_min), jnp.where(max_first, seq_min, seq_max))
    in_use = slots < total
    ok = jnp.all(jnp.where(in_use[:-1] & in_use[1:], seq[1:] >= seq[:-1], True))
    valid = valid & ok

    return Extrema(ext.maxima, ext.n_max, ext.minima, ext.n_min, valid)


def janus_collect_extrema(ext: Extrema, max_phases: int) -> Extrema:
    """Device-side janus collect: merge all peaks but the last into one
    micellar-gas macrophase (collect.py:32-80) as a masked transform.

    Parity with histogram.collect.janus_collect applied between
    segmentation and the phase-bounds walk (gc_hist.pyx:484-486):
      * no-op when n_max <= 2 (collect.py:49-50);
      * new maxima = [round(mean(maxima[:-1])), maxima[-1]] — jnp.round is
        round-half-even exactly like the reference's python round();
      * new minima = optional leading 0, then the boundary minima chosen
        by the reference's last-minimum position cases (collect.py:56-63).
    The reference asserts len(minima) > 1 in the trailing-minimum case;
    here that reads as valid=False instead of AssertionError.
    """
    P = max_phases
    slots = jnp.arange(P, dtype=jnp.int32)
    nm1 = ext.n_max - 1
    msum = jnp.sum(jnp.where(slots < nm1, ext.maxima, 0))
    mean = jnp.round(msum / jnp.maximum(nm1, 1).astype(jnp.float64)).astype(jnp.int32)
    mx_last = _take_small(ext.maxima, nm1)
    new_max = jnp.where(slots == 0, mean, jnp.where(slots == 1, mx_last, BIG)).astype(jnp.int32)

    lead = ext.minima[0] == 0
    last_mn = _take_small(ext.minima, ext.n_min - 1)
    prev_mn = _take_small(ext.minima, ext.n_min - 2)
    mid = (mean < last_mn) & (last_mn < mx_last)
    tail = last_mn > mx_last

    new_min = jnp.full(P + 1, BIG, dtype=jnp.int32)
    cnt = jnp.array(0, jnp.int32)
    new_min, cnt = _sel(lead, _append_at(new_min, cnt, 0), (new_min, cnt))
    new_min, cnt = _sel(mid, _append_at(new_min, cnt, last_mn), (new_min, cnt))
    new_min, cnt = _sel(tail, _append_at(new_min, cnt, prev_mn), (new_min, cnt))
    new_min, cnt = _sel(tail, _append_at(new_min, cnt, last_mn), (new_min, cnt))

    apply = ext.n_max > 2
    valid = ext.valid & (~apply | ~tail | (ext.n_min > 1))
    collected = Extrema(new_max, jnp.array(2, jnp.int32), new_min, cnt, valid)
    return _sel(apply, collected, Extrema(ext.maxima, ext.n_max, ext.minima, ext.n_min, valid))


# static registry for the device pipelines' collect= option; callers may
# register their own masked Extrema -> Extrema transforms (keyed by name so
# the option stays a hashable static jit argument)
COLLECT_TRANSFORMS = {"janus": janus_collect_extrema}


def phase_bounds(ext: Extrema, nbins: int, max_phases: int):
    """Integration bounds per phase via the running minima counter.

    Parity: the min_ctr walk at gc_hist.pyx:498-520, including the
    final-endpoint inclusion rule (right == N-1 -> N).  The walk has a
    closed form: maxima indices are sorted and unique, so only phase 0 can
    have its maximum at bin 0 — the counter is simply p (+1 less the
    max-first offset s).

    Since s is 0 or 1, the minima lookups take(minima, p-s) and
    take(minima, p+1-s) are two static slices selected on s — batched
    dynamic-index gathers lower to TPU gather ops that cost ~60% of the
    whole sweep pipeline (measured: 145ms -> 56ms per 524k-point launch).
    """
    N = nbins
    P = max_phases
    p = jnp.arange(P, dtype=jnp.int32)
    s = ext.maxima[0] == 0  # max-first: no leading minimum consumed
    mn = ext.minima
    left_v = jnp.where(s, jnp.concatenate([mn[:1], mn[: P - 1]]), mn[:P])
    right_v = jnp.where(s, mn[:P], mn[1 : P + 1])
    mx = ext.maxima[:P]
    left = jnp.where(mx > 0, left_v, 0)
    right = jnp.where(mx < N - 1, right_v, N)
    right = jnp.where(right == N - 1, N, right)
    mask = p < ext.n_max
    return left.astype(jnp.int32), right.astype(jnp.int32), mask


def thermo(
    h: Hist,
    meta: HistMeta,
    props: bool = True,
    complete: bool = False,
    dedupe_mom: bool = True,
    collect=None,
) -> tuple[Hist, PhaseThermo]:
    """Normalize, segment, and integrate per-phase thermodynamics.

    Parity: histogram.thermo (gc_hist.pyx:451-554).  Returns the
    (normalized) state and a padded PhaseThermo.

    F.E./kT is computed from per-phase probability sums: with lnPI
    normalized, -ln sum_seg exp(lnPI - lnPI[0]) == lnPI[0] - ln(sum_seg
    prob) — one log per phase instead of a [P,N] masked logsumexp.  (A
    phase whose entire probability mass underflows f64 would read +inf
    here; the reference raises FloatingPointError on the same input,
    np.seterr at gc_hist.pyx:29.)

    dedupe_mom exploits the storage symmetry mom[i,j,k,m,p] ==
    mom[k,m,i,j,p] (always true for simulator-written composites) to
    contract only the ~45 physically unique rows instead of all
    nspec^2*(mo+1)^3.  Set False for hand-built asymmetric tensors.
    """
    lnpi = normalize_lnpi(h.lnpi)
    h = h.replace(lnpi=lnpi)
    pt = thermo_core(lnpi, h.mom, meta, props=props, complete=complete, dedupe_mom=dedupe_mom, collect=collect)
    return h, pt


def _segment_bounds(lnpi, meta: HistMeta, complete: bool, collect=None, seg_f32: bool = False):
    """Segmentation: padded per-phase bounds + masks.

    collect: optional COLLECT_TRANSFORMS key (e.g. "janus") applied to the
    extrema between segmentation and the bounds walk — the device analog
    of the reference's thermo(collect=...) hook (gc_hist.pyx:484-486).
    Ignored for complete=True (the reference never collects there: the
    hook reads the extrema index lists that complete-mode skips).

    seg_f32: opt-in TPU perf knob — run the extrema stencil compares and
    repair logic on an f32 cast of lnpi (f64 compares are emulated op-by-
    op on TPU; ~35 ms of a 2M-point sweep).  Integration bounds are
    indices, so fe/props stay full precision; decisions can flip ONLY for
    neighbor bins within f32 eps (~6e-8 relative) of an exact tie, where
    the reference's own argrelextrema answer is equally arbitrary.  Leave
    False for 1e-12 oracle parity; surfaces with deliberate exact-tie
    plateaus (integer lnpi) compare identically either way only when the
    values are exactly representable in f32."""
    P = meta.max_phases
    N = lnpi.shape[-1]
    if complete:
        lefts = jnp.zeros(P, dtype=jnp.int32)
        rights = jnp.where(jnp.arange(P) == 0, N, 0).astype(jnp.int32)
        mask = jnp.arange(P) == 0
        n_phases = jnp.array(1, dtype=jnp.int32)
        valid = jnp.array(True)
    else:
        ext = relextrema(lnpi.astype(jnp.float32) if seg_f32 else lnpi, meta.smooth, P)
        if collect is not None:
            ext = COLLECT_TRANSFORMS[collect](ext, P)
        lefts, rights, mask = phase_bounds(ext, N, P)
        n_phases = ext.n_max
        valid = ext.valid
    return lefts, rights, mask, n_phases, valid


def _segment_integrate(lnpi, meta: HistMeta, complete: bool, collect=None, seg_f32: bool = False):
    """Shared segmentation + probability integration, PER-PHASE shifted.

    Returns (lefts, rights, mask, n_phases, valid, parts, wsum, fe) where
    parts = (e [N], e_last [P], in_last [P], not_last [N], m_pf [P]) are
    the per-phase-shifted weight pieces the moment contractions reuse,
    and fe the per-phase F.E./kT relative to the first bin
    (gc_hist.pyx:523-526).

    Weights are exp(lnpi - m_p) with m_p each phase's OWN maximum — the
    reference's per-phase shifted logsumexp (spec_exp, gc_hist.pyx:35-53)
    and the Pallas kernel's scheme.  A single global shift (the previous
    form here) silently zeroes phases far below the dominant one: on
    TPU-emulated f64 the underflow horizon is only ~88 log units (f32
    exponent range), and the N=573 production composite measured
    fe=inf/props=0 for the subdominant phase while the numpy class path
    and the kernel agree on the finite answer.  One [N] exp still
    suffices: each bin takes its covering phase's shift (phases overlap
    only at bin N-1 via the right==N-1 -> N endpoint rule, and that bin's
    contribution is added per phase exactly from a [P]-sized exp).
    """
    lefts, rights, mask, n_phases, valid = _segment_bounds(lnpi, meta, complete, collect, seg_f32)
    in_range, e, e_last, in_last, not_last, m_pf, wsum = _phase_weights(lnpi, lefts, rights, mask)

    fe = lnpi[..., 0] - m_pf - jnp.log(jnp.where(wsum > 0, wsum, 1.0))
    fe = jnp.where(mask & (wsum > 0), fe, jnp.where(mask, jnp.inf, 0.0))
    return lefts, rights, mask, n_phases, valid, (e, e_last, in_last, not_last, m_pf), wsum, fe


def _phase_weights(lnpi, lefts, rights, mask):
    """Per-phase-shifted probability weight pieces for one [N] surface.

    Returns (in_range [P,N], e [N], e_last [P], in_last [P],
    not_last [N], m_pf [P], wsum [P]): each bin's weight is
    exp(lnpi - m_p) under its covering phase's own maximum, with the
    shared bin N-1 (the right==N-1 -> N endpoint rule is the only way
    adjacent phases overlap) excluded from e and added per phase exactly
    from a [P]-sized exp."""
    N = lnpi.shape[-1]
    idx = jnp.arange(N, dtype=jnp.int32)
    in_range = (idx[None, :] >= lefts[:, None]) & (idx[None, :] < rights[:, None]) & mask[:, None]  # [P,N]

    neg = jnp.array(-jnp.inf, lnpi.dtype)
    m_p = jnp.max(jnp.where(in_range, lnpi[None, :], neg), axis=-1)  # [P]
    m_pf = jnp.where(jnp.isfinite(m_p), m_p, 0.0)
    # per-bin shift: the covering phase's max; uncovered bins fall back to
    # the global max (exp <= 1 always, they contribute to no sum)
    covered = jnp.sum(in_range.astype(jnp.int32), axis=0) > 0
    sh = jnp.where(covered, jnp.max(jnp.where(in_range, m_pf[:, None], neg), axis=0), jnp.max(lnpi, axis=-1))
    e = jnp.exp(lnpi - sh)  # [N]

    last = N - 1
    not_last = idx != last
    in_last = (lefts <= last) & (last < rights) & mask  # [P]
    e_last = jnp.where(in_last, jnp.exp(lnpi[..., last] - m_pf), 0.0)  # [P]

    w = jnp.where(in_range & not_last[None, :], e[None, :], 0.0)  # [P,N]
    wsum = jnp.sum(w, axis=-1) + e_last  # [P]
    return in_range, e, e_last, in_last, not_last, m_pf, wsum


def thermo_core(
    lnpi: jax.Array,
    mom: jax.Array,
    meta: HistMeta,
    props: bool = True,
    complete: bool = False,
    dedupe_mom: bool = True,
    collect=None,
    seg_f32: bool = False,
) -> PhaseThermo:
    """Segmentation + integration on a (possibly unnormalized) lnPI.

    Separated from the class wrapper so fused sweep pipelines can call it
    per point under vmap; normalization is unnecessary (see
    _segment_integrate for the per-phase shift convention).
    """
    P = meta.max_phases
    N = lnpi.shape[-1]
    lefts, rights, mask, n_phases, valid, parts, wsum, fe = _segment_integrate(lnpi, meta, complete, collect, seg_f32)
    e, e_last, in_last, not_last, m_pf = parts

    if props:
        mom2d = mom.reshape(meta.n_addr, N)  # [A,N]
        if dedupe_mom:
            from .moments import unique_row_map

            uniq, inverse = unique_row_map(meta.nspec, meta.max_order)
            mom_rows = mom2d[jnp.array(uniq)]  # [U,N]
        else:
            mom_rows = mom2d
        # broadcast-multiply-reduce: XLA's f64 dot lowering is ~4x slower
        # than the fused VPU mul+reduce on TPU, so spell it out; multiply
        # e*rows once and reduce under the mask (adds only per phase);
        # bin N-1 enters per phase with that phase's own shift (see
        # _segment_integrate)
        idx2 = jnp.arange(N, dtype=jnp.int32)
        in_range = (idx2[None, :] >= lefts[:, None]) & (idx2[None, :] < rights[:, None]) & mask[:, None]
        pr = e[None, :] * mom_rows  # [U,N]
        sel = in_range & not_last[None, :]
        pm_u = jnp.sum(jnp.where(sel[:, None, :], pr[None, :, :], 0.0), axis=-1)  # [P,U]
        pm_u = pm_u + e_last[:, None] * mom_rows[:, N - 1][None, :]
        if dedupe_mom:
            pm = pm_u[:, jnp.array(inverse)]  # [P,A]
        else:
            pm = pm_u
        pm = pm / jnp.where(wsum > 0, wsum, 1.0)[:, None]
        mom_avg = pm.reshape((P,) + meta.mom_shape(1)[:-1])
    else:
        mom_avg = jnp.zeros((P,) + meta.mom_shape(1)[:-1], dtype=lnpi.dtype)

    return PhaseThermo(
        fe=fe,
        left=lefts,
        right=rights,
        mask=mask,
        mom_avg=mom_avg,
        n_phases=n_phases,
        valid=valid,
    )


def thermo_core_props(
    lnpi: jax.Array,
    mom: jax.Array,
    meta: HistMeta,
    volume,
    complete: bool = False,
    collect=None,
    seg_f32: bool = False,
) -> tuple[PhaseThermo, dict]:
    """Segmentation + phase properties WITHOUT the full mom_avg tensor.

    phase_props only reads the <N_i> and <U> rows (gc_hist.pyx:543-552) —
    nspec+1 of the nspec^2*(mo+1)^3 moment rows.  The batched sweep
    pipelines use this path: contracting the full tensor is ~15x more f64
    multiply-adds, XLA does not DCE unused einsum rows through the
    reshape, and scattering the key rows into a padded mom_avg would
    still materialize a [B,P,A] buffer per sweep.  Returned PhaseThermo
    has mom_avg == 0 (dead, so XLA elides it when the caller drops it).
    """
    N = lnpi.shape[-1]
    mom2d = mom.reshape(meta.n_addr, N)  # [A,N]
    key = mom2d[jnp.array(key_row_addresses(meta), dtype=jnp.int32)]  # [S+1,N]
    return thermo_key_core(lnpi, key, meta, volume, complete=complete, collect=collect, seg_f32=seg_f32)


def key_row_addresses(meta: HistMeta) -> list:
    """Flat mom-row addresses of <N_i> (i,1,0,0,0) per species then <U>
    (0,0,0,0,1) — the rows phase_props reads (gc_hist.pyx:543-552)."""
    S, M1 = meta.nspec, meta.max_order + 1
    return [(i * M1 + 1) * S * M1 * M1 for i in range(S)] + [1]


def thermo_key_core(
    lnpi: jax.Array,
    key: jax.Array,  # [S+1, N] key moment rows (see key_row_addresses)
    meta: HistMeta,
    volume,
    complete: bool = False,
    collect=None,
    seg_f32: bool = False,
    bounds=None,
) -> tuple[PhaseThermo, dict]:
    """thermo_core_props given pre-sliced key rows (callers that carry
    only the key rows through extrapolation — e.g. isopleth grids — avoid
    moving the full [A,N] tensor entirely).

    bounds: optional precomputed (lefts, rights, mask, n_phases, valid)
    from _segment_bounds/phase_bounds — callers that also need the raw
    extrema (e.g. for is_safe) segment once and share."""
    P = meta.max_phases
    N = lnpi.shape[-1]
    S = meta.nspec
    if bounds is None:
        bounds = _segment_bounds(lnpi, meta, complete, collect, seg_f32)
    lefts, rights, mask, n_phases, valid = bounds
    in_range, e, e_last, in_last, not_last, m_pf, _ = _phase_weights(lnpi, lefts, rights, mask)

    # a leading ones row folds the wsum reduction into the same pass;
    # multiply e*key ONCE ([K,N]) and reduce under the mask with adds
    # only — the per-phase multiply ([P,K,N]) costs P times more emulated
    # f64 products for bit-identical sums; bin N-1 enters per phase with
    # that phase's own shift (see _phase_weights)
    key1 = jnp.concatenate([jnp.ones((1, N), lnpi.dtype), key])  # [S+2,N]
    pk = e[None, :] * key1  # [S+2,N]
    sel = in_range & not_last[None, :]
    pm0 = jnp.sum(jnp.where(sel[:, None, :], pk[None, :, :], 0.0), axis=-1)  # [P,S+2]
    pm0 = pm0 + e_last[:, None] * key1[:, N - 1][None, :]
    wsum = pm0[:, 0]

    fe = lnpi[..., 0] - m_pf - jnp.log(jnp.where(wsum > 0, wsum, 1.0))
    fe = jnp.where(mask & (wsum > 0), fe, jnp.where(mask, jnp.inf, 0.0))

    pm = pm0[:, 1:] / jnp.where(wsum > 0, wsum, 1.0)[:, None]
    n_i = pm[:, :S]  # [P,S]
    u = pm[:, S]  # [P]
    ntot = jnp.sum(n_i, axis=-1)
    x_i = n_i / jnp.where(ntot != 0, ntot, 1.0)[:, None]
    props = {"n_i": n_i, "ntot": ntot, "density": ntot / volume, "u": u, "x_i": x_i}

    pt = PhaseThermo(
        fe=fe,
        left=lefts,
        right=rights,
        mask=mask,
        mom_avg=jnp.zeros((P,) + meta.mom_shape(1)[:-1], dtype=lnpi.dtype),
        n_phases=n_phases,
        valid=valid,
    )
    return pt, props


def thermo_props(h: Hist, meta: HistMeta, complete: bool = False, collect=None) -> tuple[Hist, PhaseThermo, dict]:
    """normalize + thermo_core_props convenience wrapper."""
    lnpi = normalize_lnpi(h.lnpi)
    h = h.replace(lnpi=lnpi)
    pt, props = thermo_core_props(lnpi, h.mom, meta, h.volume, complete=complete, collect=collect)
    return h, pt, props


def phase_props(pt: PhaseThermo, volume) -> dict:
    """Extensive per-phase properties from averaged moments.

    Parity: gc_hist.pyx:543-552 (n_i, ntot, density, u, x_i).
    Returns dict of padded [P(,S)] arrays.
    """
    n_i = pt.mom_avg[:, :, 1, 0, 0, 0]  # [P,S]
    ntot = jnp.sum(n_i, axis=-1)
    u = pt.mom_avg[:, 0, 0, 0, 0, 1]
    safe = jnp.where(ntot != 0, ntot, 1.0)
    x_i = n_i / safe[:, None]
    return {
        "n_i": n_i,
        "ntot": ntot,
        "density": ntot / volume,
        "u": u,
        "x_i": x_i,
    }


def is_safe(h: Hist, meta: HistMeta, cutoff: float = 10.0, complete: bool = False):
    """Edge-effect guard (gc_hist.pyx:556-596)."""
    lnpi = h.lnpi
    if complete:
        return (jnp.max(lnpi, axis=-1) - lnpi[..., -1]) >= cutoff
    ext = relextrema(normalize_lnpi(lnpi), meta.smooth, meta.max_phases)
    last_max = _take_small(ext.maxima, ext.n_max - 1)
    return (_take_small(lnpi, last_max) - lnpi[..., -1]) >= cutoff
