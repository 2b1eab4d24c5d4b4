"""Device 2-D (h, N_tot) pore-surface engine.

Masked fixed-shape device forms of the slit-pore histogram operations
(reference: /root/reference/moments/histogram/two_dim/h_ntot/
pore_hist.pyx) so the whole per-state pipeline — row-shift surface
build, ragged-region normalization, per-watershed-phase probability
averages, free energies, ridge diagnostics, and transition-state
boundary integrals — runs as ONE jittable body, vmappable over a batch
of pore state points (p, beta).

Division of labor (SURVEY §7 stage 8): everything numeric lives here as
pure jnp functions over padded [H, N] surfaces + masks; the only host
steps are watershed seeding/labeling (two_dim/imaging.py, data-dependent
flood order) and the tiny line profiles.  Labels enter as a dense
int array — per-phase quantities are [P]-slot masked contractions, the
2-D analog of core/segment.py's 1-D scheme.

All surfaces follow the TPU log-domain rule (CLAUDE.md): every
exponential is max-shifted so intermediates stay <= 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "valid_mask_2d",
    "build_pore_lnpi",
    "normalize_2d",
    "ln_f_2d",
    "region_thermo_2d",
    "boundary_pair_integrals",
    "pore_phase_core",
    "hillclimb_segment",
    "hillclimb_segment_batch",
    "pore_sweep_fused",
    "joint_sweep_fused",
]

_BIGNEG = -1.7976931348623157e308  # -sys.float_info.max (pore_hist.pyx:40)

# boundary_pair_integrals reduction engine: "segment" (jax.ops.segment_*,
# scatter lowering) or "onehot" (scatter/gather-free masked reductions —
# same shifted terms, so equal up to summation order; tests pin 1e-12).
# On-chip A/B 2026-08-18 (tools/boundary_ab.py, 96x385 pore sweep, S=64):
# onehot 18.4 st/s vs segment 8.3 st/s — stage 2 was scatter-bound, so
# onehot is the default.  "segment" stays as the cross-check arm.
BOUNDARY_SEGMENT_ENGINE = "onehot"


def _masked_max(x, mask):
    return jnp.max(jnp.where(mask, x, -jnp.inf))


def _masked_logsumexp(x, mask):
    """logsumexp over ``mask`` cells; -inf entries inside the mask are
    legal (exp underflows to exactly 0, matching the host concatenation
    in pore_hist.normalize / _cy_normalize pore_hist.pyx:57-80)."""
    m = _masked_max(x, mask)
    s = jnp.sum(jnp.where(mask, jnp.exp(x - m), 0.0))
    return m + jnp.log(s)


def valid_mask_2d(edge_idx, n_cols: int):
    """bool[H, N] marking the ragged valid region col <= edge_idx[row]
    (the normalization domain of _cy_normalize, pore_hist.pyx:57-80)."""
    cols = jnp.arange(n_cols)
    return cols[None, :] <= jnp.asarray(edge_idx)[:, None]


def build_pore_lnpi(lnpi_raw, h_vals, fh_vals, p, A, beta):
    """Row-shifted lnPI(h, N) surface (pore_hist.pyx:131-135).

    shift[h] = -beta * (F(h) + p*A*h) - lnPI_raw[h, 0]; F(h) enters as a
    precomputed vector (the reference's Python callable is host-only).
    p and beta are scalars — vmap over them for a state-point batch.
    """
    lnpi_raw = jnp.asarray(lnpi_raw)
    shift = -beta * (jnp.asarray(fh_vals) + p * A * jnp.asarray(h_vals)) - lnpi_raw[:, 0]
    return lnpi_raw + shift[:, None]


def normalize_2d(lnpi, valid):
    """Masked 2-D normalization over the ragged valid region
    (pore_hist.pyx:57-80, 146-152).  Single-device form of
    parallel.surface.sharded_normalize_2d."""
    return lnpi - _masked_logsumexp(lnpi, valid)


def ln_f_2d(lnpi):
    """ln of the empty-pore partition slice, logsumexp over lnPI(h, 0)
    (pore_hist.pyx:205: ln_f from the N=0 column)."""
    return _masked_logsumexp(lnpi[:, 0], jnp.ones(lnpi.shape[0], dtype=bool))


def region_thermo_2d(lnpi, region, props):
    """Probability-averaged properties over one masked region
    (pore_hist.thermo, pore_hist.pyx:154-184).

    props: f64[K, H, N] stacked property surfaces.  Returns
    (ave[K], lp[H, N]) where lp is the region-renormalized log
    distribution (-inf outside) the host API derives peak_idx from.
    """
    lnpi = jnp.asarray(lnpi)
    m = _masked_max(lnpi, region)
    lse = _masked_logsumexp(lnpi - m, region)
    lp = jnp.where(region, lnpi - m - lse, -jnp.inf)
    prob = jnp.where(region, jnp.exp(lp), 0.0)
    sum_prob = jnp.sum(prob)
    ave = jnp.sum(prob[None, :, :] * jnp.asarray(props), axis=(1, 2)) / sum_prob
    return ave, lp


def _boundary_mask(labels, background=0):
    """Inner-mode connectivity-1 boundary pixels (imaging.find_boundaries
    as used at pore_hist.pyx:430): a non-background pixel adjacent
    (4-connectivity, edge-padded) to ANY differing label."""
    lab = jnp.asarray(labels)
    out = jnp.zeros(lab.shape, dtype=bool)
    for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        shifted = jnp.roll(lab, (-di, -dj), axis=(0, 1))
        # edge-pad semantics: rolled-in wrap cells must compare equal
        H, N = lab.shape
        rows = jnp.arange(H)[:, None]
        cols = jnp.arange(N)[None, :]
        inb = (rows + di >= 0) & (rows + di < H) & (cols + dj >= 0) & (cols + dj < N)
        out = out | (inb & (lab != shifted))
    return out & (lab != background)


_NEBR8 = ((1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1), (0, 1))


def boundary_pair_integrals(lnpi, labels, max_labels: int, engine: str | None = None):
    """Transition-state boundary integrals between watershed phases
    (pore_hist._segment, pore_hist.pyx:425-445).

    For every ordered pair (p -> q) where p is an inner boundary pixel
    with label a > 0 and q one of its 8 in-bounds neighbors with label
    b > 0, b != a, the contribution is
        v = logaddexp(lnPI[p] - ln 2, lnPI[q] - ln 2).
    The host loop's symmetric running update
        min_df[a,b] = logaddexp(min_df[a,b], v); min_df[b,a] = min_df[a,b]
    makes the final entry the logsumexp over contributions in EITHER
    direction, and max_val the max over either direction — computed here
    as a per-unordered-pair segment reduction (one launch, no host loop).

    Returns (min_df, max_val): f64[(L+1), (L+1)] with _BIGNEG at pairs
    with no shared boundary (the reference's -sys.float_info.max fill).

    ``engine`` selects the reduction (None = BOUNDARY_SEGMENT_ENGINE);
    it is read at TRACE time, so jitted callers must make it a static
    argument — flipping the module flag alone cannot retrace a cached
    jit (tools/boundary_ab.py measured the two arms in subprocesses for
    exactly this reason before the flag was threaded through).
    """
    if engine is None:
        engine = BOUNDARY_SEGMENT_ENGINE
    lnpi = jnp.asarray(lnpi)
    lab = jnp.asarray(labels)
    H, N = lab.shape
    L1 = max_labels + 1
    bnd = _boundary_mask(lab)
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(N)[None, :]

    keys2d = []
    lps = []
    lqs = []
    ln2 = jnp.log(2.0)
    for di, dj in _NEBR8:
        q_lab = jnp.roll(lab, (-di, -dj), axis=(0, 1))
        q_lnpi = jnp.roll(lnpi, (-di, -dj), axis=(0, 1))
        inb = (rows + di >= 0) & (rows + di < H) & (cols + dj >= 0) & (cols + dj < N)
        ok = bnd & inb & (q_lab > 0) & (lab > 0) & (q_lab != lab)
        a = jnp.minimum(lab, q_lab)
        b = jnp.maximum(lab, q_lab)
        keys2d.append(jnp.where(ok, a * L1 + b, 0))  # 0 = dead (a live pair has a >= 1)
        lps.append(lnpi)
        lqs.append(q_lnpi)

    KEY = jnp.stack(keys2d)  # [8, H, N] i-pair keys, 0 where not a boundary pair
    LP = jnp.stack(lps)
    LQ = jnp.stack(lqs)

    if engine == "onehot":
        # scatter/gather-free per-pair logsumexp in the LINEAR domain.
        # exp(logaddexp(a, b) - ln2 - M) == (exp(a - M) + exp(b - M)) / 2
        # exactly, so accumulating pair sums/maxima of that shared-shift
        # quantity needs only 2 exps per direction-cell and TWO logs per
        # pair — the previous formulation paid a per-cell emulated-f64
        # logaddexp (2 exps + 1 log each) plus a [(L1^2+1), 8HN] one-hot;
        # the per-pair shift M (max over max(a, b)) keeps every
        # intermediate <= 1 at the pair's own saddle, so nothing
        # underflows where it matters (TPU exponent-range rule).
        pairs = [(pa, pb) for pa in range(1, L1) for pb in range(pa + 1, L1)]
        mx_cell = jnp.maximum(LP, LQ)
        neg = jnp.array(-jnp.inf, LP.dtype)
        Ms = [jnp.max(jnp.where(KEY == pa * L1 + pb, mx_cell, neg)) for pa, pb in pairs]
        m_elem = jnp.zeros_like(LP)
        for (pa, pb), M in zip(pairs, Ms):
            m_elem = m_elem + jnp.where(KEY == pa * L1 + pb, jnp.where(jnp.isfinite(M), M, 0.0), 0.0)
        E = 0.5 * (jnp.exp(LP - m_elem) + jnp.exp(LQ - m_elem))
        min_df = jnp.full((L1, L1), _BIGNEG)
        max_val = jnp.full((L1, L1), _BIGNEG)
        for (pa, pb), M in zip(pairs, Ms):
            mk = KEY == pa * L1 + pb
            Mf = jnp.where(jnp.isfinite(M), M, 0.0)
            S = jnp.sum(jnp.where(mk, E, 0.0))
            X = jnp.max(jnp.where(mk, E, 0.0))
            lse = jnp.where(S > 0.0, Mf + jnp.log(S), _BIGNEG)
            mxv = jnp.where(X > 0.0, Mf + jnp.log(X), _BIGNEG)
            min_df = min_df.at[pa, pb].set(lse)
            max_val = max_val.at[pa, pb].set(mxv)
    else:
        keys = jnp.where(KEY > 0, KEY, L1 * L1).ravel()  # overflow slot for invalid
        vals = jnp.where(KEY > 0, jnp.logaddexp(LP - ln2, LQ - ln2), -jnp.inf).ravel()
        valid = (KEY > 0).ravel()
        nseg = L1 * L1 + 1
        # two-pass segment logsumexp: max-shift per pair, then sum of exp
        seg_max = jax.ops.segment_max(vals, keys, num_segments=nseg)
        seg_max_f = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        shifted = jnp.where(valid, jnp.exp(vals - seg_max_f[keys]), 0.0)
        seg_sum = jax.ops.segment_sum(shifted, keys, num_segments=nseg)
        lse = jnp.where(seg_sum > 0.0, seg_max_f + jnp.log(seg_sum), _BIGNEG)
        mx = jnp.where(jnp.isfinite(seg_max), seg_max, _BIGNEG)
        min_df = lse[: L1 * L1].reshape(L1, L1)
        max_val = mx[: L1 * L1].reshape(L1, L1)

    # symmetrize (each unordered pair was accumulated into the canonical
    # (min, max) slot only)
    upper = jnp.triu(jnp.ones((L1, L1), dtype=bool), 1)
    min_df = jnp.where(upper, min_df, min_df.T)
    max_val = jnp.where(upper, max_val, max_val.T)
    diag = jnp.eye(L1, dtype=bool)
    min_df = jnp.where(diag, _BIGNEG, min_df)
    max_val = jnp.where(diag, _BIGNEG, max_val)
    return min_df, max_val


def _edge_value(x, edge_onehot, fill):
    """x[h, edge_idx[h]] per row without a gather: masked-max over the
    one-hot edge column (segment._take_small discipline — batched
    dynamic-index takes lower to TPU gathers that dominate pipelines)."""
    return jnp.max(jnp.where(edge_onehot, x, fill), axis=1)


def pore_phase_core(
    lnpi,
    labels,
    valid,
    edge_idx,
    props,
    peak_lnpi,
    n_labels,
    max_phases: int,
    boundary_engine: str | None = None,
):
    """Fused per-phase analysis of one normalized pore surface
    (pore_hist.phase_average, pore_hist.pyx:186-252) — one jittable
    body over [P]-slot masked contractions; vmap for state batches.

    Inputs
    ------
    lnpi      : f64[H, N]   normalized row-shifted surface
    labels    : i32[H, N]   watershed phase labels (0 = background)
    valid     : bool[H, N]  ragged valid region (valid_mask_2d)
    edge_idx  : i32[H]      per-row ragged edge column
    props     : f64[K, H, N] stacked property surfaces
    peak_lnpi : f64[P]      lnPI at each phase's local maximum (host
                            watershed seed values), slot-padded
    n_labels  : i32[]       number of live watershed phases
    max_phases: static P    slot count

    Returns a dict of slot-padded arrays:
      ave        f64[P, K]  probability-averaged properties per phase
      fe         f64[P]     F.E./kT = ln_f - lse(lnPI | phase)
      ridge_diff f64[P]     max(lnPI|phase) - max(ridge values|phase)
                            (< 10 means ridgeline effects, pyx:230-234)
      peak_flat  i32[P]     flat argmax of the phase region
      act_kT     f64[P, P]  activation free energies (pyx:213-227)
      act_kT_diff f64[P, P]
      ts         f64[(P+1),(P+1)] transition states in -kT units
      phase_ok   bool[P]    slot is a live phase
    """
    lnpi = jnp.asarray(lnpi)
    lab = jnp.asarray(labels)
    P = max_phases
    slots = jnp.arange(1, P + 1)
    region = lab[None, :, :] == slots[:, None, None]  # [P, H, N]
    phase_ok = slots <= n_labels

    lnf = ln_f_2d(lnpi)

    # per-phase masked probability averages (thermo over each label mask).
    # Cells partition over phases, so ONE exp per cell suffices: select
    # each cell's own phase shift (label-indexed one-hot, gather-free) and
    # exponentiate once — bitwise identical to exp(lnpi - m_f[p]) inside
    # region p, at 1/P the emulated-f64 exp cost (the dominant VPU cost).
    m = jnp.max(jnp.where(region, lnpi[None], -jnp.inf), axis=(1, 2))  # [P]
    m_f = jnp.where(jnp.isfinite(m), m, 0.0)
    m_cell = jnp.sum(jnp.where(region, m_f[:, None, None], 0.0), axis=0)  # [H, N]
    z = jnp.where(region, jnp.exp(lnpi - m_cell)[None], 0.0)  # [P, H, N]
    s = jnp.sum(z, axis=(1, 2))  # [P]
    prob = z / jnp.where(s > 0, s, 1.0)[:, None, None]
    sum_prob = jnp.sum(prob, axis=(1, 2))
    ave = jnp.einsum("phn,khn->pk", prob, jnp.asarray(props)) / jnp.where(sum_prob > 0, sum_prob, 1.0)[:, None]

    # F.E./kT per phase (pyx:212: ln_f - lse over the phase mask)
    fe = lnf - (m_f + jnp.log(jnp.where(s > 0, s, 1.0)))
    fe = jnp.where(phase_ok, fe, 0.0)

    # ridgeline diagnostic (intended form of pyx:230-234): per-phase max
    # minus the max lnPI along the ragged edge cells owned by the phase
    edge_onehot = jnp.arange(lnpi.shape[1])[None, :] == jnp.asarray(edge_idx)[:, None]  # [H, N]
    edge_lnpi = _edge_value(lnpi, edge_onehot, -jnp.inf)  # [H]
    edge_lab = jnp.max(jnp.where(edge_onehot, lab, -1), axis=1)  # [H]
    ridge = jnp.where(edge_lab[None, :] == slots[:, None], edge_lnpi[None, :], -jnp.inf)  # [P, H]
    ridge_max = jnp.max(ridge, axis=1)
    ridge_diff = m - ridge_max  # inf when the phase never touches the edge

    peak_flat = jnp.argmax(jnp.where(region, lnpi[None], -jnp.inf).reshape(P, -1), axis=1)

    # transition states (pyx:205-210): ts live entries -> -(ts - ln_f)
    min_df, max_border = boundary_pair_integrals(lnpi, lab, P, engine=boundary_engine)
    live = min_df > _BIGNEG
    ts = jnp.where(live, -(min_df - lnf), min_df)

    # activation matrices (pyx:213-227), phase slots 0..P-1 <-> labels 1..P
    live_pp = live[1:, 1:]  # [P, P]
    fe_pair_max = jnp.maximum(fe[:, None], fe[None, :])
    act_kT = jnp.where(live_pp, ts[1:, 1:] - fe_pair_max, 0.0)
    peak_pair_min = jnp.minimum(peak_lnpi[:, None], peak_lnpi[None, :])
    act_kT_diff = jnp.where(live_pp, peak_pair_min - max_border[1:, 1:], 0.0)
    pair_ok = phase_ok[:, None] & phase_ok[None, :]
    act_kT = jnp.where(pair_ok, act_kT, 0.0)
    act_kT_diff = jnp.where(pair_ok, act_kT_diff, 0.0)

    return {
        "ave": ave,
        "fe": fe,
        "ridge_diff": ridge_diff,
        "peak_flat": peak_flat,
        "act_kT": act_kT,
        "act_kT_diff": act_kT_diff,
        "ts": ts,
        "phase_ok": phase_ok,
    }


# ---------------------------------------------------------------------------
# Device watershed: fixed-shape steepest-ascent segmentation
# ---------------------------------------------------------------------------
#
# The reference (and our host arm) segments each surface with a
# priority-flood watershed seeded at the footprint local maxima
# (pore_hist.pyx:377-477; two_dim/imaging.py + native/imaging.cpp).  The
# flood is data-dependent, but its RESULT is not: when every elevation is
# distinct and the markers are exactly the footprint-local maxima — which
# is the pore/joint pipelines' own seeding rule — the flood provably
# assigns each cell the label of its steepest-ascent chain.  Sketch: pops
# leave the heap in decreasing elevation among pushed cells, and a cell's
# highest neighbor is always pushed (via its own ascending chain, whose
# pops all sit above this cell's elevation) before any lower neighbor can
# pop, so every cell is claimed by its argmax neighbor; induction up the
# chain reaches the marker.  That steepest-ascent form IS a fixed-shape
# XLA program: a masked footprint argmax per cell + O(log HN) rounds of
# pointer jumping.  Exact ties (plateaus) are resolved by flood insertion
# order on the host and by lowest-flat-index here, so plateau boundaries
# may differ; the host flood stays available as the cross-check arm
# (segment_engine="host"), mirroring BOUNDARY_SEGMENT_ENGINE.


def hillclimb_segment(lnpi, valid, fp_shape, max_peaks_slots: int):
    """Watershed labels of one surface as a fixed-shape device program.

    Equivalent to the host pipeline's peak_local_max + priority-flood
    pair (imaging.py; pore_hist.pyx:414-423) for surfaces without exact
    elevation ties: peaks are cells >= every in-bounds neighbor (the
    maximum_filter equality test), ranked by decreasing lnPI with
    row-major tie order (peak_local_max's stable sort), and every valid
    cell takes the label of the peak its steepest-ascent chain reaches.

    The footprint is always a full rectangle (_footprint scales np.ones),
    so the neighborhood (value, flat-index) argmax is SEPARABLE: one
    column pass then one row pass — O(fy + fx) shifted compares instead
    of O(fy * fx) (extreme surface aspect ratios produce 300+-offset
    footprints whose unrolled scan stalled XLA compilation for minutes).
    Lexicographic (value desc, flat asc) composition is exact: the row
    pass keeps the lowest-flat max of each column window, the column
    pass compares those winners on the same global key.

    Parameters
    ----------
    lnpi     : f64[H, N] surface (shift-invariant; used directly as the
               flood elevation — the host's ``x = lnpi - min`` offset
               cancels in every comparison)
    valid    : bool[H, N]
    fp_shape : static (fy, fx) — the rectangular footprint's shape, as
               built by pore_pipeline._footprint (both odd)
    max_peaks_slots : static P — label slots (pore max_peaks + 1)

    Returns dict:
      labels    i32[H, N]  0 = background / draining to a trimmed peak
      n_labels  i32[]      live labels, min(found peaks, P)
      peak_lnpi f64[P]     lnPI at each ranked peak (0 pad)
      peak_sat  bool[]     more maxima found than P slots
      peak_rc   i32[P, 2]  ranked peak (row, col); (-1, -1) pad
      elev_tie  bool[]     some valid finite cell has an EXACTLY-equal
                           elevation neighbor inside its footprint window
                           — the one regime where this engine and the
                           host priority flood legally diverge (flood
                           insertion order vs lowest-flat-index; see the
                           module note above and pore_hist.pyx:414-423).
                           Pipelines surface it as fail_code 4 and can
                           auto-fallback to the host flood
                           (tie_fallback=True).
    """
    lnpi = jnp.asarray(lnpi)
    H, N = lnpi.shape
    HN = H * N
    P = max_peaks_slots
    ry, rx = (int(fp_shape[0]) - 1) // 2, (int(fp_shape[1]) - 1) // 2
    neg = jnp.array(-jnp.inf, lnpi.dtype)
    e = jnp.where(valid, lnpi, neg)

    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(N)[None, :]
    flat = (rows * N + cols).astype(jnp.int32)

    # --- exact-elevation-tie detector (divergence guard) ---
    # Equality is symmetric, so each unordered pair is checked once via
    # the half footprint {(0, +dj)} U {(+di, any dj)} — rx + ry*(2rx+1)
    # rolled compares, cheap VPU work next to the argmax pass.  -inf==-inf
    # between never-visited cells inside the valid mask is excluded
    # (fin): the flood elevation is undefined there anyway (x = lnpi-min
    # is NaN when min is -inf).  For extreme-aspect footprints past the
    # unroll budget, a sorted-adjacent duplicate scan over ALL valid
    # finite cells is a strict SUPERSET of the footprint check —
    # conservative (may flag non-interacting far-apart duplicates), never
    # silent.
    fin = valid & jnp.isfinite(lnpi)
    if (2 * ry + 1) * (2 * rx + 1) <= 441:
        elev_tie = jnp.bool_(False)
        half = [(0, dj) for dj in range(1, rx + 1)] + [
            (di, dj) for di in range(1, ry + 1) for dj in range(-rx, rx + 1)
        ]
        for di, dj in half:
            nv = jnp.roll(e, (-di, -dj), (0, 1))
            nf = jnp.roll(fin, (-di, -dj), (0, 1))
            inb = (rows + di < H) & (cols + dj >= 0) & (cols + dj < N)  # di >= 0
            elev_tie = elev_tie | jnp.any(fin & nf & inb & (e == nv))
    else:
        v = jnp.sort(jnp.where(fin, lnpi, jnp.inf).ravel())
        elev_tie = jnp.any((v[1:] == v[:-1]) & jnp.isfinite(v[1:]))

    def _fold(best_v, best_i, nv, ni):
        take = (nv > best_v) | ((nv == best_v) & (ni < best_i) & (nv > neg))
        return jnp.where(take, nv, best_v), jnp.where(take, ni, best_i)

    # column pass: window max (incl. center) along axis 1
    bv, bi = e, flat
    for dj in range(1, rx + 1):
        for sdj in (dj, -dj):
            nv = jnp.roll(e, -sdj, axis=1)
            inb = (cols + sdj >= 0) & (cols + sdj < N)
            nv = jnp.where(inb, nv, neg)
            bv, bi = _fold(bv, bi, nv, flat + jnp.int32(sdj))

    # row pass over the column-pass winners
    best_v, best_i = bv, bi
    for di in range(1, ry + 1):
        for sdi in (di, -di):
            nv = jnp.roll(bv, -sdi, axis=0)
            ni = jnp.roll(bi, -sdi, axis=0)
            inb = jnp.broadcast_to((rows + sdi >= 0) & (rows + sdi < H), (H, N))
            nv = jnp.where(inb, nv, neg)
            ni = jnp.where(inb, ni, jnp.int32(0))
            best_v, best_i = _fold(best_v, best_i, nv, ni)

    # peak rule == maximum_filter equality test: cell >= all neighbors.
    # best includes the center, so value equality IS the >=-all-neighbors
    # test (invalid cells read -inf exactly like the host's 0-background
    # under the shared shift; see imaging.peak_local_max).
    is_peak = (e == best_v) & valid
    parent = jnp.where(is_peak, flat, best_i).ravel()

    # rank peaks by (lnPI desc, flat asc) — P rounds of masked argmax
    # reproduce peak_local_max's stable intensity sort + num_peaks slice
    min_valid = jnp.min(jnp.where(valid, lnpi, jnp.inf))
    score = jnp.where(is_peak & (e > min_valid), e, neg).ravel()
    n_found = jnp.sum(score > neg, dtype=jnp.int32)
    ids = jnp.arange(HN, dtype=jnp.int32)
    peak_idx = []
    peak_val = []
    for _ in range(P):
        k = jnp.argmax(score).astype(jnp.int32)
        v = jnp.max(score)
        live = v > neg
        peak_idx.append(jnp.where(live, k, jnp.int32(HN)))
        peak_val.append(jnp.where(live, v, 0.0))
        score = jnp.where(ids == k, neg, score)
    peak_idx = jnp.stack(peak_idx)  # [P], HN = dead slot
    peak_lnpi = jnp.stack(peak_val)

    # marker labels 1..n at the ranked peak cells (one-hot, gather-free)
    marker = jnp.zeros(HN, dtype=jnp.int32)
    for i in range(P):
        marker = jnp.where(ids == peak_idx[i], jnp.int32(i + 1), marker)

    # label propagation down the steepest-ascent chains.  The parent is
    # always inside the footprint rectangle, so one pointer application
    # is a K-way SELECT over rolled copies — pure VPU work.  A
    # ceil(log2(HN)) pointer-jumping formulation is fewer iterations but
    # each is a [HN]-wide dynamic gather, which serializes per element
    # on TPU (PERFORMANCE.md rule 1; measured ~430 ms of a 1.1 s fused
    # 64-state sweep); chain-length select iterations in a while_loop
    # are ~10x cheaper on real surfaces (longest chain ~ grid diameter
    # in footprint steps, a few hundred).
    if (2 * ry + 1) * (2 * rx + 1) <= 40:
        parent2d = parent.reshape(H, N)
        pdi = parent2d // N - rows
        pdj = parent2d % N - cols
        dirs = [
            (sdi, sdj, (pdi == sdi) & (pdj == sdj))
            for sdi in range(-ry, ry + 1)
            for sdj in range(-rx, rx + 1)
            if not (sdi == 0 and sdj == 0)
        ]  # loop-invariant masks, hoisted out of the while_loop by jit

        def _prop_cond(state):
            _, changed, it = state
            return changed & (it < HN)

        def _prop_body(state):
            lab, _, it = state
            new = lab
            for sdi, sdj, mk in dirs:
                new = jnp.where(mk, jnp.roll(lab, (-sdi, -sdj), (0, 1)), new)
            return new, jnp.any(new != lab), it + 1

        labels, _, _ = jax.lax.while_loop(
            _prop_cond, _prop_body, (marker.reshape(H, N), jnp.bool_(True), jnp.int32(0))
        )
    else:
        # very wide footprints (extreme aspect ratios): the K-way select
        # body gets large, so resolve chains by pointer jumping instead —
        # ceil(log2(HN)) batched-gather doublings
        jumps = max(1, int(np.ceil(np.log2(max(2, HN)))))
        for _ in range(jumps):
            parent = jnp.take(parent, parent)
        labels = jnp.take(marker, parent).reshape(H, N)
    labels = jnp.where(valid, labels, 0)

    return {
        "labels": labels,
        "n_labels": jnp.minimum(n_found, P),
        "peak_lnpi": peak_lnpi,
        "peak_sat": n_found > P,
        "peak_rc": jnp.where(
            (peak_idx < HN)[:, None],
            jnp.stack([peak_idx // N, peak_idx % N], axis=1),
            -1,
        ).astype(jnp.int32),
        "elev_tie": elev_tie,
    }


def hillclimb_segment_batch(lnpi_b, valid, fp_shape, max_peaks_slots: int):
    """vmap of hillclimb_segment over a state batch [S, H, N]."""

    def one(lnpi):
        return hillclimb_segment(lnpi, valid, fp_shape, max_peaks_slots)

    return jax.vmap(one)(jnp.asarray(lnpi_b))


def pore_surface_batch(lnpi_raw, h_vals, fh_vals, p_batch, A, beta_batch, valid):
    """Stage-1 device batch: build + normalize S pore surfaces in one
    launch (vmap of build_pore_lnpi/normalize_2d over (p, beta)).

    Also returns the watershed elevation input x = lnpi - min(lnpi|valid)
    with background exactly 0 (intended form of pore_hist.pyx:412-413),
    so the host flood consumes device output directly.
    """

    def one(p, beta):
        ln = build_pore_lnpi(lnpi_raw, h_vals, fh_vals, p, A, beta)
        ln = normalize_2d(ln, valid)
        mn = jnp.min(jnp.where(valid, ln, jnp.inf))
        x = jnp.where(valid, ln - mn, 0.0)
        return ln, x

    return jax.vmap(one)(jnp.asarray(p_batch), jnp.asarray(beta_batch))


def joint_surface_batch(lnpi_raw, op1_vals, op2_vals, beta, dmu1_batch, dmu2_batch, valid):
    """Stage-1 device batch for the joint (N_1, N_tot) GC surface: reweight
    + masked-normalize S surfaces in one launch.

    NEW capability beyond the reference (joint_hist.pyx:22-301 is
    assembly+JSON only): the 2-D analog of the 1-D reweight rule
    (gc_hist.pyx:377-406) for a binary system stored as lnPI(N_1, N_tot):

        lnPI'(i, j) = lnPI(i, j) + beta * (dmu1 * N1[i] + dmu2 * N2[i, j])

    with N2 = op2[j] - op1[i] (the species-2 count of the cell).  Invalid
    cells stay -inf (mul of a finite delta cannot revive them under the
    valid mask).  Returns (lnpi_b [S, H, N], x_b) with x the watershed
    elevation input exactly as pore_surface_batch builds it.
    """
    lnpi_raw = jnp.asarray(lnpi_raw)
    n1 = jnp.asarray(op1_vals)[:, None]  # [H, 1]
    n2 = jnp.asarray(op2_vals)[None, :] - n1  # [H, N]

    def one(dmu1, dmu2):
        ln = jnp.where(valid, lnpi_raw + beta * (dmu1 * n1 + dmu2 * n2), -jnp.inf)
        ln = normalize_2d(ln, valid)
        mn = jnp.min(jnp.where(valid, ln, jnp.inf))
        x = jnp.where(valid, ln - mn, 0.0)
        return ln, x

    return jax.vmap(one)(jnp.asarray(dmu1_batch), jnp.asarray(dmu2_batch))


def pore_sweep_fused(
    lnpi_raw, h_vals, fh_vals, p_batch, A, beta_batch, valid, edge_idx, props,
    fp_shape, max_phases: int, boundary_engine: str | None = None,
):
    """Whole pore state sweep as ONE device program: surface build +
    normalize, device watershed, and per-phase analysis for all S states
    — no host stage, no label round-trip (the round-3 sweeps paid a
    download → priority-flood → upload cycle per batch; see
    pore_pipeline._segment_stream for the host arm this replaces).

    Returns (lnpi_b, seg, core): the normalized surfaces, the
    hillclimb_segment_batch dict, and the pore_phase_batch dict.
    """
    lnpi_b, _ = pore_surface_batch(lnpi_raw, h_vals, fh_vals, p_batch, A, beta_batch, valid)
    seg = hillclimb_segment_batch(lnpi_b, valid, fp_shape, max_phases)
    core = pore_phase_batch(
        lnpi_b, seg["labels"], valid, edge_idx, props, seg["peak_lnpi"], seg["n_labels"],
        max_phases, boundary_engine=boundary_engine,
    )
    return lnpi_b, seg, core


def joint_sweep_fused(
    lnpi_raw, op1_vals, op2_vals, beta, dmu1_batch, dmu2_batch, valid, edge_idx, props,
    fp_shape, max_phases: int, boundary_engine: str | None = None,
):
    """joint (N_1, N_tot) GC state sweep as ONE device program (the
    joint-surface analog of pore_sweep_fused)."""
    lnpi_b, _ = joint_surface_batch(lnpi_raw, op1_vals, op2_vals, beta, dmu1_batch, dmu2_batch, valid)
    seg = hillclimb_segment_batch(lnpi_b, valid, fp_shape, max_phases)
    core = pore_phase_batch(
        lnpi_b, seg["labels"], valid, edge_idx, props, seg["peak_lnpi"], seg["n_labels"],
        max_phases, boundary_engine=boundary_engine,
    )
    return lnpi_b, seg, core


def pore_phase_batch(
    lnpi_b, labels_b, valid, edge_idx, props, peak_lnpi_b, n_labels_b, max_phases: int, boundary_engine: str | None = None
):
    """Stage-2 device batch: fused per-phase analysis over S states in
    one launch (vmap of pore_phase_core; labels from host watershed)."""

    def one(lnpi, labels, peak_lnpi, n_labels):
        return pore_phase_core(
            lnpi, labels, valid, edge_idx, props, peak_lnpi, n_labels, max_phases, boundary_engine=boundary_engine
        )

    return jax.vmap(one)(
        jnp.asarray(lnpi_b), jnp.asarray(labels_b), jnp.asarray(peak_lnpi_b), jnp.asarray(n_labels_b)
    )
