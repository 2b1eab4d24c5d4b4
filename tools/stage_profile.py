"""Sweep-kernel stage profile via cheap-stand-in ablation at B=2M.

Each variant monkeypatches ONE stage of pallas_sweep with a shape/type-
compatible trivial stand-in and recompiles; the warm-rate delta vs the
baseline is that stage's cost share.  Numbers are comparable only within
this run (same tunnel window).
"""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np
import jax
import jax.numpy as jnp

import fhmcanalysis_tpu.histogram.ntot as oneDH
from fhmcanalysis_tpu.core import pallas_sweep as PS
from fhmcanalysis_tpu.core import ds
from fhmcanalysis_tpu.utils.profiling import force_completion

FIX = "/root/reference/unittests/reference/test.nc"
host = oneDH.histogram(FIX, 1.0, [5.0, 0.0], smooth=1)
h, meta = host._hist(), host._meta(max_phases=4)
B = 2 * 1024 * 1024
mus = jnp.linspace(4.0, 6.0, B)

I32, F32 = PS.I32, PS.F32
lax = jax.lax


def timeit(tag):
    PS._sweep_ds_pallas.clear_cache()
    t0 = time.time()
    out = PS.mu_sweep_thermo_ds(h, meta, mus, props=True, mode="pallas")
    force_completion(out["fe"])
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t1 = time.time()
        out = PS.mu_sweep_thermo_ds(h, meta, mus, props=True, mode="pallas")
        force_completion(out["fe"])
        best = min(best, time.time() - t1)
    print(f"{tag:28s} warm={best*1e3:7.1f} ms  rate={B/best/1e6:6.1f}M pts/s  (compile {compile_s:.1f}s)", flush=True)
    return best


orig = {
    "relex": PS._relextrema_lanes,
    "exp": ds.ds_exp_shifted,
    "sums": ds.ds_sum_pairs,
    "pmax": PS._masked_pair_max,
    "bounds": PS._phase_bounds_lanes,
}

base = timeit("baseline")


def cheap_relex(xh, xl, rows, N, smooth, P):
    # stand-ins must be REAL-layout, non-constant-foldable arrays: Mosaic
    # SIGABRTs on offset slices of splat constants/iotas (the
    # apply-vector-layout bug of PERFORMANCE.md gotcha 8), downstream
    # phase_bounds/thermo_lanes slice these rows, and x*0 folds back to a
    # splat — a scaled f32->i32 truncation (always 0 at these magnitudes)
    # survives as a real data-dependent array
    gmax = orig["pmax"](xh, xl, rows < N, F32(-jnp.inf))
    zP = (xh[:P] * F32(1e-30)).astype(I32)  # == 0, real layout
    zP1 = (xh[: P + 1] * F32(1e-30)).astype(I32)
    riP = lax.broadcasted_iota(I32, zP.shape, 0)
    riP1 = lax.broadcasted_iota(I32, zP1.shape, 0)
    mx = zP + jnp.where(riP == 0, np.int32(7), jnp.where(riP == 1, np.int32(23), PS.BIG))
    mn = zP1 + jnp.where(riP1 == 0, np.int32(0), jnp.where(riP1 == 1, np.int32(15), jnp.where(riP1 == 2, np.int32(N - 1), PS.BIG)))
    return {
        "maxima": mx,
        "n_max": zP[:1] + np.int32(2),
        "minima": mn,
        "n_min": zP1[:1] + np.int32(3),
        "valid": zP[:1] == 0,
        "gmax": gmax,
    }


def cheap_sums(xh, xl, axis=0):
    return lax.slice_in_dim(xh, 0, 1, axis=axis), lax.slice_in_dim(xl, 0, 1, axis=axis)


def cheap_bounds(ext, N, P):
    # maxima >= 0 always, so min(maxima, 0) is a fold-proof real zero
    zP = jnp.minimum(ext["maxima"], np.int32(0))
    riP = lax.broadcasted_iota(I32, zP.shape, 0)
    lefts = zP + jnp.where(riP == 1, np.int32(15), np.int32(0))
    rights = zP + jnp.where(riP == 0, np.int32(15), jnp.where(riP == 1, np.int32(N), np.int32(0)))
    return lefts, rights, riP < ext["n_max"]


def ablate(tag, obj, attr, stand_in):
    saved = getattr(obj, attr)
    setattr(obj, attr, stand_in)
    try:
        t = timeit(tag)
        return (base - t) * 1e3
    except Exception as e:
        print(f"{tag:28s} FAILED: {str(e).splitlines()[0][:90]}", flush=True)
        return float("nan")
    finally:
        setattr(obj, attr, saved)


rel_ms = ablate("no relextrema", PS, "_relextrema_lanes", cheap_relex)
exp_ms = ablate("no ds_exp", ds, "ds_exp_shifted", lambda xh, xl: (jnp.where(xh < 0, F32(1.0) + xh * F32(1e-4), F32(1.0)), xl * F32(0.0)))
sums_ms = ablate("no tree sums", ds, "ds_sum_pairs", cheap_sums)
pmax_ms = ablate("no per-phase pair max", PS, "_masked_pair_max", lambda xh, xl, m, neg: (xh[:1], xl[:1]))
bounds_ms = ablate("no phase bounds", PS, "_phase_bounds_lanes", cheap_bounds)

# props off = pks muls + extra tree sums + divisions
PS._sweep_ds_pallas.clear_cache()
out = PS.mu_sweep_thermo_ds(h, meta, mus, props=False, mode="pallas")
force_completion(out["fe"])
best = 1e9
for _ in range(3):
    t1 = time.time()
    out = PS.mu_sweep_thermo_ds(h, meta, mus, props=False, mode="pallas")
    force_completion(out["fe"])
    best = min(best, time.time() - t1)
print(f"{'props=False':28s} warm={best*1e3:7.1f} ms  rate={B/best/1e6:6.1f}M pts/s", flush=True)
props_ms = (base - best) * 1e3

bt = base * 1e3
print("\nstage shares of the %.1f ms baseline:" % bt, flush=True)
for name, v in [("relextrema", rel_ms), ("ds_exp", exp_ms), ("tree sums", sums_ms), ("per-phase max", pmax_ms), ("phase bounds", bounds_ms), ("props (mul+sums+div)", props_ms)]:
    print(f"  {name:22s} {v:7.1f} ms  ({100*v/bt:5.1f}%)", flush=True)
