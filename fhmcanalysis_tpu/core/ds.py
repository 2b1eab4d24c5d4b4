"""Double-single (hi, lo float32 pair) arithmetic for Pallas TPU kernels.

TPU hardware has no native f64: XLA emulates it op-by-op, and Pallas does
not support f64 I/O at all.  A double-single value represents x as
``hi + lo`` with ``|lo| <= ulp(hi)/2``, giving ~49 mantissa bits — above
the ~48-bit precision of XLA's own f64 emulation on this platform and far
inside the 1e-8 production parity bar (error ~ magnitude * 2^-49).

CRITICAL range rule (PERFORMANCE.md §3, CLAUDE.md): the pair keeps only
the *f32 exponent range*.  exp(+-100) is inf/0 here exactly as it is for
TPU-emulated f64, so every log-domain consumer must max-shift first and
keep intermediates <= 1 (``ds_exp`` clamps its argument accordingly).

All functions are pure jnp on f32 arrays — they trace identically inside
Pallas kernels (VPU element-wise ops) and in plain XLA, so the same code
is unit-tested against native f64 on CPU and compiled into kernels on TPU.

Algorithms: Knuth two-sum, Dekker split/two-prod (TPU VPU multiplies and
adds round separately; there is no single-rounded FMA primitive exposed,
so the error-free transforms use the classic splitting forms), Briggs/
Bailey double-single add/mul as in the double-double literature.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# numpy scalars, NOT jnp: jnp.float32(x) builds a device array, which a
# Pallas kernel closure may not capture (constants must be literals)
F32 = np.float32

# Veltkamp splitting constant for f32: 2^12 + 1
_SPLIT = F32(4097.0)

# ln(2) as a double-single constant
_LN2_HI = F32(0.6931471824645996)
_LN2_LO = F32(-1.904654323148236e-09)
_INV_LN2 = F32(1.4426950408889634)

# exp argument clamp: exp(-45) ~ 2.9e-20; relative to a max-shifted sum
# whose largest term is 1 this is far below the 2^-49 pair precision
_EXP_CLAMP = F32(-45.0)

# 1/k! for the exp Taylor series, k = 2..10, as (hi, lo) pairs: plain
# f32-rounded coefficients perturb the polynomial by c*6e-8 (e.g. r^3 *
# err(1/6) ~ 4e-10 relative at |r| = ln2/2 — measured as exactly the ds_exp
# error envelope before the pairs were introduced)
_EXP_COEF = [
    (F32(0.5), F32(0.0)),
    (F32(0.1666666716337204), F32(-4.967053879312289e-09)),
    (F32(0.0416666679084301), F32(-1.2417634698280722e-09)),
    (F32(0.008333333767950535), F32(-4.34617203337595e-10)),
    (F32(0.0013888889225199819), F32(-3.3631094437103215e-11)),
    (F32(0.00019841270113829523), F32(-2.725596874933456e-12)),
    (F32(2.4801587642286904e-05), F32(-3.40699609366682e-13)),
    (F32(2.7557318844628753e-06), F32(3.793571224297229e-14)),
    (F32(2.755731998149713e-07), F32(-7.575112209051195e-15)),
]


def split_f64(x):
    """f64 array -> (hi, lo) f32 pair.  Host/XLA side only (f64 input)."""
    hi = x.astype(F32)
    lo = (x - hi.astype(x.dtype)).astype(F32)
    return hi, lo


def join_f64(hi, lo):
    """(hi, lo) f32 pair -> f64 array.  Host/XLA side only (f64 output)."""
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def two_sum(a, b):
    """Error-free a + b = s + err (Knuth; no magnitude precondition)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    """Error-free a + b = s + err, requires |a| >= |b| (or a == 0)."""
    s = a + b
    err = b - (s - a)
    return s, err


def two_prod(a, b):
    """Error-free a * b = p + err via Dekker splitting (no FMA on VPU)."""
    p = a * b
    at = _SPLIT * a
    ah = at - (at - a)
    al = a - ah
    bt = _SPLIT * b
    bh = bt - (bt - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def ds_add(xh, xl, yh, yl):
    """Pair + pair (accurate variant: both low parts folded in)."""
    sh, se = two_sum(xh, yh)
    se = se + (xl + yl)
    return quick_two_sum(sh, se)


def ds_neg(xh, xl):
    return -xh, -xl


def ds_sub(xh, xl, yh, yl):
    return ds_add(xh, xl, -yh, -yl)


def ds_add_f32(xh, xl, y):
    """Pair + plain f32."""
    sh, se = two_sum(xh, y)
    se = se + xl
    return quick_two_sum(sh, se)


def ds_mul(xh, xl, yh, yl):
    """Pair * pair."""
    ph, pe = two_prod(xh, yh)
    pe = pe + (xh * yl + xl * yh)
    return quick_two_sum(ph, pe)


def ds_mul_f32(xh, xl, y):
    """Pair * plain f32 (exact single factor, e.g. a power of two or int)."""
    ph, pe = two_prod(xh, y)
    pe = pe + xl * y
    return quick_two_sum(ph, pe)


def ds_div(xh, xl, yh, yl):
    """Pair / pair via reciprocal + one Newton refinement (~2^-47 rel)."""
    r = F32(1.0) / yh
    # e = 1 - y*r  (ds)
    ph, pe = two_prod(yh, r)
    eh, el = ds_add_f32(-ph, -pe - yl * r, F32(1.0))
    # recip = r + r*e
    th, tl = ds_mul_f32(eh, el, r)
    rh, rl = ds_add_f32(th, tl, r)
    return ds_mul(xh, xl, rh, rl)


def ds_lt(xh, xl, yh, yl):
    """Pair < pair (exact lexicographic compare on normalized pairs)."""
    return (xh < yh) | ((xh == yh) & (xl < yl))


def ds_gt(xh, xl, yh, yl):
    return (xh > yh) | ((xh == yh) & (xl > yl))


def ds_eq(xh, xl, yh, yl):
    return (xh == yh) & (xl == yl)


def ds_max_reduce(xh, xl, axis=0):
    """Lexicographic max of a pair array along an axis (two passes: hi max,
    then lo max over the hi-tied elements)."""
    mh = jnp.max(xh, axis=axis, keepdims=True)
    ml = jnp.max(jnp.where(xh == mh, xl, F32(-jnp.inf)), axis=axis, keepdims=True)
    return mh, ml


def ds_min_reduce(xh, xl, axis=0):
    mh = jnp.min(xh, axis=axis, keepdims=True)
    ml = jnp.min(jnp.where(xh == mh, xl, F32(jnp.inf)), axis=axis, keepdims=True)
    return mh, ml


def ds_exp_shifted(xh, xl):
    """exp of a max-shifted pair argument (x <= 0 expected; clamped below
    at -45 where the true value is ~3e-20 — invisible next to the unit-
    magnitude max term of any shifted sum at pair precision).

    Range-reduce x = n*ln2 + r with |r| <= ln2/2, evaluate the Taylor
    series of exp(r) in pair arithmetic (degree 10: rel error ~ 4e-13 at
    the interval edge), scale by the exact power 2^n.
    """
    big = xh < _EXP_CLAMP
    xh = jnp.where(big, _EXP_CLAMP, xh)
    xl = jnp.where(big, F32(0.0), xl)

    n = jnp.round(xh * _INV_LN2)  # integer-valued f32, |n| <= 65
    # r = x - n*ln2  (n*_LN2_HI is NOT exact in f32: full ds subtract)
    th, tl = ds_mul_f32(_LN2_HI, _LN2_LO, n)
    rh, rl = ds_sub(xh, xl, th, tl)

    # Horner: p = 1/10! ; p = p*r + 1/k! ...
    ph, pl = _EXP_COEF[-1]
    for ch, cl in _EXP_COEF[-2::-1]:
        ph, pl = ds_mul(ph, pl, rh, rl)
        ph, pl = ds_add(ph, pl, ch, cl)
    # ... + r^2*p + r + 1
    ph, pl = ds_mul(ph, pl, rh, rl)
    ph, pl = ds_mul(ph, pl, rh, rl)
    ph, pl = ds_add(ph, pl, rh, rl)
    ph, pl = ds_add_f32(ph, pl, F32(1.0))

    # exact power of two by exponent-field construction: jnp.exp2 lowers to
    # a polynomial with ~2e-6 relative error even at integer arguments
    # (measured on both CPU and TPU lowerings); n in [-65, 0] here so the
    # biased exponent stays in the normal range
    from jax import lax

    scale = lax.bitcast_convert_type(
        (n.astype(jnp.int32) + np.int32(127)) << np.int32(23), F32
    )
    return ph * scale, pl * scale


# 1/(2k+1) for the atanh series of ds_log, k = 1..10, as (hi, lo) pairs
# (same rationale as _EXP_COEF: f32-rounded coefficients alone perturb the
# series by ~1e-10 absolute at |t| ~ 0.17)
_LOG_COEF = [
    (F32(0.3333333432674408), F32(-9.934107817051943e-09)),
    (F32(0.20000000298023224), F32(-2.9802322831459653e-09)),
    (F32(0.1428571492433548), F32(-6.386212082886934e-09)),
    (F32(0.1111111119389534), F32(-8.278422770825255e-10)),
    (F32(0.09090909361839294), F32(-2.7093021365267544e-09)),
    (F32(0.07692307978868484), F32(-2.8656080874360596e-09)),
    (F32(0.06666667014360428), F32(-3.4769375556414997e-09)),
    (F32(0.05882352963089943), F32(-2.1913472439862096e-10)),
    (F32(0.05263157933950424), F32(-3.9213581877141416e-10)),
    (F32(0.04761904850602150), F32(-8.869739029323546e-10)),
]

_SQRT_HALF = F32(0.70710677)  # f32(sqrt(2)/2); fold boundary, any ulp works


def ds_log(xh, xl):
    """Natural log of a positive normal pair (caller guards x > 0).

    Range-reduce x = m * 2^e with m in [sqrt2/2, sqrt2) via exponent-field
    bit surgery (exact, like the 2^n scale in ds_exp_shifted), then
    ln m = 2 atanh(t) with t = (m-1)/(m+1), |t| <= 0.1716 — a 10-term odd
    series in pair arithmetic (truncation ~5e-16 rel), plus e * ln2.

    Accuracy ~2^-47 relative (limited by ds_div in t), i.e. ~1e-14
    absolute for |ln x| <= 50 — far inside the 1e-8 production bar.
    """
    from jax import lax

    bits = lax.bitcast_convert_type(xh, jnp.int32)
    e = ((bits >> np.int32(23)) & np.int32(0xFF)) - np.int32(126)  # x = m*2^e, m in [0.5,1)
    mh = lax.bitcast_convert_type(
        (bits & np.int32(-2139095041)) | (np.int32(126) << np.int32(23)), F32
    )  # mask 0x807FFFFF keeps sign+mantissa; exponent forced to 2^-1
    # lo scaled by the exact power 2^-e (e in [-126, 127] for normal hi)
    scale = lax.bitcast_convert_type((np.int32(127) - e) << np.int32(23), F32)
    ml = xl * scale
    small = mh < _SQRT_HALF
    mh = jnp.where(small, mh + mh, mh)
    ml = jnp.where(small, ml + ml, ml)
    e = jnp.where(small, e - 1, e)

    nh, nl = ds_add_f32(mh, ml, F32(-1.0))
    dh, dl = ds_add_f32(mh, ml, F32(1.0))
    th, tl = ds_div(nh, nl, dh, dl)
    t2h, t2l = ds_mul(th, tl, th, tl)

    ph, pl = _LOG_COEF[-1]
    for ch, cl in _LOG_COEF[-2::-1]:
        ph, pl = ds_mul(ph, pl, t2h, t2l)
        ph, pl = ds_add(ph, pl, ch, cl)
    ph, pl = ds_mul(ph, pl, t2h, t2l)
    ph, pl = ds_add_f32(ph, pl, F32(1.0))  # p = 1 + t2/3 + t4/5 + ...
    lh, ll = ds_mul(th, tl, ph, pl)
    lh, ll = ds_mul_f32(lh, ll, F32(2.0))  # ln m = 2 t p

    ef = e.astype(F32)  # exact: |e| <= 150
    eh, el = ds_mul_f32(_LN2_HI, _LN2_LO, ef)
    return ds_add(lh, ll, eh, el)


def ds_sum_pairs(xh, xl, axis=0):
    """Pair-accurate sum along an axis via a pairwise (tree) reduction.

    The axis length must be a power of two (callers pad with zeros).
    Unrolled halving steps: static slices only — no dynamic indexing.
    """
    from jax import lax

    n = xh.shape[axis]
    assert n & (n - 1) == 0, "ds_sum_pairs needs a power-of-two axis"
    while n > 1:
        h = n // 2
        # static slices (jnp.take would lower to a gather — hostile to Mosaic)
        lo_h = lax.slice_in_dim(xh, 0, h, axis=axis)
        lo_l = lax.slice_in_dim(xl, 0, h, axis=axis)
        hi_h = lax.slice_in_dim(xh, h, n, axis=axis)
        hi_l = lax.slice_in_dim(xl, h, n, axis=axis)
        xh, xl = ds_add(lo_h, lo_l, hi_h, hi_l)
        n = h
    return xh, xl
