"""Double-float (two-float32) elementwise arithmetic for control-path scans.

The matrix4 event engine (reference: /root/reference/matrix4_common.c:499-710)
runs EWMAs, comparisons and angle math in C double. On TPU float64 is not
viable (pathological compile times), and a plain float32 control path
accumulates enough drift in the long-horizon accumulators — and enough jitter
in the event *decisions* (threshold comparisons) — to cap free-running
accuracy near -95 dBFS (round-2 measurement). This module provides a `DF`
value type carrying (hi, lo) float32 pairs (~49-bit effective mantissa via
error-free transforms) with enough operator coverage that the event engine in
`dsp_tpu.ops.m4_engine` can run generically over plain arrays (float64 on
CPU) or DF pairs (float32 on TPU).

Unlike `ops.iir`'s blocked-kernel double-float (matrix-shaped, matmul-heavy),
everything here is scalar/elementwise — it lives inside `lax.scan` bodies at
the fs/32 control rate, so the ~15x op-count overhead is marginal (1/32 of
the samples).

Dispatch convention: the module-level helpers (`where`, `stack`, `absolute`,
`sqrt`, `maximum`, ...) pass through to jnp when no DF is involved, so the
float64 code path is bit-identical to the pre-DF implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dsp_tpu.ops.iir import _quick_two_sum, _two_prod, _two_sum


def _bar_where(c, a, b):
    """jnp.where behind an optimization barrier.

    XLA's algebraic simplifier sinks arithmetic into select branches
    (op(select(c,a,b),y) -> select(c,op(a,y),op(b,y))), which in a dependent
    chain of df selects duplicates the whole upstream expression per branch —
    measured 1000x runtime blowups on XLA:CPU for the event engine (and a
    matching select-count explosion in the optimized HLO). The barrier pins
    each select in place; semantics (incl. NaN discard) are unchanged."""
    r = jnp.where(c, a, b)
    return jax.lax.optimization_barrier(r)


def _const_split(v):
    """Host float -> exact (hi, lo) float32 split (numpy, trace-time)."""
    hi = np.float32(v)
    lo = np.float32(np.float64(v) - np.float64(hi))
    return hi, lo


def _lift(x):
    """Lift a value to DF. Host scalars get an exact split; arrays/tracers
    get a zero lo part."""
    if isinstance(x, DF):
        return x
    if isinstance(x, (float, int)):
        hi, lo = _const_split(float(x))
        return DF(hi, lo)
    x = jnp.asarray(x)
    if x.dtype == jnp.float64:
        hi = x.astype(jnp.float32)
        return DF(hi, (x - hi.astype(jnp.float64)).astype(jnp.float32))
    return DF(x, jnp.zeros_like(x))


def _is_traced(x):
    try:
        from jax.core import Tracer
    except ImportError:  # newer jax layouts
        from jax.extend.core import Tracer  # pragma: no cover
    return isinstance(x, Tracer)


def _opaque(c):
    # hide the constant behind an optimization barrier: algsimp cannot fold
    # or reassociate through it, so the EFT cancellation terms survive.
    # (An earlier version added a runtime zero `anchor[0] - anchor[0]`
    # instead, which made every constant depend on the whole upstream chain —
    # XLA:CPU's emitters re-computed that chain per use, turning constant-rich
    # DF polynomials exponential in depth: a 13-term Horner measured 10 s for
    # 64 elements. The barrier form is dependency-free and O(1).)
    h, l = jax.lax.optimization_barrier((jnp.asarray(c.hi), jnp.asarray(c.lo)))
    return DF(h, l)


def _pair(a, b):
    """Lift + make any CONSTANT operand opaque when the other is traced.

    XLA's algebraic simplifier merges constants through float add/sub chains
    (sub(add(x, c1), c2) -> add(x, c1 - c2)) — exact over reals but fatal to
    the error-free transforms (it zeroed the engine's `1.0 - alpha`
    cancellation term entirely). Runtime-only expressions are left alone, so
    hiding constants behind a runtime zero restores faithful semantics."""
    b = _lift(b)
    at = _is_traced(a.hi)
    bt = _is_traced(b.hi)
    if at and not bt:
        b = _opaque(b)
    elif bt and not at:
        a = _opaque(a)
    return a, b


def is_df(x):
    return isinstance(x, DF)


def _any_df(*xs):
    return any(isinstance(x, DF) for x in xs)


@jax.tree_util.register_pytree_node_class
class DF:
    """A (hi, lo) float32 pair behaving like one ~49-bit float array."""

    __slots__ = ("hi", "lo")

    def __init__(self, hi, lo):
        self.hi = hi
        self.lo = lo

    def tree_flatten(self):
        return (self.hi, self.lo), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # --- array-ish surface ---

    @property
    def dtype(self):
        return jnp.asarray(self.hi).dtype

    @property
    def shape(self):
        return jnp.shape(self.hi)

    @property
    def ndim(self):
        return jnp.ndim(self.hi)

    def value(self):
        return self.hi + self.lo

    def __getitem__(self, idx):
        return DF(self.hi[idx], self.lo[idx])

    @property
    def at(self):
        return _At(self)

    def __repr__(self):
        return f"DF(hi={self.hi!r}, lo={self.lo!r})"

    # --- arithmetic (operands go through _pair: constants become opaque
    # runtime values so XLA's constant reassociation can't fold the EFTs) ---

    def __add__(self, o):
        s, o = _pair(self, o)
        h, l = _df_add(s.hi, s.lo, o.hi, o.lo)
        return DF(h, l)

    __radd__ = __add__

    def __sub__(self, o):
        s, o = _pair(self, o)
        h, l = _df_add(s.hi, s.lo, -o.hi, -o.lo)
        return DF(h, l)

    def __rsub__(self, o):
        s, o = _pair(self, o)
        h, l = _df_add(o.hi, o.lo, -s.hi, -s.lo)
        return DF(h, l)

    def __mul__(self, o):
        s, o = _pair(self, o)
        h, l = _df_mul(s.hi, s.lo, o.hi, o.lo)
        return DF(h, l)

    __rmul__ = __mul__

    def __truediv__(self, o):
        s, o = _pair(self, o)
        h, l = _df_div(s.hi, s.lo, o.hi, o.lo)
        return DF(h, l)

    def __rtruediv__(self, o):
        s, o = _pair(self, o)
        h, l = _df_div(o.hi, o.lo, s.hi, s.lo)
        return DF(h, l)

    def __neg__(self):
        return DF(-self.hi, -self.lo)

    def __pow__(self, n):
        if not isinstance(n, int):
            raise TypeError("DF.__pow__ supports integer exponents only")
        if n == 2:
            return self * self
        r = _lift(1.0)
        b = self
        k = n
        while k:
            if k & 1:
                r = r * b
            k >>= 1
            if k:
                b = b * b
        return r

    # --- comparisons (plain bool arrays) ---

    def _cmp_diff(self, o):
        o = _lift(o)
        # (ah - bh) is exact when the his are close (Sterbenz), so adding the
        # lo difference resolves near-ties at full df precision; when the his
        # are far apart the hi difference alone decides the sign.
        return (self.hi - o.hi) + (self.lo - o.lo)

    def __lt__(self, o):
        return self._cmp_diff(o) < 0

    def __le__(self, o):
        return self._cmp_diff(o) <= 0

    def __gt__(self, o):
        return self._cmp_diff(o) > 0

    def __ge__(self, o):
        return self._cmp_diff(o) >= 0


class _At:
    def __init__(self, df):
        self._df = df

    def __getitem__(self, idx):
        df = self._df
        return _AtIdx(df, idx)


class _AtIdx:
    def __init__(self, df, idx):
        self._df = df
        self._idx = idx

    def set(self, v):
        v = _lift(v)
        df = self._df
        return DF(df.hi.at[self._idx].set(v.hi), df.lo.at[self._idx].set(v.lo))


# --- core double-float kernels ---


def _df_add(ah, al, bh, bl):
    # accurate (QD ieee-style) add: relative error O(2^-48) of the RESULT
    # even under full cancellation (the sloppy one-two_sum variant degrades
    # to O(2^-48 * max|inputs|), which matters for the engine's adapt_* =
    # pwr - accom differences feeding angle ratios)
    sh, se = _two_sum(ah, bh)
    th, te = _two_sum(al, bl)
    se = se + th
    sh, se = _quick_two_sum(sh, se)
    se = se + te
    return _quick_two_sum(sh, se)


def _df_mul(ah, al, bh, bl):
    ph, pe = _two_prod(ah, bh)
    return _quick_two_sum(ph, pe + (ah * bl + al * bh))


def _df_div(ah, al, bh, bl):
    q0 = (ah + al) / (bh + bl)
    # r = a - q0*b in df; q1 = r/b refines q0 to ~full df precision
    ph, pe = _two_prod(q0, bh)
    pe = pe + q0 * bl
    rh, rl = _df_add(ah, al, -ph, -pe)
    q1 = (rh + rl) / bh
    # correction is garbage when b is 0/inf/nan or q0 overflowed: keep q0
    valid = jnp.isfinite(q0) & jnp.isfinite(bh) & (bh != 0) & jnp.isfinite(q1)
    q1 = _bar_where(valid, q1, jnp.zeros_like(q1))
    h, l = _quick_two_sum(q0, q1)
    # inf/nan q0 makes quick_two_sum's lo nan (inf - inf); pass (q0, 0) through
    bad = ~jnp.isfinite(q0)
    return jax.lax.optimization_barrier(
        (jnp.where(bad, q0, h), jnp.where(bad, jnp.zeros_like(l), l))
    )


# --- generic helpers (jnp passthrough on plain arrays) ---


def value(x):
    return x.value() if isinstance(x, DF) else x


def where(c, a, b):
    if _any_df(a, b):
        a = _lift(a)
        b = _lift(b)
        h, l = jax.lax.optimization_barrier(
            (jnp.where(c, a.hi, b.hi), jnp.where(c, a.lo, b.lo))
        )
        return DF(h, l)
    return jnp.where(c, a, b)


def absolute(x):
    if isinstance(x, DF):
        neg = (x.hi + x.lo) < 0
        return DF(jnp.where(neg, -x.hi, x.hi), jnp.where(neg, -x.lo, x.lo))
    return jnp.abs(x)


def maximum(a, b):
    if _any_df(a, b):
        a = _lift(a)
        b = _lift(b)
        return where(a >= b, a, b)
    return jnp.maximum(a, b)


def minimum(a, b):
    if _any_df(a, b):
        a = _lift(a)
        b = _lift(b)
        return where(a <= b, a, b)
    return jnp.minimum(a, b)


def clip(x, lo, hi):
    if isinstance(x, DF):
        return minimum(maximum(x, lo), hi)
    return jnp.clip(x, lo, hi)


def _scatter_stack(parts, axis):
    """Stack via a chain of .at[i].set instead of one concatenate.

    XLA:CPU's concatenate fusion emitter inlines each operand's WHOLE
    upstream expression into the concat kernel and (with barrier bitcasts in
    the way) loses subexpression memoization — a single jnp.stack of four
    event-engine scalars measured 19.5 s/call where the identical values
    returned as a tuple cost 0.5 ms. Dynamic-update-slice builds don't hit
    that emitter path; the copies are tiny (control-rate scalars).

    Only XLA:CPU has this emitter; on TPU the dynamic-update-slice chain is
    the slower construct, so other backends keep the plain concatenate."""
    if jax.default_backend() == "cpu":
        pass
    else:
        return jnp.stack(parts, axis=axis)
    shp = jnp.broadcast_shapes(*[p.shape for p in parts])
    parts = [jnp.broadcast_to(p, shp) for p in parts]
    out = jnp.zeros((len(parts),) + shp, parts[0].dtype)
    for i, p in enumerate(parts):
        out = out.at[i].set(p)
    if axis != 0:
        out = jnp.moveaxis(out, 0, axis)
    return out


def stack(xs, axis=0):
    if any(isinstance(x, DF) for x in xs):
        xs = [_lift(x) if not isinstance(x, DF) else x for x in xs]
        his = [jnp.asarray(x.hi) for x in xs]
        los = [jnp.asarray(x.lo) for x in xs]
        return DF(_scatter_stack(his, axis), _scatter_stack(los, axis))
    return jnp.stack(xs, axis=axis)


def sqrt(x):
    if not isinstance(x, DF):
        return jnp.sqrt(x)
    y0 = jnp.sqrt(x.hi + x.lo)
    # one Newton step: y = y0 + (x - y0^2) / (2 y0), residual computed in df
    ph, pe = _two_prod(y0, y0)
    rh, rl = _df_add(x.hi, x.lo, -ph, -pe)
    corr = (rh + rl) / (2.0 * y0)
    ok = (y0 > 0) & jnp.isfinite(y0) & jnp.isfinite(corr)
    corr = _bar_where(ok, corr, jnp.zeros_like(corr))
    h, l = _quick_two_sum(y0, corr)
    bad = ~jnp.isfinite(y0)
    h, l = jax.lax.optimization_barrier(
        (jnp.where(bad, y0, h), jnp.where(bad, jnp.zeros_like(l), l))
    )
    return DF(h, l)


def zeros_like(x):
    if isinstance(x, DF):
        return DF(jnp.zeros_like(x.hi), jnp.zeros_like(x.lo))
    return jnp.zeros_like(x)


def full_like(x, v):
    if isinstance(x, DF):
        hi, lo = _const_split(float(v))
        return DF(jnp.full_like(x.hi, hi), jnp.full_like(x.lo, lo))
    return jnp.full_like(x, v)


def ones_like(x):
    if isinstance(x, DF):
        return full_like(x, 1.0)
    return jnp.ones_like(x)


# --- trig/exp for the matrix-coefficient path --------------------------------
#
# The steering-matrix computation (matrix4_common.c:718-978) is smooth in the
# axes but has sensitivity pockets (tan near the +-pi/4 edges, normalization
# divides); in plain f32 those amplify axis rounding to ~-113 dBFS on the
# output. Arguments are bounded (|x| <= ~pi for trig; exp arguments ~[-9, 1]),
# so one quadrant/ln2 reduction plus a short Taylor series reaches df
# accuracy.

_PI_2_SPLIT = _const_split(float(np.pi / 2.0))
_LN2_SPLIT = _const_split(float(np.log(2.0)))

import math as _math

_SIN_COEFS = [((-1.0) ** k) / float(_math.factorial(2 * k + 1)) for k in range(9)]
_COS_COEFS = [((-1.0) ** k) / float(_math.factorial(2 * k)) for k in range(9)]
_EXP_COEFS = [1.0 / float(_math.factorial(k)) for k in range(14)]


def _poly_even(r2, coefs):
    acc = _lift(coefs[-1])
    for c in reversed(coefs[:-1]):
        acc = acc * r2 + _lift(c)
    return acc


def _sin_cos_reduced(x):
    """(sin, cos, k) after reducing x = k*(pi/2) + r, |r| <= pi/4."""
    xv = x.hi + x.lo
    k = jnp.round(xv / np.float32(np.pi / 2.0))
    kdf = DF(k, jnp.zeros_like(k))
    r = x - kdf * DF(_PI_2_SPLIT[0], _PI_2_SPLIT[1])
    r2 = r * r
    s = r * _poly_even(r2, _SIN_COEFS)
    c = _poly_even(r2, _COS_COEFS)
    return s, c, k.astype(jnp.int32)


def sin(x):
    if not isinstance(x, DF):
        return jnp.sin(x)
    s, c, k = _sin_cos_reduced(x)
    q = jnp.mod(k, 4)
    r = where(q == 0, s, where(q == 1, c, where(q == 2, -s, -c)))
    return r


def cos(x):
    if not isinstance(x, DF):
        return jnp.cos(x)
    s, c, k = _sin_cos_reduced(x)
    q = jnp.mod(k, 4)
    r = where(q == 0, c, where(q == 1, -s, where(q == 2, -c, s)))
    return r


def tan(x):
    if not isinstance(x, DF):
        return jnp.tan(x)
    s, c, k = _sin_cos_reduced(x)
    q = jnp.mod(k, 2)
    # tan(x) = s/c in even quadrants, -c/s in odd
    return where(q == 0, s / c, -(c / s))


def exp(x):
    if not isinstance(x, DF):
        return jnp.exp(x)
    xv = x.hi + x.lo
    k = jnp.round(xv / np.float32(np.log(2.0)))
    kdf = DF(k, jnp.zeros_like(k))
    r = x - kdf * DF(_LN2_SPLIT[0], _LN2_SPLIT[1])
    e = _poly_even(r, _EXP_COEFS)  # plain Horner in r (odd+even terms)
    # exact 2^k by exponent-field construction — jnp.exp2 is an approximation
    # that misses integer powers by several ULPs (measured 5e-7 rel at k=-13)
    ki = jnp.clip(k.astype(jnp.int32), -126, 127)
    scale = jax.lax.bitcast_convert_type((ki + 127) << 23, jnp.float32)
    return DF(e.hi * scale, e.lo * scale)


# --- atan for non-negative arguments -----------------------------------------
#
# The event engine's angle computations (matrix4_common.h:176-199) call
# atan(n/d) with n, d >= 0, so only [0, +inf] (plus NaN from 0/0, which the
# caller's guards discard) needs handling. Reduction:
#   x > 1           -> atan(x) = pi/2 - atan(1/x)
#   x in [0, 1]     -> pick nearest c in {0, 1/4, 1/2, 3/4, 1};
#                      atan(x) = atan(c) + atan((x - c)/(1 + c x))
# leaving |arg| <= 0.1322 (= (0.375-0.25)/(1+0.25*0.375)), where a 9-term odd
# Taylor series reaches ~1e-16 relative — beyond df resolution.

_ATAN_CS = (0.0, 0.25, 0.5, 0.75, 1.0)
_ATAN_TAB = [(_const_split(c), _const_split(float(np.arctan(np.float64(c))))) for c in _ATAN_CS]
_PI_2_DF = _const_split(float(np.pi / 2.0))


def _atan_poly(r):
    """atan Taylor series for |r| <= 0.133, r a DF."""
    r2 = r * r
    # Horner over odd terms: r * (1 - r2/3 + r2^2/5 - ...)
    acc = _lift(0.0)
    for k in range(9, 0, -1):
        coef = ((-1.0) ** k) / (2.0 * k + 1.0)
        acc = acc * r2 + _lift(coef)
    acc = acc * r2 + _lift(1.0)
    return r * acc


def atan_pos(x):
    """atan(x) for x in [0, +inf], DF in/out (plain passthrough to jnp)."""
    if not isinstance(x, DF):
        return jnp.arctan(x)
    big = (x.hi + x.lo) > 1.0
    inv = _lift(1.0) / x
    r = where(big, inv, x)
    rh, rl = jax.lax.optimization_barrier(
        (jnp.where(jnp.isnan(x.hi), x.hi, r.hi), jnp.where(jnp.isnan(x.hi), x.hi, r.lo))
    )
    r = DF(rh, rl)
    # select the segment CONSTANTS first (nearest c in {0, .25, .5, .75, 1}),
    # then run ONE reduction + polynomial — a per-segment poly costs 5x the
    # trace/compile size for no accuracy gain
    rv = r.hi + r.lo
    idx = jnp.clip(jnp.round(rv * 4.0), 0.0, 4.0)
    ch = jnp.zeros_like(r.hi)
    cl = jnp.zeros_like(r.lo)
    ath = jnp.zeros_like(r.hi)
    atl = jnp.zeros_like(r.lo)
    for i, ((chi, cli), (athi, atli)) in enumerate(_ATAN_TAB):
        m = idx == float(i)
        ch = jnp.where(m, chi, ch)
        cl = jnp.where(m, cli, cl)
        ath = jnp.where(m, athi, ath)
        atl = jnp.where(m, atli, atl)
    ch, cl, ath, atl = jax.lax.optimization_barrier((ch, cl, ath, atl))
    cdf = DF(ch, cl)
    arg = (r - cdf) / (cdf * r + 1.0)
    out = DF(ath, atl) + _atan_poly(arg)
    out_h, out_l = out.hi, out.lo
    # fold back x > 1: pi/2 - atan(1/x)
    fdf = DF(_PI_2_DF[0], _PI_2_DF[1]) - out
    fh = jnp.broadcast_to(fdf.hi, out_h.shape)
    fl = jnp.broadcast_to(fdf.lo, out_l.shape)
    res_h = _bar_where(big, fh, out_h)
    res_l = _bar_where(big, fl, out_l)
    # NaN passthrough (0/0 inputs; caller guards select these away)
    res_h = jnp.where(jnp.isnan(x.hi), x.hi, res_h)
    res_l = jnp.where(jnp.isnan(x.hi), jnp.zeros_like(res_l), res_l)
    return DF(res_h, res_l)


def lift(x):
    """Public lift: value -> DF."""
    return _lift(x)


def const(v):
    """Host float -> DF scalar with exact split."""
    hi, lo = _const_split(float(v))
    return DF(hi, lo)


def wrap_dict(st, st_lo):
    """Wrap a flat state dict: keys present in st_lo become DF(st[k], st_lo[k]),
    everything else passes through unchanged."""
    return {k: (DF(v, st_lo[k]) if k in st_lo else v) for k, v in st.items()}


def split_dict(st_df, lo_keys):
    """Inverse of wrap_dict: returns (hi_dict, lo_dict) where lo_dict holds
    the lo parts for `lo_keys` (zeros if the leaf is not DF)."""
    hi = {}
    lo = {}
    for k, v in st_df.items():
        if isinstance(v, DF):
            hi[k] = v.hi
            lo[k] = v.lo
        else:
            hi[k] = v
            if k in lo_keys:
                lo[k] = jnp.zeros_like(jnp.asarray(v))
    return hi, lo
