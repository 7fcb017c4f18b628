"""IIR recurrences as parallel scans.

The reference runs every IIR effect as a per-sample loop (biquad.c:296-315,
transposed direct-form 2 from biquad.h:76-92). On TPU the sample-serial
dependence is broken with an associative scan over affine state maps:

A TDF2 biquad with normalized coefficients (c0..c4) is the 2-state linear
recurrence

    s[n] = A s[n-1] + B x[n],   y[n] = c0 x[n] + s[n-1][0]

    A = [[-c3, 1], [-c4, 0]],   B = [c1 - c3 c0,  c2 - c4 c0]

Affine pairs (M, v) compose associatively: (M2,v2)∘(M1,v1) = (M2 M1, M2 v1 + v2),
so `jax.lax.associative_scan` computes all prefix states in O(log n) depth,
vectorized across channels (and across cascade stages where independent).

All kernels take coefficients shaped [..., C] (per-channel, so merged effects
with different filters per channel run in one pass) and x shaped [B, C].
"""

import jax
import jax.numpy as jnp
import numpy as np


def biquad_coeffs_to_ss(c):
    """c: array [5, C] (c0..c4, already normalized by a0) -> (A [C,2,2], Bv [C,2], c0 [C])."""
    c = jnp.asarray(c)
    c0, c1, c2, c3, c4 = c[0], c[1], c[2], c[3], c[4]
    A = jnp.stack(
        [
            jnp.stack([-c3, jnp.ones_like(c3)], axis=-1),
            jnp.stack([-c4, jnp.zeros_like(c4)], axis=-1),
        ],
        axis=-2,
    )  # [C, 2, 2]
    Bv = jnp.stack([c1 - c3 * c0, c2 - c4 * c0], axis=-1)  # [C, 2]
    return A, Bv, c0


def _affine_combine(a, b):
    """Compose affine maps: b after a. M: [..., 2, 2], v: [..., 2]."""
    Ma, va = a
    Mb, vb = b
    M = Mb @ Ma
    v = (Mb @ va[..., None])[..., 0] + vb
    return M, v


def _df_affine_combine(a, b):
    """Double-float (hi, lo pairs) version of _affine_combine."""
    Mah, Mal, vah, val = a
    Mbh, Mbl, vbh, vbl = b
    Mph, Mpl = _df_mat2mul(Mbh, Mbl, Mah, Mal)
    wh, wl = _df_mat2vec(Mbh, Mbl, vah, val)
    wh, wl = _df_add(wh, wl, vbh, vbl)
    return Mph, Mpl, wh, wl


def biquad_scan(A, Bv, c0, state, x):
    """Run one block of a biquad through an associative scan.

    A [C,2,2], Bv [C,2], c0 [C]; state [C,2] (TDF2 memories m0,m1); x [B,C].
    Returns (state' [C,2], y [B,C]).

    Matmul precision is forced to full float32: TPU default (bf16 inputs)
    perturbs the recurrence matrices enough to destabilize near-unit-circle
    poles (30 Hz highpass at 44.1k NaN'd under bf16).
    """
    import jax

    with jax.default_matmul_precision("float32"):
        return _biquad_scan_impl(A, Bv, c0, state, x)


def _biquad_scan_impl(A, Bv, c0, state, x):
    B = x.shape[0]
    v = x[..., None] * Bv  # [B, C, 2]
    M = jnp.broadcast_to(A, (B,) + A.shape)  # [B, C, 2, 2]
    Mp, vp = jax.lax.associative_scan(_affine_combine, (M, v), axis=0)
    # s[n] = Mp[n] @ s0 + vp[n]
    s = (Mp @ state[..., None])[..., 0] + vp  # [B, C, 2]
    m0_prev = jnp.concatenate([state[None, :, 0], s[:-1, :, 0]], axis=0)  # [B, C]
    y = c0 * x + m0_prev
    return s[-1], y


def biquad_scan_df(A, Bv, c0, state, x):
    """Double-float per-sample associative scan (f32 small-block fallback).

    Same recurrence as biquad_scan but with the affine maps composed in
    two-float32 arithmetic so near-DC poles keep <= -120 dBFS in f32 (a plain
    f32 scan compounds eps-level matrix-product rounding to ~-65 dBFS for
    `highpass 30`). A/Bv/c0 are HOST numpy float64 (split hi/lo here);
    state is the [2, C, 2] (hi, lo) pair used by biquad_blocked, so the two
    paths are interchangeable. ~20x the flops of the plain scan, all VPU
    elementwise — only used for blocks too small for the MXU kernel.
    """
    import jax

    Ah, Al = _split_f64(A)
    Bh, Bl = _split_f64(Bv)
    c0h, c0l = _split_f64(c0)
    B = x.shape[0]
    dt = x.dtype
    with jax.default_matmul_precision("float32"):
        vh, vl = _two_prod(jnp.asarray(Bh), x[..., None])
        vh, vl = _quick_two_sum(vh, vl + jnp.asarray(Bl) * x[..., None])
        Mh = jnp.broadcast_to(jnp.asarray(Ah), (B,) + Ah.shape)
        Ml = jnp.broadcast_to(jnp.asarray(Al), (B,) + Al.shape)

        Mph, Mpl, vph, vpl = jax.lax.associative_scan(
            _df_affine_combine, (Mh, Ml, vh, vl), axis=0
        )
        C = x.shape[1]
        sh, sl = _df_mat2vec(
            Mph, Mpl, jnp.broadcast_to(state[0], (B, C, 2)), jnp.broadcast_to(state[1], (B, C, 2))
        )
        sh, sl = _df_add(sh, sl, vph, vpl)
        m0h = jnp.concatenate([state[0][None, :, 0], sh[:-1, :, 0]], axis=0)
        m0l = jnp.concatenate([state[1][None, :, 0], sl[:-1, :, 0]], axis=0)
        yh, yl = _two_prod(jnp.asarray(c0h), x)
        yh, yl = _df_add(yh, yl + jnp.asarray(c0l).astype(dt) * x, m0h, m0l)
        y = yh + yl
        return jnp.stack([sh[-1], sl[-1]]), y


def biquad_scan_auto(c, state, x):
    """Precision-safe biquad scan from host coefficients.

    c: HOST numpy [5, C] normalized coefficients; state: [C, 2] (single
    array, both dtypes). Picks the double-float coupled-form scan under
    float32 — a plain f32 scan rounds the recurrence matrix enough to push
    near-DC shelf poles outside the unit circle (matrix4_mb's 10 Hz fshape
    blew up to a subsonic full-scale rumble on TPU) — and the plain scan
    under float64."""
    c = np.asarray(c, dtype=np.float64)
    A, Bv = _coupled_form_ss(c)
    if x.dtype == jnp.float32:
        stp = jnp.stack([state, jnp.zeros_like(state)])
        stp2, y = biquad_scan_df(A, Bv, c[0], stp, x)
        return stp2[0] + stp2[1], y
    return biquad_scan(
        jnp.asarray(A, x.dtype),
        jnp.asarray(Bv, x.dtype),
        jnp.asarray(c[0], x.dtype),
        state,
        x,
    )


def biquad_scan_seq(A, Bv, c0, state, x):
    """Sequential lax.scan reference implementation (for testing/CPU)."""

    def f(s, xn):
        yn = c0 * xn + s[:, 0]
        sn = (A @ s[..., None])[..., 0] + xn[..., None] * Bv
        return sn, yn

    state, y = jax.lax.scan(f, state, x)
    return state, y


def first_order_scan(a1, b0, b1, state, x):
    # (no matmuls: scalar affine scan, safe at any precision)
    """First-order direct-form recurrence y[n] = b0 x[n] + s[n-1]; s[n] = b1 x[n] - a1 y[n].

    (TDF2 with one memory.) a1/b0/b1: [C]; state: [C]; x: [B, C].
    Implemented as a 1-state affine scan: s[n] = (-a1) s[n-1] + (b1 - a1 b0) x[n].
    """
    g = -a1
    k = b1 - a1 * b0
    B = x.shape[0]
    v = x * k
    M = jnp.broadcast_to(g, (B,) + g.shape)

    def combine(p, q):
        return p[0] * q[0], q[0] * p[1] + q[1]

    Mp, vp = jax.lax.associative_scan(combine, (M, v), axis=0)
    s = Mp * state + vp
    s_prev = jnp.concatenate([state[None], s[:-1]], axis=0)
    y = b0 * x + s_prev
    return s[-1], y


def make_identity_biquad(channels, dtype=np.float64):
    """Coefficient array [5, C] for a unit passthrough."""
    c = np.zeros((5, channels), dtype=dtype)
    c[0] = 1.0
    return c


# --- double-float (two-float32) arithmetic for the carry chain -------------
#
# Near-DC biquads (e.g. `highpass 30 0.7071`) have poles at radius
# 1 - r with r ~ 3e-3; rounding the recurrence matrices to float32 shifts the
# pole by ~eps and the transfer function responds with sensitivity ~1/r^2
# (~1e5), so an all-f32 carry chain tops out around -50 dBFS. Running just the
# tiny [Nc, C, 2, 2] carry scan in double-float (hi+lo float32 pairs, ~48-bit
# mantissa, error-free transforms) restores <= -120 dBFS while the heavy
# [L, L] within-chunk matmuls stay plain f32 on the MXU (they are
# finite-horizon and well-conditioned). float64 is not an option on TPU
# (pathological compile times); this is the TPU-native equivalent of the
# reference's all-double sample loop (biquad.c:296-315).

_SPLIT32 = np.float32(4097.0)  # 2**12 + 1: Dekker split constant for f32


# Every error-free transform below hides its cancellation intermediates
# behind jax.lax.optimization_barrier: XLA's algebraic simplifier rewrites
# float expressions like `a - (a - b) -> b` and `(a + b) - a -> b` (exact in
# reals, catastrophic for EFTs), silently zeroing the error terms once ops
# fuse under jit. Measured: matrix4's phasor path lost its whole df
# correction (1.09e-4 absolute) until `--xla_disable_hlo_passes=algsimp`
# confirmed the simplifier as the culprit. Barriers pin the values without
# runtime cost and work on every backend (TPU runs the same pass).


def _bar(x):
    return jax.lax.optimization_barrier(x)


def _two_sum(a, b):
    s = a + b
    bb = _bar(s - a)
    err = (a - _bar(s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    # requires |a| >= |b| (holds after a product/sum of normalized pairs)
    s = a + b
    return s, b - _bar(s - a)


def _two_prod(a, b):
    # Dekker: exact a*b = p + err using split halves (no FMA dependence)
    p = a * b
    ca = _SPLIT32 * a
    ahi = ca - _bar(ca - a)
    alo = a - _bar(ahi)
    cb = _SPLIT32 * b
    bhi = cb - _bar(cb - b)
    blo = b - _bar(bhi)
    err = ((ahi * bhi - _bar(p)) + ahi * blo + alo * bhi) + alo * blo
    return p, err


def _df_add(ah, al, bh, bl):
    sh, se = _two_sum(ah, bh)
    return _quick_two_sum(sh, se + (al + bl))


def _df_mul(ah, al, bh, bl):
    ph, pe = _two_prod(ah, bh)
    return _quick_two_sum(ph, pe + (ah * bl + al * bh))


def _df_mat2mul(Bh, Bl, Ah, Al):
    """(B @ A) for [..., 2, 2] double-float matrices."""
    ph, pl = _df_mul(
        Bh[..., :, :, None], Bl[..., :, :, None], Ah[..., None, :, :], Al[..., None, :, :]
    )  # [..., i, k, j]
    return _df_add(ph[..., :, 0, :], pl[..., :, 0, :], ph[..., :, 1, :], pl[..., :, 1, :])


def _df_mat2vec(Bh, Bl, vh, vl):
    """(B @ v) for [..., 2, 2] df matrix and [..., 2] df vector."""
    ph, pl = _df_mul(Bh, Bl, vh[..., None, :], vl[..., None, :])  # [..., i, k]
    return _df_add(ph[..., :, 0], pl[..., :, 0], ph[..., :, 1], pl[..., :, 1])


def _split_f64(x):
    """numpy float64 -> (hi, lo) float32 pair."""
    hi = np.asarray(x, dtype=np.float32)
    lo = np.asarray(x - hi.astype(np.float64), dtype=np.float32)
    return hi, lo


# chunk length of the blocked MXU kernels; block sizes must be multiples of
# this (and >= 2*BLOCKED_L) to take the blocked path (see BiquadEffect.step
# and chain.CompiledChain._fuse)
BLOCKED_L = 128


def _df_reduce(ph, pl, axis):
    """Double-float pairwise tree reduction along `axis` (power-of-2 length)."""
    ph = jnp.moveaxis(ph, axis, -1)
    pl = jnp.moveaxis(pl, axis, -1)
    n = ph.shape[-1]
    # the halving loop silently drops elements for non-power-of-2 lengths
    # (callers must _pad_pow2 first; all current L are powers of two)
    assert n & (n - 1) == 0, f"_df_reduce needs a power-of-2 length, got {n}"
    while n > 1:
        h = n // 2
        ph, pl = _df_add(ph[..., :h], pl[..., :h], ph[..., h:], pl[..., h:])
        n = h
    return ph[..., 0], pl[..., 0]


def _pad_pow2(a, axis):
    n = a.shape[axis]
    m = 1
    while m < n:
        m *= 2
    if m == n:
        return a
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, m - n)
    return jnp.pad(a, pad)


def _df_matmul_n(Bh, Bl, Ah, Al):
    """(B @ A) for [..., n, n] double-float matrices, any n (tree-reduced)."""
    ph, pl = _df_mul(
        Bh[..., :, :, None], Bl[..., :, :, None], Ah[..., None, :, :], Al[..., None, :, :]
    )  # [..., i, k, j]
    return _df_reduce(_pad_pow2(ph, -2), _pad_pow2(pl, -2), -2)


def _df_matvec_n(Bh, Bl, vh, vl):
    """(B @ v) for [..., n, n] df matrix and [..., n] df vector, any n."""
    ph, pl = _df_mul(Bh, Bl, vh[..., None, :], vl[..., None, :])  # [..., i, k]
    return _df_reduce(_pad_pow2(ph, -1), _pad_pow2(pl, -1), -1)


def _df_inject(Vh, Vl, xc):
    """Per-chunk carry injection v = V @ x in double-float.

    Vh/Vl: [C, 2, L]; xc: [Nc, L, C] -> (vh, vl): [Nc, C, 2]. The injection
    feeds the infinite-horizon carry recurrence, so its reduction error is
    amplified like the pole sensitivity; an f32 einsum caps accuracy ~-112 dB
    for near-DC filters while this df reduction restores the -120s."""
    xt = jnp.transpose(xc, (0, 2, 1))[:, :, None, :]  # [Nc, C, 1, L]
    ph, pe = _two_prod(Vh[None], xt)
    pe = pe + Vl[None] * xt
    ph, pe = _quick_two_sum(ph, pe)
    return _df_reduce(ph, pe, -1)


def _coupled_form_ss(c):
    """Host-side state-space (A [C,2,2], Bv [C,2]) with y = c0 x + s[n-1][0].

    For complex-pole channels the companion form is similarity-transformed to
    the coupled (rotation) form A = r*R(theta): companion matrix powers of a
    near-DC resonator are non-normal and transiently grow to ~1/sin(theta)
    (~100 for `highpass 30`), so the P/V tables hold large entries whose f32
    products cancel catastrophically — the worst-sample error floor on TPU.
    Coupled-form powers stay bounded by r^k <= 1. The transform
    T = [[1, 0], [a1/2, im]] keeps the output row e0 T = [1, 0], so
    y = c0 x + s[0] holds in both bases and states are interchangeable with
    zeros-initialized use. Real-pole channels keep the companion form (their
    transient growth is bounded for audio filters). numpy float64 only.
    """
    c = np.asarray(c, dtype=np.float64)
    C = c.shape[1]
    c0, c1, c2, c3, c4 = c
    A = np.zeros((C, 2, 2))
    A[:, 0, 0] = -c3
    A[:, 0, 1] = 1.0
    A[:, 1, 0] = -c4
    Bv = np.stack([c1 - c3 * c0, c2 - c4 * c0], axis=-1)  # [C, 2]
    disc = c3 * c3 - 4.0 * c4
    cplx = disc < 0.0
    if np.any(cplx):
        re = -c3 / 2.0
        im = np.sqrt(np.maximum(-disc, 0.0)) / 2.0
        im_safe = np.where(cplx, im, 1.0)
        Ac = np.zeros((C, 2, 2))
        Ac[:, 0, 0] = re
        Ac[:, 0, 1] = im
        Ac[:, 1, 0] = -im
        Ac[:, 1, 1] = re
        # T^-1 = [[1, 0], [-a1/(2 im), 1/im]]
        Bc = np.stack(
            [Bv[:, 0], (-c3 / (2.0 * im_safe)) * Bv[:, 0] + Bv[:, 1] / im_safe],
            axis=-1,
        )
        A = np.where(cplx[:, None, None], Ac, A)
        Bv = np.where(cplx[:, None], Bc, Bv)
    return A, Bv


# --- fused biquad cascades --------------------------------------------------


# --- host-side state-space algebra (numpy float64, per-channel batched) ----
#
# Systems are dicts {A: [C,n,n], B: [C,n], C: [C,n], D: [C]} with the
# observer timing y[n] = D x[n] + C s[n-1], s[n] = A s[n-1] + B x[n].
# Compositions let whole filter graphs (matrix4_mb's CAP5 tree) collapse
# into one blocked kernel per output.


def ss_identity(channels):
    return {
        "A": np.zeros((channels, 0, 0)),
        "B": np.zeros((channels, 0)),
        "C": np.zeros((channels, 0)),
        "D": np.ones(channels),
    }


def ss_from_biquad(c):
    """[5, C] normalized biquad -> coupled-form state-space dict."""
    c = np.asarray(c, dtype=np.float64)
    A, B = _coupled_form_ss(c)
    C = A.shape[0]
    Crow = np.zeros((C, 2))
    Crow[:, 0] = 1.0  # coupled basis keeps the output row at [1, 0]
    return {"A": A, "B": B, "C": Crow, "D": c[0].copy()}


def ss_series(s1, s2):
    """s2 after s1 (audio flows s1 -> s2)."""
    A1, B1, C1, D1 = s1["A"], s1["B"], s1["C"], s1["D"]
    A2, B2, C2, D2 = s2["A"], s2["B"], s2["C"], s2["D"]
    Cch, n1 = A1.shape[0], A1.shape[1]
    n2 = A2.shape[1]
    A = np.zeros((Cch, n1 + n2, n1 + n2))
    A[:, :n1, :n1] = A1
    A[:, n1:, :n1] = np.einsum("ci,cj->cij", B2, C1)
    A[:, n1:, n1:] = A2
    B = np.concatenate([B1, B2 * D1[:, None]], axis=1)
    C = np.concatenate([C1 * D2[:, None], C2], axis=1)
    D = D2 * D1
    return {"A": A, "B": B, "C": C, "D": D}


def ss_add(s1, s2, g1=1.0, g2=1.0):
    """Parallel sum g1*s1 + g2*s2 (same input feeds both)."""
    A1, B1, C1, D1 = s1["A"], s1["B"], s1["C"], s1["D"]
    A2, B2, C2, D2 = s2["A"], s2["B"], s2["C"], s2["D"]
    Cch, n1 = A1.shape[0], A1.shape[1]
    n2 = A2.shape[1]
    A = np.zeros((Cch, n1 + n2, n1 + n2))
    A[:, :n1, :n1] = A1
    A[:, n1:, n1:] = A2
    B = np.concatenate([B1, B2], axis=1)
    C = np.concatenate([C1 * g1, C2 * g2], axis=1)
    D = g1 * D1 + g2 * D2
    return {"A": A, "B": B, "C": C, "D": D}


def ss_scale(s, g):
    """Output gain g applied to a system."""
    return {"A": s["A"], "B": s["B"], "C": s["C"] * g, "D": s["D"] * g}


def ss_stack(systems):
    """Stack systems along the channel axis (pad state dims to the max)."""
    nmax = max(s["A"].shape[1] for s in systems)
    As, Bs, Cs, Ds = [], [], [], []
    for s in systems:
        Cch, n = s["A"].shape[0], s["A"].shape[1]
        A = np.zeros((Cch, nmax, nmax))
        A[:, :n, :n] = s["A"]
        B = np.zeros((Cch, nmax))
        B[:, :n] = s["B"]
        C = np.zeros((Cch, nmax))
        C[:, :n] = s["C"]
        As.append(A)
        Bs.append(B)
        Cs.append(C)
        Ds.append(s["D"])
    return {
        "A": np.concatenate(As, axis=0),
        "B": np.concatenate(Bs, axis=0),
        "C": np.concatenate(Cs, axis=0),
        "D": np.concatenate(Ds, axis=0),
    }


class CascadeBlockedPlan:
    """Blocked-kernel plan for a SERIES of biquads fused into one LTI system.

    The reference runs each biquad as its own per-sample pass (biquad.c:
    296-315, one effect per filter). On TPU, running K cascaded biquads as K
    separate blocked kernels costs K carry scans and K sets of [L, L]
    matmuls; composing them host-side into one 2K-state system

        s[n] = A s[n-1] + B x[n],   y[n] = D x[n] + C s[n-1]

    (series connection: A = [[A1, 0], [B2 C1, A2]], B = [B1; B2 D1],
    C = [D2 C1, C2], D = D2 D1, per channel, each stage in the coupled
    basis) gives ONE kernel with the same [L, L] within-chunk Toeplitz
    (built from the composite impulse response h) and a single 2K-dim carry
    chain. Used only as a compile-time fusion (chain.CompiledChain) so the
    user-visible chain and plot output stay identical to the reference.
    """

    def __init__(self, cs, L=BLOCKED_L):
        """cs: list of [5, C] normalized coefficient arrays, stage order."""
        cs = [np.asarray(c, dtype=np.float64) for c in cs]
        sys = ss_from_biquad(cs[0])
        for c in cs[1:]:
            sys = ss_series(sys, ss_from_biquad(c))
        self._init_from_ss(sys, L)

    @classmethod
    def from_ss(cls, sys, L=BLOCKED_L):
        """Build a plan from a host state-space dict (see ss_from_biquad)."""
        self = cls.__new__(cls)
        self._init_from_ss(sys, L)
        return self

    def _init_from_ss(self, sys, L):
        A, B, Crow, D = sys["A"], sys["B"], sys["C"], sys["D"]
        C = A.shape[0]
        n = A.shape[1]
        self.L = L
        self.C = C
        self.n = n
        pows = np.zeros((L + 1, C, n, n))
        pows[0] = np.eye(n)[None]
        for k in range(1, L + 1):
            pows[k] = np.einsum("cij,cjk->cik", A, pows[k - 1])
        # composite impulse response h[k] = C A^(k-1) B (k >= 1); h[0] = D
        h = np.einsum("ci,kcij,cj->kc", Crow, pows[: L - 1], B)  # h[1..L-1]
        W = np.zeros((C, L, L))
        for i in range(1, L):
            for j in range(i):
                W[:, i, j] = h[i - 1 - j]
        self.W = W
        self.P = np.einsum("ci,kcij->ckj", Crow, pows[:L])  # [C, L, n]
        self.V = np.stack(
            [np.einsum("cij,cj->ci", pows[L - 1 - j], B) for j in range(L)], axis=2
        )  # [C, n, L]
        self.AL = pows[L]
        self.c0 = D
        self.B_in = B
        self.AL_hi, self.AL_lo = _split_f64(self.AL)
        self.V_hi, self.V_lo = _split_f64(self.V)
        self.P_hi, self.P_lo = _split_f64(self.P)
        self.W_hi, self.W_lo = _split_f64(self.W)
        self._pow2 = {0: self.AL}  # AL^(2^l) host-f64 cache (Kogge-Stone)

    def pow2_split(self, level):
        """(hi, lo) f32 split of AL^(2^level), computed host-side in f64."""
        m = max(self._pow2)
        while m < level:
            nxt = np.einsum("cij,cjk->cik", self._pow2[m], self._pow2[m])
            m += 1
            self._pow2[m] = nxt
        return _split_f64(self._pow2[level])


def lti_blocked(plan, state, x):
    """Run a block with a CascadeBlockedPlan. state: [2, C, n] (hi, lo)."""
    with jax.default_matmul_precision("float32"):
        return _lti_blocked_impl(plan, state, x)


def lti_blocked_df(plan, state, x):
    """Like lti_blocked but returns the output as an uncollapsed (hi, lo)
    pair under f32 — for consumers whose downstream runs in double-float
    (matrix4's envelope chain: collapsing to f32 leaves ~2e-7 correlated
    filter error that the event engine amplifies to ~1e-6 axis error).
    Returns (state', (y_hi, y_lo)); under f64 y_lo is zeros."""
    with jax.default_matmul_precision("float32"):
        return _lti_blocked_impl(plan, state, x, df_out=True)


def _lti_blocked_impl(plan, state, x, df_out=False):
    B, C = x.shape
    L = plan.L
    n = plan.n
    Nc = B // L
    dt = x.dtype
    xc = x.reshape(Nc, L, C)
    c0 = jnp.asarray(plan.c0, dtype=dt)
    if dt == jnp.float32:
        # L=1 plans double as a per-sample df scan (Kogge-Stone over samples
        # with host-precomputed A^(2^l)) for blocks the 128-chunk kernel
        # can't take; the W-matmul chunking needs G | L
        G = 8 if L % 8 == 0 else 1
        T = L // G
        zp_h = jnp.einsum(
            "cigt,ngtc->ngic", jnp.asarray(plan.W_hi.reshape(C, L, G, T)),
            xc.reshape(Nc, G, T, C), preferred_element_type=dt,
        )
        zp_l = jnp.einsum(
            "cigt,ngtc->ngic", jnp.asarray(plan.W_lo.reshape(C, L, G, T)),
            xc.reshape(Nc, G, T, C), preferred_element_type=dt,
        )
        zh, zl = _df_reduce(zp_h, zp_l, 1)
        vh, vl = _df_inject(jnp.asarray(plan.V_hi), jnp.asarray(plan.V_lo), xc)
        # fold the incoming state into the first chunk's injection:
        # v[0] += AL @ s0, so the Kogge-Stone pass below yields s_end directly
        s0h_in, s0l_in = _df_matvec_n(
            jnp.asarray(plan.AL_hi), jnp.asarray(plan.AL_lo), state[0], state[1]
        )
        v0h, v0l = _df_add(vh[0], vl[0], s0h_in, s0l_in)
        wh = vh.at[0].set(v0h)
        wl = vl.at[0].set(v0l)
        # carry chain as a Kogge-Stone doubling scan: the per-chunk matrix is
        # CONSTANT (AL), so prefix matrices never need computing in-graph —
        # each level applies the host-precomputed power AL^(2^l) to shifted
        # partial sums (matrix-VECTOR df work only, ~n^2 not n^3).
        # Levels update in place (dynamic-update-slice), NOT via iterated
        # jnp.concatenate: XLA:CPU's concat emitter re-inlines each operand's
        # whole upstream expression, so a chain of level concats re-evaluates
        # every prior level per level (~2^levels work; measured 303 ms for a
        # 32-sample block of the matrix4_mb bank vs ~1 ms with DUS).
        lvl = 0
        span = 1
        while span < Nc:
            Mh_np, Ml_np = plan.pow2_split(lvl)
            Mh = jnp.asarray(Mh_np)
            Ml = jnp.asarray(Ml_np)
            ph, pl = _df_matvec_n(Mh, Ml, wh[:-span], wl[:-span])
            uh, ul = _df_add(wh[span:], wl[span:], ph, pl)
            wh = wh.at[span:].set(uh)
            wl = wl.at[span:].set(ul)
            lvl += 1
            span *= 2
        sh, sl = wh, wl  # inclusive prefix: state after chunk k
        s0h = jnp.concatenate([state[0][None], sh[:-1]], axis=0)  # [Nc, C, n]
        s0l = jnp.concatenate([state[1][None], sl[:-1]], axis=0)
        yc = (
            jnp.einsum("clk,nck->nlc", jnp.asarray(plan.P_hi), s0h)
            + jnp.einsum("clk,nck->nlc", jnp.asarray(plan.P_hi), s0l)
            + jnp.einsum("clk,nck->nlc", jnp.asarray(plan.P_lo), s0h)
        )
        yh, ylo = _two_prod(c0, xc)
        yh, ylo = _df_add(yh, ylo, zh, zl)
        if df_out:
            yh2, yl2 = _quick_two_sum(yh, ylo + yc)
            return jnp.stack([sh[-1], sl[-1]]), (yh2.reshape(B, C), yl2.reshape(B, C))
        y = yh + (ylo + yc)
        return jnp.stack([sh[-1], sl[-1]]), y.reshape(B, C)
    z = jnp.einsum("cij,njc->nic", jnp.asarray(plan.W, dtype=dt), xc, preferred_element_type=dt)
    P = jnp.asarray(plan.P, dtype=dt)
    V = jnp.asarray(plan.V, dtype=dt)
    AL = jnp.asarray(plan.AL, dtype=dt)
    s0 = state[0] + state[1]
    v = jnp.einsum("cij,njc->nci", V, xc, preferred_element_type=dt)
    M = jnp.broadcast_to(AL, (Nc,) + AL.shape)

    Mp, vp = jax.lax.associative_scan(_affine_combine, (M, v), axis=0)
    s_end = (Mp @ s0[None, ..., None])[..., 0] + vp
    s_start = jnp.concatenate([s0[None], s_end[:-1]], axis=0)
    y = c0 * xc + jnp.einsum("clk,nck->nlc", P, s_start) + z
    st_out = jnp.stack([s_end[-1], jnp.zeros_like(s_end[-1])])
    if df_out:
        yr = y.reshape(B, C)
        return st_out, (yr, jnp.zeros_like(yr))
    return st_out, y.reshape(B, C)


# --- single-biquad blocked plan: a one-stage cascade ------------------------
# The standalone biquad kernel was a near-verbatim n=2 copy of the cascade
# kernel (same coupled basis via ss_from_biquad -> _coupled_form_ss, same
# W/P/V/A^L tables, same f32 compensated paths). One implementation serves
# both; the names remain for callers and the state layouts are identical
# ([2, C, 2] (hi, lo) pairs), so blocked/scan handover is unchanged.


class BiquadBlockedPlan(CascadeBlockedPlan):
    def __init__(self, c, L=BLOCKED_L):
        super().__init__([c], L)


biquad_blocked = lti_blocked
