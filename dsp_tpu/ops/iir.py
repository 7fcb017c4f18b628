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


class BiquadBlockedPlan:
    """Chunked biquad evaluation mapping onto the MXU.

    For s[n] = A s[n-1] + Bv x[n], y[n] = c0 x[n] + s[n-1][0], a chunk of L
    samples satisfies

        y = c0 * x + P @ s_carry + W @ x          (within-chunk, exact)
        s_carry' = A^L @ s_carry + V @ x

    with W a lower-triangular Toeplitz of w[k] = e0 A^k Bv, P[i] = e0 A^i,
    V[:, j] = A^(L-1-j) Bv — all precomputed on the host in float64, so the
    only sequential dependence left is the tiny [2]-state carry chain over
    N/L chunks. The [L, L] matmul batches across chunks and channels and
    rides the MXU; float32 accuracy is far better than an in-graph
    associative scan because the matrix powers never round-trip through f32
    products.
    """

    def __init__(self, c, L=128):
        """c: [5, C] normalized biquad coefficients (numpy, float64)."""
        c = np.asarray(c, dtype=np.float64)
        self.L = L
        C = c.shape[1]
        self.C = C
        c0, c1, c2, c3, c4 = c
        A = np.zeros((C, 2, 2))
        A[:, 0, 0] = -c3
        A[:, 0, 1] = 1.0
        A[:, 1, 0] = -c4
        Bv = np.stack([c1 - c3 * c0, c2 - c4 * c0], axis=-1)  # [C, 2]
        # powers A^0..A^L
        pows = np.zeros((L + 1, C, 2, 2))
        pows[0] = np.eye(2)[None]
        for k in range(1, L + 1):
            pows[k] = np.einsum("cij,cjk->cik", A, pows[k - 1])
        w = np.einsum("kcj,cj->kc", pows[:L, :, 0, :], Bv)  # w[k, c] = e0 A^k Bv
        # W[c, i, j] = w[i-1-j] for j < i
        W = np.zeros((C, L, L))
        for i in range(1, L):
            for j in range(i):
                W[:, i, j] = w[i - 1 - j]
        self.W = W
        self.P = np.transpose(pows[:L, :, 0, :], (1, 0, 2))  # [C, L, 2]
        self.V = np.stack(
            [np.einsum("cij,cj->ci", pows[L - 1 - j], Bv) for j in range(L)], axis=2
        )  # [C, 2, L]
        self.AL = pows[L]  # [C, 2, 2]
        self.c0 = c0


def biquad_blocked(plan, state, x):
    """Run a block with a BiquadBlockedPlan. x: [B, C] with B % L == 0.

    Full-f32 matmul precision (see biquad_scan)."""
    import jax

    with jax.default_matmul_precision("float32"):
        return _biquad_blocked_impl(plan, state, x)


def _biquad_blocked_impl(plan, state, x):
    import jax
    import jax.numpy as jnp

    B, C = x.shape
    L = plan.L
    Nc = B // L
    dt = x.dtype
    xc = x.reshape(Nc, L, C)
    W = jnp.asarray(plan.W, dtype=dt)
    P = jnp.asarray(plan.P, dtype=dt)
    V = jnp.asarray(plan.V, dtype=dt)
    AL = jnp.asarray(plan.AL, dtype=dt)
    c0 = jnp.asarray(plan.c0, dtype=dt)
    # within-chunk contributions (batched MXU matmul)
    z = jnp.einsum("cij,njc->nic", W, xc, preferred_element_type=dt)
    # carry inputs per chunk
    v = jnp.einsum("cij,njc->nci", V, xc, preferred_element_type=dt)
    # carry chain: s_{n+1} = AL s_n + v_n (associative over Nc elements)
    M = jnp.broadcast_to(AL, (Nc,) + AL.shape)

    def combine(a, b):
        Ma, va = a
        Mb, vb = b
        return Mb @ Ma, (Mb @ va[..., None])[..., 0] + vb

    Mp, vp = jax.lax.associative_scan(combine, (M, v), axis=0)
    s_end = (Mp @ state[None, ..., None])[..., 0] + vp  # state after chunk n
    s_start = jnp.concatenate([state[None], s_end[:-1]], axis=0)  # [Nc, C, 2]
    y = c0 * xc + jnp.einsum("clk,nck->nlc", P, s_start) + z
    return s_end[-1], y.reshape(B, C)
