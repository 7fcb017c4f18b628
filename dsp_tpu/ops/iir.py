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
    """
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
