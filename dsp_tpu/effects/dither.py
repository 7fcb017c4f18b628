"""dither effect: TPDF dither with optional noise shaping (reference:
/root/reference/dither.c).

Shapes: flat (no feedback, fully vectorized), sloped (1st-order HP feedback),
sloped2 (sloped TPDF + feedback), lipshitz (5-tap E-weighted), wan3/wan9
(F-weighted, 44.1/48k family only). The error-feedback quantizer loop
(dither.c:146-170) is inherently sample-serial: it runs as a lax.scan over the
block with the per-sample TPDF noise generated vectorized up front. 'auto'
bits track the output codec precision via set_auto_params, driven by the
application's SHOULD_DITHER policy (dsp.c:46-48,872-879).
"""

import numpy as np

from dsp_tpu.core import log
from dsp_tpu.core.parse import strtod
from dsp_tpu.core.prng import PM_RAND_MAX
from dsp_tpu.effects.base import (
    EFFECT_FLAG_CH_DEPS_IDENTITY,
    Effect,
    EffectError,
    register_effect,
)

_FILTERS = {
    "lipshitz": np.array([2.033, -2.165, 1.959, -1.590, 0.6149]),
    "wan3": np.array([1.623, -0.982, 0.109]),
    "wan9": np.array([2.412, -3.370, 3.937, -4.174, 3.353, -2.205, 1.281, -0.569, 0.0847]),
}
# (type, restricted_fs): fs=0 means any rate (dither.c:66-72)
_TYPES = {
    "flat": 0,
    "sloped": 0,
    "sloped2": 0,
    "lipshitz": 44100,
    "wan3": 46000,
    "wan9": 46000,
}


class DitherEffect(Effect):
    split_safe = False  # PRNG stream: segments would replay the sequence

    def __init__(self, name, istream, selector, shape, noise_bits, quantize_bits,
                 noise_auto, quantize_auto, seed=0):
        self.name = name
        self.istream = istream
        self.ostream = istream
        self.channel_selector = np.asarray(selector, dtype=bool).copy()
        self.flags = EFFECT_FLAG_CH_DEPS_IDENTITY
        self.shape = shape
        self.seed = seed
        n = istream.channels
        # per-channel parameters so merged effects with different configs coexist
        self.enabled = self.channel_selector.copy()
        self.n_mult = np.zeros(n)
        self.q_mult0 = np.ones(n)
        self.q_mult1 = np.ones(n)
        self.noise_auto = self.channel_selector & noise_auto
        self.quantize_auto = self.channel_selector & quantize_auto
        self.shapes = np.array([shape] * n)  # shape name per channel
        if not noise_auto and np.isfinite(noise_bits):
            self._set_noise_bits(self.channel_selector, noise_bits)
        if not quantize_auto and quantize_bits:
            self._set_quantize_bits(self.channel_selector, quantize_bits)
        if noise_auto:
            self.enabled &= False  # until set_auto_params

    def _set_noise_bits(self, mask, bits):
        self.n_mult = np.where(mask, 2.0 / (2.0**bits) / PM_RAND_MAX, self.n_mult)

    def _set_quantize_bits(self, mask, bits):
        bits = max(min(int(bits), 32), 2)
        q = float(1 << (bits - 1))
        self.q_mult0 = np.where(mask, q, self.q_mult0)
        self.q_mult1 = np.where(mask, 1.0 / q, self.q_mult1)

    def set_auto_params(self, bits, enabled):
        """Track output codec precision (dither.c:262-280)."""
        na = self.noise_auto
        if na.any():
            if not enabled or bits < 2 or bits > 32:
                self.enabled &= ~na
            else:
                self._set_noise_bits(na, float(bits))
                self.enabled |= na
        qa = self.quantize_auto
        if qa.any():
            self._set_quantize_bits(qa, 32 if bits < 2 else bits)

    @property
    def is_dither(self):
        return True

    def state0(self):
        import jax

        key = jax.random.PRNGKey(self.seed if self.seed else np.random.randint(1 << 30))
        n = self.istream.channels
        # feedback error history (max 9 taps) + previous-noise carry for sloped2
        return {
            "key": key,
            "ehist": np.zeros((9, n), dtype=np.float64),
            "nprev": np.zeros((n,), dtype=np.float64),
        }

    def step(self, state, x):
        import jax
        import jax.numpy as jnp

        n = self.istream.channels
        B = x.shape[0]
        dt = x.dtype
        key, k1, k2 = jax.random.split(state["key"], 3)
        n_mult = jnp.asarray(self.n_mult, dtype=dt)
        q0 = jnp.asarray(self.q_mult0, dtype=dt)
        q1 = jnp.asarray(self.q_mult1, dtype=dt)
        enabled = jnp.asarray(self.enabled)
        u1 = jax.random.uniform(k1, (B, n), dtype=dt, maxval=float(PM_RAND_MAX))
        u2 = jax.random.uniform(k2, (B, n), dtype=dt, maxval=float(PM_RAND_MAX))
        shape = self.shape
        if shape == "sloped2":
            # sloped TPDF: first difference of one uniform stream (dither.c:116-122)
            prev = jnp.concatenate([state["nprev"][None].astype(dt), u1[:-1]], axis=0)
            noise = (u1 - prev) * n_mult
            nprev_out = u1[-1]
        else:
            noise = (u1 - u2) * n_mult
            nprev_out = state["nprev"]

        if shape == "flat":
            y = q1 * jnp.round(q0 * (x + noise))
            y = jnp.where(enabled, y, x)
            return {"key": key, "ehist": state["ehist"], "nprev": nprev_out}, y

        if shape in ("sloped", "sloped2"):
            fir = jnp.zeros((9,), dtype=dt).at[0].set(1.0)
        else:
            f = _FILTERS[shape]
            fir = jnp.zeros((9,), dtype=dt).at[: len(f)].set(jnp.asarray(f, dtype=dt))

        def scan_fn(ehist, inp):
            xn, nn = inp
            fb = jnp.einsum("t,tc->c", fir, ehist)
            p0 = xn - fb
            p1 = q1 * jnp.round(q0 * (p0 + nn))
            err = p1 - p0
            ehist = jnp.concatenate([err[None], ehist[:-1]], axis=0)
            yn = jnp.where(enabled, p1, xn)
            return ehist, yn

        ehist, y = jax.lax.scan(scan_fn, state["ehist"].astype(dt), (x, noise))
        return {"key": key, "ehist": ehist, "nprev": nprev_out}, y

    def merge(self, other):
        if type(other) is not type(self):
            return False
        if (other.channel_selector & self.channel_selector).any():
            return False
        if other.shape != self.shape:
            return False  # per-channel shapes would need distinct scan paths
        sel = other.channel_selector
        self.channel_selector |= sel
        self.enabled = np.where(sel, other.enabled, self.enabled)
        self.n_mult = np.where(sel, other.n_mult, self.n_mult)
        self.q_mult0 = np.where(sel, other.q_mult0, self.q_mult0)
        self.q_mult1 = np.where(sel, other.q_mult1, self.q_mult1)
        self.noise_auto |= other.noise_auto
        self.quantize_auto |= other.quantize_auto
        return True


def dither_effect_init(ei, istream, selector, dir_, argv):
    name = argv[0]
    args = argv[1:]
    if len(args) > 3:
        raise EffectError(f"{name}: usage: {ei.usage}")
    # slot dispatch mirrors dither.c:299-314: the shape slot is chosen by a
    # RATE-IGNORANT name lookup; with all three args the first is the shape
    # slot unconditionally
    shape_word = noise_bits = quantize_bits = None
    if len(args) == 1:
        if args[0] in _TYPES:
            shape_word = args[0]
        else:
            noise_bits = args[0]
    elif len(args) == 2:
        if args[0] in _TYPES:
            shape_word = args[0]
        else:
            quantize_bits = args[0]
        noise_bits = args[1]
    elif len(args) == 3:
        shape_word, quantize_bits, noise_bits = args

    shape = "flat"
    if shape_word is not None:
        fs_req = _TYPES.get(shape_word)
        if fs_req is not None and (
            not fs_req or abs(fs_req - istream.fs) < fs_req * 0.05
        ):
            shape = shape_word
        else:
            # unknown word in the shape slot, or a rate-gated shape at the
            # wrong fs: the reference WARNS and falls back to sloped
            # (dither.c:317-323) — existing chains must keep running
            log.error(
                "%s: warning: invalid shape for fs=%d: %s",
                name, istream.fs, shape_word,
            )
            shape = "sloped"

    noise_auto = noise_bits is None or noise_bits == "auto"
    nb = np.inf
    if not noise_auto:
        nb, rest = strtod(noise_bits)
        if rest == noise_bits or rest:
            raise EffectError(f"{name}: failed to parse bits: {noise_bits}")
        if not np.isfinite(nb):
            # dither.c:338-342: isfinite check, clean error
            raise EffectError(f"{name}: bits is invalid: {nb:g}")
    quantize_auto = quantize_bits is None or quantize_bits == "auto"
    qb = 0
    if not quantize_auto:
        qv, rest = strtod(quantize_bits)
        if rest == quantize_bits or rest:
            raise EffectError(f"{name}: failed to parse quantize_bits: {quantize_bits}")
        qb = int(round(qv))
        if not (2 <= qb <= 32):
            raise EffectError(f"{name}: quantize_bits out of range")
    elif not noise_auto:
        # quantize_bits defaults to bits rounded (README dither notes)
        quantize_auto = False
        qb = max(min(int(round(nb)), 32), 2)

    return DitherEffect(name, istream, selector, shape, nb, qb, noise_auto, quantize_auto)


def _is_number_or_auto(s):
    if s == "auto":
        return True
    v, rest = strtod(s)
    return rest != s


register_effect("dither", "dither [shape] [[quantize_bits] bits]", dither_effect_init)
