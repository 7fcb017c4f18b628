"""noise effect: add TPDF noise (reference: /root/reference/noise.c).

Level is peak dBFS, or effective precision in bits with the 'b' suffix
(mult = 2/2^bits). On-device noise uses JAX threefry (counter-based) rather
than the reference's Park-Miller stream — statistically identical TPDF; the
reference's noise is wall-clock seeded and non-reproducible anyway.
"""

import numpy as np

from dsp_tpu.core.parse import strtod
from dsp_tpu.core.prng import PM_RAND_MAX
from dsp_tpu.effects.base import (
    EFFECT_FLAG_CH_DEPS_IDENTITY,
    EFFECT_FLAG_PLOT_MIX,
    Effect,
    EffectError,
    register_effect,
)


def parse_level(s):
    """dBFS level, or bits with 'b' suffix (noise.c:29-44)."""
    v, rest = strtod(s)
    if rest == s:
        raise EffectError(f"noise: failed to parse level: {s}")
    if rest == "b":
        return 2.0 / (2.0**v)
    if rest:
        raise EffectError(f"noise: trailing characters: {rest}")
    return 10.0 ** (v / 20.0)


class NoiseEffect(Effect):
    split_safe = False  # PRNG stream: segments would replay the sequence

    def __init__(self, name, istream, selector, mult, seed=0):
        self.name = name
        self.istream = istream
        self.ostream = istream
        self.channel_selector = np.asarray(selector, dtype=bool).copy()
        self.flags = EFFECT_FLAG_PLOT_MIX | EFFECT_FLAG_CH_DEPS_IDENTITY
        self.mult = mult
        self.seed = seed

    def state0(self):
        import jax

        return jax.random.PRNGKey(self.seed if self.seed else np.random.randint(1 << 30))

    def step(self, state, x):
        import jax
        import jax.numpy as jnp

        key, k1, k2 = jax.random.split(state, 3)
        shape = x.shape
        # TPDF = difference of two uniform [0, PM_RAND_MAX] variates
        n1 = jax.random.uniform(k1, shape, dtype=x.dtype, maxval=float(PM_RAND_MAX))
        n2 = jax.random.uniform(k2, shape, dtype=x.dtype, maxval=float(PM_RAND_MAX))
        noise = (n1 - n2) * jnp.asarray(self.mult, dtype=x.dtype)
        sel = jnp.asarray(self.channel_selector)
        return key, x + jnp.where(sel, noise, jnp.zeros_like(noise))

    def plot(self, idx, channel_offset=0):
        fs = self.ostream.fs
        lines = []
        for k in range(self.ostream.channels):
            if self.channel_selector[k]:
                lines.append(f"H{k}_{idx}_lw=NaN")
                lines.append(f"H{k}_{idx}_lv=0")
                lines.append(
                    f"H{k}_{idx}_tpdf(w)=(w==H{k}_{idx}_lw)?H{k}_{idx}_lv:"
                    f"(H{k}_{idx}_lw=w, H{k}_{idx}_lv={self.mult * PM_RAND_MAX * 0.7071067811865476:.15e}"
                    f"*((rand(0)-rand(0))+j*(rand(0)-rand(0))))"
                )
                lines.append(f"H{k}_{idx}(w)=Ht{k}_{idx}(w*{fs}/2.0/pi)+H{k}_{idx}_tpdf(w)")
            else:
                lines.append(f"H{k}_{idx}(w)=Ht{k}_{idx}(w*{fs}/2.0/pi)")
        return lines


def _noise_init(ei, istream, selector, dir_, argv):
    if len(argv) != 2:
        raise EffectError(f"noise: usage: {ei.usage}")
    mult = parse_level(argv[1]) / PM_RAND_MAX
    return NoiseEffect(argv[0], istream, selector, mult)


register_effect("noise", "noise level[b]", _noise_init)
