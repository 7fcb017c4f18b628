"""stats effect: per-channel statistics (reference: /root/reference/stats.c).

DC offset, min, max, peak dBFS, RMS dBFS, crest factor, peak count, peak
sample, samples, length — printed when processing finishes. Accumulators are
device-side reductions carried in the effect state; the host reads them at
the end (host_finish).

``-i`` enables true-peak estimation: the reference runs a gated 4x polyphase
upsampler + quadratic peak fit only near new extrema (stats.c:76-139); here
the whole block is 4x oversampled and every local extremum is refined — same
estimator applied everywhere (>= the reference's coverage), fully vectorized.
The 4x interpolation filter is a windowed-sinc designed at init, not the
reference's table.
"""

import numpy as np

from dsp_tpu.core import log
from dsp_tpu.core.parse import ParseError, getopt, strtod, strtol
from dsp_tpu.effects.base import (
    EFFECT_FLAG_ALIGN_BARRIER,
    EFFECT_FLAG_CH_DEPS_IDENTITY,
    EFFECT_FLAG_NO_DITHER,
    Effect,
    EffectError,
    register_effect,
)

_OS = 4  # oversampling factor for -i


_TAPS_PER_PHASE = 24


def _design_interp_filter(taps_per_phase=_TAPS_PER_PHASE):
    """4x windowed-sinc interpolator [OS, taps] (unity DC gain per phase)."""
    from scipy.signal.windows import kaiser

    n = _OS * taps_per_phase
    t = (np.arange(n) - (n - 1) / 2.0) / _OS
    h = np.sinc(t) * kaiser(n, 10.0)
    table = h.reshape(taps_per_phase, _OS).T  # phase-major
    return table


class StatsEffect(Effect):
    def __init__(self, name, istream, selector, ref_level, width, interp):
        self.name = name
        self.istream = istream
        self.ostream = istream
        self.channel_selector = np.asarray(selector, dtype=bool).copy()
        self.flags = EFFECT_FLAG_NO_DITHER | EFFECT_FLAG_ALIGN_BARRIER | EFFECT_FLAG_CH_DEPS_IDENTITY
        self.sel_idx = np.flatnonzero(self.channel_selector)
        self.ref = ref_level
        self.width = width
        self.interp = interp
        self._table = _design_interp_filter() if interp else None
        self._final = None
        self._tail_padding = 0  # zero frames appended by the runner's final block

    def state0(self):
        n = len(self.sel_idx)
        big = 1e30
        return {
            "sum": np.zeros(n),
            "sum_sq": np.zeros(n),
            "min": np.full(n, big),
            "max": np.full(n, -big),
            "peak": np.zeros(n),
            "peak_count": np.zeros(n, dtype=np.int64),
            "peak_frame": np.zeros(n, dtype=np.int64),
            "samples": np.zeros((), dtype=np.int64),
            "tail": np.zeros((_TAPS_PER_PHASE, n)),  # history for -i filter continuity
        }

    def _oversample(self, xs, tail):
        import jax.numpy as jnp

        table = jnp.asarray(self._table, dtype=xs.dtype)  # [OS, T]
        T = table.shape[1]
        buf = jnp.concatenate([tail.astype(xs.dtype), xs], axis=0)  # [T_h + B, n]
        B = xs.shape[0]
        idx = np.arange(B)[:, None] + np.arange(T)[None, :]  # [B, T]
        windows = buf[idx]  # [B, T, n]
        up = jnp.einsum("pt,btn->bpn", table, windows)  # [B, OS, n]
        return up.reshape(B * _OS, -1)

    def step(self, state, x):
        import jax.numpy as jnp

        xs = x[:, self.sel_idx]
        B = xs.shape[0]
        s = state
        new = dict(s)
        new["sum"] = s["sum"] + xs.sum(axis=0)
        new["sum_sq"] = s["sum_sq"] + (xs * xs).sum(axis=0)
        if self.interp:
            up = self._oversample(xs, s["tail"])
            # quadratic refinement of local extrema of the oversampled signal
            y0, y1, y2 = up[:-2], up[1:-1], up[2:]
            denom = y0 - 2.0 * y1 + y2
            dy = y0 - y2
            p4 = jnp.where(jnp.abs(denom) > 0, dy / (8.0 * denom), 0.0)
            yq = y1 - dy * p4
            is_ext = ((y1 - y0) * (y1 - y2)) > 0
            cand = jnp.where(is_ext, yq, y1)
            track = jnp.concatenate([xs, cand], axis=0)
            new["tail"] = jnp.concatenate([s["tail"], xs], axis=0)[-s["tail"].shape[0] :]
        else:
            track = xs
        new["min"] = jnp.minimum(s["min"], track.min(axis=0))
        new["max"] = jnp.maximum(s["max"], track.max(axis=0))
        ax = jnp.abs(xs)
        bp = ax.max(axis=0)
        if self.interp:
            bp = jnp.maximum(bp, jnp.abs(track).max(axis=0))
        peak_new = jnp.maximum(s["peak"], bp)
        # occurrences of the (possibly new) peak in this block; first index
        eq = ax >= peak_new[None, :] * (1.0 - 1e-15)
        cnt = eq.sum(axis=0)
        first = jnp.argmax(eq, axis=0) + s["samples"]
        higher = bp > s["peak"]
        new["peak"] = peak_new
        new["peak_count"] = jnp.where(higher, cnt, s["peak_count"] + cnt)
        new["peak_frame"] = jnp.where(higher, first, s["peak_frame"])
        new["samples"] = s["samples"] + B
        return new, x

    def set_tail_padding(self, frames):
        """Runner reports trailing zero-pad frames so counters exclude them."""
        self._tail_padding = int(frames)

    def host_finish(self, state):
        s = {k: np.asarray(v) for k, v in state.items()}
        self._final = s
        n = len(self.sel_idx)
        samples = int(s["samples"]) - self._tail_padding
        s["samples"] = np.int64(samples)
        if samples <= 0:
            return
        width = self.width
        if width < 0:
            from dsp_tpu.cli import terminal

            width = terminal.term_width()
        cols = n if width == 0 else max((width - 18) // 13, 1)

        def db(v):
            with np.errstate(divide="ignore"):
                return 20.0 * np.log10(v)

        rows = [("Channel", [f"{int(self.sel_idx[i]):12d}" for i in range(n)])]
        rows.append(("DC offset", [f"{s['sum'][i] / samples:12.8f}" for i in range(n)]))
        rows.append(("Minimum", [f"{s['min'][i]:12.8f}" for i in range(n)]))
        rows.append(("Maximum", [f"{s['max'][i]:12.8f}" for i in range(n)]))
        rows.append(("Peak level (dBFS)", [f"{db(s['peak'][i]):12.4f}" for i in range(n)]))
        if self.ref is not None:
            rows.append(
                ("Peak level (dBr)", [f"{self.ref + db(s['peak'][i]):12.4f}" for i in range(n)])
            )
        rms = np.sqrt(s["sum_sq"] / samples)
        rows.append(("RMS level (dBFS)", [f"{db(rms[i]):12.4f}" for i in range(n)]))
        if self.ref is not None:
            rows.append(("RMS level (dBr)", [f"{self.ref + db(rms[i]):12.4f}" for i in range(n)]))
        rows.append(("Crest factor (dB)", [f"{db(s['peak'][i] / rms[i]):12.4f}" for i in range(n)]))
        rows.append(("Peak count", [f"{int(s['peak_count'][i]):12d}" for i in range(n)]))
        rows.append(("Peak sample", [f"{int(s['peak_frame'][i]):12d}" for i in range(n)]))
        rows.append(("Samples", [f"{samples:12d}" for _ in range(n)]))
        rows.append(("Length (s)", [f"{samples / self.ostream.fs:12.2f}" for _ in range(n)]))
        out = []
        for i0 in range(0, n, cols):
            for label, vals in rows:
                # C layout: "%-18s" then " %12..." per column (stats.c:170-249)
                out.append(f"{label:<18s}" + "".join(" " + v for v in vals[i0 : i0 + cols]))
            out.append("")
        log.info("\n" + "\n".join(out))


def stats_effect_init(ei, istream, selector, dir_, argv):
    name = argv[0]
    args = argv[1:]
    try:
        opts, ind = getopt(args, "w:i")
    except ParseError as e:
        raise EffectError(f"{name}: {e}")
    width = 80
    interp = False
    for opt, arg in opts:
        if opt == "w":
            if arg == "auto":
                width = -1
            else:
                v, rest = strtol(arg)
                if rest or v < 0:
                    raise EffectError(f"{name}: failed to parse width: {arg}")
                width = v
        elif opt == "i":
            interp = True
    args = args[ind:]
    ref = None
    if len(args) == 1:
        v, rest = strtod(args[0])
        if rest == args[0] or rest:
            raise EffectError(f"{name}: failed to parse ref_level: {args[0]}")
        ref = v  # printed as ref + dBFS (stats.c:186-188)
    elif len(args) > 1:
        raise EffectError(f"{name}: usage: {ei.usage}")
    return StatsEffect(name, istream, selector, ref, width, interp)


register_effect("stats", "stats [-i] [-w cols] [ref_level]", stats_effect_init)
