"""stats effect: per-channel statistics (reference: /root/reference/stats.c).

DC offset, min, max, peak dBFS, RMS dBFS, crest factor, peak count, peak
sample, samples, length — printed when processing finishes. Accumulators are
device-side reductions carried in the effect state; the host reads them at
the end (host_finish).

``-i`` enables true-peak estimation: the reference runs a gated 4x polyphase
upsampler + quadratic peak fit only near new extrema (stats.c:76-139); here
the whole block is 4x oversampled with the reference's exact 63-tap filter
and every local extremum is refined — same estimator applied everywhere
(>= the reference's coverage), fully vectorized. Output matches the C build
byte-for-byte including peak sample/count attribution.
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


_TAPS_PER_PHASE = 16

# the reference's 4x half filter with every 4th coefficient omitted
# (stats.c:78-87); the omitted phase is the identity (pass-through) tap
_R_COEFS = np.array([
    -9.353493881474939e-04, -2.811275711123766e-03, -3.165361696477658e-03,
    +5.929994218827107e-03, +1.065865725083938e-02, +9.308373173634579e-03,
    -1.340062089976642e-02, -2.227979776029874e-02, -1.833945608477310e-02,
    +2.430932418366197e-02, +3.925899279385184e-02, +3.157919724264597e-02,
    -4.056172445833198e-02, -6.489751870004079e-02, -5.192701793078084e-02,
    +6.684049697012354e-02, +1.078342211598459e-01, +8.751763525896815e-02,
    -1.187292496637064e-01, -2.001458972657618e-01, -1.729186314209981e-01,
    +2.957854651930789e-01, +6.325370350028462e-01, +8.988707620097378e-01,
])


def _design_interp_filter(taps_per_phase=_TAPS_PER_PHASE):
    """The reference's exact 63-tap symmetric 4x interpolator, phase-major
    [OS, taps] (reconstructed from the ring-buffer inserts in
    stats.c:76-111: h[4g+k] = r[3g+k], center tap 1.0 at index 31,
    mirrored)."""
    h = np.zeros(_OS * taps_per_phase)
    for g in range(8):
        for k in range(3):
            h[4 * g + k] = _R_COEFS[3 * g + k]
    h[31] = 1.0
    for t in range(32, 63):
        h[t] = h[62 - t]
    table = np.zeros((_OS, taps_per_phase))
    for phi in range(_OS):
        for j in range(taps_per_phase):
            table[phi, j] = h[4 * j + phi]
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
        if self.interp:
            # interp extrema are attributed to input frame (j+1)//4 - 8
            # (group - 9; calibrated against stats.c's samples - (STATS_INTERP_DELAY-1))
            a_ext = jnp.where(is_ext, jnp.abs(yq), 0.0)
            nj = a_ext.shape[0]
            f_ext = s["samples"] + (jnp.arange(nj) + 1) // 4 - 9
            a_all = jnp.concatenate([ax, a_ext], axis=0)
            f_all = jnp.concatenate(
                [s["samples"] + jnp.arange(B), f_ext], axis=0
            )
            bp = a_all.max(axis=0)
        else:
            a_all = ax
            f_all = s["samples"] + jnp.arange(B)
            bp = ax.max(axis=0)
        peak_new = jnp.maximum(s["peak"], bp)
        # occurrences of the (possibly new) peak in this block; first frame
        eq = a_all >= peak_new[None, :] * (1.0 - 1e-15)
        cnt = eq.sum(axis=0)
        big = np.int64(1 << 62)
        first = jnp.where(eq, f_all[:, None], big).min(axis=0)
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
