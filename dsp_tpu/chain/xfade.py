"""Chain crossfade: run old + new compiled chains on the same input and
blend linearly over EFFECTS_CHAIN_XFADE_TIME (reference:
/root/reference/effects_chain.c:1229-1274, effects_chain.h:61)."""

import numpy as np

XFADE_TIME_MS = 100.0


class ChainXfade:
    def __init__(self, old_cc, new_cc, fs):
        self.old = old_cc
        self.new = new_cc
        self.frames = int(round(XFADE_TIME_MS / 1000.0 * fs))
        self.pos = self.frames
        if (
            self.frames == 0
            or old_cc.chain.ostream.fs != new_cc.chain.ostream.fs
        ):
            self.pos = 0  # no crossfade possible

    @property
    def active(self):
        return self.pos > 0

    def run_block(self, x):
        """x: [B, in_ch] -> blended output; advances the fade position."""
        y_old = np.asarray(self.old.run_block(x), dtype=np.float64)
        y_new = np.asarray(self.new.run_block(x), dtype=np.float64)
        n_old = y_old.shape[1]
        n_new = y_new.shape[1]
        frames = len(y_new)
        # mismatched output channel counts: blend the common set, fade the rest
        n = max(n_old, n_new)
        out = np.zeros((frames, n))
        fade = np.clip(
            (self.pos - np.arange(frames)) / max(self.frames, 1), 0.0, 1.0
        )[:, None]
        out[:, :n_old] += y_old[:, :n_old] * fade
        out[:, :n_new] += y_new[:, :n_new] * (1.0 - fade)
        self.pos = max(0, self.pos - frames)
        return out[:, :n_new] if n_new <= n else out
