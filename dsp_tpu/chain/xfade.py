"""Chain crossfade: run old + new compiled chains on the same input and
blend linearly over EFFECTS_CHAIN_XFADE_TIME (reference:
/root/reference/effects_chain.c:1229-1274, effects_chain.h:61).

The fade length is measured at the OUTPUT rate (dsp.c:1363 computes it
from the post-build stream) and the new chain's output-side discard is
end-aligned away: its first ``output_discard`` frames are pre-alignment
junk, so the old chain plays alone while they are dropped and the blend
pairs old frame i with new valid frame i (the analog of the reference's
end-alignment of a shorter new-chain block, effects_chain.c:1253-1259).
The caller must NOT apply the outer discard on top (StreamLoop.rebuild
zeroes discard_left when installing the fade)."""

import numpy as np

XFADE_TIME_MS = 100.0


class ChainXfade:
    def __init__(self, old_cc, new_cc, fs=None):
        self.old = old_cc
        self.new = new_cc
        out_fs = new_cc.chain.ostream.fs
        self.frames = int(round(XFADE_TIME_MS / 1000.0 * out_fs))
        self.pos = self.frames
        self._skip = int(new_cc.chain.output_discard)
        self._new_carry = np.zeros((0, new_cc.chain.ostream.channels))
        if (
            self.frames == 0
            or old_cc.chain.ostream.fs != new_cc.chain.ostream.fs
            or old_cc.chain.ostream.channels != new_cc.chain.ostream.channels
        ):
            # the reference skips the crossfade entirely when the streams
            # are incompatible (dsp.c:1365-1366)
            self.pos = 0

    @property
    def active(self):
        return self.pos > 0

    def run_block(self, x):
        """x: [B, in_ch] -> blended output; advances the fade position."""
        # dispatch BOTH chains before any d2h fetch so the second chain's
        # compute overlaps the first's transfer (the tunnel round trip per
        # fetch would otherwise serialize, doubling realtime latency)
        yo_dev = self.old.run_block(x)
        yn_dev = self.new.run_block(x)
        y_old = np.asarray(yo_dev, dtype=np.float64)
        y_new = np.asarray(yn_dev, dtype=np.float64)
        # drop the new chain's pre-alignment frames, then pair old frame i
        # with new VALID frame i via a carry (deficit frames play old-only)
        if self._skip:
            d = min(self._skip, len(y_new))
            y_new = y_new[d:]
            self._skip -= d
        self._new_carry = (
            np.concatenate([self._new_carry, y_new], axis=0)
            if len(self._new_carry)
            else y_new
        )
        frames = len(y_old)
        take = min(frames, len(self._new_carry))
        fade = np.clip(
            (self.pos - np.arange(frames)) / max(self.frames, 1), 0.0, 1.0
        )[:, None]
        out = y_old * fade
        w = 1.0 - fade[:take]
        out[:take] += self._new_carry[:take] * w
        # deficit tail (only during the first blocks): old plays at full
        # weight there regardless of the ramp
        if take < frames:
            out[take:] = y_old[take:]
        self._new_carry = self._new_carry[take:]
        self.pos = max(0, self.pos - frames)
        return out
