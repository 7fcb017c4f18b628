"""watch effect: sub-chain hot reload (reference: /root/reference/watch.c).

Loads an effects file into a nested sub-chain and polls its mtime (1 Hz
thread in the reference; polled from the runner here). Reload constraints
match watch.c:60-92: the new sub-chain must keep the output fs/channels.

TPU adaptation: like the reference, the crossfade is SCOPED TO THE SUB-CHAIN
(watch.c:132-155): on reload the effect holds both the old and the new
sub-chain, runs both inside its step with the reference's linear ramp
(effects_chain.c:1236-1239, counting down over 100 ms) and then drops the old
one. The rest of the chain's filter state is untouched — only the outer jit
is retraced (CompiledChain.retrace), carrying every other effect's state
across the swap. Auto-dither is disabled inside (watch.c:84).
"""

import os
import time

import numpy as np

from dsp_tpu.core import log
from dsp_tpu.core.parse import construct_full_path, num_bits_set, parse_selector
from dsp_tpu.core.types import StreamInfo
from dsp_tpu.effects.base import Effect, EffectError, register_effect

EOF_MARKER = "#EOF#"


class WatchEffect(Effect):
    split_safe = False  # hot-reload swaps state mid-stream

    def __init__(self, name, istream, selector, dir_, path, enforce_eof):
        from dsp_tpu.chain.chain import Chain, finish_chain
        from dsp_tpu.chain.parser import ChainParseError, parse_file_into

        self.name = name
        self.istream = istream
        self.channel_selector = np.asarray(selector, dtype=bool).copy()
        self.path = construct_full_path(dir_, path, istream.fs, num_bits_set(selector))
        self.enforce_eof = enforce_eof
        self._dir = os.path.dirname(self.path) or "."
        chain = Chain(istream=istream, ostream=istream)
        sref = [istream]
        try:
            parse_file_into(
                chain, self.path, None, sref, self.channel_selector, enforce_eof
            )
        except ChainParseError as e:
            raise EffectError(f"{name}: {e}")
        finish_chain(chain)
        self.sub = chain
        self.ostream = chain.ostream
        # export the sub-chain's block quantum (e.g. a resample inside the
        # watch needs outer blocks to be multiples of its in_len)
        from dsp_tpu.chain.chain import block_quantum_for

        self.block_quantum = block_quantum_for(chain.effects)
        try:
            self._mtime = os.stat(self.path).st_mtime
        except OSError:
            self._mtime = 0.0
        self._last_poll = time.monotonic()
        self.reload_requested = False
        self.sub_old = None  # old sub-chain while crossfading
        # XFADE_TIME = 100 ms (effects_chain.h:61, watch.c crossfade)
        self.fade_frames = int(round(istream.fs * 0.1))

    @property
    def ratio(self):
        return self.sub.ratio

    @staticmethod
    def _sub_states(chain, B):
        from fractions import Fraction

        states = []
        frames = Fraction(B if B is not None else 0)
        for e in chain.effects:
            if not getattr(e, "runtime_noop", False):
                if hasattr(e, "state_for_block") and B is not None:
                    states.append(e.state_for_block(int(frames)))
                else:
                    states.append(e.state0())
            frames *= e.ratio
        return states

    def state0(self):
        return self.state_for_block(None)

    def state_for_block(self, B):
        st = self._sub_states(self.sub, B)
        if self.sub_old is not None:
            return {
                "old": self._sub_states(self.sub_old, B),
                "new": st,
                "t": np.int64(self.fade_frames),
            }
        return st

    @staticmethod
    def _run_sub(chain, states, x):
        new_states = []
        i = 0
        for e in chain.effects:
            if getattr(e, "runtime_noop", False):
                continue
            st, x = e.step(states[i], x)
            new_states.append(st)
            i += 1
        return new_states, x

    def step(self, state, x):
        if self.sub_old is None:
            return self._run_sub(self.sub, state, x)
        # crossfade: run BOTH sub-chains on the same input and mix with the
        # reference's linear ramp — m = (n - pos)/n with pos counting down
        # per output sample (effects_chain.c:1236-1274, watch.c:132-155)
        import jax.numpy as jnp

        old_st, y_old = self._run_sub(self.sub_old, state["old"], x)
        new_st, y_new = self._run_sub(self.sub, state["new"], x)
        B = y_old.shape[0]
        n = self.fade_frames
        pos = jnp.maximum(state["t"] - jnp.arange(B, dtype=np.int64), 0)
        m = jnp.where(pos > 0, (n - pos).astype(x.dtype) / n, 1.0)[:, None]
        y = y_new * m + y_old * (1.0 - m)
        t_new = jnp.maximum(state["t"] - B, 0)
        return {"old": old_st, "new": new_st, "t": t_new}, y

    # --- host-side reload protocol (driven by the runner) ---

    def apply_reload(self, B=None):
        """Swap in the new sub-chain and enter the crossfade. Returns False
        if the new chain fails to build, changes the output stream, or needs
        a block size incompatible with the running pipeline — the reference's
        reload rejections (watch.c:60-92: same fs/channels, no larger
        buffers). B is the block size at this effect's position."""
        from fractions import Fraction

        from dsp_tpu.chain.chain import Chain, finish_chain
        from dsp_tpu.chain.parser import ChainParseError, parse_file_into
        from dsp_tpu.effects.base import EffectError

        if self.sub_old is not None:
            # mid-crossfade: the runner defers pending reloads until the
            # fade completes (watch.c:135); swapping now would nest fade
            # state dicts and corrupt the stream state
            return False
        chain = Chain(istream=self.istream, ostream=self.istream)
        sref = [self.istream]
        try:
            parse_file_into(chain, self.path, None, sref, self.channel_selector, self.enforce_eof)
            finish_chain(chain)
        except (ChainParseError, EffectError) as e:
            log.error("%s: error: %s", self.name, e)
            return False
        if chain.ostream.fs != self.ostream.fs or chain.ostream.channels != self.ostream.channels:
            log.error("%s: error: new chain changes output stream", self.name)
            return False
        if B is not None:
            frames = Fraction(B)
            for e in chain.effects:
                q = int(getattr(e, "block_quantum", 1))
                if frames.denominator != 1 or int(frames) % q != 0:
                    log.error(
                        "%s: error: new chain needs a block quantum "
                        "incompatible with the running block size (%d)",
                        self.name, B,
                    )
                    return False
                frames *= e.ratio
            if frames.denominator != 1:
                log.error("%s: error: new chain's rate ratios do not divide "
                          "the running block size (%d)", self.name, B)
                return False
        self.sub_old = self.sub
        self.sub = chain
        return True

    def xfade_state_entry(self, current_entry, B):
        """State override for CompiledChain.retrace when entering the fade:
        the old sub keeps its live state, the new sub starts fresh."""
        return {
            "old": current_entry,
            "new": self._sub_states(self.sub, B),
            "t": np.int64(self.fade_frames),
        }

    @staticmethod
    def xfade_done(state_entry):
        return isinstance(state_entry, dict) and int(np.asarray(state_entry["t"])) == 0

    def finish_xfade(self, state_entry):
        """Drop the old sub-chain; returns the new sub's state entry."""
        self.sub_old = None
        return state_entry["new"]

    def channel_offsets(self):
        # aggregate the sub-chain's net latency per output channel by
        # walking its effects (sub-chain aligns internally via finish_chain)
        n = self.ostream.channels
        lat = np.zeros(n, dtype=np.int64)
        req = np.zeros(n, dtype=np.int64)
        from fractions import Fraction

        total = Fraction(0)
        r = Fraction(1)
        for e in self.sub.effects:
            el, er = e.channel_offsets()
            if len(el):
                total += Fraction(int(el.max()), 1)
            r *= e.ratio
        lat[:] = int(total)
        return lat, req

    def drain_samples(self, samples):
        for e in self.sub.effects:
            e.drain_samples(samples)

    def plot(self, idx, channel_offset=0):
        return None  # watch.c sets no plot hook: plotting is unsupported

    def host_update(self, state):
        now = time.monotonic()
        if now - self._last_poll < 1.0:
            return
        self._last_poll = now
        try:
            mt = os.stat(self.path).st_mtime
        except OSError:
            return
        if mt != self._mtime:
            self._mtime = mt
            if self._validate_reload():
                self.reload_requested = True

    def _validate_reload(self):
        from dsp_tpu.chain.chain import Chain, finish_chain
        from dsp_tpu.chain.parser import ChainParseError, parse_file_into

        chain = Chain(istream=self.istream, ostream=self.istream)
        sref = [self.istream]
        try:
            parse_file_into(chain, self.path, None, sref, self.channel_selector, self.enforce_eof)
            finish_chain(chain)
        except ChainParseError as e:
            log.error("%s: error: %s", self.name, e)
            return False
        if chain.ostream.fs != self.ostream.fs or chain.ostream.channels != self.ostream.channels:
            log.error(
                "%s: error: new chain changes output stream (fs=%d ch=%d)",
                self.name, chain.ostream.fs, chain.ostream.channels,
            )
            return False
        log.verbose("%s: info: reload validated: %s", self.name, self.path)
        return True


def watch_effect_init(ei, istream, selector, dir_, argv):
    name = argv[0]
    args = argv[1:]
    enforce_eof = False
    if args and args[0] == "-e":
        enforce_eof = True
        args = args[1:]
    if len(args) != 1:
        raise EffectError(f"{name}: usage: {ei.usage}")
    return WatchEffect(name, istream, selector, dir_, args[0], enforce_eof)


register_effect("watch", "watch [-e] [~/]path", watch_effect_init)
