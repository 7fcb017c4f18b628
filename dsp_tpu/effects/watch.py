"""watch effect: sub-chain hot reload (reference: /root/reference/watch.c).

Loads an effects file into a nested sub-chain and polls its mtime (1 Hz
thread in the reference; polled from the runner here). Reload constraints
match watch.c:60-92: the new sub-chain must keep the output fs/channels.

TPU adaptation: the reference swaps the sub-chain under a mutex with a 100 ms
crossfade inside the effect (watch.c:132-155). Here a reload triggers a
*chain-level* rebuild + crossfade through the runner's xfade machinery (the
same path as the interactive 'e' rebuild), because the jitted pipeline is
recompiled as a whole. Auto-dither is disabled inside (watch.c:84).
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
        try:
            self._mtime = os.stat(self.path).st_mtime
        except OSError:
            self._mtime = 0.0
        self._last_poll = time.monotonic()
        self.reload_requested = False

    @property
    def ratio(self):
        return self.sub.ratio

    def state0(self):
        return [e.state0() for e in self.sub.effects if not getattr(e, "runtime_noop", False)]

    def state_for_block(self, B):
        states = []
        from fractions import Fraction

        frames = Fraction(B)
        for e in self.sub.effects:
            if not getattr(e, "runtime_noop", False):
                if hasattr(e, "state_for_block"):
                    states.append(e.state_for_block(int(frames)))
                else:
                    states.append(e.state0())
            frames *= e.ratio
        return states

    def step(self, state, x):
        new_states = []
        i = 0
        for e in self.sub.effects:
            if getattr(e, "runtime_noop", False):
                continue
            st, x = e.step(state[i], x)
            new_states.append(st)
            i += 1
        return new_states, x

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
