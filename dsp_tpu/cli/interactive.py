"""Interactive transport, event loop, and ABX comparator
(reference: /root/reference/dsp.c:286-342, 881-1036, 1288-1455).

Events come from a raw-terminal key-reader thread and python signal handlers
(the reference uses a dedicated sigwait thread; Python delivers signals to
the main thread, so handlers push into the same queue). Keys match the
reference: h , . < > r n c e v s q and ^L.
"""

import math
import os
import queue
import signal
import sys
import threading
import time

import numpy as np

from dsp_tpu import config
from dsp_tpu.chain import CompiledChain, build_chain_from_args
from dsp_tpu.chain.chain import chain_needs_dither, chain_set_dither_params, signal_chain
from dsp_tpu.chain.xfade import ChainXfade
from dsp_tpu.core import log
from dsp_tpu.core.parse import format_dur
from dsp_tpu.core.types import StreamInfo
from dsp_tpu.cli import terminal

INTERACTIVE_HELP = """\
  h    : display this help
  ,/.  : seek backward/forward 5s
  </>  : seek backward/forward 30s
  r    : restart current input
  n    : skip current input
  c    : pause
  e    : rebuild effects chain
  v    : toggle verbose progress display
  s    : send signal to effects chain
  q    : quit
"""

ABX_FADE_MS = 50.0


class EventQueue:
    def __init__(self):
        self.q = queue.Queue(maxsize=64)

    def push(self, type_, val):
        try:
            self.q.put_nowait((type_, val))
        except queue.Full:
            pass

    def pop(self, block=False, timeout=None):
        try:
            return self.q.get(block=block, timeout=timeout)
        except queue.Empty:
            return None


class KeyReader:
    """Raw-terminal key reader thread (dsp.c:328-342)."""

    def __init__(self, evq):
        self.evq = evq
        self._stop = threading.Event()
        self._fd = None
        self._saved = None
        self._thread = None

    def start(self):
        import termios
        import tty

        self._stop.clear()  # restartable after a suspend/resume cycle
        try:
            self._fd = os.open("/dev/tty", os.O_RDONLY)
        except OSError:
            return False
        self._saved = termios.tcgetattr(self._fd)
        mode = termios.tcgetattr(self._fd)
        mode[3] &= ~(termios.ICANON | termios.ECHO)
        mode[6][termios.VMIN] = 0
        mode[6][termios.VTIME] = 1
        termios.tcsetattr(self._fd, termios.TCSANOW, mode)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return True

    def _run(self):
        while not self._stop.is_set():
            try:
                c = os.read(self._fd, 1)
            except OSError:
                break
            if c:
                self.evq.push("key", c.decode("latin1"))

    def stop(self):
        import termios

        self._stop.set()
        if self._thread:
            self._thread.join(timeout=0.5)
        if self._fd is not None and self._saved is not None:
            termios.tcsetattr(self._fd, termios.TCSANOW, self._saved)
            os.close(self._fd)
            self._fd = None


def install_signal_handlers(evq):
    def handler(sig, frame):
        evq.push("signal", sig)

    for s in (signal.SIGINT, signal.SIGTERM, signal.SIGUSR1, signal.SIGUSR2):
        signal.signal(s, handler)
    try:
        signal.signal(signal.SIGWINCH, handler)
        signal.signal(signal.SIGTSTP, handler)
    except (AttributeError, ValueError):
        pass


class StreamLoop:
    """Block-at-a-time processing loop with events, seek, crossfade, watch."""

    def __init__(self, state, chain_args, stream, out_writer, out_codec):
        self.state = state
        self.chain_args = chain_args
        self.stream = stream
        self.writer = out_writer
        self.out_codec = out_codec
        self.evq = EventQueue()
        self.chain = None
        self.cc = None
        self.xfade = None
        self.discard_left = 0
        self.quit = False
        self.next_input = False
        self.paused = False
        self.carry_stale = False  # set by do_seek: caller drops its carry
        self.verbose_progress = state.verbose_progress
        self._last_progress = 0.0
        self._keys = None
        self.rb = None  # ReadBuffer (set by run_interactive)
        self.fed_frames = 0  # real input frames fed since the last reset
        self._build_chain()

    def _build_chain(self):
        from dsp_tpu.chain.chain import warm_d2h_async

        warm_d2h_async()  # interactive mode always fetches audio
        self.chain = build_chain_from_args(self.chain_args, self.stream)
        self.cc = CompiledChain(self.chain, block_frames=self.state.block_frames)
        self.fed_frames = 0
        self.discard_left = self.chain.output_discard
        self._apply_dither()

    def _apply_dither(self):
        from dsp_tpu.cli.main import should_dither

        in_codec = self.state.inputs[0].codec if self.state.inputs else None
        if in_codec is None:
            return
        needs = chain_needs_dither(self.chain)
        do = should_dither(in_codec, self.out_codec, needs, self.state.force_dither)
        self.writer.add_dither = chain_set_dither_params(self.chain, self.out_codec.prec, do)

    def rebuild(self, force_crossfade=False):
        """Rebuild the chain. Reference semantics (dsp.c:1355-1390): with -E
        (drain_effects off) and not paused, crossfade old->new; otherwise
        drain the old chain first, then swap. watch reloads always crossfade
        (watch.c:132-155), hence force_crossfade."""
        log.info("info: rebuilding effects chain")
        old_cc = self.cc
        old_chain = self.chain
        try:
            new_chain = build_chain_from_args(self.chain_args, self.stream)
        except Exception as e:
            log.error("error: failed to rebuild chain: %s", e)
            return
        new_cc = CompiledChain(new_chain, block_frames=self.state.block_frames)
        do_xfade = force_crossfade or (not self.paused and not self.state.drain_effects)
        if do_xfade:
            self.xfade = ChainXfade(old_cc, new_cc, self.stream.fs)
        else:
            self.xfade = None
            if not self.paused and old_chain.drain_frames > 0:
                B = old_cc.block_frames
                n = old_chain.drain_frames
                pad = -(-n // B) * B
                # trim in OUTPUT frames: the drain budget is
                # drain_out_frames at the output rate (input-frame counts
                # would mis-trim rate-changing chains)
                out_budget = old_chain.drain_out_frames
                zeros = np.zeros((pad, self.stream.channels))
                for i in range(0, pad, B):
                    y = np.asarray(old_cc.run_block(zeros[i : i + B]), dtype=np.float64)
                    keep = min(out_budget, len(y))
                    if keep > 0:
                        self.writer.write(y[:keep])
                        out_budget -= keep
        self.chain = new_chain
        self.cc = new_cc
        # the crossfade end-aligns the new chain's output_discard internally
        # (ChainXfade docstring): applying the outer discard too would cut
        # valid old-chain audio out of the blended stream
        self.discard_left = 0 if self.xfade is not None else new_chain.output_discard
        self._apply_dither()

    def check_watch_reload(self):
        """Sub-chain-scoped reload (watch.c:132-155): swap only the watch
        effect's sub-chain and crossfade inside it, preserving every other
        effect's live filter state (no chain-level rebuild)."""
        hit = False
        self.cc.finish_watch_fades()
        for e in self.chain.effects:
            if getattr(e, "reload_requested", False):
                # like the reference (watch.c:135 `update_chain && pos == 0`),
                # a reload arriving mid-crossfade stays pending until the
                # active fade completes — swapping now would nest fade states
                if getattr(e, "sub_old", None) is not None:
                    continue
                e.reload_requested = False
                if self.cc.watch_swap(e):
                    log.verbose("%s: info: reloaded %s", e.name, e.path)
                    hit = True
        return hit

    def process_block(self, x):
        if self.xfade is not None and self.xfade.active:
            y = self.xfade.run_block(x)
            if not self.xfade.active:
                self.xfade = None
                log.verbose("info: end of crossfade")
        else:
            if self.xfade is not None:
                self.xfade = None
            y = np.asarray(self.cc.run_block(x), dtype=np.float64)
        if self.discard_left:
            d = min(self.discard_left, len(y))
            y = y[d:]
            self.discard_left -= d
        self.cc.host_update()
        self.check_watch_reload()
        return y

    def chain_delay_sec(self):
        return self.chain.delay_frames() / self.stream.fs

    def handle_events(self, inp, pos):
        """Process pending events; returns new position."""
        while True:
            ev = self.evq.pop(block=self.paused, timeout=0.1 if self.paused else None)
            if ev is None:
                if self.paused:
                    continue
                break
            typ, val = ev
            if typ == "signal":
                if val in (signal.SIGINT, signal.SIGTERM):
                    self.quit = True
                    return pos
                if val == signal.SIGUSR1:
                    self.rebuild()
                elif val == signal.SIGUSR2:
                    signal_chain(self.chain)
                    self.cc.host_update()
                elif val == getattr(signal, "SIGTSTP", None):
                    # graceful job control (dsp.c:800-820): restore the
                    # terminal, re-raise with the default handler, restore
                    # raw mode on resume
                    self._suspend()
            elif typ == "key":
                pos = self.handle_key(val, inp, pos)
            if self.quit or self.next_input:
                return pos
        return pos

    def _suspend(self):
        from dsp_tpu.cli import terminal

        terminal.disable()
        if self._keys is not None:
            self._keys.stop()
        signal.signal(signal.SIGTSTP, signal.SIG_DFL)
        os.kill(os.getpid(), signal.SIGTSTP)
        # resumed:
        install_signal_handlers(self.evq)
        if self._keys is not None:
            self._keys.start()
        terminal.enable()

    def handle_key(self, key, inp, pos):
        fs = inp.codec.fs
        if key == "h":
            log.info("\n%s", INTERACTIVE_HELP)
        elif key == ",":
            pos = self.do_seek(inp, pos, -5 * fs)
        elif key == ".":
            pos = self.do_seek(inp, pos, 5 * fs)
        elif key == "<":
            pos = self.do_seek(inp, pos, -30 * fs)
        elif key == ">":
            pos = self.do_seek(inp, pos, 30 * fs)
        elif key == "r":
            pos = self.do_seek(inp, pos, None, absolute=inp.start_pos)
        elif key == "n":
            self.next_input = True
        elif key == "c":
            self.paused = not self.paused
            if self.rb is not None:
                self.rb.pause(self.paused)  # pauses REALTIME capture codecs
        elif key == "e":
            self.rebuild()
        elif key == "v":
            self.verbose_progress = not self.verbose_progress
        elif key == "s":
            signal_chain(self.chain)
            self.cc.host_update()
        elif key == "q":
            self.quit = True
        elif key == "\x0c":
            sys.stderr.write("\033[2J\033[H")
        return pos

    def do_seek(self, inp, pos, offset, absolute=None):
        """Seek with chain+output-latency compensation (dsp.c:709-733)."""
        out_delay = getattr(self.writer, "delay", lambda: 0)()
        if absolute is not None:
            target = absolute
        else:
            delay = int(self.chain_delay_sec() * inp.codec.fs)
            # output buffer delay is in output-rate frames; convert
            r = float(self.chain.ratio) or 1.0
            delay += int(out_delay / r)
            target = pos + offset - delay
        target = max(inp.start_pos, target)
        # through the read buffer: drops already-decoded stale blocks under
        # the reader lock, so no pre-seek audio can reach the chain
        got = self.rb.seek(target) if self.rb is not None else inp.codec.seek(target)
        if got >= 0:
            self.cc.reset()
            self.fed_frames = 0
            self.discard_left = self.chain.output_discard
            self.xfade = None
            self.carry_stale = True  # drop the B-alignment carry (pre-seek audio)
            drop = getattr(self.writer, "drop", None)
            if drop:
                drop()  # discard buffered output (dsp.c:724-727)
            return got
        return pos

    def update_progress(self, inp, pos, force=False):
        if not self.state.show_progress:
            return
        now = time.monotonic()
        if not force and now - self._last_progress < 0.1:
            return
        self._last_progress = now
        fs = inp.codec.fs
        frames = inp.codec.frames
        cur = format_dur(pos / fs)
        if frames and frames > 0:
            total = format_dur(frames / fs)
            pct = f"{100.0 * pos / frames:5.1f}%"
            rem = format_dur(max(frames - pos, 0) / fs)
            line = f"{'|paused|' if self.paused else '>'} {cur} [{pct}] of {total} -{rem}"
        else:
            line = f"{'|paused|' if self.paused else '>'} {cur}"
        if self.verbose_progress:
            line += f"  lat:{self.chain_delay_sec() * 1000:.1f}ms peak:{20 * np.log10(max(self.state.peak, 1e-10)):+.1f}dBFS"
        terminal.set_progress(line)
        terminal.update()


def run_interactive(state, chain_args, stream, writer, out_codec, enable_ui=True):
    """Main interactive loop over the input list (dsp.c:1288-1455).

    enable_ui=False runs the same streaming loop (needed for watch's
    per-block reload checks) WITHOUT key or terminal handling — the
    non-interactive watch case (-I, or no interactive output device)."""
    loop = StreamLoop(state, chain_args, stream, writer, out_codec)
    install_signal_handlers(loop.evq)
    started = False
    keys = None
    if enable_ui:
        keys = KeyReader(loop.evq)
        started = keys.start()
        loop._keys = keys if started else None
        terminal.enable()
    B = loop.cc.block_frames
    from dsp_tpu.cli.readbuf import ReadBuffer

    rb = ReadBuffer(
        state.inputs,
        B,
        n_blocks=min(64, max(2, max((i.codec.buf_ratio for i in state.inputs), default=8))),
    )
    loop.rb = rb

    def flush_tail(carry, drain_n):
        """Feed the carried partial block plus drain_n frames of silence,
        padded to whole blocks, and trim the written output to EXACTLY
        ceil((len(carry)+drain_n)*ratio) post-discard frames — the
        reference's drain accounting rounds pending input up at each rate
        change (ratio_mult_ceil, effects_chain.c:1186-1218, resample.c
        drain2). Without the trim, the B-alignment zero padding would
        append spurious output frames."""
        from dsp_tpu.chain.chain import expected_out_frames

        Bq = loop.cc.block_frames
        total = len(carry) + drain_n
        if total == 0:
            return
        # stop measurement effects (stats) at the true stream end so the
        # B-alignment zero padding never enters their accumulators (the
        # run_offline path does the same via set_valid_frames)
        loop.cc.set_valid_frames(loop.fed_frames + total)
        expect = expected_out_frames(loop.chain, len(carry), drain=bool(drain_n))
        b_out = int(Bq * loop.chain.ratio)
        n_blocks = max(-(-total // Bq), -(-expect // b_out)) if expect else -(-total // Bq)
        padded = np.concatenate(
            [carry, np.zeros((n_blocks * Bq - len(carry), stream.channels))], axis=0
        )
        written = 0
        for i in range(0, len(padded), Bq):
            y = loop.process_block(padded[i : i + Bq])
            keep = min(len(y), expect - written)
            if keep > 0:
                writer.write(y[:keep])
                written += keep

    try:
        idx = 0
        # B-alignment carry: persists ACROSS inputs (concatenate mode feeds
        # the chain one continuous stream — no zero padding between inputs)
        carry = np.zeros((0, stream.channels))
        while idx < len(state.inputs) and not loop.quit:
            inp = state.inputs[idx]
            loop.next_input = False
            pos = inp.start_pos
            # wrapped display span for -l repeats (the read buffer handles
            # the actual looping, codec_buf.c:308-317)
            span = 0
            if inp.repeats != 0:
                if inp.end_pos >= 0:
                    span = inp.end_pos - inp.start_pos
                elif inp.codec.frames and inp.codec.frames > 0:
                    span = inp.codec.frames - inp.start_pos
            from dsp_tpu.cli.main import _print_io_info

            _print_io_info(inp.codec, "input")
            while not loop.quit and not loop.next_input:
                pos = loop.handle_events(inp, pos)
                if loop.carry_stale:
                    carry = carry[:0]  # seek: drop pre-seek alignment carry
                    loop.carry_stale = False
                if loop.quit or loop.next_input:
                    break
                want = B - len(carry)
                buf = rb.read(want)
                pos += len(buf)
                if span > 0 and pos >= inp.start_pos + span:
                    pos = inp.start_pos + (pos - inp.start_pos) % span
                at_end = rb.end_of_input()
                if len(buf):
                    carry = np.concatenate([carry, buf], axis=0) if len(carry) else buf
                if len(carry) >= B:
                    block = carry[:B]
                    carry = carry[B:]
                    loop.fed_frames += B
                    y = loop.process_block(block)
                    writer.write(y)
                    loop.update_progress(inp, pos)
                if at_end:
                    break  # partial carry continues into the next input
            if loop.next_input:
                rb.skip()  # drop queued blocks of the abandoned input
                carry = carry[:0]  # and the stale alignment carry
            idx += 1
            if idx < len(state.inputs):
                rb.next_input()
            if idx < len(state.inputs):
                nxt = state.inputs[idx]
                if (
                    nxt.codec.fs != stream.fs
                    or nxt.codec.channels != stream.channels
                ):
                    log.info("info: input sample rate and/or channels changed; rebuilding effects chain")
                    # finish the old chain exactly: flush the carried
                    # partial + drain, with output trimmed (dsp.c:1444-1452)
                    flush_tail(
                        carry,
                        loop.chain.drain_frames if state.drain_effects else 0,
                    )
                    carry = np.zeros((0, nxt.codec.channels))
                    stream = StreamInfo(nxt.codec.fs, nxt.codec.channels)
                    loop.stream = stream
                    loop._build_chain()
                    B = loop.cc.block_frames  # quantization may differ
                    if (
                        writer.codec.fs != loop.chain.ostream.fs
                        or writer.codec.channels != loop.chain.ostream.channels
                    ):
                        # REOPEN_OUTPUT (dsp.c:1448-1452): the old codec
                        # cannot take the new format; drain, close, reopen
                        from dsp_tpu.cli.main import _reopen_output

                        log.info("info: reopening output for new stream format")
                        writer.drain()
                        writer.codec.close()
                        new_out = _reopen_output(state, loop.chain)
                        writer.codec = new_out
                        loop.out_codec = new_out
                        loop._apply_dither()
        # final flush + drain with exact output-length accounting
        drain_n = (
            loop.chain.drain_frames
            if (not loop.quit and state.drain_effects and loop.chain.drain_frames > 0)
            else 0
        )
        if not loop.quit:
            flush_tail(carry, drain_n)
        loop.cc.host_finish()
    finally:
        rb.close()
        if enable_ui:
            terminal.disable()
        if started:
            keys.stop()
    if rb.error is not None:
        log.error("error: input: %s", rb.error)
        return 1
    return 0


# --- ABX comparator (dsp.c:881-1036) ---


def run_abx(state, chain_args, stream, writer, out_codec, n_trials):
    inputs = state.inputs
    if len(inputs) != 2:
        log.error("error: ABX mode requires exactly two inputs")
        return 1
    a, b = inputs[0].codec, inputs[1].codec
    if a.frames != b.frames or a.frames <= 0:
        log.error("error: ABX inputs must have equal (known) length")
        return 1
    loop = StreamLoop(state, chain_args, stream, writer, out_codec)
    install_signal_handlers(loop.evq)
    keys = KeyReader(loop.evq)
    started = keys.start()
    terminal.enable()
    B = loop.cc.block_frames
    fs = stream.fs
    fade_frames = int(round(ABX_FADE_MS / 1000.0 * fs))
    rng = np.random.default_rng()
    x_is_b = rng.integers(0, 2, n_trials).astype(bool)
    correct = 0
    try:
        trial = 0
        cur = "A"  # currently playing: A, B, or X
        sel = None
        switch_from = None
        switch_pos = 0
        pos = 0

        def codec_for(label):
            if label == "A":
                return a
            if label == "B":
                return b
            return b if x_is_b[trial] else a

        def set_status():
            s = f"ABX trial {trial + 1} of {n_trials} / playing: {cur}"
            if sel:
                s += f" / current choice: X is {sel}"
            terminal.set_progress(s)
            terminal.update()

        set_status()
        while trial < n_trials and not loop.quit:
            ev = loop.evq.pop()
            while ev is not None:
                typ, val = ev
                if typ == "signal" and val in (signal.SIGINT, signal.SIGTERM):
                    loop.quit = True
                elif typ == "key":
                    k = val.lower()
                    if k in ("a", "b", "x"):
                        nxt = k.upper()
                        if val in ("A", "B"):
                            sel = val
                        elif nxt != cur:
                            switch_from = cur
                            switch_pos = fade_frames
                            cur = nxt
                    elif val in ("\n", "\r") and sel is not None:
                        log.info("info: ABX trial %d: choice: X is %s", trial + 1, sel)
                        if (sel == "B") == bool(x_is_b[trial]):
                            correct += 1
                        trial += 1
                        sel = None
                        if trial >= n_trials:
                            break
                    elif k == "q":
                        loop.quit = True
                    set_status()
                ev = loop.evq.pop()
            if loop.quit or trial >= n_trials:
                break
            # read current & previous sources, apply switch fade
            src = codec_for(cur)
            src.seek(pos)
            x = src.read(B)
            if len(x) < B:
                pos = 0
                for c in (a, b):
                    c.seek(0)
                continue
            if switch_pos > 0 and switch_from is not None:
                prev_c = codec_for(switch_from)
                prev_c.seek(pos)
                xp = prev_c.read(B)
                n = min(len(x), len(xp))
                t = np.clip((switch_pos - np.arange(n)) / fade_frames, 0.0, 1.0)
                fade_out = t * t * (3 - 2 * t)
                x = x[:n] * (1 - fade_out)[:, None] + xp[:n] * fade_out[:, None]
                switch_pos = max(0, switch_pos - n)
                if switch_pos == 0:
                    switch_from = None
            pos += len(x)
            y = loop.process_block(np.asarray(x))
            writer.write(y)
        if trial > 0:
            p = _binomial_p(trial, correct)
            log.info("info: ABX result: %d correct out of %d (p=%g)", correct, trial, p)
    finally:
        terminal.disable()
        if started:
            keys.stop()
    return 0


def _binomial_p(n, k):
    """P(X >= k) for X ~ Binomial(n, 0.5) (dsp.c:822-832)."""
    total = 0.0
    for i in range(k, n + 1):
        total += math.comb(n, i)
    return total / (2.0**n)
