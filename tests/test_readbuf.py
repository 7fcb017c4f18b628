"""ReadBuffer command-queue semantics (codec_buf.c:247-447 analog).

Covers VERDICT r1 #6: SEEK drops stale blocks (no pre-seek audio reaches the
consumer), PAUSE stops REALTIME capture, the reader suspends ahead of a
REALTIME input until earlier inputs are drained, SKIP abandons the current
input, repeats loop inside the reader, and the unbuffered fast path.
"""

import threading
import time

import numpy as np
import pytest

from dsp_tpu.cli.readbuf import ReadBuffer
from dsp_tpu.codecs.base import CODEC_HINT_NO_BUF, CODEC_HINT_REALTIME


class FakeCodec:
    """Seekable ramp codec: sample value == frame index (channel-invariant)."""

    def __init__(self, frames=100000, channels=1, hints=0, buf_ratio=64,
                 read_sleep=0.0, fs=44100):
        self.frames = frames
        self.channels = channels
        self.hints = hints
        self.buf_ratio = buf_ratio
        self.fs = fs
        self.pos = 0
        self.read_sleep = read_sleep
        self.reads = 0
        self.paused = None
        self._lock = threading.Lock()

    def read(self, want):
        if self.read_sleep:
            time.sleep(self.read_sleep)
        with self._lock:
            self.reads += 1
            n = min(want, self.frames - self.pos)
            out = (np.arange(self.pos, self.pos + n, dtype=np.float64)[:, None]
                   * np.ones((1, self.channels)))
            self.pos += n
            return out

    def seek(self, target):
        with self._lock:
            self.pos = max(0, min(target, self.frames))
            return self.pos

    def delay(self):
        return 0

    def pause(self, p):
        self.paused = p


class Inp:
    def __init__(self, codec, start_pos=0, end_pos=-1, repeats=0):
        self.codec = codec
        self.start_pos = start_pos
        self.end_pos = end_pos
        self.repeats = repeats


def test_seek_drops_stale_blocks():
    """Seek during prefetch: the very next frame the consumer sees must come
    from the seek target — never stale pre-seek data (codec_buf.c:268-279)."""
    c = FakeCodec(frames=10_000_000, read_sleep=0.002)
    rb = ReadBuffer([Inp(c)], block_frames=256, n_blocks=8)
    try:
        first = rb.read(256)
        assert first[0, 0] == 0.0
        # let the prefetcher run ahead
        deadline = time.time() + 5
        while rb.delay() < 256 and time.time() < deadline:
            time.sleep(0.01)
        assert rb.delay() > 0, "prefetcher never ran ahead"
        got = rb.seek(500_000)
        assert got == 500_000
        nxt = rb.read(256)
        assert len(nxt) == 256
        assert nxt[0, 0] == 500_000.0, f"stale block after seek: {nxt[0, 0]}"
        assert np.array_equal(nxt[:, 0], np.arange(500_000, 500_256))
    finally:
        rb.close()


def test_realtime_input_not_captured_early():
    """A REALTIME input (capture device) must not be read while an earlier
    input is still buffered/playing (codec_buf.c:330-338)."""
    file_in = FakeCodec(frames=4096)
    rt_in = FakeCodec(frames=4096, hints=CODEC_HINT_REALTIME)
    rb = ReadBuffer([Inp(file_in), Inp(rt_in)], block_frames=256, n_blocks=4)
    try:
        # drain input 0 partially; the realtime input must stay untouched
        rb.read(512)
        time.sleep(0.1)
        assert rt_in.reads == 0, "REALTIME input captured early"
        # finish input 0
        while len(rb.read(256)):
            pass
        assert rb.end_of_input()
        assert rt_in.reads == 0, "REALTIME input captured before next_input"
        assert rb.next_input()
        out = rb.read(256)
        assert len(out) == 256 and out[0, 0] == 0.0
        assert rt_in.reads > 0
    finally:
        rb.close()


def test_pause_pauses_realtime_codec_and_stops_filling():
    rt = FakeCodec(frames=10_000_000, hints=CODEC_HINT_REALTIME)
    rb = ReadBuffer([Inp(rt)], block_frames=256, n_blocks=4)
    try:
        rb.read(256)
        rb.pause(True)
        assert rt.paused is True
        time.sleep(0.05)
        reads_at_pause = rt.reads
        time.sleep(0.15)
        assert rt.reads == reads_at_pause, "reader kept filling while paused"
        rb.pause(False)
        assert rt.paused is False
        out = rb.read(256)
        assert len(out) == 256
    finally:
        rb.close()


def test_skip_abandons_current_input():
    a = FakeCodec(frames=10_000_000)
    b = FakeCodec(frames=1024)
    rb = ReadBuffer([Inp(a), Inp(b)], block_frames=256, n_blocks=4)
    try:
        rb.read(256)
        rb.skip()
        assert rb.end_of_input()
        assert rb.next_input()
        out = rb.read(256)
        assert out[0, 0] == 0.0 and len(out) == 256  # input b from its start
    finally:
        rb.close()


def test_repeats_loop_in_reader():
    c = FakeCodec(frames=300)
    rb = ReadBuffer([Inp(c, repeats=2)], block_frames=128, n_blocks=4)
    try:
        total = []
        while True:
            out = rb.read(128)
            if not len(out):
                break
            total.append(out)
        y = np.concatenate(total)[:, 0]
        assert len(y) == 900  # 3 passes
        assert np.array_equal(y[:300], np.arange(300))
        assert np.array_equal(y[300:600], np.arange(300))
    finally:
        rb.close()


def test_end_pos_respected():
    c = FakeCodec(frames=10_000)
    rb = ReadBuffer([Inp(c, start_pos=0, end_pos=700)], block_frames=256, n_blocks=4)
    try:
        total = []
        while True:
            out = rb.read(256)
            if not len(out):
                break
            total.append(out)
        y = np.concatenate(total)[:, 0]
        assert len(y) == 700
        assert y[-1] == 699.0
    finally:
        rb.close()


def test_seek_rewinds_prefetched_later_inputs():
    """If the reader already pre-read into input b when the consumer seeks
    input a, b's codec must be rewound to its start so no frames are skipped
    (read_queue_seek rewinds later inputs from the back, codec_buf.c:195-230)."""
    a = FakeCodec(frames=600)
    b = FakeCodec(frames=600)
    rb = ReadBuffer([Inp(a), Inp(b)], block_frames=128, n_blocks=16)
    try:
        first = rb.read(128)
        assert first[0, 0] == 0.0
        # wait until the reader has prefetched into input b
        deadline = time.time() + 5
        while b.reads == 0 and time.time() < deadline:
            time.sleep(0.01)
        assert b.reads > 0, "reader never prefetched into input b"
        assert rb.seek(0) == 0
        y = []
        while True:
            out = rb.read(128)
            if not len(out):
                break
            y.append(out)
        ya = np.concatenate(y)[:, 0]
        assert np.array_equal(ya, np.arange(600)), "input a wrong after seek"
        assert rb.next_input()
        y = []
        while True:
            out = rb.read(128)
            if not len(out):
                break
            y.append(out)
        yb = np.concatenate(y)[:, 0]
        assert np.array_equal(yb, np.arange(600)), "input b lost frames"
    finally:
        rb.close()


def test_pause_never_drops_frames():
    """Commands arriving while the reader is mid-decode must not discard the
    decoded block (the codec already consumed those frames)."""
    c = FakeCodec(frames=6000, read_sleep=0.003)
    rb = ReadBuffer([Inp(c)], block_frames=256, n_blocks=4)
    try:
        y = []
        got = 0
        while got < 4096:
            rb.pause(True)
            rb.pause(False)
            out = rb.read(256)
            if not len(out):
                break
            y.append(out)
            got += len(out)
        ya = np.concatenate(y)[:, 0]
        assert np.array_equal(ya, np.arange(len(ya))), "frames lost around pause"
        assert len(ya) >= 4096
    finally:
        rb.close()


def test_skip_keeps_later_inputs_prefetch():
    """SKIP drops only the current input's queued blocks (codec_buf.c:233);
    prefetched blocks of the next input remain valid."""
    a = FakeCodec(frames=400)
    b = FakeCodec(frames=400)
    rb = ReadBuffer([Inp(a), Inp(b)], block_frames=128, n_blocks=16)
    try:
        rb.read(128)
        deadline = time.time() + 5
        while b.reads == 0 and time.time() < deadline:
            time.sleep(0.01)
        rb.skip()
        assert rb.end_of_input()
        assert rb.next_input()
        y = []
        while True:
            out = rb.read(128)
            if not len(out):
                break
            y.append(out)
        yb = np.concatenate(y)[:, 0]
        assert np.array_equal(yb, np.arange(400)), "input b corrupted by skip"
    finally:
        rb.close()


def test_unbuffered_fast_path():
    c = FakeCodec(frames=1000, hints=CODEC_HINT_NO_BUF, buf_ratio=1)
    rb = ReadBuffer([Inp(c)], block_frames=256)
    assert rb.unbuffered
    out = rb.read(256)
    assert len(out) == 256 and out[0, 0] == 0.0
    assert rb.seek(500) == 500
    out = rb.read(256)
    assert out[0, 0] == 500.0
    rb.close()


class UnseekableCodec(FakeCodec):
    def seek(self, target):
        return -1


class ErroringCodec(FakeCodec):
    """Raises on the read that crosses err_at."""

    def __init__(self, err_at=5000, **kw):
        super().__init__(**kw)
        self.err_at = err_at

    def read(self, want):
        if self.pos + want > self.err_at:
            raise RuntimeError("device died")
        return super().read(want)


def test_failed_seek_preserves_buffered_audio():
    """A seek on an unseekable input must be a no-op: the reference drops
    queued blocks only when the codec seek succeeds (codec_buf.c:216-218);
    pre-fix the queue was dropped first, skipping several buffered seconds."""
    c = UnseekableCodec(frames=100000)
    rb = ReadBuffer([Inp(c)], block_frames=1000, n_blocks=4, force_thread=True)
    try:
        first = rb.read(500)  # frames 0..499
        assert first[0, 0] == 0.0 and first[-1, 0] == 499.0
        deadline = time.time() + 5
        while rb.delay() < 2000 and time.time() < deadline:
            time.sleep(0.01)
        assert rb.seek(50000) < 0  # fails
        nxt = rb.read(500)  # must CONTINUE at frame 500 with no gap
        assert nxt[0, 0] == 500.0 and nxt[-1, 0] == 999.0
    finally:
        rb.close()


def test_reader_decode_error_latches_and_unblocks():
    """A codec exception in the reader thread must not hang the consumer:
    the input ends, read() returns empty, and the error is latched for the
    app to report (the write-buffer error-latch analog, codec_buf.c:598)."""
    c = ErroringCodec(err_at=2500, frames=100000)
    rb = ReadBuffer([Inp(c)], block_frames=1000, n_blocks=4, force_thread=True)
    try:
        got = 0
        while True:
            b = rb.read(1000)
            if len(b) == 0:
                break
            got += len(b)
        assert got == 2000  # the two clean blocks arrived
        assert rb.end_of_input()
        assert rb.error is not None
    finally:
        rb.close()
