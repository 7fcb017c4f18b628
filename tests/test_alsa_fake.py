"""Scripted fake-libasound harness driving codecs/alsa.py's real state machine.

The device codecs were write-only code (round-2 finding: a capture-hang bug
lived in alsa.py's sw-params path and no test could catch it because no ALSA
device exists in CI). This harness monkeypatches the module's `_a` CDLL with
a Python fake whose returns are scripted per call — xruns (-EPIPE), suspend
(-ESTRPIPE), short writes, delay values, hw-pause capability — so the
recovery logic (reference alsa.c:54-169) runs for real.
"""

import ctypes
import os

import numpy as np
import pytest

os.environ["DSP_TPU_FAKE_ALSA"] = "1"  # allow import without libasound
alsa = pytest.importorskip("dsp_tpu.codecs.alsa")

from dsp_tpu.codecs.base import CODEC_MODE_READ, CODEC_MODE_WRITE, CodecParams

_EPIPE = 32
_ESTRPIPE = 86


def _buf_addr(arg):
    """Address of a ctypes byref()/buffer argument as passed to the fake."""
    if isinstance(arg, (ctypes.Array, ctypes.c_char_p)):
        return ctypes.addressof(arg)
    # CArgObject from byref(x[, offset]): cast resolves base + offset
    return ctypes.cast(arg, ctypes.c_void_p).value


class FakeAsound:
    """Stands in for the libasound CDLL: every snd_* the codec calls."""

    def __init__(self, can_pause=False, buffer_size=None):
        self.can_pause = can_pause
        self.buffer_size = buffer_size
        self.calls = []
        self.writei_script = []   # each: int frames accepted, or negative errno
        self.readi_script = []    # each: int frames produced, or negative errno
        self.delay_script = []    # values for snd_pcm_delay
        self.read_counter = 0     # s16 sample pattern counter for readi fills
        self.sw_params_applied = False
        self.prepared = True
        self.stream = None

    # -- setup --
    def snd_pcm_open(self, pcm_ref, path, stream, mode):
        self.calls.append(("open", path, stream))
        self.stream = stream
        pcm_ref._obj.value = 0xA15A
        return 0

    def snd_strerror(self, err):
        return f"fake error {int(err)}".encode()

    def snd_pcm_hw_params_sizeof(self):
        return 512

    snd_pcm_sw_params_sizeof = snd_pcm_hw_params_sizeof

    def snd_pcm_hw_params_any(self, pcm, hw):
        return 0

    def snd_pcm_hw_params_set_access(self, pcm, hw, access):
        self.calls.append(("set_access", access))
        return 0

    def snd_pcm_hw_params_set_format(self, pcm, hw, fmt):
        self.calls.append(("set_format", fmt))
        return 0

    def snd_pcm_hw_params_set_rate_near(self, pcm, hw, rate_ref, d):
        return 0  # accept requested rate

    def snd_pcm_hw_params_set_channels(self, pcm, hw, ch):
        return 0

    def snd_pcm_hw_params_set_buffer_size_near(self, pcm, hw, size_ref):
        if self.buffer_size is not None:
            size_ref._obj.value = self.buffer_size
        self.requested_buffer = int(size_ref._obj.value)
        return 0

    def snd_pcm_hw_params_set_periods_near(self, pcm, hw, p_ref, d):
        return 0

    def snd_pcm_hw_params(self, pcm, hw):
        self.calls.append(("hw_params",))
        return 0

    def snd_pcm_hw_params_can_pause(self, hw):
        return 1 if self.can_pause else 0

    def snd_pcm_hw_params_get_buffer_size(self, hw, ref):
        ref._obj.value = self.buffer_size or self.requested_buffer
        return 0

    def snd_pcm_sw_params_current(self, pcm, sw):
        return 0

    def snd_pcm_sw_params_set_start_threshold(self, pcm, sw, thresh):
        self.calls.append(("start_threshold", int(getattr(thresh, "value", thresh))))
        return 0

    def snd_pcm_sw_params(self, pcm, sw):
        self.calls.append(("sw_params",))
        self.sw_params_applied = True
        return 0

    # -- transport --
    def snd_pcm_prepare(self, pcm):
        self.calls.append(("prepare",))
        self.prepared = True
        return 0

    def snd_pcm_resume(self, pcm):
        self.calls.append(("resume",))
        return 0

    def snd_pcm_drain(self, pcm):
        self.calls.append(("drain",))
        return 0

    def snd_pcm_drop(self, pcm):
        self.calls.append(("drop",))
        return 0

    def snd_pcm_pause(self, pcm, enable):
        self.calls.append(("pause", int(enable)))
        return 0

    def snd_pcm_close(self, pcm):
        self.calls.append(("close",))
        return 0

    def snd_pcm_delay(self, pcm, d_ref):
        if not self.delay_script:
            return -1
        d_ref._obj.value = self.delay_script.pop(0)
        return 0

    # -- I/O --
    def snd_pcm_writei(self, pcm, buf, frames):
        r = self.writei_script.pop(0) if self.writei_script else int(frames)
        if isinstance(r, int) and r < 0:
            self.prepared = False
            self.calls.append(("writei_err", r))
            return r
        n = min(int(r), int(frames))
        assert self.prepared, "writei after un-recovered error"
        self.calls.append(("writei", n))
        return n

    def snd_pcm_readi(self, pcm, buf, frames):
        r = self.readi_script.pop(0) if self.readi_script else int(frames)
        if isinstance(r, int) and r < 0:
            self.prepared = False
            self.calls.append(("readi_err", r))
            return r
        assert self.prepared, "readi after un-recovered error"
        n = min(int(r), int(frames))
        # fill with an incrementing s16 pattern for data-integrity checks
        pat = (np.arange(self.read_counter, self.read_counter + n * 2) % 1000).astype("<i2")
        self.read_counter += n * 2
        ctypes.memmove(_buf_addr(buf), pat.tobytes(), n * 4)
        self.calls.append(("readi", n))
        return n


@pytest.fixture
def fake(monkeypatch):
    f = FakeAsound()
    monkeypatch.setattr(alsa, "_a", f)
    return f


def _params(mode, block=128, ratio=4):
    return CodecParams(
        path="hw:0,0", type="alsa", enc="s16", fs=44100, channels=2,
        mode=mode, block_frames=block, buf_ratio=ratio,
    )


def test_playback_setup_and_start_threshold(fake):
    c = alsa.AlsaCodec(_params(CODEC_MODE_WRITE))
    # playback applies sw params with a 2-block start threshold (alsa.c:295)
    assert ("start_threshold", 256) in fake.calls
    assert fake.sw_params_applied
    assert c.hints & alsa.CODEC_HINT_INTERACTIVE


def test_capture_has_no_start_threshold(fake):
    """Regression for the round-2 capture hang: a 2-block start threshold on
    the CAPTURE stream keeps one-block readi from ever starting the device."""
    alsa.AlsaCodec(_params(CODEC_MODE_READ))
    assert not fake.sw_params_applied
    assert not any(c[0] == "start_threshold" for c in fake.calls)


def test_write_short_writes_complete(fake):
    c = alsa.AlsaCodec(_params(CODEC_MODE_WRITE))
    fake.writei_script = [30, 50, 48]
    done = c.write(np.zeros((128, 2)))
    assert done == 128
    assert [x for x in fake.calls if x[0] == "writei"] == [("writei", 30), ("writei", 50), ("writei", 48)]


def test_write_xrun_recovery(fake):
    c = alsa.AlsaCodec(_params(CODEC_MODE_WRITE))
    fake.writei_script = [60, -_EPIPE, 68]
    done = c.write(np.zeros((128, 2)))
    assert done == 128
    i_err = fake.calls.index(("writei_err", -_EPIPE))
    assert ("prepare",) in fake.calls[i_err:], "xrun must re-prepare before retrying"


def test_write_suspend_resume(fake):
    c = alsa.AlsaCodec(_params(CODEC_MODE_WRITE))
    fake.writei_script = [-_ESTRPIPE, 128]
    # resume succeeds -> no prepare needed, but the codec must mark the
    # stream usable again for the retry
    fake.prepared = True  # resume path: device is running again
    orig_resume = fake.snd_pcm_resume

    def resume(pcm):
        fake.prepared = True
        return orig_resume(pcm)

    fake.snd_pcm_resume = resume
    done = c.write(np.zeros((128, 2)))
    assert done == 128
    assert ("resume",) in fake.calls


def test_read_xrun_recovery_and_data(fake):
    c = alsa.AlsaCodec(_params(CODEC_MODE_READ))
    fake.readi_script = [-_EPIPE, 64, 64]
    y = c.read(128)
    assert y.shape == (128, 2)
    # data integrity: the fake wrote an incrementing s16 pattern
    raw = np.round(y.ravel() * 32768.0).astype(np.int64) % 1000
    assert np.array_equal(raw, np.arange(256) % 1000)
    i_err = fake.calls.index(("readi_err", -_EPIPE))
    assert ("prepare",) in fake.calls[i_err:]


def test_pause_without_hw_pause_drains_playback(fake):
    fake.can_pause = False
    c = alsa.AlsaCodec(_params(CODEC_MODE_WRITE))
    fake.delay_script = [512, 0]
    c.pause(True)
    assert ("drain",) in fake.calls and ("prepare",) in fake.calls
    # while paused, delay() reports the cached pre-pause value (alsa.c:150)
    assert c.delay() == 512


def test_pause_without_hw_pause_drops_capture(fake):
    fake.can_pause = False
    c = alsa.AlsaCodec(_params(CODEC_MODE_READ))
    fake.delay_script = [64]
    c.pause(True)
    assert ("drop",) in fake.calls and ("prepare",) in fake.calls


def test_pause_with_hw_pause(fake):
    fake.can_pause = True
    c = alsa.AlsaCodec(_params(CODEC_MODE_WRITE))
    fake.delay_script = [100, 100]
    c.pause(True)
    c.pause(False)
    assert ("pause", 1) in fake.calls and ("pause", 0) in fake.calls
    assert ("drain",) not in fake.calls


def test_delay_reporting(fake):
    c = alsa.AlsaCodec(_params(CODEC_MODE_WRITE))
    fake.delay_script = [1234]
    assert c.delay() == 1234


def test_drop_and_close(fake):
    c = alsa.AlsaCodec(_params(CODEC_MODE_WRITE))
    c.drop()
    assert ("drop",) in fake.calls and ("prepare",) in fake.calls
    c.close()
    assert fake.calls[-1] == ("close",) and ("drain",) in fake.calls


def test_buffer_clamped_start_threshold(fake):
    """Device buffer smaller than 2 blocks: threshold clamps (alsa.c:285)."""
    fake.buffer_size = 100
    alsa.AlsaCodec(_params(CODEC_MODE_WRITE))
    assert ("start_threshold", 100) in fake.calls
