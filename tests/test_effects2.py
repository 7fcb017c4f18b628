import numpy as np
import pytest

from dsp_tpu.chain import CompiledChain, build_chain_from_string
from dsp_tpu.core.types import StreamInfo


def _chain(s, fs=44100, ch=1):
    return build_chain_from_string(s, StreamInfo(fs, ch))


class TestReverseIir:
    def test_anticausal_response(self, rng):
        from scipy.signal import lfilter
        from dsp_tpu.effects.biquad import design, LOWPASS

        c = _chain("lowpass -r 1k 0.7071")
        cc = CompiledChain(c, block_frames=1024)
        x = rng.uniform(-1, 1, (8192, 1))
        y = cc.process_array(x, drain=True)
        b0, b1, b2, a0, a1, a2 = design(LOWPASS, 44100, 1000.0, 0.7071)
        fwd = lfilter([b0 / a0, b1 / a0, b2 / a0], [1, a1 / a0, a2 / a0], x[::-1, 0])[::-1]
        zr = c.zero_ref
        err = np.abs(y[zr : len(x), 0] - fwd[: len(x) - zr]).max()
        assert err < 1e-4  # -80 dB default truncation threshold

    def test_merge_cascade(self):
        # two reversed filters merge into one (shared advance)
        c = _chain("lowpass -r 1k 0.7071 highpass -r 200 0.7071")
        names = [e.name for e in c.effects]
        assert names.count("lowpass") == 1
        assert "highpass" not in names

    def test_thresh_option(self):
        c1 = _chain("lowpass -r40 1k 0.7071")
        c2 = _chain("lowpass -r120 1k 0.7071")
        assert c2.zero_ref > c1.zero_ref


class TestDecorrelate:
    def test_deterministic_with_seed(self, rng):
        x = rng.uniform(-1, 1, (4096, 2))
        ys = []
        for _ in range(2):
            c = _chain("decorrelate -s 42 3", ch=2)
            cc = CompiledChain(c, block_frames=1024)
            ys.append(cc.process_array(x, drain=False))
        assert np.array_equal(ys[0], ys[1])

    def test_allpass_energy(self):
        c = _chain("decorrelate -s 7", ch=1)
        cc = CompiledChain(c, block_frames=2048)
        x = np.zeros((16384, 1))
        x[0, 0] = 1.0
        y = cc.process_array(x, drain=True)
        assert abs((y**2).sum() - 1.0) < 1e-6

    def test_mono_same_filters(self):
        c = _chain("decorrelate -m -s 9 4", ch=2)
        cc = CompiledChain(c, block_frames=1024)
        x = np.zeros((8192, 2))
        x[0] = 1.0
        y = cc.process_array(x, drain=True)
        assert np.abs(y[:, 0] - y[:, 1]).max() < 1e-12


class TestStats:
    def test_sine_stats(self, capsys):
        c = _chain("stats", fs=8000)
        cc = CompiledChain(c, block_frames=1000)
        t = np.arange(8000) / 8000.0
        x = (0.5 * np.sin(2 * np.pi * 100 * t))[:, None]
        cc.process_array(x, drain=False)
        e = c.effects[0]
        s = e._final if e._final else None
        cc.host_finish()
        s = e._final
        assert abs(float(s["sum"][0]) / 8000) < 1e-9  # DC
        assert float(s["max"][0]) == pytest.approx(0.5, abs=1e-6)
        rms = np.sqrt(float(s["sum_sq"][0]) / 8000)
        assert 20 * np.log10(rms) == pytest.approx(-9.0309, abs=0.001)

    def test_true_peak_interp(self):
        # inter-sample peak: 11.025 kHz sine sampled at 44.1k with phase such
        # that sample peaks are below the true peak
        c = _chain("stats -i")
        cc = CompiledChain(c, block_frames=1024)
        t = np.arange(8192) / 44100.0
        x = (0.9 * np.sin(2 * np.pi * 11025 * t + np.pi / 4))[:, None]
        cc.process_array(x, drain=False)
        cc.host_finish()
        e = c.effects[0]
        tp = float(e._final["peak"][0])
        sp = np.abs(x).max()
        assert tp > sp  # interpolated peak above max sample
        # 4x oversample + quadratic fit at fs/4 is ~1-2% accurate
        assert tp == pytest.approx(0.9, abs=0.02)


class TestLevels:
    def test_meter_state(self, rng):
        c = _chain("levels", ch=2)
        cc = CompiledChain(c, block_frames=2048)
        x = np.ones((8192, 2)) * 0.5
        y = cc.process_array(x, drain=False)
        assert np.array_equal(np.asarray(y), x)  # passthrough
        # after ~0.19 s at tc=0.3 the avg should be partway to 0.25
        st = cc.states[0]
        avg = float(np.asarray(st["avg"])[0])
        assert 0.05 < avg < 0.25
        peak = float(np.asarray(st["block_peak"])[0])
        assert peak == pytest.approx(0.25, abs=1e-9)
