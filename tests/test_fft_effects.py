import numpy as np
import pytest

from dsp_tpu.chain import CompiledChain, build_chain_from_string
from dsp_tpu.core.types import StreamInfo


def _chain(s, fs=44100, ch=1):
    return build_chain_from_string(s, StreamInfo(fs, ch))


class TestFir:
    def test_inline_coefs_vs_convolve(self, rng):
        c = _chain("fir coefs:0.5,0.25,-0.1,0.05", ch=2)
        cc = CompiledChain(c, block_frames=256)
        x = rng.uniform(-1, 1, (1000, 2))
        y = cc.process_array(x, drain=True)
        h = np.array([0.5, 0.25, -0.1, 0.05])
        ref = np.stack([np.convolve(x[:, k], h) for k in range(2)], axis=1)
        assert y.shape == ref.shape
        assert np.abs(y - ref).max() < 1e-12

    def test_zero_latency(self):
        # output starts immediately (better than the reference's fft_len latency)
        c = _chain("fir coefs:1.0,0.5")
        cc = CompiledChain(c, block_frames=64)
        x = np.zeros((64, 1))
        x[0, 0] = 1.0
        y = np.asarray(cc.run_block(x))
        assert y[0, 0] == pytest.approx(1.0)
        assert y[1, 0] == pytest.approx(0.5)

    def test_long_filter_via_file(self, tmp_path, rng):
        from dsp_tpu.codecs import CodecParams, init_codec, CODEC_MODE_WRITE

        h = rng.uniform(-0.2, 0.2, (5000, 1))
        path = str(tmp_path / "ir.wav")
        w = init_codec(CodecParams(path, type="wav", enc="double", fs=44100, channels=1, mode=CODEC_MODE_WRITE))
        w.write(h)
        w.close()
        c = _chain(f"fir {path}")
        cc = CompiledChain(c, block_frames=512)
        x = rng.uniform(-1, 1, (2000, 1))
        y = cc.process_array(x, drain=True)
        ref = np.convolve(x[:, 0], h[:, 0])[:, None]
        assert np.abs(y - ref[: len(y)]).max() < 1e-11

    def test_mono_filter_shared(self, rng):
        c = _chain("fir coefs:0.2,0.3", ch=3)
        cc = CompiledChain(c, block_frames=128)
        x = rng.uniform(-1, 1, (128, 3))
        y = np.asarray(cc.run_block(x))
        h = np.array([0.2, 0.3])
        for k in range(3):
            ref = np.convolve(x[:, k], h)[:128]
            assert np.abs(y[:, k] - ref).max() < 1e-12

    def test_channel_mismatch(self):
        from dsp_tpu.chain.parser import ChainParseError

        with pytest.raises(ChainParseError):
            _chain("fir coefs:1/1/1", ch=2)  # 3 filter ch vs 2 selected

    def test_align_peak(self, rng):
        # -a aligns to the peak; with one channel the advance becomes the
        # chain's zero reference (no inter-channel alignment needed)
        c = _chain("fir -a coefs:0,0,0,1,0")
        assert c.zero_ref == 3
        # with two channels and only one filtered, the other channel gets a
        # compensating alignment delay
        c2 = _chain(":0 fir -a coefs:0,0,0,1,0", ch=2)
        names = [e.name for e in c2.effects]
        assert "align" in names

    def test_fir_p_long(self, rng):
        h = rng.uniform(-0.1, 0.1, 700)
        coefs = ",".join(f"{v:.17g}" for v in h)
        c = _chain(f"fir_p coefs:{coefs}")
        cc = CompiledChain(c, block_frames=128)
        x = rng.uniform(-1, 1, (1024, 1))
        y = cc.process_array(x, drain=True)
        ref = np.convolve(x[:, 0], h)[:, None]
        assert np.abs(y - ref[: len(y)]).max() < 1e-12

    def test_partition_arg_validation_matches_reference(self):
        """fir_p/zita partition-length args: same accept/reject semantics as
        the reference. fir_p validates (power-of-2 >= 32, 0 = default) ONLY
        for filters longer than DIRECT_LEN=32 taps — shorter filters are
        delegated to the plain fir engine before validation (fir_p.c:364-384).
        zita validates for any filter length: range [64, 8192] (or 0),
        max < min is a clamped warning, and non-power-of-2 values fail at
        Convproc::configure (zita_convolver.cpp:135-149)."""
        from dsp_tpu.chain.parser import ChainParseError

        long_taps = "coefs:" + ",".join(["0.01"] * 40)  # > DIRECT_LEN
        ok = [
            f"fir_p 0 {long_taps}",
            f"fir_p 4096 {long_taps}",
            "fir_p 100 coefs:0.1,0.2",   # short filter: validation bypassed
            "fir_p 16 coefs:0.1,0.2",    # ditto (reference runs these fine)
            "zita_convolver 64 coefs:0.1,0.2",
            "zita_convolver 128 8192 coefs:0.1,0.2",
            "zita_convolver 0 0 coefs:0.1,0.2",
            "zita_convolver 8192 64 coefs:0.1,0.2",  # warn + clamp
        ]
        bad = [
            f"fir_p 100 {long_taps}",    # not a power of 2
            f"fir_p 16 {long_taps}",     # < DIRECT_LEN
            "zita_convolver 32 coefs:0.1,0.2",
            "zita_convolver 16384 coefs:0.1,0.2",
            "zita_convolver 100 coefs:0.1,0.2",  # in range, not a power of 2
        ]
        for s in ok:
            _chain(s)
        for s in bad:
            with pytest.raises(ChainParseError):
                _chain(s)

    def test_zita_alias(self, rng):
        h = rng.uniform(-0.1, 0.1, 300)
        coefs = ",".join(f"{v:.17g}" for v in h)
        c = _chain(f"zita_convolver 64 coefs:{coefs}")
        cc = CompiledChain(c, block_frames=256)
        x = rng.uniform(-1, 1, (512, 1))
        y = cc.process_array(x, drain=True)
        ref = np.convolve(x[:, 0], h)[:, None]
        assert np.abs(y - ref[: len(y)]).max() < 1e-12


class TestNupols:
    """Two-group non-uniform partitioned convolution (fft_conv.NupolsConv,
    the fir_p.c:290-335 analog): exactness, engine selection, and block-size
    independence in the regime where it engages (filter >= 64 blocks)."""

    def test_engine_selection(self):
        from dsp_tpu.effects.fir import FirEffect
        from dsp_tpu.ops.fft_conv import NupolsConv, UpolsConv

        h = np.zeros((9000, 1))
        h[0] = 1.0
        e = FirEffect("fir_p", StreamInfo(44100, 1), [True], h, partitioned=True)
        assert isinstance(e._engine(128), NupolsConv)   # 9000/128 = 71 parts
        assert isinstance(e._engine(512), UpolsConv)    # 9000/512 = 18 parts
        eng = e._engine(128)
        # m ~ sqrt(F/B): balanced groups
        assert eng.m in (4, 8, 16)
        assert eng.P == eng.m * 128

    def test_exact_vs_convolve(self, rng):
        h = rng.uniform(-0.1, 0.1, 9000)
        coefs = ",".join(f"{v:.17g}" for v in h)
        c = _chain(f"fir_p coefs:{coefs}")
        cc = CompiledChain(c, block_frames=128)
        from dsp_tpu.ops.fft_conv import NupolsConv

        assert isinstance(c.effects[0]._engine(128), NupolsConv)
        x = rng.uniform(-1, 1, (5000, 1))
        y = cc.process_array(x, drain=True)
        ref = np.convolve(x[:, 0], h)[:, None]
        assert y.shape[0] == ref.shape[0]
        assert np.abs(y - ref).max() < 1e-11

    def test_exact_multichannel_odd_block(self, rng):
        # non-power-of-two block (rate-changed chains produce these) and
        # per-channel filters
        h = rng.uniform(-0.1, 0.1, (7000, 2))
        from dsp_tpu.effects.fir import FirEffect
        from dsp_tpu.ops.fft_conv import NupolsConv

        e = FirEffect("fir_p", StreamInfo(44100, 2), [True, True], h, partitioned=True)
        B = 96
        eng = e._engine(B)
        assert isinstance(eng, NupolsConv)
        x = rng.uniform(-1, 1, (B * 40, 2))
        st = eng.state0()
        ys = []
        for i in range(40):
            st, y = eng.step(st, np.asarray(x[i * B : (i + 1) * B]))
            ys.append(np.asarray(y))
        y = np.concatenate(ys)
        for k in range(2):
            ref = np.convolve(x[:, k], h[:, k])[: len(y)]
            assert np.abs(y[:, k] - ref).max() < 1e-11

    def test_matches_uniform_engine(self, rng):
        # identical output to the uniform FDL on the same filter/stream
        from dsp_tpu.ops.fft_conv import NupolsConv, UpolsConv

        h = rng.uniform(-0.1, 0.1, (8192, 1))
        B = 64
        a, b = NupolsConv(h.T, B, 8), UpolsConv(h.T, B)
        sa, sb = a.state0(), b.state0()
        n_blocks = 150  # > F/B so the tail FDL wraps fully
        x = rng.uniform(-1, 1, (B * n_blocks, 1))
        for i in range(n_blocks):
            blk = np.asarray(x[i * B : (i + 1) * B])
            sa, ya = a.step(sa, blk)
            sb, yb = b.step(sb, blk)
            assert np.abs(np.asarray(ya) - np.asarray(yb)).max() < 1e-11, i


class TestHilbert:
    def test_90_degree_phase(self):
        # hilbert of cos is sin: check midband via analytic signal
        taps = 255
        c = _chain(f"hilbert {taps}")
        cc = CompiledChain(c, block_frames=512)
        fs = 44100
        n = 4096
        t = np.arange(n) / fs
        f0 = 2000.0
        x = np.cos(2 * np.pi * f0 * t)[:, None]
        y = cc.process_array(x, drain=True)
        # group delay = taps//2; advancing the output by that gives sin
        d = taps // 2
        ref = np.sin(2 * np.pi * f0 * t)
        m = slice(500, n - 500)
        assert np.abs(y[d : n + d][m, 0] - ref[m]).max() < 1e-2

    def test_even_taps_rejected(self):
        from dsp_tpu.chain.parser import ChainParseError

        with pytest.raises(ChainParseError):
            _chain("hilbert 128")


class TestResample:
    @pytest.mark.parametrize("fs2,block", [(96000, 2048), (48000, 2048), (22050, 2048)])
    def test_tone_snr(self, fs2, block):
        fs1 = 44100
        c = _chain(f"resample {fs2}")
        cc = CompiledChain(c, block_frames=block)
        n = fs1 // 2
        t = np.arange(n) / fs1
        f0 = 1000.0
        x = np.sin(2 * np.pi * f0 * t)[:, None]
        y = cc.process_array(x, drain=True)
        rs = c.effects[0].rs
        m_os_half = (rs.filter_len * rs.sinc_os - 1) / 2.0
        resid = (m_os_half / rs.sinc_os * (rs.n / rs.d if fs2 < fs1 else 1.0)) - rs.out_delay
        t2 = (np.arange(len(y)) - resid) / fs2
        ref = np.sin(2 * np.pi * f0 * t2)
        lo = 4000
        hi = int(n * fs2 / fs1) - 4000
        err = np.abs(y[lo:hi, 0] - ref[lo:hi]).max()
        assert err < 1e-9, f"{fs2}: err {err:.3e}"

    def test_ratio_and_length(self):
        c = _chain("resample x2")
        assert c.ostream.fs == 88200
        c = _chain("resample /2")
        assert c.ostream.fs == 22050

    def test_identity_rate_noop(self):
        c = _chain("resample 44.1k")
        assert len(c.effects) == 0

    def test_bad_divisor(self):
        from dsp_tpu.chain.parser import ChainParseError

        with pytest.raises(ChainParseError):
            _chain("resample /8")  # 44100/8 is not integral

    def test_state_carries_across_blocks(self, rng):
        c1 = _chain("resample 48k")
        c2 = _chain("resample 48k")
        x = rng.uniform(-1, 1, (8000, 1))
        cc1 = CompiledChain(c1, block_frames=147)
        cc2 = CompiledChain(c2, block_frames=4096)
        y1 = cc1.process_array(x, drain=False)
        y2 = cc2.process_array(x, drain=False)
        n = min(len(y1), len(y2))
        assert np.abs(y1[:n] - y2[:n]).max() < 1e-12


class TestResampleLengthLaw:
    @pytest.mark.parametrize("fs2,n_in", [
        (96000, 11025), (96000, 10007), (96000, 22051),
        (22050, 11025), (22050, 22051), (32000, 10007),
    ])
    def test_output_length_is_ceil(self, fs2, n_in):
        """Total output of a pure resample chain = ceil(N * n/d) — the
        emergent total of the reference's run + drain2 accounting
        (resample.c:95-188: floor(N/in_len) blocks during run, then
        out_delay + pending-output + ceil(pending-input * ratio) on drain,
        with the initial out_delay skip cancelling)."""
        from dsp_tpu.chain import CompiledChain, build_chain_from_string
        from dsp_tpu.core.types import StreamInfo

        chain = build_chain_from_string(f"resample {fs2}", StreamInfo(44100, 1))
        cc = CompiledChain(chain, block_frames=2048)
        y = cc.process_array(np.full((n_in, 1), 0.1))
        r = chain.ratio
        law = -(-n_in * r.numerator // r.denominator)
        assert len(y) == law, (len(y), law)
