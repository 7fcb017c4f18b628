import numpy as np
import pytest

from dsp_tpu.codecs import CodecParams, init_codec, CODEC_MODE_READ, CODEC_MODE_WRITE, CodecError
from dsp_tpu.codecs import sampleconv


class TestSampleconv:
    @pytest.mark.parametrize(
        "enc", ["u8", "s8", "s16", "s24", "s24_3", "s32", "float", "double"]
    )
    def test_roundtrip(self, enc, rng):
        x = rng.uniform(-1, 1, 1000)
        raw = sampleconv.sample_to_raw(x, enc)
        y = sampleconv.raw_to_sample(raw, enc)
        bps, prec, _ = sampleconv.encoding_info(enc)
        tol = 2.0 ** (-(prec - 1)) if enc not in ("float", "double") else (1e-7 if enc == "float" else 0)
        assert np.abs(x - y).max() <= tol + 1e-12

    def test_bit_perfect_clamp(self):
        # +1.0 clamps to max positive code; -1.0 is exact
        raw = sampleconv.sample_to_raw(np.array([1.0, -1.0]), "s16")
        v = np.frombuffer(raw, dtype="<i2")
        assert v.tolist() == [32767, -32768]

    def test_s24_3_big_endian(self):
        x = np.array([0.5, -0.25])
        raw = sampleconv.sample_to_raw(x, "s24_3", ">")
        y = sampleconv.raw_to_sample(raw, "s24_3", ">")
        assert np.abs(x - y).max() < 2**-22

    @pytest.mark.parametrize("enc", ["mu-law", "a-law"])
    def test_g711_roundtrip(self, enc, rng):
        x = rng.uniform(-0.9, 0.9, 2000)
        raw = sampleconv.sample_to_raw(x, enc)
        y = sampleconv.raw_to_sample(raw, enc)
        # G.711 is roughly 13-bit log-companded; SNR should be decent
        err = np.abs(x - y)
        rel = err / np.maximum(np.abs(x), 1e-2)
        assert rel.max() < 0.06, rel.max()


class TestWav:
    @pytest.mark.parametrize("enc", ["s16", "s24", "s32", "float", "double", "u8", "mu-law"])
    def test_roundtrip(self, tmp_path, rng, enc):
        path = str(tmp_path / "t.wav")
        x = rng.uniform(-0.5, 0.5, (500, 2))
        w = init_codec(CodecParams(path, type="wav", enc=enc, fs=48000, channels=2, mode=CODEC_MODE_WRITE))
        w.write(x)
        w.close()
        r = init_codec(CodecParams(path, mode=CODEC_MODE_READ))
        assert r.type == "wav"
        assert r.fs == 48000
        assert r.channels == 2
        assert r.frames == 500
        y = r.read(1000)
        r.close()
        assert y.shape == (500, 2)
        tol = {"s16": 2**-15, "s24": 2**-23, "s32": 2**-31, "float": 1e-7,
               "double": 0, "u8": 2**-7, "mu-law": 0.05}[enc]
        assert np.abs(x - y).max() <= tol + 1e-12

    def test_seek(self, tmp_path):
        path = str(tmp_path / "t.wav")
        x = np.arange(100, dtype=np.float64).reshape(-1, 1) / 200.0
        w = init_codec(CodecParams(path, type="wav", enc="double", fs=44100, channels=1, mode=CODEC_MODE_WRITE))
        w.write(x)
        w.close()
        r = init_codec(CodecParams(path, mode=CODEC_MODE_READ))
        assert r.seek(50) == 50
        y = r.read(10)
        assert np.allclose(y[:, 0], x[50:60, 0])
        r.close()


class TestPcm:
    def test_roundtrip_and_seek(self, tmp_path, rng):
        path = str(tmp_path / "t.raw")
        x = rng.uniform(-0.5, 0.5, (256, 2))
        w = init_codec(CodecParams(path, type="pcm", enc="s32", fs=44100, channels=2, mode=CODEC_MODE_WRITE))
        w.write(x)
        w.close()
        r = init_codec(CodecParams(path, type="pcm", enc="s32", fs=44100, channels=2, mode=CODEC_MODE_READ))
        assert r.frames == 256
        assert r.seek(100) == 100
        y = r.read(300)
        assert y.shape == (156, 2)
        assert np.abs(y - x[100:]).max() < 2**-30
        r.close()

    def test_extension_dispatch(self, tmp_path):
        path = str(tmp_path / "t.raw")
        open(path, "wb").write(b"\x00" * 8)
        r = init_codec(CodecParams(path, enc="s16", fs=44100, channels=2, mode=CODEC_MODE_READ))
        assert r.type == "pcm"
        assert r.frames == 2


class TestSgen:
    def test_sine_tone(self):
        c = init_codec(CodecParams("sine:freq=1k+1", type="sgen", fs=8000, channels=1))
        assert c.frames == 8000
        y = c.read(100)
        t = np.arange(100) / 8000.0
        assert np.allclose(y[:, 0], np.sin(2 * np.pi * 1000 * t), atol=1e-12)

    def test_delta_offset_and_selector(self):
        c = init_codec(CodecParams("delta@1:offset=10S+100S", type="sgen", fs=8000, channels=2))
        y = c.read(100)
        assert y[10, 1] == 1.0
        assert y[10, 0] == 0.0
        assert np.count_nonzero(y) == 1

    def test_sweep_endpoint_freq(self):
        # exponential sweep's instantaneous frequency hits f1 at t=T
        c = init_codec(CodecParams("sine:freq=100-1k+2", type="sgen", fs=44100, channels=1))
        y1 = c.read(c.frames)
        assert len(y1) == 44100 * 2
        # third read returns empty
        assert len(c.read(10)) == 0

    def test_multiple_generators_sum(self):
        c = init_codec(CodecParams("sine:freq=500/sine:freq=500", type="sgen", fs=8000, channels=1))
        y = c.read(50)
        t = np.arange(50) / 8000.0
        assert np.allclose(y[:, 0], 2 * np.sin(2 * np.pi * 500 * t), atol=1e-12)

    def test_seek(self):
        c = init_codec(CodecParams("sine:freq=440", type="sgen", fs=8000, channels=1))
        y0 = c.read(64)
        c.seek(0)
        y1 = c.read(64)
        assert np.array_equal(y0, y1)

    def test_bad_type(self):
        with pytest.raises(CodecError):
            init_codec(CodecParams("square:freq=1k", type="sgen", fs=8000, channels=1))

    def test_freq_out_of_range(self):
        with pytest.raises(CodecError):
            init_codec(CodecParams("sine:freq=5k", type="sgen", fs=8000, channels=1))


class TestNull:
    def test_read_write(self):
        c = init_codec(CodecParams("null", type="null", fs=44100, channels=2))
        y = c.read(64)
        assert y.shape == (64, 2)
        assert not y.any()
        w = init_codec(CodecParams("null", type="null", fs=44100, channels=2, mode=CODEC_MODE_WRITE))
        assert w.write(y) == 64


class TestFfmpeg:
    def test_wav_via_ffmpeg(self, tmp_path, rng):
        from dsp_tpu.codecs import ffmpeg as ff

        if not ff._load():
            pytest.skip("libdspav not built")
        x = rng.uniform(-0.5, 0.5, (20000, 2))
        path = str(tmp_path / "f.wav")
        w = init_codec(CodecParams(path, type="wav", enc="s16", fs=44100, channels=2, mode=CODEC_MODE_WRITE))
        w.write(x)
        w.close()
        r = init_codec(CodecParams(path, type="ffmpeg", mode=CODEC_MODE_READ))
        assert (r.fs, r.channels, r.frames) == (44100, 2, 20000)
        y = r.read(20000)
        q = np.round(x * 32768) / 32768
        assert np.abs(y - q).max() == 0.0
        assert r.seek(5000) >= 0
        y2 = r.read(100)
        assert np.abs(y2 - q[5000:5100]).max() == 0.0
        r.close()

    def test_missing_file(self):
        from dsp_tpu.codecs import ffmpeg as ff

        if not ff._load():
            pytest.skip("libdspav not built")
        with pytest.raises(CodecError):
            init_codec(CodecParams("/nonexistent.mp3", type="ffmpeg", mode=CODEC_MODE_READ))


class TestDispatchReviewRegressions:
    def test_unmatched_output_path_errors(self, tmp_path):
        """An output path no codec matches must ERROR like the reference's
        device-only fallback list (codec.c:141-151) — pre-fix it silently
        fell through to null and discarded all audio with exit 0."""
        from dsp_tpu.codecs import CodecParams, CodecError, init_codec
        from dsp_tpu.codecs.base import CODEC_MODE_WRITE

        with pytest.raises(CodecError, match="no codec found"):
            init_codec(CodecParams(str(tmp_path / "output"), mode=CODEC_MODE_WRITE,
                                   fs=44100, channels=1))

    def test_mislabeled_extension_falls_through(self, tmp_path):
        """A file whose extension-matched codec fails to open falls through
        to the read-probe list (codec.c:202-208): raw double pcm named .wav
        is rejected by the wav parser, then decodable via... nothing here,
        so the error must LIST the probes tried, not abort at the wav
        parser."""
        from dsp_tpu.codecs import CodecParams, CodecError, init_codec

        bad = tmp_path / "notwav.wav"
        bad.write_bytes(b"\x00" * 256)
        with pytest.raises(CodecError) as ei:
            init_codec(CodecParams(str(bad)))
        # the ext-matched wav error is recorded AND the probes ran after it
        assert "wav:" in str(ei.value)
        assert "no codec found" in str(ei.value)
