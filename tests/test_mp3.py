"""mp3 codec (reference: /root/reference/mp3.c, libmad).

The mad-backed codec is gated on native/libdspmad.so (HAVE_MAD analog,
configure:46 — the reference disables it by default too). When absent,
``.mp3`` files must still decode through the ffmpeg codec's extension
dispatch / read-fallback order (codec.c:200-231). Test fixtures are encoded
with libmp3lame via ctypes (no files checked in).
"""

import ctypes
import ctypes.util
import os

import numpy as np
import pytest

from dsp_tpu.codecs import CODEC_MODE_READ, CodecParams, init_codec
from dsp_tpu.codecs.base import get_codec_info_by_type

FS = 44100

_SHIM = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "native", "libdspmad.so")


def _lame():
    name = ctypes.util.find_library("mp3lame") or "libmp3lame.so.0"
    try:
        return ctypes.CDLL(name)
    except OSError:
        return None


def encode_mp3(path, x, fs=FS):
    """Encode [n, 2] float64 in [-1, 1] to MP3 CBR with libmp3lame."""
    lame = _lame()
    if lame is None:
        pytest.skip("libmp3lame unavailable")
    lame.lame_init.restype = ctypes.c_void_p
    gf = lame.lame_init()
    lame.lame_set_in_samplerate(ctypes.c_void_p(gf), fs)
    lame.lame_set_num_channels(ctypes.c_void_p(gf), 2)
    lame.lame_set_brate(ctypes.c_void_p(gf), 192)
    assert lame.lame_init_params(ctypes.c_void_p(gf)) >= 0
    pcm = np.clip(np.asarray(x) * 32767.0, -32768, 32767).astype(np.int16)
    n = len(pcm)
    out = ctypes.create_string_buffer(int(1.25 * n + 7200))
    wrote = lame.lame_encode_buffer_interleaved(
        ctypes.c_void_p(gf), pcm.ctypes.data_as(ctypes.c_void_p), n, out, len(out)
    )
    assert wrote >= 0
    with open(path, "wb") as f:
        f.write(out.raw[:wrote])
        tail = ctypes.create_string_buffer(7200)
        wrote = lame.lame_encode_flush(ctypes.c_void_p(gf), tail, len(tail))
        f.write(tail.raw[:wrote])
    lame.lame_close(ctypes.c_void_p(gf))
    return path


@pytest.fixture(scope="module")
def mp3_file(tmp_path_factory):
    t = np.arange(2 * FS) / FS
    x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                  0.5 * np.sin(2 * np.pi * 1000 * t)], axis=1)
    return encode_mp3(str(tmp_path_factory.mktemp("mp3") / "tone.mp3"), x), x


def _dominant_hz(y, fs):
    w = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    return np.argmax(w) * fs / len(y)


def test_registration_matches_shim_presence():
    """'mp3' exists as a codec type iff the mad shim is built — the
    reference's HAVE_MAD behavior (codec.c:118-120)."""
    ci = get_codec_info_by_type("mp3")
    if os.path.exists(_SHIM):
        assert ci is not None and ci.modes == CODEC_MODE_READ
        assert ci.encodings == ("mad_f",)
    else:
        assert ci is None


def test_mp3_decodes_by_extension(mp3_file):
    """.mp3 opens without an explicit type: the mad codec when built, else
    the ffmpeg codec via extension dispatch (codec.c fallback)."""
    path, x = mp3_file
    c = init_codec(CodecParams(path, mode=CODEC_MODE_READ))
    assert c.fs == FS and c.channels == 2
    y = c.read(3 * FS)
    c.close()
    assert len(y) >= int(1.9 * FS)  # ~2 s minus codec delay conventions
    # decoder delay offsets the waveform; verify content spectrally
    mid = y[FS // 2 : FS // 2 + 32768]
    assert abs(_dominant_hz(mid[:, 0], FS) - 440.0) < 3.0
    assert abs(_dominant_hz(mid[:, 1], FS) - 1000.0) < 3.0
    rms = np.sqrt((mid ** 2).mean(axis=0))
    np.testing.assert_allclose(rms, 0.5 / np.sqrt(2), rtol=0.1)


def test_mp3_seek_and_reread(mp3_file):
    path, x = mp3_file
    c = init_codec(CodecParams(path, mode=CODEC_MODE_READ))
    a = c.read(FS)
    got = c.seek(0)
    assert got >= 0
    b = c.read(FS)
    c.close()
    # same content from the same position (both decoders restart exactly)
    n = min(len(a), len(b))
    assert np.abs(a[:n] - b[:n]).max() < 1e-9


@pytest.mark.skipif(not os.path.exists(_SHIM), reason="mad shim not built")
def test_mad_shim_properties(mp3_file):
    """Shim-specific surface: enc mad_f, prec 24, frame pre-scan, mid-file
    seek lands at or past the target on a frame boundary (mp3.c:86-134)."""
    path, _ = mp3_file
    c = init_codec(CodecParams(path, type="mp3", mode=CODEC_MODE_READ))
    assert c.enc == "mad_f" and c.prec == 24
    assert c.frames > 0
    target = FS // 2
    got = c.seek(target)
    assert got >= target and got - target <= 1152  # one MPEG frame granule
    c.close()
