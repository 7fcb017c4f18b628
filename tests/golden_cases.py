"""Shared case table for the checked-in golden renders (test_goldens.py).

These cover the effects the local C reference build cannot run (fftw-gated:
resample / fir / fir_p / hilbert / zita_convolver / matrix4_mb — see
/root/reference/configure:137-146). Their accuracy was established against
analytic targets (PARITY.md: resample −235 dB SNR, fir exact vs direct
convolution, hilbert analytic phase); the goldens freeze that verified
behavior so `pytest tests/` fails if any of it regresses.

Each case renders through the real CLI path (sgen input → chain → raw f64
pcm) on CPU/float64. Filter files needed by fir/zita are generated
deterministically at run time (seeded numpy) into a temp dir; `%d` in the
chain is substituted with that dir.
"""

import numpy as np

MONO_SWEEP = "sine:freq=35-16k+0.25"
STEREO_SPEC = "sine@0:freq=35-16k/sine@1:freq=16k-35+0.25"


def write_filter_wavs(tmpdir):
    """Deterministic random FIR filters as f64 WAVs via our own codec."""
    from dsp_tpu.codecs import CodecParams, init_codec
    from dsp_tpu.codecs.base import CODEC_MODE_WRITE

    rng = np.random.default_rng(0xD5B)
    out = {}
    for name, taps, ch in (("f63.wav", 63, 1), ("f4096.wav", 4096, 1),
                           ("f1024_st.wav", 1024, 2)):
        h = rng.standard_normal((taps, ch))
        h *= 0.5 / np.abs(h).sum(axis=0).max()  # keep |H| bounded
        path = f"{tmpdir}/{name}"
        p = CodecParams(path, type="wav", enc="double", fs=44100, channels=ch,
                        mode=CODEC_MODE_WRITE)
        w = init_codec(p)
        w.write(h)
        w.close()
        out[name] = path
    return out


# (name, channels, sgen spec, chain argv with %d = filter dir)
CASES = [
    ("resample_up_96k", 1, MONO_SWEEP, ["resample", "96000"]),
    ("resample_down_22k", 1, MONO_SWEEP, ["resample", "22050"]),
    ("resample_48k", 1, MONO_SWEEP, ["resample", "48k"]),
    ("fir_short_direct", 1, MONO_SWEEP, ["fir", "coefs:0.42,0.31,-0.18,0.09,0.04,-0.02"]),
    ("fir_file_63", 1, MONO_SWEEP, ["fir", "%d/f63.wav"]),
    ("fir_file_4096", 1, MONO_SWEEP, ["fir", "%d/f4096.wav"]),
    ("fir_p_4096", 1, MONO_SWEEP, ["fir_p", "%d/f4096.wav"]),
    ("fir_stereo_1024", 2, STEREO_SPEC, ["gain", "-6", "fir", "%d/f1024_st.wav"]),
    ("zita_4096", 1, MONO_SWEEP, ["zita_convolver", "%d/f4096.wav"]),
    ("hilbert_255", 1, MONO_SWEEP, ["hilbert", "255"]),
    ("hilbert_angle", 1, MONO_SWEEP, ["hilbert", "-a", "-45", "127"]),
    ("matrix4_mb", 2, STEREO_SPEC, ["gain", "-10", "matrix4_mb", "-6"]),
    ("matrix4_mb_cheb", 2, STEREO_SPEC,
     ["gain", "-10", "matrix4_mb", "filter_type=chebyshev1", "-6"]),
    ("matrix4_mb_cheb2", 2, STEREO_SPEC,
     ["gain", "-10", "matrix4_mb", "filter_type=chebyshev2:30", "-6"]),
    ("matrix4_mb_ellip", 2, STEREO_SPEC,
     ["gain", "-10", "matrix4_mb", "filter_type=elliptic:55:70", "-6"]),
]
