"""Differential battery against the compiled C reference binary.

This is the test harness mandated by SURVEY.md §4: the reference itself has
no test suite, so quality assurance for the rebuild is (a) golden-value tests
and (b) *differential* tests against the compiled C build
(/root/reference, built at /tmp/refbuild/dsp — see CLAUDE.md).

Every audio case runs the SAME chain argv through the C binary (subprocess,
raw float64 pcm output) and through dsp_tpu's CLI main() (in-process, CPU
float64) on identical sgen inputs, then asserts

  * exact output frame counts, and
  * max |err| <= a budget (default -120 dBFS per BASELINE.json; looser only
    where noted, e.g. matrix4's adaptive surrounds).

Plot cases assert byte equality of the emitted gnuplot program
(effects_chain.c:1105-1184); stats cases assert text equality of the
accumulator table (stats.c:167-251); behavior cases assert exit codes.

All tests skip when the C binary is absent (it lacks fftw-gated effects:
resample/fir/fir_p/hilbert/zita/matrix4_mb — those are covered by checked-in
goldens in test_goldens.py instead).
"""

import contextlib
import io
import math
import os
import subprocess

import numpy as np
import pytest

REF_BIN = "/tmp/refbuild/dsp/dsp"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_BIN), reason="C reference binary not built"
)

# deterministic full-band test signals (sgen is the de-facto fixture codec,
# SURVEY.md §4); levels keep summing effects (crossfeed/matrix4) unclipped
MONO_SWEEP = "sine:freq=35-16k+0.5"
MONO_TONE = "sine:freq=997+0.5"
STEREO_SPEC = "sine@0:freq=35-16k/sine@1:freq=16k-35+0.5"


def run_ref(args, timeout=60):
    return subprocess.run(
        [REF_BIN] + args, capture_output=True, text=True, timeout=timeout
    )


def run_tpu_inproc(args):
    """Run dsp_tpu's CLI main() in-process, capturing stdout/stderr/rc."""
    from dsp_tpu.cli.main import main

    out, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
        try:
            rc = main(list(args))
        except SystemExit as e:  # pragma: no cover - CLI shouldn't sys.exit
            rc = int(e.code or 0)
    return rc, out.getvalue(), err.getvalue()


def render_pair(tmp_path, channels, spec, chain, gain_pre=None):
    """Render `chain` through both implementations; return (ref, tpu) arrays."""
    ref_raw = str(tmp_path / "ref.raw")
    tpu_raw = str(tmp_path / "tpu.raw")
    base = ["-q"]
    if channels != 1:
        base += ["-c", str(channels)]
    base += ["-t", "sgen", spec, "-o", "-t", "pcm", "-e", "double"]
    chain = list(chain)
    if gain_pre is not None:
        chain = ["gain", str(gain_pre)] + chain
    r = run_ref(base + [ref_raw] + chain)
    assert r.returncode == 0, f"C reference failed: {r.stderr}"
    rc, _, err = run_tpu_inproc(base + [tpu_raw] + chain)
    assert rc == 0, f"dsp_tpu failed: {err}"
    a = np.fromfile(ref_raw, dtype=np.float64)
    b = np.fromfile(tpu_raw, dtype=np.float64)
    return a, b


def assert_diff(a, b, tol_dbfs=-120.0, what=""):
    assert a.shape == b.shape, f"{what}: frame counts differ {a.shape} vs {b.shape}"
    err = float(np.abs(a - b).max()) if a.size else 0.0
    err_db = 20 * math.log10(err) if err > 0 else -np.inf
    assert err_db <= tol_dbfs, f"{what}: max err {err_db:.1f} dBFS > {tol_dbfs}"


# ---------------------------------------------------------------------------
# Battery A: audio differential — biquad family (biquad.c:111-294)
# ---------------------------------------------------------------------------

BIQUAD_CASES = [
    ("lowpass_1", ["lowpass_1", "1k"]),
    ("highpass_1", ["highpass_1", "1k"]),
    ("allpass_1", ["allpass_1", "1k"]),
    ("lowshelf_1", ["lowshelf_1", "200", "+4"]),
    ("highshelf_1", ["highshelf_1", "8k", "-3"]),
    ("lowpass_1p", ["lowpass_1p", "2k"]),
    ("lowpass", ["lowpass", "18k", "0.7071"]),
    ("highpass_nearDC", ["highpass", "30", "0.7071"]),
    ("bandpass_skirt", ["bandpass_skirt", "1k", "1.0"]),
    ("bandpass_peak", ["bandpass_peak", "1k", "1.2"]),
    ("notch", ["notch", "60", "4.0"]),
    ("allpass", ["allpass", "3k", "0.9"]),
    ("eq", ["eq", "1k", "1.0", "+3"]),
    ("eq_octave_width", ["eq", "3.5k", "0.8o", "-2"]),
    ("lowshelf_slope", ["lowshelf", "90", "0.7071s", "+4"]),
    ("lowshelf_dslope", ["lowshelf", "120", "6d", "+3"]),
    ("highshelf_slope", ["highshelf", "10k", "0.7071s", "-2"]),
    ("width_hz", ["lowpass", "2.5k", "300h"]),
    ("width_khz", ["highpass", "500", "0.2k"]),
    ("bw_macro", ["lowpass", "1k", "bw4.0", "lowpass", "1k", "bw4.1"]),
    ("lowpass_transform", ["lowpass_transform", "100", "0.5", "80", "0.6"]),
    ("highpass_transform", ["highpass_transform", "50", "0.7", "60", "0.5"]),
    ("linkwitz_transform", ["linkwitz_transform", "40", "1.1", "30", "0.9"]),
    ("deemph", ["deemph"]),
    ("biquad_direct", ["biquad", "0.2928", "0.5857", "0.2928", "1.0", "-0.1", "0.1716"]),
]


@pytest.mark.parametrize("name,chain", BIQUAD_CASES, ids=[c[0] for c in BIQUAD_CASES])
def test_biquad_family_diff(tmp_path, name, chain):
    a, b = render_pair(tmp_path, 1, MONO_SWEEP, chain)
    assert_diff(a, b, -120.0, name)


REVERSE_CASES = [
    ("reverse_lowpass", ["lowpass", "-r", "1k", "0.7071"]),
    ("reverse_eq_thresh", ["eq", "-r120", "1k", "1.0", "+6"]),
    ("reverse_cascade_merge", ["lowpass", "-r", "2k", "0.7071", "highpass", "-r", "100", "0.7071"]),
    # stage-count boundary: thresh+6.02 dB law crosses a power of two here —
    # advance must be 8192 like the C build (RIIR_POLE_MIN_STAGES,
    # reverse_iir.c:364), not 4096
    ("reverse_stage_boundary", ["highpass", "-r", "22.5", "0.7071"]),
    # merged cascade with DIFFERENT per-section thresholds (each section
    # keeps its own truncation depth, reverse_iir.c:697)
    ("reverse_mixed_thresh", ["lowpass", "-r40", "1k", "0.7071",
                              "highpass", "-r120", "30", "0.7071"]),
]


@pytest.mark.parametrize("name,chain", REVERSE_CASES, ids=[c[0] for c in REVERSE_CASES])
def test_reverse_iir_diff(tmp_path, name, chain):
    a, b = render_pair(tmp_path, 1, MONO_SWEEP, chain)
    assert_diff(a, b, -120.0, name)


# ---------------------------------------------------------------------------
# Battery A: audio differential — other effect families
# ---------------------------------------------------------------------------

EFFECT_CASES = [
    # (name, channels, input spec, chain, pre-gain dB or None, tol dBFS)
    ("gain_merge", 1, MONO_SWEEP, ["gain", "-3", "mult", "0.5", "add", "0.1"], None, -120.0),
    ("gain_selectors", 2, STEREO_SPEC, [":0", "gain", "-3", ":", "gain", "-1"], None, -120.0),
    ("crossfeed", 2, STEREO_SPEC, ["crossfeed", "700", "4.5"], "-8", -120.0),
    ("st2ms_ms2st", 2, STEREO_SPEC, ["st2ms", "ms2st"], None, -120.0),
    ("ms_gain", 2, STEREO_SPEC, ["st2ms", ":0", "gain", "-2", ":", "ms2st"], "-6", -120.0),
    ("remix_swap", 2, STEREO_SPEC, ["remix", "1", "0"], None, -120.0),
    ("remix_downmix", 2, STEREO_SPEC, ["remix", "0,1"], "-8", -120.0),
    ("remix_dup", 2, STEREO_SPEC, ["remix", ".", "0"], None, -120.0),
    ("delay_int_subset", 2, STEREO_SPEC, [":0", "delay", "0.5m", ":", "gain", "0"], None, -120.0),
    ("delay_thiran", 2, STEREO_SPEC, [":1", "delay", "-f", "0.37m", ":"], None, -120.0),
    ("delay_thiran_order", 1, MONO_SWEEP, ["delay", "-f12", "0.29m"], None, -120.0),
    ("decorrelate_seeded", 2, STEREO_SPEC, ["decorrelate", "-s", "12345", "4"], "-6", -120.0),
    ("decorrelate_mono_flag", 2, STEREO_SPEC, ["decorrelate", "-m", "-s", "777", "3"], "-6", -120.0),
    # matrix4 meets the full budget since the event-state init fixes
    # (ds_ord_buf calloc'd like C, phase-flip pos 0.5, lround frame counts):
    # measured -245 dBFS on this signal
    ("matrix4", 2, STEREO_SPEC, ["matrix4", "-6"], "-10", -120.0),
    # option-matrix coverage of the adaptive engine (matrix4_common.c:126-260)
    ("matrix4_v1", 2, STEREO_SPEC, ["matrix4", "matrix=v1", "-6"], "-10", -120.0),
    ("matrix4_v2", 2, STEREO_SPEC, ["matrix4", "matrix=v2", "-6"], "-10", -120.0),
    ("matrix4_srd", 2, STEREO_SPEC, ["matrix4", "surround_delay=20m", "-6"], "-10", -120.0),
    ("matrix4_no_shelf_lp", 2, STEREO_SPEC,
     ["matrix4", "shelf=none,lowpass=none", "-6"], "-10", -120.0),
    ("matrix4_no_flip", 2, STEREO_SPEC,
     ["matrix4", "phase_flip=false", "-6"], "-10", -120.0),
    ("matrix4_direct_path", 2, STEREO_SPEC,
     ["matrix4", "direct_path,rear_event_mask=0", "-3/0"], "-10", -120.0),
    ("northstar_mix", 2, STEREO_SPEC,
     ["eq", "1k", "1.0", "+3", "eq", "3.5k", "0.8", "-2",
      "lowshelf", "90", "0.7071s", "+4", "highshelf", "10k", "0.7071s", "-2",
      "lowpass", "18k", "0.7071", "highpass", "30", "0.7071",
      "crossfeed", "700", "4.5", "st2ms", "ms2st"], "-8", -120.0),
]


@pytest.mark.parametrize(
    "name,ch,spec,chain,pre,tol", EFFECT_CASES, ids=[c[0] for c in EFFECT_CASES]
)
def test_effect_diff(tmp_path, name, ch, spec, chain, pre, tol):
    a, b = render_pair(tmp_path, ch, spec, chain, gain_pre=pre)
    assert_diff(a, b, tol, name)


# ---------------------------------------------------------------------------
# Battery B: plot mode byte-equality (effects_chain.c:1105-1184)
# ---------------------------------------------------------------------------

PLOT_CASES = [
    ("plot_eq", ["-pn", "eq", "1k", "1.0", "+3"]),
    ("plot_shelves", ["-pn", "lowshelf", "90", "0.7071s", "+4",
                      "highshelf", "10k", "0.7071s", "-2"]),
    ("plot_selector_mix", ["-p", "-c", "2", "-n", ":0", "eq", "1k", "1.0", "+3",
                           ":", "gain", "-3"]),
    ("plot_delay_frac", ["-pn", "delay", "-f8", "0.25m"]),
    ("plot_phase", ["-Pn", "lowpass", "1k", "0.7071", "allpass", "3k", "0.9"]),
    ("plot_mix_remix", ["-p", "-c", "2", "-n", "remix", "0,1", "eq", "2k", "1.0", "-4"]),
]


@pytest.mark.parametrize("name,args", PLOT_CASES, ids=[c[0] for c in PLOT_CASES])
def test_plot_byte_equality(name, args):
    r = run_ref(args)
    assert r.returncode == 0, r.stderr
    rc, out, err = run_tpu_inproc(args)
    assert rc == 0, err
    assert out == r.stdout, f"{name}: plot output differs"


# ---------------------------------------------------------------------------
# Battery C: stats table text equality (stats.c:167-251)
# ---------------------------------------------------------------------------


def _stats_block(text):
    """Extract the stats table: from the first 'Channel' line onward."""
    lines = text.splitlines()
    for i, ln in enumerate(lines):
        if ln.startswith("Channel"):
            return "\n".join(lines[i:]).rstrip()
    return ""


STATS_CASES = [
    ("stats_tone", 1, MONO_TONE, ["stats"]),
    ("stats_sweep_ref_level", 1, MONO_SWEEP, ["stats", "6"]),
    ("stats_truepeak", 1, MONO_TONE, ["stats", "-i"]),
    ("stats_stereo", 2, STEREO_SPEC, ["gain", "-8", "crossfeed", "700", "4.5", "stats"]),
    # true peak inside the final lookahead window: exercises the
    # end-of-stream interpolator flush (stats_effect_destroy, stats.c:219)
    ("stats_end_peak", 1, "delta:offset=510S+0.0117", ["gain", "-0.2", "stats", "-i"]),
    ("stats_silence", 1, "delta:offset=0S+0.01", ["gain", "-200", "stats"]),
]


@pytest.mark.parametrize(
    "name,ch,spec,chain", STATS_CASES, ids=[c[0] for c in STATS_CASES]
)
def test_stats_text_equality(name, ch, spec, chain):
    base = ["-q"]
    if ch != 1:
        base += ["-c", str(ch)]
    base += ["-t", "sgen", spec, "-o", "-t", "null", "null"]
    r = run_ref(base + chain)
    assert r.returncode == 0, r.stderr
    rc, _, err = run_tpu_inproc(base + chain)
    assert rc == 0, err
    ref_tbl = _stats_block(r.stderr)
    tpu_tbl = _stats_block(err)
    assert ref_tbl, "reference produced no stats table"
    assert tpu_tbl == ref_tbl, f"{name}: stats table differs"


# ---------------------------------------------------------------------------
# Battery D: CLI behavior — exit codes, frame counts, transport options
# ---------------------------------------------------------------------------

BEHAVIOR_CASES = [
    # (name, args, expect_ok)
    ("err_unknown_effect", ["-n", "{", "bogus_effect", "}"], False),
    ("err_unmatched_brace", ["-n", "{", "gain", "-3"], False),
    ("err_bad_selector", ["-n", ":5", "gain", "-3"], False),
    ("err_biquad_argc", ["-n", "eq", "1k"], False),
    ("err_bad_freq", ["-n", "eq", "zzz", "1.0", "+3"], False),
    ("err_crossfeed_mono", ["-n", "crossfeed", "700", "4.5"], False),
    ("err_stats_neg_ref", ["-n", "stats", "-6"], False),
    ("err_timespan_open_end", ["-q", "-T", "0.2-", "-t", "sgen", "sine:freq=1k+0.3",
                               "-o", "-t", "null", "null", "gain", "-3"], False),
    ("allow_fail_bang", ["-q", "-t", "sgen", "sine:freq=1k+0.05",
                         "-o", "-t", "null", "null", "!", "crossfeed", "700", "4.5",
                         "gain", "-3"], True),
    ("ok_empty_chain", ["-q", "-t", "sgen", "sine:freq=1k+0.05",
                        "-o", "-t", "null", "null"], True),
]


@pytest.mark.parametrize(
    "name,args,expect_ok", BEHAVIOR_CASES, ids=[c[0] for c in BEHAVIOR_CASES]
)
def test_cli_behavior(name, args, expect_ok):
    r = run_ref(args)
    rc, _, err = run_tpu_inproc(args)
    assert (r.returncode == 0) == expect_ok, f"ref: {r.stderr}"
    assert (rc == 0) == expect_ok, f"tpu: {err}"


TRANSPORT_CASES = [
    # -T time ranges and -l repeats must produce identical frame counts and audio
    ("timespan_abs", ["-T", "0.1-0.3"]),
    ("timespan_rel_end", ["-T", "0.1+0.2"]),
    ("timespan_neg_end", ["-T", "-0.1"]),
    ("repeats", ["-l2"]),
]


@pytest.mark.parametrize("name,opts", TRANSPORT_CASES, ids=[c[0] for c in TRANSPORT_CASES])
def test_transport_diff(tmp_path, name, opts):
    ref_raw = str(tmp_path / "ref.raw")
    tpu_raw = str(tmp_path / "tpu.raw")
    base = ["-q"] + opts + ["-t", "sgen", MONO_SWEEP,
                            "-o", "-t", "pcm", "-e", "double"]
    chain = ["eq", "1k", "1.0", "+3"]
    r = run_ref(base + [ref_raw] + chain)
    assert r.returncode == 0, r.stderr
    rc, _, err = run_tpu_inproc(base + [tpu_raw] + chain)
    assert rc == 0, err
    a = np.fromfile(ref_raw, dtype=np.float64)
    b = np.fromfile(tpu_raw, dtype=np.float64)
    assert_diff(a, b, -120.0, name)


# ---------------------------------------------------------------------------
# Battery E: output encodings — bit-exact quantization (sampleconv.h:35-47)
# ---------------------------------------------------------------------------

ENC_CASES = ["s16", "s24", "s32", "u8", "s8", "s24_3", "float"]


@pytest.mark.parametrize("enc", ENC_CASES)
def test_output_encoding_bit_exact(tmp_path, enc):
    """Quantized pcm output must match the C build byte-for-byte (the chain
    output is identical in f64 and BIT_PERFECT rounding must agree)."""
    ref_raw = str(tmp_path / "ref.raw")
    tpu_raw = str(tmp_path / "tpu.raw")
    # -120 dB dither would break byte-equality: disable via explicit gain-only
    # chain (gain has NO_DITHER? no - dither applies only when quantizing;
    # the app-level auto-dither engages for prec < 24: force none with -d0?).
    # The reference only auto-dithers when a chain effect requests it; a plain
    # gain chain on sgen input does not dither (SHOULD_DITHER needs
    # CAN_DITHER hint which pcm files lack).
    base = ["-q", "-D", "-t", "sgen", MONO_SWEEP, "-o", "-t", "pcm", "-e", enc]
    chain = ["gain", "-3.17"]
    r = run_ref(base + [ref_raw] + chain)
    assert r.returncode == 0, r.stderr
    rc, _, err = run_tpu_inproc(base + [tpu_raw] + chain)
    assert rc == 0, err
    with open(ref_raw, "rb") as f:
        ra = f.read()
    with open(tpu_raw, "rb") as f:
        tb = f.read()
    assert ra == tb, f"{enc}: quantized bytes differ (len {len(ra)} vs {len(tb)})"


# ---------------------------------------------------------------------------
# Battery F: dither noise-shaping spectra (dither.c:67-170)
# ---------------------------------------------------------------------------
# Dither realizations are independently seeded, so outputs can't be compared
# sample-wise; instead the SHAPED RESIDUAL (dithered output minus the
# unquantized render) must have the same octave-band power spectrum. This
# enforces the PARITY.md claim (bands within ~1 dB) for every shape.

DITHER_SHAPES = ["flat", "sloped", "sloped2", "lipshitz", "wan3", "wan9"]


def _render_residual(tmp_path, tag, runner, shape):
    """-> residual of a -60 dBFS 997 Hz tone dithered to 16 bits (float64)."""
    spec = "sine:freq=997+4"
    dith = str(tmp_path / f"{tag}_d.raw")
    clean = str(tmp_path / f"{tag}_c.raw")
    base = ["-q", "-t", "sgen", spec, "-o", "-t", "pcm", "-e", "double"]
    runner(base + [dith, "gain", "-60", "dither", shape, "16"])
    runner(base + [clean, "gain", "-60"])
    return np.fromfile(dith, dtype=np.float64) - np.fromfile(clean, dtype=np.float64)


@pytest.mark.parametrize("shape", DITHER_SHAPES)
def test_dither_shape_spectrum(tmp_path, shape):
    def run_c(args):
        r = run_ref(args)
        assert r.returncode == 0, r.stderr

    def run_t(args):
        rc, _, err = run_tpu_inproc(args)
        assert rc == 0, err

    ra = _render_residual(tmp_path, "ref", run_c, shape)
    rb = _render_residual(tmp_path, "tpu", run_t, shape)
    assert len(ra) == len(rb)
    pa = np.abs(np.fft.rfft(ra)) ** 2
    pb = np.abs(np.fft.rfft(rb)) ** 2
    fs, n = 44100, len(ra)
    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    lo = 125.0
    while lo * 2 <= 20000.0:
        m = (freqs >= lo) & (freqs < lo * 2)
        # skip the tone's band-edge leakage: drop bins within 30 Hz of 997
        m &= np.abs(freqs - 997.0) > 30.0
        da = 10 * np.log10(pa[m].mean())
        db = 10 * np.log10(pb[m].mean())
        assert abs(da - db) < 1.0, (
            f"{shape}: octave {lo:.0f}-{lo*2:.0f} Hz differs "
            f"{da:.2f} vs {db:.2f} dB"
        )
        lo *= 2
