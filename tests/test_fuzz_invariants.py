"""Property-based chain fuzzing: the systematic invariant harness.

The reference's QA analog is its ASan/UBSan debug build plus runtime "BUG:"
invariant logs (SURVEY.md §4; configure:210-216, effects_chain.c:813,828).
A JAX rebuild has no memory unsafety to sanitize; the failure modes that
matter here are structural: bookkeeping errors in the chain compiler's
passes (merge/alignment/drain/block-quantization), dtype or tree-structure
drift in carried state pytrees (silent retrace + state corruption),
block-size-dependent semantics (the reference guarantees `-b` changes only
latency, SURVEY.md §5), and NaN/Inf escaping an unstable recurrence.

This module generates seeded random-but-valid chains over the deterministic
effect pool and asserts, for every chain:

  1. build + compile + run succeeds and the output is finite;
  2. output length exactly matches the drain/ratio/discard bookkeeping;
  3. processing is block-size independent (block 512 == block 2048);
  4. reset() restores bit-identical behavior;
  5. the carried state pytree keeps its structure/shapes/dtypes across steps;
  6. float32 compilation of the same chain stays finite (NaN guard for the
     TPU dtype policy).

plus a fuzzed differential battery against the C reference binary (same
random chains through both CLIs, <= -120 dBFS; skipped when absent).
"""

import math
import os
import random
import subprocess

import numpy as np
import pytest

from dsp_tpu.chain import CompiledChain, build_chain_from_string
from dsp_tpu.core.types import StreamInfo

FS = 44100
CH = 2
REF_BIN = "/tmp/refbuild/dsp/dsp"


# --- random-but-valid effect generators ------------------------------------
# Each takes (rng) and returns a list of chain words. Only deterministic
# effects: noise/dither draw fresh randomness per run and stats/levels write
# to the terminal; they are covered by their own tests.

def _freq(r, lo=40.0, hi=16000.0):
    f = lo * (hi / lo) ** r.random()
    if r.random() < 0.3:
        return f"{f / 1000.0:.4g}k"
    return f"{f:.4g}"


def _width(r):
    kind = r.random()
    if kind < 0.6:
        return f"{r.uniform(0.3, 2.5):.4g}"  # plain Q
    if kind < 0.8:
        return f"{r.uniform(0.3, 2.5):.4g}q"
    return f"{r.uniform(0.2, 2.0):.4g}o"  # octaves


def _gain(r):
    return f"{r.uniform(-12.0, 6.0):+.4g}"


def g_biquad2(r):
    name = r.choice(
        ["lowpass", "highpass", "bandpass_skirt", "bandpass_peak", "notch", "allpass"]
    )
    return [name, _freq(r, 60, 14000), _width(r)]


def g_biquad_gain(r):
    name = r.choice(["eq", "lowshelf", "highshelf"])
    return [name, _freq(r, 60, 12000), _width(r), _gain(r)]


def g_biquad1(r):
    name = r.choice(["lowpass_1", "highpass_1", "allpass_1", "lowpass_1p"])
    return [name, _freq(r)]


def g_shelf1(r):
    return [r.choice(["lowshelf_1", "highshelf_1"]), _freq(r, 60, 8000), _gain(r)]


def g_biquad_direct(r):
    """Random stable biquad: poles and zeros drawn inside the unit disc."""
    rp = r.uniform(0.0, 0.985)
    tp = r.uniform(0.0, math.pi)
    rz = r.uniform(0.0, 1.1)  # zeros may sit outside (non-minimum-phase)
    tz = r.uniform(0.0, math.pi)
    a1, a2 = -2.0 * rp * math.cos(tp), rp * rp
    b0 = r.uniform(0.2, 1.0)
    b1, b2 = -2.0 * rz * math.cos(tz) * b0, rz * rz * b0
    return ["biquad"] + [f"{v:.6g}" for v in (b0, b1, b2, 1.0, a1, a2)]


def g_gain(r):
    k = r.random()
    if k < 0.5:
        return ["gain", _gain(r)]
    if k < 0.8:
        return ["mult", f"{r.uniform(0.3, 1.5):.4g}"]
    return ["add", f"{r.uniform(-0.01, 0.01):.5g}"]


def g_delay(r):
    t = f"{r.uniform(0.05, 8.0):.4g}m"
    if r.random() < 0.4:
        order = r.choice(["", "2", "3", "5"])
        return ["delay", f"-f{order}", t]
    return ["delay", t]


def g_stms(r):
    return ["st2ms"] if r.random() < 0.5 else ["ms2st"]


def g_crossfeed(r):
    return ["crossfeed", _freq(r, 300, 1200), f"{r.uniform(2.0, 8.0):.3g}"]


def g_remix(r):
    # stereo-preserving remixes only, so the rest of the pool stays valid
    return ["remix"] + r.choice([["1", "0"], ["0,1", "0,1"], ["0", "0,1"]])


def g_fir(r):
    n = r.randint(3, 24)
    h = [r.uniform(-1.0, 1.0) for _ in range(n)]
    s = sum(abs(v) for v in h) or 1.0
    h = [v / s for v in h]
    return ["fir", "coefs:" + ",".join(f"{v:.5g}" for v in h)]


def g_hilbert(r):
    return ["hilbert", str(r.choice([63, 127, 255]))]


def g_resample(r):
    return ["resample", r.choice(["48k", "88.2k", "x2", "32k"])]


# (generator, weight, C-build-supported)
POOL = [
    (g_biquad2, 3, True),
    (g_biquad_gain, 3, True),
    (g_biquad1, 2, True),
    (g_shelf1, 1, True),
    (g_biquad_direct, 2, True),
    (g_gain, 2, True),
    (g_delay, 2, True),
    (g_stms, 1, True),
    (g_crossfeed, 1, True),
    (g_remix, 1, True),
    (g_fir, 2, False),  # fftw-gated in the local C build
    (g_hilbert, 1, False),
    (g_resample, 1, False),
]


def gen_chain(seed, n_lo=2, n_hi=5, c_safe=False, allow_rate=True):
    """Deterministic random chain string for a 2-channel stream."""
    r = random.Random(seed)
    pool = [(g, w) for g, w, csafe in POOL if (csafe or not c_safe)]
    if not allow_rate:
        pool = [(g, w) for g, w in pool if g is not g_resample]
    gens = [g for g, w in pool for _ in range(w)]
    words = []
    n = r.randint(n_lo, n_hi)
    used_resample = False
    for _ in range(n):
        g = r.choice(gens)
        if g is g_resample:
            if used_resample:
                continue
            used_resample = True
        eff = g(r)
        # occasional channel selector on selector-safe single-channel effects
        if g in (g_biquad2, g_biquad_gain, g_biquad1, g_shelf1, g_gain) and r.random() < 0.25:
            sel = r.choice([":0", ":1", ":0,1"])
            if r.random() < 0.3:
                words += [sel, "{"] + eff + ["}"]
            else:
                words += [sel] + eff + [":"]  # restore full selector after
        else:
            words += eff
    return " ".join(words)


def _signal(frames, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(frames) / FS
    x = np.stack(
        [
            0.25 * np.sin(2 * np.pi * 330 * t) + 0.1 * rng.standard_normal(frames),
            0.25 * np.sin(2 * np.pi * 440 * t + 0.3) + 0.1 * rng.standard_normal(frames),
        ],
        axis=1,
    )
    return x


def _tree_sig(tree):
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return treedef, [(np.shape(l), np.asarray(l).dtype) for l in leaves]


# seeds 12/15/17 include `resample` — rate-changing chains exercise the
# block-quantization (lcm) logic and fractional output-length bookkeeping
SEEDS = list(range(12)) + [12, 15, 17]


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_chain_invariants(seed):
    import jax.numpy as jnp

    s = gen_chain(seed)
    chain = build_chain_from_string(s, StreamInfo(FS, CH))
    x = _signal(12288)

    cc_a = CompiledChain(chain, block_frames=512, dtype=jnp.float64)
    cc_b = CompiledChain(chain, block_frames=2048, dtype=jnp.float64)

    # (5) state pytree hygiene across a jitted step
    sig0 = _tree_sig(cc_a.states)
    y_blk = cc_a.run_block(np.zeros((cc_a.block_frames, CH)))
    assert _tree_sig(cc_a.states) == sig0, f"state drift: {s}"
    assert y_blk.shape == (cc_a.out_frames, chain.ostream.channels)
    cc_a.reset()

    # (1)+(2) finite output with exact length bookkeeping
    y_a = cc_a.process_array(x)
    r = chain.ratio
    expect = (-(-len(x) * r.numerator // r.denominator)
              + chain.drain_out_frames - chain.output_discard)
    assert y_a.shape == (expect, chain.ostream.channels), f"length: {s}"
    assert np.isfinite(y_a).all(), f"non-finite output: {s}"

    # (3) block-size independence (the reference's `-b` guarantee)
    y_b = cc_b.process_array(x)
    assert y_b.shape == y_a.shape, f"block-size-dependent length: {s}"
    denom = max(np.abs(y_a).max(), 1e-3)
    err = np.abs(y_a - y_b).max() / denom
    assert err < 1e-10, f"block-size-dependent output ({err:.2e}): {s}"

    # (4) reset determinism
    cc_a.reset()
    y_r = cc_a.process_array(x)
    assert np.array_equal(y_a, y_r), f"reset not deterministic: {s}"


@pytest.mark.parametrize("seed", [0, 3, 6, 9, 12])
def test_fuzz_chain_f32_finite(seed):
    """The TPU dtype policy runs chains in f32; fuzzed chains must not go
    non-finite there (near-unit-circle poles are the classic blow-up)."""
    import jax.numpy as jnp

    s = gen_chain(seed)
    chain = build_chain_from_string(s, StreamInfo(FS, CH))
    cc = CompiledChain(chain, block_frames=512, dtype=jnp.float32)
    y = cc.process_array(_signal(8192))
    assert np.isfinite(y).all(), f"f32 non-finite: {s}"


# --- fuzzed differential battery vs the C build ----------------------------

@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="C reference binary not built")
@pytest.mark.parametrize("seed", range(100, 116))
def test_fuzz_diff_vs_c(seed, tmp_path):
    import contextlib
    import io

    from dsp_tpu.cli.main import main

    s = gen_chain(seed, c_safe=True, allow_rate=False)
    chain_words = s.split()
    spec = "sine@0:freq=35-16k/sine@1:freq=16k-35+0.4"
    ref_raw = str(tmp_path / "ref.raw")
    tpu_raw = str(tmp_path / "tpu.raw")
    base = ["-q", "-c", "2", "-t", "sgen", spec, "-o", "-t", "pcm", "-e", "double"]

    r = subprocess.run(
        [REF_BIN] + base + [ref_raw] + chain_words,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, f"C reference failed on '{s}': {r.stderr}"

    out, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
        rc = main(base + [tpu_raw] + chain_words)
    assert rc == 0, f"dsp_tpu failed on '{s}': {err.getvalue()}"

    a = np.fromfile(ref_raw, dtype=np.float64)
    b = np.fromfile(tpu_raw, dtype=np.float64)
    assert len(a) == len(b), f"frame count mismatch on '{s}': {len(a)} vs {len(b)}"
    e = np.abs(a - b).max() if len(a) else 0.0
    e_db = 20 * np.log10(e) if e > 0 else -np.inf
    assert e_db <= -120.0, f"fuzz diff {e_db:.1f} dBFS on '{s}'"
