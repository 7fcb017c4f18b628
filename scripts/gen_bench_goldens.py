"""Generate the checked-in float64 goldens for bench.py's accuracy suite.

Run on CPU (float64). Each golden is a CPU/f64 render of a deterministic
program-material signal through one effect family; bench.py re-renders the
same signal in float32 on the bench backend (the real TPU) and records the
worst-sample difference as `<family>_dbfs` in the suite JSON, so per-round
TPU accuracy regressions are driver-visible (VERDICT r2 #2; test strategy
SURVEY.md §4).

Goldens are stored as float32 pairs (hi, lo) so the on-disk file keeps
~double precision at half the size; inputs are regenerated from the same
formulas at bench time (nothing random).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("DSP_TPU_PLATFORM", "cpu")

import numpy as np

FS = 44100
DUR = 4.0


def program_signal(n_channels=2, dur=DUR, fs=FS):
    """Deterministic full-band program material: crossing sweeps + tones."""
    n = int(dur * fs)
    t = np.arange(n) / fs
    g = 10 ** (-14 / 20)
    v = np.log(16000 / 35)
    x = np.zeros((n, n_channels))
    x[:, 0] = g * (np.sin(35 / v * dur * (np.exp(v * t / dur) - 1)) + np.sin(2 * np.pi * 997 * t))
    if n_channels > 1:
        x[:, 1] = g * (
            np.sin(2 * np.pi * 1497 * t)
            + np.sin(16000 / np.log(35 / 16000) * dur * (np.exp(np.log(35 / 16000) * t / dur) - 1))
        )
    return x


def fir_taps(n=65536, channels=1, seed=0xBE):
    """Deterministic pseudo-random FIR — the SAME filter bench.py's fir_64k
    perf case synthesizes (write_filter_wav, seed 0xBE), so the accuracy
    render can reuse the perf case's compiled executable."""
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((n, channels))
    h *= 0.5 / np.abs(h).sum(axis=0).max()
    return h


# One chain string per accuracy family. These MATCH bench.py's perf cases
# exactly (chain string AND block size) so the float32 accuracy render on the
# bench backend reuses the perf case's compiled cc._multi executable — zero
# extra compiles (round 4 lost half the accuracy record to compile time).
NORTHSTAR_CHAIN = (
    "gain -3 eq 1k 1.0 +3 eq 3.5k 0.8 -2 lowshelf 90 0.7071s +4 "
    "highshelf 10k 0.7071s -2 lowpass 18k 0.7071 highpass 30 0.7071 "
    "crossfeed 700 4.5 st2ms ms2st"
)

FAMILIES = {
    "northstar": NORTHSTAR_CHAIN,
    "biquad_sweep": "eq 1k 1.0 +3 highpass 30 0.7071 lowpass 16k 0.7071 lowshelf 90 0.7071s +4 highshelf 10k 0.7071s -2",
    "matrix4": "matrix4 -6",
    "matrix4_mb": "matrix4_mb -6",
    "resample": "resample 192k",
    "reverse_iir": "lowpass -r 1k 0.7071 highpass -r 120 0.7071",
    # fir chain is synthesized at run time (filter file path differs);
    # handled specially in render_family
}

BENCH_BLOCK = 65536


def render_blocks(cc, states0, x, n_blocks):
    """Render x through an already-compiled CompiledChain executable.

    Zero-pads x to `n_blocks` full blocks, runs ONE cc._multi dispatch from
    the given initial states, and returns the float64 output truncated to
    the valid length. Both golden generation (f64, CPU) and bench.py's
    accuracy section (f32, bench backend) use this helper, so the two sides
    share one measurement basis; the trailing zero blocks are causal no-ops
    for the samples compared. When shapes match a prior cc._multi call
    (bench.py pads to the perf case's n_blocks), no new compile happens."""
    import jax.numpy as jnp

    B = cc.block_frames
    n_in = len(x)
    if n_blocks * B < n_in:
        raise ValueError("n_blocks too small for signal")
    xp = np.zeros((n_blocks * B, x.shape[1]))
    xp[:n_in] = x
    _, ys = cc._multi(states0, jnp.asarray(xp.reshape(n_blocks, B, x.shape[1]), cc.dtype))
    ys = np.asarray(ys, np.float64)
    y = ys.reshape(-1, ys.shape[-1])
    return y[: int(n_in * float(cc.chain.ratio))]


D_TICK = 32  # m4_engine.DOWNSAMPLE_FACTOR (control rate fs/32)


def fit_ics(vals):
    """Recover the per-tick parabolic-interpolator coefficient sets from a
    per-sample matrix-value stream.

    matrix4_mb._control evaluates vals[i] = (c2*t + c1)*t + c0 with
    t = ((i+1) % D)/D and coefficient set (i+1)//D, so set k >= 1 is an exact
    quadratic through samples i = k*D-1, k*D, k*D+1 (t = 0, 1/D, 2/D). Set 0
    is the effect's initial interp_c state (not fitted). Returns
    [N//D, 3, ...] float64."""
    n_t = len(vals) // D_TICK
    u = 1.0 / D_TICK
    s0 = vals[D_TICK - 1 :: D_TICK][:n_t]
    s1 = vals[D_TICK :: D_TICK][: len(s0)]
    s2 = vals[D_TICK + 1 :: D_TICK][: len(s0)]
    if len(s1) < len(s0):  # final tick has only its t=0 sample
        pad = np.zeros((len(s0) - len(s1),) + s0.shape[1:])
        s1 = np.concatenate([s1, pad])
        s2 = np.concatenate([s2, pad])
    c2 = (s2 - 2.0 * s1 + s0) / (2.0 * u * u)
    c1 = (s1 - s0) / u - c2 * u
    return np.stack([s0, c1, c2], axis=1)


def replay_vals(ics0, ics, n, dtype=np.float64):
    """Rebuild the per-sample vals stream from stored tick coefficients.

    ics0: the effect's initial interp_c [3, ...] (set 0); ics: fitted sets
    [Nt, 3, ...]. Mirrors the interpolation in matrix4_mb._control exactly."""
    all_ics = np.concatenate([np.asarray(ics0, np.float64)[None],
                              np.asarray(ics, np.float64)], axis=0)
    i = np.arange(n)
    set_idx = (i + 1) // D_TICK
    t = ((i + 1) % D_TICK).astype(np.float64) / D_TICK
    coefs = all_ics[set_idx]  # [n, 3, ...]
    t = t.reshape((n,) + (1,) * (coefs.ndim - 2))
    return ((coefs[:, 2] * t + coefs[:, 1]) * t + coefs[:, 0]).astype(dtype)


def render_matrix4_mb_f64_with_ctl(block=65536):
    """f64 CPU render of the matrix4_mb family chain that ALSO captures the
    control stream (per-sample matrix vals -> fitted tick coefficients).

    The free-running f32-vs-f64 comparison is NOT a meaningful precision
    metric for this effect: the event engine is chaotic at the quiet bands'
    leakage level — a controlled experiment (f64 arithmetic, identical
    state, input merely rounded to f32) produced max |Δvals| = 0.124, the
    same scale as the full-f32 divergence, on the bench program signal
    (scripts/m4mb_chaos_probe.py). bench.py therefore replays THIS control
    stream through the f32 audio path and reports that as matrix4_mb_dbfs
    (implementation precision), alongside an informative free-run figure."""
    import jax

    import dsp_tpu.config as cfg

    cfg.set_sample_dtype("float64")
    import jax.numpy as jnp

    from dsp_tpu.chain import build_chain_from_string
    from dsp_tpu.core.types import StreamInfo

    x = program_signal()
    chain = build_chain_from_string(FAMILIES["matrix4_mb"], StreamInfo(FS, 2))
    fir, mb = chain.effects[0], chain.effects[1]
    n_in = len(x)
    n_blocks = -(-n_in // block)
    xp = np.zeros((n_blocks * block, 2))
    xp[:n_in] = x

    fst = jax.tree_util.tree_map(jnp.asarray, fir.state_for_block(block))
    mst = jax.tree_util.tree_map(jnp.asarray, mb.state_for_block(block))
    fir_j = jax.jit(fir.step)
    ctl_j = jax.jit(mb._control)
    audio_j = jax.jit(mb._audio)
    ys, vs = [], []
    for i in range(n_blocks):
        xb = jnp.asarray(xp[i * block : (i + 1) * block])
        fst, xf = fir_j(fst, xb)
        ctl, vals, _ = ctl_j(mst, xf)
        mst, y = audio_j(mst, xf, vals, ctl)
        ys.append(np.asarray(y, np.float64))
        vs.append(np.asarray(vals, np.float64))
    y = np.concatenate(ys)[:n_in]
    vals = np.concatenate(vs)[:n_in]
    return y, fit_ics(vals)


def family_chain_str(name):
    """Chain string for a family; 'fir' synthesizes its filter file."""
    if name == "fir":
        import tempfile

        h = fir_taps()
        d = tempfile.mkdtemp(prefix="dsp_goldens_")
        path = os.path.join(d, "fir.raw")
        h.astype(np.float64).tofile(path)
        return f"fir -t pcm -e double -r {FS} {path}"
    return FAMILIES[name]


def render_family(name, dtype, block=BENCH_BLOCK):
    import dsp_tpu.config as cfg

    cfg.set_sample_dtype(dtype)
    from dsp_tpu.chain import CompiledChain, build_chain_from_string
    from dsp_tpu.core.types import StreamInfo

    chain_str = family_chain_str(name)
    x = program_signal()
    chain = build_chain_from_string(chain_str, StreamInfo(FS, 2))
    cc = CompiledChain(chain, block_frames=block)
    n_blocks = -(-len(x) // cc.block_frames)
    return render_blocks(cc, cc.states, x, n_blocks)


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_goldens")
    os.makedirs(out_dir, exist_ok=True)
    only = sys.argv[1:] or None
    for name in list(FAMILIES) + ["fir"]:
        if only and name not in only:
            continue
        print(f"rendering {name} (f64)...", flush=True)
        extra = {}
        if name == "matrix4_mb":
            y, ics = render_matrix4_mb_f64_with_ctl()
            extra["ics"] = ics.astype(np.float32)
        else:
            y = render_family(name, "float64")
        hi = y.astype(np.float32)
        lo = (y - hi.astype(np.float64)).astype(np.float32)
        np.savez_compressed(os.path.join(out_dir, f"{name}.npz"), hi=hi, lo=lo, **extra)
        print(f"  {name}: {y.shape} -> {os.path.getsize(os.path.join(out_dir, name + '.npz'))//1024} KiB", flush=True)


if __name__ == "__main__":
    main()
