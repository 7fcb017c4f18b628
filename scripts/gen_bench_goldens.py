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


def fir_taps(n=16384):
    """Deterministic pseudo-random FIR (seeded; exponentially decaying)."""
    rng = np.random.default_rng(12345)
    h = rng.standard_normal(n) * np.exp(-np.arange(n) / (n / 4.0))
    h /= np.abs(h).sum() / 4.0
    return h


FAMILIES = {
    "biquad_sweep": "eq 1k 1.0 +3 highpass 30 0.7071 lowpass 16k 0.7071 lowshelf 90 0.7071s +4 highshelf 10k 0.7071s -2",
    "matrix4": "matrix4 -6",
    "matrix4_mb": "matrix4_mb -6",
    "resample": "resample 192k",
    "reverse_iir": "lowpass -r 1k 0.7071 highpass -r 120 0.7071",
    # fir chain is synthesized at run time (filter file path differs);
    # handled specially in render_family
}


def render_family(name, dtype, block=65536):
    import jax.numpy as jnp

    import dsp_tpu.config as cfg

    cfg.set_sample_dtype(dtype)
    from dsp_tpu.chain import CompiledChain, build_chain_from_string
    from dsp_tpu.core.types import StreamInfo

    if name == "fir":
        import tempfile

        from dsp_tpu.codecs.wav import WavWriter  # noqa: F401 - ensure module exists

        h = fir_taps()
        d = tempfile.mkdtemp(prefix="dsp_goldens_")
        path = os.path.join(d, "fir.raw")
        h.astype(np.float64).tofile(path)
        chain_str = f"fir -t pcm -e double -r {FS} {path}"
    else:
        chain_str = FAMILIES[name]
    x = program_signal()
    chain = build_chain_from_string(chain_str, StreamInfo(FS, 2))
    cc = CompiledChain(chain, block_frames=block)
    y = cc.process_array(x, drain=False, discard=False)
    return np.asarray(y, np.float64)


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_goldens")
    os.makedirs(out_dir, exist_ok=True)
    for name in list(FAMILIES) + ["fir"]:
        print(f"rendering {name} (f64)...", flush=True)
        y = render_family(name, "float64")
        hi = y.astype(np.float32)
        lo = (y - hi.astype(np.float64)).astype(np.float32)
        np.savez_compressed(os.path.join(out_dir, f"{name}.npz"), hi=hi, lo=lo)
        print(f"  {name}: {y.shape} -> {os.path.getsize(os.path.join(out_dir, name + '.npz'))//1024} KiB", flush=True)


if __name__ == "__main__":
    main()
