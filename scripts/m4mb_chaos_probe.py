"""Controlled experiment: matrix4_mb event-engine sensitivity to input
quantization (the reason bench.py scores this family by control replay).

Three control-path runs on the bench program signal (first 32k frames,
phase-lin FIR applied host-side in f64 so the front end is identical):

  v64a  float64 control on the float64 input
  v64b  float64 control on the float32-ROUNDED input (cast back up):
        perfect arithmetic, identical state init — only the input moved,
        by <= 2^-24 relative
  v32   float32 (double-float) control on the float32 input

Measured on the TPU (2026-08-17, round 3):

  inputq (v64b-v64a): max |dvals| = 0.124   (band 12)
  arith  (v32 -v64b): max |dvals| = 0.163   (band 9)

The input-rounding-only divergence matches the full-f32 divergence in
scale: the per-band event engine (reference matrix4_mb.c:379-418 cross-band
threshold modulation feeding matrix4_common.c:499-710 event decisions) is
chaotic where a band's envelope sits at crosstalk level (~1e-7 on this
signal) — ANY perturbation at or above ~1e-8, including feeding the C
double build a float-quantized file, reorders events and latches divergent
ring-buffer state. Free-running f32-vs-f64 output difference on such
content therefore measures the algorithm's sensitivity, not implementation
precision; bench.py's matrix4_mb_dbfs replays the golden's f64 control
stream instead (audio-path precision, measured -121.3 dBFS) and reports
the free-run figure separately.

Usage: python scripts/m4mb_chaos_probe.py [cpu|axon]
"""

import os
import sys
import time

if len(sys.argv) > 1:
    os.environ["DSP_TPU_PLATFORM"] = sys.argv[1]
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.signal import oaconvolve

from scripts.gen_bench_goldens import program_signal

B = 32768


def control(dtype, x_in):
    import dsp_tpu.config as cfg

    cfg.set_sample_dtype(dtype)
    import jax
    import jax.numpy as jnp

    from dsp_tpu.chain import build_chain_from_string
    from dsp_tpu.core.types import StreamInfo

    chain = build_chain_from_string("matrix4_mb -6", StreamInfo(44100, 2))
    mb = chain.effects[1]
    dt = jnp.float32 if dtype == "float32" else jnp.float64
    h = np.asarray(mb.phase_lin_filter, np.float64)
    xf = np.stack([oaconvolve(x_in[:, c], h)[:B] for c in range(2)], axis=1)
    st = mb.state_for_block(B)
    if dtype == "float32":
        st = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float32)
            if np.asarray(a).dtype == np.float64 else a, st)
    st = jax.tree_util.tree_map(jnp.asarray, st)
    t0 = time.time()
    _, vals, _ = jax.jit(mb._control)(st, jnp.asarray(xf, dt))
    jax.block_until_ready(vals)
    print(f"# {dtype}: {time.time() - t0:.0f}s", file=sys.stderr, flush=True)
    return np.asarray(vals, np.float64)


def main():
    x64 = program_signal()[:B]
    xq = x64.astype(np.float32).astype(np.float64)
    v64a = control("float64", x64)
    v64b = control("float64", xq)
    v32 = control("float32", xq)

    for tag, d in [("inputq (v64b-v64a)", v64b - v64a),
                   ("arith (v32-v64b)", v32 - v64b),
                   ("total (v32-v64a)", v32 - v64a)]:
        e = np.abs(d)
        print(f"{tag}: max {e.max():.4e}")
        for s in range(0, B, 8192):
            seg = e[s : s + 8192]
            bworst = int(seg.max(axis=(0, 2)).argmax())
            print(f"   [{s:6d}] {seg.max():.3e} (band {bworst})")


if __name__ == "__main__":
    main()
