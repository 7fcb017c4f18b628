#!/usr/bin/env python
"""Benchmark: realtime multiple on the BASELINE north-star chain.

Runs a 10-effect stereo 44.1 kHz chain (biquad EQ family + crossfeed +
mid/side + fractional delay) through the jitted pipeline on the default JAX
device and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the realtime multiple divided by the BASELINE.json north-star
target (1000x realtime per chip).
"""

import json
import os
import sys
import time

# ten effects: mixed IIR scans, channel mixing, fractional delay
CHAIN = (
    "gain -3 "
    "eq 1k 1.0 +3 "
    "eq 3.5k 0.8 -2 "
    "lowshelf 90 0.7071s +4 "
    "highshelf 10k 0.7071s -2 "
    "lowpass 18k 0.7071 "
    "highpass 30 0.7071 "
    "crossfeed 700 4.5 "
    "st2ms "
    "ms2st"
)

FS = 44100
CHANNELS = 2
BLOCK = 65536  # large blocks amortize scan-step overhead (16k blocks: ~250x;
N_BLOCKS = 16  # 64k blocks: ~6000x on v5e)
REPS = 5
NORTH_STAR = 1000.0


def main():
    import numpy as np

    import jax

    from dsp_tpu.chain import CompiledChain, build_chain_from_string
    from dsp_tpu.core.types import StreamInfo

    import jax.numpy as jnp

    backend = jax.default_backend()
    chain = build_chain_from_string(CHAIN, StreamInfo(FS, CHANNELS))
    cc = CompiledChain(chain, block_frames=BLOCK)
    rng = np.random.default_rng(0)
    # device-resident f32 input: measures per-chip compute throughput (the
    # north-star metric); host decode/upload overlaps compute in the real
    # pipeline and on this tunneled dev box would only measure the tunnel
    xs = jnp.asarray(
        rng.uniform(-0.5, 0.5, (N_BLOCKS, cc.block_frames, CHANNELS)), dtype=cc.dtype
    )
    xs.block_until_ready()

    # warmup/compile
    states0 = cc.states
    ys = cc.run_blocks(xs)
    ys.block_until_ready()

    frames = N_BLOCKS * cc.block_frames
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        states, ys = cc._multi(states0, xs)
        ys.block_until_ready()
        dt = time.perf_counter() - t0
        best = min(best, dt)

    samples_per_sec = frames / best
    realtime_multiple = samples_per_sec / FS
    print(
        json.dumps(
            {
                "metric": f"realtime-multiple ({backend}, 10-effect stereo 44.1k chain, dtype={np.dtype(cc.dtype).name})",
                "value": round(realtime_multiple, 1),
                "unit": "x realtime",
                "vs_baseline": round(realtime_multiple / NORTH_STAR, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
