"""Per-component device-time attribution for matrix4_mb (VERDICT r2 #7).

Times, on the bench backend at 64k-frame blocks:
  step      - the full effect step (control + audio)
  control   - _control alone (bank + env EWMA + fs/32 event scan + interp)
  audio     - _audio alone with control outputs held constant
  bank      - the fused filter-bank kernel alone
  env_ewma  - the audio-rate envelope prefix scan alone
  ctl_scan  - the fs/32 sequential event-engine scan alone

Prints one JSON line of {name: {ms_per_block, x_realtime}} so the numbers can
be pasted into ARCHITECTURE.md. Run with default platform (axon/TPU) for the
real attribution; DSP_TPU_PLATFORM=cpu for a smoke run.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FS = 44100
BLOCK = 65536
REPS = 5


def timeit(fn, *args):
    y = fn(*args)
    jax_block(y)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        y = fn(*args)
        jax_block(y)
        best = min(best, time.perf_counter() - t0)
    return best


def jax_block(y):
    import jax

    for leaf in jax.tree_util.tree_leaves(y):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main():
    import jax
    import jax.numpy as jnp

    import dsp_tpu.config as cfg
    cfg.set_sample_dtype("float32")
    from dsp_tpu.chain import build_chain_from_string
    from dsp_tpu.core.types import StreamInfo
    from dsp_tpu.ops import iir
    from dsp_tpu.ops import m4_engine as m4

    chain = build_chain_from_string("matrix4_mb -6", StreamInfo(FS, 2))
    mb = next(e for e in chain.effects if type(e).__name__ == "Matrix4MbEffect")

    # state_for_block returns host f64 for the hi components; the real chain
    # path casts state to the compute dtype before stepping (CompiledChain),
    # and the DF event engine requires hi in f32 (f64 hi makes every derived
    # lo term f64 and the control scan carry dtypes mismatch)
    def to_f32(a):
        a = np.asarray(a)
        if np.issubdtype(a.dtype, np.floating) and a.dtype != np.float32:
            a = a.astype(np.float32)
        return jnp.asarray(a)

    state = jax.tree_util.tree_map(to_f32, mb.state_for_block(BLOCK))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (BLOCK, 2)), dtype=jnp.float32)

    out = {}

    def record(name, secs):
        out[name] = {
            "ms_per_block": round(secs * 1e3, 2),
            "x_realtime": round(BLOCK / secs / FS, 1),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)

    step = jax.jit(lambda s, xx: mb.step(s, xx))
    record("step", timeit(step, state, x))

    control = jax.jit(lambda s, xx: mb._control(s, xx))
    record("control", timeit(control, state, x))

    ctl, vals, _ = control(state, x)
    jax_block((ctl, vals))
    audio = jax.jit(lambda s, xx, v, c: mb._audio(s, xx, v, c))
    record("audio", timeit(audio, state, x, vals, ctl))

    if "fused" in state["bank"]:
        bank = jax.jit(lambda st, xx: mb._run_bank_fused(st, xx))
        record("bank", timeit(bank, state["bank"]["fused"], x))

    env_in = jnp.abs(jnp.asarray(
        rng.uniform(-0.5, 0.5, (BLOCK, 13, 8)), dtype=jnp.float32))
    env = jax.jit(
        lambda m0, lo, e: m4.env_ewma_scan(m0, lo, mb.g_env, e, True)
    )
    record("env_ewma", timeit(env, state["env_m"].astype(jnp.float32),
                              state["env_m_lo"], env_in))

    # fs/32 event scan alone: drive _control but stub the upstream (bank
    # output pinned) — approximated by timing control minus (bank + env).
    if "bank" in out and "env_ewma" in out:
        resid = (out["control"]["ms_per_block"]
                 - out["bank"]["ms_per_block"] - out["env_ewma"]["ms_per_block"])
        out["ctl_scan_resid"] = {"ms_per_block": round(resid, 2)}
        print(f"# ctl_scan_resid: {out['ctl_scan_resid']}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
