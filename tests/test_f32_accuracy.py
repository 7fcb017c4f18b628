"""float32 accuracy of the biquad kernels on pathological near-DC poles.

The TPU runs the chain in float32 (config.py dtype policy); these tests pin
the worst-case single-filter error against the float64 reference path at the
BASELINE budget of <= -120 dBFS (biquad.c:296-315 runs all-double in the C
build, so f32 kernel noise is the entire error there). Exercises both the
blocked MXU kernel (block % 128 == 0) and the double-float scan fallback.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dsp_tpu.effects import biquad as bq
from dsp_tpu.ops import iir

FS = 44100

CASES = [
    ("highpass30", bq.HIGHPASS, 30.0, 0.7071, 0.0),  # pole radius ~0.9973
    ("eq1k+6", bq.PEAK, 1000.0, 1.0, 6.0),
    ("lowshelf90", bq.LOWSHELF, 90.0, 0.9, 3.0),
]


def _coeffs(typ, a0, a1, gain):
    raw = bq.design(typ, FS, a0, a1, gain, 0.0, bq.WIDTH_Q)
    return np.array(bq.normalize(*raw), dtype=np.float64)


def _ref_f64(c, x):
    A, Bv = iir._coupled_form_ss(np.stack([c, c], axis=1))
    st = jnp.zeros((2, 2), jnp.float64)
    _, y = iir.biquad_scan(
        jnp.asarray(A), jnp.asarray(Bv), jnp.asarray(np.full(2, c[0])), st, jnp.asarray(x)
    )
    return np.asarray(y)


@pytest.mark.parametrize("name,typ,a0,a1,gain", CASES)
def test_blocked_kernel_f32(name, typ, a0, a1, gain):
    c = _coeffs(typ, a0, a1, gain)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((65536, 2)) * 0.3
    ref = _ref_f64(c, x)
    plan = iir.BiquadBlockedPlan(np.stack([c, c], axis=1))
    st = jnp.zeros((2, 2, 2), jnp.float32)
    _, y = iir.biquad_blocked(plan, st, jnp.asarray(x, jnp.float32))
    err = np.abs(np.asarray(y, np.float64) - ref).max()
    assert err < 1e-6, f"{name}: {err:.3e} (>-120 dBFS)"


@pytest.mark.parametrize("name,typ,a0,a1,gain", CASES)
def test_scan_df_fallback_f32(name, typ, a0, a1, gain):
    c = _coeffs(typ, a0, a1, gain)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8192, 2)) * 0.3
    ref = _ref_f64(c, x)
    cmat = np.stack([c, c], axis=1)
    A, Bv = iir._coupled_form_ss(cmat)
    st = jnp.zeros((2, 2, 2), jnp.float32)
    _, y = iir.biquad_scan_df(A, Bv, np.full(2, c[0]), st, jnp.asarray(x, jnp.float32))
    err = np.abs(np.asarray(y, np.float64) - ref).max()
    assert err < 1e-6, f"{name}: {err:.3e} (>-120 dBFS)"


def test_blocked_and_fallback_states_interchangeable():
    """Half the signal through the blocked kernel, half through the df scan:
    the [2, C, 2] (hi, lo) state must hand over seamlessly."""
    c = _coeffs(bq.HIGHPASS, 30.0, 0.7071, 0.0)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16384, 2)) * 0.3
    ref = _ref_f64(c, x)
    cmat = np.stack([c, c], axis=1)
    plan = iir.BiquadBlockedPlan(cmat)
    A, Bv = iir._coupled_form_ss(cmat)
    st = jnp.zeros((2, 2, 2), jnp.float32)
    st1, y1 = iir.biquad_blocked(plan, st, jnp.asarray(x[:8192], jnp.float32))
    _, y2 = iir.biquad_scan_df(A, Bv, np.full(2, c[0]), st1, jnp.asarray(x[8192:], jnp.float32))
    y = np.concatenate([np.asarray(y1, np.float64), np.asarray(y2, np.float64)])
    err = np.abs(y - ref).max()
    assert err < 1e-6, f"handover: {err:.3e}"


def test_fused_cascade_matches_unfused():
    """CompiledChain fuses adjacent biquads (iir.CascadeBlockedPlan); the
    fused kernel must match per-effect execution exactly in f64 and to
    <= -120 dBFS in f32."""
    import jax
    import jax.numpy as jnp

    from dsp_tpu.chain.chain import CompiledChain, build_chain_from_args
    from dsp_tpu.core.types import StreamInfo
    from dsp_tpu.effects.biquad import FusedBiquadCascade

    args = ["eq", "1k", "1.0", "+3", "lowshelf", "90", "0.7071s", "+4",
            "highpass", "30", "0.7071", "lowpass", "18k", "0.7071"]
    chain = build_chain_from_args(args, StreamInfo(FS, 2))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((65536, 2)) * 0.2

    cc = CompiledChain(chain, block_frames=2048, dtype=jnp.float64)
    assert any(isinstance(e, FusedBiquadCascade) for e in cc._runtime_effects)
    y_fused = np.asarray(cc.process_array(x, drain=False, discard=False))

    # unfused golden: run each effect's step sequentially
    effs = [e for e in chain.effects if not getattr(e, "runtime_noop", False)]
    states = [jnp.asarray(e.state0()) for e in effs]
    ys = []
    for i in range(0, len(x), 2048):
        xx = jnp.asarray(x[i : i + 2048])
        new = []
        for e, st in zip(effs, states):
            st, xx = e.step(st, xx)
            new.append(st)
        states = new
        ys.append(np.asarray(xx))
    y_ref = np.concatenate(ys)
    assert np.abs(y_fused - y_ref).max() < 1e-12

    cc32 = CompiledChain(chain, block_frames=2048, dtype=jnp.float32)
    y32 = np.asarray(cc32.process_array(x, drain=False, discard=False), np.float64)
    err = np.abs(y32 - y_ref).max()
    assert err < 1e-6, f"fused f32: {err:.3e}"
