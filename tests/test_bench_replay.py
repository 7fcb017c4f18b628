"""bench.py's matrix4_mb control-replay protocol: the golden stores fitted
per-tick parabolic coefficients (scripts/gen_bench_goldens.fit_ics) and the
bench rebuilds the per-sample matrix values (replay_vals). These tests pin
the fit/replay pair against the interpolation law in matrix4_mb._control
(vals[i] = (c2 t + c1) t + c0, t = ((i+1) % D)/D, set (i+1)//D)."""

import numpy as np

from scripts.gen_bench_goldens import D_TICK, fit_ics, replay_vals


def _synth(n_ticks, shape, seed):
    rng = np.random.default_rng(seed)
    ics0 = rng.standard_normal((3,) + shape)
    ics = rng.standard_normal((n_ticks, 3) + shape)
    return ics0, ics


def test_fit_recovers_ics_exactly():
    ics0, ics = _synth(16, (2, 3), seed=0)
    n = 16 * D_TICK
    vals = replay_vals(ics0, ics, n)
    rec = fit_ics(vals)
    assert rec.shape == ics.shape
    # the quadratic fit through t = 0, 1/D, 2/D is exact up to f64 roundoff;
    # the final set appears only at its t=0 sample, so just c0 is recovered
    assert np.abs(rec[:-1] - ics[:-1]).max() < 1e-9
    assert np.abs(rec[-1, 0] - ics[-1, 0]).max() < 1e-12


def test_replay_matches_effect_interpolation():
    """replay_vals must agree with matrix4_mb._control's own interpolation
    of the same tick stream (device graph vs host reconstruction)."""
    import dsp_tpu.config  # noqa: F401 - enables x64 for the f64 twin
    import jax
    import jax.numpy as jnp

    ics0, ics = _synth(8, (4,), seed=1)
    n = 8 * D_TICK
    host = replay_vals(ics0, ics, n)

    # device twin of the tail of matrix4_mb._control
    all_ics = jnp.asarray(np.concatenate([ics0[None], ics]), dtype=jnp.float64)
    i_ar = jnp.arange(n)
    set_idx = (i_ar + 1) // D_TICK
    t = ((i_ar + 1) % D_TICK).astype(jnp.float64) / D_TICK
    coefs = all_ics[set_idx]
    dev = (coefs[:, 2] * t[:, None] + coefs[:, 1]) * t[:, None] + coefs[:, 0]
    assert np.abs(host - np.asarray(dev)).max() < 1e-12


def test_fit_handles_trailing_partial_tick():
    """The final set can appear with only its t=0 sample (stream length a
    multiple of D): fit_ics must not crash and must still return N//D rows."""
    ics0, ics = _synth(5, (1,), seed=2)
    n = 5 * D_TICK
    vals = replay_vals(ics0, ics, n)
    rec = fit_ics(vals)
    assert len(rec) == 5
    assert np.abs(rec[:4] - ics[:4]).max() < 1e-9
