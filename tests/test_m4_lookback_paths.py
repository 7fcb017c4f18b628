"""The event engine's lookback-averaging replay has two implementations:
a trace-time unroll (buf_len <= UNROLL_MAX_L, the 44.1/48 kHz regime) and a
lax.fori_loop fallback for high control rates (~L=90 at 192 kHz,
m4_engine.py::event_step). Both must compute the identical op sequence;
ADVICE r4 flagged the fori_loop path as untested. These tests drive the raw
engine over program material with real event triggers and assert the two
paths agree bitwise (f64) on every output and every state leaf.

Reference for the replayed walk: /root/reference/matrix4_common.c:579-609.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsp_tpu.ops import m4_engine as m4


def _drive(fs_ds, n, unroll_max_l, seed=7):
    """Scan event_step over a bursty synthetic envelope stream (f64)."""
    old = m4.UNROLL_MAX_L
    m4.UNROLL_MAX_L = unroll_max_l
    try:
        p = m4.make_event_params(fs_ds)
        st = jax.tree_util.tree_map(jnp.asarray, m4.make_event_state(p))
        rng = np.random.default_rng(seed)
        # bursty two-channel envelopes so triggers/fuse/sampling all fire:
        # alternating loud/quiet segments with per-sample jitter
        seg = np.repeat(rng.uniform(0.01, 1.0, (n // 16 + 1, 2)), 16, axis=0)[:n]
        lr = seg * rng.uniform(0.5, 1.5, (n, 2))
        l, r = lr[:, 0], lr[:, 1]
        env = np.stack([l, r, np.abs(l + r), np.abs(l - r) + 1e-9], 1)
        pwr = np.stack([l * l, r * r, (l + r) ** 2, (l - r) ** 2 + 1e-12], 1)

        def step(carry, inp):
            e, q = inp
            envd = {"l": e[0], "r": e[1], "sum": e[2], "diff": e[3]}
            pwrd = {"l": q[0], "r": q[1], "sum": q[2], "diff": q[3]}
            carry, out = m4.event_step(p, carry, envd, pwrd, 1.0)
            return carry, (out["ax_lr"], out["ax_cs"], out["pwrcmp_factor"])

        fst, outs = jax.jit(lambda s, e, q: jax.lax.scan(step, s, (e, q)))(
            st, jnp.asarray(env), jnp.asarray(pwr)
        )
        return (
            jax.tree_util.tree_map(np.asarray, fst),
            tuple(np.asarray(o) for o in outs),
        )
    finally:
        m4.UNROLL_MAX_L = old


@pytest.mark.parametrize(
    "fs_ds",
    [
        44100 // 32,  # L ~ 21: default path is the unroll
        192000 // 32,  # L ~ 90: default path is the fori_loop
    ],
)
def test_unrolled_vs_fori_loop_bitwise(fs_ds):
    L = m4.time_to_frames(m4.EVENT_SAMPLE_TIME * 0.5, fs_ds)
    n = 6 * m4.time_to_frames(m4.EVENT_SAMPLE_TIME, fs_ds)  # several event cycles
    st_unroll, out_unroll = _drive(fs_ds, n, unroll_max_l=L + 1)
    st_loop, out_loop = _drive(fs_ds, n, unroll_max_l=0)
    for a, b in zip(out_unroll, out_loop):
        np.testing.assert_array_equal(a, b)
    fa, _ = jax.tree_util.tree_flatten(st_unroll)
    fb, _ = jax.tree_util.tree_flatten(st_loop)
    for a, b in zip(fa, fb):
        np.testing.assert_array_equal(a, b)


def test_drive_produces_events():
    """Guard: the synthetic stream actually exercises the trigger machinery
    (otherwise the bitwise comparison above proves nothing about the replay)."""
    fs_ds = 44100 // 32
    n = 6 * m4.time_to_frames(m4.EVENT_SAMPLE_TIME, fs_ds)
    st, _ = _drive(fs_ds, n, unroll_max_l=64)
    assert int(st["ord_count"]) + int(st["diff_count"]) + int(
        st["early_count"]
    ) + int(st["ignore_count"]) > 0
