"""State pytree hygiene: no complex leaves across the jit boundary.

Complex device<->host transfers are unimplemented over the tunneled TPU
runtime, so every effect must store spectra/complex state as (re, im) float
pairs (see ops/fft_conv.py UpolsConv). Also checks that a float32 chain step
round-trips its own state structure (dtype-stable carries — strict np.float64
scalars leaking into a scan carry break `lax.scan` under f32).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsp_tpu.chain.chain import CompiledChain, build_chain_from_args
from dsp_tpu.core.types import StreamInfo

CHAINS = [
    ["gain", "-3", "eq", "1k", "1.0", "+3"],
    ["lowpass", "-r", "120", "0.7071"],
    ["fir_p", "coefs:0.1,0.2,0.3"],
    ["hilbert", "-p", "255"],
    ["decorrelate", "-s", "7", "3"],
    ["delay", "-m", "0.5m", "-b", "2", "10m"],
    ["resample", "48k"],
    ["crossfeed", "700", "4.5"],
    ["matrix4", "-6"],
]


@pytest.mark.parametrize("args", CHAINS, ids=lambda a: a[0])
def test_no_complex_state_and_f32_stable(args):
    chain = build_chain_from_args(list(args), StreamInfo(44100, 2))
    cc = CompiledChain(chain, block_frames=2048, dtype=jnp.float32)
    for leaf in jax.tree_util.tree_leaves(cc.states):
        assert not np.issubdtype(np.asarray(leaf).dtype, np.complexfloating), (
            f"complex state leaf in {args[0]}"
        )
    x = jnp.zeros((cc.block_frames, 2), jnp.float32)
    # one jitted step: raises if any carry is dtype-unstable under f32
    st, y = cc._step(cc.states, x)
    assert y.dtype == jnp.float32
    for a, b in zip(jax.tree_util.tree_leaves(cc.states), jax.tree_util.tree_leaves(st)):
        assert np.asarray(a).shape == np.asarray(b).shape


def test_process_batch_matches_per_stream_and_shards():
    """process_batch == per-stream process_array, and shards over a Mesh."""
    from jax.sharding import Mesh

    from dsp_tpu.chain.chain import CompiledChain, build_chain_from_args

    chain = build_chain_from_args(
        ["gain", "-3", "eq", "1k", "1.0", "+3", "crossfeed", "700", "4.5"],
        StreamInfo(44100, 2),
    )
    cc = CompiledChain(chain, block_frames=2048, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((4, 5000, 2)) * 0.3
    batch = cc.process_batch(xs)
    for s in range(4):
        cc.reset()
        ref = cc.process_array(xs[s])
        assert np.abs(batch[s] - ref).max() < 1e-12, s
    # sharded over the 8-device CPU mesh
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("dp",))
    xs8 = rng.standard_normal((8, 5000, 2)) * 0.3
    cc.reset()
    sharded = cc.process_batch(xs8, mesh=mesh)
    cc.reset()
    ref0 = cc.process_array(xs8[0])
    assert np.abs(sharded[0] - ref0).max() < 1e-12


# VERDICT r1 #5: shard the state pytrees most likely to break under
# NamedSharding — fir (complex FDL stored as (re, im) float pairs), resample
# (rate change + drain), matrix4 (deep nested control state) — and assert
# sharded == serial exactly.
_COMPLEX_STATE_CHAINS = [
    ("fir_fdl", ["fir", "coefs:" + ",".join(f"{v:.6f}" for v in
                 np.sin(np.arange(300) * 0.7) * 0.05)]),
    ("resample_2x", ["resample", "88.2k"]),
    ("matrix4_deep", ["matrix4", "-6"]),
]


@pytest.mark.parametrize(
    "name,args", _COMPLEX_STATE_CHAINS, ids=[c[0] for c in _COMPLEX_STATE_CHAINS]
)
def test_process_batch_sharded_complex_state(name, args):
    from jax.sharding import Mesh

    chain = build_chain_from_args(list(args), StreamInfo(44100, 2))
    cc = CompiledChain(chain, block_frames=2048, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    xs = rng.standard_normal((8, 6000, 2)) * 0.3
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("dp",))
    sharded = cc.process_batch(xs, mesh=mesh)
    for s in (0, 3, 7):
        cc.reset()
        ref = cc.process_array(xs[s])
        assert sharded[s].shape == ref.shape, (name, s)
        assert np.abs(sharded[s] - ref).max() < 1e-12, (name, s)
