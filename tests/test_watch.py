"""watch effect: sub-chain-scoped hot reload (watch.c:132-155).

VERDICT r1 #7: the reload must swap and crossfade ONLY the watch effect's
sub-chain; every other effect in the chain keeps its live filter state.
The reference does this by swapping the nested chain under the effect's
mutex with a 100 ms linear crossfade; here WatchEffect runs both sub-chains
inside its jitted step during the fade and CompiledChain.retrace re-jits the
pipeline carrying all other state across.
"""

import os

import numpy as np
import pytest

from dsp_tpu.chain import CompiledChain, build_chain_from_string
from dsp_tpu.core.types import StreamInfo

FS = 44100
B = 2048


def _build_watch_chain(tmp_path, body, chain_prefix="lowpass 500 0.7071 "):
    f = tmp_path / "sub.txt"
    f.write_text(body + "\n")
    stream = StreamInfo(FS, 2)
    chain = build_chain_from_string(f"{chain_prefix}watch {f}", stream)
    cc = CompiledChain(chain, block_frames=B)
    (we,) = [e for e in chain.effects if type(e).__name__ == "WatchEffect"]
    return f, chain, cc, we


def _run_blocks(cc, x, finish_fades=False):
    out = []
    for i in range(0, len(x), B):
        out.append(np.asarray(cc.run_block(x[i : i + B]), dtype=np.float64))
        if finish_fades:
            cc.finish_watch_fades()
    return np.concatenate(out, axis=0)


@pytest.fixture(scope="module")
def noise():
    rng = np.random.default_rng(1234)
    return rng.standard_normal((B * 12, 2))


def test_subchain_swap_preserves_outer_state(tmp_path, noise):
    """Reload gain -3 -> gain -6 inside watch, with a lowpass OUTSIDE the
    watch. After the fade, output must match a straight `lowpass gain -6`
    chain run from t=0 EXACTLY — possible only if the lowpass's recurrence
    state survived the swap (a reset would re-transient)."""
    x = noise
    f, chain, cc, we = _build_watch_chain(tmp_path, "gain -3")

    n_pre = 4  # blocks before the reload
    y_pre = _run_blocks(cc, x[: n_pre * B])

    f.write_text("gain -6\n")
    assert cc.watch_swap(we)
    assert we.sub_old is not None
    y_post = _run_blocks(cc, x[n_pre * B :], finish_fades=True)
    assert we.sub_old is None, "fade never completed"

    # controls: the same outer filter with static gains
    g1, g2 = 10 ** (-3 / 20), 10 ** (-6 / 20)
    ctl = build_chain_from_string("lowpass 500 0.7071", StreamInfo(FS, 2))
    lp = _run_blocks(CompiledChain(ctl, block_frames=B), x)

    np.testing.assert_allclose(y_pre, lp[: n_pre * B] * g1, rtol=0, atol=1e-14)

    # during the 100 ms fade: y = lp(x) * (g2*m + g1*(1-m)), m = (n-pos)/n
    n = we.fade_frames
    assert n == 4410
    pos = np.maximum(n - np.arange(len(y_post)), 0)
    m = np.where(pos > 0, (n - pos) / n, 1.0)[:, None]
    expect = lp[n_pre * B :] * (g2 * m + g1 * (1.0 - m))
    np.testing.assert_allclose(y_post, expect, rtol=0, atol=1e-14)

    # well after the fade: EXACT match with the never-reloaded control —
    # proves zero outer-state perturbation
    tail = slice(3 * B, None)
    np.testing.assert_array_equal(y_post[tail], (lp[n_pre * B :] * g2)[tail])


def test_subchain_state_fresh_and_old_kept(tmp_path, noise):
    """The OLD sub-chain keeps its live state through the fade; the NEW one
    starts fresh (watch.c builds the new chain from scratch)."""
    x = noise[: 8 * B]
    f, chain, cc, we = _build_watch_chain(tmp_path, "lowpass 1k 0.7071", chain_prefix="")
    y_pre = _run_blocks(cc, x[: 4 * B])

    f.write_text("highpass 1k 0.7071\n")
    assert cc.watch_swap(we)
    y_post = _run_blocks(cc, x[4 * B :], finish_fades=True)

    # old path: lowpass with state continuous from block 0
    ctl_lp = CompiledChain(
        build_chain_from_string("lowpass 1k 0.7071", StreamInfo(FS, 2)), block_frames=B
    )
    lp = _run_blocks(ctl_lp, x)
    np.testing.assert_allclose(y_pre, lp[: 4 * B], rtol=0, atol=1e-14)
    # new path: highpass starting FRESH at the swap point
    ctl_hp = CompiledChain(
        build_chain_from_string("highpass 1k 0.7071", StreamInfo(FS, 2)), block_frames=B
    )
    hp = _run_blocks(ctl_hp, x[4 * B :])
    n = we.fade_frames
    pos = np.maximum(n - np.arange(len(y_post)), 0)
    m = np.where(pos > 0, (n - pos) / n, 1.0)[:, None]
    expect = hp * m + lp[4 * B :] * (1.0 - m)
    np.testing.assert_allclose(y_post, expect, rtol=0, atol=1e-14)


def test_reload_rejected_on_stream_change(tmp_path, noise):
    """A sub-chain that changes the output channel count is rejected
    (watch.c:66-81); the old sub-chain keeps running untouched."""
    x = noise[: 4 * B]
    f, chain, cc, we = _build_watch_chain(tmp_path, "gain -3")
    _run_blocks(cc, x[: 2 * B])
    old_sub = we.sub
    f.write_text("remix 0\n")  # 2ch -> 1ch
    assert not cc.watch_swap(we)
    assert we.sub is old_sub and we.sub_old is None
    y = _run_blocks(cc, x[2 * B :])
    g1 = 10 ** (-3 / 20)
    lp = _run_blocks(
        CompiledChain(
            build_chain_from_string("lowpass 500 0.7071", StreamInfo(FS, 2)), block_frames=B
        ),
        x,
    )
    np.testing.assert_allclose(y, lp[2 * B :] * g1, rtol=0, atol=1e-14)


def test_reload_rejected_on_parse_error(tmp_path, noise):
    f, chain, cc, we = _build_watch_chain(tmp_path, "gain -3")
    old_sub = we.sub
    f.write_text("nosucheffect 42\n")
    assert not cc.watch_swap(we)
    assert we.sub is old_sub and we.sub_old is None


def test_mtime_poll_requests_reload(tmp_path, noise):
    """host_update polls mtime at 1 Hz and validates before requesting the
    reload (watch.c:94-123 worker + 60-92 validation)."""
    f, chain, cc, we = _build_watch_chain(tmp_path, "gain -3")
    cc.run_block(noise[:B])
    # valid change
    f.write_text("gain -6\n")
    os.utime(f, (0, we._mtime + 10))
    we._last_poll = 0.0
    cc.host_update()
    assert we.reload_requested
    we.reload_requested = False
    # invalid change: validation fails, no request
    f.write_text("remix 0\n")
    os.utime(f, (0, we._mtime + 20))
    we._last_poll = 0.0
    cc.host_update()
    assert not we.reload_requested


def test_reload_during_active_fade_is_deferred(tmp_path, noise):
    """A second reload landing mid-crossfade must not nest fade states
    (pre-fix: KeyError in _run_sub): the swap is deferred until the active
    fade completes (watch.c:135 `update_chain && xfade.pos == 0`), then the
    pending reload applies cleanly."""
    x = noise
    f, chain, cc, we = _build_watch_chain(tmp_path, "gain -3")
    _run_blocks(cc, x[: 2 * B])

    f.write_text("gain -6\n")
    assert cc.watch_swap(we)
    assert we.sub_old is not None

    # mid-fade: a direct apply_reload must refuse ...
    f.write_text("gain -9\n")
    assert not we.apply_reload(B)
    # ... and the runner-level path defers (reload_requested stays pending)
    we.reload_requested = True
    from dsp_tpu.cli.interactive import StreamLoop  # noqa: F401 (driver parity)

    # run until the first fade ends, polling like check_watch_reload does
    deferred = True
    for i in range(2, 10):
        if we.sub_old is None and we.reload_requested:
            # fade done -> pending reload may now apply
            we.reload_requested = False
            assert we.apply_reload(B)
            cc.retrace({id(we): we.xfade_state_entry(
                cc.states[cc._runtime_effects.index(we)], B)})
            deferred = False
        y = np.asarray(cc.run_block(x[i * B : (i + 1) * B]))
        assert np.isfinite(y).all()
        cc.finish_watch_fades()
    assert not deferred, "second reload never applied"
    assert we.sub_old is None
    # final steady state is gain -9 through the outer lowpass
    ctl = build_chain_from_string("lowpass 500 0.7071", StreamInfo(FS, 2))
    lp = _run_blocks(CompiledChain(ctl, block_frames=B), x)
    g3 = 10 ** (-9 / 20)
    np.testing.assert_allclose(
        np.asarray(cc.run_block(x[10 * B : 11 * B])),
        lp[10 * B : 11 * B] * g3, rtol=0, atol=1e-13)


def test_streaming_loop_output_matches_offline(tmp_path):
    """The streaming loop (forced by watch) must produce the same frame
    count and audio as the offline path for non-block-aligned input lengths
    and multi-input concatenation — the B-alignment carry must persist
    across inputs (no zero insertion) and the tail must be trimmed exactly
    (pre-fix: zero-pad output was written untrimmed)."""
    import subprocess
    import sys

    sub = tmp_path / "sub.txt"
    sub.write_text("lowpass 1k 0.7071\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out_a = str(tmp_path / "a.raw")
    out_b = str(tmp_path / "b.raw")
    # two inputs with non-block-multiple lengths (0.23 s + 0.31 s)
    base = ["-q", "-t", "sgen", "sine:freq=997+0.23",
            "-t", "sgen", "sine:freq=1.3k+0.31",
            "-o", "-t", "pcm", "-e", "double"]

    def run(args):
        r = subprocess.run([sys.executable, "-m", "dsp_tpu.cli.main"] + args,
                           env=env, capture_output=True, text=True, timeout=110)
        assert r.returncode == 0, r.stderr

    run(base + [out_a, "watch", str(sub)])       # streaming loop
    run(base + [out_b, "lowpass", "1k", "0.7071"])  # offline path
    a = np.fromfile(out_a, dtype=np.float64)
    b = np.fromfile(out_b, dtype=np.float64)
    assert len(a) == len(b), (len(a), len(b))
    assert np.abs(a - b).max() < 1e-12


def test_watch_exports_subchain_block_quantum(tmp_path, noise):
    """A resample inside a watch sub-chain constrains the OUTER block size
    (in_len must divide it); pre-fix the compiled block was only quantized
    by the ratio, crashing the resampler's exact-block assertion."""
    f = tmp_path / "sub.txt"
    f.write_text("resample 48k\n")
    stream = StreamInfo(FS, 1)
    chain = build_chain_from_string(f"watch {f}", stream)
    # the rate change triggers an align pass; pick out the watch effect
    (we,) = [e for e in chain.effects if type(e).__name__ == "WatchEffect"]
    assert we.block_quantum % 147 == 0  # contains the resampler's in_len
    cc = CompiledChain(chain, block_frames=2048)
    assert cc.block_frames % we.block_quantum == 0
    x = noise[: 3 * cc.block_frames, :1]
    y = cc.process_array(x)
    r = chain.ratio
    assert len(y) == -(-len(x) * r.numerator // r.denominator) + chain.drain_out_frames - chain.output_discard
    assert np.isfinite(y).all()


def test_streaming_loop_stats_exclude_padding(tmp_path):
    """The streaming loop's final flush must stop measurement effects at the
    true stream end (set_valid_frames): stats through a watch chain on a
    non-block-multiple input must print the same table as the offline path
    (pre-fix the zero padding entered Samples/DC/RMS)."""
    import re
    import subprocess
    import sys

    sub = tmp_path / "sub.txt"
    sub.write_text("gain -1\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    def run(args):
        r = subprocess.run([sys.executable, "-m", "dsp_tpu.cli.main"] + args,
                           env=env, capture_output=True, text=True, timeout=110)
        assert r.returncode == 0, r.stderr
        m = re.search(r"Channel.*?Length \(s\)[^\n]*", r.stderr, re.S)
        assert m, r.stderr
        return m.group(0)

    base = ["-q", "-t", "sgen", "sine:freq=997+0.233", "-o", "-n"]
    t_stream = run(base + ["watch", str(sub), "stats"])
    t_offline = run(base + ["gain", "-1", "stats"])
    assert t_stream == t_offline
