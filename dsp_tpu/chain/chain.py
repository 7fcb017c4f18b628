"""Effects chain: build, optimize, align, compile, run.

This is the rebuild's analog of /root/reference/effects_chain.c, redesigned
as a compiler pipeline: parse -> typed effect list -> passes (merge
optimization, channel alignment, drain computation) -> one jitted
``(states, block) -> (states, out_block)`` step function. Offline processing
additionally wraps the step in a ``lax.scan`` over many blocks per dispatch
so host->device dispatch overhead is amortized.
"""

from dataclasses import dataclass, field
from fractions import Fraction
from math import gcd, lcm

import numpy as np

from dsp_tpu import config
from dsp_tpu.core import log
from dsp_tpu.core.types import StreamInfo
from dsp_tpu.effects.align import AlignEffect
from dsp_tpu.effects.base import EFFECT_FLAG_ALIGN_BARRIER, EFFECT_FLAG_CH_DEPS_IDENTITY, EFFECT_FLAG_OPT_REORDERABLE


class ChainError(Exception):
    pass


@dataclass
class Chain:
    istream: StreamInfo
    ostream: StreamInfo
    effects: list = field(default_factory=list)
    ratio: Fraction = Fraction(1)
    drain_frames: int = 0
    drain_out_frames: int = 0  # the same drain expressed at the OUTPUT rate (exact)
    output_discard: int = 0  # frames to drop at chain output (align-discard equivalent)
    zero_ref: int = 0

    @property
    def max_ch(self):
        m = max(self.istream.channels, self.ostream.channels)
        for e in self.effects:
            m = max(m, e.istream.channels, e.ostream.channels)
        return m

    def delay_frames(self):
        """Total chain latency in *input* frames (approx; effects_chain.c:1083-1089)."""
        d = Fraction(0)
        r = Fraction(1)
        for e in self.effects:
            lat, _ = e.channel_offsets()
            if len(lat):
                d += Fraction(int(lat.max()), 1) / r
            r *= e.ratio
        return float(d)


# ---------------------------------------------------------------------------
# passes
# ---------------------------------------------------------------------------


def _has_merge(e):
    from dsp_tpu.effects.base import Effect

    return type(e).merge is not Effect.merge


def optimize_chain(chain):
    """Merge pass (effects_chain.c:605-641): each merge-capable effect tries
    to absorb every following effect with identical stream params, skipping
    over OPT_REORDERABLE non-mergeables (so eq's merge across a gain)."""
    n_before = len(chain.effects)
    effects = chain.effects
    i = 0
    while i < len(effects):
        dest = effects[i]
        if _has_merge(dest):
            j = i + 1
            while j < len(effects):
                src = effects[j]
                if (
                    src.istream.fs != dest.istream.fs
                    or src.istream.channels != dest.istream.channels
                    or src.ostream.fs != dest.ostream.fs
                    or src.ostream.channels != dest.ostream.channels
                ):
                    break
                if not _has_merge(src):
                    if src.flags & EFFECT_FLAG_OPT_REORDERABLE:
                        j += 1
                        continue
                    break
                if dest.merge(src):
                    effects.pop(j)
                else:
                    j += 1
        i += 1
    if len(effects) < n_before:
        log.verbose(
            "optimize: info: reduced number of effects from %d to %d", n_before, len(effects)
        )


def prepare_chain(chain):
    for e in chain.effects:
        e.prepare()


def _query_channel_deps(e):
    deps = e.channel_deps()
    if deps is None:
        return None
    return np.asarray(deps, dtype=bool)


def _find_input_deps(ch, deps):
    """Transitive closure of channel coupling (effects_chain.c:703-725)."""
    n_out, n_in = deps.shape
    r = np.zeros(n_in, dtype=bool)
    r[ch] = True
    changed = True
    while changed:
        changed = False
        for i in range(n_out):
            if (r & deps[i]).any():
                new = deps[i] & ~r
                if new.any():
                    r |= deps[i]
                    changed = True
    return r


def _is_passthrough(e):
    return e.istream.channels == e.ostream.channels and (
        e.flags & (EFFECT_FLAG_CH_DEPS_IDENTITY | EFFECT_FLAG_OPT_REORDERABLE)
    )


def _insert_align(chain, idx, offsets, align_refs, prev):
    """Insert an AlignEffect after position idx-1 (align.c:95-162).

    Returns (n_inserted, discard_frames_at_this_point).
    """
    n = prev.ostream.channels
    at_end = idx >= len(chain.effects)
    if align_refs is not None:
        do_align = any(offsets[k] != align_refs[k] for k in range(n))
    else:
        do_align = any(offsets[k] != 0 for k in range(n))
    if not do_align:
        return 0, 0
    max_offset = 0 if at_end else offsets[0]
    for k in range(n):
        max_offset = max(max_offset, offsets[k])
    lens = np.zeros(n, dtype=np.int64)
    min_ref = max_offset
    for k in range(n):
        ref = align_refs[k] if align_refs is not None else max_offset
        min_ref = min(min_ref, ref)
        if offsets[k] != ref:
            lens[k] = ref - offsets[k]
        offsets[k] = ref
    discard = 0
    if min_ref > 0:
        for k in range(n):
            offsets[k] -= min_ref
        discard = min_ref
    e = AlignEffect(prev.ostream, lens, discard)
    chain.effects.insert(idx, e)
    if log.loglevel(log.LL_VERBOSE):
        for k in range(n):
            if lens[k]:
                log.verbose("align: info: channel %d: %d", k, int(lens[k]))
        if discard:
            log.verbose("align: info: discarding %d frames (at chain output)", discard)
    return 1, discard


def align_channels(chain):
    """Alignment pass (effects_chain.c:727-875), with output-side discard."""
    max_ch = chain.max_ch
    offsets = [0] * max_ch
    delays = [0] * max_ch
    nd_part = 0
    discards = []  # (position_after_insert, discard_frames)

    i = 0
    prev = None
    while i < len(chain.effects):
        e = chain.effects[i]
        deps = _query_channel_deps(e)
        have_deps = deps is not None
        if prev is not None:
            if e.flags & EFFECT_FLAG_ALIGN_BARRIER:
                ins, disc = _insert_align(chain, i, offsets, None, prev)
            elif have_deps:
                n_in = e.istream.channels
                align_refs = list(offsets[:n_in])
                done = np.zeros(n_in, dtype=bool)
                for k in range(n_in):
                    if done[k]:
                        continue
                    grp = _find_input_deps(k, deps)
                    max_offset = offsets[k]
                    for m in range(n_in):
                        if grp[m]:
                            done[m] = True
                            max_offset = max(max_offset, offsets[m])
                    for m in range(n_in):
                        if grp[m]:
                            align_refs[m] = max_offset
                ins, disc = _insert_align(chain, i, offsets, align_refs, prev)
            elif e.istream.fs != e.ostream.fs:
                log.verbose("info: %s: sample rate changed; doing full alignment", e.name)
                ins, disc = _insert_align(chain, i, offsets, None, prev)
            elif not _is_passthrough(e):
                log.verbose("warning: %s: channel deps unknown; doing full alignment", e.name)
                ins, disc = _insert_align(chain, i, offsets, None, prev)
            else:
                ins, disc = 0, 0
            if ins:
                i += ins
                if disc:
                    discards.append((i, disc))
        # propagate offsets/delays through the effect
        if have_deps:
            n_in, n_out = e.istream.channels, e.ostream.channels
            tmp_offsets = list(offsets[:n_in])
            tmp_delays = list(delays[:n_in])
            max_offset = max(tmp_offsets[:n_in], default=0)
            for o in range(n_out):
                offset_idx = -1
                delays[o] = 0
                for k in range(n_in):
                    if deps[o, k]:
                        if offset_idx < 0:
                            offset_idx = k
                            delays[o] = tmp_delays[k]
                        elif tmp_offsets[k] != tmp_offsets[offset_idx]:
                            raise ChainError(
                                f"align: BUG: channel {k} offset incorrect: "
                                f"{tmp_offsets[k]}!={tmp_offsets[offset_idx]}"
                            )
                        else:
                            delays[o] = min(delays[o], tmp_delays[k])
                offsets_o = tmp_offsets[offset_idx] if offset_idx >= 0 else max_offset
                if o < len(offsets):
                    offsets[o] = offsets_o
        elif not _is_passthrough(e):
            n_in, n_out = e.istream.channels, e.ostream.channels
            min_delay = delays[0]
            for k in range(1, n_in):
                min_delay = min(min_delay, delays[k])
                if offsets[k] != offsets[k - 1]:
                    raise ChainError(
                        f"align: BUG: channel {k} offset incorrect: {offsets[k]}!={offsets[k-1]}"
                    )
            for o in range(n_out):
                delays[o] = min_delay
        for o in range(e.ostream.channels, e.istream.channels):
            delays[o] = offsets[o] = 0
        n_out = e.ostream.channels
        for o in range(n_out):
            offsets[o] += delays[o] - nd_part
        lat, req = e.channel_offsets()
        if lat.any() or req.any():
            for o in range(n_out):
                offsets[o] += int(lat[o])
                delays[o] += int(req[o])
        elif e.ostream.fs != e.istream.fs:
            g = gcd(e.ostream.fs, e.istream.fs)
            rn, rd = e.ostream.fs // g, e.istream.fs // g
            for o in range(n_out):
                delays[o] = -(-delays[o] * rn // rd)
        nd_part = 0
        for o in range(n_out):
            nd_part = min(nd_part, delays[o])
        for o in range(n_out):
            offsets[o] -= delays[o] - nd_part
        prev = e
        i += 1

    chain.zero_ref = -nd_part
    if prev is not None:
        ins, disc = _insert_align(chain, len(chain.effects), offsets, None, prev)
        if disc:
            discards.append((len(chain.effects), disc))

    # convert per-position discards to chain-output frames
    total = Fraction(0)
    for pos, disc in discards:
        r = Fraction(1)
        for e in chain.effects[pos:]:
            r *= e.ratio
        total += disc * r
    if total.denominator != 1:
        # a rate change after an align-discard point makes the discard
        # fractional in output frames; the output-side discard (documented
        # deviation #2, PARITY.md) floors it — up to one output frame of
        # phase offset vs the reference's exact mid-chain discard
        log.verbose(
            "info: align discard is fractional at the output (%s frames); flooring",
            total,
        )
    chain.output_discard = int(total)


def set_drain_frames(chain):
    """Drain computation (effects_chain.c:877-923)."""
    max_ch = chain.max_ch
    samples = [0] * max_ch
    for e in chain.effects:
        deps = _query_channel_deps(e)
        if deps is not None:
            tmp = list(samples)
            for o in range(e.ostream.channels):
                ch_drain = 0
                for k in range(e.istream.channels):
                    if deps[o, k]:
                        ch_drain = max(ch_drain, tmp[k])
                samples[o] = ch_drain
        elif (
            not (e.flags & (EFFECT_FLAG_CH_DEPS_IDENTITY | EFFECT_FLAG_OPT_REORDERABLE))
            and e.istream.channels != e.ostream.channels
        ):
            m = max(samples[: e.istream.channels], default=0)
            for o in range(e.ostream.channels):
                samples[o] = m
        before = list(samples)
        e.drain_samples(samples)
        if samples == before and e.ostream.fs != e.istream.fs:
            g = gcd(e.ostream.fs, e.istream.fs)
            rn, rd = e.ostream.fs // g, e.istream.fs // g
            for o in range(e.ostream.channels):
                samples[o] = -(-samples[o] * rn // rd)
        for o in range(e.ostream.channels, e.istream.channels):
            samples[o] = 0
    drain = 0
    out_ch = chain.ostream.channels
    for o in range(out_ch):
        drain = max(drain, samples[o])
    # keep the exact output-rate figure: the back-conversion to input frames
    # below floors (mirroring effects_chain.c:918-920) and the runners need
    # the exact output-frame drain for their length accounting
    chain.drain_out_frames = drain
    if chain.istream.fs != chain.ostream.fs:
        g = gcd(chain.istream.fs, chain.ostream.fs)
        drain = drain * (chain.istream.fs // g) // (chain.ostream.fs // g)
    chain.drain_frames = drain
    log.verbose("info: input drain frames: %d", chain.drain_frames)


def finish_chain(chain):
    if not chain.effects:
        chain.ostream = chain.istream
        return chain
    chain.ostream = chain.effects[-1].ostream
    g = gcd(chain.ostream.fs, chain.istream.fs)
    chain.ratio = Fraction(chain.ostream.fs // g, chain.istream.fs // g)
    optimize_chain(chain)
    prepare_chain(chain)
    align_channels(chain)
    set_drain_frames(chain)
    return chain


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------


def build_chain_from_args(argv, stream, mask=None, dir_=None):
    """argv: list of effect/arg words (no program name)."""
    from dsp_tpu.chain.parser import parse_string_into

    # join argv into a single line for diagnostics, preserving word boundaries
    # exactly (each argv element is one token, like ec_parse_argv)
    return build_chain_from_string(" ".join(_escape_word(w) for w in argv), stream, mask, dir_)


def _escape_word(w):
    # the reference lexes each argv element as ONE verbatim token
    # (ec_lex_word, effects_chain.c:79-103): quote anything the string
    # re-lexer would split or misread — whitespace, quotes, and '#'
    # (comment-start in the string grammar, plain literal in argv)
    if w == "" or any(c.isspace() for c in w) or '"' in w or "\\" in w or "#" in w:
        return '"' + w.replace("\\", "\\\\").replace('"', '\\"') + '"'
    return w


def build_chain_from_string(s, stream, mask=None, dir_=None):
    from dsp_tpu.chain.parser import parse_string_into

    chain = Chain(istream=stream, ostream=stream)
    sref = [stream]
    parse_string_into(chain, s, None, dir_ or ".", sref, mask)
    return finish_chain(chain)


def build_chain_from_file(path, stream, mask=None, dir_=None, enforce_eof_marker=False):
    from dsp_tpu.chain.parser import parse_file_into

    chain = Chain(istream=stream, ostream=stream)
    sref = [stream]
    if mask is None:
        mask = np.ones(stream.channels, dtype=bool)
    parse_file_into(chain, path, dir_ or ".", sref, mask, enforce_eof_marker)
    return finish_chain(chain)


# ---------------------------------------------------------------------------
# compilation / execution
# ---------------------------------------------------------------------------


def expected_out_frames(chain, n_in, drain=True):
    """THE output-length law, shared by every runner (process_array,
    process_batch, run_offline, the streaming flush): ceil(n_in * ratio)
    plus the chain's OUTPUT-rate drain when draining — the emergent total
    of the reference's run + drain accounting (ratio_mult_ceil at each
    rate change; ceil(N*n/d) exactly for a pure resample chain,
    resample.c:163-188). Pre-discard frames."""
    r = chain.ratio
    out = -(-n_in * r.numerator // r.denominator)
    if drain:
        out += chain.drain_out_frames
    return out


def block_quantum_for(effects):
    """Input-block quantum for a list of effects: the block size must keep
    every intermediate frame count integral (static shapes) and be a
    multiple of each effect's block_quantum expressed in input frames.
    Used by CompiledChain and by container effects (watch) that must export
    their sub-chain's quantum."""
    q = 1
    r = Fraction(1)  # product of ratios before the current effect
    for e in effects:
        quantum = int(getattr(e, "block_quantum", 1))
        if quantum > 1:
            need = Fraction(quantum) / r  # input frames per quantum
            q = lcm(q, need.numerator)
        r *= e.ratio
        q = lcm(q, r.denominator)
    return q


class CompiledChain:
    """A chain compiled for a fixed input block size.

    The input block size is rounded up so that every intermediate frame count
    is integral (static shapes under jit). Offline use: process_array() runs
    a lax.scan over all blocks in one dispatch.
    """

    def __init__(self, chain, block_frames=None, dtype=None):
        import jax

        self.chain = chain
        self.dtype = dtype or config.sample_dtype()
        block_frames = block_frames or config.DEFAULT_BLOCK_FRAMES
        q = block_quantum_for(chain.effects)
        self.block_frames = -(-block_frames // q) * q
        self.out_frames = int(self.block_frames * chain.ratio)
        # per-effect input block size (rate changes alter it mid-chain)
        self._block_at = {}
        self._ratio_at = {}  # cumulative rate ratio BEFORE each effect
        frames = Fraction(self.block_frames)
        ratio = Fraction(1)
        for e in chain.effects:
            self._block_at[id(e)] = int(frames)
            self._ratio_at[id(e)] = ratio
            frames *= e.ratio
            ratio *= e.ratio
        self._runtime_effects = self._fuse(
            [e for e in chain.effects if not getattr(e, "runtime_noop", False)]
        )
        self.states = [self._initial_state(e) for e in self._runtime_effects]

        def step(states, x):
            new_states = []
            for e, st in zip(self._runtime_effects, states):
                st, x = e.step(st, x)
                new_states.append(st)
            return new_states, x

        def multi(states, xs):
            return jax.lax.scan(step, states, xs)

        self._step = jax.jit(step)
        self._multi = jax.jit(multi)
        self._step_fn_raw = step

    def _fuse(self, effects):
        """Backend fusion: collapse runs of 2+ adjacent biquads into one
        CascadeBlockedPlan kernel (one carry scan + one [L, L] Toeplitz set
        instead of K). Execution-only — the chain object, plot output, and
        merge semantics stay reference-identical (biquad.c merges only
        disjoint-channel biquads)."""
        from dsp_tpu.effects.biquad import BiquadEffect, FusedBiquadCascade

        out = []
        run = []
        if not hasattr(self, "_fuse_cache"):
            # keyed by member identity so retrace() reuses the same fused
            # object (and therefore its live state) for unchanged groups
            self._fuse_cache = {}

        def flush():
            if len(run) >= 2:
                key = tuple(id(e) for e in run)
                fused = self._fuse_cache.get(key)
                if fused is None:
                    fused = FusedBiquadCascade(list(run))
                    self._fuse_cache[key] = fused
                out.append(fused)
            else:
                out.extend(run)
            run.clear()

        for e in effects:
            blk = self._block_at.get(id(e), 0)
            from dsp_tpu.ops.iir import BLOCKED_L

            if type(e) is BiquadEffect and blk % BLOCKED_L == 0 and blk >= 2 * BLOCKED_L:
                run.append(e)
            else:
                flush()
                out.append(e)
        flush()
        return out

    def _initial_state(self, e):
        if hasattr(e, "state_for_block"):
            return self._to_device(e.state_for_block(self._block_at[id(e)]))
        return self._to_device(e.state0())

    def _to_device(self, tree):
        import jax

        def conv(a):
            a = np.asarray(a)
            if a.dtype in (np.float64, np.float32):
                return jax.numpy.asarray(a, dtype=self.dtype)
            if a.dtype in (np.complex128, np.complex64):
                cdt = np.complex64 if self.dtype == np.float32 else np.complex128
                return jax.numpy.asarray(a, dtype=cdt)
            return jax.numpy.asarray(a)

        return jax.tree_util.tree_map(conv, tree)

    def reset(self):
        self.states = [self._initial_state(e) for e in self._runtime_effects]

    def save_state(self, path):
        """Checkpoint the live stream state to an .npz file.

        The reference has no checkpoint/resume (SURVEY.md §5); here every
        effect's state is a pytree of arrays, so a running stream can be
        frozen and resumed exactly — process(first half), save, load into a
        fresh process, process(second half) is bit-identical to one pass
        (tests/test_chain.py). Useful for migrating long-running streams
        across processes/hosts.
        """
        import jax

        leaves, treedef = jax.tree_util.tree_flatten(self.states)
        arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
        arrays["__treedef__"] = np.asarray(str(treedef))
        arrays["__effects__"] = np.asarray(
            "|".join(e.name for e in self._runtime_effects)
        )
        np.savez_compressed(path, **arrays)

    def load_state(self, path):
        """Restore a state checkpoint written by save_state.

        Validated: the state pytree structure, every leaf's shape and dtype,
        and the runtime effect-name sequence. NOT validated (state arrays
        don't encode them): effect parameters — loading a checkpoint into a
        chain built from different arguments but with the same effect names
        and state shapes resumes silently with the new coefficients. The
        caller is responsible for pairing a checkpoint with the chain string
        that produced it."""
        import jax

        with np.load(path) as z:
            if "__treedef__" not in z or "__effects__" not in z:
                raise ChainError(f"{path}: not a dsp_tpu state checkpoint")
            leaves, treedef = jax.tree_util.tree_flatten(self.states)
            names = "|".join(e.name for e in self._runtime_effects)
            if str(z["__effects__"]) != names:
                raise ChainError(
                    f"state checkpoint is for effects [{z['__effects__']}], "
                    f"this chain runs [{names}]"
                )
            if str(z["__treedef__"]) != str(treedef):
                raise ChainError(
                    "state checkpoint does not match this chain's structure"
                )
            new = []
            for i, cur in enumerate(leaves):
                key = f"leaf_{i}"
                if key not in z:
                    raise ChainError(f"{path}: truncated state checkpoint")
                a = z[key]
                cur_np = np.asarray(cur)
                if a.shape != cur_np.shape or a.dtype != cur_np.dtype:
                    raise ChainError(
                        f"state leaf {i} mismatch: checkpoint "
                        f"{a.shape}/{a.dtype} vs chain {cur_np.shape}/{cur_np.dtype}"
                    )
                new.append(jax.numpy.asarray(a))
            self.states = jax.tree_util.tree_unflatten(treedef, new)

    def retrace(self, state_overrides=None):
        """Re-jit the step functions after an effect's Python-side structure
        changed (e.g. a watch sub-chain reload), PRESERVING every other
        effect's live state — the sub-chain-scoped swap of watch.c:132-155.

        state_overrides: {id(effect): new_state_entry} for effects whose
        state layout changed with the structure.
        """
        import jax

        old = {id(e): st for e, st in zip(self._runtime_effects, self.states)}
        self._runtime_effects = self._fuse(
            [e for e in self.chain.effects if not getattr(e, "runtime_noop", False)]
        )
        states = []
        for e in self._runtime_effects:
            if state_overrides and id(e) in state_overrides:
                states.append(self._to_device(state_overrides[id(e)]))
            elif id(e) in old:
                states.append(old[id(e)])
            else:
                states.append(self._initial_state(e))
        self.states = states

        def step(states, x):
            new_states = []
            for e, st in zip(self._runtime_effects, states):
                st, x = e.step(st, x)
                new_states.append(st)
            return new_states, x

        def multi(states, xs):
            return jax.lax.scan(step, states, xs)

        self._step = jax.jit(step)
        self._multi = jax.jit(multi)
        self._step_fn_raw = step

    def watch_swap(self, e):
        """Sub-chain-scoped hot swap (watch.c:132-155): rebuild ONLY the
        watch effect's sub-chain and crossfade inside its step. Every other
        effect keeps its live state across the retrace; the reference swaps
        the sub-chain under the effect's mutex with the same scope."""
        try:
            idx = self._runtime_effects.index(e)
        except ValueError:
            return False
        B = self._block_at[id(e)]
        if not e.apply_reload(B):
            return False
        self.retrace({id(e): e.xfade_state_entry(self.states[idx], B)})
        return True

    def finish_watch_fades(self):
        """Drop old sub-chains whose 100 ms crossfade completed (cheap check:
        only effects currently mid-fade pull their countdown to host)."""
        for idx, e in enumerate(list(self._runtime_effects)):
            if getattr(e, "sub_old", None) is not None and e.xfade_done(self.states[idx]):
                self.retrace({id(e): e.finish_xfade(self.states[idx])})

    def set_valid_frames(self, n_in_frames):
        """Tell measurement effects (stats) the true stream length in chain
        INPUT frames (absolute since the last reset), so zero padding added
        for static block shapes never enters their accumulators — the
        reference processes exact-length short blocks instead
        (effects_chain.c:1058-1081)."""
        for i, e in enumerate(self._runtime_effects):
            if hasattr(e, "set_valid_limit"):
                r = self._ratio_at.get(id(e), Fraction(1))
                self.states[i] = self._to_device(
                    e.set_valid_limit(self.states[i], int(n_in_frames * r))
                )

    def run_block(self, x):
        """x: [block_frames, in_ch] -> [out_frames, out_ch] (device arrays ok)."""
        import jax.numpy as jnp

        if isinstance(x, np.ndarray):
            x = np.asarray(x, dtype=self.dtype)  # cast host-side: fewer tunnel bytes
        x = jnp.asarray(x, dtype=self.dtype)
        self.states, y = self._step(self.states, x)
        return y

    def run_blocks(self, xs):
        """xs: [n, block_frames, in_ch] -> [n, out_frames, out_ch] in one dispatch."""
        import jax.numpy as jnp

        if isinstance(xs, np.ndarray):
            xs = np.asarray(xs, dtype=self.dtype)  # cast host-side: fewer tunnel bytes
        xs = jnp.asarray(xs, dtype=self.dtype)
        self.states, ys = self._multi(self.states, xs)
        return ys

    def host_update(self):
        for e, st in zip(self._runtime_effects, self.states):
            e.host_update(st)

    def host_finish(self):
        for e, st in zip(self._runtime_effects, self.states):
            e.host_finish(st)

    def process_array(self, x, drain=True, discard=True):
        """Process a whole [frames, in_ch] array; returns [out, out_ch] numpy.

        Appends chain.drain_frames of silence when drain=True and slices the
        chain's output_discard when discard=True, so the result matches the
        reference's file-to-file output.
        """
        x = np.asarray(x, dtype=np.float64)
        n_in = len(x)
        pad = self.chain.drain_frames if drain else 0
        total = n_in + pad
        self.set_valid_frames(total)
        B = self.block_frames
        out_valid = expected_out_frames(self.chain, n_in, drain)
        b_out = int(B * self.chain.ratio)
        n_blocks = max(1, -(-total // B), -(-out_valid // b_out))
        xp = np.zeros((n_blocks * B, x.shape[1]), dtype=np.float64)
        xp[:n_in] = x
        ys = self.run_blocks(xp.reshape(n_blocks, B, x.shape[1]))
        y = np.asarray(ys, dtype=np.float64).reshape(-1, ys.shape[-1])
        y = y[:out_valid]
        if discard and self.chain.output_discard:
            y = y[self.chain.output_discard :]
        return y

    def process_batch(self, xs, mesh=None, axis="dp", drain=True, discard=True):
        """Process S independent streams at once: xs [S, frames, in_ch] ->
        [S, out_frames, out_ch] numpy.

        The per-stream chain step is vmapped over the stream axis; with a
        `jax.sharding.Mesh`, streams shard over `axis` so N chips process
        N x the streams with zero cross-chip communication — the multi-chip
        scaling model for this embarrassingly parallel workload (the
        reference has no distribution; SURVEY §2.6). Each stream gets its
        own state, identical to running process_array per stream.
        """
        import jax
        import jax.numpy as jnp

        xs = np.asarray(xs, dtype=np.float64)
        S, n_in, c_in = xs.shape
        pad = self.chain.drain_frames if drain else 0
        total = n_in + pad
        B = self.block_frames
        out_valid = expected_out_frames(self.chain, n_in, drain)
        b_out = int(B * self.chain.ratio)
        n_blocks = max(1, -(-total // B), -(-out_valid // b_out))
        flat = np.zeros((S, n_blocks * B, c_in), dtype=np.float64)
        flat[:, :n_in] = xs
        xp = flat.reshape(S, n_blocks, B, c_in)

        def tile(leaf):
            a = jnp.asarray(leaf)
            return jnp.broadcast_to(a[None], (S,) + a.shape)

        states = jax.tree_util.tree_map(tile, self.states)

        def one(states, xblocks):
            return jax.lax.scan(self._step_fn_raw, states, xblocks)

        vrun = jax.vmap(one)
        xj = jnp.asarray(xp, dtype=self.dtype)  # [S, n_blocks, B, C]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            def shard(leaf):
                spec = P(axis, *([None] * (np.ndim(leaf) - 1)))
                return jax.device_put(leaf, NamedSharding(mesh, spec))

            states = jax.tree_util.tree_map(shard, states)
            xj = shard(xj)
            vrun = jax.jit(
                vrun,
                in_shardings=(
                    jax.tree_util.tree_map(
                        lambda leaf: NamedSharding(mesh, P(axis, *([None] * (np.ndim(leaf) - 1)))),
                        states,
                    ),
                    NamedSharding(mesh, P(axis, None, None, None)),
                ),
            )
        _, ys = vrun(states, xj)
        y = fetch_np(ys, dtype=np.float64).reshape(S, -1, ys.shape[-1])
        y = y[:, :out_valid]
        if discard and self.chain.output_discard:
            y = y[:, self.chain.output_discard :]
        return y

    def split_safe(self):
        """True when every effect tolerates zero-state lookback priming
        (Effect.split_safe); required by process_array_split."""
        return all(getattr(e, "split_safe", True) for e in self.chain.effects)

    def split_lookback_frames(self):
        """Chain-input frames of lookback that re-establish steady state.

        Sums each effect's own-rate lookback (Effect.split_lookback)
        converted to chain-input frames — transients of a cascade convolve,
        so the sum bounds the cascade's settle time."""
        fs0 = self.chain.istream.fs
        total = 0.0
        for e in self.chain.effects:
            total += e.split_lookback() * fs0 / e.istream.fs
        return int(np.ceil(total))

    def process_array_split(self, x, splits=8, lookback=None, drain=True, discard=True):
        """Process ONE long [frames, in_ch] array as `splits` lookback-primed
        segments batched over the stream axis: the single-file route onto the
        TPU's batched throughput (single-stream scans are HBM-latency-bound;
        batching recovers ~3x utilization — ARCHITECTURE.md). The reference
        has no analog: its offline path is strictly sequential (dsp.c).

        Segment 0 runs from the true zero state and is EXACT. Each later
        segment starts from zero state primed with `lookback` frames of the
        preceding input (default: split_lookback_frames()), and its primed
        output is discarded; the residual error is the chain's impulse-
        response tail past the lookback (the northstar chain measures below
        -150 dBFS vs the sequential run; tests/test_split.py). Raises
        ChainError when the chain holds split-unsafe effects (metering, PRNG
        streams, adaptive matrix4 engines). Uses fresh states: the
        CompiledChain's live stream state is neither consumed nor advanced.
        """
        import jax
        import jax.numpy as jnp

        if not self.split_safe():
            bad = [e.name for e in self.chain.effects if not getattr(e, "split_safe", True)]
            raise ChainError(f"chain is not split-safe (effects: {', '.join(bad)})")
        x = np.asarray(x, dtype=np.float64)
        n_in = len(x)
        pad = self.chain.drain_frames if drain else 0
        total = n_in + pad
        B = self.block_frames
        out_valid = expected_out_frames(self.chain, n_in, drain)
        b_out = int(B * self.chain.ratio)
        nb = max(1, -(-total // B), -(-out_valid // b_out))
        if lookback is None:
            lookback = self.split_lookback_frames()
        wb = -(-int(lookback) // B)
        seg_nb = max(1, -(-nb // int(splits)))
        S = -(-nb // seg_nb)
        xp = np.zeros((nb * B, x.shape[1]), dtype=np.float64)
        xp[:n_in] = x
        xs = np.zeros((S, (wb + seg_nb) * B, x.shape[1]), dtype=np.float64)
        for k in range(S):
            s0 = k * seg_nb * B
            w0 = max(0, s0 - wb * B)
            seg = xp[w0 : min(nb * B, s0 + seg_nb * B)]
            off = wb * B - (s0 - w0)
            xs[k, off : off + len(seg)] = seg
        states0 = [self._initial_state(e) for e in self._runtime_effects]

        def tile(leaf):
            a = jnp.asarray(leaf)
            return jnp.broadcast_to(a[None], (S,) + a.shape)

        states = jax.tree_util.tree_map(tile, states0)

        def one(st, xblocks):
            return jax.lax.scan(self._step_fn_raw, st, xblocks)

        xj = jnp.asarray(xs.reshape(S, wb + seg_nb, B, x.shape[1]), dtype=self.dtype)
        _, ys = jax.vmap(one)(states, xj)
        ys = fetch_np(ys, dtype=np.float64)  # [S, wb+seg_nb, b_out, ch]
        y = ys.reshape(S, -1, ys.shape[-1])[:, wb * b_out :]
        y = y.reshape(-1, y.shape[-1])[:out_valid]
        if discard and self.chain.output_discard:
            y = y[self.chain.output_discard :]
        return y


def chain_needs_dither(chain):
    """True if any effect modifies the signal such that dither is useful
    (effects_chain.c:1022-1030)."""
    from dsp_tpu.effects.base import EFFECT_FLAG_NO_DITHER

    for e in chain.effects:
        if not (e.flags & EFFECT_FLAG_NO_DITHER) and not getattr(e, "is_dither", False):
            return True
    return False


def chain_set_dither_params(chain, prec, enabled):
    """Propagate auto-dither params; returns True if app-level dither should
    be added (effects_chain.c:1032-1043)."""
    from dsp_tpu.effects.base import EFFECT_FLAG_NO_DITHER

    r = True
    for e in chain.effects:
        if getattr(e, "is_dither", False):
            e.set_auto_params(prec, enabled)
            r = False
        elif not (e.flags & EFFECT_FLAG_NO_DITHER):
            r = True
    return r and enabled


def signal_chain(chain, compiled=None):
    """Send the chain signal (SIGUSR2 / 's'): every effect's signal() hook."""
    for e in chain.effects:
        e.signal()


_d2h_warmed = False


def warm_d2h():
    """One-time device->host transfer warm-up.

    The first D2H copy in a process over the tunneled TPU backend stalls for
    tens of seconds to minutes (lazy reverse-channel setup); every later copy
    runs at tens of MB/s. A single 8-byte fetch absorbs the whole penalty in
    ~1 s. Only audio-fetching paths (the CLI) should call this: the warm-up
    itself leaves the stream in a mode that costs pure-compute loops real
    throughput, so CompiledChain deliberately does NOT warm it."""
    global _d2h_warmed
    if _d2h_warmed:
        return
    _d2h_warmed = True
    try:
        import jax.numpy as jnp

        np.asarray(jnp.zeros(8))
    except Exception:
        pass


def warm_d2h_async():
    import threading

    import jax

    try:
        if jax.default_backend() == "cpu":
            return  # no tunnel; also avoids a thread racing process exit
    except Exception:
        return
    # non-daemon: finishes in ~1 s and must not be killed mid-runtime-call
    # (a daemon thread aborted inside the backend SIGABRTs at exit)
    threading.Thread(target=warm_d2h, daemon=False).start()


def fetch_np(ys, dtype=None, streams=8):
    """Device -> host transfer of a [n, ...] result, in parallel streams for
    large arrays (marginal post-warm-up, but free); see warm_d2h for the
    first-fetch tunnel behavior. The reference hides sink latency with a
    writer pthread (codec_buf.c:542-620); here the sink is the tunnel."""
    import concurrent.futures as cf

    import jax

    if jax.default_backend() == "cpu":
        # no tunnel: a plain copy is fastest, and the stream-split below
        # would compile 8 distinct slice programs per process
        out = np.asarray(ys)
        return out if dtype is None else out.astype(dtype, copy=False)
    warm_d2h()
    n = ys.shape[0] if ys.ndim else 0
    if n < streams * 2 or ys.size * ys.dtype.itemsize < (8 << 20):
        out = np.asarray(ys)
        return out if dtype is None else out.astype(dtype, copy=False)
    bounds = np.linspace(0, n, streams + 1, dtype=int)
    parts = [jax.lax.slice_in_dim(ys, bounds[i], bounds[i + 1], axis=0) for i in range(streams)]
    jax.block_until_ready(parts)
    with cf.ThreadPoolExecutor(streams) as ex:
        host = list(ex.map(np.asarray, parts))
    out = np.concatenate(host, axis=0)
    return out if dtype is None else out.astype(dtype, copy=False)
