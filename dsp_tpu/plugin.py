"""Chain-as-library plugin API (reference: /root/reference/ladspa_dsp.c).

The reference exposes the effects-chain engine as a LADSPA plugin configured
by files named ``config`` or ``config_<name>`` found in
``$LADSPA_DSP_CONFIG_PATH`` / ``$XDG_CONFIG_HOME/ladspa_dsp`` /
``~/.config/ladspa_dsp`` / ``/etc/ladspa_dsp``; keys: input_channels,
output_channels, LC_NUMERIC, effects_chain (single line or the
``[effects_chain]`` directive for the remainder of the file)
(ladspa_dsp.c:103-169, 221-248).

On a TPU host a C LADSPA .so cannot reasonably embed the JAX runtime, so the
same engine is exported as a Python API with identical configuration
semantics: discover_plugins() finds the configs; Plugin.run() processes
``[frames, in_channels]`` float arrays through the compiled chain. Auto
dither is disabled (ladspa_dsp.c:299) and the number of output channels must
match the chain (ladspa_dsp.c:154-160).
"""

import os

import numpy as np

from dsp_tpu.chain import CompiledChain, build_chain_from_string
from dsp_tpu.chain.chain import chain_set_dither_params
from dsp_tpu.core import log
from dsp_tpu.core.types import StreamInfo


class PluginError(Exception):
    pass


class PluginConfig:
    def __init__(self, name, path):
        self.name = name  # None for the default "config"
        self.path = path
        self.input_channels = 1
        self.output_channels = 1
        self.lc_numeric = "C"
        self.effects_chain = ""
        self._parse()

    @property
    def label(self):
        return "ladspa_dsp" if self.name is None else f"ladspa_dsp:{self.name}"

    def _parse(self):
        with open(self.path) as f:
            lines = f.read().split("\n")
        in_chain = False
        chain_lines = []
        for ln in lines:
            if in_chain:
                chain_lines.append(ln)
                continue
            s = ln.lstrip()
            if not s or s.startswith("#"):
                continue
            if s.strip() == "[effects_chain]":
                in_chain = True
                continue
            if "=" not in s:
                raise PluginError(f"{self.path}: malformed line: {ln!r}")
            key, _, val = s.partition("=")
            key = key.strip()
            if key == "input_channels":
                self.input_channels = int(val)
            elif key == "output_channels":
                self.output_channels = int(val)
            elif key == "LC_NUMERIC":
                self.lc_numeric = val
            elif key == "effects_chain":
                chain_lines = [val]
            else:
                raise PluginError(f"{self.path}: unknown key: {key}")
        self.effects_chain = "\n".join(chain_lines)


def config_dirs():
    env = os.environ.get("LADSPA_DSP_CONFIG_PATH")
    if env:
        return [d for d in env.split(":") if d]
    xdg = os.environ.get("XDG_CONFIG_HOME")
    if xdg:
        return [os.path.join(xdg, "ladspa_dsp"), "/etc/ladspa_dsp"]
    home = os.environ.get("HOME", "")
    return [os.path.join(home, ".config", "ladspa_dsp"), "/etc/ladspa_dsp"]


def discover_plugins():
    """Find all config files -> list of PluginConfig (ladspa_dsp.c:221-248)."""
    configs = []
    seen = set()
    for d in config_dirs():
        try:
            entries = sorted(os.listdir(d))
        except OSError:
            continue
        for fn in entries:
            if fn == "config":
                name = None
            elif fn.startswith("config_"):
                name = fn[len("config_") :]
            else:
                continue
            if name in seen:
                continue
            seen.add(name)
            configs.append(PluginConfig(name, os.path.join(d, fn)))
    return configs


class Plugin:
    """An instantiated chain processing host-sized blocks.

    Latency matches the reference's SYMMETRIC_IO build (ladspa_dsp.c
    run_dsp, align.c:53): frames-in == frames-out with ZERO added latency
    for hosts that call run() with a constant block size — the compiled
    block is sized lazily from the first run() call, so every call maps to
    exactly one jitted step. Hosts that change the block size mid-stream
    (legal per the LADSPA spec, but no common host does it) fall back to
    carry buffering: output is padded with silence while the pipeline
    deficit grows, then the latency stays at its high-water mark (the
    `latency` property; bounded by one compiled block). Pass an explicit
    ``block_frames`` to force the compiled block size up front.
    """

    def __init__(self, cfg, fs, block_frames=None):
        self.cfg = cfg
        self.fs = int(fs)
        stream = StreamInfo(self.fs, cfg.input_channels)
        import locale

        saved = locale.setlocale(locale.LC_NUMERIC)
        try:
            if cfg.lc_numeric and cfg.lc_numeric != "none":
                try:
                    locale.setlocale(locale.LC_NUMERIC, cfg.lc_numeric)
                except locale.Error:
                    pass
            dir_ = os.path.dirname(cfg.path) or "."
            self.chain = build_chain_from_string(cfg.effects_chain, stream, dir_=dir_)
        finally:
            locale.setlocale(locale.LC_NUMERIC, saved)
        if self.chain.ostream.channels != cfg.output_channels:
            raise PluginError(
                f"{cfg.path}: effects chain outputs {self.chain.ostream.channels} "
                f"channels but output_channels={cfg.output_channels}"
            )
        if self.chain.ostream.fs != self.fs:
            raise PluginError(f"{cfg.path}: the resample effect cannot be used here")
        chain_set_dither_params(self.chain, 0, False)  # auto dither off
        self.cc = None
        if block_frames is not None:
            self.cc = CompiledChain(self.chain, block_frames=block_frames)
        self._carry_in = np.zeros((0, cfg.input_channels))
        self._carry_out = np.zeros((0, cfg.output_channels))
        self._latency = 0

    @property
    def latency(self):
        """Current processing latency in frames (0 until a run() call ever
        left the pipeline short; then the deficit high-water mark)."""
        return self._latency

    def run(self, x):
        """Process [frames, in_channels] -> [frames, out_channels]
        (frames-in == frames-out)."""
        x = np.asarray(x, dtype=np.float64)
        if x.ndim == 1:
            x = x[:, None]
        frames = len(x)
        if frames == 0:
            return np.zeros((0, self.cfg.output_channels))
        if self.cc is None:
            # size the compiled block from the host's block (rounded up to
            # the chain's block quantum, e.g. fs/32 for matrix4). The
            # 128-frame floor guards against a tiny priming run() pinning a
            # pathologically small compiled block for the whole session; a
            # genuine small-period host pays at most 128 frames (~3 ms) of
            # deficit latency instead of 0.
            self.cc = CompiledChain(self.chain, block_frames=max(frames, 128))
        B = self.cc.block_frames
        self._carry_in = np.concatenate([self._carry_in, x], axis=0)
        while len(self._carry_in) >= B:
            blk = self._carry_in[:B]
            self._carry_in = self._carry_in[B:]
            y = np.asarray(self.cc.run_block(blk), dtype=np.float64)
            self._carry_out = np.concatenate([self._carry_out, y], axis=0)
        if len(self._carry_out) < frames:
            # pipeline deficit (host block size changed, or not a quantum
            # multiple): pad with silence and raise the constant latency
            deficit = frames - len(self._carry_out)
            self._carry_out = np.concatenate(
                [np.zeros((deficit, self._carry_out.shape[1])), self._carry_out]
            )
            self._latency += deficit
        out = self._carry_out[:frames]
        self._carry_out = self._carry_out[frames:]
        return out

    def reset(self):
        if self.cc is not None:
            self.cc.reset()
        self._carry_in = np.zeros((0, self.cfg.input_channels))
        self._carry_out = np.zeros((0, self.cfg.output_channels))
        self._latency = 0


def load(label=None, fs=44100, block_frames=None):
    """Load a plugin by label ('ladspa_dsp' or 'ladspa_dsp:<name>')."""
    for cfg in discover_plugins():
        if label is None or cfg.label == label:
            return Plugin(cfg, fs, block_frames)
    raise PluginError(f"no such plugin: {label}")
