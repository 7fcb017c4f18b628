"""ladspa_host effect: apply a LADSPA plugin
(reference: /root/reference/ladspa_host.c).

The LADSPA ABI is declared directly with ctypes (no ladspa.h needed). The
plugin runs on the host; inside the jitted chain it executes through
jax.pure_callback, which is the TPU analog of the reference's host-side
plugin call. Mono plugins (<=1 audio input) are instantiated once per
selected channel (ladspa_host.c:48-93); control ports take defaults from
their hints when arguments are '-' or omitted.

Search path: LADSPA_PATH (colon-separated) when the module path is relative
(README.md:503-504).
"""

import ctypes
import os

import numpy as np

from dsp_tpu.core import log
from dsp_tpu.core.parse import num_bits_set, strtod
from dsp_tpu.core.types import StreamInfo
from dsp_tpu.effects.base import Effect, EffectError, register_effect

# --- LADSPA ABI (ladspa.h, stable since 2000) ---

LADSPA_Data = ctypes.c_float
LADSPA_Handle = ctypes.c_void_p

PORT_INPUT = 0x1
PORT_OUTPUT = 0x2
PORT_CONTROL = 0x4
PORT_AUDIO = 0x8

HINT_BOUNDED_BELOW = 0x1
HINT_BOUNDED_ABOVE = 0x2
HINT_TOGGLED = 0x4
HINT_SAMPLE_RATE = 0x8
HINT_LOGARITHMIC = 0x10
HINT_INTEGER = 0x20
HINT_DEFAULT_MASK = 0x3C0
HINT_DEFAULT_MINIMUM = 0x40
HINT_DEFAULT_LOW = 0x80
HINT_DEFAULT_MIDDLE = 0xC0
HINT_DEFAULT_HIGH = 0x100
HINT_DEFAULT_MAXIMUM = 0x140
HINT_DEFAULT_0 = 0x200
HINT_DEFAULT_1 = 0x240
HINT_DEFAULT_100 = 0x280
HINT_DEFAULT_440 = 0x2C0


class PortRangeHint(ctypes.Structure):
    _fields_ = [
        ("HintDescriptor", ctypes.c_int),
        ("LowerBound", LADSPA_Data),
        ("UpperBound", LADSPA_Data),
    ]


class Descriptor(ctypes.Structure):
    _fields_ = [
        ("UniqueID", ctypes.c_ulong),
        ("Label", ctypes.c_char_p),
        ("Properties", ctypes.c_int),
        ("Name", ctypes.c_char_p),
        ("Maker", ctypes.c_char_p),
        ("Copyright", ctypes.c_char_p),
        ("PortCount", ctypes.c_ulong),
        ("PortDescriptors", ctypes.POINTER(ctypes.c_int)),
        ("PortNames", ctypes.POINTER(ctypes.c_char_p)),
        ("PortRangeHints", ctypes.POINTER(PortRangeHint)),
        ("ImplementationData", ctypes.c_void_p),
        ("instantiate", ctypes.CFUNCTYPE(LADSPA_Handle, ctypes.c_void_p, ctypes.c_ulong)),
        ("connect_port", ctypes.CFUNCTYPE(None, LADSPA_Handle, ctypes.c_ulong, ctypes.POINTER(LADSPA_Data))),
        ("activate", ctypes.CFUNCTYPE(None, LADSPA_Handle)),
        ("run", ctypes.CFUNCTYPE(None, LADSPA_Handle, ctypes.c_ulong)),
        ("run_adding", ctypes.c_void_p),
        ("set_run_adding_gain", ctypes.c_void_p),
        ("deactivate", ctypes.CFUNCTYPE(None, LADSPA_Handle)),
        ("cleanup", ctypes.CFUNCTYPE(None, LADSPA_Handle)),
    ]


def _default_for_hint(h, fs):
    d = h.HintDescriptor & HINT_DEFAULT_MASK
    lo = h.LowerBound * (fs if h.HintDescriptor & HINT_SAMPLE_RATE else 1.0)
    hi = h.UpperBound * (fs if h.HintDescriptor & HINT_SAMPLE_RATE else 1.0)
    if d == HINT_DEFAULT_MINIMUM:
        return lo
    if d == HINT_DEFAULT_MAXIMUM:
        return hi
    if d == HINT_DEFAULT_0:
        return 0.0
    if d == HINT_DEFAULT_1:
        return 1.0
    if d == HINT_DEFAULT_100:
        return 100.0
    if d == HINT_DEFAULT_440:
        return 440.0
    log_scale = h.HintDescriptor & HINT_LOGARITHMIC
    if d == HINT_DEFAULT_LOW:
        return np.exp(np.log(lo) * 0.75 + np.log(hi) * 0.25) if log_scale else lo * 0.75 + hi * 0.25
    if d == HINT_DEFAULT_MIDDLE:
        return np.exp(np.log(lo) * 0.5 + np.log(hi) * 0.5) if log_scale else (lo + hi) * 0.5
    if d == HINT_DEFAULT_HIGH:
        return np.exp(np.log(lo) * 0.25 + np.log(hi) * 0.75) if log_scale else lo * 0.25 + hi * 0.75
    return 0.0


def _module_candidates(path, dir_, fs, nch):
    """Candidate paths to dlopen (ladspa_host.c:171-221): './'/'~/' paths
    resolve via construct_full_path relative to the sourcing effects file;
    otherwise the basename gets '.so' appended when missing and every
    LADSPA_PATH directory is tried (default /usr/local/lib/ladspa:
    /usr/lib/ladspa, in that order)."""
    from dsp_tpu.core.parse import construct_full_path

    if path[:2] in ("./", "~/"):
        return [construct_full_path(dir_, path, fs, nch)]
    if os.path.isabs(path):
        return [path]
    if ".so" not in os.path.basename(path):
        path = path + ".so"
    search = os.environ.get("LADSPA_PATH") or "/usr/local/lib/ladspa:/usr/lib/ladspa"
    # every candidate goes through construct_full_path so %r/%k/%c
    # substitution applies to search-path modules too (ladspa_host.c:208)
    return [construct_full_path(d, path, fs, nch) for d in search.split(":") if d]


class _Instance:
    def __init__(self, desc, fs):
        self.desc = desc
        self.handle = desc.instantiate(ctypes.byref(desc), fs)
        if not self.handle:
            raise EffectError("ladspa_host: instantiate failed")
        self.bufs = {}

    def connect(self, port, buf):
        self.bufs[port] = buf
        self.desc.connect_port(
            self.handle, port, buf.ctypes.data_as(ctypes.POINTER(LADSPA_Data))
        )

    def activate(self):
        if self.desc.activate:
            self.desc.activate(self.handle)

    def run(self, n):
        self.desc.run(self.handle, n)


class LadspaHostEffect(Effect):
    split_safe = False  # external plugin: opaque sequential state

    def __init__(self, name, istream, selector, dir_, module_path, label, controls):
        self.name = name
        self.istream = istream
        self.channel_selector = np.asarray(selector, dtype=bool).copy()
        n_sel_pre = num_bits_set(np.asarray(selector, dtype=bool))
        self.lib = None
        last_err = None
        for cand in _module_candidates(module_path, dir_, istream.fs, n_sel_pre):
            try:
                self.lib = ctypes.CDLL(cand)
                break
            except OSError as e:
                last_err = e
        if self.lib is None:
            raise EffectError(f"{name}: failed to load module: {last_err}")
        getter = self.lib.ladspa_descriptor
        getter.restype = ctypes.POINTER(Descriptor)
        getter.argtypes = [ctypes.c_ulong]
        desc = None
        i = 0
        while True:
            d = getter(i)
            if not d:
                break
            if d.contents.Label.decode() == label:
                desc = d.contents
                break
            i += 1
        if desc is None:
            raise EffectError(f"{name}: no such plugin label: {label}")
        self.desc = desc
        fs = istream.fs
        # classify ports
        self.audio_in = []
        self.audio_out = []
        self.control_in = []
        self.control_out = []
        for p in range(desc.PortCount):
            pd = desc.PortDescriptors[p]
            if pd & PORT_AUDIO:
                (self.audio_in if pd & PORT_INPUT else self.audio_out).append(p)
            else:
                (self.control_in if pd & PORT_INPUT else self.control_out).append(p)
        if not self.audio_out:
            raise EffectError(f"{name}: plugin has no audio outputs")
        n_sel = num_bits_set(self.channel_selector)
        self.sel_idx = np.flatnonzero(self.channel_selector)
        self.multi = len(self.audio_in) <= 1
        if not self.multi and len(self.audio_in) != n_sel:
            raise EffectError(
                f"{name}: channels mismatch: selected={n_sel} plugin_inputs={len(self.audio_in)}"
            )
        n_inst = n_sel if self.multi else 1
        out_per_inst = len(self.audio_out)
        n_out_total = out_per_inst * n_inst
        extra = n_out_total - n_sel
        # the output stream SHRINKS when the plugin has fewer audio outputs
        # than selected inputs (ladspa_host.c:301: in_ch + n_out - n_in)
        self.ostream = StreamInfo(fs, istream.channels + extra)
        self.flags = 0
        # control values (validation mirrors ladspa_host.c:304, 340-354)
        if len(controls) > len(self.control_in):
            raise EffectError(
                f"{name}: plugin expects {len(self.control_in)} controls, "
                f"got {len(controls)}"
            )
        self.ctrl_values = []
        for ci, p in enumerate(self.control_in):
            hint = desc.PortRangeHints[p]
            if ci < len(controls) and controls[ci] != "-":
                v, rest = strtod(controls[ci])
                if rest == controls[ci] or rest:
                    raise EffectError(f"{name}: failed to parse control: {controls[ci]}")
            else:
                if not (hint.HintDescriptor & HINT_DEFAULT_MASK):
                    pn = desc.PortNames[p].decode() if desc.PortNames[p] else str(p)
                    raise EffectError(
                        f"{name}: control \"{pn}\" has no default value and is not set"
                    )
                v = _default_for_hint(hint, fs)
            if hint.HintDescriptor & HINT_INTEGER:
                v = float(np.round(v))
            sr = fs if hint.HintDescriptor & HINT_SAMPLE_RATE else 1.0
            if hint.HintDescriptor & HINT_BOUNDED_BELOW and v < hint.LowerBound * sr:
                raise EffectError(f"{name}: control value out of range: {v:g}")
            if hint.HintDescriptor & HINT_BOUNDED_ABOVE and v > hint.UpperBound * sr:
                raise EffectError(f"{name}: control value out of range: {v:g}")
            self.ctrl_values.append(np.float32(v))
            log.verbose(
                "%s: info: control port %s = %g", name,
                desc.PortNames[p].decode() if desc.PortNames[p] else str(p), v,
            )
        self.instances = [_Instance(desc, fs) for _ in range(n_inst)]
        self._block = None

    def _bind(self, B):
        if self._block == B:
            return
        self._block = B
        for inst in self.instances:
            for ci, p in enumerate(self.control_in):
                buf = np.array([self.ctrl_values[ci]], dtype=np.float32)
                inst.connect(p, buf)
            for p in self.control_out:
                inst.connect(p, np.zeros(1, dtype=np.float32))
            for p in self.audio_in + self.audio_out:
                inst.connect(p, np.zeros(B, dtype=np.float32))
            inst.activate()

    def _run_host(self, x):
        """x: [B, n_sel] float32 -> [B, n_out_total]."""
        x = np.asarray(x, dtype=np.float32)
        B = x.shape[0]
        self._bind(B)
        outs = []
        if self.multi:
            for i, inst in enumerate(self.instances):
                if self.audio_in:
                    inst.bufs[self.audio_in[0]][:] = x[:, i]
                inst.run(B)
                for p in self.audio_out:
                    outs.append(inst.bufs[p].copy())
        else:
            inst = self.instances[0]
            for i, p in enumerate(self.audio_in):
                inst.bufs[p][:] = x[:, i]
            inst.run(B)
            for p in self.audio_out:
                outs.append(inst.bufs[p].copy())
        return np.stack(outs, axis=1)

    def step(self, state, x):
        import jax
        import jax.numpy as jnp
        from jax.experimental import io_callback

        B, C = x.shape
        n_sel = len(self.sel_idx)
        n_out_total = len(self.audio_out) * len(self.instances)
        xs = x[:, self.sel_idx].astype(jnp.float32)
        # io_callback(ordered=True), not pure_callback: the plugin call
        # mutates host-side plugin state, so XLA must never elide,
        # deduplicate, or replay it
        out = io_callback(
            self._run_host,
            jax.ShapeDtypeStruct((B, n_out_total), np.float32),
            xs,
            ordered=True,
        ).astype(x.dtype)
        # successive plugin outputs land at the selected channel positions;
        # surplus selected channels are DROPPED when the plugin has fewer
        # outputs, extra outputs are appended (ladspa_host.c:66-92)
        sel_rank = {int(k): i for i, k in enumerate(self.sel_idx)}
        cols = []
        for k in range(C):
            if k in sel_rank:
                pos = sel_rank[k]
                if pos < n_out_total:
                    cols.append(out[:, pos])
                # else: dropped (shrinking plugin)
            else:
                cols.append(x[:, k])
        for i in range(n_sel, n_out_total):
            cols.append(out[:, i])
        return state, jnp.stack(cols, axis=1)

    def channel_deps(self):
        n_in = self.istream.channels
        n_out = self.ostream.channels
        n_sel = len(self.sel_idx)
        n_out_total = len(self.audio_out) * len(self.instances)
        sel_rank = {int(k): i for i, k in enumerate(self.sel_idx)}
        deps = np.zeros((n_out, n_in), dtype=bool)
        o = 0
        for k in range(n_in):
            if k in sel_rank:
                if sel_rank[k] < n_out_total:
                    if self.multi:
                        deps[o, k] = True  # per-channel instance
                    else:
                        deps[o, self.sel_idx] = True
                    o += 1
            else:
                deps[o, k] = True
                o += 1
        for _ in range(n_sel, n_out_total):
            deps[o, self.sel_idx] = True
            o += 1
        return deps


def ladspa_host_effect_init(ei, istream, selector, dir_, argv):
    name = argv[0]
    if len(argv) < 3:
        raise EffectError(f"{name}: usage: {ei.usage}")
    return LadspaHostEffect(name, istream, selector, dir_, argv[1], argv[2], argv[3:])


register_effect(
    "ladspa_host",
    "ladspa_host module_path plugin_label [control ...]",
    ladspa_host_effect_init,
)
