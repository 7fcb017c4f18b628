"""Subprocess worker behind native/ladspa_dsp_bridge.c.

Protocol on stdin/stdout (binary): after the chain BUILDS (parse + effect
init; compilation happens lazily inside the first run exchange), the worker
writes the 4-byte magic ``DDSP`` (little-endian 0x50534444). Then, per run:
a uint32 LE frame count n (0 = shutdown), n * input_channels float32 LE
samples in; n * output_channels float32 LE samples out. Frames-in ==
frames-out with ZERO latency for constant-block-size hosts — the chain is
compiled for the first call's block size (dsp_tpu.plugin.Plugin); the first
run() call therefore blocks for the compile (the handshake only covers the
chain build).
"""

import struct
import sys

import numpy as np


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    name = argv[0] if len(argv) > 0 and argv[0] != "" else None
    rate = int(argv[1]) if len(argv) > 1 else 44100

    from dsp_tpu.plugin import Plugin, discover_plugins

    cfgs = discover_plugins()
    cfg = None
    for c in cfgs:
        if c.name == name:
            cfg = c
            break
    if cfg is None:
        sys.stderr.write(f"plugin_worker: no config named {name!r}\n")
        return 1
    plug = Plugin(cfg, fs=rate)

    stdin = sys.stdin.buffer
    stdout = sys.stdout.buffer
    stdout.write(b"DDSP")
    stdout.flush()
    in_ch = cfg.input_channels
    while True:
        hdr = stdin.read(4)
        if len(hdr) < 4:
            return 0
        (n,) = struct.unpack("<I", hdr)
        if n == 0:
            return 0
        raw = stdin.read(n * in_ch * 4)
        if len(raw) < n * in_ch * 4:
            return 0
        x = np.frombuffer(raw, dtype="<f4").reshape(n, in_ch)
        y = plug.run(x)
        stdout.write(np.ascontiguousarray(y, dtype="<f4").tobytes())
        stdout.flush()


if __name__ == "__main__":
    sys.exit(main())
