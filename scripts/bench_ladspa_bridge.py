#!/usr/bin/env python
"""Measure the ladspa_dsp bridge's per-run() round trip as a LADSPA host sees
it (reference analog: ladspa_dsp.c:316-355, which runs in-process and has no
such trip). Our bridge (native/ladspa_dsp_bridge.c) pipes each block to a
worker subprocess, so the number that decides realtime viability is the
wall-clock of one run() call at the host's period size.

Acts as a minimal ctypes LADSPA host: dlopen the bridge .so, instantiate at
fs=44100 stereo, connect buffers, then time run(block) for blocks {64, 256,
2048}. Prints ONE JSON line:

  {"b64": {"mean_us": .., "p50_us": .., "p99_us": .., "budget_us": ..,
           "rt_ok": true}, "b256": {...}, "b2048": {...}}

budget_us is the realtime deadline (block/fs); rt_ok = p99 < budget.
Run with DSP_TPU_PLATFORM=cpu (the worker must use the CPU backend — a
LADSPA host is a realtime audio process, not a TPU job).
"""

import ctypes
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FS = 44100
CHANNELS = 2
BLOCKS = (64, 256, 2048)
WARMUP = 64
CALLS = 1024


def main():
    from dsp_tpu.effects.ladspa_host import Descriptor

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "native", "ladspa_dsp.so")
    if not os.path.exists(so):
        # build artifacts don't ship with the repo; try the one-file build
        import subprocess

        subprocess.run(["make", "-C", os.path.join(root, "native"),
                        "ladspa_dsp.so"], capture_output=True, timeout=120)
    if not os.path.exists(so):
        print(json.dumps({"error": "native/ladspa_dsp.so not built"}))
        return 0  # soft-skip: bench.py records the JSON either way

    cfgdir = tempfile.mkdtemp(prefix="ladspa_cfg_")
    with open(os.path.join(cfgdir, "config"), "w") as f:
        f.write("input_channels=2\noutput_channels=2\n"
                "effects_chain=gain -3 eq 1k 1.0 +3 lowshelf 90 0.7071s +4\n")
    os.environ["LADSPA_DSP_CONFIG_PATH"] = cfgdir
    os.environ["DSP_TPU_PLUGIN_PYTHON"] = sys.executable
    os.environ["DSP_TPU_PLATFORM"] = "cpu"

    lib = ctypes.CDLL(so)
    lib.ladspa_descriptor.restype = ctypes.POINTER(Descriptor)
    desc = lib.ladspa_descriptor(0).contents

    out = {}
    for block in BLOCKS:
        handle = desc.instantiate(ctypes.byref(desc), FS)
        bufs = []
        for p in range(CHANNELS * 2):
            buf = (ctypes.c_float * block)()
            if p < CHANNELS:
                for i in range(block):
                    buf[i] = 0.25
            desc.connect_port(handle, p, buf)
            bufs.append(buf)
        if desc.activate:
            desc.activate(handle)
        for _ in range(WARMUP):  # first call spawns worker + compiles chain
            desc.run(handle, block)
        times = []
        for _ in range(CALLS):
            t0 = time.perf_counter()
            desc.run(handle, block)
            times.append(time.perf_counter() - t0)
        desc.cleanup(handle)
        times.sort()
        budget = block / FS * 1e6
        us = lambda t: round(t * 1e6, 1)
        p99 = times[int(len(times) * 0.99)]
        out[f"b{block}"] = {
            "mean_us": us(sum(times) / len(times)),
            "p50_us": us(times[len(times) // 2]),
            "p99_us": us(p99),
            "budget_us": round(budget, 1),
            "rt_ok": p99 * 1e6 < budget,
        }
        print(f"# block {block}: {out[f'b{block}']}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
