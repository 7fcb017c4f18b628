"""bench.py must ALWAYS print its one-line JSON record: the driver runs it
under an external timeout and records only what reaches stdout (round 3 lost
the whole benchmark to rc=124 with no JSON line). The budget path is the
cheap, deterministic way to exercise the emit machinery end to end in CI:
with a 1-second budget every item is skipped and the line still prints."""

import json
import os
import subprocess
import sys


def test_budget_skip_still_emits_json():
    env = dict(
        os.environ,
        DSP_TPU_BENCH_BUDGET="1",
        DSP_TPU_PLATFORM="cpu",
        JAX_PLATFORMS="cpu",
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")],
        capture_output=True, text=True, timeout=300, env=env, cwd=root,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, r.stdout
    rec = json.loads(lines[-1])
    assert rec["unit"] == "x realtime"
    assert "northstar" in rec["suite"]
    # every perf/accuracy item is present even when skipped, so the driver's
    # record never silently loses a field
    for key in ("matrix4_mb_dbfs", "ladspa_bridge_us", "cli_60s_biquad", "ref_c"):
        assert key in rec["suite"]
