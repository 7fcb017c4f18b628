"""The shipped example chains (examples/) vs the reference's.

The reference's flagship demos are its `examples/` chains
(/root/reference/examples). Two invariants:

1. Chain content parity: every example we ship must contain exactly the
   reference's chain lines (comments aside) — a user switching from the
   reference must be able to drop their chain files in unchanged.
2. The hardest composition — matrix4_2_4's nested block + `remix 0 1 0 1`
   + dual decorrelate (reference examples/matrix4_2_4:13-19) — renders
   byte-count-identical and <= -120 dBFS against the C build.
"""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_EXAMPLES = "/root/reference/examples"
REF_BIN = "/tmp/refbuild/dsp/dsp"

EXAMPLES = [
    "crossover_lr4_2kHz",
    "crossover_lr4_2kHz_riir_linphase",
    "matrix4_2_2",
    "matrix4_2_4",
    "matrix4_mb_2_2",
    "matrix4_mb_2_4",
    "matrix4_mb_direct_path_2_2",
    "matrix4_mb_direct_path_2_4",
]


def _chain_lines(path):
    with open(path) as f:
        return [ln.rstrip() for ln in f if ln.strip() and not ln.lstrip().startswith("#")]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_chain_matches_reference(name):
    ref = os.path.join(REF_EXAMPLES, name)
    if not os.path.exists(ref):
        pytest.skip("reference examples not available")
    assert _chain_lines(os.path.join(REPO, "examples", name)) == _chain_lines(ref)


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="C reference binary not built")
def test_matrix4_2_4_example_diff(tmp_path):
    """Render the full 6-channel matrix4_2_4 chain in both implementations."""
    spec = "sine@0:freq=35-16k/sine@1:freq=16k-35+0.5"
    base = ["-q", "-c", "2", "-t", "sgen", spec, "-o", "-t", "pcm", "-e", "double"]
    ref_out = str(tmp_path / "ref.raw")
    tpu_out = str(tmp_path / "tpu.raw")
    r = subprocess.run(
        [REF_BIN] + base + [ref_out, "gain", "-10", f"@{REF_EXAMPLES}/matrix4_2_4"],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr

    import contextlib
    import io

    from dsp_tpu.cli.main import main

    buf = io.StringIO()
    with contextlib.redirect_stderr(buf):
        rc = main(base + [tpu_out, "gain", "-10", f"@{REPO}/examples/matrix4_2_4"])
    assert rc == 0, buf.getvalue()
    a = np.fromfile(ref_out, np.float64)
    b = np.fromfile(tpu_out, np.float64)
    assert a.shape == b.shape
    err = np.abs(a - b).max()
    assert 20 * np.log10(max(err, 1e-300)) <= -120.0
