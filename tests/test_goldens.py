"""Checked-in golden renders for the fftw-gated effects.

The local C reference build lacks fftw, so resample/fir/fir_p/hilbert/
zita_convolver/matrix4_mb cannot be differentially tested against it
(test_ref_diff.py covers everything else). Their correctness was established
against analytic targets (PARITY.md; e.g. resample −235 dB SNR vs the >230 dB
claim in /root/reference/README.md:385-387, fir exact vs direct convolution).
The goldens in tests/goldens/*.npz freeze that verified behavior: any
regression in the FFT engines, the resampler's index-fold tables, or the
matrix4_mb band engine fails here.

Regenerate intentionally with:  DSP_TPU_MAKE_GOLDENS=1 pytest tests/test_goldens.py
(only after re-verifying accuracy against the analytic tests).
"""

import contextlib
import io
import math
import os

import numpy as np
import pytest

from golden_cases import CASES, write_filter_wavs

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")

# CPU f64 renders are deterministic for fixed library versions; the tolerance
# only needs to absorb FFT implementation drift across jax/XLA upgrades.
TOL_DBFS = -180.0


def render(tmp_path, channels, spec, chain):
    from dsp_tpu.cli.main import main

    filt = write_filter_wavs(str(tmp_path))  # noqa: F841  (files referenced via %d)
    chain = [c.replace("%d", str(tmp_path)) for c in chain]
    out_raw = str(tmp_path / "out.raw")
    args = ["-q"]
    if channels != 1:
        args += ["-c", str(channels)]
    args += ["-t", "sgen", spec, "-o", "-t", "pcm", "-e", "double", out_raw]
    args += chain
    buf_o, buf_e = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(buf_o), contextlib.redirect_stderr(buf_e):
        rc = main(args)
    assert rc == 0, f"render failed: {buf_e.getvalue()}"
    return np.fromfile(out_raw, dtype=np.float64)


@pytest.mark.parametrize("name,ch,spec,chain", CASES, ids=[c[0] for c in CASES])
def test_golden(tmp_path, name, ch, spec, chain):
    got = render(tmp_path, ch, spec, chain)
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        if os.environ.get("DSP_TPU_MAKE_GOLDENS"):
            os.makedirs(GOLDEN_DIR, exist_ok=True)
            np.savez_compressed(path, y=got)
            pytest.skip(f"golden written: {path}")
        pytest.fail(f"golden missing: {path} (set DSP_TPU_MAKE_GOLDENS=1)")
    want = np.load(path)["y"]
    assert got.shape == want.shape, f"{name}: frame count changed {got.shape} vs {want.shape}"
    err = float(np.abs(got - want).max()) if got.size else 0.0
    err_db = 20 * math.log10(err) if err > 0 else -np.inf
    assert err_db <= TOL_DBFS, f"{name}: drifted {err_db:.1f} dBFS from golden"
