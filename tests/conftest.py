"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real TPU hardware in CI is a single chip; multi-chip sharding is validated on
a forced-host-platform CPU mesh (the driver's dryrun_multichip does the same).

The harness environment pins JAX_PLATFORMS=axon (the TPU tunnel) and some
installed package registers a pytest plugin that imports jax before this
conftest runs, so setting env vars is not enough: jax.config.update() is the
authoritative override (it works any time before backend initialization).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def ref_dsp():
    """Path to the C reference binary for differential tests, or None."""
    import shutil

    for p in ("/tmp/refbuild/dsp/dsp",):
        if shutil.which(p) or os.path.exists(p):
            return p
    return None
