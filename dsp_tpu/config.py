"""Global configuration for dsp_tpu.

The reference (dsp.h:42) fixes ``sample_t`` to C ``double``. On TPU, float64
is emulated and slow, so the compute dtype is configurable:

  * On CPU backends we default to float64 (bit-parity testing vs the C build).
  * On TPU we default to float32 (hot path; the -120 dBFS error budget is
    tracked per-kernel, with float64 fallbacks available via DSP_TPU_DTYPE).

Set the environment variable ``DSP_TPU_DTYPE`` to ``float32``/``float64`` to
override. x64 support is enabled in JAX at import so float64 host buffers and
CPU golden tests work regardless of the compute dtype.
"""

import os

import jax

# DSP_TPU_PLATFORM=cpu|tpu|... pins the JAX backend. Needed because some
# environments force a platform at interpreter start (sitecustomize
# registering a PJRT plugin), which silently overrides JAX_PLATFORMS; the
# config.update below wins over both.
_platform = os.environ.get("DSP_TPU_PLATFORM")
if _platform:
    jax.config.update("jax_platforms", _platform)

# Enable x64 so float64 is representable (reference sample_t is double,
# /root/reference/dsp.h:42). Compute dtype on TPU remains float32 by default.
jax.config.update("jax_enable_x64", True)

# TPU matmuls/einsums default to bf16 inputs; every matmul here is an audio
# mixing operation (remix matrices, matrix4_mb band masking, IIR state-space
# products) where bf16's ~8-bit mantissa puts errors at ~-40 dBFS directly in
# the signal path — far outside the -120 dBFS budget. These matrices are tiny
# (NxN channel mixes, 4x4 state blocks); highest precision costs nothing
# measurable while the real FLOPs live in FFTs and elementwise scans. Local
# `default_matmul_precision` guards in ops/iir.py remain for documentation
# and for callers that import kernels without going through config.
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the analog of the reference's FFTW wisdom
# (DSP_FFTW_WISDOM_PATH, util.c:474-500). Plans/compilations accumulate
# across runs. Unlike the reference (which only loads wisdom when the env var
# is set), caching is ON by default under the XDG cache dir: chains like
# matrix4 take minutes to compile on TPU and the CLI is a fresh process per
# run. Set DSP_TPU_COMPILE_CACHE=\"\" (empty) to disable.
_cache_dir = os.environ.get("DSP_TPU_COMPILE_CACHE")
if _cache_dir is None:
    _cache_dir = os.environ.get("DSP_FFTW_WISDOM_PATH")
if _cache_dir is None:
    _xdg = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    # key the default cache by host CPU capabilities: XLA:CPU AOT results
    # embed machine features, and loading one compiled on a different
    # machine type can SIGILL (observed cpu_aot_loader warnings when this
    # home dir migrates between dev hosts)
    def _machine_tag():
        import hashlib

        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        return hashlib.sha256(line.encode()).hexdigest()[:12]
        except OSError:
            pass
        import platform

        return platform.machine()

    _cache_dir = os.path.join(_xdg, "dsp_tpu", f"xla-{_machine_tag()}")
if _cache_dir:
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except OSError:
        pass  # read-only home: run without a persistent cache

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# Defaults mirroring /root/reference/dsp.h:34-40
DEFAULT_FS = 44100
DEFAULT_CHANNELS = 1
DEFAULT_BLOCK_FRAMES = 2048
DEFAULT_INPUT_BUF_RATIO = 64
DEFAULT_OUTPUT_BUF_RATIO = 8

_DTYPE_MAP = {
    "float32": jnp.float32,
    "float64": jnp.float64,
    "f32": jnp.float32,
    "f64": jnp.float64,
}


def _default_dtype():
    env = os.environ.get("DSP_TPU_DTYPE")
    if env:
        return _DTYPE_MAP[env.lower()]
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    if backend == "cpu":
        return jnp.float64
    return jnp.float32


class _Config:
    def __init__(self):
        self._sample_dtype = None

    @property
    def sample_dtype(self):
        if self._sample_dtype is None:
            self._sample_dtype = _default_dtype()
        return self._sample_dtype

    @sample_dtype.setter
    def sample_dtype(self, dt):
        self._sample_dtype = jnp.dtype(dt) if dt is not None else None

    @property
    def np_sample_dtype(self):
        return np.dtype(self.sample_dtype)


_cfg = _Config()


def sample_dtype():
    """The on-device compute dtype for audio samples."""
    return _cfg.sample_dtype


def set_sample_dtype(dt):
    _cfg.sample_dtype = dt


def np_sample_dtype():
    return _cfg.np_sample_dtype
