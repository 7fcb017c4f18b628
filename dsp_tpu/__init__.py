"""dsp_tpu — a TPU-native audio processing framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of bmc0/dsp
(reference: /root/reference). The user-specified effects chain (same CLI
grammar as the reference: selectors, blocks, @files, ! allow-fail) compiles
into a single jitted per-block pipeline:

  * IIR families (biquad.c, allpass.c, ewma.h) -> associative-scan linear
    recurrences (see dsp_tpu.ops.iir)
  * FIR / partitioned convolution (fir.c, fir_p.c, zita_convolver.cpp)
    -> batched rFFT overlap-save (see dsp_tpu.ops.fft_conv)
  * resample.c -> spectral rational resampler (see dsp_tpu.ops.resample_ops)
  * matrix4 / matrix4_mb -> control-rate scan + vectorized audio path

Host side (codecs, chain grammar, CLI, interactive transport) mirrors the
reference's public behavior so existing chains run unchanged.
"""

from dsp_tpu import config as config
from dsp_tpu.core.types import StreamInfo

__version__ = "0.1.0"

__all__ = ["StreamInfo", "config", "__version__"]
