"""zita_convolver is registered by dsp_tpu.effects.fir (shared UPOLS engine)."""

from dsp_tpu.effects import fir as _fir  # noqa: F401
