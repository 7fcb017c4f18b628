from dsp_tpu.core.types import StreamInfo

__all__ = ["StreamInfo"]
