"""matrix4_mb effect — placeholder registration (implementation pending)."""

from dsp_tpu.effects.base import EffectError, register_effect


def _init(ei, istream, selector, dir_, argv):
    raise EffectError(f"{argv[0]}: effect not yet implemented in this build")


register_effect("matrix4_mb", """matrix4_mb [options ...] [surround_level][/surround_level_rear]""", _init)
