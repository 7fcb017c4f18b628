"""stats effect — placeholder registration (implementation pending)."""

from dsp_tpu.effects.base import EffectError, register_effect


def _init(ei, istream, selector, dir_, argv):
    raise EffectError(f"{argv[0]}: effect not yet implemented in this build")


register_effect("stats", """stats [-i] [-w cols] [ref_level]""", _init)
