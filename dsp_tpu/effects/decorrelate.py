"""decorrelate effect — placeholder registration (implementation pending)."""

from dsp_tpu.effects.base import EffectError, register_effect


def _init(ei, istream, selector, dir_, argv):
    raise EffectError(f"{argv[0]}: effect not yet implemented in this build")


register_effect("decorrelate", """decorrelate [-m] [-s seed] [-d delay_min[s|m|S]] [-D delay_max[s|m|S]] [-f fc[k]] [-l rt60_lf[s|m|S]] [-h rt60_hf[s|m|S]] [stages]""", _init)
