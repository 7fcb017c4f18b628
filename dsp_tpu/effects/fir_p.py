"""fir_p effect — placeholder registration (implementation pending)."""

from dsp_tpu.effects.base import EffectError, register_effect


def _init(ei, istream, selector, dir_, argv):
    raise EffectError(f"{argv[0]}: effect not yet implemented in this build")


register_effect("fir_p", """fir_p [-a[offset[s|m|S]]] [input_options] [max_part_len] [file:][~/]filter_path|coefs:list[/list...]""", _init)
