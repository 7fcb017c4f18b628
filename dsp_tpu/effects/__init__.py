"""Effect implementations. Importing this package registers all effects."""

from dsp_tpu.effects.base import (
    EFFECT_FLAG_ALIGN_BARRIER,
    EFFECT_FLAG_CH_DEPS_IDENTITY,
    EFFECT_FLAG_NO_DITHER,
    EFFECT_FLAG_OPT_REORDERABLE,
    EFFECT_FLAG_PLOT_MIX,
    Effect,
    EffectError,
    EffectInfo,
    get_effect_info,
    print_all_effects,
    register_effect,
)


def _register_builtins():
    # import order = registry order = the reference's effect table order
    # (effect.c:46-67), so `dsp -h` lists effects identically
    from dsp_tpu.effects import biquad  # noqa: F401
    from dsp_tpu.effects import gain  # noqa: F401
    from dsp_tpu.effects import crossfeed  # noqa: F401
    from dsp_tpu.effects import matrix4  # noqa: F401
    from dsp_tpu.effects import matrix4_mb  # noqa: F401
    from dsp_tpu.effects import remix  # noqa: F401
    from dsp_tpu.effects import st2ms  # noqa: F401
    from dsp_tpu.effects import delay  # noqa: F401
    from dsp_tpu.effects import resample  # noqa: F401
    from dsp_tpu.effects import fir  # noqa: F401
    from dsp_tpu.effects import fir_p  # noqa: F401
    from dsp_tpu.effects import zita_convolver  # noqa: F401
    from dsp_tpu.effects import hilbert  # noqa: F401
    from dsp_tpu.effects import decorrelate  # noqa: F401
    from dsp_tpu.effects import noise  # noqa: F401
    from dsp_tpu.effects import dither  # noqa: F401
    from dsp_tpu.effects import ladspa_host  # noqa: F401
    from dsp_tpu.effects import stats  # noqa: F401
    from dsp_tpu.effects import watch  # noqa: F401
    from dsp_tpu.effects import levels  # noqa: F401


_register_builtins()

from dsp_tpu.effects.base import reorder_registry as _ro  # noqa: E402

_ro()
