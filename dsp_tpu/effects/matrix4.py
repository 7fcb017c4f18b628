"""matrix4 effect: 2-to-4 (or 2-to-6 with direct_path) active matrix
surround upmixer (reference: /root/reference/matrix4.c).

TPU decomposition of the reference's per-sample loop (matrix4.c:100-248):

  * audio-rate pre-path (vectorized): 500 Hz HP + 5 kHz LP band-limit
    (biquad scans), |.| and ^2 envelope EWMAs (affine associative scans)
  * control path at fs/32: one lax.scan over the decimated envelope stream
    running the event engine + matrix computation (dsp_tpu.ops.m4_engine)
    and the parabolic-2x interpolator windows (matrix4_common.h:348-373)
  * audio-rate post-path (vectorized): lookahead-delayed signal x
    interpolated matrix coefficients; dynamic shelving / lowpass as
    first-order affine scans with time-varying input terms; phase flip as a
    2x2 time-varying affine scan

Config options (status/matrix/shelf/lowpass/contour_pwrcmp/phase_flip/
signal/direct_path/rear_event_mask/surround_delay) follow
matrix4_config_init (matrix4_common.c:74-356).
"""

import numpy as np

from dsp_tpu.core import log
from dsp_tpu.core.parse import ParseError, num_bits_set, parse_freq, parse_len, strtod
from dsp_tpu.core.types import StreamInfo
from dsp_tpu.effects import biquad as bq
from dsp_tpu.effects.base import Effect, EffectError, register_effect
from dsp_tpu.ops import iir
from dsp_tpu.ops import m4_engine as m4

FADE_TIME = 500.0
CS_INTERP_DELAY_FRAMES = 3 * m4.DOWNSAMPLE_FACTOR
N_INTERP = 16  # ll lr rl rr lsl lsr rsl rsr gss gsl gfs gfl pf0 pf1 amb dir


class Matrix4Config:
    def __init__(self):
        self.status_type = "none"
        self.surr_delay_frames = 0
        self.lookahead_frames = 0
        self.shelf_mult = float(np.sqrt(0.5))
        self.shelf_f0 = 500.0
        self.contour_pwrcmp = 1.0
        self.lowpass_f0 = 6000.0
        self.rear_ev_mask = 1.0
        self.do_phase_flip = True
        self.do_direct_path = False
        self.do_dpwr_decouple = True
        self.enable_signal = False
        self.fb_type = "elliptic"
        self.fb_stop = [35.0, 50.0]
        self.freq_mask = 0.0
        self.matrix_ver = "v4"
        self.matrix_param = 0.5
        self.surr_mult = [float(np.sqrt(0.5)), 1.0]
        self.c0 = 0
        self.c1 = 1


def _parse_bool(name, opt, arg):
    if arg is None or arg == "" or "true".startswith(arg.lower()):
        return True
    if "false".startswith(arg.lower()):
        return False
    raise EffectError(f"{name}: unrecognized argument to option '{opt}': {arg}")


def _set_fb_stop_default(cfg):
    if cfg.fb_type == "butterworth":
        cfg.fb_stop = [0.0, 0.0]
    elif cfg.fb_type in ("chebyshev1", "chebyshev2"):
        cfg.fb_stop = [25.0, 0.0]
    else:
        cfg.fb_stop = [35.0, 50.0]


def matrix4_config_init(name, istream, selector, argv, is_mb):
    """Port of matrix4_config_init (matrix4_common.c:74-356)."""
    if istream.fs < 32000:
        raise EffectError(f"{name}: input sample rate out of range")
    if num_bits_set(selector) != 2:
        raise EffectError(f"{name}: input channels must be 2")
    cfg = Matrix4Config()
    if log.loglevel(log.LL_VERBOSE):
        cfg.status_type = "bars"
    cfg.surr_delay_frames = m4.time_to_frames(15.0, istream.fs)
    lookahead = 0.9 if is_mb else 0.6
    cfg.lookahead_frames = m4.time_to_frames(
        m4.EVENT_SAMPLE_TIME + m4.RISE_TIME_FAST * lookahead, istream.fs
    )
    cfg.contour_pwrcmp = 1.0
    cfg.rear_ev_mask = 0.3 if is_mb else 1.0
    surr_level = [None, None]
    for i, a in enumerate(argv[1:]):
        v, rest = strtod(a)
        if rest == "" or rest.startswith("/"):
            if rest != a:
                if a[0] != "/":
                    surr_level[0] = v
            if rest.startswith("/"):
                v2, rest2 = strtod(rest[1:])
                if rest2 or rest[1:] == "":
                    raise EffectError(f"{name}: failed to parse surround_level_rear")
                surr_level[1] = v2
            elif surr_level[0] is not None:
                surr_level[1] = min(surr_level[0] + 6.02, 0.0)
            if i != len(argv) - 2:
                raise EffectError(f"{name}: usage: surround level must be the last argument")
        else:
            for opt in a.split(","):
                opt = opt.strip()
                if not opt:
                    continue
                key, _, val = opt.partition("=")
                has_val = "=" in opt
                if key in ("status", "show_status"):
                    if not has_val or val in ("", "bars"):
                        cfg.status_type = "bars"
                    elif val == "text":
                        cfg.status_type = "text"
                    elif val == "none":
                        cfg.status_type = "none"
                    else:
                        raise EffectError(f"{name}: unrecognized status type: {val}")
                elif key == "matrix":
                    if not val:
                        raise EffectError(f"{name}: option requires argument: {opt}")
                    mv, _, mp = val.partition(":")
                    if mv == "v1":
                        cfg.matrix_ver = "v1"
                    elif mv == "v2":
                        cfg.matrix_ver, cfg.matrix_param = "v4", 0.0
                    elif mv == "v3":
                        cfg.matrix_ver, cfg.matrix_param = "v4", 1.0
                    elif mv == "v4":
                        cfg.matrix_ver, cfg.matrix_param = "v4", 0.5
                        if mp:
                            p, rest2 = strtod(mp)
                            if rest2 or not (0.0 <= p <= 1.0):
                                raise EffectError(f"{name}: matrix: v4: bad param")
                            cfg.matrix_param = p
                    else:
                        raise EffectError(f"{name}: unrecognized matrix identifier: {val}")
                elif key == "shelf":
                    if not val:
                        raise EffectError(f"{name}: option requires argument: {opt}")
                    g, _, rest_args = val.partition(":")
                    f0s, _, pw = rest_args.partition(":")
                    if g:
                        if g == "none":
                            cfg.shelf_mult = 1.0
                        else:
                            gv, r2 = strtod(g)
                            if r2:
                                raise EffectError(f"{name}: shelf: bad gain")
                            if gv > 0.0:
                                log.error("%s: warning: shelf gain probably shouldn't be greater than 0dB", name)
                            cfg.shelf_mult = 10.0 ** (gv / 20.0)
                    if f0s:
                        try:
                            cfg.shelf_f0 = parse_freq(f0s)
                        except ParseError:
                            raise EffectError(f"{name}: shelf: bad f0")
                        if not (100.0 <= cfg.shelf_f0 <= 6000.0):
                            raise EffectError(f"{name}: shelf: f0 out of range")
                    if pw:
                        pv, r2 = strtod(pw)
                        if r2 or not (0.0 <= pv <= 1.0):
                            raise EffectError(f"{name}: shelf: bad pwrcmp")
                        cfg.contour_pwrcmp = pv
                elif key == "lowpass":
                    if not val:
                        raise EffectError(f"{name}: option requires argument: {opt}")
                    if val == "none":
                        cfg.lowpass_f0 = 0.0
                    else:
                        try:
                            cfg.lowpass_f0 = parse_freq(val)
                        except ParseError:
                            raise EffectError(f"{name}: lowpass: bad f0")
                        if not (0.0 <= cfg.lowpass_f0 < istream.fs / 2.0):
                            raise EffectError(f"{name}: lowpass: f0 out of range")
                elif key == "contour_pwrcmp":
                    pv, r2 = strtod(val)
                    if not val or r2 or not (0.0 <= pv <= 1.0):
                        raise EffectError(f"{name}: bad {key}")
                    cfg.contour_pwrcmp = pv
                elif key == "phase_flip":
                    cfg.do_phase_flip = _parse_bool(name, key, val if has_val else None)
                elif key == "signal":
                    cfg.enable_signal = _parse_bool(name, key, val if has_val else None)
                elif key == "direct_path":
                    cfg.do_direct_path = _parse_bool(name, key, val if has_val else None)
                elif key == "rear_event_mask":
                    pv, r2 = strtod(val)
                    if not val or r2 or not (0.0 <= pv <= 100.0):
                        raise EffectError(f"{name}: bad {key}")
                    cfg.rear_ev_mask = pv
                elif key == "surround_delay":
                    if not val:
                        raise EffectError(f"{name}: option requires argument: {opt}")
                    try:
                        cfg.surr_delay_frames = parse_len(val, istream.fs)
                    except ParseError:
                        raise EffectError(f"{name}: bad surround_delay")
                elif key == "filter_type":
                    if not is_mb:
                        log.error("%s: warning: ignoring option: %s", name, opt)
                        continue
                    if not val:
                        raise EffectError(f"{name}: option requires argument: {opt}")
                    ft, _, stops = val.partition(":")
                    if ft not in ("butterworth", "chebyshev1", "chebyshev2", "elliptic"):
                        raise EffectError(f"{name}: unrecognized filter bank type: {val}")
                    cfg.fb_type = ft
                    _set_fb_stop_default(cfg)
                    if stops:
                        s0, _, s1 = stops.partition(":")
                        v0, r2 = strtod(s0)
                        if r2:
                            raise EffectError(f"{name}: bad stop_dB")
                        if ft in ("chebyshev1", "chebyshev2"):
                            if v0 < 10.0:
                                raise EffectError(f"{name}: stopband attenuation must be at least 10dB")
                            cfg.fb_stop[0] = v0
                        elif ft == "elliptic":
                            cfg.fb_stop[0] = v0
                            if s1:
                                v1, r3 = strtod(s1)
                                if r3:
                                    raise EffectError(f"{name}: bad stop_dB")
                                cfg.fb_stop[1] = v1
                            else:
                                cfg.fb_stop[1] = v0
                            if cfg.fb_stop[0] < 20.0 or cfg.fb_stop[1] < 20.0:
                                raise EffectError(f"{name}: stopband attenuation must be at least 20dB")
                elif key == "freq_mask":
                    if not is_mb:
                        log.error("%s: warning: ignoring option: %s", name, opt)
                        continue
                    pv, r2 = strtod(val)
                    if not val or r2 or not (0.0 <= pv <= 1.0):
                        raise EffectError(f"{name}: bad {key}")
                    cfg.freq_mask = pv
                elif key == "lookahead":
                    pv, r2 = strtod(val)
                    if not val or r2 or not (0.0 <= pv <= 2.0):
                        raise EffectError(f"{name}: bad {key}")
                    cfg.lookahead_frames = m4.time_to_frames(
                        m4.EVENT_SAMPLE_TIME + m4.RISE_TIME_FAST * pv, istream.fs
                    )
                elif key == "dpwr_decouple":
                    cfg.do_dpwr_decouple = _parse_bool(name, key, val if has_val else None)
                else:
                    raise EffectError(f"{name}: unrecognized option: {opt}")
    cfg.surr_mult[0] = float(np.sqrt(0.5)) if surr_level[0] is None else 10.0 ** (surr_level[0] / 20.0)
    cfg.surr_mult[1] = 1.0 if surr_level[1] is None else 10.0 ** (surr_level[1] / 20.0)
    if cfg.surr_mult[0] > 1.0 or cfg.surr_mult[1] > 1.0:
        log.error("%s: warning: surround levels probably shouldn't be greater than 0dB", name)
    if cfg.surr_mult[0] > cfg.surr_mult[1]:
        log.error("%s: warning: surround_level_rear probably shouldn't be lower than surround_level", name)
    sel = np.flatnonzero(np.asarray(selector, dtype=bool))
    cfg.c0, cfg.c1 = int(sel[0]), int(sel[1])
    return cfg


class Matrix4Effect(Effect):
    # adaptive event engine: multi-second ring buffers and discrete
    # decisions make zero-state priming content-dependent, not bounded
    split_safe = False

    def __init__(self, name, istream, selector, argv):
        cfg = matrix4_config_init(name, istream, selector, argv, is_mb=False)
        self.cfg = cfg
        self.name = name
        self.istream = istream
        n_extra = 4 if cfg.do_direct_path else 2
        self.ostream = StreamInfo(istream.fs, istream.channels + n_extra)
        self.channel_selector = np.asarray(selector, dtype=bool).copy()
        self.block_quantum = m4.DOWNSAMPLE_FACTOR
        fs = istream.fs
        fs_ds = fs / m4.DOWNSAMPLE_FACTOR
        self.ev_params = m4.make_event_params(fs_ds, 1.0, 0.7, cfg.rear_ev_mask)
        # band-limit filters (matrix4.c:402-403)
        hp = bq.normalize(*bq.design(bq.HIGHPASS, fs, 500.0, 0.5))
        lp = bq.normalize(*bq.design(bq.LOWPASS, fs, 5000.0, 0.5))
        self.bp_c = np.stack([np.array(hp), np.array(hp), np.array(lp), np.array(lp)], axis=1)
        self.g_env = float(m4.ewma_g(fs, m4.ENV_SMOOTH_TIME))
        # dynamic shelf params (matrix4.c:79-87)
        self.shelf = self._dyn_shelf_params(fs, cfg.shelf_f0)
        self.lowpass = self._dyn_shelf_params(fs, cfg.lowpass_f0 if cfg.lowpass_f0 > 0 else 6000.0)
        if cfg.lowpass_f0 > 0.0:
            lp_f = (fs + cfg.lowpass_f0) / 2.0
            self.lowpass_mult = float(np.sqrt(1.0 / (1.0 + (lp_f * lp_f / (cfg.lowpass_f0 * cfg.lowpass_f0)))))
        else:
            self.lowpass_mult = 1.0
        self.shelf_mult = cfg.shelf_mult
        # smf for background cs weight (matrix4.c:409-410)
        self.bg_g0 = float(1.0 - np.exp(-1.0 / (fs_ds * (m4.ACCOM_TIME * 2.0 / 1000.0 / 2.1972))))
        self.bg_c0 = 0.01 * 4.0
        self.bg_c1 = 1e-6 * 4.0
        # phase flip params (matrix4_common.c:469-473)
        self.pf_c0 = 0.667829372575655
        self.pf_c1 = float(np.log(0.0005 * (44100.0 / fs)))
        self.fade_frames = m4.time_to_frames(FADE_TIME, fs)
        self.len = cfg.lookahead_frames + CS_INTERP_DELAY_FRAMES
        self.surr_delay_frames = cfg.surr_delay_frames
        self._statusline = None
        self._signal_flag = False

    def _bp_plan(self, block):
        """Blocked-kernel plan for the hp500+lp5k band-limit cascade (f32
        path). L=128 when the block fits the chunked kernel, else L=1 (the
        same kernel degenerates into a per-sample Kogge-Stone df scan)."""
        L = iir.BLOCKED_L if (block % iir.BLOCKED_L == 0 and block >= 2 * iir.BLOCKED_L) else 1
        plans = getattr(self, "_bp_plans", None)
        if plans is None:
            plans = self._bp_plans = {}
        if L not in plans:
            plans[L] = iir.CascadeBlockedPlan([self.bp_c[:, :2], self.bp_c[:, 2:]], L=L)
        return plans[L]

    @staticmethod
    def _dyn_shelf_params(fs, f0):
        w0 = 2 * np.pi * f0 / fs
        sin_w0 = np.sin(w0)
        cos_w0_p1 = np.cos(w0) + 1.0
        norm = 1.0 / (sin_w0 + cos_w0_p1)
        c2 = (sin_w0 - cos_w0_p1) * norm
        # plain floats: weak-typed under f32 compute (TPU)
        return {"sin_w0": float(sin_w0), "cos_w0_p1": float(cos_w0_p1), "norm": float(norm), "c2": float(c2)}

    def state0(self):
        p = self.ev_params
        init_interp = np.zeros(N_INTERP)
        init_interp[0] = init_interp[3] = 1.0  # ll, rr identity-ish startup
        # C initializes BOTH interps from phase_flip_pos_rs of the zero
        # axes = 0.5 (matrix4.c:412-414)
        pf0 = np.exp(0.5 * (self.pf_c1 - self.pf_c0) + self.pf_c0) - 1.0
        pf1 = pf0
        init_interp[12], init_interp[13] = pf0, pf1
        init_interp[14] = 1.0  # m_surr_amb
        st = {
            "ev": m4.make_event_state(p),
            # lo parts of the double-float control state (used when the chain
            # runs float32; passed through untouched under float64)
            "ev_lo": m4.make_event_state_lo(p),
            "env_m_lo": np.zeros(8, dtype=np.float32),
            "bg_cs_lo": np.zeros(2, dtype=np.float32),
            "bp_m": np.zeros((4, 2)),  # band-limit biquad memories (f64 path)
            # f32 path: hp+lp cascade as one blocked-kernel state (hi, lo)
            # in the coupled basis ([2, lanes, 4], iir.CascadeBlockedPlan)
            "bpc": np.zeros((2, 2, 4)),
            "env_m": np.zeros(8),  # envelope EWMAs
            "bg_cs": np.array([1.0, 1.0]),  # smf state (m0, m1)
            "interp_y": np.tile(init_interp, (4, 1)),  # parabolic window
            "interp_c": np.stack([init_interp, np.zeros(N_INTERP), np.zeros(N_INTERP)]),
            "buf": np.zeros((self.len, 2)),  # lookahead delay
            "shelf_m": np.zeros(4),  # front L/R, surr L/R dyn shelf memories
            "lp_m": np.zeros(4),
            "pf_m": np.zeros((2, 2)),  # ap1 (i0, o0) per surround channel
            "fade_p": np.int64(0),
            "disable": np.bool_(False),
        }
        return st

    def state_for_block(self, B):
        st = self.state0()
        # per-block steering display data, threaded through the state so the
        # host never touches a traced array (read by host_update)
        st["aux"] = np.zeros((B // m4.DOWNSAMPLE_FACTOR, 4))
        return st

    def signal(self):
        # the reference only installs the handler when the `signal` option
        # is given (matrix4.c:396): 's'/SIGUSR2 must not toggle otherwise
        if self.cfg.enable_signal:
            self._signal_flag = True
        return None

    # --- core block processing ---

    def step(self, state, x):
        ctl, vals, auxs = self._control(state, x)
        new_state, y = self._audio(state, x, vals, ctl)
        if isinstance(state, dict) and "aux" in state:
            new_state["aux"] = auxs.astype(state["aux"].dtype)
        return new_state, y

    def _control(self, state, x):
        """Control path: band-limit filters, envelope followers, the fs/32
        event-engine scan and the parabolic interpolator — everything that
        *decides* the per-sample matrix values `vals [B, N_INTERP]`.

        Split from _audio so tests can isolate precision effects: pin vals
        from a float64 run and replay the audio path alone in float32
        (tests/test_f32_accuracy.py::TestMatrix4ControlSplit)."""
        import jax
        import jax.numpy as jnp

        from dsp_tpu.ops import dfx as dx

        B = x.shape[0]
        D = m4.DOWNSAMPLE_FACTOR
        Nc = B // D
        cfg = self.cfg
        c0, c1 = cfg.c0, cfg.c1
        s0 = x[:, c0]
        s1 = x[:, c1]
        use_df = x.dtype == jnp.float32

        # band-limit via biquad cascade (hp then lp per channel)
        lanes = jnp.stack([s0, s1], axis=1)
        if use_df:
            # the envelopes feed threshold comparisons in the event engine, so
            # the band-limit filters must hold df accuracy too: run the hp+lp
            # cascade through the blocked kernel (host f64 matrix powers,
            # compensated f32) — an L=1 plan serves blocks the 128-chunk
            # kernel can't take. The output stays an uncollapsed (hi, lo)
            # pair: collapsing to f32 here leaves ~2e-7 correlated filter
            # error that the engine amplifies to ~1e-6 on the steering axes.
            bpc_new, (ybp_hi, ybp_lo) = iir.lti_blocked_df(
                self._bp_plan(B), state["bpc"], lanes
            )
            y_bp = dx.DF(ybp_hi, ybp_lo)
            bp_m = state["bp_m"]
        else:
            cbp = jnp.asarray(self.bp_c, dtype=x.dtype)
            A_hp, B_hp, c0_hp = iir.biquad_coeffs_to_ss(cbp[:, :2])
            A_lp, B_lp, c0_lp = iir.biquad_coeffs_to_ss(cbp[:, 2:])
            st_hp, y_hp = iir.biquad_scan(A_hp, B_hp, c0_hp, state["bp_m"][:2], lanes)
            st_lp, y_bp = iir.biquad_scan(A_lp, B_lp, c0_lp, state["bp_m"][2:], y_hp)
            bp_m = jnp.concatenate([st_hp, st_lp], axis=0)
            bpc_new = state["bpc"]
        l_bp = y_bp[:, 0]
        r_bp = y_bp[:, 1]

        # envelopes: 8 EWMAs over [B] (abs l, abs r, abs sum, abs diff, squares)
        # Under float32 the whole control path — these envelope accumulators,
        # the event-engine scan and its parameters/state — runs in double-float
        # (hi, lo f32 pairs, dsp_tpu.ops.dfx): a plain f32 control path drifts
        # and jitters the event decisions to ~-95 dBFS free-running vs the C
        # double build; df restores <= -120 (the audio path is fine in f32).
        sum_ = l_bp + r_bp
        diff = l_bp - r_bp
        env_in = dx.stack(
            [dx.absolute(l_bp), dx.absolute(r_bp), dx.absolute(sum_), dx.absolute(diff),
             l_bp * l_bp, r_bp * r_bp, sum_ * sum_, diff * diff], axis=1,
        )  # [B, 8] (DF under f32)
        env_m, env_m_lo, envs = m4.env_ewma_scan(
            state["env_m"].astype(x.dtype),
            state["env_m_lo"] if use_df else None,
            self.g_env, env_in, use_df,
        )
        # decimate: control ticks at samples D-1, 2D-1, ...
        env_ds = envs[D - 1 :: D]  # [Nc, 8] (DF under f32)

        # fade multiplier at each tick (fade_mult, matrix4_common.h:265-280;
        # fade_p counts down per audio sample)
        tick_i = jnp.arange(Nc) * D + (D - 1)
        fade_p_at = jnp.maximum(state["fade_p"] - tick_i, 0)
        dis = state["disable"]
        posf = fade_p_at.astype(x.dtype) / self.fade_frames
        fade_lin = jnp.where(dis, posf, 1.0 - posf)
        fade_sm = (1.0 - jnp.cos(fade_lin * np.pi)) * 0.5
        fade_mult_ticks = jnp.where(fade_p_at > 0, fade_sm, (~dis).astype(x.dtype))

        # control-rate scan (params cast so f64 scalars don't leak into the
        # f32 carries on TPU — m4_engine.cast_params; df=exact (hi,lo) pairs)
        p = m4.cast_params(self.ev_params, x.dtype, df=use_df)
        calc = m4.calc_matrix_coefs_v4 if cfg.matrix_ver == "v4" else m4.calc_matrix_coefs_v1

        # The scan body is ONLY the sequential state machines: the event
        # engine and the background-weight smf. Everything downstream of the
        # per-tick engine outputs (the matrix-coefficient computation with its
        # DF transcendentals, phase flip, direct-path pan, the parabolic
        # interpolator windows) is a pure per-tick function, so it is hoisted
        # out of the scan and evaluated as vector ops over all Nc ticks at
        # once — on TPU this removes hundreds of serialized ops per tick from
        # the sequential chain (round-4 bench: the in-scan version halved
        # matrix4 throughput) and shrinks the compiled loop body.
        def control_step(carry, inp):
            ev, bg = carry
            e8 = inp
            env = {"l": e8[0], "r": e8[1], "sum": e8[2], "diff": e8[3]}
            pwr = {"l": e8[4], "r": e8[5], "sum": e8[6], "diff": e8[7]}
            ev, out = m4.event_step(p, ev, env, pwr, 1.0)
            w_step = m4.smoothstep(out["ax_cs"] * (-2.0 / m4.M_PI_4))
            bg, w1 = m4.smf_asym_run(bg, w_step + 1.0, self.bg_g0, self.bg_c0, self.bg_c1)
            keep = ("ax_lr", "ax_cs", "ax_ev_lr", "ax_ev_cs",
                    "ax_dpwr_lr", "ax_dpwr_cs", "pwrcmp_factor")
            return (ev, bg), ({k: out[k] for k in keep}, w1)

        if use_df:
            ev0 = dx.wrap_dict(state["ev"], state["ev_lo"])
            bg0 = (
                dx.DF(state["bg_cs"][0], state["bg_cs_lo"][0]),
                dx.DF(state["bg_cs"][1], state["bg_cs_lo"][1]),
            )
        else:
            ev0 = state["ev"]
            bg0 = (state["bg_cs"][0], state["bg_cs"][1])
        (ev_new, bg_new), (out, w1s) = jax.lax.scan(control_step, (ev0, bg0), env_ds)
        if use_df:
            ev_new, ev_lo_new = dx.split_dict(ev_new, set(state["ev_lo"]))
            bg_lo_new = jnp.stack([bg_new[0].lo, bg_new[1].lo])
            bg_new = (bg_new[0].hi, bg_new[1].hi)
        else:
            ev_lo_new = state["ev_lo"]
            bg_lo_new = state["bg_cs_lo"]

        # --- hoisted per-tick coefficient computation, vectorized over [Nc].
        # Under f32 the engine outputs are DF and the whole computation below
        # runs in df (the calc_* functions are dx-generic); vals collapse to
        # f32 only at the interp insert.
        fade = fade_mult_ticks
        w = w1s - 1.0
        surr_mult = (w * cfg.surr_mult[1] + (1.0 - w) * cfg.surr_mult[0]) * fade
        ct_pcf = cfg.contour_pwrcmp * out["pwrcmp_factor"]
        shelf_ct0 = w + (1.0 - w) * self.shelf_mult
        shelf_ct1 = (shelf_ct0 - 1.0) * ct_pcf + 1.0
        lp_ct0 = w + (1.0 - w) * self.lowpass_mult
        # non-integer power: f32 suffices (smooth gain modulator, no
        # accumulation); lift back for the df products around it
        pw_base = dx.maximum(ct_pcf, m4.DBL_MIN)
        pw = jnp.power(dx.value(pw_base), 1.0 / self.shelf_mult)
        if dx.is_df(ct_pcf):
            pw = dx.lift(pw)
        lp_ct1 = (lp_ct0 - 1.0) * pw + 1.0
        dp_lr = out["ax_dpwr_lr"] if cfg.do_dpwr_decouple else out["ax_lr"]
        dp_cs = out["ax_dpwr_cs"] if cfg.do_dpwr_decouple else out["ax_cs"]
        m, rets = calc(
            out["ax_lr"], out["ax_cs"], dp_lr, dp_cs,
            surr_mult, cfg.surr_mult[1] * fade, cfg.matrix_param,
            [surr_mult * shelf_ct1, surr_mult * shelf_ct1 * lp_ct1],
        )
        g_surr_shelf = shelf_ct0 / shelf_ct1 * rets[0][1]
        g_surr_lp = lp_ct0 / lp_ct1 * rets[1][1] / dx.maximum(rets[0][1], m4.DBL_MIN)
        g_front_shelf = rets[0][0]
        g_front_lp = rets[1][0] / rets[0][0]
        pf_pos = m4.phase_flip_pos_rs(out["ax_lr"], out["ax_cs"])
        pf0 = m4.phase_flip_ap1_c0(self.pf_c0, self.pf_c1, 1.0 - pf_pos)
        pf1 = m4.phase_flip_ap1_c0(self.pf_c0, self.pf_c1, pf_pos)
        amb, dire = m4.surr_direct_pan(out["ax_lr"], out["ax_cs"])
        vals_ticks = dx.value(dx.stack([
            m["ll"], m["lr"], m["rl"], m["rr"],
            m["lsl"], m["lsr"], m["rsl"], m["rsr"],
            g_surr_shelf, g_surr_lp, g_front_shelf, g_front_lp,
            pf0, pf1, amb, dire,
        ], axis=1))  # [Nc, N_INTERP]
        auxs = dx.value(dx.stack(
            [out["ax_lr"], out["ax_cs"], out["ax_ev_lr"], out["ax_ev_cs"]], axis=1
        ))  # [Nc, 4]

        # parabolic 2x interpolator insert (matrix4_common.h:358-367): the
        # window at tick t is [vals[t-3], vals[t-2], vals[t-1], vals[t]] with
        # negative indices from the carried interp_y — pure shifts, so the
        # per-tick window update vectorizes as four slices of one extended
        # array
        ext = jnp.concatenate(
            [state["interp_y"].astype(x.dtype)[1:], vals_ticks], axis=0
        )  # [Nc + 3, N_INTERP]
        iy0, iy1 = ext[:Nc], ext[1 : Nc + 1]
        iy2, iy3 = ext[2 : Nc + 2], ext[3 : Nc + 3]
        ia = iy2 - iy0
        ics = jnp.stack(
            [0.5 * iy1 + 0.25 * (iy0 + iy2), 0.5 * ia, 0.25 * (iy3 - iy1 - ia)], axis=1
        )  # [Nc, 3, N_INTERP]
        # materialize before the [B]-sized gather below: XLA:CPU's fusion
        # emitters would otherwise inline the whole hoisted DF coefficient
        # graph into every gathered element (the scan used to materialize ics
        # as its ys output; keep that property)
        ics, auxs = jax.lax.optimization_barrier((ics, auxs))
        iy_new = ext[-4:]
        # prepend carried coefficient set
        all_ics = jnp.concatenate([state["interp_c"][None].astype(x.dtype), ics], axis=0)
        i_arange = jnp.arange(B)
        set_idx = (i_arange + 1) // D
        t = ((i_arange + 1) % D).astype(x.dtype) / D
        coefs = all_ics[set_idx]  # [B, 3, N_INTERP]
        vals = (coefs[:, 2] * t[:, None] + coefs[:, 1]) * t[:, None] + coefs[:, 0]  # [B, N_INTERP]

        ctl = {
            "ev": ev_new,
            "ev_lo": ev_lo_new,
            "bp_m": bp_m,
            "bpc": bpc_new,
            "env_m": env_m,
            "env_m_lo": env_m_lo if use_df else state["env_m_lo"],
            "bg_cs": jnp.stack([bg_new[0], bg_new[1]]),
            "bg_cs_lo": bg_lo_new,
            "interp_y": iy_new,
            "interp_c": ics[-1],
        }
        return ctl, vals, auxs

    def _audio(self, state, x, vals, ctl):
        """Audio path: lookahead delay, 2->4 matrix, dynamic shelf/lowpass,
        phase flip — everything downstream of the control values."""
        import jax.numpy as jnp

        B = x.shape[0]
        cfg = self.cfg
        c0, c1 = cfg.c0, cfg.c1
        s0 = x[:, c0]
        s1 = x[:, c1]

        # lookahead-delayed signal path: out sample i = input delayed by len
        buf = jnp.concatenate([state["buf"].astype(x.dtype), jnp.stack([s0, s1], axis=1)], axis=0)
        delayed = buf[:B]
        s0_d = delayed[:, 0]
        s1_d = delayed[:, 1]

        out_l = s0_d * vals[:, 0] + s1_d * vals[:, 1]
        out_r = s0_d * vals[:, 2] + s1_d * vals[:, 3]
        out_ls = s0_d * vals[:, 4] + s1_d * vals[:, 5] + 1e-15
        out_rs = s0_d * vals[:, 6] + s1_d * vals[:, 7] + 1e-15

        shelf_m = state["shelf_m"].astype(x.dtype)
        lp_m = state["lp_m"].astype(x.dtype)
        if self.shelf_mult != 1.0:
            sig = jnp.stack([out_l, out_r, out_ls, out_rs], axis=1)
            gg = jnp.stack([vals[:, 10], vals[:, 10], vals[:, 8], vals[:, 8]], axis=1)
            shelf_m, sig = self._dyn_shelf_block(self.shelf, shelf_m, sig, gg)
            out_l, out_r, out_ls, out_rs = sig[:, 0], sig[:, 1], sig[:, 2], sig[:, 3]
        if self.lowpass_mult != 1.0:
            sig = jnp.stack([out_l, out_r, out_ls, out_rs], axis=1)
            gg = jnp.stack([vals[:, 11], vals[:, 11], vals[:, 9], vals[:, 9]], axis=1)
            lp_m, sig = self._dyn_shelf_block(self.lowpass, lp_m, sig, gg)
            out_l, out_r, out_ls, out_rs = sig[:, 0], sig[:, 1], sig[:, 2], sig[:, 3]

        out_ls_pf, out_rs_pf = out_ls, out_rs
        pf_m = state["pf_m"].astype(x.dtype)
        if cfg.do_phase_flip:
            st0, out_ls_pf = self._ap1_block(pf_m[0], out_ls, vals[:, 12])
            st1, out_rs_pf = self._ap1_block(pf_m[1], out_rs, vals[:, 13])
            pf_m = jnp.stack([st0, st1])

        # assemble output
        ins = x
        cols = []
        for k in range(self.istream.channels):
            if k == c0:
                cols.append(out_l)
            elif k == c1:
                cols.append(out_r)
            else:
                cols.append(ins[:, k])
        if cfg.do_direct_path:
            amb = vals[:, 14]
            dire = vals[:, 15]
            cols.append((out_ls_pf - 1e-15) * amb)
            cols.append((out_rs_pf - 1e-15) * amb)
            cols.append((out_ls - 1e-15) * dire)
            cols.append(-(out_rs - 1e-15) * dire)
        else:
            cols.append(out_ls_pf - 1e-15)
            cols.append(out_rs_pf - 1e-15)
        y = jnp.stack(cols, axis=1)

        fade_p_new = jnp.maximum(state["fade_p"] - B, 0)
        new_state = dict(
            ctl,
            buf=buf[-self.len :] if self.len > 0 else state["buf"],
            shelf_m=shelf_m,
            lp_m=lp_m,
            pf_m=pf_m,
            fade_p=fade_p_new,
            disable=state["disable"],
        )
        return new_state, y

    def _dyn_shelf_block(self, pr, m0, sig, g):
        """Vectorized dyn_shelf_run (matrix4.c:89-98): first-order recurrence
        with constant pole -c2 and time-varying input terms."""
        import jax
        import jax.numpy as jnp

        sn = sig * pr["norm"]
        gcp1 = g * pr["cos_w0_p1"]
        c0s = (pr["sin_w0"] + gcp1) * sn
        c1s = (pr["sin_w0"] - gcp1) * sn
        # r = c0s + m; m' = c1s - c2 r = -c2 m + (c1s - c2 c0s)
        B = sig.shape[0]
        a = jnp.full(sig.shape, -pr["c2"], dtype=sig.dtype)
        b = c1s - pr["c2"] * c0s

        def comb(pq, qq):
            a1, b1 = pq
            a2, b2 = qq
            return a2 * a1, a2 * b1 + b2

        aa, bb = jax.lax.associative_scan(comb, (a, b), axis=0)
        ms = aa * m0[None, :] + bb  # state AFTER each sample
        m_prev = jnp.concatenate([m0[None, :], ms[:-1]], axis=0)
        r = c0s + m_prev
        return ms[-1], r

    def _ap1_block(self, st_row, sig, c0s):
        """ap1 with time-varying c0 (allpass.h:46-56): 2-state affine scan.
        Returns (final_state_row [2], out [B])."""
        import jax
        import jax.numpy as jnp

        B = sig.shape[0]
        # state s = [i0, o0]; r = i0 - c0 o0 + c0 x; i0' = x; o0' = r
        M = jnp.zeros((B, 2, 2), dtype=sig.dtype)
        M = M.at[:, 1, 0].set(1.0)
        M = M.at[:, 1, 1].set(-c0s)
        v = jnp.stack([sig, c0s * sig], axis=1)

        def comb(pq, qq):
            M1, v1 = pq
            M2, v2 = qq
            return M2 @ M1, (M2 @ v1[..., None])[..., 0] + v2

        with jax.default_matmul_precision("float32"):
            MM, vv = jax.lax.associative_scan(comb, (M, v), axis=0)
        states = (MM @ st_row[:, None]).squeeze(-1) + vv  # [B, 2]
        prev = jnp.concatenate([st_row[None], states[:-1]], axis=0)
        r = prev[:, 0] + c0s * (sig - prev[:, 1])
        return states[-1], r

    # --- chain hooks ---

    def channel_deps(self):
        n_in = self.istream.channels
        n_out = self.ostream.channels
        deps = np.zeros((n_out, n_in), dtype=bool)
        for i in range(min(n_in, n_out)):
            deps[i, i] = True
        deps[self.cfg.c0, self.cfg.c1] = True
        deps[self.cfg.c1, self.cfg.c0] = True
        for i in range(n_in, n_out):
            deps[i, self.cfg.c0] = True
            deps[i, self.cfg.c1] = True
        return deps

    def channel_offsets(self):
        n_in = self.istream.channels
        n_out = self.ostream.channels
        lat = np.zeros(n_out, dtype=np.int64)
        req = np.zeros(n_out, dtype=np.int64)
        lat[self.cfg.c0] = self.len
        lat[self.cfg.c1] = self.len
        ns = n_out - n_in
        nds = ns // 2 if self.cfg.do_direct_path else ns
        for i in range(n_in, n_out):
            lat[i] = self.len
        for i in range(n_in, n_in + nds):
            req[i] = self.surr_delay_frames
        return lat, req

    def drain_samples(self, samples):
        samples[self.cfg.c0] += self.len
        samples[self.cfg.c1] += self.len
        for i in range(self.istream.channels, self.ostream.channels):
            samples[i] += self.len

    def host_update(self, state):
        if self._signal_flag:
            self._signal_flag = False
            # toggled on the host: flip disable and restart fade
            import jax.numpy as jnp

            state["disable"] = jnp.logical_not(state["disable"])
            state["fade_p"] = jnp.asarray(self.fade_frames - int(state["fade_p"]), dtype=jnp.int64)
        if self.cfg.status_type != "none" and "aux" in state:
            from dsp_tpu.cli import terminal

            aux = np.asarray(state["aux"])
            if self._statusline is None:
                self._statusline = terminal.Statusline()
                terminal.register(self._statusline)
            lr, cs = aux[-1, 0], aux[-1, 1]
            off = " [off]" if bool(np.asarray(state["disable"])) else ""
            if self.cfg.status_type == "text":
                self._statusline.set(
                    f"{self.name}{off}: lr: {np.degrees(lr):+06.2f} ({np.degrees(aux[-1, 2]):+06.2f}); "
                    f"cs: {np.degrees(cs):+06.2f} ({np.degrees(aux[-1, 3]):+06.2f})"
                )
            else:
                self._statusline.set(
                    f"{self.name}{off}: L[{draw_steering_bar(lr)}]R; C[{draw_steering_bar(cs)}]S"
                )

    def host_finish(self, state):
        from dsp_tpu.cli import terminal

        if self._statusline is not None:
            terminal.unregister(self._statusline)
            self._statusline = None


def matrix4_effect_init(ei, istream, selector, dir_, argv):
    return Matrix4Effect(argv[0], istream, selector, argv)


register_effect(
    "matrix4",
    "matrix4 [options ...] [surround_level][/surround_level_rear]",
    matrix4_effect_init,
)


def draw_steering_bar(a, is_event=False):
    """31-char steering bar (matrix4_common.c:981-1002)."""
    s = [" "] * 31
    i = int(round(float(a) * (-15 / m4.M_PI_4))) + 15
    i = min(max(i, 0), 30)
    cursor_c = "#" if is_event else "*"
    fill_c = "=" if is_event else "-"
    if i > 15:
        for j in range(15, i):
            s[j] = fill_c
    elif i < 15:
        for j in range(i + 1, 15):
            s[j] = fill_c
    s[i] = cursor_c
    return "".join(s)
