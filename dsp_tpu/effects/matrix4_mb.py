"""matrix4_mb effect: 13-band multiband active matrix surround upmixer
(reference: /root/reference/matrix4_mb.c).

Structure (mirroring the reference):
  input -> fshape pre-emphasis biquads -> 13-band tree of CAP5 complementary
  allpass crossovers with phase-compensating ap2 sections -> per-band event
  engine + steering matrix at fs/32 (one lax.scan with the band axis vmapped
  through dsp_tpu.ops.m4_engine) -> per-band matrix application on the
  lookahead-delayed band signals -> re-sum -> inverse fshape. A linear-phase
  FIR that equalizes the bank's phase is generated at init by impulse-exciting
  a numpy copy of the bank, reversing, and truncating (matrix4_mb.c:757-786)
  and prepended as a separate fir effect.

The filter-bank tree runs as a sequence of batched allpass-biquad associative
scans (both audio channels per lane); every per-band nonlinear recurrence
lives in the control-rate scan.
"""

import numpy as np

from dsp_tpu.core import log
from dsp_tpu.core.types import StreamInfo
from dsp_tpu.effects import biquad as bq
from dsp_tpu.effects.base import Effect, EffectError, register_effect
from dsp_tpu.effects.fir import FirEffect
from dsp_tpu.effects.matrix4 import CS_INTERP_DELAY_FRAMES, FADE_TIME, matrix4_config_init
from dsp_tpu.ops import cap5 as c5
from dsp_tpu.ops import iir
from dsp_tpu.ops import m4_engine as m4

N_BANDS = c5.N_BANDS
BASE_ORD_NOTCH_SCALE_F0 = 700.0
EVENT_THRESH_MAX = 3.6
EVENT_THRESH_MIN = 1.4
BAND_WEIGHT_IDX_MULT = 0.95
PHASE_LIN_MAX_LEN = 50.0
PHASE_LIN_TRUNC_THRESH = 1e-6
N_SIG = 12  # ll lr rl rr lsl lsr rsl rsr pf0 pf1 amb dir

FSHAPE_LF = (10.0, np.sqrt(0.5), 180.0, 0.4)
FSHAPE_HF = (0.46, 0.5, 14000.0, 0.5)  # [0] multiplied by fs


def _fshape_coeffs(fs, inv):
    """Two-biquad pre-emphasis (matrix4_mb.c:131-148). -> [5, 2] columns lf,hf."""
    lf = FSHAPE_LF
    hf = (FSHAPE_HF[0] * fs, FSHAPE_HF[1], FSHAPE_HF[2], FSHAPE_HF[3])
    if inv:
        lf_c = bq.normalize(*bq.design(bq.HIGHPASS_TRANSFORM, fs, lf[2], lf[3], lf[0], lf[1]))
        hf_c = bq.normalize(*bq.design(bq.LOWPASS_TRANSFORM, fs, hf[2], hf[3], hf[0], hf[1]))
    else:
        lf_c = bq.normalize(*bq.design(bq.HIGHPASS_TRANSFORM, fs, lf[0], lf[1], lf[2], lf[3]))
        hf_c = bq.normalize(*bq.design(bq.LOWPASS_TRANSFORM, fs, hf[0], hf[1], hf[2], hf[3]))
    return np.stack([np.array(lf_c), np.array(hf_c)], axis=1)


class Matrix4MbEffect(Effect):
    split_safe = False  # see Matrix4Effect: adaptive event engine

    def __init__(self, name, istream, selector, argv):
        cfg = matrix4_config_init(name, istream, selector, argv, is_mb=True)
        self.cfg = cfg
        self.name = name
        self.istream = istream
        n_extra = 4 if cfg.do_direct_path else 2
        self.ostream = StreamInfo(istream.fs, istream.channels + n_extra)
        self.channel_selector = np.asarray(selector, dtype=bool).copy()
        self.block_quantum = m4.DOWNSAMPLE_FACTOR
        fs = istream.fs
        fs_ds = fs / m4.DOWNSAMPLE_FACTOR

        # per-band event params stacked along axis 0
        self.ev_thresh_max = np.zeros(N_BANDS)
        self.ev_thresh_min = np.zeros(N_BANDS)
        per_band = []
        for k in range(N_BANDS):
            xw = max(k - 1, 0) * 0.15 * BAND_WEIGHT_IDX_MULT
            mult = 1.0 - (xw / (xw + 1.0)) * 1.46 * 0.6
            self.ev_thresh_max[k] = EVENT_THRESH_MAX * mult
            self.ev_thresh_min[k] = EVENT_THRESH_MIN * mult
            ns_fc = c5.FB_FC_13[k] / BASE_ORD_NOTCH_SCALE_F0
            per_band.append(
                m4.make_event_params(
                    fs_ds,
                    base_thresh_scale=self.ev_thresh_max[k] / m4.EVENT_THRESH,
                    base_ord_notch_scale=np.exp(-3.465735902799727e-01 * ns_fc * ns_fc),
                    rear_ev_mask=cfg.rear_ev_mask,
                    norm_accom_factor=0.6,
                    diff_overshoot=1.01,
                )
            )
        self.ev_params = {
            k: np.stack([np.asarray(p[k], dtype=np.float64) for p in per_band])
            if not isinstance(per_band[0][k], dict)
            else {kk: np.stack([np.asarray(p[k][kk]) for p in per_band]) for kk in per_band[0][k]}
            for k in per_band[0]
        }
        # integer params must stay scalar (they index/bound loops)
        for k in ("buf_len", "sample_frames", "max_hold_frames", "min_hold_frames"):
            self.ev_params[k] = per_band[0][k]
        self.g_ev_thresh = float(m4.ewma_g(fs_ds, m4.EVENT_SAMPLE_TIME))
        self.g_env = float(m4.ewma_g(fs, m4.ENV_SMOOTH_TIME))

        # filter bank
        self.caps, self.comp = c5.build_filter_bank(fs, cfg.fb_type, cfg.fb_stop)
        self.fshape_c = _fshape_coeffs(fs, inv=False)
        self.inv_fshape_c = _fshape_coeffs(fs, inv=True)

        # band contour (matrix4_mb.c:738-751)
        shelf_mult2 = cfg.shelf_mult**2
        self.contour = np.zeros(N_BANDS)
        for k in range(N_BANDS):
            fc2 = c5.FB_FC_13[k] ** 2
            f2 = fc2 / cfg.shelf_f0**2
            self.contour[k] = np.sqrt((1.0 + shelf_mult2 * f2) / (1.0 + f2))
            if cfg.lowpass_f0 > 0.0:
                self.contour[k] *= np.sqrt(1.0 / (1.0 + fc2 / cfg.lowpass_f0**2))

        self.pf_c0 = 0.667829372575655
        self.pf_c1 = float(np.log(0.0005 * (44100.0 / fs)))
        self.fade_frames = m4.time_to_frames(FADE_TIME, fs)
        self.fb_buf_len = cfg.lookahead_frames + CS_INTERP_DELAY_FRAMES
        self.surr_delay_frames = cfg.surr_delay_frames
        self._signal_flag = False
        self._statuslines = None

        # phase-linearization FIR (matrix4_mb.c:757-786)
        phase_lin_frames = m4.time_to_frames(PHASE_LIN_MAX_LEN, fs)
        bank = c5.NumpyBank(self.caps, self.comp)
        filt = np.zeros(phase_lin_frames)
        for i in range(phase_lin_frames - 1, -1, -1):
            bands = bank.run_sample(1.0 if i == phase_lin_frames - 1 else 0.0)
            filt[i] = bands.sum()
        zx = 0
        integ = abs(filt[0])
        trunc = PHASE_LIN_TRUNC_THRESH * PHASE_LIN_TRUNC_THRESH * fs
        k = 1
        while integ < trunc and k < phase_lin_frames:
            if np.signbit(filt[k]) != np.signbit(filt[k - 1]):
                zx = k
                integ = 0.0
            integ += abs(filt[k])
            k += 1
        self.phase_lin_filter = filt[zx:].copy()
        self.len = self.fb_buf_len + (len(self.phase_lin_filter) - 1)
        log.verbose("%s: info: phase-lin FIR length %d", name, len(self.phase_lin_filter))

    # --- state ---

    def state_for_block(self, block):
        st = self.state0()
        # Always the fused blocked-kernel bank: L=128 chunks when the block
        # fits, else an L=1 per-sample Kogge-Stone plan (same state layout).
        # The 50-scan sequential bank (state0's per-cap dict) survives only
        # as a fallback for states built without a block size; the fused
        # kernel is both the fast path and — via lti_blocked_df — the only
        # path that can hand the analysis chain (hi, lo) band pairs.
        plan = self._bank_plan(block)
        st["bank"] = {"fused": np.zeros((2, plan.C, plan.n))}
        # per-band steering display data threaded through the state (read by
        # host_update; a traced array must never be stored on self)
        st["aux"] = np.zeros((block // m4.DOWNSAMPLE_FACTOR, N_BANDS, 2))
        return st

    def state0(self):
        init_interp = np.zeros((N_BANDS, N_SIG))
        init_interp[:, 0] = init_interp[:, 3] = 1.0
        # both interps start from phase_flip_pos_rs(0, 0) = 0.5 (matrix4.c)
        pf0 = np.exp(0.5 * (self.pf_c1 - self.pf_c0) + self.pf_c0) - 1.0
        pf1 = pf0
        init_interp[:, 8] = pf0
        init_interp[:, 9] = pf1
        init_interp[:, 10] = 1.0
        base = _make_np_event_state(self.ev_params)
        ev0 = {
            k: np.broadcast_to(v, (N_BANDS,) + np.shape(v)).copy() for k, v in base.items()
        }
        ev_lo = {
            k: np.zeros((N_BANDS,) + np.shape(v), dtype=np.float32)
            for k, v in base.items()
            if np.issubdtype(np.asarray(v).dtype, np.floating)
        }
        return {
            "ev": ev0,
            # lo parts of the double-float control state (f32 chains only;
            # passed through untouched under float64) — see matrix4.py
            "ev_lo": ev_lo,
            "ev_thresh_lo": np.zeros(N_BANDS, dtype=np.float32),
            "env_m_lo": np.zeros((N_BANDS, 8), dtype=np.float32),
            "ev_thresh": self.ev_thresh_max.copy(),
            "fshape_m": np.zeros((4, 2)),  # lf+hf per channel
            "bank": self._bank_state0(),
            "env_m": np.zeros((N_BANDS, 8)),
            "interp_y": np.tile(init_interp[None], (4, 1, 1)),
            "interp_c": np.concatenate(
                [init_interp[None], np.zeros((2, N_BANDS, N_SIG))], axis=0
            ),
            "fb_buf": np.zeros((self.fb_buf_len, N_BANDS, 2)),
            "pf_m": np.zeros((N_BANDS, 2, 2)),
            "inv_fshape_m": np.zeros((self.ostream.channels - self.istream.channels + 2, 2, 2)),
            "fade_p": np.int64(0),
            "disable": np.bool_(False),
        }

    def _bank_state0(self):
        n_caps = len(self.caps)
        n_comp = len(self.comp)
        return {
            "a1": np.zeros((n_caps, 2, 2)),  # per cap5: [2ch, biquad m0m1]
            "a2p": np.zeros((n_caps, 2, 2)),
            "a2o": np.zeros((n_caps, 2, 2)),
            "comp": np.zeros((n_comp, 2, 2)),
        }

    def _band_systems(self):
        """Per-band LTI systems: each band's full CAP5-tree path composed
        host-side into one state space (iir.ss_* algebra), stacked as
        13 bands x 2 stereo lanes. The bank then runs as ONE blocked kernel
        instead of ~60 sequential associative scans per block."""
        def bq(row):
            return iir.ss_from_biquad(np.stack([row, row], axis=1))

        sig = {"in": iir.ss_identity(2)}
        for op in c5.FB_PROGRAM_13:
            if op[0] == "cap5":
                _, fi, i_n, lp_n, hp_n = op
                cc = self.caps[fi]
                a1s = bq(c5.ap2_biquad(*cc["a1"]))
                a2s = iir.ss_series(bq(c5.ap2_biquad(*cc["a2_ap2"])), bq(c5.ap1_biquad(cc["a2_ap1"])))
                base = sig[i_n]
                sig[lp_n] = iir.ss_series(base, iir.ss_scale(iir.ss_add(a1s, a2s, 1.0, 1.0), 0.5))
                sig[hp_n] = iir.ss_series(base, iir.ss_scale(iir.ss_add(a1s, a2s, 1.0, -1.0), 0.5))
            else:
                _, ai, s_n = op
                sig[s_n] = iir.ss_series(sig[s_n], bq(c5.ap2_biquad(*self.comp[ai])))
        return [sig[f"s{k}"] for k in range(N_BANDS)]

    def _bank_plan(self, block):
        """Blocked-kernel plan for the whole 13-band tree. L=128 when the
        block fits the chunked kernel, else L=1 (the same kernel degenerates
        into a per-sample Kogge-Stone df scan) — mirrors matrix4._bp_plan."""
        L = iir.BLOCKED_L if (block % iir.BLOCKED_L == 0 and block >= 2 * iir.BLOCKED_L) else 1
        plans = getattr(self, "_bank_plans", None)
        if plans is None:
            plans = self._bank_plans = {}
        if L not in plans:
            stacked = iir.ss_stack(self._band_systems())
            plans[L] = iir.CascadeBlockedPlan.from_ss(stacked, L=L)
        return plans[L]

    def _run_bank_fused(self, st, x2):
        """x2: [B, 2] -> ([2, 26, n] state, bands [B, NB, 2], bands_ana).

        bands is plain f32/f64 for the audio path; bands_ana is the same
        signal as an uncollapsed dfx.DF (hi, lo) pair under f32 (plain alias
        otherwise). The analysis chain must see ~f64-accurate band values:
        collapsing to f32 leaves ~1e-8 absolute filter error that swamps the
        quiet top bands' envelopes (band-12 scale ~1e-7 on program material)
        and flips event decisions, which the cross-band threshold modulation
        then propagates into the loud bands' steering (measured -36.5 dBFS
        full-f32 vs -121.3 dBFS with f64 control pinned, 32k-frame probe)."""
        import jax.numpy as jnp

        from dsp_tpu.ops import dfx as dx

        plan = self._bank_plan(x2.shape[0])
        B = x2.shape[0]
        xt = jnp.tile(x2, (1, N_BANDS))  # cols: [b0L, b0R, b1L, b1R, ...]
        if x2.dtype == jnp.float32:
            st2, (yh, yl) = iir.lti_blocked_df(plan, st, xt)
            bands = yh.reshape(B, N_BANDS, 2)
            return st2, bands, dx.DF(bands, yl.reshape(B, N_BANDS, 2))
        st2, y = iir.lti_blocked(plan, st, xt)
        bands = y.reshape(B, N_BANDS, 2)
        return st2, bands, bands

    def signal(self):
        if self.cfg.enable_signal:  # matrix4_mb.c:686: no handler otherwise
            self._signal_flag = True
        return None

    # --- filter bank on device ---

    def _run_bank(self, bst, x2):
        """x2: [B, 2] -> band signals [B, N_BANDS, 2], new bank state."""
        import jax.numpy as jnp

        sig = {"in": x2}
        a1 = {}
        a2p = {}
        a2o = {}
        comp = {}
        for op in c5.FB_PROGRAM_13:
            if op[0] == "cap5":
                _, fi, i_n, lp_n, hp_n = op
                cc = self.caps[fi]
                s_in = sig[i_n]
                # batched ap2 pair: lanes [a1_ch0, a1_ch1, a2p_ch0, a2p_ch1]
                row_a1 = c5.ap2_biquad(*cc["a1"])
                row_a2 = c5.ap2_biquad(*cc["a2_ap2"])
                # bank allpasses are measured f32-stable (flat ~2e-4); the
                # cheap plain scan keeps the 50-scan bank compilable
                cmat = jnp.asarray(np.stack([row_a1, row_a1, row_a2, row_a2], axis=1), dtype=x2.dtype)
                A, Bv, c0 = iir.biquad_coeffs_to_ss(cmat)
                st_in = jnp.concatenate([bst["a1"][fi], bst["a2p"][fi]], axis=0)
                lanes = jnp.concatenate([s_in, s_in], axis=1)  # [B, 4]
                st_out, y = iir.biquad_scan(A, Bv, c0, st_in.astype(x2.dtype), lanes)
                a1[fi] = st_out[:2]
                a2p[fi] = st_out[2:]
                y_a1 = y[:, :2]
                y_a2p = y[:, 2:]
                row_ap1 = c5.ap1_biquad(cc["a2_ap1"])
                cmat1 = jnp.asarray(np.stack([row_ap1, row_ap1], axis=1), dtype=x2.dtype)
                A1, B1, c01 = iir.biquad_coeffs_to_ss(cmat1)
                st1, y_a2 = iir.biquad_scan(A1, B1, c01, bst["a2o"][fi].astype(x2.dtype), y_a2p)
                a2o[fi] = st1
                sig[lp_n] = (y_a1 + y_a2) * 0.5
                sig[hp_n] = (y_a1 - y_a2) * 0.5
            else:
                _, ai, s_n = op
                row = c5.ap2_biquad(*self.comp[ai])
                cmat = jnp.asarray(np.stack([row, row], axis=1), dtype=x2.dtype)
                A, Bv, c0 = iir.biquad_coeffs_to_ss(cmat)
                st, y = iir.biquad_scan(A, Bv, c0, bst["comp"][ai].astype(x2.dtype), sig[s_n])
                comp[ai] = st
                sig[s_n] = y
        import jax.numpy as jnp

        bands = jnp.stack([sig[f"s{k}"] for k in range(N_BANDS)], axis=1)  # [B, NB, 2]
        new_bst = {
            "a1": jnp.stack([a1[i] for i in range(len(self.caps))]),
            "a2p": jnp.stack([a2p[i] for i in range(len(self.caps))]),
            "a2o": jnp.stack([a2o[i] for i in range(len(self.caps))]),
            "comp": jnp.stack([comp[i] for i in range(len(self.comp))]),
        }
        return new_bst, bands

    def _biquad_cascade(self, coeffs, st, x):
        """Two-stage biquad cascade on [B, C] lanes; coeffs [5,2], st [2, C, 2]."""
        import jax.numpy as jnp

        C = x.shape[1]
        out_st = []
        y = x
        for s_i in range(2):
            row = coeffs[:, s_i]
            cmat = np.tile(row[:, None], (1, C))
            st_i, y = iir.biquad_scan_auto(cmat, st[s_i].astype(x.dtype), y)
            out_st.append(st_i)
        return jnp.stack(out_st), y

    # --- block step ---

    def step(self, state, x):
        ctl, vals, _ = self._control(state, x)
        return self._audio(state, x, vals, ctl)

    def _control(self, state, x):
        """Front (fshape + filter bank) + envelopes + per-band fs/32 event
        engine + cross-band threshold modulation + parabolic interpolation
        -> per-sample matrix values [B, NB, N_SIG].

        Split from _audio so tests can isolate precision effects exactly like
        matrix4's split (tests/test_f32_accuracy.py): pin (ctl, vals) from a
        float64 twin and run _audio in f32 to bound the audio path's own
        error; the remainder in full-f32 runs is control-path event jitter.
        """
        import jax
        import jax.numpy as jnp

        B = x.shape[0]
        D = m4.DOWNSAMPLE_FACTOR
        Nc = B // D
        cfg = self.cfg
        c0, c1 = cfg.c0, cfg.c1

        # fshape pre-emphasis
        fsh_st = state["fshape_m"].reshape(2, 2, 2)
        fsh_new, s_pre = self._biquad_cascade(
            self.fshape_c, fsh_st, jnp.stack([x[:, c0], x[:, c1]], axis=1)
        )
        # f32 chains run the whole control path in double-float (see
        # matrix4.py / ops.dfx): band signals, envelope accumulators, the
        # per-band event-engine scans, and the event-threshold EWMA below
        from dsp_tpu.ops import dfx as dx

        use_df = x.dtype == jnp.float32

        # filter bank; bands_ana is a DF (hi, lo) pair under f32
        if "fused" in state["bank"]:
            fst, bands, bands_ana = self._run_bank_fused(state["bank"]["fused"], s_pre)
            bst = {"fused": fst}
        else:
            bst, bands = self._run_bank(state["bank"], s_pre)  # [B, NB, 2]
            bands_ana = bands

        # frequency-masked analysis signals (matrix4_mb.c:391-392)
        if cfg.freq_mask != 0.0:
            fmw = np.tril(
                cfg.freq_mask ** (np.arange(N_BANDS)[:, None] - np.arange(N_BANDS)[None, :])
            ) * np.tril(np.ones((N_BANDS, N_BANDS)))
            if dx.is_df(bands_ana):
                # lower-triangular mask as an exact-const DF contraction
                # (13x13/2 multiply-adds on [B, 2] pairs)
                cols = []
                for k in range(N_BANDS):
                    acc = bands_ana[:, k]
                    for j in range(k):
                        acc = acc + bands_ana[:, j] * float(fmw[k, j])
                    cols.append(acc)
                ana = dx.stack(cols, axis=1)
            else:
                fmw = jnp.asarray(fmw, dtype=x.dtype)
                ana = jnp.einsum("kj,bjc->bkc", fmw, bands_ana)
        else:
            ana = bands_ana

        # envelope EWMAs at audio rate, per band: [B, NB, 8] (DF under f32)
        l_b = ana[:, :, 0]
        r_b = ana[:, :, 1]
        sum_b = l_b + r_b
        diff_b = l_b - r_b
        env_in = dx.stack(
            [dx.absolute(l_b), dx.absolute(r_b), dx.absolute(sum_b), dx.absolute(diff_b),
             l_b * l_b, r_b * r_b, sum_b * sum_b, diff_b * diff_b], axis=2,
        )
        env_m, env_m_lo, envs = m4.env_ewma_scan(
            state["env_m"].astype(x.dtype),
            state["env_m_lo"] if use_df else None,
            self.g_env, env_in, use_df,
        )
        env_ds = envs[D - 1 :: D]  # [Nc, NB, 8] (DF under f32)

        # fade at ticks
        tick_i = jnp.arange(Nc) * D + (D - 1)
        fade_p_at = jnp.maximum(state["fade_p"] - tick_i, 0)
        dis = state["disable"]
        posf = fade_p_at.astype(x.dtype) / self.fade_frames
        fade_lin = jnp.where(dis, posf, 1.0 - posf)
        fade_sm = (1.0 - jnp.cos(fade_lin * np.pi)) * 0.5
        fade_ticks = jnp.where(fade_p_at > 0, fade_sm, (~dis).astype(x.dtype))

        p = m4.cast_params(self.ev_params, x.dtype, df=use_df)
        calc = m4.calc_matrix_coefs_v4 if cfg.matrix_ver == "v4" else m4.calc_matrix_coefs_v1
        ev_step_band = jax.vmap(
            lambda pp, st_, env_, pwr_, ts: m4.event_step(pp, st_, env_, pwr_, ts),
            in_axes=(_params_axes(p), 0, 0, 0, 0),
        )
        etmax = jnp.asarray(self.ev_thresh_max, dtype=x.dtype)
        etmin = jnp.asarray(self.ev_thresh_min, dtype=x.dtype)
        contour = jnp.asarray(self.contour, dtype=x.dtype)

        # The scan body carries ONLY the sequential state machines — the
        # cross-band threshold modulation (reads the previous tick's engine
        # state) and the per-band event engines. The matrix-coefficient
        # computation, phase flip, pan and the parabolic interpolator windows
        # are pure per-tick functions of the engine outputs, hoisted out of
        # the scan and vectorized over all [Nc, NB] ticks at once (round-4
        # bench: the in-scan version halved matrix4_mb throughput).
        def control_step(carry, inp):
            ev, evt = carry
            e8 = inp  # [NB, 8]
            # cross-band event threshold modulation (matrix4_mb.c:379-418).
            # cand and the evt EWMA/compare run at carry precision (df under
            # f32); the similarity weights sim/fact are smooth modulators and
            # drop to plain f32 (fresh inputs each tick — no accumulation).
            cand = ((ev["slope_last"][:, 0] > 0.0) & (ev["last"][:, 0] > etmin)) | (
                (ev["slope_last"][:, 1] > 0.0) & (ev["last"][:, 1] > etmin)
            )
            dlast = dx.value(ev["diff_last"])
            d_lr = jnp.abs(dlast[:, None, 0] - dlast[None, :, 0])
            d_cs = jnp.abs(dlast[:, None, 1] - dlast[None, :, 1])
            sim = m4.smoothstep(1.0 - jnp.maximum(d_lr, d_cs) * float(16.0 / np.pi))
            fact = (sim * cand[None, :]).sum(axis=1) - 1.0
            fact = jnp.where(cand, fact, 0.0)
            evt_target = etmax - (etmax - etmin) * fact * (1.0 / (N_BANDS - 1))
            if use_df:
                evt_target = dx.lift(evt_target)
            up = evt + self.g_ev_thresh * (evt_target - evt)
            evt_new = dx.where(evt_target >= evt, up, evt_target)
            env = {"l": e8[:, 0], "r": e8[:, 1], "sum": e8[:, 2], "diff": e8[:, 3]}
            pwr = {"l": e8[:, 4], "r": e8[:, 5], "sum": e8[:, 6], "diff": e8[:, 7]}
            ev, out = ev_step_band(p, ev, env, pwr, evt_new * (1.0 / m4.EVENT_THRESH))
            keep = ("ax_lr", "ax_cs", "ax_dpwr_lr", "ax_dpwr_cs", "pwrcmp_factor")
            return (ev, evt_new), {k: out[k] for k in keep}

        if use_df:
            ev0 = dx.wrap_dict(state["ev"], state["ev_lo"])
            evt0 = dx.DF(state["ev_thresh"].astype(x.dtype), state["ev_thresh_lo"])
        else:
            ev0 = state["ev"]
            evt0 = state["ev_thresh"].astype(x.dtype)
        (ev_new, evt_new), out = jax.lax.scan(control_step, (ev0, evt0), env_ds)
        if use_df:
            ev_new, ev_lo_new = dx.split_dict(ev_new, set(state["ev_lo"]))
            evt_lo_new = evt_new.lo
            evt_new = evt_new.hi
        else:
            ev_lo_new = state["ev_lo"]
            evt_lo_new = state["ev_thresh_lo"]

        # --- hoisted per-tick coefficient computation over [Nc, NB]. Engine
        # outputs (DF under f32) stay df through the computation; vals
        # collapse to f32 at the interp insert.
        fade = fade_ticks[:, None]  # broadcast over the band axis
        w = m4.smoothstep(out["ax_cs"] * (-2.0 / m4.M_PI_4))
        surr_mult = (w * cfg.surr_mult[1] + (1.0 - w) * cfg.surr_mult[0]) * fade
        ct_pcf = cfg.contour_pwrcmp * out["pwrcmp_factor"]
        ct0 = w + (1.0 - w) * contour[None, :]
        ct1 = (ct0 - 1.0) * ct_pcf + 1.0
        ct2 = ct0 / ct1
        dp_lr = out["ax_dpwr_lr"] if cfg.do_dpwr_decouple else out["ax_lr"]
        dp_cs = out["ax_dpwr_cs"] if cfg.do_dpwr_decouple else out["ax_cs"]
        m, _ = calc(
            out["ax_lr"], out["ax_cs"], dp_lr, dp_cs,
            surr_mult * ct1, cfg.surr_mult[1] * fade, cfg.matrix_param, [],
        )
        pf_pos = m4.phase_flip_pos_rs(out["ax_lr"], out["ax_cs"])
        pf0 = m4.phase_flip_ap1_c0(self.pf_c0, self.pf_c1, 1.0 - pf_pos)
        pf1 = m4.phase_flip_ap1_c0(self.pf_c0, self.pf_c1, pf_pos)
        amb, dire = m4.surr_direct_pan(out["ax_lr"], out["ax_cs"])
        vals_ticks = dx.value(dx.stack(
            [m["ll"], m["lr"], m["rl"], m["rr"],
             m["lsl"] * ct2, m["lsr"] * ct2, m["rsl"] * ct2, m["rsr"] * ct2,
             pf0, pf1, amb, dire], axis=2,
        ))  # [Nc, NB, N_SIG]
        auxs = dx.value(dx.stack([out["ax_lr"], out["ax_cs"]], axis=2))  # [Nc, NB, 2]

        # parabolic interpolator windows as slices of one extended array
        # (matrix4_common.h:358-367): window at tick t = vals[t-3 .. t]
        ext = jnp.concatenate(
            [state["interp_y"].astype(x.dtype)[1:], vals_ticks], axis=0
        )  # [Nc + 3, NB, N_SIG]
        iy0, iy1 = ext[:Nc], ext[1 : Nc + 1]
        iy2, iy3 = ext[2 : Nc + 2], ext[3 : Nc + 3]
        ia = iy2 - iy0
        ics = jnp.stack(
            [0.5 * iy1 + 0.25 * (iy0 + iy2), 0.5 * ia, 0.25 * (iy3 - iy1 - ia)], axis=1
        )  # [Nc, 3, NB, N_SIG]
        # materialize before the [B]-sized gather below (see matrix4.py: the
        # XLA:CPU fusion emitters would inline the whole hoisted DF
        # coefficient graph into every gathered element)
        ics, auxs = jax.lax.optimization_barrier((ics, auxs))
        iy_new = ext[-4:]

        all_ics = jnp.concatenate([state["interp_c"][None].astype(x.dtype), ics], axis=0)
        i_ar = jnp.arange(B)
        set_idx = (i_ar + 1) // D
        t = ((i_ar + 1) % D).astype(x.dtype) / D
        coefs = all_ics[set_idx]  # [B, 3, NB, N_SIG]
        vals = (coefs[:, 2] * t[:, None, None] + coefs[:, 1]) * t[:, None, None] + coefs[:, 0]

        ctl = {
            "fsh_new": fsh_new,
            "bst": bst,
            "bands": bands,
            "env_m": env_m,
            "env_m_lo": env_m_lo if use_df else state["env_m_lo"],
            "ev_new": ev_new,
            "ev_lo_new": ev_lo_new,
            "evt_new": evt_new,
            "evt_lo_new": evt_lo_new,
            "iy_new": iy_new,
            "ics_last": ics[-1],
            "auxs": auxs,
        }
        return ctl, vals, auxs

    def _audio(self, state, x, vals, ctl):
        """Delayed band mixing + dynamic phase flip + direct path + inverse
        fshape. All control-dependent values arrive via (vals, ctl)."""
        import jax.numpy as jnp

        B = x.shape[0]
        cfg = self.cfg
        c0, c1 = cfg.c0, cfg.c1
        bands = ctl["bands"]

        # delayed band signals
        fb_buf = jnp.concatenate([state["fb_buf"].astype(x.dtype), bands], axis=0)
        delayed = fb_buf[:B]  # [B, NB, 2]
        s0_d = delayed[:, :, 0]
        s1_d = delayed[:, :, 1]

        b_l = s0_d * vals[:, :, 0] + s1_d * vals[:, :, 1]
        b_r = s0_d * vals[:, :, 2] + s1_d * vals[:, :, 3]
        b_ls = s0_d * vals[:, :, 4] + s1_d * vals[:, :, 5]
        b_rs = s0_d * vals[:, :, 6] + s1_d * vals[:, :, 7]

        out_l = b_l.sum(axis=1)
        out_r = b_r.sum(axis=1)

        b_ls_pf, b_rs_pf = b_ls, b_rs
        pf_m = state["pf_m"].astype(x.dtype)
        if cfg.do_phase_flip:
            sig2 = jnp.concatenate([b_ls + 1e-15, b_rs + 1e-15], axis=1)  # [B, 2*NB]
            c0s2 = jnp.concatenate([vals[:, :, 8], vals[:, :, 9]], axis=1)
            pf_st = jnp.concatenate([pf_m[:, 0], pf_m[:, 1]], axis=0)  # [2NB, 2]
            st_out, y_pf = _ap1_lanes(pf_st, sig2, c0s2)
            b_ls_pf = y_pf[:, :N_BANDS] - 1e-15
            b_rs_pf = y_pf[:, N_BANDS:] - 1e-15
            pf_m = jnp.stack([st_out[:N_BANDS], st_out[N_BANDS:]], axis=1)

        if cfg.do_direct_path:
            amb = vals[:, :, 10]
            dire = vals[:, :, 11]
            out_ls = (b_ls_pf * amb).sum(axis=1)
            out_rs = (b_rs_pf * amb).sum(axis=1)
            out_ls_dir = (b_ls * dire).sum(axis=1)
            out_rs_dir = -(b_rs * dire).sum(axis=1)
        else:
            out_ls = b_ls_pf.sum(axis=1)
            out_rs = b_rs_pf.sum(axis=1)
            out_ls_dir = out_rs_dir = None

        # inverse fshape on outputs
        outs = [out_l, out_r, out_ls + (1e-15 / 324), out_rs + (1e-15 / 324)]
        if cfg.do_direct_path:
            outs += [out_ls_dir + (1e-15 / 324), out_rs_dir + (1e-15 / 324)]
        sig = jnp.stack(outs, axis=1)
        inv_st = state["inv_fshape_m"].astype(x.dtype)
        inv_new, sig = self._biquad_cascade(self.inv_fshape_c, jnp.swapaxes(inv_st, 0, 1), sig)
        inv_new = jnp.swapaxes(inv_new, 0, 1)
        out_l, out_r = sig[:, 0], sig[:, 1]
        out_ls = sig[:, 2] - 1e-15
        out_rs = sig[:, 3] - 1e-15

        cols = []
        for k in range(self.istream.channels):
            if k == c0:
                cols.append(out_l)
            elif k == c1:
                cols.append(out_r)
            else:
                cols.append(x[:, k])
        cols.append(out_ls)
        cols.append(out_rs)
        if cfg.do_direct_path:
            cols.append(sig[:, 4] - 1e-15)
            cols.append(sig[:, 5] - 1e-15)
        y = jnp.stack(cols, axis=1)

        new_state = {
            "ev": ctl["ev_new"],
            "ev_lo": ctl["ev_lo_new"],
            "ev_thresh": ctl["evt_new"],
            "ev_thresh_lo": ctl["evt_lo_new"],
            "fshape_m": ctl["fsh_new"].reshape(4, 2),
            "bank": ctl["bst"],
            "env_m": ctl["env_m"],
            "env_m_lo": ctl["env_m_lo"],
            "interp_y": ctl["iy_new"],
            "interp_c": ctl["ics_last"],
            "fb_buf": fb_buf[-self.fb_buf_len :],
            "pf_m": pf_m,
            "inv_fshape_m": inv_new,
            "fade_p": jnp.maximum(state["fade_p"] - B, 0),
            "disable": state["disable"],
        }
        if isinstance(state, dict) and "aux" in state:
            new_state["aux"] = ctl["auxs"].astype(state["aux"].dtype)
        return new_state, y

    # --- chain hooks (mirror matrix4) ---

    def channel_deps(self):
        n_in, n_out = self.istream.channels, self.ostream.channels
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
        n_in, n_out = self.istream.channels, self.ostream.channels
        lat = np.zeros(n_out, dtype=np.int64)
        req = np.zeros(n_out, dtype=np.int64)
        # self.len = fb_buf_len + (phase_lin-1): the prepended FIR's group
        # delay plus the lookahead (matrix4_mb.c:781); the fir effect itself
        # reports no buffering latency (zero-latency OLS), so the whole
        # amount is carried here
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
        samples[self.cfg.c0] += self.fb_buf_len
        samples[self.cfg.c1] += self.fb_buf_len
        for i in range(self.istream.channels, self.ostream.channels):
            samples[i] += self.fb_buf_len

    def host_update(self, state):
        if self._signal_flag:
            self._signal_flag = False
            import jax.numpy as jnp

            state["disable"] = jnp.logical_not(state["disable"])
            state["fade_p"] = jnp.asarray(self.fade_frames - int(state["fade_p"]), dtype=jnp.int64)
        if self.cfg.status_type != "none" and "aux" in state:
            from dsp_tpu.cli import terminal
            from dsp_tpu.effects.matrix4 import draw_steering_bar

            aux = np.asarray(state["aux"])[-1]  # [NB, 2]
            if self._statuslines is None:
                self._statuslines = [terminal.Statusline() for _ in range(N_BANDS)]
                for sl in self._statuslines:
                    terminal.register(sl)
            off = " [off]" if bool(np.asarray(state["disable"])) else ""
            for k in range(N_BANDS):
                lr, cs = aux[k, 0], aux[k, 1]
                if self.cfg.status_type == "text":
                    self._statuslines[k].set(
                        f"{self.name}{off}: band {k:2d}: lr: {np.degrees(lr):+06.2f}; cs: {np.degrees(cs):+06.2f}"
                    )
                else:
                    self._statuslines[k].set(
                        f"{self.name}{off}: band {k:2d}: L[{draw_steering_bar(lr)}]R; C[{draw_steering_bar(cs)}]S"
                    )

    def host_finish(self, state):
        from dsp_tpu.cli import terminal

        if self._statuslines:
            for sl in self._statuslines:
                terminal.unregister(sl)
            self._statuslines = None


def _params_axes(p):
    """vmap in_axes spec for the stacked per-band params dict."""
    axes = {}
    for k, v in p.items():
        if k in ("buf_len", "sample_frames", "max_hold_frames", "min_hold_frames"):
            axes[k] = None
        elif isinstance(v, dict):
            axes[k] = {kk: 0 for kk in v}
        else:
            axes[k] = 0
    return axes


def _make_np_event_state(p):
    """Per-band initial event state (numpy)."""
    scalar_p = {}
    for k, v in p.items():
        if k in ("buf_len", "sample_frames", "max_hold_frames", "min_hold_frames"):
            scalar_p[k] = v
        elif isinstance(v, dict):
            scalar_p[k] = {kk: np.asarray(vv)[0] for kk, vv in v.items()}
        else:
            scalar_p[k] = np.asarray(v)[0] if np.ndim(v) else v
    return m4.make_event_state(scalar_p)


def matrix4_mb_effect_init(ei, istream, selector, dir_, argv):
    mb = Matrix4MbEffect(argv[0], istream, selector, argv)
    fir = FirEffect(argv[0], istream, selector, mb.phase_lin_filter[:, None], 0, False)
    return [fir, mb]


register_effect(
    "matrix4_mb",
    "matrix4_mb [options ...] [surround_level][/surround_level_rear]",
    matrix4_mb_effect_init,
)


def _ap1_lanes(st, sig, c0s):
    """Batched time-varying first-order allpass over [B, L] lanes.
    st: [L, 2] (i0, o0). Returns (st', y)."""
    import jax
    import jax.numpy as jnp

    B, L = sig.shape
    M = jnp.zeros((B, L, 2, 2), dtype=sig.dtype)
    M = M.at[:, :, 1, 0].set(1.0)
    M = M.at[:, :, 1, 1].set(-c0s)
    v = jnp.stack([sig, c0s * sig], axis=2)

    def comb(pq, qq):
        M1, v1 = pq
        M2, v2 = qq
        return M2 @ M1, (M2 @ v1[..., None])[..., 0] + v2

    with jax.default_matmul_precision("float32"):
        MM, vv = jax.lax.associative_scan(comb, (M, v), axis=0)
    states = (MM @ st[None, :, :, None])[..., 0] + vv  # [B, L, 2]
    prev = jnp.concatenate([st[None], states[:-1]], axis=0)
    y = prev[:, :, 0] + c0s * (sig - prev[:, :, 1])
    return states[-1], y
