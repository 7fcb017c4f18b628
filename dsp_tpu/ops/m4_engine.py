"""matrix4 steering engine: control-rate event detection and matrix
computation (reference: /root/reference/matrix4_common.c/h).

Everything here is written as pure scalar-jnp functions of explicit state
dicts so that one ``lax.scan`` runs the fs/32 control stream for matrix4 and
a ``jax.vmap`` over the band axis runs the 13-band matrix4_mb engine with the
same code. Branches become jnp.where; the reference's ring buffers are fixed
[L] state arrays with an integer pointer; the slope-lookback walk
(matrix4_common.c:579-603) is a masked cumulative-AND over the static buffer
length.

Constants mirror matrix4_common.h:31-106.
"""

import numpy as np

EVENT_THRESH = 1.8
EVENT_END_THRESH = 0.2
ENV_SMOOTH_TIME = 30.0
EVENT_SMOOTH_TIME = 30.0
ACCOM_TIME = 300.0
RISE_TIME_FAST = 30.0
RISE_TIME_SLOW = 100.0
NORM_TIME = 160.0
NORM_CROSSFEED = 0.1
ORD_FACTOR_DECAY = 10.0
EVENT_SAMPLE_TIME = 30.0
EVENT_MAX_HOLD_TIME = 200.0
EVENT_MIN_HOLD_TIME = 50.0
EVENT_MASK_TIME = 100.0
ORD_SENS_ERR = 2.0
ORD_SENS_WEIGHT = 3.0
ORD_WEIGHT_THRESH = 0.3
ORD_NOTCH_FREQ_1 = 4.0
ORD_NOTCH_GAIN_1 = -10.3
ORD_NOTCH_FREQ_2 = 12.0
ORD_NOTCH_GAIN_2 = -10.3
ORD_NOTCH_SCALE_RT = 2.0
DIFF_SENS_WEIGHT = 2.0
DIFF_WEIGHT_SCALE = 2.5
ORD_DPWR_SENS_ERR = 8.0
PWRCMP_RISE_TIME = 100.0
PWRCMP_FALL_TIME = 15.0
PWRCMP_FACTOR_SENS = 0.2
NORM_ACCOM_FACTOR = 0.9
DIFF_OVERSHOOT = 1.001
DOWNSAMPLE_FACTOR = 32

# lookback-replay unroll threshold: buf_len <= this unrolls the averaging
# replay at trace time (identical op sequence, no loop overhead); above it
# (~L=90 at 192 kHz) a lax.fori_loop bounds trace size. Module-level so tests
# can force the fori_loop path and assert bit-equivalence (ADVICE r4).
UNROLL_MAX_L = 32

# plain Python floats (weak-typed) so f32 compute on TPU is not promoted to
# f64 by strict np.float64 scalars
M_PI_4 = float(np.pi / 4.0)
M_PI_2 = float(np.pi / 2.0)
# the C engine guards divisions with DBL_MIN (matrix4_common.c); f64's tiny
# underflows to 0 in float32, so use f32's smallest normal — still far below
# any audio-scale quantity, and representable in both dtypes
DBL_MIN = float(np.finfo(np.float32).tiny)


def ewma_g(fs, tc_ms):
    """EWMA gain for a 10-90% rise time in ms (ewma.h:28-35)."""
    tc = tc_ms / 1000.0 / 2.1972
    return 1.0 - np.exp(-1.0 / (fs * tc))


def time_to_frames(ms, fs):
    # lround (half away from zero), NOT Python round (banker's): 22.5 must
    # become 23 like the C TIME_TO_FRAMES at fs=48000 (matrix4_common.h)
    import math

    return int(math.floor(ms / 1000.0 * fs + 0.5))


def smoothstep(x):
    from dsp_tpu.ops import dfx as dx

    x = dx.clip(x, 0.0, 1.0)
    return x * x * (3.0 - 2.0 * x)


def _ewma(m, s, g):
    return m + g * (s - m)


def _ewma_scale(m, s, g, sf):
    from dsp_tpu.ops import dfx as dx

    gs = dx.minimum(g * sf, 0.39)
    return m + gs * (s - m)


def _ewma_set_max(m, s, g):
    """ewma_run_set_max: smooth upward, jump down (ewma.h:56-61).
    Returns (new_m, output)."""
    from dsp_tpu.ops import dfx as dx

    up = _ewma(m, s, g)
    c = s >= m
    new_m = dx.where(c, up, s)
    out = dx.where(c, up, s)
    return new_m, out


def _ewma_scale_asym(m, s, g, rise_sf, fall_sf):
    import jax.numpy as jnp

    from dsp_tpu.ops import dfx as dx

    c = s >= m
    if dx.is_df(s) or dx.is_df(m) or dx.is_df(rise_sf) or dx.is_df(fall_sf):
        sf = dx.where(c, rise_sf, fall_sf)
    else:
        sf = jnp.where(c, rise_sf, fall_sf).astype(jnp.result_type(s))
    return _ewma_scale(m, s, g, sf)


def _angle(n, d, expr):
    from dsp_tpu.ops import dfx as dx

    # expr is always non-negative (ratios of envelopes / sqrt of |ratios|),
    # so the df path can use the [0, inf] atan reduction (dfx.atan_pos)
    return dx.where(
        (n < DBL_MIN) & (d < DBL_MIN), M_PI_4, dx.where(d < DBL_MIN, M_PI_2, dx.atan_pos(expr))
    )


def calc_lr(n, d, expr):
    return _angle(n, d, expr) - M_PI_4


calc_cs = calc_lr


def _norm_axes(lr, cs):
    from dsp_tpu.ops import dfx as dx

    abs_sum = dx.absolute(lr) + dx.absolute(cs)
    norm = dx.where(abs_sum > M_PI_4, M_PI_4 / dx.maximum(abs_sum, DBL_MIN), 1.0)
    return lr * norm, cs * norm


def _drift_err_scale(lr0, cs0, lr1, cs1, sens_err):
    from dsp_tpu.ops import dfx as dx

    lr_err = dx.absolute(lr1 - lr0) * float(2.0 / np.pi)
    cs_err = dx.absolute(cs1 - cs0) * float(2.0 / np.pi)
    return 1.0 + (lr_err + cs_err) * sens_err


def _ord_notch_scale(lr, cs):
    from dsp_tpu.ops import dfx as dx

    z = dx.maximum((dx.absolute(lr) + dx.absolute(cs)) * (2.0 / M_PI_4) - 1.0, 0.0)
    return 1.0 - z * z * 0.99


# --- SVF peaking filter (matrix4_common.c:364-388) ---


def svf_pk_params(fs, f0, q, g0):
    w0 = 2 * np.pi * f0 / fs
    return {
        "a0": 10.0 ** (g0 / 40.0),
        "alpha": np.sin(w0) / (2.0 * q),
        "beta": np.cos(w0) - 1.0,
    }


def svf_pk_run(p, m0, m1, s, scale):
    alpha, beta = p["alpha"], p["beta"]
    a = (p["a0"] - 1.0) * scale + 1.0
    k0 = a * alpha
    k1 = a * beta
    g0 = 1.0 / (alpha + a)
    g1 = a / (k1 - alpha)
    c1 = 2.0 * g0 * (alpha - k1)
    c2 = g1 * beta
    d0 = g0 * a * (k0 + 1.0)
    d1 = g1 * (beta - k0)
    x = s - m0 - m1
    y = d0 * x + d1 * m0 + m1
    m1 = m1 + c2 * m0
    m0 = m0 + c1 * x
    return m0, m1, y


def smf_asym_run(st, s, g0, c0, c1):
    """Simper dynamic smoother (smf.h:58-71). st = (m0, m1)."""
    import jax.numpy as jnp

    from dsp_tpu.ops import dfx as dx

    m0, m1 = st
    if dx.is_df(m0) and not dx.is_df(s):
        s = dx.lift(s)
    if dx.is_df(s) or dx.is_df(m1):
        cc = dx.where(s > m1, c0, c1)
    else:
        cc = jnp.where(s > m1, c0, c1).astype(jnp.result_type(s))
    g = dx.minimum(g0 + cc * dx.absolute(m0 - m1), 0.39)
    m0 = m0 + g * (s - m0)
    m1 = m1 + g * (m0 - m1)
    return (m0, m1), m1


# --- biquad at control rate (direct TDF2 step) ---


def biquad_step(c, m0, m1, s):
    """c: (c0..c4); returns (m0', m1', y)."""
    r = c[0] * s + m0
    m0n = m1 + c[1] * s - c[3] * r
    m1n = c[2] * s - c[4] * r
    return m0n, m1n, r


# --- event engine ---


def cast_params(p, dtype, df=False):
    """Cast float params to the compute dtype at the trace boundary.

    Params are host-side numpy float64 scalars/arrays; under float32 compute
    (TPU) they must not leak f64 into scan carries (strict np.float64 scalars
    promote, unlike weak Python floats). Integer/bool params stay as-is.

    With df=True, float params become exact (hi, lo) double-float pairs
    (dfx.DF) so the f32 control path keeps the f64 design values."""
    import jax.numpy as jnp

    from dsp_tpu.ops import dfx as dx

    out = {}
    for k, v in p.items():
        if isinstance(v, dict):
            out[k] = cast_params(v, dtype, df)
            continue
        a = np.asarray(v)
        if np.issubdtype(a.dtype, np.floating):
            if df:
                hi = a.astype(np.float32)
                lo = (a.astype(np.float64) - hi.astype(np.float64)).astype(np.float32)
                out[k] = dx.DF(jnp.asarray(hi), jnp.asarray(lo))
            else:
                out[k] = jnp.asarray(a, dtype)
        else:
            out[k] = v
    return out


def make_event_state_lo(p):
    """Zero lo-parts (float32) for every float leaf of make_event_state —
    the second half of the double-float event state carried under f32."""
    st = make_event_state(p)
    return {
        k: np.zeros_like(np.asarray(v), dtype=np.float32)
        for k, v in st.items()
        if np.issubdtype(np.asarray(v).dtype, np.floating)
    }


def env_ewma_scan(m0, m0_lo, g, env_in, df):
    """Audio-rate envelope EWMA prefix over axis 0 (matrix4_common.h:282-295).

    env_in: [B, ...]; m0 (+ m0_lo when df) carry the state across blocks.
    Returns (m_hi, m_lo, envs) where envs is [B, ...] (DF when df=True).
    The df path keeps the slow accumulators (~600-sample rise time at the
    defaults) at ~1e-13 relative accuracy — a plain f32 scan drifts enough
    to jitter the event engine's threshold comparisons downstream."""
    import jax
    import jax.numpy as jnp

    from dsp_tpu.ops import dfx as dx

    if not df:

        def comb(pq, qq):
            a1, b1 = pq
            a2, b2 = qq
            return a2 * a1, a2 * b1 + b2

        a = jnp.full(env_in.shape, 1.0 - g, dtype=env_in.dtype)
        b = g * env_in
        aa, bb = jax.lax.associative_scan(comb, (a, b), axis=0)
        envs = aa * m0[None] + bb
        return envs[-1], None, envs

    g_df = dx.const(g)
    ag = dx.const(1.0 - float(np.float64(g)))
    shp = env_in.shape
    a = dx.DF(jnp.full(shp, ag.hi), jnp.full(shp, ag.lo))
    b = g_df * env_in  # DF [B, ...]

    def comb_df(pq, qq):
        a1, b1 = pq
        a2, b2 = qq
        return a2 * a1, a2 * b1 + b2

    aa, bb = jax.lax.associative_scan(comb_df, (a, b), axis=0)
    m0_df = dx.DF(m0[None], m0_lo[None])
    envs = aa * m0_df + bb
    last = envs[-1]
    return last.hi, last.lo, envs


def make_event_params(fs_ds, base_thresh_scale=1.0, base_ord_notch_scale=0.7,
                      rear_ev_mask=1.0, norm_accom_factor=NORM_ACCOM_FACTOR,
                      diff_overshoot=DIFF_OVERSHOOT):
    """Static parameter dict (event_state_init_priv / event_config_init_priv)."""
    from dsp_tpu.effects.biquad import design, normalize, LOWPASS

    p = {}
    p["g_accom"] = ewma_g(fs_ds, ACCOM_TIME)
    p["g_norm"] = ewma_g(fs_ds, NORM_TIME)
    p["g_norm_fast"] = ewma_g(fs_ds, NORM_TIME * 0.625)
    p["g_slow"] = ewma_g(fs_ds, RISE_TIME_SLOW)
    p["g_smooth"] = ewma_g(fs_ds, EVENT_SMOOTH_TIME)
    p["g_avg"] = ewma_g(fs_ds, EVENT_SAMPLE_TIME)
    p["g_drift_slow"] = ewma_g(fs_ds, ACCOM_TIME * 2.0)
    p["g_drift_fast"] = ewma_g(fs_ds, RISE_TIME_FAST)
    p["g_dpwr_slow"] = ewma_g(fs_ds, ACCOM_TIME * 0.5)
    p["g_dpwr_fast"] = ewma_g(fs_ds, RISE_TIME_FAST)
    p["g_ds0"] = ewma_g(fs_ds, RISE_TIME_FAST)
    p["g_ds1"] = ewma_g(fs_ds, RISE_TIME_FAST * 0.3)
    p["g_pwrcmp"] = ewma_g(fs_ds, PWRCMP_RISE_TIME)
    p["g_ord_notch_scale"] = ewma_g(fs_ds, ORD_NOTCH_SCALE_RT * 1000.0)
    p["base_ord_ns"] = base_ord_notch_scale
    c = normalize(*design(LOWPASS, fs_ds, (0.34 * 1000 * 1.5) / RISE_TIME_FAST, 0.577))
    p["ord_lp_c"] = np.array(c)
    p["svf1"] = svf_pk_params(fs_ds, ORD_NOTCH_FREQ_1, 0.5, ORD_NOTCH_GAIN_1)
    p["svf2"] = svf_pk_params(fs_ds, ORD_NOTCH_FREQ_2, 0.5, ORD_NOTCH_GAIN_2)
    p["buf_len"] = time_to_frames(EVENT_SAMPLE_TIME * 0.5, fs_ds)
    p["clip_thresh"] = EVENT_THRESH * base_thresh_scale * 100.0
    p["pcf_sens"] = PWRCMP_FACTOR_SENS / base_thresh_scale
    p["sample_frames"] = time_to_frames(EVENT_SAMPLE_TIME, fs_ds)
    p["max_hold_frames"] = time_to_frames(EVENT_MAX_HOLD_TIME, fs_ds)
    p["min_hold_frames"] = time_to_frames(EVENT_MIN_HOLD_TIME, fs_ds)
    p["ord_factor_c"] = np.exp(-1.0 / (fs_ds * ORD_FACTOR_DECAY))
    p["diff_lim"] = M_PI_4 * diff_overshoot
    p["rear_ev_mask"] = rear_ev_mask
    p["accom_mask_fall"] = ACCOM_TIME / EVENT_MASK_TIME
    p["norm_accom_factor"] = norm_accom_factor
    p["base_thresh_scale"] = base_thresh_scale
    return p


def make_event_state(p):
    """Initial state dict (numpy float64 scalars/arrays)."""
    L = p["buf_len"]
    z = np.float64(0.0)
    st = {
        "sample": np.bool_(False),
        "hold": np.bool_(False),
        "f1_l": np.bool_(False), "f1_r": np.bool_(False),
        "f1_use_ord": np.bool_(False), "f1_fuse": np.bool_(False),
        "f0_l": np.bool_(False), "f0_r": np.bool_(False),
        "f0_use_ord": np.bool_(False), "f0_fuse": np.bool_(False), "f0_end": np.bool_(False),
        "accom": np.zeros(6),
        "norm": np.zeros(4),
        "slow": np.zeros(2),
        "smooth": np.zeros(2),
        "avg": np.zeros(4),
        "drift": np.zeros(4),
        "drift_dpwr": np.zeros(4),
        "drift_scale": np.array([1.0, 0.0]),
        "pwrcmp_factor": z,
        "ord_notch_scale": np.float64(1.0),
        "ord_lp_m": np.zeros((2, 2)),
        "svf_m": np.zeros((4, 2)),
        "dir_lr": z, "dir_cs": z,
        "ord_buf": np.zeros((L, 2)),
        "ord_lp_buf": np.zeros((L, 2)),
        "diff_buf": np.zeros((L, 2)),
        "slope_buf": np.zeros((L, 2)),
        "ds_ord_buf": np.zeros(L),  # calloc'd in C (matrix4_common.c:421)
        "max_buf": np.zeros(L),
        "last": np.zeros(2),
        "slope_last": np.zeros(2),
        "diff_last": np.zeros(2),
        "max1": z, "max0": z,
        "ord_factor": z, "adj": np.float64(1.0), "ds_diff": z,
        "t": np.int64(0), "t_sample": np.int64(0), "t_hold": np.int64(-2),
        "buf_p": np.int64(0),
        "ord_count": np.int64(0), "diff_count": np.int64(0),
        "early_count": np.int64(0), "ignore_count": np.int64(0),
    }
    return st


def event_step(p, st, env, pwr_env, thresh_scale=1.0):
    """One control-rate step (process_events_priv). env/pwr_env: dicts with
    l, r, sum, diff scalars. Returns (st', outputs) with outputs containing
    ax, ax_ev, ax_dpwr, pwrcmp_factor.

    Runs generically over plain arrays (float64 CPU path) or dfx.DF pairs
    (float32 TPU path): all float state leaves, env inputs and float params
    must then be DF; outputs are returned as plain values either way."""
    import jax
    import jax.numpy as jnp

    from dsp_tpu.ops import dfx as dx

    s = dict(st)
    L = p["buf_len"]
    bp = st["buf_p"]

    ord_lr = calc_lr(env["l"], env["r"], env["l"] / env["r"])
    ord_cs = calc_cs(env["sum"], env["diff"], env["sum"] / env["diff"])
    m0a, m1a, ord_lp_lr = biquad_step(p["ord_lp_c"], st["ord_lp_m"][0, 0], st["ord_lp_m"][0, 1], ord_lr)
    m0b, m1b, ord_lp_cs = biquad_step(p["ord_lp_c"], st["ord_lp_m"][1, 0], st["ord_lp_m"][1, 1], ord_cs)
    s["ord_lp_m"] = dx.stack([dx.stack([m0a, m1a]), dx.stack([m0b, m1b])])
    ord_lp_d = st["ord_lp_buf"][bp]  # delayed
    ord_ns = st["ord_notch_scale"] * p["base_ord_ns"]
    svf = st["svf_m"]
    n0m0, n0m1, y0 = svf_pk_run(p["svf1"], svf[0, 0], svf[0, 1], ord_lp_d[0], ord_ns)
    n2m0, n2m1, notched_lr = svf_pk_run(p["svf2"], svf[2, 0], svf[2, 1], y0, ord_ns)
    n1m0, n1m1, y1 = svf_pk_run(p["svf1"], svf[1, 0], svf[1, 1], ord_lp_d[1], ord_ns)
    n3m0, n3m1, notched_cs = svf_pk_run(p["svf2"], svf[3, 0], svf[3, 1], y1, ord_ns)
    s["svf_m"] = dx.stack([
        dx.stack([n0m0, n0m1]), dx.stack([n1m0, n1m1]),
        dx.stack([n2m0, n2m1]), dx.stack([n3m0, n3m1]),
    ])

    ac = st["accom"]
    ac0, out0 = _ewma_set_max(ac[0], pwr_env["l"], p["g_accom"])
    ac1, out1 = _ewma_set_max(ac[1], pwr_env["r"], p["g_accom"])
    ac2, out2 = _ewma_set_max(ac[2], pwr_env["sum"], p["g_accom"])
    ac3, out3 = _ewma_set_max(ac[3], pwr_env["diff"], p["g_accom"])
    adapt_l = pwr_env["l"] - out0
    adapt_r = pwr_env["r"] - out1
    adapt_sum = pwr_env["sum"] - out2
    adapt_diff = pwr_env["diff"] - out3
    diff_lr = calc_lr(adapt_l, adapt_r, dx.sqrt(dx.absolute(adapt_l / adapt_r)))
    diff_cs = calc_cs(adapt_sum, adapt_diff, dx.sqrt(dx.absolute(adapt_sum / adapt_diff)))

    s["ord_buf"] = st["ord_buf"].at[bp].set(dx.stack([ord_lr, ord_cs]))
    s["ord_lp_buf"] = st["ord_lp_buf"].at[bp].set(dx.stack([ord_lp_lr, ord_lp_cs]))
    s["diff_buf"] = st["diff_buf"].at[bp].set(dx.stack([diff_lr, diff_cs]))

    adj = dx.maximum(1.0 - st["ord_factor"] / 20.0, 0.5)
    s["adj"] = adj
    s["ord_factor"] = st["ord_factor"] * p["ord_factor_c"]

    thresh = EVENT_THRESH * thresh_scale
    l_pwr_xf = pwr_env["l"] * (1.0 - NORM_CROSSFEED) + pwr_env["r"] * NORM_CROSSFEED
    r_pwr_xf = pwr_env["r"] * (1.0 - NORM_CROSSFEED) + pwr_env["l"] * NORM_CROSSFEED
    nrm = st["norm"]
    n2_new = _ewma(nrm[2], l_pwr_xf, p["g_norm_fast"])
    n3_new = _ewma(nrm[3], r_pwr_xf, p["g_norm_fast"])
    n0_new = _ewma(nrm[0], dx.absolute(l_pwr_xf - n2_new * p["norm_accom_factor"] * adj), p["g_norm"])
    n1_new = _ewma(nrm[1], dx.absolute(r_pwr_xf - n3_new * p["norm_accom_factor"] * adj), p["g_norm"])
    s["norm"] = dx.stack([n0_new, n1_new, n2_new, n3_new])
    ac4 = _ewma_scale_asym(ac[4], pwr_env["l"], p["g_accom"], 1.0, p["accom_mask_fall"])
    ac5 = _ewma_scale_asym(ac[5], pwr_env["r"], p["g_accom"], 1.0, p["accom_mask_fall"])
    s["accom"] = dx.stack([ac0, ac1, ac2, ac3, ac4, ac5])
    l_mask = dx.maximum(pwr_env["l"] - ac4, 0.0)
    r_mask = dx.maximum(pwr_env["r"] - ac5, 0.0)
    l_mask_norm = dx.where(
        n0_new >= DBL_MIN, l_mask / n0_new, dx.where(l_mask < DBL_MIN, 0.0, p["clip_thresh"])
    )
    r_mask_norm = dx.where(
        n1_new >= DBL_MIN, r_mask / n1_new, dx.where(r_mask < DBL_MIN, 0.0, p["clip_thresh"])
    )
    sm0 = _ewma(st["smooth"][0], dx.minimum(l_mask_norm, p["clip_thresh"]), p["g_smooth"])
    sm1 = _ewma(st["smooth"][1], dx.minimum(r_mask_norm, p["clip_thresh"]), p["g_smooth"])
    s["smooth"] = dx.stack([sm0, sm1])
    sl0 = _ewma(st["slow"][0], sm0, p["g_slow"])
    sl1 = _ewma(st["slow"][1], sm1, p["g_slow"])
    s["slow"] = dx.stack([sl0, sl1])
    l_event = (sm0 - sl0) * adj
    r_event = (sm1 - sl1) * adj
    l_slope = l_event - st["last"][0]
    r_slope = r_event - st["last"][1]
    s["last"] = dx.stack([l_event, r_event])
    s["slope_last"] = dx.stack([l_slope, r_slope])
    s["diff_last"] = dx.stack([diff_lr, diff_cs])
    s["slope_buf"] = st["slope_buf"].at[bp].set(dx.stack([l_slope, r_slope]))
    max_d = st["max_buf"][bp]
    s["max_buf"] = st["max_buf"].at[bp].set(dx.maximum(l_event, r_event))
    s["pwrcmp_factor"] = _ewma_scale_asym(
        st["pwrcmp_factor"], 1.0 - smoothstep(max_d * p["pcf_sens"]), p["g_pwrcmp"],
        1.0, PWRCMP_RISE_TIME / PWRCMP_FALL_TIME,
    )

    # --- event sampling trigger (matrix4_common.c:567-609) ---
    trigger = (~st["sample"]) & (
        ((l_slope > 0.0) & (l_event > thresh)) | ((r_slope > 0.0) & (r_event > thresh))
    )
    new_f1_l = l_event >= r_event
    new_f1_r = r_event >= l_event
    fresh = (st["t"] - st["t_hold"]) > 1
    tr_fresh = trigger & fresh
    tr_fuse = trigger & ~fresh

    # lookback: count how far back the slope keeps increasing (bounded by L)
    sb = s["slope_buf"]
    sel_slope = dx.where(
        new_f1_l & ~new_f1_r, sb[:, 0], dx.where(new_f1_r & ~new_f1_l, sb[:, 1], sb[:, 0] + sb[:, 1])
    )
    # walk: i = bp-1-j, k = bp-j; continue while slope[i] > slope[k]
    j_idx = jnp.arange(1, L)
    i_pos = (bp - 1 - (j_idx - 1)) % L
    k_pos = (bp - (j_idx - 1)) % L
    inc = sel_slope[i_pos] > sel_slope[k_pos]
    steps = jnp.cumprod(inc).sum()  # number of backward steps taken
    lb_start = (bp - steps) % L

    # averaging seed + replay over lookback region. L is static and small
    # (~21 at fs/32 for 44.1 kHz), so unroll at trace time: a nested
    # lax.fori_loop would put a while-loop inside every tick of the outer
    # control scan, and its per-iteration overhead dominates the four masked
    # EWMAs of work. The Python loop emits the identical op sequence
    # (bit-identical results). At high sample rates L grows (~90 at 192 kHz)
    # and the unroll would bloat trace size / compile time, so fall back to
    # fori_loop past a threshold — same masked-EWMA body, same results.
    def _replay_body(j, ra):
        a0, a1, a2, a3 = ra
        idx = (lb_start + j) % L
        use = j < steps
        return (
            dx.where(use, _ewma(a0, s["ord_buf"][idx][0], p["g_avg"]), a0),
            dx.where(use, _ewma(a1, s["ord_buf"][idx][1], p["g_avg"]), a1),
            dx.where(use, _ewma(a2, s["diff_buf"][idx][0], p["g_avg"]), a2),
            dx.where(use, _ewma(a3, s["diff_buf"][idx][1], p["g_avg"]), a3),
        )

    # A closed-form weighted-sum replay (avg = (1-g)^steps * seed +
    # sum_j g (1-g)^(steps-1-j) buf[lb+j]) was tried for the double-float
    # path and rejected: the gather-heavy form benched SLOWER inside the
    # serial control scan on TPU than the unrolled masked EWMAs below, and
    # its ~1e-14 rounding difference flips event decisions over long
    # program material (the engine is chaotic at that scale), breaking the
    # 60 s free-run budget. Both dtypes keep the C-ordered sequential walk.
    ra = (ord_lr, ord_cs, diff_lr, diff_cs)
    if L <= UNROLL_MAX_L:
        for j in range(L):
            ra = _replay_body(j, ra)
        avg_seeded = dx.stack(ra)
    else:
        ra = jax.lax.fori_loop(0, L, _replay_body, ra)
        avg_seeded = dx.stack(ra)

    s["sample"] = jnp.where(trigger, True, st["sample"])
    s["f1_l"] = jnp.where(trigger, new_f1_l, st["f1_l"])
    s["f1_r"] = jnp.where(trigger, new_f1_r, st["f1_r"])
    s["f1_use_ord"] = jnp.where(trigger, False, st["f1_use_ord"])
    s["f1_fuse"] = jnp.where(trigger, tr_fuse, st["f1_fuse"])
    s["t_sample"] = jnp.where(
        tr_fresh, st["t"] - steps, jnp.where(tr_fuse, st["t"] - p["sample_frames"] // 2, st["t_sample"])
    )
    s["max1"] = dx.where(tr_fresh, 0.0, st["max1"])
    s["avg"] = dx.where(tr_fresh, avg_seeded, st["avg"])

    # --- sampling phase (matrix4_common.c:611-657) ---
    in_sample = s["sample"]
    av = s["avg"]
    av = dx.where(
        in_sample,
        dx.stack([
            _ewma(av[0], ord_lr, p["g_avg"]),
            _ewma(av[1], ord_cs, p["g_avg"]),
            _ewma(av[2], diff_lr, p["g_avg"]),
            _ewma(av[3], diff_cs, p["g_avg"]),
        ]),
        av,
    )
    s["avg"] = av
    s["max1"] = dx.where(in_sample, dx.maximum(s["max1"], dx.maximum(l_event, r_event)), s["max1"])
    sample_done = in_sample & ((st["t"] - s["t_sample"]) >= p["sample_frames"])
    use_ord = (dx.absolute(av[2]) + dx.absolute(av[3])) > p["diff_lim"]
    f1_use_ord = jnp.where(sample_done, s["f1_use_ord"] | use_ord, s["f1_use_ord"])
    ignore1 = sample_done & s["f1_fuse"] & f1_use_ord & ~st["f0_use_ord"]
    ignore2 = (
        sample_done & ~ignore1
        & (p["rear_ev_mask"] > 0.0) & (av[3] < -M_PI_4 / 12)
        & ((s["f1_l"] & (l_event < thresh * p["rear_ev_mask"]))
           | (s["f1_r"] & (r_event < thresh * p["rear_ev_mask"])))
    )
    accept = sample_done & ~ignore1 & ~ignore2
    s["sample"] = jnp.where(sample_done, False, s["sample"])
    s["f1_use_ord"] = f1_use_ord
    s["ignore_count"] = st["ignore_count"] + jnp.where(ignore1 | ignore2, 1, 0)
    s["hold"] = jnp.where(accept, True, st["hold"])
    s["t_hold"] = jnp.where(accept, st["t"], st["t_hold"])
    dir_lr_new = dx.where(f1_use_ord, av[0], av[2])
    dir_cs_new = dx.where(f1_use_ord, av[1], av[3])
    s["dir_lr"] = dx.where(accept, dir_lr_new, st["dir_lr"])
    s["dir_cs"] = dx.where(accept, dir_cs_new, st["dir_cs"])
    s["ord_factor"] = s["ord_factor"] + (accept & f1_use_ord).astype(s["ord_factor"].dtype)
    s["ord_count"] = st["ord_count"] + jnp.where(accept & f1_use_ord & ~s["f1_fuse"], 1, 0)
    s["diff_count"] = st["diff_count"] + jnp.where(accept & ~f1_use_ord & ~s["f1_fuse"], 1, 0)
    s["f0_l"] = jnp.where(accept, s["f1_l"], st["f0_l"])
    s["f0_r"] = jnp.where(accept, s["f1_r"], st["f0_r"])
    s["f0_use_ord"] = jnp.where(accept, f1_use_ord, st["f0_use_ord"])
    s["f0_fuse"] = jnp.where(accept, s["f1_fuse"], st["f0_fuse"])
    s["f0_end"] = jnp.where(accept, False, st["f0_end"])
    s["max0"] = dx.where(accept, s["max1"], st["max0"])
    ds_diff_new = 1.0 + smoothstep((s["max1"] - thresh) / (thresh * DIFF_WEIGHT_SCALE)) * DIFF_SENS_WEIGHT
    s["ds_diff"] = dx.where(accept, ds_diff_new, st["ds_diff"])
    ds1 = dx.where(accept, ds_diff_new * 0.25, st["drift_scale"][1])

    # --- hold / drift phase (matrix4_common.c:658-698) ---
    hold = s["hold"]
    dr = st["drift"]
    dp = st["drift_dpwr"]
    ds_diff_run = _ewma_scale(ds1, s["ds_diff"], p["g_ds1"], s["ds_diff"])
    dr2_h = _ewma_scale(dr[2], s["dir_lr"], p["g_drift_fast"], ds_diff_run)
    dr3_h = _ewma_scale(dr[3], s["dir_cs"], p["g_drift_fast"], ds_diff_run)
    end_trig = ((s["f0_l"] & (sm0 <= EVENT_END_THRESH)) | (s["f0_r"] & (sm1 <= EVENT_END_THRESH)))
    f0_end = s["f0_end"] | (hold & end_trig)
    held_frames = st["t"] - s["t_hold"]
    release = hold & (
        ((held_frames >= p["min_hold_frames"]) & f0_end) | (held_frames >= p["max_hold_frames"])
    )
    s["early_count"] = st["early_count"] + jnp.where(release & (held_frames < p["max_hold_frames"]), 1, 0)
    s["f0_end"] = f0_end
    dp2_h = _ewma_scale(dp[2], s["dir_lr"], p["g_dpwr_fast"], ds_diff_run)
    dp3_h = _ewma_scale(dp[3], s["dir_cs"], p["g_dpwr_fast"], ds_diff_run)

    # non-hold path
    ds_ord_prev = st["ds_ord_buf"][bp]
    ds_ord_in = _drift_err_scale(dr[0], dr[1], notched_lr, notched_cs, ORD_SENS_ERR) * ds_ord_prev
    ds0_new, ds_ord = _ewma_set_max(st["drift_scale"][0], ds_ord_in, p["g_ds0"])
    dr0_nh = _ewma_scale(dr[0], notched_lr, p["g_drift_slow"], ds_ord)
    dr1_nh = _ewma_scale(dr[1], notched_cs, p["g_drift_slow"], ds_ord)
    ds_dpwr = _drift_err_scale(dp[0], dp[1], ord_lp_lr, ord_lp_cs, ORD_DPWR_SENS_ERR)
    dp0_nh = _ewma_scale(dp[0], ord_lp_lr, p["g_dpwr_slow"], ds_dpwr)
    dp1_nh = _ewma_scale(dp[1], ord_lp_cs, p["g_dpwr_slow"], ds_dpwr)

    ax_lr = dx.where(hold, dr2_h, dr0_nh)
    ax_cs = dx.where(hold, dr3_h, dr1_nh)
    ax_ev_lr = dx.where(hold, dr2_h, 0.0)
    ax_ev_cs = dx.where(hold, dr3_h, 0.0)
    ax_dpwr_lr = dx.where(hold, dp2_h, dp0_nh)
    ax_dpwr_cs = dx.where(hold, dp3_h, dp1_nh)

    # on release: seed slow drift from the current axes
    drift_new = dx.stack([
        dx.where(release, ax_lr, dx.where(hold, dr[0], dr0_nh)),
        dx.where(release, ax_cs, dx.where(hold, dr[1], dr1_nh)),
        dx.where(hold, dr2_h, ax_lr),
        dx.where(hold, dr3_h, ax_cs),
    ])
    s["drift"] = drift_new
    # after each step dpwr[0]==dpwr[2] and dpwr[1]==dpwr[3]: the running pair
    # is copied into the other via ewma_set (matrix4_common.c:678-679,696-697)
    dpwr_lr_new = dx.where(hold, dp2_h, dp0_nh)
    dpwr_cs_new = dx.where(hold, dp3_h, dp1_nh)
    s["drift_dpwr"] = dx.stack([dpwr_lr_new, dpwr_cs_new, dpwr_lr_new, dpwr_cs_new])
    s["drift_scale"] = dx.stack([
        dx.where(release, 1.0, dx.where(hold, st["drift_scale"][0], ds0_new)),
        dx.where(hold, ds_diff_run, ds1),
    ])
    s["hold"] = jnp.where(release, False, s["hold"])

    ax_lr_n, ax_cs_n = _norm_axes(ax_lr, ax_cs)
    ax_dpwr_lr_n, ax_dpwr_cs_n = _norm_axes(ax_dpwr_lr, ax_dpwr_cs)
    ons_new, _ = _ewma_set_max(st["ord_notch_scale"], _ord_notch_scale(ax_lr_n, ax_cs_n), p["g_ord_notch_scale"])
    s["ord_notch_scale"] = ons_new
    ds_ord_thresh = thresh * ORD_WEIGHT_THRESH
    x_w = (dx.maximum(sm0, sm1) - ds_ord_thresh) / (thresh * 1.5 - ds_ord_thresh)
    s["ds_ord_buf"] = s["ds_ord_buf"].at[bp].set(
        dx.where(
            (sm0 > ds_ord_thresh) | (sm1 > ds_ord_thresh), smoothstep(x_w) * ORD_SENS_WEIGHT + 1.0, 1.0
        )
    )
    s["t"] = st["t"] + 1
    s["buf_p"] = (bp + 1) % L

    # outputs keep the carry precision (DF under f32): the matrix-coefficient
    # computation downstream has sensitivity pockets (tan edges, small
    # normalization divides) that amplify f32 axis rounding to ~-113 dBFS,
    # so it too runs in df (calc_matrix_coefs_* are dx-generic)
    out = {
        "ax_lr": ax_lr_n, "ax_cs": ax_cs_n,
        "ax_ev_lr": ax_ev_lr, "ax_ev_cs": ax_ev_cs,
        "ax_dpwr_lr": ax_dpwr_lr_n, "ax_dpwr_cs": ax_dpwr_cs_n,
        "pwrcmp_factor": s["pwrcmp_factor"],
        "hold": s["hold"],
    }
    return s, out


# --- matrix coefficient calculation (matrix4_common.c:715-978) ---


def _pwr_sum(a, b):
    from dsp_tpu.ops import dfx as dx

    return dx.sqrt(a * a + b * b)


def _input_phasors(ph_lr, ph_cs):
    """Complex input phasors for the dominant direction
    (matrix4_common.c:894-917)."""
    from dsp_tpu.ops import dfx as dx

    sin_lr = dx.sin(ph_lr + M_PI_4)
    cos_lr = dx.cos(ph_lr + M_PI_4)
    inside = (dx.absolute(ph_lr) + dx.absolute(ph_cs)) < M_PI_4
    ratio = dx.sin(2.0 * ph_cs) / dx.where(inside, dx.cos(2.0 * ph_lr), dx.full_like(ph_lr, 1.0))
    alpha = dx.sqrt(dx.maximum(1.0 - ratio * ratio, 0.0))
    beta = dx.sqrt(1.0 + alpha)
    gamma = dx.sqrt(dx.maximum(1.0 - alpha, 0.0))
    neg = ph_cs < 0.0
    sin_theta_in = dx.where(neg, 0.5 * (beta + gamma), 0.5 * (beta - gamma))
    cos_theta_in = dx.where(neg, 0.5 * (beta - gamma), 0.5 * (beta + gamma))
    zero = dx.zeros_like(sin_theta_in)
    one = dx.full_like(sin_theta_in, 1.0) if dx.is_df(sin_theta_in) else None
    if dx.is_df(sin_theta_in):
        sin_theta = dx.where(inside, sin_theta_in, dx.where(neg, one, zero))
        cos_theta = dx.where(inside, cos_theta_in, dx.where(neg, zero, one))
    else:
        import jax.numpy as jnp

        sin_theta = jnp.where(inside, sin_theta_in, neg.astype(sin_theta_in.dtype))
        cos_theta = jnp.where(inside, cos_theta_in, (~neg).astype(cos_theta_in.dtype))
    l_real = sin_lr * cos_theta
    l_imag = sin_lr * sin_theta
    r_real = cos_lr * cos_theta
    r_imag = cos_lr * -sin_theta
    return l_real, l_imag, r_real, r_imag


def calc_matrix_coefs_v1(ax_lr, ax_cs, dp_lr, dp_cs, surr_mult, surr_mult_rear,
                         param, shelf_args):
    """v1 matrix: no steering of rear-encoded signals."""
    from dsp_tpu.ops import dfx as dx

    lr, cs = ax_lr, ax_cs
    abs_lr = dx.absolute(lr)
    gl = 1.0 + dx.tan(abs_lr - M_PI_4)
    gc_2 = dx.where(cs > 0.0, 0.5 + 0.5 * dx.tan(cs - M_PI_4), 0.0)
    lsl = 1.0 - gc_2
    lsr = -gc_2
    rsl = lsr
    rsr = lsl
    cs_gl = dx.where(cs > -M_PI_4 / 2, 3.0 * cs, cs - M_PI_4)
    fa = dx.where(cs >= 0.0, 1.0, 1.0 + dx.sin(cs_gl))
    fb = dx.where(cs >= 0.0, 1.0, dx.cos(cs_gl))
    lsl = dx.where(lr > 0.0, lsl - gl * gl * fa, lsl)
    lsr = dx.where(lr > 0.0, lsr - gl * fb, lsr)
    rsl = dx.where(lr < 0.0, rsl - gl * fb, rsl)
    rsr = dx.where(lr < 0.0, rsr - gl * gl * fa, rsr)
    pu_sl = _pwr_sum(lsl, lsr)
    lsl = lsl / pu_sl
    lsr = lsr / pu_sl
    pu_sr = _pwr_sum(rsl, rsr)
    rsl = rsl / pu_sr
    rsr = rsr / pu_sr

    l_real, l_imag, r_real, r_imag = _input_phasors(dp_lr, dp_cs)
    gd_sl2 = (lsl * l_real + lsr * r_real) ** 2 + (lsl * l_imag + lsr * r_imag) ** 2
    gd_sr2 = (rsl * l_real + rsr * r_real) ** 2 + (rsl * l_imag + rsr * r_imag) ** 2
    pd_s = gd_sl2 + gd_sr2

    surr_mult2 = surr_mult * surr_mult
    adj_norm_mult2 = 1.0 / (1.0 + surr_mult2)
    surr_pwr = surr_mult2 * adj_norm_mult2
    pdc_f = dx.sqrt(1.0 - surr_pwr * dx.minimum(pd_s, 1.0))
    pdc_s = dx.sqrt(surr_pwr)

    rets = []
    for arg in shelf_args:
        hf2 = arg * arg
        anm = 1.0 / (1.0 + hf2)
        spw = hf2 * anm
        front = dx.sqrt(1.0 - spw * dx.minimum(pd_s, 1.0)) / pdc_f
        surr = dx.sqrt(spw) / dx.maximum(pdc_s, DBL_MIN)
        rets.append((front, surr))

    m = {
        "ll": pdc_f, "lr": dx.zeros_like(pdc_f), "rl": dx.zeros_like(pdc_f), "rr": pdc_f,
        "lsl": lsl * pdc_s, "lsr": lsr * pdc_s, "rsl": rsl * pdc_s, "rsr": rsr * pdc_s,
    }
    return m, rets


def calc_matrix_coefs_v4(ax_lr, ax_cs, dp_lr, dp_cs, surr_mult, surr_mult_rear,
                         param, shelf_args):
    """v4 matrix: full rear steering with adjustable surround separation."""
    from dsp_tpu.ops import dfx as dx

    lr, cs = ax_lr, ax_cs
    abs_lr = dx.absolute(lr)
    abs_cs = dx.absolute(cs)
    lsl = dx.ones_like(lr)
    rsr = dx.ones_like(lr)
    lsr = dx.zeros_like(lr)
    rsl = dx.zeros_like(lr)
    gl = 1.0 + dx.tan(abs_lr - M_PI_4)
    lsl = dx.where(lr > 0.0, lsl - gl * gl, lsl)
    lsr = dx.where(lr > 0.0, lsr - gl, lsr)
    rsl = dx.where(lr < 0.0, rsl - gl, rsl)
    rsr = dx.where(lr < 0.0, rsr - gl * gl, rsr)
    gc_2_pos = 0.5 + 0.5 * dx.tan(abs_cs - M_PI_4)
    cs_gc = dx.where(cs > -M_PI_4 / 2, abs_cs, M_PI_4 + cs)
    gc_2_neg = 0.5 + 0.5 * dx.tan(cs_gc - M_PI_4)
    lsl = dx.where(cs > 0.0, lsl - gc_2_pos, dx.where(cs < 0.0, lsl - gc_2_neg, lsl))
    lsr = dx.where(cs > 0.0, lsr - gc_2_pos, dx.where(cs < 0.0, lsr + gc_2_neg, lsr))
    rsl = dx.where(cs > 0.0, rsl - gc_2_pos, dx.where(cs < 0.0, rsl + gc_2_neg, rsl))
    rsr = dx.where(cs > 0.0, rsr - gc_2_pos, dx.where(cs < 0.0, rsr - gc_2_neg, rsr))
    pu_sl = _pwr_sum(lsl, lsr)
    lsl = lsl / pu_sl
    lsr = lsr / pu_sl
    pu_sr = _pwr_sum(rsl, rsr)
    rsl = rsl / pu_sr
    rsr = rsr / pu_sr

    # front elements
    front_gc_2 = 0.5 + 0.5 * dx.tan(abs_cs - M_PI_4)
    front_cs = dx.where(cs > -M_PI_4 / 2, 4.0 * abs_cs, M_PI_2)
    front_lr_mult = dx.where(abs_lr <= M_PI_4 / 2, 1.0, 1.0 + dx.cos(4.0 * abs_lr)) * param
    ll_n = -front_gc_2
    rr_n = -front_gc_2
    lr_n = front_gc_2 + dx.zeros_like(front_gc_2)
    rl_n = front_gc_2 + dx.zeros_like(front_gc_2)
    ll_n = dx.where(lr > 0.0, ll_n - gl * gl * dx.sin(front_cs) * front_lr_mult, ll_n)
    lr_n = dx.where(lr > 0.0, lr_n + gl * (1.0 - dx.cos(front_cs)) * front_lr_mult, lr_n)
    rl_n = dx.where(lr < 0.0, rl_n + gl * (1.0 - dx.cos(front_cs)) * front_lr_mult, rl_n)
    rr_n = dx.where(lr < 0.0, rr_n - gl * gl * dx.sin(front_cs) * front_lr_mult, rr_n)
    cf_sm2 = dx.minimum(surr_mult_rear, 1.0) ** 2
    cf = 1.0 - dx.sqrt((1.0 - cf_sm2) / (1.0 + cf_sm2))
    ll_n = 1.0 + ll_n * cf
    lr_n = lr_n * cf
    rl_n = rl_n * cf
    rr_n = 1.0 + rr_n * cf
    pu_fl = _pwr_sum(ll_n, lr_n)
    pu_fr = _pwr_sum(rl_n, rr_n)
    ll = dx.where(cs >= 0.0, 1.0, ll_n / pu_fl)
    lrm = dx.where(cs >= 0.0, 0.0, lr_n / pu_fl)
    rl = dx.where(cs >= 0.0, 0.0, rl_n / pu_fr)
    rr = dx.where(cs >= 0.0, 1.0, rr_n / pu_fr)

    l_real, l_imag, r_real, r_imag = _input_phasors(dp_lr, dp_cs)
    gd_fl2 = (ll * l_real + lrm * r_real) ** 2 + (ll * l_imag + lrm * r_imag) ** 2
    gd_fr2 = (rl * l_real + rr * r_real) ** 2 + (rl * l_imag + rr * r_imag) ** 2
    gd_sl2 = (lsl * l_real + lsr * r_real) ** 2 + (lsl * l_imag + lsr * r_imag) ** 2
    gd_sr2 = (rsl * l_real + rsr * r_real) ** 2 + (rsl * l_imag + rsr * r_imag) ** 2
    pd_f = gd_fl2 + gd_fr2
    pd_s = gd_sl2 + gd_sr2

    # weighted directional power
    abs_dp_lr = dx.absolute(dp_lr)
    abs_dp_cs = dx.absolute(dp_cs)
    lr2 = dp_lr * dp_lr
    cs2 = dp_cs * dp_cs
    wf_in = dx.where(lr2 + cs2 > DBL_MIN, ((lr2 - cs2) / dx.maximum(lr2 + cs2, DBL_MIN)) ** 2, 0.0)
    case_a = (dp_cs < 0.0) & (abs_dp_cs < abs_dp_lr)
    case_b = (dp_cs < 0.0) & ~case_a
    pd_f_wf = dx.where(case_a, (pd_f - 1.0) * wf_in + 1.0, dx.where(case_b, 1.0, pd_f))
    pd_s_wf = dx.where(case_a, (pd_s - 1.0) * wf_in + 1.0, dx.where(case_b, 1.0, pd_s))
    pd_f_ws = dx.where(case_a, (pd_f - 1.0) * (1.0 - wf_in) + 1.0, dx.where(case_b, pd_f, 1.0))
    pd_s_ws = dx.where(case_a, (pd_s - 1.0) * (1.0 - wf_in) + 1.0, dx.where(case_b, pd_s, 1.0))

    surr_mult2 = surr_mult * surr_mult
    adj_norm_mult2 = 1.0 / (1.0 + surr_mult2)
    pdc_fi2 = (1.0 - surr_mult2 * adj_norm_mult2 * pd_s_wf) / pd_f_wf
    pdc_si2 = (1.0 - adj_norm_mult2 * pd_f_ws) / pd_s_ws
    pdc_all2 = 1.0 / (pd_f * pdc_fi2 + pd_s * pdc_si2)
    pdc_f = dx.sqrt(dx.maximum(pdc_fi2, 0.0) * pdc_all2)
    pdc_s = dx.sqrt(dx.maximum(pdc_si2, 0.0) * pdc_all2)

    rets = []
    for arg in shelf_args:
        hf2 = arg * arg
        anm = 1.0 / (1.0 + hf2)
        fi2 = (1.0 - hf2 * anm * pd_s_wf) / pd_f_wf
        si2 = (1.0 - anm * pd_f_ws) / pd_s_ws
        all2 = 1.0 / (pd_f * fi2 + pd_s * si2)
        front = dx.sqrt(dx.maximum(fi2, 0.0) * all2) / pdc_f
        surr = dx.sqrt(dx.maximum(si2, 0.0) * all2) / dx.maximum(pdc_s, DBL_MIN)
        rets.append((front, surr))

    m = {
        "ll": ll * pdc_f, "lr": lrm * pdc_f, "rl": rl * pdc_f, "rr": rr * pdc_f,
        "lsl": lsl * pdc_s, "lsr": lsr * pdc_s, "rsl": rsl * pdc_s, "rsr": rsr * pdc_s,
    }
    return m, rets


def phase_flip_pos_rs(ax_lr, ax_cs):
    from dsp_tpu.ops import dfx as dx

    x = ax_cs * (-2.0 / M_PI_4)
    x = x * x * 0.5 + 0.5
    return dx.where(ax_cs >= 0.0, 0.5, dx.minimum(x, 1.0))


def phase_flip_ap1_c0(c0_const, c1_const, pos):
    from dsp_tpu.ops import dfx as dx

    return dx.exp(pos * (c1_const - c0_const) + c0_const) - 1.0


def surr_direct_pan(ax_lr, ax_cs):
    from dsp_tpu.ops import dfx as dx

    x = dx.absolute(ax_lr)
    y0 = ax_cs + (M_PI_4 / 2)
    y = dx.where(ax_cs > -M_PI_4 / 2, y0 * 2.0, y0)
    z = dx.minimum(dx.maximum(x - y, 0.0) * 6.0, M_PI_2)
    amb = dx.where(ax_cs >= 0.0, 1.0, dx.cos(z))
    dire = dx.where(ax_cs >= 0.0, 0.0, dx.sin(z))
    return amb, dire
