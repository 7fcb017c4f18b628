"""Unit tests for the double-float (two-float32) ops in dsp_tpu.ops.dfx.

Every operation is checked against numpy float64 on value ranges the matrix4
event engine actually produces (envelope powers spanning ~1e-12..1e2, angles
in [-pi/4, pi/4], ratios in [0, inf]). The accuracy bar is ~1e-13 relative —
double-float (two f32) carries a ~49-bit mantissa, and the engine needs ~1e-9
to keep event decisions aligned with the C double build.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from dsp_tpu.ops import dfx


def _df_from64(x):
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    with np.errstate(invalid="ignore"):
        lo = np.where(np.isfinite(x), x - hi.astype(np.float64), 0.0).astype(np.float32)
    return dfx.DF(jnp.asarray(hi), jnp.asarray(lo))


def _val64(d):
    return np.asarray(d.hi, dtype=np.float64) + np.asarray(d.lo, dtype=np.float64)


RNG = np.random.default_rng(7)


def _rand(n, lo=-100.0, hi=100.0, log=False):
    if log:
        m = RNG.uniform(np.log(1e-12), np.log(1e2), n)
        s = RNG.choice([-1.0, 1.0], n)
        return s * np.exp(m)
    return RNG.uniform(lo, hi, n)


class TestArith:
    def test_add_sub_cancellation(self):
        a = _rand(4096, log=True)
        b = a * (1.0 + RNG.uniform(-1e-6, 1e-6, a.shape))  # near-equal: cancellation
        da, db = _df_from64(a), _df_from64(b)
        # expected values from the df-ROUNDED inputs: df holds ~49 mantissa
        # bits, so the raw f64 inputs carry ~3.5e-15 representation error that
        # cancellation amplifies; the ops themselves must be near-exact
        av, bv = _val64(da), _val64(db)
        np.testing.assert_allclose(_val64(da + db), av + bv, rtol=1e-13, atol=1e-30)
        np.testing.assert_allclose(_val64(da - db), av - bv, rtol=1e-13, atol=1e-30)

    def test_mul_div(self):
        a = _rand(4096, log=True)
        b = _rand(4096, log=True)
        rm = _val64(_df_from64(a) * _df_from64(b))
        rd = _val64(_df_from64(a) / _df_from64(b))
        np.testing.assert_allclose(rm, a * b, rtol=1e-13)
        np.testing.assert_allclose(rd, a / b, rtol=1e-13)

    def test_div_edge_cases(self):
        a = _df_from64(np.array([1.0, 1.0, 0.0, -3.0]))
        b = _df_from64(np.array([0.0, np.inf, 0.0, 0.0]))
        r = _val64(a / b)
        assert np.isposinf(r[0])
        assert r[1] == 0.0
        assert np.isnan(r[2])
        assert np.isneginf(r[3])

    def test_scalar_lift_exact(self):
        # Python-float constants must be split exactly (not rounded to f32)
        c = 0.1234567890123456
        r = _val64(dfx.lift(c) + _df_from64(np.zeros(3)))
        np.testing.assert_allclose(r, c, rtol=1e-15)

    def test_pow_int(self):
        a = _rand(512, lo=0.01, hi=3.0)
        np.testing.assert_allclose(_val64(_df_from64(a) ** 2), a**2, rtol=1e-13)
        np.testing.assert_allclose(_val64(_df_from64(a) ** 5), a**5, rtol=1e-12)

    def test_neg_abs(self):
        a = _rand(1024, log=True)
        av = _val64(_df_from64(a))
        np.testing.assert_allclose(_val64(-_df_from64(a)), -av, rtol=1e-15)
        np.testing.assert_allclose(_val64(dfx.absolute(_df_from64(a))), np.abs(av), rtol=1e-15)


class TestCompare:
    def test_near_tie_resolution(self):
        # differences far below f32 resolution must still order correctly
        base = 1.2345
        eps = np.array([1e-10, -1e-10, 3e-12, -3e-12, 0.0])
        a = _df_from64(np.full(5, base))
        b = _df_from64(base + eps)
        lt = np.asarray(a < b)
        gt = np.asarray(a > b)
        np.testing.assert_array_equal(lt, eps > 0)
        np.testing.assert_array_equal(gt, eps < 0)

    def test_mixed_scalar(self):
        a = _df_from64(np.array([0.5, 1.5]))
        assert np.asarray(a > 1.0).tolist() == [False, True]
        assert np.asarray(a <= 0.5).tolist() == [True, False]

    def test_max_min_where(self):
        a = _rand(512)
        b = _rand(512)
        np.testing.assert_allclose(
            _val64(dfx.maximum(_df_from64(a), _df_from64(b))), np.maximum(a, b), rtol=1e-13
        )
        np.testing.assert_allclose(
            _val64(dfx.minimum(_df_from64(a), _df_from64(b))), np.minimum(a, b), rtol=1e-13
        )
        c = a > 0
        np.testing.assert_allclose(
            _val64(dfx.where(c, _df_from64(a), _df_from64(b))), np.where(c, a, b), rtol=1e-13
        )

    def test_where_passthrough_plain(self):
        a = jnp.asarray(np.array([1.0, 2.0]))
        r = dfx.where(jnp.asarray([True, False]), a, 0.0)
        assert not isinstance(r, dfx.DF)


class TestFuncs:
    def test_sqrt(self):
        a = np.abs(_rand(4096, log=True))
        r = _val64(dfx.sqrt(_df_from64(a)))
        np.testing.assert_allclose(r, np.sqrt(a), rtol=1e-13)

    def test_sqrt_zero_inf(self):
        r = _val64(dfx.sqrt(_df_from64(np.array([0.0, np.inf]))))
        assert r[0] == 0.0 and np.isposinf(r[1])

    def test_atan_pos_range(self):
        # dense sweep over the reduction segments + extremes
        x = np.concatenate(
            [
                np.linspace(0, 2.0, 20001),
                np.exp(RNG.uniform(np.log(1e-12), np.log(1e12), 8192)),
                np.array([0.0, 1.0, 0.125, 0.375, 0.625, 0.875, 1e30]),
            ]
        )
        r = _val64(dfx.atan_pos(_df_from64(x)))
        np.testing.assert_allclose(r, np.arctan(x), rtol=2e-13, atol=1e-16)

    def test_atan_pos_inf_nan(self):
        r = _val64(dfx.atan_pos(_df_from64(np.array([np.inf, np.nan]))))
        np.testing.assert_allclose(r[0], np.pi / 2, rtol=1e-13)
        assert np.isnan(r[1])

    def test_clip(self):
        a = _rand(512, lo=-2, hi=2)
        np.testing.assert_allclose(
            _val64(dfx.clip(_df_from64(a), 0.0, 1.0)), np.clip(a, 0, 1), rtol=1e-13
        )

    def test_stack_getitem_atset(self):
        a = _rand(16)
        b = _rand(16)
        s = dfx.stack([_df_from64(a), _df_from64(b)], axis=1)
        assert s.shape == (16, 2)
        np.testing.assert_allclose(_val64(s[3]), np.stack([a, b], 1)[3], rtol=1e-13)
        s2 = s.at[0].set(dfx.lift(0.25))
        np.testing.assert_allclose(_val64(s2[0]), 0.25, rtol=1e-15)


class TestStateDict:
    def test_wrap_split_roundtrip(self):
        st = {
            "a": jnp.asarray(np.float32([1.5, 2.5])),
            "flag": jnp.asarray(np.array([True])),
            "n": jnp.asarray(np.int64(3)),
        }
        lo = {"a": jnp.asarray(np.float32([1e-9, -1e-9]))}
        w = dfx.wrap_dict(st, lo)
        assert isinstance(w["a"], dfx.DF)
        assert not isinstance(w["flag"], dfx.DF)
        hi, lo2 = dfx.split_dict(w, lo_keys=set(lo))
        np.testing.assert_array_equal(np.asarray(hi["a"]), np.asarray(st["a"]))
        np.testing.assert_array_equal(np.asarray(lo2["a"]), np.asarray(lo["a"]))
        assert "flag" not in lo2


class TestAccumulation:
    def test_ewma_long_horizon(self):
        """A slow EWMA (the engine's accom/norm accumulators) run 100k steps:
        df must stay ~1e-12 of the f64 reference where plain f32 drifts ~1e-5."""
        g = 1e-3
        x = np.abs(RNG.standard_normal(100_000)) + 0.1
        m64 = 0.0
        for v in x[:0]:  # vectorized below instead
            pass
        # f64 reference via lfilter-style recursion
        m64 = np.zeros(())
        ref = np.zeros_like(x)
        acc = 0.0
        for i, v in enumerate(x):
            acc = acc + g * (v - acc)
            ref[i] = acc

        def step_df(m, v):
            m = m + dfx.lift(np.float32(g)) * (dfx.lift(v) - m)
            return m, m.hi + m.lo

        xs = jnp.asarray(x, jnp.float32)

        def scan_fn(m, v):
            m2, out = step_df(m, v)
            return m2, out

        m0 = dfx.DF(jnp.float32(0.0), jnp.float32(0.0))
        _, outs = jax.lax.scan(scan_fn, m0, xs)
        err = np.max(np.abs(np.asarray(outs, dtype=np.float64) - ref))
        # output readback is f32-quantized, so the bar is f32 eps of the
        # value, NOT accumulated drift (which plain f32 shows at ~1e-4)
        assert err < 5e-7, err

        # the carried state itself must track at df precision
        m_final, _ = jax.lax.scan(scan_fn, m0, xs)
        df_val = float(np.asarray(m_final.hi, np.float64) + np.asarray(m_final.lo, np.float64))
        assert abs(df_val - ref[-1]) < 1e-9 * max(1.0, abs(ref[-1]))


class TestTranscendentals:
    def test_sin_cos_tan(self):
        x = RNG.uniform(-3.3, 3.3, 20001)
        np.testing.assert_allclose(_val64(dfx.sin(_df_from64(x))), np.sin(x), atol=3e-14)
        np.testing.assert_allclose(_val64(dfx.cos(_df_from64(x))), np.cos(x), atol=3e-14)
        xt = x[np.abs(np.cos(x)) > 0.3]
        np.testing.assert_allclose(_val64(dfx.tan(_df_from64(xt))), np.tan(xt), rtol=1e-11, atol=1e-13)

    def test_exp(self):
        # engine range: phase_flip ap1 exponents land in about [-9, 1]
        x = RNG.uniform(-12, 3, 20001)
        np.testing.assert_allclose(_val64(dfx.exp(_df_from64(x))), np.exp(x), rtol=5e-13)

    def test_plain_passthrough(self):
        a = jnp.asarray(np.float64([0.5, -1.0]))
        for f in (dfx.sin, dfx.cos, dfx.tan, dfx.exp):
            assert not isinstance(f(a), dfx.DF)


class TestDfFft:
    def test_pow2_and_bluestein(self):
        from dsp_tpu.ops.dfx_fft import DfDft, df_lift_array

        for N in (64, 735, 1176, 5120):
            x = RNG.standard_normal((N, 2))
            plan = DfDft(N)
            xd = df_lift_array(jnp.asarray(x))
            Xr, Xi = plan.rfft(xd)
            ref = np.fft.rfft(x, axis=0)
            got = _val64(Xr) + 1j * _val64(Xi)
            assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-13, N
            y = plan.irfft(Xr, Xi)
            assert np.abs(_val64(y) - x).max() < 1e-12, N
