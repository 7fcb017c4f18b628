import numpy as np
import pytest

from dsp_tpu.chain import CompiledChain, build_chain_from_string
from dsp_tpu.core.types import StreamInfo


def _chain(s, fs=44100, ch=2):
    return build_chain_from_string(s, StreamInfo(fs, ch))


def _run(chain_str, x, block=2048):
    c = _chain(chain_str)
    cc = CompiledChain(c, block_frames=block)
    return c, cc.process_array(x, drain=True)


@pytest.fixture(scope="module")
def steering_input():
    n = 44100
    t = np.arange(n) / 44100.0
    x = np.zeros((n, 2))
    x[:, 0] = 0.4 * np.sin(2 * np.pi * 440 * t)
    x[:, 1] = x[:, 0].copy()
    x[n // 2 :, 1] = 0.0  # second half: hard left
    return x


class TestMatrix4:
    def test_channels_and_length(self, steering_input):
        c, y = _run("matrix4 -3/0", steering_input)
        assert c.ostream.channels == 4
        assert y.shape[1] == 4
        assert np.isfinite(y).all()

    def test_power_preservation(self, steering_input):
        c, y = _run("matrix4 -3/0", steering_input)
        ratio = (y**2).sum() / (steering_input**2).sum()
        assert 0.95 < ratio < 1.05

    def test_steering(self, steering_input):
        c, y = _run("matrix4 -3/0", steering_input)
        n = len(steering_input)
        # centered content: essentially no surround output
        center_rms = np.sqrt((y[5000 : n // 2, 2] ** 2).mean())
        left_rms = np.sqrt((y[n // 2 + 8000 :, 2] ** 2).mean())
        assert center_rms < 1e-3
        assert left_rms > center_rms * 10

    def test_direct_path_six_channels(self, steering_input):
        c, y = _run("matrix4 direct_path 0", steering_input[:8192])
        assert c.ostream.channels == 6

    def test_matrix_v1(self, steering_input):
        c, y = _run("matrix4 matrix=v1 -3", steering_input[:8192])
        assert np.isfinite(y).all()

    def test_requires_two_channels(self):
        from dsp_tpu.chain.parser import ChainParseError

        with pytest.raises(ChainParseError):
            build_chain_from_string("matrix4", StreamInfo(44100, 1))

    def test_requires_32k(self):
        from dsp_tpu.chain.parser import ChainParseError

        with pytest.raises(ChainParseError):
            build_chain_from_string("matrix4", StreamInfo(22050, 2))

    def test_bad_option(self):
        from dsp_tpu.chain.parser import ChainParseError

        with pytest.raises(ChainParseError):
            _chain("matrix4 bogus_option=1")


class TestMatrix4Mb:
    def test_basic(self, steering_input):
        c, y = _run("matrix4_mb -3/0", steering_input)
        assert c.ostream.channels == 4
        assert np.isfinite(y).all()
        ratio = (y**2).sum() / (steering_input**2).sum()
        assert 0.9 < ratio < 1.1

    def test_prepends_phase_lin_fir(self):
        c = _chain("matrix4_mb")
        names = [type(e).__name__ for e in c.effects]
        assert names[0] == "FirEffect"

    @pytest.mark.parametrize(
        "ftype,stops",
        [
            ("elliptic", [35.0, 50.0]),
            ("elliptic", [55.0, 70.0]),
            ("butterworth", None),
            ("chebyshev1", [25.0]),
            ("chebyshev2", [30.0]),
        ],
        ids=["ellip_35_50", "ellip_55_70", "butter", "cheb1_25", "cheb2_30"],
    )
    def test_filter_bank_complementary(self, ftype, stops):
        # the 13-band bank must sum to (approximately) an allpass for every
        # filter type (matrix4_mb.c:150-171, cap5.c)
        from dsp_tpu.ops import cap5 as c5

        caps, comp = c5.build_filter_bank(44100, ftype, stops)
        bank = c5.NumpyBank(caps, comp)
        n = 4096
        imp = np.zeros(n)
        out = np.zeros(n)
        for i in range(n):
            out[i] = bank.run_sample(1.0 if i == 0 else 0.0).sum()
        H = np.abs(np.fft.rfft(out, 8192))
        band = H[20:3000]  # up to ~16 kHz
        assert band.max() < 1.01
        assert band.min() > 0.98

    def test_filter_type_butterworth(self, steering_input):
        c, y = _run("matrix4_mb filter_type=butterworth -3", steering_input[:8192])
        assert np.isfinite(y).all()


class TestMatrix4MbBankPaths:
    """ADVICE r1: the fused bank kernel (block % 128 == 0 and >= 256) and the
    legacy per-stage scan are alternative realizations of the same 13-band
    LTI tree — prove they agree, and that the block size (which selects the
    path) does not change the effect's output."""

    def test_fused_bank_matches_legacy(self):
        import jax.numpy as jnp

        c = _chain("matrix4_mb -6")
        eff = next(e for e in c.effects if type(e).__name__ == "Matrix4MbEffect")
        rng = np.random.default_rng(7)
        x2 = jnp.asarray(rng.standard_normal((4096, 2)) * 0.3, jnp.float64)

        import jax

        bst0 = jax.tree_util.tree_map(jnp.asarray, eff._bank_state0())
        _, bands_legacy = eff._run_bank(bst0, x2)

        plan = eff._bank_plan(4096)
        fst0 = jnp.zeros((2, plan.C, plan.n), jnp.float64)
        _, bands_fused, _ = eff._run_bank_fused(fst0, x2)

        err = float(np.abs(np.asarray(bands_legacy) - np.asarray(bands_fused)).max())
        assert err < 1e-9, f"bank paths disagree: {err:.3e}"

    def test_block_size_independence(self, steering_input):
        x = steering_input[:8064]  # multiple of both 192 and 2048 after pad
        c1, y_big = _run("matrix4_mb -6", x, block=2048)   # fused path
        c2, y_small = _run("matrix4_mb -6", x, block=192)  # legacy path
        n = min(len(y_big), len(y_small))
        err = np.abs(y_big[:n] - y_small[:n]).max()
        assert err < 1e-9, f"block-size dependence: {err:.3e}"
