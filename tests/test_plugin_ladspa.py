import os
import subprocess

import numpy as np
import pytest

from dsp_tpu.chain import CompiledChain, build_chain_from_string
from dsp_tpu.core.types import StreamInfo

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "amp_plugin.c")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def amp_so(tmp_path_factory):
    d = tmp_path_factory.mktemp("ladspa")
    so = str(d / "amp_plugin.so")
    r = subprocess.run(["gcc", "-shared", "-fPIC", "-O2", "-o", so, FIXTURE])
    if r.returncode != 0:
        pytest.skip("no C compiler")
    return so


class TestLadspaHost:
    def test_gain_control(self, amp_so):
        c = build_chain_from_string(f"ladspa_host {amp_so} test_amp 0.5", StreamInfo(44100, 2))
        cc = CompiledChain(c, block_frames=128)
        x = np.full((128, 2), 0.8)
        y = np.asarray(cc.run_block(x))
        assert np.allclose(y, 0.4, atol=1e-6)

    def test_default_control(self, amp_so):
        c = build_chain_from_string(f"ladspa_host {amp_so} test_amp", StreamInfo(44100, 1))
        cc = CompiledChain(c, block_frames=64)
        y = np.asarray(cc.run_block(np.full((64, 1), 0.3)))
        assert np.allclose(y, 0.3, atol=1e-6)

    def test_bad_label(self, amp_so):
        from dsp_tpu.chain.parser import ChainParseError

        with pytest.raises(ChainParseError):
            build_chain_from_string(f"ladspa_host {amp_so} nope", StreamInfo(44100, 1))

    def test_selector_subset(self, amp_so):
        c = build_chain_from_string(f":0 ladspa_host {amp_so} test_amp 2.0", StreamInfo(44100, 2))
        cc = CompiledChain(c, block_frames=64)
        x = np.full((64, 2), 0.25)
        y = np.asarray(cc.run_block(x))
        assert np.allclose(y[:, 0], 0.5, atol=1e-6)
        assert np.allclose(y[:, 1], 0.25, atol=1e-6)


class TestPluginApi:
    def test_config_discovery_and_run(self, tmp_path, monkeypatch):
        d = tmp_path / "cfg"
        d.mkdir()
        (d / "config_t").write_text(
            "input_channels=2\noutput_channels=2\nLC_NUMERIC=C\n"
            "[effects_chain]\ngain -6\n"
        )
        (d / "config").write_text("effects_chain=gain -3\n")
        monkeypatch.setenv("LADSPA_DSP_CONFIG_PATH", str(d))
        from dsp_tpu import plugin

        labels = [c.label for c in plugin.discover_plugins()]
        assert "ladspa_dsp" in labels and "ladspa_dsp:t" in labels
        # constant host block size: zero latency (SYMMETRIC_IO parity)
        p = plugin.load("ladspa_dsp:t", fs=48000)
        x = np.ones((1000, 2)) * 0.5
        y = np.concatenate([p.run(x[:250]), p.run(x[250:500]),
                            p.run(x[500:750]), p.run(x[750:])])
        assert y.shape == (1000, 2)
        assert p.latency == 0
        assert np.allclose(y, 0.5 * 10 ** (-6 / 20), atol=1e-9)

    def test_varying_block_size_pads_with_latency(self, tmp_path, monkeypatch):
        d = tmp_path / "cfg"
        d.mkdir()
        (d / "config").write_text("input_channels=1\neffects_chain=gain -6\n")
        monkeypatch.setenv("LADSPA_DSP_CONFIG_PATH", str(d))
        from dsp_tpu import plugin

        p = plugin.load("ladspa_dsp", fs=44100, block_frames=256)
        x = np.arange(1, 1001, dtype=np.float64)[:, None] / 2000.0
        y = np.concatenate([p.run(x[:300]), p.run(x[300:])])
        assert y.shape == (1000, 1)
        L = p.latency
        assert 0 < L < 512
        g = 10 ** (-6 / 20)
        # the non-silent samples are g*x shifted by the accrued deficits;
        # total sample budget is conserved (frames in == frames out)
        nz = np.flatnonzero(np.abs(y[:, 0]) > 0)
        assert len(nz) == 1000 - L
        assert np.allclose(y[nz, 0], g * x[: 1000 - L, 0], atol=1e-12)

    def test_output_channels_validated(self, tmp_path, monkeypatch):
        d = tmp_path / "cfg"
        d.mkdir()
        (d / "config").write_text("output_channels=4\neffects_chain=gain -3\n")
        monkeypatch.setenv("LADSPA_DSP_CONFIG_PATH", str(d))
        from dsp_tpu import plugin

        with pytest.raises(plugin.PluginError):
            plugin.load("ladspa_dsp", fs=44100)


class TestNativeIO:
    def test_native_matches_python(self, tmp_path, rng):
        from dsp_tpu.codecs import native

        if not native.available():
            pytest.skip("libdspio not built")
        from dsp_tpu.codecs import CodecParams, init_codec, CODEC_MODE_READ, CODEC_MODE_WRITE

        x = rng.uniform(-0.9, 0.9, (10000, 2))
        path = str(tmp_path / "n.wav")
        w = init_codec(CodecParams(path, type="wav", enc="s24", fs=44100, channels=2, mode=CODEC_MODE_WRITE))
        w.write(x)
        w.close()
        r = init_codec(CodecParams(path, mode=CODEC_MODE_READ))
        assert r._native is not None
        y = r.read(6000)
        r.seek(2000)
        y2 = r.read(1000)
        r.close()
        assert np.abs(y - x[:6000]).max() < 2**-23
        assert np.abs(y2 - x[2000:3000]).max() < 2**-23


class TestLadspaDspBridge:
    def test_bridge_so_self_hosted(self, tmp_path):
        """Compile native/ladspa_dsp_bridge.c and load it with our own
        ladspa_host effect: chain -> .so -> worker subprocess -> pipes."""
        import shutil

        import sys

        src = os.path.join(REPO, "native", "ladspa_dsp_bridge.c")
        so = str(tmp_path / "ladspa_dsp.so")
        r = subprocess.run(["gcc", "-O2", "-fPIC", "-shared", "-o", so, src])
        if r.returncode != 0:
            pytest.skip("no C compiler")
        cfgdir = tmp_path / "cfg"
        cfgdir.mkdir()
        (cfgdir / "config").write_text(
            "input_channels=2\noutput_channels=2\neffects_chain=gain -6\n"
        )
        os.environ["LADSPA_DSP_CONFIG_PATH"] = str(cfgdir)
        os.environ["DSP_TPU_PLUGIN_PYTHON"] = sys.executable
        try:
            from dsp_tpu.chain.chain import CompiledChain, build_chain_from_string
            from dsp_tpu.core.types import StreamInfo

            c = build_chain_from_string(f"ladspa_host {so} ladspa_dsp", StreamInfo(44100, 2))
            cc = CompiledChain(c, block_frames=512)
            rng = np.random.default_rng(0)
            x = rng.standard_normal((4096, 2)) * 0.3
            y = cc.process_array(x, drain=False, discard=False)
            # worker applies gain -6 with ZERO latency: the bridge feeds
            # constant 512-frame blocks, so the worker compiles for 512 and
            # every run() call maps to exactly one step (SYMMETRIC_IO parity)
            g = 10.0 ** (-6.0 / 20.0)
            err = np.abs(y - x * g).max()
            assert err < 1e-6, err
        finally:
            os.environ.pop("LADSPA_DSP_CONFIG_PATH", None)
            os.environ.pop("DSP_TPU_PLUGIN_PYTHON", None)
