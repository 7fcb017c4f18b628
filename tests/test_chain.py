import numpy as np
import pytest

from dsp_tpu.chain import CompiledChain, build_chain_from_string
from dsp_tpu.chain.parser import ChainParseError
from dsp_tpu.chain.lexer import lex_string, TOK_CH_SEL, TOK_BLOCK_START, TOK_BLOCK_END, TOK_SOURCE, TOK_ALLOW_FAIL, TOK_LITERAL, TOK_ESC_LITERAL
from dsp_tpu.core.types import StreamInfo


class TestLexer:
    def test_kinds(self):
        toks, _ = lex_string("gain -3 :0,1 { } @file.txt !")
        assert [t.id for t in toks] == [
            TOK_LITERAL, TOK_LITERAL, TOK_CH_SEL, TOK_BLOCK_START,
            TOK_BLOCK_END, TOK_SOURCE, TOK_ALLOW_FAIL,
        ]
        assert toks[2].str == "0,1"
        assert toks[5].str == "file.txt"

    def test_comments(self):
        toks, _ = lex_string("gain -3 # comment here\neq 1k 1.0 +3")
        assert [t.str for t in toks] == ["gain", "-3", "eq", "1k", "1.0", "+3"]

    def test_quoting(self):
        toks, _ = lex_string('gain "-3" "a b"')
        assert [t.str for t in toks] == ["gain", "-3", "a b"]

    def test_escaped_literal(self):
        toks, _ = lex_string(r"\:notasel")
        assert toks[0].id == TOK_ESC_LITERAL
        assert toks[0].str == ":notasel"

    def test_unterminated_quote(self):
        from dsp_tpu.chain.lexer import LexError

        with pytest.raises(LexError):
            lex_string('gain "-3')

    def test_line_tracking(self):
        toks, _ = lex_string("gain -3\neq 1k 1.0 +3")
        assert toks[0].line == 0
        assert toks[2].line == 1
        assert toks[2].col == 0


def _chain(s, fs=44100, ch=2):
    return build_chain_from_string(s, StreamInfo(fs, ch))


class TestParser:
    def test_basic(self):
        c = _chain("gain -3 eq 1k 1.0 +3")
        assert [e.name for e in c.effects] == ["gain", "eq"]

    def test_unknown_effect(self):
        with pytest.raises(ChainParseError):
            _chain("gain -3 bogus_effect 1 2")

    def test_allow_fail(self):
        # bogus_effect is skipped; gain and mult then merge multiplicatively
        c = _chain("gain -3 ! bogus_effect 1 2 mult 0.5")
        assert [e.name for e in c.effects] == ["gain"]
        assert np.allclose(c.effects[0].v, 10 ** (-3 / 20) * 0.5)

    def test_selector_applies(self):
        c = _chain(":0 gain -6")
        g = c.effects[0]
        assert g.channel_selector.tolist() == [True, False]

    def test_block_mask(self):
        # block with mask 1,3; inner :0 selects absolute channel 1
        c = _chain(":1,3 { :0 gain -6 }", ch=4)
        g = c.effects[0]
        assert g.v[1] != 1.0
        assert g.v[0] == 1.0 and g.v[2] == 1.0 and g.v[3] == 1.0

    def test_selector_block_scope(self):
        # selector inside a block doesn't leak out: mult applies to both
        # channels and merges with the in-block gain
        c = _chain(":0,1 { :0 gain -6 } mult 0.5", ch=2)
        assert len(c.effects) == 1
        v = c.effects[0].v
        assert np.allclose(v, [10 ** (-6 / 20) * 0.5, 0.5])

    def test_file_source(self, tmp_path):
        f = tmp_path / "eq.txt"
        f.write_text("gain -4\neq 3k 1.5 -3  # comment\n")
        c = _chain(f"@{f}")
        assert [e.name for e in c.effects] == ["gain", "eq"]

    def test_merge_gains(self):
        c = _chain("gain -3 gain -3")
        assert len(c.effects) == 1
        assert np.allclose(c.effects[0].v, 10 ** (-6 / 20))

    def test_merge_biquads_disjoint(self):
        c = _chain(":0 eq 1k 1.0 +3 :1 eq 2k 1.0 -3")
        assert len(c.effects) == 1

    def test_merge_across_reorderable(self):
        # eq's merge across an interposed gain (effects_chain.c:605-641)
        c = _chain(":0 eq 1k 1.0 +3 gain -3 :1 eq 2k 1.0 -3")
        names = [e.name for e in c.effects]
        assert names.count("eq") == 1

    def test_no_merge_same_channel(self):
        c = _chain("eq 1k 1.0 +3 eq 2k 1.0 -3")
        assert len(c.effects) == 2


class TestCompiledChain:
    def test_save_load_state_resumes_exactly(self, rng, tmp_path):
        """Checkpoint/resume (a capability the reference lacks, SURVEY.md
        §5): run half, save, restore into a FRESH CompiledChain, run the
        rest — bit-identical to one uninterrupted pass. Covers stateful
        effect families: biquad carry, fir FDL, Thiran delay line."""
        spec = "eq 1k 1.0 +3 fir coefs:0.4,0.3,-0.2,0.1,0.05 delay -f 0.37m highpass 40 0.7071"
        c = _chain(spec)
        cc = CompiledChain(c, block_frames=512)
        x = rng.uniform(-0.5, 0.5, (4096, 2))
        y_full = np.concatenate(
            [np.asarray(cc.run_block(x[i : i + 512])) for i in range(0, 4096, 512)]
        )

        cc.reset()
        for i in range(0, 2048, 512):
            cc.run_block(x[i : i + 512])
        ckpt = str(tmp_path / "state.npz")
        cc.save_state(ckpt)

        cc2 = CompiledChain(_chain(spec), block_frames=512)
        cc2.load_state(ckpt)
        y_resumed = np.concatenate(
            [np.asarray(cc2.run_block(x[i : i + 512])) for i in range(2048, 4096, 512)]
        )
        assert np.array_equal(y_full[2048:], y_resumed)

    def test_load_state_validates_structure(self, rng, tmp_path):
        from dsp_tpu.chain.chain import ChainError

        cc = CompiledChain(_chain("eq 1k 1.0 +3"), block_frames=512)
        ckpt = str(tmp_path / "s.npz")
        cc.save_state(ckpt)
        other = CompiledChain(_chain("eq 1k 1.0 +3 lowpass 2k 0.7071"), block_frames=512)
        with pytest.raises(ChainError):
            other.load_state(ckpt)
        # different effect sequence with coincidentally equal state layout
        diff_names = CompiledChain(_chain("lowpass 2k 0.7071"), block_frames=512)
        with pytest.raises(ChainError):
            diff_names.load_state(ckpt)
        # arbitrary npz is rejected as not-a-checkpoint, not KeyError
        bogus = str(tmp_path / "b.npz")
        np.savez(bogus, a=np.zeros(3))
        with pytest.raises(ChainError):
            cc.load_state(bogus)

    def test_gain_math(self, rng):
        c = _chain("gain -6.0206")
        cc = CompiledChain(c, block_frames=256)
        x = rng.uniform(-1, 1, (256, 2))
        y = np.asarray(cc.run_block(x))
        assert np.allclose(y, x * 10 ** (-6.0206 / 20), atol=1e-12)

    def test_add_and_mult(self, rng):
        c = _chain("mult 2 add 0.25")
        cc = CompiledChain(c, block_frames=128)
        x = rng.uniform(-0.4, 0.4, (128, 2))
        y = np.asarray(cc.run_block(x))
        assert np.allclose(y, x * 2 + 0.25, atol=1e-12)

    def test_biquad_vs_scipy(self, rng):
        from scipy.signal import lfilter
        from dsp_tpu.effects.biquad import design, normalize, LOWPASS

        c = _chain("lowpass 2k 0.7071")
        cc = CompiledChain(c, block_frames=512)
        x = rng.uniform(-1, 1, (2048, 2))
        y = cc.process_array(x, drain=False)
        b0, b1, b2, a0, a1, a2 = design(LOWPASS, 44100, 2000.0, 0.7071)
        ref = lfilter([b0 / a0, b1 / a0, b2 / a0], [1, a1 / a0, a2 / a0], x, axis=0)
        assert np.abs(y - ref).max() < 1e-12

    def test_state_carries_across_blocks(self, rng):
        c1 = _chain("lowpass 500 0.7071")
        c2 = _chain("lowpass 500 0.7071")
        x = rng.uniform(-1, 1, (1024, 2))
        cc1 = CompiledChain(c1, block_frames=128)
        cc2 = CompiledChain(c2, block_frames=1024)
        y1 = cc1.process_array(x, drain=False)
        y2 = cc2.process_array(x, drain=False)
        assert np.abs(y1 - y2).max() < 1e-12

    def test_butterworth_macro(self, rng):
        from scipy.signal import butter, sosfilt

        c = _chain("lowpass 1k bw4.0 lowpass 1k bw4.1", ch=1)
        cc = CompiledChain(c, block_frames=512)
        x = rng.uniform(-1, 1, (4096, 1))
        y = cc.process_array(x, drain=False)
        sos = butter(4, 1000, fs=44100, output="sos")
        ref = sosfilt(sos, x[:, 0])
        assert np.abs(y[:, 0] - ref).max() < 1e-9

    def test_deemph_requires_fs(self):
        with pytest.raises(ChainParseError):
            _chain("deemph", fs=96000)

    def test_first_order_family(self, rng):
        # all first-order + transform types at least run and are stable
        c = _chain(
            "lowpass_1 1k highpass_1 1k allpass_1 1k lowshelf_1 200 3 "
            "highshelf_1 5k -3 lowpass_1p 2k linkwitz_transform 30 1.2 25 0.9"
        )
        cc = CompiledChain(c, block_frames=256)
        x = rng.uniform(-1, 1, (1024, 2))
        y = cc.process_array(x, drain=False)
        assert np.isfinite(y).all()


class TestDither:
    def test_flat_dither_quantizes(self, rng):
        c = _chain("dither flat 16")
        cc = CompiledChain(c, block_frames=256)
        x = rng.uniform(-0.5, 0.5, (256, 2))
        y = np.asarray(cc.run_block(x))
        q = 1 << 15
        assert np.allclose(y * q, np.round(y * q), atol=1e-9)
        assert np.abs(y - x).max() < 4 / q

    def test_shaped_dither_spectrum(self):
        # sloped dither should push noise to high frequencies
        c = _chain("dither sloped 16", ch=1)
        cc = CompiledChain(c, block_frames=8192)
        x = np.zeros((8192, 1))
        y = np.asarray(cc.run_block(x))[:, 0]
        spec = np.abs(np.fft.rfft(y)) ** 2
        lo = spec[10 : len(spec) // 8].mean()
        hi = spec[len(spec) // 2 :].mean()
        assert hi > lo * 2, (lo, hi)

    def test_noise_level(self):
        c = _chain("noise -60", ch=1)
        cc = CompiledChain(c, block_frames=4096)
        y = np.asarray(cc.run_block(np.zeros((4096, 1))))
        assert 0 < np.abs(y).max() <= 10 ** (-60 / 20) + 1e-9


class TestChainXfade:
    def test_discard_end_alignment_no_skip(self, rng):
        """Crossfading to a chain with output_discard (a rate-changing
        chain: the resampler's filter delay) must not blend the new chain's
        pre-alignment junk or skip old-chain audio: frame 0 of the fade
        continues the old stream exactly (fade weight 1.0), and the fade
        length follows the OUTPUT rate."""
        from dsp_tpu.chain.xfade import ChainXfade

        oldc = _chain("resample 48k")
        newc = _chain("resample 48k gain -6")
        assert newc.output_discard > 0  # the case under test
        old = CompiledChain(oldc, block_frames=588)
        new = CompiledChain(newc, block_frames=588)
        twin = CompiledChain(_chain("resample 48k"), block_frames=588)
        x = rng.uniform(-0.5, 0.5, (4 * 588, 2))
        # warm the old chain mid-stream (its own discard consumed upstream)
        for i in range(0, 2 * 588, 588):
            old.run_block(x[i : i + 588])
            twin.run_block(x[i : i + 588])
        xf = ChainXfade(old, new)
        assert xf.frames == int(round(0.1 * 48000))  # output-rate fade length
        y0 = np.asarray(xf.run_block(x[2 * 588 : 3 * 588]))
        t0 = np.asarray(twin.run_block(x[2 * 588 : 3 * 588]))
        # frame 0: full old weight, no skip, no junk blended
        assert np.allclose(y0[0], t0[0], atol=1e-12)
        assert np.isfinite(y0).all() and y0.shape == t0.shape

    def test_channel_mismatch_disables_fade(self):
        from dsp_tpu.chain.xfade import ChainXfade

        old = CompiledChain(_chain("gain 0"), block_frames=512)
        new = CompiledChain(_chain("remix 0,1"), block_frames=512)  # 2 -> 1 ch
        xf = ChainXfade(old, new)
        assert not xf.active  # dsp.c:1365-1366: no fade on stream mismatch
